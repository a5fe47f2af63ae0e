package graft

import org.apache.spark.sql.functions._
import graft.ops.{Multimodal, Sampling}

/** Round-10 fifth batch: the rendezvous-hash minimal-disruption
  * guarantee and the VAD gate's closed forms — the contracts the
  * parquet oracle can't state. */
class Round21Spec extends SparkSuite {
  import spark.implicits._

  // ---- Sampling.rendezvousAssign --------------------------------------

  test("rendezvousAssign minimal disruption: adding a shard moves ONLY " +
      "the keys the new shard wins") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val before = Sampling.rendezvousAssign(docs, $"doc_id",
        (0 until 8).map(i => s"s$i"), "hrw")
      .select("doc_id", "shard").as[(Long, String)].collect().toMap
    val after = Sampling.rendezvousAssign(docs, $"doc_id",
        (0 until 8).map(i => s"s$i") :+ "s8", "hrw")
      .select("doc_id", "shard").as[(Long, String)].collect().toMap
    assert(before.keySet === after.keySet)
    val moved = before.keys.filter(k => before(k) != after(k))
    assert(moved.forall(k => after(k) == "s8"),
      "a key moved between PRE-EXISTING shards when s8 was added")
    // the new shard should win roughly 1/9 of the keys — and at least
    // one on this fixture, or the test proves nothing
    assert(moved.nonEmpty, "s8 won zero keys — fixture too small?")
    assert(moved.size < before.size / 4,
      s"s8 took ${moved.size}/${before.size} keys — not HRW behavior")
  }

  test("rendezvousAssign is deterministic, total, and every shard is " +
      "reachable on the fixture") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val shards = (0 until 8).map(i => s"s$i")
    val a = Sampling.rendezvousAssign(docs, $"doc_id", shards, "hrw")
      .localCheckpoint()
    val b = Sampling.rendezvousAssign(docs, $"doc_id", shards, "hrw")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    val used = a.select("shard").distinct().as[String].collect().toSet
    assert(used === shards.toSet,
      s"unreachable shards on the fixture: ${shards.toSet -- used}")
    val e = intercept[IllegalArgumentException] {
      Sampling.rendezvousAssign(docs, $"doc_id", Seq("x", "x"), "hrw")
    }
    assert(e.getMessage.contains("duplicate"))
  }

  // ---- Multimodal.audioVad --------------------------------------------

  test("audioVad closed form: half-silent payload at 4 frames") {
    // 8 bytes, frames = 4 → spans of 2; energies [0, 0, 16, 16],
    // total 32; voiced iff 4·s > 32 → frames 2 and 3
    val df = Seq((1L, Array[Byte](0, 0, 0, 0, 8, 8, 8, 8)))
      .toDF("media_id", "payload")
    val got = Multimodal.audioVad(df, "payload", frames = 4)
      .select("n_voiced", "lead_silence", "peak_b", "peak_energy")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((2L, 2L, 2L, 16L)))
  }

  test("audioVad: a flat payload has NO voiced frame (strict mean " +
      "compare) and lead_silence = frames; peak tie goes to the " +
      "smallest frame index") {
    val df = Seq((1L, Array.fill[Byte](16)(5))).toDF("media_id", "payload")
    val got = Multimodal.audioVad(df, "payload", frames = 4)
      .select("n_voiced", "lead_silence", "peak_b", "peak_energy")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got === ((0L, 4L, 0L, 20L)))
  }

  test("audioVad on the media fixture: invariants hold (0 <= n_voiced " +
      "< frames, lead_silence <= frames, peak is a real frame)") {
    val vad = Multimodal.audioVad(
      Multimodal.mediaFromDocuments(spark, sfDir).toDF(), "payload",
      frames = 16).localCheckpoint()
    // a frame strictly above the mean implies another strictly below:
    // n_voiced can never be ALL frames; peak index is in range
    assert(vad.where($"n_voiced" < 0 || $"n_voiced" >= 16 ||
      $"lead_silence" < 0 || $"lead_silence" > 16 ||
      $"peak_b" < 0 || $"peak_b" >= 16 || $"peak_energy" < 0).isEmpty)
    // any voiced payload starts its voiced region AT lead_silence
    assert(vad.where($"n_voiced" > 0 && $"lead_silence" >= 16).isEmpty)
  }
}
