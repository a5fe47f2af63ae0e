package graft

import org.apache.spark.sql.functions._
import graft.ops.{Similarity, TimeSeries}

/** Round-13 batch: the matrix-profile append identity and the
  * fixed-N anchor-sample fence for the brute kNN ground-truth
  * queries. */
class Round25Spec extends SparkSuite {
  import spark.implicits._

  // ---- matrixProfileMergedDelta ------------------------------------

  private def mpSeries(xs: Seq[Long]) =
    xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("grp", "t", "x")

  test("matrixProfileMergedDelta: merge equals the rebuild on a " +
      "suffix split (the 22nd inc_* identity), including when a new " +
      "window LOWERS an old minimum") {
    // 0×8, 5×8 base (one far pair), then an appended 0×8 suffix that
    // gives window 1 a new zero-distance twin — the stored minimum
    // for window 1 MUST drop from 200 to 0 through the merge path
    val xs = Seq.fill(8)(0L) ++ Seq.fill(8)(5L) ++ Seq.fill(8)(0L)
    val df = mpSeries(xs)
    val isNew = col("t") >= 16L
    val stored = TimeSeries.matrixProfile(df.where(!isNew),
      Seq("grp"), col("t"), "x", w = 8)
    val merged = TimeSeries.matrixProfileMergedDelta(df, Seq("grp"),
        col("t"), "x", w = 8, isNew, stored)
      .select("i", "mp_d2", "mp_j")
      .as[(Long, Long, Long)].collect().toSet
    val rebuild = TimeSeries.matrixProfile(df, Seq("grp"), col("t"),
        "x", w = 8)
      .select("i", "mp_d2", "mp_j")
      .as[(Long, Long, Long)].collect().toSet
    assert(merged === rebuild)
    assert(merged.contains((1L, 0L, 17L))) // lowered via a new pair
  }

  test("matrixProfileMergedDelta: a base too short for any pair " +
      "(no stored rows) still merges to the rebuild once the suffix " +
      "makes pairs possible") {
    val xs = (0L until 20L).map(i => i * i % 7)
    val df = mpSeries(xs)
    val isNew = col("t") >= 10L // base = 10 rows < 2w → stored empty
    val stored = TimeSeries.matrixProfile(df.where(!isNew),
      Seq("grp"), col("t"), "x", w = 8)
    assert(stored.count() === 0L)
    val merged = TimeSeries.matrixProfileMergedDelta(df, Seq("grp"),
        col("t"), "x", w = 8, isNew, stored)
      .select("i", "mp_d2", "mp_j")
      .as[(Long, Long, Long)].collect().toSet
    val rebuild = TimeSeries.matrixProfile(df, Seq("grp"), col("t"),
        "x", w = 8)
      .select("i", "mp_d2", "mp_j")
      .as[(Long, Long, Long)].collect().toSet
    assert(merged === rebuild && rebuild.nonEmpty)
  }

  test("matrixProfileMergedDelta fences an interleaved (non-suffix) " +
      "split loudly instead of silently shifting positions") {
    val df = mpSeries((0L until 24L).map(_ % 5))
    val e = intercept[Exception] {
      TimeSeries.matrixProfileMergedDelta(df, Seq("grp"), col("t"),
        "x", w = 8, col("t") % 2 === 0, // alternating — not a suffix
        TimeSeries.matrixProfile(df.where(col("t") % 2 =!= 0),
          Seq("grp"), col("t"), "x", w = 8)).collect()
    }
    assert(e.getMessage.contains("append-only"))
  }

  test("matrixProfileMergedDelta ≡ rebuild on seeded random series " +
      "with random suffix cuts — multiple keys, lengths straddling " +
      "2w, empty and full deltas all drawn") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 5) {
      val rows = (0 until 3).flatMap { g =>
        val n = 12 + rnd.nextInt(25) // 12..36 rows, w=8 → some < 2w
        (0 until n).map(t => (s"k$g", t.toLong, rnd.nextInt(9).toLong))
      }
      val df = rows.toDF("grp", "t", "x")
      val cut = rnd.nextInt(38).toLong // suffix cut; may be 0 or past-end
      val isNew = col("t") >= cut
      val stored = TimeSeries.matrixProfile(df.where(!isNew),
        Seq("grp"), col("t"), "x", w = 8)
      val merged = TimeSeries.matrixProfileMergedDelta(df, Seq("grp"),
          col("t"), "x", w = 8, isNew, stored)
        .select("grp", "i", "mp_d2", "mp_j")
        .as[(String, Long, Long, Long)].collect().toSet
      val rebuild = TimeSeries.matrixProfile(df, Seq("grp"), col("t"),
          "x", w = 8)
        .select("grp", "i", "mp_d2", "mp_j")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(merged === rebuild, s"trial $trial cut=$cut diverged")
    }
  }

  test("blockedPairs ≡ brute shared-key-value reference on seeded " +
      "random records (two nullable key expressions, small value " +
      "domain — cross-expression matches and NULLs all drawn); " +
      "blockedPairsDelta merges to the same set on a random split") {
    val rnd = new scala.util.Random(25)
    import graft.ops.Blocking
    def drawKey(): String =
      if (rnd.nextInt(4) == 0) null else s"v${rnd.nextInt(5)}"
    for (trial <- 1 to 5) {
      val recs = (1L to 30L).map(i => (i, drawKey(), drawKey()))
      val df = recs.toDF("id", "k1", "k2")
      // brute reference: pair iff the records' non-null value sets meet
      val keySets = recs.map { case (i, a, b) =>
        i -> Set(Option(a), Option(b)).flatten }.toMap
      val want = (for {
        a <- recs.map(_._1); b <- recs.map(_._1)
        if a < b && (keySets(a) & keySets(b)).nonEmpty
      } yield (a, b)).toSet
      val got = Blocking.blockedPairs(df, "id",
          Seq(col("k1"), col("k2")), maxBlock = None)
        .as[(Long, Long)].collect().toSet
      assert(got === want, s"trial $trial blockedPairs diverged")
      val isNew = col("id") % 3 === rnd.nextInt(3).toLong
      val stored = Blocking.blockedPairs(df.where(!isNew), "id",
        Seq(col("k1"), col("k2")), maxBlock = None)
      val merged = Blocking.blockedPairsDelta(df, isNew, "id",
          Seq(col("k1"), col("k2")), stored, maxBlock = None)
        .as[(Long, Long)].collect().toSet
      assert(merged === want, s"trial $trial delta merge diverged")
    }
  }

  // ---- anchorSample ------------------------------------------------

  test("anchorSample: keeps exactly the n smallest (hash, id) rows, " +
      "deterministically; n >= corpus is the identity") {
    val emb = (1L to 40L)
      .map(i => (i, Array.fill(4)(((i % 7) + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val sk = Similarity.quantizeInt8(emb)
    val all = sk.select("vec_id").as[Long].collect().toSet
    assert(Similarity.anchorSample(sk, 100)
      .select("vec_id").as[Long].collect().toSet === all)
    val s10a = Similarity.anchorSample(sk, 10)
      .select("vec_id").as[Long].collect().toSet
    val s10b = Similarity.anchorSample(sk, 10)
      .select("vec_id").as[Long].collect().toSet
    assert(s10a === s10b && s10a.size === 10)
    // the sample is the bottom-10 by (java_hash_u32(vec_id), vec_id)
    val want = sk.select(col("vec_id"),
        graft.expr.GraftFunctions
          .java_hash_u32(col("vec_id").cast("string")).as("hu"))
      .as[(Long, Long)].collect().sortBy(r => (r._2, r._1))
      .take(10).map(_._1).toSet
    assert(s10a === want)
    // and it is monotone: the 10-sample is inside the 20-sample
    val s20 = Similarity.anchorSample(sk, 20)
      .select("vec_id").as[Long].collect().toSet
    assert(s10a.subsetOf(s20))
  }
}
