package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bloom, Sampling, TextOps}

/** Round-4 hardening: advisor findings from round 3 (empty-dim bloom,
  * strict mixture rates, integral chunk math). */
class Round4Spec extends SparkSuite {
  import spark.implicits._

  test("bloom prunedSemiJoin on an empty dim returns empty, not null-probe") {
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val dim = Seq.empty[(Long, String)].toDF("dk", "w")
    val out = Bloom.prunedSemiJoin(fact, "k", dim, "dk", 100L)
    assert(out.count() === 0L)
    assert(out.columns.toSeq === Seq("k", "v")) // fact schema preserved
  }

  test("mixtureByGroup fails loudly on a group missing from the rates dim") {
    val d = Seq((1L, "src0"), (2L, "srcX")).toDF("doc_id", "source")
    val rates = Seq(("src0", 100, 100)).toDF("source", "k", "m")
    val e = intercept[Exception] {
      Sampling.mixtureByGroup(d, "source", col("doc_id").cast("string"), rates)
        .count()
    }
    assert(e.getMessage != null)
    // and with a complete rates table the same corpus passes
    val rates2 = Seq(("src0", 100, 100), ("srcX", 100, 100))
      .toDF("source", "k", "m")
    assert(Sampling.mixtureByGroup(d, "source",
      col("doc_id").cast("string"), rates2).count() === 2L)
  }

  test("chunkTokens integral ceil-div matches the double formula on edges") {
    // T=chunk (exactly one chunk), T=chunk+1 (first multi-chunk), and a
    // stride-boundary T where ceil((T-chunk)/stride) lands exactly
    val mk = (n: Int) => (1 to n).map(i => s"w$i").mkString(" ")
    val df = Seq(mk(32), mk(33), mk(56), mk(57)).toDF("text")
    val counts = df
      .select(size(TextOps.chunkTokens(col("text"), 32, 8)).as("n"))
      .as[Int].collect().toSeq
    // stride=24: 32→1, 33→2, 56→2 (1+ceil(24/24)), 57→3 (1+ceil(25/24))
    assert(counts === Seq(1, 2, 2, 3))
  }
}
