package graft

import org.apache.spark.sql.functions._
import graft.ops.{Par, Sampling}

/** Round-6 hardening: tokenBudget's driver-histogram guard and null-cast
  * cost exclusion, and the fused boilerplate-fence aggregation. */
class Round6Spec extends SparkSuite {
  import spark.implicits._

  test("tokenBudget fails loudly on a high-cardinality score column") {
    // a numeric-but-not-coarse score (unique ids) must not silently
    // materialize one driver row per distinct value
    val d = spark.range(0, 50)
      .select(col("id"), col("id").as("score"), lit(1L).as("cost"))
    val e = intercept[IllegalArgumentException] {
      Sampling.tokenBudget(d, "score", "cost", "id", 10L, maxClasses = 10)
    }
    assert(e.getMessage.contains("distinct score classes"))
    // the same data under a sufficient cap still works
    assert(Sampling.tokenBudget(d, "score", "cost", "id", 10L,
      maxClasses = 50).count() === 10L)
  }

  test("tokenBudget excludes rows whose cost does not cast to long") {
    // a string cost that casts to null used to pass the isNotNull filter
    // and ride along for free (contributing zero to every sum)
    val d = Seq((1L, 2L, "5"), (2L, 2L, "oops"), (3L, 1L, "3"))
      .toDF("id", "score", "cost")
    val got = Sampling.tokenBudget(d, "score", "cost", "id", 100L)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 3L), "non-castable cost row is excluded")
  }

  test("quantizeInt8: floor semantics, max element at ±126/127, zero " +
      "and NaN vectors excluded") {
    import graft.ops.Similarity
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: no direction
      (3L, Array(-2.0f, 1.0f, 0.0f, 0.5f)),
      // NaN element: Spark sorts NaN above every number, so max-abs is
      // NaN and `ma > 0` ALONE would pass it through to an all-zero
      // sketch (q_norm = 0 → 0/0 ranking) — the fence must drop it
      (4L, Array(0.5f, Float.NaN, 0.25f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(emb)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getLong(2))).toMap
    assert(!q.contains(2L), "zero vector must be excluded, not NaN-ranked")
    assert(!q.contains(4L), "NaN vector must be excluded with the zeros")
    assert(q.values.forall(_._2 > 0L), "q_norm > 0 for every emitted row")
    // vec 1: ma=1.0 → q = floor(127·x): [127, -64, 31, 0]
    assert(q(1L)._1 === Seq(127L, -64L, 31L, 0L))
    assert(q(1L)._2 === 127L * 127 + 64 * 64 + 31 * 31)
    // vec 3: ma=2.0 → [-127, 63, 0, 31]
    assert(q(3L)._1 === Seq(-127L, 63L, 0L, 31L))
  }

  test("quantizedTopK ranks by exact integer dot over quantized vectors") {
    import graft.ops.Similarity
    // corpus on axes: probe along (1,0) must rank x-aligned first, the
    // diagonal second, y-aligned last
    val emb = Seq(
      (10L, Array(1.0f, 0.0f)), (20L, Array(0.9f, 0.9f)),
      (30L, Array(0.0f, 1.0f)), (100L, Array(2.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.quantizedTopK(
        emb, emb.where(col("vec_id") === 100), 3)
      .select("rnk", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
  }

  test("fused fence: hot detection carries the doc count in one job " +
      "and still fences the hot shingle") {
    import graft.ops.DedupText
    // 4 docs share one corpus-wide trigram ("a b c"); threshold 0.5 →
    // that shingle is hot and must be dropped from the exploded pairs
    val docs = Seq(
      (1L, "a b c x1 y1 z1"), (2L, "a b c x2 y2 z2"),
      (3L, "a b c x3 y3 z3"), (4L, "a b c x4 y4 z4"))
      .toDF("doc_id", "text")
    val sh = DedupText.shinglesFiltered(docs, "doc_id", "text", n = 3,
      maxDocFrac = 0.5)
    val shingles = sh.select("s").as[String].collect().toSet
    assert(!shingles.contains("a b c"), "corpus-wide shingle fenced out")
    assert(sh.select("doc_id").distinct().count() === 4L,
      "no document lost to the fence")
    // clean corpus: the fence is a no-op and returns the raw explode
    val clean = Seq((1L, "p q r s"), (2L, "t u v w")).toDF("doc_id", "text")
    val rawCount = Par.fanOut(clean, col("doc_id"))
      .select(col("doc_id"),
        explode(graft.ops.TextOps.shingles(col("text"), 3)).as("s"))
      .count()
    assert(DedupText.shinglesFiltered(clean, "doc_id", "text").count()
      === rawCount)
  }
}
