package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Quality, Similarity, TimeSeries}

/** Round-8 batch-4 operators — the invariants the parquet oracle can't
  * state: ACF's closed-form values on hand series, Benford's exclusion
  * and dense-spine rules, walk trajectories staying on edges and
  * replaying bit-identically, and the k-means sufficient-statistics
  * merge identity under fixed centroids. */
class Round12Spec extends SparkSuite {
  import spark.implicits._

  // ---- acfExact -----------------------------------------------------

  test("acf: alternating series has num_1 = -den (perfect negative " +
      "lag-1 correlation, up to the truncated tail term)") {
    // x = 0,2,0,2,... n=6, S=6, e_t = 6*x-6 = -6,+6,-6,...
    // den = 6*36 = 216; num_1 = 5 products of (-36) = -180
    val df = Seq((1L, 0L), (2L, 2L), (3L, 0L), (4L, 2L), (5L, 0L),
      (6L, 2L)).toDF("t", "x")
    val got = TimeSeries.acfExact(df, Nil, Seq(col("t")), "x", 2)
      .orderBy("lag").select("lag", "num", "den")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, -180L, 216L), (2L, 144L, 216L)),
      s"closed-form ACF mismatch: $got")
  }

  test("acf: keyed series are independent — each key gets its own " +
      "totals and its own lag frame") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 1L),
      ("b", 1L, 5L), ("b", 2L, 5L), ("b", 3L, 5L))
      .toDF("k", "t", "x")
    val got = TimeSeries.acfExact(df, Seq("k"), Seq(col("t")), "x", 1)
      .orderBy("k").select("k", "num", "den")
      .as[(String, Long, Long)].collect().toSeq
    // a: n=3 S=5, e = -2, 4, -2 -> den=24, num_1 = -8 + -8 = -16
    // b: constant -> e all 0, den=0, num=0 (undefined ratio, exact zeros)
    assert(got === Seq(("a", -16L, 24L), ("b", 0L, 0L)),
      s"keyed ACF mismatch: $got")
  }

  // ---- benfordAudit -------------------------------------------------

  test("benford: non-positive measures are excluded from cnt AND n; " +
      "every digit 1-9 reports even with zero observations") {
    val df = Seq(100L, 150L, 190L, -5L, 0L, 2000L)
      .toDF("v").withColumn("k", lit("g"))
    val got = Quality.benfordAudit(df, Seq("k"), col("v"))
      .orderBy("digit")
      .select("digit", "cnt").as[(Long, Long)].collect().toSeq
    // 4 positive values: 100,150,190 -> digit 1 (x3); 2000 -> digit 2
    assert(got.map(_._1) === (1L to 9L),
      s"dense digit spine violated: ${got.map(_._1)}")
    assert(got.map(_._2) === Seq(3L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L),
      s"counts wrong: $got")
  }

  test("benford: a digit-9-heavy distribution flags digit 9 (over) " +
      "and digit 1 (under); dev is the exact micro-share gap") {
    val df = (1 to 10).map(i => 900L + i).toDF("v")
      .withColumn("k", lit("g"))
    val row = Quality.benfordAudit(df, Seq("k"), col("v"))
      .where(col("digit") === 9)
      .select("cnt", "dev", "flagged")
      .as[(Long, Long, Boolean)].collect().head
    // all 10 values lead with 9: dev = |1e6*10 - 10*45757| = 9542430
    assert(row === ((10L, 9542430L, true)), s"digit-9 row wrong: $row")
    val d1 = Quality.benfordAudit(df, Seq("k"), col("v"))
      .where(col("digit") === 1).select("flagged")
      .as[Boolean].collect().head
    assert(d1, "digit 1 at zero share must flag (|0 - 301029ppm| > 10pp)")
  }

  // ---- deterministicWalks -------------------------------------------

  test("walks: every transition is an edge of the canonical graph, " +
      "step 0 is the seed, and re-running replays bit-identically") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (2L, 2L), (1L, 2L)) // self-loop + duplicate must be ignored
      .toDF("s", "d")
    val w1 = Graph.deterministicWalks(edges, "s", "d", steps = 3)
      .orderBy("walker", "step")
      .as[(Long, Long, Long)].collect().toSeq
    val w2 = Graph.deterministicWalks(edges, "s", "d", steps = 3)
      .orderBy("walker", "step")
      .as[(Long, Long, Long)].collect().toSeq
    assert(w1 === w2, "walks must be deterministic across runs")
    assert(w1.count(_._2 == 0L) === 4 && w1.size === 16,
      s"one walker per vertex x 4 steps expected: ${w1.size}")
    assert(w1.filter(_._2 == 0L).forall(r => r._1 == r._3),
      "step 0 must be the walker's seed vertex")
    val adj = Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L), (4L, 1L), (1L, 4L), (1L, 3L), (3L, 1L))
    val byWalker = w1.groupBy(_._1).values
    byWalker.foreach { traj =>
      traj.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, a), (_, _, b)) =>
          assert(adj.contains((a, b)),
            s"transition $a -> $b is not an edge")
        case _ =>
      }
    }
  }

  test("walks: different salts diverge (the choice really is " +
      "hash-driven, not positional)") {
    val edges = (1L to 20L).flatMap(i =>
      Seq((i, i % 20 + 1), (i, (i + 4) % 20 + 1))).toDF("s", "d")
    val a = Graph.deterministicWalks(edges, "s", "d", 4, salt = "s1")
      .orderBy("walker", "step").as[(Long, Long, Long)].collect().toSeq
    val b = Graph.deterministicWalks(edges, "s", "d", 4, salt = "s2")
      .orderBy("walker", "step").as[(Long, Long, Long)].collect().toSeq
    assert(a !== b, "distinct salts should pick different neighbors")
  }

  // ---- centroidStats ------------------------------------------------

  test("centroidStats: stats(B u D) equals stats(B) cell-wise-added " +
      "to stats(D) under fixed centroids (the mergeability contract)") {
    val emb = Tables.embeddings(spark, sfDir)
    val sk = Similarity.quantizeInt8(emb).localCheckpoint()
    val base = sk.where(col("vec_id") % 3 =!= 0)
    val delta = sk.where(col("vec_id") % 3 === 0)
    val cent = Similarity.kmeansInt8(base, k = 4, iters = 1).centroids
    val whole = Similarity.centroidStats(sk, cent)
      .select(col("cell"), col("d"), col("s"), col("n"))
    val merged = Similarity.centroidStats(base, cent)
      .select(col("cell"), col("d"), col("s").as("s1"),
        col("n").as("n1"))
      .join(Similarity.centroidStats(delta, cent)
          .select(col("cell"), col("d"), col("s").as("s2"),
            col("n").as("n2")),
        Seq("cell", "d"), "full_outer")
      .select(col("cell"), col("d"),
        (coalesce(col("s1"), lit(0L)) + coalesce(col("s2"), lit(0L)))
          .as("s"),
        (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L)))
          .as("n"))
    assert(whole.exceptAll(merged).isEmpty &&
      merged.exceptAll(whole).isEmpty,
      "merge identity violated: stats(B u D) != stats(B) + stats(D)")
  }
}
