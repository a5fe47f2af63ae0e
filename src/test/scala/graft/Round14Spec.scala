package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Skyline}

/** Round-8 batch-8 operators — the invariants the parquet oracle can't
  * state: the skyline frontier is a SUFFICIENT incremental state (merge
  * identity on arbitrary splits, counts preserved at coincident
  * points), per-source BFS agrees with the pooled multi-source MIN and
  * yields closed-form harmonic closeness on hand graphs, and the RFM
  * threshold rule collapses to bucket 1 under equal values.
  */
class Round14Spec extends SparkSuite {
  import spark.implicits._

  // ---- skylineMerge -------------------------------------------------

  test("skyline merge identity: skyline(B ∪ D) == merge(skyline(B), D) " +
      "for an arbitrary split, counts included") {
    val all = (1L to 300L).map(i => ((i * 37) % 101, (i * 59) % 97))
    val df = all.toDF("x0", "y0")
    val base = all.filter(_._1 % 3 != 0).toDF("x0", "y0")
    val delta = all.filter(_._1 % 3 == 0).toDF("x0", "y0")
    val oneShot = Skyline.skyline2d(df, col("x0"), col("y0"))
      .orderBy("x").as[(Long, Long, Long)].collect().toSeq
    val merged = Skyline.skylineMerge(
        Skyline.skyline2d(base, col("x0"), col("y0")),
        delta, col("x0"), col("y0"))
      .orderBy("x").as[(Long, Long, Long)].collect().toSeq
    assert(merged === oneShot,
      s"incremental skyline diverged:\n one-shot=$oneShot\n merged=$merged")
  }

  test("skyline merge: a delta point dominating the old frontier " +
      "replaces it; a coincident delta point adds to its count") {
    val base = Seq((5L, 5L), (10L, 9L)).toDF("x0", "y0")
    val frontier = Skyline.skyline2d(base, col("x0"), col("y0"))
    // (4, 6) dominates (5, 5); (10, 9) coincides with a frontier point
    val delta = Seq((4L, 6L), (10L, 9L)).toDF("x0", "y0")
    val got = Skyline.skylineMerge(frontier, delta, col("x0"), col("y0"))
      .orderBy("x").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((4L, 6L, 1L), (10L, 9L, 2L)),
      s"dominate/coincide handling wrong: $got")
  }

  test("skyline: an x range that would wrap the bucket arithmetic " +
      "raises loudly instead of silently pruning frontier points") {
    // a range that subtracts fine but would wrap when scaled by the
    // bucket count (the fully-extreme case is caught upstream by ANSI
    // overflow on the subtraction itself — also loud)
    val df = Seq((0L, 1L), (Long.MaxValue / 256 + 10L, 2L))
      .toDF("x0", "y0")
    val e = intercept[Exception] {
      Skyline.skyline2d(df, col("x0"), col("y0"), buckets = 256)
        .collect()
    }
    assert(e.getMessage.contains("x range exceeds") ||
      Option(e.getCause).exists(_.getMessage.contains("x range exceeds")),
      s"wrong failure: ${e.getMessage}")
  }

  // ---- bfsDistancesPerSource / harmonicCloseness --------------------

  test("per-source BFS: pooling per-source distances with MIN equals " +
      "the multi-source bfsDistances answer") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 4L), (4L, 6L))
      .toDF("s", "d")
    val seeds = Seq(1L, 5L).toDF("node")
    val pooled = Graph.bfsDistancesPerSource(e, "s", "d", seeds, "node", 3)
      .groupBy("node").agg(min("dist").as("dist"))
      .as[(Long, Long)].collect().toMap
    val multi = Graph.bfsDistances(e, "s", "d", seeds, "node", 3)
      .as[(Long, Long)].collect().toMap
    assert(pooled === multi,
      s"per-source MIN != multi-source: $pooled vs $multi")
  }

  test("harmonic closeness: closed form on a star vs a chain — the " +
      "hub wins, distances floor exactly") {
    // star: 1 -> {2,3,4} all at dist 1 -> closeness 3_000_000
    // chain: 5 -> 6 -> 7 -> 8: dists 1,2,3 ->
    //   1e6 + 500000 + 333333 = 1833333
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L)).toDF("s", "d")
    val seeds = Seq(1L, 5L).toDF("node")
    val got = Graph.harmonicCloseness(e, "s", "d", seeds, "node", 3)
      .orderBy("src").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 3000000L), (5L, 3L, 1833333L)),
      s"closed-form closeness mismatch: $got")
  }

  test("per-source BFS: sources expand independently — a vertex " +
      "reachable from one seed only never leaks to the other") {
    val e = Seq((1L, 2L), (3L, 4L)).toDF("s", "d")
    val seeds = Seq(1L, 3L).toDF("node")
    val got = Graph.bfsDistancesPerSource(e, "s", "d", seeds, "node", 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 1L, 0L), (1L, 2L, 1L),
      (3L, 3L, 0L), (3L, 4L, 1L)),
      s"cross-source leakage: $got")
  }

  // ---- evt_rfm threshold rule ---------------------------------------

  test("rfm thresholds: equal metric values land every row in bucket 1 " +
      "(v > threshold is strict), distinct values split 1/2/3/4") {
    // run the graded query on the fixture dir and check the rule's two
    // boundary properties structurally rather than re-deriving values
    val out = graft.SparkEntry.queries("evt_rfm")(spark, sfDir)
    val buckets = out.select("bf").distinct()
      .as[Long].collect().toSet
    assert(buckets.subsetOf(Set(1L, 2L, 3L, 4L)) && buckets.contains(1L),
      s"bucket range violated: $buckets")
    // every customer with the minimum frequency must sit in bucket 1
    val minF = out.agg(min("f")).as[Long].collect().head
    val bad = out.where(col("f") === minF && col("bf") =!= 1L).count()
    assert(bad == 0L, "minimum-frequency customers must be bucket 1")
    // monotone: a higher metric value never gets a lower bucket
    val viol = out.as("a").join(out.as("b"),
        col("a.f") > col("b.f") && col("a.bf") < col("b.bf")).count()
    assert(viol == 0L, "bucket assignment not monotone in the metric")
  }
}
