package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.{Graph, IncrementalAgg, Quality, Ranks, Retrieval,
  Sampling}

/** Round-10 batch properties: range-partitioned global cumsum,
  * inverse-CDF weighted sampling, the mergeable equi-depth identity,
  * boolean-AND qrels + top-k eval metrics, Newman modularity per block,
  * and the exact two-sample KS statistic. */
class Round17Spec extends SparkSuite {
  import spark.implicits._

  // ---- globalCumSum --------------------------------------------------

  test("globalCumSum equals the single-task window cumsum on tie-heavy " +
      "input (with a total-order tiebreaker)") {
    val df = (1L to 500L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val got = Ranks.globalCumSum(df, "w", "cum", numRanges = 8, col("id"))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum",
        coalesce(sum(col("w")).over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got === want)
  }

  // ---- inverseCdf ----------------------------------------------------

  test("inverseCdf: every draw lands inside its row's cumulative " +
      "interval, all draws resolve, and reruns are identical") {
    val docs = (1L to 100L).map(i => (i, i % 13 + 1)).toDF("id", "w")
    def run() = Sampling.inverseCdf(docs, "id", col("w"),
      draws = 50, salt = "t", numRanges = 4)
    val got = run().as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length === 50, s"expected 50 draws, got ${got.length}")
    assert(got.map(_._1).toSeq === (0L until 50L).toSeq,
      "every draw_id resolves exactly once")
    // recompute intervals independently and check containment
    val cum = docs.orderBy("id").as[(Long, Long)].collect()
      .scanLeft((0L, 0L, 0L)) { case ((_, _, acc), (id, w)) =>
        (id, w, acc + w) }.drop(1)
      .map { case (id, w, hi) => id -> (hi - w, hi) }.toMap
    got.foreach { case (_, u, id) =>
      val (lo, hi) = cum(id)
      assert(u >= lo && u < hi, s"draw u=$u outside [$lo,$hi) of id=$id")
    }
    assert(run().as[(Long, Long, Long)].collect().sortBy(_._1).toSeq ===
      got.toSeq, "inverseCdf must be deterministic")
  }

  test("inverseCdf raises loudly on a non-positive weight") {
    val docs = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.inverseCdf(docs, "id", col("w"), draws = 3, salt = "t")
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("inverseCdf fences total weight >= 2^32 — the u32 draw could " +
      "never reach the mass past it, so rows there would be silently " +
      "unsampleable") {
    val docs = Seq((1L, 1L << 31), (2L, 1L << 31), (3L, 7L))
      .toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.inverseCdf(docs, "id", col("w"), draws = 3, salt = "t")
        .collect()
    }
    assert(e.getMessage.contains("2^32"),
      s"expected the 2^32 fence, got: ${e.getMessage}")
    // just under the fence still works
    val ok = Sampling.inverseCdf(
      Seq((1L, (1L << 32) - 1)).toDF("id", "w"), "id", col("w"),
      draws = 2, salt = "t").collect()
    assert(ok.length === 2)
  }

  // ---- equidepthFromCounts -------------------------------------------

  test("equidepthFromCounts: boundaries from merged base+delta " +
      "histograms equal the full-rebuild boundaries (the inc identity)") {
    val rows = (1L to 1000L).map(i => (s"g${i % 3}", (i * i) % 40 + 1))
      .toDF("g", "v")
    val isNew = col("v") % 5 === 0
    val hB = IncrementalAgg.partial(rows.where(!isNew), Seq("g", "v"), "v")
    val hD = IncrementalAgg.partial(rows.where(isNew), Seq("g", "v"), "v")
    val merged = IncrementalAgg.equidepthFromCounts(
        IncrementalAgg.merge(hB, hD, Seq("g", "v")),
        Seq("g"), "v", "cnt", 8)
      .as[(String, Long, Long)].collect().toSet
    val full = IncrementalAgg.equidepthFromCounts(
        IncrementalAgg.partial(rows, Seq("g", "v"), "v"),
        Seq("g"), "v", "cnt", 8)
      .as[(String, Long, Long)].collect().toSet
    assert(merged === full)
    // boundary b is the ceil(b*n/8)-th order statistic — check one group
    val g0 = rows.where(col("g") === "g0").select("v")
      .as[Long].collect().sorted
    full.filter(_._1 == "g0").foreach { case (_, b, bound) =>
      val idx = ((b * g0.length + 7) / 8).toInt // ceil(b*n/8), 1-based
      assert(bound === g0(idx - 1),
        s"bucket $b: want order statistic ${g0(idx - 1)}, got $bound")
    }
  }

  // ---- booleanQrels + topKEval ---------------------------------------

  test("booleanQrels demands EVERY query term; topKEval computes exact " +
      "hits and lcm-scaled MRR on a closed-form fixture") {
    val docs = Seq(
      (1L, "a b c"), (2L, "a c"), (3L, "b"), (4L, "a b x")
    ).toDF("doc_id", "text")
    val qs = Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("query_id", "term")
    val rel = Retrieval.booleanQrels(docs, "doc_id", "text", qs)
      .as[(Long, Long)].collect().toSet
    // q1 needs {a,b}: docs 1 and 4; q2 needs {c}: docs 1 and 2
    assert(rel === Set((1L, 1L), (1L, 4L), (2L, 1L), (2L, 2L)))
    val ranked = Seq(
      (1L, 1L, 3L), (1L, 2L, 1L), (1L, 3L, 4L), // q1: rel at ranks 2, 3
      (2L, 1L, 5L), (2L, 2L, 6L)                // q2: no rel in list
    ).toDF("query_id", "rnk", "doc_id")
    val ev = Retrieval.topKEval(ranked, rel.toSeq.toDF("query_id", "doc_id"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ev === Set((1L, 2L, 2L, 2520L / 2), (2L, 2L, 0L, 0L)))
  }

  // ---- modularityByBlock ----------------------------------------------

  test("modularityByBlock: one-block partition scores exactly zero " +
      "(4m·m − (2m)²) and singleton blocks score −deg²") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
      .toDF("src", "dst") // m = 5
    val one = Seq(1L, 2L, 3L, 4L).map(n => (n, 0L)).toDF("node", "blk")
    val got1 = Graph.modularityByBlock(e, "src", "dst", one, "node", "blk")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got1.toSeq === Seq((0L, 4L, 5L, 10L, 0L)),
      s"one-block must have e_in=m, d_sum=2m, q_num=0: ${got1.toSeq}")
    val singletons = Seq(1L, 2L, 3L, 4L).map(n => (n, n)).toDF("node", "blk")
    val got2 = Graph.modularityByBlock(e, "src", "dst", singletons,
        "node", "blk")
      .orderBy("block").as[(Long, Long, Long, Long, Long)].collect()
    // degrees: 1→3, 2→2, 3→3, 4→2; q_num = 4·5·0 − d² = −d²
    assert(got2.toSeq === Seq((1L, 1L, 0L, 3L, -9L), (2L, 1L, 0L, 2L, -4L),
      (3L, 1L, 0L, 3L, -9L), (4L, 1L, 0L, 2L, -4L)))
  }

  test("modularityByBlock raises on an unassigned vertex") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val blocks = Seq((1L, 0L)).toDF("node", "blk")
    intercept[Exception] {
      Graph.modularityByBlock(e, "src", "dst", blocks, "node", "blk")
        .collect()
    }
  }

  // ---- ksStat ----------------------------------------------------------

  test("ksStat: identical samples give d_num = 0; disjoint supports " +
      "give the maximal d_num = n_a·n_b") {
    val a = (1L to 90L).map(i => i % 9).toDF("v")
    val same = Quality.ksStat(a, a, "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(same._3 === 0L, s"identical samples must give D=0: $same")
    val lo = (1L to 40L).map(i => i % 5).toDF("v")        // values 0..4
    val hi = (1L to 60L).map(i => i % 5 + 10).toDF("v")   // values 10..14
    val far = Quality.ksStat(lo, hi, "v")
      .as[(Long, Long, Long, Long)].collect().head
    assert(far === ((40L, 60L, 2400L, 4L)),
      s"disjoint supports must reach n_a·n_b at the last a-value: $far")
  }
}
