package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Sampling, Similarity}

/** Round-10 second batch: Louvain local-move invariants, IVF+PQ serving
  * consistency, and temperature-mix apportionment exactness. */
class Round18Spec extends SparkSuite {
  import spark.implicits._

  // ---- louvainMoveRound -----------------------------------------------

  test("louvainMoveRound: from singletons on two disjoint triangles, " +
      "every vertex joins a neighbor — and the move strictly improves " +
      "modularity") {
    // two triangles: {1,2,3} and {4,5,6}; m = 6
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    val singles = (1L to 6L).map(n => (n, n)).toDF("node", "comm")
    val moved = Graph.louvainMoveRound(e, "src", "dst", singles,
      "node", "comm").as[(Long, Long)].collect().toMap
    // gain(i→c) from a singleton = 4m·1 − 2·2·(2−2+2) = 24 − 8 = 16 > 0
    // for every neighbor; ties pick the smallest neighbor community
    assert(moved === Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 5L, 5L -> 4L, 6L -> 4L), s"wrong moves: $moved")
    // the synchronous round must not DECREASE total modularity here:
    // score both partitions with modularityByBlock
    def q(assign: Map[Long, Long]): Long =
      Graph.modularityByBlock(e, "src", "dst",
          assign.toSeq.toDF("node", "blk"), "node", "blk")
        .agg(sum("q_num")).as[Long].collect().head
    assert(q(moved) > q(singles.as[(Long, Long)].collect().toMap),
      "one move round must improve Q on the triangle pair")
  }

  test("louvainMoveRound: a vertex with no strictly-positive gain " +
      "stays put (converged partition is a fixpoint)") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
      .toDF("src", "dst")
    // the natural partition: each triangle one community
    val part = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "comm")
    val moved = Graph.louvainMoveRound(e, "src", "dst", part,
      "node", "comm").as[(Long, Long)].collect().toMap
    assert(moved === Map(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 20L),
      s"the two-triangle partition must be a local-move fixpoint: $moved")
  }

  // ---- ivfpqTopK --------------------------------------------------------

  test("ivfpqTopK with nprobe = every cell equals plain pqTopK " +
      "(the coarse prune only ever REMOVES candidates)") {
    val emb = Tables.embeddings(spark, sfDir)
    val sk = Similarity.quantizeInt8(emb)
    val km = Similarity.kmeansInt8(sk, 4, 2)
    val cells = Similarity.ivfIndex(sk, km.centroids)
      .select("vec_id", "cell")
    val pq = Similarity.pqTrainInt8(sk, m = 8, ksub = 8, iters = 2)
    val probes = emb.where(col("vec_id") % 50 === 0)
    def set(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rnk", "neighbor_id", "adist")
        .as[(Long, Long, Long, Long)].collect().toSet
    val full = set(Similarity.pqTopK(pq.codes, pq.codebook, probes, 5))
    val ivfAll = set(Similarity.ivfpqTopK(cells, pq.codes, pq.codebook,
      km.centroids, probes, k = 5, nprobe = 4))
    assert(ivfAll === full,
      "probing all cells must reproduce the unpruned ADC ranking")
    // and at nprobe = 1 every returned neighbor lives in a probed cell
    val pruned = Similarity.ivfpqTopK(cells, pq.codes, pq.codebook,
      km.centroids, probes, k = 5, nprobe = 1)
    val cellOf = cells.as[(Long, Long)].collect().toMap
    val byQuery = pruned.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(r => cellOf(r._2)).toSet.size <= 1,
        "nprobe=1 results must come from one coarse cell")
    }
  }

  // ---- temperatureMix ----------------------------------------------------

  test("temperatureMix: quotas are ⌊√n⌋-proportional largest-remainder " +
      "shares summing EXACTLY to the budget; selection is by hash rank") {
    val rows = (1L to 640L).map { i =>
      val src = if (i <= 400) "big" else if (i <= 625) "mid" else "tiny"
      (i, src)
    }.toDF("id", "src")
    // n = 400/225/15 → w = 20/15/3, W = 38; quotas for total 100:
    // base = 52/39/7 (2000,1500,300 div 38), rem = 24/18/34 → extra 2
    // goes to tiny (rem 34) and big (rem 24): 53/39/8
    val got = Sampling.temperatureMix(rows, "src",
      col("id").cast("string"), total = 100L, salt = "t")
    val quotas = got.groupBy("src").agg(count(lit(1)).as("n"),
        first("quota").as("q"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(quotas === Map("big" -> ((53L, 53L)), "mid" -> ((39L, 39L)),
      "tiny" -> ((8L, 8L))), s"wrong apportionment: $quotas")
    assert(got.count() === 100L, "selected rows must sum to the budget")
    // determinism + hash-rank selection: rerun equals
    val a = got.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.temperatureMix(rows, "src", col("id").cast("string"),
        total = 100L, salt = "t")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  // ---- modularity sufficient statistics ---------------------------------

  test("modularityEdgeStats: stats of disjoint edge slices ADD, and " +
      "modularityFromStats of the merged frame equals modularityByBlock " +
      "on the whole graph (minus the non-additive n_nodes)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("src", "dst")
    val blocks = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L),
      (6L, 1L)).toDF("node", "blk")
    val isNew = col("src") % 2 === 0
    val sB = Graph.modularityEdgeStats(e.where(!isNew), "src", "dst",
      blocks, "node", "blk")
    val sD = Graph.modularityEdgeStats(e.where(isNew), "src", "dst",
      blocks, "node", "blk")
    val merged = sB.unionByName(sD).groupBy("blk")
      .agg(sum("int_inc").as("int_inc"), sum("d_sum").as("d_sum"))
    val got = Graph.modularityFromStats(merged)
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Graph.modularityByBlock(e, "src", "dst", blocks,
        "node", "blk")
      .select("block", "e_in", "d_sum", "q_num")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want)
  }

  // ---- win_streak (gaps-and-islands) -------------------------------------

  test("gaps-and-islands streaks: closed-form day runs") {
    // user 1: days 1,2,3, 7,8, 20 → streaks 3,2,1; user 2: 5 → 1
    val e = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 7L), (1L, 8L),
      (1L, 20L), (2L, 5L))
      .map { case (u, d) => (u, d * 86400000L, u * 100 + d) }
      .toDF("user_id", "ts_ms", "event_id")
    val days = e.select(col("user_id"),
        call_function("div", col("ts_ms"), lit(86400000L)).as("day"))
      .distinct()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("day")
    val got = days
      .withColumn("grp", col("day") - row_number().over(w).cast("long"))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id")
      .agg(sum("len").as("n_days"), count(lit(1)).as("n_streaks"),
        max("len").as("best_streak"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((1L, 6L, 3L, 3L), (2L, 1L, 1L, 1L)))
  }

  test("temperatureMix raises loudly when a quota exceeds its source") {
    // force it: one huge source and one 1-row source whose √-share
    // exceeds 1 → quota 2 > n_s 1 is impossible by √ monotonicity, so
    // instead check the n_s >= 2^52 sqrt fence path compiles by proxy:
    // a degenerate budget larger than the corpus must raise on SOME
    // source (quota > n_s forced by pigeonhole)
    val rows = (1L to 10L).map(i => (i, if (i <= 9) "a" else "b"))
      .toDF("id", "src")
    val e = intercept[Exception] {
      Sampling.temperatureMix(rows, "src", col("id").cast("string"),
        total = 11L, salt = "t").collect()
    }
    assert(e.getMessage != null)
  }
}
