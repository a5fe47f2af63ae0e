package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.Graph
import graft.ops.Pin.PinOps

/** Round-10 third batch: engagement/session analytics that every event
  * warehouse ships (gaps-and-islands streaks, top-k user journeys) and
  * the 15th inc_* identity — modularity sufficient statistics merged
  * across an edge split. All exact integers. */
object Pipeline19Queries {

  type Q = (SparkSession, String) => DataFrame

  private val Day = 86400000L // ms per day — streak grain
  private val TriK = 10       // evt_trigrams top-k

  val queries: Map[String, Q] = Map(

    "win_streak" -> ((s, dir) => {
      // gaps-and-islands: longest run of CONSECUTIVE active days per
      // user (day − row_number over the user's distinct days is
      // constant within an island). Classic retention/engagement
      // metric; both windows are user-keyed, so the shuffle key is the
      // user and skew AQE-splits. Exact: day grain is integer ms-div.
      val days = Tables.events(s, dir)
        .select(col("user_id"),
          call_function("div", col("ts_ms"), lit(Day)).as("day"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      days
        .withColumn("grp",
          col("day") - row_number().over(w).cast("long"))
        .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(sum("len").as("n_days"),
          count(lit(1)).as("n_streaks"),
          max("len").as("best_streak"))
        .orderBy("user_id")
    }),

    "evt_trigrams" -> ((s, dir) => {
      // top-k third-order user journeys: two keyed leads over each
      // user's ordered stream, (e1,e2,e3)-keyed counts that
      // partial-aggregate map-side, then a rank over the COUNT frame —
      // bounded by |event_type|³ (≤ 125 rows here), never the events.
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ms"), col("event_id"))
      val tri = Tables.events(s, dir)
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          col("event_type").as("e1"))
        .withColumn("e2", lead(col("e1"), 1).over(w))
        .withColumn("e3", lead(col("e1"), 2).over(w))
        .where(col("e3").isNotNull)
        .groupBy("e1", "e2", "e3").agg(count(lit(1)).as("n"))
      tri
        .withColumn("rnk", row_number().over(Window.orderBy(
            col("n").desc, col("e1").asc, col("e2").asc, col("e3").asc))
          .cast("long"))
        .where(col("rnk") <= TriK)
        .select("rnk", "e1", "e2", "e3", "n")
        .orderBy("rnk")
    }),

    "sim_ivfpq_recall" -> ((s, dir) => {
      // observability for the composed IVF+PQ trade: per-probe overlap
      // of the IVF+PQ top-5 with the exact float top-5 — completes the
      // measured-recall set (exact / LSH / quantized / PQ / IVF+PQ),
      // so the serving architecture's recall is a graded number, not a
      // hope. Mirrors sim_recall_quantized's shape.
      val emb = Tables.embeddings(s, dir)
      // pinned ONCE at query level (r15, the Pipeline29 convention):
      // unpinned, the quantize pass re-ran in kmeansInt8, pqTrainInt8
      // (sub-vectors + seed) and ivfIndex — 4 corpus passes per query
      val sk = graft.ops.Similarity.quantizeInt8(emb).pin()
      val km = graft.ops.Similarity.kmeansInt8(sk, 8, 2)
      val cells = graft.ops.Similarity.ivfIndex(sk, km.centroids)
        .select("vec_id", "cell")
      val pq = graft.ops.Similarity.pqTrainInt8(sk, m = 8, ksub = 8,
        iters = 2)
      val probes = emb.where(col("vec_id") % 50 === 0)
      val approx = graft.ops.Similarity.ivfpqTopK(cells, pq.codes,
          pq.codebook, km.centroids, probes, k = 5, nprobe = 2)
        .select("query_id", "neighbor_id")
      val exact = graft.ops.Similarity.bruteForceTopK(emb, probes, 5)
        .select("query_id", "neighbor_id")
      val common = exact.join(approx, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
      exact.select("query_id").distinct()
        .join(common, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n"), lit(0L)).as("n_common"))
        .orderBy("query_id")
    }),

    "dq_ks_verdict" -> ((s, dir) => {
      // the KS gate CLOSED: statistic + the α = 0.05 two-sample
      // critical-value decision, all integers — reject iff
      // D ≥ c(α)·√((n_a+n_b)/(n_a·n_b)), squared to
      // d_num² · 1000000 ≥ c²ₓ10⁶ · n_a·n_b·(n_a+n_b) with
      // c(0.05)² = 1.844082 (Smirnov's asymptotic c = 1.358 at 10⁻⁶
      // resolution). The early/late quantity eras differ only by
      // sampling noise, so the graded verdict is the NON-rejection —
      // the gate passing on undrifted data is as load-bearing as it
      // firing on drifted data.
      val ks = graft.ops.Quality.ksStat(
        Tables.lineitem(s, dir).where(year(col("l_shipdate")) < 1998),
        Tables.lineitem(s, dir).where(year(col("l_shipdate")) >= 1998),
        "l_quantity")
      // decimal(38,0) carries the products exactly (d_num ≤ n_a·n_b
      // ⇒ both sides stay under 28 digits at sf1) — int64 would wrap
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      ks.select(col("n_a"), col("n_b"), col("d_num"),
        (dec(col("d_num")) * dec(col("d_num")) * dec(lit(1000000L)) >=
          dec(lit(1844082L)) * dec(col("n_a")) * dec(col("n_b")) *
            dec(col("n_a") + col("n_b"))).as("drifted"))
    }),

    "inc_modularity_delta" -> ((s, dir) => {
      // the 15th inc_* identity, on the graph-metric family: per-block
      // modularity sufficient statistics (int_inc, d_sum) are per-EDGE
      // sums under a fixed partition, so an arriving edge batch adds
      // its own counts — base edges never re-scanned; m derives from
      // the merged frame. Scored over the nation partition of the
      // purchase graph; oracle is the full recompute.
      val blocks = Tables.customer(s, dir)
        .select((col("c_custkey") * 2).as("node"),
          col("c_nationkey").as("blk"))
        .unionByName(Tables.supplier(s, dir)
          .select((col("s_suppkey") * 2 + 1).as("node"),
            col("s_nationkey").as("blk")))
      val e = Pipeline8Queries.purchaseEdges(s, dir, symmetric = false)
      val isNew = pmod(col("src") * 31 + col("dst"), lit(7)) === 0
      val sB = Graph.modularityEdgeStats(e.where(!isNew), "src", "dst",
        blocks, "node", "blk")
      val sD = Graph.modularityEdgeStats(e.where(isNew), "src", "dst",
        blocks, "node", "blk")
      val merged = sB.unionByName(sD)
        .groupBy("blk")
        .agg(sum("int_inc").as("int_inc"), sum("d_sum").as("d_sum"))
      Graph.modularityFromStats(merged)
        .orderBy("block")
    })
  )

  val oracles: Map[String, String] = Map(

    "win_streak" ->
      s"""WITH e AS (SELECT DISTINCT user_id,
         |    epoch_ms(ts) // $Day AS day FROM events),
         |r AS (SELECT user_id, day,
         |    day - ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY day) AS grp FROM e),
         |s AS (SELECT user_id, grp, COUNT(*) AS len
         |      FROM r GROUP BY 1, 2)
         |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
         |  COUNT(*) AS n_streaks, CAST(MAX(len) AS BIGINT) AS best_streak
         |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "evt_trigrams" ->
      s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS t,
         |    event_id FROM events),
         |s AS (SELECT event_type AS e1,
         |    LEAD(event_type, 1) OVER w AS e2,
         |    LEAD(event_type, 2) OVER w AS e3
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
         |c AS (SELECT e1, e2, e3, COUNT(*) AS n FROM s
         |      WHERE e3 IS NOT NULL GROUP BY 1, 2, 3),
         |rk AS (SELECT e1, e2, e3, n,
         |    ROW_NUMBER() OVER (ORDER BY n DESC, e1, e2, e3) AS rnk
         |  FROM c)
         |SELECT CAST(rnk AS BIGINT) AS rnk, e1, e2, e3, n
         |FROM rk WHERE rnk <= $TriK ORDER BY rnk""".stripMargin,

    "sim_ivfpq_recall" -> {
      // composed from the two graded rankings' own oracles (the
      // sim_recall_quantized pattern)
      val ex = PipelineQueries.oracles("sim_cosine_topk")
      val iv = Pipeline18Queries.oracles("sim_ivfpq_topk")
      s"""WITH ex AS ($ex),
         |iv AS ($iv),
         |p AS (SELECT DISTINCT query_id FROM ex),
         |c AS (SELECT ex.query_id, COUNT(*) AS n FROM ex
         |  JOIN iv ON ex.query_id = iv.query_id
         |    AND ex.neighbor_id = iv.neighbor_id
         |  GROUP BY ex.query_id)
         |SELECT p.query_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_common
         |FROM p LEFT JOIN c ON p.query_id = c.query_id
         |ORDER BY p.query_id""".stripMargin
    },

    "dq_ks_verdict" -> {
      val ks = Pipeline17Queries.oracles("dq_ks_drift")
      s"""WITH ks AS ($ks)
         |SELECT n_a, n_b, d_num,
         |  (CAST(d_num AS HUGEINT) * d_num * 1000000 >=
         |   CAST(1844082 AS HUGEINT) * n_a * n_b * (n_a + n_b))
         |    AS drifted
         |FROM ks""".stripMargin
    },

    "inc_modularity_delta" ->
      // full recompute: merged base ⊎ delta stats must score like the
      // whole edge set
      """WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
        |    l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |bl AS (SELECT c_custkey * 2 AS node, c_nationkey AS blk
        |  FROM customer
        |  UNION ALL
        |  SELECT s_suppkey * 2 + 1, s_nationkey FROM supplier),
        |el AS (SELECT ba.blk AS bs, bb.blk AS bd
        |  FROM e0 JOIN bl ba ON ba.node = e0.src
        |  JOIN bl bb ON bb.node = e0.dst),
        |inc AS (SELECT bs AS blk, bd AS other FROM el
        |  UNION ALL SELECT bd, bs FROM el),
        |pb AS (SELECT blk,
        |    CAST(SUM(CASE WHEN blk = other THEN 1 ELSE 0 END)
        |      AS BIGINT) AS int_inc,
        |    COUNT(*) AS d_sum FROM inc GROUP BY blk),
        |st AS (SELECT CAST(SUM(d_sum) AS BIGINT) // 2 AS m FROM pb)
        |SELECT pb.blk AS block,
        |  CAST(pb.int_inc // 2 AS BIGINT) AS e_in, pb.d_sum,
        |  CAST(4 * st.m * (pb.int_inc // 2) - pb.d_sum * pb.d_sum
        |    AS BIGINT) AS q_num
        |FROM pb, st ORDER BY block""".stripMargin
  )
}
