package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps
import graft.Tables
import graft.ops.{Graph, Ranks, Skyline}
import Fixtures._

/** Round-8 batch 8: state, centrality, segmentation — the streaming
  * count-min sketch (the aggregation state IS the sketch: bounded cells,
  * no watermark needed, any batching yields the batch answer),
  * incremental skyline maintenance (the frontier is a sufficient state —
  * the 10th inc_* identity), harmonic closeness from a seed set (floored
  * integer reciprocal sums over per-source BFS), and RFM quartile
  * segmentation (exact rank-statistic thresholds broadcast back — the
  * value-threshold bucketing that scales where per-row ntile cannot).
  */
object Pipeline14Queries {

  type Q = (SparkSession, String) => DataFrame

  private val CmsDepth = 4
  private val CmsWidth = 64
  private val ClosenessRounds = 3
  private val ClosenessScale = 1000000L

  /** Unsigned 32-bit Java hash in DuckDB (the Pipeline11 convention). */
  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"""(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"""
  }

  /** Documents as (doc_id, n_chars, n_toks) skyline points — shared by
    * doc_skyline's incremental twin. */
  private def docPoints(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val toks = d.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("doc_id").agg(countDistinct(col("tok")).as("n_toks"))
    d.select(col("doc_id"), col("n_chars")).join(toks, "doc_id")
  }

  val queries: Map[String, Q] = Map(

    "stream_cms" -> ((s, dir) => {
      // streaming count-min sketch over user activity, drained complete-
      // mode: the state is the 4x64 cell grid — bounded by the SKETCH,
      // not the key space, and watermark-free because cells are pure
      // additive counts. The final emission must equal the batch sketch
      // cell-for-cell for any batching (StreamSplitDrainSpec proves a
      // >= 3-batch split drain agrees).
      StreamDrains.drain(s,
          StreamDrains.cmsPipeline(Pipeline6Queries.eventsStream(s, dir)),
          "complete", "scm")
        .orderBy("rw", "bucket")
    }),

    "inc_skyline" -> ((s, dir) => {
      // incremental Pareto-frontier maintenance: the stored frontier of
      // the base slice (doc_id % 7 != 0) absorbs the arriving slice
      // without rescanning base rows — skyline(B ∪ D) =
      // skyline(skyline(B) ⊎ points(D)), exact because added points
      // only ever shrink the frontier. Graded against the full-corpus
      // skyline oracle VERBATIM (the inc_tri_delta convention) — the
      // 10th inc_* identity.
      val pts = docPoints(s, dir).pin()
      val frontier = Skyline.skyline2d(
        pts.where(col("doc_id") % 7 =!= 0),
        col("n_chars"), col("n_toks"))
      Skyline.skylineMerge(frontier,
          pts.where(col("doc_id") % 7 === 0),
          col("n_chars"), col("n_toks"))
        .orderBy("x")
    }),

    "graph_closeness" -> ((s, dir) => {
      // harmonic closeness of seed suppliers over the DEGREE-BOUNDED
      // top-5 co-occurrence graph (the graph_walks convention — per-
      // source frontier ops belong on bounded-degree graphs; the raw
      // purchase graph's supplier fanout multiplies |seeds|×frontier
      // into millions): Σ ⌊10⁶/d⌋ over reached vertices within 3 hops
      // — which association hubs sit closest to the rest of the
      // catalog. State bounded at |seeds| × Σ deg^h.
      val topk = Graph.cooccurTopK(Tables.lineitem(s, dir),
        "l_orderkey", "l_suppkey", k = 5)
      val ce = topk.select(
          least(col("item"), col("co_item")).as("lo"),
          greatest(col("item"), col("co_item")).as("hi"))
        .distinct()
      val sym = ce.select(explode(array(
          struct(col("lo").as("src"), col("hi").as("dst")),
          struct(col("hi").as("src"), col("lo").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val seeds = Tables.supplier(s, dir)
        .where(col("s_suppkey") % 20 === 0)
        .select(col("s_suppkey").as("node"))
      Graph.harmonicCloseness(sym, "src", "dst", seeds, "node",
          rounds = ClosenessRounds, scale = ClosenessScale)
        .orderBy("src")
    }),

    "evt_rfm" -> ((s, dir) => {
      // RFM segmentation: per customer, recency (days since last order
      // at the corpus horizon), frequency (orders), monetary (cents);
      // quartile buckets by EXACT rank-statistic thresholds (value at
      // rank ⌈n/4⌉, ⌈n/2⌉, ⌈3n/4⌉) broadcast back as a 1-row frame —
      // value-threshold bucketing, so assignment is a broadcast compare
      // at any scale (per-row ntile would drag every row through one
      // global window). Ranks over the customer-cardinality aggregate
      // come from Ranks.globalRowNumber — range-partitioned rank, P
      // parallel sorts, never a whole-dimension single-task Window.
      val o = Tables.orders(s, dir)
      val horizon = o.agg(max(col("o_orderdate").cast("date")).as("dmax"))
      val met = o.groupBy(col("o_custkey").as("cust"))
        .agg(max(col("o_orderdate").cast("date")).as("last"),
          count(lit(1)).as("f"), sum(cents("o_totalprice")).as("m"))
        .crossJoin(broadcast(horizon))
        .select(col("cust"),
          datediff(col("dmax"), col("last")).cast("long").as("r"),
          col("f"), col("m"))
        .pin() // referenced by 3 rank passes + the bucket join
      val nRow = met.agg(count(lit(1)).as("n"))
      def rn(df: DataFrame, c: String) =
        Ranks.globalRowNumber(df, s"rn_$c", numRanges = 8,
          col(c).asc, col("cust").asc)
      val withRn = rn(rn(rn(met, "r"), "f"), "m")
        .crossJoin(broadcast(nRow))
      val q1 = call_function("div", col("n") + 3, lit(4L))
      val q2 = call_function("div", col("n") + 1, lit(2L))
      val q3 = call_function("div", lit(3L) * col("n") + 3, lit(4L))
      def cut(rnCol: String, v: String, rank: org.apache.spark.sql.Column,
              out: String) =
        max(when(col(rnCol) === rank, col(v))).as(out)
      val cuts = withRn.agg(
        cut("rn_r", "r", q1, "r1"), cut("rn_r", "r", q2, "r2"),
        cut("rn_r", "r", q3, "r3"),
        cut("rn_f", "f", q1, "f1"), cut("rn_f", "f", q2, "f2"),
        cut("rn_f", "f", q3, "f3"),
        cut("rn_m", "m", q1, "m1"), cut("rn_m", "m", q2, "m2"),
        cut("rn_m", "m", q3, "m3"))
      def bucket(v: String, c1: String, c2: String, c3: String) =
        (lit(1L) + when(col(v) > col(c1), 1L).otherwise(0L)
          + when(col(v) > col(c2), 1L).otherwise(0L)
          + when(col(v) > col(c3), 1L).otherwise(0L))
      met.crossJoin(broadcast(cuts))
        .select(col("cust"), col("r"), col("f"), col("m"),
          bucket("r", "r1", "r2", "r3").as("br"),
          bucket("f", "f1", "f2", "f3").as("bf"),
          bucket("m", "m1", "m2", "m3").as("bm"))
        .orderBy("cust")
    })
  )

  // ------------------------------------------------------------------

  val oracles: Map[String, String] = Map(

    "stream_cms" -> {
      val cellSql = huSql(
        "CAST(r.rw AS VARCHAR) || ':cms:' || CAST(t.k AS VARCHAR)")
      s"""WITH rws AS (SELECT CAST(ii AS BIGINT) AS rw
         |  FROM unnest(range(0, $CmsDepth)) AS u(ii)),
         |tok AS (SELECT user_id AS k FROM events),
         |cells AS (SELECT r.rw, $cellSql % $CmsWidth AS bucket,
         |    COUNT(*) AS cnt
         |  FROM tok t CROSS JOIN rws r GROUP BY 1, 2)
         |SELECT rw, bucket, cnt FROM cells
         |ORDER BY rw, bucket""".stripMargin
    },

    // the full-corpus skyline, VERBATIM doc_skyline — the incremental
    // path must land on the one-shot answer (inc_tri_delta convention)
    "inc_skyline" -> Pipeline13Queries.oracles("doc_skyline"),

    "graph_closeness" -> {
      val rounds = (0 until ClosenessRounds).map { i =>
        s"""d${i + 1} AS (SELECT src, node, MIN(dist) AS dist FROM (
           |    SELECT src, node, dist FROM d$i
           |    UNION ALL
           |    SELECT d$i.src, a.n, d$i.dist + 1 FROM d$i
           |    JOIN adj a ON a.v = d$i.node)
           |  GROUP BY src, node)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${Pipeline12Queries.walkEdgeCtes},
         |d0 AS (SELECT DISTINCT s_suppkey AS src,
         |    s_suppkey AS node, CAST(0 AS BIGINT) AS dist
         |  FROM supplier WHERE s_suppkey % 20 = 0),
         |$rounds
         |SELECT src, COUNT(*) AS n_reached,
         |  CAST(SUM($ClosenessScale // dist) AS BIGINT) AS closeness
         |FROM d$ClosenessRounds WHERE dist > 0
         |GROUP BY src ORDER BY src""".stripMargin
    },

    "evt_rfm" ->
      s"""WITH hz AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS dmax
         |  FROM orders),
         |met AS (SELECT o_custkey AS cust,
         |    CAST(date_diff('day', MAX(CAST(o_orderdate AS DATE)),
         |      (SELECT dmax FROM hz)) AS BIGINT) AS r,
         |    COUNT(*) AS f,
         |    CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS m
         |  FROM orders GROUP BY 1),
         |rn AS (SELECT cust, r, f, m,
         |    ROW_NUMBER() OVER (ORDER BY r, cust) AS rn_r,
         |    ROW_NUMBER() OVER (ORDER BY f, cust) AS rn_f,
         |    ROW_NUMBER() OVER (ORDER BY m, cust) AS rn_m,
         |    COUNT(*) OVER () AS n
         |  FROM met),
         |cuts AS (SELECT
         |    MAX(CASE WHEN rn_r = (n+3)//4 THEN r END) AS r1,
         |    MAX(CASE WHEN rn_r = (n+1)//2 THEN r END) AS r2,
         |    MAX(CASE WHEN rn_r = (3*n+3)//4 THEN r END) AS r3,
         |    MAX(CASE WHEN rn_f = (n+3)//4 THEN f END) AS f1,
         |    MAX(CASE WHEN rn_f = (n+1)//2 THEN f END) AS f2,
         |    MAX(CASE WHEN rn_f = (3*n+3)//4 THEN f END) AS f3,
         |    MAX(CASE WHEN rn_m = (n+3)//4 THEN m END) AS m1,
         |    MAX(CASE WHEN rn_m = (n+1)//2 THEN m END) AS m2,
         |    MAX(CASE WHEN rn_m = (3*n+3)//4 THEN m END) AS m3
         |  FROM rn)
         |SELECT cust, r, f, m,
         |  CAST(1 + (CASE WHEN r > c.r1 THEN 1 ELSE 0 END)
         |    + (CASE WHEN r > c.r2 THEN 1 ELSE 0 END)
         |    + (CASE WHEN r > c.r3 THEN 1 ELSE 0 END) AS BIGINT) AS br,
         |  CAST(1 + (CASE WHEN f > c.f1 THEN 1 ELSE 0 END)
         |    + (CASE WHEN f > c.f2 THEN 1 ELSE 0 END)
         |    + (CASE WHEN f > c.f3 THEN 1 ELSE 0 END) AS BIGINT) AS bf,
         |  CAST(1 + (CASE WHEN m > c.m1 THEN 1 ELSE 0 END)
         |    + (CASE WHEN m > c.m2 THEN 1 ELSE 0 END)
         |    + (CASE WHEN m > c.m3 THEN 1 ELSE 0 END) AS BIGINT) AS bm
         |FROM met, cuts c ORDER BY cust""".stripMargin
  )
}
