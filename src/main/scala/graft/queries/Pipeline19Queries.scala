package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.Graph

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
