package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import Fixtures._

/** Relational-depth coverage beyond the core inventory: grouping sets,
  * interval/range join, exact percentile, correlated scalar subqueries
  * (Catalyst decorrelation), string-function library. All oracle-checked. */
object ExtraQueries {

  val queries: Map[String, Q] = Map(

    "q13_grouping_sets" -> ((s, dir) => {
      // explicit GROUPING SETS with grouping() markers (beyond rollup/cube)
      Tables.events(s, dir)
        .withColumn("user_bucket", col("user_id") % 10)
        .createOrReplaceTempView("ev_gs")
      s.sql(s"""
        SELECT event_type, user_bucket,
               CAST(grouping(event_type) AS BIGINT) AS g_type,
               CAST(grouping(user_bucket) AS BIGINT) AS g_user,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
                 AS sum_value
        FROM ev_gs
        GROUP BY GROUPING SETS ((event_type), (user_bucket), ())
        ORDER BY g_type, g_user, event_type, user_bucket""")
    }),

    "range_join_prior_clicks" -> ((s, dir) => {
      // interval join: clicks of the same user within 1h before each error
      val ev = Tables.events(s, dir)
      val errors = ev.where(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts_ms").as("e_ts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_ms").as("c_ts"))
      errors.join(clicks,
          errors("user_id") === clicks("user_id") &&
            col("c_ts") >= col("e_ts") - 3600000L && col("c_ts") < col("e_ts"),
          "left_outer")
        .groupBy(col("event_id"), col("e_ts"))
        .agg(count(col("c_ts")).as("n_prior_clicks"))
        .orderBy("event_id")
    }),

    "agg_median" -> ((s, dir) => {
      // exact interpolated median over integer cents (deterministic
      // interpolation on exact values → bit-stable double)
      Tables.orders(s, dir)
        .select(col("o_orderstatus"), cents("o_totalprice").as("pc"))
        .groupBy("o_orderstatus")
        .agg(expr("percentile(pc, 0.5)").as("median_cents"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    }),

    "agg_quantiles" -> ((s, dir) => {
      // exact discrete quantiles (percentile_disc semantics: smallest
      // value with CDF ≥ q) spelled as one window sort per group over
      // integer cents — engine-exact, no interpolation. The ceil(q·n)
      // positions use pure integer DIV so both engines agree on ties.
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), cents("l_quantity").as("qc"))
        .createOrReplaceTempView("li_quant")
      s.sql("""
        SELECT l_returnflag,
          MIN(CASE WHEN rn >= (n + 3) DIV 4 THEN qc END) AS q25_cents,
          MIN(CASE WHEN rn >= (n + 1) DIV 2 THEN qc END) AS q50_cents,
          MIN(CASE WHEN rn >= (3 * n + 3) DIV 4 THEN qc END) AS q75_cents,
          MAX(qc) AS q100_cents
        FROM (SELECT l_returnflag, qc,
                ROW_NUMBER() OVER (PARTITION BY l_returnflag
                  ORDER BY qc) AS rn,
                COUNT(*) OVER (PARTITION BY l_returnflag) AS n
              FROM li_quant)
        GROUP BY l_returnflag ORDER BY l_returnflag""")
    }),

    "q17_correlated" -> ((s, dir) => {
      // correlated scalar subqueries (Catalyst decorrelates into joins):
      // lineitems lighter than half their part's average quantity.
      // Pure-integer predicate: 2 * n_part * qty < sum_part
      Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
          cents("l_quantity").as("qc"))
        .createOrReplaceTempView("li_corr")
      s.sql("""
        SELECT l_partkey, COUNT(*) AS n_light,
               SUM(qc) AS sum_light_cents
        FROM li_corr l1
        WHERE 2 * qc * (SELECT COUNT(*) FROM li_corr l2
                        WHERE l2.l_partkey = l1.l_partkey)
              < (SELECT SUM(qc) FROM li_corr l3
                 WHERE l3.l_partkey = l1.l_partkey)
        GROUP BY l_partkey
        ORDER BY l_partkey""")
    }),

    "txt_strfns" -> ((s, dir) => {
      // string-function library parity: case, padding, edit distance
      val d = Tables.documents(s, dir)
      val w = split(col("text"), " ")
      d.select(col("doc_id"),
          upper(substring(col("text"), 1, 12)).as("up"),
          lpad(col("lang"), 5, "_").as("lp"),
          levenshtein(element_at(w, 1), element_at(w, 2)).cast("long").as("lev"),
          reverse(element_at(w, 1)).as("rev"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(

    "q13_grouping_sets" ->
      """SELECT event_type, user_id % 10 AS user_bucket,
        |  GROUPING(event_type) AS g_type,
        |  GROUPING(user_id % 10) AS g_user,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100
        |    AS sum_value
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        |ORDER BY g_type, g_user, event_type, user_bucket""".stripMargin,

    "range_join_prior_clicks" ->
      """WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS e_ts
        |           FROM events WHERE event_type = 'error'),
        |c AS (SELECT user_id, epoch_ms(ts) AS c_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT e.event_id, e.e_ts, COUNT(c.c_ts) AS n_prior_clicks
        |FROM e LEFT JOIN c ON e.user_id = c.user_id
        |  AND c.c_ts >= e.e_ts - 3600000 AND c.c_ts < e.e_ts
        |GROUP BY e.event_id, e.e_ts
        |ORDER BY e.event_id""".stripMargin,

    "agg_median" ->
      """SELECT o_orderstatus,
        |  quantile_cont(CAST(ROUND(o_totalprice * 100) AS BIGINT), 0.5)
        |    AS median_cents,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "agg_quantiles" ->
      """WITH li AS (SELECT l_returnflag,
        |  CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc FROM lineitem),
        |w AS (SELECT l_returnflag, qc,
        |  ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY qc) AS rn,
        |  COUNT(*) OVER (PARTITION BY l_returnflag) AS n FROM li)
        |SELECT l_returnflag,
        |  MIN(CASE WHEN rn >= (n + 3) // 4 THEN qc END) AS q25_cents,
        |  MIN(CASE WHEN rn >= (n + 1) // 2 THEN qc END) AS q50_cents,
        |  MIN(CASE WHEN rn >= (3 * n + 3) // 4 THEN qc END) AS q75_cents,
        |  MAX(qc) AS q100_cents
        |FROM w GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q17_correlated" ->
      """WITH li AS (SELECT l_partkey,
        |  CAST(ROUND(l_quantity * 100) AS BIGINT) AS qc FROM lineitem)
        |SELECT l_partkey, COUNT(*) AS n_light,
        |  CAST(SUM(qc) AS BIGINT) AS sum_light_cents
        |FROM li l1
        |WHERE 2 * qc * (SELECT COUNT(*) FROM li l2
        |                WHERE l2.l_partkey = l1.l_partkey)
        |      < (SELECT SUM(qc) FROM li l3
        |         WHERE l3.l_partkey = l1.l_partkey)
        |GROUP BY l_partkey
        |ORDER BY l_partkey""".stripMargin,

    "txt_strfns" ->
      """SELECT doc_id,
        |  upper(substring(text, 1, 12)) AS up,
        |  lpad(lang, 5, '_') AS lp,
        |  levenshtein(string_split(text, ' ')[1], string_split(text, ' ')[2])
        |    AS lev,
        |  reverse(string_split(text, ' ')[1]) AS rev
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
