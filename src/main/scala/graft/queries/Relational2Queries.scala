package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Fixtures._

/** Second relational-coverage wave (round 2): pivot/unpivot reshaping,
  * multi-distinct aggregation, HAVING, uncorrelated scalar subqueries,
  * full-outer join, analytic frames beyond rank/lag (ntile, percent_rank,
  * cume_dist, first/last_value), and the array + date scalar-function
  * libraries (SURVEY §2.8/§2.12 "absent in reference; free from Spark").
  * All outputs derive from exact integer math so DuckDB hashes match. */
object Relational2Queries {

  val queries: Map[String, Q] = Map(

    "q11_multi_distinct" -> ((s, dir) => {
      // several DISTINCT aggregates in one pass (Catalyst expand)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    "q14_pivot" -> ((s, dir) => {
      // PIVOT: order counts per priority × status, missing combos → 0
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy("o_orderpriority")
    }),

    "q15_unpivot" -> ((s, dir) => {
      // UNPIVOT (melt): wide per-nation counts back to long form
      val cust = Tables.customer(s, dir)
        .groupBy(col("c_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"))
      val supp = Tables.supplier(s, dir)
        .groupBy(col("s_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"))
      cust.join(supp, Seq("nationkey"), "full_outer")
        .select(col("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .unpivot(Array(col("nationkey")),
          Array(col("n_cust"), col("n_supp")), "metric", "cnt")
        .orderBy("nationkey", "metric")
    }),

    "q16_having" -> ((s, dir) => {
      // join + distinct agg + HAVING filter on the aggregate
      val p = Tables.part(s, dir).where(col("p_size") <= 20)
      Tables.lineitem(s, dir)
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .where(col("supplier_cnt") > 10)
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
    }),

    "q18_scalar_subquery" -> ((s, dir) => {
      // uncorrelated scalar subqueries in SELECT (single-row broadcast)
      Tables.customer(s, dir).createOrReplaceTempView("cust_ss")
      Tables.orders(s, dir).createOrReplaceTempView("ord_ss")
      s.sql("""
        SELECT c_nationkey, COUNT(*) AS n_cust,
          (SELECT COUNT(*) FROM ord_ss) AS total_orders,
          (SELECT MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT))
             FROM ord_ss) AS max_price_cents
        FROM cust_ss GROUP BY c_nationkey ORDER BY c_nationkey""")
    }),

    "j7_full_outer" -> ((s, dir) => {
      // FULL OUTER join: nulls surface on both sides
      val l = Tables.customer(s, dir).where(col("c_nationkey") < 5)
        .select(col("c_custkey"), col("c_name"))
      val r = Tables.orders(s, dir)
        .where(year(col("o_orderdate")) === 1995)
        .groupBy("o_custkey").agg(count(lit(1)).as("n_1995"))
      l.join(r, l("c_custkey") === r("o_custkey"), "full_outer")
        .select(coalesce(l("c_custkey"), r("o_custkey")).as("custkey"),
          col("c_name"), col("n_1995"))
        .orderBy(col("custkey"))
    }),

    "w2_analytics" -> ((s, dir) => {
      // analytic battery: ntile / percent_rank / cume_dist / first+last
      // value with explicit frames; unique ordering keys → deterministic
      val ord = Window.partitionBy(col("c_nationkey"))
        .orderBy(cents("c_acctbal").desc, col("c_custkey").asc)
      val runUp = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val runDn = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_custkey"),
          cents("c_acctbal").as("bal_cents"),
          ntile(4).over(ord).cast("long").as("quartile"),
          percent_rank().over(ord).as("pr"),
          cume_dist().over(ord).as("cd"),
          first(cents("c_acctbal")).over(runUp).as("top_bal_cents"),
          last(cents("c_acctbal")).over(runDn).as("bottom_bal_cents"))
        .orderBy("c_nationkey", "c_custkey")
    }),

    "q19_disjunctive" -> ((s, dir) => {
      // TPC-H Q19 shape: OR of conjunctive brand/size/qty clauses. The
      // shared l_partkey = p_partkey stays an equi-join; the disjunction
      // is a residual filter (Catalyst extracts the common conjunct).
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      // no broadcast hint: part is dimension-sized here but grows with SF;
      // the size-based planner choice (pinned by PlanSpec for q3) is the
      // one that survives a 100x scale-up
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
      val clause1 = col("p_brand") === "Brand#1" &&
        col("p_size").between(1, 15) && col("l_quantity") >= 1 &&
        col("l_quantity") <= 30
      val clause2 = col("p_brand") === "Brand#2" &&
        col("p_size").between(10, 30) && col("l_quantity") >= 10 &&
        col("l_quantity") <= 40
      val clause3 = col("p_brand") === "Brand#3" &&
        col("p_size").between(20, 50) && col("l_quantity") >= 20
      j.where(clause1 || clause2 || clause3)
        .agg((sum(cents("l_extendedprice") * (lit(100) - cents("l_discount")))
          .cast("double") / 10000).as("revenue"),
          count(lit(1)).as("n"))
    }),

    "q20_nested_agg_subquery" -> ((s, dir) => {
      // nested aggregated subquery driving a semi-join (TPC-H Q20 shape):
      // suppliers whose shipped quantity of some part exceeds 1.5x that
      // part's average per-supplier quantity. Integer predicate:
      // 2 * n_supp * qty_supp_part > 3 * sum_part.
      // Spark-first plan: the oracle's nested form re-aggregates per_sp
      // and joins it back to itself; here the per-part totals come from a
      // window over the SAME per_sp frame — one aggregation, one window
      // shuffle, no self-join (per_sp is never computed twice), then a
      // broadcast join to the small supplier dim.
      Tables.lineitem(s, dir).createOrReplaceTempView("li_q20")
      Tables.supplier(s, dir).createOrReplaceTempView("supp_q20")
      s.sql("""
        WITH per_sp AS (
          SELECT l_partkey, l_suppkey,
                 SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qsp
          FROM li_q20 GROUP BY l_partkey, l_suppkey),
        sp_w AS (
          SELECT l_suppkey, qsp,
                 SUM(qsp)  OVER (PARTITION BY l_partkey) AS qp,
                 COUNT(*)  OVER (PARTITION BY l_partkey) AS nsupp
          FROM per_sp)
        SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_hot_parts
        FROM sp_w
        JOIN supp_q20 s ON sp_w.l_suppkey = s.s_suppkey
        WHERE 2 * sp_w.nsupp * sp_w.qsp > 3 * sp_w.qp
        GROUP BY s.s_suppkey, s.s_name
        ORDER BY s.s_suppkey""")
    }),

    "f13_array_fns" -> ((s, dir) => {
      // array function library: collect → sort → size/contains/max/join
      Tables.lineitem(s, dir)
        .groupBy("l_orderkey")
        .agg(
          array_join(sort_array(collect_list(col("l_linenumber").cast("string"))),
            ",").as("lines_csv"),
          size(collect_list(col("l_linenumber"))).cast("long").as("n_lines"),
          array_contains(collect_list(col("l_linenumber")), 5).as("has5"),
          array_max(collect_list(col("l_linenumber"))).cast("long").as("max_line"))
        .orderBy("l_orderkey")
    }),

    "f14_date_fns" -> ((s, dir) => {
      // date/time function library over order dates
      val d = col("o_orderdate").cast("date")
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
          year(d).cast("long").as("y"),
          quarter(d).cast("long").as("q"),
          dayofweek(d).cast("long").as("dow"),
          last_day(d).as("month_end"),
          date_add(d, 30).as("plus30"),
          datediff(d, lit("1995-01-01").cast("date")).cast("long").as("days_since"))
        .orderBy("o_orderkey")
    }),

    "f15_listagg" -> ((s, dir) => {
      // ordered string aggregation (LISTAGG/string_agg): deterministic by
      // sorting the collected set before joining — collect_set's partial
      // aggregation keeps the shuffle small (distinct values only)
      Tables.orders(s, dir)
        .groupBy("o_orderpriority")
        .agg(
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    })
  )

  val oracles: Map[String, String] = Map(

    "q11_multi_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q14_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
        |  COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q15_unpivot" ->
      """WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
        |             COUNT(*) AS n_cust FROM customer GROUP BY 1),
        |s AS (SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
        |        COUNT(*) AS n_supp FROM supplier GROUP BY 1),
        |w AS (SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |        COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
        |      FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey)
        |SELECT nationkey, metric, cnt FROM (
        |  SELECT nationkey, 'n_cust' AS metric, n_cust AS cnt FROM w
        |  UNION ALL
        |  SELECT nationkey, 'n_supp' AS metric, n_supp AS cnt FROM w)
        |ORDER BY nationkey, metric""".stripMargin,

    "q16_having" ->
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size <= 20
        |GROUP BY p_brand, p_size
        |HAVING COUNT(DISTINCT l_suppkey) > 10
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q18_scalar_subquery" ->
      """SELECT c_nationkey, COUNT(*) AS n_cust,
        |  (SELECT COUNT(*) FROM orders) AS total_orders,
        |  (SELECT MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        |     FROM orders) AS max_price_cents
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "j7_full_outer" ->
      """WITH l AS (SELECT c_custkey, c_name FROM customer
        |           WHERE c_nationkey < 5),
        |r AS (SELECT o_custkey, COUNT(*) AS n_1995 FROM orders
        |      WHERE EXTRACT(year FROM o_orderdate) = 1995
        |      GROUP BY o_custkey)
        |SELECT COALESCE(l.c_custkey, r.o_custkey) AS custkey,
        |       l.c_name AS c_name, r.n_1995 AS n_1995
        |FROM l FULL OUTER JOIN r ON l.c_custkey = r.o_custkey
        |ORDER BY custkey""".stripMargin,

    "w2_analytics" ->
      s"""SELECT c_nationkey, c_custkey,
         |  ${centsSql("c_acctbal")} AS bal_cents,
         |  NTILE(4) OVER w AS quartile,
         |  PERCENT_RANK() OVER w AS pr,
         |  CUME_DIST() OVER w AS cd,
         |  FIRST_VALUE(${centsSql("c_acctbal")}) OVER
         |    (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS top_bal_cents,
         |  LAST_VALUE(${centsSql("c_acctbal")}) OVER
         |    (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         |    AS bottom_bal_cents
         |FROM customer
         |WINDOW w AS (PARTITION BY c_nationkey
         |  ORDER BY ${centsSql("c_acctbal")} DESC, c_custkey ASC)
         |ORDER BY c_nationkey, c_custkey""".stripMargin,

    "q19_disjunctive" ->
      s"""SELECT
         |  CAST(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS DOUBLE) / 10000 AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity >= 1 AND l_quantity <= 30)
         |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
         |       AND l_quantity >= 10 AND l_quantity <= 40)
         |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
         |       AND l_quantity >= 20)""".stripMargin,

    "q20_nested_agg_subquery" ->
      """WITH per_sp AS (
        |  SELECT l_partkey, l_suppkey,
        |         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS qsp
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |per_p AS (
        |  SELECT l_partkey, SUM(qsp) AS qp, COUNT(*) AS nsupp
        |  FROM per_sp GROUP BY l_partkey)
        |SELECT s.s_suppkey, s.s_name, COUNT(*) AS n_hot_parts
        |FROM per_sp sp
        |JOIN per_p p ON sp.l_partkey = p.l_partkey
        |JOIN supplier s ON sp.l_suppkey = s.s_suppkey
        |WHERE 2 * p.nsupp * sp.qsp > 3 * p.qp
        |GROUP BY s.s_suppkey, s.s_name
        |ORDER BY s.s_suppkey""".stripMargin,

    "f13_array_fns" ->
      """SELECT l_orderkey,
        |  array_to_string(list_sort(list(CAST(l_linenumber AS VARCHAR))), ',')
        |    AS lines_csv,
        |  CAST(len(list(l_linenumber)) AS BIGINT) AS n_lines,
        |  list_contains(list(l_linenumber), 5) AS has5,
        |  CAST(list_max(list(l_linenumber)) AS BIGINT) AS max_line
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,

    "f14_date_fns" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |  EXTRACT(year FROM o_orderdate) AS y,
        |  EXTRACT(quarter FROM o_orderdate) AS q,
        |  dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
        |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |    AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "f15_listagg" ->
      """SELECT o_orderpriority,
        |  list_aggregate(list_sort(list_distinct(list(o_orderstatus))),
        |    'string_agg', ',') AS statuses,
        |  COUNT(*) AS n
        |FROM orders
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
  )
}
