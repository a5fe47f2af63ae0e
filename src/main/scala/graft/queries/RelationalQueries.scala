package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Fixtures._

/** Standard relational coverage over the TPC-H-ish star schema — the
  * "query capabilities" half of the engine (SURVEY §2.12: grouping sets /
  * rollup / cube, set ops, sorts/limits, exists/in joins, conditional
  * aggregation, JSON scalar ops). All money math in exact integer cents
  * (see Fixtures.cents) so double outputs hash identically to DuckDB. */
object RelationalQueries {

  val queries: Map[String, Q] = Map(

    "q1_agg" -> ((s, dir) => {
      // TPC-H Q1 shape: wide aggregate, partial-agg friendly
      val li = Tables.lineitem(s, dir)
      val disc = lit(100) - cents("l_discount")
      val tax = lit(100) + cents("l_tax")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          (sum(cents("l_quantity")).cast("double") / 100).as("sum_qty"),
          (sum(cents("l_extendedprice")).cast("double") / 100).as("sum_base_price"),
          (sum(cents("l_extendedprice") * disc).cast("double") / 10000).as("sum_disc_price"),
          (sum(cents("l_extendedprice") * disc * tax).cast("double") / 1000000).as("sum_charge"),
          (sum(cents("l_quantity")).cast("double") / 100 / count(lit(1))).as("avg_qty"),
          (sum(cents("l_extendedprice")).cast("double") / 100 / count(lit(1))).as("avg_price"),
          (sum(cents("l_discount")).cast("double") / 100 / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    "q2_rollup" -> ((s, dir) => {
      // hierarchical totals: ROLLUP(returnflag, linestatus)
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          (sum(cents("l_quantity")).cast("double") / 100).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    "q3_topk" -> ((s, dir) => {
      // join + agg + top-k → TakeOrderedAndProject, no global sort
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val disc = lit(100) - cents("l_discount")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        .agg((sum(cents("l_extendedprice") * disc).cast("double") / 10000).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    "q4_exists_agg" -> ((s, dir) => {
      // EXISTS-driven agg: orders having a heavy lineitem, per priority
      val o = Tables.orders(s, dir)
      val heavy = Tables.lineitem(s, dir).where(col("l_quantity") > 45)
        .select(col("l_orderkey").as("o_orderkey"))
      o.join(heavy, Seq("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    "q5_region_revenue" -> ((s, dir) => {
      // 5-way star join, dims broadcast; revenue per nation
      val r = Tables.region(s, dir)
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val disc = lit(100) - cents("l_discount")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((sum(cents("l_extendedprice") * disc).cast("double") / 10000).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),

    "q6_selective_filter" -> ((s, dir) => {
      // TPC-H Q6: highly selective scan-side filters (all pushed to parquet)
      val li = Tables.lineitem(s, dir)
      li.where(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
          cents("l_discount").between(5, 7) && col("l_quantity") < 24)
        .agg((sum(cents("l_extendedprice") * cents("l_discount"))
          .cast("double") / 10000).as("revenue"),
          count(lit(1)).as("n"))
    }),

    "q7_intersect" -> ((s, dir) => {
      // INTERSECT surface: customers ordering in both 1995 and 1996
      val o = Tables.orders(s, dir)
      val y95 = o.where(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.where(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.intersect(y96).orderBy("o_custkey")
    }),

    "q8_union_distinct" -> ((s, dir) => {
      // UNION (distinct) of two key sets
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
      c.union(su).distinct().orderBy("nationkey")
    }),

    "q9_except" -> ((s, dir) => {
      // EXCEPT (distinct) as a surface op: nations with customers but no
      // suppliers
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
      val su = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
      c.except(su).orderBy("nationkey")
    }),

    "q10_cube" -> ((s, dir) => {
      // CUBE over segment × nation: all grouping-set combinations
      Tables.customer(s, dir)
        .cube(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          (sum(cents("c_acctbal")).cast("double") / 100).as("sum_bal"))
        .orderBy(col("c_mktsegment").asc_nulls_first,
          col("c_nationkey").asc_nulls_first)
    }),

    "q12_case_agg" -> ((s, dir) => {
      // conditional aggregation (TPC-H Q12 shape)
      val o = Tables.orders(s, dir)
      o.groupBy("o_orderstatus")
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("high_line_count"),
          sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L)).as("low_line_count"))
        .orderBy("o_orderstatus")
    }),

    "ord_limit_offset" -> ((s, dir) => {
      // global sort + OFFSET/LIMIT pagination
      Tables.orders(s, dir)
        .select(col("o_orderkey"), cents("o_totalprice").as("price_cents"))
        .orderBy(col("price_cents").desc, col("o_orderkey").asc)
        .offset(10).limit(10)
    }),

    "set_anti_customers" -> ((s, dir) => {
      // EXCEPT-shaped: customers with no orders (left_anti)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      c.join(o.select(col("o_custkey").as("c_custkey")), Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    "w1_window_rank" -> ((s, dir) => {
      // ranking + analytic lag per nation (§2.12: beyond row_number)
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .withColumn("prev_bal", lag(col("c_acctbal"), 1).over(w))
        .where(col("rnk") <= 3)
        .select("c_nationkey", "rnk", "c_custkey", "c_acctbal", "prev_bal")
        .orderBy("c_nationkey", "rnk")
    }),

    "approx_distinct" -> ((s, dir) => {
      // HLL sketch next to the exact distinct per event type. The sketch
      // VALUE is engine-specific (DuckDB cannot reproduce it), so the
      // graded output is the deterministic INVARIANT instead: the HLL
      // estimate lands within 5% of the exact count (rsd=0.02 gives 2.5×
      // headroom on the bound, and small-cardinality sparse mode is
      // near-exact anyway). `approx_ok` is integer-exact math — no
      // float hashing — and the oracle reproduces the exact side + TRUE.
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users")) * 20
            <= col("exact_users")).as("approx_ok"))
        .orderBy("event_type")
    }),

    "approx_percentile" -> ((s, dir) => {
      // quantile sketch next to the exact path (agg_quantiles). Like
      // approx_distinct, the graded output is the sketch's deterministic
      // INVARIANT, not its value: the empirical CDF position of each
      // approximate quantile sits within ±5 percentile points of its
      // target (the GK guarantee at accuracy=1000 is ±0.1% rank error,
      // so the 5-point bound holds for ANY partition merge order).
      // cnt_lt/cnt_le are exact integer counts against the returned
      // element; the booleans are integer cross-multiplications.
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), cents("l_quantity").as("qc"))
      val aq = li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(qc, array(0.25, 0.5, 0.75), 1000)")
          .as("approx_q"), count(lit(1)).as("n"))
        .select(col("l_returnflag").as("rf"), col("n"),
          element_at(col("approx_q"), 1).as("a25"),
          element_at(col("approx_q"), 2).as("a50"),
          element_at(col("approx_q"), 3).as("a75"))
      def ok(a: Column, pct: Int) = {
        val lt = sum(when(col("qc") < a, 1L).otherwise(0L))
        val le = sum(when(col("qc") <= a, 1L).otherwise(0L))
        (lt * 100 <= col("n") * (pct + 5)) &&
          (le * 100 >= col("n") * (pct - 5))
      }
      li.join(broadcast(aq), li("l_returnflag") === aq("rf"))
        .groupBy(col("l_returnflag"), col("n"))
        .agg(ok(col("a25"), 25).as("ok25"), ok(col("a50"), 50).as("ok50"),
          ok(col("a75"), 75).as("ok75"))
        .select("l_returnflag", "n", "ok25", "ok50", "ok75")
        .orderBy("l_returnflag")
    }),

    "json_get" -> ((s, dir) => {
      // JSON scalar extraction over the document column (events.props)
      Tables.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")
    })
  )

  val oracles: Map[String, String] = Map(

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(${centsSql("l_quantity")}) AS DOUBLE) / 100 AS sum_qty,
         |  CAST(SUM(${centsSql("l_extendedprice")}) AS DOUBLE) / 100 AS sum_base_price,
         |  CAST(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS DOUBLE) / 10000 AS sum_disc_price,
         |  CAST(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")}) * (100 + ${centsSql("l_tax")})) AS DOUBLE) / 1000000 AS sum_charge,
         |  CAST(SUM(${centsSql("l_quantity")}) AS DOUBLE) / 100 / COUNT(*) AS avg_qty,
         |  CAST(SUM(${centsSql("l_extendedprice")}) AS DOUBLE) / 100 / COUNT(*) AS avg_price,
         |  CAST(SUM(${centsSql("l_discount")}) AS DOUBLE) / 100 / COUNT(*) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |  CAST(SUM(${centsSql("l_quantity")}) AS DOUBLE) / 100 AS sum_qty
         |FROM lineitem
         |GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q3_topk" ->
      s"""SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
         |  CAST(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS DOUBLE) / 10000 AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
         |ORDER BY revenue DESC, l_orderkey ASC
         |LIMIT 10""".stripMargin,

    "q4_exists_agg" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name,
         |  CAST(SUM(${centsSql("l_extendedprice")} * (100 - ${centsSql("l_discount")})) AS DOUBLE) / 10000 AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin,

    "q6_selective_filter" ->
      s"""SELECT
         |  CAST(SUM(${centsSql("l_extendedprice")} * ${centsSql("l_discount")}) AS DOUBLE) / 10000 AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
         |  AND ${centsSql("l_discount")} BETWEEN 5 AND 7
         |  AND l_quantity < 24""".stripMargin,

    "q7_intersect" ->
      """SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,

    "q8_union_distinct" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION
        |  SELECT s_nationkey AS nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,

    "q9_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q10_cube" ->
      s"""SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
         |  CAST(SUM(${centsSql("c_acctbal")}) AS DOUBLE) / 100 AS sum_bal
         |FROM customer
         |GROUP BY CUBE(c_mktsegment, c_nationkey)
         |ORDER BY c_mktsegment ASC NULLS FIRST, c_nationkey ASC NULLS FIRST""".stripMargin,

    "q12_case_agg" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "ord_limit_offset" ->
      s"""SELECT o_orderkey, ${centsSql("o_totalprice")} AS price_cents
         |FROM orders
         |ORDER BY price_cents DESC, o_orderkey ASC
         |LIMIT 10 OFFSET 10""".stripMargin,

    "set_anti_customers" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "w1_window_rank" ->
      """SELECT c_nationkey, rnk, c_custkey, c_acctbal, prev_bal FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk,
        |    LAG(c_acctbal, 1) OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey ASC) AS prev_bal
        |  FROM customer) WHERE rnk <= 3
        |ORDER BY c_nationkey, rnk""".stripMargin,

    "json_get" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  COUNT(*) AS n
        |FROM events GROUP BY k ORDER BY k""".stripMargin,

    // sketch invariants: the oracle reproduces the EXACT side and asserts
    // the Spark-side error-bound booleans are all TRUE (the sketch values
    // themselves are engine-specific and deliberately not graded)
    "approx_distinct" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS approx_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "approx_percentile" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  TRUE AS ok25, TRUE AS ok50, TRUE AS ok75
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
