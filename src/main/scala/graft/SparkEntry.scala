package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY §2 (or a required
  * extension), expressed Spark-first, with a DuckDB-equivalent oracle in
  * [[oracleSql]]. Column names are aliased identically on both sides (the
  * driver's compare sorts columns by name before hashing values), and all
  * floating-point outputs are derived from exact integer arithmetic so the
  * hashes are bit-stable across engines.
  */
object SparkEntry {

  // ---- shared fixture constants (deterministic, SF-independent) ----
  /** 2024-01-21T00:00:00Z — splits the events table into "target" (before)
    * and "delta" (after) slices for the sync-algebra queries. */
  private val CutMs = 1705795200000L
  /** 2024-01-26T00:00:00Z — target extends past CutMs so the delta overlap
    * [Cut, Cut2) produces genuine updates, not just inserts. */
  private val Cut2Ms = 1706227200000L

  // ---- exact-money helpers: doubles derived from integer cents are
  // bit-identical across Spark and DuckDB (no FP summation order issues) --
  private def cents(c: String): Column = round(col(c) * 100).cast("long")
  /** DuckDB spelling of [[cents]]. */
  private def centsSql(c: String): String = s"CAST(ROUND($c * 100) AS BIGINT)"

  // ---- sync-algebra fixtures over `events` (FIXTURES.md §B mapping) ----
  private def sri(s: SparkSession, dir: String): DataFrame =
    Tables.sriEvents(s, dir)

  /** target state: everything modified before Cut2. Filter applied on the
    * raw nanos `ts` pre-projection so it reaches the parquet scan
    * (ts < c*1e6 ⟺ floor(ts/1e6) < c for the fixture's positive range). */
  private def sriTarget(s: SparkSession, dir: String): DataFrame =
    Tables.sriProject(
      Tables.events(s, dir).where(col("ts") < lit(Cut2Ms * 1000000L)))

  /** staged delta pages: everything from Cut on, minus tombstones, with
    * purchase payloads patched so the overlap produces real updates. */
  private def sriStaged(s: SparkSession, dir: String): DataFrame =
    Tables.sriProject(
      Tables.events(s, dir).where(col("ts") >= lit(CutMs * 1000000L) &&
        col("event_type") =!= "error"))
      .withColumn("jsondata",
        when(col("resourcetype") === "purchase",
          regexp_replace(col("jsondata"), "\\}$", ", \"patched\": true}"))
          .otherwise(col("jsondata")))

  /** tombstone rows: `error` events from Cut on, delete-row shape (P3). */
  private def sriTombstones(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .where(col("ts") >= lit(CutMs * 1000000L) && col("event_type") === "error")
      .select(concat(lit("/events/"), col("event_id")).as("href"))

  /** DuckDB CTE prefix mirroring the three fixtures above. */
  private val sriCtes: String =
    s"""WITH sri AS (${Tables.sriEventsSql}),
       |starget AS (SELECT * FROM sri WHERE modified_ms < $Cut2Ms),
       |sstaged AS (
       |  SELECT href, key, modified_ms,
       |         CASE WHEN resourcetype = 'purchase'
       |              THEN regexp_replace(jsondata, '\\}$$', ', "patched": true}')
       |              ELSE jsondata END AS jsondata,
       |         resourcetype
       |  FROM sri WHERE modified_ms >= $CutMs AND resourcetype <> 'error'),
       |stomb AS (SELECT href FROM sri
       |          WHERE modified_ms >= $CutMs AND resourcetype = 'error'),
       |sdedup AS (
       |  SELECT href, key, modified_ms, jsondata, resourcetype FROM (
       |    SELECT s.*, ROW_NUMBER() OVER (PARTITION BY href
       |      ORDER BY modified_ms DESC, href ASC, jsondata ASC NULLS FIRST) AS rn
       |    FROM sstaged s) WHERE rn = 1),
       |slive AS (SELECT d.* FROM sdedup d
       |          WHERE NOT EXISTS (SELECT 1 FROM stomb t WHERE t.href = d.href))
       |""".stripMargin

  private val sriCols = Seq("href", "key", "modified_ms", "jsondata", "resourcetype")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full deltaSync merge plan: scan → project → window-dedup →
    * anti-joins → union (SURVEY §7.1 P0). */
  def entry(spark: SparkSession): DataFrame =
    queries("merge_delta")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---------- sync algebra (SURVEY §2.4/§2.5: J1–J6, A1, A2, W3) -------
    "j1_delete_semijoin" -> ((s, dir) => {
      Diff.deleteByKeys(sriTarget(s, dir), sriTombstones(s, dir), Seq("href"))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j2_prune_absent" -> ((s, dir) => {
      // full-sync prune: target rows whose key is absent from the snapshot
      // (snapshot = even-keyed events) are the delete set
      val snapshot = sri(s, dir).where(col("key").cast("long") % 2 === 0)
      Diff.pruneAbsent(sriTarget(s, dir), snapshot, Seq("href"))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j3_changed_rows" -> ((s, dir) => {
      Diff.changedRows(sriTarget(s, dir), sriStaged(s, dir), Seq("href"), "jsondata")
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j4_new_rows" -> ((s, dir) => {
      val deduped = Dedup.keepLatest(sriStaged(s, dir))
      Diff.newRows(sriTarget(s, dir), deduped, Seq("href"))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j5_keep_members" -> ((s, dir) => {
      // membership reconciliation: authoritative list = non-error events
      val members = sri(s, dir).where(col("resourcetype") =!= "error").select("href")
      Diff.keepMembers(sriTarget(s, dir), members, Seq("href"))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "j6_missing_members" -> ((s, dir) => {
      val members = sri(s, dir).select("href")
      Diff.missingMembers(members, sriTarget(s, dir), Seq("href"))
        .orderBy("href")
    }),

    "a1_dedup_keep_latest" -> ((s, dir) => {
      // latest event per user: the A1 window on a key that actually has
      // duplicates (hrefs are unique in the fixture; user_id is not)
      val ev = Tables.events(s, dir)
      Dedup.keepFirst(ev, Seq("user_id"),
          Seq(col("ts_ms").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
        .orderBy("user_id")
    }),

    "a2_watermark_max" -> ((s, dir) =>
      Watermark.candidate(sriStaged(s, dir))),

    "merge_delta" -> ((s, dir) => {
      Merge.delta(sriTarget(s, dir), sriStaged(s, dir), sriTombstones(s, dir))
        .select(sriCols.map(col): _*).orderBy("href")
    }),

    "merge_counts" -> ((s, dir) => {
      Merge.deltaActionCounts(sriTarget(s, dir), sriStaged(s, dir),
          sriTombstones(s, dir))
        .orderBy("action")
    }),

    // ---------- normalization / scalar fns (P2, F1, F2) ------------------
    "f1_f2_href_fns" -> ((s, dir) => {
      sri(s, dir).select(
        col("href"),
        Normalize.keyFromHref(col("href")).as("derived_key"),
        Normalize.pathFromHref(col("href")).as("derived_path"))
        .orderBy("href")
    }),

    // ---------- relational coverage over the TPC-H-ish star --------------
    "q1_agg" -> ((s, dir) => {
      // TPC-H Q1 shape; money in exact integer cents → bit-stable doubles
      val li = Tables.lineitem(s, dir)
      val disc = (lit(100) - cents("l_discount")) // (1-disc)*100, exact
      val tax = (lit(100) + cents("l_tax"))
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

    "q3_topk" -> ((s, dir) => {
      // join + agg + top-k: TakeOrderedAndProject, no global sort
      val c = Tables.customer(s, dir).where(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val disc = (lit(100) - cents("l_discount"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
        .agg((sum(cents("l_extendedprice") * disc).cast("double") / 10000).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    "q5_region_revenue" -> ((s, dir) => {
      // 5-way star join, dims broadcast; revenue per nation
      val r = Tables.region(s, dir)
      val n = Tables.nation(s, dir)
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val li = Tables.lineitem(s, dir)
      val disc = (lit(100) - cents("l_discount"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg((sum(cents("l_extendedprice") * disc).cast("double") / 10000).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
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
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .withColumn("rnk", row_number().over(w))
        .withColumn("prev_bal", lag(col("c_acctbal"), 1).over(w))
        .where(col("rnk") <= 3)
        .select("c_nationkey", "rnk", "c_custkey", "c_acctbal", "prev_bal")
        .orderBy("c_nationkey", "rnk")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(

    "j1_delete_semijoin" ->
      s"""${sriCtes}SELECT href, key, modified_ms, jsondata, resourcetype
         |FROM starget w
         |WHERE NOT EXISTS (SELECT 1 FROM stomb t WHERE t.href = w.href)
         |ORDER BY href""".stripMargin,

    "j2_prune_absent" ->
      s"""${sriCtes}SELECT href, key, modified_ms, jsondata, resourcetype
         |FROM starget w
         |WHERE NOT EXISTS (SELECT 1 FROM sri i
         |  WHERE CAST(i.key AS BIGINT) % 2 = 0 AND i.href = w.href)
         |ORDER BY href""".stripMargin,

    "j3_changed_rows" ->
      s"""${sriCtes}SELECT s.href, s.key, s.modified_ms, s.jsondata, s.resourcetype
         |FROM sstaged s JOIN starget t ON s.href = t.href
         |WHERE s.jsondata IS DISTINCT FROM t.jsondata
         |ORDER BY s.href""".stripMargin,

    "j4_new_rows" ->
      s"""${sriCtes}SELECT d.href, d.key, d.modified_ms, d.jsondata, d.resourcetype
         |FROM sdedup d
         |WHERE NOT EXISTS (SELECT 1 FROM starget t WHERE t.href = d.href)
         |ORDER BY d.href""".stripMargin,

    "j5_keep_members" ->
      s"""${sriCtes}SELECT href, key, modified_ms, jsondata, resourcetype
         |FROM starget w
         |WHERE EXISTS (SELECT 1 FROM sri m
         |  WHERE m.resourcetype <> 'error' AND m.href = w.href)
         |ORDER BY href""".stripMargin,

    "j6_missing_members" ->
      s"""${sriCtes}SELECT m.href FROM sri m
         |WHERE NOT EXISTS (SELECT 1 FROM starget t WHERE t.href = m.href)
         |ORDER BY m.href""".stripMargin,

    "a1_dedup_keep_latest" ->
      """SELECT user_id, event_id, ts_ms, event_type FROM (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |           ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "a2_watermark_max" ->
      s"${sriCtes}SELECT MAX(modified_ms) AS last_modified_ms FROM sstaged",

    "merge_delta" ->
      s"""${sriCtes}SELECT href, key, modified_ms, jsondata, resourcetype FROM (
         |  SELECT t.href, t.key, t.modified_ms, t.jsondata, t.resourcetype
         |  FROM starget t
         |  WHERE NOT EXISTS (SELECT 1 FROM stomb x WHERE x.href = t.href)
         |    AND NOT EXISTS (SELECT 1 FROM slive l WHERE l.href = t.href)
         |  UNION ALL
         |  SELECT href, key, modified_ms, jsondata, resourcetype FROM slive)
         |ORDER BY href""".stripMargin,

    "merge_counts" ->
      s"""${sriCtes}SELECT action, n FROM (
         |  SELECT 'delete' AS action, COUNT(*) AS n FROM starget w
         |    WHERE EXISTS (SELECT 1 FROM stomb t WHERE t.href = w.href)
         |  UNION ALL
         |  SELECT 'update' AS action, COUNT(*) AS n FROM slive s
         |    JOIN starget t ON s.href = t.href
         |    WHERE s.jsondata IS DISTINCT FROM t.jsondata
         |  UNION ALL
         |  SELECT 'insert' AS action, COUNT(*) AS n FROM slive s
         |    WHERE NOT EXISTS (SELECT 1 FROM starget t WHERE t.href = s.href))
         |ORDER BY action""".stripMargin,

    "f1_f2_href_fns" ->
      s"""${sriCtes}SELECT href,
         |  regexp_extract(href, '([^/]*)$$', 1) AS derived_key,
         |  regexp_replace(href, '/[^/]*$$', '') AS derived_path
         |FROM sri ORDER BY href""".stripMargin,

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
        |ORDER BY c_nationkey, rnk""".stripMargin
  )
}
