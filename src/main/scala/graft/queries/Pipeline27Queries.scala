package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Blocking, Graph, TimeSeries}

/** Round-12 fifth batch: time-respecting temporal-graph reachability,
  * JSON parse-and-quarantine ingestion (the corrupt-record routing every
  * feed pipeline needs), and the seasonal-strength feature over the
  * classical decomposition (Hyndman's tsfeatures F_s).
  *
  * Reference scope note: the reference (sri2db) parses its feed JSON
  * with the platform parser and crashes on corruption
  * (/root/reference/src/lib/client.js JSON handling); the quarantine
  * form is the at-scale replacement. The temporal graph and tsfeatures
  * are north-star extensions.
  */
object Pipeline27Queries {

  type Q = (SparkSession, String) => DataFrame

  private val ReachRounds = 2 // c → p → c: one temporal alternation

  /** floor(P(Poisson(1) ≤ k)·2³²) for k = 0..6 — the bootstrap weight
    * cutoffs, shared verbatim with the oracle SQL. */
  private val BootCuts = Seq(1580030168L, 3160060337L, 3950075421L,
    4213413783L, 4279248373L, 4292415291L, 4294609777L)
  private val StlScale = 1000000L
  private val MilliDown = 1000L // strength squares on /1000 values

  val queries: Map[String, Q] = Map(

    "graph_temporal_reach" -> ((s, dir) => {
      // earliest-arrival time-respecting reachability over the
      // bipartite purchase graph (customer 2c ↔ part 2p+1, edge time =
      // epoch day of the order): from the nation-1 customer seeds, a
      // walk may only move along non-decreasing order dates — the
      // information-flow/contagion semantics a static BFS (graph_bfs)
      // cannot state. Horizon 2 = one full c→p→c alternation.
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
          datediff(col("o_orderdate").cast("date"),
            to_date(lit("1970-01-01"))).as("d"))
      val cp = li.join(o, "ok")
        .select((col("ck") * 2).as("u"), (col("pk") * 2 + 1).as("v"),
          col("d"))
      val edges = cp.unionByName(
        cp.select(col("v").as("u"), col("u").as("v"), col("d")))
      val seeds = Tables.customer(s, dir)
        .where(col("c_nationkey") === 1)
        .select((col("c_custkey") * 2).as("node"))
      Graph.temporalReach(edges, "u", "v", "d", seeds, "node",
          rounds = ReachRounds)
        .orderBy("node")
    }),

    "dq_json_quarantine" -> ((s, dir) => {
      // parse-and-quarantine ingestion: every 7th payload is corrupted
      // deterministically (brace-balance break), get_json_object routes
      // it to NULL instead of failing the job, and the gate reports
      // per-type row / quarantined / extracted-sum counts — the
      // corrupt-record pattern the reference's crash-on-bad-JSON
      // parser needs at scale.
      val pay = Fixtures.sri(s, dir).withColumn("payload",
        when(col("key").cast("long") % 7 === 0,
          expr("substring(jsondata, 1, length(jsondata) - 1)"))
          .otherwise(col("jsondata")))
      pay.withColumn("k",
          get_json_object(col("payload"), "$.k").cast("long"))
        .groupBy("resourcetype")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("k").isNull, 1L).otherwise(0L))
            .as("n_quarantined"),
          sum(coalesce(col("k"), lit(0L))).as("k_sum"))
        .orderBy("resourcetype")
    }),

    "samp_bootstrap" -> ((s, dir) => {
      // deterministic Poisson(1) bootstrap (the Owen/Eckles online
      // bootstrap — at scale one NEVER materializes resamples; each row
      // gets an i.i.d.-looking Poisson weight per replicate, derived
      // here from the row hash so replicates are reproducible and
      // oracle-checkable): 8 replicates of the per-priority
      // revenue-cents total/count. The Poisson CDF cutoffs are
      // precomputed u32 literals (floor(P(X ≤ k)·2³²), k = 0..6, tail
      // capped at 7) shared verbatim by engine and oracle — the
      // replicate spread is the bootstrap CI downstream.
      graft.expr.GraftFunctions.register(s)
      val o = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("pri"),
          col("o_orderkey").as("okey"),
          Fixtures.cents("o_totalprice").as("cts"))
        .select(col("pri"), col("okey"), col("cts"),
          explode(sequence(lit(0L), lit(7L))).as("r"))
      // java_hash alone has no low-bit avalanche on near-identical
      // strings (the HRW-degeneracy lesson — r11 verdict); mix32
      // restores uniformity, and the oracle replays the same rounds
      val u = graft.ops.Sampling.mix32(
        graft.expr.GraftFunctions.java_hash_u32(
          concat(lit("boot|"), col("okey"), lit("#"), col("r"))))
      val k = BootCuts.zipWithIndex.foldRight(lit(7L)) {
        case ((c, i), rest) => when(u < c, i.toLong).otherwise(rest) }
      o.select(col("pri"), col("r"), k.as("w"), col("cts"))
        .groupBy("pri", "r")
        .agg(count(lit(1)).as("n_rows"), sum(col("w")).as("w_sum"),
          sum(col("w") * col("cts")).as("wx_sum"))
        .orderBy("pri", "r")
    }),

    "ts_matrix_profile" -> ((s, dir) => {
      // exact matrix profile (Yeh et al. 2016) of the weekly
      // order-count series per priority, window 8, exclusion zone 8
      // (non-overlapping): per window the min squared Euclidean
      // distance to any other window + its argmin — motifs are the
      // small values, discords the large ones. Weekly grid keeps the
      // quadratic pair space calendar-bounded (≈ 340 windows per key
      // at ANY scale factor — the raw→series aggregate is the
      // distributed step).
      val wkly = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          call_function("div",
            datediff(col("o_orderdate").cast("date"),
              to_date(lit("1970-01-01"))), lit(7L)).as("wn"))
        .agg(count(lit(1)).as("x"))
      TimeSeries.matrixProfile(wkly, Seq("pri"), col("wn"), "x",
          w = 8, maxSeries = 400)
        .orderBy("pri", "i")
    }),

    "graph_c4" -> ((s, dir) => {
      // global wedge + 4-cycle census of the top-5 supplier
      // co-occurrence graph (the triangles fixture): the graphlet
      // feature pair beyond graph_triangles — C4 density sees
      // bipartite-ish structure triangles cannot. One row, exact.
      Graph.graphletCounts(
        Graph.cooccurTopK(Tables.lineitem(s, dir),
          "l_orderkey", "l_suppkey", k = 5),
        "item", "co_item")
    }),

    "inc_er_delta" -> ((s, dir) => {
      // the 21st inc_* identity, on the ER-blocking path: candidate
      // pairs are MONOTONE in the record set (a pair exists iff its two
      // records share a key value, independent of everything else), so
      // a batch arrival adds exactly the pairs touching it —
      // blockedPairs(B ∪ D) = stored ∪ blockedPairsDelta. Demonstrated
      // on the (name, size) CLASS frame (er_resolve's representative
      // contraction — the form that is linear at any SF): classes
      // absent from the base slice (p_partkey % 3 ≠ 0) are the
      // arrivals. Graded surface = the verified lev ≤ 2 near pairs
      // from the MERGED candidate set; oracle = the full rebuild.
      val p = Tables.part(s, dir)
      val cls = p.groupBy("p_name", "p_size")
        .agg(max(when(col("p_partkey") % 3 =!= 0, 1L).otherwise(0L))
          .as("__inBase"))
        .withColumn("ck", concat(col("p_name"), lit("|"),
          col("p_size")))
      val tk = split(col("p_name"), " ")
      val keys = Seq(
        concat(element_at(tk, 2), lit(":"), col("p_size")),
        concat(element_at(tk, 1), lit(":"), col("p_size")))
      val stored = Blocking.blockedPairs(
        cls.where(col("__inBase") === 1L), "ck", keys)
      val merged = Blocking.blockedPairsDelta(cls,
        col("__inBase") === 0L, "ck", keys, stored)
      Blocking.verifyPairs(merged,
          cls.select(col("ck"), col("p_name")), "ck", "p_name")
        .where(col("lev") <= 2)
        .select(col("a").as("class_a"), col("b").as("class_b"),
          col("lev"))
        .orderBy("class_a", "class_b")
    }),

    "ts_stl_strength" -> ((s, dir) => {
      // seasonal strength F_s = 1 − Var(resid)/Var(seas + resid)
      // (Hyndman & Athanasopoulos' tsfeatures form) over the ts_stl
      // decomposition, as exact cross-multiplied integers: the series
      // is STRONGLY seasonal at F_s ≥ 1/2 ⟺ 2·Vr ≤ Vsr (equal n²
      // denominators cancel). Squares run on /1000 downscaled values
      // so n·Σx² stays far from the long boundary at any SF.
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("d",
          datediff(col("day"), to_date(lit("1970-01-01"))))
      val dec = TimeSeries.classicalDecompose(daily, Seq("pri"),
        col("day"), (col("d") % 7).cast("long"), "x",
        period = 7, scale = StlScale)
      val down = dec.select(col("pri"),
        call_function("div", col("resid_s"), lit(MilliDown)).as("r"),
        call_function("div", col("seas_s") + col("resid_s"),
          lit(MilliDown)).as("sr"))
      down.groupBy("pri")
        .agg(count(lit(1)).as("n"),
          sum(col("r")).as("__sr1"), sum(col("r") * col("r")).as("__sr2"),
          sum(col("sr")).as("__ss1"),
          sum(col("sr") * col("sr")).as("__ss2"))
        .select(col("pri"), col("n"),
          (col("n") * col("__sr2") - col("__sr1") * col("__sr1"))
            .as("vr_num"),
          (col("n") * col("__ss2") - col("__ss1") * col("__ss1"))
            .as("vsr_num"))
        .withColumn("strong_seasonal",
          lit(2L) * col("vr_num") <= col("vsr_num"))
        .orderBy("pri")
    })
  )

  // --------------------------------------------------------------------
  // Oracles
  // --------------------------------------------------------------------

  val oracles: Map[String, String] = Map(

    "graph_temporal_reach" -> {
      def round(r: Int): String =
        s"""a$r AS (SELECT node, MIN(ta) AS ta FROM (
           |    SELECT node, ta FROM a${r - 1}
           |    UNION ALL
           |    SELECT e.v, e.t FROM a${r - 1} p JOIN e
           |      ON e.u = p.node AND e.t >= p.ta) GROUP BY 1)"""
          .stripMargin
      s"""WITH cp AS (SELECT o.o_custkey * 2 AS u,
         |    l.l_partkey * 2 + 1 AS v,
         |    date_diff('day', DATE '1970-01-01',
         |      CAST(o.o_orderdate AS DATE)) AS t
         |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         |e AS (SELECT DISTINCT u, v, t FROM (
         |    SELECT u, v, t FROM cp UNION ALL SELECT v, u, t FROM cp)),
         |a0 AS (SELECT c_custkey * 2 AS node, CAST(0 AS BIGINT) AS ta
         |  FROM customer WHERE c_nationkey = 1),
         |${(1 to ReachRounds).map(round).mkString(",\n")}
         |SELECT node, CAST(ta AS BIGINT) AS t_arrive
         |FROM a$ReachRounds ORDER BY node""".stripMargin
    },

    "dq_json_quarantine" ->
      s"""WITH sri AS (${Tables.sriEventsSql}),
         |pay AS (SELECT resourcetype,
         |    CASE WHEN CAST(key AS BIGINT) % 7 = 0
         |      THEN substr(jsondata, 1, len(jsondata) - 1)
         |      ELSE jsondata END AS payload
         |  FROM sri),
         |p2 AS (SELECT resourcetype,
         |    CASE WHEN json_valid(payload)
         |      THEN TRY_CAST(json_extract_string(payload, '$$.k')
         |        AS BIGINT) END AS k
         |  FROM pay)
         |SELECT resourcetype, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_quarantined,
         |  CAST(SUM(COALESCE(k, 0)) AS BIGINT) AS k_sum
         |FROM p2 GROUP BY 1 ORDER BY resourcetype""".stripMargin,

    "samp_bootstrap" -> {
      val jh = PipelineQueries.javaHashSql("k_key")
      // SQL mirror of Sampling.mix32 (the Pipeline21 HRW convention)
      def mixSql(x: String): String = {
        def round(v: String) =
          s"((xor($v >> 16, $v) * 73244475) % 4294967296)"
        val a = round(round(x))
        s"xor($a >> 16, $a)"
      }
      val cuts = Seq(1580030168L, 3160060337L, 3950075421L,
        4213413783L, 4279248373L, 4292415291L, 4294609777L)
      val kCase = cuts.zipWithIndex
        .map { case (c, i) => s"WHEN hu < $c THEN $i" }
        .mkString("CASE ", " ", " ELSE 7 END")
      s"""WITH o AS (SELECT o_orderpriority AS pri, o_orderkey AS okey,
         |    CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cts
         |  FROM orders),
         |x AS (SELECT pri, cts, CAST(r AS BIGINT) AS r,
         |    'boot|' || CAST(okey AS VARCHAR) || '#' ||
         |      CAST(r AS VARCHAR) AS k_key
         |  FROM o, unnest(range(0, 8)) AS t(r)),
         |h0 AS (SELECT pri, r, cts,
         |    CASE WHEN h < 0 THEN h + 4294967296 ELSE h END AS hraw
         |  FROM (SELECT pri, r, cts, $jh AS h FROM x)),
         |hh AS (SELECT pri, r, cts, ${mixSql("hraw")} AS hu FROM h0),
         |w AS (SELECT pri, r, cts, CAST($kCase AS BIGINT) AS w FROM hh)
         |SELECT pri, r, CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(SUM(w) AS BIGINT) AS w_sum,
         |  CAST(SUM(w * cts) AS BIGINT) AS wx_sum
         |FROM w GROUP BY 1, 2 ORDER BY pri, r""".stripMargin
    },

    "ts_matrix_profile" ->
      """WITH daily AS (SELECT o_orderpriority AS pri,
        |    date_diff('day', DATE '1970-01-01',
        |      CAST(o_orderdate AS DATE)) AS d
        |  FROM orders),
        |wk AS (SELECT pri, d // 7 AS wn, COUNT(*) AS x
        |  FROM daily GROUP BY 1, 2),
        |sp AS (SELECT pri, x,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY pri ORDER BY wn)
        |      AS BIGINT) AS p
        |  FROM wk),
        |wi AS (SELECT pri, i, list(x ORDER BY kk) AS v FROM (
        |    SELECT s.pri, s.p - kk AS i, s.x, kk
        |    FROM sp s, unnest(range(0, 8)) AS u(kk)) t
        |  WHERE i >= 1 GROUP BY pri, i HAVING COUNT(*) = 8),
        |pr AS (SELECT a.pri, a.i, b.i AS j,
        |    CAST(list_sum(list_transform(list_zip(a.v, b.v),
        |      z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT) AS d2
        |  FROM wi a JOIN wi b ON a.pri = b.pri AND b.i >= a.i + 8),
        |bo AS (SELECT pri, i, j, d2 FROM pr
        |       UNION ALL SELECT pri, j, i, d2 FROM pr),
        |rk AS (SELECT pri, i, j, d2,
        |    ROW_NUMBER() OVER (PARTITION BY pri, i
        |      ORDER BY d2, j) AS rr FROM bo)
        |SELECT pri, i, d2 AS mp_d2, j AS mp_j
        |FROM rk WHERE rr = 1 ORDER BY pri, i""".stripMargin,

    "graph_c4" ->
      s"""WITH ${Pipeline10Queries.triCtes},
         |adjx AS (SELECT lo AS v, hi AS n FROM e
         |         UNION ALL SELECT hi, lo FROM e),
         |dgx AS (SELECT v, COUNT(*) AS d FROM adjx GROUP BY v),
         |nw AS (SELECT COALESCE(CAST(SUM((d * (d - 1)) // 2) AS BIGINT),
         |    0) AS n_wedges FROM dgx),
         |wab AS (SELECT x.n AS a, y.n AS b, COUNT(*) AS w
         |  FROM adjx x JOIN adjx y ON x.v = y.v AND x.n < y.n
         |  GROUP BY 1, 2),
         |c4 AS (SELECT COALESCE(CAST(SUM((w * (w - 1)) // 2) AS BIGINT),
         |    0) AS c4x2 FROM wab)
         |SELECT nw.n_wedges, CAST(c4.c4x2 // 2 AS BIGINT) AS n_c4
         |FROM nw, c4""".stripMargin,

    // the inc_* oracle-reuse convention: merge must equal the rebuild —
    // the oracle recomputes class-level blocking from scratch
    "inc_er_delta" ->
      """WITH cls AS (SELECT DISTINCT p_name, p_size FROM part),
        |c2 AS (SELECT p_name,
        |    p_name || '|' || CAST(p_size AS VARCHAR) AS ck,
        |    string_split(p_name, ' ') AS tkx, p_size FROM cls),
        |k AS (SELECT ck, p_name,
        |    tkx[2] || ':' || CAST(p_size AS VARCHAR) AS bk FROM c2
        |  UNION ALL SELECT ck, p_name,
        |    tkx[1] || ':' || CAST(p_size AS VARCHAR) FROM c2),
        |pr AS (SELECT DISTINCT a.ck AS ca, b.ck AS cb,
        |    a.p_name AS na, b.p_name AS nb
        |  FROM k a JOIN k b ON a.bk = b.bk AND a.ck < b.ck)
        |SELECT ca AS class_a, cb AS class_b,
        |  CAST(levenshtein(na, nb) AS BIGINT) AS lev
        |FROM pr WHERE levenshtein(na, nb) <= 2
        |ORDER BY class_a, class_b""".stripMargin,

    "ts_stl_strength" ->
      s"""WITH ${Pipeline25Queries.stlCtes},
         |dn AS (SELECT pri, resid_s // 1000 AS r,
         |    (seas_s + resid_s) // 1000 AS sr FROM dec),
         |ag AS (SELECT pri, COUNT(*) AS n,
         |    CAST(SUM(r) AS BIGINT) AS sr1,
         |    CAST(SUM(r * r) AS BIGINT) AS sr2,
         |    CAST(SUM(sr) AS BIGINT) AS ss1,
         |    CAST(SUM(sr * sr) AS BIGINT) AS ss2
         |  FROM dn GROUP BY 1)
         |SELECT pri, n,
         |  CAST(n * sr2 - sr1 * sr1 AS BIGINT) AS vr_num,
         |  CAST(n * ss2 - ss1 * ss1 AS BIGINT) AS vsr_num,
         |  2 * (n * sr2 - sr1 * sr1) <= (n * ss2 - ss1 * ss1)
         |    AS strong_seasonal
         |FROM ag ORDER BY pri""".stripMargin
  )
}
