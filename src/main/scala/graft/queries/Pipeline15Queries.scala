package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Graph, Selection, Similarity}

/** Round-8 batch 9: greedy data selection + profiling — greedy maximum
  * coverage (the (1−1/e) submodular pick: k documents that together
  * cover the most vocabulary), greedy k-center seeding (Gonzalez
  * farthest-point over int8 sketches: k probes that see the whole
  * embedding space), and an exact per-column data-quality profile. The
  * greedy trajectories unroll into MATERIALIZED CTE layers (the MMR
  * convention); every graded value is integer.
  */
object Pipeline15Queries {

  type Q = (SparkSession, String) => DataFrame

  private val CoverK = 5
  private val KCenterK = 5
  private val ProfileCols = Seq("o_orderkey", "o_custkey",
    "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")

  val queries: Map[String, Q] = Map(

    "curate_setcover" -> ((s, dir) => {
      // greedy max-coverage: the 5 documents that together cover the
      // most distinct 3-gram shingles — each round one anti-join
      // against the covered set + one count + a 1-row argmax.
      // Diversity selection where dedup only removes redundancy. The
      // element universe is shingles, not words: this corpus's word
      // vocabulary is 31 and one doc covers it whole (a degenerate
      // 1-pick instance); the combinatorial shingle space is where
      // coverage actually discriminates — the dd_ppjoin lesson.
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.ops.TextOps.shingles(col("text"), 3)).as("tok"))
      Selection.greedyMaxCoverage(toks, "doc_id", "tok", k = CoverK)
        .orderBy("rnk")
    }),

    "sim_kcenter" -> ((s, dir) => {
      // Gonzalez farthest-point seeding on the int8 sketch: exact
      // integer d² trajectory, chosen set broadcast each round, corpus
      // never shuffles. The d2 column is the non-increasing radius
      // sequence (2-approx k-center certificate).
      Similarity.kCenterGreedy(
          Similarity.quantizeInt8(Tables.embeddings(s, dir)),
          k = KCenterK)
        .orderBy("rnk")
    }),

    "samp_class_balance" -> ((s, dir) => {
      // class-balanced downsampling: every label keeps exactly
      // min-class-count vectors by deterministic hash rank — the
      // skewed-label bias control, reproducible across partitionings.
      graft.ops.Sampling.classBalance(
          Tables.embeddings(s, dir).select(col("vec_id"),
            col("label").cast("long").as("label")),
          col("label"), col("vec_id"), salt = "cb")
        .orderBy("vec_id")
    }),

    "agg_gini" -> ((s, dir) => {
      // Gini impurity of the status mix per order priority,
      // division-free: impurity = gini_num / n^2 with gini_num =
      // n^2 - sum(n_b^2) emitted as exact longs — the split-quality /
      // label-diversity metric, engine-stable.
      val c = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderstatus").as("st"))
        .agg(count(lit(1)).as("nb"))
      c.groupBy("pri")
        .agg(sum("nb").as("n"), sum(col("nb") * col("nb")).as("sum_sq"))
        .withColumn("gini_num", col("n") * col("n") - col("sum_sq"))
        .orderBy("pri")
    }),

    "ts_snaive_sse" -> ((s, dir) => {
      // seasonal-naive forecast skill: SSE of x_t vs x_{t-7} on the
      // daily order-count series per priority (the ts_acf series) —
      // the baseline any forecasting model must beat, as exact
      // integers (n_terms, sse).
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("pri").orderBy("day")
      daily.withColumn("l7", lag(col("x"), 7).over(w))
        .where(col("l7").isNotNull)
        .groupBy("pri")
        .agg(count(lit(1)).as("n_terms"),
          sum((col("x") - col("l7")) * (col("x") - col("l7")))
            .as("sse"))
        .orderBy("pri")
    }),

    "graph_conductance" -> ((s, dir) => {
      // partition-quality audit: nation blocks over the bipartite
      // purchase graph — per block the internal/cut edge counts and
      // volume, the integers conductance and coverage derive from
      // division-free. The audit a sharding or community layer runs
      // before trusting its blocks; unassigned vertices raise.
      val e = Pipeline8Queries.purchaseEdges(s, dir, symmetric = false)
      val blocks = Tables.customer(s, dir)
        .select((col("c_custkey") * 2).as("node"),
          col("c_nationkey").as("blk"))
        .unionByName(Tables.supplier(s, dir)
          .select((col("s_suppkey") * 2 + 1).as("node"),
            col("s_nationkey").as("blk")))
      Graph.blockConductance(e, "src", "dst", blocks, "node", "blk")
        .orderBy("block")
    }),

    "graph_assortativity" -> ((s, dir) => {
      // Newman degree-assortativity sufficient statistics of the
      // support>=2 co-order part graph, ONE row of exact longs —
      // r = (4m*s1 - s2^2)/(2m*s3 - s2^2) forms downstream, so the
      // hub-attracts-hub verdict is bit-stable.
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("g"), col("l_partkey").as("p"))
        .distinct()
      val we = li.select(col("g"), col("p").as("lo"))
        .join(li.select(col("g"), col("p").as("hi")), "g")
        .where(col("lo") < col("hi"))
        .groupBy("lo", "hi").agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
      Graph.assortativityStats(we, "lo", "hi")
    }),

    "stream_cusum" -> ((s, dir) => {
      // streaming two-sided CUSUM over per-user spend: Page's test in
      // its preset-reference streaming form, O(1) state per key
      // through a REAL mapGroupsWithState drain. The oracle is the
      // window-CLOSED batch form (s+ = C - min(0, min C)) — the
      // ts_cusum identity graded ACROSS the batch/stream boundary.
      // The 7th stateful streaming shape.
      StreamDrains.cusumFinalize(
          StreamDrains.drain(s,
            StreamDrains.cusumPipeline(s,
              Pipeline6Queries.eventsStream(s, dir)),
            "update", "scu"))
        .orderBy("user_id")
    }),

    "dq_profile" -> ((s, dir) => {
      // exact per-column profile of orders: row count, null count,
      // distinct count — the schema-drift / completeness baseline a
      // pipeline snapshots per ingest wave. One pass; the multi-column
      // DISTINCT rides Spark's expand (one stream per column), which is
      // the right trade at column counts like this — switch to HLL
      // sketches (approx_distinct) when columns × rows outgrow it.
      val o = Tables.orders(s, dir)
      val aggExprs = ProfileCols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"nd_$c")))
      val agged = o.agg(count(lit(1)).as("n"), aggExprs: _*)
      agged.select(explode(array(ProfileCols.map(c =>
          struct(lit(c).as("col_name"), col("n").as("n_rows"),
            col(s"nn_$c").as("n_null"),
            col(s"nd_$c").as("n_distinct"))): _*)).as("r"))
        .select("r.*")
        .orderBy("col_name")
    })
  )

  // ------------------------------------------------------------------

  /** Greedy max-coverage unrolled: layer r picks argmax new-coverage
    * over items not yet chosen, elements not yet covered. */
  private def setcoverOracle: String = {
    val layers = (2 to CoverK).map { r =>
      s"""g$r AS MATERIALIZED (SELECT t.item, COUNT(*) AS gain
         |  FROM tok t
         |  WHERE NOT EXISTS (SELECT 1 FROM cov${r - 1} c
         |          WHERE c.elem = t.elem)
         |    AND NOT EXISTS (SELECT 1 FROM acc${r - 1} a
         |          WHERE a.item = t.item)
         |  GROUP BY t.item),
         |s$r AS MATERIALIZED (SELECT item, gain,
         |    CAST($r AS BIGINT) AS rnk
         |  FROM (SELECT item, gain, ROW_NUMBER() OVER (
         |      ORDER BY gain DESC, item ASC) AS rn FROM g$r)
         |  WHERE rn = 1),
         |cov$r AS MATERIALIZED (SELECT elem FROM cov${r - 1}
         |  UNION SELECT t.elem FROM tok t JOIN s$r USING (item)),
         |acc$r AS MATERIALIZED (SELECT * FROM acc${r - 1}
         |  UNION ALL SELECT item, gain, rnk FROM s$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH tw AS (SELECT doc_id, string_split(text, ' ') AS ws
       |  FROM documents),
       |tok AS MATERIALIZED (SELECT doc_id AS item,
       |    unnest(list_distinct(CASE WHEN len(ws) >= 3
       |      THEN list_transform(range(1, len(ws) - 1),
       |           i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2])
       |      ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS elem
       |  FROM tw),
       |g1 AS MATERIALIZED (SELECT item, COUNT(*) AS gain FROM tok
       |  GROUP BY item),
       |s1 AS MATERIALIZED (SELECT item, gain, CAST(1 AS BIGINT) AS rnk
       |  FROM (SELECT item, gain, ROW_NUMBER() OVER (
       |      ORDER BY gain DESC, item ASC) AS rn FROM g1)
       |  WHERE rn = 1),
       |cov1 AS MATERIALIZED (SELECT DISTINCT t.elem FROM tok t
       |  JOIN s1 USING (item)),
       |acc1 AS MATERIALIZED (SELECT item, gain, rnk FROM s1),
       |$layers
       |SELECT rnk, item, gain FROM acc$CoverK ORDER BY rnk""".stripMargin
  }

  /** Gonzalez unrolled: layer r = argmax over min-d² to the chosen
    * set, d² = ‖a‖² + ‖b‖² − 2⟨a,b⟩ on the int8 sketch. */
  private def kcenterOracle: String = {
    val dot = "CAST(list_sum(list_transform(list_zip(q.qv, c.qv), " +
      "z -> z[1] * z[2])) AS BIGINT)"
    val layers = (2 to KCenterK).map { r =>
      s"""dm$r AS MATERIALIZED (SELECT q.vec_id,
         |    CAST(MIN(q.q_norm + c.q_norm - 2 * $dot) AS BIGINT) AS d2
         |  FROM qn q, acc${r - 1} c
         |  WHERE NOT EXISTS (SELECT 1 FROM acc${r - 1} x
         |          WHERE x.vec_id = q.vec_id)
         |  GROUP BY q.vec_id),
         |s$r AS MATERIALIZED (SELECT vec_id, d2 FROM (
         |    SELECT vec_id, d2, ROW_NUMBER() OVER (
         |      ORDER BY d2 DESC, vec_id ASC) AS rn FROM dm$r)
         |  WHERE rn = 1),
         |acc$r AS MATERIALIZED (SELECT * FROM acc${r - 1}
         |  UNION ALL SELECT q.vec_id, q.qv, q.q_norm,
         |    CAST($r AS BIGINT) AS rnk, s.d2
         |  FROM s$r s JOIN qn q USING (vec_id))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Pipeline8Queries.quantCtes},
       |acc1 AS MATERIALIZED (SELECT vec_id, qv, q_norm,
       |    CAST(1 AS BIGINT) AS rnk, CAST(0 AS BIGINT) AS d2
       |  FROM qn WHERE vec_id = (SELECT MIN(vec_id) FROM qn)),
       |$layers
       |SELECT rnk, vec_id, d2 FROM acc$KCenterK ORDER BY rnk"""
      .stripMargin
  }

  private def profileOracle: String =
    ProfileCols.map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct
         |FROM orders""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"

  private def streamCusumOracle: String = {
    val k = StreamDrains.CusumRef
    s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms, event_id,
       |    CAST(ROUND(value * 100) AS BIGINT) AS v FROM events),
       |c AS (SELECT user_id,
       |    CAST(SUM(v - $k) OVER (PARTITION BY user_id
       |      ORDER BY ms, event_id ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS cc
       |  FROM e),
       |t AS (SELECT user_id, COUNT(*) AS n_events,
       |    CAST(SUM(v - $k) AS BIGINT) AS cfin FROM e GROUP BY 1),
       |x AS (SELECT user_id, MIN(cc) AS cmin, MAX(cc) AS cmax
       |  FROM c GROUP BY 1)
       |SELECT t.user_id, t.n_events,
       |  t.cfin - LEAST(CAST(0 AS BIGINT), x.cmin) AS cusum_hi,
       |  GREATEST(CAST(0 AS BIGINT), x.cmax) - t.cfin AS cusum_lo
       |FROM t JOIN x USING (user_id) ORDER BY user_id""".stripMargin
  }

  private def conductanceOracle: String =
    """WITH e0 AS (SELECT DISTINCT o_custkey*2 AS a, l_suppkey*2+1 AS b
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |ce AS (SELECT LEAST(a, b) AS lo, GREATEST(a, b) AS hi FROM e0),
      |blk AS (SELECT c_custkey*2 AS node, c_nationkey AS blk
      |  FROM customer
      |  UNION ALL
      |  SELECT s_suppkey*2+1, s_nationkey FROM supplier),
      |lab AS (SELECT ce.lo, ce.hi, bl.blk AS bl, bh.blk AS bh
      |  FROM ce JOIN blk bl ON bl.node = ce.lo
      |  JOIN blk bh ON bh.node = ce.hi),
      |x AS (SELECT blk,
      |    CAST(SUM(CASE WHEN blk = other THEN 1 ELSE 0 END) // 2
      |      AS BIGINT) AS n_internal,
      |    CAST(SUM(CASE WHEN blk <> other THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_cut,
      |    COUNT(*) AS volume
      |  FROM (SELECT bl AS blk, bh AS other FROM lab
      |        UNION ALL SELECT bh, bl FROM lab)
      |  GROUP BY 1)
      |SELECT blk AS block, n_internal, n_cut, volume FROM x
      |ORDER BY block""".stripMargin

  private def assortativityOracle: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p
      |  FROM lineitem),
      |we AS (SELECT a.p AS lo, b.p AS hi
      |  FROM li a JOIN li b ON a.g = b.g AND a.p < b.p
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |deg AS (SELECT v, COUNT(*) AS d FROM (
      |    SELECT lo AS v FROM we UNION ALL SELECT hi FROM we)
      |  GROUP BY v)
      |SELECT COUNT(*) AS m,
      |  CAST(SUM(dl.d * dh.d) AS BIGINT) AS s1,
      |  CAST(SUM(dl.d + dh.d) AS BIGINT) AS s2,
      |  CAST(SUM(dl.d * dl.d + dh.d * dh.d) AS BIGINT) AS s3
      |FROM we JOIN deg dl ON dl.v = we.lo
      |JOIN deg dh ON dh.v = we.hi""".stripMargin

  /** Unsigned 32-bit Java hash in DuckDB (the Pipeline11 convention). */
  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"""(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"""
  }

  private def classBalanceOracle: String = {
    val h = huSql("'cb' || CAST(vec_id AS VARCHAR)")
    s"""WITH c AS (SELECT label, COUNT(*) AS n FROM embeddings
       |  GROUP BY 1),
       |m AS (SELECT MIN(n) AS minc FROM c),
       |r AS (SELECT vec_id, CAST(label AS BIGINT) AS label,
       |    ROW_NUMBER() OVER (PARTITION BY label
       |      ORDER BY $h, vec_id) AS rk
       |  FROM embeddings)
       |SELECT vec_id, label FROM r, m WHERE rk <= minc
       |ORDER BY vec_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "samp_class_balance" -> classBalanceOracle,

    "agg_gini" ->
      """WITH c AS (SELECT o_orderpriority AS pri, o_orderstatus AS st,
        |    COUNT(*) AS nb FROM orders GROUP BY 1, 2),
        |g AS (SELECT pri, CAST(SUM(nb) AS BIGINT) AS n,
        |    CAST(SUM(nb * nb) AS BIGINT) AS sum_sq FROM c GROUP BY 1)
        |SELECT pri, n, sum_sq, n * n - sum_sq AS gini_num FROM g
        |ORDER BY pri""".stripMargin,

    "ts_snaive_sse" ->
      """WITH d AS (SELECT o_orderpriority AS pri,
        |    CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x
        |  FROM orders GROUP BY 1, 2),
        |l AS (SELECT pri, x, LAG(x, 7) OVER (PARTITION BY pri
        |    ORDER BY day) AS l7 FROM d)
        |SELECT pri, COUNT(*) AS n_terms,
        |  CAST(SUM((x - l7) * (x - l7)) AS BIGINT) AS sse
        |FROM l WHERE l7 IS NOT NULL GROUP BY pri
        |ORDER BY pri""".stripMargin,

    "curate_setcover" -> setcoverOracle,
    "sim_kcenter" -> kcenterOracle,
    "stream_cusum" -> streamCusumOracle,
    "graph_conductance" -> conductanceOracle,
    "graph_assortativity" -> assortativityOracle,
    "dq_profile" -> profileOracle
  )
}
