package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{DedupText, Graph, Retrieval, Similarity, Skyline,
  TimeSeries}

/** Round-8 batch 7: the decision ring — reciprocal-rank fusion (the
  * hybrid sparse+dense retrieval combiner), integer CUSUM changepoints
  * (the monitoring alarm behind dq_rate_drift's one-shot gate),
  * prefix-filtered EXACT set-similarity join (the no-false-negative
  * complement of MinHash-LSH), inter-arrival regularity flags (the
  * timing half of bot detection), a 2-D Pareto skyline (selection when
  * two objectives genuinely conflict), and weighted shortest paths
  * (Bellman–Ford under the fixed-horizon contract). Batch convention
  * unchanged: no float decides a graded value; iterative trajectories
  * unroll into CTE layers.
  */
object Pipeline13Queries {

  type Q = (SparkSession, String) => DataFrame

  private val RrfPoolK = 20  // per-list pool depth feeding the fusion
  private val RrfK = 10      // fused results per query
  private val RrfC = 60      // the SIGIR-2009 constant
  private val CusumH = 3     // alarm at cusum > 3 * allowance
  private val PpTauNum = 4   // shingle-Jaccard threshold tau = 4/5 —
  private val PpTauDen = 5   // on the 3-gram universe the dup classes
                             // separate cleanly (81 pairs from tau 0.7
                             // through 0.9; word sets degenerate here:
                             // 75% of ALL pairs clear word-tau 1/2)
  private val PpShingleN = 3
  private val BotBucketMs = 60000L
  private val BotMinGaps = 8
  private val SsspRounds = 4

  val queries: Map[String, Q] = Map(

    "ret_rrf" -> ((s, dir) => {
      // hybrid retrieval: BM25-lite top-20 (sparse) fused with exact
      // cosine top-20 of the query's probe embedding (dense; probe =
      // vector 50*query_id over the aligned doc/vec id space) by
      // reciprocal-rank fusion — ranks in, floored scaled integers
      // out, so the fused ordering is bit-stable where raw-score
      // normalization never is. Both pools are top-k bounded before
      // the fusion ever shuffles.
      import s.implicits._
      val qdf = Pipeline11Queries.QuerySet.toDF("query_id", "term")
      val sparse = Retrieval.bm25TopK(Tables.documents(s, dir),
          "doc_id", "text", qdf, k = RrfPoolK)
        .select(col("query_id"), col("doc_id"), col("rnk"))
      val emb = Tables.embeddings(s, dir)
      val probes = emb.where(col("vec_id") % 50 === 0 &&
        col("vec_id").between(50, 200))
      val dense = Similarity.bruteForceTopK(emb, probes, RrfPoolK)
        .select(call_function("div", col("query_id"), lit(50L))
            .as("query_id"),
          col("neighbor_id").as("doc_id"), col("rnk"))
      Retrieval.rrfFuse(Seq(sparse, dense), k = RrfK, kRrf = RrfC)
        .orderBy("query_id", "rnk")
    }),

    "ts_cusum" -> ((s, dir) => {
      // two-sided CUSUM over the daily order-count series per priority
      // (the ts_acf series): the sequential max(0, s+e) recursions
      // closed into one window pass (cumsum ± running extrema), alarm
      // at 3x the per-key ceiling-mean allowance. The raw -> series
      // aggregate is the distributed step; the series is calendar-
      // bounded.
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      TimeSeries.cusumFlags(daily, Seq("pri"), Seq(col("day")), "x",
          hMult = CusumH)
        .orderBy("pri", "day")
    }),

    "dd_ppjoin" -> ((s, dir) => {
      // prefix-filtered EXACT 3-shingle-set Jaccard join at tau = 4/5
      // over the dup-planted corpus — every qualifying pair, no false
      // negatives (the prefix filtering lemma), candidates bounded by
      // rare-shingle prefix df^2, verdict by integer cross-
      // multiplication. The deterministic complement of dd_minhash_lsh
      // (same shingle universe, guaranteed recall instead of banded).
      DedupText.prefixJaccardJoin(
          PipelineQueries.docsWithDups(s, dir), "doc_id", "text",
          tauNum = PpTauNum, tauDen = PpTauDen, n = PpShingleN)
        .orderBy("a_id", "b_id")
    }),

    "evt_bot_flag" -> ((s, dir) => {
      // inter-arrival regularity per user: minute-bucketed gap
      // distribution, exact Simpson collision mass, flag when a random
      // gap pair collides with probability > 1/2 — scheduler-like
      // timing, the division-free integer verdict.
      TimeSeries.regularityFlags(
          Tables.events(s, dir).select(col("user_id"), col("ts_ms")),
          Seq("user_id"), col("ts_ms"),
          bucketDiv = BotBucketMs, minGaps = BotMinGaps)
        .orderBy("user_id")
    }),

    "doc_skyline" -> ((s, dir) => {
      // Pareto frontier over (n_chars min, distinct-token count max):
      // the documents no other document beats on both cost and
      // vocabulary richness — grid-prune (bucket max-y broadcast)
      // kills the interior distributed, exact window pass over the
      // frontier-bounded survivors.
      val d = Tables.documents(s, dir)
      val toks = d.select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .where(col("tok") =!= "")
        .groupBy("doc_id").agg(countDistinct(col("tok")).as("n_toks"))
      val pts = d.select(col("doc_id"), col("n_chars")).join(toks, "doc_id")
      Skyline.skyline2d(pts, col("n_chars"), col("n_toks"))
        .orderBy("x")
    }),

    "graph_sssp" -> ((s, dir) => {
      // weighted shortest paths on the support-weighted part co-order
      // graph (edge length 1 + 1000 div support: strong associations
      // are short), 4 Bellman-Ford rounds from the part%200 seed set —
      // the graph_bfs contract with weights.
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("g"), col("l_partkey").as("p"))
        .distinct()
      val we = li.select(col("g"), col("p").as("lo"))
        .join(li.select(col("g"), col("p").as("hi")), "g")
        .where(col("lo") < col("hi"))
        .groupBy("lo", "hi").agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
        .withColumn("len", lit(1L) + call_function("div", lit(1000L),
          col("w")))
      val sym = we.select(explode(array(
          struct(col("lo").as("src"), col("hi").as("dst"), col("len")),
          struct(col("hi").as("src"), col("lo").as("dst"), col("len"))))
          .as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.len").as("len"))
      val seeds = Tables.part(s, dir)
        .where(col("p_partkey") % 200 === 0)
        .select(col("p_partkey").as("node"))
      Graph.ssspDistances(sym, "src", "dst", "len", seeds, "node",
          rounds = SsspRounds)
        .orderBy("node")
    })
  )

  // ------------------------------------------------------------------

  /** BM25-lite chain at pool depth `k` ending in bm(query_id, doc_id,
    * rnk) — the txt_bm25 oracle CTEs verbatim, parameterized on k. */
  private def bm25Ctes(k: Int): String = {
    val querySetSql = Pipeline11Queries.QuerySet
      .map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }
      .mkString(", ")
    s"""q(query_id, term) AS (VALUES $querySetSql),
       |btok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM documents),
       |btk AS (SELECT doc_id, term FROM btok WHERE term <> ''),
       |bdl AS (SELECT doc_id, COUNT(*) AS dl FROM btk GROUP BY doc_id),
       |bst AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS s_tok FROM bdl),
       |btf AS (SELECT doc_id, term, COUNT(*) AS tf FROM btk
       |       WHERE term IN (SELECT DISTINCT term FROM q)
       |       GROUP BY doc_id, term),
       |bdfq AS (SELECT term, COUNT(*) AS df FROM btf GROUP BY term),
       |bsc AS (SELECT q.query_id, t.doc_id,
       |    (CAST(1000000 AS HUGEINT)
       |       * (2*bst.n_docs - 2*d.df + 1) * 22 * t.tf * bst.s_tok)
       |    // (CAST(2*d.df + 1 AS HUGEINT)
       |       * (10*bst.s_tok*t.tf + 3*bst.s_tok + 9*l.dl*bst.n_docs))
       |      AS contrib
       |  FROM btf t
       |  JOIN bdfq d ON d.term = t.term
       |  JOIN bdl l ON l.doc_id = t.doc_id
       |  JOIN q ON q.term = t.term, bst),
       |bps AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT)
       |    AS score FROM bsc GROUP BY query_id, doc_id),
       |bm AS (SELECT query_id, doc_id, rnk FROM (
       |    SELECT query_id, doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, doc_id ASC) AS rnk FROM bps)
       |  WHERE rnk <= $k)""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "ret_rrf" -> {
      val cos = PipelineQueries.cosSql("dq.q_emb", "e.embedding")
      s"""WITH ${bm25Ctes(RrfPoolK)},
         |dq AS (SELECT vec_id AS pid, embedding AS q_emb
         |       FROM embeddings
         |       WHERE vec_id % 50 = 0 AND vec_id BETWEEN 50 AND 200),
         |ds AS (SELECT dq.pid, e.vec_id AS doc_id, $cos AS cos
         |  FROM embeddings e, dq WHERE e.vec_id <> dq.pid),
         |dn AS (SELECT pid // 50 AS query_id, doc_id, rnk FROM (
         |    SELECT pid, doc_id,
         |      ROW_NUMBER() OVER (PARTITION BY pid
         |        ORDER BY cos DESC, doc_id ASC) AS rnk FROM ds)
         |  WHERE rnk <= $RrfPoolK),
         |uni AS (SELECT query_id, doc_id, rnk FROM bm
         |  UNION ALL SELECT query_id, doc_id, rnk FROM dn),
         |fu AS (SELECT query_id, doc_id,
         |    CAST(SUM(1000000 // ($RrfC + rnk)) AS BIGINT) AS score,
         |    COUNT(*) AS n_lists
         |  FROM uni GROUP BY 1, 2),
         |rk AS (SELECT query_id, doc_id, score, n_lists,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, n_lists DESC, doc_id ASC) AS rnk
         |  FROM fu)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score,
         |  n_lists
         |FROM rk WHERE rnk <= $RrfK
         |ORDER BY query_id, rnk""".stripMargin
    },

    "ts_cusum" ->
      s"""WITH d AS (SELECT o_orderpriority AS pri,
         |    CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x
         |  FROM orders GROUP BY 1, 2),
         |t AS (SELECT pri,
         |    CAST((SUM(x) + COUNT(*) - 1) // COUNT(*) AS BIGINT) AS k
         |  FROM d GROUP BY 1),
         |c AS (SELECT d.pri, d.day, d.x, t.k,
         |    CAST(SUM(d.x - t.k) OVER (PARTITION BY d.pri
         |      ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cc
         |  FROM d JOIN t USING (pri)),
         |m AS (SELECT pri, day, x, k, cc,
         |    MIN(cc) OVER w AS cmin, MAX(cc) OVER w AS cmax
         |  FROM c WINDOW w AS (PARTITION BY pri ORDER BY day
         |    ROWS UNBOUNDED PRECEDING))
         |SELECT pri, day, x,
         |  cc - LEAST(CAST(0 AS BIGINT), cmin) AS cusum_hi,
         |  GREATEST(CAST(0 AS BIGINT), cmax) - cc AS cusum_lo,
         |  cc - LEAST(CAST(0 AS BIGINT), cmin) > $CusumH * k AS flag_hi,
         |  GREATEST(CAST(0 AS BIGINT), cmax) - cc > $CusumH * k AS flag_lo
         |FROM m ORDER BY pri, day""".stripMargin,

    "dd_ppjoin" ->
      s"""WITH dd AS (${PipelineQueries.docsWithDupsSql}),
         |tw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM dd),
         |tok AS (SELECT doc_id AS id,
         |    unnest(list_distinct(CASE WHEN len(ws) >= $PpShingleN
         |      THEN list_transform(range(1, len(ws) - ${PpShingleN - 2}),
         |           i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2])
         |      ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS tok
         |  FROM tw),
         |m AS (SELECT id, COUNT(*) AS m FROM tok GROUP BY id),
         |i AS (SELECT a.id AS a_id, b.id AS b_id, COUNT(*) AS n_inter
         |  FROM tok a JOIN tok b ON a.tok = b.tok AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT a_id, b_id, n_inter,
         |  ma.m + mb.m - n_inter AS n_union
         |FROM i JOIN m ma ON ma.id = a_id JOIN m mb ON mb.id = b_id
         |WHERE ${PpTauDen + PpTauNum} * n_inter
         |  >= $PpTauNum * (ma.m + mb.m)
         |ORDER BY a_id, b_id""".stripMargin,

    "evt_bot_flag" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
         |g AS (SELECT user_id, ms - LAG(ms) OVER (PARTITION BY user_id
         |    ORDER BY ms) AS gap FROM e),
         |nb AS (SELECT user_id, gap // $BotBucketMs AS b, COUNT(*) AS nb
         |  FROM g WHERE gap IS NOT NULL GROUP BY 1, 2),
         |a AS (SELECT user_id, CAST(SUM(nb) AS BIGINT) AS n_gaps,
         |    CAST(SUM(nb * nb) AS BIGINT) AS sum_sq
         |  FROM nb GROUP BY 1)
         |SELECT user_id, n_gaps, sum_sq,
         |  (n_gaps >= $BotMinGaps AND 2 * sum_sq > n_gaps * n_gaps)
         |    AS flag
         |FROM a ORDER BY user_id""".stripMargin,

    "doc_skyline" ->
      """WITH tk AS (SELECT doc_id, COUNT(DISTINCT t) AS y FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |    FROM documents)
        |  WHERE t <> '' GROUP BY doc_id),
        |p AS (SELECT d.n_chars AS x, tk.y AS y, COUNT(*) AS n_rows
        |  FROM documents d JOIN tk USING (doc_id) GROUP BY 1, 2)
        |SELECT x, y, n_rows FROM p
        |WHERE NOT EXISTS (SELECT 1 FROM p q
        |  WHERE q.x <= p.x AND q.y >= p.y
        |    AND (q.x < p.x OR q.y > p.y))
        |ORDER BY x""".stripMargin,

    "graph_sssp" -> {
      val rounds = (0 until SsspRounds).map { i =>
        s"""d${i + 1} AS (SELECT node, MIN(dist) AS dist FROM (
           |    SELECT node, dist FROM d$i
           |    UNION ALL
           |    SELECT sy.dst, d$i.dist + sy.len FROM d$i
           |    JOIN sy ON sy.src = d$i.node)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p
         |  FROM lineitem),
         |we AS (SELECT a.p AS lo, b.p AS hi,
         |    1 + 1000 // COUNT(*) AS len
         |  FROM li a JOIN li b ON a.g = b.g AND a.p < b.p
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |sy AS (SELECT lo AS src, hi AS dst, len FROM we
         |  UNION ALL SELECT hi, lo, len FROM we),
         |d0 AS (SELECT DISTINCT p_partkey AS node,
         |    CAST(0 AS BIGINT) AS dist
         |  FROM part WHERE p_partkey % 200 = 0),
         |$rounds
         |SELECT node, CAST(dist AS BIGINT) AS dist FROM d$SsspRounds
         |ORDER BY node""".stripMargin
    }
  )
}
