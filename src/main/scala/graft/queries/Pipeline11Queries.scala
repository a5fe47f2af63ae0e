package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Cluster, DedupText, Freq, Funnel, Graph, Retrieval,
  Sampling, TimeSeries}
import Fixtures._

/** Round-8 batch 3: the retrieval/analytics surface around the curation
  * core — BM25 ranked retrieval (the query side of `txt_inverted` /
  * `txt_tfidf`), event funnels, a mergeable count-min sketch, neighbor-
  * Jaccard link prediction, multi-source BFS, leakage-free group-aware
  * splits, rolling z-score anomalies, l-diversity, and the Heaps-law
  * vocabulary curve. Everything integer-exact (the txt_pmi convention:
  * decimal(38)/HUGEINT where products grow, cross-multiplied ratio
  * tests, floored scaled division mirrored by `div` / `//`).
  */
object Pipeline11Queries {

  type Q = (SparkSession, String) => DataFrame

  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"""(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"""
  }

  /** The retrieval query set: 4 multi-term queries over the corpus
    * vocabulary — a plan-time literal on both sides. */
  private[queries] val QuerySet: Seq[(Long, String)] = Seq(
    1L -> "hash", 1L -> "join",
    2L -> "window", 2L -> "agg", 2L -> "stream",
    3L -> "vector", 3L -> "scan",
    4L -> "slow", 4L -> "merge", 4L -> "customer")

  private val CmsDepth = 4
  private val CmsWidth = 64
  private val CmsSalt = "cms"
  private val BfsRounds = 4
  private val VocabCps = Seq(16L, 32L, 64L, 128L, 256L, 512L,
    1024L, 2048L, 4096L, 8192L)

  val queries: Map[String, Q] = Map(

    "txt_bm25" -> ((s, dir) => {
      // BM25-lite ranked retrieval: rational idf × saturating tf,
      // every contribution a floored scaled integer (Retrieval
      // scaladoc derives the cleared-denominator form). The query set
      // and per-term df broadcast; the corpus token stream is semi-
      // joined to the 10-term query vocabulary BEFORE the tf shuffle.
      import s.implicits._
      val qdf = QuerySet.toDF("query_id", "term")
      Retrieval.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
          qdf, k = 10)
        .orderBy("query_id", "rnk")
    }),

    "evt_funnel" -> ((s, dir) => {
      // ordered signup → click → purchase funnel, earliest-completion
      // binding per user; per-step reach + total lag. Each step is one
      // user-keyed aggregate + join, the frame shrinking monotonically.
      Funnel.funnelSteps(
          Tables.events(s, dir)
            .select(col("user_id"), col("ts_ms"), col("event_type")),
          "user_id", "ts_ms", "event_type",
          Seq("signup", "click", "purchase"))
        .orderBy("step")
    }),

    "approx_cms_est" -> ((s, dir) => {
      // count-min sketch (4×64, java-hash cells) over part keys, point-
      // queried for every 20th part with the exact count alongside —
      // est ≥ true_cnt by construction, both graded. The sketch is the
      // MERGEABLE path: per-slice sketches union by cell addition
      // without re-scanning (spec-pinned), the HLL-merge convention.
      val li = Tables.lineitem(s, dir)
      val sketch = Freq.countMinSketch(li, "l_partkey",
        CmsDepth, CmsWidth, CmsSalt)
      val probes = li.where(col("l_partkey") % 20 === 0)
        .select(col("l_partkey").as("k")).distinct()
      val est = Freq.cmsEstimate(sketch, probes,
        CmsDepth, CmsWidth, CmsSalt)
      val exact = li.where(col("l_partkey") % 20 === 0)
        .groupBy(col("l_partkey").as("k"))
        .agg(count(lit(1)).as("true_cnt"))
      est.join(exact, "k").orderBy("k")
    }),

    "dq_l_diversity" -> ((s, dir) => {
      // the l-diversity complement of dq_k_anonymity: QI groups whose
      // SENSITIVE attribute (market segment) shows < 3 distinct values
      // — small-k protects against identification, small-l still
      // leaks the attribute. Same sign-safe bucket arithmetic.
      Tables.customer(s, dir)
        .select(col("c_nationkey"), col("c_mktsegment"),
          cents("c_acctbal").as("pc"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          expr("(pc + 100000000) div 100000").as("bal_bucket"))
        .groupBy("c_nationkey", "bal_bucket")
        .agg(countDistinct("c_mktsegment").as("l"),
          count(lit(1)).as("n"))
        .where(col("l") < 3)
        .orderBy("c_nationkey", "bal_bucket")
    }),

    "graph_jaccard" -> ((s, dir) => {
      // neighbor-Jaccard link prediction over the support≥2 part
      // co-order graph: non-edges sharing ≥2 neighbors, kept when
      // 4·common ≥ union (Jaccard ≥ 1/4 by integer cross-
      // multiplication). Wedge enumeration bounds the pair space by
      // Σ deg² on the thinned graph — all-pairs never exists.
      Graph.neighborJaccard(Pipeline10Queries.coorderEdges(s, dir),
          "lo", "hi", minCommon = 2)
        .orderBy("a", "b")
    }),

    "graph_bfs" -> ((s, dir) => {
      // multi-source BFS: hop distance from the nation-1 customer
      // seeds over the symmetrized purchase graph, horizon 4 — the
      // graded fixed-round locality contract (the pageRankInt shape).
      val edges = Pipeline8Queries.purchaseEdges(s, dir,
        symmetric = true)
      val seeds = Tables.customer(s, dir)
        .where(col("c_nationkey") === 1)
        .select((col("c_custkey") * 2).as("node"))
      Graph.bfsDistances(edges, "src", "dst", seeds, "node",
          rounds = BfsRounds)
        .orderBy("node")
    }),

    "samp_group_split" -> ((s, dir) => {
      // leakage-free train/val/test: near-dup CLUSTERS travel together
      // (split keyed on the connected-component id, not the doc id) —
      // the decontamination rule that stops a train document's near-
      // duplicate landing in test. Composes the dd_cluster_cc pipeline
      // with the samp_split hash splitter.
      val docs = PipelineQueries.docsWithDups(s, dir)
      val signed = DedupText.minhashSignaturesExact(docs, "doc_id",
        "text")
      val pairs = DedupText.lshCandidatesExact(signed, "doc_id",
        bands = 8, rows = 4)
      val cl = Cluster.connectedComponents(docs.select("doc_id"),
          "doc_id", pairs, "a_id", "b_id", edgesCovered = true)
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"))
      Sampling.hashSplit(cl, col("cluster_id").cast("string"),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select("doc_id", "cluster_id", "split")
        .orderBy("doc_id")
    }),

    "ts_anomaly" -> ((s, dir) => {
      // rolling z-score anomalies per user (trailing 16 rows, 3σ —
      // a self-inclusive window caps z² at n−1, so 8 rows could never
      // flag at 3σ; anomalyZ enforces that loudly), decided by the
      // integer inequality (n·x−s1)² > 9·(n·s2−s1²) — μ and σ never
      // materialize, so no float ever decides a row.
      TimeSeries.anomalyZ(
          Tables.events(s, dir).select(col("event_id"), col("user_id"),
            col("ts_ms"), cents("value").as("vc")),
          keys = Seq("user_id"),
          order = Seq(col("ts_ms"), col("event_id")),
          valCol = "vc", window = 16, sigmas = 3)
        .where(col("is_anomaly"))
        .select("event_id", "user_id", "vc", "lhs", "rhs")
        .orderBy("event_id")
    }),

    "txt_vocab_growth" -> ((s, dir) => {
      // Heaps-law curve: vocabulary size and token mass at doubling
      // corpus-prefix checkpoints — each term contributes only its
      // FIRST doc, so no per-prefix distinct ever runs.
      Retrieval.vocabGrowth(Tables.documents(s, dir), "doc_id", "text",
          VocabCps)
        .orderBy("c")
    })
  )

  // ------------------------------------------------------------------
  // Oracle SQL
  // ------------------------------------------------------------------

  private[queries] val querySetSql: String =
    QuerySet.map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }
      .mkString(", ")

  val oracles: Map[String, String] = Map(

    "txt_bm25" ->
      s"""WITH q(query_id, term) AS (VALUES $querySetSql),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |        FROM documents),
         |tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY doc_id),
         |st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS s_tok FROM dl),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk
         |       WHERE term IN (SELECT DISTINCT term FROM q)
         |       GROUP BY doc_id, term),
         |dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         |sc AS (SELECT q.query_id, t.doc_id,
         |    (CAST(1000000 AS HUGEINT)
         |       * (2*st.n_docs - 2*d.df + 1) * 22 * t.tf * st.s_tok)
         |    // (CAST(2*d.df + 1 AS HUGEINT)
         |       * (10*st.s_tok*t.tf + 3*st.s_tok + 9*l.dl*st.n_docs))
         |      AS contrib
         |  FROM tf t
         |  JOIN dfq d ON d.term = t.term
         |  JOIN dl l ON l.doc_id = t.doc_id
         |  JOIN q ON q.term = t.term, st),
         |ps AS (SELECT query_id, doc_id, CAST(SUM(contrib) AS BIGINT)
         |    AS score FROM sc GROUP BY query_id, doc_id),
         |rk AS (SELECT query_id, doc_id, score,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY score DESC, doc_id ASC) AS rnk FROM ps)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, doc_id, score
         |FROM rk WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

    "evt_funnel" ->
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS t, event_type
        |           FROM events),
        |f1 AS (SELECT user_id, MIN(t) AS t FROM e
        |       WHERE event_type = 'signup' GROUP BY user_id),
        |f2 AS (SELECT e.user_id, f1.t AS pt, MIN(e.t) AS t
        |       FROM e JOIN f1 ON e.user_id = f1.user_id
        |       WHERE e.event_type = 'click' AND e.t > f1.t
        |       GROUP BY e.user_id, f1.t),
        |f3 AS (SELECT e.user_id, f2.t AS pt, MIN(e.t) AS t
        |       FROM e JOIN f2 ON e.user_id = f2.user_id
        |       WHERE e.event_type = 'purchase' AND e.t > f2.t
        |       GROUP BY e.user_id, f2.t)
        |SELECT CAST(1 AS BIGINT) AS step, 'signup' AS event_type,
        |  COUNT(*) AS n_users, CAST(0 AS BIGINT) AS sum_lag_ms FROM f1
        |UNION ALL
        |SELECT 2, 'click', COUNT(*),
        |  CAST(COALESCE(SUM(t - pt), 0) AS BIGINT) FROM f2
        |UNION ALL
        |SELECT 3, 'purchase', COUNT(*),
        |  CAST(COALESCE(SUM(t - pt), 0) AS BIGINT) FROM f3
        |ORDER BY step""".stripMargin,

    "approx_cms_est" -> {
      val cellSql = huSql(
        "CAST(r.rw AS VARCHAR) || ':cms:' || CAST(t.k AS VARCHAR)")
      val probeCellSql = huSql(
        "CAST(r.rw AS VARCHAR) || ':cms:' || CAST(p.k AS VARCHAR)")
      s"""WITH rws AS (SELECT CAST(ii AS BIGINT) AS rw
         |  FROM unnest(range(0, $CmsDepth)) AS u(ii)),
         |tok AS (SELECT l_partkey AS k FROM lineitem),
         |cells AS (SELECT r.rw, $cellSql % $CmsWidth AS bucket,
         |    COUNT(*) AS cnt
         |  FROM tok t CROSS JOIN rws r GROUP BY 1, 2),
         |pr AS (SELECT DISTINCT l_partkey AS k FROM lineitem
         |       WHERE l_partkey % 20 = 0),
         |pe AS (SELECT p.k, r.rw, $probeCellSql % $CmsWidth AS bucket
         |  FROM pr p CROSS JOIN rws r),
         |est AS (SELECT pe.k, MIN(COALESCE(c.cnt, 0)) AS est
         |  FROM pe LEFT JOIN cells c
         |    ON c.rw = pe.rw AND c.bucket = pe.bucket
         |  GROUP BY pe.k),
         |tc AS (SELECT l_partkey AS k, COUNT(*) AS true_cnt
         |  FROM lineitem WHERE l_partkey % 20 = 0 GROUP BY 1)
         |SELECT est.k, est.est, tc.true_cnt
         |FROM est JOIN tc ON est.k = tc.k
         |ORDER BY est.k""".stripMargin
    },

    "dq_l_diversity" ->
      s"""WITH b AS (SELECT c_nationkey,
         |    (${centsSql("c_acctbal")} + 100000000) // 100000
         |      AS bal_bucket,
         |    c_mktsegment
         |  FROM customer)
         |SELECT c_nationkey, bal_bucket,
         |  COUNT(DISTINCT c_mktsegment) AS l, COUNT(*) AS n
         |FROM b GROUP BY c_nationkey, bal_bucket
         |HAVING COUNT(DISTINCT c_mktsegment) < 3
         |ORDER BY c_nationkey, bal_bucket""".stripMargin,

    "graph_jaccard" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e0 AS (SELECT lo, hi FROM (
        |    SELECT a.p AS lo, b.p AS hi, COUNT(*) AS n
        |    FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |    GROUP BY a.p, b.p) WHERE n >= 2),
        |adj AS (SELECT lo AS v, hi AS nb FROM e0
        |        UNION ALL SELECT hi, lo FROM e0),
        |dg AS (SELECT v, COUNT(*) AS d FROM adj GROUP BY v),
        |wd AS (SELECT x.nb AS a, y.nb AS b, COUNT(*) AS n_common
        |  FROM adj x JOIN adj y ON x.v = y.v AND x.nb < y.nb
        |  GROUP BY x.nb, y.nb HAVING COUNT(*) >= 2),
        |ne AS (SELECT w.a, w.b, w.n_common FROM wd w
        |  LEFT JOIN e0 ON e0.lo = w.a AND e0.hi = w.b
        |  WHERE e0.lo IS NULL),
        |j AS (SELECT ne.a, ne.b, ne.n_common,
        |    da.d + db.d - ne.n_common AS n_union
        |  FROM ne JOIN dg da ON da.v = ne.a
        |          JOIN dg db ON db.v = ne.b)
        |SELECT a, b, n_common, n_union FROM j
        |WHERE 4 * n_common >= n_union
        |ORDER BY a, b""".stripMargin,

    "graph_bfs" -> {
      val rounds = (0 until BfsRounds).map { i =>
        s"""d${i + 1} AS (SELECT node, MIN(dist) AS dist FROM (
           |    SELECT node, dist FROM d$i
           |    UNION ALL
           |    SELECT sy.dst, d$i.dist + 1 FROM d$i
           |    JOIN sy ON sy.src = d$i.node)
           |  GROUP BY node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (SELECT DISTINCT o_custkey * 2 AS src,
         |    l_suppkey * 2 + 1 AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |sy AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
         |d0 AS (SELECT DISTINCT c_custkey * 2 AS node,
         |    CAST(0 AS BIGINT) AS dist
         |  FROM customer WHERE c_nationkey = 1),
         |$rounds
         |SELECT node, dist FROM d$BfsRounds
         |ORDER BY node""".stripMargin
    },

    "samp_group_split" -> {
      val bSql = huSql("CAST(cluster_id AS VARCHAR)")
      s"""WITH RECURSIVE ${PipelineQueries.minhashPairsCtes},
         |cedges AS (SELECT a_id AS u, b_id AS v FROM pairs
         |           UNION SELECT b_id, a_id FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM dd
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN cedges e ON e.u = r.id),
         |cl AS (SELECT id AS doc_id, MIN(lbl) AS cluster_id
         |       FROM reach GROUP BY id),
         |h AS (SELECT doc_id, cluster_id, $bSql % 100 AS b FROM cl)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN b < 80 THEN 'train'
         |       WHEN b < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM h ORDER BY doc_id""".stripMargin
    },

    "ts_anomaly" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS t,
         |    ${centsSql("value")} AS vc
         |  FROM events),
         |w AS (SELECT event_id, user_id, vc,
         |    COUNT(vc) OVER win AS n, SUM(vc) OVER win AS s1,
         |    SUM(vc * vc) OVER win AS s2
         |  FROM e WINDOW win AS (PARTITION BY user_id
         |    ORDER BY t, event_id
         |    ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)),
         |f AS (SELECT event_id, user_id, vc,
         |    (n*vc - s1) * (n*vc - s1) AS lhs,
         |    9 * (n*s2 - s1*s1) AS rhs, n
         |  FROM w)
         |SELECT event_id, user_id, vc, CAST(lhs AS BIGINT) AS lhs,
         |  CAST(rhs AS BIGINT) AS rhs
         |FROM f WHERE n = 16 AND lhs > rhs
         |ORDER BY event_id""".stripMargin,

    "txt_vocab_growth" ->
      s"""WITH tok AS (SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS term FROM documents),
         |tk AS (SELECT doc_id, term FROM tok WHERE term <> ''),
         |fs AS (SELECT term, MIN(doc_id) AS fd FROM tk GROUP BY term),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk GROUP BY doc_id),
         |cp AS (SELECT CAST(cc AS BIGINT) AS c
         |  FROM unnest([${VocabCps.mkString(", ")}]) AS u(cc)),
         |v AS (SELECT cp.c, COUNT(*) AS vocab FROM fs
         |  JOIN cp ON fs.fd <= cp.c GROUP BY cp.c),
         |tt AS (SELECT cp.c, SUM(dl.dl) AS tokens FROM dl
         |  JOIN cp ON dl.doc_id <= cp.c GROUP BY cp.c)
         |SELECT v.c, v.vocab, CAST(tt.tokens AS BIGINT) AS tokens
         |FROM v JOIN tt ON v.c = tt.c
         |ORDER BY v.c""".stripMargin
  )
}
