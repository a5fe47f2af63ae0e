package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Graph, Sampling, Similarity}
import graft.ops.Pin.PinOps

/** Round-10 second batch: the refine/serve/mix ring — one synchronous
  * Louvain local-move round over the label-propagation partition (the
  * distributed community-refinement step `graph_modularity` scores),
  * IVF+PQ composed serving (the production ANN read path: coarse cells
  * prune, 8-byte codes rank), and temperature-flattened source mixing
  * (the multilingual rebalance, exact largest-remainder quotas). */
object Pipeline18Queries {

  type Q = (SparkSession, String) => DataFrame

  private[queries] val IvK = 8      // coarse cells (inc_ivf constants)
  private[queries] val IvIters = 2
  private[queries] val PqM = 8      // PQ subspaces (sim_pq_topk constants)
  private[queries] val PqK = 8
  private[queries] val PqIters = 2
  private[queries] val PqSd = 8
  private val MixTotal = 300L // samp_temperature budget
  private val MixSalt = "tmix"

  val queries: Map[String, Q] = Map(

    "graph_louvain_move" -> ((s, dir) => {
      // one synchronous Louvain local-move round refining the
      // label-prop communities: every vertex takes its best
      // strictly-positive modularity gain against the CURRENT
      // partition, simultaneously — the engine-reproducible form of
      // the Louvain phase-1 step (sequential sweeps don't replay
      // across engines). Gains are exact longs at scale 4m²;
      // unlabeled vertices enter as singletons (the graph_modularity
      // convention).
      // shared pinned edge pass — the graph_modularity convention: the
      // purchase join runs ONCE and feeds both the label-prop
      // symmetrization and the move round
      val e0 = Pipeline8Queries.purchaseEdges(s, dir, symmetric = false)
        .pin()
      val lp = Graph.labelPropagate(Pipeline8Queries.symmetrize(e0),
        "src", "dst", Pipeline8Queries.lpSeeds(s, dir),
        "node", "lbl", iters = 3)
      val comm = lp.select(col("node"),
        coalesce(col("label").cast("long"), -col("node") - 1).as("comm"))
      Graph.louvainMoveRound(e0, "src", "dst", comm, "node", "comm")
        .orderBy("node")
    }),

    "sim_ivfpq_topk" -> ((s, dir) => {
      // IVF+PQ serving (FAISS IVFx,PQy with by_residual=false): the
      // coarse quantizer prunes to nprobe cells, asymmetric PQ
      // distance ranks the survivors from their 8-byte codes — at
      // 100 TB the query path reads (vec_id, cell) + codes + two
      // broadcast KB codebooks, never a raw vector. Reuses the graded
      // emb_kmeans cell machinery and the graded emb_pq_codes
      // codebook verbatim, so the oracle composes their unrolled CTEs.
      val emb = Tables.embeddings(s, dir)
      // pinned ONCE at query level (r15, the Pipeline29 convention):
      // unpinned, the quantize pass re-ran inside kmeansInt8's pin,
      // pqTrainInt8's sub-vector pin AND seed scan, and ivfIndex's
      // assignment — 4 corpus quantize passes for one query
      val sk = Similarity.quantizeInt8(emb).pin()
      val km = Similarity.kmeansInt8(sk, IvK, IvIters)
      val cells = Similarity.ivfIndex(sk, km.centroids)
        .select("vec_id", "cell")
      val pq = Similarity.pqTrainInt8(sk, m = PqM, ksub = PqK,
        iters = PqIters)
      Similarity.ivfpqTopK(cells, pq.codes, pq.codebook, km.centroids,
          emb.where(col("vec_id") % 50 === 0), k = 5, nprobe = 2,
          m = PqM)
        .orderBy("query_id", "rnk")
    }),

    "samp_temperature" -> ((s, dir) => {
      // temperature-flattened source mixing at T = 2 (the mBERT/XLM-R
      // exponent-smoothing recipe): per-source quotas ∝ ⌊√n_s⌋ by
      // exact largest-remainder apportionment (they sum to the budget
      // exactly), rows picked per source by deterministic hash rank.
      Sampling.temperatureMix(
          Tables.documents(s, dir).select("doc_id", "source"),
          "source", col("doc_id").cast("string"),
          total = MixTotal, salt = MixSalt)
        .select("doc_id", "source", "w_s", "quota")
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(

    "graph_louvain_move" ->
      s"""WITH ${Pipeline8Queries.labelPropCtes},
         |cm AS (SELECT node,
         |    COALESCE(CAST(label AS BIGINT), -node - 1) AS comm
         |  FROM ${Pipeline8Queries.labelPropFinal}),
         |el AS (SELECT e0.src AS lo, e0.dst AS hi,
         |    ca.comm AS cl, cb.comm AS ch
         |  FROM e0 JOIN cm ca ON ca.node = e0.src
         |  JOIN cm cb ON cb.node = e0.dst),
         |st AS (SELECT COUNT(*) AS m FROM el),
         |inc AS (SELECT lo AS node, cl AS own, ch AS nbr FROM el
         |  UNION ALL SELECT hi, ch, cl FROM el),
         |deg AS (SELECT node, COUNT(*) AS d_i FROM inc GROUP BY 1),
         |vol AS (SELECT own AS c, COUNT(*) AS d_c FROM inc GROUP BY 1),
         |kix AS (SELECT node, nbr, COUNT(*) AS k FROM inc GROUP BY 1, 2),
         |own AS (SELECT cm.node, cm.comm, COALESCE(ka.k, 0) AS k_ia,
         |    deg.d_i, va.d_c AS d_a
         |  FROM cm JOIN deg ON deg.node = cm.node
         |  JOIN vol va ON va.c = cm.comm
         |  LEFT JOIN kix ka ON ka.node = cm.node AND ka.nbr = cm.comm),
         |cand AS (SELECT o.node, kx.nbr AS c,
         |    4 * st.m * (kx.k - o.k_ia)
         |      - 2 * o.d_i * (vc.d_c - o.d_a + o.d_i) AS gain
         |  FROM own o
         |  JOIN kix kx ON kx.node = o.node AND kx.nbr <> o.comm
         |  JOIN vol vc ON vc.c = kx.nbr, st),
         |best AS (SELECT node, c FROM (SELECT node, c,
         |    ROW_NUMBER() OVER (PARTITION BY node
         |      ORDER BY gain DESC, c ASC) AS rn
         |  FROM cand WHERE gain > 0) WHERE rn = 1)
         |SELECT cm.node, CAST(COALESCE(best.c, cm.comm) AS BIGINT) AS comm
         |FROM cm LEFT JOIN best ON best.node = cm.node
         |ORDER BY cm.node""".stripMargin,

    "sim_ivfpq_topk" ->
      s"""WITH $ivfpqCtes
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, adist
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin,

    "samp_temperature" -> {
      val hu = {
        val jh = PipelineQueries.javaHashSql(
          s"'$MixSalt' || CAST(doc_id AS VARCHAR)")
        s"(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"
      }
      s"""WITH cs AS (SELECT source, COUNT(*) AS n_s,
         |    CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS w_s
         |  FROM documents GROUP BY source),
         |ap0 AS (SELECT source, n_s, w_s,
         |    SUM(w_s) OVER () AS wsum FROM cs),
         |ap AS (SELECT source, n_s, w_s,
         |    ($MixTotal * w_s) // wsum AS base,
         |    ($MixTotal * w_s) % wsum AS rem
         |  FROM ap0),
         |ex AS (SELECT $MixTotal - CAST(SUM(base) AS BIGINT) AS extra
         |       FROM ap),
         |qt AS (SELECT source, w_s,
         |    base + CASE WHEN ROW_NUMBER() OVER
         |        (ORDER BY rem DESC, source ASC) <= ex.extra
         |      THEN 1 ELSE 0 END AS quota
         |  FROM ap, ex),
         |rk AS (SELECT d.doc_id, d.source,
         |    ROW_NUMBER() OVER (PARTITION BY d.source
         |      ORDER BY $hu ASC, CAST(d.doc_id AS VARCHAR) ASC) AS rnk
         |  FROM documents d)
         |SELECT rk.doc_id, rk.source, qt.w_s,
         |  CAST(qt.quota AS BIGINT) AS quota
         |FROM rk JOIN qt ON qt.source = rk.source
         |WHERE rk.rnk <= qt.quota
         |ORDER BY rk.doc_id""".stripMargin
    }
  )

  /** CTE chain of the IVF+PQ serving path, through the ADC rank frame
    * `rk` (query_id, neighbor_id, adist, rnk over ALL scored
    * candidates) — composed by sim_ivfpq_topk (rnk ≤ 5) and by the
    * refined read path sim_ivfpq_refined in Pipeline20Queries
    * (shortlist rnk ≤ kShort, then exact int8 rerank against `sk`). */
  private[queries] lazy val ivfpqCtes: String =
    s"""${Pipeline10Queries.kmeansCtes(IvK, IvIters, "km")},
       |${Pipeline10Queries.pqCtes(PqM, PqK, PqSd, PqIters, "pq",
             shared = true)},
         |cn AS (SELECT cell, cv,
         |    CAST(list_sum(list_transform(cv, v -> v * v)) AS BIGINT)
         |      AS cnorm FROM c$IvIters),
         |pb AS (SELECT vec_id AS query_id, qv, qn FROM sk
         |  WHERE vec_id % 50 = 0),
         |pcl AS (SELECT query_id, cell FROM (
         |  SELECT p.query_id, c.cell,
         |    ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
         |      p.qn - 2 * CAST(list_sum(list_transform(
         |          list_zip(p.qv, c.cv), z -> z[1] * z[2])) AS BIGINT)
         |        + c.cnorm,
         |      c.cell) AS rn
         |  FROM pb p CROSS JOIN cn c) WHERE rn <= 2),
         |cand AS (SELECT pcl.query_id, a.vec_id
         |  FROM pcl JOIN a$IvIters a ON a.cell = pcl.cell
         |  WHERE a.vec_id <> pcl.query_id),
         |pt AS (SELECT s.vec_id AS query_id, s.sub, c.cell,
         |    s.svn
         |      - 2 * CAST(list_sum(list_transform(list_zip(s.sv, c.cv),
         |          z -> z[1] * z[2])) AS BIGINT)
         |      + CAST(list_sum(list_transform(c.cv, v -> v * v))
         |          AS BIGINT) AS tdist
         |  FROM svn s JOIN pc$PqIters c ON s.sub = c.sub
         |  WHERE s.vec_id % 50 = 0),
         |ad AS (SELECT cd.query_id, cd.vec_id AS neighbor_id,
         |    CAST(SUM(t.tdist) AS BIGINT) AS adist
         |  FROM cand cd
         |  JOIN pa$PqIters a ON a.vec_id = cd.vec_id
         |  JOIN pt t ON t.query_id = cd.query_id
         |    AND t.sub = a.sub AND t.cell = a.cell
         |  GROUP BY cd.query_id, cd.vec_id),
         |rk AS (SELECT query_id, neighbor_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY adist, neighbor_id) AS rnk FROM ad)""".stripMargin
}
