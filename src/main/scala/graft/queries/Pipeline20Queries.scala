package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Graph, Quality, Sampling, Similarity}
import graft.ops.Pin.PinOps

/** Round-10 fourth batch: closing rings opened earlier in the round —
  * the refine tier that completes the two-tier ANN read path
  * (sim_ivfpq_refined), the local-clustering audit next to the raw
  * triangle counts (graph_lcc), the lower-variance systematic sampler
  * next to the multinomial draw (samp_systematic), the chi-square drift
  * gate next to KS (dq_chi2_drift), and the 16th inc_* identity — the
  * drift-gate family's mergeable per-value histograms (inc_ks_delta).
  * The batch convention holds: every graded value is an exact BIGINT
  * (distances, counts, deviation numerators), so hashes are bit-stable
  * across engines. */
object Pipeline20Queries {

  type Q = (SparkSession, String) => DataFrame

  private val RefShort = 20 // sim_ivfpq_refined shortlist depth
  private val RefK = 5      //   ... final k after exact rerank
  private val SysDraws = 200 // samp_systematic grid points
  private val SysSalt = "sys"

  val queries: Map[String, Q] = Map(

    "sim_ivfpq_refined" -> ((s, dir) => {
      // the complete production ANN read path: IVF+PQ shortlists 20
      // candidates from cells + 8-byte codes (never a raw vector),
      // then the refine tier reads full int8 sketches for the TINY
      // shortlist only and re-ranks by exact squared-L2 — FAISS's
      // IndexRefine / DiskANN's rerank step. ADC quantization error
      // caps recall; the refine tier recovers the ordering among the
      // survivors at the cost of |probes|·20 full-vector reads.
      val emb = Tables.embeddings(s, dir)
      // pinned ONCE at query level (r15, the Pipeline29 convention):
      // unpinned, the quantize pass re-ran in kmeansInt8, pqTrainInt8
      // (sub-vectors + seed), ivfIndex AND both refine-tier reads —
      // 6 corpus quantize passes for one query
      val sk = Similarity.quantizeInt8(emb).pin()
      val km = Similarity.kmeansInt8(sk, Pipeline18Queries.IvK,
        Pipeline18Queries.IvIters)
      val cells = Similarity.ivfIndex(sk, km.centroids)
        .select("vec_id", "cell")
      val pq = Similarity.pqTrainInt8(sk, m = Pipeline18Queries.PqM,
        ksub = Pipeline18Queries.PqK, iters = Pipeline18Queries.PqIters)
      val short = Similarity.ivfpqTopK(cells, pq.codes, pq.codebook,
        km.centroids, emb.where(col("vec_id") % 50 === 0),
        k = RefShort, nprobe = 2, m = Pipeline18Queries.PqM)
      Similarity.refineTopK(sk, sk.where(col("vec_id") % 50 === 0),
          short, RefK)
        .orderBy("query_id", "rnk")
    }),

    "graph_lcc" -> ((s, dir) => {
      // per-vertex local clustering coefficient on the top-5
      // co-occurrence graph (the graph_triangles surface): division-
      // free lcc_num = 2·n_tri over lcc_den = deg·(deg−1) — the
      // transitivity audit that tells a community detector whether the
      // kNN-association graph is clique-like or star-like before it
      // commits to a partition.
      val topk = Graph.cooccurTopK(Tables.lineitem(s, dir),
        "l_orderkey", "l_suppkey", k = 5)
      Graph.localClustering(topk, "item", "co_item")
        .orderBy("node")
    }),

    "samp_systematic" -> ((s, dir) => {
      // systematic weighted sampling over the cumulative-weight axis:
      // 200 equal-interval grid points, each row hit once per point in
      // its [lo, lo+w) span — the lower-variance resampler next to the
      // multinomial samp_inverse_cdf (a row with w ≥ step is
      // GUARANTEED in; hit counts deviate from proportionality by < 1
      // stratum). After the range-partitioned cumsum the hit count is
      // a pure codegen'd per-row formula: no join, no explode, no
      // per-draw probe side — draws scale for free.
      Sampling.systematic(Tables.documents(s, dir), "doc_id",
          col("n_chars"), draws = SysDraws, salt = SysSalt)
        .orderBy("doc_id")
    }),

    "dq_chi2_drift" -> ((s, dir) => {
      // chi-square drift gate between the same shipment eras the KS
      // gate watches — per-value exact deviation numerators
      // dev_num = |o_a·n_b − o_b·n_a| and pools, one row per quantity
      // (χ² = Σ dev²/pool / (n_a·n_b) assembles downstream). KS sees
      // CDF shifts; chi-square weights every category's deviation —
      // both gates share ONE per-value count pass (Quality.ksCounts).
      val li = Tables.lineitem(s, dir)
      val early = li.where(year(col("l_shipdate")) < 1998)
      val late = li.where(year(col("l_shipdate")) >= 1998)
      Quality.chi2Stats(early, late, "l_quantity")
        .orderBy("v")
    }),

    "inc_ks_delta" -> ((s, dir) => {
      // the 16th inc_* identity, on the drift-gate family: per-value
      // count pairs are ADDITIVE over disjoint row slices, so the KS
      // verdict from merge(hist(base), hist(delta)) EQUALS the full
      // rebuild (dq_ks_drift's SQL verbatim) — a monitor re-verdicts
      // on a new vintage without rescanning the base rows.
      val li = Tables.lineitem(s, dir)
      val isNew = col("l_orderkey") % 7 === 0
      def hist(d: DataFrame) = Quality.ksCounts(
        d.where(year(col("l_shipdate")) < 1998),
        d.where(year(col("l_shipdate")) >= 1998), "l_quantity")
      Quality.ksFromCounts(Quality.ksMergeCounts(
        hist(li.where(!isNew)), hist(li.where(isNew))))
    })
  )

  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"
  }

  val oracles: Map[String, String] = Map(

    "sim_ivfpq_refined" ->
      s"""WITH ${Pipeline18Queries.ivfpqCtes},
         |short AS (SELECT query_id, neighbor_id FROM rk
         |  WHERE rnk <= $RefShort),
         |rr AS (SELECT sh.query_id, sh.neighbor_id,
         |    p.qn
         |      - 2 * CAST(list_sum(list_transform(list_zip(p.qv, c.qv),
         |          z -> z[1] * z[2])) AS BIGINT)
         |      + c.qn AS rdist
         |  FROM short sh
         |  JOIN sk c ON c.vec_id = sh.neighbor_id
         |  JOIN sk p ON p.vec_id = sh.query_id),
         |rk2 AS (SELECT query_id, neighbor_id, rdist,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY rdist, neighbor_id) AS rnk FROM rr)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, rdist
         |FROM rk2 WHERE rnk <= $RefK
         |ORDER BY query_id, rnk""".stripMargin,

    "graph_lcc" ->
      s"""WITH ${Pipeline10Queries.triCtes},
         |deg AS (SELECT node, COUNT(*) AS deg FROM (
         |    SELECT lo AS node FROM e UNION ALL SELECT hi FROM e)
         |  GROUP BY node)
         |SELECT v.node,
         |  COALESCE(t.n_tri, CAST(0 AS BIGINT)) AS n_tri, d.deg,
         |  2 * COALESCE(t.n_tri, CAST(0 AS BIGINT)) AS lcc_num,
         |  d.deg * (d.deg - 1) AS lcc_den
         |FROM verts v
         |LEFT JOIN tv t ON v.node = t.node
         |JOIN deg d ON d.node = v.node
         |ORDER BY v.node""".stripMargin,

    "samp_systematic" ->
      s"""WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w
         |  FROM documents),
         |c AS (SELECT doc_id, w,
         |    COALESCE(SUM(w) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      0) AS lo
         |  FROM w),
         |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tot FROM w),
         |o AS (SELECT tot // $SysDraws AS step,
         |    ${huSql(s"'$SysSalt'")} % (tot // $SysDraws) AS off
         |  FROM t),
         |h AS (SELECT c.doc_id, c.w, c.lo,
         |    LEAST((c.lo + c.w - 1 - o.off + o.step) // o.step,
         |        CAST($SysDraws AS BIGINT))
         |      - LEAST((c.lo - 1 - o.off + o.step) // o.step,
         |        CAST($SysDraws AS BIGINT)) AS n_hits
         |  FROM c, o)
         |SELECT doc_id, w, CAST(lo AS BIGINT) AS lo,
         |  CAST(n_hits AS BIGINT) AS n_hits
         |FROM h WHERE n_hits > 0
         |ORDER BY doc_id""".stripMargin,

    "dq_chi2_drift" ->
      """WITH a AS (SELECT l_quantity AS v FROM lineitem
        |  WHERE YEAR(l_shipdate) < 1998),
        |b AS (SELECT l_quantity AS v FROM lineitem
        |  WHERE YEAR(l_shipdate) >= 1998),
        |ca AS (SELECT v, COUNT(*) AS c FROM a GROUP BY v),
        |cb AS (SELECT v, COUNT(*) AS c FROM b GROUP BY v),
        |j AS (SELECT COALESCE(ca.v, cb.v) AS v,
        |    COALESCE(ca.c, 0) AS oa, COALESCE(cb.c, 0) AS ob
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |tt AS (SELECT CAST(SUM(oa) AS BIGINT) AS na,
        |    CAST(SUM(ob) AS BIGINT) AS nb FROM j)
        |SELECT j.v, CAST(j.oa AS BIGINT) AS o_a,
        |  CAST(j.ob AS BIGINT) AS o_b,
        |  CAST(ABS(j.oa * tt.nb - j.ob * tt.na) AS BIGINT) AS dev_num,
        |  CAST(j.oa + j.ob AS BIGINT) AS pool
        |FROM j, tt ORDER BY j.v""".stripMargin,

    // full recompute — the merged-histogram verdict must equal the
    // from-scratch gate (the inc_tri_delta oracle-reuse convention)
    "inc_ks_delta" -> Pipeline17Queries.oracles("dq_ks_drift")
  )
}
