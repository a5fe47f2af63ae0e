package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Selection, Similarity}
import graft.ops.Pin.PinOps

/** Round-9 batch: three published data-curation operators completing
  * the selection/maintenance ring — SemDeDup (cluster-blocked semantic
  * dedup, Abbas et al. 2023), DSIR (importance-resampling data
  * selection, Xie et al. 2023) in the engine's integer-exact log₂
  * form, and IVF index delta-maintenance (the ANN serving analog of
  * the inc_* merge identities). The batch convention holds: no float
  * decides a graded value; every trained trajectory reuses the
  * already-unrolled kmeans CTE machinery. */
object Pipeline16Queries {

  type Q = (SparkSession, String) => DataFrame

  private val SdK = 8       // semdedup cells — the emb_kmeans codebook
  private val SdIters = 3   //   constants, so the oracle CTEs are shared
  private val SdTauNum = 2L // τ = 2/5 = 0.40 quantized cosine (the
  private val SdTauDen = 5L //   fixture's near-dup band; max pair 0.51)
  private val IvK = 8       // inc_ivf cells — mirrors inc_kmeans_delta
  private val IvIters = 2
  private val DsirBuckets = 8192
  private val DsirScale = 40

  val queries: Map[String, Q] = Map(

    "dd_semdedup" -> ((s, dir) => {
      // SemDeDup: k-means blocks the pair space (Σ|cell|², never N²),
      // then within-cell quantized-cosine ≥ τ drops the higher id.
      // Graded surface: every vector's (cell, kept) — both the
      // clustering trajectory and the dedup verdicts hash-gate.
      Similarity.semDedup(
          Similarity.quantizeInt8(Tables.embeddings(s, dir)),
          k = SdK, iters = SdIters,
          tauNum = SdTauNum, tauDen = SdTauDen)
        .orderBy("vec_id")
    }),

    "curate_dsir" -> ((s, dir) => {
      // DSIR: importance log-weight of every document under hashed
      // bigram bag-of-features models of target (lang='en') vs raw
      // (whole corpus), integer floor-log₂ scaled — the "make the
      // crawl look like the target" selection score. The selection
      // policy (top-k / threshold) is a trivial consumer of this
      // surface; Round16Spec asserts the ground truth (en docs score
      // above every other language's mean).
      Selection.dsirScores(Tables.documents(s, dir), "doc_id", "text",
          isTarget = col("lang") === "en",
          buckets = DsirBuckets, scalePow = DsirScale)
        .orderBy("doc_id")
    }),

    "inc_ivf_delta" -> ((s, dir) => {
      // IVF index maintenance: the base corpus trains the codebook and
      // stores its index; the arriving 1-in-7 batch ASSIGNS against the
      // broadcast codebook and appends — base vectors are never
      // rescanned. Serving over the merged index must equal the full
      // rebuild under the same codebook (the oracle), because
      // assignment under fixed centroids is per-row: the 12th inc_*
      // identity, this one on the ANN read path.
      val sk = Similarity.quantizeInt8(Tables.embeddings(s, dir))
      val isNew = col("vec_id") % 7 === 0
      val base = sk.where(!isNew).pin()
      val km = Similarity.kmeansInt8(base, IvK, IvIters)
      val idxBase = Similarity.ivfIndex(base, km.centroids).pin()
      val idxDelta = Similarity.ivfIndex(sk.where(isNew), km.centroids)
      Similarity.ivfServeInt8(idxBase.unionByName(idxDelta),
          km.centroids,
          Tables.embeddings(s, dir).where(col("vec_id") % 50 === 0),
          k = 5, nprobe = 2)
        .orderBy("query_id", "rnk")
    })
  )

  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"
  }

  val oracles: Map[String, String] = Map(

    "dd_semdedup" ->
      s"""WITH ${Pipeline10Queries.kmeansCtes(SdK, SdIters, "km")},
         |pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    CAST(list_sum(list_transform(list_zip(s1.qv, s2.qv),
         |      z -> z[1] * z[2])) AS BIGINT) AS qd,
         |    s1.qn AS na, s2.qn AS nb
         |  FROM a$SdIters a JOIN a$SdIters b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  JOIN sk s1 ON s1.vec_id = a.vec_id
         |  JOIN sk s2 ON s2.vec_id = b.vec_id),
         |dr AS (SELECT DISTINCT b_id FROM pr
         |  WHERE qd > 0 AND qd * qd * ${SdTauDen * SdTauDen} >=
         |    ${SdTauNum * SdTauNum} * na * nb)
         |SELECT a.vec_id, a.cell, (dr.b_id IS NULL) AS kept
         |FROM a$SdIters a LEFT JOIN dr ON a.vec_id = dr.b_id
         |ORDER BY vec_id""".stripMargin,

    "curate_dsir" -> {
      val scale = 1L << DsirScale
      s"""WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
         |    string_split(text, ' ') AS ws FROM documents),
         |tok AS (SELECT doc_id, tgt,
         |    ${huSql("ws[ii] || '_' || ws[ii + 1]")} % $DsirBuckets AS f
         |  FROM t, unnest(range(1, len(ws))) AS s(ii)
         |  WHERE len(ws) >= 2),
         |cf AS (SELECT f,
         |    CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |    COUNT(*) AS cr FROM tok GROUP BY 1),
         |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS tt,
         |    CAST(SUM(cr) AS BIGINT) AS tr FROM cf),
         |wt AS (SELECT f,
         |    CAST(LENGTH(printf('%b',
         |        ((ct + 1) * $scale) // (tt + $DsirBuckets))) - 1
         |      AS BIGINT)
         |  - CAST(LENGTH(printf('%b',
         |        ((cr + 1) * $scale) // (tr + $DsirBuckets))) - 1
         |      AS BIGINT) AS wf
         |  FROM cf, tot)
         |SELECT tok.doc_id, CAST(SUM(wf) AS BIGINT) AS score
         |FROM tok JOIN wt USING (f)
         |GROUP BY tok.doc_id ORDER BY doc_id""".stripMargin
    },

    "inc_ivf_delta" ->
      // full recompute: train on base only (srcFilter), assign the
      // WHOLE corpus under the trained codebook (af = the merged
      // index), serve with the sim_ivf_trained probe/re-rank CTEs
      s"""WITH ${Pipeline10Queries.kmeansCtes(IvK, IvIters, "km",
             Some("vec_id % 7 <> 0"))},
         |${Pipeline10Queries.assignCte("af", s"c$IvIters", "sk")},
         |cn AS (SELECT cell, cv,
         |    CAST(list_sum(list_transform(cv, v -> v * v)) AS BIGINT)
         |      AS cnorm FROM c$IvIters),
         |pb AS (SELECT vec_id AS query_id, qv, qn FROM sk
         |  WHERE vec_id % 50 = 0),
         |pc AS (SELECT query_id, cell FROM (
         |  SELECT p.query_id, c.cell,
         |    ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY
         |      p.qn - 2 * CAST(list_sum(list_transform(
         |          list_zip(p.qv, c.cv), z -> z[1] * z[2])) AS BIGINT)
         |        + c.cnorm,
         |      c.cell) AS rn
         |  FROM pb p CROSS JOIN cn c) WHERE rn <= 2),
         |cand AS (SELECT pc.query_id, a.vec_id AS neighbor_id
         |  FROM pc JOIN af a ON a.cell = pc.cell
         |  WHERE a.vec_id <> pc.query_id),
         |sc AS (SELECT c.query_id, c.neighbor_id,
         |    CAST(list_sum(list_transform(list_zip(p.qv, s.qv),
         |      z -> z[1] * z[2])) AS BIGINT) AS qdot,
         |    p.qn AS qna, s.qn AS qnb
         |  FROM cand c
         |  JOIN sk p ON p.vec_id = c.query_id
         |  JOIN sk s ON s.vec_id = c.neighbor_id),
         |rk AS (SELECT query_id, neighbor_id, qdot,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
         |      CAST(qdot AS DOUBLE) / (sqrt(CAST(qna AS DOUBLE)) *
         |        sqrt(CAST(qnb AS DOUBLE))) DESC,
         |      neighbor_id ASC) AS rnk FROM sc)
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, qdot
         |FROM rk WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin
  )
}
