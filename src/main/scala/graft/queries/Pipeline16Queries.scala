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
  private val KcIters = 10  // emb_kmeans_converged oracle unroll — past
                            //   the fixture's fixpoint (3 rounds), so
                            //   every extra unrolled round is a no-op
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

    "dd_semdedup_far" -> ((s, dir) => {
      // the paper's keeper policy graded alongside min-id: keep the
      // vector FARTHEST from its cell centroid (Abbas et al. §2 —
      // the cluster's most distinct representative survives),
      // precedence on kmAssign's exact integer d², ties by id. Same
      // blocked Σ|cell|² pair space as dd_semdedup; only the keeper
      // ORDER differs.
      Similarity.semDedup(
          Similarity.quantizeInt8(Tables.embeddings(s, dir)),
          k = SdK, iters = SdIters,
          tauNum = SdTauNum, tauDen = SdTauDen, keepFarthest = true)
        .orderBy("vec_id")
    }),

    "emb_kmeans_converged" -> ((s, dir) => {
      // the convergence-terminated production trajectory graded: Lloyd
      // until the assignment REVISITS a state (fixpoint or integer
      // limit cycle — a 1-row fingerprint read per round), failing
      // loudly at maxIters instead of silently truncating. The 1-in-5
      // subset converges in 3 rounds at the graded fixture (10 at
      // sf0.1), keeping the oracle's unrolled CTE bounded at KcIters
      // rounds — past the fixpoint every unrolled round repeats, so
      // a$KcIters IS the converged answer. Scale trade, measured: the
      // 10× synthetic corpus needs >40 rounds (19.7 s) — convergence
      // mode is the correctness anchor; at real scale cap rounds
      // (kmeansInt8) or stream the sufficient statistics
      // (centroidStats), both graded separately.
      Similarity.kmeansInt8Converged(
          Similarity.quantizeInt8(Tables.embeddings(s, dir)
            .where(col("vec_id") % 5 === 0)),
          k = SdK, maxIters = 100)
        .assign.orderBy("vec_id")
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

    "hilbert_cluster" -> ((s, dir) => {
      // Hilbert-curve clustering key over the zorder_cluster bucket
      // pair — the layout key a range-partitioned 100 TB table sorts
      // by when BOTH dimensions are range-queried and block locality
      // matters more than the bit-twiddle cost (Hilbert has no
      // Z-shape diagonal jumps; layout_locality grades the measured
      // difference). Pure codegen'd expression, no shuffle.
      graft.expr.GraftFunctions.register(s)
      Tables.events(s, dir)
        .select(col("event_id"),
          pmod(col("user_id"), lit(65536L)).as("hx"),
          pmod(expr("ts_ms div 60000"), lit(65536L)).as("hy"))
        .withColumn("hkey",
          graft.expr.GraftFunctions.hilbert16(col("hx"), col("hy")))
        .orderBy("event_id")
    }),

    "layout_locality" -> ((s, dir) => {
      // the layout-choice audit, graded: for each clustering scheme,
      // key-RANGE blocks (the footer-stats prune unit, no global sort
      // anywhere) and the total spatial extent those blocks cover
      // (Σ dx, Σ dy over non-empty blocks). Tighter ⇒ fewer blocks
      // overlap a 2-D range predicate ⇒ fewer files read. Block size
      // 2^19, deliberately NOT a power of 4: power-of-4 key blocks
      // are quadrant-subtree tiles for ANY quadrant-recursive curve,
      // so hilbert and zorder measure IDENTICAL there (verified —
      // both (43, 6382, 42834) at 2^20 on the fixture); real file
      // boundaries are not tile-aligned, and at 2^19 the fixture
      // measures hilbert (57, 8417) vs zorder (86, 12667) blocks/Σdx
      // — the Z-shape diagonal jumps made visible. Round16Spec pins
      // the direction.
      graft.expr.GraftFunctions.register(s)
      val e = Tables.events(s, dir)
        .select(pmod(col("user_id"), lit(65536L)).as("zx"),
          pmod(expr("ts_ms div 60000"), lit(65536L)).as("zy"))
      def extent(key: org.apache.spark.sql.Column, name: String) =
        e.select(col("zx"), col("zy"),
            call_function("div", key, lit(1L << 19)).as("blk"))
          .groupBy("blk")
          .agg((max("zx") - min("zx")).as("dx"),
            (max("zy") - min("zy")).as("dy"))
          .agg(count(lit(1)).as("n_blocks"),
            sum("dx").as("sum_dx"), sum("dy").as("sum_dy"))
          .select(lit(name).as("scheme"), col("n_blocks"),
            col("sum_dx"), col("sum_dy"))
      extent(graft.expr.GraftFunctions
          .hilbert16(col("zx"), col("zy")), "hilbert")
        .unionByName(extent(graft.expr.GraftFunctions
          .zorder16(col("zx"), col("zy")), "zorder"))
        .orderBy("scheme")
    }),

    "txt_lm_logprob" -> ((s, dir) => {
      // the CCNet perplexity stage, integer-exact: add-1-smoothed
      // bigram LM trained on the corpus, every document scored by its
      // total floor-log₂ probability (lp ≤ 0, closer to 0 = more
      // predictable). Upgrades txt_lm_coverage's count proxy to a real
      // log-probability; the model joins the stream on the bigram key
      // (model-parallel — the table is Heaps-sublinear but not
      // broadcastable at corpus scale).
      graft.ops.TextOps.lmLogProbScore(Tables.documents(s, dir),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    "inc_lm_delta" -> ((s, dir) => {
      // incremental LM maintenance: the bigram model's sufficient
      // statistics are ADDITIVE over disjoint doc slices, so the
      // merged base ⊎ delta counts score IDENTICALLY to a full
      // retrain — the oracle is txt_lm_logprob's SQL verbatim (the
      // inc_tri_delta oracle-reuse convention; 13th inc_* identity).
      // The base corpus text is never re-read at merge time — only
      // its count tables.
      import graft.ops.TextOps
      val docs = Tables.documents(s, dir)
      val isNew = col("doc_id") % 7 === 0
      val pB = TextOps.lmBigramPairs(docs.where(!isNew), "doc_id", "text")
      val pD = TextOps.lmBigramPairs(docs.where(isNew), "doc_id", "text")
      val merged = TextOps.lmMergeCounts(
        TextOps.lmCounts(pB), TextOps.lmCounts(pD))
      TextOps.lmScore(pB.unionByName(pD), merged)
        .orderBy("doc_id")
    }),

    "ret_chunk_bm25" -> ((s, dir) => {
      // chunk-granular retrieval — the RAG serving unit: documents
      // split into overlapping token windows ([[TextOps.chunkTokens]],
      // 32 tokens, stride 24), each chunk an independent BM25 unit
      // with (doc_id, chunk_idx) provenance riding in the unit id.
      // Chunking is embarrassingly parallel (no shuffle); the BM25
      // pass inherits txt_bm25's shape (query vocab semi-join before
      // the tf shuffle, 1-row stats broadcast). Answer-bearing spans
      // rank ABOVE their host documents' noise — which is the reason
      // RAG indexes chunks, not documents.
      import s.implicits._
      val qdf = Pipeline11Queries.QuerySet.toDF("query_id", "term")
      val ch = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(graft.ops.TextOps.chunkTokens(col("text"),
            chunk = 32, overlap = 8)).as("c"))
        .select(when(col("c.idx") < 100000L &&
              col("doc_id") < lit(Long.MaxValue / 100000L),
            col("doc_id") * 100000L + col("c.idx"))
          .otherwise(raise_error(lit("ret_chunk_bm25: unit-id packing " +
            "overflow — chunk_idx >= 100000 or doc_id >= 2^63/100000; " +
            "widen the packing")))
          .as("unit_id"),
          col("c.chunk_text").as("ctext"))
      graft.ops.Retrieval.bm25TopK(ch, "unit_id", "ctext", qdf, k = 10)
        .select(col("query_id"), col("rnk"),
          call_function("div", col("doc_id"), lit(100000L)).as("doc_id"),
          pmod(col("doc_id"), lit(100000L)).as("chunk_idx"), col("score"))
        .orderBy("query_id", "rnk")
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

  /** 16 unrolled Hilbert levels as chained CTEs `g1..g16` over `g0`
    * (columns: carried `keep` cols + x, y, d) — the exact integer
    * mirror of ZOrderUtil.hilbert16's loop (re-mask, then
    * rotate/reflect into the quadrant). */
  private def hilbertCtes(keep: String): String =
    (0 until 16).map { i =>
      val s = 1L << (15 - i)
      s"""g${i + 1} AS (SELECT $keep,
         |    CASE WHEN ry = 1 THEN xm
         |         WHEN rx = 1 THEN ${s - 1} - ym ELSE ym END AS x,
         |    CASE WHEN ry = 1 THEN ym
         |         WHEN rx = 1 THEN ${s - 1} - xm ELSE xm END AS y,
         |    d + ${s * s} *
         |      (CASE WHEN rx = 0 THEN ry ELSE 3 - ry END) AS d
         |  FROM (SELECT $keep,
         |      (x // $s) % 2 AS rx, (y // $s) % 2 AS ry,
         |      x % $s AS xm, y % $s AS ym, d
         |    FROM g$i))""".stripMargin
    }.mkString(",\n")

  private val lmLogProbSql: String =
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
         |      FROM documents),
         |pr AS (SELECT doc_id, ws[ii] AS w1, ws[ii + 1] AS w2
         |  FROM t, unnest(range(1, len(ws))) AS u(ii)
         |  WHERE len(ws) >= 2),
         |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pr GROUP BY 1, 2),
         |c1 AS (SELECT w1, COUNT(*) AS c1 FROM pr GROUP BY 1),
         |vv AS (SELECT COUNT(DISTINCT w1) AS v FROM pr),
         |wt AS (SELECT w1, w2,
         |    CAST(LENGTH(printf('%b',
         |        ((c12 + 1) * ${1L << 40}) // (c1 + v))) - 1 - 40
         |      AS BIGINT) AS lw
         |  FROM c12 JOIN c1 USING (w1), vv)
         |SELECT pr.doc_id, COUNT(*) AS n_bi,
         |  CAST(SUM(lw) AS BIGINT) AS lp
         |FROM pr JOIN wt USING (w1, w2)
         |GROUP BY pr.doc_id ORDER BY doc_id""".stripMargin

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

    "dd_semdedup_far" ->
      s"""WITH ${Pipeline10Queries.kmeansCtes(SdK, SdIters, "km")},
         |pr AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    CAST(list_sum(list_transform(list_zip(s1.qv, s2.qv),
         |      z -> z[1] * z[2])) AS BIGINT) AS qd,
         |    s1.qn AS na, s2.qn AS nb
         |  FROM a$SdIters a JOIN a$SdIters b
         |    ON a.cell = b.cell AND (a.dist2 > b.dist2
         |      OR (a.dist2 = b.dist2 AND a.vec_id < b.vec_id))
         |  JOIN sk s1 ON s1.vec_id = a.vec_id
         |  JOIN sk s2 ON s2.vec_id = b.vec_id),
         |dr AS (SELECT DISTINCT b_id FROM pr
         |  WHERE qd > 0 AND qd * qd * ${SdTauDen * SdTauDen} >=
         |    ${SdTauNum * SdTauNum} * na * nb)
         |SELECT a.vec_id, a.cell, (dr.b_id IS NULL) AS kept
         |FROM a$SdIters a LEFT JOIN dr ON a.vec_id = dr.b_id
         |ORDER BY vec_id""".stripMargin,

    "emb_kmeans_converged" ->
      // MATERIALIZED: DuckDB inlines CTEs by default, and each Lloyd
      // round references the previous round's CTEs more than once, so
      // a 10-round inlined unroll explodes ~3^10× — materializing each
      // round keeps the oracle linear in rounds (0.2 s at the fixture)
      s"""WITH ${Pipeline10Queries.kmeansCtes(SdK, KcIters, "km",
             Some("vec_id % 5 = 0"))
           .replace("AS (SELECT", "AS MATERIALIZED (SELECT")}
         |SELECT vec_id, cell, dist2 FROM a$KcIters
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

    "hilbert_cluster" ->
      s"""WITH g0 AS (SELECT event_id,
         |    (user_id % 65536) AS zx,
         |    ((epoch_ms(ts) // 60000) % 65536) AS zy,
         |    (user_id % 65536) AS x,
         |    ((epoch_ms(ts) // 60000) % 65536) AS y,
         |    CAST(0 AS BIGINT) AS d
         |  FROM events),
         |${hilbertCtes("event_id, zx, zy")}
         |SELECT event_id, zx AS hx, zy AS hy, d AS hkey
         |FROM g16 ORDER BY event_id""".stripMargin,

    "layout_locality" -> {
      val zx = "(user_id % 65536)"
      val zy = "((epoch_ms(ts) // 60000) % 65536)"
      s"""WITH g0 AS (SELECT $zx AS zx, $zy AS zy,
         |    $zx AS x, $zy AS y, CAST(0 AS BIGINT) AS d
         |  FROM events),
         |${hilbertCtes("zx, zy")},
         |hb AS (SELECT d // ${1L << 19} AS blk,
         |    MAX(zx) - MIN(zx) AS dx, MAX(zy) - MIN(zy) AS dy
         |  FROM g16 GROUP BY 1),
         |zb AS (SELECT ${Pipeline2Queries.zorderSql("zx", "zy")}
         |      // ${1L << 19} AS blk,
         |    MAX(zx) - MIN(zx) AS dx, MAX(zy) - MIN(zy) AS dy
         |  FROM g0 GROUP BY 1)
         |SELECT 'hilbert' AS scheme, COUNT(*) AS n_blocks,
         |  CAST(SUM(dx) AS BIGINT) AS sum_dx,
         |  CAST(SUM(dy) AS BIGINT) AS sum_dy FROM hb
         |UNION ALL
         |SELECT 'zorder', COUNT(*),
         |  CAST(SUM(dx) AS BIGINT), CAST(SUM(dy) AS BIGINT) FROM zb
         |ORDER BY scheme""".stripMargin
    },

    "txt_lm_logprob" -> lmLogProbSql,

    // full recompute — merged-counts scoring must equal the retrain
    "inc_lm_delta" -> lmLogProbSql,


    "ret_chunk_bm25" ->
      // the txt_bm25 oracle over CHUNK units: documents window into
      // 32-token chunks at stride 24 (chunkTokens' nChunks formula),
      // unit_id packs (doc_id, chunk_idx); the chunk token lists feed
      // the same BM25 contribution formula verbatim
      s"""WITH q(query_id, term) AS
         |  (VALUES ${Pipeline11Queries.querySetSql}),
         |t AS (SELECT doc_id, string_split(text, ' ') AS ws
         |      FROM documents),
         |nn AS (SELECT doc_id, ws,
         |    CASE WHEN len(ws) <= 32 THEN 1
         |         ELSE 1 + ((len(ws) - 32 + 23) // 24) END AS nc
         |  FROM t),
         |chk AS (SELECT doc_id * 100000 + k AS unit_id,
         |    ws[k * 24 + 1 : k * 24 + 32] AS cw
         |  FROM nn, unnest(range(0, nc)) AS u(k)),
         |tk AS (SELECT unit_id AS doc_id, unnest(cw) AS term FROM chk),
         |tk2 AS (SELECT doc_id, term FROM tk WHERE term <> ''),
         |dl AS (SELECT doc_id, COUNT(*) AS dl FROM tk2 GROUP BY doc_id),
         |st AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS s_tok FROM dl),
         |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tk2
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
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk,
         |  doc_id // 100000 AS doc_id, doc_id % 100000 AS chunk_idx,
         |  score
         |FROM rk WHERE rnk <= 10
         |ORDER BY query_id, rnk""".stripMargin,

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
