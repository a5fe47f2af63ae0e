package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Freq, Multimodal, Retrieval, Similarity, TimeSeries}
import graft.ops.Pin.PinOps

/** Round-12 second batch: the k-NN-graph family (exact mutual-kNN
  * baseline, NN-descent as the 100 TB construction path, the 18th
  * merge≡rebuild identity on k-NN lists), the ERR retrieval metric,
  * and the KMV bottom-k distinct sketch with its own identity (19th).
  *
  * Reference scope note: the reference (sri2db) has no vector or sketch
  * surface — these are north-star LLM-pipeline extensions in the same
  * exact-integer, oracle-first idiom as the sim_ and dd_ families.
  */
object Pipeline24Queries {

  type Q = (SparkSession, String) => DataFrame

  private[queries] val K = 5 // the k of every k-NN list in this file
  /** Fixed-N ground-truth corpus for the brute (N²) anchors —
    * [[graft.ops.Similarity.anchorSample]]'s n. 500 = the WHOLE
    * embedding corpus at the sf0.01 correctness grade (sample ≡
    * corpus there, outputs unchanged); past it the anchors' pair
    * space stays 500² at ANY scale factor, so scale refreshes read
    * the engine's real curve instead of the anchors' by-design N². */
  private[queries] val AnchorN = 500
  private[queries] val NndPlanes = 4 // 16 LSH seed buckets for NN-descent
  private val KmvK = 32 // bottom-k sketch width
  private val PowerRounds = 4 // emb_power_iter matvec rounds
  private val PowerKeep = 20 // renorm target magnitude = 2^20

  val queries: Map[String, Q] = Map(

    "sim_knn_graph" -> ((s, dir) => {
      // mutual-kNN graph over the int8 sketch of the ANCHOR-SAMPLED
      // corpus (fixed N=500, deterministic bottom-by-hash — the whole
      // corpus at the correctness SF): an edge survives only if each
      // endpoint ranks in the other's top-5 — the hub-killing
      // symmetrization whose connected components are the usual
      // embedding-cluster definition. Brute N²-bounded BASELINE (the
      // oracle anchor, SF-independent by the fence); sim_nn_descent is
      // the scale path to the same lists over the full corpus.
      Similarity.mutualKnnGraph(
          Similarity.anchorSample(
            Similarity.quantizeInt8(Tables.embeddings(s, dir)), AnchorN),
          K)
        .orderBy("a_id", "b_id")
    }),

    "inc_knn_delta" -> ((s, dir) => {
      // the 18th inc_* identity: k-NN lists are a top-k semilattice
      // (top-k(A∪B) = top-k(top-k(A) ∪ top-k(B)) under the total
      // per-query ranking), so a corpus batch arrival merges the STORED
      // base lists with delta-only scores — base×base never rescans.
      // Split by vec_id hash class; quantization is per-vector, hence
      // split-invariant. Anchor-sampled (the brute-rebuild oracle is
      // the N² side of the identity). Oracle = the full rebuild.
      val sk = Similarity.anchorSample(
        Similarity.quantizeInt8(Tables.embeddings(s, dir)), AnchorN)
      val isNew = col("vec_id") % 3 === 0
      Similarity.knnListsMergedDelta(
          sk.where(!isNew), sk.where(isNew), K)
        .select("query_id", "rnk", "neighbor_id", "qdot")
        .orderBy("query_id", "rnk")
    }),

    "sim_nn_descent" -> ((s, dir) => {
      // LSH-seeded NN-descent (Dong et al. 2011), one refinement round:
      // seed lists = exact top-5 within each of 16 sign-LSH buckets
      // (integer plane sums — bit-reproducible), then candidates =
      // current ∪ neighbors-of-neighbors ∪ reverse, scored exactly and
      // cut back to top-5. O(N·k²) scored pairs per round — the kNN
      // graph construction that survives where sim_knn_graph's brute
      // N² does not. Fully deterministic, end-to-end oracle-graded.
      val sk = Similarity.quantizeInt8(Tables.embeddings(s, dir))
      Similarity.nnDescentRound(sk,
          Similarity.nnDescentInit(sk, K, NndPlanes), K)
        .select("query_id", "rnk", "neighbor_id", "qdot")
        .orderBy("query_id", "rnk")
    }),

    "sim_recall_nnd" -> ((s, dir) => {
      // the measured-recall audit of the nn-descent tier (the
      // sim_recall_* convention): |round-1 lists ∩ exact lists| over
      // |exact lists|, as exact integers. One row. Calibration note:
      // this corpus is ISOTROPIC (same-label cosine lift ≈ 0,
      // builder-measured), so any sub-quadratic method's recall here
      // is ≈ candidates-examined/N and extra rounds hit a fixed point
      // (round 2 adds 0 hits, measured) — on manifold-structured real
      // embeddings the neighbor-of-neighbor expansion is exactly what
      // converges. The graded object is the deterministic process and
      // the honest audit, not the noise ceiling. Both sides run on the
      // ANCHOR SAMPLE (like vs like — the exact side is the N² brute,
      // and recall against an exact list from a different corpus would
      // be meaningless).
      val sk = Similarity.anchorSample(
        Similarity.quantizeInt8(Tables.embeddings(s, dir)), AnchorN)
      val exact = Similarity.knnListsOnSketch(sk, K)
        .select("query_id", "neighbor_id").pin()
      val refined = Similarity.nnDescentRound(sk,
          Similarity.nnDescentInit(sk, K, NndPlanes), K)
        .select("query_id", "neighbor_id")
      exact.join(refined, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(exact.agg(count(lit(1)).as("total"))))
    }),

    "sim_knn_components" -> ((s, dir) => {
      // embedding-cluster extraction END-TO-END: int8 sketch →
      // mutual-kNN edges → connected components → canonical min id —
      // the semantic-dedup grouping read path (SemDeDup keeps one doc
      // per component). Composes two already-graded operators; edges
      // derive from the sketch's own ids, so the CC endpoint fence is
      // skipped (the dd_cluster_cc convention). Anchor-sampled — the
      // production twin over the full corpus is sim_nnd_components.
      val sk = Similarity.anchorSample(
        Similarity.quantizeInt8(Tables.embeddings(s, dir)), AnchorN)
      graft.ops.Cluster.connectedComponents(
          sk.select(col("vec_id")), "vec_id",
          Similarity.mutualKnnGraph(sk, K), "a_id", "b_id",
          edgesCovered = true)
        .select(col("id").as("vec_id"), col("cluster").as("cluster_id"),
          (col("cluster") === col("id")).as("is_canonical"))
        .orderBy("vec_id")
    }),

    "sim_nnd_components" -> ((s, dir) => {
      // the PRODUCTION-SHAPED twin of sim_knn_components: components
      // over the mutual-ized NN-DESCENT lists instead of the brute N²
      // graph — the whole read path (seed → refine → mutualize →
      // components) is sub-quadratic, so THIS is what runs at 100 TB
      // while sim_knn_components stays the exact anchor.
      val sk = Similarity.quantizeInt8(Tables.embeddings(s, dir))
      val lists = Similarity.nnDescentRound(sk,
        Similarity.nnDescentInit(sk, K, NndPlanes), K)
      graft.ops.Cluster.connectedComponents(
          sk.select(col("vec_id")), "vec_id",
          Similarity.mutualizeLists(lists), "a_id", "b_id",
          edgesCovered = true)
        .select(col("id").as("vec_id"), col("cluster").as("cluster_id"),
          (col("cluster") === col("id")).as("is_canonical"))
        .orderBy("vec_id")
    }),

    "ret_err" -> ((s, dir) => {
      // Expected Reciprocal Rank (Chapelle et al. 2009) of the graded
      // BM25 top-10 against the boolean-AND qrels — the cascade-model
      // third of the eval gate next to ret_mrr/ret_map. err_num =
      // Σ_{hit at r} 2580480 div (r·2^{h_r}) is exact (2580480 =
      // lcm(1..10)·2¹⁰ clears every denominator); ERR = err_num/2580480
      // assembles downstream.
      import s.implicits._
      val qdf = Pipeline11Queries.QuerySet.toDF("query_id", "term")
      val docs = Tables.documents(s, dir)
      val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", qdf, k = 10)
        .select("query_id", "rnk", "doc_id")
      val qrels = Retrieval.booleanQrels(docs, "doc_id", "text", qdf)
      Retrieval.errEval(ranked, qrels)
        .orderBy("query_id")
    }),

    "approx_bottomk" -> ((s, dir) => {
      // KMV bottom-32 distinct sketch (Bar-Yossef 2002 / Beyer 2007)
      // of the active customers per order month: the k smallest
      // java_hash_u32 values per group ARE both the (k−1)·2³²/h_k
      // distinct estimator and a uniform sample of the keys. The
      // mergeable-summary counterpart of approx_distinct's HLL — union
      // k-row summaries across shards/days, never the data. Groups
      // that fit entirely (n_sketch < k) are flagged exact.
      val o = Tables.orders(s, dir)
        .select(substring(col("o_orderdate").cast("date").cast("string"),
            1, 7).as("mo"),
          col("o_custkey"))
      val sk = Freq.bottomK(o, "mo", "o_custkey", KmvK).pin()
      sk.join(Freq.kmvEstimate(sk, KmvK), "grp")
        .select(col("grp"), col("rnk"), col("hu"), col("k_key"),
          col("n_sketch"), col("est_num"), col("est_den"))
        .orderBy("grp", "rnk")
    }),

    "dq_t_closeness" -> ((s, dir) => {
      // the third privacy gate (k-anonymity → l-diversity →
      // t-closeness): per-nation total-variation distance between the
      // class's market-segment mix and the global one, flagged at
      // t = 1/5 — exact cross-multiplied integers throughout.
      graft.ops.Quality.tClosenessTV(
          Tables.customer(s, dir)
            .select(col("c_nationkey"), col("c_mktsegment")),
          Seq("c_nationkey"), "c_mktsegment", tNum = 1, tDen = 5)
        .orderBy("c_nationkey")
    }),

    "graph_ktruss" -> ((s, dir) => {
      // 3-round 4-truss peeling on the top-5 co-occurrence graph (the
      // graph_triangles fixture — degree ≤ 2k at any corpus size):
      // every surviving edge sits in ≥ 2 triangles of the surviving
      // subgraph — the cohesion cut one step stronger than k-core.
      // Peeling is idempotent past convergence, so the fixed-depth
      // unrolled oracle grades the fixpoint.
      graft.ops.Graph.ktrussRounds(
          graft.ops.Graph.cooccurTopK(Tables.lineitem(s, dir),
            "l_orderkey", "l_suppkey", k = 5),
          "item", "co_item", k = 4, rounds = 3)
        .orderBy("lo", "hi")
    }),

    "ts_mad_anomaly" -> ((s, dir) => {
      // the robust (median/MAD) anomaly gate beside ts_anomaly's
      // rolling z: mean/variance gates move WITH the outliers they
      // hunt; median/MAD have a 50% breakdown point. Flags days whose
      // REVENUE deviates |x − median| > 3·MAD, in scaled integers
      // (2·d2 > 3·mad4). Revenue cents, not counts: sparse small-count
      // series degenerate to MAD = 0 (builder-measured: median-1 days
      // made the count gate flag 40%), where the cents series keeps a
      // healthy scale.
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").cast("date").as("day"))
        .agg(sum(Fixtures.cents("o_totalprice")).as("x"))
      TimeSeries.madAnomaly(daily, Seq("pri"), col("day"), "x",
          cNum = 3, cDen = 1)
        .withColumnRenamed("__o", "day")
        .orderBy("pri", "day")
    }),

    "ts_sax" -> ((s, dir) => {
      // SAX symbolization (Lin et al. 2003) of the daily order-count
      // series per priority — 8 PAA windows, 4-letter equi-depth
      // alphabet (the exact-arithmetic breakpoint variant), plus the
      // concatenated SAX word per series: the motif/novelty-mining prep
      // next to ts_acf's seasonality probe.
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      TimeSeries.saxWords(daily, Seq("pri"), Seq(col("day")), "x",
          windows = 8, alphabet = 4)
        .orderBy("pri", "w")
    }),

    "mm_scene_cuts" -> ((s, dir) => {
      // shot-boundary detection over media payloads: frame-energy jumps
      // exceeding the mean frame energy, division-free — the
      // video-curation gate beside mm_audio_vad/mm_audio_snr, with the
      // same synthetic flat asset grading the no-cut branch.
      Multimodal.sceneCuts(
          Multimodal.mediaFromDocuments(s, dir).toDF()
            .select("media_id", "payload")
            .unionByName(s.range(1).select(
              lit(-1L).as("media_id"),
              encode(lit("a" * 16), "UTF-8").as("payload"))),
          "payload", frames = 16)
        .select("media_id", "n_cuts", "first_cut", "max_jump")
        .orderBy("media_id")
    }),

    "emb_power_iter" -> ((s, dir) => {
      // the distributed eigen path over the int8 Gram matrix: 4 integer
      // power-iteration rounds with deterministic renormalization —
      // PCA/whitening prep where the corpus is touched once (inside the
      // map-side-combined gram pass) and each round is a d²-row matvec
      // + a 1-row broadcast renorm, corpus-size-independent.
      Similarity.powerIterInt(
          Similarity.quantizeInt8(Tables.embeddings(s, dir)),
          rounds = PowerRounds)
        .orderBy("i")
    }),

    "inc_power_delta" -> ((s, dir) => {
      // the 20th inc_* identity, on the covariance/PCA maintenance
      // path: the gram is ADDITIVE over corpus slices, so a batch
      // arrival sums its d²-row gram into the stored one (gramMerge)
      // and the power iteration re-runs on the merged frame — the
      // delta slice is scanned once, the base corpus never rescanned.
      // Oracle = the full rebuild (emb_power_iter's SQL verbatim).
      val sk = Similarity.quantizeInt8(Tables.embeddings(s, dir))
      val isNew = col("vec_id") % 4 === 0
      Similarity.powerIterFromGram(
          Similarity.gramMerge(
            Similarity.gramInt8(sk.where(!isNew)),
            Similarity.gramInt8(sk.where(isNew))),
          rounds = PowerRounds)
        .orderBy("i")
    }),

    "txt_min_pieces" -> ((s, dir) => {
      // OPTIMAL tokenization count: train the piece vocab on the corpus
      // (all singles + top-64 n-grams of length 2..4, deterministic
      // tie-break), then count the MINIMUM pieces per token with the
      // codegen'd min_pieces DP — the exact token-budget number that
      // txt_bpe_encode's greedy replay only upper-bounds. The vocab is
      // a fence-bounded driver literal (≤ 1024 pieces, loud require —
      // the tokenBudget-histogram collect convention); application is
      // one broadcast-literal expression pass, embarrassingly parallel
      // at any scale. Oracle: the DP replayed as a BFS-layered
      // recursive CTE (states are (word, pos, k) — O(len²) per word,
      // never per-path).
      graft.expr.GraftFunctions.register(s)
      val docs = Tables.documents(s, dir)
      val vrows = graft.ops.TextOps.pieceVocab(docs, "text",
          topM = 64, maxLen = 4)
        .limit(1025).collect().map(_.getString(0))
      require(vrows.length <= 1024,
        s"piece vocab exceeded the 1024 fence (${vrows.length} rows) — " +
          "raise deliberately, don't stream an unbounded set to the driver")
      val vlit = typedlit(vrows.sorted.toSeq)
      docs.select(col("doc_id"),
          explode(graft.ops.TextOps.tokens(col("text"))).as("w"))
        .where(col("w") =!= "")
        .select(col("doc_id"),
          graft.expr.GraftFunctions.min_pieces(col("w"), vlit).as("p"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("p").cast("long")).as("n_pieces"))
        .orderBy("doc_id")
    }),

    "approx_kmv_jaccard" -> ((s, dir) => {
      // sketch set-algebra (the theta-sketch trick): estimate the
      // customer overlap between two order years from their KMV
      // summaries alone — merge to the union's bottom-64, count
      // survivors present in BOTH sketches. J ≈ matches/k_eff; exact
      // integers out, the division forms downstream.
      val o = Tables.orders(s, dir)
        .select(year(col("o_orderdate").cast("date")).as("y"),
          col("o_custkey"))
      def sk(y: Int) = Freq.bottomK(
        o.where(col("y") === y).select(lit("u").as("g"),
          col("o_custkey")), "g", "o_custkey", KmvK * 2)
      Freq.kmvJaccard(sk(1995).pin(), sk(1996).pin(), KmvK * 2)
    }),

    "stream_kmv" -> ((s, dir) => {
      // the KMV sketch as STREAMING state: bottom-8 distinct-user
      // sketch per event type, maintained by the KmvBottomK Aggregator
      // under a complete-mode drain — per-group state is ≤ 8 entries
      // (the stream_cms bounded-state regime), and the semilattice
      // merge makes the final emission equal the batch sketch for any
      // batching. Oracle = the batch KMV rebuild over events.
      StreamDrains.drain(s,
          StreamDrains.kmvPipeline(Pipeline6Queries.eventsStream(s, dir)),
          "complete", "skmv")
        .select(col("grp"), posexplode(col("sk.entries")))
        .select(col("grp"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.hu").as("hu"), col("col.k_key").as("k_key"))
        .orderBy("grp", "rnk")
    }),

    "inc_bottomk_delta" -> ((s, dir) => {
      // the 19th inc_* identity: the KMV sketch is a join-semilattice —
      // bottomK(A∪B) = bottomKMerge(bottomK(A) ∪ bottomK(B)) exactly.
      // Split the order stream by orderkey parity (BOTH slices see all
      // groups — the merge has to reconcile overlapping group sketches,
      // not just disjoint ones), sketch each, merge the 32-row
      // summaries. Oracle = the full rebuild (approx_bottomk's SQL).
      val o = Tables.orders(s, dir)
        .select(substring(col("o_orderdate").cast("date").cast("string"),
            1, 7).as("mo"),
          col("o_custkey"), col("o_orderkey"))
      val isNew = col("o_orderkey") % 2 === 0
      def sk(d: DataFrame) = Freq.bottomK(d, "mo", "o_custkey", KmvK)
      val merged = Freq.bottomKMerge(
        sk(o.where(!isNew)).unionByName(sk(o.where(isNew))), KmvK).pin()
      merged.join(Freq.kmvEstimate(merged, KmvK), "grp")
        .select(col("grp"), col("rnk"), col("hu"), col("k_key"),
          col("n_sketch"), col("est_num"), col("est_den"))
        .orderBy("grp", "rnk")
    })
  )

  // --------------------------------------------------------------------
  // Oracles
  // --------------------------------------------------------------------

  /** The int8-sketch CTE stack (mx → qq → qn), shared with
    * sim_quantized_topk's oracle: per-vector max-abs floor quantization,
    * zero/NaN vectors fenced, exact integer norms. */
  private[queries] val qnCtes: String =
    """mx AS (SELECT vec_id, embedding,
      |  CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
      |    AS ma FROM embeddings),
      |qq AS (SELECT vec_id,
      |  list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 127 / ma) AS BIGINT)) AS qv
      |  FROM mx WHERE ma > 0 AND NOT isnan(ma)),
      |qn AS (SELECT vec_id, qv,
      |  list_sum(list_transform(qv, v -> v * v)) AS q_norm FROM qq)"""
      .stripMargin

  private[queries] def qdotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), z -> z[1] * z[2])) " +
      "AS BIGINT)"

  private[queries] val rankOrder: String =
    """CAST(qdot AS DOUBLE) /
      |      (sqrt(CAST(qna AS DOUBLE)) * sqrt(CAST(qnb AS DOUBLE))) DESC,
      |      neighbor_id ASC""".stripMargin

  /** The fixed-N anchor sample over qn — bottom-[[AnchorN]] by
    * (java_hash_u32(vec_id), vec_id), mirroring
    * [[Similarity.anchorSample]] exactly. At the sf0.01 correctness
    * corpus (500 vectors) qs == qn, so the graded outputs are
    * unchanged; past it the brute anchors stop growing N² with SF. */
  private[queries] val anchorCtes: String =
    s"""$qnCtes,
       |qh AS (SELECT vec_id, qv, q_norm,
       |    CASE WHEN h < 0 THEN h + 4294967296 ELSE h END AS hu
       |  FROM (SELECT vec_id, qv, q_norm,
       |      ${PipelineQueries.javaHashSql("CAST(vec_id AS VARCHAR)")}
       |      AS h
       |    FROM qn)),
       |qs AS (SELECT vec_id, qv, q_norm FROM (
       |    SELECT vec_id, qv, q_norm,
       |      ROW_NUMBER() OVER (ORDER BY hu ASC, vec_id ASC) AS srn
       |    FROM qh) WHERE srn <= $AnchorN)""".stripMargin

  /** Brute k-NN lists over the ANCHOR SAMPLE — the rebuild both
    * sim_knn_graph and inc_knn_delta grade against. */
  private val knnListsCtes: String =
    s"""$anchorCtes,
       |sc AS (SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${qdotSql("p.qv", "c.qv")} AS qdot,
       |    p.q_norm AS qna, c.q_norm AS qnb
       |  FROM qs p, qs c WHERE c.vec_id <> p.vec_id),
       |rk AS (SELECT query_id, neighbor_id, qdot,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
       |      $rankOrder) AS rnk
       |  FROM sc),
       |lists AS (SELECT query_id, neighbor_id, qdot FROM rk
       |  WHERE rnk <= $K)""".stripMargin

  /** Integer sign-LSH bucket bits over qv — [[Similarity.bucketExprInt]]
    * with the plane matrix embedded as SQL literals (the lshTopK oracle
    * convention). */
  private def bucketSql(planes: Int): String =
    (0 until planes).map { p =>
      val signs = (0 until 64)
        .map(i => if (Similarity.planeSign(p, i) > 0) "1" else "-1")
        .mkString(", ")
      s"""(CASE WHEN list_sum(list_transform(list_zip(qv, [$signs]),
         |      z -> z[1] * z[2])) > 0 THEN ${1L << p} ELSE 0 END)"""
        .stripMargin
    }.mkString("\n    + ")

  /** LSH-seeded NN-descent, one round — init buckets, seed lists,
    * candidate expansion, exact re-score, final cut. Ends with CTE
    * `fin(query_id, neighbor_id, qdot, rnk)`. */
  /** The NN-descent CTE tail (bk → … → fin) over sketch CTE `src` —
    * `src` = qn for the production queries (whole corpus),
    * qs for the recall audit (the anchor-sampled ground-truth
    * corpus, so recall compares like with like). */
  private[queries] def nndTail(src: String): String = {
    // the occupancy-adaptive plane count, mirrored from
    // Similarity.nnDescentInit: p = base + #{j : N > occ·2^j}, bucket =
    // low-p-bit prefix of the 16-plane signature. At the sf0.01
    // correctness corpus p = NndPlanes, so the prefix equals the old
    // fixed-plane bucket bit-for-bit.
    val thresholds = (NndPlanes until Similarity.AdaptiveMaxPlanes)
      .map(j => s"+ (CASE WHEN nv > ${Similarity.AdaptiveOcc << j} " +
        "THEN 1 ELSE 0 END)")
      .mkString("\n      ")
    s"""nbv AS (SELECT COUNT(*) AS nv FROM $src),
       |plv AS (SELECT $NndPlanes
       |      $thresholds AS p
       |  FROM nbv),
       |bk AS (SELECT vec_id, qv, q_norm,
       |    (${bucketSql(Similarity.AdaptiveMaxPlanes)})
       |      % (CAST(1 AS BIGINT) << p) AS bucket
       |  FROM $src, plv),
       |isc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    ${qdotSql("q.qv", "c.qv")} AS qdot,
       |    q.q_norm AS qna, c.q_norm AS qnb
       |  FROM bk q JOIN bk c ON q.bucket = c.bucket
       |    AND c.vec_id <> q.vec_id),
       |ini AS (SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
       |        $rankOrder) AS rnk
       |    FROM isc) WHERE rnk <= $K),
       |cand AS (SELECT DISTINCT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id FROM ini
       |    UNION ALL
       |    SELECT a.query_id, b.neighbor_id
       |    FROM ini a JOIN ini b ON b.query_id = a.neighbor_id
       |    UNION ALL
       |    SELECT neighbor_id, query_id FROM ini)
       |  WHERE query_id <> neighbor_id),
       |fsc AS (SELECT cand.query_id, cand.neighbor_id,
       |    ${qdotSql("p.qv", "c.qv")} AS qdot,
       |    p.q_norm AS qna, c.q_norm AS qnb
       |  FROM cand JOIN $src p ON p.vec_id = cand.query_id
       |  JOIN $src c ON c.vec_id = cand.neighbor_id),
       |fin AS (SELECT query_id, neighbor_id, qdot,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
       |      $rankOrder) AS rnk
       |  FROM fsc)""".stripMargin
  }

  /** Full-corpus NN-descent stack — sim_nn_descent /
    * sim_nnd_components (the production paths stay unsampled). */
  private val nndCtes: String = s"$qnCtes,\n${nndTail("qn")}"

  /** Anchor-sampled NN-descent stack — sim_recall_nnd only. */
  private val nndAnchorCtes: String =
    s"$anchorCtes,\n${nndTail("qs")}"

  /** Integer power iteration, unrolled — gram directly as the FULL
    * matrix (G is symmetric, so the engine's triangle+mirror equals
    * qv[a.i]·qv[b.i] both orders); each round = matvec + 1-row max +
    * renorm. The sign(w)·(|w| div q) form keeps every division
    * non-negative, where DuckDB // and Spark div agree. Shared by
    * emb_power_iter and (identity) inc_power_delta. */
  private[queries] lazy val powerIterCtes: String = {
    def round(r: Int): String = {
      val p = r - 1
      s"""w$r AS (SELECT g.i, SUM(g.gram * v$p.v) AS w
         |  FROM g0 g JOIN v$p ON v$p.j = g.j GROUP BY 1),
         |m$r AS (SELECT MAX(abs(w)) AS m FROM w$r),
         |v$r AS (SELECT w$r.i AS j,
         |    CAST((CASE WHEN w < 0 THEN -1 ELSE 1 END) *
         |      (abs(w) // GREATEST(CAST(1 AS BIGINT),
         |        m$r.m // ${1L << PowerKeep})) AS BIGINT) AS v
         |  FROM w$r, m$r)""".stripMargin
    }
    s"""mx AS (SELECT vec_id, embedding,
       |  CAST(list_max(list_transform(embedding, x -> abs(x)))
       |    AS DOUBLE) AS ma FROM embeddings),
       |qq AS (SELECT vec_id,
       |  list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 127 / ma) AS BIGINT))
       |    AS qv
       |  FROM mx WHERE ma > 0 AND NOT isnan(ma)),
       |idx AS (SELECT CAST(ii AS BIGINT) AS i
       |        FROM unnest(range(1, 65)) AS t(ii)),
       |g0 AS (SELECT a.i AS i, b.i AS j,
       |    CAST(SUM(qv[a.i] * qv[b.i]) AS BIGINT) AS gram
       |  FROM qq, idx a, idx b GROUP BY 1, 2),
       |v0 AS (SELECT i AS j, CAST(1 AS BIGINT) AS v FROM idx),
       |${(1 to PowerRounds).map(round).mkString(",\n")}""".stripMargin
  }

  /** The final-eigenvector CTE name of [[powerIterCtes]]. */
  private[queries] val powerIterFinal: String = s"v$PowerRounds"

  private lazy val powerIterOracle: String =
    s"""WITH $powerIterCtes
       |SELECT j AS i, v FROM $powerIterFinal ORDER BY i""".stripMargin

  /** KMV bottom-k rebuild over the order months — the oracle of both
    * approx_bottomk and (identity) inc_bottomk_delta. */
  private val kmvOracle: String = {
    val jh = PipelineQueries.javaHashSql("k_key")
    s"""WITH dk AS (SELECT DISTINCT
       |    substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7)
       |      AS grp,
       |    CAST(o_custkey AS VARCHAR) AS k_key
       |  FROM orders),
       |hs AS (SELECT grp, k_key,
       |    CASE WHEN h < 0 THEN h + 4294967296 ELSE h END AS hu
       |  FROM (SELECT grp, k_key, $jh AS h FROM dk)),
       |sk AS (SELECT grp, rnk, hu, k_key FROM (
       |    SELECT grp, hu, k_key,
       |      ROW_NUMBER() OVER (PARTITION BY grp
       |        ORDER BY hu ASC, k_key ASC) AS rnk
       |    FROM hs) WHERE rnk <= $KmvK),
       |es AS (SELECT grp, COUNT(*) AS n_sketch, MAX(hu) AS h_k
       |  FROM sk GROUP BY 1)
       |SELECT sk.grp, CAST(sk.rnk AS BIGINT) AS rnk, sk.hu, sk.k_key,
       |  es.n_sketch,
       |  CASE WHEN es.n_sketch < $KmvK THEN es.n_sketch
       |    ELSE CAST(${KmvK - 1} AS BIGINT) * 4294967296 END AS est_num,
       |  CASE WHEN es.n_sketch < $KmvK THEN CAST(1 AS BIGINT)
       |    ELSE es.h_k END AS est_den
       |FROM sk JOIN es ON es.grp = sk.grp
       |ORDER BY sk.grp, sk.rnk""".stripMargin
  }

  val oracles: Map[String, String] = Map(

    "sim_knn_graph" ->
      s"""WITH $knnListsCtes
         |SELECT a.query_id AS a_id, a.neighbor_id AS b_id, a.qdot
         |FROM lists a JOIN lists b ON b.query_id = a.neighbor_id
         |  AND b.neighbor_id = a.query_id
         |WHERE a.query_id < a.neighbor_id
         |ORDER BY a_id, b_id""".stripMargin,

    // the inc_* oracle-reuse convention: merge must equal the rebuild
    "inc_knn_delta" ->
      s"""WITH $knnListsCtes
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, qdot
         |FROM rk WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin,

    "sim_knn_components" ->
      // transitive closure of the mutual-kNN graph via recursive CTE
      // (the dd_cluster_cc convention: min reachable id == the label
      // min-propagation converges to)
      s"""WITH RECURSIVE $knnListsCtes,
         |me AS (SELECT a.query_id AS a_id, a.neighbor_id AS b_id
         |  FROM lists a JOIN lists b ON b.query_id = a.neighbor_id
         |    AND b.neighbor_id = a.query_id
         |  WHERE a.query_id < a.neighbor_id),
         |cedges AS (SELECT a_id AS u, b_id AS v FROM me
         |           UNION SELECT b_id, a_id FROM me),
         |reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM qs
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN cedges e ON e.u = r.id)
         |SELECT id AS vec_id, MIN(lbl) AS cluster_id,
         |  MIN(lbl) = id AS is_canonical
         |FROM reach GROUP BY id
         |ORDER BY vec_id""".stripMargin,

    "sim_nnd_components" ->
      s"""WITH RECURSIVE $nndCtes,
         |fl AS (SELECT query_id, neighbor_id FROM fin WHERE rnk <= $K),
         |nme AS (SELECT a.query_id AS a_id, a.neighbor_id AS b_id
         |  FROM fl a JOIN fl b ON b.query_id = a.neighbor_id
         |    AND b.neighbor_id = a.query_id
         |  WHERE a.query_id < a.neighbor_id),
         |ced AS (SELECT a_id AS u, b_id AS v FROM nme
         |        UNION SELECT b_id, a_id FROM nme),
         |reach(id, lbl) AS (
         |  SELECT vec_id, vec_id FROM qn
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN ced e ON e.u = r.id)
         |SELECT id AS vec_id, MIN(lbl) AS cluster_id,
         |  MIN(lbl) = id AS is_canonical
         |FROM reach GROUP BY id
         |ORDER BY vec_id""".stripMargin,

    "sim_nn_descent" ->
      s"""WITH $nndCtes
         |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, qdot
         |FROM fin WHERE rnk <= $K
         |ORDER BY query_id, rnk""".stripMargin,

    "sim_recall_nnd" ->
      s"""WITH $nndAnchorCtes,
         |ex AS (SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${qdotSql("p.qv", "c.qv")} AS qdot,
         |    p.q_norm AS qna, c.q_norm AS qnb
         |  FROM qs p, qs c WHERE c.vec_id <> p.vec_id),
         |exl AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
         |        $rankOrder) AS rnk
         |    FROM ex) WHERE rnk <= $K)
         |SELECT
         |  (SELECT COUNT(*) FROM exl e JOIN fin f
         |    ON f.query_id = e.query_id
         |    AND f.neighbor_id = e.neighbor_id AND f.rnk <= $K)
         |    AS hits,
         |  (SELECT COUNT(*) FROM exl) AS total""".stripMargin,

    "ret_err" -> {
      val bm = Pipeline11Queries.oracles("txt_bm25")
      s"""WITH bm AS ($bm),
         |q(query_id, term) AS (VALUES ${Pipeline11Queries.querySetSql}),
         |qn AS (SELECT query_id, COUNT(DISTINCT term) AS nq
         |       FROM q GROUP BY 1),
         |dt AS (SELECT DISTINCT doc_id, term FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |    FROM documents)
         |  WHERE term <> '' AND term IN (SELECT term FROM q)),
         |rel AS (SELECT x.query_id, x.doc_id
         |  FROM (SELECT q.query_id, dt.doc_id, COUNT(*) AS h
         |        FROM q JOIN dt USING (term) GROUP BY 1, 2) x
         |  JOIN qn USING (query_id) WHERE x.h = qn.nq),
         |nr AS (SELECT query_id, COUNT(*) AS n_rel FROM rel GROUP BY 1),
         |cum AS (SELECT bm.query_id, bm.rnk,
         |    CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END AS hit,
         |    SUM(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY bm.query_id ORDER BY bm.rnk) AS h
         |  FROM bm LEFT JOIN rel ON bm.query_id = rel.query_id
         |    AND bm.doc_id = rel.doc_id),
         |er AS (SELECT query_id,
         |    CAST(SUM(CASE WHEN hit = 1
         |      THEN 2580480 // (rnk * (CAST(1 AS BIGINT) << h))
         |      ELSE 0 END) AS BIGINT) AS err_num
         |  FROM cum GROUP BY 1)
         |SELECT er.query_id,
         |  CAST(COALESCE(nr.n_rel, 0) AS BIGINT) AS n_rel, er.err_num
         |FROM er LEFT JOIN nr ON er.query_id = nr.query_id
         |ORDER BY er.query_id""".stripMargin
    },

    "approx_bottomk" -> kmvOracle,
    "inc_bottomk_delta" -> kmvOracle,

    "dq_t_closeness" ->
      """WITH cell AS (SELECT c_nationkey, c_mktsegment,
        |    COUNT(*) AS c_es
        |  FROM customer GROUP BY 1, 2),
        |pe AS (SELECT c_nationkey, CAST(SUM(c_es) AS BIGINT) AS n_e
        |  FROM cell GROUP BY 1),
        |gl AS (SELECT c_mktsegment, CAST(SUM(c_es) AS BIGINT) AS c_s
        |  FROM cell GROUP BY 1),
        |nt AS (SELECT CAST(SUM(c_es) AS BIGINT) AS n_tot FROM cell),
        |grid AS (SELECT pe.c_nationkey, gl.c_mktsegment, pe.n_e,
        |    gl.c_s, COALESCE(cell.c_es, 0) AS c_es
        |  FROM pe CROSS JOIN gl
        |  LEFT JOIN cell ON cell.c_nationkey = pe.c_nationkey
        |    AND cell.c_mktsegment = gl.c_mktsegment)
        |SELECT g.c_nationkey, g.n_e,
        |  CAST(SUM(abs(g.c_es * nt.n_tot - g.n_e * g.c_s)) AS BIGINT)
        |    AS tv_num,
        |  CAST(MAX(nt.n_tot) AS BIGINT) AS n_tot,
        |  5 * CAST(SUM(abs(g.c_es * nt.n_tot - g.n_e * g.c_s))
        |    AS BIGINT) > 2 * 1 * g.n_e * MAX(nt.n_tot) AS flagged
        |FROM grid g, nt
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "graph_ktruss" -> {
      def round(r: Int): String = {
        val p = if (r == 1) "e" else s"ke${r - 1}"
        s"""ka$r AS (SELECT lo AS a, hi AS x FROM $p
           |  UNION ALL SELECT hi, lo FROM $p),
           |ks$r AS (SELECT t.lo, t.hi, COUNT(*) AS sup
           |  FROM $p t
           |  JOIN ka$r pa ON pa.a = t.lo
           |  JOIN ka$r pb ON pb.a = t.hi AND pb.x = pa.x
           |  GROUP BY 1, 2),
           |ke$r AS (SELECT t.lo, t.hi FROM $p t
           |  JOIN ks$r s ON s.lo = t.lo AND s.hi = t.hi
           |  WHERE s.sup >= 2)""".stripMargin
      }
      s"""WITH ${Pipeline10Queries.triCtes},
         |${(1 to 3).map(round).mkString(",\n")}
         |SELECT lo, hi FROM ke3 ORDER BY lo, hi""".stripMargin
    },

    "ts_mad_anomaly" ->
      """WITH daily AS (SELECT o_orderpriority AS pri,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM orders GROUP BY 1, 2),
        |r1 AS (SELECT pri, day, x,
        |    ROW_NUMBER() OVER (PARTITION BY pri ORDER BY x, day) AS rn,
        |    COUNT(*) OVER (PARTITION BY pri) AS n
        |  FROM daily),
        |m1 AS (SELECT pri,
        |    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN x END) +
        |      SUM(CASE WHEN rn = n // 2 + 1 THEN x END) AS BIGINT)
        |      AS med2
        |  FROM r1 GROUP BY 1),
        |d AS (SELECT r1.pri, r1.day, r1.x,
        |    abs(2 * r1.x - m1.med2) AS d2
        |  FROM r1 JOIN m1 ON m1.pri = r1.pri),
        |r2 AS (SELECT pri, day, x, d2,
        |    ROW_NUMBER() OVER (PARTITION BY pri ORDER BY d2, day) AS rn,
        |    COUNT(*) OVER (PARTITION BY pri) AS n
        |  FROM d),
        |m2 AS (SELECT pri,
        |    CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN d2 END) +
        |      SUM(CASE WHEN rn = n // 2 + 1 THEN d2 END) AS BIGINT)
        |      AS mad4
        |  FROM r2 GROUP BY 1)
        |SELECT d.pri, d.day, d.x, d.d2, m2.mad4,
        |  2 * d.d2 > 3 * m2.mad4 AS is_anomaly
        |FROM d JOIN m2 ON m2.pri = d.pri
        |ORDER BY d.pri, d.day""".stripMargin,

    "ts_sax" ->
      """WITH daily AS (SELECT o_orderpriority AS pri,
        |    CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x
        |  FROM orders GROUP BY 1, 2),
        |seg AS (SELECT pri, x,
        |    (CAST(ROW_NUMBER() OVER (PARTITION BY pri ORDER BY day)
        |      AS BIGINT) - 1) * 8
        |      // (COUNT(*) OVER (PARTITION BY pri)) AS w
        |  FROM daily),
        |paa AS (SELECT pri, w, SUM(x) * 1000000 // COUNT(*) AS paa,
        |    COUNT(*) AS n
        |  FROM seg GROUP BY 1, 2),
        |sym AS (SELECT pri, w, paa, n,
        |    NTILE(4) OVER (ORDER BY paa, pri, w) AS sym
        |  FROM paa),
        |wrd AS (SELECT pri,
        |    string_agg(substr('abcd', sym, 1), '' ORDER BY w) AS word
        |  FROM sym GROUP BY 1)
        |SELECT sym.pri, sym.w, CAST(sym.paa AS BIGINT) AS paa, sym.n,
        |  CAST(sym.sym AS BIGINT) AS sym, wrd.word
        |FROM sym JOIN wrd ON wrd.pri = sym.pri
        |ORDER BY sym.pri, sym.w""".stripMargin,

    "mm_scene_cuts" ->
      // the mm_audio_snr block machinery with consecutive-frame diffs
      """WITH ch AS (SELECT doc_id, string_split_regex(text, '') AS s
        |       FROM documents
        |     UNION ALL
        |     SELECT CAST(-1 AS BIGINT),
        |       string_split_regex(repeat('a', 16), '')),
        |tok AS (SELECT doc_id, CAST(ii - 1 AS BIGINT) AS i0,
        |    CAST(unicode(s[ii]) AS BIGINT) AS code,
        |    CAST(len(s) AS BIGINT) AS n
        |  FROM ch, unnest(range(1, len(s) + 1)) AS u(ii)),
        |bs0 AS (SELECT doc_id, i0 * 16 // n AS b, SUM(code) AS sm
        |  FROM tok GROUP BY 1, 2),
        |sp AS (SELECT d.doc_id, bb.b
        |  FROM (SELECT DISTINCT doc_id FROM tok) d,
        |    (SELECT CAST(x AS BIGINT) AS b
        |     FROM unnest(range(0, 16)) t(x)) bb),
        |bs AS (SELECT sp.doc_id, sp.b, COALESCE(bs0.sm, 0) AS sm
        |  FROM sp LEFT JOIN bs0 ON sp.doc_id = bs0.doc_id
        |    AND sp.b = bs0.b),
        |dd AS (SELECT doc_id, b, d FROM (
        |    SELECT doc_id, b,
        |      abs(sm - LAG(sm) OVER (PARTITION BY doc_id ORDER BY b))
        |        AS d
        |    FROM bs) WHERE b >= 1),
        |sd AS (SELECT doc_id, SUM(d) AS sumd FROM dd GROUP BY 1)
        |SELECT dd.doc_id AS media_id,
        |  CAST(SUM(CASE WHEN 15 * dd.d > 2 * sd.sumd THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_cuts,
        |  CAST(COALESCE(MIN(CASE WHEN 15 * dd.d > 2 * sd.sumd
        |    THEN dd.b END), 16) AS BIGINT) AS first_cut,
        |  CAST(MAX(dd.d) AS BIGINT) AS max_jump
        |FROM dd JOIN sd ON sd.doc_id = dd.doc_id
        |GROUP BY 1 ORDER BY media_id""".stripMargin,

    "emb_power_iter" -> powerIterOracle,

    // the inc_* oracle-reuse convention: the gram-merge path must equal
    // the full rebuild, so the rebuild's SQL IS the oracle
    "inc_power_delta" -> powerIterOracle,

    "txt_min_pieces" ->
      // vocab mirror: singles ∪ top-64 n-grams (count DESC, piece ASC);
      // DP mirror: BFS layers over (word, pos, k) — pos strictly grows
      // by ≥ 1 per step so the recursion terminates at len(w); UNION
      // (not UNION ALL) dedups states, bounding the frontier at
      // O(len²) per word instead of the exponential path count
      """WITH RECURSIVE
        |tok AS (SELECT doc_id, t AS w FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
        |    FROM documents) WHERE t <> ''),
        |sg AS (SELECT DISTINCT substr(w, CAST(i AS INTEGER), 1) AS piece
        |  FROM tok, unnest(range(1, len(w) + 1)) AS u(i)),
        |ng AS (SELECT piece, COUNT(*) AS cnt FROM (
        |    SELECT substr(w, CAST(i AS INTEGER), CAST(n AS INTEGER))
        |      AS piece
        |    FROM tok, (VALUES (2),(3),(4)) AS nn(n),
        |      unnest(range(1, len(w) - n + 2)) AS u(i)
        |    WHERE len(w) >= n) GROUP BY 1),
        |top AS (SELECT piece FROM (
        |    SELECT piece, ROW_NUMBER() OVER
        |      (ORDER BY cnt DESC, piece ASC) AS r
        |    FROM ng) WHERE r <= 64),
        |vocab AS (SELECT piece FROM sg UNION SELECT piece FROM top),
        |wd AS (SELECT DISTINCT w FROM tok),
        |seg AS (
        |  SELECT w, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS k
        |  FROM wd
        |  UNION
        |  SELECT s.w, s.pos + len(v.piece), s.k + 1
        |  FROM seg s JOIN vocab v
        |    ON substr(s.w, CAST(s.pos + 1 AS INTEGER),
        |         len(v.piece)) = v.piece
        |  WHERE s.pos < len(s.w)),
        |mp AS (SELECT w, MIN(k) AS pieces FROM seg
        |  WHERE pos = len(w) GROUP BY 1)
        |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(mp.pieces) AS BIGINT) AS n_pieces
        |FROM tok t JOIN mp ON mp.w = t.w
        |GROUP BY 1 ORDER BY t.doc_id""".stripMargin,

    "approx_kmv_jaccard" -> {
      // union bottom-k membership checked against the RAW year sets —
      // equivalent to the engine's sketch semi-joins by the k-th-min
      // lemma in Freq.kmvJaccard's doc
      val jh = PipelineQueries.javaHashSql("k_key")
      s"""WITH dk AS (SELECT DISTINCT
         |    year(CAST(o_orderdate AS DATE)) AS y,
         |    CAST(o_custkey AS VARCHAR) AS k_key
         |  FROM orders WHERE year(CAST(o_orderdate AS DATE))
         |    IN (1995, 1996)),
         |hs AS (SELECT y, k_key,
         |    CASE WHEN h < 0 THEN h + 4294967296 ELSE h END AS hu
         |  FROM (SELECT y, k_key, $jh AS h FROM dk)),
         |un AS (SELECT hu, k_key FROM (
         |    SELECT hu, k_key, ROW_NUMBER() OVER
         |      (ORDER BY hu ASC, k_key ASC) AS rnk
         |    FROM (SELECT DISTINCT hu, k_key FROM hs))
         |  WHERE rnk <= ${KmvK * 2})
         |SELECT (SELECT COUNT(*) FROM un) AS k_eff,
         |  (SELECT COUNT(*) FROM un
         |   WHERE EXISTS (SELECT 1 FROM hs WHERE hs.y = 1995
         |     AND hs.k_key = un.k_key)
         |   AND EXISTS (SELECT 1 FROM hs WHERE hs.y = 1996
         |     AND hs.k_key = un.k_key)) AS matches""".stripMargin
    },

    "stream_kmv" -> {
      val jh = PipelineQueries.javaHashSql("k_key")
      s"""WITH dk AS (SELECT DISTINCT event_type AS grp,
         |    CAST(user_id AS VARCHAR) AS k_key
         |  FROM events),
         |hs AS (SELECT grp, k_key,
         |    CASE WHEN h < 0 THEN h + 4294967296 ELSE h END AS hu
         |  FROM (SELECT grp, k_key, $jh AS h FROM dk))
         |SELECT grp, rnk, hu, k_key FROM (
         |    SELECT grp, hu, k_key,
         |      ROW_NUMBER() OVER (PARTITION BY grp
         |        ORDER BY hu ASC, k_key ASC) AS rnk
         |    FROM hs) WHERE rnk <= 8
         |ORDER BY grp, rnk""".stripMargin
    }
  )
}
