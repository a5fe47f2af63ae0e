package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.{DedupText, Graph, Similarity}
import graft.ops.Pin.PinOps

/** Round-14 continuation batch: (1) the Approximate Neighborhood
  * Function — per-node r-hop ball-size estimates via deterministic
  * bottom-k reachability sketches (ANF, Palmer et al. 2002; HyperBall,
  * Boldi & Vigna 2011 — with the repo's KMV registers so the oracle
  * replays bit-exactly), the "how big is the neighborhood / where does
  * the diameter flatten" primitive a 100 TB link graph is actually
  * asked; (2) the contamination-maintenance identity — decontamination
  * hit counts under a GROWING benchmark suite, the merge≡rebuild row
  * for the dd_contam path (new eval sets land continuously; the corpus
  * must only probe the genuinely new shingles).
  *
  * Reference scope note: the reference (sri2db) has no graph or corpus
  * surface — north-star LLM-pipeline extensions in the established
  * exact-integer, oracle-first idiom.
  */
object Pipeline30Queries {

  type Q = (SparkSession, String) => DataFrame

  /** Sketch width (k smallest hashes kept per node) — small enough that
    * balls saturate on the purchase graph (the estimate regime) while
    * leaf nodes stay exact (n_sketch < k). */
  private[queries] val ReachK = 16

  /** Propagation horizon. The purchase graph is bipartite with tiny
    * effective diameter, so radius 3 already shows the curve flatten —
    * the ANF effective-diameter read. */
  private[queries] val ReachRounds = 3

  /** Horizon for the effective-diameter read — one past the flatten
    * point, so the 90%-of-final criterion has a stable denominator. */
  private[queries] val EffRounds = 4

  /** Unsigned 32-bit Java hash in DuckDB (the Pipeline11 convention). */
  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"""(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"""
  }

  /** Beam width for the graph-ANN serving path — ≥ the greedy queue
    * length, so the lockstep beam dominates greedy at equal depth. */
  private[queries] val GsBeam = 8

  /** Lockstep descent rounds. */
  private[queries] val GsRounds = 2

  /** Entry-point count — the deterministic bottom-by-hash start nodes
    * ([[graft.ops.Similarity.anchorSample]]'s rule at n = 4). */
  private[queries] val GsEntries = 4

  /** Split `docs` into `n` doc_id-ordered slices and write each as a
    * single parquet file with strictly increasing mtimes (the
    * writeWeeklySlices replay-order pin) — the arriving-eval-suite
    * fixture for stream_contam. */
  private[graft] def writeDocSlices(docs: DataFrame, n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("scm_src").toString
    // ONE partitioned write instead of n filtered coalesce(1) passes
    // (guide §1.2; the writeWeeklySlices rationale): repartition by
    // __part puts each slice value in exactly one task, so every
    // __part=i directory holds exactly one file, moved/renamed under
    // the pinned-mtime replay-order contract. Same rows per slice.
    val tmp = java.nio.file.Files.createTempDirectory("scm_t").toString
    docs
      .withColumn("__part", ntile(n).over(Window.orderBy(col("doc_id"))))
      .repartition(n, col("__part"))
      .write.partitionBy("__part").mode("overwrite").parquet(tmp)
    for (i <- 1 to n) {
      val part = new java.io.File(tmp, s"__part=$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"bench_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1700000000000L + i * 60000L),
        s"stream_contam: could not pin mtime of $dst")
    }
    dir
  }

  val queries: Map[String, Q] = Map(

    "graph_reach_sketch" -> ((s, dir) => {
      // ANF over the symmetrized customer–supplier purchase graph
      // (graph_bfs's fixture): per (node, radius 1..3) the sketch size
      // and the (k−1)·2³²/h_k estimate terms — n_sketch < k rows are
      // EXACT ball sizes, saturated rows carry the KMV estimate. State
      // is ≤ k rows per node per round regardless of ball growth (the
      // sketch-vs-BFS point); every merge is deterministic under the
      // (hash, key) total order, so the unrolled oracle is bit-exact.
      Graph.reachSketch(
          Pipeline8Queries.purchaseEdges(s, dir, symmetric = true),
          "src", "dst", k = ReachK, rounds = ReachRounds)
        .orderBy("r", "node")
    }),

    "graph_eff_diameter" -> ((s, dir) => {
      // the ANF headline statistic (Palmer et al. 2002 §1: "how many
      // hops until the graph is effectively covered"): the global
      // neighborhood function N(r) = Σ_v est|B(v, r)| per radius, and
      // the 90%-effective-diameter flag 10·N(r) ≥ 9·N(R) — division-
      // free integers throughout (per-node est = est_num div est_den,
      // both engines truncate non-negative division identically). The
      // 1-row final-radius total rides a broadcast; 4 rows out.
      val sk = Graph.reachSketch(
        Pipeline8Queries.purchaseEdges(s, dir, symmetric = true),
        "src", "dst", k = ReachK, rounds = EffRounds)
      val curve = sk.select(col("r"),
          call_function("div", col("est_num"), col("est_den")).as("est"))
        .groupBy("r").agg(sum("est").as("n_sum"))
      val last = curve.where(col("r") === EffRounds)
        .select(col("n_sum").as("n_last"))
      curve.crossJoin(broadcast(last))
        .select(col("r"), col("n_sum"),
          (col("n_sum") * 10 >= col("n_last") * 9).as("reaches90"))
        .orderBy("r")
    }),

    "inc_contam_delta" -> ((s, dir) => {
      // the contamination merge≡rebuild identity: per-doc hit counts
      // are ADDITIVE over a partition of the benchmark shingle set, so
      // a newly-landed eval suite (doc_id % 103, minus the base) folds
      // into the stored counts by probing the corpus ONLY with its
      // genuinely new shingles (anti-join vs the stored base sketch) —
      // the base benchmark never re-probes. Graded surface = the merged
      // per-doc counts; oracle = the full rebuild over base ∪ delta.
      val d = Tables.documents(s, dir)
      val m101 = pmod(col("doc_id"), lit(101L))
      val m103 = pmod(col("doc_id"), lit(103L))
      val corpus = d.where(m101 =!= 0 && m103 =!= 0)
      val bShB = DedupText.benchShingles(d.where(m101 === 0), "text",
        n = 3).pin()
      val stored = DedupText.contaminationHitsSet(corpus, bShB,
        "doc_id", "text", n = 3)
      DedupText.contaminationMergedDelta(corpus, stored, bShB,
          d.where(m103 === 0 && m101 =!= 0), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    "stream_contam" -> ((s, dir) => {
      // the streaming deployment of inc_contam_delta: benchmark suites
      // land as 3 doc_id-ordered microbatches (1 file per trigger,
      // mtime-ordered); each batch probes the corpus ONLY with its
      // genuinely new shingles and folds into the filesystem-
      // checkpointed (shingle set, hit counts) state. The final state
      // must equal the batch rebuild over ALL benchmark docs — oracle
      // = inc_contam_delta's full-rebuild SQL verbatim. Restart and
      // replay safety pinned in Round27Spec.
      val d = Tables.documents(s, dir)
      val m101 = pmod(col("doc_id"), lit(101L))
      val m103 = pmod(col("doc_id"), lit(103L))
      val srcDir = writeDocSlices(
        d.where(m101 === 0 || m103 === 0).select("doc_id", "text"),
        n = 3)
      val corpus = d.where(m101 =!= 0 && m103 =!= 0)
      val ckpt = java.nio.file.Files
        .createTempDirectory("scm_ckpt").toString
      val state = java.nio.file.Files
        .createTempDirectory("scm_state").toString
      val stream = s.readStream
        .schema(s.read.parquet(srcDir).schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(srcDir)
      graft.streaming.ContamMonitor.run(s, stream, corpus, "doc_id",
        "text", n = 3, stateDir = state, ckptDir = ckpt)
      graft.streaming.ContamMonitor.hits(s, state).orderBy("doc_id")
    }),

    "sim_graph_search" -> ((s, dir) => {
      // the graph-ANN SERVING path over the NN-descent build
      // (HNSW layer-0 / DiskANN greedy search, lockstep-beam
      // reformulated): probes descend the directed kNN out-lists from
      // 4 deterministic bottom-by-hash entry points, top-8 beam, 2
      // rounds, final top-5. Per-probe cost O(rounds·b·outdeg) at ANY
      // corpus size — the read path the sub-quadratic build exists
      // for; every stage an id-keyed equi-join + bounded rank window.
      val sk = Similarity.quantizeInt8(Tables.embeddings(s, dir)).pin()
      val graph = Similarity.nnDescentRound(sk,
          Similarity.nnDescentInit(sk, Pipeline24Queries.K,
            Pipeline24Queries.NndPlanes), Pipeline24Queries.K)
        .select("query_id", "neighbor_id")
      val probes = sk.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("q_emb"),
          col("q_norm"))
      Similarity.graphBeamSearch(sk, graph, probes,
          Similarity.anchorSample(sk, GsEntries).select("vec_id"),
          beam = GsBeam, rounds = GsRounds, k = Pipeline24Queries.K)
        .orderBy("query_id", "rnk")
    }),

    "sim_recall_graph" -> ((s, dir) => {
      // the measured-recall audit of the serving tier (the
      // sim_recall_* convention): beam-searched top-5 vs the brute
      // exact top-5, both over the ANCHOR SAMPLE (like vs like — the
      // exact side is the N² brute). Same isotropic-fixture
      // calibration note as sim_recall_nnd: recall here reads ≈
      // candidates-examined/N; the graded object is the deterministic
      // process + the honest audit. One row (hits, total).
      val sk = Similarity.anchorSample(
        Similarity.quantizeInt8(Tables.embeddings(s, dir)),
        Pipeline24Queries.AnchorN).pin()
      val graph = Similarity.nnDescentRound(sk,
          Similarity.nnDescentInit(sk, Pipeline24Queries.K,
            Pipeline24Queries.NndPlanes), Pipeline24Queries.K)
        .select("query_id", "neighbor_id")
      val probes = sk.select(col("vec_id").as("query_id"),
        col("q_emb"), col("q_norm"))
      val beamed = Similarity.graphBeamSearch(sk, graph, probes,
          Similarity.anchorSample(sk, GsEntries).select("vec_id"),
          beam = GsBeam, rounds = GsRounds, k = Pipeline24Queries.K)
        .select("query_id", "neighbor_id").pin()
      val exact = Similarity.knnListsOnSketch(sk, Pipeline24Queries.K)
        .select("query_id", "neighbor_id").pin()
      exact.join(beamed, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("hits"))
        .crossJoin(broadcast(exact.agg(count(lit(1)).as("total"))))
    })
  )

  // --------------------------------------------------------------------
  // Oracles
  // --------------------------------------------------------------------

  /** The ANF CTE stack over the symmetrized purchase graph: edges,
    * node seeds, `rounds` unrolled bottom-k merge rounds (mirroring
    * [[graft.ops.Graph.reachSketch]] exactly), per-round estimate-term
    * CTEs, and the union frame `u(node, r, n_sketch, est_num,
    * est_den)` — shared by graph_reach_sketch and graph_eff_diameter. */
  private def reachCtes(rounds: Int): String = {
    val k = ReachK
    val merges = (1 to rounds).map { r =>
      s"""m$r AS (SELECT DISTINCT grp, hu, k_key FROM (
         |    SELECT grp, hu, k_key FROM s${r - 1}
         |    UNION ALL
         |    SELECT e.dst AS grp, s${r - 1}.hu, s${r - 1}.k_key
         |    FROM s${r - 1} JOIN e ON e.src = s${r - 1}.grp)),
         |s$r AS (SELECT grp, hu, k_key FROM (
         |    SELECT grp, hu, k_key,
         |      ROW_NUMBER() OVER (PARTITION BY grp
         |        ORDER BY hu, k_key) AS rn FROM m$r)
         |  WHERE rn <= $k),
         |est$r AS (SELECT grp, COUNT(*) AS n_sketch, MAX(hu) AS h_k
         |  FROM s$r GROUP BY grp)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to rounds).map { r =>
      s"""SELECT grp AS node, CAST($r AS BIGINT) AS r, n_sketch,
         |  CASE WHEN n_sketch < $k THEN n_sketch
         |       ELSE CAST(${(k - 1).toLong * 4294967296L} AS BIGINT)
         |       END AS est_num,
         |  CASE WHEN n_sketch < $k THEN CAST(1 AS BIGINT)
         |       ELSE h_k END AS est_den
         |FROM est$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""e0 AS (SELECT DISTINCT o_custkey * 2 AS src,
       |    l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |nd AS (SELECT src AS grp FROM e UNION SELECT dst FROM e),
       |s0 AS (SELECT grp, ${huSql("CAST(grp AS VARCHAR)")} AS hu,
       |    CAST(grp AS VARCHAR) AS k_key FROM nd),
       |$merges,
       |u AS ($unions)""".stripMargin
  }

  /** The lockstep-beam CTE tail over sketch CTE `src` — requires `qh`
    * (the hashed sketch frame from Pipeline24's anchorCtes), `fin`
    * (the NN-descent ranked lists over `src` from nndTail), and a
    * probe CTE `pr(query_id, pqv, pn)` already in scope. Unrolls
    * [[GsRounds]] rounds; ends with CTE
    * `b{GsRounds}(query_id, neighbor_id, qdot, rn)`. */
  private def beamTail(src: String): String = {
    def score(cand: String, out: String): String =
      s"""$out AS (SELECT query_id, neighbor_id, qdot, rn FROM (
         |    SELECT query_id, neighbor_id, qdot,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
         |        ${Pipeline24Queries.rankOrder}) AS rn
         |    FROM (SELECT cd.query_id, cd.neighbor_id,
         |        ${Pipeline24Queries.qdotSql("pr.pqv", "c.qv")} AS qdot,
         |        pr.pn AS qna, c.q_norm AS qnb
         |      FROM $cand cd JOIN pr ON pr.query_id = cd.query_id
         |      JOIN $src c ON c.vec_id = cd.neighbor_id))
         |  WHERE rn <= $GsBeam)""".stripMargin
    val rounds = (1 to GsRounds).map { r =>
      s"""cx$r AS (SELECT DISTINCT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id FROM b${r - 1}
         |    UNION ALL
         |    SELECT b${r - 1}.query_id, gl.next AS neighbor_id
         |    FROM b${r - 1} JOIN gl ON gl.node = b${r - 1}.neighbor_id)
         |  WHERE query_id <> neighbor_id),
         |${score(s"cx$r", s"b$r")}""".stripMargin
    }.mkString(",\n")
    s"""gl AS (SELECT query_id AS node, neighbor_id AS next
       |  FROM fin WHERE rnk <= ${Pipeline24Queries.K}),
       |ep AS (SELECT vec_id FROM (
       |    SELECT s.vec_id,
       |      ROW_NUMBER() OVER (ORDER BY qh.hu ASC, s.vec_id ASC) AS ern
       |    FROM $src s JOIN qh ON qh.vec_id = s.vec_id)
       |  WHERE ern <= $GsEntries),
       |cx0 AS (SELECT pr.query_id, ep.vec_id AS neighbor_id
       |  FROM pr CROSS JOIN ep WHERE ep.vec_id <> pr.query_id),
       |${score("cx0", "b0")},
       |$rounds""".stripMargin
  }

  /** Full decontamination rebuild over base ∪ delta benchmark — the
    * shared oracle of inc_contam_delta (the batch identity) and
    * stream_contam (the streaming fold of the same identity). */
  private val contamRebuildSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
      |           FROM documents
      |           WHERE text IS NOT NULL AND len(text) > 0),
      |sh AS (SELECT doc_id,
      |  unnest(list_distinct(CASE WHEN len(ws) >= 3
      |    THEN list_transform(range(1, len(ws) - 1),
      |         i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2])
      |    ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS s
      |  FROM t),
      |b AS (SELECT DISTINCT s FROM sh
      |      WHERE doc_id % 101 = 0 OR doc_id % 103 = 0),
      |c AS (SELECT * FROM sh
      |      WHERE doc_id % 101 <> 0 AND doc_id % 103 <> 0)
      |SELECT c.doc_id, COUNT(*) AS n_hits
      |FROM c JOIN b USING (s)
      |GROUP BY c.doc_id ORDER BY doc_id""".stripMargin

  val oracles: Map[String, String] = Map(

    "graph_reach_sketch" ->
      s"""WITH ${reachCtes(ReachRounds)}
         |SELECT node, r, n_sketch, est_num, est_den FROM u
         |ORDER BY r, node""".stripMargin,

    "graph_eff_diameter" ->
      s"""WITH ${reachCtes(EffRounds)},
         |nc AS (SELECT r, CAST(SUM(est_num // est_den) AS BIGINT)
         |         AS n_sum
         |       FROM u GROUP BY r),
         |nl AS (SELECT n_sum AS n_last FROM nc WHERE r = $EffRounds)
         |SELECT r, n_sum, (10 * n_sum >= 9 * n_last) AS reaches90
         |FROM nc, nl ORDER BY r""".stripMargin,

    "inc_contam_delta" -> contamRebuildSql,

    // the streaming fold must land on the identical batch rebuild —
    // the stream_mp convention: oracle = the batch SQL verbatim
    "stream_contam" -> contamRebuildSql,

    "sim_graph_search" ->
      s"""WITH ${Pipeline24Queries.anchorCtes},
         |${Pipeline24Queries.nndTail("qn")},
         |pr AS (SELECT vec_id AS query_id, qv AS pqv, q_norm AS pn
         |  FROM qn WHERE vec_id % 50 = 0),
         |${beamTail("qn")}
         |SELECT query_id, CAST(rn AS BIGINT) AS rnk, neighbor_id, qdot
         |FROM b$GsRounds WHERE rn <= ${Pipeline24Queries.K}
         |ORDER BY query_id, rnk""".stripMargin,

    "sim_recall_graph" ->
      s"""WITH ${Pipeline24Queries.anchorCtes},
         |${Pipeline24Queries.nndTail("qs")},
         |pr AS (SELECT vec_id AS query_id, qv AS pqv, q_norm AS pn
         |  FROM qs),
         |${beamTail("qs")},
         |ex AS (SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${Pipeline24Queries.qdotSql("p.qv", "c.qv")} AS qdot,
         |    p.q_norm AS qna, c.q_norm AS qnb
         |  FROM qs p, qs c WHERE c.vec_id <> p.vec_id),
         |exl AS (SELECT query_id, neighbor_id FROM (
         |    SELECT query_id, neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
         |        ${Pipeline24Queries.rankOrder}) AS rnk
         |    FROM ex) WHERE rnk <= ${Pipeline24Queries.K})
         |SELECT
         |  (SELECT COUNT(*) FROM exl e JOIN b$GsRounds f
         |    ON f.query_id = e.query_id
         |    AND f.neighbor_id = e.neighbor_id
         |    AND f.rn <= ${Pipeline24Queries.K}) AS hits,
         |  (SELECT COUNT(*) FROM exl) AS total""".stripMargin
  )
}
