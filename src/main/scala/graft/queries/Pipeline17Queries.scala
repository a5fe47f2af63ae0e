package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Graph, IncrementalAgg, Quality, Retrieval, Sampling,
  Similarity}
import graft.ops.Pin.PinOps

/** Round-10 batch: the measurement-and-selection ring around the
  * existing curation operators — weighted inverse-CDF sampling (the
  * data-mixing draw), the mergeable equi-depth identity (14th inc_*),
  * retrieval eval metrics (boolean-AND qrels → hits/MRR), matryoshka
  * prefix-dim ANN recall (MRL serving), Newman modularity over the
  * label-propagation communities, and an exact two-sample
  * Kolmogorov–Smirnov drift gate. The batch convention holds: every
  * graded value derives from exact integer arithmetic (MRR is scaled by
  * lcm(1..10); KS and modularity are emitted as integer numerators). */
object Pipeline17Queries {

  type Q = (SparkSession, String) => DataFrame

  private val CdfDraws = 200  // samp_inverse_cdf draw count
  private val CdfSalt = "cdf"
  private val EqBuckets = 8   // inc_equidepth_delta buckets (mirrors
                              //   agg_equidepth's NTILE(8))
  private val MatDims = 16    // sim_recall_matryoshka prefix width
                              //   (64-dim fixture → 4× shorter vector)

  val queries: Map[String, Q] = Map(

    "samp_inverse_cdf" -> ((s, dir) => {
      // weighted multinomial draw (with replacement) over the corpus,
      // weights = document length: the data-mixing sampler a training
      // pipeline runs when examples carry importance weights. Interval
      // lookup is an EQUI-join on weight-mass buckets (B = max weight
      // ⇒ ≤ 2 bucket rows per doc), the cumulative weights come from
      // the range-partitioned global cumsum — no single-task sort, no
      // N×M pair space anywhere.
      Sampling.inverseCdf(Tables.documents(s, dir), "doc_id",
          col("n_chars"), draws = CdfDraws, salt = CdfSalt)
        .orderBy("draw_id")
    }),

    "inc_equidepth_delta" -> ((s, dir) => {
      // the 14th inc_* identity, on the quantile family: per-value
      // histograms are additive over disjoint slices, so equi-depth
      // boundaries from merge(hist(base), hist(delta)) EQUAL the full
      // rebuild (the oracle) — the base rows are never re-scanned when
      // a delta lands. Domain-bounded by construction (l_quantity has
      // 50 values); unbounded domains graduate to the GK twin
      // (agg_equidepth_approx).
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
      val isNew = col("l_orderkey") % 7 === 0
      val hB = IncrementalAgg.partial(li.where(!isNew),
        Seq("l_returnflag", "l_quantity"), "l_quantity")
      val hD = IncrementalAgg.partial(li.where(isNew),
        Seq("l_returnflag", "l_quantity"), "l_quantity")
      IncrementalAgg.equidepthFromCounts(
          IncrementalAgg.merge(hB, hD, Seq("l_returnflag", "l_quantity")),
          Seq("l_returnflag"), "l_quantity", "cnt", EqBuckets)
        .orderBy("l_returnflag", "bucket")
    }),

    "ret_mrr" -> ((s, dir) => {
      // retrieval eval gate: boolean-AND qrels (docs containing EVERY
      // query term — the strictest lexical ground truth, derived not
      // annotated) scored against the graded BM25 top-10. MRR rides at
      // scale 2520 = lcm(1..10) so the reciprocal rank is EXACT integer
      // division; hits and n_rel are counts. The eval a pipeline runs
      // on every scorer/index change before trusting it.
      import s.implicits._
      val qdf = Pipeline11Queries.QuerySet.toDF("query_id", "term")
      val docs = Tables.documents(s, dir)
      val ranked = Retrieval.bm25TopK(docs, "doc_id", "text", qdf, k = 10)
        .select("query_id", "rnk", "doc_id")
      val qrels = Retrieval.booleanQrels(docs, "doc_id", "text", qdf)
      Retrieval.topKEval(ranked, qrels)
        .orderBy("query_id")
    }),

    "sim_recall_matryoshka" -> ((s, dir) => {
      // MRL serving audit (Kusupati et al. 2022): rank by the FIRST 16
      // of 64 dims (the prefix keeps the corpus quantization scale, so
      // prefix dots stay exact integers) and grade the per-probe
      // overlap with the exact float top-5 — the recall you pay for a
      // 4× shorter scan. Mirrors sim_recall_quantized's shape.
      val emb = Tables.embeddings(s, dir)
      val pre = Similarity.prefixSketch(
        Similarity.quantizeInt8(emb), MatDims)
      val probes = pre.where(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("query_id"), col("q_emb"), col("q_norm"))
      val mat = Similarity.topKOnSketches(pre, probes, 5)
        .select("query_id", "neighbor_id")
      val exact = Similarity.bruteForceTopK(emb,
          emb.where(col("vec_id") % 50 === 0), 5)
        .select("query_id", "neighbor_id")
      val common = exact.join(mat, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
      exact.select("query_id").distinct()
        .join(common, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n"), lit(0L)).as("n_common"))
        .orderBy("query_id")
    }),

    "graph_modularity" -> ((s, dir) => {
      // community-quality score of the label-propagation partition over
      // the purchase graph — Newman Q per community as the exact
      // integer numerator q_num = 4m·e_c − d_c² (Q = Σ q_num / 4m²,
      // formed downstream). Unlabeled vertices become singleton
      // communities (comm = −node−1), the standard convention so every
      // edge endpoint is assigned and the fail-loudly join never fires
      // on a mere propagation gap.
      // one pinned canonical edge pass feeds BOTH the label-prop
      // symmetrization and the scoring join — the purchase join
      // (orders⋈lineitem + distinct) is the dominant cost and must not
      // run twice (the Cluster.scala symmetrize rule, applied across
      // the two consumers)
      val e0 = Pipeline8Queries.purchaseEdges(s, dir, symmetric = false)
        .pin()
      val lp = Graph.labelPropagate(Pipeline8Queries.symmetrize(e0),
        "src", "dst", Pipeline8Queries.lpSeeds(s, dir),
        "node", "lbl", iters = 3)
      val comm = lp.select(col("node"),
        coalesce(col("label").cast("long"), -col("node") - 1).as("comm"))
      Graph.modularityByBlock(e0, "src", "dst", comm, "node", "comm")
        .orderBy("block")
    }),

    "dq_ks_drift" -> ((s, dir) => {
      // distribution-drift gate between data vintages: exact two-sample
      // Kolmogorov–Smirnov distance of the quantity distribution,
      // early-era vs late-era shipments, as the integer numerator
      // d_num = max |cumA·n_b − cumB·n_a| (D = d_num/(n_a·n_b)) plus
      // the value attaining it — the shape-change detector a mean/rate
      // monitor (dq_rate_drift) cannot see. Domain-bounded: the CDF
      // window runs over ≤ 50 distinct quantities, never the rows.
      val li = Tables.lineitem(s, dir)
      val early = li.where(year(col("l_shipdate")) < 1998)
      val late = li.where(year(col("l_shipdate")) >= 1998)
      Quality.ksStat(early, late, "l_quantity")
    })
  )

  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"
  }

  val oracles: Map[String, String] = Map(

    "samp_inverse_cdf" ->
      s"""WITH w AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w
         |  FROM documents),
         |c AS (SELECT doc_id, w,
         |    COALESCE(SUM(w) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |      0) AS lo
         |  FROM w),
         |t AS (SELECT CAST(SUM(w) AS BIGINT) AS tot FROM w),
         |d AS (SELECT CAST(j AS BIGINT) AS draw_id,
         |    ${huSql(s"'$CdfSalt' || CAST(j AS VARCHAR)")} % t.tot AS u
         |  FROM range(0, $CdfDraws) s(j), t)
         |SELECT d.draw_id, d.u, c.doc_id
         |FROM d JOIN c ON d.u >= c.lo AND d.u < c.lo + c.w
         |ORDER BY draw_id""".stripMargin,

    "inc_equidepth_delta" ->
      // full recompute — boundaries from the merged histograms must
      // equal boundaries over all rows
      s"""WITH h AS (SELECT l_returnflag, l_quantity AS v,
         |    COUNT(*) AS cnt FROM lineitem GROUP BY 1, 2),
         |c AS (SELECT l_returnflag, v, cnt,
         |    SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY v) AS cum,
         |    SUM(cnt) OVER (PARTITION BY l_returnflag) AS n FROM h),
         |b AS (SELECT CAST(j AS BIGINT) AS bucket
         |      FROM range(1, $EqBuckets) s(j))
         |SELECT c.l_returnflag, b.bucket, MIN(c.v) AS boundary
         |FROM c JOIN b ON c.cum * $EqBuckets >= b.bucket * c.n
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "ret_mrr" -> {
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
         |ev AS (SELECT bm.query_id,
         |    CAST(SUM(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS hits,
         |    MIN(CASE WHEN rel.doc_id IS NOT NULL THEN bm.rnk END) AS fr
         |  FROM bm LEFT JOIN rel ON bm.query_id = rel.query_id
         |    AND bm.doc_id = rel.doc_id
         |  GROUP BY bm.query_id)
         |SELECT ev.query_id,
         |  CAST(COALESCE(nr.n_rel, 0) AS BIGINT) AS n_rel, ev.hits,
         |  CAST(COALESCE(2520 // ev.fr, 0) AS BIGINT) AS mrr_scaled
         |FROM ev LEFT JOIN nr ON ev.query_id = nr.query_id
         |ORDER BY ev.query_id""".stripMargin
    },

    "sim_recall_matryoshka" -> {
      val ex = PipelineQueries.oracles("sim_cosine_topk")
      s"""WITH ex AS ($ex),
         |${Pipeline8Queries.quantCtes},
         |pk AS (SELECT vec_id, qv[1:$MatDims] AS pv,
         |    CAST(list_sum(list_transform(qv[1:$MatDims], v -> v * v))
         |      AS BIGINT) AS pn
         |  FROM qq),
         |pkc AS (SELECT * FROM pk WHERE pn > 0),
         |mt AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
         |      CAST(qd AS DOUBLE) / (sqrt(CAST(na AS DOUBLE)) *
         |        sqrt(CAST(nb AS DOUBLE))) DESC,
         |      neighbor_id ASC) AS rnk
         |  FROM (SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         |      CAST(list_sum(list_transform(list_zip(p.pv, c.pv),
         |        z -> z[1] * z[2])) AS BIGINT) AS qd,
         |      p.pn AS na, c.pn AS nb
         |    FROM pkc p, pkc c
         |    WHERE p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id))
         |  WHERE rnk <= 5),
         |p AS (SELECT DISTINCT query_id FROM ex),
         |cc AS (SELECT ex.query_id, COUNT(*) AS n FROM ex
         |  JOIN mt ON ex.query_id = mt.query_id
         |    AND ex.neighbor_id = mt.neighbor_id
         |  GROUP BY ex.query_id)
         |SELECT p.query_id, CAST(COALESCE(cc.n, 0) AS BIGINT) AS n_common
         |FROM p LEFT JOIN cc ON p.query_id = cc.query_id
         |ORDER BY p.query_id""".stripMargin
    },

    "graph_modularity" ->
      s"""WITH ${Pipeline8Queries.labelPropCtes},
         |cm AS (SELECT node,
         |    COALESCE(CAST(label AS BIGINT), -node - 1) AS comm
         |  FROM ${Pipeline8Queries.labelPropFinal}),
         |el AS (SELECT e0.src AS lo, e0.dst AS hi,
         |    ca.comm AS cl, cb.comm AS ch
         |  FROM e0 JOIN cm ca ON ca.node = e0.src
         |  JOIN cm cb ON cb.node = e0.dst),
         |st AS (SELECT COUNT(*) AS m FROM el),
         |inc AS (SELECT cl AS blk, ch AS other, lo AS member FROM el
         |  UNION ALL SELECT ch, cl, hi FROM el),
         |pb AS (SELECT blk, COUNT(DISTINCT member) AS n_nodes,
         |    CAST(SUM(CASE WHEN blk = other THEN 1 ELSE 0 END) // 2
         |      AS BIGINT) AS e_in,
         |    COUNT(*) AS d_sum FROM inc GROUP BY blk)
         |SELECT pb.blk AS block, pb.n_nodes, pb.e_in, pb.d_sum,
         |  CAST(4 * st.m * pb.e_in - pb.d_sum * pb.d_sum AS BIGINT)
         |    AS q_num
         |FROM pb, st ORDER BY block""".stripMargin,

    "dq_ks_drift" ->
      """WITH a AS (SELECT l_quantity AS v FROM lineitem
        |  WHERE YEAR(l_shipdate) < 1998),
        |b AS (SELECT l_quantity AS v FROM lineitem
        |  WHERE YEAR(l_shipdate) >= 1998),
        |ca AS (SELECT v, COUNT(*) AS c FROM a GROUP BY v),
        |cb AS (SELECT v, COUNT(*) AS c FROM b GROUP BY v),
        |j AS (SELECT COALESCE(ca.v, cb.v) AS v,
        |    COALESCE(ca.c, 0) AS da, COALESCE(cb.c, 0) AS db
        |  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v),
        |cdf AS (SELECT v,
        |    SUM(da) OVER (ORDER BY v) AS cuma,
        |    SUM(db) OVER (ORDER BY v) AS cumb,
        |    SUM(da) OVER () AS na, SUM(db) OVER () AS nb
        |  FROM j),
        |d AS (SELECT v, na, nb,
        |    ABS(cuma * nb - cumb * na) AS dd FROM cdf)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(dd AS BIGINT) AS d_num, v AS at_value
        |FROM d ORDER BY dd DESC, v ASC LIMIT 1""".stripMargin
  )
}
