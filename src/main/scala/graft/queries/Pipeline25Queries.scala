package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.ops.{Blocking, Cluster, Graph, Multimodal, TextOps, TimeSeries}

/** Round-12 third batch: classical seasonal decomposition and the
  * Theil–Sen robust slope (the trend half of the TS family beside the
  * MAD/z anomaly gates), the link-prediction score triple
  * (CN / resource-allocation / preferential-attachment), RAKE keyword
  * extraction, aspect-ratio training-batch bucketing, and
  * entity-resolution blocking → verify → resolve.
  *
  * Reference scope note: the reference (sri2db) has none of these —
  * north-star LLM-pipeline extensions in the established exact-integer,
  * oracle-first idiom.
  */
object Pipeline25Queries {

  type Q = (SparkSession, String) => DataFrame

  private val StlScale = 1000000L // seasonal/residual fixed-point scale
  private val TsScale = 1000L     // Theil–Sen slope scale (cents/day ×1000)
  private val RakeStop = 16       // corpus stoplist width
  private val RakeTopK = 20       // graded keyword count
  private val LpScale = 1000000L  // resource-allocation fixed-point scale
  /** (bw, bh) aspect buckets, 1-indexed in this order (square, 4:3,
    * portrait 3:4, 16:9, portrait 9:16). */
  private val Buckets = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16))
  private val BatchSize = 8

  /** part-table ER blocking keys: (noun, size) and (adjective, size) —
    * two passes, high recall on the name-variant structure, tiny blocks
    * (≤ 69 rows at sf0.1). */
  private def partBlockKeys(tk: org.apache.spark.sql.Column) = Seq(
    concat(element_at(tk, 2), lit(":"), col("p_size")),
    concat(element_at(tk, 1), lit(":"), col("p_size")))

  val queries: Map[String, Q] = Map(

    "ts_stl" -> ((s, dir) => {
      // classical additive decomposition of the daily order-count
      // series per priority, weekly period: trend = centered 7-row
      // moving sum (×7), seasonal index = per-weekday mean of the
      // detrended series, residual = the rest — all scaled truncated
      // integers, full-window rows only (the standard edge trim).
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
        .withColumn("d",
          datediff(col("day"), to_date(lit("1970-01-01"))))
      TimeSeries.classicalDecompose(daily, Seq("pri"), col("day"),
          (col("d") % 7).cast("long"), "x", period = 7, scale = StlScale)
        .withColumnRenamed("__o", "day")
        .orderBy("pri", "day")
    }),

    "ts_theilsen" -> ((s, dir) => {
      // Theil–Sen robust slope of the daily revenue-cents series per
      // (priority, month): the median (two-middle form) of all pairwise
      // scaled slopes inside the calendar-bounded month — the
      // 29%-breakdown trend gate beside ts_mad_anomaly's level gate.
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          substring(col("o_orderdate").cast("date").cast("string"), 1, 7)
            .as("mo"),
          col("o_orderdate").cast("date").as("day"))
        .agg(sum(Fixtures.cents("o_totalprice")).as("x"))
        .withColumn("t",
          datediff(col("day"), to_date(lit("1970-01-01"))))
      TimeSeries.theilSenSlopes(daily, Seq("pri", "mo"), col("t"), "x",
          scale = TsScale, maxSeries = 40)
        .orderBy("pri", "mo")
    }),

    "graph_linkpred" -> ((s, dir) => {
      // the link-prediction score triple on graph_jaccard's support≥2
      // part co-order graph: common neighbors, resource allocation
      // (Σ scale div deg(z) — the exact-integer Adamic–Adar cousin),
      // preferential attachment — over wedge-generated NON-edges only.
      Graph.linkPredScores(Pipeline10Queries.coorderEdges(s, dir),
          "lo", "hi", minCommon = 2, scale = LpScale)
        .orderBy("a", "b")
    }),

    "txt_rake" -> ((s, dir) => {
      // RAKE keyword extraction: stopword-free runs scored by member
      // deg/freq ratios (scaled truncated integers); the stoplist is
      // the corpus top-16 tokens (data-driven — the corpus language is
      // synthetic). Graded surface = the global top-20 phrases.
      val docs = Tables.documents(s, dir)
      val phr = TextOps.rakePhrases(docs, "doc_id", "text",
        TextOps.topTokenStoplist(docs, "text", RakeStop), StlScale)
      phr.orderBy(col("score_s").desc, col("phrase").asc)
        .limit(RakeTopK)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("score_s").desc, col("phrase").asc))
          .cast("long"))
        .select("rnk", "phrase", "n_words", "n_occur", "score_s")
        .orderBy("rnk")
    }),

    "mm_aspect_bucket" -> ((s, dir) => {
      // aspect-ratio bucketing + fixed-size batch packing (the SDXL
      // training-batch prep): nearest ratio bucket by exact scaled
      // relative error, ties to the earlier bucket; batches of 8 in
      // media-id order per bucket. Decode is the stubbed seam whose
      // fake dimensions the oracle replays byte-for-byte (mm_resize).
      val feats = Multimodal.decodeFeatures(
          Multimodal.mediaFromDocuments(s, dir)).toDF()
        .select(col("media_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"))
      Multimodal.aspectBuckets(feats, "media_id", "width", "height",
          Buckets, BatchSize, StlScale)
        .select("media_id", "width", "height", "bucket", "bucket_w",
          "bucket_h", "cost_s", "batch_id")
        .orderBy("media_id")
    }),

    "er_resolve" -> ((s, dir) => {
      // entity resolution end to end, REPRESENTATIVE-CONTRACTED (the
      // sf1 probe measured the naive record-level blocking 14× for 10×
      // data — with a fixed key domain and linearly growing duplicate
      // classes the candidate space is inherently quadratic, exactly
      // like the true pair set): exact-dedup each (name, size) group to
      // its min-id representative (star edges, one groupBy), run the
      // two-pass blocking + Levenshtein ≤ 2 verify on the
      // REPRESENTATIVES only (constant domain → constant work), and
      // take components over stars ∪ rep-matches. Provably the same
      // components as record-level blocking (stars are lev-0 in-block
      // pairs; any record-level match r1–r2 is the path
      // r1–rep1–rep2–r2, reps sharing r1/r2's block), so the graded
      // output is IDENTICAL while the plan is linear in records.
      val p = Tables.part(s, dir)
      val reps = p.groupBy("p_name", "p_size")
        .agg(min(col("p_partkey")).as("rep_id"))
      val stars = p
        .join(reps, Seq("p_name", "p_size"))
        .where(col("p_partkey") =!= col("rep_id"))
        .select(col("rep_id").as("a"), col("p_partkey").as("b"))
      val tk = split(col("p_name"), " ")
      val near = Blocking.verifyPairs(
          Blocking.blockedPairs(reps, "rep_id", partBlockKeys(tk)),
          reps, "rep_id", "p_name")
        .where(col("lev") <= 2)
        .select("a", "b")
      Cluster.connectedComponents(p.select(col("p_partkey")),
          "p_partkey", stars.unionByName(near), "a", "b",
          edgesCovered = true)
        .join(p.select(col("p_partkey").as("id"), col("p_name")), "id")
        .groupBy(col("cluster").as("cluster_id"))
        .agg(count(lit(1)).as("n_records"),
          countDistinct(col("p_name")).as("n_names"))
        .where(col("n_records") >= 2)
        .orderBy("cluster_id")
    }),

    "er_pair_features" -> ((s, dir) => {
      // the verify stage's feature surface, rolled up by unordered name
      // pair — computed in CLOSED FORM from (name, size) group counts
      // (the sf1 probe measured the pair-enumeration form 23× for 10×
      // data: counting record pairs by generating them is quadratic by
      // definition; Σ_size c_a·c_b over the blocked name pairs is the
      // same number, linear): which name variants the lev ≤ 2 rule
      // links and how often. Name vocabulary is SF-independent, so the
      // name-pair table is a broadcast-sized cross and the output stays
      // ≤ ~24 rows at any scale. Output identical to enumeration.
      val p = Tables.part(s, dir)
      val cnt = p.groupBy("p_name", "p_size")
        .agg(count(lit(1)).as("c"))
      val names = p.select("p_name").distinct()
        .withColumn("tk", split(col("p_name"), " "))
      val nb = names.select(col("p_name").as("name_b"),
        col("tk").as("tkb"))
      val np = names.select(col("p_name").as("name_a"),
          col("tk").as("tka"))
        // union blocking semantics (the blockedPairs contract): any of
        // A's two token keys equal to any of B's — cross-position
        // matches included, exactly the oracle's unioned-k self-join
        .join(broadcast(nb), col("name_a") < col("name_b") &&
          (element_at(col("tka"), 1) === element_at(col("tkb"), 1) ||
            element_at(col("tka"), 2) === element_at(col("tkb"), 2) ||
            element_at(col("tka"), 1) === element_at(col("tkb"), 2) ||
            element_at(col("tka"), 2) === element_at(col("tkb"), 1)))
        .select(col("name_a"), col("name_b"),
          levenshtein(col("name_a"), col("name_b")).cast("long")
            .as("lev"))
        .where(col("lev").between(1, 2))
      np.join(cnt.select(col("p_name").as("name_a"),
          col("p_size").as("s"), col("c").as("ca")), "name_a")
        .join(cnt.select(col("p_name").as("name_b"),
          col("p_size").as("s"), col("c").as("cb")), Seq("name_b", "s"))
        .groupBy("name_a", "name_b", "lev")
        .agg(sum(col("ca") * col("cb")).as("n_pairs"))
        .orderBy("name_a", "name_b")
    })
  )

  // --------------------------------------------------------------------
  // Oracles
  // --------------------------------------------------------------------

  /** Blocking + candidate CTE stack shared by both er_* oracles —
    * ends with cand(a, b) distinct id pairs and t(id, nm, p_size). */
  private val erCtes: String =
    """t AS (SELECT p_partkey AS id, p_name AS nm,
      |    string_split(p_name, ' ') AS tk, p_size FROM part),
      |k AS (SELECT id, tk[2] || ':' || p_size AS bk FROM t
      |      UNION ALL SELECT id, tk[1] || ':' || p_size FROM t),
      |cand AS (SELECT DISTINCT a.id AS a, b.id AS b
      |  FROM k a JOIN k b ON a.bk = b.bk AND a.id < b.id)""".stripMargin

  /** The ts_stl CTE stack, shared with ts_stl_strength — ends with
    * `dec(pri, day, season, x, trend_p, seas_s, resid_s)`. */
  private[queries] val stlCtes: String =
    """daily AS (SELECT o_orderpriority AS pri,
      |    CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x
      |  FROM orders GROUP BY 1, 2),
      |w AS (SELECT pri, day,
      |    date_diff('day', DATE '1970-01-01', day) % 7 AS season, x,
      |    CAST(SUM(x) OVER (PARTITION BY pri ORDER BY day
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT)
      |      AS trend_p,
      |    COUNT(*) OVER (PARTITION BY pri ORDER BY day
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
      |  FROM daily),
      |f AS (SELECT pri, day, season, x, trend_p,
      |    7 * x - trend_p AS detr_p FROM w WHERE wn = 7),
      |se AS (SELECT pri, season,
      |    CAST((SUM(detr_p) * 1000000) // (COUNT(*) * 7) AS BIGINT)
      |      AS seas_s
      |  FROM f GROUP BY 1, 2),
      |dec AS (SELECT f.pri, f.day, CAST(f.season AS BIGINT) AS season,
      |    f.x, f.trend_p, se.seas_s,
      |    CAST(f.x * 1000000 - (f.trend_p * 1000000) // 7 - se.seas_s
      |      AS BIGINT) AS resid_s
      |  FROM f JOIN se ON se.pri = f.pri AND se.season = f.season)"""
      .stripMargin

  val oracles: Map[String, String] = Map(

    "ts_stl" ->
      s"""WITH $stlCtes
         |SELECT pri, day, season, x, trend_p, seas_s, resid_s
         |FROM dec ORDER BY pri, day""".stripMargin,

    "ts_theilsen" ->
      """WITH daily AS (SELECT o_orderpriority AS pri,
        |    substr(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 1, 7)
        |      AS mo,
        |    CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
        |      AS BIGINT) AS x
        |  FROM orders GROUP BY 1, 2, 3),
        |d AS (SELECT pri, mo,
        |    date_diff('day', DATE '1970-01-01', day) AS t, x FROM daily),
        |pr AS (SELECT a.pri, a.mo,
        |    CAST(((b.x - a.x) * 1000) // (b.t - a.t) AS BIGINT) AS sl,
        |    a.t AS o1, b.t AS o2
        |  FROM d a JOIN d b ON a.pri = b.pri AND a.mo = b.mo
        |    AND a.t < b.t),
        |r AS (SELECT pri, mo, sl,
        |    ROW_NUMBER() OVER (PARTITION BY pri, mo
        |      ORDER BY sl, o1, o2) AS rn,
        |    COUNT(*) OVER (PARTITION BY pri, mo) AS np FROM pr),
        |m AS (SELECT pri, mo, CAST(MAX(np) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN rn = (np + 1) // 2 THEN sl END) +
        |      SUM(CASE WHEN rn = np // 2 + 1 THEN sl END) AS BIGINT)
        |      AS slope2_s
        |  FROM r GROUP BY 1, 2),
        |n AS (SELECT pri, mo, COUNT(*) AS n_days FROM d GROUP BY 1, 2)
        |SELECT n.pri, n.mo, n.n_days, m.n_pairs, m.slope2_s
        |FROM n JOIN m ON m.pri = n.pri AND m.mo = n.mo
        |ORDER BY n.pri, n.mo""".stripMargin,

    "graph_linkpred" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |  FROM lineitem),
        |e0 AS (SELECT lo, hi FROM (
        |    SELECT a.p AS lo, b.p AS hi, COUNT(*) AS n
        |    FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |    GROUP BY a.p, b.p) WHERE n >= 2),
        |adj AS (SELECT lo AS v, hi AS nb FROM e0
        |        UNION ALL SELECT hi, lo FROM e0),
        |dg AS (SELECT v, COUNT(*) AS d FROM adj GROUP BY v),
        |wr AS (SELECT x.nb AS a, y.nb AS b, dg.d AS dv
        |  FROM adj x JOIN adj y ON x.v = y.v AND x.nb < y.nb
        |  JOIN dg ON dg.v = x.v),
        |wd AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn,
        |    CAST(SUM(1000000 // dv) AS BIGINT) AS ra_s
        |  FROM wr GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |ne AS (SELECT wd.a, wd.b, wd.cn, wd.ra_s FROM wd
        |  LEFT JOIN e0 ON e0.lo = wd.a AND e0.hi = wd.b
        |  WHERE e0.lo IS NULL)
        |SELECT ne.a, ne.b, ne.cn, ne.ra_s,
        |  CAST(da.d * db.d AS BIGINT) AS pa
        |FROM ne JOIN dg da ON da.v = ne.a JOIN dg db ON db.v = ne.b
        |ORDER BY ne.a, ne.b""".stripMargin,

    "txt_rake" ->
      """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS s
        |  FROM documents),
        |tok AS (SELECT doc_id, CAST(ii AS BIGINT) AS pos, s[ii] AS w
        |  FROM t0, unnest(range(1, len(s) + 1)) AS u(ii)
        |  WHERE s[ii] <> ''),
        |st AS (SELECT w FROM (SELECT w, COUNT(*) AS c FROM tok
        |  GROUP BY 1 ORDER BY c DESC, w ASC LIMIT 16)),
        |mk AS (SELECT doc_id, pos, w,
        |    w IN (SELECT w FROM st) AS isstop,
        |    SUM(CASE WHEN w IN (SELECT w FROM st) THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY pos) AS pid
        |  FROM tok),
        |mem AS (SELECT doc_id, pid, pos, w,
        |    COUNT(*) OVER (PARTITION BY doc_id, pid) AS ln
        |  FROM mk WHERE NOT isstop),
        |ws AS (SELECT w, (SUM(ln) * 1000000) // COUNT(*) AS wscore
        |  FROM mem GROUP BY 1),
        |po AS (SELECT m.doc_id, m.pid,
        |    string_agg(m.w, ' ' ORDER BY m.pos) AS phrase,
        |    COUNT(*) AS n_words, CAST(SUM(ws.wscore) AS BIGINT)
        |      AS score_s
        |  FROM mem m JOIN ws ON ws.w = m.w GROUP BY 1, 2),
        |ph AS (SELECT phrase, CAST(MAX(n_words) AS BIGINT) AS n_words,
        |    CAST(COUNT(*) AS BIGINT) AS n_occur, MAX(score_s) AS score_s
        |  FROM po GROUP BY 1),
        |r AS (SELECT phrase, n_words, n_occur, score_s,
        |    ROW_NUMBER() OVER (ORDER BY score_s DESC, phrase ASC)
        |      AS rnk FROM ph)
        |SELECT CAST(rnk AS BIGINT) AS rnk, phrase, n_words, n_occur,
        |  score_s
        |FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin,

    "mm_aspect_bucket" ->
      // mm_resize's Arrays.hashCode replay feeding the bucket argmin
      """WITH m AS (SELECT doc_id AS media_id,
        |  list_reduce(list_prepend(CAST(1 AS BIGINT),
        |    list_transform(string_split_regex(text, ''),
        |      c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> ((((h * 31 + c + 2147483648) % 4294967296)
        |      + 4294967296) % 4294967296) - 2147483648) AS hc
        |  FROM documents),
        |d AS (SELECT media_id,
        |  abs(hc % 1920) + 1 AS width,
        |  abs((hc // 1920) % 1080) + 1 AS height FROM m),
        |bk(i, bw, bh) AS (VALUES (1, 1, 1), (2, 4, 3), (3, 3, 4),
        |  (4, 16, 9), (5, 9, 16)),
        |c AS (SELECT d.media_id, d.width, d.height, bk.i, bk.bw, bk.bh,
        |    (abs(d.width * bk.bh - d.height * bk.bw) * 1000000)
        |      // (d.height * bk.bw) AS cost_s
        |  FROM d, bk),
        |sel AS (SELECT media_id, width, height, i, bw, bh, cost_s FROM (
        |    SELECT c.*, ROW_NUMBER() OVER (PARTITION BY media_id
        |      ORDER BY cost_s, i) AS rn FROM c) WHERE rn = 1)
        |SELECT media_id, CAST(width AS BIGINT) AS width,
        |  CAST(height AS BIGINT) AS height, CAST(i AS BIGINT) AS bucket,
        |  CAST(bw AS BIGINT) AS bucket_w, CAST(bh AS BIGINT) AS bucket_h,
        |  CAST(cost_s AS BIGINT) AS cost_s,
        |  CAST((ROW_NUMBER() OVER (PARTITION BY i ORDER BY media_id) - 1)
        |    // 8 AS BIGINT) AS batch_id
        |FROM sel ORDER BY media_id""".stripMargin,

    "er_resolve" ->
      s"""WITH RECURSIVE $erCtes,
         |mt AS (SELECT cand.a, cand.b FROM cand
         |  JOIN t ta ON ta.id = cand.a JOIN t tb ON tb.id = cand.b
         |  WHERE levenshtein(ta.nm, tb.nm) <= 2),
         |ed AS (SELECT a AS u, b AS v FROM mt
         |       UNION SELECT b, a FROM mt),
         |reach(id, lbl) AS (
         |  SELECT id, id FROM t
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN ed e ON e.u = r.id),
         |cc AS (SELECT id, MIN(lbl) AS cluster_id FROM reach GROUP BY 1)
         |SELECT cc.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_records,
         |  CAST(COUNT(DISTINCT t.nm) AS BIGINT) AS n_names
         |FROM cc JOIN t ON t.id = cc.id
         |GROUP BY 1 HAVING COUNT(*) >= 2
         |ORDER BY cluster_id""".stripMargin,

    "er_pair_features" ->
      s"""WITH $erCtes,
         |f AS (SELECT LEAST(ta.nm, tb.nm) AS name_a,
         |    GREATEST(ta.nm, tb.nm) AS name_b,
         |    CAST(levenshtein(ta.nm, tb.nm) AS BIGINT) AS lev
         |  FROM cand JOIN t ta ON ta.id = cand.a
         |  JOIN t tb ON tb.id = cand.b)
         |SELECT name_a, name_b, lev, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |FROM f WHERE lev BETWEEN 1 AND 2
         |GROUP BY 1, 2, 3 ORDER BY name_a, name_b""".stripMargin
  )
}
