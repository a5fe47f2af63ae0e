package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps
import graft.Tables
import graft.ops.{AsOf, Graph, Multimodal, Quality, Retrieval,
  Similarity, TextOps, TimeSeries}
import Fixtures._

/** Round-8 batch 4: the monitoring/maintenance ring around the core —
  * exact integer autocorrelation (seasonality detection over the
  * aggregated time axis), a Benford first-digit audit (synthetic-data /
  * fraud smell test), last-touch attribution (as-of join composed into
  * the marketing report), per-domain curation profiles (the CCNet
  * group-by-domain pass), incremental k-means statistics (the streaming
  * codebook-maintenance half of the trained-IVF family), and a
  * deterministic DeepWalk corpus (hash-derived walk choices, replayable
  * in SQL). The batch convention holds: no float ever decides a graded
  * value, every iterative trajectory unrolls into CTE layers.
  */
object Pipeline12Queries {

  type Q = (SparkSession, String) => DataFrame

  private val AcfMaxLag = 7
  private val IkmK = 8      // inc_kmeans cells
  private val IkmIters = 2  // inc_kmeans Lloyd rounds
  private val WalkSteps = 4
  private val BpeRounds = 8 // matches Pipeline10's trained merge depth

  /** Unsigned 32-bit Java hash in DuckDB (the Pipeline9 huSql). */
  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"""(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"""
  }

  val queries: Map[String, Q] = Map(

    "ts_acf" -> ((s, dir) => {
      // lag-1..7 autocorrelation of the daily order-count series per
      // order priority — the seasonality probe a forecasting pipeline
      // runs before model choice. Exact integer (num, den) pairs per
      // lag (the ewmaExact rational convention): den = Σ(n·x−S)²,
      // num_k = Σ(n·x_t−S)(n·x_{t+k}−S). The distributed step is the
      // raw-rows → daily-counts aggregate; the series itself is
      // calendar-bounded (one row per priority × day), so the
      // single-partition-per-key window is structurally small.
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          col("o_orderdate").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      TimeSeries.acfExact(daily, Seq("pri"), Seq(col("day")), "x",
          maxLag = AcfMaxLag)
        .orderBy("pri", "lag")
    }),

    "dq_benford" -> ((s, dir) => {
      // Benford first-digit audit of order totals (in cents) per
      // priority class: observed count, integer deviation from the
      // Benford expectation in micro-shares, and a 10-pp flag — all
      // division-free, so the verdict is bit-stable. Every digit
      // reports even at zero observations (absence IS the signal).
      Quality.benfordAudit(
          Tables.orders(s, dir).select(
            col("o_orderpriority").as("pri"),
            cents("o_totalprice").as("cts")),
          Seq("pri"), col("cts"))
        .orderBy("pri", "digit")
    }),

    "evt_attribution" -> ((s, dir) => {
      // last-touch attribution: each purchase binds to the LATEST
      // click of the same user at-or-before it ([[AsOf.join]] — one
      // union + one keyed window, never a range cross-join), within a
      // 24 h lookback; revenue rolls up per campaign (the click's
      // props key mod 4), unattributed purchases under campaign −1.
      // The asof match ignores the tolerance by construction (earlier
      // clicks are only farther), so the window filter composes after.
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          cents("value").as("cts"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_ms"),
          col("event_id").as("click_id"),
          (regexp_extract(col("props"), "[0-9]+", 0).cast("long") % 4)
            .as("campaign"))
      val m = AsOf.join(purchases, clicks, "user_id", "ts_ms",
        "event_id", "click_id")
      val ok = col("asof_id").isNotNull &&
        col("ts_ms") - col("asof_time") <= lit(86400000L)
      m.withColumn("att", when(ok, col("asof_id")).otherwise(lit(null)))
        .join(purchases.select(col("event_id"), col("cts")), "event_id")
        .join(clicks.select(col("click_id").as("att"), col("campaign")),
          Seq("att"), "left")
        .select(coalesce(col("campaign"), lit(-1L)).as("campaign"),
          col("cts"))
        .groupBy("campaign")
        .agg(count(lit(1)).as("n_purchases"),
          sum(col("cts")).as("rev_cents"))
        .orderBy("campaign")
    }),

    "txt_domain_stats" -> ((s, dir) => {
      // per-domain curation profile — the CCNet group-by-source pass
      // that decides which domains are worth crawling deeper: doc and
      // token volume, language breadth, length-gate pass count, and
      // exact-duplicate mass (docs minus distinct texts). One aggregate
      // keyed on source; token counts combine map-side, the two
      // distincts are per-source expand-aggregates — the frame after
      // the first combine is domain-cardinality-sized, not corpus-sized.
      Tables.documents(s, dir)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("n_chars") >= 200, 1L).otherwise(0L))
            .as("n_long"),
          (count(lit(1)) - countDistinct(col("text"))).as("n_dup"))
        .orderBy("source")
    }),

    "inc_kmeans_delta" -> ((s, dir) => {
      // incremental codebook statistics: centroids train on the BASE
      // corpus (integer Lloyd, k=8, 2 rounds); the graded output is the
      // per-(cell, dim) sufficient statistics (Σ q_emb[d], count) of
      // base ∪ delta, computed as base stats ⊎ delta stats — the delta
      // batch is assigned and summed WITHOUT rescanning base vectors
      // (the streaming mini-batch k-means update). The oracle is the
      // full recompute (train on base, assign everything), so the merge
      // identity stats(B ∪ D) = stats(B) ⊎ stats(D) is hash-gated like
      // the other seven inc_* queries.
      val sk = Similarity.quantizeInt8(Tables.embeddings(s, dir))
      val isNew = col("vec_id") % 7 === 0
      val base = sk.where(!isNew).pin()
      val delta = sk.where(isNew)
      val km = Similarity.kmeansInt8(base, IkmK, IkmIters)
      val sb = Similarity.centroidStats(base, km.centroids)
        .select(col("cell"), col("d"), col("s").as("s_b"),
          col("n").as("n_b"))
      val sd = Similarity.centroidStats(delta, km.centroids)
        .select(col("cell"), col("d"), col("s").as("s_d"),
          col("n").as("n_d"))
      sb.join(sd, Seq("cell", "d"), "full_outer")
        .select(col("cell"), col("d"),
          (coalesce(col("s_b"), lit(0L)) + coalesce(col("s_d"), lit(0L)))
            .as("s"),
          (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L)))
            .as("n"))
        .orderBy("cell", "d")
    }),

    "inc_bm25_delta" -> ((s, dir) => {
      // incremental retrieval-index maintenance: BM25's sufficient
      // statistics are ADDITIVE over disjoint doc slices (df = postings
      // rows per term; N, S = sums), so the merged index of base ⊎
      // delta serves scores IDENTICAL to a full rebuild — the oracle is
      // txt_bm25's full-corpus SQL verbatim (the inc_tri_delta oracle-
      // reuse convention; 9th inc_* query). The base corpus text is
      // never rescanned: only its stored postings/dl/stats frames and
      // the delta batch's own one-pass index meet at serve time.
      import s.implicits._
      val qdf = Pipeline11Queries.QuerySet.toDF("query_id", "term")
      val docs = Tables.documents(s, dir)
      val isNew = col("doc_id") % 7 === 0
      val merged = Retrieval.bm25Merge(
        Retrieval.bm25Index(docs.where(!isNew), "doc_id", "text"),
        Retrieval.bm25Index(docs.where(isNew), "doc_id", "text"))
      Retrieval.bm25Serve(merged, qdf, k = 10)
        .orderBy("query_id", "rnk")
    }),

    "txt_bpe_encode" -> ((s, dir) => {
      // tokenizer ENCODE with a trained model: merges learn on the
      // BASE corpus (1-in-7 split), then encode the ARRIVING slice by
      // replaying the merge table over its word types — known words
      // reproduce the training segmentation exactly, unseen words
      // degrade to char pieces, no OOV table. Graded surface: per-doc
      // piece counts of the delta slice (the token-budget number a
      // pipeline bills by).
      val docs = Tables.documents(s, dir)
      val isNew = col("doc_id") % 7 === 0
      val merges = TextOps.bpeTrainMerges(
        docs.where(!isNew), "text", BpeRounds).merges
      val dTok = docs.where(isNew)
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("word"))
        .where(col("word") =!= "")
      val enc = TextOps.bpeApplyMerges(
          dTok.select("word").distinct(), merges, BpeRounds)
        .select(col("word"),
          size(split(trim(col("seg")), " ")).cast("long").as("np"))
      dTok.join(enc, "word")
        .groupBy("doc_id").agg(sum("np").as("n_pieces"))
        .orderBy("doc_id")
    }),

    "evt_transitions" -> ((s, dir) => {
      // first-order Markov transition counts over each user's ordered
      // event stream (the user-journey model): one keyed window pass
      // (ts, event_id tie-break) for the successor, then a
      // (src, dst)-keyed count that partial-aggregates map-side.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts_ms"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_ms"), col("event_id"),
          col("event_type").as("src"))
        .withColumn("dst", lead(col("src"), 1).over(w))
        .where(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        .orderBy("src", "dst")
    }),

    "mm_phash" -> ((s, dir) => {
      // 64-bit block-energy fingerprint per media payload — the pHash
      // skeleton: one codegen'd block_sums pass per row, sign pattern
      // vs the payload mean by cross-multiplication (64·s_b > Σs).
      // Byte-level near-duplicates land within a few Hamming bits.
      Multimodal.phash64(
          Multimodal.mediaFromDocuments(s, dir).toDF(), "payload", "fp")
        .select(col("media_id"), col("fp"))
        .orderBy("media_id")
    }),

    "mm_near_dup" -> ((s, dir) => {
      // near-duplicate media pairs by banded Hamming match (4×16-bit
      // bands; pigeonhole: distance ≤ 3 ⇒ ≥ 1 whole band equal, so the
      // oracle's ALL-pairs Hamming scan and the banded candidate join
      // must agree — the recall guarantee is itself hash-gated here).
      val fps = Multimodal.phash64(
          Multimodal.mediaFromDocuments(s, dir).toDF(), "payload", "fp")
        .select(col("media_id"), col("fp"))
      Multimodal.hammingNearDup(fps, "media_id", "fp", maxHamming = 3)
        .orderBy("a", "b")
    }),

    "graph_mst" -> ((s, dir) => {
      // Borůvka MAXIMUM spanning forest (2 synchronous rounds) on the
      // support-weighted part co-order graph — the association-backbone
      // extractor: the strongest edges that still connect everything.
      // Per round: each component's argmax incident cut edge as ONE
      // hash aggregate, contraction via connectedComponents over the
      // chosen-edge label graph (component-count-sized, halving).
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("g"), col("l_partkey").as("p"))
        .distinct()
      val we = li.select(col("g"), col("p").as("lo"))
        .join(li.select(col("g"), col("p").as("hi")), "g")
        .where(col("lo") < col("hi"))
        .groupBy("lo", "hi").agg(count(lit(1)).as("w"))
        .where(col("w") >= 2)
      Graph.boruvkaMaxForest(we, "lo", "hi", "w", rounds = 2)
        .orderBy("lo", "hi")
    }),

    "dq_rate_drift" -> ((s, dir) => {
      // dataset-shift monitor between the base corpus and the arriving
      // batch (the inc_* 1-in-7 split): per category, the cross-
      // multiplied rate-drift test 10·|n_d·T_b − n_b·T_d| > T_b·T_d
      // (a 10% absolute share gap) — division-free: the comparison and
      // the emitted deviation stay exact integers, no float ever
      // decides. The product 10·n·T fits int64 up to ~9.6e8 rows per
      // side (n·T ≤ T² ≤ (9.2e18/10)), so the graded boundary is
      // BIGINT (decimal128 outputs fail the driver hasher even when
      // exact — VERDICT r8 §1); beyond that bound recompute the same
      // plan in decimal(38,0), good to ~10¹⁸ rows.
      val o = Tables.orders(s, dir).select(
        col("o_orderpriority").as("pri"),
        (col("o_orderkey") % 7 === 0).as("isnew"))
      val c = o.groupBy("pri").agg(
        sum(when(!col("isnew"), 1L).otherwise(0L)).as("n_base"),
        sum(when(col("isnew"), 1L).otherwise(0L)).as("n_delta"))
      val t = c.agg(sum("n_base").as("tb"), sum("n_delta").as("td"))
      val dev = lit(10L) *
        abs(col("n_delta") * col("tb") - col("n_base") * col("td"))
      c.crossJoin(broadcast(t))
        .withColumn("dev", dev)
        .withColumn("drifted", col("dev") > col("tb") * col("td"))
        .select("pri", "n_base", "n_delta", "dev", "drifted")
        .orderBy("pri")
    }),

    "stream_join_final" -> ((s, dir) => {
      // stream-stream interval join through a real AvailableNow drain:
      // purchases pair with same-user clicks of the preceding 30 min.
      // Inner joins emit on match, so the drained row-set is exactly
      // the batch interval join — the oracle — whenever no admitted
      // row is late beyond the watermark (the StreamDrains multi-batch
      // contract; split-drain spec in StreamSplitDrainSpec).
      StreamDrains.drain(s,
          StreamDrains.joinPipeline(Pipeline6Queries.eventsStream(s, dir)),
          "append", "sjf")
        .orderBy("click_id", "purchase_id")
    }),

    "graph_walks" -> ((s, dir) => {
      // deterministic DeepWalk corpus over the top-5 co-occurrence
      // graph (the bounded-degree kNN shape walk corpora run on): one
      // walker per vertex, 4 steps, each choice the hash-argmin
      // neighbor — a pure function of ids, so the whole corpus is
      // reproducible (re-runs leave downstream caches/dedup valid)
      // and replays in SQL. Per step: one frontier ⋈ adjacency join +
      // one argmin hash aggregate, frontier pinned.
      val topk = Graph.cooccurTopK(Tables.lineitem(s, dir),
        "l_orderkey", "l_suppkey", k = 5)
      Graph.deterministicWalks(topk, "item", "co_item",
          steps = WalkSteps, salt = "gw")
        .orderBy("walker", "step")
    })
  )

  // ------------------------------------------------------------------
  // Oracle SQL
  // ------------------------------------------------------------------

  /** The top-5 co-occurrence graph as canonical (lo, hi) edges — the
    * trianglesOracle prefix (supplier co-order baskets → pair counts →
    * per-item top-5 by (n_co desc, co_item asc) → canonical dedup). */
  private[queries] val walkEdgeCtes: String =
    """base AS (SELECT DISTINCT l_orderkey AS g, l_suppkey AS it
      |  FROM lineitem),
      |pr AS (SELECT a.it AS ia, b.it AS ib, COUNT(*) AS n_co
      |  FROM base a JOIN base b ON a.g = b.g AND a.it < b.it
      |  GROUP BY a.it, b.it),
      |sym AS (SELECT ia AS item, ib AS co_item, n_co FROM pr
      |  UNION ALL SELECT ib, ia, n_co FROM pr),
      |rk AS (SELECT item, co_item,
      |    ROW_NUMBER() OVER (PARTITION BY item
      |      ORDER BY n_co DESC, co_item ASC) AS rnk FROM sym),
      |ce AS (SELECT LEAST(item, co_item) AS lo,
      |    GREATEST(item, co_item) AS hi
      |  FROM rk WHERE rnk <= 5 GROUP BY 1, 2),
      |adj AS (SELECT lo AS v, hi AS n FROM ce
      |  UNION ALL SELECT hi, lo FROM ce)""".stripMargin

  /** One walk step: from wk`i-1`, the neighbor minimizing
    * (hashU32('gw|walker|step|n'), n). */
  private def walkStepCte(i: Int): String = {
    val h = huSql("'gw|' || CAST(w.walker AS VARCHAR) || '|' || " +
      s"'$i' || '|' || CAST(a.n AS VARCHAR)")
    s"""wk$i AS (SELECT walker, n AS node FROM (
       |  SELECT w.walker, a.n,
       |    ROW_NUMBER() OVER (PARTITION BY w.walker
       |      ORDER BY $h, a.n) AS rn
       |  FROM wk${i - 1} w JOIN adj a ON w.node = a.v) WHERE rn = 1)"""
      .stripMargin
  }

  /** The phash64 fingerprint replayed in SQL: unicode codes == payload
    * bytes on the ASCII corpus (the mm_resize precedent), proportional
    * block layout (i·64)//n, dense 0..63 block spine (docs shorter than
    * 64 bytes leave empty blocks = zero sums), sign bit via the same
    * 64·s > Σs cross-multiplication. Bit 63 is the signed-long MSB:
    * DuckDB's `<<` range-checks where Java wraps, so it is emitted as
    * the Long.MIN_VALUE literal — the arithmetic sum of distinct powers
    * (63 positive, one negative MSB) equals the two's-complement OR
    * pattern on both engines. */
  private val phashCtes: String =
    """ch AS (SELECT doc_id, string_split_regex(text, '') AS s
      |       FROM documents),
      |tok AS (SELECT doc_id, CAST(ii - 1 AS BIGINT) AS i0,
      |    CAST(unicode(s[ii]) AS BIGINT) AS code,
      |    CAST(len(s) AS BIGINT) AS n
      |  FROM ch, unnest(range(1, len(s) + 1)) AS u(ii)),
      |bs0 AS (SELECT doc_id, i0 * 64 // n AS b, SUM(code) AS sm
      |        FROM tok GROUP BY 1, 2),
      |sp AS (SELECT d.doc_id, bb.b
      |  FROM (SELECT DISTINCT doc_id FROM tok) d,
      |    (SELECT CAST(x AS BIGINT) AS b
      |     FROM unnest(range(0, 64)) t(x)) bb),
      |bs AS (SELECT sp.doc_id, sp.b, COALESCE(bs0.sm, 0) AS sm
      |  FROM sp LEFT JOIN bs0 ON sp.doc_id = bs0.doc_id
      |    AND sp.b = bs0.b),
      |tt AS (SELECT doc_id, SUM(sm) AS tot FROM bs GROUP BY 1),
      |fps AS (SELECT bs.doc_id AS media_id,
      |    CAST(SUM(CASE WHEN 64 * bs.sm > tt.tot THEN
      |        CASE WHEN bs.b = 63 THEN -9223372036854775808
      |             ELSE 1::BIGINT << bs.b END
      |      ELSE 0 END) AS BIGINT) AS fp
      |  FROM bs JOIN tt USING (doc_id) GROUP BY 1)""".stripMargin

  /** The support-weighted co-order graph + 2 unrolled Borůvka rounds;
    * the round-1 contraction is a recursive closure over the chosen
    * edges (the dd_cluster_cc transitive-closure convention). */
  private val mstCtes: String =
    """wb AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it
      |       FROM lineitem),
      |wd AS (SELECT a.it AS lo, b.it AS hi, COUNT(*) AS w
      |  FROM wb a JOIN wb b ON a.g = b.g AND a.it < b.it
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |cand1 AS (SELECT lo AS c, lo, hi, w FROM wd
      |  UNION ALL SELECT hi, lo, hi, w FROM wd),
      |b1 AS (SELECT lo, hi, w FROM (
      |    SELECT c, lo, hi, w, ROW_NUMBER() OVER (PARTITION BY c
      |      ORDER BY w DESC, lo ASC, hi ASC) AS rn FROM cand1)
      |  WHERE rn = 1),
      |ch1 AS (SELECT DISTINCT lo, hi, w FROM b1),
      |verts AS (SELECT lo AS v FROM wd UNION SELECT hi FROM wd),
      |sedges AS (SELECT lo AS u, hi AS v FROM ch1
      |  UNION SELECT hi, lo FROM ch1),
      |reach(id, lbl) AS (
      |  SELECT v, v FROM verts
      |  UNION
      |  SELECT e.v, r.lbl FROM reach r JOIN sedges e ON e.u = r.id),
      |lab AS (SELECT id, MIN(lbl) AS l FROM reach GROUP BY id),
      |e2 AS (SELECT w.lo, w.hi, w.w, a.l AS cl, b.l AS ch
      |  FROM wd w JOIN lab a ON w.lo = a.id JOIN lab b ON w.hi = b.id
      |  WHERE a.l <> b.l),
      |cand2 AS (SELECT cl AS c, lo, hi, w FROM e2
      |  UNION ALL SELECT ch, lo, hi, w FROM e2),
      |b2 AS (SELECT lo, hi, w FROM (
      |    SELECT c, lo, hi, w, ROW_NUMBER() OVER (PARTITION BY c
      |      ORDER BY w DESC, lo ASC, hi ASC) AS rn FROM cand2)
      |  WHERE rn = 1),
      |ch2 AS (SELECT DISTINCT lo, hi, w FROM b2)""".stripMargin

  val oracles: Map[String, String] = Map(

    // full-recompute identity: the merged incremental index must score
    // exactly what a from-scratch rebuild scores
    "inc_bm25_delta" -> Pipeline11Queries.oracles("txt_bm25"),

    "txt_bpe_encode" -> {
      // training chain (v/m CTEs) restricted to the base slice, then a
      // parallel apply chain u0..u8 replays m0..m7 over the delta
      // slice's word types
      val applies = (0 until BpeRounds).map { i =>
        s"""u${i + 1} AS (SELECT u.word,
           |    replace(u.seg, ' ' || m.l || ' ' || m.r || ' ',
           |      ' ' || m.l || m.r || ' ') AS seg
           |  FROM u$i u, m$i m)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${Pipeline10Queries.bpeCtes(BpeRounds,
             Some("doc_id % 7 <> 0"))},
         |dt AS (SELECT doc_id, w AS word FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents WHERE doc_id % 7 = 0)
         |  WHERE w <> ''),
         |u0 AS (SELECT word,
         |    ' ' || array_to_string(string_split_regex(word, ''), ' ')
         |      || ' ' AS seg
         |  FROM (SELECT DISTINCT word FROM dt)),
         |$applies,
         |enc AS (SELECT word,
         |    CAST(len(string_split(trim(seg), ' ')) AS BIGINT) AS np
         |  FROM u$BpeRounds)
         |SELECT dt.doc_id, CAST(SUM(enc.np) AS BIGINT) AS n_pieces
         |FROM dt JOIN enc USING (word)
         |GROUP BY dt.doc_id ORDER BY doc_id""".stripMargin
    },

    "evt_transitions" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS t,
        |    event_id FROM events),
        |s AS (SELECT event_type AS src,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS dst
        |  FROM e)
        |SELECT src, dst, COUNT(*) AS n FROM s WHERE dst IS NOT NULL
        |GROUP BY src, dst ORDER BY src, dst""".stripMargin,

    "mm_phash" ->
      s"""WITH $phashCtes
         |SELECT media_id, fp FROM fps ORDER BY media_id""".stripMargin,

    "mm_near_dup" ->
      // ALL-pairs Hamming scan — deliberately NOT banded: matching the
      // banded Spark plan against the exhaustive oracle grades the
      // pigeonhole recall guarantee itself
      s"""WITH $phashCtes
         |SELECT x.media_id AS a, y.media_id AS b,
         |  CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT) AS hamming
         |FROM fps x JOIN fps y ON x.media_id < y.media_id
         |WHERE bit_count(xor(x.fp, y.fp)) <= 3
         |ORDER BY a, b""".stripMargin,

    "graph_mst" ->
      s"""WITH RECURSIVE $mstCtes
         |SELECT lo, hi, w FROM (
         |  SELECT * FROM ch1 UNION ALL SELECT * FROM ch2)
         |ORDER BY lo, hi""".stripMargin,

    "dq_rate_drift" ->
      """WITH o AS (SELECT o_orderpriority AS pri,
        |    o_orderkey % 7 = 0 AS isnew FROM orders),
        |c AS (SELECT pri,
        |    CAST(SUM(CASE WHEN isnew THEN 0 ELSE 1 END) AS BIGINT)
        |      AS n_base,
        |    CAST(SUM(CASE WHEN isnew THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_delta
        |  FROM o GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
        |    CAST(SUM(n_delta) AS BIGINT) AS td FROM c)
        |SELECT c.pri, c.n_base, c.n_delta,
        |  CAST(10 * ABS(c.n_delta * t.tb - c.n_base * t.td) AS BIGINT)
        |    AS dev,
        |  (10 * ABS(c.n_delta * t.tb - c.n_base * t.td)
        |    > t.tb * t.td) AS drifted
        |FROM c, t ORDER BY pri""".stripMargin,

    "ts_acf" ->
      s"""WITH d AS (SELECT o_orderpriority AS pri,
         |    CAST(o_orderdate AS DATE) AS day, COUNT(*) AS x
         |  FROM orders GROUP BY 1, 2),
         |t AS (SELECT pri, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sv
         |      FROM d GROUP BY 1),
         |e AS (SELECT d.pri,
         |    ROW_NUMBER() OVER (PARTITION BY d.pri ORDER BY d.day) AS rn,
         |    t.n * d.x - t.sv AS e
         |  FROM d JOIN t USING (pri)),
         |dn AS (SELECT pri, CAST(SUM(e * e) AS BIGINT) AS den
         |       FROM e GROUP BY 1),
         |lg AS (SELECT CAST(k AS BIGINT) AS lag
         |       FROM unnest(range(1, ${AcfMaxLag + 1})) AS t(k)),
         |nm AS (SELECT a.pri, l.lag, CAST(SUM(a.e * b.e) AS BIGINT) AS num
         |  FROM e a CROSS JOIN lg l
         |  JOIN e b ON a.pri = b.pri AND b.rn = a.rn + l.lag
         |  GROUP BY 1, 2)
         |SELECT pri, lag, num, den FROM nm JOIN dn USING (pri)
         |ORDER BY pri, lag""".stripMargin,

    "dq_benford" -> {
      val vals = Quality.BenfordMicro.zipWithIndex
        .map { case (e, i) => s"(${i + 1}, $e)" }.mkString(", ")
      s"""WITH b AS (SELECT o_orderpriority AS pri,
         |    CAST(SUBSTR(CAST(${centsSql("o_totalprice")} AS VARCHAR),
         |      1, 1) AS BIGINT) AS digit
         |  FROM orders WHERE ${centsSql("o_totalprice")} > 0),
         |em AS (SELECT CAST(d AS BIGINT) AS digit, CAST(e AS BIGINT) AS e
         |       FROM (VALUES $vals) AS v(d, e)),
         |c AS (SELECT pri, digit, COUNT(*) AS cnt FROM b GROUP BY 1, 2),
         |t AS (SELECT pri, COUNT(*) AS n FROM b GROUP BY 1),
         |sp AS (SELECT t.pri, em.digit, em.e, t.n FROM t CROSS JOIN em)
         |SELECT sp.pri, sp.digit, COALESCE(c.cnt, 0) AS cnt,
         |  ABS(1000000 * COALESCE(c.cnt, 0) - sp.n * sp.e) AS dev,
         |  (ABS(1000000 * COALESCE(c.cnt, 0) - sp.n * sp.e)
         |    > sp.n * 100000) AS flagged
         |FROM sp LEFT JOIN c ON sp.pri = c.pri AND sp.digit = c.digit
         |ORDER BY sp.pri, sp.digit""".stripMargin
    },

    "evt_attribution" ->
      s"""WITH p AS (SELECT event_id AS pid, user_id, epoch_ms(ts) AS pt,
         |    ${centsSql("value")} AS cts
         |  FROM events WHERE event_type = 'purchase'),
         |c AS (SELECT event_id AS cid, user_id, epoch_ms(ts) AS ct,
         |    CAST(regexp_extract(props, '[0-9]+') AS BIGINT) % 4
         |      AS campaign
         |  FROM events WHERE event_type = 'click'),
         |m AS (SELECT p.pid, c.campaign, c.ct, p.pt,
         |    ROW_NUMBER() OVER (PARTITION BY p.pid
         |      ORDER BY c.ct DESC, c.cid DESC) AS rn
         |  FROM p JOIN c ON p.user_id = c.user_id AND c.ct <= p.pt),
         |w AS (SELECT pid, campaign, ct, pt FROM m WHERE rn = 1),
         |a AS (SELECT p.pid, p.cts,
         |    CASE WHEN w.pid IS NULL OR p.pt - w.ct > 86400000
         |         THEN CAST(-1 AS BIGINT) ELSE w.campaign END AS campaign
         |  FROM p LEFT JOIN w USING (pid))
         |SELECT campaign, COUNT(*) AS n_purchases,
         |  CAST(SUM(cts) AS BIGINT) AS rev_cents
         |FROM a GROUP BY campaign ORDER BY campaign""".stripMargin,

    "txt_domain_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  COUNT(DISTINCT lang) AS n_langs,
        |  CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_long,
        |  COUNT(*) - COUNT(DISTINCT text) AS n_dup
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "inc_kmeans_delta" ->
      s"""WITH ${Pipeline10Queries.kmeansCtes(IkmK, IkmIters, "km",
             Some("vec_id % 7 <> 0"))},
         |${Pipeline10Queries.assignCte("af", s"c$IkmIters", "sk")}
         |SELECT a.cell, i.d, CAST(SUM(s.qv[i.d]) AS BIGINT) AS s,
         |  COUNT(*) AS n
         |FROM af a JOIN sk s USING (vec_id), idx i
         |GROUP BY a.cell, i.d
         |ORDER BY cell, d""".stripMargin,

    "stream_join_final" ->
      """WITH e AS (SELECT event_id, user_id, event_type,
        |    epoch_ms(ts) AS t FROM events),
        |c AS (SELECT event_id AS click_id, user_id, t AS cts
        |      FROM e WHERE event_type = 'click'),
        |p AS (SELECT event_id AS purchase_id, user_id, t AS pts
        |      FROM e WHERE event_type = 'purchase')
        |SELECT c.click_id, p.purchase_id, c.user_id,
        |  c.cts AS cts_ms, p.pts AS pts_ms
        |FROM c JOIN p ON c.user_id = p.user_id
        |  AND p.pts >= c.cts AND p.pts <= c.cts + 1800000
        |ORDER BY click_id, purchase_id""".stripMargin,

    "graph_walks" -> {
      val steps = (1 to WalkSteps).map(walkStepCte).mkString(",\n")
      val sel = (0 to WalkSteps).map(i =>
        s"SELECT walker, CAST($i AS BIGINT) AS step, node FROM wk$i")
        .mkString("\nUNION ALL\n")
      s"""WITH $walkEdgeCtes,
         |wk0 AS (SELECT DISTINCT v AS walker, v AS node FROM adj),
         |$steps
         |$sel
         |ORDER BY walker, step""".stripMargin
    }
  )
}
