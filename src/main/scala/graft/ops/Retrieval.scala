package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over the document corpus — the query side
  * of the inverted-index / TF-IDF surface (`txt_inverted`, `txt_tfidf`):
  * given a small set of term queries, return the top-k documents per
  * query under BM25 (Robertson et al., TREC-3) — the retrieval stage a
  * RAG / data-curation pipeline runs before ANN re-ranking.
  *
  * EXACTNESS. Classic BM25's idf is `ln((N-df+0.5)/(df+0.5))` — a
  * transcendental no two engines round identically. This is BM25-lite:
  * the same saturating tf part and length normalization, but the RAW
  * rational idf `(N-df+1/2)/(df+1/2)` (the log's argument; order-
  * preserving per term since it is monotone in df). Every per-term
  * contribution is then a ratio of integers, floored at `scale`:
  *
  *   contrib = floor( scale * (2N-2df+1) * 22 * tf * S
  *                    / ((2df+1) * (10*S*tf + 3*S + 9*dl*N)) )
  *
  * which is exactly `scale * idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`
  * with k1=6/5, b=3/4, avgdl=S/N, all denominators cleared (multiply
  * num and den by 10*S). Numerators run in decimal(38,0) (HUGEINT on
  * the oracle side, the txt_pmi convention); `div` mirrors `//`, so no
  * float ever decides a score. BOUND: exact while
  * scale*2N*22*tf*S < 10^38, i.e. N * S * tf ≲ 2*10^30 — beyond any
  * real corpus (10^10 docs * 10^13 tokens * tf 100 = 10^25).
  *
  * SCALE. The query set and its per-term df are broadcast; the corpus
  * tokenization is the only large scan. Postings are never materialized
  * corpus-wide: tokens are semi-joined to the query vocabulary BEFORE
  * the tf aggregation, so the big shuffle carries only matching terms.
  * Doc length joins on the doc key (co-partitioned with tf). The final
  * top-k window partitions by query_id over scored docs only.
  */
object Retrieval {

  /** The stored retrieval index of one corpus slice: `postings` =
    * (doc_id, term, tf), `dl` = (doc_id, dl), `stats` = one row
    * (n_docs, s_tok). BM25's sufficient statistics are ADDITIVE over
    * disjoint doc slices (df is a count of postings rows per term; N
    * and S are sums), so indexes merge by union/addition — the
    * incremental-maintenance property a streaming retrieval index
    * lives on ([[bm25Merge]]). */
  final case class Bm25Index(postings: DataFrame, dl: DataFrame,
                             stats: DataFrame)

  /** Build the stored index for a corpus slice — the one pass that
    * touches raw text. Postings keep the FULL vocabulary (the index is
    * query-independent); the serve-time semi-join restricts to the
    * query vocabulary. */
  def bm25Index(docs: DataFrame, idCol: String, textCol: String)
  : Bm25Index = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("s_tok"))
    val postings = tok.groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    Bm25Index(postings, dl, stats)
  }

  /** Merge two DISJOINT-slice indexes: postings/dl union (doc sets must
    * not overlap — re-index a replaced doc by deleting first), stats
    * add. The arriving batch contributes only its OWN index; the base
    * corpus text is never rescanned. */
  def bm25Merge(a: Bm25Index, b: Bm25Index): Bm25Index = Bm25Index(
    a.postings.unionByName(b.postings),
    a.dl.unionByName(b.dl),
    a.stats.select(col("n_docs").as("na"), col("s_tok").as("sa"))
      .crossJoin(b.stats.select(col("n_docs").as("nb"),
        col("s_tok").as("sb")))
      .select((col("na") + col("nb")).as("n_docs"),
        (col("sa") + col("sb")).as("s_tok")))

  /** Score top-k from a STORED index — no raw-text scan. Per-term df
    * is counted from the (semi-joined) postings, so it reflects
    * whatever slices were merged in. */
  def bm25Serve(ix: Bm25Index, queries: DataFrame, k: Int,
                scale: Long = 1000000L): DataFrame = {
    val qterms = queries.select(col("query_id"), col("term")).distinct()
    val qvocab = qterms.select("term").distinct()
    // semi-join first: the scoring shuffle carries query-vocabulary
    // postings only, never the whole index
    scoreTf(ix.postings.join(broadcast(qvocab), Seq("term"), "left_semi"),
      ix.dl, ix.stats, qterms, k, scale)
  }

  /** Shared scorer over an already-query-pruned tf frame. */
  private def scoreTf(tf: DataFrame, dl: DataFrame, stats: DataFrame,
                      qterms: DataFrame, k: Int, scale: Long)
  : DataFrame = {
    val dfTerm = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib =
      expr(s"""(CAST($scale AS DECIMAL(38,0))
              |   * (2*n_docs - 2*df + 1) * 22 * tf * s_tok)
              | div
              | (CAST(2*df + 1 AS DECIMAL(38,0))
              |   * (10*s_tok*tf + 3*s_tok + 9*dl*n_docs))"""
        .stripMargin.replace("\n", " "))
    val scored = tf
      .join(broadcast(dfTerm), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), "term")
      .select(col("query_id"), col("doc_id"), contrib.as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    scored.select(col("query_id"), row_number().over(w)
        .cast("long").as("rnk"), col("doc_id"), col("score"))
      .where(col("rnk") <= k)
  }

  /** One-shot scan-and-score (no stored index). Unlike
    * [[bm25Serve]]-after-[[bm25Index]], the corpus token stream is
    * semi-joined to the query vocabulary BEFORE the tf aggregation, so
    * the big shuffle carries matching terms only — the right plan when
    * no index will be reused.
    *
    * @param docs    corpus (idCol, textCol)
    * @param queries (query_id, term) — small, broadcastable
    * @param k       results per query
    * @return (query_id, rnk, doc_id, score) — rnk 1..k by
    *         (score desc, doc_id asc), score = Σ per-term floored
    *         contributions at `scale`
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, k: Int,
               scale: Long = 1000000L): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // 1-row corpus stats: the scalar-broadcast crossJoin convention
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("s_tok"))
    val qterms = queries.select(col("query_id"), col("term")).distinct()
    val qvocab = qterms.select("term").distinct()
    val tf = tok.join(broadcast(qvocab), Seq("term"), "left_semi")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    scoreTf(tf, dl, stats, qterms, k, scale)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) —
    * the hybrid-search combiner: given several rank lists over the same
    * (query_id, doc_id) space (e.g. sparse BM25 and dense ANN), the
    * fused score of a doc is Σ_lists ⌊scale / (kRrf + rank)⌋, summed
    * over the lists that returned it (absence contributes 0 — the
    * standard convention). Because ranks are small integers and the
    * per-list contribution is a FLOORED scaled integer, the fused
    * ordering is bit-stable on any engine — RRF's whole point is that
    * it consumes ranks, not incomparable raw scores, so no score
    * normalization pass exists to drift.
    *
    * Scale: each input list is already top-k per query (bounded:
    * queries × k rows), so the union + two-level aggregate is
    * trivially small next to the retrieval that produced the lists;
    * the final per-query top-k is a window over ≤ lists·k rows per
    * query.
    *
    * @param lists  rank lists, each with (query_id, doc_id, rnk) —
    *               rnk 1-based within its list
    * @param k      fused results per query
    * @return (query_id, rnk, doc_id, score, n_lists) — rnk 1..k by
    *         (score desc, n_lists desc, doc_id asc)
    */
  def rrfFuse(lists: Seq[DataFrame], k: Int, kRrf: Int = 60,
              scale: Long = 1000000L): DataFrame = {
    require(lists.nonEmpty, "need at least one rank list")
    val all = lists.map(_.select(col("query_id"), col("doc_id"),
        col("rnk").cast("long").as("rnk")))
      .reduce(_ unionByName _)
    val scored = all
      .select(col("query_id"), col("doc_id"),
        call_function("div", lit(scale), lit(kRrf.toLong) + col("rnk"))
          .as("contrib"))
      .groupBy("query_id", "doc_id")
      .agg(sum("contrib").as("score"), count(lit(1)).as("n_lists"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("n_lists").desc, col("doc_id").asc)
    scored.select(col("query_id"),
        row_number().over(w).cast("long").as("rnk"),
        col("doc_id"), col("score"), col("n_lists"))
      .where(col("rnk") <= k)
  }

  /** Boolean-AND relevance judgments: (query_id, doc_id) pairs where
    * the document contains EVERY term of the query — the deterministic
    * qrels a retrieval stack can self-audit against when no human
    * judgments exist (conjunctive containment is the strictest lexical
    * ground truth, so ranking errors against it are real errors).
    * Shape: the token stream distincts to (doc, term), semi-joins the
    * broadcast query vocabulary BEFORE the shuffle (the bm25TopK rule),
    * and a doc is relevant when its matched-term count equals the
    * query's term count (a broadcast k-row frame). */
  def booleanQrels(docs: DataFrame, idCol: String, textCol: String,
                   queries: DataFrame): DataFrame = {
    val qterms = queries.select(col("query_id"), col("term")).distinct()
    val qn = qterms.groupBy("query_id").agg(count(lit(1)).as("__nq"))
    val dt = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
      .join(broadcast(qterms.select("term").distinct()),
        Seq("term"), "left_semi")
      .distinct()
    dt.join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("__hit"))
      .join(broadcast(qn), "query_id")
      .where(col("__hit") === col("__nq"))
      .select("query_id", "doc_id")
  }

  /** Ranked-retrieval quality metrics per query, exact integers — the
    * eval gate a retrieval pipeline runs on every index or scorer
    * change: total relevant count, hits in the returned top-k, and MRR
    * scaled by `mrrScale` (default 2520 = lcm(1..10), so scale/rank is
    * EXACT integer division for any k ≤ 10 — no float reciprocal ever
    * forms). Queries with no relevant result in the list score 0.
    *
    * Both inputs are query-bounded (top-k lists and judgments), so
    * every join here is broadcast-sized next to the retrieval that
    * produced them.
    *
    * @param ranked (query_id, rnk, doc_id) — 1-based rnk within query
    * @param qrels  (query_id, doc_id) relevant pairs
    * @return (query_id, n_rel, hits, mrr_scaled) per query in `ranked` */
  def topKEval(ranked: DataFrame, qrels: DataFrame,
               mrrScale: Long = 2520L): DataFrame = {
    // defensive dedup (the jaccardLinks convention): duplicate qrel
    // pairs would double-count n_rel AND duplicate ranked rows through
    // the left join — silently wrong recall/MRR, not an error
    val rel = qrels.select(col("query_id"), col("doc_id")).distinct()
      .withColumn("__rel", lit(1L))
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hits = ranked
      .join(rel, Seq("query_id", "doc_id"), "left")
      .groupBy("query_id")
      .agg(sum(coalesce(col("__rel"), lit(0L))).as("hits"),
        min(when(col("__rel").isNotNull, col("rnk"))).as("__first"))
    hits.join(nRel, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("hits"),
        when(col("__first").isNotNull,
          call_function("div", lit(mrrScale), col("__first")))
          .otherwise(lit(0L)).as("mrr_scaled"))
  }

  /** Average Precision per query, exact integers — the MAP half of the
    * retrieval eval gate next to [[topKEval]]'s MRR: AP = (1/R)·Σ_{hit
    * at rank r} P@r, emitted as the scaled numerator ap_num =
    * Σ_{hit at r} (scale·h_r) div r with h_r = hits within the top r.
    * `scale` = 2520 = lcm(1..10) makes the division EXACT for any
    * r ≤ 10, so ap_num is a true integer rational — AP itself is
    * ap_num / (scale·n_rel), formed downstream; no float leaves the
    * engine. Queries with no hit score 0.
    *
    * Shape: the cumulative-hit window is per (query, ≤ k rows) — the
    * inputs are query-bounded top-k lists, broadcast-sized next to the
    * retrieval that produced them.
    *
    * @param ranked (query_id, rnk, doc_id) — 1-based rnk, rnk ≤ 10
    *               for the default scale
    * @param qrels  (query_id, doc_id) relevant pairs
    * @return (query_id, n_rel, ap_num) per query in `ranked` */
  def apEval(ranked: DataFrame, qrels: DataFrame,
             scale: Long = 2520L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // defensive dedup: duplicate qrel pairs would double-count n_rel
    // and, worse, duplicate ranked rows through the left join —
    // inflating the cumulative-hit window and ap_num silently
    val rel = qrels.select(col("query_id"), col("doc_id")).distinct()
      .withColumn("__rel", lit(1L))
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val w = Window.partitionBy("query_id").orderBy(col("rnk").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("__h", sum(coalesce(col("__rel"), lit(0L))).over(w))
      .groupBy("query_id")
      .agg(sum(when(col("__rel").isNotNull,
          call_function("div", lit(scale) * col("__h"), col("rnk")))
        .otherwise(lit(0L))).as("ap_num"))
      .join(nRel, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"), col("ap_num"))
  }

  /** Expected Reciprocal Rank per query, exact integers (Chapelle et
    * al. 2009, CIKM — the cascade-model metric next to MRR/MAP): with
    * binary relevance the stop probability at a relevant rank is
    * R = 1/2, so ERR = Σ_{hit at rank r} (1/r)·(1/2)^{h_r} with h_r =
    * hits within the top r (the (1/2)^{h_r−1} survival mass times the
    * R = 1/2 stop). Every term has denominator r·2^{h_r} ≤ 10·2¹⁰, so
    * `scale` = lcm(1..10)·2¹⁰ = 2 580 480 makes each division exact —
    * err_num is a true integer rational and ERR = err_num/scale forms
    * downstream; no float leaves the engine. Same cumulative-hit
    * window shape (query-bounded top-k lists) as [[apEval]].
    *
    * @param ranked (query_id, rnk, doc_id) — 1-based rnk, rnk ≤ 10 and
    *               ≤ 10 relevant hits per list for the default scale
    * @param qrels  (query_id, doc_id) relevant pairs
    * @return (query_id, n_rel, err_num) per query in `ranked` */
  def errEval(ranked: DataFrame, qrels: DataFrame,
              scale: Long = 2580480L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rel = qrels.select(col("query_id"), col("doc_id")).distinct()
      .withColumn("__rel", lit(1L))
    val nRel = rel.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val w = Window.partitionBy("query_id").orderBy(col("rnk").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked
      .join(rel, Seq("query_id", "doc_id"), "left")
      .withColumn("__h", sum(coalesce(col("__rel"), lit(0L))).over(w))
      .groupBy("query_id")
      .agg(sum(when(col("__rel").isNotNull,
          call_function("div", lit(scale),
            col("rnk") * call_function("shiftleft", lit(1L),
              col("__h").cast("int"))))
        .otherwise(lit(0L))).as("err_num"))
      .join(nRel, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"), col("err_num"))
  }

  /** Vocabulary-growth (Heaps' law) measurement: distinct-term count
    * and cumulative token count at each corpus-prefix checkpoint —
    * the curve that sizes a tokenizer's vocabulary budget before
    * training it. One pass: each term contributes only its FIRST doc
    * (min doc id), so a checkpoint's vocabulary is a count of terms
    * with first-doc ≤ c — never a per-prefix distinct. Checkpoints are
    * a broadcast literal; both joins are range conditions against
    * aggregated (term-level / doc-level) frames, not the token stream.
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
                  checkpoints: Seq[Long]): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .where(col("term") =!= "")
    val first = tok.groupBy("term").agg(min("doc_id").as("fd"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val cps = docs.sparkSession
      .range(0, checkpoints.size).select(
        element_at(lit(checkpoints.toArray),
          (col("id") + 1).cast("int")).as("c"))
    val vocab = first.join(broadcast(cps), col("fd") <= col("c"))
      .groupBy("c").agg(count(lit(1)).as("vocab"))
    val toks = dl.join(broadcast(cps), col("doc_id") <= col("c"))
      .groupBy("c").agg(sum("dl").as("tokens"))
    vocab.join(toks, "c").select("c", "vocab", "tokens")
  }
}
