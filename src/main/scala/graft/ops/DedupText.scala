package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps

/** Near-duplicate detection family for training-data pipelines: exact,
  * n-gram Jaccard (inverted index), MinHash+LSH, SimHash.
  *
  * Scale design (100 TB): every variant is expressed as
  * shingle-explode → shuffle-on-small-key → pair aggregation. No driver
  * materialization, no cross join of the full corpus. The LSH variants
  * bound candidate pairs by banding; the exact-Jaccard verifier only runs
  * on candidate pairs.
  */
object DedupText {

  /** Exact dedup: one representative (min id) per identical payload.
    * Hash-groupBy on a 64-bit fingerprint (shuffle carries 8-byte keys +
    * payload only for collision safety). */
  def exact(df: DataFrame, payload: String, idCol: String): DataFrame =
    Dedup.exactByPayload(df, payload, idCol)

  /** Inverted-index n-gram Jaccard: for each doc in `probes` (a small,
    * deterministic subset), find all same-`lang` docs sharing ≥1 shingle
    * and report exact intersection/union sizes as integers.
    * At scale the probe side is whatever slice is being reconciled; the
    * join key is the shingle string (short), and Catalyst plans a
    * shuffle-hash join on it. */
  def jaccardPairs(docs0: DataFrame, probePredicate: Column, n: Int = 3)
  : DataFrame = {
    val docs = Par.fanOut(docs0)
    val shCol = TextOps.shingles(col("text"), n)
    // corpus exploded ONCE; probe side explodes only the (tiny) probe
    // subset; per-doc set sizes come from size() with no explode at all
    val corpus = docs.select(col("doc_id").as("b_id"), col("lang"),
      explode(shCol).as("s"))
    val probes = docs.where(probePredicate)
      .select(col("doc_id").as("a_id"), col("lang"), explode(shCol).as("s"))
    val counts = docs.select(col("doc_id"), size(shCol).cast("long").as("n_sh"))
    val inter = probes.join(corpus, Seq("lang", "s"))
      .where(col("a_id") =!= col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    inter
      .join(counts.select(col("doc_id").as("a_id"), col("n_sh").as("na")), "a_id")
      .join(counts.select(col("doc_id").as("b_id"), col("n_sh").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"), col("i"),
        (col("na") + col("nb") - col("i")).as("u"))
  }

  /** MinHash signatures: k permutation-hashes over shingles. Permutation j
    * is `xxhash64(shingle, j)`-min — a distinct 64-bit hash family per j.
    * Returns (idCol, sig: array<bigint>).
    *
    * Shape: shingle-explode → partial-agg k mins → final agg. Each shingle
    * is materialized once and hashed k times (the minhash lower bound);
    * the groupBy gets map-side combine, so the shuffle carries k longs per
    * doc, not shingles. (A single-projection formulation looks simpler but
    * Catalyst's project collapsing re-inlines the shingle array into all k
    * array_min branches — measured 70× slower at sf0.1.) */
  def minhashSignatures(docs: DataFrame, idCol: String, text: String,
                        k: Int = 32, n: Int = 3): DataFrame = {
    val sh = Par.fanOut(docs, col(idCol)).select(col(idCol),
      explode(TextOps.shingles(col(text), n)).as("s"))
    val mins = (0 until k).map(j => min(xxhash64(col("s"), lit(j))).as(s"m$j"))
    sh.groupBy(idCol).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** Cross-engine-exact MinHash: the hash family is k affine transforms of
    * the 32-bit Java string hash (expr/JavaStringHash) with explicit int32
    * wraparound — every value reproducible in DuckDB SQL, so the LSH
    * pipeline built on it is fully oracle-checkable (unlike the
    * xxhash64 family above). h_j(s) = wrap32((2j+1)·javaHash(s) + j).
    */
  def minhashSignaturesExact(docs: DataFrame, idCol: String, text: String,
                             k: Int = 32, n: Int = 3): DataFrame =
    signaturesFromShingles(Par.fanOut(docs, col(idCol)).select(col(idCol),
      explode(TextOps.shingles(col(text), n)).as("s")), idCol, k)

  /** [[minhashSignaturesExact]] over an already-exploded (id, s) shingle
    * frame — lets a pipeline that needs the shingles AGAIN (exact-overlap
    * verification) explode the corpus once and reuse it. */
  def signaturesFromShingles(sh: DataFrame, idCol: String,
                             k: Int = 32): DataFrame = {
    graft.expr.GraftFunctions.register(sh.sparkSession)
    def wrap32(x: Column): Column =
      pmod(x + lit(2147483648L), lit(4294967296L)) - lit(2147483648L)
    val base = sh.withColumn("h",
      graft.expr.GraftFunctions.java_string_hash(col("s")).cast("long"))
    val mins = (0 until k).map(j =>
      min(wrap32(col("h") * (2 * j + 1) + j)).as(s"m$j"))
    base.groupBy(idCol).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** Boilerplate shingle filter: shingles present in more than
    * `maxDocFrac` of all documents (headers, footers, license blocks)
    * carry no dedup signal but make MinHash sketches collide across
    * unrelated docs — the classic LSH degeneracy. Returns the input's
    * exploded (id, shingle) pairs with boilerplate removed; feed to a
    * signature aggregation. Two narrow shuffles: doc-frequency count on
    * the shingle key, then a broadcast-able anti-join of the hot set
    * (by construction at most 1/maxDocFrac DISTINCT shingles can exceed
    * the threshold... per-doc-distinct explode bounds the count). */
  def shinglesFiltered(docs: DataFrame, idCol: String, text: String,
                       n: Int = 3, maxDocFrac: Double = 0.5): DataFrame = {
    // one corpus scan: the exploded pairs are pinned, then reused for the
    // doc-frequency count, the anti-join, and the empty-doc repair
    val sh = Par.fanOut(docs, col(idCol))
      .select(col(idCol), explode(TextOps.shingles(col(text), n)).as("s"))
      .pin()
    // doc count for the threshold: EVERY doc yields ≥ 1 shingle — short
    // docs get the whole-text sentinel, and even a null text maps to the
    // "" sentinel (concat_ws over a null token array), mirrored by
    // DuckDB's [NULL] unnest — so a plain input count equals the exploded
    // frame's distinct doc count without a distinct-shuffle over the
    // exploded pairs. Requires idCol-unique input, which every dedup
    // entry point in this file already assumes (see [[fuzzyDedup]]).
    // The count rides INSIDE the hot-detection job as a broadcast 1-row
    // cross join (column-pruned scan of `docs`, zero columns read from
    // parquet) instead of a separate driver action — the fence costs
    // exactly one aggregation over the pinned shingles.
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    // hot-set size is bounded by avgDistinctShinglesPerDoc / maxDocFrac
    // (sum of doc-frequencies ÷ threshold) — usually small, but not tiny
    // on degenerate corpora, so the join strategy is left to the planner.
    // (A Misra-Gries + exact-recount variant — hot shingles are extreme
    // heavy hitters, so Freq.mgCandidates could find them with two
    // shuffle-free scans — was measured SLOWER here: 4.5 s vs 3.6 s
    // median for dd_fuzzy_verified at sf0.1, because the typed
    // mapPartitions pass deserializes every pinned row while the groupBy
    // stays in Tungsten with map-side combine. Same regime analysis as
    // Freq.heavyHitters: MG pays off only when partial aggregation
    // collapses nothing AND the exchange dominates — revisit if a real
    // cluster profile shows this exchange as the bottleneck.)
    val hot = sh.groupBy("s")
      .agg(count(lit(1)).as("df")) // shingles() is per-doc distinct
      .crossJoin(broadcast(nDocs))
      .where(col("df") > (col("n_docs") * maxDocFrac))
      .select("s")
      .pinLazy() // small by the bound above; read 2-3 times below.
                 // LAZY (r14): in the overwhelmingly-common clean-
                 // corpus case the isEmpty probe below is the ONLY
                 // consumer — an eager pin materialized the full hot
                 // aggregation just to find out it was empty; lazy
                 // caches whatever the probe (and any later consumer)
                 // actually computes
    // clean corpus (no shingle above the threshold) — the overwhelmingly
    // common case: the fence is a no-op, so skip the anti-join and the
    // lost-doc repair entirely and hand back the pinned raw explode
    if (hot.isEmpty) return sh
    val kept = sh.join(hot, Seq("s"), "left_anti")
    // a doc whose every shingle was boilerplate must not vanish from the
    // dedup pipeline (all-boilerplate docs are precisely the duplicate-
    // rich class): give it one sentinel shingle derived from its full
    // text, so identical such docs still collide downstream while
    // different ones stay apart
    val lost = sh.select(idCol).distinct()
      .join(kept.select(idCol).distinct(), Seq(idCol), "left_anti")
    kept.unionByName(
        lost.join(docs.select(col(idCol), col(text)), Seq(idCol))
          .select(col(idCol), concat(lit("__bp__"), col(text)).as("s")))
      // contract: the returned frame is ALWAYS pinned (both branches), so
      // multi-pass consumers (fuzzyDedup reads it for signatures AND
      // verification) never re-run the explode or the fence
      .pin()
  }

  /** MinHash over boilerplate-filtered shingles ([[shinglesFiltered]]):
    * the production configuration — without the filter, a boilerplate
    * block shared corpus-wide drives unrelated docs into the same LSH
    * buckets and the candidate join degenerates quadratically. */
  def minhashSignaturesFiltered(docs: DataFrame, idCol: String, text: String,
                                k: Int = 32, n: Int = 3,
                                maxDocFrac: Double = 0.5): DataFrame = {
    val sh = shinglesFiltered(docs, idCol, text, n, maxDocFrac)
    val mins = (0 until k).map(j => min(xxhash64(col("s"), lit(j))).as(s"m$j"))
    sh.groupBy(idCol).agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(j => col(s"m$j")): _*).as("sig"))
  }

  /** LSH banding with the band VALUE (signature slice) as the join key —
    * no band hashing, so candidates are engine-independent. */
  def lshCandidatesExact(signed: DataFrame, idCol: String, bands: Int,
                         rows: Int): DataFrame = {
    val banded = signed.select(col(idCol),
        posexplode(array((0 until bands).map(b =>
          slice(col("sig"), b * rows + 1, rows)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandsig")
    banded.as("l")
      .join(banded.as("r"), Seq("band", "bandsig"))
      .where(col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a_id"), col(s"r.$idCol").as("b_id"))
      .distinct()
  }

  /** Incremental LSH index maintenance: the candidate pairs CONTRIBUTED by
    * a delta batch against an existing signature store — every band
    * collision with at least one endpoint in the delta (delta×base and
    * delta×delta). Base-internal pairs are already in the index and are
    * not recomputed; only the delta was hashed (the base side joins on its
    * STORED signatures). Union with the existing pair set to maintain the
    * full candidate index:
    * `candidates(B ∪ D) = candidates(B) ∪ lshCandidatesDelta(B, D)`
    * (spec-pinned). The join is (base ∪ delta) bands × delta bands on the
    * 16-byte (band, signature-slice) key — at 100 TB the recurring cost is
    * proportional to the DELTA, never the corpus.
    */
  def lshCandidatesDelta(baseSigned: DataFrame, deltaSigned: DataFrame,
                         idCol: String, bands: Int, rows: Int): DataFrame = {
    def banded(df: DataFrame) = df.select(col(idCol),
        posexplode(array((0 until bands).map(b =>
          slice(col("sig"), b * rows + 1, rows)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandsig")
    val all = banded(baseSigned.unionByName(deltaSigned))
    val d = banded(deltaSigned)
    all.as("l").join(d.as("r"), Seq("band", "bandsig"))
      .where(col(s"l.$idCol") =!= col(s"r.$idCol"))
      .select(least(col(s"l.$idCol"), col(s"r.$idCol")).as("a_id"),
        greatest(col(s"l.$idCol"), col(s"r.$idCol")).as("b_id"))
      .distinct()
  }

  /** LSH banding over a MinHash signature: emit (band, bandHash) buckets;
    * docs colliding in ≥1 band are near-dup candidates. bands×rows = k.
    * The candidate join is a self-equi-join on (band, hash) — a shuffle
    * on 16-byte keys, independent of document size. */
  def lshCandidates(signed: DataFrame, idCol: String, bands: Int,
                    rows: Int): DataFrame = {
    val banded = signed.select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bandhash")
    banded.as("l")
      .join(banded.as("r"), Seq("band", "bandhash"))
      .where(col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a_id"), col(s"r.$idCol").as("b_id"))
      .distinct()
  }

  /** Benchmark decontamination: per corpus document, the number of
    * distinct n-gram shingles it shares with ANY document of a benchmark
    * set — the standard pre-training contamination test (n-gram overlap
    * against eval sets; GPT-3 App. C, The Pile §6.3). Returns
    * (idCol, n_hits) for contaminated documents only; anti-join the
    * corpus against it to decontaminate.
    *
    * Shape: both sides explode to per-doc-distinct shingles; the
    * benchmark side is globally deduped and BROADCAST (an eval set is
    * tiny next to a 100 TB corpus), so the corpus side never shuffles —
    * the probe happens map-side inside the corpus scan stage and only
    * (id, count) partials reach the final aggregation. */
  def contaminationHits(corpus: DataFrame, bench: DataFrame, idCol: String,
                        text: String, n: Int = 3): DataFrame =
    contaminationHitsSet(corpus, benchShingles(bench, text, n), idCol,
      text, n)

  /** The benchmark's globally-distinct shingle set (col `s`) — the
    * persisted sketch artifact of the contamination pipeline: tiny next
    * to the corpus, broadcast into every probe, and the base AGAINST
    * which a later benchmark batch deduplicates its shingles
    * ([[contaminationMergedDelta]]). Null/empty texts are fenced (see
    * [[contaminationHits]]'s sentinel note). */
  def benchShingles(bench: DataFrame, text: String, n: Int = 3)
  : DataFrame =
    bench.where(col(text).isNotNull && length(col(text)) > 0)
      .select(explode(TextOps.shingles(col(text), n)).as("s"))
      .distinct()

  /** [[contaminationHits]] against an EXPLICIT shingle set (col `s`) —
    * the probe half on its own, so a stored [[benchShingles]] frame (or
    * the new-shingles remainder of a benchmark batch) can drive the
    * corpus join without re-deriving the set from raw text. */
  def contaminationHitsSet(corpus: DataFrame, shingleSet: DataFrame,
                           idCol: String, text: String, n: Int = 3)
  : DataFrame = {
    // null/empty text carries no contamination signal, but shingles()'s
    // short-doc branch would map it to the "" sentinel shingle on BOTH
    // sides — flagging every empty corpus doc as contaminated by every
    // empty benchmark doc. Fence them out up front (pushes to the scan).
    val hasText = col(text).isNotNull && length(col(text)) > 0
    val cSh = Par.fanOut(corpus.where(hasText), col(idCol)).select(col(idCol),
      explode(TextOps.shingles(col(text), n)).as("s"))
    cSh.join(broadcast(shingleSet.select(col("s")).distinct()), Seq("s"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
  }

  /** Contamination maintenance under a GROWING benchmark — the
    * merge≡rebuild identity of the decontamination path: per-doc hit
    * counts are ADDITIVE over a partition of the benchmark shingle set,
    *
    *   n_hits(c, B ∪ D) = |sh(c) ∩ sh(B)| + |sh(c) ∩ (sh(D) \ sh(B))|,
    *
    * so when a new eval suite lands, the STORED per-doc counts enter
    * the result verbatim and the corpus probes only the genuinely new
    * shingles (the batch's shingles anti-joined against the stored
    * [[benchShingles]] sketch). At 100 TB the corpus-side probe against
    * the full benchmark set is the entire cost of a rebuild; the delta
    * pass broadcasts |sh(D) \ sh(B)| ≪ |sh(B ∪ D)| and the base×base
    * work never re-runs — the blockedPairsDelta convention on the
    * text-overlap path.
    *
    * @param stored   a [[contaminationHits]]/[[contaminationHitsSet]]
    *                 output for (corpus, base benchmark)
    * @param benchShB the base benchmark's [[benchShingles]] frame
    *                 (pin it — it is referenced by the anti-join here
    *                 AND by whatever built `stored`)
    * @param benchDelta the newly-arrived benchmark documents (raw) */
  def contaminationMergedDelta(corpus: DataFrame, stored: DataFrame,
                               benchShB: DataFrame, benchDelta: DataFrame,
                               idCol: String, text: String, n: Int = 3)
  : DataFrame = {
    val newSh = benchShingles(benchDelta, text, n)
      .join(benchShB.select("s"), Seq("s"), "left_anti")
    stored.select(col(idCol), col("n_hits"))
      .unionByName(contaminationHitsSet(corpus, newSh, idCol, text, n))
      .groupBy(idCol).agg(sum("n_hits").as("n_hits"))
  }

  /** Exact-substring duplicate spans (the exact-match half of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better"):
    * maximal runs of ≥`minWindows` consecutive shared `w`-token windows
    * between two documents. A suffix array is the single-node tool for
    * this; the shuffle-native reformulation is positional window-grams —
    * every length-≥w shared substring is a diagonal run of shared
    * windows, so maximal runs are recovered exactly with one equi-join
    * and one island aggregation.
    *
    * Shape: position-explode windows (NOT distinct — positions matter) →
    * self-equi-join on the window text → group runs along each diagonal
    * (a_pos − b_pos) with the island trick (pos − rank is constant within
    * a consecutive run) → one row per maximal span. Windows shared by
    * more than `maxDf` documents (boilerplate) are dropped before the
    * join — the standard fence that keeps the candidate join linear-ish
    * at corpus scale.
    *
    * Returns (a_id, b_id, a_start, b_start, n_tokens): 1-based start
    * token positions and the exact shared-substring length in tokens
    * (run_windows + w − 1). */
  def substringSpans(docs: DataFrame, idCol: String, text: String,
                     w: Int = 8, minWindows: Int = 1,
                     maxDf: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.register(docs.sparkSession)
    // native Generator (expr/ExplodeWindows): windows stream out one at
    // a time — the higher-order transform+posexplode form materializes
    // the O(m·w)-char window array per document first, which a
    // long-document corpus cannot afford
    val wins = Par.fanOut(docs, col(idCol))
      .select(col(idCol), graft.expr.GraftFunctions.explode_windows(
        TextOps.tokens(col(text)), lit(w)))
      .pin() // reused 3×: df count, both join sides
    // df = 1 windows (the dominant mass of a real corpus — unique text)
    // can only pair a doc with itself, which a_id < b_id discards: keep
    // only 2..maxDf, shrinking the self-join input to the genuinely
    // duplicated window subset
    val rare = wins.groupBy("win")
      .agg(countDistinct(col(idCol)).as("df"))
      .where(col("df").between(2, maxDf)).select("win")
    // the rare-window set scales with the DUPLICATED VOLUME, not with a
    // dimension: at decade scale it is tens of millions of long strings,
    // and letting the planner broadcast it (its post-agg size estimate
    // runs low) builds that table on the driver — measured OOM at the
    // 300k-doc probe point. shuffle_hash pins the scale-correct plan:
    // rare is the per-partition build side, wins streams.
    val kept = wins.join(rare.hint("shuffle_hash"), Seq("win"))
    // the self-join's BOTH sides are the kept windows — they scale with
    // duplicated volume exactly like `rare`, so the same no-broadcast
    // rule applies (at sf0.001 the planner happily broadcasts one side;
    // at the decade point that build is the OOM again)
    val hits = kept.select(col(idCol).as("a_id"), col("pos").as("a_pos"), col("win"))
      .join(kept.select(col(idCol).as("b_id"), col("pos").as("b_pos"), col("win"))
          .hint("shuffle_hash"),
        Seq("win"))
      .where(col("a_id") < col("b_id"))
    // island id: within a diagonal, consecutive a_pos values share
    // (a_pos − row_number); each island is one maximal run
    val diag = col("a_pos") - col("b_pos")
    val seq0 = Window.partitionBy(col("a_id"), col("b_id"), diag)
      .orderBy(col("a_pos"))
    hits.withColumn("isl", col("a_pos") - row_number().over(seq0))
      .groupBy(col("a_id"), col("b_id"), diag.as("d"), col("isl"))
      .agg(min("a_pos").cast("long").as("a_start"),
        min("b_pos").cast("long").as("b_start"),
        (count(lit(1)) + (w - 1)).as("n_tokens"))
      .where(col("n_tokens") >= minWindows + (w - 1))
      .select("a_id", "b_id", "a_start", "b_start", "n_tokens")
  }

  /** MinHash agreement count: the number of signature positions where two
    * sketches match — n_agree/k is the standard unbiased Jaccard
    * estimate. Pure array fold, codegen'd, exact integer output. */
  def sigAgreement(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), _ + _)

  /** Exact shingle intersection/union sizes for an explicit pair list —
    * the verification step of a fuzzy-dedup pipeline (LSH candidates have
    * false positives; production pipelines verify before clustering).
    * `pairs` is (a_id, b_id); returns it with (i, u) appended.
    *
    * Shape: the corpus explodes ONCE into per-doc-distinct shingles; the
    * pair list joins in twice on doc id — intersection size is a count
    * over matched shingle rows, union = na + nb − i. Candidate pairs are
    * a vanishing fraction of the corpus, so both joins are dim-sized. */
  def pairShingleOverlap(docs: DataFrame, idCol: String, text: String,
                         pairs: DataFrame, n: Int = 3): DataFrame =
    pairShingleOverlapFrom(
      Par.fanOut(docs, col(idCol)).select(col(idCol),
          explode(TextOps.shingles(col(text), n)).as("s"))
        .pin(), // reused: both probe sides + per-doc counts
      idCol, pairs)

  /** [[pairShingleOverlap]] over an already-exploded — and, if reused,
    * already-pinned — (id, s) shingle frame. */
  def pairShingleOverlapFrom(shAll: DataFrame, idCol: String,
                             pairs: DataFrame): DataFrame = {
    val counts = shAll.groupBy(idCol).agg(count(lit(1)).as("n_sh"))
    val inter = pairs
      .join(shAll.select(col(idCol).as("a_id"), col("s")), Seq("a_id"))
      .join(shAll.select(col(idCol).as("b_id"), col("s")), Seq("b_id", "s"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
    pairs
      .join(inter, Seq("a_id", "b_id"), "left")
      .join(counts.select(col(idCol).as("a_id"), col("n_sh").as("na")), "a_id")
      .join(counts.select(col(idCol).as("b_id"), col("n_sh").as("nb")), "b_id")
      .select(col("a_id"), col("b_id"),
        coalesce(col("i"), lit(0L)).as("i"),
        (col("na") + col("nb") - coalesce(col("i"), lit(0L))).as("u"))
  }

  /** Full fuzzy-dedup pipeline, verified: boilerplate fence → MinHash
    * signatures → LSH candidate pairs → exact-Jaccard verification (keep
    * pairs with J ≥ num/den, integer cross-multiplied — no floats) →
    * connected components → (id, cluster, is_canonical). This is the
    * production composition: the fence keeps corpus-wide shared blocks
    * out of the sketch (without it a shared header/footer drives
    * unrelated docs into the same LSH buckets and the (band, sig)
    * self-join degenerates quadratically — pinned by the
    * `fuzzyDedup boilerplate fence` spec), LSH bounds the pair space,
    * verification removes its false positives, clustering makes
    * keep/drop decisions transitive.
    *
    * `idCol` MUST be unique per row (every dedup entry point in this file
    * assumes it): the boilerplate fence derives its document count from a
    * plain input count, so duplicate ids silently raise the hot-shingle
    * threshold (and every downstream pair/cluster key would be ambiguous
    * anyway).
    *
    * @param maxDocFrac boilerplate threshold ([[shinglesFiltered]]):
    *                   shingles in more than this fraction of documents
    *                   are dropped from BOTH the sketch and the Jaccard
    *                   verification (similarity should measure the
    *                   informative content, not the shared template).
    *                   ≥ 1.0 disables the fence. */
  def fuzzyDedup(docs: DataFrame, idCol: String, text: String,
                 bands: Int = 8, rows: Int = 4, n: Int = 3,
                 num: Int = 2, den: Int = 3,
                 maxDocFrac: Double = 0.5): DataFrame = {
    // the corpus explodes into shingles exactly ONCE (inside the fence,
    // which returns a pinned frame — re-checkpointing it here would pay a
    // full duplicate materialization pass): the pinned frame feeds both
    // the signature aggregation and the exact-overlap verification
    val shAll = if (maxDocFrac < 1.0)
        shinglesFiltered(docs, idCol, text, n, maxDocFrac)
      else Par.fanOut(docs, col(idCol)).select(col(idCol),
        explode(TextOps.shingles(col(text), n)).as("s"))
        .pin()
    val signed = signaturesFromShingles(shAll, idCol, bands * rows)
    val cand = lshCandidatesExact(signed, idCol, bands, rows)
    val verified = pairShingleOverlapFrom(shAll, idCol, cand)
      .where(col("i") * den >= col("u") * num)
      .select("a_id", "b_id")
    Cluster.connectedComponents(docs.select(idCol), idCol,
      verified, "a_id", "b_id", edgesCovered = true)
  }

  /** Cross-engine-exact 32-bit SimHash on the Java-hash family (same
    * rationale as [[minhashSignaturesExact]]): per bit b, vote = Σ ±1 over
    * token-hash bit b across ALL tokens (with multiplicity); fingerprint
    * bit b = vote > 0. Shape: token-explode → 32 partial-agg votes →
    * fingerprint fold — one narrow shuffle of 32 longs per doc. */
  def simhashExact32(docs: DataFrame, idCol: String, text: String): DataFrame = {
    graft.expr.GraftFunctions.register(docs.sparkSession)
    val tok = Par.fanOut(docs, col(idCol)).select(col(idCol),
      explode(TextOps.tokens(col(text))).as("w"))
    // unsigned 32-bit view of the Java hash so bit extraction is sign-free
    val hu = graft.expr.GraftFunctions.java_hash_u32(col("w"))
    val votes = (0 until 32).map(b =>
      sum(when(shiftright(hu, b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"v$b"))
    val agged = tok.groupBy(idCol).agg(votes.head, votes.tail: _*)
    val fp = (0 until 32).map(b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    agged.select(col(idCol), fp.as("fp"))
  }

  /** SimHash: 64-bit sign-aggregated token-hash fingerprint; near-dups
    * have small Hamming distance. Pure column expressions (per bit b:
    * vote = Σ ±1 over token-hash bit b; result bit b = vote > 0). */
  def simhash(text: Column): Column =
    // hash array bound once (TextOps.bind): the 64-bit fold below reads
    // it once per BIT — inlined, the corpus would re-tokenize and re-hash
    // every document 64 times
    TextOps.bind(transform(TextOps.tokens(text), w => xxhash64(w))) { hashes =>
      simhashFold(hashes)
    }

  private def simhashFold(hashes: Column): Column = {
    aggregate(sequence(lit(0), lit(63)), lit(0L), (acc, b) => {
      val vote = aggregate(hashes, lit(0L), (a2, h) =>
        a2 + when(call_function("bit_get", h, b) === 1, lit(1L))
          .otherwise(lit(-1L)))
      acc.bitwiseOR(
        when(vote > 0, call_function("shiftleft", lit(1L), b))
          .otherwise(lit(0L)))
    })
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing-based near-dup candidates: documents sharing at least
    * `minShared` distinct winnow fingerprint hashes
    * ([[TextOps.winnowFingerprints]]). Winnowing's guarantee makes this
    * the LOCAL complement of MinHash-LSH: any shared token run of
    * w+k−1 forces a shared fingerprint, so long verbatim overlaps are
    * caught deterministically, where MinHash-LSH only catches globally
    * similar documents probabilistically.
    *
    * Scale contract (the same as LSH banding): the candidate join keys
    * on the fingerprint HASH, so pair space is Σ_h df(h)² — bounded by
    * `maxDocFreq`, which drops hashes appearing in more documents (a
    * corpus-wide boilerplate gram would otherwise pair everything with
    * everything; same fence as [[shinglesFiltered]]). Dropping hot
    * hashes only loses BOILERPLATE evidence; document pairs sharing
    * rarer content keep their counts.
    *
    * @return (a_id, b_id, n_shared) with a_id < b_id, n_shared =
    *         distinct shared fingerprint hashes (post-fence)
    */
  def winnowPairs(docs: DataFrame, idCol: String, text: String,
                  k: Int = 3, w: Int = 4, minShared: Int = 2,
                  maxDocFreq: Int = 50): DataFrame = {
    require(minShared >= 1, "need minShared >= 1")
    winnowPairCounts(winnowIndex(docs, idCol, text, k, w), maxDocFreq)
      .where(col("n_shared") >= minShared)
  }

  /** The stored half of the winnow state: distinct (id, h) fingerprint
    * rows — the same hash selected at several positions of one doc must
    * count once toward sharing. This is what production PERSISTS between
    * ingestion waves; [[winnowPairsDelta]] folds a delta batch against
    * it without re-fingerprinting the corpus. */
  def winnowIndex(docs: DataFrame, idCol: String, text: String,
                  k: Int = 3, w: Int = 4): DataFrame =
    TextOps.winnowFingerprints(docs, idCol, text, k, w)
      .select(col(idCol).as("id"), col("h"))
      .distinct()
      .pin() // referenced by the df aggregate AND the fence join

  /** UNfiltered shared-fingerprint pair counts over the df-fenced index
    * (every pair with >= 1 shared rare hash) — the second stored half of
    * the incremental state: the minShared cut must happen at READ time,
    * because a stored pre-filtered table could never raise a pair back
    * over the threshold when a later delta adds shared hashes. Bounded
    * by Σ_h df(h)² under the fence, same as the one-shot form. */
  def winnowPairCounts(dh: DataFrame, maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 2, "need maxDocFreq >= 2")
    val rare = dh.groupBy("h").agg(count(lit(1)).as("df"))
      .where(col("df") <= maxDocFreq)
      .select("h")
    // pinned: the candidate join references the fenced set on BOTH
    // sides — left lazy, fingerprinting + dedup + fence run twice
    val fenced = dh.join(rare, Seq("h"), "left_semi")
      .pin()
    val a = fenced.select(col("h"), col("id").as("a_id"))
    val b = fenced.select(col("h"), col("id").as("b_id"))
    a.join(b, Seq("h"))
      .where(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_shared"))
  }

  /** Incremental winnow-pair maintenance — the LOCAL-dedup complement of
    * [[lshCandidatesDelta]], with one honest extra: a df FENCE is not
    * compositional under naive union. A delta batch can push a hash OVER
    * `maxDocFreq`, which must RETRACT that hash's contribution from
    * existing base-base pairs (df only grows, so hot hashes never come
    * back). So the delta fold is an add/retract count algebra over the
    * stored state (`baseIndex` = [[winnowIndex]](B), `basePairs` =
    * [[winnowPairCounts]](B)):
    *
    *  - additions: on hashes still rare in B ∪ D, pairs with >= 1 delta
    *    endpoint (base×delta once per hash + delta×delta once per hash);
    *  - retractions: on hashes rare in B but hot in B ∪ D, −1 per
    *    base-base pair that shared them;
    *  - result: basePairs ⊎ delta counts, zero/negative totals dropped.
    *
    * Identity (spec-pinned):
    * `winnowPairCounts(index(B ∪ D)) = winnowPairsDelta(state(B), D)`
    * exactly — counts included. Requires base and delta id sets disjoint
    * (a delta batch is NEW documents; re-ingested docs must be retracted
    * upstream first).
    *
    * 100 TB: only the DELTA is fingerprinted; every per-hash
    * contribution is bounded by maxDocFreq² on both the add side (h
    * rare in the union) and the retract side (h was rare in B), so the
    * recurring cost is proportional to the delta and the fence cap,
    * never the corpus. The base df aggregate runs over the stored
    * 16-byte index rows (production would persist the df table too and
    * merge `df += df_delta`).
    *
    * @return (a_id, b_id, n_shared >= 1) — the maintained UNfiltered
    *         pair table; apply the minShared cut at read, as
    *         [[winnowPairs]] does
    */
  def winnowPairsDelta(baseIndex: DataFrame, basePairs: DataFrame,
                       deltaDocs: DataFrame, idCol: String, text: String,
                       k: Int = 3, w: Int = 4,
                       maxDocFreq: Int = 50): DataFrame = {
    require(maxDocFreq >= 2, "need maxDocFreq >= 2")
    val dhD = winnowIndex(deltaDocs, idCol, text, k, w)
    val dfB = baseIndex.groupBy("h").agg(count(lit(1)).as("df_b"))
    val dfD = dhD.groupBy("h").agg(count(lit(1)).as("df_d"))
    // union df per hash; pinned — referenced by both hash classes below
    val dfU = dfB.join(dfD, Seq("h"), "full_outer")
      .select(col("h"),
        coalesce(col("df_b"), lit(0L)).as("df_b"),
        (coalesce(col("df_b"), lit(0L)) + coalesce(col("df_d"), lit(0L)))
          .as("df_u"))
      .pin()
    val stillRare = dfU.where(col("df_u") <= maxDocFreq).select("h")
    val newlyHot = dfU
      .where(col("df_b") <= maxDocFreq && col("df_u") > maxDocFreq)
      .select("h")
    val baseRare = baseIndex.join(stillRare, Seq("h"), "left_semi")
    val deltaRare = dhD.join(stillRare, Seq("h"), "left_semi")
    // base×delta: ids are disjoint, so canonicalize with least/greatest;
    // delta×delta: a_id < b_id directly — each unordered pair counted
    // exactly once per shared hash
    val addBD = baseRare.select(col("h"), col("id").as("x"))
      .join(deltaRare.select(col("h"), col("id").as("y")), Seq("h"))
      .select(least(col("x"), col("y")).as("a_id"),
        greatest(col("x"), col("y")).as("b_id"), lit(1L).as("dn"))
    val addDD = deltaRare.select(col("h"), col("id").as("a_id"))
      .join(deltaRare.select(col("h"), col("id").as("b_id")), Seq("h"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(1L).as("dn"))
    val hotB = baseIndex.join(newlyHot, Seq("h"), "left_semi")
    val retract = hotB.select(col("h"), col("id").as("a_id"))
      .join(hotB.select(col("h"), col("id").as("b_id")), Seq("h"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), lit(-1L).as("dn"))
    val dn = addBD.unionByName(addDD).unionByName(retract)
      .groupBy("a_id", "b_id").agg(sum(col("dn")).as("dn"))
    basePairs.join(dn, Seq("a_id", "b_id"), "full_outer")
      .select(col("a_id"), col("b_id"),
        (coalesce(col("n_shared"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_shared"))
      .where(col("n_shared") >= 1L)
  }

  /** Prefix-filtered EXACT set-similarity join (SSJoin/PPJoin family —
    * Chaudhuri et al. ICDE 2006, Bayardo et al. WWW 2007, Xiao et al.
    * WWW 2008): every document pair whose word-SET Jaccard is ≥
    * tauNum/tauDen, with NO false negatives — the deterministic
    * complement of MinHash-LSH (probabilistic recall) and winnowing
    * (verbatim-overlap recall). The candidate generator is the prefix
    * filtering lemma: order the token universe globally by (df asc,
    * token asc) — rarest first — and keep each doc's first
    * m − ⌈τ·m⌉ + 1 tokens; any pair with J ≥ τ must share ≥ ⌈τ·max(ma,
    * mb)⌉ tokens, so their prefixes must intersect. Pair space is
    * Σ_t df_prefix(t)² over PREFIX occurrences only — and prefix
    * tokens are by construction each doc's rarest, which is the whole
    * economics of the method. Candidates verify by exact intersection
    * count; the final test is the cross-multiplied integer
    * `(tauDen+tauNum)·i ≥ tauNum·(ma+mb)` — no float ever decides.
    *
    * Per-doc prefix selection is a doc-keyed window (never a global
    * rank); the global order is carried by the (df, token) pair
    * itself. Corpora dominated by huge EXACT-duplicate classes should
    * exact-dedup first (each class multiplies prefix df) — the funnel
    * order already does.
    *
    * THE SET UNIVERSE MATTERS: with `n = 1` the sets are word sets —
    * right for short records, but on template-generated or
    * small-vocabulary corpora the "rarest word" of a doc can still be
    * corpus-hot and the prefix space degenerates (measured here:
    * 16.2M candidate pairs at sf0.1 with max prefix-df 4165). With
    * `n ≥ 2` the sets are word n-gram shingles ([[TextOps.shingles]],
    * the dd_minhash universe): the element space is combinatorially
    * larger, prefix df collapses (23K pairs, max df 7 on the same
    * corpus), and the Jaccard itself is the standard near-dup
    * measure. Prefer shingles for document dedup; the lemma and the
    * exactness guarantee are token-universe-independent.
    *
    * @return (a_id, b_id, n_inter, n_union) with a_id < b_id, J ≥ τ
    */
  def prefixJaccardJoin(docs: DataFrame, idCol: String, text: String,
                        tauNum: Int, tauDen: Int, n: Int = 1)
  : DataFrame = {
    require(tauNum > 0 && tauNum <= tauDen,
      s"need 0 < tauNum <= tauDen, got $tauNum/$tauDen")
    require(n >= 1, s"need n >= 1, got $n")
    val raw =
      if (n == 1)
        docs.select(col(idCol).as("id"),
            explode(split(col(text), " ")).as("tok"))
          .where(col("tok") =!= "").distinct()
      else // shingles() is already per-doc distinct
        docs.select(col(idCol).as("id"),
          explode(TextOps.shingles(col(text), n)).as("tok"))
    val tok = raw
      .pin() // feeds df agg, prefix window AND both verify arms
    val sizes = tok.groupBy("id").agg(count(lit(1)).as("m"))
    val dfTok = tok.groupBy("tok").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy("id")
      .orderBy(col("df").asc, col("tok").asc)
    val pref = tok.join(dfTok, "tok").join(sizes, "id")
      .withColumn("__r", row_number().over(wDoc))
      .withColumn("__plen", col("m") + lit(1L) -
        call_function("div",
          lit(tauNum.toLong) * col("m") + lit(tauDen.toLong - 1),
          lit(tauDen.toLong)))
      .where(col("__r") <= col("__plen"))
      .select(col("id"), col("tok"), col("m"))
      // both sides of the candidate self-join reference the prefix
      // frame: pin it so the df join + per-doc window run once
      .pin()
    val cand = pref.as("pa")
      .join(pref.as("pb"), col("pa.tok") === col("pb.tok") &&
        col("pa.id") < col("pb.id"))
      // size filter: J >= tau forces min(ma,mb) >= tau*max(ma,mb)
      .where(lit(tauDen.toLong) * least(col("pa.m"), col("pb.m")) >=
        lit(tauNum.toLong) * greatest(col("pa.m"), col("pb.m")))
      .select(col("pa.id").as("a_id"), col("pb.id").as("b_id"),
        col("pa.m").as("ma"), col("pb.m").as("mb"))
      .distinct()
    // verify arm: per-pair set intersection on COLLECTED token arrays —
    // the r14 sf10 leg measured the previous token-level expansion
    // (cand ⋈ tok on a_id, Σ_pairs m_a rows — 1.8e9 intermediate rows
    // at 12M candidates × ~150 shingles) at 23× wall for 10× data from
    // shuffle pressure alone. Shipping each candidate pair ONCE with
    // both token sets and intersecting in-row (codegen'd
    // array_intersect over per-doc-distinct sets — exact count) keeps
    // the verify stage at O(candidates) rows; the arrays ride two
    // id-keyed equi-joins, never a broadcast of the corpus. The sets
    // frame is PINNED: it feeds both join sides, and unpinned the
    // 28M-row collect_list aggregate re-ran once per side (the r14
    // stage profile measured the recomputation at ~2/3 of the whole
    // verify arm).
    // token sets ride SORTED so the per-pair intersection count is one
    // codegen'd two-pointer merge (sorted_inter_count) instead of
    // size(array_intersect(...)), which built a hash set AND the
    // intersection array per candidate pair — the dominant per-row cost
    // of this stage (r15; guide §1.2 step 2). Counts are identical on
    // per-doc-distinct sets, property-pinned in Round13Spec.
    graft.expr.GraftFunctions.register(docs.sparkSession)
    val sets = tok.groupBy("id")
      .agg(sort_array(collect_list(col("tok"))).as("ts"))
      .pin()
    // SHUFFLE_HASH, not sort-merge (the dd_substring pin's rationale):
    // under SMJ the second join SORTS the candidate stream by b_id with
    // __ta (the first join's ~2 KB token array) riding every row — a
    // data-sized array copy through the sorter per candidate (measured
    // as the whole verify-stage wall at sf0.1). A shuffled-hash join
    // builds the per-partition doc-set table and streams candidates
    // unsorted; the arrays are only ever READ in place by the
    // intersection count. Build side = the per-partition slice of the
    // doc-set frame — sized by shuffle partitioning, never broadcast.
    val inter = cand
      .join(sets.select(col("id").as("a_id"), col("ts").as("__ta"))
        .hint("SHUFFLE_HASH"), "a_id")
      .join(sets.select(col("id").as("b_id"), col("ts").as("__tb"))
        .hint("SHUFFLE_HASH"), "b_id")
      .select(col("a_id"), col("b_id"), col("ma"), col("mb"),
        graft.expr.GraftFunctions
          .sorted_inter_count(col("__ta"), col("__tb")).as("n_inter"))
      .where(col("n_inter") > 0)
    inter
      .where(lit((tauDen + tauNum).toLong) * col("n_inter") >=
        lit(tauNum.toLong) * (col("ma") + col("mb")))
      .select(col("a_id"), col("b_id"), col("n_inter"),
        (col("ma") + col("mb") - col("n_inter")).as("n_union"))
  }
}
