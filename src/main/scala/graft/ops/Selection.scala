package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps

/** Greedy maximum-coverage selection (Nemhauser–Wolsey–Fisher 1978:
  * the (1−1/e)-approximate greedy for submodular coverage) — the
  * data-selection shape behind "pick k documents that together cover
  * the most vocabulary/topics/behaviors": each round takes the item
  * whose elements add the most NOT-yet-covered mass. The classic
  * curation complement to dedup — dedup removes redundancy pairwise,
  * coverage selection buys diversity globally.
  *
  * Distributed shape per round: one anti-join of the (item, elem)
  * incidence against the covered set (keyed on elem), one count
  * aggregate, and a 1-row argmax — never a per-item set materialization
  * on the driver. The covered set and the incidence are the only big
  * frames, both partitioned on elem; `k` is small by construction
  * (you select a handful, not a corpus), so the unrolled round count
  * is the MMR/Borůvka regime. Rounds stop early (loudly counted in
  * the output) when nothing new can be covered.
  */
object Selection {

  /** @param pairs incidence rows; duplicates tolerated (distinct'd)
    * @return (rnk, item, gain) — rnk 1..≤k in pick order; gain =
    *         newly-covered element count, strictly positive and
    *         non-increasing (submodularity, spec-pinned)
    */
  def greedyMaxCoverage(pairs: DataFrame, itemCol: String,
                        elemCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // the LIVE incidence (uncovered elements only) shrinks
    // monotonically: removing the winner's elements also removes every
    // row of the winner itself, so chosen items can never re-win and
    // no accumulated covered-set or chosen-item anti-join is needed —
    // each round is one count over a strictly smaller frame.
    var live = pairs.select(col(itemCol).as("item"),
        col(elemCol).as("elem"))
      .distinct().pin()
    // The winner is ONE row per round — read it to the driver (the
    // watermark-read convention: ≤ k 1-row reads total, k small by
    // construction) instead of pinning a 1-row frame and re-joining
    // it. The contraction's "winner's elements" probe becomes a
    // FILTER on the live incidence (no join, no broadcast), the
    // per-round winner pin + isEmpty jobs collapse into the argmax
    // read, and the accumulated picks assemble into a k-row local
    // frame at the end. Also: the old loop contracted `live` on the
    // FINAL round too — a data-sized anti-join nobody ever read; the
    // contraction now runs only while another round follows. (r14,
    // guide §1.2. Items must be scalar-typed — they ride a literal.)
    val itemType = live.schema("item").dataType
    // fail at ENTRY, not inside the loop's lit(): the winner rides a
    // literal, which only scalar item types support (ADVICE r14 —
    // struct/array/map items got an opaque in-loop failure)
    require(!itemType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
        && !itemType.isInstanceOf[org.apache.spark.sql.types.StructType]
        && !itemType.isInstanceOf[org.apache.spark.sql.types.MapType],
      s"greedyMaxCoverage: item column '$itemCol' must be scalar-typed " +
        s"(got ${itemType.catalogString}) — the per-round winner rides " +
        "a literal filter")
    val picks =
      scala.collection.mutable.ArrayBuffer.empty[(Long, Any, Long)]
    var r = 1
    var done = false
    while (r <= k && !done) {
      // 1-row argmax by (gain desc, item asc) — a hash aggregate,
      // never a global sort (the label-prop argmax rule)
      val w = live.groupBy("item").agg(count(lit(1)).as("gain"))
        .agg(min(struct((-col("gain")).as("ng"), col("item").as("item")))
          .as("m"))
        .select(col("m.item").as("item"), (-col("m.ng")).as("gain"))
        .head()
      if (w.isNullAt(0)) done = true // nothing uncovered remains
      else {
        picks += ((r.toLong, w.get(0), w.getLong(1)))
        if (r < k) {
          val newCov = live.where(col("item") === lit(w.get(0)))
            .select("elem")
          live = live.join(newCov, Seq("elem"), "left_anti").pin()
        }
      }
      r += 1
    }
    require(picks.nonEmpty,
      "greedyMaxCoverage: empty incidence — nothing to select")
    val s = pairs.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    s.createDataFrame(
      s.sparkContext.parallelize(
        picks.toSeq.map { case (rnk, item, gain) => Row(rnk, item, gain) },
        1),
      StructType(Seq(StructField("rnk", LongType, nullable = false),
        StructField("item", itemType),
        StructField("gain", LongType, nullable = false))))
  }

  /** DSIR — Data Selection with Importance Resampling (Xie et al.,
    * NeurIPS 2023): score every raw document by how target-like its
    * hashed n-gram features are under two bag-of-features models, then
    * keep the highest-importance slice. The published cheap-selection
    * recipe for "make my web crawl look like Wikipedia": importance
    * log-weight log p_target(x) − log p_raw(x) summed over the doc's
    * hashed BIGRAM features (the paper's n-gram choice — on a corpus
    * whose slices share vocabulary, word-order is what separates the
    * target: measured on the fixtures, unigram features leave the
    * en-target means inseparable while bigrams split them by 3-5
    * nats).
    *
    * Engine-exact variant: probabilities are add-1-smoothed bucket
    * frequencies and the log is the integer floor-log₂ of the
    * 2^scalePow-scaled ratio — `ilog2(x) = length(bin(x)) − 1`, exact
    * in both engines (no float ever decides; the resolution loss vs a
    * real log is the documented trade for a hash-stable gate, same as
    * txt_lm_coverage's count-not-perplexity form). Both count tables
    * partial-aggregate map-side to ≤ `buckets` rows and the weight
    * table broadcasts — the corpus is touched by exactly two
    * token-explode passes (count, score), never shuffled on doc_id.
    *
    * Overflow fences (loud, in-plan): (c+1)·2^scalePow and the
    * ilog2 argument's ≥ 1 bound both raise rather than silently wrap
    * — at the default scalePow=40 that admits ~10¹² feature tokens
    * per distribution, and lowering scalePow trades log resolution
    * for headroom at larger corpora.
    *
    * @param isTarget row predicate naming the target slice (its
    *                 complement is NOT the raw side: DSIR's raw
    *                 distribution is the WHOLE corpus, so target docs
    *                 score too and rank naturally high)
    * @return (doc_id, score) for every doc with ≥2 tokens (a doc with
    *         no bigram has no evidence and is excluded) */
  def dsirScores(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: org.apache.spark.sql.Column,
                 buckets: Int, scalePow: Int = 40): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    require(scalePow >= 1 && scalePow <= 62, "need 1 <= scalePow <= 62")
    val hu = graft.expr.GraftFunctions.java_hash_u32 _
    graft.expr.GraftFunctions.register(docs.sparkSession)
    val feats = docs
      .select(col(idCol).as("doc_id"), isTarget.as("tgt"),
        explode(TextOps.bigrams(col(textCol))).as("w"))
      .withColumn("f", pmod(hu(col("w")), lit(buckets.toLong)))
    val counts = feats.groupBy("f")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
    val tot = counts.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val scaleLim = Long.MaxValue >> scalePow
    def ilog2(x: org.apache.spark.sql.Column) =
      (length(bin(x)) - 1).cast("long")
    // smoothed scaled prob p̂ = (c+1)·2^s div (T+buckets); ilog2 needs
    // p̂ >= 1, i.e. T+buckets <= 2^s — both fences raise loudly
    def lg(c: org.apache.spark.sql.Column,
           t: org.apache.spark.sql.Column) = {
      val ok = c < lit(scaleLim) && t + lit(buckets.toLong) <=
        lit(1L << scalePow)
      ilog2(when(ok,
          call_function("div",
            (c + 1L) * lit(1L << scalePow), t + lit(buckets.toLong)))
        .otherwise(raise_error(lit(
          s"dsirScores: counts exceed the 2^$scalePow scale — lower " +
            "scalePow or shard the corpus"))))
    }
    val w = counts.crossJoin(broadcast(tot))
      .select(col("f"),
        (lg(col("ct"), col("tt")) - lg(col("cr"), col("tr"))).as("wf"))
    feats.join(broadcast(w), Seq("f"))
      .groupBy("doc_id").agg(sum("wf").as("score"))
  }
}
