package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for corpus curation. Random-number sampling
  * (`df.sample`) is not reproducible across engines, partitionings, or
  * reruns — at 100 TB a re-run that samples different rows invalidates
  * every downstream artifact. These operators derive the keep/drop
  * decision from a content hash instead, so the sample is a pure function
  * of the data: stable under repartitioning, resumable, and co-sampled
  * across tables that share the key (the property the reference's keyed
  * delta sync relies on for href identity,
  * /root/reference/src/lib/client.js:1480 keyed fetch).
  *
  * Scale: both operators are single-pass. [[hashBernoulli]] is a pure
  * filter (no shuffle, pushes through joins); [[stratifiedFixed]] is one
  * window sort per stratum — the shuffle key is the stratum, so skewed
  * strata AQE-split cleanly.
  */
object Sampling {

  /** Unsigned view of the 32-bit Java string hash of `key` — the engine's
    * cross-checkable hash family (expr/JavaStringHash). */
  private def hu(key: Column): Column =
    graft.expr.GraftFunctions.java_hash_u32(key)

  /** Keep rows where hash(key) mod `m` < `k` — an exact k/m-rate Bernoulli
    * sample, reproducible anywhere the hash is computable. */
  def hashBernoulli(df: DataFrame, key: Column, k: Int, m: Int): DataFrame = {
    require(m > 0 && k >= 0 && k <= m, s"rate $k/$m out of range")
    graft.expr.GraftFunctions.register(df.sparkSession)
    df.where(pmod(hu(key), lit(m.toLong)) < k)
  }

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by ascending (hash(key), key) — a deterministic uniform draw
    * with a total tiebreak so no two engines can disagree. Adds
    * `samp_rank` (1-based, long). */
  def stratifiedFixed(df: DataFrame, strata: Seq[String], key: Column,
                      n: Int): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hu(key).asc, key.asc)
    df.withColumn("samp_rank", row_number().over(w).cast("long"))
      .where(col("samp_rank") <= n)
  }

  /** Weighted multinomial sampling (with replacement) by inverse-CDF
    * lookup — the data-mixing draw a training pipeline runs when
    * examples carry importance weights (DSIR scores, token counts,
    * temperature-scaled source weights): draw `draws` positions
    * u_j ∈ [0, W) deterministically (hash of `salt || j`, so the draw
    * set is a pure function of the salt, reproducible anywhere), and
    * return for each the unique row whose cumulative-weight interval
    * [lo, lo+w) contains u_j.
    *
    * Scale shape — every stage is parallel and shuffle-bounded:
    *   - the exclusive cumulative weight comes from
    *     [[Ranks.globalCumSum]] (P range sorts + a P-row offset frame),
    *     never a single-task global window;
    *   - interval lookup is an EQUI-join, not an interval cross: with
    *     bucket width B = max(w), a row's interval spans ≤ 2 buckets
    *     (`sequence(lo div B, (lo+w-1) div B)` explodes each row into
    *     at most ⌈w/B⌉+1 ≤ 2 bucket rows) and a draw probes exactly
    *     bucket `u div B` — so corpus and draws hash-join on the bucket
    *     key and the containment filter runs within buckets. No
    *     broadcast-nested-loop, no N×M pair space; skew is bounded
    *     because every bucket covers exactly B weight mass.
    *   - W and B ride a broadcast 1-row frame (the scalar-crossJoin
    *     convention); nothing collects to the driver.
    *
    * u_j = hash_u32(salt||j) mod W has the standard ≤ 1/2³²·W modulo
    * bias — negligible for sampling and the price of an engine-exact
    * oracle. Weights must be positive; zero/negative weights raise
    * (a silent skip would shift every later interval).
    *
    * @return (draw_id, u, `idCol`) — one row per draw */
  def inverseCdf(df: DataFrame, idCol: String, weight: Column,
                 draws: Int, salt: String,
                 numRanges: Int = 32): DataFrame = {
    require(draws >= 1, "draws must be >= 1")
    val spark = df.sparkSession
    graft.expr.GraftFunctions.register(spark)
    val wdf = df.select(col(idCol),
      when(weight > 0, weight.cast("long"))
        .otherwise(raise_error(concat(lit("inverseCdf: non-positive "
          + "weight for id "), col(idCol).cast("string"))))
        .as("__w"))
    val cum = Ranks.globalCumSum(wdf, "__w", "__lo", numRanges,
      col(idCol)).pin() // draws + corpus both read it; derive once
    // the draw is a u32 hash, so mass past 2^32 would be silently
    // unsampleable — fence loudly (the modularity-fence convention);
    // pre-scale weights (e.g. div 1024) for larger totals
    val tot = cum.agg(sum(col("__w")).as("__tot"),
      max(col("__w")).as("__b"))
      .select(
        when(col("__tot") < (1L << 32), col("__tot"))
          .otherwise(raise_error(concat(
            lit("inverseCdf: total weight "), col("__tot").cast("string"),
            lit(" >= 2^32 — the u32 draw cannot reach it; " +
              "pre-scale the weights"))))
          .as("__tot"),
        col("__b"))
    val probes = spark.range(draws.toLong)
      .select(col("id").as("draw_id"))
      .crossJoin(broadcast(tot))
      .select(col("draw_id"),
        pmod(hu(concat(lit(salt), col("draw_id"))), col("__tot")).as("u"),
        col("__b"))
    val buckets = cum.crossJoin(broadcast(tot.select("__b")))
      .select(col(idCol), col("__lo"), col("__w"),
        explode(sequence(
          call_function("div", col("__lo"), col("__b")),
          call_function("div", col("__lo") + col("__w") - 1, col("__b"))))
          .as("__bkt"))
    buckets
      .join(broadcast(probes), // draws are query-sized; corpus streams
        call_function("div", col("u"), col("__b")) === col("__bkt") &&
          col("u") >= col("__lo") && col("u") < col("__lo") + col("__w"))
      .select(col("draw_id"), col("u"), col(idCol))
  }

  /** Systematic (equal-interval) weighted sampling: lay `draws` grid
    * points offset + i·step (step = W div draws, offset =
    * hash(salt) mod step) over the cumulative-weight axis and give
    * each row as many hits as grid points land in its interval
    * [lo, lo+w). The classic lower-variance alternative to the
    * multinomial draw ([[inverseCdf]]): one point per equal weight
    * stratum, so a row with w ≥ step is GUARANTEED selection and hit
    * counts never vary by more than 1 from proportionality — the
    * particle-filter / survey-sampling resampler.
    *
    * Even better scale shape than inverseCdf: after the
    * range-partitioned cumulative sum ([[Ranks.globalCumSum]]) the hit
    * count is a pure per-row CODEGEN'D formula —
    * n_hits = min(f(lo+w−1−off), draws) − min(f(lo−1−off), draws),
    * f(x) = (x+step) div step — no join, no explode, no per-draw
    * probe side at all; `draws` can be millions for free. All
    * arguments of the truncating div are ≥ 0 by construction
    * (off < step), so floor ≡ truncate on both engines and the sample
    * is a pure integer function of (salt, data).
    *
    * Weights must be positive (raises, as inverseCdf); draws must not
    * exceed total weight (step would hit 0 — raises loudly in-plan).
    *
    * @return (`idCol`, w, lo, n_hits) for rows with n_hits ≥ 1;
    *         Σ n_hits = draws exactly */
  def systematic(df: DataFrame, idCol: String, weight: Column,
                 draws: Int, salt: String,
                 numRanges: Int = 32): DataFrame = {
    require(draws >= 1, "draws must be >= 1")
    val spark = df.sparkSession
    graft.expr.GraftFunctions.register(spark)
    val wdf = df.select(col(idCol),
      when(weight > 0, weight.cast("long"))
        .otherwise(raise_error(concat(lit("systematic: non-positive "
          + "weight for id "), col(idCol).cast("string"))))
        .as("w"))
    val cum = Ranks.globalCumSum(wdf, "w", "lo", numRanges, col(idCol))
    val tot = cum.agg(sum(col("w")).as("__tot"))
      .select(col("__tot"),
        when(call_function("div", col("__tot"), lit(draws.toLong)) > 0,
          call_function("div", col("__tot"), lit(draws.toLong)))
          .otherwise(raise_error(concat(
            lit(s"systematic: draws = $draws exceeds total weight "),
            col("__tot").cast("string"))))
          .as("__step"))
      .select(col("__step"),
        pmod(hu(lit(salt)), col("__step")).as("__off"))
    def hits(x: Column) = // #grid points ≤ x, capped at the draw count
      least(call_function("div", x + col("__step"), col("__step")),
        lit(draws.toLong))
    cum.crossJoin(broadcast(tot)) // 1-row scalar frame, broadcast
      .withColumn("n_hits",
        hits(col("lo") + col("w") - 1 - col("__off"))
          - hits(col("lo") - 1 - col("__off")))
      .where(col("n_hits") > 0)
      .select(col(idCol), col("w"), col("lo"), col("n_hits"))
  }

  /** The 32-bit integer finalizer (the public-domain
    * `(x>>16 ^ x) * 0x45d9f3b` double round — a murmur3-finalizer
    * variant with constants small enough that every intermediate
    * product fits in a signed 64-bit lane, so the SAME arithmetic runs
    * in Spark codegen and in the SQL oracle). Maps u32 → u32 with full
    * avalanche; pure +, *, %, xor, >> on BIGINT. */
  private[graft] def mix32(x: Column): Column = {
    def round(v: Column): Column =
      (shiftright(v, 16).bitwiseXOR(v) * lit(0x45d9f3bL)) %
        lit(4294967296L)
    val a = round(round(x))
    shiftright(a, 16).bitwiseXOR(a)
  }

  /** Rendezvous (highest-random-weight) shard assignment: each row goes
    * to the shard maximizing score = mix32(h(salt‖key) XOR
    * h(salt‖shard)) — Thaler & Ravishankar's HRW, the
    * consistent-sharding rule training-data exports and distributed
    * caches use. The property that matters: MINIMAL DISRUPTION — adding
    * a shard moves exactly the keys the NEW shard wins (≈ 1/(n+1) of
    * them) and nothing else, because existing shards' scores are
    * untouched (spec-pinned); a mod-N assignment reshuffles nearly
    * everything.
    *
    * Why XOR-then-mix instead of hashing one concatenated string: the
    * 31-polynomial string hash is AFFINE in any contiguous shard
    * substring (h = C + Δshard·31^len(suffix)), so every key ranks the
    * shards in the same per-length order and a handful of shards win
    * everything — the r10 defect. XORing the key hash with the shard
    * hash and running an avalanche finalizer makes every output bit
    * depend on both inputs; the per-shard word is a plan-time Scala
    * constant, so the whole score is one codegen'd integer expression.
    *
    * Pure per-row codegen'd map over a plan-time shard list — no
    * shuffle, no join, no state; the shard directory is configuration,
    * not data. Deterministic anywhere 64-bit integer arithmetic and the
    * 32-bit Java string hash are computable; hash ties go to the
    * lexicographically greatest shard (struct compare).
    *
    * @return input rows + `out` = winning shard id */
  def rendezvousAssign(df: DataFrame, key: Column, shards: Seq[String],
                       salt: String, out: String = "shard"): DataFrame = {
    require(shards.nonEmpty, "rendezvousAssign needs >= 1 shard")
    require(shards.distinct.size == shards.size,
      "rendezvousAssign: duplicate shard ids")
    graft.expr.GraftFunctions.register(df.sparkSession)
    val h1 = hu(concat(lit(salt), key.cast("string")))
    val scored = shards.map { sh =>
      // g is plan-time: the same u32 Java hash, computed driver-side
      val g = (salt + sh).hashCode.toLong & 0xFFFFFFFFL
      struct(mix32(h1.bitwiseXOR(lit(g))).as("h"), lit(sh).as("s"))
    }
    val win =
      if (scored.size == 1) scored.head else greatest(scored: _*)
    df.withColumn(out, win.getField("s"))
  }

  /** Temperature-flattened source mixing at T = 2 (the multilingual /
    * multi-source rebalance: sampling probability ∝ n_s^(1/T) so small
    * sources are upweighted without drowning large ones — the mBERT /
    * XLM-R exponent-smoothing recipe): per-source quotas from integer
    * √n_s weights via LARGEST-REMAINDER apportionment (quotas sum to
    * `total` exactly, deterministic ties by source id), rows chosen per
    * source by ascending (hash(salt‖key), key) — reproducible anywhere.
    *
    * Integer-exact: ⌊√n⌋ from a correctly-rounded double sqrt is exact
    * for n < 2⁵² (fenced loudly); apportionment is pure integer
    * div/mod; selection rank is the stratifiedFixed window (one keyed
    * window per source — the shuffle key is the source, so skewed
    * sources AQE-split).
    *
    * Quota may exceed a source's row count only if weights invert the
    * size order, which √ cannot do — but a short source is still
    * possible at extreme skew, so it raises loudly rather than silently
    * under-filling the mix.
    *
    * @return the selected rows + (w_s, quota) audit columns */
  def temperatureMix(df: DataFrame, groupCol: String, key: Column,
                     total: Long, salt: String): DataFrame = {
    require(total >= 1, "total must be >= 1")
    graft.expr.GraftFunctions.register(df.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(groupCol).agg(count(lit(1)).as("n_s"))
      .select(col(groupCol),
        when(col("n_s") < (1L << 52),
          floor(sqrt(col("n_s").cast("double"))).cast("long"))
          .otherwise(raise_error(lit("temperatureMix: n_s >= 2^52 — "
            + "double sqrt is no longer exact; pre-scale the counts")))
          .as("w_s"), col("n_s"))
    // largest-remainder apportionment over the (small) source frame:
    // the windows are |sources|-row, never data-sized
    val tw = Window.partitionBy()
    val quota = counts
      .withColumn("__wsum", sum(col("w_s")).over(tw))
      .withColumn("__base",
        call_function("div", lit(total) * col("w_s"), col("__wsum")))
      .withColumn("__rem", pmod(lit(total) * col("w_s"), col("__wsum")))
      .withColumn("__extra",
        lit(total) - sum(col("__base")).over(tw))
      .withColumn("__rk", row_number().over(
        Window.orderBy(col("__rem").desc, col(groupCol).asc)))
      .select(col(groupCol), col("w_s"),
        (col("__base") +
          when(col("__rk") <= col("__extra"), 1L).otherwise(0L))
          .as("quota"), col("n_s"))
      .select(col(groupCol), col("w_s"),
        when(col("quota") <= col("n_s"), col("quota"))
          .otherwise(raise_error(concat(
            lit("temperatureMix: quota exceeds source size for "),
            col(groupCol))))
          .as("quota"))
    val w = Window.partitionBy(groupCol)
      .orderBy(hu(concat(lit(salt), key)).asc, key.asc)
    df.withColumn("__rank", row_number().over(w).cast("long"))
      .join(broadcast(quota), Seq(groupCol))
      .where(col("__rank") <= col("quota"))
      .drop("__rank")
  }

  /** Deterministic train/val/test (or any N-way) split assignment:
    * bucket = hash(key) mod m, and each (label, width) slab claims the
    * next `width` buckets in order. A row's split is a pure function of
    * its key — stable across runs, partitionings, and engines — which is
    * the property a training pipeline needs so no example ever migrates
    * between train and eval. Adds a `split` column; zero shuffles (pure
    * projection).
    *
    * A NULL key gets a NULL split (every bucket comparison is null) —
    * such rows belong to NO slab, mirroring shuffleShards' NULL-key
    * contract: they never silently join a real split. Filter or
    * key-coalesce upstream if nulls are invalid input. */
  def hashSplit(df: DataFrame, key: Column,
                slabs: Seq[(String, Int)]): DataFrame = {
    val m = slabs.map(_._2).sum
    require(m > 0 && slabs.forall(_._2 > 0), s"need positive slab widths")
    graft.expr.GraftFunctions.register(df.sparkSession)
    val bucket = pmod(hu(key), lit(m.toLong))
    val cuts = slabs.scanLeft(0L)(_ + _._2).tail // running upper bounds
    val labelled = slabs.zip(cuts).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), hi)) =>
        val cond = bucket < hi
        Some(acc match {
          case None => when(cond, label)
          case Some(c) => c.when(cond, label)
        })
    }.get
    df.withColumn("split", labelled)
  }

  /** Deterministic negative sampling for contrastive training: for each
    * anchor row, `k` pseudo-random "negative" rows drawn from the
    * candidate pool — a pure function of the ids, so the same pairs come
    * out on every run, engine, and partitioning.
    *
    * Scale shape (no global index, no cross join): candidates are
    * bucketed by hash into `buckets` groups; draw j of an anchor targets
    * bucket hash(anchor‖j) and takes the candidate minimizing
    * (hash(cand‖anchor‖j), cand) within it — an equi-join on the bucket
    * id followed by one windowed min per (anchor, j). Each draw scans
    * ~N/buckets candidates; size `buckets` ~ N/1000 at corpus scale.
    * The anchor itself is excluded; a draw landing in an otherwise-empty
    * bucket yields no row, and draws are independent WITH replacement —
    * two draws of one anchor can land on the same bucket and crown the
    * same candidate — so an anchor gets up to `k` rows but possibly
    * fewer distinct negatives (the standard trade for a stateless,
    * deterministic draw; dedupe downstream if distinctness matters).
    *
    * Returns (anchor_id, j, neg_id), j in [0, k). */
  def negativeSamples(df: DataFrame, idCol: String, anchorPred: Column,
                      k: Int, buckets: Int = 64): DataFrame = {
    require(k > 0 && buckets > 0, s"need k > 0 and buckets > 0")
    graft.expr.GraftFunctions.register(df.sparkSession)
    val cand = df.select(col(idCol).cast("long").as("cand_id"))
      .withColumn("b", pmod(hu(col("cand_id").cast("string")), lit(buckets.toLong)))
    val draws = df.where(anchorPred)
      .select(col(idCol).cast("long").as("anchor_id"))
      .select(col("anchor_id"), explode(sequence(lit(0), lit(k - 1))).as("j"))
      .withColumn("b", pmod(
        hu(concat(col("anchor_id"), lit("_"), col("j"))), lit(buckets.toLong)))
    val w = Window.partitionBy("anchor_id", "j")
      .orderBy(hu(concat(col("cand_id"), lit("_"), col("anchor_id"),
        lit("_"), col("j"))).asc, col("cand_id").asc)
    draws.join(cand, Seq("b"))
      .where(col("cand_id") =!= col("anchor_id"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("anchor_id"), col("j").cast("long").as("j"),
        col("cand_id").as("neg_id"))
  }

  /** Weighted mixture sampling: per-group keep rates from a (small)
    * rates table `(groupCol, k, m)` — keep a row iff
    * hash(key) mod m < k for its group's (k, m). The way a training mix
    * is rebalanced across sources/domains at scale: the rates side is a
    * dim table (broadcast join), the corpus side streams — no shuffle of
    * the data, and the draw stays a pure function of the row key. */
  def mixtureByGroup(df: DataFrame, groupCol: String, key: Column,
                     rates: DataFrame): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    // rates columns renamed to reserved names so a corpus that itself has
    // k/m columns neither breaks resolution nor loses its own columns
    val r = rates.select(col(groupCol),
      col("k").cast("long").as("__mix_k"), col("m").cast("long").as("__mix_m"))
    // left join + per-row error on a missing rate: an incomplete (or
    // typo'd) rates table must fail the job, not silently delete whole
    // sources from the training mix
    df.join(org.apache.spark.sql.functions.broadcast(r), Seq(groupCol), "left")
      .where(when(col("__mix_m").isNull,
          raise_error(concat(lit("mixtureByGroup: no rate for group "),
            coalesce(col(groupCol).cast("string"), lit("NULL")))).cast("boolean"))
        .otherwise(pmod(hu(key), col("__mix_m")) < col("__mix_k")))
      .drop("__mix_k", "__mix_m")
  }

  /** Weighted resampling with rates ABOVE 1 allowed — the missing half of
    * [[mixtureByGroup]]'s story (epoch mixing often UPweights small
    * high-quality sources). Each row appears `k div m` times, plus one
    * more when hash(key) mod m < k mod m — exactly k/m expected copies,
    * deterministic per key, downsampling as the k < m special case
    * (copies 0 rows drop). Adds `copy` (1-based long). Missing rates fail
    * loudly, same contract as mixtureByGroup. Pure map-side: broadcast
    * dim + a bounded explode, no shuffle.
    */
  def resampleByGroup(df: DataFrame, groupCol: String, key: Column,
                      rates: DataFrame): DataFrame = {
    val clash = df.columns.toSet
      .intersect(Set("copy", "__rs_k", "__rs_m", "__copies"))
    require(clash.isEmpty,
      s"input carries reserved resample columns: ${clash.mkString(", ")}")
    graft.expr.GraftFunctions.register(df.sparkSession)
    val r = rates.select(col(groupCol),
      col("k").cast("long").as("__rs_k"), col("m").cast("long").as("__rs_m"))
    df.join(org.apache.spark.sql.functions.broadcast(r), Seq(groupCol), "left")
      .withColumn("__rs_m", when(col("__rs_m").isNull,
          raise_error(concat(lit("resampleByGroup: no rate for group "),
            coalesce(col(groupCol).cast("string"), lit("NULL"))))
            .cast("long"))
        .otherwise(col("__rs_m")))
      .withColumn("__copies",
        call_function("div", col("__rs_k"), col("__rs_m")) +
          when(pmod(hu(key), col("__rs_m")) <
            pmod(col("__rs_k"), col("__rs_m")), 1L).otherwise(0L))
      // sequence() counts DOWN for copies = 0 (the usual trap) — guard
      .withColumn("copy", explode(when(col("__copies") >= 1,
        sequence(lit(1L), col("__copies")))
        .otherwise(array().cast("array<long>"))))
      .drop("__rs_k", "__rs_m", "__copies")
  }

  /** Budgeted corpus selection: keep the best-scoring rows whose
    * cumulative `cost` stays within `budget` — "take the highest-quality
    * documents until the token budget is spent", the final step of a
    * curation funnel. Selection order is (score DESC, id ASC), so the
    * result is a pure function of the data; a row is kept iff the
    * running cost through it (inclusive) is ≤ budget.
    *
    * Scale design: NO global single-partition window (the naive
    * `Window.orderBy(score)` pulls 100 TB through one task). Instead:
    * per-score totals aggregate first (quality scores are COARSE integers
    * by contract — the aggregate is dim-sized and collected like a
    * watermark scalar), the driver prefix-sums them to find the marginal
    * score class, whole classes above it pass with zero further work,
    * and only the marginal class — bounded by one score's population —
    * runs a RANGE-PARTITIONED global cumsum ([[Ranks.globalCumSum]],
    * ordered by id): rows/P per task even when the marginal class is a
    * large corpus fraction, which the coarse-score contract makes the
    * common case.
    *
    * Rows with a NULL score or cost are excluded up front (they cannot
    * be ranked); require the caller to coalesce if they belong in. A
    * cost whose LONG CAST is null (non-numeric string) is excluded too —
    * it would otherwise ride along contributing zero to every sum, i.e.
    * be kept for free.
    *
    * The "coarse integer scores" contract is ENFORCED, not assumed: the
    * per-class histogram lands on the driver, so a score column that is
    * numeric but high-cardinality (unique long ids) would silently
    * materialize one driver row per distinct value. The collect is
    * capped at `maxClasses` rows and the call fails loudly beyond it —
    * re-bucket the score (e.g. `floor(score * 100)`) and retry.
    *
    * @param scoreCol coarse integer quality score (higher = better)
    * @param costCol  per-row cost (e.g. token count), non-negative
    * @param maxClasses driver-histogram guard: max distinct score
    *                   classes (cap on driver memory, NOT a sample) */
  def tokenBudget(df: DataFrame, scoreCol: String, costCol: String,
                  idCol: String, budget: Long,
                  maxClasses: Int = 100000): DataFrame = {
    require(budget >= 0, s"budget $budget must be >= 0")
    require(maxClasses > 0, s"maxClasses $maxClasses must be positive")
    // the long view of the score IS the class key everywhere below —
    // histogram, branch filters, AND the window partition — so a
    // fractional score type cannot split one class across window
    // partitions (each restarting its cumsum and overspending the
    // budget). A score whose long cast is null (non-numeric string) is
    // excluded with the null scores; a negative cost fails loudly (the
    // whole-class-drop optimization assumes the cumsum is monotone,
    // which negative costs would silently break).
    // try_cast, not cast: under ANSI (Spark 4 default) a malformed
    // string would THROW mid-scan instead of landing in the documented
    // excluded-rows class
    val sCls = expr(s"try_cast(`$scoreCol` AS BIGINT)")
    val cLong = expr(s"try_cast(`$costCol` AS BIGINT)")
    val rows = df
      .where(sCls.isNotNull && cLong.isNotNull)
      // the negative check reads the SAME try_cast view (Catalyst may
      // reorder conjunctive filters, so a raw-column comparison could
      // still hit a malformed string first)
      .where(when(cLong < 0,
          raise_error(concat(lit("tokenBudget: negative cost "),
            col(costCol).cast("string"))).cast("boolean"))
        .otherwise(lit(true)))
      // the histogram collect + both output branches would otherwise
      // re-execute the (typically expensive — end of a curation funnel)
      // upstream lineage three times
      .pin()
    // the guard rides inside the same job: limit(maxClasses + 1) bounds
    // what can ever reach the driver (no separate countDistinct pass),
    // and one extra row is proof of overflow
    val totals = rows
      .groupBy(sCls.as("__s"))
      .agg(sum(cLong).as("__c"))
      .orderBy(col("__s").desc)
      .limit(maxClasses + 1)
      .collect()
    require(totals.length <= maxClasses,
      s"tokenBudget: more than $maxClasses distinct score classes — " +
        s"'$scoreCol' is not a coarse score; re-bucket it (e.g. " +
        "floor(score * K)) or raise maxClasses")
    // driver prefix over the (small) score histogram: find the first
    // class that does not fit whole
    var acc = 0L
    var marginal = Option.empty[(Long, Long)] // (score, cost already spent)
    val it = totals.iterator
    while (marginal.isEmpty && it.hasNext) {
      val r = it.next()
      val (s, c) = (r.getLong(0), r.getLong(1))
      if (acc + c <= budget) acc += c
      else marginal = Some((s, acc))
    }
    marginal match {
      case None => rows // everything fits
      case Some((s, spent)) =>
        val kept = rows.where(sCls > s)
        // the marginal class is one score's population — but the coarse-
        // score CONTRACT makes classes data-sized (few classes ⇒ each a
        // large corpus fraction), so its cumsum must NOT run through one
        // window partition. Range-partitioned global cumsum instead:
        // rows/numRanges per task, P-row offset frame.
        val margin = Ranks.globalCumSum(
            rows.where(sCls === s).withColumn("__w", cLong),
            "__w", "__pre", numRanges = 32, col(idCol).asc)
          // __pre is the EXCLUSIVE prefix; inclusive cum = __pre + cost
          .where(col("__pre") + col("__w") + spent <= budget)
          .drop("__w", "__pre")
        kept.unionByName(margin)
    }
  }

  /** Deterministic global shuffle into `nShards` training shards: shard =
    * hash(salt ‖ key) mod n, position within the shard by ascending
    * (hash, key) — a reproducible permutation computable on any engine,
    * with no global sort and no driver-side index. Adds `shard` (long) and
    * `pos` (1-based long within shard). Changing `salt` reshuffles.
    *
    * Scale: one shuffle, partitioned BY SHARD — exactly the layout the
    * subsequent shard writer wants, so the sort amortizes into the write.
    * The within-shard window is the only ordered region; shards are
    * balanced by the hash, so no straggler partitions.
    *
    * A NULL key hashes to NULL: such rows land in a NULL shard with
    * hash-ordered positions of their own — they never silently join a
    * real shard. Filter or key-coalesce upstream if nulls are invalid.
    */
  /** Class-balanced downsampling: every label keeps exactly
    * min-class-count rows, selected by deterministic hash rank
    * (hash(salt ‖ key), key) within the label — the bias-control pass
    * before training on skewed labels, reproducible across runs and
    * partitionings (the shuffleShards hash convention). One count
    * aggregate (label-cardinality, broadcast back) + one label-keyed
    * window.
    *
    * @return input columns, balanced: min-class-count rows per label
    */
  def classBalance(df: DataFrame, labelCol: Column, key: Column,
                   salt: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expr.GraftFunctions.register(df.sparkSession)
    val hu = graft.expr.GraftFunctions.java_hash_u32 _
    val counts = df.groupBy(labelCol.as("__lbl"))
      .agg(count(lit(1)).as("__n"))
    val minc = counts.agg(min("__n").as("__minc"))
    val w = Window.partitionBy(labelCol)
      .orderBy(hu(concat(lit(salt), key.cast("string"))).asc, key.asc)
    df.withColumn("__rk", row_number().over(w))
      .crossJoin(broadcast(minc))
      .where(col("__rk") <= col("__minc"))
      .drop("__rk", "__minc")
  }

  def shuffleShards(df: DataFrame, key: Column, salt: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards $nShards must be positive")
    val clash = df.columns.toSet.intersect(Set("shard", "pos", "__h"))
    require(clash.isEmpty,
      s"input carries reserved shard columns: ${clash.mkString(", ")}")
    graft.expr.GraftFunctions.register(df.sparkSession)
    val h = hu(concat(lit(salt), key.cast("string")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("shard")
      .orderBy(col("__h").asc, key.asc)
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
