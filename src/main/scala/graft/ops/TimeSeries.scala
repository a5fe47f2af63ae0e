package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps

/** Gap handling for event streams: forward-fill of missing observations and
  * regularization onto a fixed-step grid ("resample"). The reference keeps
  * every observed row and leaves gap semantics to consumers
  * (`/root/reference/src/lib/client.js:1545` stores raw modified
  * timestamps); a training pipeline needs the regular grid.
  *
  * Both operators are single-shuffle: one window partitioned by the series
  * key. The spine explode is narrow (no shuffle) and its fan-out is bounded
  * by the series' day span, not by data volume.
  */
object TimeSeries {

  /** Replace nulls in `value` with the latest preceding non-null within the
    * key's order. Leading nulls stay null. Deterministic iff `order` is a
    * total order per key.
    */
  def fillForward(df: DataFrame, keys: Seq[String], order: Seq[Column],
      value: String, out: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(out, last(col(value), ignoreNulls = true).over(w))
  }

  /** Regularize per-key events onto a contiguous integer grid (one row per
    * `key` × step in [min(step), max(step)]), carrying the value of the
    * LAST event at or before that step (ties broken by `tieCol` descending
    * — pass a unique id). Steps with no event get the previous step's
    * carried value. Output: keys :+ (stepOut, out, n_obs) where n_obs
    * counts that step's own events (0 for filled rows).
    *
    * `step` must be an integral column (e.g. `ts_ms div 86400000` for
    * days). The grid explode happens AFTER the per-(key, step) aggregate,
    * so its input is already small.
    */
  def resampleSteps(df: DataFrame, keys: Seq[String], step: Column,
      tieCol: Column, value: String, stepOut: String, out: String): DataFrame = {
    val clash = df.columns.toSet
      .intersect(Set("__step", "__v", "__rn", "__lo", "__hi", "n_obs"))
    require(clash.isEmpty,
      s"input carries reserved resample columns: ${clash.mkString(", ")}")
    val k = keys.map(col)
    val perStep = df
      .withColumn("__step", step)
      .withColumn("__rn", row_number().over(
        Window.partitionBy((k :+ col("__step")): _*).orderBy(tieCol.desc)))
      .groupBy((k :+ col("__step")): _*)
      .agg(max(when(col("__rn") === 1, col(value))).as("__v"),
        count(lit(1)).as("n_obs"))
    // per-key spine over the observed step range; left-join puts observed
    // steps back, then forward-fill carries values across the gaps
    val spine = perStep.groupBy(k: _*)
      .agg(min(col("__step")).as("__lo"), max(col("__step")).as("__hi"))
      .withColumn("__step", explode(sequence(col("__lo"), col("__hi"))))
      .drop("__lo", "__hi")
    val joined = spine.join(perStep, keys :+ "__step", "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
    fillForward(joined, keys, Seq(col("__step")), "__v", out)
      .withColumnRenamed("__step", stepOut)
      .drop("__v")
  }

  /** Truncated exponentially-weighted moving average as an EXACT
    * rational: weight 2^(taps−1−j) on lag j (α = 1/2), emitted as
    * integer (num, den) columns — num/den is the EWMA, and both sums
    * are bit-stable under any engine/merge order, unlike the float
    * recursion s_t = α·x_t + (1−α)·s_{t−1} whose rounding drifts.
    * Rows with fewer than `taps` predecessors renormalize naturally:
    * den sums only the weights of taps that exist. NULL values get the
    * same missing-tap treatment at EVERY lag including j=0 (a NULL
    * current value contributes 0 and drops its weight from den) —
    * `lag()` cannot distinguish a NULL value from a missing
    * predecessor, so treating them uniformly is the only consistent
    * contract; the ts_ewma oracle encodes the identical rule.
    *
    * Scale: all `taps` lags ride ONE window pass (same partition, same
    * sort — Spark plans a single Window operator), so cost is one
    * shuffle on `keys` regardless of taps.
    *
    * @param order must be a deterministic total order within each key
    *              (add a tiebreaker column if the time column repeats)
    */
  def ewmaExact(df: DataFrame, keys: Seq[String], order: Seq[Column],
                valCol: String, taps: Int = 10,
                numOut: String = "num", denOut: String = "den")
  : DataFrame = {
    require(taps >= 1 && taps <= 62, "need 1 <= taps <= 62 (2^taps fits)")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val terms = (0 until taps).map { j =>
      val vj = if (j == 0) col(valCol) else lag(col(valCol), j).over(w)
      (vj, 1L << (taps - 1 - j))
    }
    val num = terms.map { case (vj, wg) =>
      coalesce(vj, lit(0L)) * lit(wg) }.reduce(_ + _)
    val den = terms.map { case (vj, wg) =>
      when(vj.isNotNull, lit(wg)).otherwise(lit(0L)) }.reduce(_ + _)
    df.withColumn(numOut, num).withColumn(denOut, den)
  }

  /** Rolling z-score anomaly flags, INTEGER-exact: over each key's
    * ordered stream, a trailing window of `window` rows (current
    * included) yields n, s1=Σx, s2=Σx²; the row is anomalous when
    * |x − μ| > `sigmas`·σ, decided without ever forming μ or σ —
    * multiply through by n²:
    *
    *   (n·x − s1)² > sigmas² · (n·s2 − s1²)
    *
    * Both sides are exact longs (for cents-scaled values ≲ 10⁶ and
    * window ≲ 10³: n·x ≤ 10⁹, squared 10¹⁸ — at the long boundary;
    * larger magnitudes should pre-scale down or widen to decimal).
    * Rows before a full window are never flagged (n = `window`
    * required): a 3-row history has no meaningful σ. One window pass
    * computes all three sums over the same frame/sort — the ewmaExact
    * contract; shuffle is the per-key window partition only.
    *
    * The window is SELF-INCLUSIVE, which bounds the reachable z-score:
    * a single outlier against n−1 equal values maxes out at z² = n−1,
    * so `window` must exceed sigmas²+1 or nothing can ever flag —
    * enforced loudly rather than silently returning an empty result.
    *
    * @return input plus (n, s1, s2, lhs, rhs, is_anomaly)
    */
  def anomalyZ(df: DataFrame, keys: Seq[String], order: Seq[Column],
               valCol: String, window: Int = 16, sigmas: Int = 3)
  : DataFrame = {
    require(window > sigmas * sigmas + 1,
      s"window=$window can never flag at $sigmas sigma: a self-" +
        s"inclusive window caps z^2 at window-1 <= ${sigmas * sigmas}")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(-(window - 1), Window.currentRow)
    val x = col(valCol)
    df.withColumn("n", count(x).over(w))
      .withColumn("s1", sum(x).over(w))
      .withColumn("s2", sum(x * x).over(w))
      .withColumn("lhs",
        (col("n") * x - col("s1")) * (col("n") * x - col("s1")))
      .withColumn("rhs", lit(sigmas.toLong * sigmas) *
        (col("n") * col("s2") - col("s1") * col("s1")))
      .withColumn("is_anomaly",
        col("n") === window && col("lhs") > col("rhs"))
  }

  /** Lag-k autocorrelation of an integer series, EXACT: for each key's
    * series x_1..x_n (in `order`), with S = Σx, the n-scaled deviation
    * e_t = n·x_t − S is an integer, and
    *
    *   num_k = Σ_{t=1..n−k} e_t · e_{t+k},    den = Σ_t e_t²
    *
    * num_k/den is the standard (biased, lag-truncated) sample ACF at
    * lag k — emitted as the integer pair so the graded value is
    * bit-stable on any engine (the ewmaExact num/den contract). All
    * maxLag leads ride ONE window pass (same partition, same sort).
    *
    * Scale: the input is the already-aggregated series (e.g. daily
    * counts) — its length is bounded by calendar time × key count, not
    * corpus size; the raw-rows → series aggregation is the distributed
    * step and happens BEFORE this call. With empty `keys` the window is
    * a single partition, which is fine for a series but would not be
    * for raw data. Long headroom: |e_t| ≤ n·max|x|, so num needs
    * n·(n·max|x|)² < 2⁶³ — e.g. 30 years of daily points (n≈11k) with
    * counts up to 8·10⁵/day; larger series should pre-scale or widen
    * to decimal.
    *
    * @return keys :+ (lag, num, den), one row per key × lag 1..maxLag
    */
  def acfExact(df: DataFrame, keys: Seq[String], order: Seq[Column],
               valCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val k = keys.map(col)
    val totals = df.groupBy(k: _*)
      .agg(count(lit(1)).as("__n"), sum(col(valCol)).as("__s"))
    val joined =
      if (keys.isEmpty) df.crossJoin(broadcast(totals))
      else df.join(broadcast(totals), keys)
    val w = Window.partitionBy(k: _*).orderBy(order: _*)
    val withE = joined
      .withColumn("__e", col("__n") * col(valCol) - col("__s"))
    val agg = withE
      .select((k :+ col("__e")) ++
        (1 to maxLag).map(j => lead(col("__e"), j).over(w).as(s"__l$j")): _*)
      .groupBy(k: _*)
      .agg(sum(col("__e") * col("__e")).as("den"),
        (1 to maxLag).map(j =>
          sum(col("__e") * col(s"__l$j")).as(s"__num$j")): _*)
    val lagStructs = array((1 to maxLag).map(j =>
      struct(lit(j.toLong).as("lag"), col(s"__num$j").as("num"))): _*)
    agg.select((k :+ explode(lagStructs).as("__lg")) :+ col("den"): _*)
      .select((k :+ col("__lg.lag").as("lag")) ++
        Seq(col("__lg.num").as("num"), col("den")): _*)
  }

  /** Two-sided CUSUM changepoint statistics (Page 1954), INTEGER-exact
    * and window-closed: for each key's integer series x_1..x_n the
    * textbook recursions
    *
    *   s⁺_t = max(0, s⁺_{t−1} + (x_t − k)),   s⁻_t = max(0, s⁻_{t−1} + (k − x_t))
    *
    * look sequential, but with C_t = Σ_{i≤t}(x_i − k) they close over
    * prefix extrema:  s⁺_t = C_t − min(0, min_{j≤t} C_j)  and
    * s⁻_t = max(0, max_{j≤t} C_j) − C_t  (the j=0 / C_0=0 term is the
    * `least/greatest` against 0) — so both directions ride ONE window
    * pass (cumsum + running min + running max over the same frame),
    * never a sequential scan. The allowance k is the per-key ceiling
    * mean ⌈S/n⌉ (integer, so x_t − k stays integer — no scaling pass),
    * joined back from a key-cardinality aggregate; the alarm threshold
    * is `hMult·k` per key. Everything that decides a flag is long
    * arithmetic.
    *
    * Scale: like [[acfExact]], the input is the already-aggregated
    * series (daily counts per key) — calendar-bounded, with the raw →
    * series aggregation as the distributed step before this call. The
    * totals join is a broadcast of one row per key.
    *
    * PRECONDITION: `valCol` is non-null (true by construction for
    * count/sum series). A NULL observation would silently drop out of
    * the cumulative sum while keeping its row — the ewmaExact oracle-
    * divergence class — so it is fenced loudly instead.
    *
    * @return input columns :+ (cusum_hi, cusum_lo, flag_hi, flag_lo)
    */
  def cusumFlags(df: DataFrame, keys: Seq[String], order: Seq[Column],
                 valCol: String, hMult: Int = 5): DataFrame = {
    require(hMult >= 1, "hMult must be >= 1")
    val k = keys.map(col)
    val totals = df.groupBy(k: _*)
      .agg(sum(col(valCol)).as("__s"), count(lit(1)).as("__n"))
      .withColumn("__k",
        call_function("div", col("__s") + col("__n") - 1, col("__n")))
      .select((keys.map(col) :+ col("__k")): _*)
    val joined =
      if (keys.isEmpty) df.crossJoin(broadcast(totals))
      else df.join(broadcast(totals), keys)
    val w = Window.partitionBy(k: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fenced = when(col(valCol).isNull,
      raise_error(concat(lit("cusumFlags: NULL observation in "),
        lit(valCol),
        lit(" — aggregate or fill the series first")))
    ).otherwise(col(valCol))
    val c = sum(fenced - col("__k")).over(w)
    val out = joined
      .withColumn("__c", c)
      .withColumn("__cmin", min(col("__c")).over(w))
      .withColumn("__cmax", max(col("__c")).over(w))
      .withColumn("cusum_hi", col("__c") - least(lit(0L), col("__cmin")))
      .withColumn("cusum_lo",
        greatest(lit(0L), col("__cmax")) - col("__c"))
      .withColumn("flag_hi", col("cusum_hi") > lit(hMult.toLong) * col("__k"))
      .withColumn("flag_lo", col("cusum_lo") > lit(hMult.toLong) * col("__k"))
    out.drop("__k", "__c", "__cmin", "__cmax")
  }

  /** Inter-arrival regularity audit — the timing-signature half of bot
    * detection: humans produce heavy-tailed gap distributions, schedulers
    * produce spikes. Per key, successive gaps in `orderCol` (one lag
    * window pass) bucket at `bucketDiv` resolution; concentration is the
    * exact Simpson collision mass Σ_b n_b² against n² — the verdict
    * `2·Σn_b² > n²` ("a random pair of gaps collides with probability
    * > 1/2") is division-free integer, the dq_benford convention. Keys
    * with fewer than `minGaps` gaps report with `flag = false` (too few
    * observations is absence of evidence, not evidence).
    *
    * Scale: one keyed window pass for gaps, one two-level aggregation
    * (key×bucket, then key) — both shuffles carry the key, partials
    * combine map-side. Output is key-cardinality.
    *
    * @return (keys..., n_gaps, sum_sq, flag)
    */
  def regularityFlags(df: DataFrame, keys: Seq[String], orderCol: Column,
                      bucketDiv: Long, minGaps: Int = 8): DataFrame = {
    require(bucketDiv >= 1, "bucketDiv must be >= 1")
    val k = keys.map(col)
    val w = Window.partitionBy(k: _*).orderBy(orderCol)
    val gaps = df
      .withColumn("__gap", orderCol - lag(orderCol, 1).over(w))
      .where(col("__gap").isNotNull)
      .withColumn("__b", call_function("div", col("__gap"), lit(bucketDiv)))
    val perBucket = gaps.groupBy((k :+ col("__b")): _*)
      .agg(count(lit(1)).as("__nb"))
    perBucket.groupBy(k: _*)
      .agg(sum(col("__nb")).as("n_gaps"),
        sum(col("__nb") * col("__nb")).as("sum_sq"))
      .withColumn("flag", col("n_gaps") >= minGaps.toLong &&
        lit(2L) * col("sum_sq") > col("n_gaps") * col("n_gaps"))
  }

  /** Robust (median/MAD) anomaly gate — the heavy-tail-safe twin of
    * [[anomalyZ]]: mean/variance gates move WITH the outliers they hunt
    * (one huge spike inflates σ until nothing flags); the median and
    * the Median Absolute Deviation have a 50% breakdown point. Flags
    * x with |x − median| > (cNum/cDen)·MAD, entirely in scaled
    * integers: med2 = lower-median + upper-median (= 2·median),
    * d2 = |2x − med2| (= 2·|x − median|), mad4 = lower+upper median of
    * d2 (= 4·MAD), so the gate is 2·cDen·d2 > cNum·mad4 — division-
    * free and rank-based, hence bit-stable on any engine.
    *
    * Shape: two rank passes over the per-key SERIES (calendar-bounded —
    * the acfExact justification; the raw-rows → series aggregate is the
    * distributed step and happens before this call) plus a 2-row-pick
    * aggregate joined back per key.
    *
    * @return (keys..., order col, x, d2, mad4, is_anomaly) */
  def madAnomaly(df: DataFrame, keys: Seq[String], orderCol: Column,
                 xCol: String, cNum: Int = 3, cDen: Int = 1)
  : DataFrame = {
    require(cNum >= 1 && cDen >= 1, s"bad threshold $cNum/$cDen")
    val k = keys.map(col)
    def med2Of(in: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.partitionBy(k: _*)
        .orderBy(col(v).asc, col("__o").asc)
      in.withColumn("__rn", row_number().over(w).cast("long"))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(k: _*)))
        .groupBy(k: _*)
        .agg((sum(when(col("__rn") ===
            call_function("div", col("__n") + 1L, lit(2L)), col(v))) +
          sum(when(col("__rn") ===
            call_function("div", col("__n"), lit(2L)) + 1L, col(v))))
          .as(out))
    }
    val x = col(xCol).cast("long")
    val base = df.select((k :+ orderCol.as("__o") :+ x.as("__x")): _*)
    val withMed = base.join(med2Of(base, "__x", "med2"), keys)
      .withColumn("d2", abs(lit(2L) * col("__x") - col("med2")))
    withMed.join(med2Of(withMed, "d2", "mad4"), keys)
      .withColumn("is_anomaly",
        lit(2L * cDen) * col("d2") > lit(cNum.toLong) * col("mad4"))
      .select((k ++ Seq(col("__o"), col("__x").as("x"), col("d2"),
        col("mad4"), col("is_anomaly"))): _*)
  }

  /** SAX symbolization (Lin et al. 2003 — Symbolic Aggregate
    * approXimation, the motif/novelty-mining prep): each key's ordered
    * series splits into `windows` equal-index segments; the segment's
    * Piecewise Aggregate Approximation is the EXACT scaled mean
    * paa = (1 000 000·Σx) div n (truncation — deterministic on both
    * engines for non-negative x); symbols come from EQUI-DEPTH ntile
    * buckets over all (paa, key, window) triples — the data-driven
    * breakpoint variant (classic SAX uses Gaussian breakpoints, which
    * are irrational; equal-occupancy cuts are the exact-arithmetic
    * analogue with the same alphabet-balance property) — and the key's
    * SAX word is its symbols a..z concatenated in window order.
    *
    * Shape: one window pass keyed on the series (calendar-bounded per
    * key — the acfExact justification), one keyed aggregate for the
    * PAAs (keys×windows rows), and the equi-depth cut runs over that
    * aggregate frame, never the raw series. The cut itself is a
    * range-partitioned global rank ([[Ranks.globalRowNumber]]) plus
    * the closed-form NTILE arithmetic — `ntile(n)` is a pure function
    * of the global rank rn and the frame size N (the SQL rule: the
    * first N mod n buckets carry one extra row) — so the aggregate
    * frame never rides through a single task even when the key count
    * grows with the data (millions of series at 100 TB).
    *
    * @return (keys..., w, paa, n, sym, word) — w 0-based */
  def saxWords(df: DataFrame, keys: Seq[String], order: Seq[Column],
               xCol: String, windows: Int, alphabet: Int): DataFrame = {
    require(windows >= 2 && alphabet >= 2 && alphabet <= 26,
      s"bad SAX shape $windows x $alphabet")
    val k = keys.map(col)
    val wk = Window.partitionBy(k: _*).orderBy(order: _*)
    val seg = df
      .withColumn("__rn", row_number().over(wk).cast("long"))
      .withColumn("__t", count(lit(1)).over(Window.partitionBy(k: _*)))
      .withColumn("w", call_function("div",
        (col("__rn") - 1L) * windows, col("__t")))
    val paa = seg.groupBy((k :+ col("w")): _*)
      .agg(sum(col(xCol).cast("long")).as("__s"),
        count(lit(1)).as("n"))
      .withColumn("paa",
        call_function("div", col("__s") * 1000000L, col("n")))
      .drop("__s")
    // NTILE(alphabet) ORDER BY (paa, keys, w) without the single-task
    // global sort: rank via P parallel range sorts, then rebuild the
    // SQL bucket rule exactly (q = N div n, r = N mod n; rank rn maps
    // to ceil(rn/(q+1)) inside the first r*(q+1) rows, else
    // r + ceil((rn - r*(q+1))/q)). The order is total (keys+w unique),
    // so the rank — and therefore every symbol — is deterministic.
    val ranked = Ranks.globalRowNumber(paa, "__rk", numRanges = 32,
      (col("paa") +: k :+ col("w")): _*)
    val nRows = paa.agg(count(lit(1)).as("__N"))
    val q = call_function("div", col("__N"), lit(alphabet.toLong))
    val r = col("__N") % alphabet.toLong
    val sym = ranked.crossJoin(broadcast(nRows))
      .withColumn("sym",
        when(col("__rk") <= r * (q + lit(1L)),
          call_function("div", col("__rk") + q, q + lit(1L)))
        .otherwise(r + call_function("div",
          col("__rk") - r * (q + lit(1L)) + q - lit(1L), q)))
      .drop("__rk", "__N")
    val letters = ('a' to 'z').take(alphabet).mkString
    val word = sym.groupBy(k: _*)
      .agg(concat_ws("",
        transform(array_sort(collect_list(struct(col("w"), col("sym")))),
          s => lit(letters).substr(s.getField("sym"), lit(1)))).as("word"))
    sym.join(word, keys)
      .select((k :+ col("w") :+ col("paa") :+ col("n") :+
        col("sym").cast("long").as("sym") :+ col("word")): _*)
  }

  /** Classical additive seasonal decomposition (the moving-average
    * decomposition STL approximates — Cleveland et al. 1990 §2's
    * baseline): trend = centered `period`-row moving sum (kept ×period
    * to stay integer), detrended = period·x − trend, seasonal index =
    * per-(keys, season) mean of the detrended values, residual = the
    * rest. Only rows with a FULL centered window are emitted (the
    * standard edge-trim; partial-window trends are not comparable).
    * All divisions are Spark `div`/DuckDB `//` truncations (both
    * truncate toward zero, negative detrended values included — the
    * mm_resize hash-replay precedent), on `scale`-scaled integers, so
    * every output hash-matches across engines.
    *
    * Shape: one window pass partitioned by the series key (series are
    * calendar-bounded per key — the acfExact justification), one keyed
    * aggregate for the seasonal indices (keys×period rows, broadcast-
    * joined back). The raw-rows → series aggregate happens before this
    * call and is the distributed step.
    *
    * @param seasonCol the season-of-cycle column (e.g. epoch-day % 7)
    * @return (keys..., __o, season, x, trend_p, seas_s, resid_s) —
    *         trend_p is ×period, seas_s/resid_s are ×scale */
  def classicalDecompose(df: DataFrame, keys: Seq[String],
                         orderCol: Column, seasonCol: Column, xCol: String,
                         period: Int, scale: Long): DataFrame = {
    require(period >= 3 && period % 2 == 1,
      s"period must be odd >= 3 (centered window), got $period")
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val k = keys.map(col)
    val half = (period - 1) / 2
    // the window orders by the RENAMED __o — orderCol itself is consumed
    // by the projection below
    val w = Window.partitionBy(k: _*).orderBy(col("__o"))
      .rowsBetween(-half, half)
    val x = col(xCol).cast("long")
    val full = df
      .select((k :+ orderCol.as("__o") :+ seasonCol.as("season") :+
        x.as("x")): _*)
      .withColumn("trend_p", sum(col("x")).over(w))
      .withColumn("__wn", count(lit(1)).over(w))
      .where(col("__wn") === period)
      .withColumn("detr_p", lit(period.toLong) * col("x") - col("trend_p"))
    val seas = full.groupBy((k :+ col("season")): _*)
      .agg(call_function("div", sum(col("detr_p")) * scale,
        count(lit(1)) * period).as("seas_s"))
    full.join(seas, keys :+ "season")
      .withColumn("resid_s", col("x") * scale -
        call_function("div", col("trend_p") * scale, lit(period.toLong)) -
        col("seas_s"))
      .select((k ++ Seq(col("__o"), col("season"), col("x"),
        col("trend_p"), col("seas_s"), col("resid_s"))): _*)
  }

  /** Theil–Sen robust trend: per key, the median of ALL pairwise scaled
    * slopes slope_s = ((x_j − x_i)·scale) div (t_j − t_i) over i < j —
    * the 29%-breakdown slope estimator next to madAnomaly's level gate.
    * The median is the madAnomaly two-middle form (slope2_s = the sum of
    * the two middle order statistics; the half assembles downstream), so
    * the output is exact integers end to end.
    *
    * Shape: the pair space is |series|² per key — run on CALENDAR-
    * BOUNDED series per key (days-per-month here: ≤ 31 rows → ≤ 465
    * pairs), never on raw rows; the raw → series aggregate before this
    * call is the distributed step. A loud fence rejects series past
    * `maxSeries` instead of silently detonating the pair space.
    *
    * @param tCol numeric time (e.g. epoch days); must be distinct per key
    * @return (keys..., n_days, n_pairs, slope2_s) */
  def theilSenSlopes(df: DataFrame, keys: Seq[String], tCol: Column,
                     xCol: String, scale: Long, maxSeries: Int = 1000)
  : DataFrame = {
    require(scale >= 1, s"scale must be >= 1, got $scale")
    val k = keys.map(col)
    val base = df.select((k :+ tCol.cast("long").as("__t") :+
      col(xCol).cast("long").as("__x")): _*)
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(k: _*)))
      .withColumn("__t", when(col("__n") <= maxSeries, col("__t"))
        .otherwise(raise_error(concat(
          lit(s"theilSenSlopes: series over maxSeries=$maxSeries for "),
          concat_ws(",", k: _*))).cast("long")))
    // every right-side column renamed — no aliased self-join, so the
    // ambiguous-self-join analyzer trap never arises
    val right = base.select((keys.map(c => col(c).as(s"__r_$c")) :+
      col("__t").as("__t2") :+ col("__x").as("__x2")): _*)
    val slopes = base.join(right,
        keys.map(c => col(c) === col(s"__r_$c")).reduce(_ && _) &&
          col("__t") < col("__t2"))
      .select((k ++ Seq(
        col("__t").as("__o"),
        call_function("div", (col("__x2") - col("__x")) * scale,
          col("__t2") - col("__t")).as("__sl"),
        col("__t2").as("__o2"))): _*)
    val wm = Window.partitionBy(k: _*)
      .orderBy(col("__sl").asc, col("__o").asc, col("__o2").asc)
    val med = slopes
      .withColumn("__rn", row_number().over(wm).cast("long"))
      .withColumn("__np", count(lit(1)).over(Window.partitionBy(k: _*)))
      .groupBy(k: _*)
      .agg(max(col("__np")).as("n_pairs"),
        (sum(when(col("__rn") ===
            call_function("div", col("__np") + 1L, lit(2L)), col("__sl"))) +
          sum(when(col("__rn") ===
            call_function("div", col("__np"), lit(2L)) + 1L, col("__sl"))))
          .as("slope2_s"))
    base.groupBy(k: _*).agg(count(lit(1)).as("n_days"))
      .join(med, keys)
      .select((k ++ Seq(col("n_days"), col("n_pairs"),
        col("slope2_s"))): _*)
  }

  /** Exact matrix profile (Yeh et al. 2016 — THE motif/discord mining
    * primitive): for every length-`w` window of each key's series, the
    * minimum squared Euclidean distance to any NON-OVERLAPPING window
    * of the same series (exclusion zone = w, the non-trivial-match
    * guard), plus the argmin position. Distances are raw-integer
    * Σ(aᵢ−bᵢ)² — exact, so motifs (small mp_d2) and discords (large
    * mp_d2) are oracle-checkable; the z-normalized variant needs
    * irrational normalization and is out of the exact idiom by design.
    *
    * Shape: run on the CALENDAR-BOUNDED per-key series (the
    * theilSenSlopes contract — the raw→series aggregate before this
    * call is the distributed step, and the |series|² pair space is
    * SF-independent); windows assemble by an offsets join + one keyed
    * aggregate, pairs are a key-equi self-join with renamed right
    * side, the argmin is a hash-aggregate min-of-struct. A loud
    * `maxSeries` fence guards the quadratic.
    *
    * @return (keys..., i, mp_d2, mp_j) — i, j are 1-based window
    *         positions; series shorter than 2w emit nothing */
  def matrixProfile(df: DataFrame, keys: Seq[String], orderCol: Column,
                    xCol: String, w: Int, maxSeries: Int = 1000)
  : DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    val k = keys.map(col)
    val wOrd = Window.partitionBy(k: _*).orderBy(col("__o"))
    val base = df
      .select((k :+ orderCol.as("__o") :+
        col(xCol).cast("long").as("__x")): _*)
      .withColumn("__p", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(k: _*)))
      .withColumn("__p", when(col("__n") <= maxSeries, col("__p"))
        .otherwise(raise_error(concat(
          lit(s"matrixProfile: series over maxSeries=$maxSeries for "),
          concat_ws(",", k: _*))).cast("long")))
    val wins = mpWindows(base, keys, w, withNew = false)
    mpMinimize(mpPairs(wins, keys, w, deltaOnly = false), keys)
  }

  /** Window-vector assembly shared by [[matrixProfile]] and
    * [[matrixProfileMergedDelta]]: position i covers rows i .. i+w-1,
    * assembled by an offsets join + ordered collect. `base` must carry
    * keys, __p (1-based position), __x, and — when `withNew` — a
    * boolean __new row flag, folded to a per-window `__wnew` =
    * "window touches ≥ 1 new row". */
  private def mpWindows(base: DataFrame, keys: Seq[String], w: Int,
                        withNew: Boolean): DataFrame = {
    val k = keys.map(col)
    val sel: Seq[Column] = (k :+ col("__p") :+ col("__x") :+
      explode(sequence(lit(0L), lit(w - 1L))).as("__k")) ++
      (if (withNew) Seq(col("__new")) else Nil)
    val aggs = Seq(
      transform(array_sort(collect_list(struct(col("__k"),
        col("__x")))), s => s.getField("__x")).as("__v")) ++
      (if (withNew) Seq(max(col("__new")).as("__wnew")) else Nil)
    base.select(sel: _*)
      .withColumn("__i", col("__p") - col("__k"))
      .where(col("__i") >= 1L)
      .groupBy((k :+ col("__i")): _*)
      .agg(count(lit(1)).as("__len"), aggs: _*)
      .where(col("__len") === w)
      .drop("__len")
  }

  /** The non-overlapping pair space over window vectors, symmetrized:
    * (keys, __i, __j, __d2) for every |i−j| ≥ w pair. With `deltaOnly`
    * only pairs touching a __wnew window are generated — the old×old
    * block (the stored profile's domain) is never re-scored. */
  private def mpPairs(wins: DataFrame, keys: Seq[String], w: Int,
                      deltaOnly: Boolean): DataFrame = {
    val k = keys.map(col)
    val rcols = keys.map(c => col(c).as(s"__r_$c")) ++
      Seq(col("__i").as("__j"), col("__v").as("__vb")) ++
      (if (deltaOnly) Seq(col("__wnew").as("__wnewb")) else Nil)
    val right = wins.select(rcols: _*)
    val d2 = aggregate(
      zip_with(col("__v"), col("__vb"), (p, q) => (p - q) * (p - q)),
      lit(0L), (acc, x) => acc + x)
    val joinCond = keys.map(c => col(c) === col(s"__r_$c"))
      .reduce(_ && _) && col("__j") >= col("__i") + w &&
      (if (deltaOnly) col("__wnew") || col("__wnewb") else lit(true))
    val pairs = wins.join(right, joinCond)
      .select((k ++ Seq(col("__i"), col("__j"), d2.as("__d2"))): _*)
    // symmetrize by EXPLODING each scored pair into its two directions
    // instead of unioning two copies of the join: the union form
    // inlines the join subtree into both branches and executes it (and
    // the d2 fold) twice per profile (guide §1.2 — don't compute things
    // twice). Same candidate multiset, so mpMinimize is unchanged.
    pairs.select((k :+ explode(array(
        struct(col("__i"), col("__j"), col("__d2")),
        struct(col("__j").as("__i"), col("__i").as("__j"),
          col("__d2")))).as("__e")): _*)
      .select((k ++ Seq(col("__e.__i").as("__i"),
        col("__e.__j").as("__j"), col("__e.__d2").as("__d2"))): _*)
  }

  /** min-of-struct profile assembly from candidate (i, j, d2) rows. */
  private def mpMinimize(cand: DataFrame, keys: Seq[String]): DataFrame = {
    val k = keys.map(col)
    cand.groupBy((k :+ col("__i")): _*)
      .agg(min(struct(col("__d2").as("d"), col("__j").as("j")))
        .as("__m"))
      .select((k ++ Seq(col("__i").as("i"), col("__m.d").as("mp_d2"),
        col("__m.j").as("mp_j"))): _*)
  }

  /** Delta maintenance of [[matrixProfile]] under APPEND-ONLY arrivals
    * (the 22nd inc_* merge≡rebuild identity — the streaming-monitoring
    * story for the ts_ family): appending rows AFTER every stored row
    * (later calendar time) leaves all old window vectors and their
    * old×old pair distances untouched, so the new profile is
    *
    *   mp'(i) = min( stored mp(i),  min over pairs touching a NEW
    *                                window )
    *
    * — existing minima can only be LOWERED by new-window pairs, and
    * only the delta pair block (old×new ∪ new×new) is ever scored;
    * the stored profile enters the final min-aggregate verbatim as
    * candidate rows. Positions are stable because the arrivals are a
    * suffix: base position p is full-series position p. A loud fence
    * verifies the append-only precondition per key (max old order <
    * min new order) rather than silently merging an interleaved split.
    *
    * @param stored matrixProfile(base) — (keys..., i, mp_d2, mp_j)
    * @param isNew  marks the arrival rows of `df` (the full series)
    * @return equals matrixProfile(df) exactly */
  def matrixProfileMergedDelta(df: DataFrame, keys: Seq[String],
                               orderCol: Column, xCol: String, w: Int,
                               isNew: Column, stored: DataFrame,
                               maxSeries: Int = 1000): DataFrame = {
    require(w >= 2, s"window must be >= 2, got $w")
    val k = keys.map(col)
    val wOrd = Window.partitionBy(k: _*).orderBy(col("__o"))
    val wKey = Window.partitionBy(k: _*)
    val base = df
      .select((k ++ Seq(orderCol.as("__o"),
        col(xCol).cast("long").as("__x"), isNew.as("__new"))): _*)
      .withColumn("__p", row_number().over(wOrd).cast("long"))
      .withColumn("__n", count(lit(1)).over(wKey))
      .withColumn("__p", when(col("__n") <= maxSeries, col("__p"))
        .otherwise(raise_error(concat(
          lit(s"matrixProfileMergedDelta: series over " +
            s"maxSeries=$maxSeries for "),
          concat_ws(",", k: _*))).cast("long")))
      // append-only fence: every old row must order before every new
      // row within its key, else positions shift and the identity lies
      .withColumn("__maxOld",
        max(when(!col("__new"), col("__o"))).over(wKey))
      .withColumn("__minNew",
        min(when(col("__new"), col("__o"))).over(wKey))
      .withColumn("__x", when(
          col("__maxOld").isNull || col("__minNew").isNull ||
            col("__maxOld") < col("__minNew"), col("__x"))
        .otherwise(raise_error(concat(
          lit("matrixProfileMergedDelta: arrivals are not a suffix " +
            "(append-only precondition violated) for "),
          concat_ws(",", k: _*))).cast("long")))
      .drop("__n", "__maxOld", "__minNew")
    val wins = mpWindows(base, keys, w, withNew = true)
    val deltaCand = mpPairs(wins, keys, w, deltaOnly = true)
    val storedCand = stored.select((k ++ Seq(
      col("i").as("__i"), col("mp_j").as("__j"),
      col("mp_d2").as("__d2"))): _*)
    mpMinimize(deltaCand.unionByName(storedCand), keys)
  }

  /** Binary-segmentation change-point detection, depth 2 (Scott &
    * Knott's classic recursion, the CUSUM-statistic form): the root
    * change point maximizes the scaled CUSUM |n·P_k − k·T| over split
    * positions k < n (P = prefix sum, T = total — the mean-shift
    * statistic cleared of divisions), then each half is split once
    * more with the statistic localized to the segment. Argmaxes are
    * hash-aggregate max-of-struct picks (g DESC, position ASC — the
    * labelPropagate argmax contract, never a sort window); everything
    * is exact integers, ties deterministic, so the segmentation is
    * oracle-checkable. Note g is NOT comparable across segments (each
    * is scaled by its own segment length) — it grades the argmax, not
    * a global score.
    *
    * Shape: one prefix-sum window per key (series are calendar-bounded
    * per key — the acfExact justification), three keyed argmax
    * aggregates, one broadcast-sized join of the root picks.
    *
    * @return (keys..., seg ∈ root|left|right, cp_rn, cp_o, g) — up to
    *         3 rows per key; sides shorter than 2 rows emit nothing */
  def binarySegment(df: DataFrame, keys: Seq[String], orderCol: Column,
                    xCol: String): DataFrame = {
    val k = keys.map(col)
    val wOrd = Window.partitionBy(k: _*).orderBy(col("__o"))
    val wAll = Window.partitionBy(k: _*)
    val base = df
      .select((k :+ orderCol.as("__o") :+
        col(xCol).cast("long").as("__x")): _*)
      .withColumn("rn", row_number().over(wOrd).cast("long"))
      .withColumn("p", sum(col("__x")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("tot", sum(col("__x")).over(wAll))
      .pin()
    def pick(cands: DataFrame, seg: String): DataFrame =
      cands.groupBy(k: _*)
        .agg(max(struct(col("__g").as("g"), (-col("rn")).as("nk"),
          col("rn").as("rn"), col("__o").as("o"))).as("m"))
        .select((k ++ Seq(lit(seg).as("seg"),
          col("m.rn").as("cp_rn"), col("m.o").as("cp_o"),
          col("m.g").as("g"))): _*)
    val root = pick(base.where(col("rn") < col("n"))
      .withColumn("__g",
        abs(col("n") * col("p") - col("rn") * col("tot"))), "root")
    val withRoot = base.join(
      root.select((k :+ col("cp_rn").as("__k1")): _*), keys)
    val pk1 = withRoot.where(col("rn") === col("__k1"))
      .select((k :+ col("p").as("__pk1")): _*)
    val sides = withRoot.join(pk1, keys)
    val left = pick(sides.where(col("rn") < col("__k1"))
      .withColumn("__g",
        abs(col("__k1") * col("p") - col("rn") * col("__pk1"))), "left")
    val right = pick(sides
      .where(col("rn") > col("__k1") && col("rn") < col("n"))
      .withColumn("__g", abs(
        (col("n") - col("__k1")) * (col("p") - col("__pk1")) -
          (col("rn") - col("__k1")) * (col("tot") - col("__pk1")))),
      "right")
    root.unionByName(left).unionByName(right)
  }
}
