package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment join re-expressed as a bin equi-join.
  *
  * A point-in-interval theta-join (`p >= s AND p < e`, possibly with an
  * extra equi-key) gives Catalyst nothing to hash on beyond the equi-key,
  * so a hot key degenerates to a per-key nested loop. Quantizing the time
  * axis into fixed bins turns it into a plain equi-join on (keys, bin)
  * with a codegen'd residual predicate: each point lands in exactly ONE
  * bin, each interval is exploded to the ⌈len/width⌉+1 bins it overlaps
  * (≤ 2 when len ≤ width), so no pair is produced twice — no dedup pass.
  *
  * Scale: the shuffle carries points ×1 and intervals ×~2 on an 8-byte
  * extra key; skew splits with AQE because each hot key now spreads over
  * its time bins. Pick `binWidth` ≈ the typical interval length.
  */
object RangeBin {

  /** Join `points` (at `ptCol`) to `intervals` ([sCol, eCol), end
    * exclusive) sharing `equiKeys`. Returns all columns of both inputs.
    * Intervals with e ≤ s match nothing (guarded: sequence() would
    * otherwise count DOWN and fabricate bins). */
  def pointInterval(points: DataFrame, ptCol: String,
                    intervals: DataFrame, sCol: String, eCol: String,
                    equiKeys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(!points.columns.contains("__bin") &&
      !intervals.columns.contains("__bin"),
      "inputs must not carry a __bin column")
    // the residual predicate references both frames' columns unqualified:
    // any overlap beyond the equi-keys would resolve ambiguously (or, for
    // __bin, be silently clobbered) — fail loudly instead
    val overlap = (points.columns.toSet & intervals.columns.toSet) --
      equiKeys.toSet
    require(overlap.isEmpty,
      s"points/intervals share non-key columns: ${overlap.mkString(", ")}")
    // floor division in PURE LONG arithmetic: subtracting pmod yields an
    // exact multiple of binWidth (so integral `div` == floor even for
    // negatives); Column./ would route through doubles and mis-bin
    // values ≥ 2^53 (e.g. nanosecond epochs)
    def fdiv(c: Column): Column =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    val pb = points.withColumn("__bin", fdiv(col(ptCol)))
    val ib = intervals.withColumn("__bin",
      explode(when(col(eCol) > col(sCol),
        sequence(fdiv(col(sCol)), fdiv(col(eCol) - 1)))
        .otherwise(array().cast("array<long>"))))
    pb.join(ib, equiKeys :+ "__bin")
      .where(col(ptCol) >= col(sCol) && col(ptCol) < col(eCol))
      .drop("__bin")
  }

  /** Interval×interval OVERLAP join (`aS < bE AND bS < aE`, both half-open
    * [s, e)) as a bin equi-join. Unlike [[pointInterval]], BOTH sides
    * explode to their covered bins, so a pair overlapping k shared bins
    * would surface k times; instead of a dedup shuffle, keep each pair only
    * in the FIRST bin both cover — `max(aBin₀, bBin₀)` — a pure residual
    * predicate on columns already present. Two intervals that overlap share
    * the bin containing the overlap start, so exactly one copy survives.
    *
    * Scale: shuffle volume is rows × ⌈len/width⌉ per side; pick `binWidth`
    * near the typical SHORTER side's length. Degenerate inputs (e ≤ s)
    * match nothing.
    */
  def intervalOverlap(a: DataFrame, aS: String, aE: String,
                      b: DataFrame, bS: String, bE: String,
                      equiKeys: Seq[String], binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val reserved = Set("__bin", "__a_bin0", "__b_bin0")
    require((a.columns.toSet ++ b.columns.toSet).intersect(reserved).isEmpty,
      "inputs must not carry __bin/__a_bin0/__b_bin0 columns")
    val overlap = (a.columns.toSet & b.columns.toSet) -- equiKeys.toSet
    require(overlap.isEmpty,
      s"a/b share non-key columns: ${overlap.mkString(", ")}")
    def fdiv(c: Column): Column =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    def binned(df: DataFrame, s: String, e: String, first: String) = df
      .withColumn(first, fdiv(col(s)))
      .withColumn("__bin",
        explode(when(col(e) > col(s),
          sequence(fdiv(col(s)), fdiv(col(e) - 1)))
          .otherwise(array().cast("array<long>"))))
    val ab = binned(a, aS, aE, "__a_bin0")
    val bb = binned(b, bS, bE, "__b_bin0")
    ab.join(bb, equiKeys :+ "__bin")
      .where(col(aS) < col(bE) && col(bS) < col(aE) &&
        col("__bin") === greatest(col("__a_bin0"), col("__b_bin0")))
      .drop("__bin", "__a_bin0", "__b_bin0")
  }
}
