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
}
