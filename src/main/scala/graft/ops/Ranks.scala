package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps

/** Exact global ranks without a single-task global sort.
  *
  * `Window.orderBy(...)` with no `partitionBy` drags every row through
  * ONE task — fine on a per-group frame, a scale killer on anything that
  * grows with the data. This helper computes the identical
  * `row_number()` by range-partitioning on the order key (P parallel
  * range sorts), counting rows per range (a P-row frame), and adding the
  * broadcast prefix-sum offset of each range — the classic distributed
  * rank. Every stage is parallel except a P-row cumulative sum.
  *
  * The range boundaries come from Spark's `RangePartitioner` sample,
  * which is non-deterministic across re-evaluations — so the partition
  * id is pinned (eagerly materialized) before ranking. Rows that compare
  * equal on ALL order columns may therefore receive either adjacent rank
  * across runs (exactly like `row_number` itself): pass a tiebreaker
  * column for determinism, as with any `row_number` use.
  */
object Ranks {

  /** Append `out` = EXCLUSIVE global prefix sum of `weightCol` under
    * `orderCols` (ascending lexicographic) — the cumulative-distribution
    * primitive behind weighted inverse-CDF sampling and equi-weight
    * sharding. Same distributed-rank construction as
    * [[globalRowNumber]]: P parallel range sorts, a P-row per-range
    * weight total, broadcast prefix-sum offsets — identical result to
    * `sum(w).over(Window.orderBy(...))` minus the row's own weight, but
    * never a single-task global sort. Order must be TOTAL for a
    * deterministic result (pass a unique tiebreaker, e.g. the id). */
  def globalCumSum(df: DataFrame, weightCol: String, out: String,
                   numRanges: Int, orderCols: Column*): DataFrame = {
    require(orderCols.nonEmpty, "globalCumSum needs >= 1 order column")
    val ranged = df
      .repartitionByRange(numRanges, orderCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .pin() // RangePartitioner samples → pid must not be re-derived
    val offsets = ranged.groupBy("__pid")
      .agg(sum(col(weightCol)).as("__wsum"))
      .withColumn("__off",
        coalesce(sum(col("__wsum")).over(
          Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val localCum = coalesce(
      sum(col(weightCol)).over(
        Window.partitionBy("__pid").orderBy(orderCols: _*)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    ranged
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + localCum)
      .drop("__pid", "__off")
  }

  /** Append `out` = global `row_number()` under `orderCols` (ascending
    * lexicographic). `numRanges` bounds per-task sort size: rows/P per
    * task instead of all rows in one. */
  def globalRowNumber(df: DataFrame, out: String, numRanges: Int,
                      orderCols: Column*): DataFrame = {
    require(orderCols.nonEmpty, "globalRowNumber needs >= 1 order column")
    val ranged = df
      .repartitionByRange(numRanges, orderCols: _*)
      .withColumn("__pid", spark_partition_id().cast("long"))
      .pin() // RangePartitioner samples → pid must not be re-derived
    // P-row frame: rows before each range. The only non-parallel stage,
    // bounded by numRanges (an argument, not the data).
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
      .withColumn("__off",
        coalesce(sum(col("__cnt")).over(
          Window.orderBy("__pid").rowsBetween(
            Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__off")
    val localRn = row_number()
      .over(Window.partitionBy("__pid").orderBy(orderCols: _*))
      .cast("long")
    ranged
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__off") + localRn)
      .drop("__pid", "__off")
  }
}
