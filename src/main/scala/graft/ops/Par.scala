package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Adaptive fan-out for compute-heavy operators.
  *
  * A small parquet input (single file, single row group) scans as ONE
  * partition, which serializes every downstream explode/hash/fold until
  * the first shuffle — on local[32] that wastes 31 cores. Production
  * inputs at 100 TB arrive as thousands of splits, so the guard makes
  * this a no-op there: we only repartition when the source exposes fewer
  * partitions than the cluster has slots, and the shuffle moves the
  * pre-explode rows (documents, not shingles), which is the cheap side.
  */
private[graft] object Par {

  /** Spread `df` across the cluster's task slots iff it is under-split.
    * Optional `by` keys make the round-robin a hash partitioning, which
    * later same-key aggregations can reuse. */
  def fanOut(df: DataFrame, by: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else if (by.isEmpty) df.repartition(p)
    else df.repartition(p, by: _*)
  }
}
