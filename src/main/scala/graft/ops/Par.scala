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
    * later same-key aggregations can reuse.
    *
    * The split count comes from the pre-AQE physical plan's scan leaves —
    * NEVER from `df.rdd`, which under AQE materializes every upstream
    * exchange at plan time and throws the work away. If the plan has any
    * non-file-scan leaf (shuffle inputs, in-memory relations), the input
    * is left untouched: those paths already chose their parallelism. */
  def fanOut(df: DataFrame, by: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    // Under AQE the pre-adaptive sparkPlan has no exchanges yet
    // (EnsureRequirements runs at stage planning), so inspect the
    // adaptive initial plan — a plain field read, nothing executes.
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    // a plan that already shuffles has chosen its parallelism — adding a
    // repartition on top would be a second full shuffle for nothing
    val hasExchange = plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    if (hasExchange) return df
    val leaves = plan.collectLeaves()
    val scanParts = leaves.map {
      // file listing / existing-RDD partition counts are driver-side
      // metadata — reading them runs no job
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        Some(f.inputRDD.getNumPartitions)
      case r: org.apache.spark.sql.execution.RDDScanExec =>
        Some(r.rdd.getNumPartitions)
      case _ => None // shuffle/exchange inputs: leave their parallelism be
    }
    if (scanParts.exists(_.isEmpty)) df
    else {
      val n = scanParts.flatten.sum
      if (n >= p) df
      else if (by.isEmpty) df.repartition(p)
      else df.repartition(p, by: _*)
    }
  }
}
