package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered multi-step funnel analysis over an event stream: how many
  * users complete step 1, then step 2 AFTER their step-1 time, then
  * step 3 after that — earliest-completion semantics (each step binds
  * to the user's first qualifying event after the previous step).
  * The product-analytics primitive the reference's event pipeline
  * feeds (behavioral reporting over synced resources,
  * reference: sri2db test suite's event-resource fixtures).
  *
  * SCALE. One aggregation + one co-keyed join per step, all shuffles on
  * the user key — the chain is `steps`-long, not data-dependent, and
  * every intermediate frame is one row per surviving user (shrinking
  * monotonically down the funnel). No windows over the fact table, no
  * driver-side state; the final per-step rollup is a 1-row aggregate
  * per step unioned into a `steps`-row result.
  */
object Funnel {

  /** @param events (userCol, tsCol epoch-ms long, typeCol)
    * @param steps  ordered event types, e.g. signup → click → purchase
    * @return (step 1-based, event_type, n_users, sum_lag_ms) where
    *         sum_lag_ms totals (this step's bind time − previous
    *         step's) over users reaching the step; 0 for step 1
    */
  def funnelSteps(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelSteps: need at least one step")
    val ev = events.select(col(userCol).as("u"),
      col(tsCol).cast("long").as("t"), col(typeCol).as("et"))
    val first = ev.where(col("et") === steps.head)
      .groupBy("u").agg(min("t").as("t"))
    // fold: each frame is (u, pt, t) — previous and current bind times
    val frames = steps.tail.scanLeft(first.withColumn("pt", col("t"))) {
      case (prev, step) =>
        ev.where(col("et") === step)
          .join(prev.select(col("u"), col("t").as("pt")), "u")
          .where(col("t") > col("pt"))
          .groupBy("u", "pt").agg(min("t").as("t"))
    }
    frames.zip(steps).zipWithIndex.map { case ((f, name), i) =>
      f.agg(count(lit(1)).as("n_users"),
          coalesce(sum(col("t") - col("pt")), lit(0L)).as("lag"))
        .select(lit(i + 1L).as("step"), lit(name).as("event_type"),
          col("n_users"),
          (if (i == 0) lit(0L) else col("lag")).as("sum_lag_ms"))
    }.reduce(_ unionByName _)
  }
}
