package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the optimizations the engine is designed
  * around must actually appear in the executed plans — filter pushdown to
  * the parquet scan, column pruning, broadcast of dimension tables, map-
  * side partial aggregation, whole-stage codegen, and top-k without a
  * global sort. A regression in any of these silently turns a scale-ready
  * plan into a full-scan/full-shuffle plan long before it shows up as a
  * wrong answer, so they are pinned here like unit tests. */
class PlanSpec extends SparkSuite {

  /** AQE wraps the tree in AdaptiveSparkPlanExec, whose children are not
    * visible to collect(); unwrap to the current physical plan. */
  private def unwrapped(df: DataFrame): org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }

  private def plan(df: DataFrame): String = unwrapped(df).toString()

  /** Untruncated scan metadata (the plan's toString elides long filter
    * lists behind "..."). */
  private def scanMeta(df: DataFrame, key: String): String =
    unwrapped(df).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.map(_.metadata.getOrElse(key, "")).mkString("\n")

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sfDir)

  test("q6: selective filters reach the parquet scan (PushedFilters)") {
    val pf = scanMeta(q("q6_selective_filter"), "PushedFilters")
    assert(pf.contains("GreaterThanOrEqual(l_shipdate") &&
      pf.contains("LessThan(l_shipdate"),
      s"shipdate range must push into the scan: $pf")
  }

  test("q6: column pruning — scan reads only the needed columns") {
    val readSchema = scanMeta(q("q6_selective_filter"), "ReadSchema")
    // 4 referenced columns; the 11-column lineitem schema must NOT be read
    assert(Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .forall(readSchema.contains), readSchema)
    assert(!readSchema.contains("l_returnflag") && !readSchema.contains("l_orderkey"),
      s"scan reads more than the projection needs: $readSchema")
  }

  test("q3: dimension broadcast + top-k without global sort") {
    val p = plan(q("q3_topk"))
    assert(p.contains("BroadcastHashJoin"),
      "customer dim must broadcast:\n" + p.take(1200))
    assert(p.contains("TakeOrderedAndProject"),
      "LIMIT after ORDER BY must plan as top-k, not global sort:\n" +
        p.take(1200))
  }

  test("q1: aggregation is partial (map-side) then final, in codegen") {
    val df = q("q1_agg")
    df.collect() // AQE wraps codegen stages only once stages execute
    val p = plan(df)
    val n = "HashAggregate".r.findAllIn(p).size
    assert(n >= 2, s"expected partial+final HashAggregate, got $n:\n" +
      p.take(1200))
    // codegen stages print as "*(n) HashAggregate..." in the final plan
    assert(p.contains("*(") && p.contains(") HashAggregate"),
      "agg must stay in whole-stage codegen:\n" + p.take(1200))
  }

  test("sync fixtures: raw-ts time filter pushes into the events scan") {
    val pf = scanMeta(queries.Fixtures.sriTarget(spark, sfDir), "PushedFilters")
    assert(pf.contains("IsNotNull(ts)") && pf.contains("LessThan(ts"),
      s"pre-projection ts filter must reach the scan: $pf")
  }

  test("merge_delta: tombstone/staged deletes are anti-joins, no shuffle " +
    "of the unmatched side payloads") {
    val p = plan(q("merge_delta"))
    assert(p.contains("LeftAnti"), "delete semantics must plan as anti-join")
  }

  test("dedup keep-latest plans one shuffle: window over partitionBy keys") {
    val p = plan(q("a1_dedup_keep_latest"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 2,
      s"keep-latest should shuffle on href once (+orderBy), got $exchanges:\n"
        + p.take(1500))
  }
}
