package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ranks

/** Ranks.globalRowNumber must equal the single-task
  * `row_number().over(Window.orderBy(...))` on every input while never
  * sorting the data frame in one task. */
class RanksSpec extends SparkSuite {

  test("globalRowNumber == global Window row_number (with tiebreaker)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // duplicate-heavy values to exercise ties across range boundaries
    val df = (1 to 5000).map(i => (i.toLong, rnd.nextInt(40).toLong))
      .toDF("id", "v")
    val expected = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v").asc, col("id").asc))
          .cast("long"))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    val got = Ranks.globalRowNumber(df, "rn", numRanges = 8,
        col("v").asc, col("id").asc)
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("ranks are a permutation of 1..n even when ranges collapse " +
      "(fewer distinct values than ranges)") {
    import spark.implicits._
    val df = Seq.fill(100)(7L).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val rns = Ranks.globalRowNumber(df, "rn", numRanges = 16,
        col("v").asc, col("id").asc)
      .select("rn").as[Long].collect().sorted
    assert(rns.toSeq === (1L to 100L))
  }

  test("the data-carrying row_number window is partitioned; only the " +
      "range-count prefix sum (a numRanges-row frame) is global") {
    val df = spark.range(2000).toDF("id")
      .withColumn("v", col("id") % 13)
    val ranked = Ranks.globalRowNumber(df, "rn", numRanges = 8,
      col("v").asc, col("id").asc)
    ranked.collect() // settle AQE
    val plan = ranked.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // AQE wraps materialized stages in QueryStageExec leaves — descend
    def deepCollect(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.window.WindowExec] =
      p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => Seq(w)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          deepCollect(q.plan)
      }.flatten
    val wins = deepCollect(plan)
    assert(wins.exists(_.partitionSpec.nonEmpty),
      "expected a __pid-partitioned row_number window")
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(!w.output.map(_.name).exists(Set("id", "v", "rn")),
        s"data frame dragged through a single-task window: $w")
    }
  }
}
