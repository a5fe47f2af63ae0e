package graft

import org.apache.spark.sql.functions._
import graft.ops.IncrementalAgg
import graft.queries.Fixtures

/** merge(agg(base), agg(delta)) == agg(all), including retraction. */
class IncrementalAggSpec extends SparkSuite {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("event_type", "cnt", "sum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("incremental merge equals full aggregation for any split") {
    val ev = Tables.events(spark, sfDir).withColumn("v", Fixtures.cents("value"))
    val full = canon(IncrementalAgg.partial(ev, Seq("event_type"), "v"))
    Seq(1705795200000L, 1706227200000L, 0L).foreach { cut =>
      val base = ev.where(col("ts_ms") < cut)
      val delta = ev.where(col("ts_ms") >= cut)
      val merged = IncrementalAgg.merge(
        IncrementalAgg.partial(base, Seq("event_type"), "v"),
        IncrementalAgg.partial(delta, Seq("event_type"), "v"),
        Seq("event_type"))
      assert(canon(merged) === full, s"cut=$cut")
    }
  }

  test("retraction removes deleted rows; fully-retracted groups vanish") {
    val ev = Tables.events(spark, sfDir).withColumn("v", Fixtures.cents("value"))
    val full = IncrementalAgg.partial(ev, Seq("event_type"), "v")
    val errors = ev.where(col("event_type") === "error")
    val after = IncrementalAgg.merge(full,
      IncrementalAgg.retract(errors, Seq("event_type"), "v"), Seq("event_type"))
    val expect = canon(IncrementalAgg.partial(
      ev.where(col("event_type") =!= "error"), Seq("event_type"), "v"))
    assert(canon(after) === expect)
    assert(after.where(col("event_type") === "error").count() === 0)
  }
}
