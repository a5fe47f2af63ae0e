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

  test("joinApplyDeltaA maintains a join view through deletes, bag-exact") {
    import spark.implicits._
    // duplicate rows on both sides: exceptAll must remove exactly the
    // retracted MULTISET, not all matching rows
    val aOld = Seq((1, "x"), (1, "x"), (1, "y"), (2, "z"))
      .toDF("k", "av")
    val b = Seq((1, "p"), (1, "p"), (2, "q")).toDF("k", "bv")
    val dDel = Seq((1, "x")).toDF("k", "av")       // one of the two (1,x)
    val dIns = Seq((2, "w"), (3, "n")).toDF("k", "av")
    val aNew = aOld.exceptAll(dDel).unionByName(dIns)
    val vOld = aOld.join(b, Seq("k"))
    val maintained = IncrementalAgg.joinApplyDeltaA(
      vOld, dIns, dDel, b, Seq("k"))
    def canonRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
    assert(canonRows(maintained) === canonRows(aNew.join(b, Seq("k"))))
    // the surviving (1,x) keeps BOTH its b partners; the deleted one lost
    // exactly two pairs
    assert(maintained.where($"av" === "x").count() === 2)
  }
}
