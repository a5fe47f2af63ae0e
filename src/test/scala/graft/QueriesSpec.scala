package graft

/** Smoke: every declared query runs and every query has a matching oracle.
  * Value-level correctness is checked against DuckDB by tools/check.py /
  * the driver's t2 gate. */
class QueriesSpec extends SparkSuite {

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet)
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      df.count() // forces full execution
    }
  }
}
