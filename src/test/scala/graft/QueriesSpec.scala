package graft

/** Smoke: every declared query runs and every query has a matching oracle.
  * Value-level correctness is checked against DuckDB by tools/check.py /
  * the driver's t2 gate. */
class QueriesSpec extends SparkSuite {

  test("every oracle has a query and every query has an oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // since r5 the sketch/hash-family queries grade deterministic
    // invariants (error-bound booleans, planted-pair membership, literal
    // plane matrices), so the oracle map covers EVERY query
    assert((SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet) === Set.empty)
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
