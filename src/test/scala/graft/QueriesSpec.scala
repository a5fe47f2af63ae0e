package graft

/** Smoke: every declared query runs and every query has a matching oracle.
  * Value-level correctness is checked against DuckDB by tools/check.py /
  * the driver's t2 gate. */
class QueriesSpec extends SparkSuite {

  test("every oracle has a query; only hash-dependent queries lack oracles") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // xxhash64/sketch-dependent ops are rows-only checked by design
    assert(noOracle === Set("dd_minhash_lsh_xx", "dd_simhash_xx", "sim_lsh_topk",
      "approx_distinct", "approx_percentile", "approx_hll_merge"))
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
