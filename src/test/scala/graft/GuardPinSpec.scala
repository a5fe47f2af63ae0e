package graft

import org.apache.spark.sql.functions._

import graft.ops.Pin

/** r15 (VERDICT r14 #1): the lazy-pin single-reference discipline is
  * load-bearing — a `Pin.lazily` frame referenced more than once by its
  * materializing job recomputes the whole pinned subtree per reference
  * (measured on louvain's 3-ref `cand`: 13 → 18-20 s). This spec pins
  * the [[Pin.rddRefCount]] guard against both shapes so any new
  * lazy-pin site can assert its consumer's reference count in a test
  * instead of relying on a comment. */
class GuardPinSpec extends SparkSuite {

  test("rddRefCount: a single full-scan consumer of a lazy pin counts " +
      "1; a self-join (double reference) counts 2") {
    val base = spark.range(0, 1000)
      .select(col("id"), (col("id") % 7).as("k"))
    val lp = Pin.lazily(
      base.groupBy("k").agg(count(lit(1)).as("n")).toDF())
    // the legal shape: one full-scan consumer
    val single = lp.agg(sum(col("n")))
    assert(Pin.rddRefCount(single, lp) === 1,
      "a single aggregate consumer must reference the pin exactly once")
    // the forbidden shape: two references inside one consuming plan
    val doubled = lp.select(col("k"), col("n").as("na"))
      .join(lp.select(col("k"), col("n").as("nb")), Seq("k"))
      .agg(sum(col("na") + col("nb")))
    assert(Pin.rddRefCount(doubled, lp) === 2,
      "a self-joined consumer must be detected as a double reference " +
        "(it would recompute the pinned subtree twice before " +
        "materialization)")
  }

  test("rddRefCount: eager pins count the same way; non-pinned frames " +
      "report -1") {
    val base = spark.range(0, 100)
      .select(col("id"), (col("id") % 3).as("k"))
    val ep = base.groupBy("k").agg(count(lit(1)).as("n")).toDF()
      .localCheckpoint()
    assert(Pin.rddRefCount(ep.agg(sum(col("n"))), ep) === 1)
    assert(Pin.rddRefCount(base.agg(sum(col("k"))), base) === -1,
      "a frame that is not a checkpoint leaf must report -1")
  }
}
