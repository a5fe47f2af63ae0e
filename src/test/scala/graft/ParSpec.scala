package graft

import org.apache.spark.sql.functions._
import graft.ops.Par

/** Adaptive fan-out: repartitions under-split scan inputs, leaves
  * already-parallel or shuffle-derived inputs untouched, and never
  * executes upstream stages to find out. */
class ParSpec extends SparkSuite {

  private def parts(df: org.apache.spark.sql.DataFrame): Int =
    df.rdd.getNumPartitions

  test("single-file parquet scan fans out to the cluster's slots") {
    val docs = Tables.documents(spark, sfDir)
    assert(parts(docs) < spark.sparkContext.defaultParallelism)
    assert(parts(Par.fanOut(docs)) === spark.sparkContext.defaultParallelism)
  }

  test("union of scans fans out") {
    val d = Tables.documents(spark, sfDir)
    val u = d.unionByName(d)
    assert(parts(Par.fanOut(u)) === spark.sparkContext.defaultParallelism)
  }

  test("checkpointed input fans out (RDD leaf partition count is free)") {
    val ck = Tables.documents(spark, sfDir).localCheckpoint()
    assert(parts(Par.fanOut(ck)) === spark.sparkContext.defaultParallelism)
  }

  test("shuffle-derived input is left untouched") {
    val agg = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
    assert(Par.fanOut(agg) eq agg)
  }
}
