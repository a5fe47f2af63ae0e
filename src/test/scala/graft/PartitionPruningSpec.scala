package graft

import org.apache.spark.sql.functions._

/** Partitioned layout + static pruning: the tenant/scope fence (P6) and
  * time filters become directory pruning when the target is written
  * partitioned — at 100 TB the difference between scanning one tenant-day
  * and scanning the lake. */
class PartitionPruningSpec extends SparkSuite {

  test("date-partitioned write prunes partitions for time predicates") {
    val base = java.nio.file.Files.createTempDirectory("part").toString
    Tables.sriEvents(spark, sfDir)
      .withColumn("day", from_unixtime(col("modified_ms") / 1000, "yyyy-MM-dd"))
      .write.partitionBy("day").mode("overwrite").parquet(s"$base/t")

    val df = spark.read.parquet(s"$base/t")
      .where(col("day") === "2024-01-05")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    // the partition filter must appear as PartitionFilters on the scan,
    // and the read should touch exactly one of the ~30 day directories
    assert(scan.contains("PartitionFilters") && scan.contains("2024-01-05"))
    val expect = Tables.sriEvents(spark, sfDir)
      .where(from_unixtime(col("modified_ms") / 1000, "yyyy-MM-dd") === "2024-01-05")
      .count()
    assert(df.count() === expect && expect > 0)
  }

  test("tenant-partitioned write prunes for the P6 scope fence") {
    val base = java.nio.file.Files.createTempDirectory("part2").toString
    Tables.sriEvents(spark, sfDir)
      .withColumn("path",
        when(col("key").cast("long") % 2 === 0, "events").otherwise("events_b"))
      .write.partitionBy("path").mode("overwrite").parquet(s"$base/t")
    val scoped = spark.read.parquet(s"$base/t").where(col("path") === "events")
    val scan = scoped.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters"))
    assert(scoped.count() ===
      Tables.sriEvents(spark, sfDir)
        .where(col("key").cast("long") % 2 === 0).count())
  }
}
