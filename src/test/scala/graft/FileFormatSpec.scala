package graft

import org.apache.spark.sql.functions._

/** Source/sink format breadth (SURVEY §2.12 "file formats — none in the
  * reference; ours from Spark built-ins"): the SRI row shape round-trips
  * losslessly through every columnar/text format the engine is expected
  * to ingest from or land to, including partitioned layout with partition
  * pruning on read. */
class FileFormatSpec extends SparkSuite {

  private lazy val feed = Tables.sriEvents(spark, sfDir).limit(500).cache()

  private def roundTrip(fmt: String,
                        opts: Map[String, String] = Map.empty): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"fmt_$fmt").toString
    feed.write.format(fmt).options(opts).mode("overwrite").save(s"$dir/t")
    val back = spark.read.format(fmt).options(opts)
      .schema(feed.schema) // text formats would otherwise re-infer types
      .load(s"$dir/t")
    assert(back.count() === feed.count(), s"$fmt lost rows")
    val a = feed.orderBy("href").collect().map(_.toSeq)
    val b = back.orderBy("href").collect().map(_.toSeq)
    assert(a.zip(b).forall { case (x, y) => x == y }, s"$fmt altered values")
  }

  test("parquet round-trip")(roundTrip("parquet"))
  test("orc round-trip")(roundTrip("orc"))
  test("json round-trip")(roundTrip("json"))
  test("csv round-trip")(
    roundTrip("csv", Map("header" -> "true", "quote" -> "\"", "escape" -> "\"")))

  test("partitioned write + partition pruning on read") {
    val dir = java.nio.file.Files.createTempDirectory("fmt_part").toString
    feed.write.partitionBy("resourcetype").mode("overwrite")
      .parquet(s"$dir/t")
    val pruned = spark.read.parquet(s"$dir/t")
      .where(col("resourcetype") === "purchase")
    // the filter must become a partition filter, not a data filter
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    val pf = scan.head.metadata("PartitionFilters")
    assert(pf.contains("resourcetype"), s"not pruned: $pf")
    assert(pruned.count() ===
      feed.where(col("resourcetype") === "purchase").count())
  }
}
