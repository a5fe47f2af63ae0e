package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** DataSource V2 SRI scan: envelope normalization, one-partition-per-page
  * parallelism, filter + column pushdown. */
class SriSourceSpec extends SparkSuite {

  private def writePages(): String = {
    val dir = Files.createTempDirectory("sripages").toString
    // page 0: expanded envelope (the standard list response)
    Files.writeString(Paths.get(s"$dir/page0.json"),
      """{"$$meta": {"next": "/a?offset=2"}, "results": [
        |  {"href": "/a/1", "$$expanded": {"key": "1",
        |    "$$meta": {"permalink": "/a/1", "type": "A",
        |               "modified": "2024-01-10T00:00:00.000Z"}, "v": 1}},
        |  {"href": "/a/2", "$$expanded": {"key": "2",
        |    "$$meta": {"permalink": "/a/2", "type": "A",
        |               "modified": "2024-01-22T00:00:00.000Z"}, "v": 2}}
        |]}""".stripMargin)
    // page 1: href-only entries (expand=NONE)
    Files.writeString(Paths.get(s"$dir/page1.json"),
      """{"$$meta": {}, "results": [{"href": "/a/3"}, {"href": "/a/4"}]}""")
    // page 2: plain array of resources, one tombstone
    Files.writeString(Paths.get(s"$dir/page2.json"),
      """[{"key": "5", "$$meta": {"permalink": "/a/5", "type": "A",
        |   "modified": "2024-01-25T00:00:00.000Z", "deleted": true}}]"""
        .stripMargin)
    dir
  }

  test("reads all three envelope shapes; one partition per page") {
    val df = spark.read.format("sri").option("pages", writePages()).load()
    assert(df.rdd.getNumPartitions === 3)
    val rows = df.orderBy("href").collect()
    assert(rows.map(_.getString(0)).toSeq ===
      Seq("/a/1", "/a/2", "/a/3", "/a/4", "/a/5"))
    // href-only rows: key derived, no jsondata
    val r3 = rows.find(_.getString(0) == "/a/3").get
    assert(r3.getString(1) === "3" && r3.isNullAt(3))
    // tombstone: resourcetype = deleted
    assert(rows.find(_.getString(0) == "/a/5").get.getString(4) === "deleted")
  }

  test("modifiedSince watermark filter is pushed and applied") {
    val df = spark.read.format("sri").option("pages", writePages()).load()
      .where(col("modified_ms") >= 1705795200000L) // 2024-01-21
    // only /a/2 (Jan 22) and /a/5 (Jan 25) qualify; href-only rows have
    // null modified and are correctly excluded by the watermark pass
    assert(df.select("href").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("/a/2", "/a/5"))
    // pushdown proof: the only post-scan filter left is isnotnull — the
    // >= comparison was consumed by the source
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains(">= 1705795200000"))
    assert(df.queryExecution.executedPlan.collectLeaves().head.toString
      .contains("SriScan") || plan.contains("BatchScan"))
  }

  test("conjoined modified_ms bounds push the tightest (max), not last-wins") {
    val df = spark.read.format("sri").option("pages", writePages()).load()
      .where(col("modified_ms") >= 1705795200000L)  // 2024-01-21
      .where(col("modified_ms") >= 1704067200000L)  // 2024-01-01, looser
    // both accepted by the source; the looser bound must not widen results
    assert(df.select("href").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("/a/2", "/a/5"))
  }

  test("tombstone-pass filter is pushed") {
    val df = spark.read.format("sri").option("pages", writePages()).load()
      .where(col("resourcetype") === "deleted")
    assert(df.select("href").collect().map(_.getString(0)).toSeq === Seq("/a/5"))
  }

  test("column pruning reaches the reader (expand=NONE analog)") {
    val df = spark.read.format("sri").option("pages", writePages()).load()
      .select("href")
    assert(df.schema.fieldNames.toSeq === Seq("href"))
    assert(df.count() === 5)
  }

  test("source feeds the delta merge end-to-end") {
    val src = spark.read.format("sri").option("pages", writePages()).load()
    val staged = src.where(col("resourcetype") =!= "deleted" &&
      col("jsondata").isNotNull)
    val tombs = src.where(col("resourcetype") === "deleted").select("href")
    val merged = ops.Merge.delta(
      staged.limit(0), staged, tombs)
    assert(merged.select("href").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("/a/1", "/a/2"))
  }
}
