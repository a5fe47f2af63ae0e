package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.runner._

/** Reproduction of the reference's own E2E test (test/index.mjs:23-77,
  * 192-206): a fake SRI API serving 10 resources /a/1..10, paginated 3 per
  * page via $$meta.next; after a fullSync the write table holds 10 rows
  * and the sync-state store holds 1 row for the FULL sync type. */
class ReferenceParitySpec extends SparkSuite {

  private def writeFakeApi(): String = {
    val dir = Files.createTempDirectory("fakeapi").toString
    val pages = (1 to 10).grouped(3).zipWithIndex.toSeq
    pages.foreach { case (keys, i) =>
      val results = keys.map { k =>
        s"""{"href": "/a/$k", "$$$$expanded": {"key": "$k",
           |  "name": "Name of resource /a",
           |  "$$$$meta": {"permalink": "/a/$k", "type": "_A",
           |    "modified": "2024-01-0${(k - 1) % 9 + 1}T00:00:00.000Z"}}}"""
          .stripMargin
      }.mkString(",")
      val next =
        if (i < pages.size - 1) s""""next": "/a?offset=${(i + 1) * 3}&limit=3","""
        else ""
      Files.writeString(Paths.get(f"$dir/page$i%02d.json"),
        s"""{"$$$$meta": {$next "current": "/a?limit=3"},
           |"results": [$results]}""".stripMargin)
    }
    dir
  }

  test("fullSync of the reference's 10-resource fake API: 10 rows + 1 state row") {
    val base = Files.createTempDirectory("parity").toString
    val api = writeFakeApi()
    val src = spark.read.format("sri").option("pages", api).load()
    assert(src.rdd.getNumPartitions === 4) // 10 resources, 3 per page

    val runner = new SyncRunner(spark, SyncConfig("sri2db_large", s"$base/state"))
    val target = new ParquetTarget(spark, s"$base/sri2db_large")
    val result = runner.fullSync(src, target)

    // reference assertion 1: count(sri2db_large) = 10
    assert(result.rowsAfter === 10)
    val rows = target.read(spark)
    assert(rows.select("href").collect().map(_.getString(0)).sorted.toSeq ===
      (1 to 10).map(k => s"/a/$k").sorted)
    // row shape matches the reference's table: key, jsondata, modified set
    assert(rows.where(col("key").isNull || col("jsondata").isNull ||
      col("modified_ms").isNull).count() === 0)
    assert(rows.select("resourcetype").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("_A"))

    // reference assertion 2: count(sri2db_synctimes) = 1 after recording
    ops.Watermark.writeState(spark, s"$base/state", "sri2db_large",
      SyncType.Full, SyncState(result.elapsedMs, System.currentTimeMillis()))
    assert(spark.read.parquet(s"$base/state").count() === 1)

    // legacy suite invariant (README.md:299-358): re-saving the same
    // resources is idempotent
    val again = runner.fullSync(src, target)
    assert(again.rowsAfter === 10)
  }
}
