package graft

import org.apache.spark.sql.functions._
import graft.runner.ParquetTarget
import graft.streaming.StreamingSync

/** Streaming delta merge: file-backed micro-batches drive the same merge
  * algebra as batch sync (T3/T6/T7). */
class StreamingSpec extends SparkSuite {

  test("deltaMergeStream drains pending input and merges into target") {
    val base = java.nio.file.Files.createTempDirectory("stream").toString
    // stage the sri-shaped events as the stream input
    val sri = Tables.sriEvents(spark, sfDir)
    sri.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(sri.schema).parquet(s"$base/in")
    val target = new ParquetTarget(spark, s"$base/table")

    val q = StreamingSync.deltaMergeStream(spark, stream,
      isTombstone = col("resourcetype") === "error",
      target = target, checkpoint = s"$base/ckpt")
    q.awaitTermination(120000)

    val got = target.read(spark)
    val expect = sri.where(col("resourcetype") =!= "error")
    assert(got.count() === expect.count())
    assert(got.where(col("resourcetype") === "error").count() === 0)
  }

  test("watermarked tumbling-window aggregation in append mode (T8 streaming)") {
    val base = java.nio.file.Files.createTempDirectory("stream3").toString
    val ev = Tables.events(spark, sfDir)
      .select(timestamp_millis(col("ts_ms")).as("ts"), col("event_type"),
        col("value"))
    ev.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(
        spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // append mode emits only watermark-closed windows; each emitted row
    // must be FINAL, i.e. identical to the batch aggregation of its window
    val emitted = spark.sql(
        "select unix_millis(window.start) ws, event_type, n from winagg")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(emitted.nonEmpty)
    val batchAll = Tables.events(spark, sfDir)
      .groupBy(expr("ts_ms div 3600000 * 3600000").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(emitted.subsetOf(batchAll),
      s"emitted windows disagree with batch: ${emitted.diff(batchAll).take(3)}")
  }

  test("latestPerKey emits the max-modified version per href") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream2").toString
    val in = Seq(
      ("/a/1", 100L, "v1", "t"), ("/a/1", 300L, "v3", "t"),
      ("/a/2", 50L, "w1", "t"), ("/a/1", 200L, "v2", "t"))
      .toDF("href", "modified_ms", "jsondata", "resourcetype")
    in.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(in.schema).parquet(s"$base/in")

    val out = StreamingSync.latestPerKey(spark, stream)
    val q = out.writeStream.format("memory").queryName("latest")
      .outputMode("update")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val rows = spark.sql("select * from latest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rows.contains(("/a/1", 300L, "v3")))
    assert(rows.contains(("/a/2", 50L, "w1")))
  }
}
