package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Tables
import Fixtures._

/** Round-6 additions: the streaming path's first ORACLE-GRADED query —
  * state-store dedup with watermark-bounded state, run as a real
  * Structured Streaming query inside the graded function (AvailableNow
  * drain into a memory sink, then the sink table is the batch answer the
  * oracle checks).
  */
object Pipeline6Queries {

  val queries: Map[String, Q] = Map(

    "stream_dedup_watermark" -> ((s, dir) => {
      // every event arrives TWICE (explode against a 2-element array —
      // the duplicate is in-stream, like an at-least-once source replay,
      // reference client.js:1808-1813 re-sync); the streaming dedup must
      // emit each event_id exactly once. The oracle is the exact distinct
      // of the same projection — so state-store semantics (first-arrival
      // emit, watermark-bounded state) are pinned against DuckDB.
      // Batch read first: supplies the schema AND sets the nanosAsLong
      // conf the TIMESTAMP(NANOS) scan needs.
      val schema = Tables.eventsRaw(s, dir).schema
      // the file-stream source requires a DIRECTORY basePath; the sf dirs
      // store events as a single file, so scope the directory scan with a
      // glob filter instead of pointing at the file
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
      val doubled = stream
        .select(col("event_id"), col("user_id"), col("event_type"),
          expr("ts div 1000000").as("ts_ms"))
        .withColumn("__copy", explode(array(lit(0), lit(1))))
        .drop("__copy")
        .withColumn("__evt", timestamp_millis(col("ts_ms")))
      val deduped = graft.streaming.StreamingSync
        .dedupWithinWatermark(doubled, Seq("event_id"), "__evt", "1 hour")
        .drop("__evt")
      // memory sink table names are session-global: make each invocation
      // unique so bench reruns and verify don't collide
      val name = "sdw_" + java.util.UUID.randomUUID().toString.replace("-", "")
      val ckpt = java.nio.file.Files.createTempDirectory("sdw_ckpt").toString
      val q = deduped.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table(name).orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map(

    "stream_dedup_watermark" ->
      // event_id is unique in `events`, so the doubled stream deduped by
      // event_id is exactly the source projection
      """SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
        |FROM events ORDER BY event_id""".stripMargin
  )
}
