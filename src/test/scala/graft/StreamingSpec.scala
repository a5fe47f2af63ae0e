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

  // batch-side sessions with the same gap semantics as win_session /
  // StreamingSync.sessionize: gap >= 30min breaks the session.
  // Returns (user_id, start_ms, last_ms, n).
  private def batchSessions(): Set[(Long, Long, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts_ms")
    Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts_ms"))
      .withColumn("brk",
        when(col("ts_ms") - lag("ts_ms", 1).over(w) >= 1800000L ||
          lag("ts_ms", 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts_ms").as("start"), max("ts_ms").as("last"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
  }

  test("flatMapGroupsWithState sessionization matches batch win_session") {
    val base = java.nio.file.Files.createTempDirectory("stream4").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), timestamp_millis(col("ts_ms")).as("ts"))
    ev.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(
      spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")

    val out = streaming.StreamingSync.sessionize(spark, stream, 1800000L)
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val emitted = spark.sql("select * from sess").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the final watermark is max event time - 2h delay; exactly the
    // sessions whose gap horizon the watermark STRICTLY passed must have
    // flushed (matching the sessionize flush predicate)
    val batch = batchSessions()
    val maxTs = Tables.events(spark, sfDir).agg(max("ts_ms")).head.getLong(0)
    val finalWm = maxTs - 7200000L
    val expected = batch.filter(s => s._3 + 1800000L < finalWm)
      .map(s => (s._1, s._2, s._4))
    assert(emitted === expected,
      s"missing=${expected.diff(emitted).take(3)} " +
        s"extra=${emitted.diff(expected).take(3)}")
  }

  test("sessionize merges late events across a checkpointed restart") {
    // two AvailableNow runs against the SAME checkpoint: run 1 sees the
    // older 60% of events, run 2 the rest. Sessions spanning the cut (and
    // run-2 events that are late w.r.t. run 1's data but inside the 2h
    // allowed lateness) must merge into run-1 state restored from the
    // checkpoint — the union of both runs' emissions has to equal the
    // single-run / batch result under the final watermark.
    val base = java.nio.file.Files.createTempDirectory("stream7").toString
    val ev = Tables.events(spark, sfDir).select(col("user_id"), col("ts_ms"))
    val (mn, mx) = {
      val r = ev.agg(min("ts_ms"), max("ts_ms")).head
      (r.getLong(0), r.getLong(1))
    }
    val cut = mn + (mx - mn) * 3 / 5
    def phase(pred: org.apache.spark.sql.Column): Unit =
      ev.where(pred)
        .select(col("user_id"), timestamp_millis(col("ts_ms")).as("ts"))
        .write.mode("append").parquet(s"$base/in")
    // file sink (memory sink refuses checkpoint recovery); emissions
    // accumulate in $base/out across both runs
    def run(): Set[(Long, Long, Long)] = {
      val stream = spark.readStream.schema(
        spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")
      val q = StreamingSync.sessionize(spark, stream, 1800000L)
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.read.parquet(s"$base/out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    phase(col("ts_ms") < cut)
    val p1 = run()
    phase(col("ts_ms") >= cut)
    val p2 = run() // cumulative: includes run 1's files

    val batch = batchSessions()
    val finalWm = mx - 7200000L
    val expected = batch.filter(s => s._3 + 1800000L < finalWm)
      .map(s => (s._1, s._2, s._4))
    val emitted = p2 // file sink accumulates: p2 ⊇ p1
    assert(emitted === expected,
      s"missing=${expected.diff(emitted).take(3)} " +
        s"extra=${emitted.diff(expected).take(3)}")
    // run 1 must have flushed something, run 2 must have added more, and
    // some run-2 emission must come from state RESTORED from run 1's
    // checkpoint (a session that started before the cut but was only
    // flushed after run 2 advanced the watermark)
    assert(p1.nonEmpty && p2.size > p1.size)
    assert((p2 -- p1).exists(_._2 < cut),
      "no run-2 emission used state carried across the restart")
  }

  test("dedupWithinWatermark drops out-of-order replays across a " +
      "checkpointed restart") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream8").toString
    def phase(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("event_id", "ts_ms")
        .select(col("event_id"), timestamp_millis(col("ts_ms")).as("ts"))
        .coalesce(1).write.mode("append").parquet(s"$base/in")
    def run(): Seq[Long] = {
      val stream = spark.readStream.schema(
        spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")
      val q = StreamingSync
        .dedupWithinWatermark(stream, Seq("event_id"), "ts", "1 hour")
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.read.parquet(s"$base/out")
        .select("event_id").as[Long].collect().toSeq
    }
    val t0 = 1700000000000L
    // drain 1: out-of-order arrivals (2 before 1) and an in-batch
    // duplicate of 1 — each id emits exactly once, on first sight
    phase(Seq((2L, t0 + 120000L), (1L, t0 + 60000L),
      (1L, t0 + 60000L), (3L, t0 + 180000L)))
    val p1 = run()
    assert(p1.sorted === Seq(1L, 2L, 3L), s"drain 1 emitted $p1")
    // drain 2: late replays of 1 and 2 (an at-least-once source re-read;
    // still inside the 1h watermark horizon, so their state survived the
    // restart via the checkpoint) + one genuinely new event
    phase(Seq((4L, t0 + 300000L), (2L, t0 + 120000L), (1L, t0 + 60000L)))
    val p2 = run()
    assert(p2.sorted === Seq(1L, 2L, 3L, 4L),
      s"replays crossed the checkpointed restart: $p2")
  }

  test("native session_window streaming aggregation emits final sessions") {
    val base = java.nio.file.Files.createTempDirectory("stream5").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), timestamp_millis(col("ts_ms")).as("ts"))
    ev.write.mode("overwrite").parquet(s"$base/in")
    val stream = spark.readStream.schema(
      spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")

    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("sesswin")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val emitted = spark.sql(
        "select user_id, unix_millis(session_window.start) s, n from sesswin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(emitted.nonEmpty)
    // session_window's gap is exclusive (> 30min breaks) vs win_session's
    // inclusive >=; on the fixture's ms-resolution data exact-30min gaps
    // are vanishingly rare, so closed windows must match batch sessions
    val batch = batchSessions().map(s => (s._1, s._2, s._4))
    assert(emitted.subsetOf(batch),
      s"session_window disagrees with batch: ${emitted.diff(batch).take(3)}")
  }

  test("stream-stream interval join matches the batch range join") {
    val base = java.nio.file.Files.createTempDirectory("stream6").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        timestamp_millis(col("ts_ms")).as("ts"))
    ev.write.mode("overwrite").parquet(s"$base/in")
    def src() = spark.readStream.schema(
      spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")

    // purchases joined to the same user's clicks within the prior hour —
    // the streaming form of range_join_prior_clicks. Watermarks bound the
    // join state: clicks older than (purchase watermark - 1h) are dropped.
    val purchases = src().where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = src().where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val joined = purchases.join(clicks,
      expr("p_user = c_user AND c_ts >= p_ts - INTERVAL 1 HOUR AND c_ts < p_ts"))
      .select(col("p_id"), col("c_id"))

    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val emitted = spark.sql("select * from ssjoin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bev = Tables.events(spark, sfDir)
    val bp = bev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts_ms").as("p_ms"))
    val bc = bev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts_ms").as("c_ms"))
    val batch = bp.join(bc,
        expr("p_user = c_user AND c_ms >= p_ms - 3600000 AND c_ms < p_ms"))
      .select("p_id", "c_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(emitted === batch,
      s"missing=${batch.diff(emitted).take(3)} extra=${emitted.diff(batch).take(3)}")
  }

  test("streaming dedup within watermark dedups the overlap re-read") {
    // T1/T7: the delta overlap re-read produces duplicate hrefs.
    // dropDuplicatesWithinWatermark is the state-BOUNDED form: plain
    // dropDuplicates("href") would keep one state entry per href forever
    // (watermark eviction only applies when the event-time column is in
    // the dedup keys); the overlap window is what needs covering, and it
    // is bounded by the watermark delay by construction
    val base = java.nio.file.Files.createTempDirectory("stream7").toString
    val feed = Tables.sriEvents(spark, sfDir)
      .select(col("href"), timestamp_millis(col("modified_ms")).as("mts"))
    // stage the feed twice = a 100% overlap between consecutive pages
    feed.write.mode("overwrite").parquet(s"$base/in")
    feed.write.mode("append").parquet(s"$base/in")
    val stream = spark.readStream.schema(
      spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")
    val q = stream
      .withWatermark("mts", "1 hour")
      .dropDuplicatesWithinWatermark("href")
      .writeStream.format("memory").queryName("dedupst")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.sql("select count(distinct href) c, count(*) n from dedupst")
      .collect().head
    assert(n.getLong(0) === n.getLong(1), "duplicates survived the dedup")
    assert(n.getLong(1) === feed.select("href").distinct().count())
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

  test("latestPerKey: a LATE out-of-order arrival in a second micro-batch " +
      "cannot regress the stored winner") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream3").toString
    val cols = Seq("href", "modified_ms", "jsondata", "resourcetype")
    val b1 = Seq(("/a/1", 300L, "v3", "t"), ("/a/2", 50L, "w1", "t"))
      .toDF(cols: _*)
    b1.write.mode("append").parquet(s"$base/in")
    val stream = spark.readStream.schema(
      spark.read.parquet(s"$base/in").schema).parquet(s"$base/in")
    val out = StreamingSync.latestPerKey(spark, stream)
    // memory sink refuses to recover from an existing checkpoint, so the
    // cross-restart scenario needs a recoverable sink: foreachBatch into
    // a driver-side buffer (test-only; the buffer is the observation
    // point, the state under test lives in the checkpointed state store)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[
      (String, Long, String)]()
    def drain(): Unit = {
      val q = out.writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => emitted.add(
            (r.getString(0), r.getLong(1), r.getString(2)))); ()
        }
        .outputMode("update")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000); ()
    }
    drain()
    emitted.clear()
    // batch 2 is event-time OLDER for /a/1 (a replayed stale version —
    // must lose to the checkpointed state) and newer for /a/2 (must win)
    Seq(("/a/1", 200L, "v2", "t"), ("/a/2", 80L, "w2", "t"))
      .toDF(cols: _*).write.mode("append").parquet(s"$base/in")
    drain()
    import scala.jdk.CollectionConverters._
    val rows = emitted.asScala.toSet
    assert(rows === Set(("/a/1", 300L, "v3"), ("/a/2", 80L, "w2")),
      "state must keep /a/1's newer version and advance /a/2")
  }
}
