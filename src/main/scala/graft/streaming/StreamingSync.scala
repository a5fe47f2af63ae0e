package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.ops.{Dedup, Merge}
import graft.runner.TargetTable

/** T3/T6/T7 — push-triggered incremental sync as Structured Streaming.
  *
  * The reference's socket.io trigger (client.js:1981-2047) fires a
  * deltaSync per `update` event; in Spark terms each micro-batch IS one
  * delta: `readStream → foreachBatch(merge into target)`. The engine's
  * merge algebra is reused verbatim — batch and streaming share one
  * implementation (T7 late-data handling = keep-latest dedup inside the
  * merge; the source watermark bounds state).
  *
  * `Trigger.AvailableNow` gives the batch-incremental mode (drain all
  * pending input, then stop) — the direct analog of one CLI `deltaSync`
  * invocation; `Trigger.ProcessingTime` gives the timer mode
  * (README.md:138). Exactly-once: foreachBatch may retry a batch after a
  * failure, and the merge is idempotent by key (T6), so replays converge.
  */
object StreamingSync {

  /** Start a streaming delta-merge from a file-backed resource stream.
    *
    * @param stream   streaming DataFrame in SRI row shape
    *                 (href/key/modified_ms/jsondata/resourcetype)
    * @param isTombstone row predicate marking delete events (T2)
    * @param target   merge target (parquet locally, JDBC at deployment)
    */
  def deltaMergeStream(spark: SparkSession, stream: DataFrame,
                       isTombstone: org.apache.spark.sql.Column,
                       target: TargetTable,
                       checkpoint: String,
                       keys: Seq[String] = Seq("href"),
                       modified: String = "modified_ms",
                       trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val staged = batch.where(!isTombstone)
        val tombs = batch.where(isTombstone).select(keys.map(col): _*)
        val current =
          if (target.exists) target.read(spark)
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            staged.schema)
        target.overwrite(Merge.delta(current, staged, tombs, keys, modified))
        ()
      }
      .start()

  /** Stateful per-key latest-version stream (mapGroupsWithState analog of
    * the keep-latest merge) — emits the current winner per href whenever
    * it changes. Demonstrates custom state semantics beyond windowing. */
  def latestPerKey(spark: SparkSession, stream: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = stream.select("href", "modified_ms", "jsondata")
      .as[(String, Long, String)]
    // same winner as Dedup.keepLatest / LatestAggregator: max modified_ms,
    // ties broken by SMALLEST jsondata with null first (null-safe — a
    // plain tuple maxBy would NPE on null payloads and pick the opposite
    // tie winner from the batch path)
    def newer(a: (String, Long, String), b: (String, Long, String)) = {
      val c = java.lang.Long.compare(a._2, b._2)
      if (c > 0) a else if (c < 0) b
      else if (Ordering[Option[String]].lt(Option(a._3), Option(b._3))) a
      else b
    }
    typed.groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (href: String, rows: Iterator[(String, Long, String)],
         state: GroupState[(Long, String)]) =>
          val newest = (rows ++ state.getOption.iterator
            .map { case (m, j) => (href, m, j) })
            .reduce(newer)
          state.update((newest._2, newest._3))
          (href, newest._2, newest._3)
      }
      .toDF("href", "modified_ms", "jsondata")
  }

  /** Event-time sessionization with custom state (flatMapGroupsWithState):
    * per user, events closer than `gapMs` belong to one session; a closed
    * session emits (user_id, session_start_ms, n_events). Sessions close
    * either when a later in-batch event overshoots the gap, or via
    * event-time timeout once the watermark passes the open session's
    * gap horizon (so state is bounded — the requirement that makes this
    * run forever at scale). Gap semantics match the batch win_session
    * query: a gap of exactly `gapMs` starts a new session. */
  def sessionize(spark: SparkSession, stream: DataFrame,
                 gapMs: Long): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    // the watermarked event-time column must survive into the stateful
    // operator's input (Spark checks for it), so `ts` rides along
    val typed = stream
      .withWatermark("ts", "2 hours")
      .select(col("user_id").cast("long").as("user_id"),
        unix_millis(col("ts")).as("ms"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Long, Long)]) => // (start, last, n)
          if (!rows.hasNext && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator((uid, s._1, s._3))
          } else {
            // per-batch arrival order is not time order: sort before folding
            val sorted = rows.map(_._2).toArray.sorted
            val closed = List.newBuilder[(Long, Long, Long)]
            var cur = state.getOption.orNull
            sorted.foreach { ms =>
              cur =
                if (cur == null) (ms, ms, 1L)
                else if (ms - cur._2 >= gapMs) { closed += cur; (ms, ms, 1L) }
                else (cur._1, ms, cur._3 + 1)
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur._2 + gapMs)
            }
            closed.result().iterator.map(s => (uid, s._1, s._3))
          }
      }
      .toDF("user_id", "session_start_ms", "n_events")
  }
}
