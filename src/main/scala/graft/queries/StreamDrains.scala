package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The four graded streaming pipelines as TRANSFORM-ONLY functions plus
  * the shared memory-sink drain — factored out so the graded queries
  * (single-file source, one microbatch) and the split-drain contract
  * specs (`StreamSplitDrainSpec`: maxFilesPerTrigger=1 over a
  * time-split multi-file copy) drive the IDENTICAL pipeline code.
  *
  * Multi-batch contract: each pipeline's graded answer is reproduced by
  * a split drain whenever cross-batch event-time disorder is bounded by
  * the watermark delay — which is precisely what a watermark ASSERTS,
  * and what time-partitioned event logs (the 100 TB layout: hourly/daily
  * files replayed in order) deliver. Under that bound:
  *  - dedup: the duplicate copies are intra-row (same batch), and no
  *    admitted row is older than the watermark, so nothing drops;
  *  - tumbling/session windows: a window/session finalizes only once
  *    the watermark passes its end, and every later-batch row is >= the
  *    watermark, so it can only open a LATER window/session — finalized
  *    results never miss rows;
  *  - latest-per-key emits one state snapshot per touched key per batch
  *    (update mode); snapshots are monotone under the keep-latest order,
  *    so the post-drain [[graft.ops.Dedup.keepLatest]] reduce collapses
  *    them to exactly the final state (a no-op on a one-batch drain).
  * `StreamSplitDrainSpec` proves split-drain == graded answer for all
  * four pipelines and asserts the drain really split (>= 3 batches).
  */
private[graft] object StreamDrains {

  /** State-store dedup over a doubled stream (at-least-once replay,
    * reference client.js:1808-1813 re-sync): each event arrives twice
    * intra-row; the streaming dedup must emit each event_id once. */
  def dedupPipeline(stream: DataFrame): DataFrame = {
    val doubled = stream
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_millis(col("ts").cast("timestamp")).as("ts_ms"))
      .withColumn("__copy", explode(array(lit(0), lit(1))))
      .drop("__copy")
      .withColumn("__evt", timestamp_millis(col("ts_ms")))
    graft.streaming.StreamingSync
      .dedupWithinWatermark(doubled, Seq("event_id"), "__evt", "1 hour")
      .drop("__evt")
  }

  /** Watermark-FINALIZED tumbling windows: append mode emits a window
    * only once the watermark passes its end, so every row is final. */
  def winFinalPipeline(stream: DataFrame): DataFrame =
    stream
      .select(col("ts").cast("timestamp").as("ts"), col("event_type"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_millis(col("window.start")).as("ws"),
        col("event_type"), col("n"))

  /** Keep-latest state (mapGroupsWithState) over a doubled, sync-shaped
    * projection — emits the running winner per key each touched batch. */
  def latestPipeline(s: SparkSession, stream: DataFrame): DataFrame = {
    val shaped = stream
      .select(col("user_id").cast("string").as("href"),
        unix_millis(col("ts").cast("timestamp")).as("modified_ms"),
        col("event_type").as("jsondata"))
      .withColumn("__copy", explode(array(lit(0), lit(1))))
      .drop("__copy")
    graft.streaming.StreamingSync.latestPerKey(s, shaped)
  }

  /** Watermark-finalized MERGING session windows (30 min gap). */
  def sessionFinalPipeline(stream: DataFrame): DataFrame =
    stream
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("session_start_ms"),
        col("n_events"))

  /** Stream-stream interval join (conversion pairing): purchases bind
    * to every click of the same user in the preceding 30 minutes —
    * both sides filters of ONE input stream (a watermarked self-join),
    * the last big stateful-streaming shape (joins alongside dedup,
    * windows, and arbitrary state). Inner joins emit on match, no
    * finalization wait; each side's state is bounded by its watermark
    * plus the join range, which is the 100 TB story: state size is
    * (watermark delay + 30 min) of traffic, never the stream.
    *
    * Multi-batch contract (same bounded-disorder argument as the
    * header): a click's state survives until the watermark passes
    * cts + 30 min; the watermark lags max event time by 1 h, so any
    * purchase that could still match (pts ≤ cts + 30 min) arrives
    * while the click is live — no pair is lost to a split. */
  def joinPipeline(stream: DataFrame): DataFrame = {
    val base = stream.select(col("event_id"), col("user_id"),
      col("event_type"), col("ts").cast("timestamp").as("ts"))
    val clicks = base.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"),
        col("event_id").as("click_id"), col("ts").as("cts"))
      .withWatermark("cts", "1 hour")
    val purchases = base.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"),
        col("event_id").as("purchase_id"), col("ts").as("pts"))
      .withWatermark("pts", "1 hour")
    clicks.join(purchases,
        expr("c_user = p_user AND pts >= cts AND " +
          "pts <= cts + interval 30 minutes"))
      .select(col("click_id"), col("purchase_id"),
        col("c_user").as("user_id"),
        unix_millis(col("cts")).as("cts_ms"),
        unix_millis(col("pts")).as("pts_ms"))
  }

  /** Update-mode emission leaves one snapshot per key per touched batch;
    * snapshots are monotone under the keep-latest order (each is the
    * state AFTER absorbing its batch), so the batch keep-latest reduce
    * returns exactly the final state. Identity on a one-batch drain. */
  /** Streaming count-min sketch: the cell grid IS the aggregation
    * state, so a complete-mode drain needs no watermark and carries a
    * HARD state bound of depth×width cells no matter how many distinct
    * keys stream past — the textbook bounded-memory streaming-sketch
    * regime (the batch twin is approx_cms_est; cells merge by
    * addition, so the final complete-mode emission equals the batch
    * sketch for ANY batching of the input). */
  def cmsPipeline(stream: DataFrame): DataFrame =
    graft.ops.Freq.countMinSketch(
      stream.select(col("user_id")), "user_id",
      depth = 4, width = 64, salt = "cms")

  /** Streaming KMV bottom-k distinct sketch per event type: the
    * [[graft.expr.KmvBottomK]] Aggregator's buffer IS the per-group
    * state — hard-bounded at k entries per group like the cms grid
    * (state sized by the SKETCH, not the distinct-user space), and
    * because merge is the semilattice join, the complete-mode final
    * emission equals the batch [[graft.ops.Freq.bottomK]] for ANY
    * batching of the input (Round23/StreamSplitDrain contract). */
  def kmvPipeline(stream: DataFrame): DataFrame = {
    graft.expr.GraftFunctions.register(stream.sparkSession)
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.expr.KmvBottomK(8))
    stream.select(col("event_type").as("grp"),
        graft.expr.GraftFunctions
          .java_hash_u32(col("user_id").cast("string")).as("hu"),
        col("user_id").cast("string").as("k_key"))
      .groupBy("grp").agg(agg(col("hu"), col("k_key")).as("sk"))
  }

  /** Streaming per-group top-k spend events: the
    * [[graft.expr.TopKAggregator]] buffer (≤ k (value, id) pairs per
    * group) IS the state — hard-bounded like the cms grid / kmv
    * buffer — and merge is a k+k trim over the (value DESC, id ASC)
    * total order, so the complete-mode final emission equals the batch
    * top-k for ANY batching of the input. */
  def topkPipeline(stream: DataFrame, k: Int): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(
      new graft.expr.TopKAggregator(k))
    stream.select(col("event_type").as("grp"),
        round(col("value") * 100).cast("long").as("v"),
        col("event_id").cast("long").as("id"))
      .groupBy("grp").agg(agg(col("v"), col("id")).as("tk"))
  }

  /** Streaming CUSUM monitor over per-user spend (cents), preset
    * reference 5000 — O(1) state per key, the recursive fold whose
    * equality with the window-closed batch form the oracle gates. */
  val CusumRef = 5000L

  def cusumPipeline(s: SparkSession, stream: DataFrame): DataFrame =
    graft.streaming.StreamingSync.cusumPerKey(s,
      stream.select(col("user_id"), col("event_id"),
        unix_millis(col("ts").cast("timestamp")).as("ts_ms"),
        round(col("value") * 100).cast("long").as("cts")),
      kRef = CusumRef)

  /** Per-batch update snapshots collapse by max event count (n is
    * strictly increasing per touched batch). */
  def cusumFinalize(drained: DataFrame): DataFrame =
    drained.groupBy("user_id")
      .agg(max(struct(col("n_events"), col("cusum_hi"),
        col("cusum_lo"))).as("m"))
      .select(col("user_id"), col("m.n_events").as("n_events"),
        col("m.cusum_hi").as("cusum_hi"),
        col("m.cusum_lo").as("cusum_lo"))

  def latestFinalize(drained: DataFrame): DataFrame =
    graft.ops.Dedup.keepLatest(drained)

  /** Drain a streaming DataFrame through a memory sink with
    * `AvailableNow`, then clean up (unique session-global table name,
    * checkpoint dir deleted — the Pipeline6 leak-regression contract).
    * Returns the drained rows and the number of microbatches run, so
    * contract specs can assert the drain really split. */
  def drainCounted(s: SparkSession, df: DataFrame, mode: String,
                   prefix: String): (DataFrame, Long) = {
    val name = prefix + "_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val ckpt = java.nio.file.Files.createTempDirectory(prefix + "_ckpt")
      .toString
    // State-store partition count is a STATE-VOLUME knob, not a core
    // count: every stateful operator commits one store per shuffle
    // partition per microbatch (a stream-stream join commits FOUR), so
    // at bench state sizes 32 partitions mean ~100+ near-empty state
    // files fsync'd per batch — pure fixed overhead that was the whole
    // cost of stream_join_final (r8's most expensive query). The count
    // is baked into the checkpoint at first start, so it is set for the
    // stream only (the cloned stream session) and restored immediately
    // after the drain; batch queries never see it. Size it UP via
    // graft.stream.statePartitions when keyed state is actually large
    // (the 100 TB operating point), like any shuffle-partition choice.
    val stateParts = s.conf.getOption("graft.stream.statePartitions")
      .getOrElse("8")
    val prevParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", stateParts)
    val batches = try {
      val q = df.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      Option(q.lastProgress).map(_.batchId + 1L).getOrElse(0L)
    } finally s.conf.set("spark.sql.shuffle.partitions", prevParts)
    (Pipeline6Queries.drainAndClean(s, name, ckpt), batches)
  }

  def drain(s: SparkSession, df: DataFrame, mode: String,
            prefix: String): DataFrame =
    drainCounted(s, df, mode, prefix)._1
}
