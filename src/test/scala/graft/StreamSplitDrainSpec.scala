package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.{Pipeline6Queries, Pipeline7Queries,
  Pipeline12Queries, Pipeline14Queries, Pipeline15Queries,
  Pipeline24Queries, StreamDrains}

/** The multi-microbatch streaming CONTRACT (VERDICT r7 #1): each of the
  * four graded stream_* pipelines must produce its graded (one-batch)
  * answer when the SAME input drains split across many microbatches —
  * `maxFilesPerTrigger=1` over a time-split multi-file copy of events,
  * the shape a real 100 TB replay has (time-partitioned files, replayed
  * oldest-first, cross-batch disorder bounded by the watermark delay).
  *
  * Each test asserts BOTH that the split drain really split (>= 3
  * microbatches — otherwise the test proves nothing) and that the
  * result row-set equals the graded query's answer on the same sf dir.
  */
class StreamSplitDrainSpec extends SparkSuite {

  private val Splits = 4

  /** events at sfDir, time-sorted and split into `Splits` single-file
    * parquets with strictly increasing modification times, so the file
    * stream source (oldest-mtime-first) replays them in event-time
    * order — zero cross-batch disorder, the tightest instance of the
    * watermark-bounded-disorder contract. Built once per suite. */
  private lazy val splitDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ev_split").toString
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val sorted = ev.orderBy(col("ts"), col("event_id"))
      .withColumn("__part",
        ntile(Splits).over(org.apache.spark.sql.expressions.Window
          .orderBy(col("ts"), col("event_id"))))
    for (i <- 1 to Splits) {
      val tmp = java.nio.file.Files.createTempDirectory(s"ev_tmp_$i").toString
      sorted.where(col("__part") === i).drop("__part")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"events_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      // strictly increasing mtimes pin the source's replay order
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    dir
  }

  /** Streaming reader over the split copy, one file per microbatch,
    * normalized exactly like the graded eventsStream reader. */
  private def splitStream: DataFrame = {
    // the split files are Spark-written, so their schema can differ from
    // the raw fixture's vintage — declare what the split files actually
    // carry and let normalizeTs canonicalize, same as the graded reader
    val schema = spark.read.parquet(splitDir).schema
    Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(splitDir))
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def gradedAnswer(name: String): Seq[String] = {
    val qs = Pipeline6Queries.queries ++ Pipeline7Queries.queries ++
      Pipeline12Queries.queries ++ Pipeline14Queries.queries ++
      Pipeline15Queries.queries ++ Pipeline24Queries.queries
    rows(qs(name)(spark, sfDir))
  }

  private def assertSplitEqualsGraded(name: String, drained: DataFrame,
                                      batches: Long): Unit = {
    assert(batches >= 3L,
      s"$name: drain ran $batches microbatches — did not split, " +
        "the contract test proves nothing")
    assert(rows(drained) === gradedAnswer(name),
      s"$name: split drain diverged from the graded one-batch answer")
  }

  test("stream_dedup_watermark: split drain (1 file/batch) equals the " +
      "graded answer — no admitted row drops across batch watermarks") {
    val (out, n) = StreamDrains.drainCounted(spark,
      StreamDrains.dedupPipeline(splitStream), "append", "sdw_split")
    assertSplitEqualsGraded("stream_dedup_watermark", out, n)
  }

  test("stream_win_final: split drain finalizes exactly the windows the " +
      "final watermark closed, with full counts") {
    val (out, n) = StreamDrains.drainCounted(spark,
      StreamDrains.winFinalPipeline(splitStream), "append", "swf_split")
    assertSplitEqualsGraded("stream_win_final", out, n)
  }

  test("stream_latest_per_key: per-batch update snapshots collapse to " +
      "the graded final state under the keep-latest reduce") {
    val (raw, n) = StreamDrains.drainCounted(spark,
      StreamDrains.latestPipeline(spark, splitStream), "update", "slk_split")
    // the un-reduced sink must hold MORE than one snapshot for at least
    // one key (otherwise the finalize step is untested)
    val dup = raw.groupBy("href").count().where(col("count") > 1).count()
    assert(dup > 0L, "no key was updated across batches — finalize untested")
    assertSplitEqualsGraded("stream_latest_per_key",
      StreamDrains.latestFinalize(raw), n)
  }

  test("stream_session_final: merging session state finalizes the same " +
      "sessions with the same counts under a split drain") {
    val (out, n) = StreamDrains.drainCounted(spark,
      StreamDrains.sessionFinalPipeline(splitStream), "append", "ssf_split")
    assertSplitEqualsGraded("stream_session_final", out, n)
  }

  test("stream_cms: the sketch state accumulates across batches — a " +
      "split complete-mode drain lands on the batch cell grid exactly") {
    val (out, n) = StreamDrains.drainCounted(spark,
      StreamDrains.cmsPipeline(splitStream), "complete", "scm_split")
    assertSplitEqualsGraded("stream_cms", out, n)
  }

  test("stream_kmv: per-group bottom-k state merges across batches — a " +
      "split complete-mode drain lands on the batch sketch exactly") {
    val (out, n) = StreamDrains.drainCounted(spark,
      StreamDrains.kmvPipeline(splitStream), "complete", "skmv_split")
    val exploded = out.select(col("grp"), posexplode(col("sk.entries")))
      .select(col("grp"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.hu").as("hu"), col("col.k_key").as("k_key"))
    assertSplitEqualsGraded("stream_kmv", exploded, n)
  }

  test("stream_cusum: the O(1) per-key recursion folds across batch " +
      "boundaries onto the window-closed batch answer") {
    val (raw, n) = StreamDrains.drainCounted(spark,
      StreamDrains.cusumPipeline(spark, splitStream), "update",
      "scu_split")
    // at least one key must have been updated across several batches —
    // otherwise the cross-batch state fold is untested
    val multi = raw.groupBy("user_id").count()
      .where(col("count") > 1).count()
    assert(multi > 0L, "no key saw multiple batches — fold untested")
    assertSplitEqualsGraded("stream_cusum",
      StreamDrains.cusumFinalize(raw), n)
  }

  test("stream_join_final: interval-join state survives batch " +
      "boundaries — split drain emits every cross-batch pair") {
    val (out, n) = StreamDrains.drainCounted(spark,
      StreamDrains.joinPipeline(splitStream), "append", "sjf_split")
    assertSplitEqualsGraded("stream_join_final", out, n)
  }

  test("stream_join_final: a pair whose click and purchase arrive in " +
      "DIFFERENT microbatches is still emitted (state retention)") {
    import spark.implicits._
    // crafted two-file replay: the click lands in batch 1, its matching
    // purchase (12 min later, within the 30 min join range) in batch 2 —
    // plus a decoy pair outside the range that must NOT pair
    def ts(min: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 10, 0).plusMinutes(min))
    val f1 = Seq((100L, ts(0), 7L, "click"),
      (101L, ts(1), 8L, "click")).toDF("event_id", "ts", "user_id",
      "event_type")
    val f2 = Seq((200L, ts(12), 7L, "purchase"),
      (201L, ts(45), 8L, "purchase")).toDF("event_id", "ts", "user_id",
      "event_type")
    val dir = java.nio.file.Files.createTempDirectory("sjf_cross").toString
    Seq((f1, 1), (f2, 2)).foreach { case (df, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"sjf_t$i").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(dir, f"ev_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val (got, batches) = StreamDrains.drainCounted(spark,
      StreamDrains.joinPipeline(stream), "append", "sjf_cross")
    assert(batches >= 2L, s"drain ran $batches batches — did not split")
    val pairs = got.select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((100L, 200L)),
      s"expected exactly the cross-batch in-range pair, got $pairs")
  }
}
