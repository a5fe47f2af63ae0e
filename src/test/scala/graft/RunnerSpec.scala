package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.queries.Fixtures
import graft.runner._

/** The reference lifecycle (SURVEY §3) end-to-end on parquet targets:
  * full → delta → safe-delta, watermark persistence, single-flight. */
class RunnerSpec extends SparkSuite {

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("runner").toString

  private def sri: DataFrame = Tables.sriEvents(spark, sfDir)
  private val cut = Fixtures.CutMs

  test("fullSync then deltaSync converges to the full dataset") {
    val base = tmpDir()
    val cfg = SyncConfig("t", s"$base/state")
    val runner = new SyncRunner(spark, cfg)
    val target = new ParquetTarget(spark, s"$base/table")

    // full sync over the pre-cut slice
    val r1 = runner.fullSync(sri.where(col("modified_ms") < cut), target)
    assert(r1.rowsAfter === sri.where(col("modified_ms") < cut).count())

    // delta sync over everything (cold-start watermark) minus errors
    val staged = sri.where(col("resourcetype") =!= "error")
    val tombs = sri.where(col("resourcetype") === "error").select("href")
    val r2 = runner.deltaSync(staged, tombs, target)
    assert(r2.watermark.isDefined)
    // final state: all non-error hrefs exactly once
    val got = target.read(spark)
    assert(got.count() === staged.select("href").distinct().count())
    assert(got.where(col("resourcetype") === "error").count() === 0)
  }

  test("deltaSync uses persisted watermark to skip already-synced rows") {
    val base = tmpDir()
    val cfg = SyncConfig("t", s"$base/state")
    val runner = new SyncRunner(spark, cfg)
    val target = new ParquetTarget(spark, s"$base/table")
    val empty = sri.where(lit(false))

    val r1 = runner.deltaSync(sri.where(col("modified_ms") < cut),
      empty.select("href"), target)
    val wm1 = r1.watermark.get
    // wm regressed from max-seen by 1.01×duration, but far above cold start
    assert(wm1 > ops.Watermark.ColdStartMs && wm1 <= cut)

    // second delta: source filtered by wm internally; state advances
    val r2 = runner.deltaSync(sri, empty.select("href"), target)
    assert(r2.watermark.get >= wm1)
    assert(target.read(spark).count() === sri.select("href").distinct().count())
  }

  test("explicit modifiedSince does NOT advance the watermark (README:174)") {
    val base = tmpDir()
    val runner = new SyncRunner(spark, SyncConfig("t", s"$base/state"))
    val target = new ParquetTarget(spark, s"$base/table")
    val r = runner.deltaSync(sri, sri.where(lit(false)).select("href"),
      target, modifiedSince = Some(cut))
    assert(r.watermark.isEmpty)
    assert(ops.Watermark.readState(spark, s"$base/state", "t",
      SyncType.Delta).isEmpty)
    // and only post-cut rows landed
    assert(target.read(spark).count() ===
      sri.where(col("modified_ms") >= cut).count())
  }

  test("safeDeltaSync reconciles membership") {
    val base = tmpDir()
    val runner = new SyncRunner(spark, SyncConfig("t", s"$base/state"))
    val target = new ParquetTarget(spark, s"$base/table")
    // target = everything
    new SyncRunner(spark, SyncConfig("t0", s"$base/state0"))
      .fullSync(sri, target)
    // authoritative membership: only click events
    val members = sri.where(col("resourcetype") === "click").select("href")
    val r = runner.safeDeltaSync(
      source = sri.where(lit(false)),
      tombstones = sri.where(lit(false)).select("href"),
      members = members,
      fetchMissing = missing => sri.join(missing, Seq("href"), "left_semi"),
      target = target)
    assert(r.rowsAfter === members.count())
  }

  test("dryRun computes but does not commit (README:69)") {
    val base = tmpDir()
    val runner = new SyncRunner(spark,
      SyncConfig("t", s"$base/state", dryRun = true))
    val target = new ParquetTarget(spark, s"$base/table")
    val r = runner.fullSync(sri, target)
    assert(r.rowsAfter === sri.count())
    assert(!target.exists)
  }

  test("single-flight rejects concurrent sync (T4)") {
    val base = tmpDir()
    val runner = new SyncRunner(spark, SyncConfig("t", s"$base/state"))
    val target = new ParquetTarget(spark, s"$base/table")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val slowSource = sri // the sync itself is slow enough at test scale
    val t = new Thread(() => {
      gate.countDown(); runner.fullSync(slowSource, target); ()
    })
    t.start(); gate.await()
    Thread.sleep(50) // let the first sync acquire the flag
    val denied =
      try { runner.fullSync(sri, target); false }
      catch { case _: IllegalStateException => true }
    t.join()
    assert(denied, "second concurrent sync should have been rejected")
  }

  test("MultiSync settles each job independently (T5)") {
    val results = MultiSync.run(Seq(
      () => 1 + 1,
      () => throw new RuntimeException("boom"),
      () => 40 + 2), concurrency = 2)
    assert(results(0).isSuccess && results(0).get === 2)
    assert(results(1).isFailure)
    assert(results(2).isSuccess && results(2).get === 42)
  }

  test("MultiRunner derives configs via JSON-merge-patch: nested keys " +
      "flatten, null deletes, each patch sees a fresh base") {
    val base = """{"api": {"path": "/content"}, "db": {"table": "t"},
                 | "dry-run": true}""".stripMargin
    val got = MultiRunner.deriveConfigs(base, Seq(
      "{}",
      """{"api": {"path": "/persons"}, "dry-run": null}""",
      """{"db": {"table": "u", "schema": "s"}}"""))
    assert(got(0) === Map("api.path" -> "/content", "db.table" -> "t",
      "dry-run" -> "true"))
    assert(got(1) === Map("api.path" -> "/persons", "db.table" -> "t"),
      s"null must DELETE dry-run (RFC 7386): ${got(1)}")
    // patch 2 must not see patch 1's mutations (clonedeep semantics)
    assert(got(2) === Map("api.path" -> "/content", "db.table" -> "u",
      "db.schema" -> "s", "dry-run" -> "true"))
    // arrays keep their JSON form (ArrayNode.asText is "" — a silent
    // value loss the flattener must not commit)
    val arr = MultiRunner.deriveConfigs(
      """{"keys": ["href", "key"], "n": 2}""", Seq("{}"))
    assert(arr.head === Map("keys" -> """["href","key"]""", "n" -> "2"),
      s"array config values must survive flattening: ${arr.head}")
  }

  test("MultiRunner.runAll: one base + overwrites run N settled syncs " +
      "through Main.run (Sri2DbMulti parity, client.js:2105)") {
    val base = tmpDir()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$base/page0.json"),
      """{"results": [
        |  {"href": "/a/1", "$$expanded": {"key": "1", "$$meta":
        |    {"permalink": "/a/1", "type": "A",
        |     "modified": "2024-01-10T00:00:00.000Z"}}},
        |  {"href": "/a/2", "$$expanded": {"key": "2", "$$meta":
        |    {"permalink": "/a/2", "type": "A",
        |     "modified": "2024-01-12T00:00:00.000Z"}}}
        |]}""".stripMargin)
    val baseJson =
      s"""{"pages": "$base", "state": "$base/state",
         | "synctype": "fullSync", "target": "$base/t0",
         | "table": "t0"}""".stripMargin
    val results = MultiRunner.runAll(baseJson, Seq(
      "{}",
      s"""{"target": "$base/t1", "table": "t1"}""",
      """{"synctype": "bogusSync"}"""),
      concurrency = 2)(opts => Main.run(spark, opts))
    assert(results.length === 3)
    assert(results(0).isSuccess && results(0).get.rowsAfter === 2)
    assert(results(1).isSuccess && results(1).get.rowsAfter === 2)
    assert(results(2).isFailure,
      "the bad-pages stream must settle as rejected, not sink the batch")
    // the two fulfilled streams really landed in their own targets
    assert(spark.read.parquet(s"$base/t0").count() === 2)
    assert(spark.read.parquet(s"$base/t1").count() === 2)
  }
}
