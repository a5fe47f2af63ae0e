package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query job/stage profiler for the optimization rounds: runs one
  * declared query with the bench session shape and prints, per Spark
  * job, the wall time, task count, task-time sum, and shuffle volume —
  * the breakdown that tells scheduling overhead apart from task work
  * (guide §1: measure first; §7.1 without a UI).
  *
  *   sbt "runMain graft.Profile <query> [sfDir]"
  */
object Profile {

  final case class JobRow(id: Int, wallMs: Long, stages: Int,
                          tasks: Int, taskMs: Long,
                          shufRead: Long, shufWrite: Long)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Profile <query> [sfDir]"))
    val sfDir = args.drop(1).headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'"))
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // extra confs for A/B runs: SPARK_GRAFT_PROFILE_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(';')
      .filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup identical to Bench so JIT/codegen/page-cache state matches
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings",
      "nation", "region", "supplier", "part")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count())
    Tables.events(spark, sfDir).limit(1).count()
    SparkEntry.queries.get("q1_agg").foreach(q => q(spark, sfDir).count())

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
    // id -> [submitMs, endMs, stages, tasks, taskMs, shufRead, shufWrite]
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.put(e.jobId, Array(e.time, 0L, e.stageIds.size.toLong, 0L, 0L, 0L, 0L))
        e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val a = jobs.get(e.jobId); if (a != null) a(1) = e.time
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val j = stageToJob.get(e.stageId)
        val a = jobs.get(j)
        if (a != null && e.taskMetrics != null) a.synchronized {
          a(3) += 1
          a(4) += e.taskMetrics.executorRunTime
          a(5) += e.taskMetrics.shuffleReadMetrics.totalBytesRead
          a(6) += e.taskMetrics.shuffleWriteMetrics.bytesWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // streaming-side breakdown: per-microbatch durationMs map (trigger
    // execution, addBatch, state commit, WAL commits…) — where the
    // wall − job-wall gap of the stream_* queries actually goes
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit =
          println(s"[stream] started ${e.name}")
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          import scala.jdk.CollectionConverters._
          val d = e.progress.durationMs.asScala.toSeq.sortBy(-_._2)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(s"[stream] batch ${e.progress.batchId}: $d")
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          println(s"[stream] terminated")
      })
    val runs = sys.env.get("SPARK_GRAFT_PROFILE_RUNS").map(_.toInt).getOrElse(1)
    var r = 0
    while (r < runs) { // repeat to separate first-run codegen/JIT cost
      jobs.clear(); stageToJob.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(300) // let queued listener events drain
      spark.sparkContext.addSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val rows = jobs.asScala.toSeq.sortBy(_._1).map { case (id, a) =>
        JobRow(id, a(1) - a(0), a(2).toInt, a(3).toInt, a(4), a(5), a(6))
      }
      println(f"== $name run $r: wall ${wall}%.2f s, jobs ${rows.size}, " +
        f"job-wall sum ${rows.map(_.wallMs).sum / 1000.0}%.2f s, " +
        f"task-time sum ${rows.map(_.taskMs).sum / 1000.0}%.2f s")
      rows.foreach { jr =>
        println(f"job ${jr.id}%4d wall ${jr.wallMs / 1000.0}%7.2f s  " +
          f"stages ${jr.stages}%3d tasks ${jr.tasks}%5d " +
          f"taskTime ${jr.taskMs / 1000.0}%8.2f s " +
          f"shufR ${jr.shufRead / 1048576.0}%8.1f MB shufW ${jr.shufWrite / 1048576.0}%8.1f MB")
      }
      r += 1
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
