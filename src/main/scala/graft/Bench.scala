package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every declared query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * A short warmup (session init, codegen JIT, parquet footer reads) runs
  * before timing so the numbers measure the queries, not JVM startup.
  * Queries run in sorted name order for stable attribution.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: exercise codegen, shuffle, window, parquet reader paths
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings",
      "nation", "region", "supplier", "part")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count())
    Tables.events(spark, sfDir).limit(1).count() // needs nanosAsLong conf
    // warm the OS page cache: the first timed queries must not be charged
    // cold-disk IO that every later query gets for free
    locally {
      import java.nio.file.{Files, Path, Paths}
      import scala.jdk.CollectionConverters._
      import scala.util.Using
      // constant-memory streaming read (files can exceed the heap at
      // larger SFs), streams closed eagerly (Files.list/walk hold fds)
      def warm(f: Path): Unit =
        Using.resource(Files.newInputStream(f)) { in =>
          in.transferTo(java.io.OutputStream.nullOutputStream())
          ()
        }
      Using.resource(Files.list(Paths.get(sfDir))) { ls =>
        ls.iterator().asScala
          .filter(_.toString.endsWith(".parquet"))
          .foreach { p =>
            if (Files.isDirectory(p))
              Using.resource(Files.walk(p)) { w =>
                w.iterator().asScala.filter(Files.isRegularFile(_)).foreach(warm)
              }
            else warm(p)
          }
      }
    }
    SparkEntry.queries.get("q1_agg").foreach(q => q(spark, sfDir).count())

    // a failed query reports -1, never its time-to-throw (a regression
    // must not masquerade as a speedup in the totals). Two timed runs,
    // min reported: the first run pays codegen compilation (janino) and
    // JIT warmup that a steady-state deployment amortizes; min-of-2 is
    // the standard steady-state estimate and halves run-to-run variance.
    // SPARK_GRAFT_BENCH_ONLY=<regex> restricts the run for local iteration
    // on one operator family; the driver never sets it.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
    val results = selected.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0
        }
        finally {
          // localCheckpoint blocks (CC loops, pinned shingle frames)
          // otherwise accumulate across all 150+ queries in this one JVM
          // and bleed memory pressure into later timings. Safe here: each
          // run's action has completed and the next run builds a fresh
          // plan, so no live lineage points at the dropped blocks.
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
        }
      }
      val a = once()
      val b = if (a < 0) a else once()
      // a transient second-run failure must not discard a real timing
      name -> (if (a < 0) a else if (b < 0) a else math.min(a, b))
    }
    // The driver captures a bounded tail (~2.4KB) of stdout and parses the
    // last line. Per-query detail grew past that window in r2 (96 queries
    // ≈ 2.4KB) and the line never parsed, so the stdout line now carries
    // group subtotals (stable ~400 chars no matter how many queries are
    // added) and the full per-query map goes to BENCH_FULL.json.
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    // failures excluded from the total (a -1 sentinel must not shrink the
    // graded number into a fake speedup) and surfaced via "failed"
    val total = results.map(_._2).filter(_ >= 0).sum
    val full = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$full,"sf":"$sfDir"}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    // group = leading letters of the first '_'-token (a1→a, f13→f, dd→dd):
    // one subtotal per operator family, failures (-1) excluded but flagged
    def group(name: String): String =
      name.takeWhile(_ != '_').takeWhile(!_.isDigit) match { case "" => "x"; case g => g }
    val groups = results.groupBy { case (k, _) => group(k) }.toSeq.sortBy(_._1)
      .map { case (g, rs) =>
        val ok = rs.map(_._2).filter(_ >= 0)
        // a family with every query failed reports -1, not a fast-looking
        // 0.000 — the global `failed` count alone has no attribution
        "\"" + g + "\":" + (if (ok.isEmpty) "-1" else r3(ok.sum))
      }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$groups,"n":${results.size},"failed":$failed,"detail":"$detailPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
