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

  /** Load sentinel: fixed CPU work (xorshift loop × `threads`), timed.
    * On a quiet box of this machine class it takes ~1 s regardless of
    * thread count (each thread gets a core); on a contended box the
    * wall time inflates with oversubscription. Run before AND after the
    * query sweep and stamped into the JSON so a verdict can adjudicate
    * "regression vs machine load" from the artifact alone: load_factor
    * ≈ 1 means quiet, ≳ 1.5 means the box was loaded and the query
    * times are suspect. */
  private def calSeconds(threads: Int): Double = {
    val iters = 500000000L // ~1 s of xorshift64 per thread, quiet
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { i =>
      val t = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + i
        var n = 0L
        while (n < iters) {
          x ^= x << 13; x ^= x >>> 7; x ^= x << 17; n += 1
        }
        sink.addAndGet(x) // defeat dead-code elimination
        ()
      })
      t.setDaemon(true); t.start(); t
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
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
    // must not masquerade as a speedup in the totals). Three timed runs,
    // median reported: the first run pays codegen compilation (janino)
    // and JIT warmup that a steady-state deployment amortizes; the median
    // of three is robust to a single outlier in either direction (min-of-2
    // hid regressions behind one lucky run, max-of-anything charges GC
    // pauses), which is what round-5's machine-variance adjudication
    // asked for. SPARK_GRAFT_BENCH_RUNS overrides N for local iteration;
    // SPARK_GRAFT_BENCH_ONLY=<regex> restricts the query set.
    // load sentinel, first leg (after warmup so JIT is settled)
    val calBefore = calSeconds(cpus.toInt)

    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map(_.toInt).getOrElse(3).max(1)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.r)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.findFirstIn(n).isDefined) }
    val resultsFull = selected.map { case (name, fn) =>
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
      // a first-run failure aborts the query (its plan is broken, repeating
      // it wastes the budget); a transient later-run failure is dropped and
      // the median is taken over the successful runs only
      val first = once()
      val times =
        if (first < 0) Vector(first)
        else first +: Vector.fill(runs - 1)(once())
      val ok = times.filter(_ >= 0)
      // true median: for even run counts average the two middle values —
      // s(size/2) alone picks the UPPER middle, so RUNS=2 would report
      // the slower (usually JIT-warmup) run, strictly worse than min-of-2
      val median =
        if (ok.isEmpty) -1.0
        else {
          val s = ok.sorted
          if (s.size % 2 == 1) s(s.size / 2)
          else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
        }
      (name, median, times)
    }
    val results = resultsFull.map { case (n, m, _) => (n, m) }
    // load sentinel, second leg: contention that began mid-sweep shows
    // here even if the box was quiet at the start
    val calAfter = calSeconds(cpus.toInt)
    val loadFactor = math.max(calBefore, calAfter)
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
    // per-run detail + relative spread ((max-min)/median over successful
    // runs) so a noisy query is visible in the artifact, not re-derived
    val runsJson = resultsFull.map { case (k, m, ts) =>
      val ok = ts.filter(_ >= 0)
      val spread =
        if (ok.size < 2 || m <= 0) 0.0 else (ok.max - ok.min) / m
      "\"" + k + "\":{\"median\":" + r3(m) +
        ",\"spread\":" + r3(spread) +
        ",\"runs\":[" + ts.map(r3).mkString(",") + "]}"
    }.mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","nruns":$runs,"load_factor":${r3(loadFactor)},"load_cal":{"before":${r3(calBefore)},"after":${r3(calAfter)},"threads":$cpus},"queries":$full,"detailed":$runsJson,"sf":"$sfDir"}"""
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
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$groups,"n":${results.size},"failed":$failed,"load_factor":${r3(loadFactor)},"detail":"$detailPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
