package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Merge}

/** Scale probe (not part of the driver contract): synthesize a target and
  * delta far larger than the test fixtures and run the full delta-merge
  * plan, printing row counts and wall time. Demonstrates the merge algebra
  * at row counts where a driver-side or O(n²) implementation would fail.
  *
  *   sbt "runMain graft.ScaleProbe 20000000 2000000"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val targetRows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val deltaRows = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def synth(n: Long, offset: Long, modBase: Long) =
      spark.range(n).select(
        concat(lit("/r/"), ((col("id") + offset) % targetRows)).as("href"),
        ((col("id") + offset) % targetRows).cast("string").as("key"),
        (lit(modBase) + col("id") % 1000000).as("modified_ms"),
        concat(lit("{\"v\": "), col("id"), lit("}")).as("jsondata"),
        (col("id") % 5).cast("string").as("resourcetype"))

    val target = synth(targetRows, 0, 1700000000000L)
    // delta overlaps 50% with target keys and contains 10% duplicate keys
    val delta = synth(deltaRows, targetRows / 2, 1800000000000L)
      .unionByName(synth(deltaRows / 10, targetRows / 2, 1800000500000L))
    val tombs = spark.range(deltaRows / 20)
      .select(concat(lit("/r/"), col("id") * 7 % targetRows).as("href"))

    val t0 = System.nanoTime()
    val merged = Merge.delta(target, Dedup.keepLatest(delta), tombs)
    val n = merged.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"merged rows=$n%d target=$targetRows%d delta=${deltaRows}%d " +
      f"wall=${secs}%.1fs throughput=${(targetRows + deltaRows) / secs}%.0f rows/s")
    spark.stop()
  }
}
