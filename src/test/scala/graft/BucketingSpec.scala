package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Bucketed co-located join: pre-bucketing both sides of a recurring join
  * key eliminates the per-query shuffle — the 100 TB answer to the
  * reference's indexed (baseurl, path, href) write table. */
class BucketingSpec extends SparkSuite {

  test("bucketed join on the sync key plans no shuffle exchange") {
    val base = java.nio.file.Files.createTempDirectory("bucket").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val sri = Tables.sriEvents(spark, sfDir)
      sri.write.option("path", s"$base/target_b")
        .bucketBy(4, "href").sortBy("href")
        .mode("overwrite").saveAsTable("target_b")
      sri.where(col("modified_ms") >= queries.Fixtures.CutMs)
        .write.option("path", s"$base/delta_b")
        .bucketBy(4, "href").sortBy("href")
        .mode("overwrite").saveAsTable("delta_b")

      val joined = spark.table("target_b")
        .join(spark.table("delta_b").select(col("href"), col("jsondata").as("j2")),
          Seq("href"))
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free co-located join, found ${shuffles.size} exchanges")
      assert(joined.count() ===
        sri.where(col("modified_ms") >= queries.Fixtures.CutMs).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS target_b")
      spark.sql("DROP TABLE IF EXISTS delta_b")
    }
  }
}
