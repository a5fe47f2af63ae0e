package graft
import org.apache.spark.sql.functions._
class HrwDebugSpec extends SparkSuite {
  import spark.implicits._
  test("debug greatest over structs") {
    val df = Seq(1L, 2L, 3L).toDF("k")
    graft.expr.GraftFunctions.register(spark)
    val scored = Seq("s0","s1","s2").map { sh =>
      struct(graft.expr.GraftFunctions.java_hash_u32(concat(lit("hrw"), lit(sh), lit("|"), col("k").cast("string"))).as("h"), lit(sh).as("s"))
    }
    df.withColumn("all", array(scored: _*)).withColumn("win", greatest(scored: _*)).show(false)
  }
}
