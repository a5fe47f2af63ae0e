package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Pin.{PinOps, PinIterOps}
object PpDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // a toy assignment frame shaped like the louvain round output
    val e = spark.range(0, 100000).select(
      (col("id") % 5000).as("lo"), (col("id") % 7919).as("hi"))
    val b0 = e.select(explode(array(col("lo"), col("hi"))).as("node"))
      .distinct().select(col("node"), col("node").as("comm"))
    val b1 = b0.pinIter()
    println("== pinIter leaf partitioning: " +
      b1.queryExecution.analyzed.asInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD].outputPartitioning)
    val deg = e.groupBy(col("lo").as("node")).agg(count(lit(1)).as("d_i")).pin()
    println("== pin (deg) leaf partitioning: " +
      deg.queryExecution.analyzed.asInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD].outputPartitioning)
    // does a node-keyed join of the two pinned frames exchange?
    val j = b1.join(deg, Seq("node"))
    j.count()
    val p = j.queryExecution.executedPlan.toString
    println("== join plan:")
    println(p.linesIterator.filter(l => l.contains("Exchange") ||
      l.contains("Join") || l.contains("Sort") || l.contains("Scan")).mkString("\n"))
  }
}
