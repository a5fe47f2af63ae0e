package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Fixtures._

/** Round-7 additions: the scale-safe sketch twin of the exact winsorize
  * (GK-bound clamping — the 100 TB graduation path for the two remaining
  * one-task-per-group exact rank stats, `agg_winsorize`/`agg_equidepth`).
  */
object Pipeline7Queries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    "agg_winsorize_approx" -> ((s, dir) => {
      // GK-sketch winsorize twin of agg_winsorize: clamp each group's
      // prices at approx_percentile(0.05/0.95, accuracy=1000) instead of
      // the exact window ranks. The sketch is a TRUE partial aggregate
      // (mergeable per partition, no per-group total-order task), so this
      // form scales with the cluster where the exact form serializes each
      // group into one sort task (7.0× at the sf1 decade) — graduate to
      // THIS at 100 TB, keep agg_winsorize as the exact oracle anchor.
      // The clamp values are sketch-dependent, so (like approx_percentile
      // / approx_distinct) the graded output is the deterministic
      // INVARIANT, not the values: GK at accuracy=1000 bounds rank error
      // by ±0.1%, graded with 50× headroom at ±5 percentile points —
      //   ok_lo/ok_hi: the clipped-tail fractions stay within target+5pts
      //     (exact integer counts vs the returned clamp element);
      //   ok_sum: n·lo ≤ Σ clamp(pc, lo, hi) ≤ n·hi with lo ≤ hi — the
      //     clamp algebra itself, violated by any lo/hi ordering bug or
      //     overflow in the summed cents.
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), cents("l_extendedprice").as("pc"))
      val bounds = li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(pc, array(0.05, 0.95), 1000)")
          .as("b"))
        .select(col("l_returnflag").as("rf"),
          element_at(col("b"), 1).as("lo"),
          element_at(col("b"), 2).as("hi"))
      def tailOk(cnt: Column, n: Column, targetPct: Int) =
        cnt * 100 <= n * (targetPct + 5)
      li.join(broadcast(bounds), li("l_returnflag") === bounds("rf"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pc") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("pc") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
          sum(least(greatest(col("pc"), col("lo")), col("hi")))
            .as("sum_wins"),
          first(col("lo")).as("lo"), first(col("hi")).as("hi"))
        .select(col("l_returnflag"), col("n"),
          tailOk(col("n_lo"), col("n"), 5).as("ok_lo"),
          tailOk(col("n_hi"), col("n"), 5).as("ok_hi"),
          (col("lo") <= col("hi") && col("n") * col("lo") <= col("sum_wins")
            && col("sum_wins") <= col("n") * col("hi")).as("ok_sum"))
        .orderBy("l_returnflag")
    })
  )

  val oracles: Map[String, String] = Map(

    "agg_winsorize_approx" ->
      // the invariants hold for ANY partition merge order of the GK
      // sketch, so the oracle is the exact group counts + TRUE flags
      """SELECT l_returnflag, COUNT(*) AS n,
        |  TRUE AS ok_lo, TRUE AS ok_hi, TRUE AS ok_sum
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin
  )
}
