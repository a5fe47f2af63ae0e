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
    }),

    "agg_equidepth_approx" -> ((s, dir) => {
      // GK-sketch equi-depth twin of agg_equidepth (the other one-task
      // exact rank stat): bucket boundaries from approx_percentile at
      // the 1/8..7/8 ranks — a mergeable partial aggregate — then each
      // row buckets by counting boundaries ≤ its price against the
      // broadcast 7-element array; no per-group total-order task
      // anywhere. Graded invariant (GK rank error ±0.1% at
      // accuracy=1000, graded at ±5 percentile points): every bucket
      // holds 12.5% ± 5pts of its group — cnt·1000 ∈ [n·75, n·175],
      // exact integer cross-multiplication. All 8 buckets of all 3
      // groups must be present and TRUE, so an empty or overfull bucket
      // fails rows/hash, not just a flag.
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), cents("l_extendedprice").as("pc"))
      val qs = (1 to 7).map(_ / 8.0).mkString(", ")
      val bounds = li.groupBy("l_returnflag")
        .agg(expr(s"approx_percentile(pc, array($qs), 1000)").as("b"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag").as("rf"), col("b"), col("n"))
      li.join(broadcast(bounds), li("l_returnflag") === bounds("rf"))
        .select(col("l_returnflag"), col("n"),
          (size(filter(col("b"), x => x <= col("pc"))) + 1)
            .cast("long").as("bucket"))
        .groupBy("l_returnflag", "bucket", "n")
        .agg(count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("bucket"),
          (col("cnt") * 1000 >= col("n") * 75 &&
            col("cnt") * 1000 <= col("n") * 175).as("ok_frac"))
        .orderBy("l_returnflag", "bucket")
    })
  )

  val oracles: Map[String, String] = Map(

    "agg_winsorize_approx" ->
      // the invariants hold for ANY partition merge order of the GK
      // sketch, so the oracle is the exact group counts + TRUE flags
      """SELECT l_returnflag, COUNT(*) AS n,
        |  TRUE AS ok_lo, TRUE AS ok_hi, TRUE AS ok_sum
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_equidepth_approx" ->
      // every (group, bucket 1..8) row must exist with its invariant
      // green — the oracle enumerates the full grid
      """SELECT g.l_returnflag, CAST(b.b AS BIGINT) AS bucket,
        |  TRUE AS ok_frac
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem) g,
        |  unnest(range(1, 9)) AS b(b)
        |ORDER BY l_returnflag, bucket""".stripMargin
  )
}
