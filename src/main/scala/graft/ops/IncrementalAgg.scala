package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a materialized per-key
  * (count, sum) aggregate consistent with a stream of delta rows WITHOUT
  * re-scanning the base table — the aggregation analog of the engine's
  * row-level merge, and the thing that makes dashboards over a 100 TB
  * synced table affordable (the delta is small; the base is not).
  *
  * Invariant (tested + oracle-checked): merge(agg(base), agg(delta)) ==
  * agg(base ∪ delta) for any split, because count/sum form a commutative
  * monoid. Deletes retract by merging negated partials.
  */
object IncrementalAgg {

  /** Partial aggregate of rows: (keys, cnt, sum). */
  def partial(rows: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(col(valueCol)).as("sum"))

  /** Merge two partial-aggregate tables (either may have keys the other
    * lacks). Zero-count groups (fully retracted) are dropped. */
  def merge(current: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val c = current.select((keys.map(col) :+ col("cnt").as("c_cnt")
      :+ col("sum").as("c_sum")): _*)
    val d = delta.select((keys.map(col) :+ col("cnt").as("d_cnt")
      :+ col("sum").as("d_sum")): _*)
    c.join(d, keys, "full_outer")
      .select((keys.map(col)
        :+ (coalesce(col("c_cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("cnt")
        :+ (coalesce(col("c_sum"), lit(0L)) + coalesce(col("d_sum"), lit(0L))).as("sum")): _*)
      .where(col("cnt") > 0)
  }

  /** Insert-delta of an equi-join VIEW under append-only deltas:
    * new pairs of (A∪dA)⋈(B∪dB) beyond A⋈B are exactly
    * dA⋈B ∪ A⋈dB ∪ dA⋈dB — three joins whose one side is a (small)
    * delta, each broadcastable in steady state, instead of recomputing
    * the full join of two 100 TB tables. The join-view analog of
    * [[merge]]'s monoid identity. */
  def joinInsertDelta(a: DataFrame, dA: DataFrame, b: DataFrame,
                      dB: DataFrame, keys: Seq[String]): DataFrame =
    dA.join(b, keys)
      .unionByName(a.join(dB, keys))
      .unionByName(dA.join(dB, keys))

  /** Signed-delta join-view maintenance with DELETES, A-side change
    * against a static B (bag semantics):
    * V_new = V_old ∖ (dAdel ⋈ B) ∪ (dAins ⋈ B).
    * `exceptAll` removes exactly the multiset of retracted pairs — each
    * deleted A-row contributes precisely its old join partners — so the
    * maintained view is row-for-row the direct join of the new state.
    * At scale all three joins shuffle on the same keys, and the retract
    * side is |dAdel ⋈ B| (delta-sized), never a view recompute. */
  def joinApplyDeltaA(vOld: DataFrame, dAins: DataFrame, dAdel: DataFrame,
                      b: DataFrame, keys: Seq[String]): DataFrame =
    vOld.exceptAll(dAdel.join(b, keys))
      .unionByName(dAins.join(b, keys))

  /** Retraction partial for deleted rows: negated counts/sums. */
  def retract(rows: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    partial(rows, keys, valueCol)
      .select((keys.map(col) :+ (-col("cnt")).as("cnt")
        :+ (-col("sum")).as("sum")): _*)

  /** Exact equi-depth quantile boundaries from a mergeable VALUE
    * histogram — the quantile family's member of this file's identity:
    * per-(group, value) counts are a commutative monoid under [[merge]],
    * so boundaries from merge(hist(base), hist(delta)) EQUAL boundaries
    * from hist(base ∪ delta) — the base data is never re-scanned when a
    * delta lands. (The ntile-window exact form, agg_equidepth, has no
    * such identity: ranks are not additive. This is the incremental
    * twin for BOUNDED-DOMAIN value columns; unbounded domains graduate
    * to the GK sketch, agg_equidepth_approx.)
    *
    * Boundary rule, division-free: boundary b (1..buckets−1) of a group
    * with n rows is the smallest value whose inclusive cumulative count
    * satisfies cum·buckets ≥ b·n — ⌈b·n/buckets⌉-th order statistic,
    * pure integer comparisons.
    *
    * Scale: the histogram is |groups|·|domain| rows (the whole point of
    * demanding a bounded domain); the cumulative window partitions by
    * group and sorts the DOMAIN, not the data, and the boundary pick is
    * a (buckets−1)-row broadcast cross + min aggregate.
    *
    * @param hist (groupCols..., valueCol, cntCol) value histogram
    * @return (groupCols..., bucket, boundary) — bucket 1..buckets−1 */
  def equidepthFromCounts(hist: DataFrame, groups: Seq[String],
                          valueCol: String, cntCol: String,
                          buckets: Int): DataFrame = {
    require(buckets >= 2, "buckets must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val gcols = groups.map(col)
    val w = Window.partitionBy(gcols: _*).orderBy(col(valueCol).asc)
    val cum = hist
      .withColumn("__cum", sum(col(cntCol)).over(w))
      .withColumn("__n", sum(col(cntCol)).over(
        Window.partitionBy(gcols: _*)))
    val bs = hist.sparkSession.range(1L, buckets.toLong)
      .select(col("id").as("bucket"))
    cum.join(broadcast(bs),
        col("__cum") * buckets >= col("bucket") * col("__n"))
      .groupBy((gcols :+ col("bucket")): _*)
      .agg(min(col(valueCol)).as("boundary"))
  }
}
