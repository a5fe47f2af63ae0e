package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier ("skyline", Börzsönyi et al. ICDE 2001) — the
  * selection shape a curation pipeline uses when two objectives
  * genuinely conflict (cost vs information: shortest documents with the
  * richest vocabulary) and no scalarization is defensible: keep exactly
  * the points no other point dominates (x' ≤ x ∧ y' ≥ y with one
  * strict; x minimized, y maximized).
  *
  * Two-phase distributed plan:
  *
  *  1. GRID PRUNE. Points bucket on x (`buckets` equi-width cells from
  *     the broadcast global (min, max)); one aggregate yields each
  *     bucket's max y. Because bucketing is monotone in x, every point
  *     of a strictly-lower bucket has strictly smaller x — so a point
  *     dominated by a lower bucket's max-y point (prefix-max ≥ y) can
  *     be dropped with NO false negatives: the witness has x' < x,
  *     y' ≥ y. This is the distributed 99%-kill pass: survivors are
  *     bounded by frontier thickness × bucket width, not data volume.
  *  2. EXACT PASS. Survivors (distinct (x, y) points, counted) run one
  *     ordered window (x asc, y desc): a point is dominated iff some
  *     PRECEDING point has y ≥ its y — preceding rows are exactly
  *     those with (x' < x) or (x' = x ∧ y' > y), both dominance
  *     witnesses on distinct points. Single-partition by construction
  *     of phase 1 (documented bound), the agg_median convention.
  *
  * All arithmetic is long-integer; ties collapse to one frontier point
  * carrying `n_rows`.
  *
  * @return (x, y, n_rows): the non-dominated distinct points and how
  *         many input rows sit at each
  */
object Skyline {

  def skyline2d(df: DataFrame, xCol: Column, yCol: Column,
                buckets: Int = 256): DataFrame =
    skylinePoints(
      df.select(xCol.cast("long").as("x"), yCol.cast("long").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("n_rows")),
      buckets)

  /** Incremental maintenance: the frontier is a SUFFICIENT state.
    * skyline(B ∪ D) = skyline(skyline(B) ⊎ points(D)) — a dominated
    * point stays dominated when points are only added, and any
    * B∪D-frontier point from B must already be on B's frontier (its
    * B-dominator would otherwise survive into B∪D), so its n_rows
    * count is preserved in the state. The arriving batch contributes
    * its own point aggregate; base rows are never rescanned — the
    * inc_* contract.
    *
    * @param frontier a prior [[skyline2d]]/[[skylineMerge]] result
    *                 (x, y, n_rows)
    * @param delta    raw arriving rows
    */
  def skylineMerge(frontier: DataFrame, delta: DataFrame,
                   xCol: Column, yCol: Column,
                   buckets: Int = 256): DataFrame =
    skylinePoints(
      frontier.select(col("x"), col("y"), col("n_rows"))
        .unionByName(delta.select(xCol.cast("long").as("x"),
            yCol.cast("long").as("y"))
          .groupBy("x", "y").agg(count(lit(1)).as("n_rows")))
        .groupBy("x", "y").agg(sum("n_rows").as("n_rows")),
      buckets)

  /** Core over pre-counted distinct points (x, y, n_rows). */
  def skylinePoints(pts: DataFrame, buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val ext = pts.agg(min("x").as("__xlo"), max("x").as("__xhi"))
    // loud fence: (x − xlo)·buckets must not wrap (the fail-loudly
    // contract — a wrapped bucket id would silently prune frontier
    // points). Long.MaxValue/buckets x-range covers any real metric.
    // The fence itself must be wrap-safe: xhi − xlo can exceed Long
    // range (xlo near Long.MinValue), wrapping negative and slipping
    // past a naive <= check — so test for wrap BEFORE subtracting.
    // Or/And short-circuit per-row, so the guarded arithmetic never
    // runs (and never ANSI-throws) on the branch it would wrap in.
    val noWrap = col("__xlo") >= 0L ||
      col("__xhi") <= lit(Long.MaxValue) + col("__xlo")
    val safeRange = when(
      noWrap &&
        col("__xhi") - col("__xlo") <= lit(Long.MaxValue / buckets),
      col("__xhi")).otherwise(raise_error(lit(
      s"skyline2d: x range exceeds Long.MaxValue/$buckets — rescale x " +
        "or lower buckets")))
    val withB = pts.crossJoin(broadcast(ext))
      .withColumn("__b", call_function("div",
        (col("x") - col("__xlo")) * lit(buckets.toLong),
        safeRange - col("__xlo") + lit(1L)))
    val wB = Window.orderBy(col("__b").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket frontier: buckets-bounded frame; the prefix max over
    // STRICTLY lower buckets is a safe dominance witness (x' < x)
    val bmax = withB.groupBy("__b").agg(max("y").as("__by"))
      .withColumn("__pmax", max(col("__by")).over(wB))
      .select(col("__b"), col("__pmax"))
    val survivors = withB.join(broadcast(bmax), Seq("__b"))
      .where(col("__pmax").isNull || col("__pmax") < col("y"))
      .select("x", "y", "n_rows")
    val wX = Window.orderBy(col("x").asc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    survivors
      .withColumn("__prev", max(col("y")).over(wX))
      .where(col("__prev").isNull || col("__prev") < col("y"))
      .select("x", "y", "n_rows")
  }
}
