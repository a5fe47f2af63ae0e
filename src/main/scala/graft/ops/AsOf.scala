package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (SURVEY §2.12: absent in the reference, standard in
  * time-series engines): for each left row, the newest right row with
  * `rightTime <= leftTime` within the same key group.
  *
  * Implementation is the scale-correct one: union the two tagged streams,
  * ONE shuffle on the key, and carry the latest right row forward with a
  * running `last(..., ignoreNulls)` window — O(n log n) per key group,
  * no range cross-join, no per-row subquery. (A custom SparkPlan would
  * only save the tag column; the window form stays in Tungsten.)
  *
  * Ties: a right row at exactly leftTime counts as "before" (ASOF <=
  * semantics); equal-time rows order by (isLeft, tiebreak) so results are
  * deterministic.
  */
object AsOf {

  /** @param left  rows needing a match, with columns key, time, leftId
    * @param right rows supplying matches, with columns key, time, rightId
    * @return left rows + (asof_id, asof_time) of the matched right row
    *         (null when no right row precedes) */
  def join(left: DataFrame, right: DataFrame,
           key: String, time: String, leftId: String, rightId: String)
  : DataFrame = {
    val l = left.select(col(key), col(time), col(leftId).as("__lid"))
      .withColumn("__is_left", lit(1))
      .withColumn("__rid", lit(null: java.lang.Long))
    val r = right.select(col(key), col(time), col(rightId).as("__rid"))
      .withColumn("__is_left", lit(0))
      .withColumn("__lid", lit(null: java.lang.Long))
    val tagged = l.select(col(key), col(time), col("__is_left"),
      col("__lid"), col("__rid"))
      .unionByName(r.select(col(key), col(time), col("__is_left"),
        col("__lid"), col("__rid")))
    // right rows sort before left rows at equal time (<= semantics);
    // rowsBetween(-inf, -1) excludes the current row itself
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__is_left").asc,
        coalesce(col("__rid"), col("__lid")).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("__match",
        last(when(col("__is_left") === 0,
          struct(col(time).as("t"), col("__rid").as("id"))), ignoreNulls = true)
          .over(w))
      .where(col("__is_left") === 1)
      .select(col(key), col(time), col("__lid").as(leftId),
        col("__match.id").as("asof_id"), col("__match.t").as("asof_time"))
  }

  /** Forward as-of join (pandas `merge_asof(direction='forward')`): for
    * each left row, the EARLIEST right row with `rightTime >= leftTime`
    * in the key group. Same single-shuffle union shape as [[join]], with
    * the window frame flipped to (current+1, +∞); left rows sort BEFORE
    * right rows at equal time so an exactly-simultaneous right row is
    * still matched (>= semantics). Ties at the match time break by
    * smallest right id. */
  def joinForward(left: DataFrame, right: DataFrame,
                  key: String, time: String, leftId: String, rightId: String)
  : DataFrame = {
    val l = left.select(col(key), col(time), col(leftId).as("__lid"))
      .withColumn("__is_left", lit(1))
      .withColumn("__rid", lit(null: java.lang.Long))
    val r = right.select(col(key), col(time), col(rightId).as("__rid"))
      .withColumn("__is_left", lit(0))
      .withColumn("__lid", lit(null: java.lang.Long))
    val tagged = l.select(col(key), col(time), col("__is_left"),
      col("__lid"), col("__rid"))
      .unionByName(r.select(col(key), col(time), col("__is_left"),
        col("__lid"), col("__rid")))
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__is_left").desc,
        coalesce(col("__rid"), col("__lid")).asc)
      .rowsBetween(1, Window.unboundedFollowing)
    tagged
      .withColumn("__match",
        first(when(col("__is_left") === 0,
          struct(col(time).as("t"), col("__rid").as("id"))), ignoreNulls = true)
          .over(w))
      .where(col("__is_left") === 1)
      .select(col(key), col(time), col("__lid").as(leftId),
        col("__match.id").as("asof_id"), col("__match.t").as("asof_time"))
  }

  /** Nearest as-of join (pandas `merge_asof(direction='nearest')`): the
    * right row minimizing |rightTime − leftTime| in the key group;
    * equidistant candidates resolve to the backward (at-or-before) match.
    *
    * STILL one shuffle: both directions are window columns over the SAME
    * partitioning/ordering — a (-∞, -1) frame carrying the last preceding
    * right row and a (1, +∞) frame carrying the first following one. An
    * exactly-simultaneous right row sorts before the left row, lands in
    * the backward frame with distance 0, and wins — so the forward frame
    * never needs the >= tie case. */
  def joinNearest(left: DataFrame, right: DataFrame,
                  key: String, time: String, leftId: String, rightId: String)
  : DataFrame = {
    val l = left.select(col(key), col(time), col(leftId).as("__lid"))
      .withColumn("__is_left", lit(1))
      .withColumn("__rid", lit(null: java.lang.Long))
    val r = right.select(col(key), col(time), col(rightId).as("__rid"))
      .withColumn("__is_left", lit(0))
      .withColumn("__lid", lit(null: java.lang.Long))
    val tagged = l.select(col(key), col(time), col("__is_left"),
      col("__lid"), col("__rid"))
      .unionByName(r.select(col(key), col(time), col("__is_left"),
        col("__lid"), col("__rid")))
    val ord = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("__is_left").asc,
        coalesce(col("__rid"), col("__lid")).asc)
    val rightStruct = when(col("__is_left") === 0,
      struct(col(time).as("t"), col("__rid").as("id")))
    val before = last(rightStruct, ignoreNulls = true)
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val after = first(rightStruct, ignoreNulls = true)
      .over(ord.rowsBetween(1, Window.unboundedFollowing))
    val dtB = col(time) - col("__b.t")
    val dtF = col("__f.t") - col(time)
    val pickB = col("__f").isNull || (col("__b").isNotNull && dtB <= dtF)
    tagged
      .withColumn("__b", before)
      .withColumn("__f", after)
      .where(col("__is_left") === 1)
      .withColumn("__m", when(pickB, col("__b")).otherwise(col("__f")))
      .select(col(key), col(time), col("__lid").as(leftId),
        col("__m.id").as("asof_id"), col("__m.t").as("asof_time"))
  }
}
