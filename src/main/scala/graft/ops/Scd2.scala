package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 history derivation: compress a change feed into validity
  * intervals per key — the history-tracking extension of the reference's
  * current-state sync (its merge keeps only the latest row per href,
  * `/root/reference/src/lib/client.js:1033`; SCD2 keeps every distinct
  * state with [valid_from, valid_to) bounds).
  *
  * Scale design (100 TB): one shuffle. Both window passes partition by the
  * same key with the same ordering, and the run-compression filter between
  * them preserves partitioning AND sort order, so Catalyst plans a single
  * exchange + single sort feeding two Window operators back to back.
  * State per key is O(changes), never materialized driver-side.
  */
object Scd2 {

  /** @param feed   change feed: one row per observation of `attrCol`
    * @param tieCol deterministic tie-break for equal timestamps (an event
    *               id); makes the derivation reproducible across engines
    * @return one row per attribute RUN: (key, attr, valid_from, valid_to,
    *         is_current), valid_to exclusive and NULL for the open run */
  def history(feed: DataFrame, keyCol: String, attrCol: String,
              tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    // run compression: keep each key's FIRST row unconditionally (lag's
    // null default is otherwise indistinguishable from a real null
    // attribute, and a leading null run would vanish), then every row
    // whose attribute differs null-safely from the previous observation
    val changes = feed
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .where(col("__rn") === 1 || !(col("__prev") <=> col(attrCol)))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }
}
