package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — assembling documents into fixed token-budget training
  * contexts. The two deployed flavors:
  *
  *  - `packChunks`: "concatenate and chunk". Documents are laid end to end
  *    in a deterministic order and the stream is cut every `budget` tokens;
  *    a document may straddle a boundary, in which case it contributes one
  *    piece to each bin it touches. Closed-form: one window cumsum + an
  *    integer-division explode. No sequential state, so it parallelizes
  *    perfectly — this is the shape to use at 100 TB.
  *
  *  - `greedyPack`: no-split first-fit in document order. A document never
  *    crosses a bin boundary; a new bin opens when the current one cannot
  *    take the next document whole. Inherently sequential PER GROUP, so the
  *    implementation shuffles once on the group key and streams each
  *    partition in sorted order with O(1) state — group size is unbounded
  *    (nothing is materialized per group), the sequential region is one
  *    group on one core, which is exactly the per-output-shard packing loop
  *    a real pipeline runs.
  *
  * All math is integer (token counts, bin ids, offsets) — bit-reproducible
  * against any engine.
  */
object Packing {

  private def fdiv(a: Column, b: Column): Column = call_function("div", a, b)

  /** Concat-and-chunk packing. Input rows need a group, a unique in-group
    * order key, and a positive token length. Output: one row per
    * (document × bin it touches) with the piece geometry:
    * `bin` (0-based within group), `piece_start`/`piece_len` (offsets in
    * the document), `bin_offset` (where the piece lands inside the bin).
    * Rows with len < 1 are rejected up front (a zero-length doc occupies
    * no bin).
    */
  def packChunks(docs: DataFrame, group: String, id: String, len: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget $budget must be >= 1")
    val reserved = Set("bin", "piece_start", "piece_len", "bin_offset",
      "__after", "__before", "__bin_start", "__piece_from", "__piece_to")
    val clash = docs.columns.toSet.intersect(reserved)
    require(clash.isEmpty,
      s"input carries reserved packing columns: ${clash.mkString(", ")}")
    val w = Window.partitionBy(group).orderBy(id)
    val b = lit(budget)
    val cumAfter = sum(col(len).cast("long")).over(w)
    docs
      .where(col(len) >= 1)
      .withColumn("__after", cumAfter)
      .withColumn("__before", col("__after") - col(len))
      .withColumn("bin",
        explode(sequence(fdiv(col("__before"), b),
                         fdiv(col("__after") - 1, b))))
      .withColumn("__bin_start", col("bin") * b)
      .withColumn("__piece_from", greatest(col("__before"), col("__bin_start")))
      .withColumn("__piece_to",
        least(col("__after"), col("__bin_start") + b))
      .select(col(group), col(id), col(len).cast("long").as(len), col("bin"),
        (col("__piece_from") - col("__before")).as("piece_start"),
        (col("__piece_to") - col("__piece_from")).as("piece_len"),
        (col("__piece_from") - col("__bin_start")).as("bin_offset"))
  }

  /** No-split greedy packing in (group, id) order. Returns the input keys
    * plus `bin` (0-based within group). Semantics: the first document of a
    * group always opens bin 0 (even if longer than the budget); after that
    * a document that does not fit whole opens a new bin. One shuffle
    * (repartition by group), then a sorted streaming pass with constant
    * state — no per-group materialization, so a skewed group degrades to
    * one busy core, never to an OOM.
    *
    * Output schema is the typed KEY projection, not the input schema:
    * (group: string, id: long, len: long, bin: long) — group/id/len are
    * CAST to those types and every other input column is dropped (the
    * streaming pass runs on a fixed-width tuple encoder). Join the result
    * back on (group, id) to re-attach payload columns. */
  def greedyPack(docs: DataFrame, group: String, id: String, len: String,
      budget: Long): DataFrame = {
    require(budget >= 1, s"budget $budget must be >= 1")
    require(!Seq(group, id, len).contains("bin"),
      "input key columns must not be named 'bin' (the output bin column)")
    val spark = docs.sparkSession
    import spark.implicits._
    val typed = docs.select(col(group).cast("string"), col(id).cast("long"),
      col(len).cast("long")).as[(String, Long, Long)]
    typed
      .repartition(col(group))
      .sortWithinPartitions(col(group), col(id))
      .mapPartitions { it =>
        // explicit started flag: a NULL group at the start of a partition
        // must still reset state (null == null-sentinel would not)
        var started = false
        var g: String = null
        var bin = 0L
        var fill = 0L
        it.map { case (gg, i, l) =>
          if (!started || gg != g) { started = true; g = gg; bin = 0L; fill = l }
          else if (fill + l > budget) { bin += 1L; fill = l }
          else fill += l
          (gg, i, l, bin)
        }
      }
      .toDF(group, id, len, "bin")
  }
}
