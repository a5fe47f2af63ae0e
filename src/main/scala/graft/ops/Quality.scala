package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates — the assertions a pipeline runs BEFORE training
  * data ships. The reference trusts its source and re-checks nothing
  * beyond row counts (`/root/reference/src/lib/client.js:1738`); at
  * 100 TB, silent referential drift or key duplication is how a corpus
  * rots. All three gates are single-purpose wrappers over the engine's
  * join/aggregate algebra, so they inherit its plans (anti-joins
  * broadcast small dims, aggregates combine map-side).
  */
object Quality {

  /** Fact rows whose foreign key has no match in the dim — referential
    * integrity violations. Null FKs never equal anything, so the
    * anti-join reports them as violations too (spec-pinned). */
  def orphans(fact: DataFrame, fk: String, dim: DataFrame,
              dk: String): DataFrame =
    fact.join(dim.select(col(dk)).distinct(),
        fact(fk) === dim(dk), "left_anti")

  /** Key groups violating a uniqueness expectation: (keys, n_rows) for
    * every key appearing more than once. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .where(col("n_rows") > 1)

  /** Per-column null counts over the given columns, one output row per
    * column: (column, n_null, n_total) — exact integers, one pass. */
  def nullStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
      count(lit(1)).as(s"__tot_$c")))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map(c =>
      s"'$c', __null_$c, __tot_$c").mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stacked) AS (column_name, n_null, n_total)")
  }
}
