package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TimeSeries

/** Round-13 batch: the matrix-profile append identity — the 22nd
  * inc_* merge≡rebuild row, extending the incremental-maintenance
  * family to the motif/discord monitoring path (a week of new data
  * re-scores only the pairs touching its windows; the stored profile
  * is reused verbatim and can only be LOWERED).
  *
  * Reference scope note: the reference (sri2db) has no time-series
  * surface — north-star LLM-pipeline extensions in the established
  * exact-integer, oracle-first idiom.
  */
object Pipeline28Queries {

  type Q = (SparkSession, String) => DataFrame

  /** Week-number split for inc_mp_delta: arrivals are the weeks from
    * 2000-07-01 on (week 1591 since 1970-01-01) — a calendar SUFFIX,
    * the append-only shape the identity requires. The fixture spans
    * 1995-01..2001-08 (~343 weekly points per key at any SF), so the
    * base carries ~287 windows and the delta ~56. */
  private val CutoffWeek = 1591L

  val queries: Map[String, Q] = Map(

    "inc_mp_delta" -> ((s, dir) => {
      // the 22nd inc_* identity, on the matrix-profile path: appending
      // a calendar suffix leaves every old window vector and old×old
      // distance untouched, so merged = min(stored profile, pairs
      // touching a new window) — old×old never re-scores. Same weekly
      // fixture as ts_matrix_profile (w=8, exclusion zone 8); graded
      // surface = the merged profile; oracle = the full rebuild
      // (ts_matrix_profile's SQL verbatim).
      val wkly = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("pri"),
          call_function("div",
            datediff(col("o_orderdate").cast("date"),
              to_date(lit("1970-01-01"))), lit(7L)).as("wn"))
        .agg(count(lit(1)).as("x"))
      val isNew = col("wn") >= CutoffWeek
      val stored = TimeSeries.matrixProfile(wkly.where(!isNew),
        Seq("pri"), col("wn"), "x", w = 8, maxSeries = 400)
      TimeSeries.matrixProfileMergedDelta(wkly, Seq("pri"), col("wn"),
          "x", w = 8, isNew, stored, maxSeries = 400)
        .orderBy("pri", "i")
    })
  )

  // --------------------------------------------------------------------
  // Oracles
  // --------------------------------------------------------------------

  val oracles: Map[String, String] = Map(
    // the inc_* oracle-reuse convention: merge must equal the rebuild
    "inc_mp_delta" -> Pipeline27Queries.oracles("ts_matrix_profile")
  )
}
