package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY §2 (or a required
  * extension), expressed Spark-first, with a DuckDB-equivalent oracle in
  * [[oracleSql]]. Column names are aliased identically on both sides (the
  * driver's compare sorts columns by name before hashing values), and all
  * floating-point outputs are derived from exact integer arithmetic so the
  * hashes are bit-stable across engines. Query groups live in
  * `graft.queries.*`; operators they exercise live in `graft.ops.*`.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full deltaSync merge plan: scan → project → window-dedup →
    * anti-joins → union (SURVEY §7.1 P0). */
  def entry(spark: SparkSession): DataFrame =
    queries("merge_delta")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries

  private lazy val allQueries
  : Map[String, (SparkSession, String) => DataFrame] =
    SyncQueries.queries ++ RelationalQueries.queries ++
      WindowQueries.queries ++ PipelineQueries.queries ++
      ExtraQueries.queries ++ Relational2Queries.queries ++
      Pipeline2Queries.queries ++ Pipeline3Queries.queries ++
      Pipeline4Queries.queries ++ Pipeline5Queries.queries ++
      Pipeline6Queries.queries ++ Pipeline7Queries.queries ++
      Pipeline8Queries.queries ++ Pipeline9Queries.queries ++
      Pipeline10Queries.queries ++ Pipeline11Queries.queries ++
      Pipeline12Queries.queries ++ Pipeline13Queries.queries ++
      Pipeline14Queries.queries ++ Pipeline15Queries.queries ++
      Pipeline16Queries.queries ++ Pipeline17Queries.queries ++
      Pipeline18Queries.queries ++ Pipeline19Queries.queries ++
      Pipeline20Queries.queries ++ Pipeline21Queries.queries ++
      Pipeline22Queries.queries ++ Pipeline23Queries.queries ++
      Pipeline24Queries.queries ++ Pipeline25Queries.queries ++
      Pipeline26Queries.queries ++ Pipeline27Queries.queries ++
      Pipeline28Queries.queries ++ Pipeline29Queries.queries ++
      Pipeline30Queries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    SyncQueries.oracles ++ RelationalQueries.oracles ++
      WindowQueries.oracles ++ PipelineQueries.oracles ++
      ExtraQueries.oracles ++ Relational2Queries.oracles ++
      Pipeline2Queries.oracles ++ Pipeline3Queries.oracles ++
      Pipeline4Queries.oracles ++ Pipeline5Queries.oracles ++
      Pipeline6Queries.oracles ++ Pipeline7Queries.oracles ++
      Pipeline8Queries.oracles ++ Pipeline9Queries.oracles ++
      Pipeline10Queries.oracles ++ Pipeline11Queries.oracles ++
      Pipeline12Queries.oracles ++ Pipeline13Queries.oracles ++
      Pipeline14Queries.oracles ++ Pipeline15Queries.oracles ++
      Pipeline16Queries.oracles ++ Pipeline17Queries.oracles ++
      Pipeline18Queries.oracles ++ Pipeline19Queries.oracles ++
      Pipeline20Queries.oracles ++ Pipeline21Queries.oracles ++
      Pipeline22Queries.oracles ++ Pipeline23Queries.oracles ++
      Pipeline24Queries.oracles ++ Pipeline25Queries.oracles ++
      Pipeline26Queries.oracles ++ Pipeline27Queries.oracles ++
      Pipeline28Queries.oracles ++ Pipeline29Queries.oracles ++
      Pipeline30Queries.oracles
}
