package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A1 — keep-latest window dedup.
  *
  * The reference collapses duplicate hrefs captured across shifting pages to
  * the most recent version with
  * `ROW_NUMBER() OVER (PARTITION BY href ORDER BY modified DESC) = 1`
  * (reference: src/lib/client.js:1084-1091, 953-960, 1217-1224, 1166-1173 —
  * the same window appears 4×: delta/full/safe-sync inserts on pg+mssql).
  *
  * `dropDuplicates` is NOT equivalent (it keeps an arbitrary row); this must
  * be the max-by-`modified` row, with a deterministic tiebreak so results are
  * hash-stable against the oracle.
  *
  * Scale: the window shuffles once on the partition keys — the same shuffle
  * any engine needs for this dedup. No driver materialization; skewed keys
  * are handled by AQE (the key domain here is hrefs, which are near-unique,
  * so skew is structurally absent).
  */
object Dedup {

  /** Keep exactly one row per key group: the first under `order`.
    * Always append a deterministic tiebreak yourself if `order` can tie. */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** A1 exactly as the reference composes it: latest `modified_ms` wins,
    * ties broken by `href` then `jsondata` (SURVEY §7.3 risk 2). */
  def keepLatest(df: DataFrame,
                 keys: Seq[String] = Seq("href"),
                 modified: String = "modified_ms"): DataFrame =
    keepFirst(df, keys,
      Seq(col(modified).desc, col("href").asc, col("jsondata").asc_nulls_first))

  /** Exact duplicate removal on a payload column (LLM-pipeline op):
    * hash-groupBy, keep the smallest id per identical payload.
    * One shuffle on the payload hash; at 100 TB pre-hash with xxhash64 so
    * the shuffle carries an 8-byte key, not the document text.
    */
  def exactByPayload(df: DataFrame, payload: String, idCol: String): DataFrame = {
    // shuffle key = 64-bit fingerprint; the full payload rides along only
    // for the (vanishingly rare) same-hash different-text safety re-check
    keepFirst(df.withColumn("__fp", xxhash64(col(payload))),
      Seq("__fp", payload), Seq(col(idCol).asc))
      .drop("__fp")
  }
}
