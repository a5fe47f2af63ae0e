package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling for corpus curation. Random-number sampling
  * (`df.sample`) is not reproducible across engines, partitionings, or
  * reruns — at 100 TB a re-run that samples different rows invalidates
  * every downstream artifact. These operators derive the keep/drop
  * decision from a content hash instead, so the sample is a pure function
  * of the data: stable under repartitioning, resumable, and co-sampled
  * across tables that share the key (the property the reference's keyed
  * delta sync relies on for href identity,
  * /root/reference/src/lib/client.js:1480 keyed fetch).
  *
  * Scale: both operators are single-pass. [[hashBernoulli]] is a pure
  * filter (no shuffle, pushes through joins); [[stratifiedFixed]] is one
  * window sort per stratum — the shuffle key is the stratum, so skewed
  * strata AQE-split cleanly.
  */
object Sampling {

  /** Unsigned view of the 32-bit Java string hash of `key` — the engine's
    * cross-checkable hash family (expr/JavaStringHash). */
  private def hu(key: Column): Column =
    graft.expr.GraftFunctions.java_string_hash(key)
      .cast("long").bitwiseAND(lit(0xFFFFFFFFL))

  /** Keep rows where hash(key) mod `m` < `k` — an exact k/m-rate Bernoulli
    * sample, reproducible anywhere the hash is computable. */
  def hashBernoulli(df: DataFrame, key: Column, k: Int, m: Int): DataFrame = {
    require(m > 0 && k >= 0 && k <= m, s"rate $k/$m out of range")
    graft.expr.GraftFunctions.register(df.sparkSession)
    df.where(pmod(hu(key), lit(m.toLong)) < k)
  }

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by ascending (hash(key), key) — a deterministic uniform draw
    * with a total tiebreak so no two engines can disagree. Adds
    * `samp_rank` (1-based, long). */
  def stratifiedFixed(df: DataFrame, strata: Seq[String], key: Column,
                      n: Int): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    val w = Window.partitionBy(strata.map(col): _*)
      .orderBy(hu(key).asc, key.asc)
    df.withColumn("samp_rank", row_number().over(w).cast("long"))
      .where(col("samp_rank") <= n)
  }
}
