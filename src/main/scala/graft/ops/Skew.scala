package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys.
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) — it splits oversized post-shuffle partitions at
  * runtime. Salting is for the cases AQE can't fix: a broadcast-too-big
  * dimension joined on a key where one value dominates (e.g. a tenant
  * with 40% of all rows at 100 TB).
  */
object Skew {

  /** Salted equi-join: the skewed (big) side gets a deterministic salt in
    * [0, salts); the small side is replicated ×salts; the join key becomes
    * (key, salt), spreading each hot key over `salts` reducers.
    * Deterministic salt (hash of the whole row) keeps re-runs stable. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-stage salted aggregation for algebraic aggregates (sum/count):
    * partial per (key, salt), final per key. Only needed when a single
    * group's partial state is itself too hot for one task — ordinary
    * hash aggregation already does map-side combine. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: Column,
                     salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)).cast("int"))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("n"))
  }
}
