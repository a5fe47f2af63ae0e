package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic training-shard export: the end of every data pipeline is
  * a set of shard files whose CONTENTS AND ORDER are reproducible, so a
  * training run can be replayed byte-for-byte and any shard can be rebuilt
  * in isolation. The reference's analog is its chunked bulk insert
  * (`/root/reference/src/lib/client.js:219` splits batches, order
  * incidental); a training-data sink must do better than incidental.
  *
  * Shape: [[Sampling.shuffleShards]] assigns (shard, pos) from the salted
  * hash, the frame repartitions BY SHARD (the write's layout IS the
  * shuffle's layout — nothing moves twice) and sorts within partitions by
  * (shard, pos), and the writer emits one directory per shard
  * (`shard=N/`). Re-running with the same salt rebuilds identical shards;
  * changing the salt is a full deterministic reshuffle.
  */
object ShardWriter {

  /** Writes `df` to `path` as `nShards` hash-ordered parquet shards.
    * Returns the (shard, pos, ...) frame as written for verification. */
  def write(df: DataFrame, key: Column, salt: String, nShards: Int,
            path: String): DataFrame = {
    val sharded = Sampling.shuffleShards(df, key, salt, nShards)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
    sharded.write
      .mode("overwrite")
      .partitionBy("shard")
      .parquet(path)
    sharded
  }

  /** Reads one shard back in training order. */
  def readShard(spark: SparkSession, path: String, shard: Int): DataFrame =
    spark.read.parquet(path).where(col("shard") === shard).orderBy("pos")
}
