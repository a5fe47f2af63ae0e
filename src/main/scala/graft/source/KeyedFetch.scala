package graft.source

/** S2 — keyed batch fetch planning (reference `getAllHrefs`,
  * client.js:1524-1577): pack N resource keys into `?keyIn=k1,k2,…`
  * request URLs, bounded by both a URL length limit (2048) and a batch
  * row limit (500), exactly like the reference's `getNextPath` packing.
  *
  * The packing itself is pure and unit-tested; at scale the fetch runs
  * inside `mapPartitions` over the distributed key set — each partition
  * packs and issues its own batches, so the driver never holds the keys
  * (SURVEY §7.3 risk 6: the reference fetches on the client, we don't).
  */
object KeyedFetch {

  final case class Batch(path: String, keys: Seq[String])

  def packBatches(basePath: String, keys: Seq[String],
                  maxUrlLength: Int = 2048, maxBatch: Int = 500): Seq[Batch] = {
    val sep = if (basePath.contains("?")) "&" else "?"
    val prefix = s"$basePath${sep}keyIn="
    val out = scala.collection.mutable.ArrayBuffer[Batch]()
    var cur = scala.collection.mutable.ArrayBuffer[String]()
    var len = prefix.length
    keys.foreach { k =>
      val extra = k.length + (if (cur.isEmpty) 0 else 1)
      if (cur.nonEmpty && (len + extra > maxUrlLength || cur.size >= maxBatch)) {
        out += Batch(prefix + cur.mkString(","), cur.toSeq)
        cur = scala.collection.mutable.ArrayBuffer[String]()
        len = prefix.length
      }
      cur += k
      len += extra
    }
    if (cur.nonEmpty) out += Batch(prefix + cur.mkString(","), cur.toSeq)
    out.toSeq
  }

  /** Distributed point-fetch: pack per partition, fetch via the supplied
    * transport, emit raw page bodies for envelope normalization.
    * (Transport untested offline; packing + partition plumbing are.) */
  def fetchAll(keys: org.apache.spark.sql.Dataset[String], basePath: String,
               transport: String => String): org.apache.spark.sql.Dataset[String] = {
    import keys.sparkSession.implicits._
    keys.mapPartitions { it =>
      packBatches(basePath, it.toSeq).iterator.map(b => transport(b.path))
    }
  }
}
