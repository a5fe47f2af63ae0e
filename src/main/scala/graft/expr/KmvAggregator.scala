package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (hash, key) candidate of a KMV bottom-k sketch. */
case class KmvEntry(hu: Long, k_key: String)

/** The sorted ≤k-entry buffer (wrapped: Aggregator buffers need a
  * Product encoder). Entries ascend by (hu, k_key) and are distinct. */
case class KmvBuf(entries: Seq[KmvEntry])

/** KMV bottom-k as a typed `Aggregator` (SURVEY §2.10): the semilattice
  * fold of [[graft.ops.Freq.bottomKMerge]] as TRUE PARTIAL AGGREGATION —
  * map-side combine caps every partition's contribution at k entries
  * before the shuffle, so a group's sketch costs O(k) shuffled rows no
  * matter how many occurrences stream past. This is both the
  * graduation path for a skewed group in the window form of
  * [[graft.ops.Freq.bottomK]] AND the streaming state: under a
  * complete-mode streaming aggregation the buffer is the per-group
  * state, hard-bounded at k entries per group (the stream_cms regime —
  * state sized by the SKETCH, not the key space), and because merge is
  * the semilattice join, the final emission equals the batch sketch
  * for any batching of the input.
  *
  * Determinism: entries are deduplicated on the full (hu, k_key) pair
  * and ordered by it, so reduce/merge order cannot change the result
  * (32-bit collisions between distinct keys keep both entries, the
  * [[graft.ops.Freq.bottomK]] rule).
  */
class KmvBottomK(k: Int) extends Aggregator[KmvEntry, KmvBuf, KmvBuf]
    with Serializable {
  require(k >= 2, "KMV needs k >= 2")

  private def lt(a: KmvEntry, b: KmvEntry): Boolean =
    a.hu < b.hu || (a.hu == b.hu && a.k_key < b.k_key)

  override def zero: KmvBuf = KmvBuf(Vector.empty)

  override def reduce(buf: KmvBuf, e: KmvEntry): KmvBuf = {
    val es = buf.entries
    // fast reject: full buffer and e ranks past the current k-th
    if (es.length >= k && !lt(e, es.last)) buf
    else {
      val i = es.indexWhere(!lt(_, e))
      if (i >= 0 && es(i) == e) buf // already present (duplicate key)
      else {
        val at = if (i < 0) es.length else i
        KmvBuf(((es.take(at) :+ e) ++ es.drop(at)).take(k))
      }
    }
  }

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
    b.entries.foldLeft(a)(reduce)

  override def finish(r: KmvBuf): KmvBuf = r

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}
