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

/** All-long sketch entry for LONG-keyed corpora: `kv` is the key
  * itself; ordering must still match the STRING form (the graded
  * total order is (hu, CAST(key AS VARCHAR))), so comparisons go
  * through [[KmvLongOrder.strLess]] — the decimal-string order
  * computed arithmetically, no String ever allocated. */
case class KmvEntryL(hu: Long, kv: Long)

/** Sorted ≤k-entry all-long buffer (see [[KmvEntryL]]). */
case class KmvBufL(entries: Seq[KmvEntryL])

/** Decimal-string order over non-negative longs, without strings:
  * str(a) < str(b)  ⇔  (lj(a), a) < (lj(b), b)  where lj left-justifies
  * the value to 18 digits (v · 10^(18−digits(v))). Lexicographic
  * comparison walks the most significant digits first, which is
  * exactly what the left-justification exposes; ties (one value a
  * digit-prefix of the other) resolve by the shorter-first rule, i.e.
  * the smaller value. Domain fence: 0 ≤ v < 10¹⁸ (callers raise
  * loudly per row before entries are built). */
object KmvLongOrder {
  private val P = Array(1L, 10L, 100L, 1000L, 10000L, 100000L,
    1000000L, 10000000L, 100000000L, 1000000000L, 10000000000L,
    100000000000L, 1000000000000L, 10000000000000L, 100000000000000L,
    1000000000000000L, 10000000000000000L, 100000000000000000L)
  def lj(v: Long): Long = {
    var d = 1
    while (d < 18 && v >= P(d)) d += 1
    v * P(18 - d)
  }
  def strLess(a: Long, b: Long): Boolean = {
    val x = lj(a); val y = lj(b)
    x < y || (x == y && a < b)
  }
}

/** [[KmvMergeK]] over all-long entries — identical fold, identical
  * (hu, decimal-string(key)) total order ([[KmvLongOrder]]), but the
  * per-row encoder moves primitive longs instead of allocating a
  * String per entry per row: the ANF propagation's dominant task-time
  * was exactly that codec (guide §1.2 step 2 — per-task work, after
  * the shape is right). Bit-identical kept sets to the string form on
  * the fenced domain, so the sketch-derived outputs are unchanged. */
class KmvMergeKL(k: Int) extends Aggregator[KmvBufL, KmvBufL, KmvBufL]
    with Serializable {
  require(k >= 2, "KMV needs k >= 2")

  private def lt(a: KmvEntryL, b: KmvEntryL): Boolean =
    a.hu < b.hu || (a.hu == b.hu && KmvLongOrder.strLess(a.kv, b.kv))

  override def zero: KmvBufL = KmvBufL(Vector.empty)

  override def reduce(buf: KmvBufL, e: KmvBufL): KmvBufL = merge(buf, e)

  override def merge(a: KmvBufL, b: KmvBufL): KmvBufL = {
    val ae = a.entries; val be = b.entries
    if (ae.isEmpty) KmvBufL(be.take(k))
    else if (be.isEmpty) KmvBufL(ae.take(k))
    else {
      val out = Vector.newBuilder[KmvEntryL]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < ae.length || j < be.length)) {
        val pick =
          if (i >= ae.length) { val e = be(j); j += 1; e }
          else if (j >= be.length) { val e = ae(i); i += 1; e }
          else {
            val x = ae(i); val y = be(j)
            if (lt(x, y)) { i += 1; x }
            else if (lt(y, x)) { j += 1; y }
            else { i += 1; j += 1; x } // same (hu, kv): keep once
          }
        out += pick; n += 1
      }
      KmvBufL(out.result())
    }
  }

  override def finish(r: KmvBufL): KmvBufL = r

  override def bufferEncoder: Encoder[KmvBufL] = Encoders.product[KmvBufL]
  override def outputEncoder: Encoder[KmvBufL] = Encoders.product[KmvBufL]
}

/** The semilattice join of WHOLE bottom-k sketches: both inputs are
  * already sorted-ascending, distinct, ≤ k entries (a [[KmvBottomK]] /
  * [[KmvMergeK]] output or a singleton seed), so one two-pointer pass
  * merges them exactly — O(k) per merge instead of [[KmvBottomK]]'s
  * per-entry O(k) inserts. This is the sketch-PROPAGATION form (ANF
  * rounds, [[graft.ops.Graph.reachSketch]]): the join fan-out carries
  * one ≤ k-entry ARRAY row per edge instead of k exploded rows, and the
  * partial aggregation folds arrays map-side, so the exchange ships ≤ 1
  * row (≤ k entries) per (vertex, map partition). Same fold, same
  * (hu, k_key) total order, bit-identical kept set. */
class KmvMergeK(k: Int) extends Aggregator[KmvBuf, KmvBuf, KmvBuf]
    with Serializable {
  require(k >= 2, "KMV needs k >= 2")

  private def lt(a: KmvEntry, b: KmvEntry): Boolean =
    a.hu < b.hu || (a.hu == b.hu && a.k_key < b.k_key)

  override def zero: KmvBuf = KmvBuf(Vector.empty)

  override def reduce(buf: KmvBuf, e: KmvBuf): KmvBuf = merge(buf, e)

  override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
    val ae = a.entries; val be = b.entries
    if (ae.isEmpty) KmvBuf(be.take(k))
    else if (be.isEmpty) KmvBuf(ae.take(k))
    else {
      val out = Vector.newBuilder[KmvEntry]
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < ae.length || j < be.length)) {
        val pick =
          if (i >= ae.length) { val e = be(j); j += 1; e }
          else if (j >= be.length) { val e = ae(i); i += 1; e }
          else {
            val x = ae(i); val y = be(j)
            if (lt(x, y)) { i += 1; x }
            else if (lt(y, x)) { j += 1; y }
            else { i += 1; j += 1; x } // same (hu, k_key): keep once
          }
        out += pick; n += 1
      }
      KmvBuf(out.result())
    }
  }

  override def finish(r: KmvBuf): KmvBuf = r

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
}
