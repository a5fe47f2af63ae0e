package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.expr.{KmvBufL, KmvEntryL, KmvMergeArr, KmvMergeKL}

/** Round-15 optimization pins: the flat-long[] TypedImperativeAggregate
  * (KmvMergeArr) must fold bit-identically to the typed-Aggregator form
  * (KmvMergeKL) it replaced in the reachSketch rounds. */
class OptR15Spec extends AnyFunSuite {

  private val k = 4
  private val rnd = new scala.util.Random(7)

  // a sorted-distinct ≤k-entry sketch in both representations
  private def mkPair(): (KmvBufL, Array[Long]) = {
    val n = rnd.nextInt(k + 2)
    val raw = Seq.fill(n)((rnd.nextInt(8).toLong /* force hu ties */,
      math.abs(rnd.nextLong()) % 200L))
    val sorted = raw.distinct
      .sortBy { case (h, v) => (h, v.toString) }.take(k)
    (KmvBufL(sorted.map { case (h, v) => KmvEntryL(h, v) }.toVector),
      sorted.flatMap { case (h, v) => Seq(h, v) }.toArray)
  }

  private def flatOf(b: KmvBufL): Seq[(Long, Long)] =
    b.entries.map(e => (e.hu, e.kv))
  private def pairsOf(a: Array[Long]): Seq[(Long, Long)] =
    a.grouped(2).map(p => (p(0), p(1))).toSeq

  test("KmvMergeArr.merge folds bit-identically to KmvMergeKL for any " +
      "merge tree") {
    val l = new KmvMergeKL(k)
    val arr = KmvMergeArr(
      BoundReference(0, KmvMergeArr.entriesType, nullable = true), k)
    for (_ <- 1 to 500) {
      val (al, aa) = mkPair(); val (bl, ba) = mkPair()
      val ml = flatOf(l.merge(al, bl))
      val ma = pairsOf(arr.merge(aa, ba))
      assert(ml == ma, s"merge diverged:\n  kl:  $ml\n  arr: $ma")
    }
  }

  test("KmvMergeArr.update decodes an array-of-structs input row and " +
      "folds like KmvMergeKL.reduce; eval re-encodes the same entries") {
    val l = new KmvMergeKL(k)
    val arr = KmvMergeArr(
      BoundReference(0, KmvMergeArr.entriesType, nullable = true), k)
    for (_ <- 1 to 200) {
      val (al, aa) = mkPair(); val (bl, ba) = mkPair()
      val row = InternalRow(new GenericArrayData(
        pairsOf(ba).map { case (h, v) => InternalRow(h, v) }.toArray[Any]))
      val ml = flatOf(l.reduce(al, bl))
      val ma = pairsOf(arr.update(aa.clone(), row))
      assert(ml == ma, s"update diverged:\n  kl:  $ml\n  arr: $ma")
      // eval round-trips the buffer into the entries array unchanged
      val ev = arr.eval(ma.flatMap { case (h, v) => Seq(h, v) }.toArray)
        .asInstanceOf[GenericArrayData]
      val back = (0 until ev.numElements()).map { i =>
        val st = ev.getStruct(i, 2); (st.getLong(0), st.getLong(1))
      }
      assert(back == ma, s"eval round-trip diverged: $back vs $ma")
    }
    // null input rows contribute nothing (the KmvMergeKL zero rule)
    val (_, aa) = mkPair()
    assert(pairsOf(arr.update(aa.clone(), InternalRow(null))) ==
      pairsOf(aa))
  }

  test("KmvMergeArr serialize/deserialize round-trips the flat buffer") {
    val arr = KmvMergeArr(
      BoundReference(0, KmvMergeArr.entriesType, nullable = true), k)
    for (_ <- 1 to 100) {
      val (_, a) = mkPair()
      assert(arr.deserialize(arr.serialize(a)).toSeq == a.toSeq)
    }
    assert(arr.deserialize(arr.serialize(Array.emptyLongArray)).isEmpty)
  }
}
