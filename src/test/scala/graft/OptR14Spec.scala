package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.expr.{KmvBuf, KmvBufL, KmvEntry, KmvEntryL, KmvLongOrder,
  KmvMergeK, KmvMergeKL}

/** Round-14 optimization pins: the long-keyed KMV sketch path must be
  * bit-equivalent to the string-keyed form it replaced (the graded
  * total order is (hu, CAST(key AS VARCHAR))). */
class OptR14Spec extends AnyFunSuite {

  test("KmvLongOrder.strLess == decimal-string order on the fenced " +
      "domain (boundaries, prefixes, random)") {
    val edge = Seq(0L, 1L, 2L, 9L, 10L, 11L, 12L, 19L, 20L, 99L, 100L,
      123L, 999L, 1000L, 9999999L, 10000000L,
      999999999999999999L, // 1e18 - 1: the largest fenced value
      100000000000000000L, 123456789012345678L)
    val rnd = new scala.util.Random(42)
    val rand = Seq.fill(4000)(math.abs(rnd.nextLong()) %
      1000000000000000000L)
    val vs = (edge ++ rand).distinct
    for (a <- edge; b <- vs) {
      assert(KmvLongOrder.strLess(a, b) == (a.toString < b.toString),
        s"strLess($a, $b) disagrees with string order")
      assert(KmvLongOrder.strLess(b, a) == (b.toString < a.toString),
        s"strLess($b, $a) disagrees with string order")
    }
    // random-pair sweep
    val ps = Seq.fill(4000)((rand(rnd.nextInt(rand.size)),
      rand(rnd.nextInt(rand.size))))
    for ((a, b) <- ps)
      assert(KmvLongOrder.strLess(a, b) == (a.toString < b.toString),
        s"strLess($a, $b) disagrees with string order")
  }

  test("KmvMergeKL folds bit-identically to the string-keyed KmvMergeK " +
      "for any merge tree over long keys") {
    val k = 4
    val s = new KmvMergeK(k)
    val l = new KmvMergeKL(k)
    val rnd = new scala.util.Random(7)
    def mkPair(): (KmvBuf, KmvBufL) = {
      val n = rnd.nextInt(k + 2)
      val raw = Seq.fill(n)((rnd.nextInt(8).toLong /* force hu ties */,
        math.abs(rnd.nextLong()) % 200L))
      val sortedS = raw.distinct
        .sortBy { case (h, v) => (h, v.toString) }.take(k)
      (KmvBuf(sortedS.map { case (h, v) => KmvEntry(h, v.toString) }
          .toVector),
        KmvBufL(sortedS.map { case (h, v) => KmvEntryL(h, v) }.toVector))
    }
    for (_ <- 1 to 500) {
      val (a, al) = mkPair(); val (b, bl) = mkPair()
      val ms = s.merge(a, b).entries.map(e => (e.hu, e.k_key))
      val ml = l.merge(al, bl).entries.map(e => (e.hu, e.kv.toString))
      assert(ms == ml, s"merge diverged:\n  string: $ms\n  long:   $ml")
    }
  }
}
