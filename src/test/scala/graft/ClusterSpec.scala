package graft

import org.apache.spark.sql.functions._
import graft.ops.Cluster

/** Connected-components clustering (near-dup group assignment). */
class ClusterSpec extends SparkSuite {
  import spark.implicits._

  private def cc(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    val v = vs.toDF("id")
    val e = es.toDF("a", "b")
    Cluster.connectedComponents(v, "id", e, "a", "b")
      .as[(Long, Long)].collect().toMap
  }

  test("singletons, pairs, and a triangle") {
    val got = cc(Seq(1L, 2L, 3L, 4L, 5L, 6L),
      Seq((2L, 3L), (4L, 5L), (5L, 6L), (4L, 6L)))
    assert(got === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("long chain needs multiple propagation rounds") {
    // path graph 10-9-8-...-1: diameter 9, min label must reach the far end
    val vs = (1L to 10L)
    val es = vs.sliding(2).map(p => (p(1), p(0))).toSeq
    val got = cc(vs, es)
    assert(got.values.toSet === Set(1L))
  }

  test("two components merged by a bridge edge") {
    val got = cc(Seq(10L, 20L, 30L, 40L),
      Seq((10L, 20L), (30L, 40L), (20L, 30L)))
    assert(got.values.toSet === Set(10L))
  }

  test("edges with endpoints outside the vertex set are fenced out") {
    // stray endpoint 0 must not mint an output row nor win the min-label
    // race (a cluster labeled by a non-vertex would have no canonical)
    val got = cc(Seq(5L, 6L), Seq((0L, 5L)))
    assert(got === Map(5L -> 5L, 6L -> 6L))
  }

  test("maxIter too small fails loudly instead of returning wrong labels") {
    // a 40-chain survives the 4 propagation rounds, and the star phase
    // cannot finish its contracted remainder in 1 round — must throw,
    // never return partial labels
    val vs = (1L to 40L).toDF("id")
    val es = (1L to 39L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Cluster.connectedComponents(vs, "id", es, "a", "b", maxIter = 1).collect()
    }
  }

  test("high-diameter chain converges through the star phase in O(log n)") {
    // 300-chain: propagation alone would need ~299 rounds; the hybrid
    // contracts after 4 and the star phase finishes logarithmically
    val n = 300L
    val got = cc(1L to n, (1L until n).map(i => (i, i + 1)))
    assert(got.size === n.toInt && got.values.toSet === Set(1L))
    val lg = (math.log(n.toDouble) / math.log(2)).ceil.toInt
    assert(Cluster.lastStarRounds > 0 && Cluster.lastStarRounds <= 2 * lg,
      s"star rounds ${Cluster.lastStarRounds} not O(log n) (n=$n, log2=$lg)")
  }

  test("alternating star directly: mixed components, any edge orientation") {
    import graft.ops.Cluster
    val es = Seq((7L, 3L), (3L, 9L), (9L, 11L), // chain {3,7,9,11}
      (20L, 21L), (21L, 20L),                   // pair + reversed dup
      (30L, 30L))                               // self-loop only
      .toDF("x", "y")
    val got = Cluster.alternatingStar(es, "x", "y")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(3L -> 3L, 7L -> 3L, 9L -> 3L, 11L -> 3L,
      20L -> 20L, 21L -> 20L))
  }

  test("star phase agrees with pure propagation on a random graph") {
    // same edges through both paths: default (propagation converges at
    // low diameter) vs star-only — labelings must be identical
    val rnd = new scala.util.Random(42)
    val vs = (1L to 200L)
    val es = Seq.fill(150)((rnd.nextInt(200) + 1).toLong ->
      (rnd.nextInt(200) + 1).toLong).filter(p => p._1 != p._2)
    val viaProp = cc(vs, es)
    val star = Cluster.alternatingStar(es.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    // star covers edge endpoints only; isolated vertices are the caller's
    viaProp.foreach { case (id, lbl) =>
      assert(star.getOrElse(id, id) === lbl, s"vertex $id: $lbl vs star")
    }
  }

  test("graded shape: every duplicate doc clusters with its original") {
    val q = SparkEntry.queries("dd_cluster_cc")(spark, sfDir)
    val rows = q.collect()
    // planted dups live at +1e8; each must share a cluster with its source
    val byId = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    byId.keys.filter(_ >= 100000000L).foreach { dup =>
      assert(byId(dup) === byId(dup - 100000000L),
        s"dup $dup not clustered with original")
      assert(byId(dup) <= dup - 100000000L)
    }
    // canonical flag is exactly "id == cluster min"
    rows.foreach(r => assert(r.getBoolean(2) === (r.getLong(0) == r.getLong(1))))
  }
}
