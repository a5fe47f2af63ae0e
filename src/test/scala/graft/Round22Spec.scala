package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Round-11: full two-level Louvain — the closed forms and ascent
  * invariants the parquet oracle can't state. */
class Round22Spec extends SparkSuite {
  import spark.implicits._

  // two triangles joined by one bridge: the textbook two-community graph
  private def bridgeEdges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L),
    (3L, 4L)).toDF("src", "dst")

  private def w1(e: org.apache.spark.sql.DataFrame) =
    e.select(least($"src", $"dst").as("lo"),
      greatest($"src", $"dst").as("hi"), lit(1L).as("w"))

  test("louvain finds the two triangles on the bridge graph: phase 1 " +
      "merges under the growth cap, level 2 pulls the stragglers home") {
    // phase 1 (hand-traced): r1 merges {1,2} under c1, {3,4} under c3,
    // {4? -> no: 4 joins 3}, {5 joins 4}; r2 consolidates to
    // {1,2,3}, {4,5}, {6}; r3 rejects. Level 2 then merges {4,5} + {6}
    // into one supernode community labeled 3 -- the two triangles.
    val got = Graph.louvain(bridgeEdges, "src", "dst")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 3L), (5L, 3L), (6L, 3L)))
    // the partition IS the two triangles regardless of label ids
    assert(got.filter(_._1 <= 3).map(_._2).distinct.length === 1)
    assert(got.filter(_._1 >= 4).map(_._2).distinct.length === 1)
  }

  test("swap guard: without it two adjacent singletons would trade " +
      "communities; with it the weighted move round merges them under " +
      "the smaller id") {
    // a single edge: both nodes see gain 4W·1 − 2·1·(1−1+1) = 2 > 0;
    // unguarded, 1→comm2 and 2→comm1 simultaneously (a swap);
    // the guard forbids 1→2 (larger singleton), so only 2→1 moves
    val e = Seq((1L, 2L, 1L)).toDF("lo", "hi", "w")
    val a0 = Seq((1L, 1L), (2L, 2L)).toDF("node", "comm")
    val got = Graph.louvainMoveRoundWeighted(e, a0)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 1L), (2L, 1L)))
  }

  test("weighted move round books self-loops into degrees and volumes " +
      "but never into k_ix (they move with the node)") {
    // supernodes: 1 (self-loop 3) — 4 (self-loop 3), bridge w=1: the
    // phase-2 coarse graph of the bridge fixture. W = 7. Moving 4 into
    // comm 1: gain = 4·7·1 − 2·7·(7 − 7 + 7) = 28 − 98 < 0 → no move.
    val e = Seq((1L, 1L, 3L), (1L, 4L, 1L), (4L, 4L, 3L))
      .toDF("lo", "hi", "w")
    val a0 = Seq((1L, 1L), (4L, 4L)).toDF("node", "comm")
    val got = Graph.louvainMoveRoundWeighted(e, a0)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 1L), (4L, 4L)))
  }

  test("modularityNumWeighted closed forms: the bridge graph's two-" +
      "triangle partition scores 70 at scale 4W^2, its singleton " +
      "partition -34, and coarsening preserves the numerator exactly") {
    val e = w1(bridgeEdges)
    val best = Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 4L), (5L, 4L), (6L, 4L)).toDF("node", "comm")
    assert(Graph.modularityNumWeighted(e, best)
      .as[Long].collect().head === 70L)
    val singles = (1L to 6L).map(i => (i, i)).toDF("node", "comm")
    assert(Graph.modularityNumWeighted(e, singles)
      .as[Long].collect().head === -34L)
    // the phase-2 invariant: coarse graph + identity assignment scores
    // the SAME numerator as the original graph + composed assignment
    val coarse = Seq((1L, 1L, 3L), (1L, 4L, 1L), (4L, 4L, 3L))
      .toDF("lo", "hi", "w")
    val ident = Seq((1L, 1L), (4L, 4L)).toDF("node", "comm")
    assert(Graph.modularityNumWeighted(coarse, ident)
      .as[Long].collect().head === 70L)
  }

  test("jaccardLinks closed form: scaled-integer Jaccard, hub " +
      "normalization, deterministic tie-break by co-item id") {
    // groups g1={1,2,3}, g2={1,2}, g3={2,4} → J(1,2)=2/3, J(1,3)=1/2,
    // J(2,3)=1/3, J(2,4)=1/3 (tie → co-item asc)
    val df = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L),
      (30L, 2L), (30L, 4L)).toDF("g", "i")
    val got = graft.ops.Graph.jaccardLinks(df, "g", "i", k = 2)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2))
    assert(got.filter(_._1 == 2L).toSeq === Seq(
      (2L, 1L, 1L, 2L, 3L, 666666L),   // J(2,1) = 2/3
      (2L, 2L, 3L, 1L, 3L, 333333L)))  // tie 1/3 with 4 → 3 wins by id
    assert(got.filter(_._1 == 1L).map(_._3).toSeq === Seq(2L, 3L))
  }

  test("jaccard stats additivity: merged base+delta GROUP-slice stats " +
      "rank identically to the full rebuild (the inc_* contract)") {
    val gi = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey".cast("long").as("g"),
        $"l_suppkey".cast("long").as("i"))
      .distinct().localCheckpoint()
    val isNew = $"g" % 7 === 0 // a different split than the graded one
    val full = Graph.jaccardTopKFromStats(
      Graph.jaccardPairCounts(gi), Graph.jaccardDegrees(gi), k = 3)
    val merged = Graph.jaccardTopKFromStats(
      Graph.jaccardMergeStats(Graph.jaccardPairCounts(gi.where(!isNew)),
        Graph.jaccardPairCounts(gi.where(isNew)), Seq("ia", "ib"),
        "common"),
      Graph.jaccardMergeStats(Graph.jaccardDegrees(gi.where(!isNew)),
        Graph.jaccardDegrees(gi.where(isNew)), Seq("i"), "d"), k = 3)
    assert(full.collect().sortBy(r => (r.getLong(0), r.getLong(1)))
      .toSeq ===
      merged.collect().sortBy(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("apEval closed form: ap_num = sum of (2520*h_r) div r at hit " +
      "ranks, exactly lcm-scaled; no-hit queries score 0") {
    val ranked = Seq((1L, 1L, 101L), (1L, 2L, 102L), (1L, 3L, 103L),
      (2L, 1L, 104L)).toDF("query_id", "rnk", "doc_id")
    val qrels = Seq((1L, 101L), (1L, 103L), (2L, 999L))
      .toDF("query_id", "doc_id")
    val got = graft.ops.Retrieval.apEval(ranked, qrels)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // q1: hit@1 (h=1): 2520; hit@3 (h=2): 5040 div 3 = 1680 → 4200
    // q2: no hit in the list → 0 (n_rel = 1 from the unseen judgment)
    assert(got.toSeq === Seq((1L, 2L, 4200L), (2L, 1L, 0L)))
  }

  test("audioEnergySplit closed forms: half-silent payload splits " +
      "energy exactly; a flat payload is all silence") {
    val df = Seq((1L, Array[Byte](0, 0, 0, 0, 8, 8, 8, 8)),
      (2L, Array.fill[Byte](16)(5))).toDF("media_id", "payload")
    val got = graft.ops.Multimodal.audioEnergySplit(df, "payload",
        frames = 4)
      .select("media_id", "n_voiced", "voiced_energy", "silence_energy")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 2L, 32L, 0L), (2L, 0L, 0L, 80L)))
  }

  test("louvain ascends: the final partition's exact modularity " +
      "numerator is >= the singleton baseline on the purchase graph") {
    // the graded purchase-graph slice (customers even, suppliers odd)
    val edges = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir).where($"c_nationkey" === 1)
        .select($"c_custkey"), $"o_custkey" === $"c_custkey")
      .join(Tables.lineitem(spark, sfDir),
        $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"),
        ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val e = edges.select(least($"src", $"dst").as("lo"),
      greatest($"src", $"dst").as("hi"), lit(1L).as("w"))
      .distinct().localCheckpoint()
    val fin = Graph.louvain(edges, "src", "dst")
    val qFin = Graph.modularityNumWeighted(e, fin)
      .as[Long].collect().head
    val nodes = e.select(explode(array($"lo", $"hi")).as("node"))
      .distinct().select($"node", $"node".as("comm"))
    val q0 = Graph.modularityNumWeighted(e, nodes)
      .as[Long].collect().head
    assert(qFin > q0, s"louvain did not improve: $qFin <= $q0")
    // and it actually merged: fewer communities than nodes
    assert(fin.select("comm").distinct().count() < fin.count(),
      "louvain merged nothing")
  }

  test("capped move round ≡ brute-force reference on seeded random " +
      "graphs — the exactness net under the two-phase cap and the " +
      "fused-round refactors (self-loops, multi-edges, isolated " +
      "members, swap-guard ties all drawn)") {
    // a straight-line Scala model of the documented semantics: exact
    // gains at scale 4W², swap guard, argmax (max gain, tie min c),
    // cap = per-community (gain desc, node asc) top-n_c
    def reference(raw: Seq[(Long, Long, Long)],
                  assign: Map[Long, Long]): Map[Long, Long] = {
      val bigW = raw.map(_._3).sum
      val cross = raw.filter(t => t._1 != t._2)
      val d = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      cross.foreach { case (a, b, w) => d(a) += w; d(b) += w }
      raw.filter(t => t._1 == t._2)
        .foreach { case (a, _, w) => d(a) += 2 * w }
      val members = assign.keys.toSeq.groupBy(assign)
      val dc = members.map { case (c, ns) => c -> ns.map(d).sum }
      val nc = members.map { case (c, ns) => c -> ns.size.toLong }
      val k = scala.collection.mutable.Map.empty[(Long, Long), Long]
        .withDefaultValue(0L)
      cross.foreach { case (a, b, w) =>
        k((a, assign(b))) += w; k((b, assign(a))) += w
      }
      val props = assign.keys.toSeq.sorted.flatMap { i =>
        val a = assign(i)
        val nbrs = cross.flatMap { case (x, y, _) =>
          if (x == i) Some(assign(y))
          else if (y == i) Some(assign(x)) else None
        }.distinct.filter(_ != a)
        val cands = nbrs.flatMap { c =>
          if (nc(a) == 1L && nc(c) == 1L && c > a) None
          else {
            val gain = 4L * bigW * (k((i, c)) - k((i, a))) -
              2L * d(i) * (dc(c) - dc(a) + d(i))
            if (gain > 0L) Some((c, gain)) else None
          }
        }
        if (cands.isEmpty) None
        else {
          val g = cands.map(_._2).max
          Some((i, cands.filter(_._2 == g).map(_._1).min, g))
        }
      }
      val kept = props.groupBy(_._2).flatMap { case (c, ps) =>
        ps.sortBy(p => (-p._3, p._1)).take(nc(c).toInt)
          .map(p => p._1 -> c)
      }
      assign.map { case (nd, cm) => nd -> kept.getOrElse(nd, cm) }
    }
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 1 to 8) {
      val n = 8 + rnd.nextInt(13)
      val nEdges = n + rnd.nextInt(2 * n)
      val raw = ((1 to nEdges).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b), 1L + rnd.nextInt(3))
      } ++ Seq.fill(rnd.nextInt(3))(
        { val s = rnd.nextInt(n).toLong; (s, s, 1L + rnd.nextInt(2).toLong) })
      ).toVector
      // few labels → multi-member communities AND singleton swaps both
      // occur; two extra edge-less nodes cover the isolated-member path
      val labels = Vector.fill(3 + rnd.nextInt(3))(rnd.nextInt(50).toLong)
      val assign = (0L until (n + 2).toLong)
        .map(v => v -> labels(rnd.nextInt(labels.size))).toMap
      val expected = reference(raw, assign)
      val got = Graph.louvainMoveRoundWeighted(
          raw.toDF("lo", "hi", "w"),
          assign.toSeq.toDF("node", "comm"), capInMigration = true)
        .as[(Long, Long)].collect().toMap
      assert(got === expected,
        s"trial $trial diverged (n=$n, edges=${raw.size})")
    }
  }
}
