package graft

import org.apache.spark.sql.functions._
import graft.ops.{Freq, Funnel, Graph, Retrieval, TimeSeries}

/** Round-8 batch-3 operators — the invariants the parquet oracle can't
  * state: BM25's exact rational arithmetic on a hand corpus, funnel
  * ordering semantics, count-min mergeability and the overcount bound,
  * wedge-based Jaccard prediction on closed-form graphs, BFS horizon
  * semantics, the anomaly window's reachability guard, and cluster-
  * atomicity of the leakage-free split. */
class Round11Spec extends SparkSuite {
  import spark.implicits._

  // ---- BM25 ---------------------------------------------------------

  test("bm25: hand-computed contribution on a 3-doc corpus (floored " +
      "rational, k1=6/5 b=3/4) matches BigInt arithmetic exactly") {
    val docs = Seq(
      (1L, "a a b"), // tf(a)=2, dl=3
      (2L, "a c c"), // tf(a)=1
      (3L, "c c c")  // no a
    ).toDF("doc_id", "text")
    val q = Seq((1L, "a")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 10)
      .orderBy("rnk")
      .select("doc_id", "score").as[(Long, Long)].collect().toSeq
    // N=3, S=9, df(a)=2; contrib = floor(1e6*(2N-2df+1)*22*tf*S /
    //   ((2df+1)*(10*S*tf + 3*S + 9*dl*N)))
    def contrib(tf: Long, dl: Long): Long = {
      val num = BigInt(1000000) * (2 * 3 - 2 * 2 + 1) * 22 * tf * 9
      val den = BigInt(2 * 2 + 1) * (10 * 9 * tf + 3 * 9 + 9 * dl * 3)
      (num / den).toLong
    }
    assert(got === Seq((1L, contrib(2, 3)), (2L, contrib(1, 3))),
      s"expected exact floored contributions, got $got")
    // doc 3 (no query term) must be absent, not scored 0
    assert(!got.exists(_._1 == 3L))
  }

  test("bm25: higher tf of the same term ranks first; ties break by " +
      "doc id ascending") {
    val docs = Seq(
      (10L, "x x x y"), (11L, "x y y y"), (12L, "x y y y"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "x")).toDF("query_id", "term")
    val got = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 10)
      .orderBy("rnk").select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(10L, 11L, 12L),
      s"tf monotonicity / id tie-break violated: $got")
  }

  // ---- funnel -------------------------------------------------------

  test("funnel: steps bind to the FIRST qualifying event after the " +
      "previous step; pre-step-1 events never count") {
    val ev = Seq(
      // u1 completes all three; click at t=5 is BEFORE signup → the
      // binding click is t=20, not t=5
      (1L, 5L, "click"), (1L, 10L, "signup"), (1L, 20L, "click"),
      (1L, 30L, "purchase"),
      // u2 signs up and clicks only
      (2L, 10L, "signup"), (2L, 40L, "click"),
      // u3 purchases without ever clicking after signup
      (3L, 10L, "signup"), (3L, 15L, "purchase"),
      // u4 never signs up
      (4L, 1L, "click"), (4L, 2L, "purchase")
    ).toDF("user_id", "ts_ms", "event_type")
    val got = Funnel.funnelSteps(ev, "user_id", "ts_ms", "event_type",
        Seq("signup", "click", "purchase"))
      .orderBy("step")
      .select("step", "n_users", "sum_lag_ms")
      .as[(Long, Long, Long)].collect().toSeq
    // step1: u1,u2,u3; step2: u1 (lag 20-10), u2 (lag 30); step3: u1
    // (lag 30-20)
    assert(got === Seq((1L, 3L, 0L), (2L, 2L, 40L), (3L, 1L, 10L)),
      s"funnel semantics: $got")
  }

  // ---- count-min ----------------------------------------------------

  test("cms: estimates never undercount, and are exact for a key set " +
      "far smaller than the sketch width") {
    val keys = Seq.tabulate(300)(i => i.toLong % 7).toDF("k")
    val sk = Freq.countMinSketch(keys, "k", depth = 4, width = 64,
      salt = "t")
    val probes = (0L until 7L).toDF("k")
    val est = Freq.cmsEstimate(sk, probes, 4, 64, "t")
      .orderBy("k").as[(Long, Long)].collect().toMap
    val truth = keys.groupBy("k").count()
      .as[(Long, Long)].collect().toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"undercount at $k: ${est(k)} < $n")
    }
    // 7 keys in a 4x64 sketch: overwhelmingly collision-free → exact
    assert(est === truth, s"unexpected collision inflation: $est")
  }

  test("cms: sketches over disjoint slices merge by cell-wise " +
      "addition into the whole-data sketch") {
    val a = Seq(1L, 1L, 2L, 3L).toDF("k")
    val b = Seq(2L, 3L, 3L, 4L).toDF("k")
    val whole = Freq.countMinSketch(a.unionAll(b), "k", 4, 64, "m")
      .orderBy("rw", "bucket").collect().toSeq
    val merged = Freq.countMinSketch(a, "k", 4, 64, "m")
      .unionByName(Freq.countMinSketch(b, "k", 4, 64, "m"))
      .groupBy("rw", "bucket").agg(sum("cnt").as("cnt"))
      .orderBy("rw", "bucket").collect().toSeq
    assert(whole === merged, "cell-wise merge != whole-data sketch")
  }

  // ---- neighbor Jaccard --------------------------------------------

  test("jaccard: K4 minus one edge predicts exactly that edge " +
      "(2 common neighbors, jaccard 1/2); paths predict nothing") {
    // K4 on {1,2,3,4} without (3,4)
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("lo", "hi")
    val got = Graph.neighborJaccard(e, "lo", "hi", minCommon = 2)
      .select("a", "b", "n_common", "n_union")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // N(3)={1,2}, N(4)={1,2}: common 2, union 2+2-2=2
    assert(got === Seq((3L, 4L, 2L, 2L)), s"K4-minus-edge: $got")
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("lo", "hi")
    assert(Graph.neighborJaccard(path, "lo", "hi").count() === 0L,
      "a path has no pair with 2 common neighbors")
  }

  test("jaccard: existing edges are excluded even when they share " +
      "many neighbors") {
    // K4 complete: every pair IS an edge → no predictions at all
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("lo", "hi")
    assert(Graph.neighborJaccard(e, "lo", "hi").count() === 0L)
  }

  // ---- BFS ----------------------------------------------------------

  test("bfs: hop distances on a directed path respect the round " +
      "horizon; multi-seed takes the minimum") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val d3 = Graph.bfsDistances(e, "src", "dst", seeds, "node", 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(d3 === Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)),
      s"horizon-3 distances: $d3")
    val multi = Graph.bfsDistances(e, "src", "dst",
        Seq(1L, 4L).toDF("node"), "node", 3)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(multi(5L) === 1L && multi(6L) === 2L && multi(4L) === 0L &&
      multi(3L) === 2L, s"multi-seed min: $multi")
  }

  // ---- anomaly ------------------------------------------------------

  test("anomalyZ: a planted spike against a flat history flags; the " +
      "flat rows never do; an unreachable window fails loudly") {
    val base = (1L to 20L).map(i => (1L, i, 100L))
    val rows = (base :+ ((1L, 21L, 100000L))).toDF("u", "t", "v")
    val out = TimeSeries.anomalyZ(rows, Seq("u"), Seq(col("t")), "v",
        window = 16, sigmas = 3)
      .where(col("is_anomaly")).select("t").as[Long].collect().toSeq
    assert(out === Seq(21L), s"only the spike should flag: $out")
    val err = intercept[IllegalArgumentException] {
      TimeSeries.anomalyZ(rows, Seq("u"), Seq(col("t")), "v",
        window = 8, sigmas = 3)
    }
    assert(err.getMessage.contains("can never flag"),
      s"wrong guard message: ${err.getMessage}")
  }

  // ---- vocab growth -------------------------------------------------

  test("vocabGrowth: checkpoints count first-occurrence vocabulary " +
      "and cumulative tokens exactly") {
    val docs = Seq(
      (1L, "a b"), (2L, "b c"), (3L, "d d d"), (10L, "e"))
      .toDF("doc_id", "text")
    val got = Retrieval.vocabGrowth(docs, "doc_id", "text",
        Seq(1L, 2L, 5L, 100L))
      .orderBy("c").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 2L), (2L, 3L, 4L), (5L, 4L, 7L),
      (100L, 5L, 8L)), s"heaps curve: $got")
  }

  // ---- group split --------------------------------------------------

  test("group split: every near-dup cluster lands in exactly one " +
      "split (leakage-free), and the composed query is total") {
    val split = graft.queries.Pipeline11Queries
      .queries("samp_group_split")(spark, sfDir)
    val rows = split.select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect().toSeq
    assert(rows.nonEmpty)
    val perCluster = rows.groupBy(_._2).view.mapValues(
      _.map(_._3).distinct).toMap
    assert(perCluster.values.forall(_.size == 1),
      s"a cluster straddles splits: ${perCluster.filter(_._2.size > 1)}")
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // doc ids are unique (the split is a labeling, not a sample)
    assert(rows.map(_._1).distinct.size === rows.size)
  }
}
