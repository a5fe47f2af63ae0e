package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupText, Graph, Retrieval, Skyline, TimeSeries}

/** Round-8 batch-7 operators — the invariants the parquet oracle can't
  * state: CUSUM's window-closed form equals the sequential recursion
  * and fires exactly after a planted level shift; the prefix-filtered
  * Jaccard join equals the brute-force all-pairs scan (the
  * no-false-negative lemma, exercised, not cited); RRF's fused order
  * on hand lists; regularity flags firing on scheduler timing and not
  * on spread timing; skyline correctness independent of the grid-prune
  * bucket count; and weighted SSSP preferring a light 2-hop path over
  * a heavy direct edge (where BFS by hops cannot).
  */
class Round13Spec extends SparkSuite {
  import spark.implicits._

  // ---- cusumFlags ---------------------------------------------------

  test("cusum: window-closed form equals the sequential max(0, s+e) " +
      "recursion on a hand series, both directions") {
    // series 4,4,4,10,10 -> S=32 n=5 k=ceil(32/5)=7
    // e = -3,-3,-3,3,3
    // s_hi: max(0,0-3)=0, 0, 0, 3, 6
    // s_lo (on k-x = 3,3,3,-3,-3): 3, 6, 9, 6, 3
    val df = Seq((1L, 4L), (2L, 4L), (3L, 4L), (4L, 10L), (5L, 10L))
      .toDF("t", "x")
    val got = TimeSeries.cusumFlags(df, Nil, Seq(col("t")), "x", 1)
      .orderBy("t").select("cusum_hi", "cusum_lo")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((0L, 3L), (0L, 6L), (0L, 9L), (3L, 6L), (6L, 3L)),
      s"closed-form CUSUM mismatch: $got")
  }

  test("cusum: a planted level shift flags after the change point and " +
      "never before it") {
    // 20 days at 10, then 10 days at 25: k = ceil(450/30) = 15
    // pre-shift e = -5: s_hi stays 0. post-shift e = +10: s_hi climbs
    // 10,20,... crossing h = 3*15 = 45 on day 25.
    val df = ((1 to 20).map(d => (d.toLong, 10L)) ++
      (21 to 30).map(d => (d.toLong, 25L))).toDF("t", "x")
    val flags = TimeSeries.cusumFlags(df, Nil, Seq(col("t")), "x", 3)
      .orderBy("t").select("t", "flag_hi").as[(Long, Boolean)]
      .collect().toSeq
    val firing = flags.filter(_._2).map(_._1)
    assert(firing.nonEmpty && firing.min == 25L &&
      firing == (25L to 30L).toSeq,
      s"expected flags exactly on days 25..30, got $firing")
  }

  test("cusum: keys are independent — a shifted key flags, a flat key " +
      "never does") {
    val df = ((1 to 10).map(d => ("flat", d.toLong, 8L)) ++
      (1 to 5).map(d => ("shift", d.toLong, 2L)) ++
      (6 to 10).map(d => ("shift", d.toLong, 40L)))
      .toDF("k", "t", "x")
    val got = TimeSeries.cusumFlags(df, Seq("k"), Seq(col("t")), "x", 1)
      .groupBy("k").agg(sum(when(col("flag_hi"), 1L).otherwise(0L))
        .as("n"))
      .as[(String, Long)].collect().toMap
    assert(got("flat") == 0L, s"flat key flagged: $got")
    assert(got("shift") > 0L, s"shifted key never flagged: $got")
  }

  test("cusum: a NULL observation raises loudly instead of silently " +
      "dropping out of the cumulative sum") {
    val df = Seq((1L, Some(4L)), (2L, None), (3L, Some(4L)))
      .toDF("t", "x")
    val e = intercept[Exception] {
      TimeSeries.cusumFlags(df, Nil, Seq(col("t")), "x", 1).collect()
    }
    assert(e.getMessage.contains("NULL observation") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL observation")),
      s"wrong failure: ${e.getMessage}")
  }

  // ---- prefixJaccardJoin --------------------------------------------

  test("ppjoin: equals the brute-force all-pairs scan on a mixed " +
      "corpus (the prefix lemma exercised: zero false negatives)") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"),          // exact dup of 1
      (3L, "a b c d e f g x"),          // 7/9 of 1
      (4L, "q w r t y u i o p"),
      (5L, "q w r t y u i o z"),        // 8/10 of 4
      (6L, "m n"),
      (7L, "zz yy xx")).toDF("doc_id", "text")
    def key(r: (Long, Long, Long, Long)) = (r._1, r._2)
    // brute force at tau = 3/4: J >= 3/4 <=> 7*i >= 3*(ma+mb)
    val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok")).distinct()
    val m = tok.groupBy("doc_id").agg(count(lit(1)).as("m"))
    val brute = tok.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("i"))
      .join(m.select(col("doc_id").as("a_id"), col("m").as("ma")), "a_id")
      .join(m.select(col("doc_id").as("b_id"), col("m").as("mb")), "b_id")
      .where(lit(7L) * col("i") >= lit(3L) * (col("ma") + col("mb")))
      .select(col("a_id"), col("b_id"), col("i"),
        (col("ma") + col("mb") - col("i")).as("u"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = DedupText.prefixJaccardJoin(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === brute,
      s"prefix join != brute force: extra=${got -- brute} " +
        s"missing=${brute -- got}")
    assert(got.map(key).contains((1L, 2L)), "exact dup pair missing")
    assert(got.map(key).contains((4L, 5L)), "near dup pair missing")
  }

  test("ppjoin: shingle mode (n=3) equals brute force over shingle " +
      "sets and finds the shifted near-dup a word-set join would " +
      "over-match") {
    val docs = Seq(
      (1L, "the cat sat on the mat today"),
      (2L, "the cat sat on the mat tonight"),  // 4/7 shingles shared
      (3L, "mat the on sat cat the today"),    // same WORDS, new order
      (4L, "completely different text here now")).toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"),
      explode(graft.ops.TextOps.shingles(col("text"), 3)).as("tok"))
    val m = tok.groupBy("doc_id").agg(count(lit(1)).as("m"))
    val brute = tok.as("a").join(tok.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .agg(count(lit(1)).as("i"))
      .join(m.select(col("doc_id").as("a_id"), col("m").as("ma")), "a_id")
      .join(m.select(col("doc_id").as("b_id"), col("m").as("mb")), "b_id")
      .where(lit(3L) * col("i") >= lit(1L) * (col("ma") + col("mb")))
      .select(col("a_id"), col("b_id"), col("i"),
        (col("ma") + col("mb") - col("i")).as("u"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val got = DedupText.prefixJaccardJoin(docs, "doc_id", "text",
        1, 2, n = 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === brute, s"shingle prefix join != brute force: " +
      s"extra=${got -- brute} missing=${brute -- got}")
    assert(got.map(r => (r._1, r._2)).contains((1L, 2L)),
      "shifted near-dup pair missing")
    assert(!got.map(r => (r._1, r._2)).contains((1L, 3L)),
      "word-scramble must NOT match on shingles")
  }

  test("ppjoin: tau = 1 degenerates to exact set equality") {
    val docs = Seq(
      (1L, "a b c"), (2L, "c b a a"),   // same SET {a,b,c}
      (3L, "a b d")).toDF("doc_id", "text")
    val got = DedupText.prefixJaccardJoin(docs, "doc_id", "text", 1, 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L)), s"tau=1 should find only 1-2: $got")
  }

  // ---- rrfFuse ------------------------------------------------------

  test("rrf: hand-computed fusion — a doc in both lists outranks a " +
      "higher-ranked single-list doc") {
    // list1: docs 10,11,12 at ranks 1,2,3; list2: docs 11,13 at 1,2
    // with kRrf=60, scale=1e6:
    //   doc 11: 1e6/62 + 1e6/61 = 16129 + 16393 = 32522
    //   doc 10: 1e6/61 = 16393 ; doc 13: 1e6/62 = 16129
    //   doc 12: 1e6/63 = 15873
    val l1 = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rnk")
    val l2 = Seq((1L, 11L, 1L), (1L, 13L, 2L))
      .toDF("query_id", "doc_id", "rnk")
    val got = Retrieval.rrfFuse(Seq(l1, l2), k = 4)
      .orderBy("rnk").select("doc_id", "score", "n_lists")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((11L, 32522L, 2L), (10L, 16393L, 1L),
      (13L, 16129L, 1L), (12L, 15873L, 1L)),
      s"fused order mismatch: $got")
  }

  test("rrf: queries fuse independently and k truncates per query") {
    val l1 = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L))
      .toDF("query_id", "doc_id", "rnk")
    val got = Retrieval.rrfFuse(Seq(l1), k = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 10L), (2L, 20L)), s"per-query top-1: $got")
  }

  // ---- regularityFlags ----------------------------------------------

  test("regularity: scheduler timing flags, spread timing does not, " +
      "and too few gaps never flag") {
    // bot: 12 events exactly 60s apart -> 11 gaps all in bucket 60
    //      sum_sq = 121 > 11^2/2 -> flag
    // human: 9 gaps in 9 distinct buckets -> sum_sq 9, 18 > 81 false
    // sparse: 3 gaps, identical -> below minGaps, no flag
    val bot = (0 until 12).map(i => ("bot", i * 60000L))
    val human = Seq(0L, 65000L, 190000L, 380000L, 640000L, 955000L,
      1330000L, 1765000L, 2260000L, 2815000L).map(("human", _))
    val sparse = (0 until 4).map(i => ("sparse", i * 60000L))
    val df = (bot ++ human ++ sparse).toDF("user_id", "ts_ms")
    val got = TimeSeries.regularityFlags(df, Seq("user_id"),
        col("ts_ms"), bucketDiv = 60000L, minGaps = 8)
      .select("user_id", "n_gaps", "sum_sq", "flag")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("bot") === ("bot", 11L, 121L, true), s"bot: $got")
    assert(got("human")._4 === false, s"human flagged: $got")
    assert(got("sparse") === ("sparse", 3L, 9L, false),
      s"sparse must report but not flag: $got")
  }

  // ---- skyline2d ----------------------------------------------------

  test("skyline: hand-computed frontier, interior points die, ties " +
      "collapse with counts") {
    // points (x min, y max): frontier is (1,5), (3,8), (7,9)
    // (2,4) dominated by (1,5); (3,8) appears twice -> n_rows 2
    // (5,8) dominated by (3,8); (7,9) survives
    val df = Seq((1L, 5L), (2L, 4L), (3L, 8L), (3L, 8L), (5L, 8L),
      (7L, 9L)).toDF("x0", "y0")
    val got = Skyline.skyline2d(df, col("x0"), col("y0"))
      .orderBy("x").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 5L, 1L), (3L, 8L, 2L), (7L, 9L, 1L)),
      s"frontier mismatch: $got")
  }

  test("skyline: result is independent of the grid-prune bucket count " +
      "(1 bucket = no pruning, 1024 = heavy pruning)") {
    val df = (1L to 400L).map(i =>
      ((i * 37) % 401, (i * 59) % 397)).toDF("x0", "y0")
    def run(b: Int) = Skyline.skyline2d(df, col("x0"), col("y0"), b)
      .orderBy("x").as[(Long, Long, Long)].collect().toSeq
    val base = run(1)
    assert(base.nonEmpty)
    assert(run(1024) === base, "bucket count changed the skyline")
    assert(run(7) === base, "bucket count changed the skyline")
  }

  // ---- ssspDistances ------------------------------------------------

  test("sssp: a light 2-hop path beats a heavy direct edge — hop-BFS " +
      "would answer differently") {
    // 1 -> 3 direct weight 10; 1 -> 2 -> 3 weights 2+3 = 5
    val e = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.ssspDistances(e, "src", "dst", "w", seeds, "node", 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 0L), (2L, 2L), (3L, 5L)),
      s"sssp distances mismatch: $got")
  }

  test("sssp: the round horizon bounds path length — a far vertex " +
      "appears only when rounds reach it, at the exact distance") {
    // chain 1 -(1)-> 2 -(1)-> 3 -(1)-> 4, plus shortcut 1 -(9)-> 4
    val e = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (1L, 4L, 9L))
      .toDF("src", "dst", "w")
    val seeds = Seq(1L).toDF("node")
    def at(r: Int) = Graph.ssspDistances(e, "src", "dst", "w",
        seeds, "node", r)
      .as[(Long, Long)].collect().toMap
    assert(at(1).get(4L) === Some(9L),
      "1 round: only the heavy direct edge is reachable")
    assert(at(3).get(4L) === Some(3L),
      "3 rounds: the light chain wins")
    assert(at(0) === Map(1L -> 0L), "0 rounds: seeds only")
  }

  test("sssp: parallel edges collapse to the min weight before any " +
      "round runs") {
    val e = Seq((1L, 2L, 7L), (1L, 2L, 4L)).toDF("src", "dst", "w")
    val got = Graph.ssspDistances(e, "src", "dst", "w",
        Seq(1L).toDF("node"), "node", 1)
      .as[(Long, Long)].collect().toMap
    assert(got(2L) === 4L, s"min-weight edge must win: $got")
  }
}
