package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Blocking, Graph, Multimodal, TextOps, TimeSeries}

/** Round-12 batch 3: classical seasonal decomposition, Theil–Sen robust
  * slope, link-prediction scores, RAKE keywords, aspect-ratio batch
  * bucketing, and ER blocking — the closed forms the parquet oracle
  * can't state (exact seasonal recovery, robustness, tie rules, the
  * quadratic fence). */
class Round24Spec extends SparkSuite {
  import spark.implicits._

  // ---- classicalDecompose ------------------------------------------

  private def series(xs: Seq[Long]): DataFrame =
    xs.zipWithIndex.map { case (x, i) =>
      ("k", i.toLong, (i % 3).toLong, x) }
      .toDF("g", "t", "season", "x")

  test("classicalDecompose: a pure linear series has zero seasonal and " +
      "zero residual everywhere (trend absorbs it all)") {
    val out = TimeSeries.classicalDecompose(
      series((1L to 9L).map(_ * 4)), Seq("g"), col("t"), col("season"),
      "x", period = 3, scale = 1000L)
    val rows = out.select("seas_s", "resid_s")
      .as[(Long, Long)].collect()
    assert(rows.length === 7) // 9 minus one trimmed edge each side
    assert(rows.forall(_ == ((0L, 0L))))
  }

  test("classicalDecompose: an exact additive season is recovered " +
      "exactly and residuals vanish") {
    // x = 10·t + s(t), s cycling (0, 3, -3) — mean-zero by design, so
    // the centered window sees the pure trend and seas_s == s·scale
    val bump = Seq(0L, 3L, -3L)
    val xs = (0 until 9).map(i => 10L * i + bump(i % 3))
    val out = TimeSeries.classicalDecompose(
      series(xs), Seq("g"), col("t"), col("season"), "x",
      period = 3, scale = 1000L)
    val bySeason = out.select("season", "seas_s", "resid_s")
      .as[(Long, Long, Long)].collect()
    assert(bySeason.forall { case (s, ss, r) =>
      ss == bump(s.toInt) * 1000L && r == 0L })
  }

  test("classicalDecompose rejects even or degenerate periods loudly") {
    intercept[IllegalArgumentException] {
      TimeSeries.classicalDecompose(series(Seq(1L, 2L, 3L)), Seq("g"),
        col("t"), col("season"), "x", period = 4, scale = 1000L)
    }
  }

  // ---- theilSenSlopes ----------------------------------------------

  test("theilSenSlopes: a perfect line yields slope2 = 2·m·scale and " +
      "n(n-1)/2 pairs") {
    val df = (0L to 4L).map(t => ("k", t, 7L * t + 2L))
      .toDF("g", "t", "x")
    val out = TimeSeries.theilSenSlopes(df, Seq("g"), col("t"), "x",
        scale = 100L)
      .select("n_days", "n_pairs", "slope2_s")
      .as[(Long, Long, Long)].head()
    assert(out === ((5L, 10L, 1400L)))
  }

  test("theilSenSlopes: one wild outlier leaves the median slope " +
      "untouched (the robustness contract a mean-based fit breaks)") {
    // line slope 10, then poison the last point by +1000
    val clean = (0L to 6L).map(t => ("k", t, 10L * t))
    val dirty = clean.init :+ ("k", 6L, 10L * 6 + 1000L)
    def slope2(rows: Seq[(String, Long, Long)]): Long =
      TimeSeries.theilSenSlopes(rows.toDF("g", "t", "x"), Seq("g"),
        col("t"), "x", scale = 1L)
        .select("slope2_s").as[Long].head()
    assert(slope2(clean) === 20L)
    assert(slope2(dirty) === 20L) // median unchanged; a mean moves
  }

  test("theilSenSlopes fences series past maxSeries loudly") {
    val df = (0L to 50L).map(t => ("k", t, t)).toDF("g", "t", "x")
    val e = intercept[Exception] {
      TimeSeries.theilSenSlopes(df, Seq("g"), col("t"), "x",
        scale = 1L, maxSeries = 10).collect()
    }
    assert(e.getMessage.contains("maxSeries"))
  }

  // ---- linkPredScores ----------------------------------------------

  test("linkPredScores on the 4-cycle: both diagonals score cn=2, " +
      "ra = 2·(scale div 2), pa = 4; existing edges never appear") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("s", "d")
    val out = Graph.linkPredScores(edges, "s", "d", minCommon = 2,
        scale = 1000L)
      .select("a", "b", "cn", "ra_s", "pa")
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    assert(out.toSeq === Seq((1L, 3L, 2L, 1000L, 4L),
      (2L, 4L, 2L, 1000L, 4L)))
  }

  test("linkPredScores: resource allocation down-weights high-degree " +
      "shared neighbors (hub penalty — the point of RA over CN)") {
    // a-h, b-h with hub h also tied to 4 others → deg(h)=6;
    // a-z, b-z with private z → deg(z)=2. Pair (a,b): cn=2 but the
    // hub contributes scale/6, the private neighbor scale/2.
    val edges = (Seq((1L, 100L), (2L, 100L), (1L, 200L), (2L, 200L)) ++
      (1L to 4L).map(i => (100L, 300L + i))).toDF("s", "d")
    val row = Graph.linkPredScores(edges, "s", "d", minCommon = 2,
        scale = 600L)
      .where(col("a") === 1L && col("b") === 2L)
      .select("cn", "ra_s").as[(Long, Long)].head()
    assert(row === ((2L, 600L / 6 + 600L / 2)))
  }

  // ---- RAKE ---------------------------------------------------------

  test("rakePhrases: degree/frequency scoring on a hand corpus") {
    val docs = Seq(
      (1L, "red apple the blue sky the red apple"),
      (2L, "the red apple")).toDF("id", "text")
    val stop = Seq("the").toDF("w")
    val out = TextOps.rakePhrases(docs, "id", "text", stop, 1000L)
      .select("phrase", "n_words", "n_occur", "score_s")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // freq: red 3, apple 3, blue 1, sky 1; deg: red 6, apple 6,
    // blue 2, sky 2 → every word scores 2000; phrases score 4000.
    assert(out("red apple") === (("red apple", 2L, 3L, 4000L)))
    assert(out("blue sky") === (("blue sky", 2L, 1L, 4000L)))
    assert(out.size === 2)
  }

  test("topTokenStoplist picks by frequency with token-ascending ties") {
    val docs = Seq((1L, "b b a a c")).toDF("id", "text")
    val got = TextOps.topTokenStoplist(docs, "text", 2)
      .as[String].collect().toSet
    assert(got === Set("a", "b")) // tie a/b broken ascending; c out
  }

  // ---- aspectBuckets -------------------------------------------------

  test("aspectBuckets: exact ratios cost 0, ties go to the earlier " +
      "bucket, batches pack in id order") {
    val buckets = Seq((1, 1), (4, 3), (3, 4), (16, 9), (9, 16))
    val df = Seq(
      (1L, 1920L, 1080L), (2L, 100L, 100L), (3L, 400L, 300L),
      (4L, 299L, 300L), (5L, 301L, 300L), (6L, 50L, 50L))
      .toDF("id", "w", "h")
    val out = Multimodal.aspectBuckets(df, "id", "w", "h", buckets,
        batchSize = 2, scale = 1000000L)
      .select("id", "bucket", "cost_s", "batch_id")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 4L && out(1L)._3 === 0L) // exact 16:9
    assert(out(2L)._2 === 1L && out(2L)._3 === 0L) // exact square
    assert(out(3L)._2 === 2L && out(3L)._3 === 0L) // exact 4:3
    assert(out(4L)._2 === 1L) // 299/300 nearest square
    assert(out(5L)._2 === 1L) // 301/300 nearest square
    // square bucket members in id order: 2, 4, 5, 6 → batches 0,0,1,1
    assert(Seq(out(2L)._4, out(4L)._4, out(5L)._4, out(6L)._4)
      === Seq(0L, 0L, 1L, 1L))
  }

  test("aspectBuckets: a single bucket is the trivial argmin (least() " +
      "needs two args — the size-1 path is special-cased)") {
    val df = Seq((1L, 1920L, 1080L), (2L, 100L, 100L)).toDF("id", "w", "h")
    val out = Multimodal.aspectBuckets(df, "id", "w", "h",
        Seq((1, 1)), batchSize = 2, scale = 1000000L)
      .select("id", "bucket", "cost_s").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === 1L && out(1L)._3 > 0L)
    assert(out(2L)._2 === 1L && out(2L)._3 === 0L)
  }

  // ---- Blocking -------------------------------------------------------

  test("blockedPairs: key expressions pool into one relation (cross-" +
      "expression value matches block too); NULL keys never block") {
    val df = Seq(
      (1L, "x", "p"), (2L, "x", "q"), (3L, "y", "p"), (5L, "q", "z"),
      (4L, null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("id", "k1", "k2")
    val got = Blocking.blockedPairs(df, "id",
        Seq(col("k1"), col("k2")), maxBlock = None)
      .as[(Long, Long)].collect().toSet
    // (1,2) via k1=x, (1,3) via k2=p, (2,5) via 2.k2 = 5.k1 = q —
    // the unioned-value contract the er_* oracles grade
    assert(got === Set((1L, 2L), (1L, 3L), (2L, 5L)))
  }

  test("blockedPairs fences an over-cap block loudly instead of " +
      "detonating quadratically") {
    val df = (1L to 20L).map(i => (i, "same")).toDF("id", "k")
    val e = intercept[Exception] {
      Blocking.blockedPairs(df, "id", Seq(col("k")),
        maxBlock = Some(5)).collect()
    }
    assert(e.getMessage.contains("maxBlock"))
  }

  test("blockedPairsDelta: merge equals the rebuild (the blocking " +
      "monotonicity identity), and the delta pass alone never " +
      "re-derives a base×base pair") {
    // base 1,2,3 in block x and 5 in y; arrivals 4 (x) and 6 (y)
    val all = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x"),
      (5L, "y"), (6L, "y")).toDF("id", "k")
    val isNew = col("id") === 4L || col("id") === 6L
    val base = all.where(!(col("id") === 4L || col("id") === 6L))
    val stored = Blocking.blockedPairs(base, "id", Seq(col("k")),
      maxBlock = None)
    val merged = Blocking.blockedPairsDelta(all, isNew, "id",
        Seq(col("k")), stored, maxBlock = None)
      .as[(Long, Long)].collect().toSet
    val rebuild = Blocking.blockedPairs(all, "id", Seq(col("k")),
        maxBlock = None)
      .as[(Long, Long)].collect().toSet
    assert(merged === rebuild)
    val deltaOnly = Blocking.blockedPairsDelta(all, isNew, "id",
        Seq(col("k")),
        Seq.empty[(Long, Long)].toDF("a", "b"), maxBlock = None)
      .as[(Long, Long)].collect().toSet
    assert(deltaOnly === Set((1L, 4L), (2L, 4L), (3L, 4L), (5L, 6L)))
  }

  test("verifyPairs: lev and distinct-token overlap on a known pair") {
    val df = Seq((1L, "cold bolt"), (2L, "old bolt")).toDF("id", "nm")
    val pairs = Seq((1L, 2L)).toDF("a", "b")
    val row = Blocking.verifyPairs(pairs, df, "id", "nm")
      .select("lev", "n_inter", "n_union")
      .as[(Long, Long, Long)].head()
    assert(row === ((1L, 1L, 3L)))
  }

  // ---- betweennessFixed ----------------------------------------------

  private def bcMap(edges: DataFrame, seeds: Seq[Long],
                    horizon: Int): Map[Long, Long] =
    Graph.betweennessFixed(edges, "s", "d", seeds.toDF("node"), "node",
        horizon, scale = 1000L)
      .as[(Long, Long)].collect().toMap

  test("betweennessFixed on the 5-path from both ends: interior " +
      "vertices carry 4·scale, endpoints 0 (the hand-derivable case)") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    assert(bcMap(path, Seq(1L, 5L), horizon = 4) ===
      Map(1L -> 0L, 2L -> 4000L, 3L -> 4000L, 4L -> 4000L, 5L -> 0L))
  }

  test("betweennessFixed splits dependency across equal-length paths " +
      "(σ = 2 through the diamond → each branch gets scale div 2)") {
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("s", "d")
    assert(bcMap(diamond, Seq(1L), horizon = 2) ===
      Map(1L -> 0L, 2L -> 500L, 3L -> 500L, 4L -> 0L))
  }

  // ---- binarySegment ---------------------------------------------------

  test("binarySegment finds the step change at the root and ties " +
      "position-ascending inside flat halves") {
    val xs = Seq(0L, 0L, 0L, 10L, 10L, 10L)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("grp", "t", "x")
    val out = TimeSeries.binarySegment(df, Seq("grp"), col("t"), "x")
      .select("seg", "cp_rn", "cp_o", "g")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("root") === (("root", 3L, 2L, 90L)))
    assert(out("left") === (("left", 1L, 0L, 0L)))   // all-zero → tie → 1
    assert(out("right") === (("right", 4L, 3L, 0L))) // flat → tie → 4
  }

  // ---- Poisson bootstrap weights ----------------------------------------

  test("bootstrap weights: hash-derived Poisson(1) weights have mean " +
      "≈ 1 and every replicate touches every row (the online-bootstrap " +
      "contract)") {
    val out = SparkEntry.queries("samp_bootstrap")(spark, sfDir)
      .select("r", "n_rows", "w_sum")
      .as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    val n = out.map(_._2).sum.toDouble
    val w = out.map(_._3).sum.toDouble
    assert(w / n > 0.9 && w / n < 1.1, s"mean weight ${w / n} off 1")
    // every (pri, replicate) cell counts ALL its rows — weights of 0
    // drop a row from the resample, never from the accounting
    val byR = out.groupBy(_._1).values.map(_.map(_._2).sum).toSet
    assert(byR.size === 1, "replicates saw different row counts")
  }

  // ---- matrixProfile ---------------------------------------------------

  test("matrixProfile: an implanted motif pair has mp_d2 = 0 pointing " +
      "at its twin; the discord window carries the max distance") {
    // 0×8, 5×8, 0×8 — windows 1 and 17 are identical (the motif),
    // window 9 is the all-fives discord
    val xs = Seq.fill(8)(0L) ++ Seq.fill(8)(5L) ++ Seq.fill(8)(0L)
    val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
      .toDF("grp", "t", "x")
    val out = TimeSeries.matrixProfile(df, Seq("grp"), col("t"), "x",
        w = 8)
      .select("i", "mp_d2", "mp_j")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((0L, 17L)))
    assert(out(17L) === ((0L, 1L)))
    assert(out(9L) === ((200L, 1L))) // 8·25 to either flat window
    assert(out.size === 17) // positions 1..17 all emitted
  }

  test("matrixProfile: series shorter than 2w emit nothing (no " +
      "non-overlapping partner exists)") {
    val df = (0L until 12L).map(t => ("k", t, t))
      .toDF("grp", "t", "x")
    assert(TimeSeries.matrixProfile(df, Seq("grp"), col("t"), "x",
      w = 8).count() === 0L)
  }

  // ---- graphletCounts --------------------------------------------------

  private def glet(edges: Seq[(Long, Long)]): (Long, Long) =
    Graph.graphletCounts(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].head()

  test("graphletCounts closed forms: the square has 4 wedges and 1 " +
      "four-cycle, the triangle has 3 and 0, K4 has 12 and 3") {
    assert(glet(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
      === ((4L, 1L)))
    assert(glet(Seq((1L, 2L), (2L, 3L), (1L, 3L))) === ((3L, 0L)))
    assert(glet(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))) === ((12L, 3L)))
  }

  // ---- temporalReach ---------------------------------------------------

  private def reach(edges: Seq[(Long, Long, Long)],
                    rounds: Int): Map[Long, Long] =
    Graph.temporalReach(edges.toDF("u", "v", "t"), "u", "v", "t",
        Seq(1L).toDF("node"), "node", rounds)
      .as[(Long, Long)].collect().toMap

  test("temporalReach: time must not decrease along the walk, and a " +
      "LATER parallel copy of an edge carries it where the earlier " +
      "copy cannot (min-folding parallel edges would be wrong)") {
    // 1→2 at t=5; 2→3 exists at t=3 (unusable: 3 < 5) and t=9 (usable)
    assert(reach(Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 3L, 9L)),
      rounds = 2) === Map(1L -> 0L, 2L -> 5L, 3L -> 9L))
  }

  test("temporalReach: arrival is the MIN over time-respecting walks " +
      "within the horizon") {
    // direct 1→3 at t=7 beats the two-hop arrival at t=9
    assert(reach(Seq((1L, 2L, 5L), (2L, 3L, 9L), (1L, 3L, 7L)),
      rounds = 2) === Map(1L -> 0L, 2L -> 5L, 3L -> 7L))
  }

  test("binarySegment: a 1-point series emits nothing; a 2-point " +
      "series emits only the root") {
    def segs(xs: Seq[Long]): Set[String] = {
      val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
        .toDF("grp", "t", "x")
      TimeSeries.binarySegment(df, Seq("grp"), col("t"), "x")
        .select("seg").as[String].collect().toSet
    }
    assert(segs(Seq(5L)) === Set.empty)
    assert(segs(Seq(5L, 9L)) === Set("root"))
  }
}
