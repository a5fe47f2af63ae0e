package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Pin, Skyline, TextOps}
import graft.ops.Pin.PinOps

/** Round-9 hardening: the three ADVICE r8 fences (wrap-safe skyline
  * range guard, bpeApplyMerges missing-rank fence, Borůvka parallel-edge
  * normalization) plus the Pin switch — the reliable-checkpoint
  * indirection that replaces bare localCheckpoint at every iterative
  * call site. */
class Round16Spec extends SparkSuite {
  import spark.implicits._

  // ---- boruvkaMaxForest: parallel edges -----------------------------

  test("boruvka: parallel (lo, hi) copies at different weights collapse " +
      "to the max copy — forest stays acyclic and spanning") {
    val e = Seq((1L, 2L, 5L), (1L, 2L, 9L), (2L, 3L, 4L), (2L, 3L, 4L))
      .toDF("lo", "hi", "w")
    val got = Graph.boruvkaMaxForest(e, "lo", "hi", "w", rounds = 3)
      .orderBy("lo", "hi").as[(Long, Long, Long)].collect().toSeq
    // 3 vertices, 1 component -> exactly 2 edges; (1,2) kept at w=9
    assert(got === Seq((1L, 2L, 9L), (2L, 3L, 4L)),
      s"forest wrong under parallel edges: $got")
  }

  // ---- bpeApplyMerges: missing-rank fence ---------------------------

  test("bpeApplyMerges: a merge table not covering ranks 1..rounds " +
      "fails loudly instead of emptying the segmentation") {
    val words = Seq("abc").toDF("word")
    val merges = Seq((1L, "a", "b")).toDF("rnk", "l", "r")
    val ex = intercept[IllegalStateException] {
      TextOps.bpeApplyMerges(words, merges, rounds = 2)
    }
    assert(ex.getMessage.contains("covers 1 of ranks 1..2"),
      s"wrong fence message: ${ex.getMessage}")
    // covered depth still applies cleanly
    val ok = TextOps.bpeApplyMerges(words, merges, rounds = 1)
      .as[(String, String)].collect().toMap
    assert(ok("abc") === " ab c ", s"merge application wrong: $ok")
  }

  // ---- skyline: wrap-safe range fence -------------------------------

  test("skyline2d: an x range wider than Long raises the range fence " +
      "instead of wrapping into silently wrong buckets") {
    val pts = Seq((Long.MinValue, 1L), (Long.MaxValue, 2L), (0L, 3L))
      .toDF("x", "y")
    val ex = intercept[Exception] {
      Skyline.skyline2d(pts, col("x"), col("y")).collect()
    }
    assert(ex.getMessage.contains("x range exceeds"),
      s"expected the loud range fence, got: ${ex.getMessage}")
  }

  test("skyline2d: negative x values inside the safe range still " +
      "compute the exact frontier") {
    val pts = Seq((-10L, 5L), (-5L, 3L), (0L, 7L), (3L, 6L), (4L, 1L))
      .toDF("x", "y")
    val got = Skyline.skyline2d(pts, col("x"), col("y"))
      .orderBy("x").select("x", "y").as[(Long, Long)].collect().toSeq
    // min-x/max-y frontier (dominator: smaller x AND >= y): (-5,3) falls
    // to (-10,5); (3,6) and (4,1) fall to (0,7); y strictly climbs
    assert(got === Seq((-10L, 5L), (0L, 7L)),
      s"frontier with negative x wrong: $got")
  }

  // ---- semDedup -----------------------------------------------------

  test("semDedup: every dropped vector has a lower-id same-cell witness " +
      "at or above tau; cell-minimum ids are always kept") {
    val sk = graft.ops.Similarity.quantizeInt8(
      Tables.embeddings(spark, sfDir))
    val out = graft.ops.Similarity.semDedup(sk, k = 8, iters = 3,
      tauNum = 2L, tauDen = 5L)
    val ll = graft.expr.GraftFunctions.dot_ll _
    val j = out.join(sk, "vec_id")
    val lo = j.select(col("cell"), col("vec_id").as("a_id"),
      col("q_emb").as("qa"), col("q_norm").as("na"))
    val dropped = out.where(!col("kept"))
    assert(dropped.count() > 0, "fixture must exercise the drop path")
    // witness check: each dropped b joins SOME lower-id a in its cell
    // passing the division-free threshold
    val witnessed = j.where(!col("kept"))
      .select(col("cell"), col("vec_id").as("b_id"),
        col("q_emb").as("qb"), col("q_norm").as("nb"))
      .join(lo, Seq("cell"))
      .where(col("a_id") < col("b_id"))
      .withColumn("qd", ll(col("qa"), col("qb")))
      .where(col("qd") > 0 &&
        col("qd") * col("qd") * lit(25L) >= lit(4L) * col("na") * col("nb"))
      .select("b_id").distinct()
    assert(witnessed.count() === dropped.count(),
      "a dropped vector lacks its lower-id near-dup witness")
    // the minimum id of every cell has no lower-id witness: always kept
    val mins = out.groupBy("cell").agg(min("vec_id").as("vec_id"))
    assert(out.join(mins, Seq("cell", "vec_id"))
      .where(!col("kept")).count() === 0,
      "cell-minimum ids can have no dominator and must be kept")
  }

  // ---- dsirScores ---------------------------------------------------

  test("dsir: target-language documents score above every other " +
      "language's mean (the importance-resampling ground truth)") {
    val docs = Tables.documents(spark, sfDir)
    val sc = graft.ops.Selection.dsirScores(docs, "doc_id", "text",
      isTarget = col("lang") === "en", buckets = 8192)
    val means = sc.join(docs.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(avg(col("score")).as("m"))
      .as[(String, Double)].collect().toMap
    val en = means("en")
    means.filterNot(_._1 == "en").foreach { case (l, m) =>
      assert(en > m, s"en mean $en must beat $l mean $m")
    }
  }

  test("dsir: the count-scale fence raises loudly instead of wrapping") {
    val docs = Seq((1L, "a b", true), (2L, "a b", false))
      .toDF("doc_id", "text", "tgt")
    val e = intercept[Exception] {
      // scalePow=1 makes T+buckets > 2^scalePow immediately
      graft.ops.Selection.dsirScores(docs, "doc_id", "text",
        isTarget = col("tgt"), buckets = 8192, scalePow = 1).collect()
    }
    assert(e.getMessage.contains("dsirScores"),
      s"expected the loud scale fence, got: ${e.getMessage}")
  }

  // ---- lmLogProbScore -----------------------------------------------

  test("lm log-prob: a document of corpus-frequent bigrams scores " +
      "closer to zero than one of rare bigrams (fluency ground truth)") {
    // 63x "a b" + 1x "a z": lw(ab) = ilog2(64·2^40/65)−40 = −1,
    // lw(az) = ilog2(2·2^40/65)−40 = −6 (closed-form, checked below)
    val docs = (1L to 63L).map(i => (i, "a b")) :+ (99L, "a z")
    val got = TextOps.lmLogProbScore(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) === -1L && got(99L) === -6L,
      s"closed-form lm scores wrong: ${got(1L)}, ${got(99L)}")
    assert(got(1L) > got(99L),
      "frequent-bigram doc must out-score the rare-bigram doc")
  }

  test("lm counts merge: scoring under merged slice counts equals the " +
      "one-shot retrain on any split (the sufficient-statistics claim)") {
    val docs = Tables.documents(spark, sfDir)
    val isNew = col("doc_id") % 3 === 0
    val all = TextOps.lmBigramPairs(docs, "doc_id", "text")
    val merged = TextOps.lmMergeCounts(
      TextOps.lmCounts(
        TextOps.lmBigramPairs(docs.where(!isNew), "doc_id", "text")),
      TextOps.lmCounts(
        TextOps.lmBigramPairs(docs.where(isNew), "doc_id", "text")))
    val inc = TextOps.lmScore(all, merged).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    val full = TextOps.lmLogProbScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(inc === full, "merged-counts scoring diverged from retrain")
  }

  test("lm scoring a NEW document: unseen bigrams get the add-1 " +
      "smoothed floor instead of a silent drop (the CCNet case)") {
    val train = ((1L to 63L).map(i => (i, "a b")) :+ (99L, "a z"))
      .toDF("doc_id", "text")
    val model = TextOps.lmCounts(
      TextOps.lmBigramPairs(train, "doc_id", "text"))
    val fresh = Seq((7L, "a q"), (8L, "x y"), (9L, "a b"))
      .toDF("doc_id", "text")
    val got = TextOps.lmScore(
        TextOps.lmBigramPairs(fresh, "doc_id", "text"), model)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, (r._2, r._3))).toMap
    assert(got.keySet === Set(7L, 8L, 9L),
      "every >=2-token doc must appear in the result")
    // unseen bigram, seen prefix a (c1=64, V=1): ilog2(2^40 div 65)-40
    assert(got(7L) === ((1L, -7L)))
    // fully unseen prefix: ilog2(2^40 div (0+1))-40 = 0
    assert(got(8L) === ((1L, 0L)))
    // seen bigram: identical to the trained-corpus score
    assert(got(9L) === ((1L, -1L)))
  }

  test("semDedup keeper policies: the precedence-maximal vector of " +
      "every cell is always kept under its policy") {
    val sk = graft.ops.Similarity.quantizeInt8(
      Tables.embeddings(spark, sfDir))
    def headAlwaysKept(keepFarthest: Boolean,
                       headOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val r = graft.ops.Similarity.semDedup(sk, k = 8, iters = 3,
        tauNum = 2L, tauDen = 5L, keepFarthest = keepFarthest)
      // join the dedup verdicts back to the assignment's dist2
      val km = graft.ops.Similarity.kmeansInt8(sk, 8, 3)
      val withD = r.join(km.assign.select("vec_id", "dist2"), "vec_id")
      val heads = headOf(withD)
      assert(heads.where(!col("kept")).isEmpty,
        s"a precedence-head was dropped (keepFarthest=$keepFarthest)")
    }
    import org.apache.spark.sql.expressions.Window
    // min-id policy: the lowest id per cell has no predecessor
    headAlwaysKept(keepFarthest = false, df => df.withColumn("rn",
        row_number().over(Window.partitionBy("cell")
          .orderBy(col("vec_id").asc)))
      .where(col("rn") === 1))
    // far policy: the farthest-from-centroid (ties min id) per cell
    headAlwaysKept(keepFarthest = true, df => df.withColumn("rn",
        row_number().over(Window.partitionBy("cell")
          .orderBy(col("dist2").desc, col("vec_id").asc)))
      .where(col("rn") === 1))
  }

  test("kmeansInt8Converged: converged assignment is a Lloyd fixpoint " +
      "(one more fixed-iteration round changes nothing)") {
    val sk = graft.ops.Similarity.quantizeInt8(
      Tables.embeddings(spark, sfDir).where(col("vec_id") % 5 === 0))
    val conv = graft.ops.Similarity.kmeansInt8Converged(sk, k = 8,
      maxIters = 40)
    // fixture converges by round 10 (the oracle's unroll depth): the
    // 10-round and 11-round fixed trajectories agree with it exactly
    val a10 = graft.ops.Similarity.kmeansInt8(sk, 8, 10).assign
    val a11 = graft.ops.Similarity.kmeansInt8(sk, 8, 11).assign
    def set(df: org.apache.spark.sql.DataFrame) = df.select("vec_id", "cell", "dist2")
      .collect().map(_.toSeq).toSet
    assert(set(conv.assign) === set(a10))
    assert(set(a10) === set(a11), "10 rounds is not past the fixpoint")
  }

  // ---- ivf index maintenance ----------------------------------------

  test("ivfIndex/ivfServeInt8: serving a base+delta merged index equals " +
      "the one-shot ivfTopKInt8 under the same codebook") {
    val sk = graft.ops.Similarity.quantizeInt8(
      Tables.embeddings(spark, sfDir))
    val isNew = col("vec_id") % 7 === 0
    val km = graft.ops.Similarity.kmeansInt8(sk.where(!isNew), 8, 2)
    val probes = Tables.embeddings(spark, sfDir)
      .where(col("vec_id") % 50 === 0)
    val merged = graft.ops.Similarity
      .ivfIndex(sk.where(!isNew), km.centroids)
      .unionByName(graft.ops.Similarity
        .ivfIndex(sk.where(isNew), km.centroids))
    val inc = graft.ops.Similarity
      .ivfServeInt8(merged, km.centroids, probes, k = 5)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val full = graft.ops.Similarity
      .ivfTopKInt8(sk, km.centroids, probes, k = 5)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(inc === full,
      "merged-index serving diverged from the full rebuild")
  }

  // ---- hilbert16 ----------------------------------------------------

  /** Reference inverse (test-side only): walk d back to its cell. */
  private def d2xy16(d0: Long): (Long, Long) = {
    var (x, y) = (0L, 0L)
    var d = d0
    var s = 1L
    while (s < 65536L) {
      val rx = (d / 2) % 2
      val ry = if (rx == 1L) 1L - d % 2 else d % 2
      if (ry == 0) {
        val (xf, yf) = if (rx == 1) (s - 1 - x, s - 1 - y) else (x, y)
        x = yf; y = xf
      }
      x += s * rx
      y += s * ry
      d /= 4
      s *= 2
    }
    (x, y)
  }

  test("hilbert16: consecutive curve positions are Manhattan-adjacent " +
      "cells (the defining locality property Z-order lacks)") {
    import graft.expr.ZOrderUtil
    // spot ranges across the 2^32 domain, including quadrant seams
    val starts = Seq(0L, 65535L, (1L << 30) - 100L, (1L << 31) + 7L,
      (1L << 32) - 2000L)
    for (st <- starts; d <- st until (st + 1000L)) {
      val (x1, y1) = d2xy16(d)
      val (x2, y2) = d2xy16(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"cells of d=$d and ${d + 1} not adjacent")
      // and the forward map inverts the walk: bijectivity evidence
      assert(ZOrderUtil.hilbert16(x1, y1) === d, s"xy2d(d2xy($d)) != $d")
    }
  }

  test("layout_locality: hilbert key-range blocks cover fewer, tighter " +
      "x-extents than zorder on the same bucket pairs") {
    val got = graft.queries.Pipeline16Queries
      .queries("layout_locality")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val (hb, hdx) = got("hilbert")
    val (zb, zdx) = got("zorder")
    assert(hb < zb, s"hilbert blocks $hb !< zorder $zb")
    assert(hdx < zdx, s"hilbert sum_dx $hdx !< zorder $zdx")
  }

  // ---- Pin: both modes ----------------------------------------------

  test("pin: defaults to localCheckpoint (no checkpoint dir) and " +
      "switches to reliable checkpoint under the conf override") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    assert(!Pin.reliable(df), "no checkpoint dir yet: must stay local")
    val local = df.pin()
    assert(local.as[(Long, String)].collect().toSet ===
      Set((1L, "a"), (2L, "b")))

    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      .toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      assert(Pin.reliable(df), "checkpoint dir set: must go reliable")
      spark.conf.set("graft.pin.reliable", "false")
      assert(!Pin.reliable(df), "conf override must win over the dir")
      spark.conf.set("graft.pin.reliable", "true")
      // an ITERATIVE operator end-to-end in reliable mode: the chain
      // 1-2, 2-3, 3-4 labels everything with the min id
      val verts = Seq(1L, 2L, 3L, 4L).toDF("id")
      val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
      val cc = graft.ops.Cluster.connectedComponents(
          verts, "id", edges, "a", "b")
        .as[(Long, Long)].collect().toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L),
        s"reliable-mode CC wrong: $cc")
    } finally {
      spark.conf.unset("graft.pin.reliable")
      // restore the no-dir default so later suites keep fast local pins
      // (checkpointDir is a plain var on SparkContext; no public unset)
      val f = classOf[org.apache.spark.SparkContext]
        .getDeclaredField("checkpointDir")
      f.setAccessible(true)
      f.set(spark.sparkContext, None)
    }
    assert(!Pin.reliable(df), "restore failed: dir still set")
  }
}
