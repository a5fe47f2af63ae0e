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
