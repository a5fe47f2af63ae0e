package graft

import org.apache.spark.sql.functions._
import graft.ops.{Selection, Similarity}

/** Round-8 batch-9 operators — greedy-selection invariants: max-coverage
  * picks the textbook greedy trajectory, ties break low-id, exhaustion
  * stops early; k-center reproduces the hand farthest-point sequence
  * with a non-increasing radius; the profile row is self-consistent on
  * the fixture (PK distinct == row count).
  */
class Round15Spec extends SparkSuite {
  import spark.implicits._

  // ---- greedyMaxCoverage --------------------------------------------

  test("max-coverage: textbook greedy — biggest set first, then the " +
      "only item with new elements, then early stop") {
    val inc = Seq(
      (10L, "e1"), (10L, "e2"), (10L, "e3"), (10L, "e4"),
      (20L, "e1"), (20L, "e2"),
      (30L, "e3"), (30L, "e4"),
      (40L, "e5")).toDF("item", "elem")
    val got = Selection.greedyMaxCoverage(inc, "item", "elem", k = 4)
      .orderBy("rnk").as[(Long, Long, Long)].collect().toSeq
    // 10 covers 4; 40 adds 1; 20/30 add nothing -> stop at 2 picks
    assert(got === Seq((1L, 10L, 4L), (2L, 40L, 1L)),
      s"greedy trajectory mismatch: $got")
  }

  test("max-coverage: equal gains break to the lower item id") {
    val inc = Seq((7L, "a"), (7L, "b"), (3L, "c"), (3L, "d"))
      .toDF("item", "elem")
    val got = Selection.greedyMaxCoverage(inc, "item", "elem", k = 2)
      .orderBy("rnk").select("item").as[Long].collect().toSeq
    assert(got === Seq(3L, 7L), s"tie-break order wrong: $got")
  }

  test("max-coverage: gains are non-increasing (submodularity) and " +
      "chosen items are distinct on the fixture corpus") {
    val out = SparkEntry.queries("curate_setcover")(spark, sfDir)
      .orderBy("rnk").as[(Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    assert(out.map(_._2).distinct.size == out.size, "item re-chosen")
    val gains = out.map(_._3)
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      s"gains must be non-increasing: $gains")
  }

  // ---- kCenterGreedy ------------------------------------------------

  test("k-center: hand farthest-point sequence — seed, the far point, " +
      "then the midpoint tie at the lower id") {
    val sk = Seq(
      (1L, Seq(0L, 0L), 0L),
      (2L, Seq(10L, 0L), 100L),
      (3L, Seq(100L, 0L), 10000L),
      (4L, Seq(90L, 0L), 8100L))
      .toDF("vec_id", "q_emb", "q_norm")
    val got = Similarity.kCenterGreedy(sk, k = 3)
      .orderBy("rnk").as[(Long, Long, Long)].collect().toSeq
    // seed 1 (d2 0); farthest from 1 is 3 (d2 10000);
    // then 2: min(100, 8100)=100 and 4: min(8100, 100)=100 — tie -> 2
    assert(got === Seq((1L, 1L, 0L), (2L, 3L, 10000L), (3L, 2L, 100L)),
      s"farthest-point sequence mismatch: $got")
  }

  test("k-center: the radius sequence is non-increasing on the " +
      "fixture embeddings (Gonzalez certificate)") {
    val out = SparkEntry.queries("sim_kcenter")(spark, sfDir)
      .orderBy("rnk").as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 5 && out.head._3 == 0L)
    val d2 = out.map(_._3).drop(1) // seed's 0 aside
    assert(d2.zip(d2.tail).forall { case (a, b) => a >= b },
      s"radius sequence must be non-increasing: $d2")
    assert(out.map(_._2).distinct.size == 5, "center re-chosen")
  }

  // ---- blockConductance / assortativityStats ------------------------

  test("conductance: triangle block with one cut edge — internal, " +
      "cut, and volume count exactly; unassigned vertex raises") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("s", "d")
    val blocks = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"))
      .toDF("node", "blk")
    val got = graft.ops.Graph.blockConductance(e, "s", "d",
        blocks, "node", "blk")
      .orderBy("block").as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("A", 3L, 1L, 7L), ("B", 0L, 1L, 1L)),
      s"block audit mismatch: $got")
    val bad = blocks.where(col("node") =!= 4L)
    val ex = intercept[Exception] {
      graft.ops.Graph.blockConductance(e, "s", "d", bad,
        "node", "blk").collect()
    }
    assert(ex.getMessage.contains("unassigned") ||
      Option(ex.getCause).exists(_.getMessage.contains("unassigned")),
      s"wrong failure: ${ex.getMessage}")
  }

  test("assortativity: a star is perfectly disassortative — the " +
      "integer stats yield r = -1 exactly") {
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s", "d")
    val (m, s1, s2, s3) = graft.ops.Graph.assortativityStats(e, "s", "d")
      .as[(Long, Long, Long, Long)].collect().head
    assert((m, s1, s2, s3) === ((3L, 9L, 12L, 30L)),
      s"stats mismatch: ${(m, s1, s2, s3)}")
    val num = 4 * m * s1 - s2 * s2
    val den = 2 * m * s3 - s2 * s2
    assert(num == -den, s"star must give r = -1: $num/$den")
  }

  // ---- classBalance -------------------------------------------------

  test("class balance: every label keeps exactly min-class-count rows, " +
      "and the selection is partitioning-invariant") {
    val df = ((1L to 30L).map(i => (i, "big")) ++
      (31L to 38L).map(i => (i, "mid")) ++
      (41L to 45L).map(i => (i, "small"))).toDF("id", "lbl")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Sampling.classBalance(d, col("lbl"), col("id"), "s")
        .select("id", "lbl").as[(Long, String)].collect().toSet
    val got = run(df)
    val byLabel = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byLabel === Map("big" -> 5, "mid" -> 5, "small" -> 5),
      s"labels not balanced to the min class: $byLabel")
    assert(run(df.repartition(7)) === got,
      "selection changed under repartitioning — not deterministic")
  }

  test("gini: a pure group scores zero impurity, an even 2-way mix " +
      "scores n^2/2 — from the graded query's integer form") {
    // verify the identity on hand counts rather than the fixture:
    // n=6 pure -> gini_num = 36 - 36 = 0;
    // n=6 even two-class -> 36 - (9+9) = 18 = n^2/2
    val c = Seq(("p", "A", 6L), ("q", "A", 3L), ("q", "B", 3L))
      .toDF("pri", "st", "nb")
    val g = c.groupBy("pri")
      .agg(sum("nb").as("n"), sum(col("nb") * col("nb")).as("ss"))
      .withColumn("gnum", col("n") * col("n") - col("ss"))
      .select("pri", "gnum").as[(String, Long)].collect().toMap
    assert(g === Map("p" -> 0L, "q" -> 18L), s"gini identity: $g")
  }

  // ---- dq_profile ---------------------------------------------------

  test("profile: per-column rows are self-consistent — constant row " +
      "count, PK distinct equals rows, null-free fixture reports 0") {
    val out = SparkEntry.queries("dq_profile")(spark, sfDir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out.size == 6)
    assert(out.map(_._2).distinct.size == 1, "n_rows must be constant")
    val pk = out.find(_._1 == "o_orderkey").get
    assert(pk._4 == pk._2, "order key must be unique")
    assert(out.forall(_._3 == 0L), "fixture has no nulls")
    val status = out.find(_._1 == "o_orderstatus").get
    assert(status._4 <= 3L, "order status has tiny cardinality")
  }
}
