package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Quality, Sampling, Similarity}

/** Round-10 fourth batch: refine-tier rerank contracts, local
  * clustering closed forms, systematic-sampling guarantees (exact hit
  * counts, Σ = draws, w ≥ step ⇒ selected), and the chi-square /
  * mergeable-KS algebra — the guarantees the parquet oracle can't
  * state. */
class Round20Spec extends SparkSuite {
  import spark.implicits._

  // ---- Similarity.refineTopK ------------------------------------------

  private def tinySketch = Similarity.quantizeInt8(
    Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, Array(0.5f, 0.5f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding"))

  test("refineTopK with the full pair shortlist ranks by exact int8 " +
      "squared-L2 (brute-force cross-check)") {
    val sk = tinySketch.localCheckpoint()
    val rows = sk.select("vec_id", "q_emb", "q_norm")
      .as[(Long, Array[Long], Long)].collect().sortBy(_._1)
    val probes = sk.where($"vec_id" === 1L)
    val full = rows.map(_._1).filter(_ != 1L).map(n => (1L, n))
      .toSeq.toDF("query_id", "neighbor_id")
    val got = Similarity.refineTopK(sk, probes, full, k = 4)
      .select("rnk", "neighbor_id", "rdist")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val p = rows.find(_._1 == 1L).get
    val expect = rows.filter(_._1 != 1L).map { case (id, emb, n) =>
      val dot = emb.zip(p._2).map { case (a, b) => a * b }.sum
      (id, p._3 - 2 * dot + n)
    }.sortBy { case (id, d) => (d, id) }.zipWithIndex
      .map { case ((id, d), i) => (i + 1L, id, d) }
    assert(got.toSeq === expect.toSeq)
  }

  test("refineTopK never resurrects outside the shortlist: dropping " +
      "the true nearest promotes the runner-up") {
    val sk = tinySketch.localCheckpoint()
    val probes = sk.where($"vec_id" === 1L)
    // nearest to 1 is 2 (0.9, 0.1); exclude it from the shortlist
    val short = Seq((1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.refineTopK(sk, probes, short, k = 1)
      .select("neighbor_id").as[Long].collect()
    assert(got.toSeq === Seq(5L),
      "top-1 within {3,4,5} must be 5 (the 45-degree vector)")
  }

  // ---- Graph.localClustering ------------------------------------------

  test("localClustering closed form: triangle + pendant edge") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val got = Graph.localClustering(e, "s", "d")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 1L, 2L, 2L, 2L),  // in 1 triangle, deg 2 → lcc = 1
      (2L, 1L, 2L, 2L, 2L),
      (3L, 1L, 3L, 2L, 6L),  // deg 3 → lcc = 1/3
      (4L, 0L, 1L, 0L, 0L))) // pendant: undefined (den 0), never ÷0
  }

  test("localClustering agrees with triangleCounts on the fixture graph") {
    val topk = Graph.cooccurTopK(Tables.lineitem(spark, sfDir),
      "l_orderkey", "l_suppkey", k = 5)
    val lcc = Graph.localClustering(topk, "item", "co_item")
      .localCheckpoint()
    val tri = Graph.triangleCounts(topk, "item", "co_item")
    assert(lcc.select("node", "n_tri").except(tri).isEmpty &&
      tri.except(lcc.select("node", "n_tri")).isEmpty)
    // algebra: lcc_num = 2·n_tri, lcc_den = deg·(deg−1), and a vertex
    // can't close more triangles than its degree pairs: num ≤ den
    assert(lcc.where($"lcc_num" =!= $"n_tri" * 2 ||
      $"lcc_den" =!= $"deg" * ($"deg" - 1) ||
      $"lcc_num" > $"lcc_den").isEmpty)
  }

  // ---- Sampling.systematic --------------------------------------------

  test("systematic: exact hit counts vs a brute-force grid walk, and " +
      "Σ n_hits = draws") {
    val w = Seq((1L, 5L), (2L, 1L), (3L, 1L), (4L, 3L)).toDF("id", "wt")
    val draws = 5
    val got = Sampling.systematic(w, "id", $"wt", draws, "s")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // reproduce: W = 10, step = 2, off = java_hash_u32("s") % 2
    val h = "s".hashCode.toLong
    val off = (if (h < 0) h + 4294967296L else h) % 2
    val lo = Map(1L -> 0L, 2L -> 5L, 3L -> 6L, 4L -> 7L)
    val wt = Map(1L -> 5L, 2L -> 1L, 3L -> 1L, 4L -> 3L)
    val points = (0 until draws).map(i => off + i * 2L)
    val expect = lo.keys.toSeq.sorted.flatMap { id =>
      val n = points.count(p => p >= lo(id) && p < lo(id) + wt(id))
      if (n > 0) Some((id, wt(id), lo(id), n.toLong)) else None
    }
    assert(got.toSeq === expect)
    assert(got.map(_._4).sum === draws)
  }

  test("systematic on the documents fixture: Σ n_hits = draws, every " +
      "row with w >= step is selected, and the draw is deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val draws = 50
    val got = Sampling.systematic(docs, "doc_id", $"n_chars", draws,
      "sys").localCheckpoint()
    assert(got.agg(sum("n_hits")).as[Long].collect().head === draws)
    val tot = docs.agg(sum($"n_chars".cast("long"))).as[Long]
      .collect().head
    val step = tot / draws
    // an interval of length >= step always contains a grid point
    val big = docs.where($"n_chars".cast("long") >= step)
      .select($"doc_id")
    assert(big.join(got, Seq("doc_id"), "left_anti").isEmpty,
      s"a doc with w >= step = $step missed selection")
    val again = Sampling.systematic(docs, "doc_id", $"n_chars", draws,
      "sys")
    assert(got.select("doc_id", "n_hits").except(
      again.select("doc_id", "n_hits")).isEmpty)
  }

  test("systematic fences: non-positive weight raises; draws beyond " +
      "the total weight raises") {
    val bad = Seq((1L, 3L), (2L, 0L)).toDF("id", "wt")
    val e1 = intercept[Exception] {
      Sampling.systematic(bad, "id", $"wt", 2, "s").collect()
    }
    assert(e1.getMessage.contains("non-positive"))
    val tiny = Seq((1L, 2L), (2L, 1L)).toDF("id", "wt")
    val e2 = intercept[Exception] {
      Sampling.systematic(tiny, "id", $"wt", 5, "s").collect()
    }
    assert(e2.getMessage.contains("exceeds total weight"))
  }

  // ---- Quality.chi2Stats / mergeable KS -------------------------------

  test("chi2Stats closed form on a 2x2 table, and zero deviation on " +
      "identical samples") {
    val a = Seq("x", "x", "y").toDF("v")
    val b = Seq("x", "y", "y").toDF("v")
    val got = Quality.chi2Stats(a, b, "v")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    // dev = |o_a·n_b − o_b·n_a| with n_a = n_b = 3
    assert(got.toSeq === Seq(("x", 2L, 1L, 3L, 3L), ("y", 1L, 2L, 3L, 3L)))
    // χ² assembly = Σ dev²/pool / (n_a·n_b) = (3 + 3)/9 = 2/3 — the
    // textbook value for [[2,1],[1,2]]
    val chi2 = got.map { case (_, _, _, dev, pool) =>
      dev.toDouble * dev / pool }.sum / 9.0
    assert(math.abs(chi2 - 2.0 / 3.0) < 1e-12)
    val same = Quality.chi2Stats(a, a, "v")
    assert(same.where($"dev_num" =!= 0L).isEmpty)
  }

  test("ksStat on a STRING domain: at_value is the smallest value " +
      "attaining D (negating a string would NULL the tiebreak and " +
      "flip it to the largest)") {
    // both 'a' and 'c' attain d_num = 2·|cum diff| ... construct ties:
    // a = [a, b], b = [b, c] → cum diffs at a:(1·2−0·2)=2, b:(2·2−1·2)=2,
    // c:(2·2−2·2)=0 → D attained at 'a' AND 'b'; smallest is 'a'
    val a = Seq("a", "b").toDF("v")
    val b = Seq("b", "c").toDF("v")
    val got = Quality.ksStat(a, b, "v")
      .as[(Long, Long, Long, String)].collect().head
    assert(got === ((2L, 2L, 2L, "a")))
  }

  test("ksCounts additivity: the KS verdict from merged disjoint-slice " +
      "histograms equals the full-rebuild ksStat") {
    val li = Tables.lineitem(spark, sfDir)
    val early = year($"l_shipdate") < 1998
    val isNew = $"l_orderkey" % 3 === 0
    def hist(d: org.apache.spark.sql.DataFrame) =
      Quality.ksCounts(d.where(early), d.where(!early), "l_quantity")
    val merged = Quality.ksFromCounts(Quality.ksMergeCounts(
      hist(li.where(!isNew)), hist(li.where(isNew))))
    val full = Quality.ksStat(li.where(early), li.where(!early),
      "l_quantity")
    assert(merged.collect().toSeq === full.collect().toSeq)
  }

  test("chi2FromCounts on merged slices equals chi2Stats on the whole " +
      "frame (the shared sufficient-statistics contract)") {
    val li = Tables.lineitem(spark, sfDir)
    val early = year($"l_shipdate") < 1998
    val isNew = $"l_orderkey" % 3 === 0
    def hist(d: org.apache.spark.sql.DataFrame) =
      Quality.ksCounts(d.where(early), d.where(!early), "l_quantity")
    val merged = Quality.chi2FromCounts(Quality.ksMergeCounts(
      hist(li.where(!isNew)), hist(li.where(isNew))))
    val full = Quality.chi2Stats(li.where(early), li.where(!early),
      "l_quantity")
    assert(merged.orderBy("v").collect().toSeq ===
      full.orderBy("v").collect().toSeq)
  }
}
