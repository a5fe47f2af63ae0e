package graft

import org.apache.spark.sql.functions._
import graft.ops.DedupText

/** Round-5 pins: the boilerplate fence is wired into the flagship
  * fuzzyDedup pipeline (not just available beside it). */
class Round5Spec extends SparkSuite {
  import spark.implicits._

  test("fuzzyDedup routes through the boilerplate fence by default") {
    // 40 docs sharing a dominant license header (J over RAW shingles
    // ≈ 0.8 between any two docs — all of them look like near-dups), two
    // planted exact duplicates. Without the fence the candidate join is
    // quadratic AND verification wrongly merges unrelated docs.
    val header = (0 until 40).map(k => s"lic$k").mkString(" ")
    val docs = (Seq.tabulate(40) { i =>
      val body = (0 until 5).map(k => s"w${(i * 131 + k * 7) % 9973}")
        .mkString(" ")
      (i.toLong, s"$header $body")
    } ++ Seq((1000L, header + " w131 w138 w145 w152 w159"), // dup of doc 1
             (1003L, header + " w524 w531 w538 w545 w552")) // dup of doc 4
    ).toDF("doc_id", "text")

    // unfenced signatures: the shared header floods the sketch and the
    // banded self-join degenerates toward all-pairs
    val rawSh = docs.select(col("doc_id"),
      explode(graft.ops.TextOps.shingles(col("text"), 3)).as("s"))
    val rawCand = DedupText.lshCandidatesExact(
      DedupText.signaturesFromShingles(rawSh, "doc_id"), "doc_id", 8, 4)
      .count()
    val fencedCand = DedupText.lshCandidatesExact(
      DedupText.signaturesFromShingles(
        DedupText.shinglesFiltered(docs, "doc_id", "text", 3, 0.5),
        "doc_id"), "doc_id", 8, 4)
      .count()
    assert(rawCand > 100 && fencedCand <= 10,
      s"fence must kill the quadratic inflation: raw=$rawCand fenced=$fencedCand")

    // the flagship pipeline (default maxDocFrac): exact dups cluster with
    // their originals, every other doc stays a singleton — the shared
    // header neither merges unrelated docs nor survives into Jaccard
    val got = DedupText.fuzzyDedup(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(got(1000L) === 1L && got(1003L) === 4L)
    (0L until 40L).foreach(i => assert(got(i) === i, s"doc $i not singleton"))

    // maxDocFrac >= 1 restores the unfenced behavior: the header is
    // boilerplate-similar enough that raw Jaccard merges everything
    val unfenced = DedupText.fuzzyDedup(docs, "doc_id", "text",
      maxDocFrac = 1.0).as[(Long, Long)].collect().toMap
    assert(unfenced.values.toSet.size < 5,
      s"unfenced raw-Jaccard should wrongly merge the corpus")
  }

  test("applyEdges fences stray delta-edge endpoints by default") {
    import graft.ops.Cluster
    val base = Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster")
    // endpoint 0 exists in NEITHER baseLabels nor newVertices and is
    // SMALLER than every real id: unfenced it would win the min-label
    // race and label the cluster 0 — a canonical id with no output row
    val stray = Seq((2L, 0L)).toDF("a", "b")
    val dv = Seq(5L).toDF("v")
    val got = Cluster.applyEdges(base, stray, "a", "b", dv, "v")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
    // the covered fast path keeps the documented caller contract
    val covered = Cluster.applyEdges(base,
        Seq((2L, 5L)).toDF("a", "b"), "a", "b", dv, "v",
        edgesCovered = true)
      .as[(Long, Long)].collect().toMap
    assert(covered === Map(1L -> 1L, 2L -> 1L, 5L -> 1L))
  }

  test("tokenBudget selects the global-cumsum prefix without a global sort") {
    import graft.ops.Sampling
    // scores: class 3 = ids 1,2 (cost 5 each); class 2 = ids 3,4,5
    // (cost 4 each); class 1 = id 6 (cost 1). budget 19:
    // class 3 fits whole (10), class 2 is marginal: ids 3 (14), 4 (18)
    // fit, 5 would hit 22 > 19 — and class 1 is past the cutoff even
    // though its cost alone would fit (cumsum is monotone)
    val d = Seq((1L, 3L, 5L), (2L, 3L, 5L), (3L, 2L, 4L), (4L, 2L, 4L),
      (5L, 2L, 4L), (6L, 1L, 1L)).toDF("id", "score", "cost")
    val got = Sampling.tokenBudget(d, "score", "cost", "id", 19L)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 2L, 3L, 4L))
    // budget covers everything -> identity (no marginal class at all)
    assert(Sampling.tokenBudget(d, "score", "cost", "id", 100L)
      .count() === 6L)
    // zero budget -> empty
    assert(Sampling.tokenBudget(d, "score", "cost", "id", 0L)
      .count() === 0L)
    // null scores are excluded up front, not silently ranked
    val withNull = d.unionByName(
      Seq((7L, Option.empty[Long], Option(2L)))
        .toDF("id", "score", "cost"))
    assert(!Sampling.tokenBudget(withNull, "score", "cost", "id", 100L)
      .select("id").as[Long].collect().contains(7L))
    // fractional scores: class membership AND the window partition both
    // use the long view — 2.7 and 2.3 are ONE marginal class with one
    // cumsum (a raw-score partition would restart it per value and
    // overspend the budget)
    val frac = Seq((1L, 5.0, 10L), (2L, 2.7, 60L), (3L, 2.3, 60L))
      .toDF("id", "score", "cost")
    assert(Sampling.tokenBudget(frac, "score", "cost", "id", 100L)
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
    // negative costs break the monotone-cumsum contract — loud failure
    val neg = Seq((1L, 3L, 100L), (2L, 2L, -60L)).toDF("id", "score", "cost")
    intercept[Exception] {
      Sampling.tokenBudget(neg, "score", "cost", "id", 50L).collect()
    }
  }

  test("tokenBudget equals the in-memory cumsum reference on random data") {
    import graft.ops.Sampling
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val data = Seq.tabulate(200)(i =>
        (i.toLong, rnd.nextInt(8).toLong, (rnd.nextInt(9) + 1).toLong))
      val budget = rnd.nextInt(800) + 50L
      val expected = data.sortBy { case (id, s, _) => (-s, id) }
        .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, s, c)) =>
          (id, s, c, cum + c)
        }.tail.takeWhile(_._4 <= budget).map(_._1).toSet
      val got = Sampling.tokenBudget(
          data.toDF("id", "score", "cost"), "score", "cost", "id", budget)
        .select("id").as[Long].collect().toSet
      assert(got === expected, s"trial $trial budget $budget")
    }
  }

  test("fence is a no-op on a clean corpus (fenced == unfenced labels)") {
    // the graded fixture has no corpus-wide shingle, so the wired fence
    // must not change dd_fuzzy_verified's answer vs maxDocFrac = 1
    val docs = graft.queries.PipelineQueries.docsWithDups(spark, sfDir)
    val fenced = DedupText.fuzzyDedup(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val unfenced = DedupText.fuzzyDedup(docs, "doc_id", "text",
      maxDocFrac = 1.0).as[(Long, Long)].collect().toMap
    assert(fenced === unfenced)
  }
}
