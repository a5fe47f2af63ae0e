package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Round-8 batch-2 operators: integer Lloyd's k-means (the codebook-
  * training half of IVF/PQ) — the invariants the parquet oracle can't
  * state: the empty-cluster guard, partitioning invariance of the full
  * trajectory, convergence-fixpoint semantics, and the loud
  * non-convergence path. */
class Round10Spec extends SparkSuite {
  import spark.implicits._

  private def mkSketch(rows: Seq[(Long, Seq[Long])]) = {
    val df = rows.toDF("vec_id", "q_emb")
    df.withColumn("q_norm",
      aggregate(col("q_emb"), lit(0L), (a, x) => a + x * x))
  }

  test("kmeans: an emptied cell keeps its previous centroid (empty-" +
      "cluster guard), and the codebook always has k cells") {
    // two IDENTICAL vectors: both seed cells start at the same point, so
    // every vector assigns to the lower cell id and the other cell
    // receives no members on the first update — it must keep its seed
    // centroid, not vanish or go null
    val sk = mkSketch(Seq(
      (1L, Seq(10L, 0L)), (2L, Seq(10L, 0L)), (3L, Seq(0L, 50L))))
    val km = Similarity.kmeansInt8(sk, k = 3, iters = 2)
    val cents = km.centroids.orderBy("cell")
      .select("cell", "c_emb").as[(Long, Seq[Long])].collect()
    assert(cents.length === 3, s"codebook lost a cell: ${cents.toSeq}")
    // the duplicate-seeded pair: one of the two cells seeded at (10,0)
    // emptied; its centroid must still be exactly the seed vector
    assert(cents.count(_._2 == Seq(10L, 0L)) >= 1,
      s"emptied cell lost its seed centroid: ${cents.toSeq}")
    // every vector still assigned, dist2 exact
    val a = km.assign.orderBy("vec_id")
      .as[(Long, Long, Long)].collect()
    assert(a.length === 3)
    assert(a.forall(_._3 >= 0L), s"negative dist2: ${a.toSeq}")
    // the identical pair lands in the same cell (ties break to the
    // smaller cell id for BOTH, deterministically)
    assert(a(0)._2 === a(1)._2, s"identical vectors split: ${a.toSeq}")
  }

  test("kmeans: trajectory is invariant under input partitioning " +
      "(integer argmin + integer means commute with merge order)") {
    val emb = Tables.embeddings(spark, sfDir)
    val base = Similarity.kmeansInt8(
      Similarity.quantizeInt8(emb), k = 4, iters = 2)
    val shuffled = Similarity.kmeansInt8(
      Similarity.quantizeInt8(emb.repartition(7, col("label"))),
      k = 4, iters = 2)
    assert(base.assign.orderBy("vec_id").collect().toSeq ===
      shuffled.assign.orderBy("vec_id").collect().toSeq)
    assert(base.centroids.orderBy("cell").collect().toSeq ===
      shuffled.centroids.orderBy("cell").collect().toSeq)
  }

  test("kmeans: iters=0 returns the hash-seeded codebook itself") {
    val sk = Similarity.quantizeInt8(Tables.embeddings(spark, sfDir))
    val km = Similarity.kmeansInt8(sk, k = 5, iters = 0)
    val cents = km.centroids.select("cell", "c_emb")
      .as[(Long, Seq[Long])].collect().toMap
    assert(cents.keySet === (0L until 5L).toSet)
    // each seed centroid is an actual corpus sketch vector
    val all = sk.select("q_emb").as[Seq[Long]].collect().toSet
    assert(cents.values.forall(all.contains),
      "seed centroid is not a corpus vector")
  }

  test("kmeansInt8Converged: equals the fixed-iteration form at the " +
      "convergence round, and the result is a true fixpoint") {
    val sk = Similarity.quantizeInt8(Tables.embeddings(spark, sfDir))
      .localCheckpoint()
    val conv = Similarity.kmeansInt8Converged(sk, k = 4, maxIters = 60)
    // find the round where the fixed form first matches the fixpoint
    val convA = conv.assign.orderBy("vec_id").collect().toSeq
    val matchRound = (1 to 60).find { i =>
      Similarity.kmeansInt8(sk, k = 4, iters = i)
        .assign.orderBy("vec_id").collect().toSeq == convA
    }
    assert(matchRound.nonEmpty, "no fixed-iteration round matches")
    // fixpoint: one more Lloyd round changes nothing
    val more = Similarity.kmeansInt8(sk, k = 4,
      iters = matchRound.get + 1)
    assert(more.assign.orderBy("vec_id").collect().toSeq === convA,
      "assignment still moving after claimed convergence")
  }

  test("kmeansInt8Converged fails LOUDLY when maxIters is too small") {
    val sk = Similarity.quantizeInt8(Tables.embeddings(spark, sfDir))
    val e = intercept[IllegalStateException] {
      Similarity.kmeansInt8Converged(sk, k = 8, maxIters = 1)
    }
    assert(e.getMessage.contains("no revisited state"), e.getMessage)
  }

  test("pq: encode-after-train reproduces the training assignment, and " +
      "the trajectory is partitioning-invariant") {
    val emb = Tables.embeddings(spark, sfDir)
    val pq = Similarity.pqTrainInt8(Similarity.quantizeInt8(emb),
      m = 8, ksub = 4, iters = 2)
    val enc = Similarity.pqEncode(Similarity.quantizeInt8(emb),
      pq.codebook, m = 8)
    assert(pq.codes.orderBy("vec_id", "sub").collect().toSeq ===
      enc.orderBy("vec_id", "sub").collect().toSeq,
      "pqEncode against the trained codebook must equal train's codes")
    val shuffled = Similarity.pqTrainInt8(
      Similarity.quantizeInt8(emb.repartition(7, col("label"))),
      m = 8, ksub = 4, iters = 2)
    assert(pq.codes.orderBy("vec_id", "sub").collect().toSeq ===
      shuffled.codes.orderBy("vec_id", "sub").collect().toSeq)
  }

  test("pq: Lloyd rounds do not worsen total quantization error on the " +
      "fixtures, and every vector gets exactly m codes in range") {
    val sk = Similarity.quantizeInt8(Tables.embeddings(spark, sfDir))
      .localCheckpoint()
    def err(iters: Int): Long =
      Similarity.pqTrainInt8(sk, m = 8, ksub = 8, iters = iters)
        .codes.agg(sum("dist2")).as[Long].head()
    val e0 = err(0); val e2 = err(2)
    assert(e2 <= e0, s"training increased error: $e0 -> $e2")
    val codes = Similarity.pqTrainInt8(sk, m = 8, ksub = 8, iters = 1)
      .codes.localCheckpoint()
    val n = sk.count()
    assert(codes.count() === n * 8)
    assert(codes.where(col("code") < 0 || col("code") >= 8).isEmpty,
      "code out of range")
    assert(codes.where(col("dist2") < 0).isEmpty, "negative dist2")
  }

  test("pq ADC: adist telescopes — it equals the sum over subspaces of " +
      "the probe-to-assigned-cell integer sub-distances") {
    val emb = Tables.embeddings(spark, sfDir)
    val sk = Similarity.quantizeInt8(emb).localCheckpoint()
    val pq = Similarity.pqTrainInt8(sk, m = 8, ksub = 8, iters = 2)
    val probes = emb.where(col("vec_id") % 100 === 0)
    val top = Similarity.pqTopK(pq.codes, pq.codebook, probes, k = 3)
      .localCheckpoint()
    // recompute one (query, neighbor) ADC distance by hand
    val (qid, nid, adist) = top.orderBy("query_id", "rnk")
      .select("query_id", "neighbor_id", "adist")
      .as[(Long, Long, Long)].head()
    val psv = sk.where(col("vec_id") === qid)
      .select(col("q_emb")).as[Seq[Long]].head()
    val ncodes = pq.codes.where(col("vec_id") === nid)
      .orderBy("sub").select("code").as[Long].collect()
    val cb = pq.codebook.select("sub", "cell", "c_emb")
      .as[(Long, Long, Seq[Long])].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    val manual = (0 until 8).map { s =>
      val pv = psv.slice(s * 8, s * 8 + 8)
      val cv = cb((s.toLong, ncodes(s)))
      pv.zip(cv).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sum
    assert(manual === adist, s"ADC mismatch: manual=$manual got=$adist")
  }

  private def triCounts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    graft.ops.Graph.triangleCounts(
        edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("triangles: K4 has every vertex in 3 triangles; a path has " +
      "none; direction, duplicates and self-loops are ignored") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))
    assert(triCounts(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(triCounts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) ===
      Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
    // same K4 with reversed duplicates and a self-loop mixed in
    val messy = k4 ++ k4.map(_.swap) ++ Seq((2L, 2L))
    assert(triCounts(messy) === triCounts(k4))
  }

  test("triangles: a star (pure hub) has none — the degree orientation " +
      "generates no wedges at the hub — and a hub closed by one rim " +
      "edge yields exactly one triangle") {
    val star = (2L to 9L).map(v => (1L, v))
    assert(triCounts(star).values.forall(_ == 0L))
    val closed = star :+ (2L, 3L)
    val c = triCounts(closed)
    assert(c(1L) === 1L && c(2L) === 1L && c(3L) === 1L &&
      (4L to 9L).forall(c(_) == 0L), c.toString)
  }

  test("kCore: a pendant chain peels one vertex per round into the " +
      "triangle core; the fixed form converges to the true 2-core") {
    // triangle {1,2,3} + chain 3-4-5-6: at k=2 the chain tip peels one
    // vertex per round (6, then 5, then 4) — a genuinely multi-round
    // peel — leaving the triangle, where everyone keeps degree 2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L)).toDF("a", "b")
    def surv(rounds: Int): Map[Long, Long] =
      graft.ops.Graph.kCore(g, "a", "b", k = 2, rounds = rounds)
        .as[(Long, Long)].collect().toMap
    assert(surv(0).keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(surv(1).keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(surv(2).keySet === Set(1L, 2L, 3L, 4L))
    assert(surv(3) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val conv = graft.ops.Graph.kCoreConverged(g, "a", "b", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(conv === surv(3), "converged core != fixed-round fixpoint")
    // every survivor of the CONVERGED core has degree >= k
    assert(conv.values.forall(_ >= 2L))
  }

  test("kCoreConverged matches the fixed form's fixpoint on the " +
      "co-order fixture and fails LOUDLY when capped") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("g"), col("l_partkey").as("p"))
      .distinct()
    val edges = li.select(col("g"), col("p").as("lo"))
      .join(li.select(col("g"), col("p").as("hi")), "g")
      .where(col("lo") < col("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("n"))
      .where(col("n") >= 2).select("lo", "hi")
      .localCheckpoint()
    // k=20 peels multi-round at sf0.001 (the 20-core is empty, reached
    // through 3 shrinking rounds — a genuine cascade)
    val conv = graft.ops.Graph.kCoreConverged(edges, "lo", "hi", k = 20)
      .orderBy("node").collect().toSeq
    // the converged core is a fixpoint of the fixed form: find it
    val r = (1 to 50).find { i =>
      graft.ops.Graph.kCore(edges, "lo", "hi", k = 20, rounds = i)
        .orderBy("node").collect().toSeq == conv
    }
    assert(r.nonEmpty, "no fixed-round prefix reaches the converged core")
    val e = intercept[IllegalStateException] {
      graft.ops.Graph.kCoreConverged(edges, "lo", "hi", k = 20,
        maxRounds = 1)
    }
    assert(e.getMessage.contains("no fixpoint"), e.getMessage)
  }

  test("signProjectInt8 matches the hand-computed literal projection " +
      "and is bounded by the sketch's L1 norm") {
    val sk = Similarity.quantizeInt8(Tables.embeddings(spark, sfDir))
      .localCheckpoint()
    val out = Similarity.signProjectInt8(sk, outDims = 4)
    val (vid, p) = out.orderBy("vec_id")
      .as[(Long, Seq[Long])].head()
    val q = sk.where(col("vec_id") === vid)
      .select("q_emb").as[Seq[Long]].head()
    val manual = (0 until 4).map { j =>
      q.zipWithIndex.map { case (x, i) =>
        x * (if (Similarity.planeSign(100 + j, i) > 0) 1L else -1L)
      }.sum
    }
    assert(p === manual, s"projection mismatch: $p vs $manual")
    val l1 = q.map(math.abs).sum
    assert(p.forall(v => math.abs(v) <= l1))
  }

  private def spanDedup(rows: Seq[(Long, String)]): Map[Long, String] =
    graft.ops.TextOps.dropRepeatedSpans(
        rows.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap

  test("span dedup: the globally-first occurrence survives, every " +
      "other occurrence's covered positions are removed") {
    // docs 1 and 2 share a 5-token run (3 flagged 3-gram starts in doc
    // 2 cover all 5 tokens); doc 3 is untouched
    val out = spanDedup(Seq(
      (1L, "p q r s t u v"),
      (2L, "x1 x2 r s t u v x3"),
      (3L, "a1 a2 a3 a4")))
    assert(out(1L) === "p q r s t u v", out.toString)
    assert(out(2L) === "x1 x2 x3", out.toString)
    assert(out(3L) === "a1 a2 a3 a4")
  }

  test("span dedup: within-doc repetition keeps the first occurrence; " +
      "an all-unique corpus is unchanged; a fully-duplicated doc " +
      "rewrites to empty") {
    val rep = spanDedup(Seq((1L, "a b c x a b c")))
    assert(rep(1L) === "a b c x", rep.toString)
    val uniq = Seq((1L, "u1 u2 u3 u4"), (2L, "v1 v2 v3"))
    assert(spanDedup(uniq) === uniq.toMap)
    val full = spanDedup(Seq((1L, "d e f"), (2L, "d e f")))
    assert(full === Map(1L -> "d e f", 2L -> ""))
  }

  test("triangleDelta: composition identity counts(B∪D) = counts(B) + " +
      "delta, with multi-new-edge triangles counted once") {
    // K4 on {1..4} plus a pendant: full graph has 4 triangles. D takes
    // (1,2) and (1,3) — triangle {1,2,3} has TWO new edges (must count
    // once); {1,2,4} and {1,3,4} one each; {2,3,4} zero (stays in B)
    val full = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L))
    val dSet = Set((1L, 2L), (1L, 3L))
    val bEdges = full.filterNot(dSet).toDF("a", "b")
    val dEdges = dSet.toSeq.toDF("a", "b")
    val delta = graft.ops.Graph.triangleDelta(bEdges, dEdges, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(delta === Map(1L -> 3L, 2L -> 2L, 3L -> 2L, 4L -> 2L),
      delta.toString)
    val base = graft.ops.Graph.triangleCounts(bEdges, "a", "b")
      .as[(Long, Long)].collect().toMap
    val fullC = graft.ops.Graph.triangleCounts(full.toDF("a", "b"),
      "a", "b").as[(Long, Long)].collect().toMap
    val composed = (base.keySet ++ delta.keySet).map(v =>
      v -> (base.getOrElse(v, 0L) + delta.getOrElse(v, 0L))).toMap
    assert(composed === fullC, s"composed=$composed full=$fullC")
    // delta edges already present in B are ignored
    val noop = graft.ops.Graph.triangleDelta(full.toDF("a", "b"),
      dEdges, "a", "b")
    assert(noop.isEmpty)
  }

  test("bpe: the classic low/lower/newest trajectory — argmax pairs " +
      "with (cnt desc, l, r) ties, greedy application") {
    val docs = Seq((1L, "low low low lower lower newest"))
      .toDF("doc_id", "text")
    val bpe = graft.ops.TextOps.bpeTrainMerges(docs, "text", rounds = 5)
    val merges = bpe.merges.orderBy("rnk")
      .select("l", "r", "cnt").as[(String, String, Long)].collect().toSeq
    assert(merges === Seq(("l", "o", 5L), ("lo", "w", 5L),
      ("e", "r", 2L), ("low", "er", 2L), ("e", "s", 1L)),
      merges.toString)
    val segs = bpe.vocab.select("word", "seg")
      .as[(String, String)].collect().toMap
    assert(segs("low") === " low ")
    assert(segs("lower") === " lower ")
    assert(segs("newest") === " n e w es t ")
  }

  test("bpe fails LOUDLY when rounds exceed the corpus's mergeable " +
      "pairs instead of silently wiping the vocab") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text") // one 2-char type
    val e = intercept[IllegalStateException] {
      graft.ops.TextOps.bpeTrainMerges(docs, "text", rounds = 2)
    }
    assert(e.getMessage.contains("no adjacent pairs left"), e.getMessage)
  }

  test("bpe: segmentation is a partition of the word (symbols " +
      "concatenate back to it) at every vocab row on the fixtures") {
    val bpe = graft.ops.TextOps.bpeTrainMerges(
      Tables.documents(spark, sfDir), "text", rounds = 4)
    val bad = bpe.vocab
      .where(regexp_replace(col("seg"), " ", "") =!= col("word"))
    assert(bad.isEmpty, bad.collect().toSeq.toString)
    // merge counts never increase across rounds (the max pair count is
    // monotone non-increasing as symbols coarsen)
    val cnts = bpe.merges.orderBy("rnk").select("cnt")
      .as[Long].collect().toSeq
    assert(cnts === cnts.sorted.reverse, cnts.toString)
  }

  test("ivfTopKInt8 with nprobe = k-cells degenerates to the exact " +
      "quantized brute-force ranking (recall 1 when probing all cells)") {
    val emb = Tables.embeddings(spark, sfDir)
    val sk = Similarity.quantizeInt8(emb).localCheckpoint()
    val km = Similarity.kmeansInt8(sk, k = 4, iters = 2)
    val probes = emb.where(col("vec_id") % 100 === 0)
    val ivf = Similarity.ivfTopKInt8(sk, km.centroids, probes,
      k = 5, nprobe = 4)
    val brute = Similarity.quantizedTopKOnSketch(sk, probes, 5)
    assert(ivf.orderBy("query_id", "rnk").collect().toSeq ===
      brute.orderBy("query_id", "rnk").collect().toSeq,
      "all-cells IVF must equal the brute-force quantized ranking")
  }
}
