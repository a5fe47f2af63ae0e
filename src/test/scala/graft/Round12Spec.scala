package graft

import org.apache.spark.sql.functions._
import graft.ops.{Graph, Multimodal, Quality, Retrieval, Similarity,
  TextOps, TimeSeries}

/** Round-8 batch-4 operators — the invariants the parquet oracle can't
  * state: ACF's closed-form values on hand series, Benford's exclusion
  * and dense-spine rules, walk trajectories staying on edges and
  * replaying bit-identically, and the k-means sufficient-statistics
  * merge identity under fixed centroids. */
class Round12Spec extends SparkSuite {
  import spark.implicits._

  // ---- acfExact -----------------------------------------------------

  test("acf: alternating series has num_1 = -den (perfect negative " +
      "lag-1 correlation, up to the truncated tail term)") {
    // x = 0,2,0,2,... n=6, S=6, e_t = 6*x-6 = -6,+6,-6,...
    // den = 6*36 = 216; num_1 = 5 products of (-36) = -180
    val df = Seq((1L, 0L), (2L, 2L), (3L, 0L), (4L, 2L), (5L, 0L),
      (6L, 2L)).toDF("t", "x")
    val got = TimeSeries.acfExact(df, Nil, Seq(col("t")), "x", 2)
      .orderBy("lag").select("lag", "num", "den")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, -180L, 216L), (2L, 144L, 216L)),
      s"closed-form ACF mismatch: $got")
  }

  test("acf: keyed series are independent — each key gets its own " +
      "totals and its own lag frame") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 3L), ("a", 3L, 1L),
      ("b", 1L, 5L), ("b", 2L, 5L), ("b", 3L, 5L))
      .toDF("k", "t", "x")
    val got = TimeSeries.acfExact(df, Seq("k"), Seq(col("t")), "x", 1)
      .orderBy("k").select("k", "num", "den")
      .as[(String, Long, Long)].collect().toSeq
    // a: n=3 S=5, e = -2, 4, -2 -> den=24, num_1 = -8 + -8 = -16
    // b: constant -> e all 0, den=0, num=0 (undefined ratio, exact zeros)
    assert(got === Seq(("a", -16L, 24L), ("b", 0L, 0L)),
      s"keyed ACF mismatch: $got")
  }

  // ---- benfordAudit -------------------------------------------------

  test("benford: non-positive measures are excluded from cnt AND n; " +
      "every digit 1-9 reports even with zero observations") {
    val df = Seq(100L, 150L, 190L, -5L, 0L, 2000L)
      .toDF("v").withColumn("k", lit("g"))
    val got = Quality.benfordAudit(df, Seq("k"), col("v"))
      .orderBy("digit")
      .select("digit", "cnt").as[(Long, Long)].collect().toSeq
    // 4 positive values: 100,150,190 -> digit 1 (x3); 2000 -> digit 2
    assert(got.map(_._1) === (1L to 9L),
      s"dense digit spine violated: ${got.map(_._1)}")
    assert(got.map(_._2) === Seq(3L, 1L, 0L, 0L, 0L, 0L, 0L, 0L, 0L),
      s"counts wrong: $got")
  }

  test("benford: a digit-9-heavy distribution flags digit 9 (over) " +
      "and digit 1 (under); dev is the exact micro-share gap") {
    val df = (1 to 10).map(i => 900L + i).toDF("v")
      .withColumn("k", lit("g"))
    val row = Quality.benfordAudit(df, Seq("k"), col("v"))
      .where(col("digit") === 9)
      .select("cnt", "dev", "flagged")
      .as[(Long, Long, Boolean)].collect().head
    // all 10 values lead with 9: dev = |1e6*10 - 10*45757| = 9542430
    assert(row === ((10L, 9542430L, true)), s"digit-9 row wrong: $row")
    val d1 = Quality.benfordAudit(df, Seq("k"), col("v"))
      .where(col("digit") === 1).select("flagged")
      .as[Boolean].collect().head
    assert(d1, "digit 1 at zero share must flag (|0 - 301029ppm| > 10pp)")
  }

  // ---- deterministicWalks -------------------------------------------

  test("walks: every transition is an edge of the canonical graph, " +
      "step 0 is the seed, and re-running replays bit-identically") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L),
      (2L, 2L), (1L, 2L)) // self-loop + duplicate must be ignored
      .toDF("s", "d")
    val w1 = Graph.deterministicWalks(edges, "s", "d", steps = 3)
      .orderBy("walker", "step")
      .as[(Long, Long, Long)].collect().toSeq
    val w2 = Graph.deterministicWalks(edges, "s", "d", steps = 3)
      .orderBy("walker", "step")
      .as[(Long, Long, Long)].collect().toSeq
    assert(w1 === w2, "walks must be deterministic across runs")
    assert(w1.count(_._2 == 0L) === 4 && w1.size === 16,
      s"one walker per vertex x 4 steps expected: ${w1.size}")
    assert(w1.filter(_._2 == 0L).forall(r => r._1 == r._3),
      "step 0 must be the walker's seed vertex")
    val adj = Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L), (4L, 1L), (1L, 4L), (1L, 3L), (3L, 1L))
    val byWalker = w1.groupBy(_._1).values
    byWalker.foreach { traj =>
      traj.sortBy(_._2).sliding(2).foreach {
        case Seq((_, _, a), (_, _, b)) =>
          assert(adj.contains((a, b)),
            s"transition $a -> $b is not an edge")
        case _ =>
      }
    }
  }

  test("walks: different salts diverge (the choice really is " +
      "hash-driven, not positional)") {
    val edges = (1L to 20L).flatMap(i =>
      Seq((i, i % 20 + 1), (i, (i + 4) % 20 + 1))).toDF("s", "d")
    val a = Graph.deterministicWalks(edges, "s", "d", 4, salt = "s1")
      .orderBy("walker", "step").as[(Long, Long, Long)].collect().toSeq
    val b = Graph.deterministicWalks(edges, "s", "d", 4, salt = "s2")
      .orderBy("walker", "step").as[(Long, Long, Long)].collect().toSeq
    assert(a !== b, "distinct salts should pick different neighbors")
  }

  // ---- centroidStats ------------------------------------------------

  test("centroidStats: stats(B u D) equals stats(B) cell-wise-added " +
      "to stats(D) under fixed centroids (the mergeability contract)") {
    val emb = Tables.embeddings(spark, sfDir)
    val sk = Similarity.quantizeInt8(emb).localCheckpoint()
    val base = sk.where(col("vec_id") % 3 =!= 0)
    val delta = sk.where(col("vec_id") % 3 === 0)
    val cent = Similarity.kmeansInt8(base, k = 4, iters = 1).centroids
    val whole = Similarity.centroidStats(sk, cent)
      .select(col("cell"), col("d"), col("s"), col("n"))
    val merged = Similarity.centroidStats(base, cent)
      .select(col("cell"), col("d"), col("s").as("s1"),
        col("n").as("n1"))
      .join(Similarity.centroidStats(delta, cent)
          .select(col("cell"), col("d"), col("s").as("s2"),
            col("n").as("n2")),
        Seq("cell", "d"), "full_outer")
      .select(col("cell"), col("d"),
        (coalesce(col("s1"), lit(0L)) + coalesce(col("s2"), lit(0L)))
          .as("s"),
        (coalesce(col("n1"), lit(0L)) + coalesce(col("n2"), lit(0L)))
          .as("n"))
    assert(whole.exceptAll(merged).isEmpty &&
      merged.exceptAll(whole).isEmpty,
      "merge identity violated: stats(B u D) != stats(B) + stats(D)")
  }

  // ---- phash64 / hammingNearDup -------------------------------------

  test("phash64: hand-computed sign pattern — blocks above the mean " +
      "set their bit, identical payloads collide, one edit flips few") {
    val lo = "a" * 32
    val df = Seq(
      (1L, lo + "z" * 32), // exactly 64 bytes: byte i IS block i
      (2L, lo + "z" * 32),
      (3L, lo + "z" * 31 + "a") // last byte drops below the mean
    ).toDF("media_id", "text")
      .withColumn("payload", encode(col("text"), "UTF-8"))
    val fp = Multimodal.phash64(df, "payload", "fp")
      .select("media_id", "fp").as[(Long, Long)].collect()
      .toMap
    // 'a'=97 < mean=109.5 < 'z'=122: exactly blocks 32..63 (the z
    // half) exceed the mean, so fp = bits 32..63 set.
    val expectHi = (32 to 63).map {
      case 63 => Long.MinValue
      case b  => 1L << b
    }.sum
    assert(fp(1L) === expectHi, f"fp(1) = ${fp(1L)}%x != $expectHi%x")
    assert(fp(1L) === fp(2L), "identical payloads must collide")
    // doc 3: block 63 falls to 97 < mean 6983/64 — ONLY bit 63 flips
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) === 1,
      f"one-byte edit should flip exactly bit 63: ${fp(3L)}%x")
  }

  test("hammingNearDup: distance <= 3 is ALWAYS found (pigeonhole); a " +
      "distance-4 pair spread one-bit-per-band is correctly missed") {
    // crafted fingerprints, fed straight to the band join
    val base = 0x0123456789abcdefL
    val d3 = base ^ 0x7L               // 3 bits, all in band 0
    val d4 = base ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48))
    val fps = Seq((1L, base), (2L, d3), (3L, d4))
      .toDF("media_id", "fp")
    val pairs = Multimodal.hammingNearDup(fps, "media_id", "fp")
      .select("a", "b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(pairs.contains((1L, 2L, 3L)),
      s"distance-3 pair must be found: $pairs")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 3L),
      "distance-4 pair with all four bands touched is outside the " +
        s"guarantee and must not appear at maxHamming=3: $pairs")
  }

  // ---- boruvkaMaxForest ---------------------------------------------

  test("boruvka: triangle keeps its two strongest edges; a " +
      "two-component graph yields one forest per component") {
    val tri = Seq((1L, 2L, 10L), (2L, 3L, 20L), (1L, 3L, 30L),
      (7L, 8L, 5L)).toDF("lo", "hi", "w")
    val got = Graph.boruvkaMaxForest(tri, "lo", "hi", "w", rounds = 2)
      .orderBy("lo", "hi").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 3L, 30L), (2L, 3L, 20L), (7L, 8L, 5L)),
      s"max spanning forest wrong: $got")
  }

  test("boruvka: equal weights break by (lo, hi) ascending — the " +
      "trajectory is deterministic") {
    val sq = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L), (1L, 4L, 5L))
      .toDF("lo", "hi", "w")
    val a = Graph.boruvkaMaxForest(sq, "lo", "hi", "w", rounds = 2)
      .orderBy("lo", "hi").as[(Long, Long, Long)].collect().toSeq
    val b = Graph.boruvkaMaxForest(sq, "lo", "hi", "w", rounds = 2)
      .orderBy("lo", "hi").as[(Long, Long, Long)].collect().toSeq
    assert(a === b, "re-run diverged")
    // 4-cycle, all weights equal: every vertex picks its smallest
    // (lo, hi) incident edge; 3 distinct edges span the cycle
    assert(a.size === 3 && a.forall(_._3 == 5L),
      s"expected a 3-edge spanning tree of the square: $a")
  }

  test("boruvka: the chosen forest is acyclic and spans each " +
      "connected component within log2(V) rounds") {
    val edges = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("g"), col("l_partkey").as("p"))
      .distinct()
    val we = edges.select(col("g"), col("p").as("lo"))
      .join(edges.select(col("g"), col("p").as("hi")), "g")
      .where(col("lo") < col("hi"))
      .groupBy("lo", "hi").agg(count(lit(1)).as("w"))
      .where(col("w") >= 2)
      .localCheckpoint()
    val forest = Graph.boruvkaMaxForest(we, "lo", "hi", "w", rounds = 10)
    val nEdges = forest.count()
    val verts = we.select(explode(array(col("lo"), col("hi"))).as("v"))
      .distinct()
    val nVerts = verts.count()
    val nComp = graft.ops.Cluster.connectedComponents(
        verts, "v", we, "lo", "hi")
      .select("cluster").distinct().count()
    // spanning forest: |E| = |V| - #components (acyclic AND spanning)
    assert(nEdges === nVerts - nComp,
      s"forest edges $nEdges != $nVerts - $nComp")
  }

  // ---- dq_rate_drift ------------------------------------------------

  test("rate drift: a category present only in the delta slice flags; " +
      "a proportionally-stable one does not") {
    // base: 90 x, 10 y (T_b=100); delta: 45 x, 5 y, 6 z (T_d=56) —
    // x drops 90% → 80.4% (9.6 pp, under the 10 pp gate), y holds
    // within 1.1 pp, z appears at 10.7% from nothing (over the gate):
    // 10·|45·100−90·56| = 5400 ≤ 5600 = T_b·T_d but 10·|6·100−0| = 6000
    val rows = Seq.fill(90)(("x", false)) ++ Seq.fill(10)(("y", false)) ++
      Seq.fill(45)(("x", true)) ++ Seq.fill(5)(("y", true)) ++
      Seq.fill(6)(("z", true))
    val df = rows.toDF("cat", "isnew")
    val c = df.groupBy("cat").agg(
      sum(when(!col("isnew"), 1L).otherwise(0L)).as("n_base"),
      sum(when(col("isnew"), 1L).otherwise(0L)).as("n_delta"))
    val t = c.agg(sum("n_base").as("tb"), sum("n_delta").as("td"))
    val got = c.crossJoin(broadcast(t))
      .withColumn("drifted",
        lit(10L).cast("decimal(38,0)") *
          abs(col("n_delta").cast("decimal(38,0)") * col("tb") -
            col("n_base").cast("decimal(38,0)") * col("td")) >
          col("tb").cast("decimal(38,0)") * col("td"))
      .select("cat", "drifted").as[(String, Boolean)].collect().toMap
    assert(got === Map("x" -> false, "y" -> false, "z" -> true),
      s"drift verdicts wrong: $got")
  }

  // ---- bm25 index/merge/serve ---------------------------------------

  test("bm25: serve over merged slice indexes equals the one-shot " +
      "scan-and-score — the statistics really are additive") {
    val docs = Tables.documents(spark, sfDir)
    val q = Seq((1L, "the"), (1L, "data"), (2L, "dup"))
      .toDF("query_id", "term")
    val whole = Retrieval.bm25TopK(docs, "doc_id", "text", q, k = 5)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val isNew = col("doc_id") % 3 === 0
    val merged = Retrieval.bm25Serve(
        Retrieval.bm25Merge(
          Retrieval.bm25Index(docs.where(!isNew), "doc_id", "text"),
          Retrieval.bm25Index(docs.where(isNew), "doc_id", "text")),
        q, k = 5)
      .orderBy("query_id", "rnk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(whole === merged,
      "merged incremental index diverged from the full rebuild")
  }

  // ---- bpeApplyMerges -----------------------------------------------

  test("bpe apply: replaying the merge table reproduces the training " +
      "vocab's segmentation; unseen words fall back to char pieces") {
    import spark.implicits._
    val docs = Seq("low low low lower newest newest").toDF("text")
    val bpe = TextOps.bpeTrainMerges(docs, "text", rounds = 3)
    val trainedSeg = bpe.vocab.select("word", "seg")
      .as[(String, String)].collect().toMap
    val applied = TextOps.bpeApplyMerges(
        Seq("low", "lower", "newest", "zzz").toDF("word"),
        bpe.merges, rounds = 3)
      .as[(String, String)].collect().toMap
    Seq("low", "lower", "newest").foreach { w =>
      assert(applied(w) === trainedSeg(w),
        s"apply($w) = ${applied(w)} != trained ${trainedSeg(w)}")
    }
    // 'zzz' shares no trained merge: stays fully char-segmented
    assert(applied("zzz") === " z z z ",
      s"unseen word must stay char pieces: '${applied("zzz")}'")
  }
}
