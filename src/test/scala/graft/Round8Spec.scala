package graft

import org.apache.spark.sql.functions._

/** Round-7 batch-2 operators: greedy MMR re-ranking, integer PageRank,
  * co-occurrence top-k — behavioral properties the parquet oracle can't
  * see (diversity demotion, mass conservation, partitioning invariance).
  */
class Round8Spec extends SparkSuite {
  import spark.implicits._

  // ---- mmrRerank -----------------------------------------------------

  /** Hand-built embedding frame: probe 0 plus two near-identical vectors
    * (1, 2) and one diverse vector (3). Max-abs int8 quantization maps
    * every candidate's lead component to 127, so all three tie on
    * integer relevance (16129) and the DIVERSITY term alone must decide
    * ranks 2-3: sim(2,1) = 16779 > sim(3,1) = 16129 ⇒ 3 outranks 2. */
  private def mmrFixture = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // probe
    (1L, Array(1.0f, 0.20f, 0.0f, 0.0f)),  // q = [127, 25, 0, 0]
    (2L, Array(1.0f, 0.21f, 0.0f, 0.0f)),  // q = [127, 26, 0, 0] near-dup
    (3L, Array(0.9f, 0.0f, 0.9f, 0.0f))    // q = [127, 0, 127, 0] diverse
  ).toDF("vec_id", "embedding")

  test("mmrRerank demotes the near-duplicate below the diverse candidate") {
    val emb = mmrFixture
    val out = graft.ops.Similarity
      .mmrRerank(emb, emb.where($"vec_id" === 0L), cands = 3, k = 3)
      .orderBy("rnk")
      .select($"neighbor_id")
      .as[Long].collect().toSeq
    // step 1: three-way relevance tie → smallest id 1; step 2: the
    // diversity penalty against 1 is lower for 3 than for 1's near-copy
    // 2 (16129 < 16779) → 3; step 3: 2 last
    assert(out === Seq(1L, 3L, 2L), s"greedy order was $out")
  }

  test("mmrRerank with wDiv=0 degenerates to relevance order and " +
      "emits exactly k rows per probe") {
    val emb = mmrFixture
    val out = graft.ops.Similarity
      .mmrRerank(emb, emb.where($"vec_id" === 0L), cands = 3, k = 3,
        wRel = 1L, wDiv = 0L)
      .orderBy("rnk").select($"neighbor_id").as[Long].collect().toSeq
    // all three tie on integer relevance → pure id order, no demotion
    assert(out === Seq(1L, 2L, 3L), s"relevance-only order was $out")
    val full = graft.ops.Similarity.mmrRerank(
      Tables.embeddings(spark, sfDir),
      Tables.embeddings(spark, sfDir).where($"vec_id" % 50 === 0),
      cands = 20, k = 8)
    val counts = full.groupBy("query_id").count()
      .select($"count").distinct().as[Long].collect().toSeq
    assert(counts === Seq(8L), s"per-probe row counts: $counts")
  }

  // ---- pageRankInt ---------------------------------------------------

  test("pageRankInt conserves mass on a symmetric graph up to integer " +
      "truncation and ranks the star center above its leaves") {
    // star: center 0 — leaves 1..10, symmetrized
    // odd iteration count: a bipartite star oscillates, and odd rounds
    // are the ones where the hub holds the mass
    val e0 = (1 to 10).map(i => (0L, i.toLong)).toDF("src", "dst")
    val edges = e0.union(e0.select($"dst", $"src"))
    val scale = 1000000000000L
    val pr = graft.ops.Graph.pageRankInt(edges, "src", "dst",
      iters = 5, scale = scale).localCheckpoint()
    val n = 11L
    val total = pr.agg(sum("pr")).as[Long].head()
    // deficit recurrence δ_t < 0.85·δ_{t-1} + E + N (contribution
    // truncation < 1/edge, damp truncation < 1/vertex) — geometric sum
    // bounded by iters·(E+N)
    val leakBound = 5L * (20L + n + 1L)
    assert(total <= n * scale, s"mass created: $total > ${n * scale}")
    assert(total >= n * scale - leakBound,
      s"mass lost beyond truncation bound: ${n * scale - total}")
    val center = pr.where($"node" === 0L).select($"pr").as[Long].head()
    val leafMax = pr.where($"node" =!= 0L).agg(max("pr")).as[Long].head()
    assert(center > leafMax * 5,
      s"star center $center not dominant over leaves $leafMax")
  }

  test("pageRankInt is invariant to input partitioning (integer sums " +
      "commute across any merge order)") {
    val e0 = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Graph.pageRankInt(df, "src", "dst", iters = 2)
        .orderBy("node").collect().toSeq
    assert(run(edges) === run(edges.repartition(13)),
      "result depends on partitioning")
  }

  test("pageRankInt drops dangling mass but still pays base rank to " +
      "every vertex") {
    // 1 -> 2 (2 dangles): 2 keeps receiving, emits nothing
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val pr = graft.ops.Graph.pageRankInt(edges, "src", "dst", iters = 3)
    val rows = pr.orderBy("node").as[(Long, Long)].collect().toSeq
    assert(rows.map(_._1) === Seq(1L, 2L))
    val base = 15L * 1000000000000L / 100L
    assert(rows.forall(_._2 >= base), s"vertex below base rank: $rows")
    assert(rows(1)._2 > rows(0)._2, "receiver not above pure-base emitter")
  }

  test("personalizedPageRankInt with seeds = all vertices is identical " +
      "to pageRankInt") {
    val e0 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("src", "dst")
    val edges = e0.union(e0.select($"dst", $"src"))
    val allNodes = edges.select($"src".as("node"))
      .union(edges.select($"dst".as("node"))).distinct()
    val uniform = graft.ops.Graph
      .pageRankInt(edges, "src", "dst", iters = 3)
      .orderBy("node").collect().toSeq
    val ppr = graft.ops.Graph
      .personalizedPageRankInt(edges, "src", "dst", allNodes, "node",
        iters = 3)
      .orderBy("node").collect().toSeq
    assert(uniform === ppr)
  }

  test("personalizedPageRankInt: mass stays within iters hops of the " +
      "seed and decays with distance") {
    // symmetrized path 1-2-...-10, seed {1}: after 4 rounds, vertices
    // at distance >= 5 cannot have received anything
    val e0 = (1L to 9L).map(i => (i, i + 1)).toDF("src", "dst")
    val edges = e0.union(e0.select($"dst", $"src"))
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val pr = graft.ops.Graph
      .personalizedPageRankInt(edges, "src", "dst", seeds, "node",
        iters = 4)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert((6L to 10L).forall(pr(_) === 0L),
      s"mass escaped the 4-hop horizon: $pr")
    assert(pr(2L) > pr(4L) && pr(4L) > 0L,
      s"rank must decay with distance from the seed: $pr")
  }

  test("hitsInt: authorities rank by hub endorsement, hubs by the " +
      "authorities they reach, and the result is partitioning-invariant") {
    // hubs 1,2,3 → authorities 10,11,12: 10 ← {1,2}, 11 ← {1,3},
    // 12 ← {1}. So a(10) = a(11) > a(12); hub 1 (reaches everything)
    // outranks hubs 2 and 3.
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (3L, 11L))
      .toDF("src", "dst")
    val out = graft.ops.Graph.hitsInt(edges, "src", "dst", iters = 3)
      .localCheckpoint()
    val auth = out.where($"side" === "auth")
      .select($"node", $"score").as[(Long, Long)].collect().toMap
    val hub = out.where($"side" === "hub")
      .select($"node", $"score").as[(Long, Long)].collect().toMap
    assert(auth(10L) === auth(11L) && auth(10L) > auth(12L),
      s"authority order wrong: $auth")
    assert(hub(1L) > hub(2L) && hub(2L) === hub(3L),
      s"hub order wrong: $hub")
    val rep = graft.ops.Graph
      .hitsInt(edges.repartition(7), "src", "dst", iters = 3)
      .orderBy("side", "node").collect().toSeq
    assert(out.orderBy("side", "node").collect().toSeq === rep,
      "result depends on partitioning")
  }

  test("labelPropagate: seeds stay clamped, plurality ties break to the " +
      "smaller label, unreached vertices stay null") {
    // 1(seed 10) — 3 — 2(seed 20); 3 — 4; 5 — 6 (no labels reachable)
    val e0 = Seq((1L, 3L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("src", "dst")
    val edges = e0.union(e0.select($"dst", $"src"))
    val seeds = Seq((1L, 10L), (2L, 20L)).toDF("node", "lbl")
    val out = graft.ops.Graph
      .labelPropagate(edges, "src", "dst", seeds, "node", "lbl", iters = 2)
      .orderBy("node")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSeq
    // node 3: 1-1 tie between 10 and 20 → smaller label 10; node 4:
    // labeled round 2 via 3; seed 2 keeps 20 despite neighbor pressure;
    // the 5—6 component never sees a label
    assert(out === Seq(1L -> Some(10L), 2L -> Some(20L), 3L -> Some(10L),
      4L -> Some(10L), 5L -> None, 6L -> None), s"got $out")
  }

  // ---- cooccurTopK ---------------------------------------------------

  test("cooccurTopK counts shared groups once per group, ranks by " +
      "(count desc, id asc), and respects k") {
    // baskets: {1,2,3}, {1,2}, {1,2}, {2,3} — with a duplicate (g1,1)
    // row that must NOT inflate the (1,2) count
    val rows = Seq(
      (10L, 1L), (10L, 1L), (10L, 2L), (10L, 3L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 2L),
      (40L, 2L), (40L, 3L)).toDF("g", "it")
    val out = graft.ops.Graph.cooccurTopK(rows, "g", "it", k = 1)
      .orderBy("item")
      .select($"item", $"co_item", $"n_co").as[(Long, Long, Long)]
      .collect().toSeq
    // item 1: top co-item 2 (3 shared baskets); item 2: co-item 1 wins
    // the (count 3 vs count 2) over 3, and id-tie never arises; item 3:
    // co-items 1 (1) and 2 (2) — 2 wins
    assert(out === Seq((1L, 2L, 3L), (2L, 1L, 3L), (3L, 2L, 2L)),
      s"got $out")
    val k2 = graft.ops.Graph.cooccurTopK(rows, "g", "it", k = 2)
    assert(k2.groupBy("item").count().agg(max("count")).as[Long].head() <= 2L)
  }

  test("cooccurTopK maxBasket guard fails LOUDLY naming the offending " +
      "group instead of silently detonating the pair space") {
    val rows = Seq((10L, 1L), (10L, 2L), (10L, 3L), (20L, 1L), (20L, 2L))
      .toDF("g", "it")
    // cap 2: group 10 holds 3 items → the job must fail, not truncate
    val ex = intercept[Exception] {
      graft.ops.Graph.cooccurTopK(rows, "g", "it", k = 1,
        maxBasket = Some(2)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m => m.contains("maxBasket") && m.contains("10")),
      s"error must name the cap and the group: ${msgs(ex)}")
    // under the cap, identical answer to the unguarded call
    val ok = graft.ops.Graph.cooccurTopK(rows, "g", "it", k = 1,
      maxBasket = Some(3)).orderBy("item").collect().toSeq
    val un = graft.ops.Graph.cooccurTopK(rows, "g", "it", k = 1)
      .orderBy("item").collect().toSeq
    assert(ok === un)
  }
}
