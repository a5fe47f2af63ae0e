package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames — the Pregel-ish
  * message rounds a link/citation/co-purchase graph needs beyond the
  * connected components in [[Cluster]] (the reference stops at row
  * identity, `/root/reference/src/lib/client.js:1033`; ranking and
  * co-occurrence over the entity graph are the training-data extension:
  * page importance as a quality prior, co-occurrence as the
  * association/recommender signal).
  *
  * Scale design (100 TB): both operators are edge-list algebra — joins
  * and aggregations keyed on vertex ids, no adjacency materialized per
  * vertex, no driver-side graph. One PageRank round = one join (edges ⋈
  * ranks on src) + one groupBy (dst), both shuffling (long, long) pairs;
  * rounds are a FIXED count, so the whole plan is a statically unrolled
  * DAG the optimizer sees end to end. Edges and degrees are pinned with
  * `localCheckpoint` once — they are re-joined every round, and without
  * the pin each round would re-shuffle the raw input.
  */
object Graph {

  /** Fixed-iteration PageRank in scaled integer arithmetic — every rank
    * is a long in units of 1/`scale`, every step is integer division, so
    * the result is bit-reproducible on any engine and ANY partition
    * merge order (integer sums commute; `a div b` is deterministic),
    * unlike float PageRank whose sums reorder per run.
    *
    * r₀(v) = scale;  rₜ₊₁(v) = (15·scale) div 100
    *                           + (85 · Σ_{u→v} (rₜ(u) div deg(u))) div 100
    *
    * Division truncation leaks a few units of mass per vertex per round
    * — bounded by deg(u) per contribution, irrelevant for ranking at
    * scale = 1e12 — in exchange for exactness of the computed values.
    * Dangling vertices (out-degree 0) keep receiving but stop emitting:
    * their inbound mass is dropped rather than redistributed (the common
    * Pregel simplification). Symmetrize the edge list (or pre-trim
    * danglers) when mass conservation matters.
    *
    * Scale: the per-round join keys both sides on `src` — on a real
    * cluster pre-partition `edges` by src once and every round's
    * exchange is rank-side only (node-count rows, not edge-count). The
    * groupBy(dst) partial-aggregates map-side, so the second shuffle
    * carries at most (partitions × distinct dst) rows. Overflow: with
    * scale = 1e12, 85 · Σ contributions stays under Long.MaxValue up to
    * ~10⁸ vertices per receiving node's in-neighborhood mass — raise
    * headroom by lowering `scale` for billion-node graphs.
    *
    * @param edges directed edge list; duplicate edges count as parallel
    *              edges (dedup upstream if unwanted)
    * @return (node, pr) for every vertex appearing as src or dst
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int, scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(scale >= 100L, "scale must be >= 100 (base term is scale*15/100)")
    val e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint() // re-joined every round: pin the shuffle once
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val base = 15L * scale / 100L
    var r = nodes.select(col("node"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      // contributions: rank/outdeg per out-edge, summed at the receiver.
      // Vertices with in-edges but no contribution this round (all
      // in-neighbors dangling) still get the base term via the left join.
      // (aliases: from round 2 on, r's lineage already contains deg, so
      // unqualified deg("src") would be ambiguous)
      val contrib = r.as("r").join(deg.as("dg"),
          col("r.node") === col("dg.src"))
        .select(col("dg.src").as("src"),
          expr("r.pr div dg.deg").as("c"))
      val msgs = e.join(contrib, "src")
        .groupBy(col("dst").as("node")).agg(sum(col("c")).as("m"))
        .select(col("node"), col("m"))
      r = nodes.join(msgs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr("(85 * coalesce(m, CAST(0 AS BIGINT))) div 100")).as("pr"))
    }
    r
  }

  /** Per-item co-occurrence top-k — "items that appear in the same
    * group": the association / collaborative-filtering primitive (shared
    * baskets, co-cited papers, co-purchased suppliers). For each item,
    * the k strongest co-items by shared-group count, ties broken by
    * co-item id.
    *
    * Scale: the pair space is Σ_g |g|² — bounded by the group-size
    * distribution, NOT the corpus (the same bound every LSH band join in
    * [[DedupText]] lives under). Groups are deduped to (group, item)
    * first so multiplicity inside one group cannot square up; a
    * pathological mega-group (one order containing every item) must be
    * capped or salted UPSTREAM — this operator deliberately does not
    * silently drop data. The pair count partial-aggregates map-side;
    * the top-k is a per-item window over candidate co-items, each item's
    * candidate list already bounded by its co-occurrence breadth.
    *
    * @return (item, co_item, n_co, rnk) with rnk 1..k per item
    */
  def cooccurTopK(rows: DataFrame, groupCol: String, itemCol: String,
                  k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "k must be >= 1")
    val base = rows
      .select(col(groupCol).as("g"), col(itemCol).cast("long").as("it"))
      .where(col("g").isNotNull && col("it").isNotNull)
      .distinct()
    val a = base.select(col("g"), col("it").as("ia"))
    val b = base.select(col("g"), col("it").as("ib"))
    // count each unordered pair once (ia < ib), then emit both
    // directions for the per-item ranking — explode, not a self-union,
    // so the (possibly expensive) pair aggregation runs once
    val pairs = a.join(b, Seq("g"))
      .where(col("ia") < col("ib"))
      .groupBy("ia", "ib").agg(count(lit(1)).as("n_co"))
      .select(explode(array(
        struct(col("ia").as("item"), col("ib").as("co_item"), col("n_co")),
        struct(col("ib").as("item"), col("ia").as("co_item"), col("n_co"))))
        .as("p"))
      .select(col("p.item").as("item"), col("p.co_item").as("co_item"),
        col("p.n_co").as("n_co"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("n_co").desc, col("co_item").asc)
    pairs.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("item"), col("co_item"), col("n_co"),
        col("rnk").cast("long").as("rnk"))
  }
}
