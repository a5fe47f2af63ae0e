package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps

/** Greedy maximum-coverage selection (Nemhauser–Wolsey–Fisher 1978:
  * the (1−1/e)-approximate greedy for submodular coverage) — the
  * data-selection shape behind "pick k documents that together cover
  * the most vocabulary/topics/behaviors": each round takes the item
  * whose elements add the most NOT-yet-covered mass. The classic
  * curation complement to dedup — dedup removes redundancy pairwise,
  * coverage selection buys diversity globally.
  *
  * Distributed shape per round: one anti-join of the (item, elem)
  * incidence against the covered set (keyed on elem), one count
  * aggregate, and a 1-row argmax — never a per-item set materialization
  * on the driver. The covered set and the incidence are the only big
  * frames, both partitioned on elem; `k` is small by construction
  * (you select a handful, not a corpus), so the unrolled round count
  * is the MMR/Borůvka regime. Rounds stop early (loudly counted in
  * the output) when nothing new can be covered.
  */
object Selection {

  /** @param pairs incidence rows; duplicates tolerated (distinct'd)
    * @return (rnk, item, gain) — rnk 1..≤k in pick order; gain =
    *         newly-covered element count, strictly positive and
    *         non-increasing (submodularity, spec-pinned)
    */
  def greedyMaxCoverage(pairs: DataFrame, itemCol: String,
                        elemCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // the LIVE incidence (uncovered elements only) shrinks
    // monotonically: removing the winner's elements also removes every
    // row of the winner itself, so chosen items can never re-win and
    // no accumulated covered-set or chosen-item anti-join is needed —
    // each round is one count over a strictly smaller frame.
    var live = pairs.select(col(itemCol).as("item"),
        col(elemCol).as("elem"))
      .distinct().pin()
    var chosen: DataFrame = null
    var r = 1
    var done = false
    while (r <= k && !done) {
      val gains = live.groupBy("item").agg(count(lit(1)).as("gain"))
      // 1-row argmax by (gain desc, item asc) — a hash aggregate,
      // never a global sort (the label-prop argmax rule)
      val winner = gains
        .agg(min(struct((-col("gain")).as("ng"), col("item").as("item")))
          .as("m"))
        .select(col("m.item").as("item"), (-col("m.ng")).as("gain"),
          lit(r.toLong).as("rnk"))
        .where(col("item").isNotNull)
        .pin()
      done = winner.isEmpty // nothing uncovered remains: stop early
      if (!done) {
        chosen = if (chosen == null) winner
          else chosen.unionByName(winner).pin()
        val newCov = live.join(winner.select("item"), Seq("item"))
          .select("elem")
        live = live.join(newCov, Seq("elem"), "left_anti")
          .pin()
      }
      r += 1
    }
    chosen.select("rnk", "item", "gain")
  }
}
