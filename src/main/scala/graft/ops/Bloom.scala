package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.expr.GraftFunctions

/** Runtime Bloom-filter join pruning — the explicit, caller-controlled
  * form of Spark's own `InjectRuntimeFilter` rule (which Catalyst only
  * fires under size/selectivity heuristics). The dim side's join keys are
  * folded into a ~100 KB bloom sketch; the sketch pre-filters the fact
  * side BEFORE its shuffle, and an exact semi-join removes the false
  * positives — so the result is exactly `fact ⋉ dim`, while the shuffle
  * carries only ~matching fact rows plus an fpp-sized sliver.
  *
  * At 100 TB this is the difference between shuffling the full fact table
  * and shuffling ~the join's output: the bloom test is a codegen'd
  * xxhash64 + bit probes evaluated inside the scan's WholeStageCodegen
  * stage, upstream of the exchange.
  */
object Bloom {

  /** Build the dim-side key bloom. The sketch is aggregated distributed
    * (partial blooms merged by OR) and only the final ~KB..MB binary is
    * held at the driver — the same materialization point Spark's runtime
    * filter uses for its scalar-subquery result. */
  def keyBloom(dim: DataFrame, keyCol: String,
               expectedItems: Long): Array[Byte] = {
    GraftFunctions.register(dim.sparkSession)
    dim.select(GraftFunctions.bloom_agg(col(keyCol), lit(expectedItems))
        .as("bf"))
      .head.getAs[Array[Byte]]("bf")
  }

  /** Exact `fact ⋉ dim` with a bloom pre-filter on the fact side. The
    * filter is embedded as a binary literal, so every executor evaluates
    * it scan-side with zero extra shuffles or broadcasts. */
  def prunedSemiJoin(fact: DataFrame, factKey: String,
                     dim: DataFrame, dimKey: String,
                     expectedItems: Long = 1000000L): DataFrame = {
    // xxhash64 hashes int and long (etc.) through different byte widths:
    // with mismatched key types the build and probe hashes disagree and
    // the pre-filter would drop genuinely matching rows. The semi-join
    // below would mask nothing — it only ever removes rows. Spark's own
    // InjectRuntimeFilter hashes the SAME resolved join-key expression on
    // both sides; this explicit form demands the caller align types.
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    require(ft == dt,
      s"bloom key types must match exactly: $factKey is ${ft.catalogString}, " +
        s"$dimKey is ${dt.catalogString} — cast one side first")
    val bf = keyBloom(dim, dimKey, expectedItems)
    GraftFunctions.register(fact.sparkSession)
    // an empty dim yields a null sketch (bloom_agg over zero rows);
    // might_contain(lit(null), …) happens to work today but is fragile —
    // short-circuit to the exact empty result instead
    val pre =
      if (bf == null) fact.where(lit(false))
      else fact.where(GraftFunctions.might_contain(lit(bf), col(factKey)))
    pre.join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }
}
