package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity-resolution candidate generation by multi-pass blocking — the
  * record-linkage counterpart of the document dedup family (dd_*): a
  * candidate pair must share at least one BLOCKING KEY (cheap, high-
  * recall derived keys: token + coarse attribute), and only candidates
  * are verified with the expensive pair predicate (edit distance /
  * token overlap). All-pairs never exists: the pair space is
  * Σ_blocks |block|² — the MinHash-LSH banding bound with hand-chosen
  * keys instead of hashed bands.
  *
  * Scale: each pass is one shuffle on its blocking key; skewed blocks
  * are the operational risk, so [[blockedPairs]] takes a loud per-block
  * fence (the cooccurTopK maxBasket contract) rather than silently
  * detonating on a degenerate key.
  */
object Blocking {

  /** The unioned keyed relation — one (__bk, a[, extra]) row per
    * DISTINCT key VALUE a record carries, all key expressions pooled
    * into one relation (so the fence below counts the true block: every
    * record carrying that value, whichever expression produced it).
    * NULL keys never enter; per-record duplicates collapse. */
  private def unionKeyed(df: DataFrame, idCol: String,
                         blockKeys: Seq[Column],
                         extra: Seq[Column]): DataFrame =
    blockKeys.map { k =>
      df.select((k.cast("string").as("__bk") +:
        col(idCol).as("a") +: extra): _*)
    }.reduce(_ unionByName _)
      .where(col("__bk").isNotNull)
      .distinct()

  /** The loud per-block fence over the unioned keyed relation. */
  private def fenced(keyed0: DataFrame,
                     maxBlock: Option[Int]): DataFrame =
    maxBlock match {
      case None => keyed0
      case Some(cap) => keyed0.withColumn("__n",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("__bk"))))
        .withColumn("a", when(col("__n") <= cap, col("a"))
          .otherwise(raise_error(concat(
            lit(s"blockedPairs: block over maxBlock=$cap on value: "),
            col("__bk"))).cast(keyed0.schema("a").dataType.sql)))
        .drop("__n")
    }

  /** Candidate pairs (a < b) sharing ≥ 1 blocking-key VALUE — the
    * key expressions are pooled into ONE relation before the self-join,
    * so a match between DIFFERENT key expressions (record A's key#1
    * equals record B's key#2) blocks the pair too. This is the
    * "sharing ≥ 1 of the blockKeys values" contract the er_* oracles
    * grade (their `k` CTE unions both key columns and joins
    * `a.bk = b.bk`). NULL keys never block; a pair blocked by several
    * values appears once.
    *
    * @param maxBlock loud fail when any single block (all records
    *                 carrying one key value, across expressions)
    *                 exceeds this many rows (quadratic detonation
    *                 guard); None = no fence
    * @return (a, b) distinct id pairs, a < b */
  def blockedPairs(df: DataFrame, idCol: String, blockKeys: Seq[Column],
                   maxBlock: Option[Int] = Some(10000)): DataFrame = {
    require(blockKeys.nonEmpty, "blockedPairs: no blocking keys")
    val keyed = fenced(unionKeyed(df, idCol, blockKeys, Nil), maxBlock)
    val right = keyed.select(col("__bk").as("__bk2"), col("a").as("b"))
    keyed.join(right,
        col("__bk") === col("__bk2") && col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Delta maintenance of [[blockedPairs]] — the blocking identity
    * (the 21st inc_* merge≡rebuild): a candidate pair exists iff its
    * two records share a key value, independent of every other record,
    * so the pair set is MONOTONE in the record set and a batch arrival
    * D against a stored base B adds exactly the pairs touching D:
    * `blockedPairs(B ∪ D) = stored ∪ pairs with ≥ 1 endpoint new`.
    * The stored pair set is reused verbatim; B×B never rescans — the
    * unioned keyed frame joins against itself but keeps only
    * new-touching rows (predicate-pushed before the join output).
    *
    * @param all   B ∪ D
    * @param isNew marks the D rows of `all`
    * @return (a, b) distinct id pairs, a < b — equals
    *         blockedPairs(all) exactly */
  def blockedPairsDelta(all: DataFrame, isNew: Column, idCol: String,
                        blockKeys: Seq[Column], storedPairs: DataFrame,
                        maxBlock: Option[Int] = Some(10000)): DataFrame = {
    require(blockKeys.nonEmpty, "blockedPairsDelta: no blocking keys")
    val keyed = fenced(
      unionKeyed(all, idCol, blockKeys, Seq(isNew.as("__new"))),
      maxBlock)
    val right = keyed.select(col("__bk").as("__bk2"),
      col("a").as("b"), col("__new").as("__new2"))
    keyed.join(right,
        col("__bk") === col("__bk2") && col("a") < col("b") &&
          (col("__new") || col("__new2")))
      .select("a", "b")
      .unionByName(storedPairs.select("a", "b"))
      .distinct()
  }

  /** Verify candidate pairs on their name strings: Levenshtein distance
    * plus distinct-token overlap (intersection / union sizes) — the
    * standard cheap-feature pair vector a linkage rule or model consumes.
    * Joins are id-equi (shuffle-partitionable); the quadratic work never
    * exceeds the candidate set.
    *
    * @return (a, b, lev, n_inter, n_union) */
  def verifyPairs(pairs: DataFrame, df: DataFrame, idCol: String,
                  nameCol: String): DataFrame = {
    val la = df.select(col(idCol).as("a"), col(nameCol).as("__na"))
    val lb = df.select(col(idCol).as("b"), col(nameCol).as("__nb"))
    pairs.join(la, "a").join(lb, "b")
      .withColumn("__ta", array_distinct(split(col("__na"), " ")))
      .withColumn("__tb", array_distinct(split(col("__nb"), " ")))
      .select(col("a"), col("b"),
        levenshtein(col("__na"), col("__nb")).cast("long").as("lev"),
        size(array_intersect(col("__ta"), col("__tb"))).cast("long")
          .as("n_inter"),
        size(array_union(col("__ta"), col("__tb"))).cast("long")
          .as("n_union"))
  }
}
