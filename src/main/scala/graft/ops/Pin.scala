package graft.ops

import org.apache.spark.sql.Dataset

/** Lineage pinning with a cluster-survivable fallback.
  *
  * Iterative operators (Graph, DedupText, Selection, Skyline, Cluster,
  * TextOps…) must truncate lineage every round or the plan grows
  * exponentially. `localCheckpoint()` is the fast primitive — blocks
  * live in executor memory/disk, no distributed filesystem round-trip —
  * but those blocks die with their executor: on a real multi-executor
  * cluster a single lost executor fails the whole iterative job (Spark
  * itself WARNs "checkpoint may not be reliable" on every call).
  *
  * `Pin` is the one switch: when a checkpoint directory is configured
  * (`SparkContext.setCheckpointDir` / `spark.checkpoint.dir` — on a
  * cluster that is HDFS/S3, replicated and executor-loss-proof), pin
  * via reliable `checkpoint()`; otherwise (local development,
  * single-JVM bench — the only mode this sandbox can execute) keep the
  * fast local form. Call sites write `.pin()` and never choose.
  *
  * Both are EAGER (the default of both underlying calls): the pinned
  * plan is computed at the call, so per-round driver loops observe the
  * same execution order in either mode.
  *
  * Checkpoint-store hygiene: Spark never deletes reliable checkpoint
  * files during an application unless
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
  * SparkContext conf — set it BEFORE the context starts). Iterative
  * operators pin once per round, so a long cluster job without that
  * flag steadily fills the HDFS/S3 checkpoint store; set it (or point
  * `spark.checkpoint.dir` at a TTL'd/auto-cleaned path) whenever
  * reliable mode engages.
  */
object Pin {
  /** True when pinning should go through reliable `checkpoint()`.
    * Default: a checkpoint directory is configured on the context.
    * `graft.pin.reliable` (session conf) overrides either way — the
    * escape hatch for A/B-ing the two modes on one session (specs) or
    * forcing fast local pins on a cluster that has a checkpoint dir
    * set for other reasons. */
  def reliable(ds: Dataset[_]): Boolean =
    ds.sparkSession.conf.getOption("graft.pin.reliable") match {
      case Some(v) => v.toBoolean
      case None =>
        ds.sparkSession.sparkContext.getCheckpointDir.isDefined
    }

  def apply[T](ds: Dataset[T]): Dataset[T] =
    if (reliable(ds)) ds.checkpoint() else ds.localCheckpoint()

  /** LAZY pin: marks the plan for checkpointing but defers
    * materialization to the first downstream action — which computes
    * and caches the pinned blocks as a side effect of its own run
    * (RDD `doCheckpoint` recurses through marked ancestors at job
    * end). For a per-round loop frame whose FIRST consumer already
    * scans it fully (a fixpoint count, a 1-row score read, the next
    * round's pin), the eager pin job is a pure extra pass: the same
    * rows are computed either way, but eager pays one more job
    * launch + one more scan per round. Use the lazy form ONLY when
    * such a full-scan consumer provably runs in the same driver step;
    * otherwise the deferred cost lands somewhere surprising
    * (guide §1.2: remove passes, not reorder them). */
  def lazily[T](ds: Dataset[T]): Dataset[T] =
    if (reliable(ds)) ds.checkpoint(eager = false)
    else ds.localCheckpoint(eager = false)

  /** Pin AND drop the inherited size statistics — for ITERATED round
    * functions that reference their pinned input k > 1 times.
    *
    * Checkpointing carries the origin plan's `sizeInBytes` into the
    * pinned leaf, and the size-only estimator MULTIPLIES sizes across
    * joins — so a round function with k references to the previous
    * round's pin grows the estimate's DIGIT COUNT by ×k per round.
    * Harmless at k ≤ 2 (PageRank-style rounds: linear digits), but a
    * join-rich round like the Louvain move (k ≈ 9) reaches million-
    * digit BigIntegers by round ~6 and Catalyst then spends MINUTES of
    * driver CPU per round inside BigInteger.multiply while planning
    * (measured: level-2 rounds 1.5 s → 3.4 s → 43 s → minutes).
    *
    * The public RDD[Row] round-trip rebuilds the leaf without
    * originStats, resetting it to the default estimate — per-round
    * planning cost becomes constant. The price: the leaf looks huge to
    * the optimizer (no auto-broadcast of the pinned frame), which is
    * the correct conservative posture for the data-sized assignment
    * frames this exists for; keep plain [[PinOps.pin]] where real
    * stats should feed broadcast decisions. */
  def resetStats(df: org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.DataFrame = {
    val cp = Pin(df)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** [[resetStats]] over a [[lazily]] pin — same stats reset, same RDD
    * leaf, but materialization rides the round's first full-scan
    * consumer instead of its own job. */
  def resetStatsLazy(df: org.apache.spark.sql.DataFrame)
  : org.apache.spark.sql.DataFrame = {
    val cp = lazily(df)
    cp.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** `df.pin()` — postfix form, drop-in for `.localCheckpoint()`. */
  implicit class PinOps[T](private val ds: Dataset[T]) extends AnyVal {
    def pin(): Dataset[T] = Pin(ds)

    /** Lazy pin ([[Pin.lazily]]) — only where the round's own next
      * action provably full-scans the frame. */
    def pinLazy(): Dataset[T] = Pin.lazily(ds)
  }

  /** `df.pinIter()` — the [[resetStats]] form, for the per-round pin
    * of a join-rich iterated loop. */
  implicit class PinIterOps(private val df: org.apache.spark.sql.DataFrame)
    extends AnyVal {
    def pinIter(): org.apache.spark.sql.DataFrame = resetStats(df)

    /** Lazy [[pinIter]] ([[Pin.resetStatsLazy]]). */
    def pinIterLazy(): org.apache.spark.sql.DataFrame = resetStatsLazy(df)
  }
}
