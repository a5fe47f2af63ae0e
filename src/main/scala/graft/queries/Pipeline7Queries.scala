package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Fixtures._

/** Round-7 additions: the scale-safe sketch twins of the exact rank
  * stats (GK-bound clamping / boundaries — the 100 TB graduation path
  * for `agg_winsorize`/`agg_equidepth`), the embedding-statistics pair
  * (integer Gram matrix + per-dimension profile over the int8 sketch —
  * the whitening/PCA-prep accumulation a training pipeline runs before
  * projecting embeddings), and the watermark-finalized streaming SESSION
  * windows (the merging-state-store shape `stream_win_final`'s fixed
  * tumbling windows never exercise).
  */
object Pipeline7Queries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(

    "emb_gram_int8" -> ((s, dir) => {
      // exact integer Gram matrix over the stored int8 sketch: the
      // covariance accumulation of embedding whitening/PCA, exact under
      // ANY partition merge order (integer sums), so the full d(d+1)/2
      // triangle hash-matches DuckDB. The pair blow-up never reaches the
      // shuffle: hash partial agg collapses each partition to d(d+1)/2
      // longs map-side (the plan's Partial HashAggregate), the exchange
      // carries O(partitions·d²) rows regardless of corpus size.
      graft.ops.Similarity.gramInt8(
          graft.ops.Similarity.quantizeInt8(Tables.embeddings(s, dir)))
        .orderBy("i", "j")
    }),

    "emb_dim_stats" -> ((s, dir) => {
      // per-dimension profile of the same sketch (count / sum / min /
      // max per dim): the mean-vector side of covariance and the
      // feature-scaling sanity probe. d rows out, partial-agg'd.
      graft.ops.Similarity.dimStatsInt8(
          graft.ops.Similarity.quantizeInt8(Tables.embeddings(s, dir)))
        .orderBy("i")
    }),

    "stream_session_final" -> ((s, dir) => {
      // watermark-FINALIZED session windows per user, run as a real
      // Structured Streaming query: session_window is the MERGING state
      // store (rows extend/merge open sessions; tumbling windows only
      // ever append) — the one streaming aggregation shape
      // stream_win_final doesn't reach. Append mode emits a session only
      // once the watermark passes its end (last event + 30 min gap), so
      // every emitted row is final; the oracle is the batch gap
      // sessionization (win_session's exact SQL) restricted to sessions
      // the final watermark (max event time − 1h) closed. Multi-batch
      // drains in-contract per StreamDrains / StreamSplitDrainSpec.
      StreamDrains.drain(s,
          StreamDrains.sessionFinalPipeline(
            Pipeline6Queries.eventsStream(s, dir)), "append", "ssf")
        .orderBy("user_id", "session_start_ms")
    }),

    "txt_lm_coverage" -> ((s, dir) => {
      // bigram language-model coverage — the cheap fluency/quality
      // signal (CCNet's LM-perplexity stage, integer-exact shape):
      // "train" = corpus bigram counts → top-500 table; "score" = per
      // doc, how many of its bigram tokens land in the table. All
      // integers, so unlike a real log-prob score it hash-matches
      // DuckDB exactly.
      //   Scale: the bigram count is explode → partial-agg'd groupBy
      // (repeats collapse map-side); the top-500 cut is orderBy+limit —
      // TakeOrderedAndProject, per-partition top-k, NO global sort (the
      // vocabulary² count table never serializes into one task); the
      // model table is dim-sized and BROADCAST into a semi-join the
      // corpus streams through. Ties at the cut break by bigram text,
      // so the model is deterministic in both engines.
      import graft.ops.TextOps
      val docs = Tables.documents(s, dir)
      val bi = docs.select(col("doc_id"),
        explode(TextOps.bigrams(col("text"))).as("b"))
      val top = bi.groupBy("b").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("b").asc).limit(500)
        .select("b")
      val cov = bi.join(broadcast(top), Seq("b"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_cov"))
      docs.select(col("doc_id"),
          size(TextOps.bigrams(col("text"))).cast("long").as("n_bi"))
        .join(cov, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_bi"),
          coalesce(col("n_cov"), lit(0L)).as("n_cov"))
        .orderBy("doc_id")
    }),

    "agg_winsorize_approx" -> ((s, dir) => {
      // GK-sketch winsorize twin of agg_winsorize: clamp each group's
      // prices at approx_percentile(0.05/0.95, accuracy=1000) instead of
      // the exact window ranks. The sketch is a TRUE partial aggregate
      // (mergeable per partition, no per-group total-order task), so this
      // form scales with the cluster where the exact form serializes each
      // group into one sort task (7.0× at the sf1 decade) — graduate to
      // THIS at 100 TB, keep agg_winsorize as the exact oracle anchor.
      // The clamp values are sketch-dependent, so (like approx_percentile
      // / approx_distinct) the graded output is the deterministic
      // INVARIANT, not the values: GK at accuracy=1000 bounds rank error
      // by ±0.1%, graded with 50× headroom at ±5 percentile points —
      //   ok_lo/ok_hi: the clipped-tail fractions stay within target+5pts
      //     (exact integer counts vs the returned clamp element);
      //   ok_sum: n·lo ≤ Σ clamp(pc, lo, hi) ≤ n·hi with lo ≤ hi — the
      //     clamp algebra itself, violated by any lo/hi ordering bug or
      //     overflow in the summed cents.
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), cents("l_extendedprice").as("pc"))
      val bounds = li.groupBy("l_returnflag")
        .agg(expr("approx_percentile(pc, array(0.05, 0.95), 1000)")
          .as("b"))
        .select(col("l_returnflag").as("rf"),
          element_at(col("b"), 1).as("lo"),
          element_at(col("b"), 2).as("hi"))
      def tailOk(cnt: Column, n: Column, targetPct: Int) =
        cnt * 100 <= n * (targetPct + 5)
      li.join(broadcast(bounds), li("l_returnflag") === bounds("rf"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("pc") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("pc") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
          sum(least(greatest(col("pc"), col("lo")), col("hi")))
            .as("sum_wins"),
          first(col("lo")).as("lo"), first(col("hi")).as("hi"))
        .select(col("l_returnflag"), col("n"),
          tailOk(col("n_lo"), col("n"), 5).as("ok_lo"),
          tailOk(col("n_hi"), col("n"), 5).as("ok_hi"),
          (col("lo") <= col("hi") && col("n") * col("lo") <= col("sum_wins")
            && col("sum_wins") <= col("n") * col("hi")).as("ok_sum"))
        .orderBy("l_returnflag")
    }),

    "agg_equidepth_approx" -> ((s, dir) => {
      // GK-sketch equi-depth twin of agg_equidepth (the other one-task
      // exact rank stat): bucket boundaries from approx_percentile at
      // the 1/8..7/8 ranks — a mergeable partial aggregate — then each
      // row buckets by counting boundaries ≤ its price against the
      // broadcast 7-element array; no per-group total-order task
      // anywhere. Graded invariant (GK rank error ±0.1% at
      // accuracy=1000, graded at ±5 percentile points): every bucket
      // holds 12.5% ± 5pts of its group — cnt·1000 ∈ [n·75, n·175],
      // exact integer cross-multiplication. All 8 buckets of all 3
      // groups must be present and TRUE, so an empty or overfull bucket
      // fails rows/hash, not just a flag.
      val li = Tables.lineitem(s, dir)
        .select(col("l_returnflag"), cents("l_extendedprice").as("pc"))
      val qs = (1 to 7).map(_ / 8.0).mkString(", ")
      val bounds = li.groupBy("l_returnflag")
        .agg(expr(s"approx_percentile(pc, array($qs), 1000)").as("b"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag").as("rf"), col("b"), col("n"))
      li.join(broadcast(bounds), li("l_returnflag") === bounds("rf"))
        .select(col("l_returnflag"), col("n"),
          (size(filter(col("b"), x => x <= col("pc"))) + 1)
            .cast("long").as("bucket"))
        .groupBy("l_returnflag", "bucket", "n")
        .agg(count(lit(1)).as("cnt"))
        .select(col("l_returnflag"), col("bucket"),
          (col("cnt") * 1000 >= col("n") * 75 &&
            col("cnt") * 1000 <= col("n") * 175).as("ok_frac"))
        .orderBy("l_returnflag", "bucket")
    })
  )

  /** The int8 quantizer CTEs, shared with Pipeline6's quantizedTopkOracle
    * convention: floor-based (IEEE-identical across engines), zero/NaN
    * vectors fenced on the max-abs BEFORE floor. */
  private[queries] val quantCtes: String =
    """mx AS (SELECT vec_id, embedding,
      |  CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
      |    AS ma FROM embeddings),
      |qq AS (SELECT vec_id,
      |  list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 127 / ma) AS BIGINT)) AS qv
      |  FROM mx WHERE ma > 0 AND NOT isnan(ma))""".stripMargin

  val oracles: Map[String, String] = Map(

    "emb_gram_int8" ->
      // 1-based dim indices; qv[i] is DuckDB's 1-based list index. The
      // fixtures' embedding width is 64 at every SF (TESTDATA.md).
      s"""WITH $quantCtes,
        |idx AS (SELECT CAST(ii AS BIGINT) AS i
        |        FROM unnest(range(1, 65)) AS t(ii))
        |SELECT a.i AS i, b.i AS j,
        |  CAST(SUM(qv[a.i] * qv[b.i]) AS BIGINT) AS gram,
        |  COUNT(*) AS n
        |FROM qq, idx a, idx b
        |WHERE b.i >= a.i
        |GROUP BY a.i, b.i
        |ORDER BY i, j""".stripMargin,

    "emb_dim_stats" ->
      s"""WITH $quantCtes,
        |idx AS (SELECT CAST(ii AS BIGINT) AS i
        |        FROM unnest(range(1, 65)) AS t(ii))
        |SELECT i, COUNT(*) AS n, CAST(SUM(qv[i]) AS BIGINT) AS s,
        |  MIN(qv[i]) AS q_min, MAX(qv[i]) AS q_max
        |FROM qq, idx
        |GROUP BY i ORDER BY i""".stripMargin,

    "stream_session_final" ->
      // win_session's exact gap sessionization + the finalization cut:
      // session end (max ms + gap) <= final watermark (max ms − 1h)
      """WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
        |m AS (SELECT user_id, ms,
        |  CASE WHEN ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms)
        |         >= 1800000
        |       OR LAG(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
        |       THEN 1 ELSE 0 END AS brk FROM e),
        |sn AS (SELECT user_id, ms,
        |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ms
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM m),
        |sess AS (SELECT user_id, MIN(ms) AS session_start_ms,
        |    MAX(ms) + 1800000 AS send, COUNT(*) AS n_events
        |  FROM sn GROUP BY user_id, sid)
        |SELECT user_id, session_start_ms, n_events FROM sess
        |WHERE send <= (SELECT MAX(ms) - 3600000 FROM e)
        |ORDER BY user_id, session_start_ms""".stripMargin,

    "txt_lm_coverage" ->
      // same bigram construction as TextOps.bigrams (1-based ws[i]);
      // docs with < 2 tokens contribute no bigrams and score (n_bi=0,
      // n_cov=0). The top-500 cut orders (count DESC, bigram ASC) —
      // deterministic at the boundary in both engines.
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |bi AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
        |    THEN list_transform(range(1, len(ws)),
        |         i -> ws[i] || '_' || ws[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END) AS b FROM t),
        |top AS (SELECT b FROM (
        |  SELECT b, COUNT(*) AS c FROM bi GROUP BY b
        |  ORDER BY c DESC, b ASC LIMIT 500)),
        |cov AS (SELECT doc_id, COUNT(*) AS n_cov FROM bi
        |  WHERE b IN (SELECT b FROM top) GROUP BY doc_id)
        |SELECT t.doc_id,
        |  CAST(GREATEST(len(ws) - 1, 0) AS BIGINT) AS n_bi,
        |  COALESCE(cov.n_cov, CAST(0 AS BIGINT)) AS n_cov
        |FROM t LEFT JOIN cov ON t.doc_id = cov.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    "agg_winsorize_approx" ->
      // the invariants hold for ANY partition merge order of the GK
      // sketch, so the oracle is the exact group counts + TRUE flags
      """SELECT l_returnflag, COUNT(*) AS n,
        |  TRUE AS ok_lo, TRUE AS ok_hi, TRUE AS ok_sum
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "agg_equidepth_approx" ->
      // every (group, bucket 1..8) row must exist with its invariant
      // green — the oracle enumerates the full grid
      """SELECT g.l_returnflag, CAST(b.b AS BIGINT) AS bucket,
        |  TRUE AS ok_frac
        |FROM (SELECT DISTINCT l_returnflag FROM lineitem) g,
        |  unnest(range(1, 9)) AS b(b)
        |ORDER BY l_returnflag, bucket""".stripMargin
  )
}
