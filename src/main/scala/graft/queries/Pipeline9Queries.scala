package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps
import graft.Tables
import Fixtures._

/** Round-7 batch 3: exact-integer signal processing and fingerprinting —
  * a truncated EWMA whose value is an exact rational (num/den longs),
  * winnowing document fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
  * algorithm — the local dedup/plagiarism sketch with a guaranteed
  * match window), and hashing-trick feature vectors (Weinberger et al. —
  * fixed-width sparse features with no vocabulary pass).
  */
object Pipeline9Queries {

  type Q = (SparkSession, String) => DataFrame

  /** EWMA taps: weight 2^(Taps-1-j) at lag j — α = 1/2, truncated. */
  private val Taps = 10

  /** Winnowing parameters: K-word grams, window of W gram hashes. */
  private val WinnowK = 3
  private val WinnowW = 4

  /** Unsigned 32-bit Java hash in DuckDB (mirrors Sampling.hu). */
  private def huSql(c: String): String = {
    val jh = PipelineQueries.javaHashSql(c)
    s"""(CASE WHEN $jh < 0 THEN $jh + 4294967296 ELSE $jh END)"""
  }

  val queries: Map[String, Q] = Map(

    "ts_ewma" -> ((s, dir) => {
      // truncated exponentially-weighted moving average per user: the
      // classic α=1/2 EWMA cut at 10 taps, kept EXACT by emitting the
      // rational as (num, den) longs — weight 2^(9-j) on lag j, both
      // sums pure integers, so the graded value is bit-stable where a
      // float EWMA recursion is not. One window pass computes all ten
      // lags (same frame, same sort); ties on ts break by event_id so
      // the lag sequence is deterministic.
      graft.ops.TimeSeries.ewmaExact(
          Tables.events(s, dir)
            .select(col("event_id"), col("user_id"), col("ts_ms"),
              cents("value").as("v")),
          keys = Seq("user_id"),
          order = Seq(col("ts_ms"), col("event_id")),
          valCol = "v", taps = Taps)
        .select(col("event_id"), col("user_id"), col("num"), col("den"))
        .orderBy("event_id")
    }),

    "txt_winnow" -> ((s, dir) => {
      // winnowing fingerprints: hash every positional 3-word gram, then
      // in every window of 4 consecutive gram hashes keep the RIGHTMOST
      // minimum — the standard guarantee (any shared run of W+K-1
      // tokens shares a fingerprint) at ~2/(W+1) sampling density.
      // The rightmost-min-per-window select is ONE window-max pass over
      // an encoded key (hash descending, position ascending packed into
      // a single long: (2³²−1−(h+2³¹))·2²⁰ + pos), then a distinct —
      // no per-window subquery, no self-join explosion. Positions are
      // bounded by 2²⁰ (a million tokens/doc) per the encoding; docs
      // shorter than K+W−1 tokens emit nothing (callers fall back to
      // exact dedup — same contract as the LSH fence).
      graft.ops.TextOps.winnowFingerprints(Tables.documents(s, dir),
          "doc_id", "text", k = WinnowK, w = WinnowW)
        .orderBy("doc_id", "pos")
    }),

    "dd_winnow_pairs" -> ((s, dir) => {
      // winnowing-based near-dup candidates: docs sharing >= 2 distinct
      // fingerprint hashes — the LOCAL complement of MinHash-LSH (long
      // verbatim overlaps are caught deterministically via the winnow
      // guarantee). Pair space keys on the fingerprint hash, bounded by
      // the doc-frequency fence (boilerplate hashes dropped, same
      // contract as shinglesFiltered).
      graft.ops.DedupText.winnowPairs(Tables.documents(s, dir),
          "doc_id", "text")
        .orderBy("a_id", "b_id")
    }),

    "inc_winnow_delta" -> ((s, dir) => {
      // incremental winnow-pair maintenance, end to end: only the delta
      // batch (doc_id % 7 = 0) is fingerprinted; it folds against the
      // STORED base state (fingerprint index + UNfiltered pair counts)
      // with the add/retract algebra — a delta can push a hash over the
      // df fence, which must retract that hash's base-base pair
      // contributions (the reason naive pair-set union is wrong under a
      // fence). Output ≡ full recompute, so the oracle is exactly
      // dd_winnow_pairs' full-corpus SQL. Like inc_cc_delta, the graded
      // query rebuilds the base state inside the timed region; in
      // production that state is persisted and the recurring cost is
      // the delta fold alone.
      import graft.ops.DedupText
      val docs = Tables.documents(s, dir)
      val isDelta = col("doc_id") % 7 === 0
      val baseIdx = DedupText.winnowIndex(docs.where(!isDelta),
        "doc_id", "text", WinnowK, WinnowW)
      val basePairs = DedupText.winnowPairCounts(baseIdx, maxDocFreq = 50)
      DedupText.winnowPairsDelta(baseIdx, basePairs, docs.where(isDelta),
          "doc_id", "text", WinnowK, WinnowW, maxDocFreq = 50)
        .where(col("n_shared") >= 2)
        .orderBy("a_id", "b_id")
    }),

    "samp_shard_export" -> ((s, dir) => {
      // the pipeline's TERMINAL operator graded through the actual
      // write → read-back round trip (sim_quantized_topk's stored-
      // sketch regime): ShardWriter lays the corpus out as 8 hash-
      // ordered parquet shards on disk; reading the export back must
      // reproduce the closed-form (shard, pos) assignment exactly —
      // shard = hu(salt‖key) mod 8, pos = rank of (hash, key) within
      // the shard — independent of the input partitioning, because the
      // assignment is a pure function of the key. The small graded
      // result is pinned off the store (localCheckpoint) so the export
      // dir is deleted before returning (the streaming-checkpoint
      // hygiene contract).
      val store = java.nio.file.Files.createTempDirectory("shard_export")
        .toString
      graft.sink.ShardWriter.write(
        Tables.orders(s, dir).select("o_orderkey"),
        col("o_orderkey"), salt = "r8", nShards = 8, path = store)
      // shard is a PARTITION column on disk — Spark re-infers it as int
      // on read, so cast back to the long the oracle declares
      val out = s.read.parquet(store)
        .select(col("o_orderkey"), col("shard").cast("long").as("shard"),
          col("pos"))
        .pin()
      def del(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(del)
        f.delete(); ()
      }
      del(new java.io.File(store))
      out.orderBy("shard", "pos")
    }),

    "txt_feature_hash" -> ((s, dir) => {
      // hashing-trick features: token → bucket = javaHash(w) mod 64,
      // per-doc bucket counts — fixed-width sparse vectors with NO
      // vocabulary pass (the property that matters at corpus scale:
      // no dictionary to build, broadcast, or keep consistent across
      // ingestion waves). explode → map-side partial agg; output is
      // bounded by docs × 64.
      graft.ops.TextOps.featureHash(Tables.documents(s, dir),
          "doc_id", "text", dims = 64)
        .orderBy("doc_id", "bucket")
    })
  )

  private def ewmaOracle: String = {
    val lags = (1 until Taps).map(j =>
      s"lag(v, $j) OVER w AS v$j").mkString(",\n        |  ")
    // j=0 is coalesced/guarded exactly like the lags: a NULL current
    // value contributes 0 and DROPS its weight from den — the same
    // missing-tap treatment ewmaExact applies (lag() cannot distinguish
    // a NULL value from a missing predecessor, so NULL values are
    // missing taps uniformly at every j, including j=0)
    val num = (0 until Taps).map { j =>
      val wg = 1L << (Taps - 1 - j)
      val vj = if (j == 0) "v" else s"v$j"
      s"$wg * COALESCE($vj, 0)"
    }.mkString(" + ")
    val den = (0 until Taps).map { j =>
      val wg = 1L << (Taps - 1 - j)
      val vj = if (j == 0) "v" else s"v$j"
      s"CASE WHEN $vj IS NOT NULL THEN $wg ELSE 0 END"
    }.mkString(" + ")
    s"""WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ms,
       |    ${centsSql("value")} AS v FROM events),
       |l AS (SELECT event_id, user_id, v,
       |  $lags
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
       |SELECT event_id, user_id,
       |  CAST($num AS BIGINT) AS num,
       |  CAST($den AS BIGINT) AS den
       |FROM l ORDER BY event_id""".stripMargin
  }

  /** Shared winnow CTE prefix: t → grams → hashed positions (sh) →
    * per-window max of the encoded key (wm) → selected positions (sel). */
  private def winnowCtes: String = {
    val k = WinnowK
    val gram = (0 until k).map(o => s"ws[i + $o]").mkString(" || '_' || ")
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS ws
       |  FROM documents),
       |g AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= $k
       |    THEN list_transform(range(1, len(ws) - ${k - 2}),
       |         i -> struct_pack(pos := i, g := $gram))
       |    ELSE CAST([] AS STRUCT(pos BIGINT, g VARCHAR)[]) END) AS e
       |  FROM t),
       |sh AS MATERIALIZED (SELECT doc_id, CAST(e.pos AS BIGINT) AS pos,
       |    CAST(${PipelineQueries.javaHashSql("e.g")} AS BIGINT) AS h
       |  FROM g),
       |wm AS (SELECT doc_id, pos,
       |    MAX((4294967295 - (h + 2147483648)) * 1048576 + pos)
       |      OVER (PARTITION BY doc_id ORDER BY pos
       |            ROWS BETWEEN ${WinnowW - 1} PRECEDING AND CURRENT ROW)
       |      AS wmax
       |  FROM sh),
       |sel AS MATERIALIZED (SELECT DISTINCT doc_id, wmax % 1048576 AS pos
       |  FROM wm WHERE pos >= $WinnowW)""".stripMargin
  }

  private def winnowOracle: String =
    s"""WITH $winnowCtes
       |SELECT s.doc_id AS doc_id, s.pos AS pos, h.h AS h
       |FROM sel s JOIN sh h ON h.doc_id = s.doc_id AND h.pos = s.pos
       |ORDER BY s.doc_id, s.pos""".stripMargin

  private def winnowPairsOracle: String =
    s"""WITH $winnowCtes,
       |fp AS MATERIALIZED (SELECT DISTINCT s.doc_id AS id, h.h AS h
       |  FROM sel s JOIN sh h ON h.doc_id = s.doc_id AND h.pos = s.pos),
       |rare AS (SELECT h FROM (
       |  SELECT h, COUNT(*) AS df FROM fp GROUP BY h) WHERE df <= 50),
       |ff AS MATERIALIZED (SELECT f.id, f.h FROM fp f
       |  JOIN rare r ON r.h = f.h)
       |SELECT a.id AS a_id, b.id AS b_id, COUNT(*) AS n_shared
       |FROM ff a JOIN ff b ON a.h = b.h AND a.id < b.id
       |GROUP BY a.id, b.id
       |HAVING COUNT(*) >= 2
       |ORDER BY a_id, b_id""".stripMargin

  val oracles: Map[String, String] = Map(

    "ts_ewma" -> ewmaOracle,

    "txt_winnow" -> winnowOracle,

    "dd_winnow_pairs" -> winnowPairsOracle,

    // the incremental fold's contract IS "≡ full recompute": same SQL
    "inc_winnow_delta" -> winnowPairsOracle,

    "samp_shard_export" -> {
      // closed-form shard assignment (mirrors samp_shuffle_shards'
      // oracle at salt r8): what the parquet export must round-trip
      val hu = huSql("'r8' || CAST(o_orderkey AS VARCHAR)")
      s"""WITH h AS (SELECT o_orderkey, $hu AS hu FROM orders)
         |SELECT o_orderkey, hu % 8 AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY hu % 8
         |    ORDER BY hu ASC, o_orderkey ASC) AS BIGINT) AS pos
         |FROM h ORDER BY shard, pos""".stripMargin
    },

    "txt_feature_hash" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |b AS (SELECT doc_id,
         |    ((CAST(${PipelineQueries.javaHashSql("w")} AS BIGINT) % 64)
         |     + 64) % 64 AS bucket
         |  FROM tok)
         |SELECT doc_id, bucket, COUNT(*) AS cnt
         |FROM b GROUP BY doc_id, bucket
         |ORDER BY doc_id, bucket""".stripMargin
  )
}
