package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps
import graft.Tables
import Fixtures._

/** Round-6 additions: the streaming path's first ORACLE-GRADED query —
  * state-store dedup with watermark-bounded state, run as a real
  * Structured Streaming query inside the graded function (AvailableNow
  * drain into a memory sink, then the sink table is the batch answer the
  * oracle checks).
  */
object Pipeline6Queries {

  /** Streaming reader for the events table under BOTH fixture layouts.
    * The file-stream source requires a DIRECTORY basePath: the original
    * sf dirs store events as a single FILE (scope the parent-directory
    * scan with a glob filter), while synthesized dirs (ScaleProbe synth)
    * store it as a parquet DIRECTORY (point the stream at it). The glob
    * filter matches file NAMES — against a directory layout it matches
    * nothing and the stream silently drains empty, which is exactly the
    * bug this helper exists to prevent (caught by the sf1 bench's
    * 0.3 s stream family). */
  private[queries] def eventsStream(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // declare the RAW file schema (a stream cannot infer), then
    // canonicalize ts to TIMESTAMP_NTZ with the same projection the
    // batch reader applies — so the stream works over every vintage of
    // the events data (nanos-long, micros, synth INT64) identically.
    val schema = Tables.eventsFileSchema(s, dir)
    val path = new java.io.File(s"$dir/events.parquet")
    val raw =
      if (path.isDirectory) s.readStream.schema(schema).parquet(path.toString)
      else s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
    Tables.normalizeTs(raw)
  }

  /** Drain-then-clean for the memory-sink graded queries: materialize
    * the sink table off the catalog (localCheckpoint pins the rows to
    * block storage, so the returned plan no longer references the temp
    * view), then drop the view and delete the checkpoint directory.
    * Without this every invocation leaked one temp dir + one
    * session-global memory table (bench's median-of-3 × runs, each
    * holding the full result in driver memory). The checkpointed blocks
    * themselves are freed by bench's between-run unpersist sweep. */
  private[queries] def drainAndClean(s: org.apache.spark.sql.SparkSession,
      name: String, ckpt: String): org.apache.spark.sql.DataFrame = {
    val out = s.table(name).pin()
    s.catalog.dropTempView(name)
    def del(f: java.io.File): Unit = {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(del)
      f.delete(); ()
    }
    del(new java.io.File(ckpt))
    out
  }

  val queries: Map[String, Q] = Map(

    "stream_dedup_watermark" -> ((s, dir) => {
      // every event arrives TWICE (explode against a 2-element array —
      // the duplicate is in-stream, like an at-least-once source replay,
      // reference client.js:1808-1813 re-sync); the streaming dedup must
      // emit each event_id exactly once. The oracle is the exact distinct
      // of the same projection — so state-store semantics (first-arrival
      // emit, watermark-bounded state) are pinned against DuckDB.
      // Multi-batch drains are IN-CONTRACT under watermark-bounded
      // cross-batch disorder — StreamDrains documents the argument and
      // StreamSplitDrainSpec proves split-drain == this answer.
      StreamDrains.drain(s,
          StreamDrains.dedupPipeline(eventsStream(s, dir)), "append", "sdw")
        .orderBy("event_id")
    }),

    "stream_win_final" -> ((s, dir) => {
      // watermark-FINALIZED tumbling windows: append mode emits a window
      // only once the watermark passes its end, so every emitted row is
      // final (no retraction needed downstream — the property that makes
      // streaming aggregates mergeable into a warehouse). The oracle is
      // the batch aggregation restricted to windows the final watermark
      // (max event time − 1h delay) closed: exact same rows. Multi-batch
      // drains in-contract per StreamDrains / StreamSplitDrainSpec.
      StreamDrains.drain(s,
          StreamDrains.winFinalPipeline(eventsStream(s, dir)),
          "append", "swf")
        .orderBy("ws", "event_type")
    }),

    "stream_latest_per_key" -> ((s, dir) => {
      // the state-store analog of A1 keep-latest, graded: latestPerKey
      // (mapGroupsWithState, StreamingSync.scala) over the events stream
      // projected into the sync row shape (href = user_id, modified_ms =
      // event ms, jsondata = event_type). The stream is DOUBLED (the same
      // at-least-once replay as stream_dedup_watermark) and event-time
      // out of order within the drain; the stateful reduce must still
      // converge to the batch keep-latest winner — max modified_ms, ties
      // to the SMALLEST payload (Dedup.keepLatest's rule). Update mode
      // emits one snapshot per touched key per BATCH; the post-drain
      // keep-latest reduce (latestFinalize) collapses them to the final
      // state — identity on a one-batch drain, and exactly what makes a
      // split drain in-contract (StreamSplitDrainSpec).
      StreamDrains.latestFinalize(
          StreamDrains.drain(s,
            StreamDrains.latestPipeline(s, eventsStream(s, dir)),
            "update", "slk"))
        .orderBy("href")
    }),

    "curate_funnel" -> ((s, dir) => {
      // the whole CCNet-shaped curation funnel as ONE composed plan —
      // the shape a user actually runs: quality gate (exact integer
      // predicates) → exact dedup (hash-groupBy, min-id canonical;
      // Dedup.exactByPayload shuffles 8-byte fingerprints, not text) →
      // fuzzy near-dup (boilerplate fence → LSH candidates → exact
      // Jaccard ≥ 2/3 verify → connected components; only each
      // cluster's canonical doc survives) → budgeted selection
      // (tokenBudget's histogram pre-pass, no one-task global sort).
      // Every stage is the already-graded operator; this pins their
      // COMPOSITION against one end-to-end oracle (the fuzzy layer
      // reuses dd_fuzzy_verified's recursive-CTE oracle over the
      // gate→exact-dedup base). The composition stays shuffle-
      // partitioned end to end: each stage's output feeds the next as
      // a DataFrame — no driver materialization between stages.
      import graft.ops.{Dedup, DedupText, Sampling, TextOps}
      val gated = Tables.documents(s, dir)
        .where(col("n_chars").between(100L, 10000L))
        .select(col("doc_id"), col("text"), col("n_chars"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
        .where(col("n_tok").between(20L, 2000L))
      // pinned: `exact` feeds both the fuzzy near-dup stage and the
      // scoring join — left lazy, the gate + exact dedup (a corpus
      // shuffle) run twice (the double-reference recompute hazard
      // Graph.hitsInt documents)
      val exact = Dedup.exactByPayload(gated, "text", "doc_id")
        .pin()
      val canonIds = DedupText.fuzzyDedup(exact, "doc_id", "text",
          bands = 8, rows = 4, n = 3, num = 2, den = 3)
        .where(col("cluster") === col("id"))
        .select(col("id").as("doc_id"))
      val scored = exact.join(canonIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          call_function("div", col("n_tok") * 1000, col("n_chars"))
            .as("score"),
          col("n_tok"))
      Sampling.tokenBudget(scored, "score", "n_tok", "doc_id",
          budget = 10000L)
        .select("doc_id", "score", "n_tok")
        .orderBy("doc_id")
    }),

    "curate_funnel_full" -> ((s, dir) => {
      // the FULL CCNet stage order with the two remaining graded stages
      // composed in: gate → LM-coverage fluency filter (txt_lm_coverage
      // over the gated corpus, keep coverage >= 3/5 by exact integer
      // cross-multiplication) → PII redaction (txt_redact's planted
      // contact block — the address varies per doc but redaction
      // CANONICALIZES it to the same <EMAIL>/<PHONE> literals, so docs
      // differing only in contact info re-collapse at the dedup stages,
      // which is why CCNet cleans BEFORE deduping) → exact dedup →
      // fuzzy near-dup → budgeted selection. One composed plan, one
      // layered oracle (the lm + redact CTEs over the curate_funnel
      // oracle); the composition stays shuffle-partitioned end to end —
      // the lm model table is the only broadcast (dim-sized by the
      // top-500 cut) and no stage materializes at the driver.
      import graft.ops.{Dedup, DedupText, Sampling, TextOps}
      val gated = Tables.documents(s, dir)
        .where(col("n_chars").between(100L, 10000L))
        .select(col("doc_id"), col("text"), col("n_chars"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok"))
        .where(col("n_tok").between(20L, 2000L))
        // pinned: gated feeds the bigram explode AND the coverage join
        // (the curate_funnel double-reference hazard, one stage earlier)
        .pin()
      // bi feeds the model aggregate AND the coverage count, but is NOT
      // pinned: materializing corpus×tokens exploded rows is the wrong
      // trade — re-deriving the explode twice from the PINNED gate
      // output is a streaming map-side pass with zero storage, exactly
      // what a 100 TB run wants (contrast the winnow/hits pins, where
      // the double-referenced frame is post-shuffle and small)
      val bi = gated.select(col("doc_id"),
          explode(TextOps.bigrams(col("text"))).as("b"))
      val top = bi.groupBy("b").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("b").asc).limit(500)
        .select("b")
      val cov = bi.join(broadcast(top), Seq("b"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_cov"))
      // n_bi = n_tok − 1 (gate guarantees >= 20 tokens, so >= 2 always)
      val fluent = gated.join(cov, Seq("doc_id"), "left")
        .where(coalesce(col("n_cov"), lit(0L)) * 5 >=
          (col("n_tok") - 1) * 3)
      val planted = concat(col("text"), lit(" contact user"),
        col("doc_id"), lit("@mail.example.com or 555-"),
        lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"))
      val red = fluent.select(col("doc_id"),
        TextOps.redact(planted).as("text"), col("n_chars"), col("n_tok"))
      // pinned for the same two-consumer reason as curate_funnel
      val exact = Dedup.exactByPayload(red, "text", "doc_id")
        .pin()
      val canonIds = DedupText.fuzzyDedup(exact, "doc_id", "text",
          bands = 8, rows = 4, n = 3, num = 2, den = 3)
        .where(col("cluster") === col("id"))
        .select(col("id").as("doc_id"))
      val scored = exact.join(canonIds, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          call_function("div", col("n_tok") * 1000, col("n_chars"))
            .as("score"),
          col("n_tok"))
      Sampling.tokenBudget(scored, "score", "n_tok", "doc_id",
          budget = 10000L)
        .select("doc_id", "score", "n_tok")
        .orderBy("doc_id")
    }),

    "samp_alpha_mix" -> ((s, dir) => {
      // temperature / alpha source mixing (the mC4 / XLM-R multilingual
      // scheme): per-source keep rate derived FROM the measured source
      // sizes — here alpha = 0.5, rate ∝ 1/√n_s, so small sources
      // upweight relative to big ones. Deterministic end to end: the
      // size aggregation is exact, IEEE sqrt is correctly rounded in
      // both engines, floor pins the rate to an integer, and the
      // per-row draw is the engine's standard hash replay
      // (mixtureByGroup). The rates side is dim-sized and broadcast;
      // the corpus never shuffles.
      import graft.ops.Sampling
      val m = 1000000L
      val docs = Tables.documents(s, dir).select("doc_id", "source")
      val rates = docs.groupBy("source").agg(count(lit(1)).as("n_s"))
        .select(col("source"),
          least(floor(lit(m.toDouble) / sqrt(col("n_s").cast("double")))
            .cast("long"), lit(m)).as("k"),
          lit(m).as("m"))
      Sampling.mixtureByGroup(docs, "source",
          col("doc_id").cast("string"), rates)
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    "dd_containment" -> ((s, dir) => {
      // asymmetric near-duplication (Broder's containment C = i/min(na,
      // nb)): finds SUB-document duplication — a short doc quoted or
      // templated inside a longer one scores low symmetric Jaccard
      // (i/u shrinks with the big doc) but high containment. Same LSH
      // candidate bound and single pinned shingle explode as the fuzzy
      // pipeline; exact integer output, threshold 4i >= 3·min (C >= 3/4)
      // cross-multiplied so no floats enter the result.
      import graft.ops.{DedupText, Par, TextOps}
      val docs = PipelineQueries.docsWithDups(s, dir)
      val shAll = Par.fanOut(docs, col("doc_id")).select(col("doc_id"),
          explode(TextOps.shingles(col("text"), 3)).as("s"))
        .pin()
      val signed = DedupText.signaturesFromShingles(shAll, "doc_id")
      val pairs = DedupText.lshCandidatesExact(signed, "doc_id", 8, 4)
      val counts = shAll.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val inter = pairs
        .join(shAll.select(col("doc_id").as("a_id"), col("s")), Seq("a_id"))
        .join(shAll.select(col("doc_id").as("b_id"), col("s")),
          Seq("b_id", "s"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("i"))
      pairs.join(inter, Seq("a_id", "b_id")) // zero-overlap pairs can't pass
        .join(counts.select(col("doc_id").as("a_id"), col("n_sh").as("na")),
          "a_id")
        .join(counts.select(col("doc_id").as("b_id"), col("n_sh").as("nb")),
          "b_id")
        .where(col("i") * 4 >= least(col("na"), col("nb")) * 3)
        .select("a_id", "b_id", "i", "na", "nb")
        .orderBy("a_id", "b_id")
    }),

    "sim_quantized_topk" -> ((s, dir) => {
      // int8-quantized ANN (FAISS SQ8 shape) in the STORED-SKETCH regime
      // production uses: quantize the corpus ONCE, persist the int8
      // sketch (3.52× smaller), serve top-k from the stored sketch —
      // the timed shape is write-sketch + scan + rank, not per-query
      // re-quantization. floor-based quantization + exact integer dot
      // products (codegen'd DotProductLL) keep the WHOLE result — ids,
      // ranks, and qdot — bit-reproducible in DuckDB (parquet
      // round-trips bigint arrays exactly), so the oracle is unchanged
      // from the one-shot form. The small top-k result is pinned off
      // the temp store (localCheckpoint) so the sketch dir can be
      // deleted before returning — no leaked temp dirs across bench
      // reruns (same hygiene as the streaming checkpoints above).
      val emb = graft.Tables.embeddings(s, dir)
      val store = java.nio.file.Files.createTempDirectory("sq8_store")
        .toString
      graft.ops.Similarity.quantizeInt8(emb)
        .write.mode("overwrite").parquet(store)
      val out = graft.ops.Similarity.quantizedTopKOnSketch(
          s.read.parquet(store), emb.where(col("vec_id") % 50 === 0), 5)
        .pin()
      def del(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(del)
        f.delete(); ()
      }
      del(new java.io.File(store))
      out.orderBy("query_id", "rnk")
    }),

    "sim_recall_quantized" -> ((s, dir) => {
      // observability for the quantization trade: per-probe overlap of
      // the int8 top-5 with the exact float top-5 (mirrors
      // sim_recall_lsh) — an exact integer the oracle reproduces
      val emb = graft.Tables.embeddings(s, dir)
      val probes = emb.where(col("vec_id") % 50 === 0)
      val exact = graft.ops.Similarity.bruteForceTopK(emb, probes, 5)
        .select("query_id", "neighbor_id")
      val quant = graft.ops.Similarity.quantizedTopK(emb, probes, 5)
        .select("query_id", "neighbor_id")
      val common = exact.join(quant, Seq("query_id", "neighbor_id"))
        .groupBy("query_id").agg(count(lit(1)).as("n"))
      exact.select("query_id").distinct()
        .join(common, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(col("n"), lit(0L)).as("n_common"))
        .orderBy("query_id")
    })
  )

  val oracles: Map[String, String] = Map(

    "stream_dedup_watermark" ->
      // event_id is unique in `events`, so the doubled stream deduped by
      // event_id is exactly the source projection
      """SELECT event_id, user_id, event_type, epoch_ms(ts) AS ts_ms
        |FROM events ORDER BY event_id""".stripMargin,

    "stream_win_final" ->
      // the final watermark is max(ts) − 1h; append emitted exactly the
      // windows whose END the watermark passed (window.end <= watermark)
      """WITH e AS (SELECT epoch_ms(ts) AS ts_ms, event_type FROM events),
        |w AS (SELECT ts_ms // 3600000 * 3600000 AS ws, event_type,
        |         COUNT(*) AS n
        |       FROM e GROUP BY 1, 2)
        |SELECT ws, event_type, n FROM w
        |WHERE ws + 3600000 <= (SELECT MAX(ts_ms) - 3600000 FROM e)
        |ORDER BY ws, event_type""".stripMargin,

    "stream_latest_per_key" ->
      // batch keep-latest over the same projection: max modified_ms per
      // key, ties to the smallest payload (duplicated arrivals collapse)
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS href,
        |    epoch_ms(ts) AS modified_ms, event_type AS jsondata
        |  FROM events),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY href
        |    ORDER BY modified_ms DESC, jsondata ASC NULLS FIRST) AS rn
        |  FROM e)
        |SELECT href, modified_ms, jsondata FROM r WHERE rn = 1
        |ORDER BY href""".stripMargin,

    "curate_funnel" ->
      // gate → min-id-per-text dedup → fuzzy near-dup canonical (the
      // dd_fuzzy_verified CTE layer over the gated+deduped base) →
      // global-cumsum budget, each CTE mirroring the Spark stage
      s"""WITH RECURSIVE g AS (SELECT doc_id, text, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |  WHERE n_chars BETWEEN 100 AND 10000),
        |g2 AS (SELECT * FROM g WHERE n_tok BETWEEN 20 AND 2000),
        |ex AS (SELECT * FROM g2 x
        |  WHERE doc_id = (SELECT MIN(doc_id) FROM g2 y
        |    WHERE y.text = x.text)),
        |${PipelineQueries.minhashPairsCtesWith(fenced = true,
             baseSql = "SELECT doc_id, text FROM ex")},
        |${Pipeline3Queries.fuzzyVerifyClusterCtes},
        |canon AS (SELECT id AS doc_id FROM reach
        |  GROUP BY id HAVING MIN(lbl) = id),
        |d AS (SELECT e.doc_id, e.n_tok * 1000 // e.n_chars AS score,
        |    e.n_tok
        |  FROM ex e JOIN canon c ON c.doc_id = e.doc_id),
        |r AS (SELECT *, SUM(n_tok) OVER (ORDER BY score DESC, doc_id ASC
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM d)
        |SELECT doc_id, score, n_tok FROM r WHERE cum <= 10000
        |ORDER BY doc_id""".stripMargin,

    "curate_funnel_full" ->
      // curate_funnel's oracle with the lm-model + redaction CTE layers
      // spliced between the gate and the exact dedup: bigram top-500
      // over the gated docs (txt_lm_coverage's construction), coverage
      // >= 3/5 cross-multiplied, then txt_redact's planted-PII redact;
      // the fuzzy layer runs over the REDACTED text
      s"""WITH RECURSIVE g AS (SELECT doc_id, text, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents
        |  WHERE n_chars BETWEEN 100 AND 10000),
        |g2 AS (SELECT * FROM g WHERE n_tok BETWEEN 20 AND 2000),
        |t0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM g2),
        |lbi AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
        |    THEN list_transform(range(1, len(ws)),
        |         i -> ws[i] || '_' || ws[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END) AS b FROM t0),
        |ltop AS (SELECT b FROM (
        |  SELECT b, COUNT(*) AS c FROM lbi GROUP BY b
        |  ORDER BY c DESC, b ASC LIMIT 500)),
        |lcov AS (SELECT doc_id, COUNT(*) AS n_cov FROM lbi
        |  WHERE b IN (SELECT b FROM ltop) GROUP BY doc_id),
        |fl AS (SELECT g2.* FROM g2 LEFT JOIN lcov USING (doc_id)
        |  WHERE COALESCE(lcov.n_cov, 0) * 5 >= (g2.n_tok - 1) * 3),
        |red AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    text || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example.com or 555-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
        |    '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
        |    '(\\d{3}-)?\\d{3}-\\d{4}', '<PHONE>', 'g') AS text,
        |  n_chars, n_tok FROM fl),
        |ex AS (SELECT * FROM red x
        |  WHERE doc_id = (SELECT MIN(doc_id) FROM red y
        |    WHERE y.text = x.text)),
        |${PipelineQueries.minhashPairsCtesWith(fenced = true,
             baseSql = "SELECT doc_id, text FROM ex")},
        |${Pipeline3Queries.fuzzyVerifyClusterCtes},
        |canon AS (SELECT id AS doc_id FROM reach
        |  GROUP BY id HAVING MIN(lbl) = id),
        |d AS (SELECT e.doc_id, e.n_tok * 1000 // e.n_chars AS score,
        |    e.n_tok
        |  FROM ex e JOIN canon c ON c.doc_id = e.doc_id),
        |r AS (SELECT *, SUM(n_tok) OVER (ORDER BY score DESC, doc_id ASC
        |        ROWS UNBOUNDED PRECEDING) AS cum FROM d)
        |SELECT doc_id, score, n_tok FROM r WHERE cum <= 10000
        |ORDER BY doc_id""".stripMargin,

    "samp_alpha_mix" ->
      // mirrors mixtureByGroup's draw: 32-bit Java string hash of the
      // doc_id, unsigned view, mod m < k with k = floor(m/√n_s)
      """WITH n AS (SELECT source, COUNT(*) AS n_s FROM documents
        |  GROUP BY source),
        |r AS (SELECT source,
        |  LEAST(CAST(floor(1000000 / sqrt(CAST(n_s AS DOUBLE)))
        |    AS BIGINT), 1000000) AS k FROM n),
        |h AS (SELECT doc_id, source,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split_regex(CAST(doc_id AS VARCHAR), ''),
        |      ch -> CAST(unicode(ch) AS BIGINT))),
        |    (h, ch) -> ((((h * 31 + ch + 2147483648) % 4294967296)
        |      + 4294967296) % 4294967296) - 2147483648) AS hh
        |  FROM documents),
        |u AS (SELECT doc_id, source,
        |  CASE WHEN hh < 0 THEN hh + 4294967296 ELSE hh END AS hu FROM h)
        |SELECT u.doc_id, u.source FROM u JOIN r ON u.source = r.source
        |WHERE hu % 1000000 < r.k
        |ORDER BY u.doc_id""".stripMargin,

    "dd_containment" -> {
      // same unfenced minhash pipeline CTEs as dd_minhash_est (dd → sh →
      // sigs → pairs), then exact per-pair overlap + per-doc counts and
      // the cross-multiplied containment threshold
      import PipelineQueries.minhashPairsCtes
      s"""WITH $minhashPairsCtes,
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT p.a_id, p.b_id, COUNT(*) AS i
         |  FROM pairs p
         |  JOIN sh a ON a.doc_id = p.a_id
         |  JOIN sh b ON b.doc_id = p.b_id AND b.s = a.s
         |  GROUP BY p.a_id, p.b_id)
         |SELECT p.a_id, p.b_id, i.i, ca.n_sh AS na, cb.n_sh AS nb
         |FROM pairs p
         |JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id
         |JOIN cnt ca ON ca.doc_id = p.a_id
         |JOIN cnt cb ON cb.doc_id = p.b_id
         |WHERE i.i * 4 >= LEAST(ca.n_sh, cb.n_sh) * 3
         |ORDER BY p.a_id, p.b_id""".stripMargin
    },

    "sim_quantized_topk" -> quantizedTopkOracle,

    "sim_recall_quantized" -> {
      // composed from the two graded rankings' own oracles (the same
      // pattern as sim_recall_lsh)
      val ex = PipelineQueries.oracles("sim_cosine_topk")
      s"""WITH ex AS ($ex),
         |qz AS ($quantizedTopkOracle),
         |p AS (SELECT DISTINCT query_id FROM ex),
         |c AS (SELECT ex.query_id, COUNT(*) AS n FROM ex
         |  JOIN qz ON ex.query_id = qz.query_id
         |    AND ex.neighbor_id = qz.neighbor_id
         |  GROUP BY ex.query_id)
         |SELECT p.query_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_common
         |FROM p LEFT JOIN c ON p.query_id = c.query_id
         |ORDER BY p.query_id""".stripMargin
    }
  )

  /** The int8 quantizer + integer-dot ranking, mirrored exactly:
    * floor-based quantization (floor is IEEE-identical across engines;
    * round's half-case convention is not), zero vectors fenced on the
    * max-abs BEFORE floor (floor(NaN) casts differently), ranking by
    * qdot/(√qna·√qnb) with id tiebreak. (lazy: referenced from the
    * `oracles` val above — a plain val here would still be null during
    * that map's initialization.) */
  private lazy val quantizedTopkOracle: String =
    """WITH mx AS (SELECT vec_id, embedding,
      |  CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
      |    AS ma FROM embeddings),
      |qq AS (SELECT vec_id,
      |  list_transform(embedding,
      |    x -> CAST(floor(CAST(x AS DOUBLE) * 127 / ma) AS BIGINT)) AS qv
      |  FROM mx WHERE ma > 0 AND NOT isnan(ma)),
      |qn AS (SELECT vec_id, qv,
      |  list_sum(list_transform(qv, v -> v * v)) AS q_norm FROM qq),
      |scored AS (SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    CAST(list_sum(list_transform(list_zip(p.qv, c.qv),
      |      z -> z[1] * z[2])) AS BIGINT) AS qdot,
      |    p.q_norm AS qna, c.q_norm AS qnb
      |  FROM qn p, qn c
      |  WHERE p.vec_id % 50 = 0 AND c.vec_id <> p.vec_id),
      |ranked AS (SELECT query_id, neighbor_id, qdot,
      |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
      |      CAST(qdot AS DOUBLE) /
      |        (sqrt(CAST(qna AS DOUBLE)) * sqrt(CAST(qnb AS DOUBLE))) DESC,
      |      neighbor_id ASC) AS rnk
      |  FROM scored)
      |SELECT query_id, CAST(rnk AS BIGINT) AS rnk, neighbor_id, qdot
      |FROM ranked WHERE rnk <= 5 ORDER BY query_id, rnk""".stripMargin
}
