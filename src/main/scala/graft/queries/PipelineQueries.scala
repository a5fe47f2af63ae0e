package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._
import Fixtures._

/** LLM-training-data pipeline operators over `documents` / `embeddings`
  * (north-star extension, BASELINE.json): dedup family, similarity search,
  * text analysis, multimodal metadata.
  *
  * Hash-based variants (MinHash-LSH, SimHash, LSH-ANN) have no DuckDB
  * oracle — their values depend on xxhash64, which DuckDB lacks — so they
  * are declared without an oracleSql entry (driver records a rows-only
  * check); the exact variants beside them ARE oracle-checked and serve as
  * their correctness baseline.
  */
object PipelineQueries {

  /** documents ∪ a deterministic 10% re-inserted under shifted ids — gives
    * the exact-dedup operators real duplicates to collapse at every SF. */
  private[graft] def docsWithDups(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val d = Tables.documents(s, dir)
    d.unionByName(d.where(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000000L))
  }

  private[queries] val docsWithDupsSql =
    """SELECT * FROM documents
      |UNION ALL
      |SELECT doc_id + 100000000, text, lang, source, n_chars
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  val queries: Map[String, Q] = Map(

    "dd_exact" -> ((s, dir) => {
      // exact dedup: keep min doc_id per identical text
      DedupText.exact(docsWithDups(s, dir), "text", "doc_id")
        .select("doc_id", "lang", "n_chars").orderBy("doc_id")
    }),

    "dd_ngram_jaccard" -> ((s, dir) => {
      // inverted-index exact Jaccard on 3-gram shingles, same-lang pairs,
      // probe side = ~1% of docs
      DedupText.jaccardPairs(Tables.documents(s, dir),
          col("doc_id") % 97 === 0)
        .orderBy("a_id", "b_id")
    }),

    "dd_minhash_lsh" -> ((s, dir) => {
      // MinHash(32) + LSH(8 bands × 4 rows) candidate pairs, built on the
      // cross-engine Java-hash family → fully oracle-checked
      val signed = DedupText.minhashSignaturesExact(docsWithDups(s, dir),
        "doc_id", "text")
      DedupText.lshCandidatesExact(signed, "doc_id", bands = 8, rows = 4)
        .orderBy("a_id", "b_id")
    }),

    "dd_cluster_cc" -> ((s, dir) => {
      // near-dup clustering: LSH candidate pairs → connected components →
      // one canonical doc (min id) per duplicate group. No checkpoint
      // here: connectedComponents pins its symmetric edge list on entry,
      // so MinHash runs exactly once either way. Pairs come from
      // signatures of these very docs, so the endpoint fence is skipped.
      val docs = docsWithDups(s, dir)
      val signed = DedupText.minhashSignaturesExact(docs, "doc_id", "text")
      val pairs = DedupText.lshCandidatesExact(signed, "doc_id",
        bands = 8, rows = 4)
      Cluster.connectedComponents(docs.select("doc_id"), "doc_id",
          pairs, "a_id", "b_id", edgesCovered = true)
        .select(col("id").as("doc_id"), col("cluster").as("cluster_id"),
          (col("cluster") === col("id")).as("is_canonical"))
        .orderBy("doc_id")
    }),

    "dd_minhash_lsh_xx" -> ((s, dir) => {
      // xxhash64-family variant (the faster production hash). The exact
      // candidate SET is hash-family-specific — DuckDB lacks xxhash64 —
      // so the graded output is the family-independent INVARIANT: every
      // planted exact duplicate (identical text ⇒ identical shingle set
      // ⇒ identical signature ⇒ same bucket in every band) MUST appear
      // in the candidate pairs. The full-corpus pipeline still runs —
      // the planted pairs are probed against its complete output.
      val docs = docsWithDups(s, dir)
      val signed = DedupText.minhashSignatures(docs, "doc_id", "text")
      val cand = DedupText.lshCandidates(signed, "doc_id",
        bands = 8, rows = 4)
      val planted = docs.where(col("doc_id") < 100000000L &&
          col("doc_id") % 10 === 0)
        .select(col("doc_id").as("a_id"),
          (col("doc_id") + 100000000L).as("b_id"))
      planted.join(cand.withColumn("found", lit(true)),
          Seq("a_id", "b_id"), "left")
        .select(col("a_id"), col("b_id"),
          coalesce(col("found"), lit(false)).as("found"))
        .orderBy("a_id", "b_id")
    }),

    "dd_simhash" -> ((s, dir) => {
      // cross-engine 32-bit SimHash: fingerprints for ALL docs, plus
      // Hamming distance of each planted duplicate to its original
      // (must be 0) — fully oracle-checked
      val fp = DedupText.simhashExact32(docsWithDups(s, dir), "doc_id", "text")
      val dup = fp.where(col("doc_id") >= 100000000L)
        .select((col("doc_id") - 100000000L).as("doc_id"), col("fp").as("fp2"))
      fp.join(dup, "doc_id")
        .select(col("doc_id"), col("fp"),
          DedupText.hamming(col("fp"), col("fp2")).cast("long").as("dist"))
        .orderBy("doc_id")
    }),

    "dd_simhash_xx" -> ((s, dir) => {
      // 64-bit xxhash64 SimHash variant. Fingerprint VALUES are hash-
      // family-specific (no DuckDB xxhash64), but the graded quantity is
      // family-independent: identical text ⇒ identical token stream ⇒
      // identical fingerprint, so every planted duplicate's Hamming
      // distance to its original is exactly 0 — which the oracle asserts
      // without reproducing the sketch.
      val fp = docsWithDups(s, dir)
        .select(col("doc_id"), DedupText.simhash(col("text")).as("fp"))
      val dup = fp.where(col("doc_id") >= 100000000L)
        .select((col("doc_id") - 100000000L).as("doc_id"), col("fp").as("fp2"))
      fp.join(dup, "doc_id")
        .select(col("doc_id"),
          DedupText.hamming(col("fp"), col("fp2")).cast("long").as("dist"))
        .orderBy("doc_id")
    }),

    "dd_embed_cosine" -> ((s, dir) => {
      // embedding-cosine near-dup: same-label blocking (≈ IVF cell) keeps
      // the pair space linear-ish; planted duplicates (vec_id%20 re-added
      // at +1e6) are the near-dups to find. Threshold 0.999 sits in the
      // huge gap between self-similarity (~1.0) and the corpus max (0.47)
      graft.expr.GraftFunctions.register(s) // Similarity.norm/cosinePre → dot_ff
      val e = Tables.embeddings(s, dir)
      val withDups = e.unionByName(e.where(col("vec_id") % 20 === 0)
        .withColumn("vec_id", col("vec_id") + 1000000L))
      val a = withDups.select(col("vec_id").as("a_id"), col("label"),
        col("embedding").as("a_emb"), Similarity.norm(col("embedding")).as("a_n"))
      val b = withDups.select(col("vec_id").as("b_id"), col("label"),
        col("embedding").as("b_emb"), Similarity.norm(col("embedding")).as("b_n"))
      a.join(b, Seq("label")).where(col("a_id") < col("b_id"))
        .where(Similarity.cosinePre(col("a_emb"), col("b_emb"),
          col("a_n"), col("b_n")) >= 0.999)
        .select("a_id", "b_id", "label")
        .orderBy("a_id", "b_id")
    }),

    "sim_cosine_topk" -> ((s, dir) => {
      // brute-force cosine top-5; probe = every 50th vector. Output ids
      // only (ranking is FP-gap stable; raw cosines are not hash-stable)
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") % 50 === 0), 5)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk")
    }),

    "sim_lsh_topk" -> ((s, dir) => {
      // LSH-bucketed ANN (4 tables × 6 sign hyperplanes, OR-amplified) —
      // the scale path, recall<1 by design. Fully oracle-checked: the
      // hyperplanes are a deterministic plan-time ±1 matrix
      // (Similarity.planeSign), which the oracle embeds as SQL literals
      // and re-derives the exact same buckets, candidates, and ranking.
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.where(col("vec_id") % 50 === 0), 5)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk")
    }),

    "sim_ivf_topk" -> ((s, dir) => {
      // IVF ANN: deterministic centroid subset (vec_id%61), nprobe=2 —
      // fully deterministic, oracle-checked (unlike sign-LSH)
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.where(col("vec_id") % 50 === 0),
          emb.where(col("vec_id") % 61 === 0), k = 5, nprobe = 2)
        .select("query_id", "rnk", "neighbor_id")
        .orderBy("query_id", "rnk")
    }),

    "txt_stats" -> ((s, dir) => {
      // corpus stats per (lang, source): exact integer token/char math
      val d = Tables.documents(s, dir)
      d.groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("sum_tokens"),
          max(length(col("text")).cast("long")).as("max_len"))
        .orderBy("lang", "source")
    }),

    "txt_quality" -> ((s, dir) => {
      TextOps.qualityStats(Tables.documents(s, dir), "text")
        .select("doc_id", "n_chars_calc", "n_tokens", "n_punct",
          "n_stopword_hits", "quality")
        .orderBy("doc_id")
    }),

    "txt_repetition" -> ((s, dir) => {
      // repetition-based quality filter (Gopher-style): duplicate-bigram
      // fraction per doc as exact integer counts
      val ws = split(col("text"), " ")
      // guarded like TextOps.shingles: a 1-word doc makes sequence(1,0)
      // count DOWN (step defaults to -1) and element_at(ws,0) throw
      val bigrams = when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => concat_ws("_", element_at(ws, i), element_at(ws, i + 1))))
        .otherwise(array().cast("array<string>"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(bigrams).cast("long").as("n_bigrams"),
          size(array_distinct(bigrams)).cast("long").as("n_distinct"))
        .withColumn("n_repeated", col("n_bigrams") - col("n_distinct"))
        .orderBy("doc_id")
    }),

    "txt_langid" -> ((s, dir) => {
      // marker-dictionary language scores + argmax label
      val d = Tables.documents(s, dir)
      val scores = TextOps.markerWords.keys.toSeq.sorted.map(l =>
        TextOps.langScore(col("text"), l).cast("long").as(s"score_$l"))
      val best = TextOps.markerWords.keys.toSeq.sorted
        .foldLeft((lit("und"), lit(-1L))) { case ((bl, bs), l) =>
          val sc = TextOps.langScore(col("text"), l).cast("long")
          (when(sc > bs, lit(l)).otherwise(bl), when(sc > bs, sc).otherwise(bs))
        }._1
      d.select((col("doc_id") +: scores :+ best.as("pred_lang")): _*)
        .orderBy("doc_id")
    }),

    "txt_fingerprint" -> ((s, dir) => {
      // cross-engine content fingerprint + BPE-ish token estimate
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextOps.fingerprint(col("text")).as("fp"),
          TextOps.bpeTokenEstimate(col("text")).as("bpe_tokens"))
        .orderBy("doc_id")
    }),

    "samp_bernoulli" -> ((s, dir) => {
      // 10% hash-Bernoulli sample keyed on doc_id — reproducible anywhere
      Sampling.hashBernoulli(Tables.documents(s, dir),
          col("doc_id").cast("string"), k = 10, m = 100)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }),

    "samp_split" -> ((s, dir) => {
      // deterministic 80/10/10 train/val/test assignment keyed on doc_id:
      // stable across runs/partitionings/engines, plus per-split counts
      val split = Sampling.hashSplit(Tables.documents(s, dir),
        col("doc_id").cast("string"),
        Seq("train" -> 80, "val" -> 10, "test" -> 10))
      split.groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          min(col("doc_id")).as("min_id"))
        .orderBy("split")
    }),

    "samp_mix" -> ((s, dir) => {
      // weighted mixture resampling: per-source keep rates from a dim
      // table (broadcast), draw = pure function of doc_id
      val d = Tables.documents(s, dir)
      val rates = d.select(col("source")).distinct()
        .withColumn("k",
          lit(10) + lit(3) * pmod(regexp_extract(col("source"), "(\\d+)", 1)
            .cast("long"), lit(7L)))
        .withColumn("m", lit(100L))
      Sampling.mixtureByGroup(d, "source", col("doc_id").cast("string"), rates)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    }),

    "txt_chunk" -> ((s, dir) => {
      // context-window packing: 32-token chunks, 8-token overlap — one
      // training sample per row, exact token accounting
      val d = Tables.documents(s, dir)
      d.select(col("doc_id"),
          explode(TextOps.chunkTokens(col("text"), chunk = 32, overlap = 8))
            .as("c"))
        .select(col("doc_id"), col("c.idx").as("chunk_id"),
          col("c.n_tok").as("n_tok"), col("c.chunk_text").as("chunk_text"))
        .orderBy("doc_id", "chunk_id")
    }),

    "txt_tfidf" -> ((s, dir) => {
      // top-3 TF-IDF terms per doc, exact scaled-integer idf (no floats)
      TextOps.tfidfTopTerms(Tables.documents(s, dir), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rnk")
    }),

    "samp_stratified" -> ((s, dir) => {
      // exactly 3 docs per (lang, source) stratum, hash-ordered draw
      Sampling.stratifiedFixed(Tables.documents(s, dir),
          Seq("lang", "source"), col("doc_id").cast("string"), n = 3)
        .select("lang", "source", "samp_rank", "doc_id")
        .orderBy("lang", "source", "samp_rank")
    }),

    "txt_normalize" -> ((s, dir) => {
      // canonical form + its fingerprint (the robust dedup key)
      val d = Tables.documents(s, dir)
      val norm = TextOps.normalize(col("text"))
      d.select(col("doc_id"), norm.as("norm"),
          TextOps.fingerprint(norm).as("norm_fp"))
        .orderBy("doc_id")
    }),

    "txt_redact" -> ((s, dir) => {
      // PII redaction over text with deterministically planted emails and
      // phone numbers (the raw fixture corpus contains none)
      val d = Tables.documents(s, dir)
      val planted = concat(col("text"), lit(" contact user"), col("doc_id"),
        lit("@mail.example.com or 555-"),
        lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"))
      d.select(col("doc_id"), TextOps.redact(planted).as("redacted"))
        .orderBy("doc_id")
    }),

    "txt_topterms" -> ((s, dir) => {
      // per-language top-5 tokens by document frequency
      val d = Tables.documents(s, dir)
      val tok = d.select(col("lang"),
        explode(array_distinct(TextOps.tokens(col("text")))).as("w"))
      val dfreq = tok.groupBy("lang", "w").agg(count(lit(1)).as("ndocs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("ndocs").desc, col("w").asc)
      dfreq.withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 5)
        .orderBy("lang", "rnk")
    }),

    "mm_binary_meta" -> ((s, dir) => {
      // multimodal: opaque binary payload + typed metadata, no decode
      Multimodal.binaryMeta(
          Multimodal.mediaFromDocuments(s, dir).toDF(), "payload")
        .select("media_id", "kind", "n_bytes", "sha")
        .orderBy("media_id")
    }),

    "mm_resize" -> ((s, dir) => {
      // decode (stubbed, partition-streaming mapPartitions) → integer
      // fit-within-box resize plan. The stub's fake dimensions derive
      // from Arrays.hashCode(payload), which the oracle replays in SQL —
      // so the whole decode→plan path is oracle-checked end to end.
      val feats = Multimodal.decodeFeatures(
        Multimodal.mediaFromDocuments(s, dir)).toDF()
      val w = col("width").cast("long")
      val h = col("height").cast("long")
      val (ow, oh) = Multimodal.resizeFit(w, h, 320, 240)
      feats.select(col("media_id"), w.as("width"), h.as("height"),
          ow.as("out_w"), oh.as("out_h"))
        .orderBy("media_id")
    }),

    "mm_frame_sample" -> ((s, dir) => {
      // frame-sample plan: clip duration faked as 40ms/char, 30fps,
      // every 10th frame; one row per sampled frame
      val d = Tables.documents(s, dir)
      d.select(col("doc_id").as("media_id"),
          posexplode(Multimodal.frameSamples(col("n_chars") * 40, 30, 10)))
        .select(col("media_id"), col("pos").cast("long").as("k"),
          (col("pos") * 10).cast("long").as("frame_no"),
          col("col").as("offset_ms"))
        .orderBy("media_id", "k")
    })
  )

  private val langs = Seq("de", "en", "es", "fr")

  /** CTE chain ending in `pairs(a_id, b_id)` — the MinHash(32)+LSH(8×4)
    * candidate pairs on the cross-engine Java-hash affine family, spelled
    * in DuckDB SQL. `fenced = true` inserts the boilerplate fence between
    * the shingle explode and the signatures, mirroring
    * DedupText.shinglesFiltered (drop shingles in > half the docs; an
    * all-boilerplate doc gets the '__bp__'‖text sentinel) — the final CTE
    * is still named `sh`, so downstream CTEs (signatures AND the overlap
    * verifier) see the fenced set exactly like the Spark pipeline does. */
  /** @param baseSql SQL for the doc set the pipeline runs over — the
    *   `dd` CTE every downstream CTE references (doc_id, text, …).
    *   Defaults to the duplicated-documents fixture; `curate_funnel`
    *   passes its gate→exact-dedup prefix instead, so the SAME fenced
    *   LSH/verify/CC oracle layers grade the composed funnel. */
  private[queries] def minhashPairsCtesWith(fenced: Boolean,
      baseSql: String = docsWithDupsSql): String = {
    val javaHash =
      """list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split_regex(s, ''),
        |      c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> ((((h * 31 + c + 2147483648) % 4294967296)
        |      + 4294967296) % 4294967296) - 2147483648)""".stripMargin
    def wrap32(x: String) =
      s"(((($x + 2147483648) % 4294967296) + 4294967296) % 4294967296) - 2147483648"
    val minCols = (0 until 32)
      .map(j => s"MIN(${wrap32(s"h * ${2 * j + 1} + $j")}) AS m$j")
      .mkString(",\n    ")
    val bandArms = (0 until 8).map(b =>
      s"WHEN $b THEN [${(0 until 4).map(r => s"m${b * 4 + r}").mkString(", ")}]")
      .mkString("\n      ")
    val shingleList =
      """unnest(list_distinct(CASE WHEN len(ws) >= 3
        |    THEN list_transform(range(1, len(ws) - 1),
        |         i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2])
        |    ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS s""".stripMargin
    val shCtes = if (!fenced)
      s"""sh AS (SELECT doc_id,
         |  $shingleList
         |  FROM t),""".stripMargin
    else
      // shinglesFiltered mirror: df counts per-doc-distinct occurrences;
      // hot = df > nDocs * 0.5 spelled integer-exact as 2·df > nDocs
      s"""sh0 AS (SELECT doc_id,
         |  $shingleList
         |  FROM t),
         |hot AS (SELECT s FROM sh0 GROUP BY s
         |        HAVING 2 * COUNT(*) >
         |          (SELECT COUNT(DISTINCT doc_id) FROM sh0)),
         |kept AS (SELECT * FROM sh0
         |         WHERE s NOT IN (SELECT s FROM hot)),
         |lost AS (SELECT DISTINCT doc_id FROM sh0
         |         WHERE doc_id NOT IN (SELECT doc_id FROM kept)),
         |sh AS (SELECT * FROM kept
         |       UNION ALL
         |       SELECT d.doc_id, '__bp__' || d.text AS s
         |       FROM dd d JOIN lost l ON d.doc_id = l.doc_id),""".stripMargin
    s"""dd AS ($baseSql),
       |t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM dd),
       |$shCtes
       |based AS (SELECT doc_id, $javaHash AS h FROM sh),
       |sig AS (SELECT doc_id,
       |    $minCols
       |  FROM based GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, b.band,
       |    CASE b.band
       |      $bandArms
       |    END AS bandsig
       |  FROM sig, (VALUES (0),(1),(2),(3),(4),(5),(6),(7)) AS b(band)),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS a_id, r.doc_id AS b_id
       |  FROM banded l JOIN banded r
       |    ON l.band = r.band AND l.bandsig = r.bandsig
       |    AND l.doc_id < r.doc_id)""".stripMargin
  }

  private[queries] val minhashPairsCtes: String = minhashPairsCtesWith(false)
  private[queries] val minhashPairsFencedCtes: String =
    minhashPairsCtesWith(fenced = true)

  /** The 32-bit Java string hash of an arbitrary DuckDB expression —
    * same formula the minhash CTEs inline (proven exact by
    * f4_string_hash). */
  private[queries] def javaHashSql(c: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |    list_transform(string_split_regex($c, ''),
       |      ch -> CAST(unicode(ch) AS BIGINT))),
       |    (h, ch) -> ((((h * 31 + ch + 2147483648) % 4294967296)
       |      + 4294967296) % 4294967296) - 2147483648)""".stripMargin

  /** DuckDB cosine matching Spark's double-fold exactly (left-to-right
    * double accumulation; verified bit-equal on the fixtures). */
  private[queries] def cosSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_sum(list_transform(list_zip($x, $y), " +
        s"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  val oracles: Map[String, String] = Map(

    "dd_exact" ->
      s"""WITH dd AS ($docsWithDupsSql)
         |SELECT doc_id, lang, n_chars FROM dd d
         |WHERE doc_id = (SELECT MIN(doc_id) FROM dd x WHERE x.text = d.text)
         |ORDER BY doc_id""".stripMargin,

    "dd_minhash_lsh" ->
      s"""WITH $minhashPairsCtes
         |SELECT a_id, b_id FROM pairs ORDER BY a_id, b_id""".stripMargin,

    "dd_cluster_cc" ->
      // transitive closure of the LSH candidate graph via recursive CTE:
      // min reachable id == the cluster id min-label propagation converges to
      s"""WITH RECURSIVE $minhashPairsCtes,
         |cedges AS (SELECT a_id AS u, b_id AS v FROM pairs
         |           UNION SELECT b_id, a_id FROM pairs),
         |reach(id, lbl) AS (
         |  SELECT doc_id, doc_id FROM dd
         |  UNION
         |  SELECT e.v, r.lbl FROM reach r JOIN cedges e ON e.u = r.id)
         |SELECT id AS doc_id, MIN(lbl) AS cluster_id,
         |  MIN(lbl) = id AS is_canonical
         |FROM reach GROUP BY id
         |ORDER BY doc_id""".stripMargin,

    "dd_simhash" -> {
      val javaHash =
        """list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(string_split_regex(w, ''),
          |      c -> CAST(unicode(c) AS BIGINT))),
          |    (h, c) -> ((((h * 31 + c + 2147483648) % 4294967296)
          |      + 4294967296) % 4294967296) - 2147483648)""".stripMargin
      val votes = (0 until 32)
        .map(b => s"SUM(CASE WHEN (hu >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS v$b")
        .mkString(",\n    ")
      val fp = (0 until 32)
        .map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      s"""WITH dd AS ($docsWithDupsSql),
         |tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM dd),
         |based AS (SELECT doc_id,
         |  CASE WHEN h < 0 THEN h + 4294967296 ELSE h END AS hu
         |  FROM (SELECT doc_id, $javaHash AS h FROM tok)),
         |voted AS (SELECT doc_id,
         |    $votes
         |  FROM based GROUP BY doc_id),
         |fps AS (SELECT doc_id, CAST($fp AS BIGINT) AS fp FROM voted)
         |SELECT o.doc_id, o.fp,
         |  CAST(bit_count(xor(o.fp, d.fp)) AS BIGINT) AS dist
         |FROM fps o JOIN (SELECT doc_id - 100000000 AS doc_id, fp FROM fps
         |                 WHERE doc_id >= 100000000) d USING (doc_id)
         |ORDER BY o.doc_id""".stripMargin
    },

    // family-independent invariants of the xxhash64-based variants: the
    // sketch values are engine-specific, but planted exact duplicates
    // MUST collide (identical input ⇒ identical sketch) — the oracle
    // reproduces the planted-pair list and asserts the booleans
    "dd_minhash_lsh_xx" ->
      """SELECT doc_id AS a_id, doc_id + 100000000 AS b_id, TRUE AS found
        |FROM documents WHERE doc_id % 10 = 0
        |ORDER BY a_id, b_id""".stripMargin,

    "dd_simhash_xx" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS dist FROM documents
        |WHERE doc_id % 10 = 0 ORDER BY doc_id""".stripMargin,

    "dd_ngram_jaccard" ->
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws
        |           FROM documents),
        |sh AS (SELECT doc_id, lang,
        |  unnest(list_distinct(CASE WHEN len(ws) >= 3
        |    THEN list_transform(range(1, len(ws) - 1),
        |         i -> ws[i] || '_' || ws[i+1] || '_' || ws[i+2])
        |    ELSE [list_aggregate(ws, 'string_agg', ' ')] END)) AS s
        |  FROM t),
        |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |pr AS (SELECT doc_id AS a_id, lang, s FROM sh WHERE doc_id % 97 = 0),
        |inter AS (
        |  SELECT pr.a_id, sh.doc_id AS b_id, COUNT(*) AS i
        |  FROM pr JOIN sh ON pr.s = sh.s AND pr.lang = sh.lang
        |  WHERE pr.a_id <> sh.doc_id GROUP BY 1, 2)
        |SELECT a_id, b_id, i, ca.n_sh + cb.n_sh - i AS u
        |FROM inter
        |JOIN cnt ca ON ca.doc_id = a_id
        |JOIN cnt cb ON cb.doc_id = b_id
        |ORDER BY a_id, b_id""".stripMargin,

    "sim_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
        |           FROM embeddings WHERE vec_id % 50 = 0),
        |scored AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |    list_sum(list_transform(list_zip(q.q_emb, e.embedding),
        |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(q.q_emb,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(e.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY cos DESC, neighbor_id ASC) AS rnk
        |  FROM scored)
        |SELECT query_id, rnk, neighbor_id FROM ranked WHERE rnk <= 5
        |ORDER BY query_id, rnk""".stripMargin,

    "sim_lsh_topk" -> {
      // full cross-engine reproduction of the sign-LSH index: the ±1
      // hyperplane matrix is a plan-time constant (Similarity.planeSign),
      // embedded here as integer literals; bucket bits, candidate join,
      // OR-amplification distinct, and the cosine re-rank all mirror
      // Similarity.lshTopK exactly (dot = left-to-right double fold,
      // proven bit-equal by sim_cosine_topk)
      val planes = 6
      def bucket(t: Int) = (0 until planes).map { p =>
        val signs = (0 until 64)
          .map(i => if (Similarity.planeSign(t * planes + p, i) > 0) "1"
                    else "-1")
          .mkString(", ")
        s"""(CASE WHEN list_sum(list_transform(
           |      list_zip(embedding, [$signs]),
           |      q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE))) > 0
           |    THEN ${1L << p} ELSE 0 END)""".stripMargin
      }.mkString("\n    + ")
      s"""WITH eb AS (
         |  SELECT vec_id,
         |    ${bucket(0)} AS b0,
         |    ${bucket(1)} AS b1,
         |    ${bucket(2)} AS b2,
         |    ${bucket(3)} AS b3
         |  FROM embeddings),
         |cb AS (SELECT vec_id, t.tbl,
         |    CASE t.tbl WHEN 0 THEN b0 WHEN 1 THEN b1 WHEN 2 THEN b2
         |      ELSE b3 END AS bucket
         |  FROM eb, (VALUES (0),(1),(2),(3)) AS t(tbl)),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         |  FROM cb q JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.vec_id % 50 = 0 AND c.vec_id <> q.vec_id),
         |scored AS (
         |  SELECT cand.query_id, cand.neighbor_id,
         |    ${cosSql("qe.embedding", "ce.embedding")} AS cos
         |  FROM cand
         |  JOIN embeddings qe ON qe.vec_id = cand.query_id
         |  JOIN embeddings ce ON ce.vec_id = cand.neighbor_id)
         |SELECT query_id, rnk, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rnk
         |  FROM scored) WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin
    },

    "dd_embed_cosine" ->
      s"""WITH we AS (
         |  SELECT vec_id, label, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, label, embedding FROM embeddings
         |  WHERE vec_id % 20 = 0)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.label
         |FROM we a JOIN we b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.999
         |ORDER BY a_id, b_id""".stripMargin,

    "sim_ivf_topk" -> {
      s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent_emb
         |  FROM embeddings WHERE vec_id % 61 = 0),
         |corpus_assign AS (
         |  SELECT neighbor_id, c_emb, cell FROM (
         |    SELECT e.vec_id AS neighbor_id, e.embedding AS c_emb,
         |      c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC,
         |                 c.cent_id ASC) AS rn
         |    FROM embeddings e, cents c) WHERE rn <= 1),
         |probe_assign AS (
         |  SELECT query_id, q_emb, cell FROM (
         |    SELECT e.vec_id AS query_id, e.embedding AS q_emb,
         |      c.cent_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.embedding", "c.cent_emb")} DESC,
         |                 c.cent_id ASC) AS rn
         |    FROM embeddings e, cents c WHERE e.vec_id % 50 = 0) WHERE rn <= 2),
         |scored AS (
         |  SELECT DISTINCT pa.query_id, ca.neighbor_id,
         |    ${cosSql("pa.q_emb", "ca.c_emb")} AS cos
         |  FROM corpus_assign ca JOIN probe_assign pa ON ca.cell = pa.cell
         |  WHERE ca.neighbor_id <> pa.query_id)
         |SELECT query_id, rnk, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY cos DESC, neighbor_id ASC) AS rnk
         |  FROM scored) WHERE rnk <= 5
         |ORDER BY query_id, rnk""".stripMargin
    },

    "txt_stats" ->
      """SELECT lang, source, COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
        |  MAX(length(text)) AS max_len
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,

    "txt_repetition" ->
      """WITH b AS (SELECT doc_id,
        |  list_transform(range(1, len(string_split(text, ' '))),
        |    i -> string_split(text, ' ')[i] || '_' ||
        |         string_split(text, ' ')[i + 1]) AS bg
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(bg) AS BIGINT) AS n_bigrams,
        |  CAST(len(list_distinct(bg)) AS BIGINT) AS n_distinct,
        |  CAST(len(bg) - len(list_distinct(bg)) AS BIGINT) AS n_repeated
        |FROM b ORDER BY doc_id""".stripMargin,

    "txt_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_calc,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
        |    AS BIGINT) AS n_punct,
        |  CAST(len(list_intersect(string_split(text, ' '),
        |    ['the', 'a', 'of', 'and', 'is'])) AS BIGINT) AS n_stopword_hits,
        |  CAST(ROUND(CAST(len(list_intersect(string_split(text, ' '),
        |      ['the', 'a', 'of', 'and', 'is'])) AS DOUBLE) * 100
        |    / len(string_split(text, ' ')), 0) AS BIGINT) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_langid" -> {
      val scoreExprs = langs.map { l =>
        val words = graft.ops.TextOps.markerWords(l)
          .map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_intersect(string_split(text, ' '), $words)) AS BIGINT) AS score_$l"
      }.mkString(",\n  ")
      // argmax with lexicographic tiebreak = fold in sorted-lang order
      val best = langs.foldLeft(("'und'", "-1")) { case ((bl, bs), l) =>
        (s"CASE WHEN score_$l > $bs THEN '$l' ELSE $bl END",
          s"CASE WHEN score_$l > $bs THEN score_$l ELSE $bs END")
      }._1
      s"""SELECT doc_id, score_de, score_en, score_es, score_fr,
         |  $best AS pred_lang
         |FROM (SELECT doc_id,
         |  $scoreExprs
         |FROM documents)
         |ORDER BY doc_id""".stripMargin
    },

    "txt_fingerprint" ->
      """SELECT doc_id, substring(sha256(text), 1, 16) AS fp,
        |  CAST(list_sum(list_transform(string_split(text, ' '),
        |    w -> CAST(ceil(CAST(length(w) AS DOUBLE) / 4) AS BIGINT)))
        |    AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,

    "samp_bernoulli" ->
      s"""WITH h AS (SELECT doc_id, lang, n_chars,
         |  ${javaHashSql("CAST(doc_id AS VARCHAR)")} AS hh FROM documents),
         |u AS (SELECT doc_id, lang, n_chars,
         |  CASE WHEN hh < 0 THEN hh + 4294967296 ELSE hh END AS hu FROM h)
         |SELECT doc_id, lang, n_chars FROM u WHERE hu % 100 < 10
         |ORDER BY doc_id""".stripMargin,

    "samp_split" ->
      s"""WITH h AS (SELECT doc_id, n_chars,
         |  ${javaHashSql("CAST(doc_id AS VARCHAR)")} AS hh FROM documents),
         |u AS (SELECT doc_id, n_chars,
         |  (CASE WHEN hh < 0 THEN hh + 4294967296 ELSE hh END) % 100 AS b
         |  FROM h),
         |s AS (SELECT doc_id, n_chars,
         |  CASE WHEN b < 80 THEN 'train'
         |       WHEN b < 90 THEN 'val' ELSE 'test' END AS split FROM u)
         |SELECT split, COUNT(*) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  MIN(doc_id) AS min_id
         |FROM s GROUP BY split ORDER BY split""".stripMargin,

    "samp_mix" ->
      s"""WITH h AS (SELECT doc_id, source, lang,
         |  ${javaHashSql("CAST(doc_id AS VARCHAR)")} AS hh FROM documents),
         |u AS (SELECT doc_id, source, lang,
         |  CASE WHEN hh < 0 THEN hh + 4294967296 ELSE hh END AS hu FROM h)
         |SELECT doc_id, source, lang FROM u
         |WHERE hu % 100 <
         |  10 + 3 * (CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) % 7)
         |ORDER BY doc_id""".stripMargin,

    "txt_chunk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |n AS (SELECT doc_id, ws,
        |  CASE WHEN len(ws) <= 32 THEN 1
        |       ELSE 1 + ((len(ws) - 32 + 23) // 24) END AS nc FROM t),
        |c AS (SELECT doc_id, ws, unnest(range(nc)) AS k FROM n)
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_id,
        |  CAST(len(list_slice(ws, k * 24 + 1, k * 24 + 32)) AS BIGINT)
        |    AS n_tok,
        |  array_to_string(list_slice(ws, k * 24 + 1, k * 24 + 32), ' ')
        |    AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,

    "txt_tfidf" ->
      """WITH tf AS (SELECT doc_id, w AS term, COUNT(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |        FROM documents) GROUP BY 1, 2),
        |sc AS (SELECT doc_id, term, tf,
        |  COUNT(*) OVER (PARTITION BY term) AS df FROM tf),
        |r AS (SELECT doc_id, term,
        |  CAST(tf * ((1000000 * (SELECT COUNT(DISTINCT doc_id)
        |                         FROM documents)) // df) AS BIGINT) AS score,
        |  ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY tf * ((1000000 * (SELECT COUNT(DISTINCT doc_id)
        |                               FROM documents)) // df) DESC,
        |      term ASC) AS rnk
        |  FROM sc)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term, score
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "samp_stratified" ->
      s"""WITH h AS (SELECT lang, source, doc_id,
         |  CAST(doc_id AS VARCHAR) AS k,
         |  ${javaHashSql("CAST(doc_id AS VARCHAR)")} AS hh FROM documents),
         |u AS (SELECT lang, source, doc_id, k,
         |  CASE WHEN hh < 0 THEN hh + 4294967296 ELSE hh END AS hu FROM h),
         |r AS (SELECT lang, source, doc_id,
         |  ROW_NUMBER() OVER (PARTITION BY lang, source
         |    ORDER BY hu ASC, k ASC) AS samp_rank FROM u)
         |SELECT lang, source, samp_rank, doc_id FROM r WHERE samp_rank <= 3
         |ORDER BY lang, source, samp_rank""".stripMargin,

    "txt_normalize" ->
      """SELECT doc_id, norm, substring(sha256(norm), 1, 16) AS norm_fp
        |FROM (SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text),
        |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "txt_redact" ->
      """WITH p AS (SELECT doc_id,
        |  text || ' contact user' || CAST(doc_id AS VARCHAR)
        |    || '@mail.example.com or 555-'
        |    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(t,
        |    '(?i)[a-z0-9._%+-]+@[a-z0-9.-]+', '<EMAIL>', 'g'),
        |    '(\d{3}-)?\d{3}-\d{4}', '<PHONE>', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin,

    "txt_topterms" ->
      """WITH tok AS (SELECT lang,
        |  unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents),
        |dfq AS (SELECT lang, w, COUNT(*) AS ndocs FROM tok GROUP BY 1, 2),
        |r AS (SELECT lang, w, ndocs,
        |  ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY ndocs DESC, w ASC) AS rnk FROM dfq)
        |SELECT lang, w, ndocs, rnk FROM r WHERE rnk <= 5
        |ORDER BY lang, rnk""".stripMargin,

    "mm_binary_meta" ->
      """SELECT doc_id AS media_id, 'img/' || lang AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  sha256(text) AS sha
        |FROM documents ORDER BY media_id""".stripMargin,

    // Arrays.hashCode replay: h0=1, h=31*h+byte with int32 wrap (ASCII
    // corpus → bytes == char codes). DuckDB's // and % truncate/keep
    // dividend sign exactly like Java, so width/height reproduce.
    "mm_resize" ->
      """WITH m AS (SELECT doc_id AS media_id,
        |  list_reduce(list_prepend(CAST(1 AS BIGINT),
        |    list_transform(string_split_regex(text, ''),
        |      c -> CAST(unicode(c) AS BIGINT))),
        |    (h, c) -> ((((h * 31 + c + 2147483648) % 4294967296)
        |      + 4294967296) % 4294967296) - 2147483648) AS hc
        |  FROM documents),
        |d AS (SELECT media_id,
        |  abs(hc % 1920) + 1 AS width,
        |  abs((hc // 1920) % 1080) + 1 AS height FROM m),
        |r AS (SELECT *, least(1000, 320 * 1000 // width,
        |                      240 * 1000 // height) AS sc FROM d)
        |SELECT media_id, CAST(width AS BIGINT) AS width,
        |  CAST(height AS BIGINT) AS height,
        |  CAST(greatest(1, width * sc // 1000) AS BIGINT) AS out_w,
        |  CAST(greatest(1, height * sc // 1000) AS BIGINT) AS out_h
        |FROM r ORDER BY media_id""".stripMargin,

    "mm_frame_sample" ->
      """WITH d AS (SELECT doc_id AS media_id,
        |  (n_chars * 40 * 30) // 1000 AS frames FROM documents)
        |SELECT media_id, CAST(i AS BIGINT) AS k,
        |  CAST(i * 10 AS BIGINT) AS frame_no,
        |  CAST((i * 10 * 1000) // 30 AS BIGINT) AS offset_ms
        |FROM d, UNNEST(range(0, (frames - 1) // 10 + 1)) AS t(i)
        |WHERE frames > 0
        |ORDER BY media_id, k""".stripMargin
  )
}
