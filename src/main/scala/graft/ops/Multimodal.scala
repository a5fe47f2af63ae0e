package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Pin.PinOps

/** Multimodal-column plumbing (north-star extension): media payloads are
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * run per-partition so one task holds one batch of blobs at a time.
  *
  * The decode step is STUBBED (no image/audio codecs in this container):
  * [[StubDecoder]] derives deterministic fake dimensions from the payload
  * hash. The Spark-side contract — schema, partitioning, batch shape —
  * is real and tested; swapping in a real codec touches only the stub.
  *
  * Scale: blobs never traverse a shuffle (metadata extraction projects
  * before any wide op); decode parallelism = input splits.
  */
object Multimodal {

  /** One media row: payload + sidecar metadata. */
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  final case class MediaFeature(media_id: Long, kind: String,
      n_bytes: Long, sha: String, width: Int, height: Int)

  /** Deterministic fake decoder — replace with a real codec binding.
    * Width/height derive from the payload fingerprint so tests are stable. */
  object StubDecoder {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val h = java.util.Arrays.hashCode(payload)
      (math.abs(h % 1920) + 1, math.abs((h / 1920) % 1080) + 1)
    }
  }

  /** Project binary metadata (size, content hash) — pure column ops,
    * no decode, stays in codegen. */
  def binaryMeta(df: DataFrame, payload: String): DataFrame =
    df.withColumn("n_bytes", octet_length(col(payload)).cast("long"))
      .withColumn("sha", sha2(col(payload), 256))

  /** Decode features per partition: one decoder instance per task, blobs
    * processed streaming (Iterator in → Iterator out, no buffering). */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = StubDecoder.decode(r.payload)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(r.payload).map("%02x".format(_)).mkString
        MediaFeature(r.media_id, r.kind, r.payload.length.toLong, sha, w, h)
      }
    }
  }

  /** Fit-within-box resize plan, aspect preserved, in pure integer math
    * (millipixel scale factor) — cross-engine exact, never upscales.
    * Returns (out_w, out_h). The actual pixel resample belongs in the
    * partition-streaming decode step ([[decodeFeatures]]); this computes
    * the target geometry the way a planner must: deterministically. */
  def resizeFit(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
                boxW: Int, boxH: Int)
  : (org.apache.spark.sql.Column, org.apache.spark.sql.Column) = {
    // all operands positive → floor == Java/DuckDB trunc division
    val scale = least(lit(1000L),
      floor(lit(boxW) * 1000 / w).cast("long"),
      floor(lit(boxH) * 1000 / h).cast("long"))
    (greatest(lit(1L), floor(w * scale / 1000).cast("long")),
      greatest(lit(1L), floor(h * scale / 1000).cast("long")))
  }

  /** Every-Nth-frame sampling plan: millisecond timestamps of the sampled
    * frames of a `durationMs` clip at `fps`. Integer math only, so the
    * sample plan is reproducible by any engine; the frame EXTRACTION runs
    * in the decode step per partition. Empty array for zero-length clips;
    * NULL duration (unknown length) stays NULL — it is not a zero-length
    * clip. */
  def frameSamples(durationMs: org.apache.spark.sql.Column, fps: Int,
                   everyN: Int): org.apache.spark.sql.Column = {
    val frames = floor(durationMs * fps / 1000).cast("long")
    val maxIdx = floor((frames - 1) / everyN).cast("long")
    when(durationMs.isNull, lit(null).cast("array<bigint>"))
      .when(frames > 0,
        transform(sequence(lit(0L), maxIdx),
          i => floor(i * everyN * 1000 / fps).cast("long")))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Fixture: documents.text re-cast as binary media payloads. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id").as("media_id"),
        concat(lit("img/"), col("lang")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Frame-energy voice-activity gate over a binary payload — the
    * audio-curation analog of the text quality gates: split the payload
    * into `frames` equal spans (one codegen'd [[graft.expr.ByteOps
    * blockSums]] pass, the phash64 machinery), call a frame VOICED when
    * its energy strictly exceeds the payload mean (cross-multiplied:
    * frames·s_b > Σs — division-free, the phash decision convention),
    * and emit the gate features a pipeline filters/trims on: voiced
    * count, leading-silence length, and the peak frame.
    *
    * The real decode (PCM extraction) is the documented [[StubDecoder]]
    * seam — here bytes ARE the samples; the Spark-side plumbing
    * (binary column in, one narrow codegen'd map, no shuffle) is what
    * carries to 100 TB of real audio.
    *
    * @return input row + (n_voiced, lead_silence ∈ [0, frames] with
    *         `frames` meaning "no voiced frame", peak_b = smallest
    *         index attaining the max energy, peak_energy) */
  def audioVad(df: DataFrame, payload: String,
               frames: Int = 16): DataFrame = {
    require(frames >= 1, s"audioVad: frames must be >= 1, got $frames")
    graft.expr.GraftFunctions.register(df.sparkSession)
    df.withColumn("__bs",
        graft.expr.GraftFunctions.block_sums(col(payload), lit(frames)))
      .withColumn("__tot", aggregate(col("__bs"), lit(0L), _ + _))
      .withColumn("n_voiced", expr(
        s"""aggregate(transform(__bs, s -> IF($frames * s > __tot,
           |  1L, 0L)), 0L, (a, x) -> a + x)""".stripMargin))
      // array_position returns 0 — not NULL — on a miss, so a fully
      // unvoiced payload must be guarded explicitly to hit the
      // documented `frames` sentinel (nullif turns the 0 into NULL)
      .withColumn("lead_silence", (coalesce(
        nullif(expr(s"array_position(transform(__bs, " +
          s"s -> $frames * s > __tot), true)"), lit(0L)),
        lit(frames + 1L)) - 1L).cast("long"))
      .withColumn("peak_energy", expr("array_max(__bs)"))
      .withColumn("peak_b",
        (expr("array_position(__bs, array_max(__bs))") - 1L).cast("long"))
      .drop("__bs", "__tot")
  }

  /** Voiced/unvoiced ENERGY split of a binary payload — the SNR-style
    * sufficient statistics next to [[audioVad]]'s frame counts: total
    * energy of voiced frames vs the rest (the VAD decision is the same
    * division-free frames·s > Σs cross-multiply), so the
    * signal-to-noise proxy forms downstream as voiced_energy /
    * max(silence_energy, 1) without a float in the artifact. Same
    * plumbing contract: one codegen'd block_sums pass per row, binary
    * in, no shuffle.
    *
    * @return input row + (n_voiced, voiced_energy, silence_energy) */
  def audioEnergySplit(df: DataFrame, payload: String,
                       frames: Int = 16): DataFrame = {
    require(frames >= 1,
      s"audioEnergySplit: frames must be >= 1, got $frames")
    graft.expr.GraftFunctions.register(df.sparkSession)
    df.withColumn("__bs",
        graft.expr.GraftFunctions.block_sums(col(payload), lit(frames)))
      .withColumn("__tot", aggregate(col("__bs"), lit(0L), _ + _))
      .withColumn("n_voiced", expr(
        s"""aggregate(transform(__bs, s -> IF($frames * s > __tot,
           |  1L, 0L)), 0L, (a, x) -> a + x)""".stripMargin))
      .withColumn("voiced_energy", expr(
        s"""aggregate(transform(__bs, s -> IF($frames * s > __tot,
           |  s, 0L)), 0L, (a, x) -> a + x)""".stripMargin))
      .withColumn("silence_energy", col("__tot") - col("voiced_energy"))
      .drop("__bs", "__tot")
  }

  /** Shot-boundary (scene-cut) detection over a binary payload — the
    * video-curation gate's integer skeleton: treat the payload's
    * `frames` proportional blocks as frame energies (one codegen'd
    * block_sums pass, the audioVad plumbing) and flag a CUT between
    * consecutive frames whose energy jump exceeds TWICE THE MEAN jump
    * — the standard adaptive threshold for shot detection, division-
    * free as (frames−1)·|Δe_i| > 2·Σ|Δe|. (An absolute mean-ENERGY
    * threshold is scale-blind on near-uniform payloads — builder-
    * measured all-zero on the whole fixture — where the jump-relative
    * form fires exactly on the outlier boundaries.) The real decode →
    * per-frame-histogram step is stubbed per the multimodal contract;
    * every Spark-side shape (one pass per row, no per-byte rows,
    * binary never shuffles) is what a production shot detector runs.
    *
    * @return input row + (n_cuts, first_cut — 1-based boundary index
    *         before frame i+1, sentinel `frames` when none — and
    *         max_jump) */
  def sceneCuts(df: DataFrame, payload: String,
                frames: Int = 16): DataFrame = {
    require(frames >= 2, s"sceneCuts: frames must be >= 2, got $frames")
    graft.expr.GraftFunctions.register(df.sparkSession)
    df.withColumn("__bs",
        graft.expr.GraftFunctions.block_sums(col(payload), lit(frames)))
      .withColumn("__d", expr(
        s"""transform(sequence(1, ${frames - 1}),
           |  i -> abs(element_at(__bs, i + 1) - element_at(__bs, i)))"""
          .stripMargin))
      .withColumn("__sd", aggregate(col("__d"), lit(0L), _ + _))
      .withColumn("n_cuts", expr(
        s"""aggregate(transform(__d, d -> IF(${frames - 1} * d > 2 * __sd,
           |  1L, 0L)), 0L, (a, x) -> a + x)""".stripMargin))
      // array_position returns 0 on a miss (the audioVad lesson):
      // nullif→coalesce maps "no cut" to the documented sentinel
      .withColumn("first_cut", coalesce(
        nullif(expr(s"array_position(transform(__d, " +
          s"d -> ${frames - 1} * d > 2 * __sd), true)"), lit(0L)),
        lit(frames.toLong)).cast("long"))
      .withColumn("max_jump", expr("array_max(__d)"))
      .drop("__bs", "__d", "__sd")
  }

  /** 64-bit block-energy fingerprint of a binary payload — the integer
    * skeleton of a perceptual hash (aHash/pHash family: block statistic
    * vs global mean → sign pattern). Bit b is set iff block b's
    * unsigned-byte sum (the codegen'd `block_sums` pass, proportional
    * block layout) strictly exceeds the payload mean — decided by the
    * cross-multiplication 64·s_b > Σs, division-free. Payloads that are
    * near-duplicates at the byte level land within a few Hamming bits;
    * the REAL decode → DCT step is stubbed per the multimodal contract,
    * but every Spark-side shape (one codegen pass per row, no per-byte
    * rows, fingerprint as one long) is what a production pHash runs.
    *
    * @return df + (`out`: long fingerprint) */
  def phash64(df: DataFrame, payload: String, out: String): DataFrame = {
    graft.expr.GraftFunctions.register(df.sparkSession)
    df.withColumn("__bs",
        graft.expr.GraftFunctions.block_sums(col(payload), lit(64)))
      .withColumn("__tot", aggregate(col("__bs"), lit(0L), _ + _))
      .withColumn(out, expr(
        """aggregate(transform(__bs,
          |  (s, i) -> IF(64 * s > __tot, shiftleft(1L, i), 0L)),
          |  0L, (a, x) -> a + x)""".stripMargin))
      .drop("__bs", "__tot")
  }

  /** Near-duplicate media pairs by banded Hamming match over the
    * [[phash64]] fingerprint — the multi-index Hamming join (Manku et
    * al.'s simhash dedup layout, standard for image dedup): the 64-bit
    * fingerprint splits into 4 16-bit bands; by pigeonhole, any pair
    * within Hamming distance 3 agrees on ≥ 1 whole band, so candidates
    * come from 4 equality self-joins (shuffle-partitionable on the band
    * value — pair space Σ_band df(band)², NEVER corpus²) and the exact
    * `bit_count(a XOR b)` verify runs on candidates only.
    *
    * @return (a, b, hamming) with a < b, hamming <= maxHamming (<= 3
    *         for the recall guarantee; higher thresholds lose it) */
  def hammingNearDup(fps: DataFrame, idCol: String, fpCol: String,
                     maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"banded 4x16 recall guarantee holds to Hamming 3, got $maxHamming")
    val bands = fps.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("bv", expr("shiftright(fp, band * 16) & 65535"))
      // both sides of the self-join reference this frame: pin it so the
      // upstream fingerprint computation (one pass per payload) runs
      // once, not twice (the prRound double-reference rule)
      .pin()
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.fp").as("fa"), col("y.fp").as("fb"))
      .distinct()
    cand.select(col("a"), col("b"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long")
          .as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Aspect-ratio bucketing (the SDXL/LAION training-batch prep): each
    * image goes to the ratio bucket minimizing the scaled relative
    * error |w·bh − h·bw|·scale div (h·bw) — i.e. |w/h − bw/bh| / (bw/bh)
    * in exact truncated integers (both engines truncate identically) —
    * ties to the EARLIER bucket in `buckets` order; then images inside a
    * bucket are packed into fixed-size training batches in media-id
    * order. Mixed-aspect batches waste pad pixels; this is the standard
    * fix, expressed as two narrow passes + one per-bucket window.
    *
    * Shape: the bucket argmin is a pure row-local expression
    * (`least` over a literal struct array — codegen'd, no shuffle);
    * the only wide op is the per-bucket row_number for batch ids.
    * At real scale the batch window is per (bucket, shard) — pass a
    * pre-sharded frame and include the shard in `idCol`'s order if one
    * global sequence per bucket would bottleneck.
    *
    * @param df frame bearing integer `widthCol`/`heightCol` (> 0)
    * @param buckets (bw, bh) ratio buckets, 1-indexed in given order
    * @return input keys + (bucket, bucket_w, bucket_h, cost_s,
    *         batch_id) */
  def aspectBuckets(df: DataFrame, idCol: String, widthCol: String,
                    heightCol: String, buckets: Seq[(Int, Int)],
                    batchSize: Int, scale: Long = 1000000L): DataFrame = {
    require(buckets.nonEmpty, "aspectBuckets: no buckets given")
    require(batchSize >= 1, s"bad batchSize $batchSize")
    require(buckets.forall { case (w, h) => w > 0 && h > 0 },
      "aspectBuckets: bucket dims must be positive")
    val w = col(widthCol).cast("long")
    val h = col(heightCol).cast("long")
    val cands = buckets.zipWithIndex.map { case ((bw, bh), i) =>
      struct(
        call_function("div", abs(w * bh - h * bw) * scale,
          h * lit(bw.toLong)).as("c"),
        lit((i + 1).toLong).as("i"),
        lit(bw.toLong).as("bw"), lit(bh.toLong).as("bh"))
    }
    // least() needs >= 2 args; a single bucket is trivially the argmin
    val pick = if (cands.size == 1) cands.head else least(cands: _*)
    val best = df.withColumn("__b", pick)
      .withColumn("bucket", col("__b.i"))
      .withColumn("bucket_w", col("__b.bw"))
      .withColumn("bucket_h", col("__b.bh"))
      .withColumn("cost_s", col("__b.c"))
      .drop("__b")
    best.withColumn("batch_id", call_function("div",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("bucket")).orderBy(col(idCol))).cast("long")
          - 1L,
        lit(batchSize.toLong)))
  }
}
