package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

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
}
