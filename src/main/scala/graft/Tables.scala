package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md).
  *
  * All readers are plain `spark.read.parquet` so Catalyst retains full
  * pushdown (filters + column pruning reach the scan). At cluster scale the
  * same call works unchanged over object-store paths; nothing here touches
  * the driver beyond planning.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Canonicalize `events.ts` to TIMESTAMP_NTZ whatever the file stores.
    * The driver-generated data has stored `ts` three ways across rounds:
    * TIMESTAMP(NANOS) (no Spark type — the legacy conf reads it as raw
    * nanos LongType), TIMESTAMP(MICROS, isAdjustedToUTC=false) (reads as
    * TIMESTAMP_NTZ natively), and ScaleProbe synth dirs store plain
    * INT64 nanos. One canonical type downstream means cut filters stay
    * pushdown-friendly binary comparisons on the scan column.
    * All sessions in this project pin spark.sql.session.timeZone=UTC, so
    * the NTZ↔LTZ casts below are epoch-exact. */
  private[graft] def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // raw nanos
        df.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case org.apache.spark.sql.types.TimestampType =>
        df.withColumn("ts", col("ts").cast("timestamp_ntz"))
      case _ => df // already TIMESTAMP_NTZ
    }

  /** Raw FILE schema of `events.parquet` (pre-normalization) — what a
    * streaming read must declare before [[normalizeTs]] runs on top. */
  private[graft] def eventsFileSchema(spark: SparkSession, dir: String)
  : org.apache.spark.sql.types.StructType = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events").schema
  }

  /** events with `ts` canonicalized to TIMESTAMP_NTZ. The legacy conf is
    * dynamic (read at scan planning), so setting it on the passed-in
    * session is safe even when the driver built the session. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(read(spark, dir, "events"))
  }

  /** events with `ts_ms` (epoch millis) — the engine's canonical
    * event-time integer. Matches DuckDB `epoch_ms(ts)` (both treat the
    * naive wall-clock as UTC). */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsRaw(spark, dir)
      .withColumn("ts_ms", unix_millis(col("ts").cast("timestamp")))

  /** Projection of an `events`-shaped frame onto the SRI row vocabulary
    * (SURVEY §1.1): event_id → href/key, ts → $$meta.modified,
    * props → jsondata, event_type → resourcetype. Apply time filters on the
    * raw `ts` BEFORE this projection so they push down to the parquet scan
    * (`ts div 1e6` post-projection does not). */
  def sriProject(ev: DataFrame): DataFrame =
    ev.select(
      concat(lit("/events/"), col("event_id")).as("href"),
      col("event_id").cast("string").as("key"),
      col("ts_ms").as("modified_ms"),
      col("props").as("jsondata"),
      col("event_type").as("resourcetype"))

  /** The `events` table re-shaped as an SRI resource feed. This is the
    * fixture the sync-algebra operators (J1–J6/A1/W3/W4) are exercised and
    * oracle-checked on. */
  def sriEvents(spark: SparkSession, dir: String): DataFrame =
    sriProject(events(spark, dir))

  /** DuckDB-side equivalent of [[sriEvents]], used as a CTE prefix in
    * oracle SQL. Kept here so Spark shape and oracle shape evolve together. */
  val sriEventsSql: String =
    """SELECT '/events/' || CAST(event_id AS VARCHAR) AS href,
      |       CAST(event_id AS VARCHAR) AS key,
      |       epoch_ms(ts) AS modified_ms,
      |       props AS jsondata,
      |       event_type AS resourcetype
      |FROM events""".stripMargin
}
