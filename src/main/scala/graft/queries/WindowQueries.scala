package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import Fixtures._

/** T8 — event-time windowing over the `events` stream table (absent in the
  * reference, required extension per SURVEY §2.12): tumbling / sliding /
  * session windows plus running aggregates. Uses Spark's native
  * window()/session_window() generators — the same operators work
  * unchanged under Structured Streaming with a watermark. */
object WindowQueries {

  private val HourMs = 3600000L
  private val HalfHourMs = 1800000L

  val queries: Map[String, Q] = Map(

    "win_tumbling" -> ((s, dir) => {
      // 1-hour tumbling windows per event type
      Tables.events(s, dir)
        .groupBy(window(timestamp_millis(col("ts_ms")), "1 hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(cents("value")).cast("double") / 100).as("sum_value"))
        .select(unix_millis(col("window.start")).as("wstart_ms"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("wstart_ms", "event_type")
    }),

    "win_sliding" -> ((s, dir) => {
      // 1-hour windows sliding every 30 min: each event lands in 2 windows
      Tables.events(s, dir)
        .groupBy(window(timestamp_millis(col("ts_ms")), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .select(unix_millis(col("window.start")).as("wstart_ms"),
          col("n"), col("n_users"))
        .orderBy("wstart_ms")
    }),

    "win_session" -> ((s, dir) => {
      // 30-min-gap session windows per user (session_window merges rows
      // whose gap < 30 min; interval is half-open)
      Tables.events(s, dir)
        .groupBy(session_window(timestamp_millis(col("ts_ms")), "30 minutes"),
          col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_millis(col("session_window.start")).as("session_start_ms"),
          col("n_events"))
        .orderBy("user_id", "session_start_ms")
    }),

    "asof_join" -> ((s, dir) => {
      // as-of join: for each purchase, the user's most recent click at or
      // before the purchase time
      val ev = Tables.events(s, dir)
      graft.ops.AsOf.join(
          left = ev.where(col("event_type") === "purchase")
            .select(col("user_id"), col("ts_ms"), col("event_id")),
          right = ev.where(col("event_type") === "click")
            .select(col("user_id"), col("ts_ms"), col("event_id")),
          key = "user_id", time = "ts_ms",
          leftId = "event_id", rightId = "event_id")
        .orderBy("user_id", "ts_ms", "event_id")
    }),

    "win_running_sum" -> ((s, dir) => {
      // per-user running total ordered by event time
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ms").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_ms"),
          sum(cents("value")).over(w).as("run_cents"))
        .orderBy("user_id", "ts_ms", "event_id")
    })
  )

  val oracles: Map[String, String] = Map(

    "win_tumbling" ->
      s"""SELECT epoch_ms(ts) // $HourMs * $HourMs AS wstart_ms, event_type,
         |  COUNT(*) AS n,
         |  CAST(SUM(${centsSql("value")}) AS DOUBLE) / 100 AS sum_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "win_sliding" ->
      s"""SELECT wstart_ms, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
         |FROM (
         |  SELECT (epoch_ms(ts) // $HalfHourMs - v.i) * $HalfHourMs AS wstart_ms,
         |         user_id, epoch_ms(ts) AS ms
         |  FROM events, (VALUES (0), (1)) AS v(i))
         |WHERE ms >= wstart_ms AND ms < wstart_ms + $HourMs
         |GROUP BY wstart_ms ORDER BY wstart_ms""".stripMargin,

    "win_session" ->
      s"""WITH e AS (SELECT user_id, epoch_ms(ts) AS ms FROM events),
         |m AS (SELECT user_id, ms,
         |  CASE WHEN ms - LAG(ms) OVER (PARTITION BY user_id ORDER BY ms)
         |         >= $HalfHourMs
         |       OR LAG(ms) OVER (PARTITION BY user_id ORDER BY ms) IS NULL
         |       THEN 1 ELSE 0 END AS brk FROM e),
         |sn AS (SELECT user_id, ms,
         |  SUM(brk) OVER (PARTITION BY user_id ORDER BY ms
         |    ROWS UNBOUNDED PRECEDING) AS sid FROM m)
         |SELECT user_id, MIN(ms) AS session_start_ms, COUNT(*) AS n_events
         |FROM sn GROUP BY user_id, sid
         |ORDER BY user_id, session_start_ms""".stripMargin,

    "asof_join" ->
      """WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id
        |      FROM events WHERE event_type = 'click')
        |SELECT p.user_id, p.ts_ms, p.event_id, m.asof_id, m.asof_time
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.event_id AS asof_id, c.ts_ms AS asof_time FROM c
        |  WHERE c.user_id = p.user_id AND c.ts_ms <= p.ts_ms
        |  ORDER BY c.ts_ms DESC, c.event_id DESC LIMIT 1) m ON true
        |ORDER BY p.user_id, p.ts_ms, p.event_id""".stripMargin,

    "win_running_sum" ->
      s"""SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         |  CAST(SUM(${centsSql("value")}) OVER (PARTITION BY user_id
         |    ORDER BY epoch_ms(ts) ASC, event_id ASC
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
         |FROM events
         |ORDER BY user_id, ts_ms, event_id""".stripMargin
  )
}
