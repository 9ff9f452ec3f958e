package graft.ops

import graft.Tables
import graft.queries.Qx
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-time operators over the `events` table (SURVEY.md §7 step 8:
  * the windows/streaming-state surface absent from the reference).
  * Batch forms run under the DuckDB oracle; the same plans power the
  * Structured Streaming path ([[graft.streaming.EventStreams]]), where
  * watermarks bound state.
  *
  * Window starts are emitted as formatted strings (oracle
  * representation stability) and all value sums go through the exact
  * decimal convention in [[Qx]].
  */
object EventTime {
  type Q = (SparkSession, String) => DataFrame

  private val tsFmt = "yyyy-MM-dd HH:mm:ss"

  /** Tumbling 1-hour windows per event type — Spark's native
    * `window()` generator; starts align to epoch hours. */
  val hourly: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Qx.dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), tsFmt).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Sliding windows: 2-hour length, 1-hour slide — each event lands
    * in exactly two windows. */
  val sliding: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), Qx.dsum(col("value")).as("sum_value"))
      .select(
        date_format(col("window.start"), tsFmt).as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** Session windows per user with a 30-minute gap — Spark's native
    * `session_window` (merged [t, t+30m) intervals; a gap of exactly
    * 30 minutes starts a new session). */
  val sessions: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), Qx.dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), tsFmt).as("session_start"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Top event bursts: per-type running counts via time-ordered window
    * functions (lag + gap detection) — the batch skeleton of
    * flatMapGroupsWithState-style logic. */
  val userActivity: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_minutes",
        when(col("prev_ts").isNull, lit(null).cast(DoubleType))
          // microsecond arithmetic so Spark (µs timestamps) and DuckDB
          // agree bit-for-bit on the division
          .otherwise((unix_micros(col("ts")) - unix_micros(col("prev_ts"))).cast(DoubleType) / 60000000.0))
      .withColumn("seq", row_number().over(w))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), tsFmt).as("event_ts"),
        col("seq"), col("gap_minutes"))
      .orderBy(col("user_id"), col("seq"))
  }

  val queries: Map[String, Q] = Map(
    "q25_events_hourly" -> hourly,
    "q26_events_sliding" -> sliding,
    "q27_events_sessions" -> sessions,
    "q28_user_activity" -> userActivity,
  )

  val oracle: Map[String, String] = Map(
    "q25_events_hourly" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         |  event_type, count(*) AS n_events, ${Qx.sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2""".stripMargin,
    "q26_events_sliding" ->
      s"""SELECT strftime(date_trunc('hour', ts) - off.o * INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_start,
         |  event_type, count(*) AS n_events, ${Qx.sqlDsum("value")} AS sum_value
         |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS o) off
         |GROUP BY 1, 2""".stripMargin,
    "q27_events_sessions" ->
      s"""WITH ordered AS (
         |  SELECT user_id, event_id, ts, value,
         |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |              >= INTERVAL 30 MINUTE OR
         |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM events
         |), grp AS (
         |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
         |  FROM ordered
         |)
         |SELECT user_id,
         |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
         |  count(*) AS n_events, ${Qx.sqlDsum("value")} AS sum_value
         |FROM grp GROUP BY user_id, session_no""".stripMargin,
    "q28_user_activity" ->
      """SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |  CAST(row_number() OVER w AS INTEGER) AS seq,
        |  CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS DOUBLE) / 60000000.0 AS gap_minutes
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
  )
}
