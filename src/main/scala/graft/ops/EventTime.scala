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

  /** As-of join composed from built-ins (Spark has no native as-of):
    * tag both streams, union, and carry the last left-side timestamp
    * forward with last_value(ignoreNulls) over event time. One shuffle
    * on the join key, no range explosion — the standard Spark shape
    * for "match each right row to the latest prior left row".
    * Here: each purchase matched to the user's most recent prior
    * click. */
  val asofClickPurchase: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"),
        lit(null).cast(LongType).as("purchase_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        lit(null).cast(LongType).as("event_id"), col("event_id").as("purchase_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("purchase_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, 0)
    clicks.unionByName(purchases)
      .withColumn("last_click_ts",
        last(when(col("purchase_id").isNull, col("ts")), ignoreNulls = true).over(w))
      .filter(col("purchase_id").isNotNull)
      .select(
        col("user_id"),
        col("purchase_id"),
        date_format(col("ts"), tsFmt).as("purchase_ts"),
        date_format(col("last_click_ts"), tsFmt).as("last_click_ts"),
        when(col("last_click_ts").isNull, lit(null).cast(DoubleType))
          .otherwise((unix_micros(col("ts")) - unix_micros(col("last_click_ts")))
            .cast(DoubleType) / 60000000.0).as("minutes_since_click"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  /** Semi-structured surface: JSON property extraction from the props
    * column (schema-on-read over string payloads), aggregated per
    * event type. */
  val jsonExtract: Q = (s, d) => {
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(IntegerType))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k").cast(LongType)).as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q41_json_extract" -> jsonExtract,
    "q25_events_hourly" -> hourly,
    "q26_events_sliding" -> sliding,
    "q27_events_sessions" -> sessions,
    "q28_user_activity" -> userActivity,
    "q29_asof_click_purchase" -> asofClickPurchase,
  )

  val oracle: Map[String, String] = Map(
    "q41_json_extract" ->
      """SELECT event_type, count(*) AS n_events,
        |  count(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
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
    "q29_asof_click_purchase" ->
      """WITH tagged AS (
        |  SELECT user_id, ts, event_id, CAST(NULL AS BIGINT) AS purchase_id
        |  FROM events WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT user_id, ts, CAST(NULL AS BIGINT), event_id
        |  FROM events WHERE event_type = 'purchase'
        |), marked AS (
        |  SELECT *, last_value(CASE WHEN purchase_id IS NULL THEN ts END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, purchase_id ASC NULLS FIRST
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        |  FROM tagged
        |)
        |SELECT user_id, purchase_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
        |  strftime(last_click_ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts,
        |  CAST(epoch_us(ts) - epoch_us(last_click_ts) AS DOUBLE) / 60000000.0 AS minutes_since_click
        |FROM marked WHERE purchase_id IS NOT NULL""".stripMargin,
    "q28_user_activity" ->
      """SELECT user_id, event_id,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        |  CAST(row_number() OVER w AS INTEGER) AS seq,
        |  CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS DOUBLE) / 60000000.0 AS gap_minutes
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,
  )
}
