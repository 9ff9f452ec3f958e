package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the event-time operators
  * (graft.ops.EventTime gives the batch/oracle forms; these are the
  * same logical plans under readStream, with watermarks bounding
  * state — the piece batch can't express).
  */
object EventStreams {
  /** Hourly tumbling counts with a watermark: late events beyond the
    * threshold are dropped and their windows finalized (append mode). */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sessionization with state timeout via session_window + watermark. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Stream-stream interval join: attribute each purchase to the same
    * user's views inside the preceding attribution window — the
    * Structured Streaming form of the q84 batch window (there a
    * range-framed window function; here a genuine two-stream join,
    * because neither side is at rest). Both inputs carry watermarks
    * and the join condition bounds view_ts to
    * [purchase_ts - window, purchase_ts], which is exactly what lets
    * Spark retire buffered state: a view is dropped once the
    * purchase-side watermark passes view_ts + window, a purchase once
    * the view-side watermark passes purchase_ts — without both bounds
    * the state store grows forever. Inner join in append mode emits a
    * (purchase, view) pair as soon as both sides arrive; at scale the
    * join keys hash-partition both streams on user_id, so per-batch
    * work is proportional to the batch, not the history. */
  def purchaseAttributionJoin(views: DataFrame, purchases: DataFrame,
                              window: String = "2 hours",
                              watermark: String = "1 hour"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(v,
      expr(s"""v_user_id = user_id AND
              |view_ts >= purchase_ts - interval $window AND
              |view_ts <= purchase_ts""".stripMargin))
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("view_ts"))
  }

  /** The LEFT OUTER complement of [[purchaseAttributionJoin]]:
    * purchases with NO view in the preceding window — the "organic
    * purchase" detector. Same interval condition and watermarks, but
    * the outer side exercises the OTHER half of stream-stream join
    * state management: an unmatched purchase cannot be emitted when it
    * arrives (a matching view may still come), so Spark holds it and
    * emits the null-extended row only once the VIEW-side watermark
    * passes purchase_ts — at which point no qualifying view can ever
    * arrive. Output latency is therefore bounded by the watermark
    * delay BY DESIGN (the price of a correct negative), where the
    * inner join emits matches immediately. The null filter after the
    * join is stateless. */
  def unattributedPurchases(views: DataFrame, purchases: DataFrame,
                            window: String = "2 hours",
                            watermark: String = "1 hour"): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(v,
      expr(s"""v_user_id = user_id AND
              |view_ts >= purchase_ts - interval $window AND
              |view_ts <= purchase_ts""".stripMargin), "left_outer")
      .filter(col("view_ts").isNull)
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"))
  }

  /** Read the events parquet directory as a stream (test/demo entry),
    * normalizing `ts` by READ schema exactly like graft.Tables.events:
    * a TIMESTAMP(NANOS) file (read as LONG via the builder-set
    * nanosAsLong conf) gets the µs-conversion shim; a TIMESTAMP(MICROS)
    * file (read as TIMESTAMP_NTZ) casts to the session-zone timestamp —
    * identical instants either way, so the window operators and
    * watermarks see one shape. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    // schema probe through the batch reader so the NANOS remedy (and
    // the NTZ UTC-session guard) fire here too, then the one shared
    // normalization dispatch — batch and streaming cannot drift
    val schema = graft.Tables.eventsRaw(spark, dir).schema
    // the streaming file source wants a directory; select the events
    // file out of the shared testdata dir with a glob
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    graft.Tables.normalizeEventTs(spark, raw)
  }
}
