package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Streaming AS-OF JOIN WITH TOLERANCE — the eleventh pipeline: the
  * Structured Streaming form of batch q89
  * ([[graft.ops.EventTime.asofWithTolerance]]), which pairs every
  * purchase with the LATEST same-user view no older than the
  * tolerance, or an explicit NULL when none exists.
  *
  * Built on the stream-stream interval-join machinery
  * ([[EventStreams.purchaseAttributionJoin]] /
  * [[EventStreams.unattributedPurchases]]) rather than keyed state:
  * an as-of with tolerance is exactly a LEFT OUTER interval join
  * (`view_ts ∈ [purchase_ts − tolerance, purchase_ts]`) followed by a
  * per-purchase `max(view_ts)` — the tolerance bound is what makes the
  * join's buffered state retirable (an unbounded as-of would need the
  * full view history; q29's no-tolerance form is deliberately NOT
  * offered as a stream).
  *
  * Emission semantics, both halves watermark-bounded BY DESIGN:
  *   - the left-outer join holds an unmatched purchase until the
  *     VIEW-side watermark passes `purchase_ts` (a qualifying view can
  *     no longer arrive — the correct-negative price documented on
  *     [[EventStreams.unattributedPurchases]]);
  *   - the downstream `max` aggregation (grouped on the purchase and a
  *     tolerance-sized event-time window over `purchase_ts`, which is
  *     what licenses append-mode finalization) holds a matched
  *     purchase until the watermark passes its window end, so the
  *     emitted row provably carries the FINAL latest view, not an
  *     intermediate one. Spark 4 plans this join→agg chain as two
  *     stateful operators sharing the delayed watermark.
  *
  * Scale posture: both streams hash-partition on `user_id` for the
  * join and on the purchase key for the agg; state is (views within
  * tolerance + in-flight purchases) per user — bounded by the
  * tolerance and watermark, not the history. Per-batch work is
  * proportional to the batch.
  *
  * Output schema matches batch q89 exactly (purchase_ts/view_ts as
  * formatted strings, staleness in minutes as double, NULLs for
  * no-fresh-view purchases), so the parity spec compares row SETS
  * directly against the batch query.
  */
object StreamingAsof {
  private val tsFmt = "yyyy-MM-dd HH:mm:ss"

  /** `views`: (user_id, ts); `purchases`: (user_id, event_id, ts) —
    * both streaming DataFrames. */
  def asofViewBeforePurchase(
      views: DataFrame, purchases: DataFrame,
      toleranceMinutes: Long = graft.ops.EventTime.asofToleranceMinutes,
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
              |view_ts >= purchase_ts - interval $toleranceMinutes minutes AND
              |view_ts <= purchase_ts""".stripMargin), "left_outer")
      .groupBy(col("user_id"), col("purchase_id"),
        window(col("purchase_ts"), s"$toleranceMinutes minutes"))
      .agg(max(col("view_ts")).as("last_view_ts"),
        max(col("purchase_ts")).as("p_ts"))
      .select(
        col("user_id"),
        col("purchase_id"),
        date_format(col("p_ts"), tsFmt).as("purchase_ts"),
        date_format(col("last_view_ts"), tsFmt).as("view_ts"),
        ((unix_micros(col("p_ts")) - unix_micros(col("last_view_ts")))
          .cast(DoubleType) / 60000000.0).as("staleness_min"))
  }
}
