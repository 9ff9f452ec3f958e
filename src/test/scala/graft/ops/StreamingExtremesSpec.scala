package graft.ops

import graft.SparkTestBase
import graft.streaming.StreamingExtremes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming exact-extremes pipeline (20th): stream-fed buffer
  * state serves the same raw min/max as a recompute, a retraction
  * trigger promotes the next value exactly, mixed batches fold to the
  * net change, and replay is a no-op. */
class StreamingExtremesSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private val centsExpr = "cast(cast(value as decimal(18,2)) * 100 as bigint)"

  private def withOp(ev: DataFrame, op: String): DataFrame =
    ev.select(col("event_id"), col("event_type"),
      col("value").cast("double").as("value"), lit(op).as("op"))

  private def served(store: String): Set[(String, Long, Long)] =
    MatView.extremesExactView(new ExtremeBufferStore(spark, store).state())
      .select(col("event_type"), col("min_cents"), col("max_cents"))
      .as[(String, Long, Long)].collect().toSet

  private def recompute(ev: DataFrame): Set[(String, Long, Long)] =
    ev.filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(expr(s"min($centsExpr)").as("min_cents"),
        expr(s"max($centsExpr)").as("max_cents"))
      .as[(String, Long, Long)].collect().toSet

  test("streamed extremes equal the recompute; a retraction trigger promotes exactly; replay is a no-op") {
    val ev = graft.Tables.events(spark, sf).filter(col("value").isNotNull)
    val root = tmpDir("sext")
    val evDir = s"$root/events"
    val store = s"$root/state"

    val base = ev.filter(col("event_id") % 2 === 0)
    val wave = ev.filter(col("event_id") % 2 === 1)
    withOp(base, "add").write.parquet(evDir)
    StreamingExtremes.start(spark, evDir, store, s"$root/ckpt").awaitTermination()
    withOp(wave, "add").write.mode("append").parquet(evDir)
    StreamingExtremes.start(spark, evDir, store, s"$root/ckpt").awaitTermination()
    assert(served(store) == recompute(ev),
      "streamed extremes diverged from the recompute")

    // the raw-domain delete case, live: retracting the odd wave —
    // which may carry a group's current extreme — restores the
    // even-only extremes EXACTLY (buffered promotion, no rescan)
    withOp(wave, "retract").write.mode("append").parquet(evDir)
    StreamingExtremes.start(spark, evDir, store, s"$root/ckpt").awaitTermination()
    assert(served(store) == recompute(base),
      "retraction trigger did not promote the exact pre-wave extremes")

    // at-least-once: re-deliver the retraction batch by hand
    StreamingExtremes.processBatch(withOp(wave, "retract"), 2L, store)
    assert(served(store) == recompute(base), "redelivery changed the extremes")

    // a MIXED batch (corrections: drop a quarter, restore the wave)
    val quarter = ev.filter(col("event_id") % 4 === 0)
    StreamingExtremes.processBatch(
      withOp(quarter, "retract").unionByName(withOp(wave, "add")), 3L, store)
    assert(served(store) == recompute(ev.filter(col("event_id") % 4 =!= 0)),
      "mixed batch did not fold to the net extremes")
  }

  test("rescan recovery end-to-end: a deeper-than-buffer wave raises, a rebuild at a fresh path resumes exact serving") {
    // VERDICT r14 #4: the raise and the rebuild contract were each
    // spec-pinned separately; this drives the full operational loop
    // through the PIPELINE — stream into exhaustion, recover by the
    // documented rebuild (fresh path, bootstrap round from the
    // surviving raw slice), and keep streaming into the rebuilt store.
    val root = tmpDir("sext-recover")
    val evDir = s"$root/events"
    val store = s"$root/state"
    def batch(vals: Seq[Long], op: String) =
      vals.map(v => (v, "sensor", v.toDouble, op))
        .toDF("event_id", "event_type", "value", "op")
    def served(p: String): Set[(String, Long, Long)] =
      MatView.extremesExactView(new ExtremeBufferStore(spark, p).state())
        .select(col("event_type"), col("min_cents"), col("max_cents"))
        .as[(String, Long, Long)].collect().toSet

    batch(1L to 40L, "add").write.parquet(evDir)
    StreamingExtremes.start(spark, evDir, store, s"$root/ckpt").awaitTermination()
    assert(served(store) == Set(("sensor", 100L, 4000L)))

    // the wave: retract the top 20 distinct values — deeper than the
    // 16-deep buffer can absorb. The pipeline itself keeps committing
    // (state stays consistent); the SERVED view declares the rescan.
    batch(21L to 40L, "retract").write.mode("append").parquet(evDir)
    StreamingExtremes.start(spark, evDir, store, s"$root/ckpt").awaitTermination()
    val err = intercept[Exception] { served(store) }
    assert(String.valueOf(err.getMessage).contains("RESCAN") ||
      String.valueOf(String.valueOf(err.getCause)).contains("RESCAN"),
      s"exhausted buffer did not declare a rescan: $err")

    // recovery, per the documented contract (an in-place re-bootstrap
    // round cannot clear the bound and would double-count): REBUILD at
    // a fresh path — bootstrap round 0 from the surviving raw slice —
    // and serving resumes EXACT immediately
    val store2 = s"$root/state2"
    new ExtremeBufferStore(spark, store2).appendRound(
      batch(1L to 20L, "add").drop("op"), round = 0L)
    assert(served(store2) == Set(("sensor", 100L, 2000L)),
      "rebuilt store did not serve the exact surviving extremes")

    // ...and the stream CONTINUES into the rebuilt store: fresh
    // checkpoint, roundOffset past the bootstrap round
    val evDir2 = s"$root/events2"
    batch(Seq(50L), "add").write.parquet(evDir2)
    StreamingExtremes.start(spark, evDir2, store2, s"$root/ckpt2",
      roundOffset = 1L).awaitTermination()
    assert(served(store2) == Set(("sensor", 100L, 5000L)),
      "post-recovery stream did not resume exact serving")
  }

  test("an unknown op fails the batch loudly") {
    val ev = graft.Tables.events(spark, sf).limit(5)
    val err = intercept[Exception] {
      StreamingExtremes.processBatch(withOp(ev, "upsert"), 0L,
        tmpDir("sext-op") + "/state")
    }
    assert(err.getMessage != null && err.getMessage.contains("unknown op"),
      s"expected a loud unknown-op failure, got: $err")
  }
}
