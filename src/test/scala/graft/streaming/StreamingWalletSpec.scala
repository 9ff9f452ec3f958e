package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Stream/batch parity for the capped-wallet fold: feeding the events
  * through mapGroupsWithState in time-ordered micro-batches must land
  * on exactly the batch q147 state — the non-associative fold's
  * order contract made into a test. */
class StreamingWalletSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("3-batch time-ordered replay equals the batch fold; floor clips persist") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingWallet.WalletEvent]
    val q = StreamingWallet.updates(mem.toDS())
      .writeStream.format("memory").queryName("wallet")
      .option("checkpointLocation", tmpDir("wallet-ckpt"))
      .outputMode("update")
      .start()
    try {
      // user 1: +100, -160 (clip -> 0, one floor hit), +50
      // user 2: +30, +30, -20
      // events split across three time-ordered micro-batches of ONE
      // continuous query, so keyed state carries across batches
      val batches = Seq(
        Seq(StreamingWallet.WalletEvent(1L, ts("2024-01-01 09:00:00"), 1L, 100L),
          StreamingWallet.WalletEvent(2L, ts("2024-01-01 09:01:00"), 2L, 30L)),
        Seq(StreamingWallet.WalletEvent(1L, ts("2024-01-01 10:00:00"), 3L, -160L),
          StreamingWallet.WalletEvent(2L, ts("2024-01-01 10:01:00"), 4L, 30L)),
        Seq(StreamingWallet.WalletEvent(1L, ts("2024-01-01 11:00:00"), 5L, 50L),
          StreamingWallet.WalletEvent(2L, ts("2024-01-01 11:01:00"), 6L, -20L)))
      batches.foreach { b =>
        mem.addData(b: _*)
        q.processAllAvailable()
      }

      // the n_events==3 update per user is the final state
      val rows = spark.table("wallet").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")) ->
          (r.getAs[Long]("balance_cents"), r.getAs[Long]("floor_hits")))
        .toMap
      val finalByUser = rows.collect { case ((u, n), v) if n == 3L => u -> v }
      assert(finalByUser == Map(1L -> ((50L, 1L)), 2L -> ((40L, 0L))),
        s"stream state diverged: $finalByUser (all: $rows)")

      // and the same events through the batch recurrence land identically
      val all = batches.flatten
      val want = all.groupBy(_.user_id).map { case (u, evs) =>
        val st = StreamingWallet.fold(StreamingWallet.WalletState(0L, 0L, 0L),
          evs.sortBy(e => (e.ts.getTime, e.event_id)).iterator.map(_.delta_cents))
        u -> ((st.balance_cents, st.floor_hits))
      }
      assert(finalByUser == want)
    } finally q.stop()
  }

  test("cross-batch disorder fires the disorder_hits audit counter") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingWallet.WalletEvent]
    val q = StreamingWallet.updates(mem.toDS())
      .writeStream.format("memory").queryName("wallet3")
      .option("checkpointLocation", tmpDir("wallet3-ckpt"))
      .outputMode("update")
      .start()
    try {
      // batch 1: 10:00 +100 → hwm 10:00, no disorder
      mem.addData(StreamingWallet.WalletEvent(9L, ts("2024-01-01 10:00:00"), 1L, 100L))
      q.processAllAvailable()
      // batch 2: a LATE 09:00 -30 (older than the hwm) plus an in-order
      // 11:00 -20 — exactly one disorder hit; per the documented
      // contract the late event still folds, in this batch's sorted
      // position: 100 - 30 - 20 = 50, no floor clip
      mem.addData(
        StreamingWallet.WalletEvent(9L, ts("2024-01-01 09:00:00"), 2L, -30L),
        StreamingWallet.WalletEvent(9L, ts("2024-01-01 11:00:00"), 3L, -20L))
      q.processAllAvailable()
      val byEvents = spark.table("wallet3").collect()
        .map(r => r.getAs[Long]("n_events") ->
          (r.getAs[Long]("balance_cents"), r.getAs[Long]("disorder_hits"),
            r.getAs[Long]("floor_hits"))).toMap
      assert(byEvents(1L) == ((100L, 0L, 0L)), s"batch-1 update: $byEvents")
      assert(byEvents(3L) == ((50L, 1L, 0L)),
        s"the late event must fold AND count as one disorder hit: $byEvents")
      // batch 3: an in-order event does not move the counter
      mem.addData(StreamingWallet.WalletEvent(9L, ts("2024-01-01 12:00:00"), 4L, 5L))
      q.processAllAvailable()
      val last = spark.table("wallet3").collect()
        .find(_.getAs[Long]("n_events") == 4L).get
      assert(last.getAs[Long]("disorder_hits") == 1L &&
        last.getAs[Long]("balance_cents") == 55L)
    } finally q.stop()
  }

  test("within-batch disorder is sorted before folding (order imposed per batch)") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingWallet.WalletEvent]
    // one batch, deliberately added out of time order: in true time
    // order the fold sees +40, then -50 (clip -> 0, one hit), then
    // +10 -> balance 10. An unsorted fold would instead clip on the
    // leading -50 and end at 50 with the same hit count.
    mem.addData(
      StreamingWallet.WalletEvent(7L, ts("2024-01-01 09:02:00"), 11L, -50L),
      StreamingWallet.WalletEvent(7L, ts("2024-01-01 09:01:00"), 10L, 40L),
      StreamingWallet.WalletEvent(7L, ts("2024-01-01 09:03:00"), 12L, 10L))
    val q = StreamingWallet.updates(mem.toDS())
      .writeStream.format("memory").queryName("wallet2")
      .option("checkpointLocation", tmpDir("wallet2-ckpt"))
      .outputMode("update")
      .start()
    try q.processAllAvailable() finally q.stop()
    val r = spark.table("wallet2").collect()
      .map(r => (r.getAs[Long]("balance_cents"), r.getAs[Long]("floor_hits"),
        r.getAs[Long]("n_events")))
    assert(r.toSeq == Seq((10L, 1L, 3L)), s"got ${r.toSeq}")
  }
}
