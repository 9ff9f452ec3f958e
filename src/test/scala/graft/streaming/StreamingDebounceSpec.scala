package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream/batch parity for the debounce fold: time-ordered
  * micro-batches must land on exactly the batch q173 census — the
  * refractory chain's cross-batch state (last kept timestamp) is the
  * whole point of the streaming form, so the suppression window is
  * deliberately split across batch boundaries. */
class StreamingDebounceSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("cross-batch refractory suppression equals the batch q173 fold") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[StreamingDebounce.DebounceEvent]
    val q = StreamingDebounce.updates(mem.toDS())
      .writeStream.format("memory").queryName("debounce")
      .option("checkpointLocation", tmpDir("debounce-ckpt"))
      .outputMode("update")
      .start()
    try {
      // gap is 5 min. user 1: 09:00 kept, then 09:03 in the NEXT
      // batch (suppressed only because the state carried 09:00),
      // then 09:06 kept (>= 5 min after the last KEPT 09:00 — the
      // non-associative part: 09:06 - 09:03 < gap, yet it is kept).
      // user 2: two events inside one batch, 2 min apart: second
      // suppressed.
      val batches = Seq(
        Seq(StreamingDebounce.DebounceEvent(1L, ts("2024-01-01 09:00:00"), 1L),
          StreamingDebounce.DebounceEvent(2L, ts("2024-01-01 09:00:00"), 2L),
          StreamingDebounce.DebounceEvent(2L, ts("2024-01-01 09:02:00"), 3L)),
        Seq(StreamingDebounce.DebounceEvent(1L, ts("2024-01-01 09:03:00"), 4L)),
        Seq(StreamingDebounce.DebounceEvent(1L, ts("2024-01-01 09:06:00"), 5L)))
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }

      val rows = spark.table("debounce").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")) ->
          (r.getAs[Long]("n_kept"), r.getAs[Long]("first_kept_us"),
            r.getAs[Long]("last_kept_us"), r.getAs[Long]("disorder_hits")))
        .toMap
      val us0900 = StreamingDebounce.tsUs(ts("2024-01-01 09:00:00"))
      val us0906 = StreamingDebounce.tsUs(ts("2024-01-01 09:06:00"))
      assert(rows((1L, 2L))._1 == 1L, s"09:03 must be suppressed: $rows")
      assert(rows((1L, 3L)) == ((2L, us0900, us0906, 0L)), s"got $rows")
      assert(rows((2L, 2L))._1 == 1L, s"09:02 must be suppressed: $rows")

      // the same events through the batch recurrence land identically
      val all = batches.flatten
      all.groupBy(_.user_id).foreach { case (u, evs) =>
        val st = StreamingDebounce.fold(
          StreamingDebounce.DebounceState(0L, 0L, 0L, 0L),
          evs.sortBy(e => (StreamingDebounce.tsUs(e.ts), e.event_id))
            .iterator.map(e => StreamingDebounce.tsUs(e.ts)))
        val fin = rows((u, evs.length.toLong))
        assert((st.n_kept, st.first_kept_us, st.last_kept_us) ==
          ((fin._1, fin._2, fin._3)), s"user $u batch/stream diverged")
      }
    } finally q.stop()
  }

  test("the streaming fold matches the batch q173 query on real data") {
    implicit val sc = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val evs = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"))
      .collect()
      .map(r => StreamingDebounce.DebounceEvent(r.getLong(0),
        r.getTimestamp(1), r.getLong(2)))
      .sortBy(e => (StreamingDebounce.tsUs(e.ts), e.event_id))
    val mem = MemoryStream[StreamingDebounce.DebounceEvent]
    val q = StreamingDebounce.updates(mem.toDS())
      .writeStream.format("memory").queryName("debounce_sf")
      .option("checkpointLocation", tmpDir("debounce-sf-ckpt"))
      .outputMode("update")
      .start()
    try {
      // two time-ordered halves, so state crosses a batch boundary
      // mid-corpus for every user
      val (h1, h2) = evs.splitAt(evs.length / 2)
      Seq(h1, h2).foreach { b => mem.addData(b.toIndexedSeq: _*); q.processAllAvailable() }
      val fin = spark.table("debounce_sf").collect()
        .groupBy(_.getAs[Long]("user_id"))
        .map { case (u, rs) => u -> rs.maxBy(_.getAs[Long]("n_events")) }
      val batch = graft.SparkEntry.queries("q173_event_debounce")(spark, sf)
        .collect()
      assert(batch.length == fin.size)
      batch.foreach { r =>
        val u = r.getAs[Long]("user_id")
        val f = fin(u)
        assert(f.getAs[Long]("n_events") == r.getAs[Int]("n_events").toLong)
        assert(f.getAs[Long]("n_kept") == r.getAs[Long]("n_kept"), s"user $u")
        assert(f.getAs[Long]("first_kept_us") == r.getAs[Long]("first_kept_us"))
        assert(f.getAs[Long]("last_kept_us") == r.getAs[Long]("last_kept_us"))
        assert(f.getAs[Long]("disorder_hits") == 0L)
      }
    } finally q.stop()
  }
}
