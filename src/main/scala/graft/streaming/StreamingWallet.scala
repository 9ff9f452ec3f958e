package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming form of the capped wallet (q147 —
  * [[graft.ops.EventTime.cappedWallet]]): the per-user
  * balance-floored-at-zero fold as CONTINUOUS keyed state via
  * mapGroupsWithState, emitting the running (balance, floor hits)
  * after every micro-batch touch.
  *
  * Order contract, stated because the fold is NON-ASSOCIATIVE and
  * order-sensitive: batch/stream parity holds when events arrive
  * time-ordered per user — batches replayed in event-time order, as a
  * per-key-ordered log (the Kafka partitioning contract) delivers.
  * Within one micro-batch the iterator carries no order guarantee, so
  * the handler SORTS the batch's rows by (ts, event_id) before
  * folding; cross-batch disorder is the source's responsibility (a
  * late event would need the q55b chunk-with-carry re-fold — the
  * batch query is the authority for replayable data, this operator is
  * the low-latency view). That trust is no longer silent (VERDICT r8
  * #6): the state carries the per-user event-time HIGH-WATER MARK,
  * every event older than it counts into a monotone `disorder_hits`
  * column on the emitted update, and a nonzero count is the signal
  * that this view's balance may have folded in the wrong order and
  * the batch q147 re-fold is needed. The late event still folds (in
  * its arrival batch's sorted position) — dropping it would lose
  * money movement; the counter is the audit trail.
  *
  * State is one (balance, floors, high-water, disorders) tuple per
  * user — O(users) store, horizontally partitioned; no timeout,
  * because a wallet's balance is live for the account's lifetime
  * (bounded-retention variants would add a timeout that flushes
  * dormant accounts to a store).
  */
object StreamingWallet {
  case class WalletEvent(user_id: Long, ts: Timestamp, event_id: Long,
                         delta_cents: Long)

  case class WalletState(balance_cents: Long, floor_hits: Long, n_events: Long,
                         max_ts_key: Long = Long.MinValue, disorder_hits: Long = 0L)

  case class WalletUpdate(user_id: Long, balance_cents: Long,
                          floor_hits: Long, n_events: Long, disorder_hits: Long)

  /** The same recurrence as the batch HOF fold: credit/debit in
    * (ts, event_id) order, clip at zero, count clips. */
  def fold(state: WalletState, deltas: Iterator[Long]): WalletState =
    deltas.foldLeft(state) { (st, d) =>
      if (st.balance_cents + d < 0)
        WalletState(0L, st.floor_hits + 1, st.n_events + 1)
      else
        WalletState(st.balance_cents + d, st.floor_hits, st.n_events + 1)
    }

  def updates(events: Dataset[WalletEvent]): Dataset[WalletUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[WalletState, WalletUpdate](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[WalletEvent], state: GroupState[WalletState]) =>
          val prev = state.getOption.getOrElse(WalletState(0L, 0L, 0L))
          // the micro-batch iterator is unordered; the fold is not
          // associative, so order inside the batch must be imposed.
          // Full-precision key: getTime truncates to millis and would
          // mis-order micro-separated events.
          def tsKey(t: Timestamp): Long =
            math.floorDiv(t.getTime, 1000L) * 1000000000L + t.getNanos
          val ordered = rows.toSeq.sortBy(e => (tsKey(e.ts), e.event_id))
          // cross-batch disorder audit: events older than the state's
          // high-water mark folded after younger ones already did —
          // the order contract was violated for this key
          val late = ordered.count(e => tsKey(e.ts) < prev.max_ts_key)
          val hwm = (prev.max_ts_key +: ordered.map(e => tsKey(e.ts))).max
          val folded = fold(prev, ordered.iterator.map(_.delta_cents))
          val next = folded.copy(max_ts_key = hwm,
            disorder_hits = prev.disorder_hits + late)
          state.update(next)
          WalletUpdate(userId, next.balance_cents, next.floor_hits,
            next.n_events, next.disorder_hits)
      }
  }

  /** Batch-side twin used by the parity spec: the q147 delta column
    * convention (purchase/signup credit, everything else debits). */
  def deltaOf(eventType: String, cents: Long): Long =
    if (eventType == "purchase" || eventType == "signup") cents else -cents
}
