package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming form of the event debounce (q173 —
  * [[graft.ops.EventTime.debounce]]): the per-user refractory-gap
  * suppression as CONTINUOUS keyed state via mapGroupsWithState,
  * emitting the running kept-census after every micro-batch touch —
  * the low-latency view a rate-limiter or alert-dedup consumer reads
  * while the batch q173 re-fold stays the replayable authority.
  *
  * The recurrence is NON-ASSOCIATIVE (an event survives only
  * relative to which previous events survived), so this operator
  * carries the same order contract as [[StreamingWallet]]: the
  * micro-batch iterator is sorted by (event time, event_id) before
  * folding, the state keeps the per-user event-time HIGH-WATER mark,
  * and every event arriving older than it counts into a monotone
  * `disorder_hits` — nonzero means the kept set may differ from the
  * batch authority's. The late event still folds in its arrival
  * batch's sorted position (suppression is best-effort by design; a
  * rate limiter must decide on what it has seen).
  *
  * State is one fixed-width tuple per user — O(users), no per-event
  * history: the refractory chain only ever needs the LAST KEPT
  * timestamp, which is what makes this fold streamable at all.
  */
object StreamingDebounce {
  case class DebounceEvent(user_id: Long, ts: Timestamp, event_id: Long)

  case class DebounceState(last_kept_us: Long, n_kept: Long, first_kept_us: Long,
                           n_events: Long, max_ts_us: Long = Long.MinValue,
                           disorder_hits: Long = 0L)

  case class DebounceUpdate(user_id: Long, n_events: Long, n_kept: Long,
                            first_kept_us: Long, last_kept_us: Long,
                            disorder_hits: Long)

  /** The same recurrence as the batch HOF fold: keep an event iff it
    * falls at least [[graft.ops.EventTime.debounceGapUs]] after the
    * last kept one (the first is always kept). */
  def fold(state: DebounceState, tsUs: Iterator[Long]): DebounceState =
    tsUs.foldLeft(state) { (st, t) =>
      if (st.n_kept == 0L || t - st.last_kept_us >= graft.ops.EventTime.debounceGapUs)
        st.copy(last_kept_us = t, n_kept = st.n_kept + 1,
          first_kept_us = if (st.n_kept == 0L) t else st.first_kept_us,
          n_events = st.n_events + 1)
      else st.copy(n_events = st.n_events + 1)
    }

  /** Full-precision µs key; Timestamp.getTime truncates to millis and
    * would mis-order micro-separated events. */
  def tsUs(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def updates(events: Dataset[DebounceEvent]): Dataset[DebounceUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[DebounceState, DebounceUpdate](
        GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[DebounceEvent], state: GroupState[DebounceState]) =>
          val prev = state.getOption.getOrElse(DebounceState(0L, 0L, 0L, 0L))
          val ordered = rows.toSeq.sortBy(e => (tsUs(e.ts), e.event_id))
          val late = ordered.count(e => tsUs(e.ts) < prev.max_ts_us)
          val hwm = (prev.max_ts_us +: ordered.map(e => tsUs(e.ts))).max
          val folded = fold(prev, ordered.iterator.map(e => tsUs(e.ts)))
          val next = folded.copy(max_ts_us = hwm,
            disorder_hits = prev.disorder_hits + late)
          state.update(next)
          DebounceUpdate(userId, next.n_events, next.n_kept,
            next.first_kept_us, next.last_kept_us, next.disorder_hits)
      }
  }
}
