package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `rel_funnel_windowed` operator: per-user
  * ordered-stage funnel progression (view → click → purchase, stage k
  * strictly after stage k-1 and within [[WindowMicros]] of the user's
  * FIRST view) as `flatMapGroupsWithState` — one `StageReached` row
  * appended the moment a user newly reaches a stage, with the exact
  * integer-microsecond lag from the previous stage.
  *
  * State-boundedness (the 100 TB story): a user holds state ONLY while
  * inside a funnel window —
  *
  *   - no state is ever created for users who haven't viewed (their
  *     clicks/purchases can't convert, so they cost nothing);
  *   - state — open OR completed — evicts via event-time timeout at
  *     t1 + window, after which no event can legally convert it.
  *     Completed funnels keep their 24-byte state until the window
  *     seals so a same-window re-view cannot double-start stage 1.
  *
  * So resident state is the ACTIVE funnel-window cohort — proportional
  * to the window's new viewers, not to users-ever-seen. After a
  * user's window expires, a fresh view opens the NEXT funnel:
  * recurring-funnel semantics, one funnel per user per window. Batch
  * `rel_funnel_windowed` parity therefore holds exactly on
  * single-window histories (pinned in FunnelStreamSpec); on longer
  * histories the stream reports every conversion cycle where the
  * batch operator reports only the first — the operationally-useful
  * behavior for a continuously-running pipeline. The same
  * ordered-arrival contract as the relay and sessionize streams
  * applies: first-touch semantics assume a user's earliest view is
  * seen before later qualifying events (the staged-CDC input shape);
  * sub-watermark stragglers are dropped by the operator, the standard
  * watermark contract.
  */
object FunnelStream {

  final case class Event(user_id: Long, ts: java.sql.Timestamp,
                         event_type: String)
  /** t1/t2/t3 in micros; 0 = stage not reached. */
  final case class FunnelState(t1: Long, t2: Long, t3: Long)
  final case class StageReached(user_id: Long, stage: Int,
                                reached: java.sql.Timestamp, lag_us: Long)

  /** Same 7-day window as the batch operator's FunnelWindow. */
  val WindowMicros: Long = 7L * 24 * 3600 * 1000000L

  private def update(userId: Long, events: Iterator[Event],
                     state: GroupState[FunnelState]): Iterator[StageReached] = {
    if (state.hasTimedOut) {
      // window expired with the funnel incomplete: nothing can convert
      // it anymore — evict silently (the emitted stage rows stand)
      state.remove()
      return Iterator.empty
    }
    val out = Seq.newBuilder[StageReached]
    var st = state.getOption.getOrElse(FunnelState(0L, 0L, 0L))
    // within-batch iterator order is not sorted — order by event time
    // (bounded by the USER's events in THIS micro-batch, not the corpus)
    events.toSeq.sortBy(e => EventTime.toMicros(e.ts)).foreach { e =>
      val t = EventTime.toMicros(e.ts)
      e.event_type match {
        case "view" if st.t1 == 0L =>
          st = st.copy(t1 = t)
          out += StageReached(userId, 1, EventTime.fromMicros(t), 0L)
        case "view" if t > st.t1 + WindowMicros =>
          // recurrence is EVENT-time-driven, not eviction-driven: the
          // previous window is sealed by t itself, so the next funnel
          // opens now even if the watermark (and thus the timeout
          // eviction) lags behind
          st = FunnelState(t, 0L, 0L)
          out += StageReached(userId, 1, EventTime.fromMicros(t), 0L)
        case "click" if st.t1 != 0L && st.t2 == 0L &&
            t > st.t1 && t <= st.t1 + WindowMicros =>
          st = st.copy(t2 = t)
          out += StageReached(userId, 2, EventTime.fromMicros(t), t - st.t1)
        case "purchase" if st.t2 != 0L && st.t3 == 0L &&
            t > st.t2 && t <= st.t1 + WindowMicros =>
          st = st.copy(t3 = t)
          out += StageReached(userId, 3, EventTime.fromMicros(t), t - st.t2)
        case _ => // ties, out-of-window, out-of-order stages: no-op
      }
    }
    if (st.t1 == 0L) {
      // never viewed: nothing to track (and nothing was stored)
    } else {
      // open AND completed funnels both hold state until the window
      // seals (a completed funnel's state blocks a same-window re-view
      // from double-starting stage 1)
      val timeoutMs = (st.t1 + WindowMicros) / 1000 + 1
      // a timeout at-or-below the eviction watermark is illegal to set
      // (same trap as SessionizeStream): the window is already sealed,
      // so don't store — no future event can convert this funnel
      if (timeoutMs <= state.getCurrentWatermarkMs()) {
        if (state.exists) state.remove()
      } else {
        state.update(st)
        state.setTimeoutTimestamp(timeoutMs)
      }
    }
    out.result().iterator
  }

  /** Wire the funnel over a streaming Dataset of events. */
  def stages(events: Dataset[Event]): Dataset[StageReached] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageReached](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
