package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY.md §7.1 P3 / B17 streaming form):
  * per-user sessionization with a gap timeout via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset state API the
  * engine exposes where windowed built-ins can't express the semantics.
  *
  * State per key is one open session (start, last-seen, count); an
  * event either extends it or closes it and opens the next; an
  * event-time timeout flushes idle sessions. Emitted rows are CLOSED
  * sessions only — the exactly-once output of the state machine.
  */
object SessionizeStream {

  final case class Event(user_id: Long, ts: java.sql.Timestamp)
  final case class OpenSession(start: Long, last: Long, n: Long)
  final case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp,
                                 session_end: java.sql.Timestamp, n_events: Long)

  val GapMicros: Long = 30L * 60 * 1000000 // 30 minutes

  private def update(userId: Long, events: Iterator[Event],
                     state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    val out = Seq.newBuilder[ClosedSession]
    def close(s: OpenSession): Unit =
      out += ClosedSession(userId,
        EventTime.fromMicros(s.start),
        EventTime.fromMicros(s.last), s.n)

    if (state.hasTimedOut) {
      state.getOption.foreach(close)
      state.remove()
    } else {
      var cur = state.getOption
      events.toSeq.sortBy(e => EventTime.toMicros(e.ts)).foreach { e =>
        val t = EventTime.toMicros(e.ts)
        cur match {
          // late-but-within-watermark events may precede the open
          // session: extend bounds with min/max, never move them backward
          case Some(s) if t >= s.start - GapMicros && t <= s.last + GapMicros =>
            cur = Some(OpenSession(math.min(s.start, t), math.max(s.last, t), s.n + 1))
          case Some(s) if t > s.last + GapMicros =>
            close(s); cur = Some(OpenSession(t, t, 1))
          case Some(_) =>
            // older than the open session by more than a gap: a
            // stand-alone past session, emitted directly
            close(OpenSession(t, t, 1))
          case None =>
            cur = Some(OpenSession(t, t, 1))
        }
      }
      cur.foreach { s =>
        val timeoutMs = s.last / 1000 + GapMicros / 1000 + 1
        // A timeout below the eviction watermark is illegal to set
        // (Spark aborts the query), so a session whose close time has
        // fallen behind it is emitted now instead of stored. Such rows
        // DO reach this function: FlatMapGroupsWithStateExec's late-row
        // filter uses the PREVIOUS batch's watermark (one-batch lag —
        // watermarkPredicateForDataForLateEvents), so the batch right
        // after a watermark jump still delivers events that are below
        // the eviction watermark but above the late filter; state for
        // them cannot legally be kept, hence the early close. Events
        // arriving beyond the lag never reach here — the operator drops
        // them, the standard watermark contract — so a multi-batch
        // backfill diverges from batch rel_sessionize by EXCLUDING
        // those late events entirely (measured in SessionizeStreamSpec;
        // it can never split a session, because any event that could
        // merge with an early-closed session is necessarily below the
        // late filter of every later batch).
        // Hit in practice when one micro-batch spans a wide event-time
        // range (bulk backfill), where keys early in the range fall
        // behind the batch-end watermark.
        if (timeoutMs <= state.getCurrentWatermarkMs()) {
          close(s)
          if (state.exists) state.remove()
        } else {
          state.update(s)
          state.setTimeoutTimestamp(timeoutMs)
        }
      }
    }
    out.result().iterator
  }

  /** Wire the sessionizer over a streaming Dataset of events. */
  def sessions(events: Dataset[Event]): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
