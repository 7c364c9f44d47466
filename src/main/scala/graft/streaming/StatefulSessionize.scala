package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` —
  * the per-key custom-state primitive (SURVEY.md §2.11; batch analog is
  * the e01 window formulation).
  *
  * State per user is O(1) (running session bounds, not buffered
  * events), so the operator's memory footprint is keys × a few longs —
  * the shape that survives unbounded streams. A processing-time timeout
  * flushes sessions for keys that go quiet.
  */
object StatefulSessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_id: Long)
  final case class SessionState(start: Long, last: Long, n: Long,
      firstEvent: Long, lastEvent: Long)
  final case class Session(user_id: Long, n_events: Long, dur_sec: Double,
      first_event: Long, last_event: Long)

  /** Close a session after `gapSec` of inactivity within the stream.
    *
    * `idleTimeout = true` additionally flushes a key's open session when
    * the key goes quiet wall-clock-wise (ProcessingTimeTimeout). Leave
    * it off for synchronous testing: under `processAllAvailable` the
    * timeout clock keeps scheduling evaluation batches and the call
    * never converges. */
  def sessions(events: Dataset[Event], gapSec: Long = 3600,
      idleTimeout: Boolean = false)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val timeoutMode =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutMode)(
        (uid: Long, evs: Iterator[Event], state: GroupState[SessionState]) => {
          var cur = state.getOption
          // batch-local track for late events that predate the open
          // session by more than the gap: they form their own earlier
          // session(s), merged among themselves in sorted order, and
          // must never corrupt the open session's bounds
          var early: Option[SessionState] = None
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          def close(st: SessionState): Unit =
            out += Session(uid, st.n, (st.last - st.start) / 1000.0,
              st.firstEvent, st.lastEvent)
          evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            val t = e.ts.getTime
            cur match {
              // in-gap on BOTH sides of the open session's interval: a
              // late cross-batch event only extends the session if it's
              // within the gap of [start, last] — an event far BEFORE
              // start must NOT merge (it belongs to an earlier session)
              case Some(st) if t - st.last <= gapSec * 1000 &&
                  st.start - t <= gapSec * 1000 =>
                cur = Some(st.copy(
                  start = math.min(st.start, t),
                  last = math.max(st.last, t),
                  n = st.n + 1,
                  // both bounds track symmetrically with (ts, event_id)
                  // tie order: first = smallest id at the earliest ts,
                  // last = largest id at the latest ts
                  firstEvent =
                    if (t < st.start || (t == st.start && e.event_id < st.firstEvent))
                      e.event_id else st.firstEvent,
                  lastEvent =
                    if (t > st.last || (t == st.last && e.event_id > st.lastEvent))
                      e.event_id else st.lastEvent))
              case Some(st) if st.start - t > gapSec * 1000 =>
                // sorted order means t only grows, so the early track
                // merges or closes strictly left-to-right
                early match {
                  case Some(es) if t - es.last <= gapSec * 1000 =>
                    early = Some(es.copy(last = t, n = es.n + 1,
                      lastEvent = e.event_id))
                  case other =>
                    other.foreach(close)
                    early = Some(SessionState(t, t, 1, e.event_id, e.event_id))
                }
              case Some(st) =>
                close(st)
                cur = Some(SessionState(t, t, 1, e.event_id, e.event_id))
              case None =>
                cur = Some(SessionState(t, t, 1, e.event_id, e.event_id))
            }
          }
          // drain the early track: if a late chain grew to within the
          // gap of the open session, they are one session — merge;
          // otherwise the open session's existence > gap later proves
          // the early session closed in event time
          (early, cur) match {
            case (Some(es), Some(st)) if st.start - es.last <= gapSec * 1000 =>
              cur = Some(st.copy(start = es.start, n = st.n + es.n,
                firstEvent = es.firstEvent))
            case (Some(es), _) => close(es)
            case _ =>
          }
          if (state.hasTimedOut) {
            cur.foreach(st => out += Session(uid, st.n,
              (st.last - st.start) / 1000.0, st.firstEvent, st.lastEvent))
            state.remove()
          } else {
            cur.foreach(state.update)
            if (idleTimeout) state.setTimeoutDuration(s"${gapSec} seconds")
          }
          out.iterator
        })
  }
}
