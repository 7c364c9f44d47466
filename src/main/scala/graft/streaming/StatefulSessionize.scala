package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Stateful streaming sessionization — the per-key custom-state
  * primitive (SURVEY.md §2.11; batch analog is the e01 window
  * formulation), on BOTH arbitrary-state APIs:
  *
  *  - [[sessions]]: legacy `flatMapGroupsWithState` (Spark 2.2+),
  *    kept as the regression companion and for deployments pinned to
  *    the HDFS-backed state store;
  *  - [[sessionsTws]]: `transformWithState` / [[StatefulProcessor]]
  *    (Spark 4, SPARK-46815) — the PRODUCTION path (e04 rides it):
  *    typed [[ValueState]] handle, per-state [[TTLConfig]], RocksDB
  *    state store, so a billion-key session table costs executor
  *    disk, not heap.
  *
  * Both APIs run the SAME per-batch fold ([[foldBatch]]) — the twin
  * structurally cannot drift from the companion, and the shared unit
  * suite (OperatorsSpec) runs the same scenarios through both.
  *
  * State per user is O(1) (running session bounds, not buffered
  * events), so the operator's memory footprint is keys × a few longs —
  * the shape that survives unbounded streams. A processing-time timeout
  * flushes sessions for keys that go quiet (legacy API only; unused by
  * the roster, which replays bounded streams).
  *
  * == Known cross-batch limitation (append-mode, by design) ==
  * The early-session track (late events predating the open session by
  * more than the gap) is batch-local: once an early session is closed
  * and EMITTED at end of batch, a clustered late event arriving in a
  * LATER micro-batch that would have merged into it (e.g. t=100 in
  * batch 2, t=130 in batch 3, gap 60s) starts a fresh early session
  * instead — two emitted sessions where batch semantics would produce
  * one. Append-mode output cannot retract the first emission, so the
  * divergence is unavoidable; what the operator does instead is keep
  * the most recently closed session's bounds in state and DETECT the
  * divergence: pass a `splitCounter` accumulator and every such event
  * increments it, giving the pipeline an auditable measure of how much
  * its output diverges from the batch reference. Production streams
  * bound this by their real disorder window (events later than the gap
  * are rare by construction); a pipeline needing exact batch parity
  * must re-sessionize the affected keys in batch.
  */
object StatefulSessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_id: Long)
  final case class SessionState(start: Long, last: Long, n: Long,
      firstEvent: Long, lastEvent: Long,
      // bounds of the most recently CLOSED session (any track), kept
      // across batches purely so later batches can detect — not
      // retract — cross-batch early-session splits (see object doc)
      prevStart: Long = -1L, prevLast: Long = -1L)
  final case class Session(user_id: Long, n_events: Long, dur_sec: Double,
      first_event: Long, last_event: Long)

  /** ONE batch slice of ONE key through the session fold — the whole
    * operator semantics, shared verbatim by both API wrappers. Takes
    * the key's prior state, returns (sessions closed this batch, state
    * to persist). Events must arrive (ts, event_id)-sorted — the
    * contractual tie order that makes checkpoint replays admit
    * identical output. */
  private[streaming] def foldBatch(uid: Long, evsSorted: Seq[Event],
      prior: Option[SessionState], gapSec: Long,
      splitCounter: Option[org.apache.spark.util.LongAccumulator])
      : (Seq[Session], Option[SessionState]) = {
    var cur = prior
    // bounds of sessions closed in EARLIER batches (persisted) or
    // in this batch — used only to detect cross-batch splits
    var prevStart = prior.map(_.prevStart).getOrElse(-1L)
    var prevLast = prior.map(_.prevLast).getOrElse(-1L)
    // batch-local track for late events that predate the open
    // session by more than the gap: they form their own earlier
    // session(s), merged among themselves in sorted order, and
    // must never corrupt the open session's bounds
    var early: Option[SessionState] = None
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    def close(st: SessionState): Unit = {
      out += Session(uid, st.n, (st.last - st.start) / 1000.0,
        st.firstEvent, st.lastEvent)
      if (st.last > prevLast) { prevStart = st.start; prevLast = st.last }
    }
    val persistedPrevStart = prevStart
    val persistedPrevLast = prevLast
    evsSorted.foreach { e =>
      val t = e.ts.getTime
      // cross-batch split detection: this event would have merged
      // into a session already closed AND emitted by an earlier
      // batch (within the gap of its persisted bounds) — batch
      // semantics would produce one session, the stream two
      if (persistedPrevLast >= 0 &&
          t - persistedPrevLast <= gapSec * 1000 &&
          persistedPrevStart - t <= gapSec * 1000 &&
          cur.exists(st => st.start - t > gapSec * 1000))
        splitCounter.foreach(_.add(1))
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
    (out.toSeq,
      cur.map(_.copy(prevStart = prevStart, prevLast = prevLast)))
  }

  private def sorted(evs: Iterator[Event]): Seq[Event] =
    evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))

  /** Close a session after `gapSec` of inactivity within the stream —
    * legacy `flatMapGroupsWithState` API.
    *
    * `idleTimeout = true` additionally flushes a key's open session when
    * the key goes quiet wall-clock-wise (ProcessingTimeTimeout). Leave
    * it off for synchronous testing: under `processAllAvailable` the
    * timeout clock keeps scheduling evaluation batches and the call
    * never converges. */
  def sessions(events: Dataset[Event], gapSec: Long = 3600,
      idleTimeout: Boolean = false,
      splitCounter: Option[org.apache.spark.util.LongAccumulator] = None)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    val timeoutMode =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeoutMode)(
        (uid: Long, evs: Iterator[Event], state: GroupState[SessionState]) => {
          val (out, next) =
            foldBatch(uid, sorted(evs), state.getOption, gapSec, splitCounter)
          if (state.hasTimedOut) {
            val flushed = next.map(st => Session(uid, st.n,
              (st.last - st.start) / 1000.0, st.firstEvent, st.lastEvent))
            state.remove()
            (out ++ flushed).iterator
          } else {
            next.foreach(state.update)
            if (idleTimeout) state.setTimeoutDuration(s"${gapSec} seconds")
            out.iterator
          }
        })
  }

  private class SessProc(gapSec: Long,
      splitCounter: Option[org.apache.spark.util.LongAccumulator])
      extends StatefulProcessor[Long, Event, Session] {
    @transient private var st: ValueState[SessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      // TTLConfig.NONE: a session's state lives until the session
      // closes; a deployment wanting wall-clock idle flush would add a
      // processing-time timer here (the modern analog of the legacy
      // idleTimeout) — unused by the roster's bounded replays
      st = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timers: TimerValues): Iterator[Session] = {
      val prior = if (st.exists()) Some(st.get()) else None
      val (out, next) = foldBatch(uid, sorted(rows), prior, gapSec,
        splitCounter)
      next match {
        case Some(ns) => st.update(ns)
        case None => st.clear()
      }
      out.iterator
    }
  }

  /** [[sessions]] on the MODERN API — `transformWithState` with a
    * typed [[ValueState]] handle on the RocksDB store (required by the
    * API; [[graft.queries.EventQueries.streamSession]] defaults
    * streaming clones to it). Identical semantics by construction:
    * both wrappers run [[foldBatch]]. */
  def sessionsTws(events: Dataset[Event], gapSec: Long = 3600,
      splitCounter: Option[org.apache.spark.util.LongAccumulator] = None)(
      implicit spark: SparkSession): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessProc(gapSec, splitCounter),
        TimeMode.None(), OutputMode.Append())
  }
}
