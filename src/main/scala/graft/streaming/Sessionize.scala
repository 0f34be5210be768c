package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * reference has no session concept (SURVEY §2.7 note: "no session
  * windows"); this is north-star scope for event-stream analytics —
  * arbitrary-state counterpart to the SQL `session_window` operator
  * (operators.TimeWindows): use this form when a session needs state the
  * built-in can't carry (running aggregates, per-session caps, custom
  * close conditions).
  *
  * Semantics match `session_window(gap)`: an event within `gap` of the
  * session's last event extends it; otherwise the open session closes
  * (emitted) and a new one starts. Sessions also close via event-time
  * timeout once the watermark passes last+gap, so state is bounded by the
  * watermark exactly like the built-in.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)

  final case class SessionState(
      startMs: Long, lastMs: Long, n: Long, total: Double)

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n: Long, total: Double)

  private def toSession(user: Long, s: SessionState, gapMs: Long): Session =
    Session(user, new Timestamp(s.startMs), new Timestamp(s.lastMs + gapMs),
      s.n, s.total)

  /** One group invocation: fold this micro-batch's events (in ts order)
    * into the open session, emitting every session that a gap closes. */
  def updateGroup(gapMs: Long)(
      user: Long, events: Iterator[Ev], state: GroupState[SessionState])
      : Iterator[Session] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(toSession(user, _, gapMs)).iterator
      state.remove()
      return out
    }
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    for (e <- events.toSeq.sortBy(_.ts.getTime)) {
      val t = e.ts.getTime
      open match {
        // session_window semantics: event [t, t+gap) merges iff it
        // overlaps the open session [start, last+gap) — on either side
        // (a late-but-overlapping event may LOWER the start)
        case Some(s) if t <= s.lastMs + gapMs && t + gapMs >= s.startMs =>
          open = Some(s.copy(startMs = math.min(s.startMs, t),
            lastMs = math.max(s.lastMs, t), n = s.n + 1,
            total = s.total + e.value))
        case Some(s) if t > s.lastMs + gapMs =>
          // strictly after: close the open session, start a new one
          closed += toSession(user, s, gapMs)
          open = Some(SessionState(t, t, 1, e.value))
        case Some(s) =>
          // strictly before (disjoint late event): it can never merge
          // with anything newer, emit it as its own closed session
          closed += toSession(user, SessionState(t, t, 1, e.value), gapMs)
        case None =>
          open = Some(SessionState(t, t, 1, e.value))
      }
    }
    open match {
      case Some(s) =>
        state.update(s)
        // a timeout below the current watermark is rejected by Spark —
        // clamp when a late event re-opened state after its natural close
        // (batch mode has no watermark: getCurrentWatermarkMs throws)
        val wm =
          try state.getCurrentWatermarkMs()
          catch { case scala.util.control.NonFatal(_) => Long.MinValue }
        state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, wm + 1))
      case None => state.remove()
    }
    closed.result().iterator
  }

  /** Wire a (streaming or batch) typed event Dataset into sessionization.
    * Streaming callers must set a watermark on `ts` before grouping. */
  def sessions(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateGroup(gapMs))
  }
}
