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
  * Semantics match `session_window(gap)` exactly, INCLUDING late data:
  * state holds every session still above the watermark (not just the
  * newest), so a late event merges with whichever open session it
  * overlaps — two disjoint late events arriving in different
  * micro-batches that overlap each other still coalesce, which a
  * single-open-session design would wrongly split. A session is emitted
  * only once the watermark passes `last + gap` (no above-watermark event
  * can extend it), so results are final and state stays bounded by the
  * watermark exactly like the built-in. In batch mode (no watermark) the
  * input is complete, so every session closes at the end — batch output
  * equals `session_window` output row for row.
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)

  final case class SessionState(
      startMs: Long, lastMs: Long, n: Long, total: Double)

  /** All open (still-extendable) sessions for one key, disjoint and kept
    * sorted by start. Tiny in practice: only sessions above the watermark
    * survive an invocation. */
  final case class OpenSessions(sessions: Seq[SessionState])

  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n: Long, total: Double)

  private def toSession(user: Long, s: SessionState, gapMs: Long): Session =
    Session(user, new Timestamp(s.startMs), new Timestamp(s.lastMs + gapMs),
      s.n, s.total)

  /** One group invocation: fold this micro-batch's events (in ts order)
    * into the open-session list, then emit every session the watermark
    * has finalized. */
  def updateGroup(gapMs: Long)(
      user: Long, events: Iterator[Ev], state: GroupState[OpenSessions])
      : Iterator[Session] = {
    // streaming: the real watermark. Batch: GroupState has no watermark
    // (getCurrentWatermarkMs throws) — the input is complete, so every
    // session is final: treat the watermark as +inf and close them all.
    val wm =
      try state.getCurrentWatermarkMs()
      catch { case scala.util.control.NonFatal(_) => Long.MaxValue }

    var sessions = state.getOption.map(_.sessions.toList).getOrElse(Nil)
    if (!state.hasTimedOut) {
      for (e <- events.toSeq.sortBy(_.ts.getTime)) {
        val t = e.ts.getTime
        // session_window semantics: event [t, t+gap) merges with every
        // open session [start, last+gap) it overlaps. Sessions are
        // disjoint, so an event can touch at most two (its flanks) — a
        // bridging event fuses them into one.
        val (over, rest) = sessions.partition(s =>
          t <= s.lastMs + gapMs && t + gapMs >= s.startMs)
        val merged = over.foldLeft(SessionState(t, t, 1, e.value)) { (acc, s) =>
          SessionState(math.min(acc.startMs, s.startMs),
            math.max(acc.lastMs, s.lastMs), acc.n + s.n, acc.total + s.total)
        }
        sessions = merged :: rest
      }
    }
    val (done, open) = sessions.partition(_.lastMs + gapMs <= wm)
    if (open.isEmpty) state.remove()
    else {
      state.update(OpenSessions(open.sortBy(_.startMs)))
      // wake when the earliest open session becomes final; a timeout at or
      // below the current watermark is rejected by Spark — clamp above it
      state.setTimeoutTimestamp(
        math.max(open.map(_.lastMs + gapMs).min, wm + 1))
    }
    done.sortBy(_.startMs).map(toSession(user, _, gapMs)).iterator
  }

  /** Wire a (streaming or batch) typed event Dataset into sessionization.
    * Streaming callers must set a watermark on `ts` before grouping. */
  def sessions(events: Dataset[Ev], gapMs: Long): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSessions]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateGroup(gapMs))
  }
}
