package graft.streaming

import java.time.Instant

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
  * equals `session_window` output row for row (`q_sessionize_custom`
  * holds the operator to that under the DuckDB oracle).
  *
  * Time is tracked in epoch MICROseconds — Spark's native timestamp
  * resolution — so sub-millisecond event times survive (a millisecond
  * clock truncates them and session bounds drift from the built-in).
  */
object Sessionize {

  final case class Ev(user_id: Long, ts: Instant, value: Double)

  final case class SessionState(
      startUs: Long, lastUs: Long, n: Long, total: Double)

  /** All open (still-extendable) sessions for one key, disjoint and kept
    * sorted by start. Tiny in practice: only sessions above the watermark
    * survive an invocation. */
  final case class OpenSessions(sessions: Seq[SessionState])

  final case class Session(
      user_id: Long, session_start: Instant, session_end: Instant,
      n: Long, total: Double)

  private def toUs(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  private def toInstant(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  private def toSession(user: Long, s: SessionState, gapUs: Long): Session =
    Session(user, toInstant(s.startUs), toInstant(s.lastUs + gapUs),
      s.n, s.total)

  /** One group invocation: fold this micro-batch's events (in ts order)
    * into the open-session list, then emit every session the watermark
    * has finalized. */
  def updateGroup(gapMs: Long)(
      user: Long, events: Iterator[Ev], state: GroupState[OpenSessions])
      : Iterator[Session] = {
    val gapUs = gapMs * 1000L
    // streaming: the real watermark (millis → micros). Batch: GroupState
    // has no watermark (getCurrentWatermarkMs throws) — the input is
    // complete, so every session is final: treat the watermark as +inf
    // and close them all.
    val wmMs =
      try state.getCurrentWatermarkMs()
      catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    val wmUs = if (wmMs >= Long.MaxValue / 1000L) Long.MaxValue else wmMs * 1000L

    var sessions = state.getOption.map(_.sessions.toList).getOrElse(Nil)
    if (!state.hasTimedOut) {
      for (e <- events.toSeq.sortBy(ev => toUs(ev.ts))) {
        val t = toUs(e.ts)
        // session_window semantics: event [t, t+gap) merges with every
        // open session [start, last+gap) it overlaps. Sessions are
        // disjoint, so an event can touch at most two (its flanks) — a
        // bridging event fuses them into one.
        val (over, rest) = sessions.partition(s =>
          t <= s.lastUs + gapUs && t + gapUs >= s.startUs)
        val merged = over.foldLeft(SessionState(t, t, 1, e.value)) { (acc, s) =>
          SessionState(math.min(acc.startUs, s.startUs),
            math.max(acc.lastUs, s.lastUs), acc.n + s.n, acc.total + s.total)
        }
        sessions = merged :: rest
      }
    }
    // STRICT bound: Spark admits events with ts == watermark, and the
    // merge rule above is inclusive (t <= last + gap) — finalizing at
    // last+gap == wm would emit a session that an admissible on-time
    // event could still legally extend, splitting it spuriously
    val (done, open) = sessions.partition(_.lastUs + gapUs < wmUs)
    if (open.isEmpty) state.remove()
    else {
      state.update(OpenSessions(open.sortBy(_.startUs)))
      // wake when the earliest open session becomes final (micros →
      // millis, rounded UP so the timeout never fires early); a timeout
      // at or below the current watermark is rejected by Spark — clamp
      state.setTimeoutTimestamp(
        math.max(Math.ceil(open.map(_.lastUs + gapUs).min / 1000.0).toLong, wmMs + 1))
    }
    done.sortBy(_.startUs).map(toSession(user, _, gapUs)).iterator
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
