package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel via `flatMapGroupsWithState`: the stateful
  * twin of the batch `q_funnel` query (operators.Behavioral) — per user,
  * view → click → purchase with strict min-ts semantics (each stage's
  * timestamp is the EARLIEST qualifying event strictly after the prior
  * stage).
  *
  * Order sensitivity is the whole problem: a click that arrives late but
  * carries an earlier timestamp must win the click stage over a
  * later-timestamped click that arrived first. Folding arrivals directly
  * would emit the wrong transition; instead events BUFFER in state until
  * the watermark passes them, then fold in timestamp order — at that
  * point no admissible event can precede them, so every emitted
  * transition is final (append-mode safe) and equals what the batch
  * query computes from the complete log. State is bounded by the
  * watermark horizon: the buffer only holds events the watermark hasn't
  * reached.
  *
  * In batch mode (no watermark) the input is complete: everything folds,
  * and the last transition per user equals `q_funnel`'s stage column —
  * `FunnelSpec` pins that batch parity.
  */
object Funnel {

  final case class Ev(user_id: Long, ts: Instant, event_type: String)

  /** Stage timestamps in epoch micros (None = stage not reached) plus
    * the above-watermark event buffer. */
  final case class FunnelState(
      buffer: Seq[Ev], viewUs: Option[Long], clickUs: Option[Long],
      purchaseUs: Option[Long])

  final case class StageAdvance(user_id: Long, stage: String, at: Instant)

  private def toUs(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  def updateGroup(
      user: Long, events: Iterator[Ev], state: GroupState[FunnelState])
      : Iterator[StageAdvance] = {
    val wmMs =
      try state.getCurrentWatermarkMs()
      catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    val wmUs = if (wmMs >= Long.MaxValue / 1000L) Long.MaxValue else wmMs * 1000L

    val st0 = state.getOption.getOrElse(FunnelState(Nil, None, None, None))
    val buffered = st0.buffer ++ (if (state.hasTimedOut) Nil else events.toSeq)
    // strictly-below-watermark events are final (an on-time event may
    // still arrive AT the watermark); fold them oldest-first
    val (ready, hold) = buffered.partition(e => toUs(e.ts) < wmUs)
    var (v, c, p) = (st0.viewUs, st0.clickUs, st0.purchaseUs)
    val out = Seq.newBuilder[StageAdvance]
    for (e <- ready.sortBy(ev => toUs(ev.ts))) {
      val t = toUs(e.ts)
      e.event_type match {
        case "view" if v.isEmpty =>
          v = Some(t); out += StageAdvance(user, "view", e.ts)
        case "click" if v.isDefined && c.isEmpty && t > v.get =>
          c = Some(t); out += StageAdvance(user, "click", e.ts)
        case "purchase" if c.isDefined && p.isEmpty && t > c.get =>
          p = Some(t); out += StageAdvance(user, "purchase", e.ts)
        case _ => // already past this stage, or out of order for it
      }
    }
    // the completed-stage state is kept as a tombstone even once the
    // funnel finishes: dropping it would let a later event for the same
    // user start a FRESH state and re-emit stage transitions (duplicate
    // output). State is then bounded by |users|, not the watermark — the
    // right trade for a funnel, whose per-user state is three longs.
    state.update(FunnelState(hold, v, c, p))
    // buffered events fold only when the watermark moves — without a
    // wake-up a quiet user's buffer would never drain
    if (hold.nonEmpty)
      state.setTimeoutTimestamp(math.max(
        Math.ceil(hold.map(e => toUs(e.ts)).min / 1000.0).toLong + 1, wmMs + 1))
    out.result().iterator
  }

  /** Wire a (streaming or batch) typed event Dataset into the funnel.
    * Streaming callers must set a watermark on `ts` before grouping. */
  def stages(events: Dataset[Ev]): Dataset[StageAdvance] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[StageAdvance]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateGroup)
  }
}
