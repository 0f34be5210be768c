package graft.streaming

import java.time.{Instant, LocalDate}

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming volume-anomaly monitor via `flatMapGroupsWithState`: the
  * stateful twin of the batch `q_anomaly_zscore` query (operators
  * .Behavioral), generalizing the reference's static row-count alert
  * bounds (src/cli.py EXPECT_MIN_ROWS/EXPECT_MAX_ROWS) to a
  * self-calibrating statistical gate that needs no configured thresholds.
  *
  * Semantics are PREQUENTIAL — each day is scored against the history of
  * days finalized before it — because that is the only causal option a
  * stream has (the batch query scores against the full window including
  * the future; a monitor cannot). A day finalizes when the watermark
  * passes its end: its count can no longer change, so the emitted score
  * is final (append-mode safe) and each day is emitted exactly once.
  *
  * State per event_type is three moment longs (n, Σc, Σc²) plus one
  * count per still-open day — bounded by the watermark horizon, not the
  * stream length. Moments are EXACT integers (the q_anomaly_zscore
  * convention): doubles enter only in the final mean/variance arithmetic,
  * so scores are independent of arrival order and micro-batch cuts.
  */
object AnomalyMonitor {

  final case class Ev(event_type: String, ts: Instant)

  /** open: epoch-day → running count for days the watermark hasn't
    * closed; nDays/s1/s2: exact moments over finalized days. */
  final case class MonState(
      open: Map[Long, Long], nDays: Long, s1: Long, s2: Long)

  /** One finalized day's score. `z` is None until two history days
    * exist (or when history variance is zero); `is_anomaly` mirrors the
    * batch |z| > 2 rule on the rounded score. */
  final case class DayScore(
      event_type: String, day: String, n: Long, z: Option[Double],
      is_anomaly: Boolean)

  private def toUs(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  private val DayUs = 86400L * 1000000L

  private def round3(d: Double): Double = math.rint(d * 1000) / 1000

  def updateGroup(
      etype: String, events: Iterator[Ev], state: GroupState[MonState])
      : Iterator[DayScore] = {
    val wmMs =
      try state.getCurrentWatermarkMs()
      catch { case scala.util.control.NonFatal(_) => Long.MaxValue }
    val wmUs = if (wmMs >= Long.MaxValue / 1000L) Long.MaxValue else wmMs * 1000L

    val st0 = state.getOption.getOrElse(MonState(Map.empty, 0L, 0L, 0L))
    var open = st0.open
    if (!state.hasTimedOut)
      for (e <- events) {
        val day = Math.floorDiv(toUs(e.ts), DayUs)
        open = open.updated(day, open.getOrElse(day, 0L) + 1L)
      }
    // a day is final when its END is at or below the watermark: every
    // admissible event (ts strictly below wm) for it has arrived
    val (ready, hold) = open.partition { case (day, _) =>
      (day + 1) * DayUs <= wmUs
    }
    var (n, s1, s2) = (st0.nDays, st0.s1, st0.s2)
    val out = Seq.newBuilder[DayScore]
    for ((day, c) <- ready.toSeq.sortBy(_._1)) {
      val z =
        if (n < 2) None
        else {
          val mean = s1 / n.toDouble
          val varS = (s2 - s1 * (s1 / n.toDouble)) / (n - 1).toDouble
          if (varS <= 0) None else Some(round3((c - mean) / math.sqrt(varS)))
        }
      out += DayScore(etype, LocalDate.ofEpochDay(day).toString, c, z,
        z.exists(v => math.abs(v) > 2.0))
      n += 1; s1 += c; s2 += c * c
    }
    state.update(MonState(hold, n, s1, s2))
    // wake when the watermark can next close an open day
    if (hold.nonEmpty)
      state.setTimeoutTimestamp(math.max(
        (hold.keys.min + 1) * 86400000L + 1, wmMs + 1))
    out.result().iterator
  }

  /** Wire a (streaming or batch) typed event Dataset into the monitor.
    * Streaming callers must set a watermark on `ts` before grouping; in
    * batch mode the watermark is +∞, so every day finalizes in day order
    * — prequential scoring over the complete log. */
  def scores(events: Dataset[Ev]): Dataset[DayScore] = {
    implicit val stateEnc = Encoders.product[MonState]
    implicit val outEnc = Encoders.product[DayScore]
    implicit val keyEnc = Encoders.STRING
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        updateGroup)
  }
}
