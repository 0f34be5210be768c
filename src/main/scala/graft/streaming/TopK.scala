package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters via the Space-Saving summary (Metwally et al.,
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005): per group, at most `capacity` counters; an
  * unmonitored arrival evicts the minimum counter and inherits its count
  * as overestimation error.
  *
  * Invariants carried by every emitted row (and pinned in TopKSpec):
  *   - no undercount: est ≥ true frequency;
  *   - bounded overcount: est − err ≤ true frequency;
  *   - coverage: any item with true frequency > N/capacity is monitored.
  *
  * Counting is arrival-order-insensitive in its GUARANTEES (not its exact
  * estimates), so unlike the funnel no watermark buffering is needed —
  * state is a fixed-size array per group, the stream-side analogue of
  * `q_cms_topk`'s one-pass sketch. With capacity ≥ distinct items the
  * summary is exact and equals the batch group-count (TopKSpec parity).
  *
  * Emitted in Update mode: each micro-batch re-emits the group's current
  * summary (downstream upsert keyed on (group, item), same latest-wins
  * merge as IncrementalUpsert).
  */
object TopK {

  final case class Item(group: String, item: Long)

  final case class Counter(item: Long, est: Long, err: Long)

  final case class Summary(counters: Seq[Counter], total: Long)

  final case class HeavyHitter(
      group: String, item: Long, est: Long, err: Long, stream_total: Long)

  /** Fold one batch of arrivals into a summary. Deterministic eviction:
    * the minimum (est, item) counter goes first. Takes IterableOnce so a
    * group's iterator streams straight through — never materialized. */
  private[graft] def fold(st: Summary, items: IterableOnce[Long], capacity: Int): Summary = {
    val m = scala.collection.mutable.LinkedHashMap(
      st.counters.map(c => c.item -> c): _*)
    var total = st.total
    for (it <- items.iterator) {
      total += 1
      m.get(it) match {
        case Some(c) => m(it) = c.copy(est = c.est + 1)
        case None if m.size < capacity => m(it) = Counter(it, 1L, 0L)
        case None =>
          val victim = m.values.minBy(c => (c.est, c.item))
          m.remove(victim.item)
          m(it) = Counter(it, victim.est + 1, victim.est)
      }
    }
    Summary(m.values.toSeq, total)
  }

  private def updateGroup(capacity: Int)(
      group: String, events: Iterator[Item], state: GroupState[Summary])
      : Iterator[HeavyHitter] = {
    // the iterator streams through the fold — a group (at batch scale,
    // EVERY row of one key) is never buffered in memory
    val st = fold(state.getOption.getOrElse(Summary(Nil, 0L)),
      events.map(_.item), capacity)
    state.update(st)
    st.counters.sortBy(c => (-c.est, c.item))
      .map(c => HeavyHitter(group, c.item, c.est, c.err, st.total))
      .iterator
  }

  /** Wire a (streaming or batch) keyed Dataset into per-group summaries.
    * In batch mode the single fold makes this one pass, fixed memory —
    * the degenerate case equals running the stream in one micro-batch. */
  def heavyHitters(ds: Dataset[Item], capacity: Int): Dataset[HeavyHitter] = {
    implicit val stateEnc = Encoders.product[Summary]
    implicit val outEnc = Encoders.product[HeavyHitter]
    implicit val keyEnc = Encoders.STRING
    ds.groupByKey(_.group)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        updateGroup(capacity))
  }
}
