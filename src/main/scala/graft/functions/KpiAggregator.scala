package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed one-pass KPI aggregator (SURVEY §2.8 U7): the reference computes
  * ongoing/upcoming/total counts as three pandas passes
  * (src/app/streamlit_app.py:254-257); this folds them into one traversal.
  * Functionally the built-in `count(when(...))` trio is equivalent (and
  * what the declared q_kpi_counts uses); the Aggregator form is the
  * library's extension point for KPI sets that built-ins can't fuse.
  */
object KpiAggregator {

  final case class Kpi(ongoing: Long, upcoming: Long, total: Long)

  /** Aggregates a status column (PÅGÅR/KOMMANDE/other). */
  val byStatus: Aggregator[String, Kpi, Kpi] = new Aggregator[String, Kpi, Kpi] {
    override def zero: Kpi = Kpi(0, 0, 0)
    override def reduce(b: Kpi, status: String): Kpi = Kpi(
      b.ongoing + (if (status == "PÅGÅR") 1 else 0),
      b.upcoming + (if (status == "KOMMANDE") 1 else 0),
      b.total + 1)
    override def merge(a: Kpi, b: Kpi): Kpi =
      Kpi(a.ongoing + b.ongoing, a.upcoming + b.upcoming, a.total + b.total)
    override def finish(r: Kpi): Kpi = r
    override def bufferEncoder: Encoder[Kpi] = Encoders.product[Kpi]
    override def outputEncoder: Encoder[Kpi] = Encoders.product[Kpi]
  }
}
