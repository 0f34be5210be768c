package graft.observability

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Run observability (SURVEY §2.7 T5/T7): the reference notifies Slack at
  * start/fetched/normalized/done/error and alerts when the row count falls
  * outside EXPECT_MIN/MAX_ROWS (src/cli.py:43-99, src/utils/notifier.py).
  *
  * Engine-side equivalents: a pluggable notifier callback (webhook POST in
  * production; the transport is not an engine concern), a one-pass KPI
  * report, and a QueryExecutionListener capturing per-query wall time the
  * way src/app/etl_runner.py:223-230 self-times.
  */
object RunReport {

  final case class EtlReport(
      rows: Long,
      statusCounts: Map[String, Long],
      seconds: Double,
      anomaly: Option[String])

  /** One-pass KPI + anomaly-bounds report over a finished batch
    * (reference src/cli.py:77-99). `expectMin`/`expectMax` of 0 disable
    * the corresponding bound, like the reference env defaults. */
  def report(df: DataFrame, statusCol: String,
      expectMin: Long = 0, expectMax: Long = 0,
      notify: String => Unit = _ => ()): EtlReport = {
    val t0 = System.nanoTime()
    notify("run started")
    val counts = df.groupBy(col(statusCol)).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => Option(r.getString(0)).getOrElse("<null>") -> r.getLong(1))
      .toMap
    val rows = counts.values.sum
    val anomaly =
      if (rows == 0) Some("row count is zero")
      else if (expectMin > 0 && rows < expectMin) Some(s"rows $rows < expected min $expectMin")
      else if (expectMax > 0 && rows > expectMax) Some(s"rows $rows > expected max $expectMax")
      else None
    val seconds = (System.nanoTime() - t0) / 1e9
    anomaly match {
      case Some(a) => notify(s"run done with warning: $a")
      case None => notify(f"run done: $rows rows in $seconds%.1f s")
    }
    EtlReport(rows, counts, seconds, anomaly)
  }

  /** Captures (queryName, wall seconds, success) per completed action on
    * the session it's registered with. */
  final class MetricsListener extends QueryExecutionListener {
    private val events = mutable.ArrayBuffer.empty[(String, Double, Boolean)]

    def snapshot: Seq[(String, Double, Boolean)] = events.synchronized(events.toSeq)

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      events.synchronized { events += ((funcName, durationNs / 1e9, true)) }

    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
      events.synchronized { events += ((funcName, 0.0, false)) }
  }
}
