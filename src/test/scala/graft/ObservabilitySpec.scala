package graft

import scala.collection.mutable

import graft.observability.RunReport
import org.apache.spark.sql.functions._

class ObservabilitySpec extends SparkSpec {
  import spark.implicits._

  private def statusDf = Seq("PÅGÅR", "PÅGÅR", "KOMMANDE", "PÅGÅR").toDF("status")

  test("report counts statuses in one pass and notifies start/done") {
    val msgs = mutable.ArrayBuffer.empty[String]
    val r = RunReport.report(statusDf, "status", notify = msgs += _)
    assert(r.rows == 4)
    assert(r.statusCounts == Map("PÅGÅR" -> 3, "KOMMANDE" -> 1))
    assert(r.anomaly.isEmpty)
    assert(msgs.head == "run started" && msgs.last.startsWith("run done: 4 rows"))
  }

  test("anomaly bounds: too few / too many / zero rows") {
    assert(RunReport.report(statusDf, "status", expectMin = 10).anomaly
      .exists(_.contains("expected min")))
    assert(RunReport.report(statusDf, "status", expectMax = 2).anomaly
      .exists(_.contains("expected max")))
    assert(RunReport.report(statusDf.limit(0), "status").anomaly
      .exists(_.contains("zero")))
  }

  test("MetricsListener captures completed actions") {
    val l = new RunReport.MetricsListener
    spark.listenerManager.register(l)
    try {
      Seq(1, 2, 3).toDF("x").count()
      // listener events are delivered asynchronously; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (l.snapshot.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(l.snapshot.exists { case (name, secs, ok) => ok && secs >= 0 })
    } finally spark.listenerManager.unregister(l)
  }

  test("KpiAggregator matches the built-in conditional counts") {
    val ds = statusDf.as[String]
    val kpi = ds.select(graft.functions.KpiAggregator.byStatus.toColumn).head()
    assert(kpi == graft.functions.KpiAggregator.Kpi(3, 1, 4))
  }
}
