package graft

import java.nio.file.Files

import graft.streaming.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def evDf(rows: Seq[(Long, String, Double)]) =
    rows.toDF("user_id", "s", "value")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("value"))

  test("stateful sessionization across two streaming runs closes gapped sessions") {
    val dir = Files.createTempDirectory("graft-sess").toString
    val (src, out, chk) = (s"$dir/src", s"$dir/out", s"$dir/chk")

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("user_id LONG, ts TIMESTAMP, value DOUBLE").parquet(src)
        .withWatermark("ts", "10 minutes")
        .as[Sessionize.Ev]
      val q = Sessionize.sessions(stream, gapMs = 60 * 60 * 1000L)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // run 1: two events 10 min apart → one open session (nothing emitted)
    evDf(Seq((1L, "2024-01-01 00:00:00", 1.0), (1L, "2024-01-01 00:10:00", 2.0)))
      .write.mode("append").parquet(src)
    runOnce()

    // run 2: event 5 h later → closes the first session, opens another
    evDf(Seq((1L, "2024-01-01 05:00:00", 7.0)))
      .write.mode("append").parquet(src)
    runOnce()

    val sessions = spark.read.parquet(out)
      .orderBy("session_start")
      .as[Sessionize.Session].collect()
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.user_id == 1L && s.n == 2 && s.total == 3.0)
    assert(s.session_start.toString == "2024-01-01 00:00:00.0")
    assert(s.session_end.toString == "2024-01-01 01:10:00.0") // last + 1h gap
  }

  test("batch mode agrees with session_window on in-batch gaps") {
    val events = evDf(Seq(
      (1L, "2024-01-01 00:00:00", 1.0), (1L, "2024-01-01 00:30:00", 2.0),
      (1L, "2024-01-01 03:00:00", 4.0),
      (2L, "2024-01-01 00:00:00", 8.0))).as[Sessionize.Ev]
    // batch flatMapGroupsWithState emits only gap-closed sessions (the
    // final open ones stay in "state"); compare against session_window
    // restricted to the same closed sessions
    val closed = Sessionize.sessions(events, 60 * 60 * 1000L)
      .collect().map(s => (s.user_id, s.session_start.toString, s.n, s.total))
    assert(closed.toSeq == Seq((1L, "2024-01-01 00:00:00.0", 2L, 3.0)))
  }
}
