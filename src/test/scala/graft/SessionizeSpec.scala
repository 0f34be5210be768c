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

  test("late overlapping event lowers session start; disjoint late event closes alone") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    // drive updateGroup directly with a fake in-order batch then a late one
    val gap = 60 * 60 * 1000L
    var held: Option[Sessionize.SessionState] = None
    val state = new GroupState[Sessionize.SessionState] {
      override def exists: Boolean = held.isDefined
      override def get: Sessionize.SessionState = held.get
      override def getOption: Option[Sessionize.SessionState] = held
      override def update(s: Sessionize.SessionState): Unit = held = Some(s)
      override def remove(): Unit = held = None
      override def hasTimedOut: Boolean = false
      override def setTimeoutDuration(d: Long): Unit = ()
      override def setTimeoutDuration(d: String): Unit = ()
      override def setTimeoutTimestamp(t: Long): Unit =
        assert(t >= 0, "timeout must be clamped non-negative")
      override def setTimeoutTimestamp(t: Long, additional: String): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
      override def setTimeoutTimestamp(t: java.sql.Date, additional: String): Unit = ()
      override def getCurrentWatermarkMs(): Long = 0L
      override def getCurrentProcessingTimeMs(): Long = 0L
    }
    def ev(s: String, v: Double) =
      Sessionize.Ev(1L, java.sql.Timestamp.valueOf(s), v)
    // open session 10:00–10:30
    val out1 = Sessionize.updateGroup(gap)(1L,
      Iterator(ev("2024-01-01 10:00:00", 1.0), ev("2024-01-01 10:30:00", 2.0)), state)
    assert(out1.isEmpty && held.get.n == 2)
    // late overlapping event 09:45 (within gap of start) → start lowers
    val out2 = Sessionize.updateGroup(gap)(1L,
      Iterator(ev("2024-01-01 09:45:00", 1.0)), state)
    assert(out2.isEmpty)
    assert(held.get.startMs == java.sql.Timestamp.valueOf("2024-01-01 09:45:00").getTime)
    // disjoint late event 06:00 → emitted alone, open session untouched
    val out3 = Sessionize.updateGroup(gap)(1L,
      Iterator(ev("2024-01-01 06:00:00", 9.0)), state).toSeq
    assert(out3.map(s => (s.n, s.total)) == Seq((1L, 9.0)))
    assert(held.get.n == 3)
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
