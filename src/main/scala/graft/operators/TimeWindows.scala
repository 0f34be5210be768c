package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Event-time windowing beyond the reference's daily trend (the tumbling
  * 1-day count at src/app/streamlit_app.py:483-486, SURVEY §2.6 A3):
  * tumbling/sliding windows via `window()` and sessionization via
  * `session_window()`. Both are streaming-ready (the same expressions work
  * under `readStream` + watermark); batch oracles use date_trunc and a
  * gaps-and-islands rewrite respectively.
  */
object TimeWindows {

  val defs: Seq[QueryDef] = Seq(

    // tumbling 1-hour window (epoch-aligned, equals date_trunc)
    QueryDef(
      "q_hourly_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("hour_start"), col("n"))
        .orderBy("hour_start"),
      Some("""SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_start, count(*) AS n
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)),

    // sliding window (2h length, 1h slide): each event lands in two
    // windows; the oracle expands the window membership explicitly
    QueryDef(
      "q_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "2 hours", "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n"))
        .orderBy("w_start"),
      Some("""SELECT w_start, count(*) AS n FROM (
             |  SELECT unnest([date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR,
             |                 date_trunc('hour', CAST(ts AS TIMESTAMP))]) AS w_start
             |  FROM events)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // session windows, 1-hour inactivity gap; a session's end is
    // last-event + gap (Spark session_window semantics). The oracle is the
    // classic gaps-and-islands rewrite: flag gap-starts, running-sum to a
    // session id, aggregate.
    QueryDef(
      "q_session_window",
      (s, d) => Tables.events(s, d)
        .groupBy(session_window(col("ts"), "1 hour").as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"), col("n"))
        .orderBy("user_id", "session_start"),
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |x AS (SELECT user_id, ts,
             |        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                  <= INTERVAL 1 HOUR THEN 0 ELSE 1 END AS new_s
             |      FROM ev),
             |y AS (SELECT user_id, ts,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |      FROM x)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 1 HOUR AS session_end, count(*) AS n
             |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin)),

    // the CUSTOM stateful sessionizer (flatMapGroupsWithState,
    // streaming.Sessionize) run in batch mode under the same
    // gaps-and-islands oracle — batch input is complete, so the operator
    // must equal session_window row for row, which puts the hand-rolled
    // state machine itself under the hash-compare gate (not just its
    // SQL-builtin sibling above)
    QueryDef(
      "q_sessionize_custom",
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("timestamp").as("ts"), col("value"))
          .as[graft.streaming.Sessionize.Ev]
        graft.streaming.Sessionize.sessions(ev, 60 * 60 * 1000L).toDF()
          .select(col("user_id"),
            col("session_start").cast("timestamp_ntz").as("session_start"),
            col("session_end").cast("timestamp_ntz").as("session_end"),
            col("n"), round(col("total"), 4).as("total"))
          .orderBy("user_id", "session_start")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
             |x AS (SELECT user_id, ts, value,
             |        CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
             |                  <= INTERVAL 1 HOUR THEN 0 ELSE 1 END AS new_s
             |      FROM ev),
             |y AS (SELECT user_id, ts, value,
             |        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
             |      FROM x)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 1 HOUR AS session_end, count(*) AS n,
             |  round(sum(value), 4) AS total
             |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin))
  )
}
