package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with the same key
  * and `rightTs <= leftTs` (SCD-style "version in effect at event time").
  * Spark has no native ASOF operator; the naive composition — a range
  * join then keep-latest — explodes to |left|×|versions-per-key| rows
  * before pruning, which is exactly what kills it at 100 TB.
  *
  * This implementation is the scale-correct union+window form: tag and
  * union both sides, sort within each key by (ts, right-first-on-ties),
  * and carry the right payload forward with `last(ignoreNulls)` over an
  * unbounded-preceding frame. One shuffle on the key, output ∝ input,
  * no intermediate blow-up. Right side must be unique per (key, ts).
  */
object AsofJoin {

  /** Tag both sides and union them on the shared (__ts, __is_r, payload)
    * shape — the input both as-of directions carry over. */
  private def tagUnion(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val rTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(1).as("__is_r")) ++
        payload.map(col): _*)
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__is_r", lit(0))
    val lFull = payload.foldLeft(lTagged)((df, p) =>
      df.withColumn(p, lit(null).cast(rTagged.schema(p).dataType)))
      .select(lTagged.columns.map(col) ++ payload.map(col): _*)
    lFull.unionByName(rTagged, allowMissingColumns = true)
  }

  /** `payload` names the right-side columns to carry onto left rows
    * (NULL where no version precedes the row). Left columns are
    * preserved; payload names must not collide with left columns. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val unioned = tagUnion(left, right, keys, leftTs, rightTs, payload)
    // right rows sort before left rows at equal ts → "<=" semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w)))
    carried.where(col("__is_r") === 0).drop("__ts", "__is_r")
  }

  /** Forward as-of: for every left row, the EARLIEST right row with the
    * same key and `rightTs >= leftTs` ("next version after the event").
    * Mirror image of [[asofJoin]]: left rows sort before right rows at
    * equal ts so ties are included, and the payload is pulled back with
    * `first(ignoreNulls)` over the current-row→unbounded-following frame.
    * Same scale shape — one shuffle on the key, no row blow-up. */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val unioned = tagUnion(left, right, keys, leftTs, rightTs, payload)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_r").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(p, first(col(p), ignoreNulls = true).over(w)))
    carried.where(col("__is_r") === 0).drop("__ts", "__is_r")
  }

  /** Range (interval) join: pairs within `toleranceSec` of each other on
    * the same key. A plain inequality join plans as a nested-loop at any
    * scale; bucketizing both sides to `toleranceSec`-wide time buckets
    * (the probe side exploded into its 3 adjacent buckets) turns it into
    * an equi-join on (key, bucket) + an exact residual filter — shuffle
    * ∝ input, candidate pairs ∝ true matches. */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, toleranceSec: Long): DataFrame = {
    // ntz → ltz is the identity under the pinned UTC session; unix_seconds
    // then gives bucket-able epoch seconds (TIMESTAMP_NTZ can't cast to
    // BIGINT directly)
    val bucket = (c: Column) =>
      (unix_seconds(c.cast("timestamp")) / toleranceSec).cast("long")
    val l = left.withColumn("__b", bucket(col(leftTs)))
    val r = right
      .withColumn("__b0", bucket(col(rightTs)))
      .withColumn("__b", explode(array(col("__b0") - 1, col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    l.join(r, keys :+ "__b")
      .where(col(leftTs) >= col(rightTs) - expr(s"INTERVAL $toleranceSec SECOND")
        && col(leftTs) <= col(rightTs) + expr(s"INTERVAL $toleranceSec SECOND"))
      .drop("__b")
  }

  val defs: Seq[QueryDef] = Seq(

    // events paired with same-user purchases within ±30 minutes —
    // bucketized range join vs the oracle's plain inequality join
    QueryDef(
      "q_range_join",
      (s, d) => {
        val ev = Tables.events(s, d).select("event_id", "user_id", "ts")
        val purchases = Tables.events(s, d)
          .where(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"), col("ts").as("p_ts"))
        rangeJoin(ev, purchases, Seq("user_id"), "ts", "p_ts", 1800)
          .where(col("event_id") =!= col("p_id"))
          .select("event_id", "p_id")
          .orderBy("event_id", "p_id")
      },
      Some("""SELECT e.event_id, p.event_id AS p_id
             |FROM events e JOIN events p
             |  ON e.user_id = p.user_id AND p.event_type = 'purchase'
             | AND e.event_id <> p.event_id
             | AND CAST(e.ts AS TIMESTAMP) >= CAST(p.ts AS TIMESTAMP) - INTERVAL 30 MINUTE
             | AND CAST(e.ts AS TIMESTAMP) <= CAST(p.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
             |ORDER BY 1, 2""".stripMargin)),

    // every event annotated with the user's latest purchase value at or
    // before that event (oracle: DuckDB's native ASOF LEFT JOIN)
    QueryDef(
      "q_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val versions = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("v_ts"),
            col("value").as("last_purchase"))
        asofJoin(
          ev.select("event_id", "user_id", "ts"),
          versions, Seq("user_id"), "ts", "v_ts", Seq("last_purchase"))
          .select("event_id", "user_id", "ts", "last_purchase")
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS v_ts, value AS last_purchase
             |      FROM events WHERE event_type = 'purchase')
             |SELECT e.event_id, e.user_id, e.ts, v.last_purchase
             |FROM e ASOF LEFT JOIN v ON e.user_id = v.user_id AND e.ts >= v.v_ts
             |ORDER BY event_id""".stripMargin)),

    // forward as-of: every event annotated with the user's NEXT purchase
    // value at or after the event ("time to next conversion" joins). The
    // oracle states the same semantics with a min-ts subquery + re-fetch,
    // over the tie-proof pre-aggregated version frame.
    QueryDef(
      "q_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        val v = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").as("v_ts"))
          .agg(max("value").as("next_purchase"))
        asofJoinForward(
          ev.select("event_id", "user_id", "ts"),
          v, Seq("user_id"), "ts", "v_ts", Seq("next_purchase"))
          .select("event_id", "user_id", "ts", "next_purchase")
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS v_ts, max(value) AS pval
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |n AS (SELECT e.event_id, min(v.v_ts) AS next_ts FROM e
             |      LEFT JOIN v ON v.user_id = e.user_id AND v.v_ts >= e.ts GROUP BY 1)
             |SELECT e.event_id, e.user_id, e.ts, nv.pval AS next_purchase
             |FROM e JOIN n USING (event_id)
             |LEFT JOIN v nv ON nv.user_id = e.user_id AND nv.v_ts = n.next_ts
             |ORDER BY event_id""".stripMargin)),

    // nearest-neighbor as-of: both directions carried in one pipeline
    // (backward pass feeds the forward pass — still two key-partitioned
    // windows over the same exchange), then the closer version wins with
    // backward preferred on exact distance ties. The sensor-alignment /
    // feature-join shape: every event annotated with its temporally
    // nearest purchase.
    QueryDef(
      "q_asof_nearest",
      (s, d) => {
        val ev = Tables.events(s, d)
        // pre-aggregate to one version per (user, ts): the carry helpers
        // require unique (key, ts) on the right, and the oracle's
        // re-fetch-by-max-ts join would duplicate rows on a tie. The
        // fixtures happen to have no (user_id, ts) purchase ties at any
        // SF, but the max() makes both engines deterministic by
        // construction rather than by data luck.
        val v = ev.where(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts").as("v_ts"))
          .agg(max("value").as("value"))
        val back = asofJoin(
          ev.select("event_id", "user_id", "ts"),
          v.select(col("user_id"), col("v_ts"),
            col("v_ts").as("prev_ts"), col("value").as("prev_val")),
          Seq("user_id"), "ts", "v_ts", Seq("prev_ts", "prev_val"))
        val both = asofJoinForward(
          back,
          v.select(col("user_id"), col("v_ts"),
            col("v_ts").as("next_ts"), col("value").as("next_val")),
          Seq("user_id"), "ts", "v_ts", Seq("next_ts", "next_val"))
        val dPrev = unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("prev_ts").cast("timestamp"))
        val dNext = unix_micros(col("next_ts").cast("timestamp")) -
          unix_micros(col("ts").cast("timestamp"))
        both.select(col("event_id"), col("user_id"), col("ts"),
            col("prev_ts"), col("next_ts"),
            when(col("prev_ts").isNull, col("next_val"))
              .when(col("next_ts").isNull, col("prev_val"))
              .when(dPrev <= dNext, col("prev_val"))
              .otherwise(col("next_val")).as("near_val"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS v_ts, max(value) AS pval
             |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
             |p AS (SELECT e.event_id, max(v.v_ts) AS prev_ts FROM e
             |      LEFT JOIN v ON v.user_id = e.user_id AND v.v_ts <= e.ts GROUP BY 1),
             |n AS (SELECT e.event_id, min(v.v_ts) AS next_ts FROM e
             |      LEFT JOIN v ON v.user_id = e.user_id AND v.v_ts >= e.ts GROUP BY 1)
             |SELECT e.event_id, e.user_id, e.ts, p.prev_ts, n.next_ts,
             |  CASE WHEN p.prev_ts IS NULL THEN nv.pval
             |       WHEN n.next_ts IS NULL THEN pv.pval
             |       WHEN (e.ts - p.prev_ts) <= (n.next_ts - e.ts) THEN pv.pval
             |       ELSE nv.pval END AS near_val
             |FROM e JOIN p USING (event_id) JOIN n USING (event_id)
             |LEFT JOIN v pv ON pv.user_id = e.user_id AND pv.v_ts = p.prev_ts
             |LEFT JOIN v nv ON nv.user_id = e.user_id AND nv.v_ts = n.next_ts
             |ORDER BY event_id""".stripMargin)),

    // POINT-IN-TIME-correct feature join — the feature-store op that
    // keeps training labels leak-free: every purchase label joins the
    // user's most recent DAILY feature snapshot that closed STRICTLY
    // before the label's day (features for day d publish at end-of-d,
    // so the as-of cutoff is label_day − 1). Rides [[asofJoin]]'s
    // union+window form — one user-keyed shuffle, output ∝ labels, no
    // |labels|×|snapshots| fan-out (what the naive range join does and
    // what kills PIT joins at 100 TB). The report groups labels by
    // feature age; `leaks` counts feat_day ≥ label_day rows and MUST be
    // zero — the audit column is the point; first-day labels with no
    // prior snapshot surface as age −1 (cold start), never silently
    // dropped.
    QueryDef(
      "q_pit_features",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("user_id"),
          col("ts").cast("date").as("day"), col("event_type"), col("event_id"),
          expr("CAST(round(value*1000) AS BIGINT)").as("v"))
        val fd = ev.groupBy("user_id", "day")
          .agg(count(lit(1)).as("acts"), sum("v").as("vsum"))
          .withColumn("feat_day", col("day"))
        val lb = ev.where(col("event_type") === "purchase")
          .select(col("user_id"), col("day").as("label_day"), col("event_id"))
          .withColumn("cutoff", date_add(col("label_day"), -1))
        val j = asofJoin(lb,
          fd.select("user_id", "day", "acts", "vsum", "feat_day"),
          Seq("user_id"), "cutoff", "day", Seq("acts", "vsum", "feat_day"))
        j.groupBy(coalesce(datediff(col("label_day"), col("feat_day")), lit(-1))
            .cast("int").as("age_days"))
          .agg(count(lit(1)).as("n_labels"),
            coalesce(sum(expr("CAST(acts AS DECIMAL(38,0))")), lit(0))
              .cast("long").as("feat_acts"),
            coalesce(sum(expr("CAST(vsum AS DECIMAL(38,0))")), lit(0))
              .cast("long").as("feat_vsum_milli"),
            count(when(col("feat_day") >= col("label_day"), 1)).as("leaks"))
          .orderBy("age_days")
      },
      Some("""WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |      event_id, event_type, CAST(round(value*1000) AS BIGINT) AS v
             |    FROM events),
             |fd AS (SELECT user_id, day, count(*) AS acts, sum(v) AS vsum
             |       FROM ev GROUP BY 1, 2),
             |lb AS (SELECT user_id, day AS label_day, event_id FROM ev
             |       WHERE event_type = 'purchase'),
             |pit AS (SELECT l.user_id, l.event_id, l.label_day, max(f.day) AS feat_day
             |        FROM lb l JOIN fd f ON f.user_id = l.user_id AND f.day < l.label_day
             |        GROUP BY 1, 2, 3),
             |j AS (SELECT l.label_day, p.feat_day, f.acts, f.vsum
             |      FROM lb l
             |      LEFT JOIN pit p ON p.event_id = l.event_id
             |      LEFT JOIN fd f ON f.user_id = l.user_id AND f.day = p.feat_day)
             |SELECT CAST(coalesce(date_diff('day', feat_day, label_day), -1) AS INT) AS age_days,
             |  count(*) AS n_labels,
             |  CAST(coalesce(sum(CAST(acts AS HUGEINT)), 0) AS BIGINT) AS feat_acts,
             |  CAST(coalesce(sum(CAST(vsum AS HUGEINT)), 0) AS BIGINT) AS feat_vsum_milli,
             |  CAST(count(CASE WHEN feat_day >= label_day THEN 1 END) AS BIGINT) AS leaks
             |FROM j GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
