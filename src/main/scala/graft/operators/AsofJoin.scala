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

  /** `payload` names the right-side columns to carry onto left rows
    * (NULL where no version precedes the row). Left columns are
    * preserved; payload names must not collide with left columns. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
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
    val unioned = lFull.unionByName(rTagged, allowMissingColumns = true)
    // right rows sort before left rows at equal ts → "<=" semantics
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w)))
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
             |ORDER BY event_id""".stripMargin))
  )
}
