package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-behavior analytics over the `events` stream table: slowly-changing
  * dimension (type-2) state tracking, weekly cohort retention, and an
  * ordered conversion funnel. These are the warehouse-side query shapes the
  * reference's dashboard aggregations (SURVEY §2.6) generalize to once the
  * grain is "user over time" instead of "row over columns".
  *
  * All three shuffle exactly once on `user_id` (the natural partition key);
  * at 100 TB the same plans hold with `user_id`-bucketed storage, which
  * removes even that exchange.
  */
object Behavioral {

  val defs: Seq[QueryDef] = Seq(

    // SCD type-2 build: compress each user's event-type history into
    // validity intervals [valid_from, valid_to) with a version counter,
    // keeping only CHANGE rows (consecutive duplicate states collapse).
    // One window partition per user — no self-join, no second shuffle:
    // lag() finds change points, a conditional running count numbers the
    // versions, lead() over the change rows closes each interval.
    QueryDef(
      "q_scd2",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val changes = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("prev", lag("event_type", 1).over(w))
          .where(col("prev").isNull || col("prev") =!= col("event_type"))
        val wc = Window.partitionBy("user_id").orderBy("ts", "event_id")
        changes
          .withColumn("version", row_number().over(wc))
          .withColumn("valid_to", lead("ts", 1).over(wc))
          .select(col("user_id"), col("version"), col("event_type"),
            col("ts").as("valid_from"), col("valid_to"),
            col("valid_to").isNull.as("is_current"))
          .orderBy("user_id", "version")
      },
      Some("""WITH o AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |ch AS (SELECT * FROM o WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id,
             |  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version,
             |  event_type, ts AS valid_from,
             |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
             |FROM ch
             |ORDER BY user_id, version""".stripMargin)),

    // weekly cohort retention: users grouped by first-seen ISO week, then
    // counted in each later week they were active. Two aggregations (first
    // touch per user; distinct user-weeks) and one join, all keyed on
    // user_id — the exchange is reused across the stages.
    QueryDef(
      "q_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
        val first = ev.groupBy("user_id").agg(min("wk").as("cohort"))
        val active = ev.distinct()
        active.join(first, "user_id")
          .withColumn("week_offset",
            (datediff(col("wk"), col("cohort")) / 7).cast("int"))
          .groupBy("cohort", "week_offset")
          .agg(countDistinct("user_id").as("n_users"))
          .orderBy("cohort", "week_offset")
      },
      Some("""WITH ev AS (SELECT user_id,
             |    CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
             |  FROM events),
             |first AS (SELECT user_id, min(wk) AS cohort FROM ev GROUP BY 1),
             |active AS (SELECT DISTINCT user_id, wk FROM ev)
             |SELECT f.cohort,
             |  CAST(date_diff('day', f.cohort, a.wk) / 7 AS INT) AS week_offset,
             |  count(DISTINCT a.user_id) AS n_users
             |FROM active a JOIN first f USING (user_id)
             |GROUP BY 1, 2
             |ORDER BY 1, 2""".stripMargin)),

    // RFM segmentation — recency / frequency / monetary quartiles per
    // user, the classic product-analytics cut. One user-keyed
    // aggregation, then global ntile windows over the tiny per-user
    // frame (|users| rows). At 100 TB the quartile boundaries come from
    // approx-quantile cut points broadcast back instead of a global
    // sort; the per-user aggregate stage is unchanged. Monetary sums in
    // exact integer cents; every ntile ordering carries a user_id
    // tiebreak so ranks are engine-deterministic.
    QueryDef(
      "q_rfm",
      (s, d) => {
        val m = Tables.events(s, d).groupBy("user_id").agg(
          datediff(lit("2024-02-01").cast("date"), max(to_date(col("ts"))))
            .as("recency_days"),
          count(lit(1)).as("frequency"),
          coalesce(sum(when(col("event_type") === "purchase",
            expr("CAST(round(value * 100) AS BIGINT)"))), lit(0L))
            .as("monetary_cents"))
        // three GLOBAL quartile assignments without partitionless ntile
        // windows (which funnel every user through one task — Spark warns
        // `WindowExec: No Partition Defined`) AND without three chained
        // range shuffles: GlobalOrder.withGlobalNtiles ranks all three
        // orderings in ONE skinny exploded shuffle, broadcasts the nine
        // quartile boundary keys back, and assigns tiles map-side — the
        // per-user frame itself never shuffles. Descending dimensions
        // ride as negated keys; user_id is the shared tiebreak. The
        // oracle below still uses native ntile() — hash equality proves
        // the boundary-key formulation IS the single-node semantics.
        val tot = m.agg(count(lit(1)).cast("long").as("_go_n"))
        GlobalOrder.withGlobalNtiles(m,
          Seq((col("recency_days").cast("long"), "r_quartile"),
            (-col("frequency"), "f_quartile"),
            (-col("monetary_cents"), "m_quartile")),
          col("user_id"), 4, Some(tot))
          .select("user_id", "recency_days", "frequency", "monetary_cents",
            "r_quartile", "f_quartile", "m_quartile")
          .orderBy("user_id")
      },
      Some("""WITH m AS (SELECT user_id,
             |    CAST(date_diff('day', max(CAST(ts AS TIMESTAMP)),
             |      TIMESTAMP '2024-02-01 00:00:00') AS INT) AS recency_days,
             |    count(*) AS frequency,
             |    coalesce(CAST(sum(CAST(round(value * 100) AS BIGINT))
             |      FILTER (WHERE event_type = 'purchase') AS BIGINT), 0) AS monetary_cents
             |  FROM events GROUP BY 1)
             |SELECT user_id, recency_days, frequency, monetary_cents,
             |  CAST(ntile(4) OVER (ORDER BY recency_days, user_id) AS INT) AS r_quartile,
             |  CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f_quartile,
             |  CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, user_id) AS INT) AS m_quartile
             |FROM m ORDER BY user_id""".stripMargin)),

    // CDC-style state diff: latest-wins state per user at two points in
    // time, full-outer-joined and classified added / changed / unchanged
    // (removed arises with deletion events, which this append-only
    // fixture lacks). The two snapshot builds share one user_id exchange;
    // null-safe <=> comparisons make NULL attribute flips count as
    // changes. This is the query shape behind incremental publication:
    // ship only the 'added'/'changed' rows downstream.
    QueryDef(
      "q_cdc_diff",
      (s, d) => {
        def stateAt(cutoff: Option[String]) = {
          val w = Window.partitionBy("user_id")
            .orderBy(col("ts").desc, col("event_id").desc)
          val ev = Tables.events(s, d)
          cutoff.fold(ev)(c => ev.where(col("ts") < lit(c).cast("timestamp_ntz")))
            .withColumn("rn", row_number().over(w))
            .where(col("rn") === 1)
            .select("user_id", "event_type", "value")
        }
        val s1 = stateAt(Some("2024-01-03 00:00:00"))
          .select(col("user_id").as("u1"), col("event_type").as("old_type"),
            col("value").as("v1"))
        val s2 = stateAt(None)
          .select(col("user_id").as("u2"), col("event_type").as("new_type"),
            col("value").as("v2"))
        s1.join(s2, col("u1") === col("u2"), "full_outer")
          .select(
            coalesce(col("u1"), col("u2")).as("user_id"),
            when(col("u1").isNull, "added")
              .when(col("u2").isNull, "removed")
              .when(col("old_type") <=> col("new_type") &&
                col("v1") <=> col("v2"), "unchanged")
              .otherwise("changed").as("change"),
            col("old_type"), col("new_type"))
          .orderBy("user_id")
      },
      Some("""WITH s1 AS (SELECT user_id, event_type, value FROM (
             |    SELECT user_id, event_type, value,
             |      row_number() OVER (PARTITION BY user_id
             |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
             |    FROM events
             |    WHERE CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-03 00:00:00')
             |  WHERE rn = 1),
             |s2 AS (SELECT user_id, event_type, value FROM (
             |    SELECT user_id, event_type, value,
             |      row_number() OVER (PARTITION BY user_id
             |        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
             |    FROM events) WHERE rn = 1)
             |SELECT coalesce(s1.user_id, s2.user_id) AS user_id,
             |  CASE WHEN s1.user_id IS NULL THEN 'added'
             |       WHEN s2.user_id IS NULL THEN 'removed'
             |       WHEN s1.event_type IS NOT DISTINCT FROM s2.event_type
             |        AND s1.value IS NOT DISTINCT FROM s2.value THEN 'unchanged'
             |       ELSE 'changed' END AS change,
             |  s1.event_type AS old_type, s2.event_type AS new_type
             |FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id
             |ORDER BY user_id""".stripMargin)),

    // ordered conversion funnel view → click → purchase: each later stage
    // must happen strictly AFTER the user's earliest completion of the
    // prior stage (min-ts semantics, not mere set membership — a purchase
    // before the first view does not convert). Three conditional
    // aggregations, each one user_id-keyed shuffle; the two stage joins
    // are on the 150-row per-user frames and broadcast.
    QueryDef(
      "q_funnel",
      (s, d) => {
        val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
        val v = ev.where(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("view_ts"))
        val c = ev.join(v, "user_id")
          .where(col("event_type") === "click" && col("ts") > col("view_ts"))
          .groupBy("user_id").agg(min("ts").as("click_ts"))
        val p = ev.join(c, "user_id")
          .where(col("event_type") === "purchase" && col("ts") > col("click_ts"))
          .groupBy("user_id").agg(min("ts").as("purchase_ts"))
        Tables.events(s, d).select("user_id").distinct()
          .join(v, Seq("user_id"), "left")
          .join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("view_ts"), col("click_ts"),
            col("purchase_ts"),
            when(col("purchase_ts").isNotNull, "purchase")
              .when(col("click_ts").isNotNull, "click")
              .when(col("view_ts").isNotNull, "view")
              .otherwise("none").as("stage"))
          .orderBy("user_id")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
             |v AS (SELECT user_id, min(ts) AS view_ts FROM ev
             |      WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.ts) AS click_ts FROM ev e JOIN v USING (user_id)
             |      WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1),
             |p AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM ev e JOIN c USING (user_id)
             |      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1)
             |SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
             |  CASE WHEN p.purchase_ts IS NOT NULL THEN 'purchase'
             |       WHEN c.click_ts IS NOT NULL THEN 'click'
             |       WHEN v.view_ts IS NOT NULL THEN 'view'
             |       ELSE 'none' END AS stage
             |FROM (SELECT DISTINCT user_id FROM ev) u
             |LEFT JOIN v USING (user_id)
             |LEFT JOIN c USING (user_id)
             |LEFT JOIN p USING (user_id)
             |ORDER BY u.user_id""".stripMargin)),

    // k-anonymity audit — the privacy gate a dataset release runs next
    // to PII scrubbing (q_pii_scrub): project the table to its quasi-
    // identifiers (event type, day, coarse value band) and flag every
    // combination observed fewer than k = 5 times — rows in those groups
    // are re-identifiable by the QI tuple alone. One map-side-combined
    // aggregate; shuffle ∝ distinct QI tuples, never rows. NULL values
    // band to a sentinel so the group-by is total and the cross-engine
    // ordering never compares NULLs (Spark sorts them first, DuckDB
    // last).
    QueryDef(
      "q_k_anonymity",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          coalesce(floor(col("value") / 50).cast("int"), lit(-9999))
            .as("value_band"))
        .groupBy("event_type", "day", "value_band")
        .agg(count(lit(1)).as("n"))
        .withColumn("at_risk", (col("n") < 5).cast("int"))
        .orderBy("event_type", "day", "value_band"),
      Some("""SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |  coalesce(CAST(floor(value / 50) AS INT), -9999) AS value_band,
             |  count(*) AS n,
             |  CAST(count(*) < 5 AS INT) AS at_risk
             |FROM events GROUP BY 1, 2, 3
             |ORDER BY event_type, day, value_band""".stripMargin)),

    // volume-anomaly screen — the monitoring aggregate behind the
    // reference's row-count alert bounds (cli.py EXPECT_MIN/MAX_ROWS),
    // done statistically: per event_type daily counts, z-scored against
    // that type's own distribution across days, |z| > 2 flagged. The
    // moments come from EXACT integer sums (n, Σc, Σc²) — doubles enter
    // only in the final mean/variance arithmetic, so the result is
    // bit-identical under any partitioning/merge order, unlike a naive
    // stddev_samp whose Welford merges are order-sensitive. Two hash
    // aggs (day grain, then type grain) + one broadcast join back;
    // shuffle ∝ distinct (type, day), trivially scale-stable.
    QueryDef(
      "q_anomaly_zscore",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        val moments = daily.groupBy("event_type")
          .agg(count(lit(1)).as("n_days"), sum("c").as("s1"),
            sum(col("c") * col("c")).as("s2"))
        // degenerate guards mirror streaming.AnomalyMonitor exactly: a
        // type with <2 days or zero variance has no defined z (NULL, not
        // an engine-specific inf/NaN from the zero divisor) and is never
        // flagged
        val varExpr =
          """(s2 - s1 * (s1 / CAST(n_days AS DOUBLE))) / (n_days - 1)"""
        daily.join(broadcast(moments), "event_type")
          .select(col("event_type"), col("day"), col("c"), expr(
            s"""CASE WHEN n_days < 2 OR $varExpr <= 0 THEN NULL
               |ELSE round((c - s1 / CAST(n_days AS DOUBLE))
               |  / sqrt($varExpr), 3) END""".stripMargin).as("z"))
          .withColumn("is_anomaly",
            coalesce(abs(col("z")) > 2.0, lit(false)).cast("int"))
          .orderBy("event_type", "day")
      },
      Some {
        val varSql =
          "(s2 - s1 * (s1 / CAST(n_days AS DOUBLE))) / (n_days - 1)"
        s"""WITH daily AS (
           |  SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
           |    count(*) AS c
           |  FROM events GROUP BY 1, 2),
           |m AS (SELECT event_type, count(*) AS n_days,
           |    CAST(sum(c) AS BIGINT) AS s1, CAST(sum(c * c) AS BIGINT) AS s2
           |  FROM daily GROUP BY 1),
           |z AS (SELECT event_type, day, c,
           |    CASE WHEN n_days < 2 OR $varSql <= 0 THEN NULL
           |    ELSE round((c - s1 / CAST(n_days AS DOUBLE))
           |      / sqrt($varSql), 3) END AS z
           |  FROM daily JOIN m USING (event_type))
           |SELECT event_type, day, c, z,
           |  CAST(coalesce(abs(z) > 2.0, FALSE) AS INT) AS is_anomaly
           |FROM z ORDER BY event_type, day""".stripMargin
      }),

    // cumulative distinct users by day — the growth curve every
    // dashboard wants and the aggregation naive SQL gets catastrophically
    // wrong at scale (count(DISTINCT) over an expanding window rescans
    // the prefix per day). The scalable identity: a user contributes to
    // the cumulative count from their FIRST day onward, so cum_users(d)
    // = Σ_{d' ≤ d} new_users(d') — one user-keyed aggregate (shuffle ∝
    // users), one day-grain aggregate, and a prefix sum over the ≤ #days
    // result (the only partitionless window, provably bounded by the
    // calendar — whitelisted in PlanAuditSpec).
    QueryDef(
      "q_cume_distinct",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val ev = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val firstSeen = ev.groupBy("user_id").agg(min("day").as("day"))
          .groupBy("day").agg(count(lit(1)).as("new_users"))
        val days = ev.select("day").distinct()
        days.join(firstSeen, Seq("day"), "left")
          .na.fill(0L, Seq("new_users"))
          .withColumn("cum_users",
            sum("new_users").over(
              Window.orderBy("day")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .orderBy("day")
      },
      Some("""WITH ev AS (SELECT user_id,
             |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
             |f AS (SELECT user_id, min(day) AS day FROM ev GROUP BY 1),
             |n AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1),
             |days AS (SELECT DISTINCT day FROM ev)
             |SELECT days.day, CAST(coalesce(n.new_users, 0) AS BIGINT) AS new_users,
             |  CAST(sum(coalesce(n.new_users, 0)) OVER (ORDER BY days.day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS cum_users
             |FROM days LEFT JOIN n USING (day)
             |ORDER BY day""".stripMargin)),

    // Event-type Markov transition matrix: (from, to) counts over each
    // user's time-ordered event sequence, plus the row-normalized share in
    // integer micros. The lead() window shuffles once on user_id (same key
    // as every query in this file — bucketed storage removes it at scale);
    // the per-from_type normalizing window runs over the AGGREGATED
    // |types|² table (≤ dozens of rows), never the raw events, so the
    // bounded-domain partition is post-agg and skew-free.
    QueryDef(
      "q_event_transitions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val seq = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
          .withColumn("to_type", lead("event_type", 1).over(w))
          .where(col("to_type").isNotNull)
        val counts = seq.groupBy(col("event_type").as("from_type"), col("to_type"))
          .agg(count(lit(1)).as("n"))
        counts
          .withColumn("from_total",
            sum("n").over(Window.partitionBy("from_type")))
          .select(col("from_type"), col("to_type"), col("n"),
            expr("(n * CAST(1000000 AS BIGINT)) div from_total").as("share_micro"))
          .orderBy("from_type", "to_type")
      },
      Some("""WITH seq AS (
             |  SELECT event_type AS from_type,
             |         lead(event_type) OVER (PARTITION BY user_id
             |           ORDER BY ts, event_id) AS to_type
             |  FROM events)
             |SELECT from_type, to_type, count(*) AS n,
             |  (count(*) * 1000000) // CAST(sum(count(*))
             |     OVER (PARTITION BY from_type) AS BIGINT) AS share_micro
             |FROM seq WHERE to_type IS NOT NULL
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // time-BOUNDED funnel: q_funnel's ordered stages with a 24 h max gap
    // per step (a click only converts within a day of the first view, a
    // purchase within a day of that click) — the form product analytics
    // actually reports, since unbounded funnels only ever grow. Output is
    // the 3-row stage-count summary; the three per-user stage frames join
    // left-to-right and are counted in ONE aggregate (explode fans the
    // single summary row out), so the events scan's per-stage subtrees
    // share their user_id exchanges instead of running once per stage
    // row.
    QueryDef(
      "q_windowed_funnel",
      (s, d) => {
        val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
        val v = ev.where(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("view_ts"))
        val c = ev.join(v, "user_id")
          .where(col("event_type") === "click" && col("ts") > col("view_ts") &&
            col("ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
          .groupBy("user_id").agg(min("ts").as("click_ts"))
        val p = ev.join(c, "user_id")
          .where(col("event_type") === "purchase" && col("ts") > col("click_ts") &&
            col("ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
          .groupBy("user_id").agg(min("ts").as("purchase_ts"))
        val summary = v.join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .agg(count("view_ts").as("n_view"), count("click_ts").as("n_click"),
            count("purchase_ts").as("n_purchase"))
        summary.select(explode(array(
            struct(lit("1_view").as("stage"), col("n_view").as("users")),
            struct(lit("2_click").as("stage"), col("n_click").as("users")),
            struct(lit("3_purchase").as("stage"), col("n_purchase").as("users"))))
            .as("r"))
          .select("r.*")
          .orderBy("stage")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |              CAST(ts AS TIMESTAMP) AS ts FROM events),
             |v AS (SELECT user_id, min(ts) AS view_ts FROM ev
             |      WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.ts) AS click_ts
             |      FROM ev e JOIN v USING (user_id)
             |      WHERE e.event_type = 'click' AND e.ts > v.view_ts
             |        AND e.ts <= v.view_ts + INTERVAL 24 HOUR GROUP BY 1),
             |p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
             |      FROM ev e JOIN c USING (user_id)
             |      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
             |        AND e.ts <= c.click_ts + INTERVAL 24 HOUR GROUP BY 1)
             |SELECT stage, users FROM (
             |  SELECT '1_view' AS stage, count(*) AS users FROM v
             |  UNION ALL SELECT '2_click', count(*) FROM c
             |  UNION ALL SELECT '3_purchase', count(*) FROM p)
             |ORDER BY stage""".stripMargin)),

    // time-to-convert distribution: RANK-EXACT p25/p50/p75/p90 of the
    // view→click delay in whole seconds over converting users — the
    // latency histogram beside the funnel counts. Rank-ceil percentiles
    // ((q·n + 99) div 100, the q_winsorize convention) cannot drift by an
    // ulp across engines the way interpolating ones do. The duration
    // table is one row per converting user — user-scaled, so its global
    // rank rides GlobalOrder's range shuffle (never a partitionless
    // window funneling every converter through one task) and the four
    // percentile ranks are generated from the one-row count and
    // broadcast-joined back, the q_equidepth_hist shape: the big side
    // is touched once per pass, fully parallel at any scale.
    QueryDef(
      "q_time_to_convert",
      (s, d) => {
        val ev = Tables.events(s, d).select("user_id", "event_type", "ts")
        val v = ev.where(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("view_ts"))
        val c = ev.join(v, "user_id")
          .where(col("event_type") === "click" && col("ts") > col("view_ts"))
          .groupBy("user_id").agg(min("ts").as("click_ts"))
        val dur = c.join(v, "user_id")
          .select(col("user_id"),
            (unix_timestamp(col("click_ts")) - unix_timestamp(col("view_ts")))
              .as("secs"))
        val r = GlobalOrder.withGlobalRowNumber(dur,
          Seq(col("secs").asc, col("user_id").asc), "rn")
        val edgeRanks = dur.agg(count(lit(1)).as("n"))
          .select(explode(array(lit(25), lit(50), lit(75), lit(90))).as("q"),
            col("n"))
          .select(col("q"), expr("(q * n + 99) div 100").as("rn"))
        r.join(broadcast(edgeRanks), "rn")
          .select(col("q"), col("secs")).orderBy("q")
      },
      Some("""WITH ev AS (SELECT user_id, event_type,
             |              CAST(ts AS TIMESTAMP) AS ts FROM events),
             |v AS (SELECT user_id, min(ts) AS view_ts FROM ev
             |      WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(e.ts) AS click_ts
             |      FROM ev e JOIN v USING (user_id)
             |      WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1),
             |dur AS (SELECT c.user_id,
             |          CAST(date_diff('second', v.view_ts, c.click_ts) AS BIGINT) AS secs
             |        FROM c JOIN v USING (user_id)),
             |r AS (SELECT secs, row_number() OVER (ORDER BY secs, user_id) AS rn,
             |        count(*) OVER () AS n FROM dur)
             |SELECT q, secs FROM (
             |  SELECT 25 AS q, secs FROM r WHERE rn = (25*n + 99) // 100
             |  UNION ALL SELECT 50, secs FROM r WHERE rn = (50*n + 99) // 100
             |  UNION ALL SELECT 75, secs FROM r WHERE rn = (75*n + 99) // 100
             |  UNION ALL SELECT 90, secs FROM r WHERE rn = (90*n + 99) // 100)
             |ORDER BY q""".stripMargin)),

    // first-touch attribution: every user's purchase count and micro-
    // quantized purchase value credited to the event type that FIRST
    // brought them in (rank-1 by ts with event_id tiebreak — argmin made
    // deterministic). Two user_id-keyed frames joined on the same key;
    // the report aggregate is map-combined over the bounded type domain.
    QueryDef(
      "q_first_touch",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select("user_id", "event_type", "value", "ts", "event_id")
        val wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val ft = ev.withColumn("rn", row_number().over(wu))
          .where(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("first_touch"))
        val pv = ev.where(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(sum(round(col("value") * 1e6).cast("long")).as("value_micro"),
            count(lit(1)).as("purchases"))
        ft.join(pv, Seq("user_id"), "left")
          .groupBy("first_touch")
          .agg(count(lit(1)).as("users"),
            coalesce(sum("purchases"), lit(0L)).as("purchases"),
            coalesce(sum("value_micro"), lit(0L)).as("value_micro"))
          .orderBy("first_touch")
      },
      Some("""WITH ev AS (SELECT user_id, event_type, value,
             |              CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
             |ft AS (SELECT user_id, event_type AS first_touch FROM (
             |    SELECT user_id, event_type,
             |      row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |    FROM ev) WHERE rn = 1),
             |pv AS (SELECT user_id,
             |         CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             |           AS value_micro,
             |         count(*) AS purchases
             |       FROM ev WHERE event_type = 'purchase' GROUP BY 1)
             |SELECT f.first_touch, count(*) AS users,
             |  CAST(coalesce(sum(p.purchases), 0) AS BIGINT) AS purchases,
             |  CAST(coalesce(sum(p.value_micro), 0) AS BIGINT) AS value_micro
             |FROM ft f LEFT JOIN pv p USING (user_id)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // feature-drift monitor: Population Stability Index of the `value`
    // distribution, first calendar half vs second — the gate that flags
    // "this feature's distribution moved" before a model ever sees it.
    // Laplace-smoothed band shares (+1 count, +bands denominator) keep
    // every ln finite; per-band terms are nano-quantized BEFORE the sum
    // (the q_domain_kl convention) so the cross-engine total is an exact
    // integer. The whole thing is two tiny aggregates over one scan —
    // band domain is fixed (10 bands), every join after the count table
    // is broadcast.
    QueryDef(
      "q_feature_drift",
      (s, d) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp_ntz")
        val tagged = Tables.events(s, d).where(col("value").isNotNull)
          .select(when(col("ts") < cut, "a").otherwise("b").as("half"),
            least(greatest(floor(col("value") / 100).cast("int"), lit(0)), lit(9))
              .as("band"))
        val cnt = tagged.groupBy("half", "band").agg(count(lit(1)).as("n"))
        val tot = cnt.groupBy("half").agg(sum("n").as("t"))
        val ta = tot.where(col("half") === "a").select(col("t").as("ta"))
        val tb = tot.where(col("half") === "b").select(col("t").as("tb"))
        val a = cnt.where(col("half") === "a").select(col("band"), col("n").as("na"))
        val b = cnt.where(col("half") === "b").select(col("band"), col("n").as("nb"))
        val p = cnt.select("band").distinct()
          .join(a, Seq("band"), "left").join(b, Seq("band"), "left")
          .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
          .select(
            ((coalesce(col("na"), lit(0L)) + lit(1)).cast("double") /
              (col("ta") + lit(10)).cast("double")).as("pa"),
            ((coalesce(col("nb"), lit(0L)) + lit(1)).cast("double") /
              (col("tb") + lit(10)).cast("double")).as("pb"))
        p.select(round((col("pa") - col("pb")) * log(col("pa") / col("pb")) * lit(1e9))
            .cast("long").as("term_nano"))
          .agg(sum("term_nano").cast("long").as("psi_nano"),
            count(lit(1)).as("bands"))
      },
      Some("""WITH ev AS (SELECT value, CAST(ts AS TIMESTAMP) AS ts
             |            FROM events WHERE value IS NOT NULL),
             |tagged AS (SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00'
             |                    THEN 'a' ELSE 'b' END AS half,
             |             least(greatest(CAST(floor(value / 100) AS INT), 0), 9) AS band
             |           FROM ev),
             |cnt AS (SELECT half, band, count(*) AS n FROM tagged GROUP BY 1, 2),
             |tot AS (SELECT half, sum(n) AS t FROM cnt GROUP BY 1),
             |bands AS (SELECT DISTINCT band FROM cnt),
             |p AS (SELECT b.band,
             |        CAST(coalesce(a.n, 0) + 1 AS DOUBLE) / (ta.t + 10) AS pa,
             |        CAST(coalesce(c.n, 0) + 1 AS DOUBLE) / (tb.t + 10) AS pb
             |      FROM bands b
             |      LEFT JOIN cnt a ON a.band = b.band AND a.half = 'a'
             |      LEFT JOIN cnt c ON c.band = b.band AND c.half = 'b'
             |      CROSS JOIN (SELECT t FROM tot WHERE half = 'a') ta
             |      CROSS JOIN (SELECT t FROM tot WHERE half = 'b') tb),
             |terms AS (SELECT band,
             |            CAST(round((pa - pb) * ln(pa / pb) * 1e9) AS BIGINT) AS term_nano
             |          FROM p)
             |SELECT CAST(sum(term_nano) AS BIGINT) AS psi_nano, count(*) AS bands
             |FROM terms""".stripMargin)),

    // activity concentration: decile-bucketed user activity (decile 1 =
    // most active tenth) with each decile's share of ALL events — the
    // "top 10% of users generate X% of traffic" skew number that sizes
    // salting/AQE decisions for user-keyed work. The user table is
    // data-sized, so the decile rank rides GlobalOrder's range shuffle
    // (q_ppl_buckets' tertile convention, oracled against DuckDB's
    // native ntile); the share denominators broadcast.
    QueryDef(
      "q_activity_concentration",
      (s, d) => {
        val pu = Tables.events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("n"))
        val ranked = GlobalOrder.withGlobalNtile(
          pu, Seq(col("n").desc, col("user_id")), 10, "decile")
        val tot = pu.agg(sum("n").as("t"))
        ranked.crossJoin(broadcast(tot))
          .groupBy("decile")
          .agg(count(lit(1)).as("users"), sum("n").as("events"),
            expr("(sum(n) * CAST(1000000 AS BIGINT)) div max(t)").as("share_micro"))
          .orderBy("decile")
      },
      Some("""WITH pu AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
             |r AS (SELECT user_id, n,
             |        ntile(10) OVER (ORDER BY n DESC, user_id) AS decile FROM pu),
             |tot AS (SELECT sum(n) AS t FROM pu)
             |SELECT decile, count(*) AS users, CAST(sum(n) AS BIGINT) AS events,
             |  CAST((sum(n) * 1000000) // max(t.t) AS BIGINT) AS share_micro
             |FROM r CROSS JOIN tot t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // acquisition-cohort report over the RELATIONAL fact table: customers
    // grouped by first-order month, with total orders, orders-per-
    // customer in exact micros, and lifetime value in integer cents —
    // the q_cohort_retention shape applied to the orders table (cohort
    // analytics are not events-only). Two map-combined aggregates, keyed
    // on customer then on the bounded month domain.
    QueryDef(
      "q_orders_cohort",
      (s, d) => {
        val fo = Tables.orders(s, d).groupBy("o_custkey")
          .agg(min(col("o_orderdate")).as("first_dt"),
            count(lit(1)).as("n_orders"),
            sum(round(col("o_totalprice") * 100).cast("long")).as("value_cents"))
        fo.groupBy(to_date(date_trunc("month", col("first_dt"))).as("cohort_month"))
          .agg(count(lit(1)).as("customers"),
            sum("n_orders").as("orders_total"),
            expr("(sum(n_orders) * CAST(1000000 AS BIGINT)) div count(1)")
              .as("orders_per_cust_micro"),
            sum("value_cents").as("value_cents"))
          .orderBy("cohort_month")
      },
      Some("""WITH fo AS (SELECT o_custkey,
             |              min(CAST(o_orderdate AS TIMESTAMP)) AS first_dt,
             |              count(*) AS n_orders,
             |              sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS value_cents
             |            FROM orders GROUP BY 1)
             |SELECT CAST(date_trunc('month', first_dt) AS DATE) AS cohort_month,
             |  count(*) AS customers, CAST(sum(n_orders) AS BIGINT) AS orders_total,
             |  CAST((sum(n_orders) * 1000000) // count(*) AS BIGINT)
             |    AS orders_per_cust_micro,
             |  CAST(sum(value_cents) AS BIGINT) AS value_cents
             |FROM fo GROUP BY 1 ORDER BY 1""".stripMargin)),

    // l-diversity audit — k-anonymity's sharper sibling (q_k_anonymity
    // checks group SIZE; this checks group VARIETY): for each
    // quasi-identifier group (day, value band), how many distinct values
    // of the SENSITIVE attribute (event type) appear? A group where
    // everyone shares one sensitive value leaks it to anyone who can
    // place a person in the group, however large the group is. Reports
    // the weak groups (l < 3). One map-combined aggregate; NULL values
    // band to a sentinel (the q_k_anonymity convention).
    QueryDef(
      "q_l_diversity",
      (s, d) => Tables.events(s, d)
        .select(to_date(col("ts")).as("day"),
          coalesce(floor(col("value") / 100).cast("int"), lit(-9999))
            .as("value_band"),
          col("event_type"))
        .groupBy("day", "value_band")
        .agg(count(lit(1)).as("rows_n"),
          countDistinct("event_type").as("l"))
        .where(col("l") < 3)
        .orderBy("day", "value_band"),
      Some("""WITH g AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |             coalesce(CAST(floor(value / 100) AS INT), -9999) AS value_band,
             |             event_type
             |           FROM events)
             |SELECT day, value_band, count(*) AS rows_n,
             |  CAST(count(DISTINCT event_type) AS BIGINT) AS l
             |FROM g GROUP BY 1, 2 HAVING count(DISTINCT event_type) < 3
             |ORDER BY 1, 2""".stripMargin)),

    // A/B experiment readout: users deterministically hash-assigned to
    // arms (md5 — seedless, replayable, cross-engine identical, the
    // q_split_assign convention), per-arm purchase intensity and value
    // per user in exact integer micros. The assignment-at-analysis-time
    // form is what an experimentation pipeline runs when arms were
    // assigned by the same hash at serving time. Two user-keyed
    // aggregates joined on the key; the report is |arms| rows.
    QueryDef(
      "q_ab_assign",
      (s, d) => {
        val arm = Tables.events(s, d).select("user_id").distinct()
          .withColumn("arm",
            when(substring(md5(concat(lit("ab:"), col("user_id"))), 1, 1) < "8",
              "A").otherwise("B"))
        val m = Tables.events(s, d).groupBy("user_id")
          .agg(count(when(col("event_type") === "purchase", 1)).as("purchases"),
            coalesce(sum(when(col("event_type") === "purchase",
              round(col("value") * 1e6).cast("long"))), lit(0L)).as("value_micro"))
        arm.join(m, "user_id")
          .groupBy("arm")
          .agg(count(lit(1)).as("users"),
            sum("purchases").as("purchases"),
            expr("(sum(purchases) * CAST(1000000 AS BIGINT)) div count(1)")
              .as("purchases_per_user_micro"),
            expr("sum(value_micro) div count(1)").as("value_per_user_micro"))
          .orderBy("arm")
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |arm AS (SELECT user_id,
             |          CASE WHEN substr(md5('ab:' || user_id), 1, 1) < '8'
             |               THEN 'A' ELSE 'B' END AS arm
             |        FROM u),
             |m AS (SELECT user_id,
             |        count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
             |        CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
             |              THEN CAST(round(value * 1000000) AS BIGINT) END), 0) AS BIGINT)
             |          AS value_micro
             |      FROM events GROUP BY 1)
             |SELECT a.arm, count(*) AS users, CAST(sum(m.purchases) AS BIGINT) AS purchases,
             |  CAST((sum(m.purchases) * 1000000) // count(*) AS BIGINT)
             |    AS purchases_per_user_micro,
             |  CAST(sum(m.value_micro) // count(*) AS BIGINT) AS value_per_user_micro
             |FROM arm a JOIN m USING (user_id) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // seasonal-naive forecast BACKTEST: predict each day's event count
    // with the count seven days earlier and report the mean/max absolute
    // percentage error in integer micros — the baseline every real
    // forecasting model must beat, and the shape of a backtest harness
    // (join actuals to lagged actuals; error ∝ days, not rows). The
    // daily counts are one map-combined aggregate; the lag join is on
    // the bounded day domain.
    QueryDef(
      "q_seasonal_naive",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
        val j = daily.as("a")
          .join(daily.as("b"), expr("b.day = a.day - INTERVAL 7 DAYS"))
          .select(expr("(abs(a.n - b.n) * CAST(1000000 AS BIGINT)) div a.n")
            .as("ape_micro"))
        j.agg(count(lit(1)).as("days"),
          expr("sum(ape_micro) div count(1)").as("mape_micro"),
          max("ape_micro").as("max_ape_micro"))
      },
      Some("""WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |                 count(*) AS n
             |               FROM events GROUP BY 1),
             |j AS (SELECT a.day, a.n AS actual, b.n AS forecast,
             |        (abs(a.n - b.n) * 1000000) // a.n AS ape_micro
             |      FROM daily a JOIN daily b ON b.day = a.day - INTERVAL 7 DAY)
             |SELECT count(*) AS days,
             |  CAST(sum(ape_micro) // count(*) AS BIGINT) AS mape_micro,
             |  CAST(max(ape_micro) AS BIGINT) AS max_ape_micro
             |FROM j""".stripMargin)),

    // week-over-week growth report: per (week, event type), the count
    // and its signed delta vs the prior week in integer micros — the
    // dashboard trend table with the division done in exact integers so
    // a -24.56% never differs in the last digit across engines. One
    // map-combined aggregate; the lag join runs on the bounded
    // week × type domain.
    QueryDef(
      "q_wow_growth",
      (s, d) => {
        val w = Tables.events(s, d)
          .groupBy(to_date(date_trunc("week", col("ts"))).as("week"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val a = w.select(col("week"), col("event_type"), col("n"))
        val b = w.select(date_add(col("week"), 7).as("week"),
          col("event_type"), col("n").as("prev_n"))
        a.join(b, Seq("week", "event_type"))
          .select(col("week"), col("event_type"), col("n"), col("prev_n"),
            expr("((n - prev_n) * CAST(1000000 AS BIGINT)) div prev_n")
              .as("wow_micro"))
          .orderBy("week", "event_type")
      },
      Some("""WITH w AS (SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE)
             |             AS week, event_type, count(*) AS n
             |           FROM events GROUP BY 1, 2)
             |SELECT a.week, a.event_type, a.n, b.n AS prev_n,
             |  CAST(((a.n - b.n) * 1000000) // b.n AS BIGINT) AS wow_micro
             |FROM w a JOIN w b ON b.event_type = a.event_type
             |  AND b.week = a.week - INTERVAL 7 DAY
             |ORDER BY a.week, a.event_type""".stripMargin)),

    // quantile-grain drift: rank-exact p50/p90/p99 of `value` in each
    // calendar half, side by side with the signed delta — WHERE the
    // distribution moved, beside q_feature_drift's one-number PSI (a
    // clean median with a runaway tail is a different incident than a
    // wholesale shift). Per-half ranks ride ONE GlobalOrder range
    // shuffle on (half, value): the global row number minus the
    // broadcast first-half size IS the second half's local rank — no
    // per-half window ever funnels half the table through one task.
    QueryDef(
      "q_quantile_drift",
      (s, d) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp_ntz")
        val ev = Tables.events(s, d).where(col("value").isNotNull)
          .select(when(col("ts") < cut, "a").otherwise("b").as("half"),
            round(col("value") * 1e6).cast("long").as("vm"), col("event_id"))
        val ranked = GlobalOrder.withGlobalRowNumber(
          ev, Seq(col("half"), col("vm"), col("event_id")), "grn")
        val sizes = ev.groupBy("half").agg(count(lit(1)).as("n"))
        val na = sizes.where(col("half") === "a").select(col("n").as("na"))
        // ONE pass over the ranked frame (r15 consolidation — the three
        // rank-filter branches re-scanned it once per quantile): the six
        // target ranks (3 quantiles × 2 halves) are precomputed as
        // GLOBAL row numbers in the broadcast 2-row sizes frame — the
        // per-half local rank t maps to global rank t (half a) or
        // na + t (half b), and the two per-half target ranges are
        // disjoint, so a plain grn equi-join picks the exact six rows
        // map-side with no full-frame projection at all
        val targets = sizes.crossJoin(broadcast(na))
          .select(col("half"), col("n"), col("na"),
            explode(array(lit(50), lit(90), lit(99))).as("q"))
          .select(col("q"),
            (when(col("half") === "a", lit(0L)).otherwise(col("na")) +
              expr("(q * n + 99) div 100")).as("grn"))
        val qs = ranked.join(broadcast(targets), "grn")
          .select(col("q"), col("half"), col("vm"))
        qs.where(col("half") === "a")
          .select(col("q"), col("vm").as("half_a_micro"))
          .join(qs.where(col("half") === "b")
            .select(col("q"), col("vm").as("half_b_micro")), "q")
          .select(col("q"), col("half_a_micro"), col("half_b_micro"),
            (col("half_b_micro") - col("half_a_micro")).as("delta_micro"))
          .orderBy("q")
      },
      Some("""WITH ev AS (SELECT
             |    CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |         THEN 'a' ELSE 'b' END AS half,
             |    CAST(round(value * 1000000) AS BIGINT) AS vm, event_id
             |  FROM events WHERE value IS NOT NULL),
             |r AS (SELECT half, vm,
             |        row_number() OVER (PARTITION BY half ORDER BY vm, event_id) AS rn,
             |        count(*) OVER (PARTITION BY half) AS n FROM ev),
             |qs AS (SELECT q, half, vm FROM (VALUES (50), (90), (99)) AS t(q)
             |       JOIN r ON r.rn = (t.q * r.n + 99) // 100)
             |SELECT a.q, a.vm AS half_a_micro, b.vm AS half_b_micro,
             |  CAST(b.vm - a.vm AS BIGINT) AS delta_micro
             |FROM qs a JOIN qs b ON a.q = b.q AND a.half = 'a' AND b.half = 'b'
             |ORDER BY a.q""".stripMargin)),

    // 5 %-TRIMMED mean of value per event type, beside the raw mean —
    // the robust location estimate that shrugs off tail contamination
    // (the trim bounds are rank-ceil integers, so both engines cut the
    // identical rows). Per-type ranks ride ONE GlobalOrder range shuffle
    // on (type, value): the prefix offsets come from the |types|-row
    // count table (its tiny prefix-sum window is post-agg and
    // calendar-bounded), so no per-type window ever funnels a type's
    // full stream through one task.
    QueryDef(
      "q_trimmed_mean",
      (s, d) => {
        val ev = Tables.events(s, d).where(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 1e6).cast("long").as("vm"), col("event_id"))
        val ranked = GlobalOrder.withGlobalRowNumber(
          ev, Seq(col("event_type"), col("vm"), col("event_id")), "grn")
        val sizes = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        val offs = sizes.withColumn("off",
          coalesce(sum("n").over(Window.orderBy("event_type")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        val r = ranked.join(broadcast(offs), "event_type")
          .withColumn("rn", col("grn") - col("off"))
          .withColumn("lo", expr("(5 * n + 99) div 100"))
        r.groupBy("event_type")
          .agg(max("n").as("n"),
            count(when(col("rn") > col("lo") && col("rn") <= col("n") - col("lo"), 1))
              .as("kept"),
            expr("sum(CASE WHEN rn > lo AND rn <= n - lo THEN vm ELSE CAST(0 AS BIGINT) END) " +
              "div count(CASE WHEN rn > lo AND rn <= n - lo THEN 1 END)")
              .as("trimmed_mean_micro"),
            expr("sum(vm) div count(1)").as("raw_mean_micro"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vm,
             |              event_id
             |            FROM events WHERE value IS NOT NULL),
             |r AS (SELECT event_type, vm,
             |        row_number() OVER (PARTITION BY event_type ORDER BY vm, event_id) AS rn,
             |        count(*) OVER (PARTITION BY event_type) AS n
             |      FROM ev),
             |k AS (SELECT event_type, vm, rn, n, (5 * n + 99) // 100 AS lo FROM r)
             |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
             |  CAST(count(CASE WHEN rn > lo AND rn <= n - lo THEN 1 END) AS BIGINT) AS kept,
             |  CAST(sum(CASE WHEN rn > lo AND rn <= n - lo THEN vm ELSE 0 END)
             |       // count(CASE WHEN rn > lo AND rn <= n - lo THEN 1 END) AS BIGINT)
             |    AS trimmed_mean_micro,
             |  CAST(sum(vm) // count(*) AS BIGINT) AS raw_mean_micro
             |FROM k GROUP BY 1 ORDER BY 1""".stripMargin)),

    // categorical MIX-SHIFT monitor: per month, the chi-square distance
    // of the order-priority mix from the all-time mix (micro-quantized
    // terms) — the drift alarm for SHARES where q_feature_drift watches
    // a numeric distribution. Expected cells come from the bounded
    // month × priority grid (two tiny broadcast aggregates); a month
    // whose chi2 spikes is the one whose mix moved.
    QueryDef(
      "q_mix_shift",
      (s, d) => {
        val o = Tables.orders(s, d).select(
          to_date(date_trunc("month", col("o_orderdate"))).as("month"),
          col("o_orderpriority").as("pri"))
        val cnt = o.groupBy("month", "pri").agg(count(lit(1)).as("n"))
        val mt = cnt.groupBy("month").agg(sum("n").as("t"))
        val pt = cnt.groupBy("pri").agg(sum("n").as("pn"))
        val g = cnt.agg(sum("n").as("gt"))
        val grid = mt.crossJoin(broadcast(pt)).crossJoin(broadcast(g))
        val j = grid.join(cnt, Seq("month", "pri"), "left")
          .select(col("month"),
            coalesce(col("n"), lit(0L)).cast("double").as("obs"),
            (col("t").cast("double") * col("pn").cast("double") /
              col("gt").cast("double")).as("exp"))
          .where(col("exp") > 0)
        j.select(col("month"),
            round((col("obs") - col("exp")) * (col("obs") - col("exp")) /
              col("exp") * lit(1e6)).cast("long").as("term_micro"))
          .groupBy("month")
          .agg(sum("term_micro").cast("long").as("chi2_micro"),
            count(lit(1)).as("cells"))
          .orderBy("month")
      },
      Some("""WITH o AS (SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))
             |             AS DATE) AS month, o_orderpriority AS pri FROM orders),
             |cnt AS (SELECT month, pri, count(*) AS n FROM o GROUP BY 1, 2),
             |mt AS (SELECT month, sum(n) AS t FROM cnt GROUP BY 1),
             |pt AS (SELECT pri, sum(n) AS pn FROM cnt GROUP BY 1),
             |g AS (SELECT sum(n) AS gt FROM cnt),
             |grid AS (SELECT m.month, p.pri, m.t, p.pn, g.gt
             |         FROM mt m CROSS JOIN pt p CROSS JOIN g),
             |j AS (SELECT gr.month, gr.pri,
             |        CAST(coalesce(c.n, 0) AS DOUBLE) AS obs,
             |        CAST(gr.t AS DOUBLE) * gr.pn / gr.gt AS exp
             |      FROM grid gr LEFT JOIN cnt c ON c.month = gr.month AND c.pri = gr.pri),
             |terms AS (SELECT month,
             |    CAST(round((obs - exp) * (obs - exp) / exp * 1e6) AS BIGINT) AS term_micro
             |  FROM j WHERE exp > 0)
             |SELECT month, CAST(sum(term_micro) AS BIGINT) AS chi2_micro, count(*) AS cells
             |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin)),

    // lag-1 autocorrelation of daily event volume — the one-number
    // "does yesterday predict today" check that decides whether
    // q_seasonal_naive's weekly lag is even the right baseline family.
    // Exact integer moments over the calendar-bounded daily table; the
    // closed form runs on exactly-cast sums (the q_quality_length_corr
    // convention).
    QueryDef(
      "q_autocorr",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
        val pairs = daily.select(col("day"), col("n").as("x"))
          .join(daily.select(date_sub(col("day"), 1).as("day"), col("n").as("y")),
            "day")
        val m = pairs.agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        m.select(col("k").as("pairs"),
          round((col("k").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            sqrt((col("k").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              (col("k").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6)
            .as("autocorr_lag1"))
      },
      Some("""WITH daily AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |                 CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
             |pairs AS (SELECT a.n AS x, b.n AS y
             |          FROM daily a JOIN daily b ON b.day = a.day + INTERVAL 1 DAY),
             |m AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             |        sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy FROM pairs)
             |SELECT CAST(k AS BIGINT) AS pairs,
             |  round((CAST(k AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
             |        sqrt((CAST(k AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
             |             (CAST(k AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6)
             |    AS autocorr_lag1
             |FROM m""".stripMargin)),

    // Benford first-digit audit of order totals: observed first-
    // significant-digit shares beside the ln(1+1/d)/ln 10 expectation in
    // integer micros — the classic fabricated-numbers screen. The
    // fixture prices are uniform-ish and FAIL Benford loudly (digits
    // 1–4 each near 22%), which is precisely the kind of distributional
    // anomaly this report exists to surface; on organic financial data
    // the two columns track. One scan, digit extraction on the integer
    // part's decimal string (identical on both engines), bounded output.
    QueryDef(
      "q_benford",
      (s, d) => {
        val c = Tables.orders(s, d).where(col("o_totalprice") >= 1)
          .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
            .cast("int").as("digit"))
          .groupBy("digit").agg(count(lit(1)).as("n"))
        val t = c.agg(sum("n").as("tot"))
        c.crossJoin(broadcast(t))
          .select(col("digit"), col("n"),
            expr("(n * CAST(1000000 AS BIGINT)) div tot").as("observed_micro"),
            round(log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)) * lit(1e6))
              .cast("long").as("benford_micro"))
          .orderBy("digit")
      },
      Some("""WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
             |             AS VARCHAR), 1, 1) AS INT) AS digit
             |           FROM orders WHERE o_totalprice >= 1),
             |c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
             |t AS (SELECT sum(n) AS tot FROM c)
             |SELECT c.digit, c.n,
             |  CAST((c.n * 1000000) // t.tot AS BIGINT) AS observed_micro,
             |  CAST(round(ln(1.0 + 1.0/c.digit) / ln(10.0) * 1000000) AS BIGINT)
             |    AS benford_micro
             |FROM c CROSS JOIN t ORDER BY c.digit""".stripMargin)),

    // CONDITIONAL value: mean purchase value split by the PRIOR event
    // type in the user's stream — does a view-led purchase carry the
    // same basket as an error-led one? (The attribution-adjacent
    // question q_first_touch answers at user grain, asked at event
    // grain.) One lag window on the user_id shuffle every query in this
    // file shares; exact integer micro means over the bounded
    // prior-type domain.
    QueryDef(
      "q_conditional_value",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("value"),
            col("ts"), col("event_id"))
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .where(col("event_type") === "purchase" &&
            col("prev_type").isNotNull && col("value").isNotNull)
          .select(col("prev_type"),
            round(col("value") * 1e6).cast("long").as("vm"))
          .groupBy("prev_type")
          .agg(count(lit(1)).as("purchases"),
            expr("sum(vm) div count(1)").as("mean_value_micro"))
          .orderBy("prev_type")
      },
      Some("""WITH seq AS (SELECT user_id, event_type, value, ts, event_id,
             |        lag(event_type) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS prev_type
             |      FROM events),
             |p AS (SELECT prev_type, CAST(round(value * 1000000) AS BIGINT) AS vm
             |      FROM seq WHERE event_type = 'purchase' AND prev_type IS NOT NULL
             |        AND value IS NOT NULL)
             |SELECT prev_type, count(*) AS purchases,
             |  CAST(sum(vm) // count(*) AS BIGINT) AS mean_value_micro
             |FROM p GROUP BY 1 ORDER BY 1""".stripMargin)),

    // user-type AFFINITY: top-20 (user, event type) cells by lift over
    // the independence expectation — the personalization signal behind
    // "this user over-indexes on errors 1.5×". Same pointwise-lift shape
    // as q_basket_pairs/q_pmi_bigrams, at the user×type grain; the three
    // marginals are tiny aggregates joined back (user marginal keyed on
    // the same user_id shuffle), top-20 with a total order under the cut.
    QueryDef(
      "q_user_type_affinity",
      (s, d) => {
        val c = Tables.events(s, d).groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
        val u = c.groupBy("user_id").agg(sum("n").as("un"))
        val t = c.groupBy("event_type").agg(sum("n").as("tn"))
        val g = c.agg(sum("n").as("gn"))
        c.join(u, "user_id").join(broadcast(t), "event_type")
          .crossJoin(broadcast(g))
          .select(col("user_id"), col("event_type"), col("n"),
            // 128-bit numerator: n·gn·1e6 passes int64 at corpus event
            // counts (DuckDB widens the same product to HUGEINT).
            expr("CAST((CAST(n AS DECIMAL(38,0)) * gn * 1000000) div (un * tn) AS BIGINT)")
              .as("lift_micro"))
          .orderBy(col("lift_micro").desc, col("user_id"), col("event_type"))
          .limit(20)
      },
      Some("""WITH c AS (SELECT user_id, event_type, count(*) AS n
             |           FROM events GROUP BY 1, 2),
             |u AS (SELECT user_id, sum(n) AS un FROM c GROUP BY 1),
             |t AS (SELECT event_type, sum(n) AS tn FROM c GROUP BY 1),
             |g AS (SELECT sum(n) AS gn FROM c)
             |SELECT c.user_id, c.event_type, c.n,
             |  CAST((CAST(c.n AS HUGEINT) * g.gn * 1000000) // (u.un * t.tn) AS BIGINT) AS lift_micro
             |FROM c JOIN u USING (user_id) JOIN t USING (event_type) CROSS JOIN g
             |ORDER BY lift_micro DESC, c.user_id, c.event_type LIMIT 20""".stripMargin)),

    // repurchase-interval quartiles: rank-exact p25/50/75 of the gap (in
    // whole seconds) between a user's consecutive purchases — the
    // inter-purchase cadence that retention models calibrate against.
    // Gaps come from one lag window on the user_id shuffle; the gap
    // frame is user-scaled, so its global rank rides GlobalOrder's
    // range shuffle and the three percentile ranks broadcast-join back
    // from the one-row count (the q_time_to_convert shape) — no
    // partitionless window anywhere in the plan.
    QueryDef(
      "q_repurchase_interval",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val gaps = Tables.events(s, d)
          .where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"))
          .withColumn("secs",
            unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(w)))
          .where(col("secs").isNotNull)
        val r = GlobalOrder.withGlobalRowNumber(gaps,
          Seq(col("secs").asc, col("user_id").asc, col("event_id").asc), "rn")
        val edgeRanks = gaps.agg(count(lit(1)).as("n"))
          .select(explode(array(lit(25), lit(50), lit(75))).as("q"), col("n"))
          .select(col("q"), expr("(q * n + 99) div 100").as("rn"))
        r.join(broadcast(edgeRanks), "rn")
          .select(col("q"), col("secs")).orderBy("q")
      },
      Some("""WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
             |           FROM events WHERE event_type = 'purchase'),
             |gaps AS (SELECT user_id, event_id,
             |           CAST(date_diff('second',
             |             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
             |             ts) AS BIGINT) AS secs
             |         FROM p),
             |g AS (SELECT user_id, event_id, secs FROM gaps WHERE secs IS NOT NULL),
             |r AS (SELECT secs,
             |        row_number() OVER (ORDER BY secs, user_id, event_id) AS rn,
             |        count(*) OVER () AS n FROM g)
             |SELECT q, secs FROM (
             |  SELECT 25 AS q, secs FROM r WHERE rn = (25*n + 99) // 100
             |  UNION ALL SELECT 50, secs FROM r WHERE rn = (50*n + 99) // 100
             |  UNION ALL SELECT 75, secs FROM r WHERE rn = (75*n + 99) // 100)
             |ORDER BY q""".stripMargin)),

    // weekday seasonality profile: event counts and corpus share by
    // (day-of-week × type) — the load-shape table capacity planning and
    // anomaly baselines read. Day-of-week numbering differs between
    // engines (Spark Sunday=1, DuckDB Sunday=0), so the Spark side
    // offsets to the 0-based convention explicitly. One map-combined
    // aggregate over the bounded 7×|types| domain.
    QueryDef(
      "q_weekday_profile",
      (s, d) => {
        val c = Tables.events(s, d)
          .select((dayofweek(col("ts")) - 1).cast("int").as("dow"),
            col("event_type"))
          .groupBy("dow", "event_type").agg(count(lit(1)).as("n"))
        val t = c.agg(sum("n").as("tot"))
        c.crossJoin(broadcast(t))
          .select(col("dow"), col("event_type"), col("n"),
            expr("(n * CAST(1000000 AS BIGINT)) div tot").as("share_micro"))
          .orderBy("dow", "event_type")
      },
      Some("""WITH e AS (SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS INT) AS dow,
             |             event_type FROM events),
             |c AS (SELECT dow, event_type, count(*) AS n FROM e GROUP BY 1, 2),
             |t AS (SELECT sum(n) AS tot FROM c)
             |SELECT c.dow, c.event_type, c.n,
             |  CAST((c.n * 1000000) // t.tot AS BIGINT) AS share_micro
             |FROM c CROSS JOIN t ORDER BY c.dow, c.event_type""".stripMargin)),

    // user DIVERSITY histogram: per-user Shannon entropy of the
    // event-type mix (nano-nats, the q_domain_kl term convention),
    // banded at 0.1 nat — generalists (entropy near ln |types|) vs
    // specialists (near 0) is the segmentation axis behind
    // recommendation cold-start policies. Per-user terms aggregate on
    // the one user_id shuffle; the histogram is bounded by the entropy
    // range.
    QueryDef(
      "q_user_diversity",
      (s, d) => {
        val c = Tables.events(s, d).groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"))
        val u = c.groupBy("user_id").agg(sum("n").as("un"))
        val ent = c.join(u, "user_id")
          .select(col("user_id"),
            round((col("n").cast("double") / col("un").cast("double")) *
              log(col("un").cast("double") / col("n").cast("double")) * lit(1e9))
              .cast("long").as("term_nano"))
          .groupBy("user_id").agg(sum("term_nano").cast("long").as("h_nano"))
        ent.groupBy(expr("h_nano div 100000000").as("band"))
          .agg(count(lit(1)).as("users"),
            min("h_nano").as("min_nano"), max("h_nano").as("max_nano"))
          .orderBy("band")
      },
      Some("""WITH c AS (SELECT user_id, event_type, count(*) AS n
             |           FROM events GROUP BY 1, 2),
             |u AS (SELECT user_id, sum(n) AS un FROM c GROUP BY 1),
             |terms AS (SELECT c.user_id,
             |    CAST(round((CAST(c.n AS DOUBLE) / u.un) *
             |               ln(CAST(u.un AS DOUBLE) / c.n) * 1e9) AS BIGINT) AS term_nano
             |  FROM c JOIN u USING (user_id)),
             |ent AS (SELECT user_id, CAST(sum(term_nano) AS BIGINT) AS h_nano
             |        FROM terms GROUP BY 1)
             |SELECT h_nano // 100000000 AS band, count(*) AS users,
             |  CAST(min(h_nano) AS BIGINT) AS min_nano,
             |  CAST(max(h_nano) AS BIGINT) AS max_nano
             |FROM ent GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DAU/MAU stickiness — the engagement ratio product dashboards lead
    // with: per calendar day, distinct actives against the calendar
    // month's distinct actives (integer micros). Two distinct-count
    // aggregates; the month table is one row per month, so it rides a
    // broadcast back onto the daily grain — no second shuffle. At scale
    // both distincts shuffle on (period, user), the natural key.
    QueryDef(
      "q_dau_stickiness",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(date_trunc("day", col("ts")).as("day"),
            date_trunc("month", col("ts")).as("mo"), col("user_id"))
        val dau = ev.groupBy("day", "mo").agg(countDistinct("user_id").as("dau"))
        val mau = ev.groupBy("mo").agg(countDistinct("user_id").as("mau"))
        dau.join(broadcast(mau), "mo")
          .select(col("day"), col("dau"), col("mau"),
            expr("(dau * CAST(1000000 AS BIGINT)) div mau").as("stickiness_micro"))
          .orderBy("day")
      },
      Some("""WITH d AS (SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             |                  date_trunc('month', CAST(ts AS TIMESTAMP)) AS mo,
             |                  count(DISTINCT user_id) AS dau
             |           FROM events GROUP BY 1, 2),
             |m AS (SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS mo,
             |             count(DISTINCT user_id) AS mau
             |      FROM events GROUP BY 1)
             |SELECT d.day, d.dau, m.mau,
             |  CAST(d.dau * 1000000 // m.mau AS BIGINT) AS stickiness_micro
             |FROM d JOIN m USING (mo) ORDER BY d.day""".stripMargin)),

    // burstiness audit: the Fano factor (variance/mean) of DAILY volume
    // per event type — the dispersion number that separates steady
    // telemetry (≈1, Poisson) from bursty incident traffic (≫1) and
    // metronomic batch jobs (≪1), and the first input to capacity
    // headroom. Exact integer identity: var/mean = (n·Σc²−S²)/((n−1)·S)
    // on daily-count integers, widened to 128-bit where S² passes int64
    // at corpus volumes (DuckDB's sum already returns HUGEINT). Two
    // map-combined aggregates, nothing data-sized leaves the executors.
    QueryDef(
      "q_burstiness",
      (s, d) => {
        val c = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("c"))
        c.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("c").as("sc"),
            // the inner Σc² itself widens to 128-bit (DuckDB's sum(c*c)
            // auto-widens to HUGEINT; a BIGINT accumulator here would be
            // the one narrower link at ~3e9-events/day counts)
            sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sc2"))
          .select(col("event_type"), col("n"), col("sc").as("total"),
            expr("(sc * CAST(1000000 AS BIGINT)) div n").as("mean_micro"),
            expr("CAST(((CAST(n AS DECIMAL(38,0)) * sc2 - CAST(sc AS DECIMAL(38,0)) * sc) * 1000000) " +
              "div ((n - 1) * sc) AS BIGINT)").as("fano_micro"))
          .orderBy("event_type")
      },
      Some("""WITH c AS (SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
             |                  count(*) AS c
             |           FROM events GROUP BY 1, 2),
             |s AS (SELECT event_type, count(*) AS n, sum(c) AS sc, sum(c*c) AS sc2
             |      FROM c GROUP BY 1)
             |SELECT event_type, n, CAST(sc AS BIGINT) AS total,
             |  CAST(sc * 1000000 // n AS BIGINT) AS mean_micro,
             |  CAST((CAST(n AS HUGEINT) * sc2 - CAST(sc AS HUGEINT) * sc) * 1000000
             |       // ((n - 1) * sc) AS BIGINT) AS fano_micro
             |FROM s ORDER BY event_type""".stripMargin)),

    // second-order behavior: the top-20 three-step event-type paths —
    // where q_event_transitions sees only pairwise hops, this is the
    // shortest window in which "view→view→click" separates from
    // "click→view→view" (what sequence models and funnel designers
    // actually consume). Two lags over ONE user-keyed window pass (same
    // exchange), then a count rollup; top-20 under a total order.
    QueryDef(
      "q_path_triples",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("p1", lag("event_type", 1).over(w))
          .withColumn("p2", lag("event_type", 2).over(w))
          .where(col("p2").isNotNull)
          .groupBy(col("p2").as("step1"), col("p1").as("step2"),
            col("event_type").as("step3"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
          .limit(20)
      },
      Some("""WITH s AS (SELECT user_id, event_type, ts, event_id,
             |        lag(event_type, 1) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS p1,
             |        lag(event_type, 2) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id) AS p2
             |      FROM events)
             |SELECT p2 AS step1, p1 AS step2, event_type AS step3, count(*) AS n
             |FROM s WHERE p2 IS NOT NULL
             |GROUP BY 1, 2, 3
             |ORDER BY n DESC, step1, step2, step3 LIMIT 20""".stripMargin)),

    // rank-exact per-type value percentiles (p50/p90/p99, rank-ceil):
    // the per-segment latency/value SLO numbers, computed EXACTLY — the
    // q_trimmed_mean machinery (one GlobalOrder range shuffle over
    // (type, value, id), per-type offsets from the |types|-row count
    // table broadcast back) with the three rank probes selected in the
    // same grouped pass. Percentile VALUES are tie-invariant: equal
    // values share rank permutations but the value at the probed rank
    // is unique.
    QueryDef(
      "q_type_percentiles",
      (s, d) => {
        val ev = Tables.events(s, d).where(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 1e6).cast("long").as("vm"), col("event_id"))
        val ranked = GlobalOrder.withGlobalRowNumber(
          ev, Seq(col("event_type"), col("vm"), col("event_id")), "grn")
        val sizes = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        val offs = sizes.withColumn("off",
          coalesce(sum("n").over(Window.orderBy("event_type")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        ranked.join(broadcast(offs), "event_type")
          .withColumn("rn", col("grn") - col("off"))
          .groupBy("event_type")
          .agg(
            max(when(col("rn") === expr("(n * 50 + 99) div 100"), col("vm")))
              .as("p50_micro"),
            max(when(col("rn") === expr("(n * 90 + 99) div 100"), col("vm")))
              .as("p90_micro"),
            max(when(col("rn") === expr("(n * 99 + 99) div 100"), col("vm")))
              .as("p99_micro"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vm,
             |              event_id
             |            FROM events WHERE value IS NOT NULL),
             |r AS (SELECT event_type, vm,
             |        row_number() OVER (PARTITION BY event_type ORDER BY vm, event_id) AS rn,
             |        count(*) OVER (PARTITION BY event_type) AS n
             |      FROM ev)
             |SELECT event_type,
             |  max(CASE WHEN rn = (n * 50 + 99) // 100 THEN vm END) AS p50_micro,
             |  max(CASE WHEN rn = (n * 90 + 99) // 100 THEN vm END) AS p90_micro,
             |  max(CASE WHEN rn = (n * 99 + 99) // 100 THEN vm END) AS p99_micro
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // seasonality STRENGTH: η² of the weekday model on daily volume —
    // the one number (between-weekday variance share) that says whether
    // a weekly-seasonal forecast beats a flat one, complementing
    // q_weekday_profile's shape table. Exact integer arithmetic end to
    // end: each weekday's sw²/nw term is milli-scaled integer division
    // (truncation identical in both engines; bias ≤ 7 milli-units
    // against a ~1e10 numerator), the η² ratio cross-multiplies in
    // 128-bit. Day and weekday tables are calendar-bounded — everything
    // after the daily rollup is broadcast-sized.
    QueryDef(
      "q_seasonality_strength",
      (s, d) => {
        val c = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"), expr("weekday(ts)").as("wd"))
          .agg(count(lit(1)).as("c"))
        val g = c.agg(count(lit(1)).as("n"), sum("c").as("s"),
          // Σc² widened like q_burstiness's: DuckDB's sum(c*c) is HUGEINT,
          // so the Spark accumulator must not be the narrower link
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("s2"))
        val b = c.groupBy("wd").agg(count(lit(1)).as("nw"), sum("c").as("sw"))
          .agg(sum(expr("(CAST(sw AS DECIMAL(38,0)) * sw * 1000) div nw"))
            .as("ssb_milli"))
        g.crossJoin(broadcast(b))
          .select(col("n").as("n_days"),
            expr("CAST((CAST(n AS DECIMAL(38,0)) * ssb_milli - 1000 * CAST(s AS DECIMAL(38,0)) * s) * 1000000 " +
              "div (1000 * CAST(n AS DECIMAL(38,0)) * s2 - 1000 * CAST(s AS DECIMAL(38,0)) * s) AS BIGINT)")
              .as("eta2_micro"))
      },
      Some("""WITH c AS (SELECT CAST(ts AS DATE) AS day,
             |                  isodow(CAST(ts AS DATE)) - 1 AS wd, count(*) AS c
             |           FROM events GROUP BY 1, 2),
             |g AS (SELECT count(*) AS n, sum(c) AS s, sum(c*c) AS s2 FROM c),
             |w AS (SELECT wd, count(*) AS nw, sum(c) AS sw FROM c GROUP BY 1),
             |b AS (SELECT sum((CAST(sw AS HUGEINT) * sw * 1000) // nw) AS ssb_milli FROM w)
             |SELECT g.n AS n_days,
             |  CAST((CAST(g.n AS HUGEINT) * b.ssb_milli - 1000 * CAST(g.s AS HUGEINT) * g.s) * 1000000
             |       // (1000 * CAST(g.n AS HUGEINT) * g.s2 - 1000 * CAST(g.s AS HUGEINT) * g.s) AS BIGINT)
             |    AS eta2_micro
             |FROM g CROSS JOIN b""".stripMargin)),

    // Mann–Whitney U — the rank-based two-sample test (the A/B test
    // that survives the heavy-tailed metrics q_ab_assign's mean-diff
    // breaks on). Purchase vs click `value`, milli-quantized; tied
    // values get the average rank exactly by working in DOUBLED rank
    // units (start+end = 2·cum − cnt + 1, all integers). The rank-sum
    // rides the per-distinct-value count table through GlobalOrder's
    // range-shuffle running total — never a partitionless window over
    // raw rows. u1_x2 = 2·U₁; auc_micro = U₁/(n₁n₂) is the probability-
    // of-superiority effect size (= ROC AUC); z is tie-corrected,
    // computed as one fixed IEEE expression over the exact integers in
    // both engines. Products run in DECIMAL(38,0)/HUGEINT — rank sums
    // pass 2^63 at warehouse scale.
    QueryDef(
      "q_mannwhitney",
      (s, d) => {
        val ev = Tables.events(s, d)
          .where(col("event_type").isin("purchase", "click"))
          .select(expr("CAST(round(value * 1000) AS BIGINT)").as("v"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("g1"))
        val byv = ev.groupBy("v")
          .agg(count(lit(1)).as("cnt"), sum("g1").as("cnt1"))
        val run = GlobalOrder.withRunningTotal(byv, Seq(col("v")),
          col("cnt"), "cum")
        val acc = run.agg(
          sum(expr("CAST(cnt1 AS DECIMAL(38,0)) * (2 * cum - cnt + 1)"))
            .as("r1x2"),
          sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("tie3"))
        val tot = ev.agg(sum("g1").as("n1"), count(lit(1)).as("n"))
        acc.crossJoin(broadcast(tot)).select(
          col("n1"), (col("n") - col("n1")).as("n2"),
          expr("CAST(r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS BIGINT)")
            .as("u1_x2"),
          expr("""CAST((r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)) * 1000000
                 | div (2 * CAST(n1 AS DECIMAL(38,0)) * (n - n1)) AS BIGINT)"""
            .stripMargin).as("auc_micro"),
          expr("""CAST(round(
                 |  (CAST(r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS DOUBLE) / 2.0
                 |    - CAST(n1 AS DOUBLE) * (n - n1) / 2.0)
                 |  / sqrt(CAST(n1 AS DOUBLE) * (n - n1) / 12.0
                 |      * ((n + 1) - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))
                 |  * 1000) AS BIGINT)""".stripMargin).as("z_milli"))
      },
      Some("""WITH ev AS (
             |  SELECT CAST(round(value * 1000) AS BIGINT) AS v,
             |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
             |  FROM events WHERE event_type IN ('purchase', 'click')),
             |byv AS (SELECT v, count(*) AS cnt, sum(g1) AS cnt1 FROM ev GROUP BY 1),
             |run AS (SELECT v, cnt, cnt1,
             |          sum(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |        FROM byv),
             |tot AS (SELECT CAST(sum(g1) AS BIGINT) AS n1, count(*) AS n FROM ev),
             |acc AS (SELECT
             |    sum(CAST(cnt1 AS HUGEINT) * (2 * cum - cnt + 1)) AS r1x2,
             |    sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie3
             |  FROM run)
             |SELECT n1, CAST(n - n1 AS BIGINT) AS n2,
             |  CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS u1_x2,
             |  CAST((r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1)) * 1000000
             |       // (2 * CAST(n1 AS HUGEINT) * (n - n1)) AS BIGINT) AS auc_micro,
             |  CAST(round(
             |    (CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS DOUBLE) / 2.0
             |      - CAST(n1 AS DOUBLE) * (n - n1) / 2.0)
             |    / sqrt(CAST(n1 AS DOUBLE) * (n - n1) / 12.0
             |        * ((n + 1) - CAST(tie3 AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))))
             |    * 1000) AS BIGINT) AS z_milli
             |FROM acc CROSS JOIN tot""".stripMargin)),

    // CUSUM changepoint — where did the level of the daily event series
    // shift? S_t = Σ_{i≤t}(x_i − x̄) maximized in |·|, kept EXACT by
    // scaling through the day count: S'_t = T·cum_t − t·N (all
    // integers, no rational mean). The series is the daily count table
    // (calendar-bounded, tiny at any corpus scale), so the running sum
    // is an ordinary bounded-domain window; argmax is a 1-row TopK with
    // date tiebreak. Output: the detected change date with exact
    // before/after mean levels in micros.
    QueryDef(
      "q_changepoint",
      (s, d) => {
        val day = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("dt")).agg(count(lit(1)).as("x"))
        val tot = day.agg(count(lit(1)).as("t_days"), sum("x").as("n_events"))
        val w = Window.orderBy("dt")
        val run = day
          .withColumn("cumx", sum("x").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("idx", row_number().over(w))
        val best = run.crossJoin(broadcast(tot))
          .select(col("dt"), col("idx"), col("cumx"), col("t_days"),
            col("n_events"),
            expr("CAST(t_days AS DECIMAL(38,0)) * cumx - CAST(idx AS DECIMAL(38,0)) * n_events")
              .as("s_scaled"))
          .orderBy(abs(col("s_scaled")).desc, col("dt")).limit(1)
        best.select(col("t_days"), col("n_events"), col("dt").as("change_date"),
          col("s_scaled").cast("long").as("cusum_scaled"),
          expr("CAST(CAST(cumx AS DECIMAL(38,0)) * 1000000 div idx AS BIGINT)")
            .as("mean_before_micro"),
          expr("""CAST(CAST(n_events - cumx AS DECIMAL(38,0)) * 1000000
                 | div (t_days - idx) AS BIGINT)""".stripMargin)
            .as("mean_after_micro"))
      },
      Some("""WITH day AS (SELECT CAST(ts AS DATE) AS dt, count(*) AS x FROM events GROUP BY 1),
             |tot AS (SELECT count(*) AS t_days, sum(x) AS n_events FROM day),
             |run AS (SELECT dt, x,
             |          sum(x) OVER (ORDER BY dt ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumx,
             |          row_number() OVER (ORDER BY dt) AS idx
             |        FROM day),
             |s AS (SELECT dt, idx, cumx,
             |        CAST(t_days AS HUGEINT) * cumx - CAST(idx AS HUGEINT) * n_events AS s_scaled
             |      FROM run CROSS JOIN tot)
             |SELECT t.t_days, CAST(t.n_events AS BIGINT) AS n_events, b.dt AS change_date,
             |  CAST(b.s_scaled AS BIGINT) AS cusum_scaled,
             |  CAST(b.cumx * 1000000 // b.idx AS BIGINT) AS mean_before_micro,
             |  CAST((t.n_events - b.cumx) * 1000000 // (t.t_days - b.idx) AS BIGINT)
             |    AS mean_after_micro
             |FROM (SELECT * FROM s ORDER BY abs(s_scaled) DESC, dt LIMIT 1) b CROSS JOIN tot t""".stripMargin)),

    // exponential-smoothing forecast backtest (EWMA, α=1/2) — the
    // recency-weighted companion of q_seasonal_naive: per event type,
    // forecast the final day's volume from the 16 preceding days with
    // weights 2^(15−lag), EXACT as Σy·2^(15−j)·10⁶ div 65535 (α=1/2
    // makes every weight a power of two — no float smoothing loop, no
    // recursion; the geometric tail past 16 days is < 2⁻¹⁶ of the
    // weight mass). The day×type grid is densified first so a silent
    // empty day forecasts as 0, not as a dropped term. All frames after
    // the one daily rollup are calendar-bounded.
    QueryDef(
      "q_ewma",
      (s, d) => {
        val ev = Tables.events(s, d)
        val days = ev.select(to_date(col("ts")).as("dt")).distinct()
        val types = ev.select("event_type").distinct()
        val cnt = ev.groupBy(to_date(col("ts")).as("dt"), col("event_type"))
          .agg(count(lit(1)).as("y"))
        val g = days.crossJoin(broadcast(types))
          .join(cnt, Seq("dt", "event_type"), "left")
          .select(col("dt"), col("event_type"), coalesce(col("y"), lit(0L)).as("y"))
        val mx = g.agg(max("dt").as("t_last"))
        val withLag = g.crossJoin(broadcast(mx))
        val f = withLag
          .where(col("dt") < col("t_last") &&
            datediff(col("t_last"), col("dt")) <= 16)
          .select(col("event_type"), col("y"),
            (datediff(col("t_last"), col("dt")) - 1).as("j"))
          .groupBy("event_type")
          // Σy·2^15 · 10⁶ passes 2^63 at ~3e8 events/day — the weighted
          // sum ACCUMULATES in DECIMAL(38,0) (not just the scale-up:
          // DuckDB's sum is HUGEINT, so the per-term product widens
          // before summation on this side too)
          .agg(expr("""CAST(sum(CAST(y AS DECIMAL(38,0)) * shiftleft(CAST(1 AS BIGINT), CAST(15 - j AS INT)))
                      |   * 1000000 div 65535 AS BIGINT)""".stripMargin)
            .as("forecast_micro"))
        val act = withLag.where(col("dt") === col("t_last"))
          .select(col("event_type"), col("y").as("actual"))
        f.join(act, "event_type")
          .select(col("event_type"), col("forecast_micro"), col("actual"),
            abs(col("forecast_micro") - col("actual") * 1000000L)
              .as("abs_err_micro"))
          .orderBy("event_type")
      },
      Some("""WITH grid AS (
             |  SELECT d.dt, t.event_type FROM
             |    (SELECT DISTINCT CAST(ts AS DATE) AS dt FROM events) d
             |    CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
             |cnt AS (SELECT CAST(ts AS DATE) AS dt, event_type, count(*) AS y
             |        FROM events GROUP BY 1, 2),
             |g AS (SELECT grid.dt, grid.event_type, coalesce(cnt.y, 0) AS y
             |      FROM grid LEFT JOIN cnt ON grid.dt = cnt.dt AND grid.event_type = cnt.event_type),
             |mx AS (SELECT max(dt) AS t_last FROM g),
             |hist AS (SELECT g.event_type, g.y,
             |           date_diff('day', g.dt, t_last) - 1 AS j
             |         FROM g CROSS JOIN mx
             |         WHERE g.dt < t_last AND date_diff('day', g.dt, t_last) <= 16),
             |f AS (SELECT event_type,
             |        CAST(CAST(sum(y * (CAST(1 AS BIGINT) << (15 - j))) AS HUGEINT)
             |             * 1000000 // 65535 AS BIGINT)
             |          AS forecast_micro
             |      FROM hist GROUP BY 1),
             |act AS (SELECT g.event_type, g.y AS actual FROM g CROSS JOIN mx WHERE g.dt = t_last)
             |SELECT f.event_type AS event_type, forecast_micro, CAST(actual AS BIGINT) AS actual,
             |  abs(forecast_micro - actual * 1000000) AS abs_err_micro
             |FROM f JOIN act ON f.event_type = act.event_type ORDER BY 1""".stripMargin)),

    // Poisson-bootstrap confidence interval — THE distributed bootstrap
    // (multinomial resampling needs the row count up front and a global
    // draw; independent Poisson(1) weights per (row, replicate) need
    // neither, and at corpus scale are indistinguishable). 40 replicate
    // weights come from md5-derived uniforms cut at the exact Poisson(1)
    // pmf thresholds (0.367879/0.735759/0.919699/0.981012 in integer
    // millionths), so both engines draw bit-identical resamples with no
    // RNG. The explode-by-40 feeds straight into a partial aggregate —
    // 40 groups per partition, a 40-row shuffle, nothing materializes
    // 40× the data. CI = rank-based 2.5/97.5 percentiles over the 40
    // replicate means (ceil convention: ranks 1 and 39), exact integer
    // micros throughout.
    QueryDef(
      "q_bootstrap_ci",
      (s, d) => {
        val p = Tables.events(s, d).where(col("event_type") === "purchase")
          .select(col("event_id"),
            expr("CAST(round(value * 1000) AS BIGINT)").as("v"))
        val reps = p.select(col("event_id"), col("v"),
            explode(sequence(lit(0), lit(39))).as("b"))
          .withColumn("u",
            conv(substring(md5(concat(lit("bs:"), col("b").cast("string"),
              lit(":"), col("event_id").cast("string"))), 1, 12), 16, 10)
              .cast("long") % 1000000L)
          .withColumn("wt",
            when(col("u") < 367879L, 0L).when(col("u") < 735759L, 1L)
              .when(col("u") < 919699L, 2L).when(col("u") < 981012L, 3L)
              .otherwise(4L))
        // Σwt·v (wt ≤ 4, v in millis) passes 2^63 near 5e14 rows — the
        // resample sums run in DECIMAL(38,0)/HUGEINT before the division
        val bm = reps.groupBy("b")
          .agg(expr("CAST(sum(CAST(wt AS DECIMAL(38,0)) * v) * 1000 div sum(wt) AS BIGINT)")
            .as("mean_micro"))
        val r = bm.withColumn("rn",
          row_number().over(Window.orderBy(col("mean_micro"), col("b"))))
        val base = p.agg(count(lit(1)).as("n"),
          expr("CAST(CAST(sum(v) AS DECIMAL(38,0)) * 1000 div count(1) AS BIGINT)")
            .as("mean_micro"))
        base
          .crossJoin(broadcast(r.where(col("rn") === 1)
            .select(col("mean_micro").as("boot_lo_micro"))))
          .crossJoin(broadcast(r.where(col("rn") === 39)
            .select(col("mean_micro").as("boot_hi_micro"))))
      },
      Some("""WITH p AS (SELECT event_id, CAST(round(value * 1000) AS BIGINT) AS v
             |           FROM events WHERE event_type = 'purchase'),
             |reps AS (SELECT p.event_id, p.v, r.range AS b,
             |           CAST('0x' || substr(md5('bs:' || r.range || ':' || p.event_id), 1, 12) AS BIGINT)
             |             % 1000000 AS u
             |         FROM p CROSS JOIN range(40) r),
             |w AS (SELECT b, v,
             |        CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
             |             WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3 ELSE 4 END AS wt
             |      FROM reps),
             |bm AS (SELECT b, CAST(CAST(sum(wt * v) AS HUGEINT) * 1000 // sum(wt) AS BIGINT) AS mean_micro
             |       FROM w GROUP BY 1),
             |r AS (SELECT mean_micro, row_number() OVER (ORDER BY mean_micro, b) AS rn FROM bm),
             |base AS (SELECT count(*) AS n, CAST(CAST(sum(v) AS HUGEINT) * 1000 // count(*) AS BIGINT) AS mean_micro FROM p)
             |SELECT base.n, base.mean_micro,
             |  (SELECT mean_micro FROM r WHERE rn = 1) AS boot_lo_micro,
             |  (SELECT mean_micro FROM r WHERE rn = 39) AS boot_hi_micro
             |FROM base""".stripMargin)),

    // t-closeness — the release gate that completes the privacy triad
    // beside q_k_anonymity / q_l_diversity: for each quasi-identifier
    // group (source), the total-variation distance between its sensitive-
    // attribute distribution (lang) and the corpus-wide one; the release
    // requirement is max ≤ t. EXACT: TVD = Σ|a·n − b·n_g| / (2·n_g·n)
    // kept as a 128-bit integer numerator over the exact denominator —
    // no per-cell rational rounding. The grid densifies absent (group,
    // lang) cells (they still contribute b·n_g). Two keyed aggregates +
    // a broadcast margin grid; one |groups|-row reduction.
    QueryDef(
      "q_t_closeness",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val cell = docs.groupBy("source", "lang").agg(count(lit(1)).as("a"))
        val grp = docs.groupBy("source").agg(count(lit(1)).as("ng"))
        val glb = docs.groupBy("lang").agg(count(lit(1)).as("b"))
        val tot = docs.agg(count(lit(1)).as("n"))
        val grid = grp.crossJoin(broadcast(glb))
          .join(cell, Seq("source", "lang"), "left")
          .na.fill(0L, Seq("a"))
          .crossJoin(broadcast(tot))
        val tvd = grid.groupBy("source")
          .agg(max("ng").as("ng"), max("n").as("n"),
            sum(abs(expr("CAST(a AS DECIMAL(38,0)) * n - CAST(b AS DECIMAL(38,0)) * ng")))
              .as("num"))
          .select(col("source"),
            expr("CAST(num * 1000000 div (2 * CAST(ng AS DECIMAL(38,0)) * n) AS BIGINT)")
              .as("tvd_micro"))
        tvd.agg(
          max("tvd_micro").as("t_closeness_micro"),
          count(lit(1)).as("n_groups"),
          min("tvd_micro").as("min_tvd_micro"),
          expr("sum(tvd_micro) div count(1)").as("avg_tvd_micro"))
      },
      Some("""WITH cell AS (SELECT source, lang, count(*) AS a FROM documents GROUP BY 1, 2),
             |grp AS (SELECT source, count(*) AS ng FROM documents GROUP BY 1),
             |glb AS (SELECT lang, count(*) AS b FROM documents GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM documents),
             |grid AS (SELECT g.source, g.ng, l.lang, l.b, coalesce(c.a, 0) AS a
             |         FROM grp g CROSS JOIN glb l
             |         LEFT JOIN cell c ON c.source = g.source AND c.lang = l.lang),
             |tvd AS (SELECT source, max(ng) AS ng,
             |          sum(abs(CAST(a AS HUGEINT) * n - CAST(b AS HUGEINT) * ng)) AS num
             |        FROM grid CROSS JOIN tot GROUP BY source),
             |pg AS (SELECT source, CAST(num * 1000000 // (2 * CAST(ng AS HUGEINT) * n) AS BIGINT) AS tvd_micro
             |       FROM tvd CROSS JOIN tot)
             |SELECT CAST(max(tvd_micro) AS BIGINT) AS t_closeness_micro,
             |  CAST(count(*) AS BIGINT) AS n_groups,
             |  CAST(min(tvd_micro) AS BIGINT) AS min_tvd_micro,
             |  CAST(sum(tvd_micro) // count(*) AS BIGINT) AS avg_tvd_micro
             |FROM pg""".stripMargin)),

    // CUPED pre-period adjustment — the variance-reduction readout every
    // serious experimentation platform computes before an A/B launches:
    // θ = cov(pre, post)/var(pre) over per-user value sums split at the
    // calendar midpoint, and ρ² = the variance fraction the adjustment
    // removes (equivalently, how much shorter the experiment gets). One
    // user-keyed aggregate (both periods in one conditional pass — the
    // split never rescans), then five exact integer moments; 128-bit
    // products (the squared covariance bounds exactness to ~1e9 users at
    // milli quantization — the documented trade).
    QueryDef(
      "q_cuped",
      (s, d) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp_ntz")
        val u = Tables.events(s, d).groupBy("user_id")
          .agg(
            coalesce(sum(when(col("ts") < cut,
              expr("CAST(round(value*1000) AS BIGINT)"))), lit(0L)).as("x"),
            coalesce(sum(when(col("ts") >= cut,
              expr("CAST(round(value*1000) AS BIGINT)"))), lit(0L)).as("y"))
        u.agg(count(lit(1)).as("n"),
            sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
            sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
            sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
          .select(col("n").as("n_users"),
            expr("CAST((n*sxy - sx*sy) * 1000000 div (n*sxx - sx*sx) AS BIGINT)")
              .as("theta_micro"),
            expr("""CAST((n*sxy - sx*sy) * (n*sxy - sx*sy) * 1000000
                   | div ((n*sxx - sx*sx) * (n*syy - sy*sy)) AS BIGINT)""".stripMargin)
              .as("rho2_micro"))
      },
      Some("""WITH u AS (SELECT user_id,
             |    CAST(coalesce(sum(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
             |      THEN CAST(round(value*1000) AS BIGINT) END), 0) AS BIGINT) AS x,
             |    CAST(coalesce(sum(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |      THEN CAST(round(value*1000) AS BIGINT) END), 0) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |m AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |        sum(CAST(x AS HUGEINT)*y) AS sxy, sum(CAST(x AS HUGEINT)*x) AS sxx,
             |        sum(CAST(y AS HUGEINT)*y) AS syy FROM u)
             |SELECT CAST(n AS BIGINT) AS n_users,
             |  CAST((n*sxy - sx*sy) * 1000000 // (n*sxx - sx*sx) AS BIGINT) AS theta_micro,
             |  CAST((n*sxy - sx*sy) * (n*sxy - sx*sy) * 1000000
             |    // ((n*sxx - sx*sx) * (n*syy - sy*sy)) AS BIGINT) AS rho2_micro
             |FROM m""".stripMargin)),

    // A/B sample-size planner — "how many users per arm to detect a 5 %
    // lift at α=0.05, power 0.8": n = (z_{0.975}+z_{0.8})²·2σ²/d² with
    // the normal quantiles inlined as the fixed constants every power
    // calculator uses. σ² and the mean come from one exact integer
    // moment pass over purchase values; the closed form is one fixed
    // IEEE expression over those integers in both engines.
    QueryDef(
      "q_power_analysis",
      (s, d) => Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .select(expr("CAST(round(value*1000) AS BIGINT)").as("v"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(v AS DECIMAL(38,0))")).as("s"),
          sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("s2"))
        .select(col("n").as("n_obs"),
          expr("CAST(s * 1000 div n AS BIGINT)").as("mean_micro"),
          expr("CAST((n*s2 - s*s) div (n*n) AS BIGINT)").as("var_milli2"),
          expr("""CAST(ceil(pow(1.959964 + 0.841621, 2) * 2.0
                 |  * (CAST(n*s2 - s*s AS DOUBLE) / (CAST(n AS DOUBLE)*n))
                 |  / pow(0.05 * CAST(s AS DOUBLE) / n, 2)) AS BIGINT)""".stripMargin)
            .as("n_per_arm")),
      Some("""WITH p AS (SELECT CAST(round(value*1000) AS BIGINT) AS v
             |           FROM events WHERE event_type='purchase'),
             |m AS (SELECT count(*) AS n, sum(CAST(v AS HUGEINT)) AS s,
             |        sum(CAST(v AS HUGEINT)*v) AS s2 FROM p)
             |SELECT CAST(n AS BIGINT) AS n_obs,
             |  CAST(s * 1000 // n AS BIGINT) AS mean_micro,
             |  CAST((n*s2 - s*s) // (n*n) AS BIGINT) AS var_milli2,
             |  CAST(ceil(pow(1.959964 + 0.841621, 2) * 2.0
             |        * (CAST(n*s2 - s*s AS DOUBLE) / (CAST(n AS DOUBLE)*n))
             |        / pow(0.05 * CAST(s AS DOUBLE) / n, 2)) AS BIGINT) AS n_per_arm
             |FROM m""".stripMargin)),

    // Kaplan–Meier survival curve for time-to-first-purchase (hour
    // grain), RIGHT-CENSORED at each non-converting user's last
    // observation — the estimator that answers "how long until users
    // convert" without the bias of dropping the ones who haven't yet.
    // S(t) = Π(1 − d/n) evaluated as exp of a running Σln over DISTINCT
    // event times (calendar-bounded table; the ln terms come from exact
    // integer (d, n_at_risk) pairs and the running sum visits them in
    // the same order in both engines, so the doubles are bit-identical).
    // The terminal step where everyone remaining converts is S = 0
    // exactly (guarded — no ln(0)). One user-keyed aggregate feeds the
    // whole curve.
    QueryDef(
      "q_survival_km",
      (s, d) => {
        // hour-truncate BEFORE differencing: Spark's timestampdiff counts
        // full elapsed hours, DuckDB's date_diff counts hour-boundary
        // crossings — on truncated stamps the two definitions coincide
        // (the q_islands second-truncation convention)
        val ev = Tables.events(s, d)
        val u = ev.groupBy("user_id").agg(
          min(date_trunc("hour", col("ts"))).as("first_ts"),
          max(date_trunc("hour", col("ts"))).as("last_ts"),
          min(when(col("event_type") === "purchase",
            date_trunc("hour", col("ts")))).as("first_p"))
        val obs = u.select(
          when(col("first_p").isNotNull,
            expr("timestampdiff(HOUR, first_ts, first_p)"))
            .otherwise(expr("timestampdiff(HOUR, first_ts, last_ts)")).as("t"),
          when(col("first_p").isNotNull, 1L).otherwise(0L).as("death"))
        val tot = obs.agg(count(lit(1)).as("n"))
        val byt = obs.groupBy("t")
          .agg(sum("death").as("d"), count(lit(1)).as("ev"))
        val w = Window.orderBy("t")
        val run = byt.withColumn("cumbef",
          coalesce(sum("ev").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            lit(0L)))
        run.crossJoin(broadcast(tot))
          .withColumn("n_risk", col("n") - col("cumbef"))
          .withColumn("s_micro",
            when(col("d") === col("n_risk"), 0L).otherwise(
              expr("""CAST(round(exp(sum(CASE WHEN d < n - cumbef
                     |  THEN ln(1.0 - CAST(d AS DOUBLE) / (n - cumbef)) ELSE 0.0 END)
                     |  OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
                     |  * 1000000) AS BIGINT)""".stripMargin)))
          .where(col("d") > 0)
          .select(col("t").as("hours"), col("d").as("deaths"),
            col("n_risk").as("n_at_risk"), col("s_micro"))
          .orderBy("hours").limit(25)
      },
      Some("""WITH u AS (SELECT user_id,
             |    min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS first_ts,
             |    max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS last_ts,
             |    min(CASE WHEN event_type='purchase'
             |        THEN date_trunc('hour', CAST(ts AS TIMESTAMP)) END) AS first_p
             |  FROM events GROUP BY 1),
             |obs AS (SELECT user_id,
             |    CASE WHEN first_p IS NOT NULL
             |      THEN date_diff('hour', first_ts, first_p)
             |      ELSE date_diff('hour', first_ts, last_ts) END AS t,
             |    CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END AS death
             |  FROM u),
             |tot AS (SELECT count(*) AS n FROM obs),
             |byt AS (SELECT t, sum(death) AS d, count(*) AS ev FROM obs GROUP BY 1),
             |run AS (SELECT t, d, ev,
             |    coalesce(sum(ev) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumbef
             |  FROM byt),
             |km AS (SELECT t, d, n - cumbef AS n_risk,
             |    CASE WHEN d = n - cumbef THEN 0 ELSE
             |      CAST(round(exp(sum(CASE WHEN d < n - cumbef
             |          THEN ln(1.0 - CAST(d AS DOUBLE)/(n - cumbef)) ELSE 0.0 END)
             |          OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1000000) AS BIGINT)
             |    END AS s_micro
             |  FROM run CROSS JOIN tot WHERE d > 0)
             |SELECT t AS hours, CAST(d AS BIGINT) AS deaths,
             |  CAST(n_risk AS BIGINT) AS n_at_risk, s_micro
             |FROM km ORDER BY t LIMIT 25""".stripMargin)),

    // difference-in-differences — the panel-data causal estimator: a
    // hash-assigned cohort crossed with the calendar midpoint gives the
    // 2×2 mean grid, and DiD = (T_post−T_pre)−(C_post−C_pre) nets out
    // both the cohort's level difference and the common time trend. One
    // map-combined 4-cell aggregate over the fact stream; means in exact
    // integer micros (128-bit sums). On randomized synthetic data the
    // estimate is statistical noise around 0 — the placebo test a DiD
    // pipeline should pass.
    QueryDef(
      "q_did",
      (s, d) => {
        val cut = lit("2024-01-16 00:00:00").cast("timestamp_ntz")
        val e = Tables.events(s, d).select(
          expr("CAST(round(value*1000) AS BIGINT)").as("v"),
          when(substring(md5(concat(lit("did:"), col("user_id"))), 1, 1) < "8",
            1).otherwise(0).as("treated"),
          when(col("ts") >= cut, 1).otherwise(0).as("post"))
        val cell = e.groupBy("treated", "post")
          .agg(count(lit(1)).as("n"),
            expr("CAST(sum(CAST(v AS DECIMAL(38,0))) * 1000 div count(1) AS BIGINT)")
              .as("mean_micro"))
        cell.agg(
          max(when(col("treated") === 1 && col("post") === 0, col("mean_micro")))
            .as("t_pre"),
          max(when(col("treated") === 1 && col("post") === 1, col("mean_micro")))
            .as("t_post"),
          max(when(col("treated") === 0 && col("post") === 0, col("mean_micro")))
            .as("c_pre"),
          max(when(col("treated") === 0 && col("post") === 1, col("mean_micro")))
            .as("c_post"))
          .select(col("t_pre"), col("t_post"), col("c_pre"), col("c_post"),
            ((col("t_post") - col("t_pre")) - (col("c_post") - col("c_pre")))
              .as("did_micro"))
      },
      Some("""WITH e AS (SELECT CAST(round(value*1000) AS BIGINT) AS v,
             |    CASE WHEN substr(md5('did:' || user_id), 1, 1) < '8' THEN 1 ELSE 0 END AS treated,
             |    CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-16 00:00:00'
             |      THEN 1 ELSE 0 END AS post
             |  FROM events),
             |cell AS (SELECT treated, post, count(*) AS n,
             |    CAST(sum(CAST(v AS HUGEINT)) * 1000 // count(*) AS BIGINT) AS mean_micro
             |  FROM e GROUP BY 1, 2)
             |SELECT
             |  max(CASE WHEN treated=1 AND post=0 THEN mean_micro END) AS t_pre,
             |  max(CASE WHEN treated=1 AND post=1 THEN mean_micro END) AS t_post,
             |  max(CASE WHEN treated=0 AND post=0 THEN mean_micro END) AS c_pre,
             |  max(CASE WHEN treated=0 AND post=1 THEN mean_micro END) AS c_post,
             |  (max(CASE WHEN treated=1 AND post=1 THEN mean_micro END)
             |   - max(CASE WHEN treated=1 AND post=0 THEN mean_micro END))
             |  - (max(CASE WHEN treated=0 AND post=1 THEN mean_micro END)
             |     - max(CASE WHEN treated=0 AND post=0 THEN mean_micro END)) AS did_micro
             |FROM cell""".stripMargin)),

    // propensity-score stratification — the observational-data companion
    // of q_did: treatment (high error-share users) is NOT randomized and
    // activity confounds both treatment and outcome, so the naive
    // treated-vs-control difference is biased; stratifying on activity
    // quintiles and weighting the within-stratum differences by stratum
    // size removes the confounder's between-stratum component. Quintiles
    // ride GlobalOrder's exact global ntile (the q_rfm machinery — never
    // a partitionless window over users). Rows: stratum 1..5, stratum 0
    // = the naive contrast, stratum −1 = the stratified ATE. All means
    // exact integer micros.
    QueryDef(
      "q_propensity_strat",
      (s, d) => {
        val u = Tables.events(s, d).groupBy("user_id")
          .agg(count(lit(1)).as("activity"),
            when(count(when(col("event_type") === "error", 1)) * 1000 >
              count(lit(1)) * 200, 1).otherwise(0).as("treated"),
            coalesce(sum(when(col("event_type") === "purchase",
              expr("CAST(round(value*1000) AS BIGINT)"))), lit(0L)).as("y"))
        val st = GlobalOrder.withGlobalNtile(u,
          Seq(col("activity"), col("user_id")), 5, "stratum")
        def cellAgg(g: org.apache.spark.sql.RelationalGroupedDataset) = g.agg(
          count(when(col("treated") === 1, 1)).as("n_t"),
          count(when(col("treated") === 0, 1)).as("n_c"),
          expr("""CAST(coalesce(sum(CASE WHEN treated=1 THEN CAST(y AS DECIMAL(38,0)) END), 0)
                 | * 1000 div nullif(count(CASE WHEN treated=1 THEN 1 END), 0) AS BIGINT)"""
            .stripMargin).as("mean_t_micro"),
          expr("""CAST(coalesce(sum(CASE WHEN treated=0 THEN CAST(y AS DECIMAL(38,0)) END), 0)
                 | * 1000 div nullif(count(CASE WHEN treated=0 THEN 1 END), 0) AS BIGINT)"""
            .stripMargin).as("mean_c_micro"),
          count(lit(1)).as("n_s"))
        val perFull = cellAgg(st.groupBy("stratum"))
        val per = perFull
          .select(col("stratum").cast("int").as("stratum"), col("n_t"), col("n_c"),
            col("mean_t_micro"), col("mean_c_micro"),
            (col("mean_t_micro") - col("mean_c_micro")).as("diff_micro"))
        val naive = cellAgg(st.withColumn("stratum", lit(0)).groupBy("stratum"))
          .select(col("stratum"), col("n_t"), col("n_c"),
            col("mean_t_micro"), col("mean_c_micro"),
            (col("mean_t_micro") - col("mean_c_micro")).as("diff_micro"))
        val ate = perFull.where(col("n_t") > 0 && col("n_c") > 0)
          .agg(sum("n_t").as("n_t"), sum("n_c").as("n_c"),
            expr("""CAST(sum(CAST(n_s AS DECIMAL(38,0)) * (mean_t_micro - mean_c_micro))
                   | div sum(n_s) AS BIGINT)""".stripMargin).as("diff_micro"))
          .select(lit(-1).as("stratum"), col("n_t"), col("n_c"),
            lit(null).cast("long").as("mean_t_micro"),
            lit(null).cast("long").as("mean_c_micro"), col("diff_micro"))
        per.unionByName(naive).unionByName(ate).orderBy("stratum")
      },
      Some("""WITH u AS (SELECT user_id, count(*) AS activity,
             |    CASE WHEN count(CASE WHEN event_type='error' THEN 1 END) * 1000 > 200 * count(*)
             |      THEN 1 ELSE 0 END AS treated,
             |    CAST(coalesce(sum(CASE WHEN event_type='purchase'
             |      THEN CAST(round(value*1000) AS BIGINT) END), 0) AS BIGINT) AS y
             |  FROM events GROUP BY 1),
             |st AS (SELECT *, ntile(5) OVER (ORDER BY activity, user_id) AS stratum FROM u),
             |per AS (SELECT CAST(stratum AS INT) AS stratum,
             |    count(CASE WHEN treated=1 THEN 1 END) AS n_t,
             |    count(CASE WHEN treated=0 THEN 1 END) AS n_c,
             |    CAST(coalesce(sum(CASE WHEN treated=1 THEN CAST(y AS HUGEINT) END), 0)
             |      * 1000 // nullif(count(CASE WHEN treated=1 THEN 1 END), 0) AS BIGINT) AS mean_t_micro,
             |    CAST(coalesce(sum(CASE WHEN treated=0 THEN CAST(y AS HUGEINT) END), 0)
             |      * 1000 // nullif(count(CASE WHEN treated=0 THEN 1 END), 0) AS BIGINT) AS mean_c_micro,
             |    count(*) AS n_s
             |  FROM st GROUP BY 1),
             |naive AS (SELECT 0 AS stratum,
             |    count(CASE WHEN treated=1 THEN 1 END) AS n_t,
             |    count(CASE WHEN treated=0 THEN 1 END) AS n_c,
             |    CAST(coalesce(sum(CASE WHEN treated=1 THEN CAST(y AS HUGEINT) END), 0)
             |      * 1000 // nullif(count(CASE WHEN treated=1 THEN 1 END), 0) AS BIGINT) AS mean_t_micro,
             |    CAST(coalesce(sum(CASE WHEN treated=0 THEN CAST(y AS HUGEINT) END), 0)
             |      * 1000 // nullif(count(CASE WHEN treated=0 THEN 1 END), 0) AS BIGINT) AS mean_c_micro,
             |    count(*) AS n_s
             |  FROM u),
             |ate AS (SELECT -1 AS stratum, sum(n_t) AS n_t, sum(n_c) AS n_c,
             |    CAST(NULL AS BIGINT) AS mean_t_micro, CAST(NULL AS BIGINT) AS mean_c_micro,
             |    CAST(sum(CAST(n_s AS HUGEINT) * (mean_t_micro - mean_c_micro))
             |      // sum(n_s) AS BIGINT) AS diff_micro
             |  FROM per WHERE n_t > 0 AND n_c > 0)
             |SELECT stratum, CAST(n_t AS BIGINT) AS n_t, CAST(n_c AS BIGINT) AS n_c,
             |  mean_t_micro, mean_c_micro, mean_t_micro - mean_c_micro AS diff_micro
             |FROM per
             |UNION ALL
             |SELECT stratum, CAST(n_t AS BIGINT), CAST(n_c AS BIGINT),
             |  mean_t_micro, mean_c_micro, mean_t_micro - mean_c_micro
             |FROM naive
             |UNION ALL
             |SELECT stratum, CAST(n_t AS BIGINT), CAST(n_c AS BIGINT),
             |  mean_t_micro, mean_c_micro, diff_micro FROM ate
             |ORDER BY stratum""".stripMargin)),

    // forecast-skill comparison — which forecaster earns the pipeline
    // slot: the α=1/2 EWMA (q_ewma) vs the seasonal naive y(T−7)
    // (q_seasonal_naive), scored per event type on the SAME final-day
    // backtest. skill_micro < 1e6 means the EWMA beats the weekly
    // repeat. All errors exact integer micros over the densified
    // day×type grid; one daily rollup feeds both arms.
    QueryDef(
      "q_forecast_skill",
      (s, d) => {
        val ev = Tables.events(s, d)
        val days = ev.select(to_date(col("ts")).as("dt")).distinct()
        val types = ev.select("event_type").distinct()
        val cnt = ev.groupBy(to_date(col("ts")).as("dt"), col("event_type"))
          .agg(count(lit(1)).as("y"))
        val g = days.crossJoin(broadcast(types))
          .join(cnt, Seq("dt", "event_type"), "left")
          .select(col("dt"), col("event_type"), coalesce(col("y"), lit(0L)).as("y"))
        val mx = g.agg(max("dt").as("t_last"))
        val wl = g.crossJoin(broadcast(mx))
        val ew = wl
          .where(col("dt") < col("t_last") &&
            datediff(col("t_last"), col("dt")) <= 16)
          .select(col("event_type"), col("y"),
            (datediff(col("t_last"), col("dt")) - 1).as("j"))
          .groupBy("event_type")
          .agg(expr("""CAST(CAST(sum(y * shiftleft(CAST(1 AS BIGINT), CAST(15 - j AS INT)))
                      |   AS DECIMAL(38,0)) * 1000000 div 65535 AS BIGINT)""".stripMargin)
            .as("ewma_micro"))
        val nv = wl.where(datediff(col("t_last"), col("dt")) === 7)
          .select(col("event_type"), (col("y") * 1000000L).as("naive_micro"))
        val act = wl.where(col("dt") === col("t_last"))
          .select(col("event_type"), col("y").as("actual"))
        ew.join(nv, "event_type").join(act, "event_type")
          .select(col("event_type"),
            abs(col("ewma_micro") - col("actual") * 1000000L).as("ewma_err_micro"),
            abs(col("naive_micro") - col("actual") * 1000000L).as("naive_err_micro"))
          .select(col("event_type"), col("ewma_err_micro"), col("naive_err_micro"),
            expr("""CASE WHEN naive_err_micro = 0 THEN CAST(NULL AS BIGINT)
                   | ELSE CAST(CAST(ewma_err_micro AS DECIMAL(38,0)) * 1000000
                   |   div naive_err_micro AS BIGINT) END""".stripMargin)
              .as("skill_micro"))
          .orderBy("event_type")
      },
      Some("""WITH grid AS (
             |  SELECT d.dt, t.event_type FROM
             |    (SELECT DISTINCT CAST(ts AS DATE) AS dt FROM events) d
             |    CROSS JOIN (SELECT DISTINCT event_type FROM events) t),
             |cnt AS (SELECT CAST(ts AS DATE) AS dt, event_type, count(*) AS y
             |        FROM events GROUP BY 1, 2),
             |g AS (SELECT grid.dt, grid.event_type, coalesce(cnt.y, 0) AS y
             |      FROM grid LEFT JOIN cnt ON grid.dt = cnt.dt AND grid.event_type = cnt.event_type),
             |mx AS (SELECT max(dt) AS t_last FROM g),
             |ew AS (SELECT event_type,
             |        CAST(CAST(sum(y * (CAST(1 AS BIGINT) << (15 - (date_diff('day', g.dt, t_last) - 1))))
             |             AS HUGEINT) * 1000000 // 65535 AS BIGINT) AS ewma_micro
             |      FROM g CROSS JOIN mx
             |      WHERE g.dt < t_last AND date_diff('day', g.dt, t_last) <= 16
             |      GROUP BY 1),
             |nv AS (SELECT event_type, y * 1000000 AS naive_micro
             |       FROM g CROSS JOIN mx WHERE date_diff('day', g.dt, t_last) = 7),
             |act AS (SELECT event_type, y AS actual FROM g CROSS JOIN mx WHERE g.dt = t_last),
             |e2 AS (SELECT ew.event_type AS event_type,
             |         abs(ewma_micro - actual * 1000000) AS ewma_err_micro,
             |         abs(naive_micro - actual * 1000000) AS naive_err_micro
             |       FROM ew JOIN nv ON nv.event_type = ew.event_type
             |       JOIN act ON act.event_type = ew.event_type)
             |SELECT event_type, CAST(ewma_err_micro AS BIGINT) AS ewma_err_micro,
             |  CAST(naive_err_micro AS BIGINT) AS naive_err_micro,
             |  CAST(CASE WHEN naive_err_micro = 0 THEN NULL
             |    ELSE CAST(ewma_err_micro AS HUGEINT) * 1000000 // naive_err_micro
             |  END AS BIGINT) AS skill_micro
             |FROM e2 ORDER BY event_type""".stripMargin)),

    // Welch's unequal-variance t-test on purchase value between the two
    // md5-hash arms (the q_ab_assign split — hash-based, so both engines
    // assign identical arms): t and the Welch–Satterthwaite df from ONE
    // conditional-moment aggregate — six exact 128-bit integer moments
    // shuffle, nothing else (the distributed-inference shape beside
    // q_cuped). The closed forms are identical IEEE expressions over
    // those exact integers in both engines (the libm-parity convention);
    // on the null split the fixture t sits near 0 — the honest reading.
    QueryDef(
      "q_welch_ttest",
      (s, d) => {
        val u = Tables.events(s, d).select("user_id").distinct()
          .withColumn("arm",
            when(substring(md5(concat(lit("ab:"), col("user_id"))), 1, 1) < "8",
              "A").otherwise("B"))
        val p = Tables.events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id"), expr("CAST(round(value*1000) AS BIGINT)").as("v"))
          .join(u, "user_id")
        p.agg(
            count(when(col("arm") === "A", 1)).as("na"),
            count(when(col("arm") === "B", 1)).as("nb"),
            sum(when(col("arm") === "A", expr("CAST(v AS DECIMAL(38,0))"))).as("sa"),
            sum(when(col("arm") === "B", expr("CAST(v AS DECIMAL(38,0))"))).as("sb"),
            sum(when(col("arm") === "A", expr("CAST(v AS DECIMAL(38,0)) * v"))).as("s2a"),
            sum(when(col("arm") === "B", expr("CAST(v AS DECIMAL(38,0)) * v"))).as("s2b"))
          .select(col("na"), col("nb"),
            expr("CAST(sa * 1000 div na AS BIGINT)").as("mean_a_micro"),
            expr("CAST(sb * 1000 div nb AS BIGINT)").as("mean_b_micro"),
            expr("""CAST(round((CAST(sa AS DOUBLE)/na - CAST(sb AS DOUBLE)/nb)
                   | / sqrt(CAST(na*s2a - sa*sa AS DOUBLE)/(CAST(na AS DOUBLE)*na*(na-1))
                   |      + CAST(nb*s2b - sb*sb AS DOUBLE)/(CAST(nb AS DOUBLE)*nb*(nb-1))) * 1000)
                   | AS BIGINT)""".stripMargin).as("t_milli"),
            expr("""CAST(round(pow(CAST(na*s2a - sa*sa AS DOUBLE)/(CAST(na AS DOUBLE)*na*(na-1))
                   |        + CAST(nb*s2b - sb*sb AS DOUBLE)/(CAST(nb AS DOUBLE)*nb*(nb-1)), 2)
                   | / (pow(CAST(na*s2a - sa*sa AS DOUBLE)/(CAST(na AS DOUBLE)*na*(na-1)), 2)/(na-1)
                   |  + pow(CAST(nb*s2b - sb*sb AS DOUBLE)/(CAST(nb AS DOUBLE)*nb*(nb-1)), 2)/(nb-1))
                   | * 1000) AS BIGINT)""".stripMargin).as("df_milli"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |arm AS (SELECT user_id, CASE WHEN substr(md5('ab:' || user_id),1,1) < '8'
             |          THEN 'A' ELSE 'B' END AS arm FROM u),
             |p AS (SELECT a.arm, CAST(round(e.value*1000) AS BIGINT) AS v
             |      FROM events e JOIN arm a USING (user_id) WHERE e.event_type='purchase'),
             |m AS (SELECT count(*) FILTER (WHERE arm='A') AS na,
             |        count(*) FILTER (WHERE arm='B') AS nb,
             |        sum(CAST(v AS HUGEINT)) FILTER (WHERE arm='A') AS sa,
             |        sum(CAST(v AS HUGEINT)) FILTER (WHERE arm='B') AS sb,
             |        sum(CAST(v AS HUGEINT)*v) FILTER (WHERE arm='A') AS s2a,
             |        sum(CAST(v AS HUGEINT)*v) FILTER (WHERE arm='B') AS s2b
             |      FROM p)
             |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
             |  CAST(sa * 1000 // na AS BIGINT) AS mean_a_micro,
             |  CAST(sb * 1000 // nb AS BIGINT) AS mean_b_micro,
             |  CAST(round((CAST(sa AS DOUBLE)/na - CAST(sb AS DOUBLE)/nb)
             |    / sqrt(CAST(na*s2a - sa*sa AS DOUBLE)/(CAST(na AS DOUBLE)*na*(na-1))
             |         + CAST(nb*s2b - sb*sb AS DOUBLE)/(CAST(nb AS DOUBLE)*nb*(nb-1))) * 1000)
             |    AS BIGINT) AS t_milli,
             |  CAST(round(pow(CAST(na*s2a - sa*sa AS DOUBLE)/(CAST(na AS DOUBLE)*na*(na-1))
             |           + CAST(nb*s2b - sb*sb AS DOUBLE)/(CAST(nb AS DOUBLE)*nb*(nb-1)), 2)
             |    / (pow(CAST(na*s2a - sa*sa AS DOUBLE)/(CAST(na AS DOUBLE)*na*(na-1)), 2)/(na-1)
             |     + pow(CAST(nb*s2b - sb*sb AS DOUBLE)/(CAST(nb AS DOUBLE)*nb*(nb-1)), 2)/(nb-1))
             |    * 1000) AS BIGINT) AS df_milli
             |FROM m""".stripMargin)),

    // Theil–Sen robust trend of the daily purchase series: the median of
    // all pairwise day-slopes — the estimator that shrugs off a single
    // anomalous day where OLS does not. The day series is CALENDAR-
    // bounded (≤ #days rows after one map-combined aggregate), so the
    // C(days,2) pair fan-out and its rank are bounded by the calendar,
    // never by data volume — the q_changepoint boundedness convention;
    // the big-table work is exactly one grouped count. Slopes are
    // micro-rounded from identical IEEE divisions of exact small
    // integers, and the p25/50/75 picks are rank-ceil exact.
    QueryDef(
      "q_theilsen",
      (s, d) => {
        val dd = Tables.events(s, d).where(col("event_type") === "purchase")
          .groupBy(col("ts").cast("date").as("day")).agg(count(lit(1)).as("c"))
        val d2 = dd.withColumn("i",
          row_number().over(Window.orderBy("day")).cast("long"))
        val a = d2.select(col("i").as("i1"), col("c").as("c1"))
        val b = d2.select(col("i").as("i2"), col("c").as("c2"))
        val pr = a.join(broadcast(b), col("i2") > col("i1"))
          .select(col("i1"), col("i2"),
            expr("CAST(round((c2 - c1) * 1000000.0 / (i2 - i1)) AS BIGINT)")
              .as("slope_micro"))
        val r = pr
          .withColumn("rn", row_number().over(
            Window.orderBy("slope_micro", "i1", "i2")).cast("long"))
          .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        val edges = Seq(25, 50, 75).map { qq =>
          r.where(col("rn") === expr(s"($qq * n + 99) div 100"))
            .select(lit(qq).as("q"), col("slope_micro"))
        }.reduce(_.unionByName(_))
        edges.orderBy("q")
      },
      Some("""WITH dd AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS c
             |            FROM events WHERE event_type='purchase' GROUP BY 1),
             |d2 AS (SELECT row_number() OVER (ORDER BY day) AS i, c FROM dd),
             |pr AS (SELECT a.i AS i1, b.i AS i2,
             |         CAST(round((b.c - a.c) * 1000000.0 / (b.i - a.i)) AS BIGINT) AS slope_micro
             |       FROM d2 a JOIN d2 b ON b.i > a.i),
             |r AS (SELECT slope_micro, i1, i2,
             |        row_number() OVER (ORDER BY slope_micro, i1, i2) AS rn,
             |        count(*) OVER () AS n FROM pr)
             |SELECT q, slope_micro FROM (
             |  SELECT 25 AS q, slope_micro FROM r WHERE rn = (25*n + 99) // 100
             |  UNION ALL SELECT 50, slope_micro FROM r WHERE rn = (50*n + 99) // 100
             |  UNION ALL SELECT 75, slope_micro FROM r WHERE rn = (75*n + 99) // 100)
             |ORDER BY q""".stripMargin)),

    // Kendall tau-a rank correlation between the daily view and purchase
    // counts — the nonparametric "do busy browse days convert?" readout
    // beside q_spearman's value-rank form. Day pairs are calendar-
    // bounded (C(days,2) after one grouped count — the q_theilsen
    // argument), concordance is exact integer sign arithmetic, and tau
    // micro-rounds one IEEE division of exact integers, so both engines
    // agree bit-for-bit.
    QueryDef(
      "q_kendall_tau",
      (s, d) => {
        val dd = Tables.events(s, d)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(when(col("event_type") === "view", 1)).as("x"),
            count(when(col("event_type") === "purchase", 1)).as("y"))
        val a = dd.select(col("day").as("d1"), col("x").as("x1"), col("y").as("y1"))
        val b = dd.select(col("day").as("d2"), col("x").as("x2"), col("y").as("y2"))
        a.join(broadcast(b), col("d1") < col("d2"))
          .select(
            when(expr("(x1 - x2) * (y1 - y2) > 0"), 1L).otherwise(0L).as("conc"),
            when(expr("(x1 - x2) * (y1 - y2) < 0"), 1L).otherwise(0L).as("disc"))
          .agg(count(lit(1)).as("n_pairs"),
            sum("conc").as("concordant"), sum("disc").as("discordant"))
          .select(col("n_pairs"), col("concordant"), col("discordant"),
            expr("CAST(round((concordant - discordant) * 1000000.0 / n_pairs) AS BIGINT)")
              .as("tau_a_micro"))
      },
      Some("""WITH dd AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |    count(CASE WHEN event_type='view' THEN 1 END) AS x,
             |    count(CASE WHEN event_type='purchase' THEN 1 END) AS y
             |  FROM events GROUP BY 1),
             |pr AS (SELECT CASE WHEN (a.x-b.x)*(a.y-b.y) > 0 THEN 1 ELSE 0 END AS conc,
             |              CASE WHEN (a.x-b.x)*(a.y-b.y) < 0 THEN 1 ELSE 0 END AS disc
             |       FROM dd a JOIN dd b ON a.day < b.day)
             |SELECT count(*) AS n_pairs,
             |  CAST(sum(conc) AS BIGINT) AS concordant,
             |  CAST(sum(disc) AS BIGINT) AS discordant,
             |  CAST(round(sum(conc - disc) * 1000000.0 / count(*)) AS BIGINT) AS tau_a_micro
             |FROM pr""".stripMargin)),

    // mutual information between event type and the high-value flag —
    // the model-free dependence screen beside q_cramers_v (MI reads in
    // nats and feeds feature selection directly). One grouped count
    // builds the bounded |types|×2 contingency grid; marginals re-
    // aggregate the GRID (never the fact table), and each cell's
    // p·ln(p/(px·py)) term is nano-quantized BEFORE the sum — the
    // reduction is an exact integer sum over ≤ 2·|types| cells, immune
    // to float summation order (the cross-engine convention). Near-zero
    // on the value⊥type fixture — the honest null.
    QueryDef(
      "q_mutual_info",
      (s, d) => {
        val c = Tables.events(s, d)
          .select(col("event_type"),
            when(col("value") > 250, 1).otherwise(0).as("hv"))
          .groupBy("event_type", "hv").agg(count(lit(1)).as("n"))
        val t = c.agg(sum("n").as("tot"))
        val mx = c.groupBy("event_type").agg(sum("n").as("nx"))
        val my = c.groupBy("hv").agg(sum("n").as("ny"))
        c.join(mx, "event_type").join(my, "hv").crossJoin(broadcast(t))
          .select(expr("""CAST(round(1000000000 * (CAST(n AS DOUBLE) / tot)
                 | * ln(CAST(n AS DOUBLE) * tot / (CAST(nx AS DOUBLE) * ny)))
                 | AS BIGINT)""".stripMargin).as("term_nano"))
          .agg(count(lit(1)).as("n_cells"), sum("term_nano").as("mi_nano"))
      },
      Some("""WITH c AS (SELECT event_type, CASE WHEN value > 250 THEN 1 ELSE 0 END AS hv,
             |             count(*) AS n FROM events GROUP BY 1, 2),
             |t AS (SELECT sum(n) AS tot FROM c),
             |mx AS (SELECT event_type, sum(n) AS nx FROM c GROUP BY 1),
             |my AS (SELECT hv, sum(n) AS ny FROM c GROUP BY 1),
             |terms AS (SELECT CAST(round(1000000000 * (CAST(c.n AS DOUBLE) / t.tot)
             |    * ln(CAST(c.n AS DOUBLE) * t.tot / (CAST(mx.nx AS DOUBLE) * my.ny)))
             |    AS BIGINT) AS term_nano
             |  FROM c JOIN mx USING (event_type) JOIN my USING (hv) CROSS JOIN t)
             |SELECT count(*) AS n_cells, CAST(sum(term_nano) AS BIGINT) AS mi_nano
             |FROM terms""".stripMargin)),

    // lead–lag cross-correlation: Pearson r between daily view counts
    // and purchase counts k days LATER, k = 0..5 — the "does browse
    // volume predict buying volume, and with what delay" readout that
    // sizes marketing attribution windows. The day series is calendar-
    // bounded after one grouped count; each lag's moments are exact
    // 128-bit integer sums and r micro-rounds one IEEE expression over
    // them (the q_assortativity closed form), so both engines agree bit
    // for bit at every lag.
    QueryDef(
      "q_lag_corr",
      (s, d) => {
        val dd = Tables.events(s, d)
          .groupBy(col("ts").cast("date").as("day"))
          .agg(count(when(col("event_type") === "view", 1)).as("x"),
            count(when(col("event_type") === "purchase", 1)).as("y"))
        val lags = s.range(6).select(col("id").cast("int").as("lag"))
        val a = dd.select(col("day").as("d1"), col("x"))
        val b = dd.select(col("day").as("d2"), col("y"))
        a.crossJoin(broadcast(lags))
          .join(broadcast(b), expr("d2 = date_add(d1, lag)"))
          .groupBy("lag")
          .agg(count(lit(1)).as("n_days"),
            sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
            sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"),
            sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
            sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("syy"))
          .select(col("lag"), col("n_days").as("n_days"),
            expr("""CAST(round(CAST(n_days*sxy - sx*sy AS DOUBLE)
                   | / sqrt(CAST(n_days*sxx - sx*sx AS DOUBLE)
                   |        * CAST(n_days*syy - sy*sy AS DOUBLE)) * 1000000)
                   | AS BIGINT)""".stripMargin).as("r_micro"))
          .orderBy("lag")
      },
      Some("""WITH dd AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |    count(CASE WHEN event_type='view' THEN 1 END) AS x,
             |    count(CASE WHEN event_type='purchase' THEN 1 END) AS y
             |  FROM events GROUP BY 1),
             |lags AS (SELECT CAST(unnest(range(0, 6)) AS INT) AS lag),
             |p AS (SELECT l.lag, a.x, b.y FROM lags l
             |      JOIN dd a ON true
             |      JOIN dd b ON b.day = a.day + to_days(l.lag)),
             |m AS (SELECT lag, count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx,
             |        sum(CAST(y AS HUGEINT)) AS sy, sum(CAST(x AS HUGEINT)*y) AS sxy,
             |        sum(CAST(x AS HUGEINT)*x) AS sxx, sum(CAST(y AS HUGEINT)*y) AS syy
             |      FROM p GROUP BY 1)
             |SELECT lag, CAST(n AS BIGINT) AS n_days,
             |  CAST(round(CAST(n*sxy - sx*sy AS DOUBLE)
             |    / sqrt(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
             |    * 1000000) AS BIGINT) AS r_micro
             |FROM m ORDER BY lag""".stripMargin)),

    // Wasserstein-1 (earth mover's) distance between the purchase and
    // click value distributions — the drift metric that, unlike
    // q_ks_test's sup-norm, weighs HOW FAR mass moved, not just the
    // worst crossing. Identical machinery to the KS ECDF: one grouped
    // count onto the bounded integer-cents domain, cumulative counts
    // over that domain (calendar-of-values-bounded, never data-sized),
    // and W₁ = Σ|F₁−F₂|·gap stays EXACT integer arithmetic end to end —
    // |cum₁·n₂ − cum₂·n₁|·gap summed, divided once at the end (micro
    // cents via 128-bit div).
    QueryDef(
      "q_wasserstein",
      (s, d) => {
        val v = Tables.events(s, d)
          .where(col("event_type").isin("purchase", "click"))
          .select(col("event_type"),
            expr("CAST(round(value*100) AS BIGINT)").as("c"))
        val n = v.agg(
          count(when(col("event_type") === "purchase", 1)).as("n1"),
          count(when(col("event_type") === "click", 1)).as("n2"))
        val g = v.groupBy("c").agg(
          count(when(col("event_type") === "purchase", 1)).as("c1"),
          count(when(col("event_type") === "click", 1)).as("c2"))
        val w = Window.orderBy("c")
        val e = g
          .withColumn("cum1", sum("c1").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("cum2", sum("c2").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("cnext", lead("c", 1).over(w))
          .where(col("cnext").isNotNull)
        e.crossJoin(broadcast(n))
          .agg(sum(expr("""abs(CAST(cum1 AS DECIMAL(38,0)) * n2
                         | - CAST(cum2 AS DECIMAL(38,0)) * n1) * (cnext - c)"""
            .stripMargin)).as("num"),
            max("n1").as("n1"), max("n2").as("n2"))
          .select(col("n1").as("n_purchase"), col("n2").as("n_click"),
            // the divisor product widens through DECIMAL(38,0) like the
            // numerator: a bare n1*n2 is 64-bit and wraps silently with
            // ANSI off at ~3e9 rows per class — a scale-only divergence
            // the sf0.01 gate can't catch (DuckDB promotes to HUGEINT)
            expr("CAST(num * 10000 div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)")
              .as("w1_microunit"))
      },
      Some("""WITH v AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events
             |           WHERE event_type IN ('purchase','click')),
             |n AS (SELECT count(*) FILTER (WHERE event_type='purchase') AS n1,
             |             count(*) FILTER (WHERE event_type='click') AS n2 FROM v),
             |g AS (SELECT c, count(*) FILTER (WHERE event_type='purchase') AS c1,
             |             count(*) FILTER (WHERE event_type='click') AS c2
             |      FROM v GROUP BY 1),
             |e AS (SELECT c,
             |        sum(c1) OVER (ORDER BY c) AS cum1, sum(c2) OVER (ORDER BY c) AS cum2,
             |        lead(c) OVER (ORDER BY c) AS cnext
             |      FROM g),
             |w AS (SELECT sum(abs(CAST(cum1 AS HUGEINT) * n.n2 - CAST(cum2 AS HUGEINT) * n.n1)
             |               * (cnext - c)) AS num
             |      FROM e CROSS JOIN n WHERE cnext IS NOT NULL)
             |SELECT CAST(n.n1 AS BIGINT) AS n_purchase, CAST(n.n2 AS BIGINT) AS n_click,
             |  CAST(w.num * 10000 // (n.n1 * n.n2) AS BIGINT) AS w1_microunit
             |FROM w CROSS JOIN n""".stripMargin)),

    // Mann–Kendall trend test on the daily purchase series — the
    // distribution-free "is there a monotone trend" gate beside
    // q_theilsen's slope estimate (the pair: MK says WHETHER, Theil–Sen
    // says HOW MUCH). S and the tie-corrected variance are exact integer
    // arithmetic over the calendar-bounded day pairs; the continuity-
    // corrected z is one IEEE expression over those integers. |z| < 1.96
    // on the fixture — no significant trend, honestly reported.
    QueryDef(
      "q_mann_kendall",
      (s, d) => {
        val dd = Tables.events(s, d).where(col("event_type") === "purchase")
          .groupBy(col("ts").cast("date").as("day")).agg(count(lit(1)).as("y"))
        val a = dd.select(col("day").as("d1"), col("y").as("y1"))
        val b = dd.select(col("day").as("d2"), col("y").as("y2"))
        val sFrame = a.join(broadcast(b), col("d2") > col("d1"))
          .agg(sum(expr("CASE WHEN y2 > y1 THEN 1 WHEN y2 < y1 THEN -1 ELSE 0 END"))
            .as("s"))
        val nFrame = dd.agg(count(lit(1)).as("n"))
        val ties = dd.groupBy("y").agg(count(lit(1)).as("t"))
          .where(col("t") > 1)
          .agg(coalesce(sum(expr("t*(t-1)*(2*t+5)")), lit(0L)).as("tt"))
        sFrame.crossJoin(broadcast(nFrame)).crossJoin(broadcast(ties))
          .select(col("s").as("s_stat"), col("n").as("n_days"),
            expr("""CAST(round((s - CASE WHEN s > 0 THEN 1 WHEN s < 0 THEN -1 ELSE 0 END)
                   | / sqrt((CAST(n AS DOUBLE)*(n-1)*(2*n+5) - tt) / 18.0) * 1000)
                   | AS BIGINT)""".stripMargin).as("z_milli"))
      },
      Some("""WITH dd AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, count(*) AS y
             |            FROM events WHERE event_type='purchase' GROUP BY 1),
             |pr AS (SELECT CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
             |       FROM dd a JOIN dd b ON b.day > a.day),
             |s AS (SELECT CAST(sum(sgn) AS BIGINT) AS S, (SELECT count(*) FROM dd) AS n FROM pr),
             |ties AS (SELECT coalesce(sum(t*(t-1)*(2*t+5)), 0) AS tt FROM (
             |          SELECT count(*) AS t FROM dd GROUP BY y HAVING count(*) > 1))
             |SELECT s.S AS s_stat, CAST(s.n AS BIGINT) AS n_days,
             |  CAST(round((s.S - CASE WHEN s.S > 0 THEN 1 WHEN s.S < 0 THEN -1 ELSE 0 END)
             |    / sqrt((CAST(s.n AS DOUBLE)*(s.n-1)*(2*s.n+5) - ties.tt) / 18.0) * 1000)
             |    AS BIGINT) AS z_milli
             |FROM s CROSS JOIN ties""".stripMargin)),

    // calibration / reliability table: treat value/500 as a predicted
    // purchase probability, cut into 10 equal-width probability bins,
    // and report each bin's mean confidence vs actual purchase rate with
    // the |gap| — the reliability diagram (and the per-bin terms of ECE)
    // every scored-model rollout is gated on. ONE map-combined grouped
    // aggregate over the fact table (bin id is closed-form integer
    // arithmetic, never a rank); all rates exact integer micros. The
    // fixture score is confident-but-flat — miscalibration honestly
    // surfaced, which is what the table exists to show.
    QueryDef(
      "q_calibration",
      (s, d) => {
        val sc = Tables.events(s, d).where(col("value").isNotNull)
          .select(expr("CAST(round(value*2000) AS BIGINT)").as("p_micro"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        sc.groupBy(expr("least(p_micro div 100000, CAST(9 AS BIGINT))").as("bin"))
          .agg(count(lit(1)).as("n"), sum("y").as("pos"),
            sum(expr("CAST(p_micro AS DECIMAL(38,0))")).as("psum"))
          .select(col("bin").cast("int").as("bin"), col("n"),
            expr("CAST(pos * 1000000 div n AS BIGINT)").as("actual_micro"),
            expr("CAST(psum div n AS BIGINT)").as("conf_micro"))
          .withColumn("gap_micro", abs(col("actual_micro") - col("conf_micro")))
          .orderBy("bin")
      },
      Some("""WITH sc AS (SELECT CAST(round(value*2000) AS BIGINT) AS p_micro,
             |      CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y
             |    FROM events WHERE value IS NOT NULL),
             |b AS (SELECT least(p_micro // 100000, 9) AS bin, count(*) AS n,
             |        sum(y) AS pos, sum(CAST(p_micro AS HUGEINT)) AS psum
             |      FROM sc GROUP BY 1),
             |r AS (SELECT CAST(bin AS INT) AS bin, CAST(n AS BIGINT) AS n,
             |        CAST(pos * 1000000 // n AS BIGINT) AS actual_micro,
             |        CAST(psum // n AS BIGINT) AS conf_micro
             |      FROM b)
             |SELECT r.*, CAST(abs(actual_micro - conf_micro) AS BIGINT) AS gap_micro
             |FROM r ORDER BY bin""".stripMargin)),

    // precision–recall sweep: P and R of the "value >= threshold ⇒ will
    // purchase" classifier over a 10-point threshold grid — the curve a
    // score's operating point is picked from. SCALE SHAPE: the fact
    // table collapses to the bounded integer-cents histogram first (one
    // map-combined aggregate); the threshold sweep then runs over
    // histogram × 10 grid rows, never over raw events. Exact integer
    // micros; NULL precision where the grid passes the score's support
    // (both engines agree on the NULL).
    QueryDef(
      "q_pr_curve",
      (s, d) => {
        val sc = Tables.events(s, d).where(col("value").isNotNull)
          .select(expr("CAST(round(value*100) AS BIGINT)").as("c"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        val g = sc.groupBy("c").agg(count(lit(1)).as("nc"), sum("y").as("pc"))
        val tot = sc.agg(sum("y").as("pos"))
        val th = s.range(10).select((col("id") * 5000L).as("thr"))
        g.crossJoin(broadcast(th))
          .groupBy("thr")
          .agg(sum(when(col("c") >= col("thr"), col("nc"))).as("pred_pos"),
            sum(when(col("c") >= col("thr"), col("pc"))).as("tp"))
          .crossJoin(broadcast(tot))
          .select(col("thr").as("threshold_cents"),
            expr("CAST(coalesce(tp, 0) * 1000000 div nullif(pred_pos, 0) AS BIGINT)")
              .as("precision_micro"),
            expr("CAST(coalesce(tp, 0) * 1000000 div pos AS BIGINT)")
              .as("recall_micro"))
          .orderBy("threshold_cents")
      },
      Some("""WITH sc AS (SELECT CAST(round(value*100) AS BIGINT) AS c,
             |      CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS y
             |    FROM events WHERE value IS NOT NULL),
             |g AS (SELECT c, count(*) AS nc, sum(y) AS pc FROM sc GROUP BY 1),
             |tot AS (SELECT sum(y) AS pos FROM sc),
             |th AS (SELECT unnest(range(0, 10)) * 5000 AS thr),
             |m AS (SELECT thr, sum(CASE WHEN c >= thr THEN nc END) AS pred_pos,
             |        sum(CASE WHEN c >= thr THEN pc END) AS tp
             |      FROM g CROSS JOIN th GROUP BY 1)
             |SELECT CAST(thr AS BIGINT) AS threshold_cents,
             |  CAST(coalesce(tp, 0) * 1000000 // nullif(pred_pos, 0) AS BIGINT) AS precision_micro,
             |  CAST(coalesce(tp, 0) * 1000000 // tot.pos AS BIGINT) AS recall_micro
             |FROM m CROSS JOIN tot ORDER BY thr""".stripMargin)),

    // Cohen's kappa inter-rater agreement: rater A = the value>250 rule,
    // rater B = the same rule on a deterministically md5-jittered value
    // (±128 milli noise from the event id — both engines derive the
    // identical perturbation, the q_bootstrap_ci hash convention) —
    // chance-corrected agreement between two labeling functions, the
    // label-quality gate run before training on programmatic labels.
    // One conditional-count aggregate; kappa is one IEEE expression over
    // the five exact integers.
    QueryDef(
      "q_cohens_kappa",
      (s, d) => {
        val r = Tables.events(s, d).where(col("value").isNotNull)
          .select(
            when(col("value") > 250, 1L).otherwise(0L).as("a"),
            when(col("value") +
              (conv(substring(md5(concat(lit("k:"),
                col("event_id").cast("string"))), 1, 2), 16, 10)
                .cast("long") - lit(127.5)) > 250, 1L).otherwise(0L).as("b"))
        r.agg(count(lit(1)).as("n"),
            count(when(col("a") === 1 && col("b") === 1, 1)).as("n11"),
            count(when(col("a") === 0 && col("b") === 0, 1)).as("n00"),
            count(when(col("a") === 1, 1)).as("a1"),
            count(when(col("b") === 1, 1)).as("b1"))
          .select(col("n"), col("n11").as("both_pos"), col("n00").as("both_neg"),
            expr("""CAST(round((CAST(n11 + n00 AS DOUBLE)/n
                   | - (CAST(a1 AS DOUBLE)*b1 + CAST(n - a1 AS DOUBLE)*(n - b1))
                   |   /(CAST(n AS DOUBLE)*n))
                   | / (1 - (CAST(a1 AS DOUBLE)*b1 + CAST(n - a1 AS DOUBLE)*(n - b1))
                   |   /(CAST(n AS DOUBLE)*n)) * 1000000) AS BIGINT)""".stripMargin)
              .as("kappa_micro"))
      },
      Some("""WITH r AS (SELECT CASE WHEN value > 250 THEN 1 ELSE 0 END AS a,
             |    CASE WHEN value + (CAST(('0x' || substr(md5('k:' || event_id), 1, 2)) AS BIGINT)
             |         - 127.5) > 250 THEN 1 ELSE 0 END AS b
             |  FROM events WHERE value IS NOT NULL),
             |c AS (SELECT count(*) AS n,
             |        count(*) FILTER (WHERE a=1 AND b=1) AS n11,
             |        count(*) FILTER (WHERE a=0 AND b=0) AS n00,
             |        count(*) FILTER (WHERE a=1) AS a1,
             |        count(*) FILTER (WHERE b=1) AS b1 FROM r)
             |SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS both_pos,
             |  CAST(n00 AS BIGINT) AS both_neg,
             |  CAST(round((CAST(n11 + n00 AS DOUBLE)/n
             |    - (CAST(a1 AS DOUBLE)*b1 + CAST(n - a1 AS DOUBLE)*(n - b1))
             |      /(CAST(n AS DOUBLE)*n))
             |    / (1 - (CAST(a1 AS DOUBLE)*b1 + CAST(n - a1 AS DOUBLE)*(n - b1))
             |      /(CAST(n AS DOUBLE)*n)) * 1000000) AS BIGINT) AS kappa_micro
             |FROM c""".stripMargin)),

    // per-user ML feature-vector assembly — the wide feature-store row
    // a training job reads (activity volume, breadth, tenure shape,
    // purchase behavior, error propensity) materialized in ONE grouped
    // pass over the fact table: the multiple distinct aggregates ride
    // Spark's expand, everything else map-combines, and every feature
    // is exact-integer so the stored table is bit-stable across
    // engines and reruns (what makes feature backfills diffable).
    // Pairs with q_pit_features, which serves these rows leak-free.
    QueryDef(
      "q_user_features",
      (s, d) => {
        Tables.events(s, d).groupBy("user_id").agg(
            count(lit(1)).as("n_events"),
            countDistinct(col("event_type")).as("n_types"),
            countDistinct(col("ts").cast("date")).as("active_days"),
            datediff(lit("2024-02-01").cast("date"), max(to_date(col("ts"))))
              .cast("long").as("recency_days"),
            count(when(col("event_type") === "purchase", 1)).as("purchases"),
            coalesce(sum(when(col("event_type") === "purchase",
              expr("CAST(round(value*1000) AS BIGINT)"))), lit(0L))
              .as("purchase_milli"),
            expr("count(CASE WHEN event_type='error' THEN 1 END) * 1000000 div count(1)")
              .as("error_rate_micro"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id,
             |  count(*) AS n_events,
             |  count(DISTINCT event_type) AS n_types,
             |  count(DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS active_days,
             |  CAST(date_diff('day', max(CAST(ts AS TIMESTAMP)),
             |    TIMESTAMP '2024-02-01 00:00:00') AS BIGINT) AS recency_days,
             |  count(CASE WHEN event_type='purchase' THEN 1 END) AS purchases,
             |  CAST(coalesce(sum(CASE WHEN event_type='purchase'
             |    THEN CAST(round(value*1000) AS BIGINT) END), 0) AS BIGINT) AS purchase_milli,
             |  count(CASE WHEN event_type='error' THEN 1 END) * 1000000 // count(*)
             |    AS error_rate_micro
             |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin)),

    // Brier score with the Murphy decomposition — q_calibration's
    // scalar companion: overall mean squared probability error, split
    // into reliability (binned miscalibration), resolution (how much
    // the bins separate outcomes), and outcome uncertainty. The Brier
    // sum and the uncertainty term are EXACT 128-bit integer
    // arithmetic; the two binned terms nano-quantize per bin before
    // summing over the bounded 10-bin grid (the q_mutual_info
    // convention). REL − RES + UNC reproduces the Brier score up to the
    // within-bin variance the binned decomposition absorbs (≤ 0.1 % on
    // the fixture) — the standard caveat, honestly carried.
    QueryDef(
      "q_brier_decomp",
      (s, d) => {
        val sc = Tables.events(s, d).where(col("value").isNotNull)
          .select(expr("CAST(round(value*2000) AS BIGINT)").as("p"),
            when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        val t = sc.agg(count(lit(1)).as("n"), sum("y").as("pos"),
          sum(expr("""CAST(p - y*1000000 AS DECIMAL(38,0))
                     | * (p - y*1000000)""".stripMargin)).as("sq"))
        val b = sc.groupBy(expr("least(p div 100000, CAST(9 AS BIGINT))").as("bin"))
          .agg(count(lit(1)).as("nb"), sum("y").as("pos_b"),
            sum(expr("CAST(p AS DECIMAL(38,0))")).as("psum"))
        val terms = b.crossJoin(broadcast(t))
          .select(
            expr("""CAST(round(pow(CAST(psum - pos_b*1000000 AS DOUBLE), 2)
                   | / nb / 1000) AS BIGINT)""".stripMargin).as("rel_nano"),
            expr("""CAST(round(pow(CAST(pos_b AS DOUBLE)/nb
                   | - CAST(pos AS DOUBLE)/n, 2) * nb * 1000000000)
                   | AS BIGINT)""".stripMargin).as("res_nano"))
        terms.agg(sum("rel_nano").as("rel"), sum("res_nano").as("res"))
          .crossJoin(broadcast(t))
          .select(col("n"),
            expr("CAST(sq div (n * 1000000) AS BIGINT)").as("brier_micro"),
            expr("CAST(rel div (n * 1000) AS BIGINT)").as("reliability_micro"),
            expr("CAST(res div (n * 1000) AS BIGINT)").as("resolution_micro"),
            expr("""CAST(CAST(pos AS DECIMAL(38,0)) * (n - pos) * 1000000
                   | div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)""".stripMargin)
              .as("uncertainty_micro"))
      },
      Some("""WITH sc AS (SELECT CAST(round(value*2000) AS BIGINT) AS p,
             |      CAST(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END AS BIGINT) AS y
             |    FROM events WHERE value IS NOT NULL),
             |t AS (SELECT count(*) AS N, sum(y) AS pos,
             |        sum(CAST(p - y*1000000 AS HUGEINT) * (p - y*1000000)) AS sq FROM sc),
             |b AS (SELECT least(p // 100000, 9) AS bin, count(*) AS nb, sum(y) AS pos_b,
             |        sum(CAST(p AS HUGEINT)) AS psum FROM sc GROUP BY 1),
             |terms AS (SELECT
             |    CAST(round(pow(CAST(psum - pos_b*1000000 AS DOUBLE), 2) / nb / 1000)
             |      AS BIGINT) AS rel_nano,
             |    CAST(round(pow(CAST(pos_b AS DOUBLE)/nb - (SELECT CAST(pos AS DOUBLE)/N FROM t), 2)
             |      * nb * 1000000000) AS BIGINT) AS res_nano
             |  FROM b)
             |SELECT (SELECT CAST(N AS BIGINT) FROM t) AS n,
             |  (SELECT CAST(sq // (N * 1000000) AS BIGINT) FROM t) AS brier_micro,
             |  CAST(sum(rel_nano) // ((SELECT N FROM t) * 1000) AS BIGINT) AS reliability_micro,
             |  CAST(sum(res_nano) // ((SELECT N FROM t) * 1000) AS BIGINT) AS resolution_micro,
             |  (SELECT CAST(CAST(pos AS HUGEINT) * (N - pos) * 1000000
             |     // (CAST(N AS HUGEINT) * N) AS BIGINT) FROM t) AS uncertainty_micro
             |FROM terms""".stripMargin)),

    // one-way ANOVA of event value across the five event types — the
    // F-test feature screen that completes the selection triad beside
    // q_chisq (categorical independence) and q_mutual_info (nonlinear):
    // between/within variance from per-group exact 128-bit integer
    // moments in one grouped pass. The per-group s²/n term quantizes to
    // an integer BEFORE the cross-group sum — unordered double addition
    // never happens, so both engines add identical integers — and F /
    // eta² are single IEEE closed forms over those exact sums. Fixture
    // value ⊥ type, so F ≈ 0.4: the honest null.
    QueryDef(
      "q_anova",
      (s, d) => {
        val g = Tables.events(s, d).where(col("value").isNotNull)
          .select(col("event_type"),
            expr("CAST(round(value*1000) AS BIGINT)").as("v"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(v AS DECIMAL(38,0))")).as("s"),
            sum(expr("CAST(v AS DECIMAL(38,0)) * v")).as("s2"))
          .select(col("n"), col("s"), col("s2"),
            expr("CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS DECIMAL(38,0))")
              .as("t"))
        g.agg(count(lit(1)).as("k"), sum("n").as("n"), sum("s").as("s"),
            sum("s2").as("s2"), sum("t").as("sb"))
          .select(col("k"), col("n"),
            expr("""CAST(round((CAST(sb AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)
                   | /(CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)
                   | * 1000000) AS BIGINT)""".stripMargin).as("eta2_micro"),
            expr("""CAST(round(((CAST(sb AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)/(k-1))
                   | /((CAST(s2 AS DOUBLE) - CAST(sb AS DOUBLE))/(n-k)) * 1000)
                   | AS BIGINT)""".stripMargin).as("f_milli"))
      },
      Some("""WITH v AS (SELECT event_type, CAST(round(value*1000) AS BIGINT) AS v
             |    FROM events WHERE value IS NOT NULL),
             |g AS (SELECT event_type, count(*) AS n, sum(CAST(v AS HUGEINT)) AS s,
             |        sum(CAST(v AS HUGEINT)*v) AS s2 FROM v GROUP BY 1),
             |g2 AS (SELECT n, s, s2,
             |        CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS HUGEINT) AS t FROM g),
             |a AS (SELECT count(*) AS k, sum(n) AS n, sum(s) AS s, sum(s2) AS s2,
             |        sum(t) AS sb FROM g2)
             |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
             |  CAST(round((CAST(sb AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)
             |    /(CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)
             |    * 1000000) AS BIGINT) AS eta2_micro,
             |  CAST(round(((CAST(sb AS DOUBLE) - CAST(s AS DOUBLE)*CAST(s AS DOUBLE)/n)/(k-1))
             |    /((CAST(s2 AS DOUBLE) - CAST(sb AS DOUBLE))/(n-k)) * 1000)
             |    AS BIGINT) AS f_milli
             |FROM a""".stripMargin)),

    // exact tie-corrected ROC AUC of a deterministically md5-noised
    // score against the value>250 ground truth (the q_cohens_kappa
    // signal construction): mid-rank AUC computed on the score
    // HISTOGRAM, never raw events — 2·U = Σ_s pos_s·(2·cum_neg_below +
    // neg_s) stays exact 128-bit integer, and auc_micro is one integer
    // division. The cumulative window is partitionless but runs over
    // the score domain, which is RANGE-bounded (integer cents plus
    // ±128·200 noise ⇒ ≤ ~10⁵ distinct values at any corpus size), not
    // row-scaled — the q_pr_curve bounded-histogram argument. Gini is
    // derived from the already-quantized AUC, so no signed division.
    QueryDef(
      "q_roc_auc",
      (s, d) => {
        val sc = Tables.events(s, d).where(col("value").isNotNull)
          .select((expr("CAST(round(value*100) AS BIGINT)")
              + (conv(substring(md5(concat(lit("auc:"),
                  col("event_id").cast("string"))), 1, 2), 16, 10)
                .cast("long") - 128L) * 200L).as("score"),
            when(col("value") > 250, 1L).otherwise(0L).as("y"))
        val h = sc.groupBy("score")
          .agg(sum("y").as("p"), (count(lit(1)) - sum("y")).as("q"))
        val c = h.select(col("p"), col("q"),
          coalesce(sum("q").over(Window.orderBy("score")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("cq"))
        c.agg(sum(expr("CAST(p AS DECIMAL(38,0)) * (2*cq + q)")).as("u2"),
            sum("p").as("n1"), sum("q").as("n0"))
          .select(col("n1").as("n_pos"), col("n0").as("n_neg"),
            // 2*n1*n0 widened through DECIMAL(38,0): the bare 64-bit
            // product wraps at ~2e9 rows per class with ANSI off, while
            // DuckDB promotes to HUGEINT — same widening convention as
            // the numerator
            expr("CAST(u2 * 1000000 div (2 * CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT)")
              .as("auc_micro"),
            (expr("CAST(u2 * 1000000 div (2 * CAST(n1 AS DECIMAL(38,0)) * n0) AS BIGINT)")
              * lit(2L) - lit(1000000L)).as("gini_micro"))
      },
      Some("""WITH s AS (SELECT CAST(round(value*100) AS BIGINT)
             |      + (CAST(('0x' || substr(md5('auc:' || event_id), 1, 2)) AS BIGINT) - 128)*200 AS score,
             |    CASE WHEN value > 250 THEN 1 ELSE 0 END AS y
             |  FROM events WHERE value IS NOT NULL),
             |h AS (SELECT score, count(*) FILTER (WHERE y=1) AS p,
             |        count(*) FILTER (WHERE y=0) AS q FROM s GROUP BY 1),
             |c AS (SELECT p, q, coalesce(sum(q) OVER (ORDER BY score
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cq FROM h),
             |u AS (SELECT sum(CAST(p AS HUGEINT)*(2*cq + q)) AS u2,
             |        sum(p) AS n1, sum(q) AS n0 FROM c)
             |SELECT CAST(n1 AS BIGINT) AS n_pos, CAST(n0 AS BIGINT) AS n_neg,
             |  CAST(u2 * 1000000 // (2*n1*n0) AS BIGINT) AS auc_micro,
             |  CAST(u2 * 1000000 // (2*n1*n0) AS BIGINT)*2 - 1000000 AS gini_micro
             |FROM u""".stripMargin)),

    // macro-averaged F1 between the 3-class value-band truth and a
    // deterministically jittered prediction (±16 value noise from the
    // event id) — the multi-class companion to q_cohens_kappa's binary
    // agreement and q_pr_curve's threshold sweep. ONE map-combined
    // shuffle builds the ≤9-row confusion matrix; tp/fp/fn and the
    // per-class F1 are derived from that tiny frame, and the macro
    // average windows over exactly 3 rows. Every F1 is an exact
    // integer division of exact counts.
    QueryDef(
      "q_macro_f1",
      (s, d) => {
        import s.implicits._
        val j = Tables.events(s, d).where(col("value").isNotNull)
          .select(col("value"),
            ((conv(substring(md5(concat(lit("f1:"),
                col("event_id").cast("string"))), 1, 2), 16, 10)
              .cast("long") - lit(127.5)) / 8).as("jit"))
        val r = j.select(
          when(col("value") < 20, "low").when(col("value") < 80, "mid")
            .otherwise("high").as("truth"),
          when(col("value") + col("jit") < 20, "low")
            .when(col("value") + col("jit") < 80, "mid")
            .otherwise("high").as("pred"))
        val m = r.groupBy("truth", "pred").agg(count(lit(1)).as("n"))
        val tp = m.where(col("truth") === col("pred"))
          .select(col("truth").as("cls"), col("n").as("tp"))
        val fp = m.where(col("truth") =!= col("pred"))
          .groupBy(col("pred").as("cls")).agg(sum("n").as("fp"))
        val fn = m.where(col("truth") =!= col("pred"))
          .groupBy(col("truth").as("cls")).agg(sum("n").as("fn"))
        Seq("high", "low", "mid").toDF("cls")
          .join(tp, Seq("cls"), "left").join(fp, Seq("cls"), "left")
          .join(fn, Seq("cls"), "left")
          .select(col("cls"), coalesce(col("tp"), lit(0L)).as("tp"),
            coalesce(col("fp"), lit(0L)).as("fp"),
            coalesce(col("fn"), lit(0L)).as("fn"))
          .select(col("cls"), col("tp"), col("fp"), col("fn"),
            expr("CAST(2*tp*1000000 div (2*tp+fp+fn) AS BIGINT)").as("f1_micro"))
          .select(col("cls"), col("tp"), col("fp"), col("fn"), col("f1_micro"),
            expr("CAST(CAST(sum(f1_micro) OVER () AS BIGINT) div 3 AS BIGINT)")
              .as("macro_f1_micro"))
          .orderBy("cls")
      },
      Some("""WITH j AS (SELECT value,
             |      (CAST(('0x' || substr(md5('f1:' || event_id), 1, 2)) AS BIGINT) - 127.5)/8 AS jit
             |    FROM events WHERE value IS NOT NULL),
             |r AS (SELECT CASE WHEN value < 20 THEN 'low' WHEN value < 80 THEN 'mid'
             |          ELSE 'high' END AS truth,
             |        CASE WHEN value + jit < 20 THEN 'low' WHEN value + jit < 80 THEN 'mid'
             |          ELSE 'high' END AS pred FROM j),
             |m AS (SELECT truth, pred, count(*) AS n FROM r GROUP BY 1, 2),
             |k AS (SELECT unnest(['high','low','mid']) AS cls),
             |f AS (SELECT cls,
             |    coalesce((SELECT sum(n) FROM m WHERE truth=cls AND pred=cls), 0) AS tp,
             |    coalesce((SELECT sum(n) FROM m WHERE pred=cls AND truth<>cls), 0) AS fp,
             |    coalesce((SELECT sum(n) FROM m WHERE truth=cls AND pred<>cls), 0) AS fn
             |  FROM k)
             |SELECT cls, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
             |  CAST(fn AS BIGINT) AS fn,
             |  CAST(2*tp*1000000 // (2*tp+fp+fn) AS BIGINT) AS f1_micro,
             |  CAST(CAST(sum(2*tp*1000000 // (2*tp+fp+fn)) OVER () AS BIGINT) // 3 AS BIGINT)
             |    AS macro_f1_micro
             |FROM f ORDER BY cls""".stripMargin)),

    // position-based (U-shaped) multi-touch attribution — the marketing
    // credit model beside q_first_touch's single-touch rule: each
    // converting user's pre-first-purchase view/click touches share one
    // unit of credit 40/20/40 (first / evenly-split middles / last;
    // k=1 takes all, k=2 splits 50/50). Credits are exact integer micro
    // (middle share is one positive integer division), windows are
    // user-partitioned (the natural 100 TB key), and the rollup is one
    // grouped sum per touch type.
    QueryDef(
      "q_position_attribution",
      (s, d) => {
        val ev = Tables.events(s, d)
        val fp = ev.where(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts").as("pts"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val t = ev.where(col("event_type").isin("view", "click"))
          .join(fp, "user_id").where(col("ts") < col("pts"))
          .select(col("event_type"),
            row_number().over(w).as("r"),
            count(lit(1)).over(Window.partitionBy("user_id")).as("k"))
        t.select(col("event_type"),
            expr("""CASE WHEN k = 1 THEN 1000000
                   |     WHEN r = 1 OR r = k THEN CASE WHEN k = 2 THEN 500000 ELSE 400000 END
                   |     ELSE 200000 div (k - 2) END""".stripMargin).as("credit"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_touches"),
            sum("credit").cast("long").as("credit_micro_total"))
          .orderBy("event_type")
      },
      Some("""WITH fp AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS pts FROM events
             |      WHERE event_type='purchase' GROUP BY 1),
             |t AS (SELECT e.event_type,
             |        row_number() OVER (PARTITION BY e.user_id
             |          ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id) AS r,
             |        count(*) OVER (PARTITION BY e.user_id) AS k
             |      FROM events e JOIN fp ON fp.user_id = e.user_id
             |      WHERE e.event_type IN ('view','click') AND CAST(e.ts AS TIMESTAMP) < fp.pts),
             |c AS (SELECT event_type,
             |        CASE WHEN k = 1 THEN 1000000
             |             WHEN r = 1 OR r = k THEN CASE WHEN k = 2 THEN 500000 ELSE 400000 END
             |             ELSE 200000 // (k - 2) END AS credit
             |      FROM t)
             |SELECT event_type, count(*) AS n_touches,
             |  CAST(sum(credit) AS BIGINT) AS credit_micro_total
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // time-decay multi-touch attribution — the fifth model beside
    // U-shaped (q_position_attribution) and linear/first/last
    // (q_attribution_compare): each pre-purchase touch earns weight
    // halving per 7 days of distance to the conversion, normalized per
    // user so every conversion distributes exactly one credit. The
    // decay is the EXACT integer 10⁶ ≫ (age_days div 7) (the
    // q_decay_popularity bit-shift convention — no libm in the weight),
    // and the per-user normalizer is a user-partitioned window sum, so
    // every credit is an exact integer ratio.
    QueryDef(
      "q_time_decay_attribution",
      (s, d) => {
        val ev = Tables.events(s, d)
        val fp = ev.where(col("event_type") === "purchase")
          .groupBy("user_id").agg(min(expr("CAST(ts AS DATE)")).as("pd"))
        val t = ev.where(col("event_type").isin("view", "click"))
          .join(fp, "user_id")
          .where(col("ts").cast("date") <= col("pd"))
          .select(col("user_id"), col("event_type"),
            // clamp to ≥ 1: past 20 weeks the shift exceeds 10⁶ and the
            // integer weight would underflow to 0 — a user whose every
            // touch is that old would get tw = 0 and credit = 0/0 (NULL
            // in Spark ANSI-off, a division error in DuckDB — the
            // silhouette crash-vs-value class), silently violating
            // "every conversion distributes exactly one credit"
            expr("""greatest(1000000 div shiftleft(CAST(1 AS BIGINT),
                   |  CAST(least(datediff(pd, CAST(ts AS DATE)) div 7, 62) AS INT)),
                   |  CAST(1 AS BIGINT))""".stripMargin).as("w"))
        val norm = t.withColumn("tw",
          sum("w").over(Window.partitionBy("user_id")))
        norm.select(col("event_type"),
            expr("(1000000 * w) div tw").as("credit"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_touches"),
            sum("credit").cast("long").as("credit_micro_total"))
          .orderBy("event_type")
      },
      Some("""WITH fp AS (SELECT user_id, min(CAST(ts AS DATE)) AS pd FROM events
             |      WHERE event_type='purchase' GROUP BY 1),
             |t AS (SELECT e.user_id, e.event_type,
             |        greatest(1000000 // (CAST(1 AS BIGINT) << least(
             |          (fp.pd - CAST(e.ts AS DATE)) // 7, 62)), 1) AS w
             |      FROM events e JOIN fp ON fp.user_id = e.user_id
             |      WHERE e.event_type IN ('view','click')
             |        AND CAST(e.ts AS DATE) <= fp.pd),
             |n AS (SELECT event_type, w,
             |        sum(w) OVER (PARTITION BY user_id) AS tw FROM t),
             |c AS (SELECT event_type, (1000000 * w) // tw AS credit FROM n)
             |SELECT event_type, count(*) AS n_touches,
             |  CAST(sum(credit) AS BIGINT) AS credit_micro_total
             |FROM c GROUP BY 1 ORDER BY 1""".stripMargin)),

    // quantity-WEIGHTED median unit price per brand — the weighted
    // quantile no built-in percentile gives (a 40-unit line should pull
    // the "typical price" 40× harder than a 1-unit line): the median is
    // the first price whose running weight crosses half the brand's
    // total. Scale shape: weights aggregate to the (brand, unit_cents)
    // HISTOGRAM first (map-combined — the raw lines never reach a
    // window), and the cumulative rides the bounded PRICE DOMAIN per
    // brand (the q_roc_auc / q_ks_test convention; the first cut ran a
    // brand-partitioned window over raw lines and grew 16× at the 100×
    // probe — 25 brands ⇒ data-sized partitions, the single-task trap).
    // The crossing price is unique at histogram grain, so no tie-break
    // key is needed.
    QueryDef(
      "q_weighted_median",
      (s, d) => {
        val h = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand").as("brand"),
            expr("CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT)")
              .as("unit_cents"))
          .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("q"))
        val cum = h.withColumn("cw",
            sum("q").over(Window.partitionBy("brand").orderBy("unit_cents")))
          .withColumn("tw", sum("q").over(Window.partitionBy("brand")))
        cum.where(col("cw") * 2 >= col("tw"))
          .groupBy("brand")
          .agg(min("unit_cents").as("weighted_median_cents"),
            max("tw").as("tw"))
          .select(col("brand"), col("tw").cast("long").as("total_units"),
            col("weighted_median_cents").cast("long").as("weighted_median_cents"))
          .orderBy("brand")
      },
      Some("""WITH h AS (SELECT p.p_brand AS brand,
             |    CAST(round(l.l_extendedprice / l.l_quantity * 100) AS BIGINT) AS unit_cents,
             |    sum(CAST(round(l.l_quantity) AS BIGINT)) AS q
             |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |  GROUP BY 1, 2),
             |cum AS (SELECT brand, unit_cents,
             |    sum(q) OVER (PARTITION BY brand ORDER BY unit_cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
             |    sum(q) OVER (PARTITION BY brand) AS tw
             |  FROM h)
             |SELECT brand, CAST(max(tw) AS BIGINT) AS total_units,
             |  CAST(min(unit_cents) AS BIGINT) AS weighted_median_cents
             |FROM cum WHERE cw * 2 >= tw GROUP BY brand ORDER BY brand""".stripMargin)),

    // event-time disorder profile with the watermark-loss curve — the
    // measurement every Structured Streaming watermark is tuned from:
    // within each user's stream (event_id as arrival order), an event
    // is LATE by the gap to the user's running-max event time, and the
    // readout is the share of events a 1-minute / 5-minute / 15-minute
    // watermark would drop. Lateness rides ONE user-partitioned running
    // max in exact epoch-micro space; the loss curve is one conditional
    // aggregate. The synthetic stream arrives nearly in order, so small
    // losses here are the honest green light the streaming suite's
    // fixed watermarks rely on.
    QueryDef(
      "q_disorder_profile",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsu"))
        val w = Window.partitionBy("user_id").orderBy("event_id")
          .rowsBetween(Window.unboundedPreceding, -1)
        val late = e
          .withColumn("mx", max("tsu").over(w))
          .select(
            when(col("mx").isNotNull && col("mx") > col("tsu"),
              col("mx") - col("tsu")).otherwise(lit(0L)).as("late_us"))
        late.agg(count(lit(1)).as("n"),
            sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
            max("late_us").as("max_late_us"),
            sum(when(col("late_us") > 60000000L, 1L).otherwise(0L)).as("l1"),
            sum(when(col("late_us") > 300000000L, 1L).otherwise(0L)).as("l5"),
            sum(when(col("late_us") > 900000000L, 1L).otherwise(0L)).as("l15"))
          .select(col("n").cast("long").as("n_events"),
            expr("CAST((1000000 * n_late) div n AS BIGINT)").as("late_share_micro"),
            expr("CAST(max_late_us div 1000000 AS BIGINT)").as("max_late_sec"),
            expr("CAST((1000000 * l1) div n AS BIGINT)").as("lost_at_1m_micro"),
            expr("CAST((1000000 * l5) div n AS BIGINT)").as("lost_at_5m_micro"),
            expr("CAST((1000000 * l15) div n AS BIGINT)").as("lost_at_15m_micro"))
      },
      Some("""WITH e AS (SELECT user_id, event_id,
             |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu FROM events),
             |l AS (SELECT CASE WHEN mx IS NOT NULL AND mx > tsu
             |        THEN mx - tsu ELSE 0 END AS late_us
             |  FROM (SELECT tsu, max(tsu) OVER (PARTITION BY user_id
             |      ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND 1 PRECEDING) AS mx FROM e)),
             |a AS (SELECT count(*) AS n,
             |    sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS n_late,
             |    max(late_us) AS max_late_us,
             |    sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END) AS l1,
             |    sum(CASE WHEN late_us > 300000000 THEN 1 ELSE 0 END) AS l5,
             |    sum(CASE WHEN late_us > 900000000 THEN 1 ELSE 0 END) AS l15
             |  FROM l)
             |SELECT CAST(n AS BIGINT) AS n_events,
             |  CAST((1000000 * n_late) // n AS BIGINT) AS late_share_micro,
             |  CAST(max_late_us // 1000000 AS BIGINT) AS max_late_sec,
             |  CAST((1000000 * l1) // n AS BIGINT) AS lost_at_1m_micro,
             |  CAST((1000000 * l5) // n AS BIGINT) AS lost_at_5m_micro,
             |  CAST((1000000 * l15) // n AS BIGINT) AS lost_at_15m_micro
             |FROM a""".stripMargin)),

    // ε-differential-privacy histogram release — the U23 companion that
    // ADDS noise instead of suppressing rows: per-type event counts
    // with Laplace(b=2 ⇒ ε=0.5 at sensitivity 1) noise, derived
    // deterministically from an md5-seeded 24-bit uniform via the
    // inverse CDF (the md5-sampler convention, so both engines draw the
    // identical "noise"). The uniform stays exact integer until ONE
    // double division and one ln; released counts clamp at zero (the
    // standard post-processing). Per-type true count, the noise drawn,
    // and the released value, all milli.
    QueryDef(
      "q_dp_histogram",
      (s, d) => {
        val c = Tables.events(s, d).groupBy("event_type")
          .agg(count(lit(1)).as("n"))
        c.select(col("event_type"), col("n"),
            (conv(substring(md5(concat(lit("dp:"), col("event_type"))), 1, 6), 16, 10)
              .cast("long") * 2 + 1 - 16777216L).as("m"))
          .select(col("event_type"), col("n"),
            expr("""CAST(round(2000 * (CASE WHEN m < 0 THEN 1 ELSE -1 END)
                   | * ln(CAST(16777216 - abs(m) AS DOUBLE)/16777216))
                   | AS BIGINT)""".stripMargin).as("noise_milli"))
          .select(col("event_type"), col("n"), col("noise_milli"),
            expr("CAST(greatest(n * 1000 + noise_milli, 0) AS BIGINT)")
              .as("released_milli"))
          .orderBy("event_type")
      },
      Some("""WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
             |u AS (SELECT event_type, n,
             |    CAST(('0x' || substr(md5('dp:' || event_type), 1, 6)) AS BIGINT) * 2 + 1
             |      - 16777216 AS m FROM c),
             |z AS (SELECT event_type, n,
             |    CAST(round(2000 * (CASE WHEN m < 0 THEN 1 ELSE -1 END)
             |      * ln(CAST(16777216 - abs(m) AS DOUBLE)/16777216)) AS BIGINT) AS noise_milli
             |  FROM u)
             |SELECT event_type, CAST(n AS BIGINT) AS n, noise_milli,
             |  CAST(greatest(n * 1000 + noise_milli, 0) AS BIGINT) AS released_milli
             |FROM z ORDER BY event_type""".stripMargin)),

    // sample-ratio-mismatch guardrail — the FIRST check any A/B readout
    // runs: χ² goodness-of-fit of the md5-hash arm counts against the
    // declared 50/50 split, flagged at the 3.841 critical value
    // (α=0.05, df=1). For an even split the statistic collapses to
    // (2·n_A − n)²/n, which stays exact 128-bit integer until one
    // micro division; the flag compares the exact rational in IEEE
    // double identically in both engines. Pairs with q_ab_assign
    // (the split) and q_welch_ttest (the readout this gate protects).
    QueryDef(
      "q_srm_check",
      (s, d) => {
        val arm = Tables.events(s, d).select("user_id").distinct()
          .select(when(substring(md5(concat(lit("ab:"), col("user_id"))), 1, 1) < "8",
            "A").otherwise("B").as("arm"))
        arm.agg(count(when(col("arm") === "A", 1)).as("na"),
            count(when(col("arm") === "B", 1)).as("nb"),
            count(lit(1)).as("n"))
          .select(col("na"), col("nb"),
            expr("""CAST(CAST(2*na - n AS DECIMAL(38,0))*(2*na - n) * 1000000 div n
                   | AS BIGINT)""".stripMargin).as("chi2_micro"),
            expr("""CAST(CASE WHEN CAST(CAST(2*na - n AS DECIMAL(38,0))*(2*na - n) AS DOUBLE) / n
                   | > CAST(3.841 AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT)""".stripMargin)
              .as("srm_flag"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |arm AS (SELECT CASE WHEN substr(md5('ab:' || user_id),1,1) < '8'
             |          THEN 'A' ELSE 'B' END AS arm FROM u),
             |c AS (SELECT count(*) FILTER (WHERE arm='A') AS na,
             |        count(*) FILTER (WHERE arm='B') AS nb, count(*) AS n FROM arm)
             |SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
             |  CAST(CAST(2*na - n AS HUGEINT)*(2*na - n) * 1000000 // n AS BIGINT) AS chi2_micro,
             |  CAST(CASE WHEN CAST(CAST(2*na - n AS HUGEINT)*(2*na - n) AS DOUBLE) / n
             |    > CAST(3.841 AS DOUBLE) THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
             |FROM c""".stripMargin)),

    // classic day-N retention curve pooled over first-purchase cohorts —
    // the growth chart beside q_orders_cohort's month-grain report: for
    // N = 1..7, the share of ever-purchasers who purchase again exactly
    // N days after their first purchase. "Any event" retention is
    // degenerate on this fixture (users fire events daily); purchase
    // retention lands at a non-trivial 28–40 %. One purchase-only scan
    // feeds both the cohort frame and the (user, day) distinct frame;
    // the 7-row N range broadcasts, so the plan is user-keyed shuffles
    // plus bounded-frame tails at any scale.
    QueryDef(
      "q_retention_curve",
      (s, d) => {
        val p = Tables.events(s, d).where(col("event_type") === "purchase")
        val fp = p.groupBy("user_id").agg(min(to_date(col("ts"))).as("d0"))
        val ud = p.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val n = s.range(1, 8).select(col("id").as("day_n"))
        val cohort = fp.agg(count(lit(1)).as("cohort"))
        fp.join(ud, "user_id").crossJoin(broadcast(n))
          .groupBy("day_n")
          .agg(countDistinct(when(col("day") ===
            expr("date_add(d0, CAST(day_n AS INT))"), col("user_id")))
            .as("retained"))
          .crossJoin(broadcast(cohort))
          .select(col("day_n"), col("cohort"), col("retained"),
            expr("retained * 1000 div cohort").as("retention_milli"))
          .orderBy("day_n")
      },
      Some("""WITH p AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
             |      FROM events WHERE event_type='purchase'),
             |fp AS (SELECT user_id, min(day) AS d0 FROM p GROUP BY 1),
             |ud AS (SELECT DISTINCT user_id, day FROM p),
             |n AS (SELECT unnest(range(1, 8)) AS day_n),
             |ret AS (SELECT n.day_n,
             |    count(DISTINCT CASE WHEN ud.day = fp.d0 + CAST(n.day_n AS INT)
             |      THEN fp.user_id END) AS retained
             |  FROM fp JOIN ud ON ud.user_id = fp.user_id CROSS JOIN n GROUP BY 1)
             |SELECT CAST(day_n AS BIGINT) AS day_n,
             |  CAST((SELECT count(*) FROM fp) AS BIGINT) AS cohort,
             |  CAST(retained AS BIGINT) AS retained,
             |  CAST(retained * 1000 // (SELECT count(*) FROM fp) AS BIGINT)
             |    AS retention_milli
             |FROM ret ORDER BY day_n""".stripMargin)),

    // per-user Markov sequence surprisal — the behavioral anomaly score:
    // fit the global first-order event-type transition model, then score
    // each user's own sequence by total/per-step negative log-likelihood.
    // The model is a 25-cell broadcast table with each cell's
    // −ln P(to|from) nano-quantized ONCE (the q_mutual_info bounded-term
    // convention: both engines round the identical double before any
    // integer arithmetic); per-user scores are then exact integer sums of
    // (cell count × nano term). Transitions come from one user-partitioned
    // lead window; everything downstream of the two grouped counts is
    // bounded by the 5×5 type grid. Top-20 by per-step surprisal — the
    // fixture's value⊥type independence puts all users near ln(5), the
    // honest null, but micro-grain ordering is still deterministic.
    QueryDef(
      "q_sequence_surprisal",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val tr = Tables.events(s, d)
          .select(col("user_id"), col("event_type").as("f"),
            lead("event_type", 1).over(w).as("t"))
          .where(col("t").isNotNull)
        val g = tr.groupBy("f", "t").agg(count(lit(1)).as("n"))
        val gf = g.groupBy("f").agg(sum("n").as("nf"))
        val lnterm = g.join(gf, "f")
          .select(col("f"), col("t"),
            expr("CAST(round(ln(CAST(nf AS DOUBLE)/CAST(n AS DOUBLE)) * 1e9) AS BIGINT)")
              .as("s_nano"))
        val u = tr.groupBy("user_id", "f", "t").agg(count(lit(1)).as("c"))
        u.join(broadcast(lnterm), Seq("f", "t"))
          .groupBy("user_id")
          .agg(sum("c").as("n_transitions"),
            sum(col("c") * col("s_nano")).as("tot_nano"))
          .select(col("user_id"), col("n_transitions"),
            expr("tot_nano div 1000").as("surprisal_micro"),
            expr("tot_nano div n_transitions div 1000").as("per_step_micro"))
          .orderBy(col("per_step_micro").desc, col("user_id")).limit(20)
      },
      Some("""WITH seq AS (SELECT user_id, event_type AS f,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS t FROM events),
             |tr AS (SELECT user_id, f, t FROM seq WHERE t IS NOT NULL),
             |g AS (SELECT f, t, count(*) AS n FROM tr GROUP BY 1, 2),
             |gf AS (SELECT f, sum(n) AS nf FROM g GROUP BY 1),
             |lnterm AS (SELECT g.f, g.t,
             |    CAST(round(ln(CAST(gf.nf AS DOUBLE)/CAST(g.n AS DOUBLE)) * 1e9) AS BIGINT)
             |      AS s_nano
             |  FROM g JOIN gf USING (f)),
             |u AS (SELECT user_id, f, t, count(*) AS c FROM tr GROUP BY 1, 2, 3),
             |su AS (SELECT u.user_id, sum(u.c) AS n_transitions,
             |         sum(u.c * l.s_nano) AS tot_nano
             |       FROM u JOIN lnterm l ON l.f = u.f AND l.t = u.t GROUP BY 1)
             |SELECT user_id, CAST(n_transitions AS BIGINT) AS n_transitions,
             |  CAST(tot_nano // 1000 AS BIGINT) AS surprisal_micro,
             |  CAST(tot_nano // n_transitions // 1000 AS BIGINT) AS per_step_micro
             |FROM su ORDER BY per_step_micro DESC, user_id LIMIT 20""".stripMargin)),

    // side-by-side attribution-model comparison — linear / first-touch /
    // last-touch credit per touch type from ONE windowed frame (the
    // q_position_attribution pre-conversion frame): the report a marketing
    // platform shows before picking a credit rule. Linear credit
    // 1000000 div k is exact integer micro; first/last are indicator
    // sums. One user-keyed shuffle, one grouped rollup.
    QueryDef(
      "q_attribution_compare",
      (s, d) => {
        val ev = Tables.events(s, d)
        val fp = ev.where(col("event_type") === "purchase")
          .groupBy("user_id").agg(min("ts").as("pts"))
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val t = ev.where(col("event_type").isin("view", "click"))
          .join(fp, "user_id").where(col("ts") < col("pts"))
          .select(col("event_type"),
            row_number().over(w).as("r"),
            count(lit(1)).over(Window.partitionBy("user_id")).as("k"))
        t.groupBy("event_type")
          .agg(sum(expr("1000000 div k")).cast("long").as("linear_micro"),
            sum(when(col("r") === 1, 1000000L).otherwise(0L)).as("first_micro"),
            sum(when(col("r") === col("k"), 1000000L).otherwise(0L)).as("last_micro"))
          .orderBy("event_type")
      },
      Some("""WITH fp AS (SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS pts FROM events
             |      WHERE event_type='purchase' GROUP BY 1),
             |t AS (SELECT e.event_type,
             |        row_number() OVER (PARTITION BY e.user_id
             |          ORDER BY CAST(e.ts AS TIMESTAMP), e.event_id) AS r,
             |        count(*) OVER (PARTITION BY e.user_id) AS k
             |      FROM events e JOIN fp ON fp.user_id = e.user_id
             |      WHERE e.event_type IN ('view','click') AND CAST(e.ts AS TIMESTAMP) < fp.pts)
             |SELECT event_type,
             |  CAST(sum(1000000 // k) AS BIGINT) AS linear_micro,
             |  CAST(sum(CASE WHEN r = 1 THEN 1000000 ELSE 0 END) AS BIGINT) AS first_micro,
             |  CAST(sum(CASE WHEN r = k THEN 1000000 ELSE 0 END) AS BIGINT) AS last_micro
             |FROM t GROUP BY 1 ORDER BY 1""".stripMargin)),

    // per-day peak-hour load report — the capacity-planning readout: each
    // day's busiest hour, its event count, and its share of the day's
    // traffic. One grouped (day, hour) count — ≤ 744 rows at ANY scale —
    // then day-partitioned ranking and a day-total join, so everything
    // after the single events scan is calendar-bounded.
    QueryDef(
      "q_peak_load",
      (s, d) => {
        val h = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"), hour(col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"))
        val dt = h.groupBy("day").agg(sum("n").as("day_n"))
        val wd = Window.partitionBy("day").orderBy(col("n").desc, col("hr"))
        h.withColumn("rk", row_number().over(wd)).where(col("rk") === 1)
          .join(dt, "day")
          .select(col("day"), col("hr").cast("long").as("peak_hour"),
            col("n").as("peak_n"), col("day_n"),
            expr("n * 1000 div day_n").as("peak_share_milli"))
          .orderBy("day")
      },
      Some("""WITH h AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |        extract(hour FROM CAST(ts AS TIMESTAMP)) AS hr, count(*) AS n
             |      FROM events GROUP BY 1, 2),
             |d AS (SELECT day, sum(n) AS day_n FROM h GROUP BY 1),
             |p AS (SELECT day, hr, n,
             |        row_number() OVER (PARTITION BY day ORDER BY n DESC, hr) AS rk FROM h)
             |SELECT p.day, CAST(p.hr AS BIGINT) AS peak_hour, CAST(p.n AS BIGINT) AS peak_n,
             |  CAST(d.day_n AS BIGINT) AS day_n,
             |  CAST(p.n * 1000 // d.day_n AS BIGINT) AS peak_share_milli
             |FROM p JOIN d USING (day) WHERE rk = 1 ORDER BY day""".stripMargin)),

    // concurrent-sessions sweep-line — the interval-overlap operator: each
    // user-day's active span [first hour, last hour] becomes a +1/−1 delta
    // pair, deltas aggregate onto the ≤ 745-slot hour calendar, and ONE
    // cumulative pass over that bounded domain yields concurrency;
    // reported as each day's peak concurrent-user count and its hour.
    // This is how interval overlap is done at 100 TB — no interval
    // self-join, no per-event state: the sweep frame is the calendar, so
    // the partitionless cumulative window is bounded (whitelisted under
    // the q_changepoint calendar convention).
    QueryDef(
      "q_concurrency_sweep",
      (s, d) => {
        val sess = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(min(date_trunc("hour", col("ts"))).as("h0"),
            max(date_trunc("hour", col("ts"))).as("h1"))
        val deltas = sess.select(col("h0").as("h"), lit(1L).as("delta"))
          .unionAll(sess.select(expr("h1 + INTERVAL 1 HOUR").as("h"),
            lit(-1L).as("delta")))
          .groupBy("h").agg(sum("delta").as("delta"))
        val conc = deltas.withColumn("conc",
          sum("delta").over(Window.orderBy("h")))
        val wd = Window.partitionBy(to_date(col("h")))
          .orderBy(col("conc").desc, col("h"))
        conc.withColumn("rk", row_number().over(wd)).where(col("rk") === 1)
          .select(to_date(col("h")).as("day"),
            hour(col("h")).cast("long").as("peak_hour"),
            col("conc").cast("long").as("max_concurrent"))
          .orderBy("day")
      },
      Some("""WITH s AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             |        min(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h0,
             |        max(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS h1
             |      FROM events GROUP BY 1, 2),
             |d AS (SELECT h0 AS h, 1 AS delta FROM s
             |      UNION ALL SELECT h1 + INTERVAL 1 HOUR, -1 FROM s),
             |g AS (SELECT h, sum(delta) AS delta FROM d GROUP BY 1),
             |c AS (SELECT h, sum(delta) OVER (ORDER BY h) AS conc FROM g),
             |p AS (SELECT CAST(h AS DATE) AS day, extract(hour FROM h) AS hr, conc,
             |        row_number() OVER (PARTITION BY CAST(h AS DATE)
             |          ORDER BY conc DESC, h) AS rk FROM c)
             |SELECT day, CAST(hr AS BIGINT) AS peak_hour,
             |  CAST(conc AS BIGINT) AS max_concurrent
             |FROM p WHERE rk = 1 ORDER BY day""".stripMargin)),

    // daily new-vs-returning decomposition — each day's event volume with
    // its distinct users split by first-seen-that-day vs seen-before: the
    // standard DAU decomposition chart. One grouped min per user (the
    // first-seen frame, user-keyed) joined back on user_id, then one
    // day-grain rollup. The fixture's users all arrive in the first two
    // days, so new flatlines to zero after — the honest shape.
    QueryDef(
      "q_new_vs_returning",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"))
        val fs = ev.groupBy("user_id").agg(min("day").as("d0"))
        ev.join(fs, "user_id")
          .groupBy("day")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(when(col("day") === col("d0"), col("user_id")))
              .as("new_users"),
            countDistinct(when(col("day") > col("d0"), col("user_id")))
              .as("returning_users"),
            countDistinct(col("user_id")).as("dau"))
          .select(col("day"), col("n_events"), col("new_users"),
            col("returning_users"),
            expr("new_users * 1000 div dau").as("new_share_milli"))
          .orderBy("day")
      },
      Some("""WITH fs AS (SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
             |      FROM events GROUP BY 1),
             |e AS (SELECT e.user_id, CAST(CAST(e.ts AS TIMESTAMP) AS DATE) AS day
             |      FROM events e)
             |SELECT day, count(*) AS n_events,
             |  CAST(count(DISTINCT CASE WHEN day = d0 THEN e.user_id END) AS BIGINT)
             |    AS new_users,
             |  CAST(count(DISTINCT CASE WHEN day > d0 THEN e.user_id END) AS BIGINT)
             |    AS returning_users,
             |  CAST(count(DISTINCT CASE WHEN day = d0 THEN e.user_id END) * 1000
             |    // count(DISTINCT e.user_id) AS BIGINT) AS new_share_milli
             |FROM e JOIN fs USING (user_id) GROUP BY 1 ORDER BY 1""".stripMargin)),

    // longest consecutive-purchase-day streak per user — gaps-and-islands
    // on the (user, day) distinct frame via the day − row_number constant
    // (q_islands merges 5-minute event intervals; this is the day-grain
    // habit metric). Purchase-only keeps it non-degenerate (any-event
    // streaks span the whole fixture). All windows are user-partitioned;
    // top-10 via TakeOrdered.
    QueryDef(
      "q_streak_summary",
      (s, d) => {
        val ud = Tables.events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val wu = Window.partitionBy("user_id").orderBy("day")
        val st = ud.withColumn("rn", row_number().over(wu))
          .withColumn("grp", expr("date_add(day, -rn)"))
          .groupBy("user_id", "grp")
          .agg(count(lit(1)).as("streak_days"), min("day").as("start_day"))
        val wb = Window.partitionBy("user_id")
          .orderBy(col("streak_days").desc, col("start_day"))
        st.withColumn("rk", row_number().over(wb)).where(col("rk") === 1)
          .select(col("user_id"), col("streak_days"), col("start_day"))
          .orderBy(col("streak_days").desc, col("user_id")).limit(10)
      },
      Some("""WITH ud AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
             |      FROM events WHERE event_type = 'purchase'),
             |g AS (SELECT user_id, day,
             |        day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INT)
             |          AS grp FROM ud),
             |st AS (SELECT user_id, grp, count(*) AS len, min(day) AS start_day
             |       FROM g GROUP BY 1, 2),
             |best AS (SELECT user_id, len, start_day,
             |           row_number() OVER (PARTITION BY user_id
             |             ORDER BY len DESC, start_day) AS rk FROM st)
             |SELECT user_id, CAST(len AS BIGINT) AS streak_days, start_day
             |FROM best WHERE rk = 1 ORDER BY streak_days DESC, user_id LIMIT 10""".stripMargin)),

    // SRE error-budget burn-rate alert — the multi-window SLO readout:
    // per-hour error rate plus the 6-hour rolling rate, flagged when BOTH
    // windows burn above the 25 % budget (the fixture's base error rate
    // is 20 %, so flags fire on genuinely hot hours — 58 of 720). The
    // rolling frame slides over the ≤744-slot hour calendar after ONE
    // map-combined grouped count, so the partitionless window is
    // calendar-bounded (whitelisted, q_changepoint convention). Rates
    // are exact integer micro.
    QueryDef(
      "q_burn_rate",
      (s, d) => {
        val h = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts")).as("hr"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("e"))
        val w6 = Window.orderBy("hr").rowsBetween(-5, 0)
        h.select(col("hr"), col("n"), col("e"),
            sum("n").over(w6).as("n6"), sum("e").over(w6).as("e6"))
          .select(col("hr"),
            expr("e * 1000000 div n").as("rate1h_micro"),
            expr("e6 * 1000000 div n6").as("rate6h_micro"),
            expr("CAST(CASE WHEN e*4 > n AND e6*4 > n6 THEN 1 ELSE 0 END AS BIGINT)")
              .as("burn_flag"))
          .orderBy("hr")
      },
      Some("""WITH h AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
             |        count(*) AS n,
             |        sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS e
             |      FROM events GROUP BY 1),
             |w AS (SELECT hr, n, e,
             |        sum(n) OVER (ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS n6,
             |        sum(e) OVER (ORDER BY hr ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS e6
             |      FROM h)
             |SELECT hr, CAST(e * 1000000 // n AS BIGINT) AS rate1h_micro,
             |  CAST(e6 * 1000000 // n6 AS BIGINT) AS rate6h_micro,
             |  CAST(CASE WHEN e*4 > n AND e6*4 > n6 THEN 1 ELSE 0 END AS BIGINT) AS burn_flag
             |FROM w ORDER BY hr""".stripMargin)),

    // churn-risk triage — each user's idle time since last purchase
    // against their OWN purchasing rhythm: the lower median of
    // inter-purchase gaps (rank-picked at position (n+1) div 2, exact in
    // both engines — no interpolated median crosses the hash compare),
    // ratio in milli, flag at idle > 2× median. Gap and idle are exact
    // integer milliseconds. All windows are user-partitioned; top-10 by
    // idle ratio via TakeOrdered. 36 of 150 fixture users flag.
    QueryDef(
      "q_churn_risk",
      (s, d) => {
        // ts is TIMESTAMP_NTZ; the session timezone is pinned UTC repo-wide,
        // so the cast to TIMESTAMP makes unix_millis read the same instant
        // DuckDB's epoch_ms reads on the naive value.
        val p = Tables.events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            unix_millis(col("ts").cast("timestamp")).as("ms"))
        val anchor = p.agg(max(col("ms")).as("mx"))
        val wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
        // zero gaps (same-millisecond re-logs of one purchase) carry no
        // rhythm signal and would zero the median — the rhythm is defined
        // over POSITIVE inter-purchase gaps
        val gaps = p
          .select(col("user_id"),
            (col("ms") - lag("ms", 1).over(wu)).as("gap_ms"))
          .where(col("gap_ms").isNotNull && col("gap_ms") > 0)
        val wg = Window.partitionBy("user_id").orderBy("gap_ms")
        val med = gaps.withColumn("r", row_number().over(wg))
          .withColumn("n_gaps", count(lit(1)).over(Window.partitionBy("user_id")))
          .where(col("r") === expr("(n_gaps + 1) div 2"))
          .select(col("user_id"), col("n_gaps"), col("gap_ms").as("med_gap_ms"))
        val lastp = p.groupBy("user_id").agg(max(col("ms")).as("last_ms"))
        med.join(lastp, "user_id").crossJoin(broadcast(anchor))
          .select(col("user_id"), col("n_gaps"), col("med_gap_ms"),
            (col("mx") - col("last_ms")).as("idle_ms"))
          .select(col("user_id"), col("n_gaps"), col("med_gap_ms"), col("idle_ms"),
            expr("idle_ms * 1000 div med_gap_ms").as("idle_ratio_milli"),
            expr("CAST(CASE WHEN idle_ms > 2 * med_gap_ms THEN 1 ELSE 0 END AS BIGINT)")
              .as("churn_flag"))
          .orderBy(col("idle_ratio_milli").desc, col("user_id")).limit(10)
      },
      Some("""WITH p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
             |      WHERE event_type='purchase'),
             |anchor AS (SELECT max(epoch_ms(ts)) AS mx FROM p),
             |g AS (SELECT user_id,
             |        epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
             |          ORDER BY ts, event_id)) AS gap_ms FROM p),
             |gaps AS (SELECT user_id, gap_ms FROM g
             |         WHERE gap_ms IS NOT NULL AND gap_ms > 0),
             |rk AS (SELECT user_id, gap_ms,
             |         row_number() OVER (PARTITION BY user_id ORDER BY gap_ms) AS r,
             |         count(*) OVER (PARTITION BY user_id) AS n_gaps FROM gaps),
             |med AS (SELECT user_id, n_gaps, gap_ms AS med_gap_ms FROM rk
             |        WHERE r = (n_gaps + 1) // 2),
             |lastp AS (SELECT user_id, max(epoch_ms(ts)) AS last_ms FROM p GROUP BY 1)
             |SELECT m.user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
             |  CAST(med_gap_ms AS BIGINT) AS med_gap_ms,
             |  CAST((SELECT mx FROM anchor) - last_ms AS BIGINT) AS idle_ms,
             |  CAST(((SELECT mx FROM anchor) - last_ms) * 1000 // med_gap_ms AS BIGINT)
             |    AS idle_ratio_milli,
             |  CAST(CASE WHEN (SELECT mx FROM anchor) - last_ms > 2 * med_gap_ms
             |    THEN 1 ELSE 0 END AS BIGINT) AS churn_flag
             |FROM med m JOIN lastp l ON l.user_id = m.user_id
             |ORDER BY idle_ratio_milli DESC, m.user_id LIMIT 10""".stripMargin)),

    // Benjamini–Hochberg FDR screen — one chi-square independence test per
    // event type (type vs the rest × early/mid/late month-tercile, a 2×3
    // table ⇒ df = 2, whose survival function is the CLOSED FORM e^(-χ²/2):
    // no incomplete-gamma approximation crosses the engine boundary), then
    // the BH step-up at α = 0.05 across the m per-type p-values. Everything
    // after the ONE map-combined grouped count is margin arithmetic on the
    // ≤ |types| × 3 cell table; the rank/kmax windows run over the
    // |types|-row p frame (bounded by the type domain — q_macro_f1
    // convention). p is derived from the already-quantized χ² so both
    // engines exponentiate the same rational.
    QueryDef(
      "q_fdr_bh",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_type"),
            when(dayofmonth(col("ts")) <= 10, 0)
              .when(dayofmonth(col("ts")) <= 20, 1).otherwise(2).as("per"))
        val o = e.groupBy("event_type", "per").agg(count(lit(1)).as("o"))
        val tm = o.groupBy("per").agg(sum("o").as("np"))
        val ty = o.groupBy("event_type").agg(sum("o").as("nt"))
        val n = o.agg(sum("o").as("n"))
        val cells = ty.crossJoin(broadcast(tm)).crossJoin(broadcast(n))
          .join(o, Seq("event_type", "per"), "left")
          .select(col("event_type"),
            coalesce(col("o"), lit(0L)).as("obs"),
            expr("CAST(nt AS DOUBLE) * np / n").as("exp_in"),
            expr("CAST(n - nt AS DOUBLE) * np / n").as("exp_out"),
            (col("np") - coalesce(col("o"), lit(0L))).as("obs_out"))
        val chi = cells.groupBy("event_type")
          .agg(expr("""CAST(round(1000000.0 * sum((obs-exp_in)*(obs-exp_in)/exp_in
                      |  + (obs_out-exp_out)*(obs_out-exp_out)/exp_out)) AS BIGINT)"""
            .stripMargin).as("chisq_micro"))
        val p = chi.select(col("event_type"), col("chisq_micro"),
          expr("CAST(round(1000000.0 * exp(-CAST(chisq_micro AS DOUBLE)/2000000.0)) AS BIGINT)")
            .as("p_micro"))
        // the global windows below run over the |types|-row p frame —
        // bounded by the type domain, whitelisted in PlanAuditSpec
        val wAll = Window.partitionBy()
        val rk = p
          .withColumn("r", row_number().over(
            Window.orderBy(col("p_micro"), col("event_type"))))
          .withColumn("m", count(lit(1)).over(wAll))
        rk.withColumn("kmax",
            max(when(col("p_micro") * col("m") <= col("r") * 50000, col("r"))
              .otherwise(lit(0L))).over(wAll))
          .select(col("event_type"), col("chisq_micro"), col("p_micro"),
            col("r").cast("long").as("rk"),
            expr("(r * 50000) div m").as("thr_micro"),
            expr("CAST(CASE WHEN r <= kmax THEN 1 ELSE 0 END AS BIGINT)").as("reject"))
          .orderBy("rk")
      },
      Some("""WITH e AS (SELECT event_type,
             |      CASE WHEN day(CAST(ts AS TIMESTAMP)) <= 10 THEN 0
             |           WHEN day(CAST(ts AS TIMESTAMP)) <= 20 THEN 1 ELSE 2 END AS per
             |    FROM events),
             |o AS (SELECT event_type, per, count(*) AS o FROM e GROUP BY 1,2),
             |tm AS (SELECT per, sum(o) AS np FROM o GROUP BY 1),
             |ty AS (SELECT event_type, sum(o) AS nt FROM o GROUP BY 1),
             |n AS (SELECT sum(o) AS n FROM o),
             |cells AS (SELECT t.event_type,
             |    coalesce(o.o, 0) AS obs,
             |    CAST(t.nt AS DOUBLE) * p.np / n.n AS exp_in,
             |    CAST(n.n - t.nt AS DOUBLE) * p.np / n.n AS exp_out,
             |    p.np - coalesce(o.o, 0) AS obs_out
             |  FROM ty t CROSS JOIN tm p CROSS JOIN n
             |  LEFT JOIN o ON o.event_type = t.event_type AND o.per = p.per),
             |chi AS (SELECT event_type,
             |    CAST(round(1000000.0 * sum((obs-exp_in)*(obs-exp_in)/exp_in
             |      + (obs_out-exp_out)*(obs_out-exp_out)/exp_out)) AS BIGINT) AS chisq_micro
             |  FROM cells GROUP BY 1),
             |p AS (SELECT event_type, chisq_micro,
             |    CAST(round(1000000.0 * exp(-CAST(chisq_micro AS DOUBLE)/2000000.0)) AS BIGINT)
             |      AS p_micro FROM chi),
             |rk AS (SELECT *, row_number() OVER (ORDER BY p_micro, event_type) AS r,
             |        count(*) OVER () AS m FROM p),
             |bh AS (SELECT *,
             |        max(CASE WHEN p_micro * m <= r * 50000 THEN r ELSE 0 END) OVER () AS kmax
             |      FROM rk)
             |SELECT event_type, chisq_micro, p_micro, CAST(r AS BIGINT) AS rk,
             |  CAST((r * 50000) // m AS BIGINT) AS thr_micro,
             |  CAST(CASE WHEN r <= kmax THEN 1 ELSE 0 END AS BIGINT) AS reject
             |FROM bh ORDER BY rk""".stripMargin)),

    // autocorrelation function — Pearson r of the daily event count against
    // itself at lags 1..7 (the weekly-seasonality fingerprint; q_autocorr is
    // the single-lag special case, this is the curve q_seasonality_strength
    // summarizes). The calendar-bounded daily frame broadcasts against its
    // 7-lag explosion, the moment sums are one map-combined aggregate per
    // lag, and products widen through DECIMAL(38,0) before the one double
    // division (q_anova convention).
    QueryDef(
      "q_acf",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
        val pairs = daily
          .select(col("day"), col("n").as("x"),
            explode(sequence(lit(1), lit(7))).as("lag"))
          .withColumn("jday", expr("date_add(day, lag)"))
          .join(broadcast(daily.select(col("day").as("jday"), col("n").as("y"))),
            "jday")
        pairs.groupBy("lag")
          .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
            sum(expr("x*x")).as("sxx"), sum(expr("y*y")).as("syy"),
            sum(expr("x*y")).as("sxy"))
          .select(col("lag").cast("long").as("lag"), col("k").as("n_pairs"),
            expr("""CAST(round(1000000.0 *
                   |  CAST(CAST(k AS DECIMAL(38,0))*sxy - CAST(sx AS DECIMAL(38,0))*sy AS DOUBLE) /
                   |  (sqrt(CAST(CAST(k AS DECIMAL(38,0))*sxx - CAST(sx AS DECIMAL(38,0))*sx AS DOUBLE)) *
                   |   sqrt(CAST(CAST(k AS DECIMAL(38,0))*syy - CAST(sy AS DECIMAL(38,0))*sy AS DOUBLE)))) AS BIGINT)"""
              .stripMargin).as("r_micro"))
          .orderBy("lag")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |      FROM events GROUP BY 1),
             |l AS (SELECT unnest(range(1, 8)) AS lag),
             |pairs AS (SELECT l.lag, a.n AS x, b.n AS y
             |  FROM l JOIN daily a ON TRUE
             |  JOIN daily b ON b.day = a.day + CAST(l.lag AS BIGINT) * INTERVAL 1 DAY),
             |m AS (SELECT lag, count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             |        sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
             |      FROM pairs GROUP BY 1)
             |SELECT CAST(lag AS BIGINT) AS lag, CAST(k AS BIGINT) AS n_pairs,
             |  CAST(round(1000000.0 *
             |    CAST(CAST(k AS HUGEINT)*sxy - CAST(sx AS HUGEINT)*sy AS DOUBLE) /
             |    (sqrt(CAST(CAST(k AS HUGEINT)*sxx - CAST(sx AS HUGEINT)*sx AS DOUBLE)) *
             |     sqrt(CAST(CAST(k AS HUGEINT)*syy - CAST(sy AS HUGEINT)*sy AS DOUBLE)))) AS BIGINT)
             |    AS r_micro
             |FROM m ORDER BY lag""".stripMargin)),

    // STL-lite seasonal decomposition — daily count = trend (centered 7-day
    // moving average, full windows only) + weekday seasonal (mean detrended
    // per weekday, re-centered to sum ≈ 0) + residual. The additive
    // decomposition behind q_seasonality_strength's single summary number,
    // materialized as the full per-day table. Every window rides the
    // ≤ #days calendar frame after ONE map-combined grouped count
    // (q_changepoint convention); the only division is the /7 trend mean
    // and two bounded avgs, each rounded once to micro.
    QueryDef(
      "q_stl_lite",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
        val w7 = Window.orderBy("day").rowsBetween(-3, 3)
        val mid = daily
          .select(col("day"), col("n"),
            sum("n").over(w7).as("s7"), count(lit(1)).over(w7).as("k7"),
            (dayofweek(col("day")) - 1).as("dow"))
          .where(col("k7") === 7)
          .select(col("day"), col("n"), col("dow"),
            expr("CAST(round(CAST(s7 AS DOUBLE) * 1000000 / 7) AS BIGINT)").as("trend_micro"))
          .withColumn("det_micro", expr("n*1000000 - trend_micro"))
        val sw = mid.groupBy("dow")
          .agg(expr("CAST(round(avg(CAST(det_micro AS DOUBLE))) AS BIGINT)").as("seas_micro"))
        val off = sw.agg(
          expr("CAST(round(avg(CAST(seas_micro AS DOUBLE))) AS BIGINT)").as("off"))
        mid.join(broadcast(sw), "dow").crossJoin(broadcast(off))
          .select(col("day"), col("n"), col("trend_micro"),
            (col("seas_micro") - col("off")).as("seasonal_micro"),
            (col("det_micro") - (col("seas_micro") - col("off"))).as("resid_micro"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |      FROM events GROUP BY 1),
             |tr AS (SELECT day, n,
             |    sum(n) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             |    count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS k7,
             |    dayofweek(day) AS dow
             |  FROM daily),
             |mid AS (SELECT day, n, dow,
             |    CAST(round(CAST(s7 AS DOUBLE) * 1000000 / 7) AS BIGINT) AS trend_micro,
             |    n*1000000 - CAST(round(CAST(s7 AS DOUBLE) * 1000000 / 7) AS BIGINT) AS det_micro
             |  FROM tr WHERE k7 = 7),
             |sw AS (SELECT dow,
             |    CAST(round(avg(CAST(det_micro AS DOUBLE))) AS BIGINT) AS seas_micro
             |  FROM mid GROUP BY 1),
             |adj AS (SELECT CAST(round(avg(CAST(seas_micro AS DOUBLE))) AS BIGINT) AS off FROM sw)
             |SELECT m.day, CAST(m.n AS BIGINT) AS n, m.trend_micro,
             |  (s.seas_micro - (SELECT off FROM adj)) AS seasonal_micro,
             |  (m.det_micro - (s.seas_micro - (SELECT off FROM adj))) AS resid_micro
             |FROM mid m JOIN sw s ON s.dow = m.dow ORDER BY m.day""".stripMargin)),

    // empirical-Bayes (James–Stein/Morris) shrinkage of per-nation mean
    // order value toward the grand mean — the standard small-sample
    // stabilizer for per-group KPIs: weight = τ²/(τ² + σ²w/nᵢ) with σ²w the
    // pooled within-group variance and τ² the method-of-moments between-
    // group variance (floored at 0). TWO map-combined aggregates (group
    // moments, then the 25-row margin frame) — nothing else touches the
    // orders scan. Squares widen through exact 128-bit products before the
    // one double cast; every reported double rounds once.
    QueryDef(
      "q_eb_shrinkage",
      (s, d) => {
        val o = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("nk"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val g = o.groupBy("nk").agg(count(lit(1)).as("n"), sum("cents").as("s"),
          sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("ss"))
        val w = g.agg(
          expr("""sum(CAST(ss AS DOUBLE) - CAST(CAST(s AS DECIMAL(38,0))*s AS DOUBLE)/n)
                 |  / (sum(n) - count(*))""".stripMargin).as("s2w"),
          expr("avg(CAST(s AS DOUBLE)/n)").as("mbar"),
          expr("var_samp(CAST(s AS DOUBLE)/n)").as("vbar"),
          expr("avg(1.0/n)").as("invn"))
        val tau = w.select(col("s2w"), col("mbar"),
          expr("greatest(vbar - s2w * invn, 0.0)").as("tau2"))
        g.crossJoin(broadcast(tau))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))), "nk")
          .select(col("nation"), col("n").as("n_orders"),
            expr("CAST(round(CAST(s AS DOUBLE)/n) AS BIGINT)").as("raw_mean_cents"),
            expr("""CAST(round(mbar + tau2 / (tau2 + s2w/n)
                   |  * (CAST(s AS DOUBLE)/n - mbar)) AS BIGINT)""".stripMargin)
              .as("eb_mean_cents"),
            expr("CAST(round(1000000.0 * tau2 / (tau2 + s2w/n)) AS BIGINT)")
              .as("weight_micro"))
          .orderBy("nation")
      },
      Some("""WITH o AS (SELECT c.c_nationkey AS nk,
             |      CAST(round(o_totalprice*100) AS BIGINT) AS cents
             |    FROM orders JOIN customer c ON c.c_custkey = o_custkey),
             |g AS (SELECT nk, count(*) AS n, sum(cents) AS s,
             |      sum(CAST(cents AS HUGEINT)*cents) AS ss FROM o GROUP BY 1),
             |w AS (SELECT
             |    sum(CAST(ss AS DOUBLE) - CAST(CAST(s AS HUGEINT)*s AS DOUBLE)/n)
             |      / (sum(n) - count(*)) AS s2w,
             |    avg(CAST(s AS DOUBLE)/n) AS mbar,
             |    var_samp(CAST(s AS DOUBLE)/n) AS vbar,
             |    avg(1.0/n) AS invn FROM g),
             |tau AS (SELECT s2w, mbar, greatest(vbar - s2w * invn, 0.0) AS tau2 FROM w)
             |SELECT nn.n_name AS nation, CAST(g.n AS BIGINT) AS n_orders,
             |  CAST(round(CAST(g.s AS DOUBLE)/g.n) AS BIGINT) AS raw_mean_cents,
             |  CAST(round(t.mbar + t.tau2 / (t.tau2 + t.s2w/g.n)
             |    * (CAST(g.s AS DOUBLE)/g.n - t.mbar)) AS BIGINT) AS eb_mean_cents,
             |  CAST(round(1000000.0 * t.tau2 / (t.tau2 + t.s2w/g.n)) AS BIGINT)
             |    AS weight_micro
             |FROM g CROSS JOIN tau t JOIN nation nn ON nn.n_nationkey = g.nk
             |ORDER BY 1""".stripMargin)),

    // always-valid A/B monitoring — the mixture-SPRT (Johari et al.) p-value
    // sequence for the purchase-value difference between the two user_id-
    // parity arms, reported at every daily checkpoint: λₜ with normal
    // mixture τ² = pooled σ² on the cumulative two-sample z, p = 1/max λ.
    // Peeking-safe by construction (λ is a martingale under H₀ — the
    // running max can only tighten honestly). One map-combined daily-arm
    // aggregate; cumulative/forward-fill/running-max windows all ride the
    // ≤ #days calendar frame (q_changepoint convention). The fixture's arms
    // are identical by design, so p plateaus high — the honest null.
    QueryDef(
      "q_msprt",
      (s, d) => {
        val p0 = Tables.events(s, d).where(col("event_type") === "purchase")
          .select(to_date(col("ts")).as("day"), (col("user_id") % 2).as("arm"),
            round(col("value") * 100).cast("long").as("cents"))
        val dAgg = p0.groupBy("day", "arm")
          .agg(count(lit(1)).as("n"), sum("cents").as("s"),
            sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("ss"))
        val piv = dAgg.groupBy("day").agg(
          sum(when(col("arm") === 0, col("n"))).as("dn0"),
          sum(when(col("arm") === 0, col("s"))).as("ds0"),
          sum(when(col("arm") === 0, col("ss"))).as("dss0"),
          sum(when(col("arm") === 1, col("n"))).as("dn1"),
          sum(when(col("arm") === 1, col("s"))).as("ds1"),
          sum(when(col("arm") === 1, col("ss"))).as("dss1"))
        val wc = Window.orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = piv.select(col("day"),
          sum(coalesce(col("dn0"), lit(0L))).over(wc).as("n0"),
          sum(coalesce(col("ds0"), lit(0L))).over(wc).as("s0"),
          sum(coalesce(col("dss0"), lit(0L).cast("decimal(38,0)"))).over(wc).as("ss0"),
          sum(coalesce(col("dn1"), lit(0L))).over(wc).as("n1"),
          sum(coalesce(col("ds1"), lit(0L))).over(wc).as("s1"),
          sum(coalesce(col("dss1"), lit(0L).cast("decimal(38,0)"))).over(wc).as("ss1"))
        val lam = cum.where(col("n0") >= 2 && col("n1") >= 2)
          .select(col("day"), col("n0"), col("n1"),
            expr("CAST(s1 AS DOUBLE)/n1 - CAST(s0 AS DOUBLE)/n0").as("diff"),
            expr("""((CAST(ss0 AS DOUBLE) - CAST(CAST(s0 AS DECIMAL(38,0))*s0 AS DOUBLE)/n0)
                   | + (CAST(ss1 AS DOUBLE) - CAST(CAST(s1 AS DECIMAL(38,0))*s1 AS DOUBLE)/n1))
                   | / (n0 + n1 - 2)""".stripMargin).as("s2"))
          .select(col("day"), col("n0"), col("n1"),
            expr("CAST(round(100.0*diff) AS BIGINT)").as("diff_centi"),
            expr("""sqrt((s2*(1.0/n0+1.0/n1)) / (s2*(1.0/n0+1.0/n1) + s2))
                   | * exp(diff*diff / (2*(s2*(1.0/n0+1.0/n1))
                   |       * (1 + (s2*(1.0/n0+1.0/n1))/s2)))""".stripMargin).as("lam"))
        lam.select(col("day"), col("n0"), col("n1"), col("diff_centi"),
            expr("CAST(round(1000000.0 * lam) AS BIGINT)").as("lam_micro"),
            max(col("lam")).over(Window.orderBy("day")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("lmax"))
          .select(col("day"), col("n0"), col("n1"), col("diff_centi"), col("lam_micro"),
            expr("CAST(round(1000000.0 * least(1.0, 1.0/lmax)) AS BIGINT)")
              .as("p_always_micro"))
          .orderBy("day")
      },
      Some("""WITH p AS (SELECT CAST(ts AS DATE) AS day, user_id % 2 AS arm,
             |      CAST(round(value*100) AS BIGINT) AS cents
             |    FROM events WHERE event_type = 'purchase'),
             |d AS (SELECT day, arm, count(*) AS n, sum(cents) AS s,
             |      sum(CAST(cents AS HUGEINT)*cents) AS ss FROM p GROUP BY 1,2),
             |piv AS (SELECT day,
             |    sum(CASE WHEN arm=0 THEN n END) AS dn0,
             |    sum(CASE WHEN arm=0 THEN s END) AS ds0,
             |    sum(CASE WHEN arm=0 THEN ss END) AS dss0,
             |    sum(CASE WHEN arm=1 THEN n END) AS dn1,
             |    sum(CASE WHEN arm=1 THEN s END) AS ds1,
             |    sum(CASE WHEN arm=1 THEN ss END) AS dss1
             |  FROM d GROUP BY 1),
             |cum AS (SELECT day,
             |    sum(coalesce(dn0, 0)) OVER (ORDER BY day) AS n0,
             |    sum(coalesce(ds0, 0)) OVER (ORDER BY day) AS s0,
             |    sum(coalesce(dss0, 0)) OVER (ORDER BY day) AS ss0,
             |    sum(coalesce(dn1, 0)) OVER (ORDER BY day) AS n1,
             |    sum(coalesce(ds1, 0)) OVER (ORDER BY day) AS s1,
             |    sum(coalesce(dss1, 0)) OVER (ORDER BY day) AS ss1
             |  FROM piv),
             |st AS (SELECT day, n0, n1,
             |    CAST(s1 AS DOUBLE)/n1 - CAST(s0 AS DOUBLE)/n0 AS diff,
             |    ((CAST(ss0 AS DOUBLE) - CAST(CAST(s0 AS HUGEINT)*s0 AS DOUBLE)/n0)
             |      + (CAST(ss1 AS DOUBLE) - CAST(CAST(s1 AS HUGEINT)*s1 AS DOUBLE)/n1))
             |      / (n0 + n1 - 2) AS s2
             |  FROM cum WHERE n0 >= 2 AND n1 >= 2),
             |lam AS (SELECT day, n0, n1,
             |    CAST(round(100.0*diff) AS BIGINT) AS diff_centi,
             |    sqrt((s2*(1.0/n0+1.0/n1)) / (s2*(1.0/n0+1.0/n1) + s2))
             |      * exp(diff*diff / (2*(s2*(1.0/n0+1.0/n1))
             |            * (1 + (s2*(1.0/n0+1.0/n1))/s2))) AS lam
             |  FROM st),
             |run AS (SELECT day, n0, n1, diff_centi,
             |    CAST(round(1000000.0 * lam) AS BIGINT) AS lam_micro,
             |    max(lam) OVER (ORDER BY day) AS lmax FROM lam)
             |SELECT day, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
             |  diff_centi, lam_micro,
             |  CAST(round(1000000.0 * least(1.0, 1.0/lmax)) AS BIGINT) AS p_always_micro
             |FROM run ORDER BY day""".stripMargin)),

    // lag-1 Granger test — does yesterday's error count predict today's
    // purchase count beyond purchases' own autoregression? Restricted
    // AR(1) vs full (AR(1) + lagged x) OLS on the demeaned daily series,
    // solved in closed form (2×2 normal equations — no iterative fit),
    // F = (RSS_r − RSS_f)/(RSS_f/(n−3)), flagged at the fixed F(1,26)
    // 5 % critical value 4.2. Everything after ONE map-combined daily
    // conditional-count aggregate runs on the ≤ #days calendar frame
    // (q_changepoint convention); sums of demeaned products are doubles
    // on exact-count rationals, each reported value rounded once.
    QueryDef(
      "q_granger",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("x"))
        val wd = Window.orderBy("day")
        val f = daily
          .select(col("day"), col("y"),
            lag("y", 1).over(wd).as("y1"), lag("x", 1).over(wd).as("x1"))
          .where(col("y1").isNotNull)
        val m = f.agg(count(lit(1)).as("n"),
          expr("avg(CAST(y AS DOUBLE))").as("my"),
          expr("avg(CAST(y1 AS DOUBLE))").as("my1"),
          expr("avg(CAST(x1 AS DOUBLE))").as("mx1"))
        val sums = f.crossJoin(broadcast(m))
          .select(expr("y - my").as("dy"), expr("y1 - my1").as("dy1"),
            expr("x1 - mx1").as("dx1"))
          .agg(count(lit(1)).as("n"), sum(expr("dy1*dy1")).as("a11"),
            sum(expr("dy1*dx1")).as("a12"), sum(expr("dx1*dx1")).as("a22"),
            sum(expr("dy1*dy")).as("b1"), sum(expr("dx1*dy")).as("b2"),
            sum(expr("dy*dy")).as("syy"))
        sums.select(col("n"), col("syy"), col("b1"), col("b2"),
            expr("syy - b1*b1/a11").as("rss_r"),
            expr("(b1*a22 - b2*a12)/(a11*a22 - a12*a12)").as("beta1"),
            expr("(b2*a11 - b1*a12)/(a11*a22 - a12*a12)").as("beta2"))
          .select(col("n"), col("rss_r"), col("beta2"),
            expr("syy - beta1*b1 - beta2*b2").as("rss_f"))
          .select(col("n").as("n_days"),
            expr("CAST(round(1000.0*rss_r) AS BIGINT)").as("rss_r_milli"),
            expr("CAST(round(1000.0*rss_f) AS BIGINT)").as("rss_f_milli"),
            expr("CAST(round(1000000.0*beta2) AS BIGINT)").as("beta_x_micro"),
            expr("CAST(round(1000000.0*((rss_r - rss_f)/(rss_f/(n-3)))) AS BIGINT)")
              .as("f_micro"),
            expr("""CAST(CASE WHEN (rss_r - rss_f)/(rss_f/(n-3)) > 4.2
                   | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("granger_flag"))
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
             |    sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS y,
             |    sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS x
             |  FROM events GROUP BY 1),
             |l AS (SELECT day, y,
             |    lag(y) OVER (ORDER BY day) AS y1, lag(x) OVER (ORDER BY day) AS x1
             |  FROM daily),
             |f AS (SELECT * FROM l WHERE y1 IS NOT NULL),
             |m AS (SELECT count(*) AS n, avg(CAST(y AS DOUBLE)) AS my,
             |    avg(CAST(y1 AS DOUBLE)) AS my1, avg(CAST(x1 AS DOUBLE)) AS mx1 FROM f),
             |dm AS (SELECT y - m.my AS dy, y1 - m.my1 AS dy1, x1 - m.mx1 AS dx1
             |      FROM f CROSS JOIN m),
             |s AS (SELECT count(*) AS n, sum(dy1*dy1) AS a11, sum(dy1*dx1) AS a12,
             |    sum(dx1*dx1) AS a22, sum(dy1*dy) AS b1, sum(dx1*dy) AS b2,
             |    sum(dy*dy) AS syy FROM dm),
             |sol AS (SELECT n, syy, b1, b2,
             |    syy - b1*b1/a11 AS rss_r,
             |    (b1*a22 - b2*a12)/(a11*a22 - a12*a12) AS beta1,
             |    (b2*a11 - b1*a12)/(a11*a22 - a12*a12) AS beta2
             |  FROM s),
             |fin AS (SELECT n, rss_r, beta2, syy - beta1*b1 - beta2*b2 AS rss_f FROM sol)
             |SELECT CAST(n AS BIGINT) AS n_days,
             |  CAST(round(1000.0*rss_r) AS BIGINT) AS rss_r_milli,
             |  CAST(round(1000.0*rss_f) AS BIGINT) AS rss_f_milli,
             |  CAST(round(1000000.0*beta2) AS BIGINT) AS beta_x_micro,
             |  CAST(round(1000000.0*((rss_r - rss_f)/(rss_f/(n-3)))) AS BIGINT) AS f_micro,
             |  CAST(CASE WHEN (rss_r - rss_f)/(rss_f/(n-3)) > 4.2
             |    THEN 1 ELSE 0 END AS BIGINT) AS granger_flag
             |FROM fin""".stripMargin)),

    // partial correlation — purchase vs error daily counts CONTROLLING for
    // view volume: r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)), the
    // one-line screen for "is this correlation just traffic?". One
    // map-combined moment aggregate over the daily conditional counts;
    // the three pairwise r's and the partial come from the same exact
    // integer moment row, each rounded once to micro (q_anova convention).
    QueryDef(
      "q_partial_corr",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("y"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("z"))
        val sAgg = daily.agg(count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"), sum("z").as("sz"),
          sum(expr("x*x")).as("sxx"), sum(expr("y*y")).as("syy"),
          sum(expr("z*z")).as("szz"), sum(expr("x*y")).as("sxy"),
          sum(expr("x*z")).as("sxz"), sum(expr("y*z")).as("syz"))
        sAgg.select(col("n"),
            expr("""(n*sxy - sx*sy)/(sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                   | *sqrt(CAST(n*syy - sy*sy AS DOUBLE)))""".stripMargin).as("rxy"),
            expr("""(n*sxz - sx*sz)/(sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
                   | *sqrt(CAST(n*szz - sz*sz AS DOUBLE)))""".stripMargin).as("rxz"),
            expr("""(n*syz - sy*sz)/(sqrt(CAST(n*syy - sy*sy AS DOUBLE))
                   | *sqrt(CAST(n*szz - sz*sz AS DOUBLE)))""".stripMargin).as("ryz"))
          .select(col("n").as("n_days"),
            expr("CAST(round(1000000.0*rxy) AS BIGINT)").as("rxy_micro"),
            expr("CAST(round(1000000.0*rxz) AS BIGINT)").as("rxz_micro"),
            expr("CAST(round(1000000.0*ryz) AS BIGINT)").as("ryz_micro"),
            expr("""CAST(round(1000000.0*(rxy - rxz*ryz)
                   | /sqrt((1-rxz*rxz)*(1-ryz*ryz))) AS BIGINT)""".stripMargin)
              .as("rxy_given_z_micro"))
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
             |    sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS x,
             |    sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS y,
             |    sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS z
             |  FROM events GROUP BY 1),
             |s AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
             |    sum(x*x) AS sxx, sum(y*y) AS syy, sum(z*z) AS szz,
             |    sum(x*y) AS sxy, sum(x*z) AS sxz, sum(y*z) AS syz FROM daily),
             |r AS (SELECT n,
             |    (n*sxy - sx*sy)/(sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
             |      *sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS rxy,
             |    (n*sxz - sx*sz)/(sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
             |      *sqrt(CAST(n*szz - sz*sz AS DOUBLE))) AS rxz,
             |    (n*syz - sy*sz)/(sqrt(CAST(n*syy - sy*sy AS DOUBLE))
             |      *sqrt(CAST(n*szz - sz*sz AS DOUBLE))) AS ryz
             |  FROM s)
             |SELECT CAST(n AS BIGINT) AS n_days,
             |  CAST(round(1000000.0*rxy) AS BIGINT) AS rxy_micro,
             |  CAST(round(1000000.0*rxz) AS BIGINT) AS rxz_micro,
             |  CAST(round(1000000.0*ryz) AS BIGINT) AS ryz_micro,
             |  CAST(round(1000000.0*(rxy - rxz*ryz)
             |    /sqrt((1-rxz*rxz)*(1-ryz*ryz))) AS BIGINT) AS rxy_given_z_micro
             |FROM r""".stripMargin)),

    // daily value-quantile trend — exact p50/p95 of event value per day via
    // the cents-domain ECDF: group to (day, cents) first, then cumulate
    // WITHIN each day partition over the bounded distinct-cents domain (the
    // q_ks_test argument — the window frame is the VALUE DOMAIN, never the
    // event count, and it is day-partitioned on top). The percentile pick
    // is the exact type-1 quantile (smallest value with ⌈q·n⌉ mass), all
    // integer arithmetic.
    QueryDef(
      "q_value_quantile_trend",
      (s, d) => {
        val v = Tables.events(s, d).where(col("value").isNotNull)
          .select(to_date(col("ts")).as("day"),
            round(col("value") * 100).cast("long").as("cents"))
        val g = v.groupBy("day", "cents").agg(count(lit(1)).as("k"))
        val wd = Window.partitionBy("day").orderBy("cents")
        val wn = Window.partitionBy("day")
        g.select(col("day"), col("cents"),
            sum("k").over(wd).as("ck"), sum("k").over(wn).as("n"))
          .groupBy("day")
          .agg(max("n").as("n"),
            min(when(expr("ck*2 >= n"), col("cents"))).as("p50_cents"),
            min(when(expr("ck*20 >= n*19"), col("cents"))).as("p95_cents"))
          .orderBy("day")
      },
      Some("""WITH v AS (SELECT CAST(ts AS DATE) AS day,
             |      CAST(round(value*100) AS BIGINT) AS cents
             |    FROM events WHERE value IS NOT NULL),
             |g AS (SELECT day, cents, count(*) AS k FROM v GROUP BY 1,2),
             |cum AS (SELECT day, cents, k,
             |    sum(k) OVER (PARTITION BY day ORDER BY cents) AS ck,
             |    sum(k) OVER (PARTITION BY day) AS n FROM g)
             |SELECT day, CAST(max(n) AS BIGINT) AS n,
             |  CAST(min(CASE WHEN ck*2 >= n THEN cents END) AS BIGINT) AS p50_cents,
             |  CAST(min(CASE WHEN ck*20 >= n*19 THEN cents END) AS BIGINT) AS p95_cents
             |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin)),

    // stationary distribution of the event-type Markov chain — where a
    // user's session settles in the long run, the one-vector summary of
    // q_event_transitions' 5×5 matrix. Ten power iterations entirely in
    // 1e9 fixed point: each per-edge contribution is the exact truncating
    // π·c div rowtot on 128-bit-widened products (order-free under
    // summation — the q_pagerank trick), and every frame after the ONE
    // user-partitioned lead + grouped count is bounded by the |types|²
    // transition domain.
    QueryDef(
      "q_markov_stationary",
      (s, d) => {
        val wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val tr = Tables.events(s, d)
          .select(col("event_type").as("a"),
            lead("event_type", 1).over(wu).as("b"))
          .where(col("b").isNotNull)
          .groupBy("a", "b").agg(count(lit(1)).as("c"))
        val rs = tr.groupBy("a").agg(sum("c").as("tot"))
        // bounded-domain iterative-loop convention (q_pagerank form): the
        // |types|²-bounded transition frame persists ONCE with the row
        // total pre-joined — its lineage is the corpus-scaled
        // lead-window scan, which every uncut broadcast round used to
        // replay — but no repartition and no cuts: the remaining replay
        // is over the persisted ≤|types|² frame, and per-round
        // checkpoints cost more than they save at this size
        val trj = Release.pinnedPersist(tr.join(rs, "a"))
        val sts = trj.select(col("a").as("st")).distinct()
        val ns = sts.agg(count(lit(1)).as("k"))
        var pi = sts.crossJoin(broadcast(ns))
          .select(col("st"), expr("CAST(1000000000 div k AS BIGINT)").as("pi"))
        for (_ <- 1 to 10) {
          pi = trj.join(pi, col("a") === col("st"))
            .groupBy(col("b").as("st2"))
            .agg(sum(expr("CAST(pi AS DECIMAL(38,0)) * c div tot")).as("pi"))
            .select(col("st2").as("st"), col("pi").cast("long").as("pi"))
        }
        pi.select(col("st").as("event_type"), col("pi").as("pi_nano"))
          .orderBy("event_type")
      },
      Some(markovOracle)),

    // top daily journeys — the first three event types of each (user, day)
    // as a path string, ranked by frequency: the entry-flow report behind
    // q_event_transitions' edge view. The per-(user, day) rank window is
    // partitioned; the path assembles from three conditional MIN aggs (no
    // ordered string_agg crosses the engine boundary), and the top-10 is a
    // sort-limit (TakeOrdered), never a global window.
    QueryDef(
      "q_top_paths",
      (s, d) => {
        val w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
        val r = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day"),
            col("event_type"), col("ts"), col("event_id"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") <= 3)
        r.groupBy("user_id", "day")
          .agg(min(when(col("rn") === 1, col("event_type"))).as("t1"),
            min(when(col("rn") === 2, col("event_type"))).as("t2"),
            min(when(col("rn") === 3, col("event_type"))).as("t3"))
          .where(col("t3").isNotNull)
          .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("path"))
          .groupBy("path").agg(count(lit(1)).as("n_user_days"))
          .orderBy(col("n_user_days").desc, col("path")).limit(10)
      },
      Some("""WITH r AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
             |      ORDER BY ts, event_id) AS rn
             |  FROM events),
             |p AS (SELECT user_id, day,
             |    min(CASE WHEN rn = 1 THEN event_type END) AS t1,
             |    min(CASE WHEN rn = 2 THEN event_type END) AS t2,
             |    min(CASE WHEN rn = 3 THEN event_type END) AS t3
             |  FROM r WHERE rn <= 3 GROUP BY 1, 2)
             |SELECT concat_ws('>', t1, t2, t3) AS path, count(*) AS n_user_days
             |FROM p WHERE t3 IS NOT NULL
             |GROUP BY 1 ORDER BY n_user_days DESC, path LIMIT 10""".stripMargin)),

    // dwell-time histogram — per event type, the log2-bucketed distribution
    // of time until the user's NEXT event (the latency-histogram shape:
    // exponential buckets, exact integer bucket = |bin(ms+1)|−1, so no
    // floating log2 boundary can disagree between engines). One
    // user-partitioned lead, one grouped count; output is bounded by
    // |types| × ~42 millisecond-buckets, never by the event count.
    QueryDef(
      "q_dwell_histogram",
      (s, d) => {
        val wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, d)
          .select(col("event_type"),
            (unix_millis(lead(col("ts"), 1).over(wu).cast("timestamp"))
              - unix_millis(col("ts").cast("timestamp"))).as("dwell_ms"))
          .where(col("dwell_ms").isNotNull && col("dwell_ms") >= 0)
          .select(col("event_type"),
            (length(bin(col("dwell_ms") + 1)) - 1).cast("long").as("bucket"))
          .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
          .orderBy("event_type", "bucket")
      },
      Some("""WITH ord AS (SELECT event_type,
             |    epoch_ms(lead(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id)) - epoch_ms(CAST(ts AS TIMESTAMP)) AS dwell_ms
             |  FROM events)
             |SELECT event_type,
             |  CAST(length(bin(dwell_ms + 1)) - 1 AS BIGINT) AS bucket,
             |  count(*) AS n
             |FROM ord WHERE dwell_ms IS NOT NULL AND dwell_ms >= 0
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // RFM segment migration — each customer's fixed-rule segment (champion
    // / loyal / big_spender / regular / occasional, from 1996 frequency ×
    // monetary) against their 1997 segment, as the transition-count matrix
    // CRM teams steer by. ONE conditional-sum pass per customer replaces
    // the year self-join (the q_gmv_bridge trick); 'absent' marks
    // customers active in only one year. Thresholds are exact integer
    // cents — no quantile dependence, so the segmentation is stable under
    // resampling (q_rfm holds the ntile-based sibling).
    QueryDef(
      "q_rfm_migration",
      (s, d) => {
        val oy = Tables.orders(s, d)
          .withColumn("y", year(col("o_orderdate")))
          .where(col("y").isin(1996, 1997))
          .groupBy(col("o_custkey").as("ck"))
          .agg(sum(when(col("y") === 1996, 1L).otherwise(0L)).as("f0"),
            sum(when(col("y") === 1996,
              round(col("o_totalprice") * 100).cast("long")).otherwise(0L)).as("m0"),
            sum(when(col("y") === 1997, 1L).otherwise(0L)).as("f1"),
            sum(when(col("y") === 1997,
              round(col("o_totalprice") * 100).cast("long")).otherwise(0L)).as("m1"))
        def seg(f: String, m: String) =
          expr(s"""CASE WHEN $f = 0 THEN 'absent'
                  |     WHEN $f >= 3 AND $m >= 30000000 THEN 'champion'
                  |     WHEN $f >= 3 THEN 'loyal'
                  |     WHEN $m >= 30000000 THEN 'big_spender'
                  |     WHEN $f >= 2 THEN 'regular' ELSE 'occasional' END""".stripMargin)
        oy.select(seg("f0", "m0").as("seg0"), seg("f1", "m1").as("seg1"))
          .groupBy("seg0", "seg1").agg(count(lit(1)).as("n_customers"))
          .orderBy("seg0", "seg1")
      },
      Some("""WITH oy AS (SELECT o_custkey AS ck,
             |    sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996 THEN 1 ELSE 0 END) AS f0,
             |    sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
             |      THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) AS m0,
             |    sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997 THEN 1 ELSE 0 END) AS f1,
             |    sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
             |      THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END) AS m1
             |  FROM orders WHERE year(CAST(o_orderdate AS DATE)) IN (1996, 1997)
             |  GROUP BY 1),
             |seg AS (SELECT
             |    CASE WHEN f0 = 0 THEN 'absent'
             |         WHEN f0 >= 3 AND m0 >= 30000000 THEN 'champion'
             |         WHEN f0 >= 3 THEN 'loyal'
             |         WHEN m0 >= 30000000 THEN 'big_spender'
             |         WHEN f0 >= 2 THEN 'regular' ELSE 'occasional' END AS seg0,
             |    CASE WHEN f1 = 0 THEN 'absent'
             |         WHEN f1 >= 3 AND m1 >= 30000000 THEN 'champion'
             |         WHEN f1 >= 3 THEN 'loyal'
             |         WHEN m1 >= 30000000 THEN 'big_spender'
             |         WHEN f1 >= 2 THEN 'regular' ELSE 'occasional' END AS seg1
             |  FROM oy)
             |SELECT seg0, seg1, count(*) AS n_customers
             |FROM seg GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // TOST equivalence test — the two one-sided t-tests that PROVE two arms
    // are the same (a non-significant difference test can't): equivalence
    // margin = 10 % of the pooled mean purchase value, both one-sided
    // t's against the fixed z 1.6449 (α = 0.05). The complement of
    // q_welch_ttest / q_msprt: those hunt differences, this certifies
    // their absence. ONE conditional-moment pass; squares widen through
    // 128-bit products before the double sqrt (q_welch_ttest convention).
    // Fixture honesty: at ~100 purchases/arm the CI is wider than the
    // margin, so the arms are NOT yet certifiably equivalent — flag 0.
    QueryDef(
      "q_tost",
      (s, d) => {
        val p = Tables.events(s, d).where(col("event_type") === "purchase")
          .select((col("user_id") % 2).as("arm"),
            round(col("value") * 100).cast("long").as("cents"))
        val w = p.agg(
          sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("arm") === 0, col("cents")).otherwise(0L)).as("s0"),
          sum(when(col("arm") === 0,
            expr("CAST(cents AS DECIMAL(38,0)) * cents"))).as("ss0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm") === 1, col("cents")).otherwise(0L)).as("s1"),
          sum(when(col("arm") === 1,
            expr("CAST(cents AS DECIMAL(38,0)) * cents"))).as("ss1"))
        w.select(col("n0"), col("n1"),
            expr("CAST(s1 AS DOUBLE)/n1 - CAST(s0 AS DOUBLE)/n0").as("diff"),
            expr("(CAST(s0 AS DOUBLE) + s1)/(n0 + n1) * 0.10").as("margin"),
            expr("""sqrt(((CAST(ss0 AS DOUBLE) - CAST(CAST(s0 AS DECIMAL(38,0))*s0 AS DOUBLE)/n0)
                   |  + (CAST(ss1 AS DOUBLE) - CAST(CAST(s1 AS DECIMAL(38,0))*s1 AS DOUBLE)/n1))
                   |  / (n0 + n1 - 2) * (1.0/n0 + 1.0/n1))""".stripMargin).as("se"))
          .select(col("n0"), col("n1"),
            expr("CAST(round(100*diff) AS BIGINT)").as("diff_centi"),
            expr("CAST(round(100*margin) AS BIGINT)").as("margin_centi"),
            expr("CAST(round(1000000*(diff + margin)/se) AS BIGINT)").as("t_lower_micro"),
            expr("CAST(round(1000000*(diff - margin)/se) AS BIGINT)").as("t_upper_micro"),
            expr("""CAST(CASE WHEN (diff + margin)/se > 1.6449
                   |  AND (diff - margin)/se < -1.6449
                   |  THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("equivalent_flag"))
      },
      Some("""WITH p AS (SELECT user_id % 2 AS arm,
             |      CAST(round(value*100) AS BIGINT) AS cents
             |    FROM events WHERE event_type = 'purchase'),
             |w AS (SELECT
             |    sum(CASE WHEN arm=0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN arm=0 THEN cents ELSE 0 END) AS s0,
             |    sum(CASE WHEN arm=0 THEN CAST(cents AS HUGEINT)*cents END) AS ss0,
             |    sum(CASE WHEN arm=1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN arm=1 THEN cents ELSE 0 END) AS s1,
             |    sum(CASE WHEN arm=1 THEN CAST(cents AS HUGEINT)*cents END) AS ss1
             |  FROM p),
             |st AS (SELECT n0, n1,
             |    CAST(s1 AS DOUBLE)/n1 - CAST(s0 AS DOUBLE)/n0 AS diff,
             |    (CAST(s0 AS DOUBLE) + s1)/(n0 + n1) * 0.10 AS margin,
             |    sqrt(((CAST(ss0 AS DOUBLE) - CAST(CAST(s0 AS HUGEINT)*s0 AS DOUBLE)/n0)
             |      + (CAST(ss1 AS DOUBLE) - CAST(CAST(s1 AS HUGEINT)*s1 AS DOUBLE)/n1))
             |      / (n0 + n1 - 2) * (1.0/n0 + 1.0/n1)) AS se
             |  FROM w)
             |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
             |  CAST(round(100*diff) AS BIGINT) AS diff_centi,
             |  CAST(round(100*margin) AS BIGINT) AS margin_centi,
             |  CAST(round(1000000*(diff + margin)/se) AS BIGINT) AS t_lower_micro,
             |  CAST(round(1000000*(diff - margin)/se) AS BIGINT) AS t_upper_micro,
             |  CAST(CASE WHEN (diff + margin)/se > 1.6449
             |    AND (diff - margin)/se < -1.6449
             |    THEN 1 ELSE 0 END AS BIGINT) AS equivalent_flag
             |FROM st""".stripMargin)),

    // Chapman capture–recapture — estimate the size of the purchasing
    // population from two single-day sighting occasions (Jan 3 / Jan 10):
    // N̂ = (n1+1)(n2+1)/(m+1) − 1 with its Seber standard error, the
    // wildlife-census estimator that audits "how many buyers exist that we
    // have NOT yet seen" — a question no distinct-count can answer. ONE
    // per-user conditional-max pass then a 1-row margin; estimator integer
    // div is exact (Chapman is integer-valued by construction here).
    // Occasions are single days because the fixture's users are hyperactive
    // (weekly occasions capture everyone — the degenerate case, documented);
    // at sf0.01 the estimate lands 164 vs the true 150.
    QueryDef(
      "q_capture_recapture",
      (s, d) => {
        val u = Tables.events(s, d).groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase" &&
              to_date(col("ts")) === lit("2024-01-03").cast("date"), 1L)
            .otherwise(0L)).as("c1"),
            max(when(col("event_type") === "purchase" &&
                to_date(col("ts")) === lit("2024-01-10").cast("date"), 1L)
              .otherwise(0L)).as("c2"))
        u.agg(sum("c1").as("n1"), sum("c2").as("n2"),
            sum(expr("c1*c2")).as("m"), count(lit(1)).as("total"))
          .select(col("n1").as("day1_buyers"), col("n2").as("day2_buyers"),
            col("m").as("recaptured"), col("total").as("observed_users"),
            expr("(n1+1)*(n2+1) div (m+1) - 1").as("chapman_estimate"),
            expr("""CAST(round(sqrt(CAST((n1+1)*(n2+1) AS DOUBLE)*(n1-m)*(n2-m)
                   | / ((m+1)*(m+1)*(m+2)))) AS BIGINT)""".stripMargin).as("se_est"))
      },
      Some("""WITH u AS (SELECT user_id,
             |    max(CASE WHEN event_type='purchase'
             |        AND CAST(ts AS DATE) = DATE '2024-01-03' THEN 1 ELSE 0 END) AS c1,
             |    max(CASE WHEN event_type='purchase'
             |        AND CAST(ts AS DATE) = DATE '2024-01-10' THEN 1 ELSE 0 END) AS c2
             |  FROM events GROUP BY 1),
             |s AS (SELECT sum(c1) AS n1, sum(c2) AS n2, sum(c1*c2) AS m,
             |      count(*) AS total FROM u)
             |SELECT CAST(n1 AS BIGINT) AS day1_buyers, CAST(n2 AS BIGINT) AS day2_buyers,
             |  CAST(m AS BIGINT) AS recaptured, CAST(total AS BIGINT) AS observed_users,
             |  CAST((n1+1)*(n2+1) // (m+1) - 1 AS BIGINT) AS chapman_estimate,
             |  CAST(round(sqrt(CAST((n1+1)*(n2+1) AS DOUBLE)*(n1-m)*(n2-m)
             |    / ((m+1)*(m+1)*(m+2)))) AS BIGINT) AS se_est
             |FROM s""".stripMargin)),

    // temporal self-excitation — do purchases cluster in time beyond a
    // memoryless process? The observed fraction of inter-purchase gaps
    // under one hour against the Poisson expectation 1 − e^(−λt) at the
    // empirical rate λ = n/Σgap (the closed-form exponential CDF — no
    // simulation crosses the engine boundary). Ratio > 1 ⇒ bursty
    // (Hawkes-like) purchasing; the fixture sits near 1.08 — close to
    // memoryless, honestly reported. One user-partitioned lag + one
    // 1-row moment aggregate.
    QueryDef(
      "q_self_excitation",
      (s, d) => {
        val wu = Window.partitionBy("user_id").orderBy("ms")
        val g = Tables.events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id"),
            unix_millis(col("ts").cast("timestamp")).as("ms"))
          .select((col("ms") - lag("ms", 1).over(wu)).as("gap"))
          .where(col("gap").isNotNull && col("gap") > 0)
        g.agg(count(lit(1)).as("n"), sum("gap").as("tot"),
            sum(when(col("gap") < 3600000L, 1L).otherwise(0L)).as("short"))
          .select(col("n").as("n_gaps"), col("short").as("short_gaps"),
            expr("short * 1000000 div n").as("observed_micro"),
            expr("CAST(round(1000000.0 * (1 - exp(-3600000.0 * n / tot))) AS BIGINT)")
              .as("poisson_micro"),
            expr("""CAST(round(1000000.0 * (CAST(short AS DOUBLE)/n)
                   | / (1 - exp(-3600000.0 * n / tot))) AS BIGINT)""".stripMargin)
              .as("excitation_ratio_micro"))
      },
      Some("""WITH p AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
             |      FROM events WHERE event_type='purchase'),
             |g AS (SELECT ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS gap
             |      FROM p),
             |gg AS (SELECT gap FROM g WHERE gap IS NOT NULL AND gap > 0),
             |s AS (SELECT count(*) AS n, sum(gap) AS tot,
             |    sum(CASE WHEN gap < 3600000 THEN 1 ELSE 0 END) AS short FROM gg)
             |SELECT CAST(n AS BIGINT) AS n_gaps, CAST(short AS BIGINT) AS short_gaps,
             |  CAST(short * 1000000 // n AS BIGINT) AS observed_micro,
             |  CAST(round(1000000.0 * (1 - exp(-3600000.0 * n / tot))) AS BIGINT)
             |    AS poisson_micro,
             |  CAST(round(1000000.0 * (CAST(short AS DOUBLE)/n)
             |    / (1 - exp(-3600000.0 * n / tot))) AS BIGINT) AS excitation_ratio_micro
             |FROM s""".stripMargin)),

    // Weibull reliability fit — shape k and scale λ of the inter-purchase
    // gap distribution by median-rank regression: ln(−ln(1−F)) on ln t over
    // the ≤ ~42 log2 gap buckets (the q_dwell_histogram binning), closed-
    // form OLS. Shape < 1 ⇒ "infant-mortality" churn, ≈ 1 ⇒ memoryless,
    // > 1 ⇒ wear-out; the fixture fits k ≈ 0.995 — exponential, agreeing
    // with q_self_excitation's ratio ≈ 1 (two estimators, one story). The
    // ECDF cumulative runs over the bounded bucket domain (whitelisted,
    // q_ks_test argument).
    QueryDef(
      "q_weibull_fit",
      (s, d) => {
        val wu = Window.partitionBy("user_id").orderBy("ms")
        val b = Tables.events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id"),
            unix_millis(col("ts").cast("timestamp")).as("ms"))
          .select((col("ms") - lag("ms", 1).over(wu)).as("gap"))
          .where(col("gap").isNotNull && col("gap") > 0)
          .select((length(bin(col("gap") + 1)) - 1).cast("long").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("k"))
        val n = b.agg(sum("k").as("n"))
        val pts = b
          .select(col("bucket"), col("k"),
            sum("k").over(Window.orderBy("bucket")).as("ck"))
          .crossJoin(broadcast(n))
          .where(col("ck") < col("n"))
          .select(expr("ln(CAST(2 AS DOUBLE)) * (bucket + 1)").as("lnt"),
            expr("ln(-ln(1.0 - CAST(ck AS DOUBLE)/(n + 1)))").as("y"))
        pts.agg(count(lit(1)).as("m"), sum("lnt").as("sx"), sum("y").as("sy"),
            sum(expr("lnt*lnt")).as("sxx"), sum(expr("lnt*y")).as("sxy"))
          .select(col("m"),
            expr("(m*sxy - sx*sy)/(m*sxx - sx*sx)").as("shape"),
            expr("(sy - (m*sxy - sx*sy)/(m*sxx - sx*sx)*sx)/m").as("icept"))
          .select(col("m").as("n_points"),
            expr("CAST(round(1000000.0*shape) AS BIGINT)").as("shape_micro"),
            expr("CAST(round(exp(-icept/shape)) AS BIGINT)").as("scale_ms"))
      },
      Some("""WITH p AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
             |      FROM events WHERE event_type='purchase'),
             |g AS (SELECT ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS gap
             |      FROM p),
             |gg AS (SELECT gap FROM g WHERE gap IS NOT NULL AND gap > 0),
             |b AS (SELECT CAST(length(bin(gap + 1)) - 1 AS BIGINT) AS bucket,
             |      count(*) AS k FROM gg GROUP BY 1),
             |n AS (SELECT sum(k) AS n FROM b),
             |e AS (SELECT bucket, k, sum(k) OVER (ORDER BY bucket) AS ck FROM b),
             |pts AS (SELECT ln(CAST(2 AS DOUBLE)) * (bucket + 1) AS lnt,
             |    ln(-ln(1.0 - CAST(ck AS DOUBLE)/((SELECT n FROM n) + 1))) AS y
             |  FROM e WHERE ck < (SELECT n FROM n)),
             |s AS (SELECT count(*) AS m, sum(lnt) AS sx, sum(y) AS sy,
             |    sum(lnt*lnt) AS sxx, sum(lnt*y) AS sxy FROM pts),
             |fit AS (SELECT m, (m*sxy - sx*sy)/(m*sxx - sx*sx) AS shape,
             |    (sy - (m*sxy - sx*sy)/(m*sxx - sx*sx)*sx)/m AS icept FROM s)
             |SELECT CAST(m AS BIGINT) AS n_points,
             |  CAST(round(1000000.0*shape) AS BIGINT) AS shape_micro,
             |  CAST(round(exp(-icept/shape)) AS BIGINT) AS scale_ms
             |FROM fit""".stripMargin)),

    // exponential goodness-of-fit — KS distance of the inter-purchase gap
    // ECDF (at the log2 bucket edges) from the fitted exponential
    // 1 − e^(−λ̂t), against the asymptotic 5 % critical value 1.358/√n.
    // The THIRD estimator of the purchase process's memorylessness:
    // q_weibull_fit's k ≈ 1 and q_self_excitation's ratio ≈ 1 predict
    // "don't reject", and this test confirms it — three independent
    // methods, one story. Bucket-edge ECDF keeps the sup over the bounded
    // ~42-bucket domain (q_weibull_fit convention, whitelisted).
    QueryDef(
      "q_exp_gof",
      (s, d) => {
        val wu = Window.partitionBy("user_id").orderBy("ms")
        val b = Tables.events(s, d).where(col("event_type") === "purchase")
          .select(col("user_id"),
            unix_millis(col("ts").cast("timestamp")).as("ms"))
          .select((col("ms") - lag("ms", 1).over(wu)).as("gap"))
          .where(col("gap").isNotNull && col("gap") > 0)
        val bk = b.select((length(bin(col("gap") + 1)) - 1).cast("long").as("bucket"),
            col("gap"))
          .groupBy("bucket").agg(count(lit(1)).as("k"), sum("gap").as("sg"))
        val n = bk.agg(sum("k").as("n"), sum("sg").as("tot"))
        bk.select(col("bucket"), col("k"),
            sum("k").over(Window.orderBy("bucket")).as("ck"))
          .crossJoin(broadcast(n))
          .select(expr("""abs(CAST(ck AS DOUBLE)/n
                 | - (1 - exp(-(power(2.0, bucket+1)-1) * n / tot)))""".stripMargin)
            .as("ks"), col("n"))
          .groupBy()
          .agg(max("n").as("n_gaps"),
            expr("CAST(round(1000000.0*max(ks)) AS BIGINT)").as("ks_micro"),
            expr("CAST(round(1000000.0*1.358/sqrt(max(n))) AS BIGINT)")
              .as("crit05_micro"),
            expr("""CAST(CASE WHEN max(ks) > 1.358/sqrt(max(n))
                   | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("reject_exp"))
      },
      Some("""WITH p AS (SELECT user_id, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms
             |      FROM events WHERE event_type='purchase'),
             |g AS (SELECT ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) AS gap
             |      FROM p),
             |gg AS (SELECT gap FROM g WHERE gap IS NOT NULL AND gap > 0),
             |b AS (SELECT CAST(length(bin(gap + 1)) - 1 AS BIGINT) AS bucket,
             |      count(*) AS k, sum(gap) AS sg FROM gg GROUP BY 1),
             |n AS (SELECT sum(k) AS n, sum(sg) AS tot FROM b),
             |e AS (SELECT bucket, k, sum(k) OVER (ORDER BY bucket) AS ck FROM b),
             |d AS (SELECT bucket,
             |    abs(CAST(ck AS DOUBLE)/(SELECT n FROM n)
             |      - (1 - exp(-(power(2.0, bucket+1)-1) * (SELECT n FROM n)
             |         / (SELECT tot FROM n)))) AS ks FROM e)
             |SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_gaps,
             |  CAST(round(1000000.0*max(ks)) AS BIGINT) AS ks_micro,
             |  CAST(round(1000000.0*1.358/sqrt((SELECT n FROM n))) AS BIGINT)
             |    AS crit05_micro,
             |  CAST(CASE WHEN max(ks) > 1.358/sqrt((SELECT n FROM n))
             |    THEN 1 ELSE 0 END AS BIGINT) AS reject_exp
             |FROM d""".stripMargin)),

    // funnel with Wilson 95 % intervals — q_funnel reports the step rates;
    // this adds the score-interval error bars that survive small
    // denominators (Wilson, closed form — never the Wald interval that
    // collapses at p near 0/1). Unit = (user, day) — the fixture's
    // hyperactive users make USER-level funnels all-1.0 (documented
    // degeneracy); at day grain the steps land ~38/35/36 % with honest
    // widening intervals down-funnel. ONE conditional-max pass, a 3-row
    // literal unroll, all doubles rounded once.
    QueryDef(
      "q_funnel_ci",
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("s1"),
            max(when(col("event_type") === "click", 1L).otherwise(0L)).as("s2"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("s3"))
        val f = u.agg(count(lit(1)).as("n0"), sum("s1").as("n1"),
          sum(expr("s1*s2")).as("n2"), sum(expr("s1*s2*s3")).as("n3"))
        def step(k: Int, name: String, denom: String, num: String) =
          f.select(lit(k.toLong).as("step"), lit(name).as("name"),
            col(denom).as("denom"), col(num).as("num"))
        val wil = step(1, "view", "n0", "n1")
          .unionByName(step(2, "click|view", "n1", "n2"))
          .unionByName(step(3, "purchase|click", "n2", "n3"))
          .select(col("step"), col("name"), col("denom"), col("num"),
            expr("CAST(num AS DOUBLE)/denom").as("p"), lit(1.959964).as("z"))
        wil.select(col("step"), col("name"), col("denom"), col("num"),
            expr("CAST(round(1000000.0*p) AS BIGINT)").as("rate_micro"),
            expr("""CAST(round(1000000.0*((p + z*z/(2*denom)
                   | - z*sqrt((p*(1-p) + z*z/(4*denom))/denom)) / (1 + z*z/denom)))
                   | AS BIGINT)""".stripMargin).as("lo_micro"),
            expr("""CAST(round(1000000.0*((p + z*z/(2*denom)
                   | + z*sqrt((p*(1-p) + z*z/(4*denom))/denom)) / (1 + z*z/denom)))
                   | AS BIGINT)""".stripMargin).as("hi_micro"))
          .orderBy("step")
      },
      Some("""WITH u AS (SELECT user_id, CAST(ts AS DATE) AS day,
             |    max(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS s1,
             |    max(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS s2,
             |    max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS s3
             |  FROM events GROUP BY 1, 2),
             |f AS (SELECT count(*) AS n0, sum(s1) AS n1, sum(s1*s2) AS n2,
             |      sum(s1*s2*s3) AS n3 FROM u),
             |steps AS (
             |  SELECT 1 AS step, 'view' AS name, n0 AS denom, n1 AS num FROM f
             |  UNION ALL SELECT 2, 'click|view', n1, n2 FROM f
             |  UNION ALL SELECT 3, 'purchase|click', n2, n3 FROM f),
             |wil AS (SELECT step, name, denom, num,
             |    CAST(num AS DOUBLE)/denom AS p, 1.959964 AS z FROM steps)
             |SELECT CAST(step AS BIGINT) AS step, name, CAST(denom AS BIGINT) AS denom,
             |  CAST(num AS BIGINT) AS num,
             |  CAST(round(1000000.0*p) AS BIGINT) AS rate_micro,
             |  CAST(round(1000000.0*((p + z*z/(2*denom)
             |    - z*sqrt((p*(1-p) + z*z/(4*denom))/denom)) / (1 + z*z/denom)))
             |    AS BIGINT) AS lo_micro,
             |  CAST(round(1000000.0*((p + z*z/(2*denom)
             |    + z*sqrt((p*(1-p) + z*z/(4*denom))/denom)) / (1 + z*z/denom)))
             |    AS BIGINT) AS hi_micro
             |FROM wil ORDER BY step""".stripMargin)),

    // minimum-detectable-effect planning curve — for 7/14/21/28-day
    // runtimes at the observed purchase traffic: n per arm, the absolute
    // MDE in cents and relative to the mean, at 80 % power / 5 % two-sided
    // (z's as fixed literals — no inverse-normal crosses the engine
    // boundary). The planning table q_power_analysis's single answer
    // expands into; one moment pass, a 4-row broadcast grid.
    QueryDef(
      "q_mde_curve",
      (s, d) => {
        val p = Tables.events(s, d).where(col("event_type") === "purchase")
          .select(round(col("value") * 100).cast("long").as("cents"),
            to_date(col("ts")).as("day"))
        val base = p.agg(count(lit(1)).as("n"), countDistinct("day").as("days"),
            sum("cents").as("sc"),
            sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("ss"))
          .select(expr("CAST(n AS DOUBLE)/days").as("daily"),
            expr("(CAST(ss AS DOUBLE) - CAST(sc AS DOUBLE)*sc/n)/(n-1)").as("s2"),
            expr("sc/CAST(n AS DOUBLE)").as("mu"))
        val grid = s.range(1, 5).select((col("id") * 7).cast("long").as("k"))
        broadcast(grid).crossJoin(base)
          .select(col("k").as("days"),
            expr("CAST(round(daily*k/2) AS BIGINT)").as("n_per_arm"),
            expr("CAST(round((1.959964+0.841621)*sqrt(2*s2/(daily*k/2))) AS BIGINT)")
              .as("mde_cents"),
            expr("""CAST(round(1000000.0*(1.959964+0.841621)
                   | *sqrt(2*s2/(daily*k/2))/mu) AS BIGINT)""".stripMargin)
              .as("mde_rel_micro"))
          .orderBy("days")
      },
      Some("""WITH p AS (SELECT CAST(round(value*100) AS BIGINT) AS cents,
             |      CAST(ts AS DATE) AS day
             |    FROM events WHERE event_type='purchase'),
             |s AS (SELECT count(*) AS n, count(DISTINCT day) AS days,
             |    sum(cents) AS sc, sum(CAST(cents AS HUGEINT)*cents) AS ss FROM p),
             |base AS (SELECT CAST(n AS DOUBLE)/days AS daily,
             |    (CAST(ss AS DOUBLE) - CAST(sc AS DOUBLE)*sc/n)/(n-1) AS s2,
             |    sc/CAST(n AS DOUBLE) AS mu FROM s),
             |grid AS (SELECT unnest([7,14,21,28]) AS k)
             |SELECT CAST(k AS BIGINT) AS days,
             |  CAST(round(daily*k/2) AS BIGINT) AS n_per_arm,
             |  CAST(round((1.959964+0.841621)*sqrt(2*s2/(daily*k/2))) AS BIGINT)
             |    AS mde_cents,
             |  CAST(round(1000000.0*(1.959964+0.841621)*sqrt(2*s2/(daily*k/2))/mu)
             |    AS BIGINT) AS mde_rel_micro
             |FROM grid CROSS JOIN base ORDER BY days""".stripMargin)),

    // partial autocorrelation at lags 1..3 — Durbin–Levinson in closed form
    // from the biased common-mean autocovariances (the AR-order fingerprint
    // q_acf's raw curve can't show: PACF cuts off at the true AR order).
    // The day frame is calendar-bounded; the φ recursions are pure scalar
    // algebra on the three r's, every reported value rounded once.
    QueryDef(
      "q_pacf",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
        val mu = daily.agg(expr("avg(CAST(n AS DOUBLE))").as("mu"))
        val dm = daily.crossJoin(broadcast(mu))
          .select(col("day"), (col("n") - col("mu")).as("z"))
        val c0 = dm.agg(sum(expr("z*z")).as("c0"))
        val ck = dm
          .select(col("day"), col("z"), explode(sequence(lit(1), lit(3))).as("k"))
          .withColumn("jday", expr("date_add(day, k)"))
          .join(broadcast(dm.select(col("day").as("jday"), col("z").as("z2"))),
            "jday")
          .groupBy("k").agg(sum(expr("z*z2")).as("c"))
        val r = ck.crossJoin(broadcast(c0))
          .groupBy()
          .agg(max(when(col("k") === 1, expr("c/c0"))).as("r1"),
            max(when(col("k") === 2, expr("c/c0"))).as("r2"),
            max(when(col("k") === 3, expr("c/c0"))).as("r3"))
        val dl = r
          .withColumn("p11", col("r1"))
          .withColumn("p22", expr("(r2 - r1*r1)/(1 - r1*r1)"))
          .withColumn("p21", expr("r1*(1 - p22)"))
          .withColumn("p33",
            expr("(r3 - p21*r2 - p22*r1)/(1 - p21*r1 - p22*r2)"))
        def rowFor(k: Int, rc: String, pc: String) =
          dl.select(lit(k.toLong).as("lag"),
            expr(s"CAST(round(1000000.0*$rc) AS BIGINT)").as("acf_micro"),
            expr(s"CAST(round(1000000.0*$pc) AS BIGINT)").as("pacf_micro"))
        rowFor(1, "r1", "p11").unionByName(rowFor(2, "r2", "p22"))
          .unionByName(rowFor(3, "r3", "p33")).orderBy("lag")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
             |      FROM events GROUP BY 1),
             |mu AS (SELECT avg(CAST(n AS DOUBLE)) AS mu FROM daily),
             |dm AS (SELECT day, n - (SELECT mu FROM mu) AS z FROM daily),
             |c0 AS (SELECT sum(z*z) AS c0 FROM dm),
             |ck AS (SELECT k, sum(a.z * b.z) AS c
             |  FROM (SELECT unnest([1,2,3]) AS k) g
             |  JOIN dm a ON TRUE
             |  JOIN dm b ON b.day = a.day + CAST(g.k AS BIGINT) * INTERVAL 1 DAY
             |  GROUP BY 1),
             |r AS (SELECT
             |    max(CASE WHEN k=1 THEN c END)/(SELECT c0 FROM c0) AS r1,
             |    max(CASE WHEN k=2 THEN c END)/(SELECT c0 FROM c0) AS r2,
             |    max(CASE WHEN k=3 THEN c END)/(SELECT c0 FROM c0) AS r3
             |  FROM ck),
             |dl AS (SELECT r1, r2, r3, r1 AS p11,
             |    (r2 - r1*r1)/(1 - r1*r1) AS p22 FROM r),
             |dl2 AS (SELECT *, r1*(1 - p22) AS p21 FROM dl),
             |dl3 AS (SELECT *,
             |    (r3 - p21*r2 - p22*r1)/(1 - p21*r1 - p22*r2) AS p33 FROM dl2)
             |SELECT CAST(1 AS BIGINT) AS lag,
             |  CAST(round(1000000.0*r1) AS BIGINT) AS acf_micro,
             |  CAST(round(1000000.0*p11) AS BIGINT) AS pacf_micro FROM dl3
             |UNION ALL SELECT 2, CAST(round(1000000.0*r2) AS BIGINT),
             |  CAST(round(1000000.0*p22) AS BIGINT) FROM dl3
             |UNION ALL SELECT 3, CAST(round(1000000.0*r3) AS BIGINT),
             |  CAST(round(1000000.0*p33) AS BIGINT) FROM dl3
             |ORDER BY lag""".stripMargin)),

    // nested variance decomposition — how much of order-value variance
    // lives BETWEEN regions, between nations WITHIN regions, and within
    // nations: the hierarchy-profiling ANOVA that says which grouping is
    // worth segmenting on. Per-group (s, n) are exact integers; the total
    // SS reports from the exact 128-bit numerator n·Σx² − (Σx)² (a raw
    // double sum at ~1e17 would round differently per engine); the three
    // shares are doubles on exact inputs, each rounded once, and sum to
    // 1e6 within rounding (law pinned in AnalyticsInvariantSpec).
    QueryDef(
      "q_variance_decomp",
      (s, d) => {
        val o = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_regionkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").as("rk"), col("n_nationkey").as("nk"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
        val g = o.agg(count(lit(1)).as("n"), sum("cents").as("s"),
          sum(expr("CAST(cents AS DECIMAL(38,0)) * cents")).as("ss"))
        val nn = o.groupBy("rk", "nk").agg(count(lit(1)).as("gn"), sum("cents").as("gs"))
        val rr = nn.groupBy("rk").agg(sum("gn").as("gn"), sum("gs").as("gs"))
        val betn = nn.agg(sum(expr("CAST(gs AS DOUBLE)*gs/gn")).as("gmn"))
        val betr = rr.agg(sum(expr("CAST(gs AS DOUBLE)*gs/gn")).as("gmr"))
        g.crossJoin(broadcast(betn)).crossJoin(broadcast(betr))
          .select(
            expr("""CAST(round(CAST(CAST(n AS DECIMAL(38,0))*ss - CAST(s AS DECIMAL(38,0))*s AS DOUBLE)
                   | / n / 1000000.0) AS BIGINT)""".stripMargin).as("ss_total_mega"),
            expr("CAST(s AS DOUBLE)*s/n").as("cf"),
            expr("CAST(ss AS DOUBLE) - CAST(s AS DOUBLE)*s/n").as("sst"),
            col("gmn"), col("gmr"))
          .select(col("ss_total_mega"),
            expr("CAST(round(1000000.0*(gmr - cf)/sst) AS BIGINT)")
              .as("region_share_micro"),
            expr("CAST(round(1000000.0*(gmn - gmr)/sst) AS BIGINT)")
              .as("nation_share_micro"),
            expr("CAST(round(1000000.0*(sst - (gmn - cf))/sst) AS BIGINT)")
              .as("residual_share_micro"))
      },
      Some("""WITH o AS (SELECT n.n_regionkey AS rk, n.n_nationkey AS nk,
             |      CAST(round(o_totalprice*100) AS BIGINT) AS cents
             |    FROM orders JOIN customer c ON c.c_custkey = o_custkey
             |    JOIN nation n ON n.n_nationkey = c.c_nationkey),
             |g AS (SELECT count(*) AS n, sum(cents) AS s,
             |      sum(CAST(cents AS HUGEINT)*cents) AS ss FROM o),
             |nn AS (SELECT rk, nk, count(*) AS gn, sum(cents) AS gs FROM o GROUP BY 1, 2),
             |rr AS (SELECT rk, sum(gn) AS gn, sum(gs) AS gs FROM nn GROUP BY 1),
             |betn AS (SELECT sum(CAST(gs AS DOUBLE)*gs/gn) AS gmn FROM nn),
             |betr AS (SELECT sum(CAST(gs AS DOUBLE)*gs/gn) AS gmr FROM rr),
             |fin AS (SELECT
             |    CAST(round(CAST(CAST(g.n AS HUGEINT)*g.ss - CAST(g.s AS HUGEINT)*g.s AS DOUBLE)
             |      / g.n / 1000000.0) AS BIGINT) AS ss_total_mega,
             |    CAST(g.s AS DOUBLE)*g.s/g.n AS cf,
             |    CAST(g.ss AS DOUBLE) - CAST(g.s AS DOUBLE)*g.s/g.n AS sst,
             |    betn.gmn, betr.gmr
             |  FROM g CROSS JOIN betn CROSS JOIN betr)
             |SELECT ss_total_mega,
             |  CAST(round(1000000.0*(gmr - cf)/sst) AS BIGINT) AS region_share_micro,
             |  CAST(round(1000000.0*(gmn - gmr)/sst) AS BIGINT) AS nation_share_micro,
             |  CAST(round(1000000.0*(sst - (gmn - cf))/sst) AS BIGINT)
             |    AS residual_share_micro
             |FROM fin""".stripMargin)),

    // Kruskal-Wallis k-sample rank test — does line quantity differ by
    // return flag? The k-group generalization of q_mannwhitney, same
    // midrank machinery: ranks live on the ≤50-value quantity domain
    // (one grouped count, then a bounded-domain cumulative), group rank
    // sums stay exact via doubled midranks (2·cum − cnt + 1, all
    // integers), and the tie-corrected H meets the closed-form df=2
    // chi-square survival e^(−H/2). Null expected on TPC-H (quantity ⊥
    // returnflag) — the honest baseline.
    QueryDef(
      "q_kruskal_wallis",
      (s, d) => {
        val e = Tables.lineitem(s, d)
          .select(col("l_returnflag").as("g"), col("l_quantity").cast("long").as("v"))
        val byv = e.groupBy("v").agg(count(lit(1)).as("cnt"))
        val rk = byv
          .withColumn("cum", sum("cnt").over(Window.orderBy("v")))
          .select(col("v"),
            expr("CAST(2*cum - cnt + 1 AS DECIMAL(38,0))").as("r2"))
        val gr = e.groupBy("g", "v").agg(count(lit(1)).as("c"))
          .join(broadcast(rk), "v")
          .groupBy("g")
          .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * r2")).as("r2sum"),
            sum("c").as("nj"))
        val n = gr.agg(sum("nj").as("n"))
        val tie = byv.agg(
          sum(expr("CAST(cnt AS DECIMAL(38,0))*cnt*cnt - cnt")).as("t3"))
        gr.crossJoin(broadcast(n)).crossJoin(broadcast(tie))
          .groupBy()
          .agg(max("n").as("n"), count(lit(1)).as("k"),
            expr("""(3.0/(CAST(max(n) AS DOUBLE)*(max(n)+1)))
                   | * sum(CAST(r2sum AS DOUBLE)*CAST(r2sum AS DOUBLE)/nj)
                   | - 3.0*(max(n)+1)""".stripMargin).as("h0"),
            expr("""1.0 - CAST(max(t3) AS DOUBLE)
                   | / (CAST(max(n) AS DOUBLE)*max(n)*max(n) - max(n))""".stripMargin)
              .as("corr"))
          .select(col("n").cast("long").as("n"), col("k").as("k_groups"),
            expr("CAST(round(1000.0*h0/corr) AS BIGINT)").as("h_milli"),
            expr("CAST(round(1000000.0*exp(-h0/corr/2)) AS BIGINT)").as("p_micro"),
            expr("CAST(CASE WHEN exp(-h0/corr/2) < 0.05 THEN 1 ELSE 0 END AS BIGINT)")
              .as("reject_equal"))
      },
      Some("""WITH e AS (SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS v
             |      FROM lineitem),
             |byv AS (SELECT v, count(*) AS cnt FROM e GROUP BY 1),
             |r AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v) AS cum FROM byv),
             |rk AS (SELECT v, CAST(2*cum - cnt + 1 AS HUGEINT) AS r2 FROM r),
             |gv AS (SELECT g, v, count(*) AS c FROM e GROUP BY 1, 2),
             |gr AS (SELECT g, sum(CAST(c AS HUGEINT) * rk.r2) AS r2sum, sum(c) AS nj
             |       FROM gv JOIN rk USING (v) GROUP BY 1),
             |n AS (SELECT sum(nj) AS n FROM gr),
             |tie AS (SELECT sum(CAST(cnt AS HUGEINT)*cnt*cnt - cnt) AS t3 FROM byv),
             |h AS (SELECT max(n.n) AS n, count(*) AS k,
             |    (3.0/(CAST(max(n.n) AS DOUBLE)*(max(n.n)+1)))
             |      * sum(CAST(r2sum AS DOUBLE)*CAST(r2sum AS DOUBLE)/nj)
             |      - 3.0*(max(n.n)+1) AS h0,
             |    1.0 - CAST(max(tie.t3) AS DOUBLE)
             |      / (CAST(max(n.n) AS DOUBLE)*max(n.n)*max(n.n) - max(n.n)) AS corr
             |  FROM gr CROSS JOIN n CROSS JOIN tie)
             |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k_groups,
             |  CAST(round(1000.0*h0/corr) AS BIGINT) AS h_milli,
             |  CAST(round(1000000.0*exp(-h0/corr/2)) AS BIGINT) AS p_micro,
             |  CAST(CASE WHEN exp(-h0/corr/2) < 0.05 THEN 1 ELSE 0 END AS BIGINT)
             |    AS reject_equal
             |FROM h""".stripMargin)),

    // Wald-Wolfowitz runs test — is the daily-revenue sequence random
    // around its median, or does it trend/cluster? Days above vs below
    // the exact lower median (ties dropped, the standard treatment),
    // runs counted by one lag pass over the calendar-bounded daily
    // frame, and the closed-form normal z. Complements q_mann_kendall
    // (monotone trend) with the non-parametric randomness check.
    QueryDef(
      "q_runs_test",
      (s, d) => {
        val day = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
        val med = day
          .select(col("rev"), col("dt"),
            row_number().over(Window.orderBy("rev", "dt")).as("r"),
            count(lit(1)).over(Window.partitionBy()).as("n"))
          .where(expr("r = (n+1) div 2")).select(col("rev").as("m"))
        val sg = day.crossJoin(broadcast(med))
          .where(col("rev") =!= col("m"))
          .select(col("dt"), when(col("rev") > col("m"), 1L).otherwise(0L).as("sgn"))
        val runs = sg
          .withColumn("prev", lag("sgn", 1).over(Window.orderBy("dt")))
          .agg(count(lit(1)).as("n"), sum("sgn").as("n1"),
            sum(when(col("prev").isNull || col("sgn") =!= col("prev"), 1L)
              .otherwise(0L)).as("runs"))
        runs.select(col("n").as("n_days"), col("n1").as("n_above"),
          (col("n") - col("n1")).as("n_below"), col("runs").as("n_runs"),
          expr("""CAST(round(1000.0 * (runs - (2.0*n1*(n-n1)/n + 1))
                 | / sqrt(2.0*n1*(n-n1)*(2.0*n1*(n-n1) - n)
                 |   / (CAST(n AS DOUBLE)*n*(n-1)))) AS BIGINT)""".stripMargin)
            .as("z_milli"),
          expr("""CAST(CASE WHEN abs((runs - (2.0*n1*(n-n1)/n + 1))
                 | / sqrt(2.0*n1*(n-n1)*(2.0*n1*(n-n1) - n)
                 |   / (CAST(n AS DOUBLE)*n*(n-1)))) > 1.96
                 | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("reject_random"))
      },
      Some("""WITH day AS (SELECT o_orderdate AS dt,
             |      sum(CAST(round(o_totalprice*100) AS BIGINT)) AS rev
             |    FROM orders GROUP BY 1),
             |med AS (SELECT rev AS m FROM
             |    (SELECT rev, dt, row_number() OVER (ORDER BY rev, dt) AS r,
             |       count(*) OVER () AS n FROM day)
             |    WHERE r = (n+1)//2),
             |s AS (SELECT dt, CASE WHEN rev > (SELECT m FROM med) THEN 1 ELSE 0 END AS sgn
             |      FROM day WHERE rev <> (SELECT m FROM med)),
             |r AS (SELECT sgn, lag(sgn) OVER (ORDER BY dt) AS prev FROM s),
             |agg AS (SELECT count(*) AS n, sum(sgn) AS n1,
             |        sum(CASE WHEN prev IS NULL OR sgn <> prev THEN 1 ELSE 0 END) AS runs
             |      FROM r)
             |SELECT CAST(n AS BIGINT) AS n_days, CAST(n1 AS BIGINT) AS n_above,
             |  CAST(n - n1 AS BIGINT) AS n_below, CAST(runs AS BIGINT) AS n_runs,
             |  CAST(round(1000.0 * (runs - (2.0*n1*(n-n1)/n + 1))
             |    / sqrt(2.0*n1*(n-n1)*(2.0*n1*(n-n1) - n)
             |      / (CAST(n AS DOUBLE)*n*(n-1)))) AS BIGINT) AS z_milli,
             |  CAST(CASE WHEN abs((runs - (2.0*n1*(n-n1)/n + 1))
             |    / sqrt(2.0*n1*(n-n1)*(2.0*n1*(n-n1) - n)
             |      / (CAST(n AS DOUBLE)*n*(n-1)))) > 1.96
             |    THEN 1 ELSE 0 END AS BIGINT) AS reject_random
             |FROM agg""".stripMargin)),

    // Ljung-Box portmanteau test — is the daily event-count series white
    // noise across lags 1..10 jointly? q_acf reports the per-lag curve;
    // this is the omnibus Q over it. Centering stays exact through the
    // integer trick y_t = T·x_t − N (ρ_k = Σy_t·y_{t+k} / Σy_t², both
    // 128-bit exact), the lag pairs ride q_acf's broadcast self-join on
    // the calendar-bounded daily frame, and df=10 (even) admits the
    // closed-form chi-square survival.
    QueryDef(
      "q_ljung_box",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
        val t = daily.agg(count(lit(1)).as("t"), sum("x").as("n"))
        val y = daily.crossJoin(broadcast(t))
          .select(col("day"), expr("CAST(t AS DECIMAL(38,0))*x - n").as("y"),
            col("t"))
        val g0 = y.agg(sum(expr("y*y")).as("g0"))
        val gk = y
          .select(col("day"), col("y").as("a"),
            explode(sequence(lit(1), lit(10))).as("lag"))
          .withColumn("jday", expr("date_add(day, lag)"))
          .join(broadcast(y.select(col("day").as("jday"), col("y").as("b"))), "jday")
          .groupBy("lag").agg(sum(expr("a*b")).as("gk"))
        val q = gk.crossJoin(broadcast(g0)).crossJoin(broadcast(t))
          .groupBy()
          .agg(max("t").as("t"),
            sum(expr("""(CAST(gk AS DOUBLE)/CAST(g0 AS DOUBLE))
                       | * (CAST(gk AS DOUBLE)/CAST(g0 AS DOUBLE)) / (t - lag)"""
              .stripMargin)).as("sq"))
          .select(col("t"), expr("CAST(t AS DOUBLE)*(t+2)*sq").as("q"))
        q.select(col("t").cast("long").as("t_days"),
          expr("CAST(round(1000.0*q) AS BIGINT)").as("q_milli"),
          expr("""CAST(round(1000000.0 * exp(-q/2)*(1 + q/2 + pow(q/2,2)/2
                 | + pow(q/2,3)/6 + pow(q/2,4)/24)) AS BIGINT)""".stripMargin)
            .as("p_micro"),
          expr("""CAST(CASE WHEN exp(-q/2)*(1 + q/2 + pow(q/2,2)/2
                 | + pow(q/2,3)/6 + pow(q/2,4)/24) < 0.05
                 | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin)
            .as("reject_whitenoise"))
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS x
             |      FROM events GROUP BY 1),
             |t AS (SELECT count(*) AS t, sum(x) AS n FROM daily),
             |y AS (SELECT day, CAST(t.t AS HUGEINT)*x - t.n AS y FROM daily CROSS JOIN t),
             |g0 AS (SELECT sum(y*y) AS g0 FROM y),
             |l AS (SELECT unnest(range(1, 11)) AS lag),
             |gk AS (SELECT l.lag, sum(a.y*b.y) AS gk FROM l
             |       JOIN y a ON TRUE
             |       JOIN y b ON b.day = a.day + CAST(l.lag AS BIGINT)*INTERVAL 1 DAY
             |       GROUP BY 1),
             |rho AS (SELECT lag, CAST(gk AS DOUBLE)/(SELECT CAST(g0 AS DOUBLE) FROM g0)
             |          AS rho FROM gk),
             |q0 AS (SELECT max((SELECT t FROM t)) AS t,
             |      sum(rho*rho / ((SELECT t FROM t) - lag)) AS s FROM rho),
             |f AS (SELECT t, CAST(t AS DOUBLE)*(t+2)*s AS q FROM q0)
             |SELECT CAST(t AS BIGINT) AS t_days,
             |  CAST(round(1000.0*q) AS BIGINT) AS q_milli,
             |  CAST(round(1000000.0 * exp(-q/2)*(1 + q/2 + pow(q/2,2)/2
             |    + pow(q/2,3)/6 + pow(q/2,4)/24)) AS BIGINT) AS p_micro,
             |  CAST(CASE WHEN exp(-q/2)*(1 + q/2 + pow(q/2,2)/2
             |    + pow(q/2,3)/6 + pow(q/2,4)/24) < 0.05
             |    THEN 1 ELSE 0 END AS BIGINT) AS reject_whitenoise
             |FROM f""".stripMargin)),

    // Friedman test — do the five event types keep the same volume
    // ordering day after day? Blocks = days, treatments = the pinned
    // 5-type list (df = 4, even → closed-form p), midranks within each
    // day via the doubled-rank integers (2·RANK + ties − 1), zero-filled
    // grid so absent (day, type) cells rank honestly, and Conover's
    // tie-general statistic (k−1)·Σ(R_j − n(k+1)/2)²/(A − C) computed
    // exactly until the one final division. Every window partitions by
    // day; the grid is calendar × 5.
    QueryDef(
      "q_friedman",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val dd = Tables.events(s, d)
          .where(col("event_type").isin(types: _*))
          .groupBy(to_date(col("ts")).as("day"), col("event_type").as("ty"))
          .agg(count(lit(1)).as("c"))
        val grid = dd.select("day").distinct()
          .crossJoin(broadcast(
            dd.sparkSession.createDataFrame(types.map(Tuple1(_))).toDF("ty")))
          .join(dd, Seq("day", "ty"), "left")
          .na.fill(0L, Seq("c"))
        val rk2 = grid
          .withColumn("rk0", rank().over(Window.partitionBy("day").orderBy("c")))
          .withColumn("teq", count(lit(1)).over(Window.partitionBy("day", "c")))
          .select(col("day"), col("ty"),
            expr("CAST(2*rk0 + teq - 1 AS DECIMAL(38,0))").as("r2"))
        val rj = rk2.groupBy("ty").agg(sum("r2").as("r2j"))
        val nn = rk2.select("day").distinct().agg(count(lit(1)).as("n"))
        val aa = rk2.agg(sum(expr("r2*r2")).as("a4"))
        rj.crossJoin(broadcast(nn)).crossJoin(broadcast(aa))
          .groupBy()
          .agg(max("n").as("n"), count(lit(1)).as("k"),
            sum(expr("""CAST(r2j - CAST(n AS DECIMAL(38,0))*6 AS DOUBLE)
                       | * CAST(r2j - CAST(n AS DECIMAL(38,0))*6 AS DOUBLE)"""
              .stripMargin)).as("num"),
            max("a4").as("a4"))
          .select(col("n").cast("long").as("n_days"), col("k").as("k_types"),
            expr("""CAST(round(1000.0 * (k-1)*num
                   | / (CAST(a4 AS DOUBLE) - CAST(n AS DOUBLE)*k*(k+1)*(k+1)))
                   | AS BIGINT)""".stripMargin).as("chi2_milli"),
            expr("""CAST(round(1000000.0 * exp(-((k-1)*num
                   | / (CAST(a4 AS DOUBLE) - CAST(n AS DOUBLE)*k*(k+1)*(k+1)))/2)
                   | * (1 + ((k-1)*num
                   | / (CAST(a4 AS DOUBLE) - CAST(n AS DOUBLE)*k*(k+1)*(k+1)))/2))
                   | AS BIGINT)""".stripMargin).as("p_micro"),
            expr("""CAST(CASE WHEN exp(-((k-1)*num
                   | / (CAST(a4 AS DOUBLE) - CAST(n AS DOUBLE)*k*(k+1)*(k+1)))/2)
                   | * (1 + ((k-1)*num
                   | / (CAST(a4 AS DOUBLE) - CAST(n AS DOUBLE)*k*(k+1)*(k+1)))/2) < 0.05
                   | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("reject_equal"))
      },
      Some("""WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type AS ty, count(*) AS c
             |      FROM events
             |      WHERE event_type IN ('click','error','purchase','signup','view')
             |      GROUP BY 1, 2),
             |days AS (SELECT DISTINCT day FROM d),
             |tys AS (SELECT unnest(['click','error','purchase','signup','view']) AS ty),
             |grid AS (SELECT days.day, tys.ty, coalesce(d.c, 0) AS c
             |         FROM days CROSS JOIN tys
             |         LEFT JOIN d ON d.day = days.day AND d.ty = tys.ty),
             |rk AS (SELECT day, ty, c,
             |        CAST(2*rank() OVER (PARTITION BY day ORDER BY c)
             |          + count(*) OVER (PARTITION BY day, c) - 1 AS HUGEINT) AS r2
             |       FROM grid),
             |rj AS (SELECT ty, sum(r2) AS r2j FROM rk GROUP BY 1),
             |nn AS (SELECT count(*) AS n FROM days),
             |aa AS (SELECT sum(r2*r2) AS a4 FROM rk),
             |st AS (SELECT count(*) AS k,
             |    sum(CAST(r2j - (SELECT n FROM nn)*6 AS DOUBLE)
             |      * CAST(r2j - (SELECT n FROM nn)*6 AS DOUBLE)) AS num
             |  FROM rj),
             |f AS (SELECT (SELECT n FROM nn) AS n, k,
             |    (k-1)*num / (CAST((SELECT a4 FROM aa) AS DOUBLE)
             |      - CAST((SELECT n FROM nn) AS DOUBLE)*k*(k+1)*(k+1)) AS chi2
             |  FROM st)
             |SELECT CAST(n AS BIGINT) AS n_days, CAST(k AS BIGINT) AS k_types,
             |  CAST(round(1000.0*chi2) AS BIGINT) AS chi2_milli,
             |  CAST(round(1000000.0 * exp(-chi2/2)*(1 + chi2/2)) AS BIGINT) AS p_micro,
             |  CAST(CASE WHEN exp(-chi2/2)*(1 + chi2/2) < 0.05 THEN 1 ELSE 0 END AS BIGINT)
             |    AS reject_equal
             |FROM f""".stripMargin)),

    // Erlang-C staffing table — how many servers does the peak event
    // arrival rate need at a 200 ms mean service time? Offered load
    // a = peak/18000 erlangs; the Erlang-B blocking recursion
    // B_c = a·B_{c−1}/(c + a·B_{c−1}) runs 32 unrolled steps in
    // TRUNCATING nano fixed point (the q_markov_stationary convention —
    // integer div at every step, so both engines agree bit for bit),
    // then Erlang-C wait probability and ASA come out as exact integer
    // rationals of B. The corpus-scaled work is ONE grouped hourly count;
    // the recursion lives on a 1-row frame.
    QueryDef(
      "q_erlang_c",
      (s, d) => {
        val pk = Tables.events(s, d)
          .groupBy(date_trunc("hour", col("ts").cast("timestamp")).as("h"))
          .agg(count(lit(1)).as("n"))
          .agg(max("n").cast("decimal(38,0)").as("p"))
        var chain = pk.withColumn("b0",
          lit(1000000000L).cast("decimal(38,0)"))
        for (k <- 1 to 32) chain = chain.withColumn(s"b$k",
          expr(s"""CAST((p * b${k - 1})
                  | div (CAST(${k * 18000} AS DECIMAL(38,0))
                  |   + (p * b${k - 1}) div 1000000000) AS DECIMAL(38,0))"""
            .stripMargin))
        val tab = chain.select(col("p"),
            explode(array((1 to 32).map(k =>
              struct(lit(k.toLong).as("c"), col(s"b$k").as("b"))): _*)).as("r"))
          .select(col("p"), col("r.c").as("c"), col("r.b").as("b"))
        tab.where(expr("18000*c > p"))
          .select(col("c").as("servers"),
            expr("CAST(p * 1000000 div (18000*c) AS BIGINT)").as("util_micro"),
            col("b").cast("long").as("erlang_b_nano"),
            expr("""CAST(b*c*18000
                   | div (CAST(c AS DECIMAL(38,0))*18000
                   |   - p*(1000000000 - b) div 1000000000) AS BIGINT)"""
              .stripMargin).as("erlang_c_nano"),
            expr("""CAST(3600 * (b*c*18000
                   | div (CAST(c AS DECIMAL(38,0))*18000
                   |   - p*(1000000000 - b) div 1000000000))
                   | div (18000*c - p) AS BIGINT)""".stripMargin).as("asa_micro_s"))
          .orderBy("servers")
      },
      Some(erlangOracle)),

    // paired sign test — within each week, is weekend daily-average
    // revenue above the weekday average? Per-week comparison by exact
    // integer cross-multiplication (s_we·n_wd vs s_wd·n_we — no division
    // ever), then the binomial normal approximation z = (2S − m)/√m over
    // the calendar-bounded week count. The distribution-free sibling of
    // q_welch_ttest for paired designs; ties (equal averages) drop, the
    // standard treatment.
    QueryDef(
      "q_sign_test",
      (s, d) => {
        val day = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
        val wk = day.select(date_trunc("week", col("dt")).as("w"),
          when(dayofweek(col("dt")).isin(1, 7), 1L).otherwise(0L).as("we"),
          col("rev"))
        val agg = wk.groupBy("w")
          .agg(sum(when(col("we") === 1, col("rev")).otherwise(0L)).as("swe"),
            sum(col("we")).as("nwe"),
            sum(when(col("we") === 0, col("rev")).otherwise(0L)).as("swd"),
            sum(lit(1L) - col("we")).as("nwd"))
          .where(col("nwe") > 0 && col("nwd") > 0)
        val sg = agg.select(
          expr("""CASE WHEN CAST(swe AS DECIMAL(38,0))*nwd > CAST(swd AS DECIMAL(38,0))*nwe THEN 1
                 | WHEN CAST(swe AS DECIMAL(38,0))*nwd < CAST(swd AS DECIMAL(38,0))*nwe THEN -1
                 | ELSE 0 END""".stripMargin).as("sg"))
        sg.agg(sum(when(col("sg") =!= 0, 1L).otherwise(0L)).as("m"),
            sum(when(col("sg") === 1, 1L).otherwise(0L)).as("pos"))
          .select(col("m").as("n_weeks"), col("pos").as("weekend_higher"),
            expr("""CAST(round(1000.0*(2.0*pos - m)/sqrt(CAST(m AS DOUBLE)))
                   | AS BIGINT)""".stripMargin).as("z_milli"),
            expr("""CAST(CASE WHEN abs((2.0*pos - m)/sqrt(CAST(m AS DOUBLE))) > 1.96
                   | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin)
              .as("reject_symmetry"))
      },
      Some("""WITH day AS (SELECT o_orderdate AS dt,
             |      sum(CAST(round(o_totalprice*100) AS BIGINT)) AS rev
             |    FROM orders GROUP BY 1),
             |wk AS (SELECT date_trunc('week', dt) AS w,
             |        CASE WHEN dayofweek(dt) IN (0, 6) THEN 1 ELSE 0 END AS we, rev
             |       FROM day),
             |agg AS (SELECT w,
             |        sum(CASE WHEN we = 1 THEN rev ELSE 0 END) AS swe,
             |        sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) AS nwe,
             |        sum(CASE WHEN we = 0 THEN rev ELSE 0 END) AS swd,
             |        sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) AS nwd
             |      FROM wk GROUP BY 1
             |      HAVING sum(CASE WHEN we = 1 THEN 1 ELSE 0 END) > 0
             |         AND sum(CASE WHEN we = 0 THEN 1 ELSE 0 END) > 0),
             |sg AS (SELECT CASE
             |         WHEN CAST(swe AS HUGEINT)*nwd > CAST(swd AS HUGEINT)*nwe THEN 1
             |         WHEN CAST(swe AS HUGEINT)*nwd < CAST(swd AS HUGEINT)*nwe THEN -1
             |         ELSE 0 END AS s FROM agg),
             |f AS (SELECT count(*) FILTER (s <> 0) AS m,
             |        count(*) FILTER (s = 1) AS pos FROM sg)
             |SELECT CAST(m AS BIGINT) AS n_weeks, CAST(pos AS BIGINT) AS weekend_higher,
             |  CAST(round(1000.0*(2.0*pos - m)/sqrt(CAST(m AS DOUBLE))) AS BIGINT)
             |    AS z_milli,
             |  CAST(CASE WHEN abs((2.0*pos - m)/sqrt(CAST(m AS DOUBLE))) > 1.96
             |    THEN 1 ELSE 0 END AS BIGINT) AS reject_symmetry
             |FROM f""".stripMargin)),

    // Hurst exponent via rescaled-range analysis — does the daily
    // revenue series have long-range memory (H > ½), or is it a random
    // walk of independent days (H ≈ ½)? Classic Mandelbrot-Wallis R/S:
    // per window size w ∈ {8…128}, full blocks get an exact integer
    // cumulative-deviation range (D_t = w·cum_t − (t+1)·S, no rational
    // mean) over a per-block std from exact moments; H is the 5-point
    // log-log OLS slope. Everything after the one daily grouped sum
    // rides the calendar frame × 5 window sizes.
    QueryDef(
      "q_hurst",
      (s, d) => {
        val day = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
        val idx = day.select(
          (row_number().over(Window.orderBy("dt")) - 1).as("t"), col("rev"))
        val ws = s.createDataFrame(Seq(8L, 16L, 32L, 64L, 128L).map(Tuple1(_)))
          .toDF("w")
        val blk = idx.crossJoin(broadcast(ws))
          .select(col("w"), expr("t div w").as("b"), expr("t % w").as("j"),
            col("rev"))
        val fb = blk.groupBy("w", "b")
          .agg(count(lit(1)).as("k"), sum("rev").as("s"),
            sum(expr("CAST(rev AS DECIMAL(38,0))*rev")).as("ss"))
          .where(col("k") === col("w"))
          .drop("k")
        val cum = blk.join(fb, Seq("w", "b"))
          .withColumn("c", sum("rev").over(
            Window.partitionBy("w", "b").orderBy("j")))
        val dev = cum.groupBy("w", "b")
          .agg(max("s").as("s"), max("ss").as("ss"),
            max(expr("CAST(w AS DECIMAL(38,0))*c - (j+1)*s")).as("dmax"),
            min(expr("CAST(w AS DECIMAL(38,0))*c - (j+1)*s")).as("dmin"))
        val rs = dev
          .where(expr("w*ss - CAST(s AS DECIMAL(38,0))*s > 0"))
          .select(col("w"),
            expr("""CAST(dmax - dmin AS DOUBLE)
                   | / sqrt(CAST(w*ss - CAST(s AS DECIMAL(38,0))*s AS DOUBLE))"""
              .stripMargin).as("rsv"))
        val pts = rs.groupBy("w").agg(avg("rsv").as("mrs"))
        pts.select(expr("ln(CAST(w AS DOUBLE))").as("x"), expr("ln(mrs)").as("y"))
          .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
            sum(expr("x*x")).as("sxx"), sum(expr("x*y")).as("sxy"))
          .select(col("k").as("n_scales"),
            expr("CAST(round(1000.0*(k*sxy - sx*sy)/(k*sxx - sx*sx)) AS BIGINT)")
              .as("hurst_milli"))
      },
      Some("""WITH day AS (SELECT o_orderdate AS dt,
             |      sum(CAST(round(o_totalprice*100) AS BIGINT)) AS rev
             |    FROM orders GROUP BY 1),
             |idx AS (SELECT row_number() OVER (ORDER BY dt) - 1 AS t, rev FROM day),
             |ws AS (SELECT unnest([8, 16, 32, 64, 128]) AS w),
             |blk AS (SELECT ws.w, t // ws.w AS b, t % ws.w AS j, rev
             |        FROM idx CROSS JOIN ws),
             |fb AS (SELECT w, b, sum(rev) AS s, sum(CAST(rev AS HUGEINT)*rev) AS ss
             |       FROM blk GROUP BY 1, 2 HAVING count(*) = w),
             |cum AS (SELECT blk.w, blk.b, blk.j, fb.s, fb.ss,
             |        sum(rev) OVER (PARTITION BY blk.w, blk.b ORDER BY j) AS c
             |       FROM blk JOIN fb ON fb.w = blk.w AND fb.b = blk.b),
             |dev AS (SELECT w, b, max(s) AS s, max(ss) AS ss,
             |        max(CAST(w AS HUGEINT)*c - (j+1)*s) AS dmax,
             |        min(CAST(w AS HUGEINT)*c - (j+1)*s) AS dmin
             |       FROM cum GROUP BY 1, 2),
             |rs AS (SELECT w, b,
             |        CAST(dmax - dmin AS DOUBLE)
             |          / sqrt(CAST(w*ss - CAST(s AS HUGEINT)*s AS DOUBLE)) AS rsv
             |       FROM dev WHERE w*ss - CAST(s AS HUGEINT)*s > 0),
             |pts AS (SELECT w, avg(rsv) AS mrs FROM rs GROUP BY 1),
             |q AS (SELECT ln(CAST(w AS DOUBLE)) AS x, ln(mrs) AS y FROM pts),
             |ols AS (SELECT count(*) AS k, sum(x) AS sx, sum(y) AS sy,
             |        sum(x*x) AS sxx, sum(x*y) AS sxy FROM q)
             |SELECT CAST(k AS BIGINT) AS n_scales,
             |  CAST(round(1000.0*(k*sxy - sx*sy)/(k*sxx - sx*sx)) AS BIGINT)
             |    AS hurst_milli
             |FROM ols""".stripMargin)),

    // XmR individuals control chart — the Shewhart companion to
    // q_changepoint (which finds ONE level shift; this counts every
    // excursion past the 3σ-equivalent moving-range limits). Center
    // x̄, limits x̄ ± 2.66·MR̄, and the out-of-control test stays EXACT:
    // 2.66 = 133/50, so "x > UCL" is the integer comparison
    // 50·m·n·x > 50·m·S + 133·n·R — no float ever decides a violation.
    // One grouped daily sum, one lag pass on the calendar frame.
    QueryDef(
      "q_control_chart",
      (s, d) => {
        val day = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
        val mr = day.withColumn("r",
          abs(col("x") - lag("x", 1).over(Window.orderBy("dt"))))
        val tot = day.agg(count(lit(1)).as("n"), sum("x").as("s"))
        val rtot = mr.agg(count("r").as("m"), sum("r").as("rr"))
        val v = day.crossJoin(broadcast(tot)).crossJoin(broadcast(rtot))
          .agg(
            sum(expr("""CASE WHEN CAST(50 AS DECIMAL(38,0))*m*n*x
                       | > CAST(50 AS DECIMAL(38,0))*m*s + CAST(133 AS DECIMAL(38,0))*n*rr
                       | THEN 1 ELSE 0 END""".stripMargin)).as("n_above"),
            sum(expr("""CASE WHEN CAST(50 AS DECIMAL(38,0))*m*n*x
                       | < CAST(50 AS DECIMAL(38,0))*m*s - CAST(133 AS DECIMAL(38,0))*n*rr
                       | THEN 1 ELSE 0 END""".stripMargin)).as("n_below"))
        v.crossJoin(broadcast(tot)).crossJoin(broadcast(rtot))
          .select(col("n").as("n_days"),
            expr("CAST(s * 1000000 div n AS BIGINT)").as("center_micro"),
            expr("CAST(rr * 1000000 div m AS BIGINT)").as("mrbar_micro"),
            expr("""CAST((CAST(50 AS DECIMAL(38,0))*m*s + CAST(133 AS DECIMAL(38,0))*n*rr)
                   | * 1000000 div (CAST(50 AS DECIMAL(38,0))*m*n) AS BIGINT)"""
              .stripMargin).as("ucl_micro"),
            expr("""CAST((CAST(50 AS DECIMAL(38,0))*m*s - CAST(133 AS DECIMAL(38,0))*n*rr)
                   | * 1000000 div (CAST(50 AS DECIMAL(38,0))*m*n) AS BIGINT)"""
              .stripMargin).as("lcl_micro"),
            col("n_above").cast("long").as("n_above"),
            col("n_below").cast("long").as("n_below"),
            expr("CAST((n_above + n_below) * 1000000 div n AS BIGINT)")
              .as("ooc_share_micro"))
      },
      Some("""WITH day AS (SELECT o_orderdate AS dt,
             |      sum(CAST(round(o_totalprice*100) AS BIGINT)) AS x
             |    FROM orders GROUP BY 1),
             |mr AS (SELECT dt, x, abs(x - lag(x) OVER (ORDER BY dt)) AS r FROM day),
             |tot AS (SELECT count(*) AS n, sum(x) AS s FROM day),
             |rtot AS (SELECT count(r) AS m, sum(r) AS rr FROM mr),
             |v AS (SELECT
             |    sum(CASE WHEN CAST(50 AS HUGEINT)*m*n*x
             |        > CAST(50 AS HUGEINT)*m*s + CAST(133 AS HUGEINT)*n*rr
             |        THEN 1 ELSE 0 END) AS n_above,
             |    sum(CASE WHEN CAST(50 AS HUGEINT)*m*n*x
             |        < CAST(50 AS HUGEINT)*m*s - CAST(133 AS HUGEINT)*n*rr
             |        THEN 1 ELSE 0 END) AS n_below
             |  FROM day CROSS JOIN tot CROSS JOIN rtot)
             |SELECT CAST(n AS BIGINT) AS n_days,
             |  CAST(s * 1000000 // n AS BIGINT) AS center_micro,
             |  CAST(rr * 1000000 // m AS BIGINT) AS mrbar_micro,
             |  CAST((CAST(50 AS HUGEINT)*m*s + CAST(133 AS HUGEINT)*n*rr) * 1000000
             |    // (CAST(50 AS HUGEINT)*m*n) AS BIGINT) AS ucl_micro,
             |  CAST((CAST(50 AS HUGEINT)*m*s - CAST(133 AS HUGEINT)*n*rr) * 1000000
             |    // (CAST(50 AS HUGEINT)*m*n) AS BIGINT) AS lcl_micro,
             |  CAST(n_above AS BIGINT) AS n_above, CAST(n_below AS BIGINT) AS n_below,
             |  CAST((n_above + n_below) * 1000000 // n AS BIGINT) AS ooc_share_micro
             |FROM v CROSS JOIN tot CROSS JOIN rtot""".stripMargin)),

    // Dickey-Fuller unit-root test — is daily revenue a random walk
    // (unit root: shocks persist forever) or stationary (shocks decay)?
    // Regress Δx_t on x_{t−1}: β near 0 means random walk, β near −1
    // means white noise around a level. All regression moments are exact
    // 128-bit integers off one lag pass; only the final t-ratio is a
    // double, judged against the asymptotic 5 % constant-only critical
    // value −2.86. Completes the stationarity battery next to
    // q_runs_test (randomness), q_ljung_box (joint ACF), q_hurst
    // (long memory), q_mann_kendall (monotone trend).
    QueryDef(
      "q_dickey_fuller",
      (s, d) => {
        val day = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
        val p = day.select(
            lag("x", 1).over(Window.orderBy("dt")).as("u"),
            (col("x") - lag("x", 1).over(Window.orderBy("dt"))).as("v"))
          .where(col("u").isNotNull)
        val m = p.agg(count(lit(1)).as("n"), sum("u").as("su"), sum("v").as("sv"),
          sum(expr("CAST(u AS DECIMAL(38,0))*u")).as("suu"),
          sum(expr("CAST(u AS DECIMAL(38,0))*v")).as("suv"),
          sum(expr("CAST(v AS DECIMAL(38,0))*v")).as("svv"))
        m.select(col("n"),
            expr("""CAST(CAST(n AS DECIMAL(38,0))*suv - CAST(su AS DECIMAL(38,0))*sv AS DOUBLE)
                   | / CAST(CAST(n AS DECIMAL(38,0))*suu - CAST(su AS DECIMAL(38,0))*su AS DOUBLE)"""
              .stripMargin).as("beta"),
            expr("""CAST(CAST(n AS DECIMAL(38,0))*suu - CAST(su AS DECIMAL(38,0))*su AS DOUBLE)/n"""
              ).as("sxx"),
            expr("CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)*sv/n").as("syy"))
          .select(col("n").as("n_days"),
            expr("CAST(round(1e9*beta) AS BIGINT)").as("beta_nano"),
            expr("""CAST(round(1000.0*beta
                   | / sqrt(((syy - beta*beta*sxx)/(n - 2))/sxx)) AS BIGINT)"""
              .stripMargin).as("t_milli"),
            expr("""CAST(CASE WHEN beta
                   | / sqrt(((syy - beta*beta*sxx)/(n - 2))/sxx) < -2.86
                   | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin)
              .as("reject_unit_root"))
      },
      Some("""WITH day AS (SELECT o_orderdate AS dt,
             |      sum(CAST(round(o_totalprice*100) AS BIGINT)) AS x
             |    FROM orders GROUP BY 1),
             |p AS (SELECT lag(x) OVER (ORDER BY dt) AS u,
             |        x - lag(x) OVER (ORDER BY dt) AS v FROM day),
             |m AS (SELECT count(*) AS n, sum(u) AS su, sum(v) AS sv,
             |        sum(CAST(u AS HUGEINT)*u) AS suu, sum(CAST(u AS HUGEINT)*v) AS suv,
             |        sum(CAST(v AS HUGEINT)*v) AS svv
             |      FROM p WHERE u IS NOT NULL),
             |f AS (SELECT n,
             |    CAST(CAST(n AS HUGEINT)*suv - CAST(su AS HUGEINT)*sv AS DOUBLE)
             |      / CAST(CAST(n AS HUGEINT)*suu - CAST(su AS HUGEINT)*su AS DOUBLE) AS beta,
             |    CAST(CAST(n AS HUGEINT)*suu - CAST(su AS HUGEINT)*su AS DOUBLE)/n AS sxx,
             |    CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE)*sv/n AS syy
             |  FROM m),
             |t AS (SELECT n, beta, sxx, (syy - beta*beta*sxx) / (n - 2) AS mse FROM f)
             |SELECT CAST(n AS BIGINT) AS n_days,
             |  CAST(round(1e9*beta) AS BIGINT) AS beta_nano,
             |  CAST(round(1000.0*beta/sqrt(mse/sxx)) AS BIGINT) AS t_milli,
             |  CAST(CASE WHEN beta/sqrt(mse/sxx) < -2.86 THEN 1 ELSE 0 END AS BIGINT)
             |    AS reject_unit_root
             |FROM t""".stripMargin)),

    // expected steps to conversion — treat 'purchase' as the absorbing
    // state of the session Markov chain and report each transient
    // state's expected number of steps until absorption: the funnel
    // metric that says HOW FAR each state is from converting, not just
    // whether it does (q_markov_stationary's dual). t = (I−Q)⁻¹·1
    // computed as the 20-term Neumann series t ← 1 + Q·t in truncating
    // nano fixed point (the markov convention — per-edge integer div
    // each step, both engines bit-identical). The chain lives on the
    // |types|² matrix; the corpus-scaled work is ONE lead pass.
    QueryDef(
      "q_absorption_steps",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val tr = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type").as("a"))
          .withColumn("b", lead("a", 1).over(w))
          .where(col("b").isNotNull)
          .groupBy("a", "b").agg(count(lit(1)).as("c"))
        val rs = tr.groupBy("a").agg(sum("c").as("tot"))
        // bounded-domain iterative-loop convention (q_pagerank form): the
        // transient-transition frame persists once — its lineage is the
        // corpus-scaled lead-window scan, which all 20 uncut broadcast
        // rounds used to replay — no repartition, no cuts (the replay
        // left is over the persisted ≤|types|² frame)
        val q = Release.pinnedPersist(tr.join(rs, "a")
          .where(col("a") =!= "purchase" && col("b") =!= "purchase")
          .select(col("a"), col("b"),
            expr("CAST(CAST(c AS DECIMAL(38,0)) * 1000000000 div tot AS BIGINT)")
              .as("pn")))
        var t = q.select(col("a").as("st")).distinct()
          .withColumn("t", lit(1000000000L))
        for (_ <- 1 to 20) {
          t = q.join(t.select(col("st").as("b"), col("t").as("tb")), Seq("b"), "left")
            .na.fill(0L, Seq("tb"))
            .groupBy(col("a").as("st"))
            .agg((lit(1000000000L) +
              sum(expr("(CAST(pn AS DECIMAL(38,0)) * tb) div 1000000000")))
              .cast("long").as("t"))
        }
        t.select(col("st").as("event_type"), col("t").as("steps_nano"))
          .orderBy("event_type")
      },
      Some(absorptionOracle)),

    // split-conformal prediction interval — the distribution-free
    // coverage guarantee, end to end: fit the (deliberately crude)
    // per-nation mean predictor on the train folds, take q̂ = the
    // ⌈(n+1)·0.9⌉-th smallest absolute residual on the calibration fold
    // (exact integer rank over the distributed GlobalOrder — the index
    // is the integer ceil (9n+18) div 10, no float quantile), and
    // report achieved coverage on the held-out fold. Conformal's point
    // is that coverage ≈ 90 % HOLDS even for a bad model — the fixture
    // shows 89.6–90.4 %. Folds are md5-deterministic quarters.
    QueryDef(
      "q_conformal",
      (s, d) => {
        val o = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey").as("k"), col("c_nationkey").as("g"),
            round(col("o_totalprice") * 100).cast("long").as("y"),
            (conv(substring(md5(concat(lit("cf:"),
              col("o_orderkey").cast("string"))), 1, 12), 16, 10)
              .cast("long") % 4).as("fold"))
        val mu = o.where(col("fold") <= 1).groupBy("g")
          .agg(expr("sum(y) div count(1)").as("yhat"))
        val cal = o.join(broadcast(mu), "g").where(col("fold") === 2)
          .select(col("k"), abs(col("y") - col("yhat")).as("r"))
        val n = cal.agg(count(lit(1)).as("n"))
        val ranked = GlobalOrder.withGlobalRowNumber(cal,
          Seq(col("r").asc, col("k").asc), "rk")
        val qi = n.select(expr("(9*n + 18) div 10").as("rk"), col("n"))
        val qr = ranked.join(broadcast(qi), "rk")
          .select(col("r").as("qhat"), col("n"))
        o.join(broadcast(mu), "g").where(col("fold") === 3)
          .crossJoin(broadcast(qr))
          .agg(max("n").as("n_calib"), max("qhat").as("qhat_cents"),
            count(lit(1)).as("n_test"),
            sum(when(abs(col("y") - col("yhat")) <= col("qhat"), 1L)
              .otherwise(0L)).as("cov"))
          .select(col("n_calib"), col("qhat_cents"), col("n_test"),
            expr("CAST(cov * 1000000 div n_test AS BIGINT)").as("coverage_micro"),
            lit(900000L).as("target_micro"))
      },
      Some("""WITH o AS (SELECT o_orderkey AS k, c_nationkey AS g,
             |      CAST(round(o_totalprice*100) AS BIGINT) AS y,
             |      CAST(('0x' || substr(md5('cf:' || o_orderkey), 1, 12)) AS BIGINT) % 4
             |        AS fold
             |    FROM orders JOIN customer ON c_custkey = o_custkey),
             |mu AS (SELECT g, sum(y) // count(*) AS yhat FROM o WHERE fold <= 1 GROUP BY 1),
             |cal AS (SELECT k, abs(y - yhat) AS r FROM o JOIN mu USING (g) WHERE fold = 2),
             |n AS (SELECT count(*) AS n FROM cal),
             |qi AS (SELECT (9*(SELECT n FROM n) + 18) // 10 AS qidx),
             |qr AS (SELECT r FROM (SELECT r, row_number() OVER (ORDER BY r, k) AS rk FROM cal)
             |       WHERE rk = (SELECT qidx FROM qi)),
             |tst AS (SELECT count(*) AS m,
             |        sum(CASE WHEN abs(y - yhat) <= (SELECT r FROM qr) THEN 1 ELSE 0 END)
             |          AS cov
             |      FROM o JOIN mu USING (g) WHERE fold = 3)
             |SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_calib,
             |  CAST((SELECT r FROM qr) AS BIGINT) AS qhat_cents,
             |  CAST(m AS BIGINT) AS n_test,
             |  CAST(cov * 1000000 // m AS BIGINT) AS coverage_micro,
             |  CAST(900000 AS BIGINT) AS target_micro
             |FROM tst""".stripMargin)),

    // Cochran-Mantel-Haenszel stratified test — q_simpson_check detects
    // the aggregation reversal; CMH is the FIX: test the exposure→
    // outcome association (late-half order date → high priority) WITHIN
    // each nation stratum and pool. Per-stratum (a, E, V) are exact
    // rationals of integer margins, the pooled χ² (df = 1, no continuity
    // correction) is judged against the literal 3.841 critical value.
    // One grouped pass over the fact join; the stratum table is
    // ≤ |nations|. Honest null on TPC-H: priority ⊥ time.
    QueryDef(
      "q_cmh_test",
      (s, d) => {
        val o = Tables.orders(s, d)
          .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("g"),
            when(col("o_orderdate") >= lit("1998-06-01"), 1L).otherwise(0L).as("e"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L).as("y"))
        val st = o.groupBy("g")
          .agg(count(lit(1)).as("n"), sum("e").as("n1"),
            sum(lit(1L) - col("e")).as("n0"), sum("y").as("m1"),
            sum(lit(1L) - col("y")).as("m0"),
            sum(col("e") * col("y")).as("a"))
          .where(col("n") >= 2 && col("n1") > 0 && col("n0") > 0)
        st.agg(count(lit(1)).as("k"),
            sum(expr("CAST(a AS DOUBLE)")).as("sa"),
            sum(expr("CAST(n1 AS DOUBLE)*m1/n")).as("se"),
            sum(expr("CAST(n1 AS DOUBLE)*n0*m1*m0/(CAST(n AS DOUBLE)*n*(n-1))"))
              .as("sv"))
          .select(col("k").as("n_strata"),
            expr("CAST(round(1000.0*(sa - se)) AS BIGINT)").as("excess_milli"),
            expr("CAST(round(1000.0*(sa - se)*(sa - se)/sv) AS BIGINT)")
              .as("cmh_chi2_milli"),
            expr("""CAST(CASE WHEN (sa - se)*(sa - se)/sv > 3.841
                   | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("reject_indep"))
      },
      Some("""WITH o AS (SELECT c_nationkey AS g,
             |      CASE WHEN o_orderdate >= DATE '1998-06-01' THEN 1 ELSE 0 END AS e,
             |      CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS y
             |    FROM orders JOIN customer ON c_custkey = o_custkey),
             |st AS (SELECT g, count(*) AS n,
             |        sum(e) AS n1, sum(1 - e) AS n0,
             |        sum(y) AS m1, sum(1 - y) AS m0,
             |        sum(e * y) AS a
             |      FROM o GROUP BY 1
             |      HAVING count(*) >= 2 AND sum(e) > 0 AND sum(1-e) > 0),
             |acc AS (SELECT count(*) AS k,
             |    sum(CAST(a AS DOUBLE)) AS sa,
             |    sum(CAST(n1 AS DOUBLE)*m1/n) AS se,
             |    sum(CAST(n1 AS DOUBLE)*n0*m1*m0/(CAST(n AS DOUBLE)*n*(n-1))) AS sv
             |  FROM st)
             |SELECT CAST(k AS BIGINT) AS n_strata,
             |  CAST(round(1000.0*(sa - se)) AS BIGINT) AS excess_milli,
             |  CAST(round(1000.0*(sa - se)*(sa - se)/sv) AS BIGINT) AS cmh_chi2_milli,
             |  CAST(CASE WHEN (sa - se)*(sa - se)/sv > 3.841 THEN 1 ELSE 0 END AS BIGINT)
             |    AS reject_indep
             |FROM acc""".stripMargin)),

    // O'Brien-Fleming group-sequential monitor — the classical
    // fixed-schedule complement to q_msprt's always-valid inference:
    // four calendar looks at the md5-arm experiment, cumulative
    // two-proportion z per look, spending boundary c/√k with the
    // literal c = 4.333 (K = 4, α ≈ 0.05 two-sided). Early looks
    // demand near-miraculous evidence, the final look pays almost
    // full α — the reason real launch reviews use OBF. One grouped
    // pass per look over the bounded look×arm table.
    QueryDef(
      "q_obrien_fleming",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderdate").as("dt"),
            (conv(substring(md5(concat(lit("ab:"),
              col("o_orderkey").cast("string"))), 1, 12), 16, 10)
              .cast("long") % 2).as("arm"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L).as("y"))
        val lk = s.createDataFrame(Seq(
          (1L, "1996-09-01"), (2L, "1998-03-01"),
          (3L, "1999-09-01"), (4L, "2001-08-02")))
          .toDF("look", "cutoff")
          .select(col("look"), col("cutoff").cast("date").as("cutoff"))
        val cum = o.join(broadcast(lk), col("dt") < col("cutoff"))
          .groupBy("look")
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0, col("y")).otherwise(0L)).as("c0"),
            sum(when(col("arm") === 1, col("y")).otherwise(0L)).as("c1"))
        cum.select(col("look"), col("n0"), col("n1"),
            expr("""(CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0)
                   | / sqrt((CAST(c0 + c1 AS DOUBLE)/(n0 + n1))
                   |   * (1 - CAST(c0 + c1 AS DOUBLE)/(n0 + n1))
                   |   * (1.0/n0 + 1.0/n1))""".stripMargin).as("zz"))
          .select(col("look"), col("n0").as("n_control"), col("n1").as("n_treat"),
            expr("CAST(round(1000.0*zz) AS BIGINT)").as("z_milli"),
            expr("CAST(round(1000.0*4.333/sqrt(CAST(look AS DOUBLE))) AS BIGINT)")
              .as("boundary_milli"),
            expr("""CAST(CASE WHEN abs(zz) > 4.333/sqrt(CAST(look AS DOUBLE))
                   | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("crossed"))
          .orderBy("look")
      },
      Some("""WITH o AS (SELECT o_orderkey AS k, o_orderdate AS dt,
             |      CAST(('0x' || substr(md5('ab:' || o_orderkey), 1, 12)) AS BIGINT) % 2
             |        AS arm,
             |      CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS y
             |    FROM orders),
             |lk AS (SELECT * FROM (VALUES (1, DATE '1996-09-01'), (2, DATE '1998-03-01'),
             |        (3, DATE '1999-09-01'), (4, DATE '2001-08-02')) t(look, cutoff)),
             |cum AS (SELECT lk.look,
             |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
             |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS c0,
             |    sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS c1
             |  FROM o JOIN lk ON o.dt < lk.cutoff GROUP BY 1),
             |z AS (SELECT look, n0, n1,
             |    (CAST(c1 AS DOUBLE)/n1 - CAST(c0 AS DOUBLE)/n0)
             |      / sqrt((CAST(c0 + c1 AS DOUBLE)/(n0 + n1))
             |        * (1 - CAST(c0 + c1 AS DOUBLE)/(n0 + n1)) * (1.0/n0 + 1.0/n1)) AS zz
             |  FROM cum)
             |SELECT CAST(look AS BIGINT) AS look, CAST(n0 AS BIGINT) AS n_control,
             |  CAST(n1 AS BIGINT) AS n_treat,
             |  CAST(round(1000.0*zz) AS BIGINT) AS z_milli,
             |  CAST(round(1000.0*4.333/sqrt(CAST(look AS DOUBLE))) AS BIGINT)
             |    AS boundary_milli,
             |  CAST(CASE WHEN abs(zz) > 4.333/sqrt(CAST(look AS DOUBLE)) THEN 1 ELSE 0 END
             |    AS BIGINT) AS crossed
             |FROM z ORDER BY look""".stripMargin)),

    // Shapley channel attribution — the game-theoretic split that
    // first/last/position-touch heuristics approximate: value function
    // v(C) = same-day purchase share of (user, day) cells whose exact
    // channel mix is C over {view, click, signup}, Shapley weights
    // |C|!(2−|C|)!/3! applied as the exact integer {2, 1, 2}/6 kernel.
    // Everything after ONE user-day grouped pass lives on the ≤8-row
    // coalition table (three bit-flip self-joins). The (user, day)
    // grain is deliberate — user-lifetime coalitions are degenerate on
    // any fixture where every user eventually does everything. On iid
    // streams all marginals come out slightly negative (event-heavy
    // days dilute same-day purchase share) — the honest null.
    QueryDef(
      "q_shapley_attribution",
      (s, d) => {
        val u = Tables.events(s, d)
          .groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("hv"),
            max(when(col("event_type") === "click", 1L).otherwise(0L)).as("hc"),
            max(when(col("event_type") === "signup", 1L).otherwise(0L)).as("hs"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
        val v = u.groupBy("hv", "hc", "hs")
          .agg(count(lit(1)).as("n"), sum("conv").as("c"))
          .select(col("hv"), col("hc"), col("hs"),
            expr("CAST(CAST(c AS DECIMAL(38,0)) * 1000000 div n AS BIGINT)").as("vr"))
        def shapFor(name: String, bit: String, o1: String, o2: String) = {
          val base = v.where(col(bit) === 0)
          val plus = v.where(col(bit) === 1)
            .select(col(o1), col(o2), col("vr").as("vr2"))
          base.join(plus, Seq(o1, o2), "left").na.fill(0L, Seq("vr2"))
            .agg(sum(expr(s"""(CASE WHEN $o1 + $o2 = 0 THEN 2
                             | WHEN $o1 + $o2 = 1 THEN 1 ELSE 2 END)
                             | * (vr2 - vr)""".stripMargin)).as("num"))
            .select(lit(name).as("channel"),
              expr("CAST(round(CAST(num AS DOUBLE)/6.0/1000.0) AS BIGINT)")
                .as("shapley_milli"))
        }
        shapFor("view", "hv", "hc", "hs")
          .unionAll(shapFor("click", "hc", "hv", "hs"))
          .unionAll(shapFor("signup", "hs", "hv", "hc"))
          .orderBy("channel")
      },
      Some("""WITH u AS (SELECT user_id, CAST(ts AS DATE) AS day,
             |      max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
             |      max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
             |      max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS hs,
             |      max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
             |    FROM events GROUP BY 1, 2),
             |v AS (SELECT hv, hc, hs,
             |      CAST(sum(conv) AS HUGEINT) * 1000000 // count(*) AS vr
             |    FROM u GROUP BY 1, 2, 3),
             |g AS (SELECT hv, hc, hs, vr FROM v),
             |sh AS (
             |  SELECT 'view' AS channel,
             |    sum(CASE WHEN hv = 0 THEN
             |        (CASE WHEN hc + hs = 0 THEN 2 WHEN hc + hs = 1 THEN 1 ELSE 2 END)
             |        * (coalesce((SELECT vr FROM g x
             |            WHERE x.hv=1 AND x.hc=g.hc AND x.hs=g.hs), 0) - vr)
             |      ELSE 0 END) AS num
             |  FROM g
             |  UNION ALL
             |  SELECT 'click',
             |    sum(CASE WHEN hc = 0 THEN
             |        (CASE WHEN hv + hs = 0 THEN 2 WHEN hv + hs = 1 THEN 1 ELSE 2 END)
             |        * (coalesce((SELECT vr FROM g x
             |            WHERE x.hc=1 AND x.hv=g.hv AND x.hs=g.hs), 0) - vr)
             |      ELSE 0 END)
             |  FROM g
             |  UNION ALL
             |  SELECT 'signup',
             |    sum(CASE WHEN hs = 0 THEN
             |        (CASE WHEN hv + hc = 0 THEN 2 WHEN hv + hc = 1 THEN 1 ELSE 2 END)
             |        * (coalesce((SELECT vr FROM g x
             |            WHERE x.hs=1 AND x.hv=g.hv AND x.hc=g.hc), 0) - vr)
             |      ELSE 0 END)
             |  FROM g)
             |SELECT channel, CAST(round(CAST(num AS DOUBLE)/6.0/1000.0) AS BIGINT)
             |    AS shapley_milli
             |FROM sh ORDER BY channel""".stripMargin)),

    // Holm-Bonferroni step-down — the FWER companion to q_fdr_bh's FDR
    // step-up, on an independent screen (event type vs day-of-week
    // tercile, df = 2 closed-form survival): reject the sorted p-values
    // while p₍ᵣ₎ ≤ α/(m−r+1) and STOP at the first failure. Same
    // bounded |types|-row window machinery; the two procedures together
    // are the multiple-testing toolkit a metrics platform actually
    // ships. Honest null on the fixture: type ⊥ weekday.
    QueryDef(
      "q_holm_bonferroni",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_type"),
            when(dayofweek(col("ts")) <= 2, 0)
              .when(dayofweek(col("ts")) <= 5, 1).otherwise(2).as("per"))
        val o = e.groupBy("event_type", "per").agg(count(lit(1)).as("o"))
        val tm = o.groupBy("per").agg(sum("o").as("np"))
        val ty = o.groupBy("event_type").agg(sum("o").as("nt"))
        val n = o.agg(sum("o").as("n"))
        val cells = ty.crossJoin(broadcast(tm)).crossJoin(broadcast(n))
          .join(o, Seq("event_type", "per"), "left")
          .select(col("event_type"),
            coalesce(col("o"), lit(0L)).as("obs"),
            expr("CAST(nt AS DOUBLE) * np / n").as("exp_in"),
            expr("CAST(n - nt AS DOUBLE) * np / n").as("exp_out"),
            (col("np") - coalesce(col("o"), lit(0L))).as("obs_out"))
        val chi = cells.groupBy("event_type")
          .agg(expr("""CAST(round(1000000.0 * sum((obs-exp_in)*(obs-exp_in)/exp_in
                      |  + (obs_out-exp_out)*(obs_out-exp_out)/exp_out)) AS BIGINT)"""
            .stripMargin).as("chisq_micro"))
        val p = chi.select(col("event_type"), col("chisq_micro"),
          expr("CAST(round(1000000.0 * exp(-CAST(chisq_micro AS DOUBLE)/2000000.0)) AS BIGINT)")
            .as("p_micro"))
        // bounded |types|-row windows (q_fdr_bh convention, whitelisted)
        val wAll = Window.partitionBy()
        p.withColumn("r", row_number().over(
            Window.orderBy(col("p_micro"), col("event_type"))))
          .withColumn("m", count(lit(1)).over(wAll))
          .withColumn("kfail",
            min(when(col("p_micro") * (col("m") - col("r") + 1) > 50000, col("r")))
              .over(wAll))
          .select(col("event_type"), col("chisq_micro"), col("p_micro"),
            col("r").cast("long").as("rk"),
            expr("CAST(50000 div (m - r + 1) AS BIGINT)").as("thr_micro"),
            expr("""CAST(CASE WHEN kfail IS NULL OR r < kfail
                   | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("reject"))
          .orderBy("rk")
      },
      Some("""WITH e AS (SELECT event_type,
             |      CASE WHEN dayofweek(CAST(ts AS TIMESTAMP)) <= 1 THEN 0
             |           WHEN dayofweek(CAST(ts AS TIMESTAMP)) <= 4 THEN 1 ELSE 2 END AS per
             |    FROM events),
             |o AS (SELECT event_type, per, count(*) AS o FROM e GROUP BY 1,2),
             |tm AS (SELECT per, sum(o) AS np FROM o GROUP BY 1),
             |ty AS (SELECT event_type, sum(o) AS nt FROM o GROUP BY 1),
             |n AS (SELECT sum(o) AS n FROM o),
             |cells AS (SELECT t.event_type,
             |    coalesce(o.o, 0) AS obs,
             |    CAST(t.nt AS DOUBLE) * p.np / n.n AS exp_in,
             |    CAST(n.n - t.nt AS DOUBLE) * p.np / n.n AS exp_out,
             |    p.np - coalesce(o.o, 0) AS obs_out
             |  FROM ty t CROSS JOIN tm p CROSS JOIN n
             |  LEFT JOIN o ON o.event_type = t.event_type AND o.per = p.per),
             |chi AS (SELECT event_type,
             |    CAST(round(1000000.0 * sum((obs-exp_in)*(obs-exp_in)/exp_in
             |      + (obs_out-exp_out)*(obs_out-exp_out)/exp_out)) AS BIGINT) AS chisq_micro
             |  FROM cells GROUP BY 1),
             |p AS (SELECT event_type, chisq_micro,
             |    CAST(round(1000000.0 * exp(-CAST(chisq_micro AS DOUBLE)/2000000.0))
             |      AS BIGINT) AS p_micro FROM chi),
             |rk AS (SELECT *, row_number() OVER (ORDER BY p_micro, event_type) AS r,
             |        count(*) OVER () AS m FROM p),
             |hf AS (SELECT *,
             |        min(CASE WHEN p_micro * (m - r + 1) > 50000 THEN r ELSE NULL END)
             |          OVER () AS kfail
             |      FROM rk)
             |SELECT event_type, chisq_micro, p_micro, CAST(r AS BIGINT) AS rk,
             |  CAST(50000 // (m - r + 1) AS BIGINT) AS thr_micro,
             |  CAST(CASE WHEN kfail IS NULL OR r < kfail THEN 1 ELSE 0 END AS BIGINT)
             |    AS reject
             |FROM hf ORDER BY rk""".stripMargin)),

    // deterministic RANSAC line fit — robust trend through the daily
    // revenue series that outliers cannot drag: 32 md5-seeded candidate
    // day pairs (the repo's seedless-sampling convention), each scored
    // by its EXACT integer inlier count — the residual test cross-
    // multiplies through the slope denominator and the MR̄ tolerance's
    // m denominator, so no float ever decides membership. Best
    // candidate by inliers with index tiebreak. The consensus
    // complement to q_theilsen (median slope) and q_control_chart
    // (which flags the same outliers this fit ignores). The candidate ×
    // calendar score join is 32 × ≤ #days.
    QueryDef(
      "q_ransac_fit",
      (s, d) => {
        val day = Tables.orders(s, d)
          .groupBy(col("o_orderdate").as("dt"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
        val idx = day.select(
          (row_number().over(Window.orderBy("dt")) - 1).as("t"), col("x"))
        val nn = idx.agg(count(lit(1)).as("n"))
        val mr = day
          .select(abs(col("x") - lag("x", 1).over(Window.orderBy("dt"))).as("r"))
          .where(col("r").isNotNull)
          .agg(count(lit(1)).as("m"), sum("r").as("rr"))
        val cand = s.range(0, 32).toDF("j").crossJoin(broadcast(nn))
          .select(col("j"),
            (conv(substring(md5(concat(lit("ra:"), col("j").cast("string"),
              lit(":1"))), 1, 12), 16, 10).cast("long") % col("n")).as("i1"),
            (conv(substring(md5(concat(lit("ra:"), col("j").cast("string"),
              lit(":2"))), 1, 12), 16, 10).cast("long") % col("n")).as("i2"))
        val cl = cand
          .join(idx.select(col("t").as("i1"), col("x").as("x1")), "i1")
          .join(idx.select(col("t").as("i2"), col("x").as("x2")), "i2")
          .where(col("i1") =!= col("i2"))
          .select(col("j"), col("i1").as("t1"), col("x1"),
            col("i2").as("t2"), col("x2"))
        val fitj = cl.crossJoin(idx).crossJoin(broadcast(mr))
          .where(expr("""abs(CAST(m AS DECIMAL(38,0))*((x - x1)*(t2 - t1)
                        | - (x2 - x1)*(t - t1)))
                        | <= CAST(rr AS DECIMAL(38,0)) * abs(t2 - t1)"""
            .stripMargin))
          .groupBy("j").agg(count(lit(1)).as("inliers"))
        fitj.join(cl, "j")
          .orderBy(col("inliers").desc, col("j")).limit(1)
          .crossJoin(broadcast(nn))
          .select(col("n").as("n_days"), col("j").as("best_candidate"),
            col("inliers"),
            expr("CAST(inliers * 1000000 div n AS BIGINT)").as("inlier_share_micro"),
            expr("CAST(round(1000000.0*CAST(x2 - x1 AS DOUBLE)/(t2 - t1)) AS BIGINT)")
              .as("slope_micro"))
      },
      Some("""WITH day AS (SELECT o_orderdate AS dt,
             |      sum(CAST(round(o_totalprice*100) AS BIGINT)) AS x
             |    FROM orders GROUP BY 1),
             |idx AS (SELECT row_number() OVER (ORDER BY dt) - 1 AS t, x FROM day),
             |nn AS (SELECT count(*) AS n FROM idx),
             |mr AS (SELECT count(*) AS m, sum(r) AS rr FROM
             |        (SELECT abs(x - lag(x) OVER (ORDER BY dt)) AS r FROM day)
             |      WHERE r IS NOT NULL),
             |cand AS (SELECT j,
             |      CAST(('0x' || substr(md5('ra:' || j || ':1'), 1, 12)) AS BIGINT)
             |        % (SELECT n FROM nn) AS i1,
             |      CAST(('0x' || substr(md5('ra:' || j || ':2'), 1, 12)) AS BIGINT)
             |        % (SELECT n FROM nn) AS i2
             |    FROM (SELECT unnest(range(0, 32)) AS j)),
             |cl AS (SELECT j, a.t AS t1, a.x AS x1, b.t AS t2, b.x AS x2
             |      FROM cand JOIN idx a ON a.t = i1 JOIN idx b ON b.t = i2
             |      WHERE i1 <> i2),
             |fit AS (SELECT cl.j, count(*) AS inliers FROM cl JOIN idx ON TRUE
             |      CROSS JOIN mr
             |      WHERE abs(CAST(m AS HUGEINT)*((idx.x - cl.x1)*(cl.t2 - cl.t1)
             |              - (cl.x2 - cl.x1)*(idx.t - cl.t1)))
             |        <= CAST(rr AS HUGEINT) * abs(cl.t2 - cl.t1)
             |      GROUP BY 1),
             |best AS (SELECT f.j, f.inliers, cl.t1, cl.x1, cl.t2, cl.x2 FROM fit f
             |      JOIN cl ON cl.j = f.j
             |      ORDER BY f.inliers DESC, f.j LIMIT 1)
             |SELECT CAST((SELECT n FROM nn) AS BIGINT) AS n_days,
             |  CAST(j AS BIGINT) AS best_candidate, CAST(inliers AS BIGINT) AS inliers,
             |  CAST(inliers * 1000000 // (SELECT n FROM nn) AS BIGINT)
             |    AS inlier_share_micro,
             |  CAST(round(1000000.0*CAST(x2 - x1 AS DOUBLE)/(t2 - t1)) AS BIGINT)
             |    AS slope_micro
             |FROM best""".stripMargin)),

    // adjusted standardized residuals — q_fdr_bh and q_chisq say WHETHER
    // the type×tercile table deviates; this says WHICH CELL:
    // r = (O−E)/√(E(1−row/n)(1−col/n)), the Agresti-adjusted residual
    // that is asymptotically N(0,1) per cell, flagged at |r| > 1.96.
    // The drill-down a dashboard shows when the omnibus test fires.
    // One map-combined grouped count; everything after is margin
    // arithmetic on the |types|×3 cell table.
    QueryDef(
      "q_crosstab_residuals",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_type"),
            when(dayofmonth(col("ts")) <= 10, 0)
              .when(dayofmonth(col("ts")) <= 20, 1).otherwise(2).as("per"))
        val o = e.groupBy("event_type", "per").agg(count(lit(1)).as("o"))
        val tm = o.groupBy("per").agg(sum("o").as("np"))
        val ty = o.groupBy("event_type").agg(sum("o").as("nt"))
        val n = o.agg(sum("o").as("n"))
        ty.crossJoin(broadcast(tm)).crossJoin(broadcast(n))
          .join(o, Seq("event_type", "per"), "left")
          .select(col("event_type"), col("per").cast("long").as("per"),
            coalesce(col("o"), lit(0L)).as("obs"),
            expr("CAST(nt AS DOUBLE) * np / n").as("exp"),
            expr("CAST(nt AS DOUBLE) / n").as("rs"),
            expr("CAST(np AS DOUBLE) / n").as("cs"))
          .select(col("event_type"), col("per"), col("obs"),
            expr("CAST(round(1000.0*exp) AS BIGINT)").as("exp_milli"),
            expr("""CAST(round(1000.0*(obs - exp)/sqrt(exp*(1 - rs)*(1 - cs)))
                   | AS BIGINT)""".stripMargin).as("std_resid_milli"),
            expr("""CAST(CASE WHEN abs((obs - exp)/sqrt(exp*(1 - rs)*(1 - cs))) > 1.96
                   | THEN 1 ELSE 0 END AS BIGINT)""".stripMargin).as("flagged"))
          .orderBy("event_type", "per")
      },
      Some("""WITH e AS (SELECT event_type,
             |      CASE WHEN day(CAST(ts AS TIMESTAMP)) <= 10 THEN 0
             |           WHEN day(CAST(ts AS TIMESTAMP)) <= 20 THEN 1 ELSE 2 END AS per
             |    FROM events),
             |o AS (SELECT event_type, per, count(*) AS o FROM e GROUP BY 1, 2),
             |tm AS (SELECT per, sum(o) AS np FROM o GROUP BY 1),
             |ty AS (SELECT event_type, sum(o) AS nt FROM o GROUP BY 1),
             |n AS (SELECT sum(o) AS n FROM o),
             |cells AS (SELECT t.event_type, p.per,
             |    coalesce(o.o, 0) AS obs,
             |    CAST(t.nt AS DOUBLE) * p.np / n.n AS exp,
             |    CAST(t.nt AS DOUBLE) / n.n AS rs,
             |    CAST(p.np AS DOUBLE) / n.n AS cs
             |  FROM ty t CROSS JOIN tm p CROSS JOIN n
             |  LEFT JOIN o ON o.event_type = t.event_type AND o.per = p.per)
             |SELECT event_type, CAST(per AS BIGINT) AS per, CAST(obs AS BIGINT) AS obs,
             |  CAST(round(1000.0*exp) AS BIGINT) AS exp_milli,
             |  CAST(round(1000.0*(obs - exp)/sqrt(exp*(1 - rs)*(1 - cs))) AS BIGINT)
             |    AS std_resid_milli,
             |  CAST(CASE WHEN abs((obs - exp)/sqrt(exp*(1 - rs)*(1 - cs))) > 1.96
             |    THEN 1 ELSE 0 END AS BIGINT) AS flagged
             |FROM cells ORDER BY event_type, per""".stripMargin)),

    // economic order quantity per brand: EOQ = √(2·D·S/H) with demand D
    // from exact per-row-rounded quantities, ordering cost S fixed at
    // 5 000 cents, and holding cost H = 20% of the brand's average unit
    // revenue — the classic inventory lot-size that closes the loop
    // with q_safety_stock (when to reorder) and q_newsvendor (how much
    // under uncertainty): this is how much per order at steady state.
    // One lineitem aggregate + a broadcast part-dim join; the sqrt is
    // one IEEE expression over exact integer sums.
    QueryDef(
      "q_eoq",
      (s, d) => {
        val li = Tables.lineitem(s, d).groupBy("l_partkey")
          .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("dem"),
            sum(expr("CAST(round(l_extendedprice*100) AS BIGINT)")).as("rev"),
            count(lit(1)).as("n"))
        li.join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand").as("brand"))
          // demand/lines widen through DECIMAL(38,0) like rev_cents —
          // the registry-wide convention for brand-level re-sums, since
          // DuckDB's sum() promotes to HUGEINT while a plain Spark long
          // sum would wrap silently under ANSI-off (the wrap threshold
          // is astronomically far here, but convention beats a proof
          // obligation per query)
          .agg(sum(expr("CAST(dem AS DECIMAL(38,0))")).as("demand"),
            sum(expr("CAST(rev AS DECIMAL(38,0))")).as("rev_cents"),
            sum(expr("CAST(n AS DECIMAL(38,0))")).as("lines"))
          .select(col("brand"), col("demand").cast("long").as("demand"),
            col("lines").cast("long").as("n_lines"),
            expr("""CAST(round(sqrt(2.0 * demand * 500000 /
                   |  (0.2 * CAST(rev_cents AS DOUBLE) / demand))) AS BIGINT)"""
              .stripMargin).as("eoq_units"))
          .orderBy("brand")
      },
      Some("""WITH li AS (SELECT l_partkey, sum(CAST(round(l_quantity) AS BIGINT)) AS dem,
             |    sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS rev,
             |    count(*) AS n FROM lineitem GROUP BY 1),
             |b AS (SELECT p.p_brand AS brand, sum(li.dem) AS demand,
             |    sum(CAST(li.rev AS HUGEINT)) AS rev_cents, sum(li.n) AS lines
             |  FROM li JOIN part p ON p.p_partkey = li.l_partkey GROUP BY 1)
             |SELECT brand, CAST(demand AS BIGINT) AS demand, CAST(lines AS BIGINT) AS n_lines,
             |  CAST(round(sqrt(2.0 * demand * 500000 /
             |    (0.2 * CAST(rev_cents AS DOUBLE) / demand))) AS BIGINT) AS eoq_units
             |FROM b ORDER BY brand""".stripMargin)),

    // Wilson score interval (95%) for the value>250 rate per event type
    // — the binomial CI that stays inside [0,1] and behaves at k = 0
    // where the Wald interval collapses (the q_funnel_ci upgrade for
    // small-k segments). One conditional-count aggregate; both bounds
    // are single IEEE closed forms over the exact (k, n) integers with
    // z = 1.9599639845 and z² = 3.84145882069412 (= z², so the interval
    // is self-consistent) spelled as the same literals in both engines.
    QueryDef(
      "q_wilson_ci",
      (s, d) => Tables.events(s, d).where(col("value").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(when(col("value") > 250, 1)).as("k"))
        .select(col("event_type"), col("n").cast("long").as("n"),
          col("k").cast("long").as("k"),
          expr("""CAST(round(((CAST(k AS DOUBLE)/n + 3.84145882069412/(2*n))
                 |  / (1 + 3.84145882069412/n)
                 |  - 1.9599639845 * sqrt((CAST(k AS DOUBLE)/n)*(1 - CAST(k AS DOUBLE)/n)/n
                 |      + 3.84145882069412/(4.0*n*n)) / (1 + 3.84145882069412/n))
                 |  * 1000000) AS BIGINT)""".stripMargin).as("lo_micro"),
          expr("""CAST(round(((CAST(k AS DOUBLE)/n + 3.84145882069412/(2*n))
                 |  / (1 + 3.84145882069412/n)
                 |  + 1.9599639845 * sqrt((CAST(k AS DOUBLE)/n)*(1 - CAST(k AS DOUBLE)/n)/n
                 |      + 3.84145882069412/(4.0*n*n)) / (1 + 3.84145882069412/n))
                 |  * 1000000) AS BIGINT)""".stripMargin).as("hi_micro"))
        .orderBy("event_type"),
      Some("""WITH g AS (SELECT event_type, count(*) AS n,
             |    count(*) FILTER (WHERE value > 250) AS k
             |  FROM events WHERE value IS NOT NULL GROUP BY 1)
             |SELECT event_type, CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
             |  CAST(round(((CAST(k AS DOUBLE)/n + 3.84145882069412/(2*n))
             |    / (1 + 3.84145882069412/n)
             |    - 1.9599639845 * sqrt((CAST(k AS DOUBLE)/n)*(1 - CAST(k AS DOUBLE)/n)/n
             |        + 3.84145882069412/(4.0*n*n)) / (1 + 3.84145882069412/n)) * 1000000) AS BIGINT) AS lo_micro,
             |  CAST(round(((CAST(k AS DOUBLE)/n + 3.84145882069412/(2*n))
             |    / (1 + 3.84145882069412/n)
             |    + 1.9599639845 * sqrt((CAST(k AS DOUBLE)/n)*(1 - CAST(k AS DOUBLE)/n)/n
             |        + 3.84145882069412/(4.0*n*n)) / (1 + 3.84145882069412/n)) * 1000000) AS BIGINT) AS hi_micro
             |FROM g ORDER BY event_type""".stripMargin)),

    // inverse-propensity-weighted ATE of afternoon exposure (hour ≥ 12)
    // on event value, with day-of-week as the stratifying confounder —
    // the Horvitz-Thompson estimator beside q_propensity_strat's
    // stratified difference and q_cuped's variance reduction. The
    // propensity is the exact within-stratum rate t_b/n_b, so each
    // stratum's IPW term Σy·n_b/t_b is ONE micro-quantized expression
    // over exact integer cell sums (≤ 7×2 cells — no per-row weighting
    // pass exists at any scale), integer-summed across strata. The
    // day-of-week key only GROUPS rows (never output), so the engines'
    // different weekday numberings are irrelevant. Fixture exposure is
    // unconfounded, so naive ≈ IPW: the honest null.
    QueryDef(
      "q_ipw_ate",
      (s, d) => {
        val e = Tables.events(s, d).where(col("value").isNotNull)
          .select(expr("CAST(round(value*100) AS BIGINT)").as("y"),
            when(expr("hour(ts)") >= 12, 1L).otherwise(0L).as("t"),
            expr("dayofweek(ts)").as("x"))
        val cells = e.groupBy("x", "t")
          .agg(count(lit(1)).as("n"), sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"))
        val bins = cells.groupBy("x")
          .agg(sum("n").as("nb"),
            sum(when(col("t") === 1, col("n")).otherwise(0L)).as("tb"))
        val terms = cells.join(broadcast(bins), "x")
          .where((col("t") === 1 && col("tb") > 0) ||
            (col("t") === 0 && col("nb") > col("tb")))
          .select(expr("""CAST(round(CASE WHEN t = 1
                         |  THEN 10000.0 * sy * nb / tb
                         |  ELSE -10000.0 * sy * nb / (nb - tb) END) AS BIGINT)"""
            .stripMargin).as("term"))
        val tsum = terms.agg(sum("term").as("tsum"))
        e.agg(count(lit(1)).as("n"),
            sum(when(col("t") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("t") === 1, expr("CAST(y AS DECIMAL(38,0))"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("y1"),
            sum(when(col("t") === 0, expr("CAST(y AS DECIMAL(38,0))"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("y0"))
          .crossJoin(broadcast(tsum))
          .select(col("n").cast("long").as("n_obs"),
            expr("""CAST(round((CAST(y1 AS DOUBLE)/n1
                   |  - CAST(y0 AS DOUBLE)/(n - n1)) * 10000) AS BIGINT)"""
              .stripMargin).as("ate_naive_cmilli"),
            expr("CAST(tsum div n AS BIGINT)").as("ate_ipw_cmilli"))
      },
      Some("""WITH e AS (SELECT CAST(round(value*100) AS BIGINT) AS y,
             |    CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 12 THEN 1 ELSE 0 END AS t,
             |    dayofweek(CAST(ts AS TIMESTAMP)) AS x
             |  FROM events WHERE value IS NOT NULL),
             |cells AS (SELECT x, t, count(*) AS n, sum(CAST(y AS HUGEINT)) AS sy FROM e GROUP BY 1, 2),
             |bins AS (SELECT x, sum(n) AS nb, sum(CASE WHEN t = 1 THEN n ELSE 0 END) AS tb FROM cells GROUP BY 1),
             |terms AS (SELECT CAST(round(CASE WHEN c.t = 1
             |      THEN 10000.0 * c.sy * b.nb / b.tb
             |      ELSE -10000.0 * c.sy * b.nb / (b.nb - b.tb) END) AS BIGINT) AS term
             |  FROM cells c JOIN bins b ON b.x = c.x
             |  WHERE (c.t = 1 AND b.tb > 0) OR (c.t = 0 AND b.nb > b.tb)),
             |tot AS (SELECT count(*) AS n,
             |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n1,
             |    sum(CASE WHEN t = 1 THEN CAST(y AS HUGEINT) ELSE 0 END) AS y1,
             |    sum(CASE WHEN t = 0 THEN CAST(y AS HUGEINT) ELSE 0 END) AS y0 FROM e)
             |SELECT CAST(n AS BIGINT) AS n_obs,
             |  CAST(round((CAST(y1 AS DOUBLE)/n1 - CAST(y0 AS DOUBLE)/(n - n1)) * 10000) AS BIGINT)
             |    AS ate_naive_cmilli,
             |  CAST((SELECT sum(term) FROM terms) // n AS BIGINT) AS ate_ipw_cmilli
             |FROM tot""".stripMargin)),

    // bullwhip ratio: CV²(daily order arrivals) / CV²(daily shipped
    // quantity) — the demand-amplification diagnostic a supply chain is
    // monitored on (ratio > 1 ⇒ ordering amplifies demand noise
    // upstream; the fixture's order counts are SMOOTHER than quantity,
    // the honest < 1 reading). Two calendar-bounded daily aggregates
    // with exact 128-bit moments; the ratio is one IEEE closed form.
    // Completes the q_demand_cv / q_safety_stock / q_eoq inventory
    // suite with the inter-echelon view.
    QueryDef(
      "q_bullwhip",
      (s, d) => {
        val dem = Tables.lineitem(s, d)
          .groupBy(col("l_shipdate").cast("date").as("dt"))
          .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("q"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(q AS DECIMAL(38,0))")).as("s"),
            sum(expr("CAST(q AS DECIMAL(38,0))*q")).as("s2"))
        val ord = Tables.orders(s, d)
          .groupBy(col("o_orderdate").cast("date").as("dt"))
          .agg(count(lit(1)).as("q"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(q AS DECIMAL(38,0))")).as("s"),
            sum(expr("CAST(q AS DECIMAL(38,0))*q")).as("s2"))
        dem.select(col("n").as("nd"), col("s").as("sd_"), col("s2").as("sd2"))
          .crossJoin(broadcast(ord))
          .select(col("nd").cast("long").as("demand_days"),
            col("n").cast("long").as("order_days"),
            expr("""CAST(round((CAST(n AS DOUBLE)*s2 - CAST(s AS DOUBLE)*s)
                   |    / (CAST(s AS DOUBLE)*s)
                   |  / ((CAST(nd AS DOUBLE)*sd2 - CAST(sd_ AS DOUBLE)*sd_)
                   |    / (CAST(sd_ AS DOUBLE)*sd_)) * 1000) AS BIGINT)"""
              .stripMargin).as("bullwhip_milli"))
      },
      Some("""WITH dem AS (SELECT CAST(l_shipdate AS DATE) AS dt,
             |    sum(CAST(round(l_quantity) AS BIGINT)) AS q FROM lineitem GROUP BY 1),
             |orde AS (SELECT CAST(o_orderdate AS DATE) AS dt, count(*) AS q FROM orders GROUP BY 1),
             |md AS (SELECT count(*) AS n, sum(CAST(q AS HUGEINT)) AS s,
             |    sum(CAST(q AS HUGEINT)*q) AS s2 FROM dem),
             |mo AS (SELECT count(*) AS n, sum(CAST(q AS HUGEINT)) AS s,
             |    sum(CAST(q AS HUGEINT)*q) AS s2 FROM orde)
             |SELECT CAST(md.n AS BIGINT) AS demand_days, CAST(mo.n AS BIGINT) AS order_days,
             |  CAST(round((CAST(mo.n AS DOUBLE)*mo.s2 - CAST(mo.s AS DOUBLE)*mo.s)
             |      / (CAST(mo.s AS DOUBLE)*mo.s)
             |    / ((CAST(md.n AS DOUBLE)*md.s2 - CAST(md.s AS DOUBLE)*md.s)
             |      / (CAST(md.s AS DOUBLE)*md.s)) * 1000) AS BIGINT) AS bullwhip_milli
             |FROM md CROSS JOIN mo""".stripMargin)),

    // population stability index of the value distribution between the
    // January halves — THE industry drift gate for deployed-model
    // inputs (PSI < 0.1 stable, > 0.25 retrain). Ten fixed 50-unit bins
    // with +1 Laplace smoothing so one-sided bins contribute finite
    // mass; shares are exact integer micro, each bin's (q−p)·ln(q/p)
    // term is one mirrored IEEE expression micro-rounded per bin. The
    // per-bin view names WHERE the shift sits — the actionable readout
    // beside q_quantile_drift's envelope and q_ks_test's statistic.
    QueryDef(
      "q_psi",
      (s, d) => {
        val e = Tables.events(s, d).where(col("value").isNotNull)
          .select(expr("CAST(round(value*100) AS BIGINT)").as("c"),
            when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp_ntz"),
              0L).otherwise(1L).as("half"))
        val b = e.select(expr("least(c div 5000, 9)").as("bin"), col("half"))
          .groupBy("bin", "half").agg(count(lit(1)).as("n"))
        val grid = e.sparkSession.range(10).select(col("id").as("bin"))
        val cells = grid
          .join(b.where(col("half") === 0).select(col("bin"), col("n").as("n0")),
            Seq("bin"), "left")
          .join(b.where(col("half") === 1).select(col("bin"), col("n").as("n1")),
            Seq("bin"), "left")
          .select(col("bin"), (coalesce(col("n0"), lit(0L)) + 1L).as("ne"),
            (coalesce(col("n1"), lit(0L)) + 1L).as("na"))
        val den = b.agg(
          (sum(when(col("half") === 0, col("n")).otherwise(0L)) + 10L).as("de"),
          (sum(when(col("half") === 1, col("n")).otherwise(0L)) + 10L).as("da"))
        cells.crossJoin(broadcast(den))
          .select(col("bin").cast("long").as("bin"),
            expr("CAST((1000000 * ne) div de AS BIGINT)").as("expected_micro"),
            expr("CAST((1000000 * na) div da AS BIGINT)").as("actual_micro"),
            expr("""CAST(round(1000000.0 * (CAST(na AS DOUBLE)/da - CAST(ne AS DOUBLE)/de)
                   |  * ln((CAST(na AS DOUBLE)/da) / (CAST(ne AS DOUBLE)/de))) AS BIGINT)"""
              .stripMargin).as("psi_term_micro"))
          .orderBy("bin")
      },
      Some("""WITH e AS (SELECT CAST(round(value*100) AS BIGINT) AS c,
             |    CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END AS half
             |  FROM events WHERE value IS NOT NULL),
             |b AS (SELECT least(c // 5000, 9) AS bin, half, count(*) AS n FROM e GROUP BY 1, 2),
             |grid AS (SELECT unnest(range(0, 10)) AS bin),
             |cells AS (SELECT g.bin,
             |    coalesce(b0.n, 0) + 1 AS ne, coalesce(b1.n, 0) + 1 AS na
             |  FROM grid g
             |  LEFT JOIN b b0 ON b0.bin = g.bin AND b0.half = 0
             |  LEFT JOIN b b1 ON b1.bin = g.bin AND b1.half = 1),
             |den AS (SELECT sum(CASE WHEN half = 0 THEN n ELSE 0 END) + 10 AS de,
             |    sum(CASE WHEN half = 1 THEN n ELSE 0 END) + 10 AS da FROM b)
             |SELECT CAST(bin AS BIGINT) AS bin,
             |  CAST((1000000 * ne) // de AS BIGINT) AS expected_micro,
             |  CAST((1000000 * na) // da AS BIGINT) AS actual_micro,
             |  CAST(round(1000000.0 * (CAST(na AS DOUBLE)/da - CAST(ne AS DOUBLE)/de)
             |    * ln((CAST(na AS DOUBLE)/da) / (CAST(ne AS DOUBLE)/de))) AS BIGINT) AS psi_term_micro
             |FROM cells CROSS JOIN den ORDER BY bin""".stripMargin)),

    // pinball (quantile) loss eval of a P90 forecast — train the
    // per-type 90th-percentile threshold on the first January half as
    // an EXACT discrete order statistic (smallest value whose running
    // count reaches ⌈0.9·n⌉, computed on the type-PARTITIONED value
    // histogram — never an interpolated quantile whose last-ulp could
    // flip a cent), then score the second half with the asymmetric
    // pinball loss 0.9·(y−q)⁺ + 0.1·(q−y)⁺ in exact deci-cent integer
    // arithmetic. The eval loop every quantile forecaster (safety
    // stock, SLA sizing, demand P90) is accepted on.
    QueryDef(
      "q_pinball_eval",
      (s, d) => {
        val e = Tables.events(s, d).where(col("value").isNotNull)
          .select(col("event_type"),
            expr("CAST(round(value*100) AS BIGINT)").as("c"),
            when(col("ts") < lit("2024-01-16 00:00:00").cast("timestamp_ntz"),
              0L).otherwise(1L).as("half"))
        val h = e.where(col("half") === 0)
          .groupBy("event_type", "c").agg(count(lit(1)).as("n"))
        val cum = h.withColumn("cm",
          sum("n").over(Window.partitionBy("event_type").orderBy("c")
            .rowsBetween(Window.unboundedPreceding, 0)))
        val tt = h.groupBy("event_type").agg(sum("n").as("nt"))
        val q = cum.join(tt, "event_type")
          .where(expr("cm >= (9 * nt + 9) div 10"))
          .groupBy("event_type").agg(min("c").as("qhat"))
        e.where(col("half") === 1).join(q, "event_type")
          .groupBy("event_type")
          .agg(max("qhat").as("qhat_cents"), count(lit(1)).as("n_test"),
            sum(expr("CASE WHEN c >= qhat THEN 9 * (c - qhat) ELSE qhat - c END"))
              .as("ls"))
          .select(col("event_type"), col("qhat_cents"),
            col("n_test").cast("long").as("n_test"),
            expr("CAST(ls div (10 * n_test) AS BIGINT)").as("pinball_cents"))
          .orderBy("event_type")
      },
      Some("""WITH e AS (SELECT event_type, CAST(round(value*100) AS BIGINT) AS c,
             |    CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00' THEN 0 ELSE 1 END AS half
             |  FROM events WHERE value IS NOT NULL),
             |h AS (SELECT event_type, c, count(*) AS n FROM e WHERE half = 0 GROUP BY 1, 2),
             |cum AS (SELECT event_type, c,
             |    sum(n) OVER (PARTITION BY event_type ORDER BY c
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm FROM h),
             |tt AS (SELECT event_type, sum(n) AS nt FROM h GROUP BY 1),
             |q AS (SELECT c2.event_type, min(c2.c) AS qhat FROM cum c2 JOIN tt USING (event_type)
             |  WHERE c2.cm >= (9 * nt + 9) // 10 GROUP BY 1),
             |test AS (SELECT e.event_type, e.c, q.qhat FROM e JOIN q USING (event_type) WHERE half = 1),
             |loss AS (SELECT event_type, any_value(qhat) AS qhat_cents, count(*) AS n_test,
             |    sum(CASE WHEN c >= qhat THEN 9 * (c - qhat) ELSE qhat - c END) AS ls
             |  FROM test GROUP BY 1)
             |SELECT event_type, qhat_cents, CAST(n_test AS BIGINT) AS n_test,
             |  CAST(ls // (10 * n_test) AS BIGINT) AS pinball_cents
             |FROM loss ORDER BY event_type""".stripMargin)),

    // brand-switching matrix: consecutive-order brand transitions per
    // customer (order brand = the deterministic min lineitem brand),
    // top-15 off-diagonal flows with the per-source switch rate — the
    // loyalty/competition readout a category manager gets from the same
    // machinery q_event_transitions applies to event types. One
    // customer-partitioned lead window over the order timeline; brand
    // totals and rates are exact integers.
    QueryDef(
      "q_brand_switch",
      (s, d) => {
        // aggregate lineitem to its per-ORDER brand BEFORE touching
        // orders (r15 tail sweep): min(p_brand) by l_orderkey map-side-
        // combines 4:1 ahead of its one narrow shuffle, and the orders
        // join then attaches (c, dt) to order-sized rows — the old form
        // joined data-sized lineitem to orders first and re-shuffled
        // the full joined width on (c, o_orderkey, dt). Same result:
        // o_orderkey determines c and dt, so grouping by the order key
        // alone is the identical aggregation.
        val ob = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("p_partkey") === col("l_partkey"))
          .groupBy("l_orderkey").agg(min("p_brand").as("brand"))
          .join(Tables.orders(s, d)
            .select(col("o_custkey").as("c"), col("o_orderkey"),
              col("o_orderdate").cast("date").as("dt")),
            col("l_orderkey") === col("o_orderkey"))
        val seq = ob.select(col("c"), col("brand"),
          lead("brand", 1).over(Window.partitionBy("c")
            .orderBy(col("dt"), col("o_orderkey"))).as("nxt"))
        val tr = seq.where(col("nxt").isNotNull)
          .groupBy(col("brand").as("from_brand"), col("nxt").as("to_brand"))
          .agg(count(lit(1)).as("n"))
        val rs = tr.groupBy("from_brand").agg(sum("n").as("tot"))
        tr.join(rs, "from_brand")
          .where(col("from_brand") =!= col("to_brand"))
          .select(col("from_brand"), col("to_brand"),
            col("n").cast("long").as("n"),
            expr("CAST((1000000 * n) div tot AS BIGINT)").as("rate_micro"))
          .orderBy(col("n").desc, col("from_brand"), col("to_brand")).limit(15)
      },
      Some("""WITH ob AS (SELECT o.o_custkey AS c, o.o_orderkey, CAST(o.o_orderdate AS DATE) AS dt,
             |    min(p.p_brand) AS brand
             |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |  JOIN part p ON p.p_partkey = l.l_partkey
             |  GROUP BY 1, 2, 3),
             |seq AS (SELECT c, brand,
             |    lead(brand) OVER (PARTITION BY c ORDER BY dt, o_orderkey) AS nxt
             |  FROM ob),
             |tr AS (SELECT brand AS from_brand, nxt AS to_brand, count(*) AS n
             |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
             |rs AS (SELECT from_brand, sum(n) AS tot FROM tr GROUP BY 1)
             |SELECT t.from_brand, t.to_brand, CAST(t.n AS BIGINT) AS n,
             |  CAST((1000000 * t.n) // r.tot AS BIGINT) AS rate_micro
             |FROM tr t JOIN rs r USING (from_brand)
             |WHERE t.from_brand <> t.to_brand
             |ORDER BY n DESC, from_brand, to_brand LIMIT 15""".stripMargin)),

    // cross-price elasticity: regress Brand#2's daily log-quantity on
    // Brand#1's daily log average price (both nano-quantized per
    // calendar day before the exact moment sums — the q_hill_tail ln
    // convention). Positive β ⇒ substitutes, negative ⇒ complements;
    // the fixture's independent demand reads ≈ 0, the honest null. The
    // own-price q_price_elasticity's competitive companion.
    QueryDef(
      "q_cross_elasticity",
      (s, d) => {
        def daily(brand: String, out: String, isPrice: Boolean) = {
          val g = Tables.lineitem(s, d)
            .join(broadcast(Tables.part(s, d)
              .where(col("p_brand") === brand).select("p_partkey")),
              col("p_partkey") === col("l_partkey"))
            .groupBy(col("l_shipdate").cast("date").as("dt"))
          if (isPrice)
            g.agg(expr("""CAST(round(1000000000.0 *
                         |  ln(sum(CAST(round(l_extendedprice*100) AS BIGINT))
                         |    / CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)))
                         |AS BIGINT)""".stripMargin).as(out))
          else
            g.agg(expr("""CAST(round(1000000000.0 *
                         |  ln(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)))
                         |AS BIGINT)""".stripMargin).as(out))
        }
        daily("Brand#1", "x", isPrice = true)
          .join(daily("Brand#2", "y", isPrice = false), "dt")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
            sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
            sum(expr("CAST(x AS DECIMAL(38,0))*x")).as("sxx"),
            sum(expr("CAST(x AS DECIMAL(38,0))*y")).as("sxy"))
          .select(col("n").cast("long").as("n_days"),
            expr("""CAST(round(1000.0 * (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
                   |  / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)) AS BIGINT)"""
              .stripMargin).as("cross_elasticity_milli"))
      },
      Some("""WITH da AS (SELECT CAST(l.l_shipdate AS DATE) AS dt,
             |    CAST(round(1000000000.0 * ln(sum(CAST(round(l.l_extendedprice*100) AS BIGINT))
             |      / CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS DOUBLE))) AS BIGINT) AS x
             |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |  WHERE p.p_brand = 'Brand#1' GROUP BY 1),
             |db AS (SELECT CAST(l.l_shipdate AS DATE) AS dt,
             |    CAST(round(1000000000.0 * ln(CAST(sum(CAST(round(l.l_quantity) AS BIGINT)) AS DOUBLE))) AS BIGINT) AS y
             |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |  WHERE p.p_brand = 'Brand#2' GROUP BY 1),
             |j AS (SELECT x, y FROM da JOIN db USING (dt)),
             |m AS (SELECT count(*) AS n, sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x AS HUGEINT)*x) AS sxx, sum(CAST(x AS HUGEINT)*y) AS sxy FROM j)
             |SELECT CAST(n AS BIGINT) AS n_days,
             |  CAST(round(1000.0 * (CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)
             |    / (CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)) AS BIGINT) AS cross_elasticity_milli
             |FROM m""".stripMargin)),

    // chain-ladder development factors: cumulative shipped revenue by
    // (order-month cohort × months-to-ship development age), with the
    // all-cohort volume-weighted age-to-age factor fⱼ = ΣC_{i,j+1}/ΣC_{i,j}
    // — the actuarial run-off projection, here reading "how much of an
    // order month's revenue has shipped by age j" (the reserving view
    // of q_ship_lag's distribution). One grouped pass builds the
    // triangle; the cumulative rides a cohort-PARTITIONED window over
    // the ≤5-value development domain; factors are exact 128-bit
    // integer ratios. Scope note (mirrored in the oracle, so never a
    // divergence): ages pair via an exact dev = dev+1 join, so a cohort
    // MISSING an intermediate age contributes nothing to the factors
    // around the gap rather than carrying its cumulative forward as a
    // fully-densified actuarial triangle would; the TPC-H ship lags are
    // dense over ages 0..4 by construction (q_ship_lag pins that), and
    // a sparse-cohort corpus would want a 5-row-per-cohort grid join +
    // last-value carry-forward BEFORE this factor join.
    QueryDef(
      "q_chain_ladder",
      (s, d) => {
        val c = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("od"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_shipdate").cast("date").as("sd"),
              expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("v")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(date_trunc("month", col("od")).cast("date").as("cohort"),
            expr("""CAST((year(sd) - year(od)) * 12
                   |  + month(sd) - month(od) AS BIGINT)""".stripMargin).as("dev"))
          .agg(sum("v").as("v"))
        val cum = c.where(col("dev") >= 0 && col("dev") <= 4)
          .withColumn("cv", sum("v").over(
            Window.partitionBy("cohort").orderBy("dev")
              .rowsBetween(Window.unboundedPreceding, 0)))
        val a = cum.select(col("cohort"), col("dev").as("age"), col("cv"))
        val b = cum.select(col("cohort"), (col("dev") - 1).as("age"),
          col("cv").as("nv"))
        a.join(b, Seq("cohort", "age"))
          .groupBy("age")
          .agg(sum(expr("CAST(nv AS DECIMAL(38,0))")).as("nxt"),
            sum(expr("CAST(cv AS DECIMAL(38,0))")).as("cur"))
          .select(col("age").cast("long").as("age_months"),
            col("cur").cast("long").as("cum_cents"),
            expr("CAST((1000000 * nxt) div cur AS BIGINT)").as("dev_factor_micro"))
          .orderBy("age_months")
      },
      Some("""WITH c AS (SELECT CAST(date_trunc('month', CAST(o.o_orderdate AS DATE)) AS DATE) AS cohort,
             |    CAST((year(CAST(l.l_shipdate AS DATE)) - year(CAST(o.o_orderdate AS DATE))) * 12
             |      + month(CAST(l.l_shipdate AS DATE)) - month(CAST(o.o_orderdate AS DATE)) AS BIGINT) AS dev,
             |    sum(CAST(round(l.l_extendedprice*100) AS BIGINT)) AS v
             |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |  GROUP BY 1, 2),
             |cum AS (SELECT cohort, dev,
             |    sum(v) OVER (PARTITION BY cohort ORDER BY dev
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
             |  FROM c WHERE dev >= 0 AND dev <= 4),
             |pairs AS (SELECT a.dev AS age, sum(CAST(b.cv AS HUGEINT)) AS nxt,
             |    sum(CAST(a.cv AS HUGEINT)) AS cur
             |  FROM cum a JOIN cum b ON b.cohort = a.cohort AND b.dev = a.dev + 1
             |  GROUP BY 1)
             |SELECT CAST(age AS BIGINT) AS age_months,
             |  CAST(cur AS BIGINT) AS cum_cents,
             |  CAST((1000000 * nxt) // cur AS BIGINT) AS dev_factor_micro
             |FROM pairs ORDER BY age""".stripMargin)),

    // Gini coefficient of customer revenue concentration — the single
    // inequality number behind q_volume_concentration's curve and the
    // q_theil_index / q_source_gini siblings' CUSTOMER-revenue view:
    // G = (2·Σᵢ i·xᵢ)/(n·Σx) − (n+1)/n over revenue ranked ascending.
    // Customers are data-sized, so the rank rides GlobalOrder's range
    // shuffle (never a partitionless window); the rank-weighted sum is
    // one map-combined aggregate over the ranked frame; products widen
    // through DECIMAL(38,0) (rank·cents passes 2⁶³ at warehouse scale).
    // Ascending ties break on custkey — mirrored, so exact.
    QueryDef(
      "q_gini_customer",
      (s, d) => {
        val cr = Tables.orders(s, d)
          .select(col("o_custkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy("o_custkey").agg(sum("cents").as("cents"))
        val ord = Seq(col("cents").asc, col("o_custkey").asc)
        GlobalOrder.withGlobalRowNumber(cr, ord, "i")
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(cents AS DECIMAL(38,0))")).as("sx"),
            sum(expr("CAST(i AS DECIMAL(38,0)) * cents")).as("six"))
          .select(col("n").cast("long").as("n_customers"),
            col("sx").cast("long").as("total_cents"),
            expr("""CAST((2000000 * six) div (n * sx)
                   |  - (1000000 * (n + 1)) div n AS BIGINT)""".stripMargin)
              .as("gini_micro"))
      },
      Some("""WITH cr AS (SELECT o_custkey,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
             |  FROM orders GROUP BY 1),
             |r AS (SELECT cents,
             |    CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
             |  FROM cr),
             |a AS (SELECT count(*) AS n, sum(CAST(cents AS HUGEINT)) AS sx,
             |    sum(CAST(i AS HUGEINT) * cents) AS six FROM r)
             |SELECT CAST(n AS BIGINT) AS n_customers,
             |  CAST(sx AS BIGINT) AS total_cents,
             |  CAST((2000000 * six) // (n * sx)
             |    - (1000000 * (n + 1)) // n AS BIGINT) AS gini_micro
             |FROM a""".stripMargin)),

    // Croston's intermittent-demand estimate per brand — the forecast
    // form for SKUs that sell in occasional lumps, where a plain moving
    // average smears zeros into the level: demand rate = (mean nonzero
    // monthly demand) / (mean inter-demand interval in months), both
    // read off the brand's ACTIVE months against its observed calendar
    // span. This is the closed-form rate (Croston's ratio z̄/p̄), not
    // the order-dependent SES recursion — the distributed-friendly
    // form. One lineitem aggregate to monthly grain, a broadcast
    // part-dim join, and a ≤ |brands|-row readout; rates are exact
    // integer milli over exact unit sums.
    QueryDef(
      "q_croston",
      (s, d) => {
        val bm = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("p_partkey") === col("l_partkey"))
          .groupBy(col("p_brand").as("brand"),
            date_trunc("month", col("l_shipdate")).as("m"))
          .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("dem"))
        val cal = bm.agg(countDistinct("m").as("months"))
        bm.groupBy("brand")
          .agg(count(lit(1)).as("active_months"),
            sum(expr("CAST(dem AS DECIMAL(38,0))")).as("units"))
          .crossJoin(broadcast(cal))
          .select(col("brand"),
            col("active_months").cast("long").as("active_months"),
            col("months").cast("long").as("span_months"),
            col("units").cast("long").as("units"),
            // z̄ = units/active, p̄ = span/active ⇒ rate = units/span
            // kept as the two Croston components plus the rate
            expr("CAST((1000 * units) div active_months AS BIGINT)")
              .as("mean_demand_milli"),
            expr("CAST((1000 * months) div active_months AS BIGINT)")
              .as("mean_interval_milli"),
            expr("CAST((1000 * units) div months AS BIGINT)")
              .as("rate_milli"))
          .orderBy("brand")
      },
      Some("""WITH bm AS (SELECT p.p_brand AS brand,
             |    date_trunc('month', CAST(l.l_shipdate AS TIMESTAMP)) AS m,
             |    sum(CAST(round(l.l_quantity) AS BIGINT)) AS dem
             |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |  GROUP BY 1, 2),
             |cal AS (SELECT count(DISTINCT m) AS months FROM bm),
             |b AS (SELECT brand, count(*) AS active_months,
             |    sum(CAST(dem AS HUGEINT)) AS units FROM bm GROUP BY 1)
             |SELECT brand, CAST(active_months AS BIGINT) AS active_months,
             |  CAST(months AS BIGINT) AS span_months,
             |  CAST(units AS BIGINT) AS units,
             |  CAST((1000 * units) // active_months AS BIGINT) AS mean_demand_milli,
             |  CAST((1000 * months) // active_months AS BIGINT) AS mean_interval_milli,
             |  CAST((1000 * units) // months AS BIGINT) AS rate_milli
             |FROM b CROSS JOIN cal ORDER BY brand""".stripMargin)),

    // Atkinson inequality index (ε = 1) of customer revenue — the
    // welfare-theoretic complement to q_gini_customer: A = 1 −
    // geomean(x)/mean(x), which unlike Gini is decomposable and weights
    // the LOW end of the distribution (ε picks the aversion; ε = 1 is
    // the log form). The geometric mean rides Σln x with each
    // customer's ln(cents) nano-quantized BEFORE the sum (house rule);
    // the index is one mirrored IEEE closed form over the two exact
    // sums. One grouped aggregate + one global aggregate — no windows,
    // no joins. Revenue cents ≥ 100 by fixture construction, so ln
    // never sees 0.
    QueryDef(
      "q_atkinson",
      (s, d) => {
        Tables.orders(s, d)
          .select(col("o_custkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy("o_custkey").agg(sum("cents").as("cents"))
          .agg(count(lit(1)).as("n"),
            sum(expr("CAST(cents AS DECIMAL(38,0))")).as("sx"),
            sum(expr("CAST(round(1e9 * ln(CAST(cents AS DOUBLE))) AS BIGINT)"))
              .as("sl"))
          .select(col("n").cast("long").as("n_customers"),
            expr("CAST(sx div n AS BIGINT)").as("mean_cents"),
            expr("""CAST(round(1000000 * (1 - exp(sl/1e9/n)
                   |  / (CAST(sx AS DOUBLE)/n))) AS BIGINT)""".stripMargin)
              .as("atkinson_micro"))
      },
      Some("""WITH cr AS (SELECT o_custkey,
             |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
             |  FROM orders GROUP BY 1),
             |a AS (SELECT count(*) AS n, sum(CAST(cents AS HUGEINT)) AS sx,
             |    sum(CAST(round(1e9 * ln(CAST(cents AS DOUBLE))) AS BIGINT)) AS sl
             |  FROM cr)
             |SELECT CAST(n AS BIGINT) AS n_customers,
             |  CAST(sx // n AS BIGINT) AS mean_cents,
             |  CAST(round(1000000 * (1 - exp(sl/1e9/n)
             |    / (CAST(sx AS DOUBLE)/n))) AS BIGINT) AS atkinson_micro
             |FROM a""".stripMargin)),

    // half-life time-decay popularity per part — the feature-store
    // scoring every "trending items" surface runs: each sale's weight
    // halves per 30 days of age, anchored at the corpus max ship date
    // (reproducible — wall-clock NOW would make the score unstable).
    // The decay is the EXACT integer 10⁶ ≫ (age div 30) — a bit shift,
    // not exp(−age/τ): a smooth exponential's last nano digit rides
    // each engine's libm (Spark and DuckDB exp() disagree by 1 ulp on
    // real inputs — measured: one boundary age flipped the sf0.01
    // hash), while the stepped half-life is engine-free arithmetic
    // with the same decay law. Per-row terms are exact micro integers
    // summed exactly; the anchor rides a broadcast 1-row frame. Top-15
    // with the raw sale count alongside — the pair shows WHERE decay
    // reorders raw popularity.
    QueryDef(
      "q_decay_popularity",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_partkey"),
          datediff(col("l_shipdate").cast("date"),
            lit("1970-01-01").cast("date")).cast("long").as("t"))
        val anchor = li.agg(max("t").as("t0"))
        li.crossJoin(broadcast(anchor))
          .select(col("l_partkey"),
            // underflow-to-0 past ~20 half-lives is SAFE here (unlike
            // q_time_decay_attribution's clamped weights): the weight is
            // SUMMED, never a divisor — decay-to-zero is the intended law
            expr("""1000000 div shiftleft(CAST(1 AS BIGINT),
                   |  CAST(least((t0 - t) div 30, 62) AS INT))""".stripMargin)
              .as("s"))
          .groupBy("l_partkey")
          .agg(count(lit(1)).as("n_sales"), sum("s").as("score"))
          .select(col("l_partkey").cast("long").as("part_id"),
            col("n_sales").cast("long").as("n_sales"),
            col("score").cast("long").as("decay_score_micro"))
          .orderBy(col("decay_score_micro").desc, col("part_id")).limit(15)
      },
      Some("""WITH li AS (SELECT l_partkey,
             |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t
             |  FROM lineitem),
             |a AS (SELECT max(t) AS t0 FROM li),
             |sc AS (SELECT l_partkey,
             |    1000000 // (CAST(1 AS BIGINT) << least((t0 - t) // 30, 62)) AS s
             |  FROM li CROSS JOIN a)
             |SELECT CAST(l_partkey AS BIGINT) AS part_id,
             |  count(*) AS n_sales,
             |  CAST(sum(s) AS BIGINT) AS decay_score_micro
             |FROM sc GROUP BY 1
             |ORDER BY decay_score_micro DESC, part_id LIMIT 15""".stripMargin)),

    // UCB1 bandit scores over the event types as arms (reward = the
    // value > 250 conversion indicator, the bounded-[0,1] reward UCB1's
    // regret bound assumes) — the exploration-bonus ranking a
    // batch-updated bandit serves from: ucb = x̄ⱼ + √(2·ln N / nⱼ).
    // This is the SCORING step of the bandit loop (the arm-pull side is
    // a serving-time concern, not a batch query); the analytics
    // pipeline's job is to recompute these scores per batch. One
    // conditional-count pass, the total a broadcast 1-row frame, one
    // mirrored IEEE form per arm over exact (k, n) integers. On the
    // type-independent fixture all means tie ⇒ the bonus term alone
    // ranks arms by inverse pull count: the honest cold-start read.
    QueryDef(
      "q_ucb1",
      (s, d) => {
        val arms = Tables.events(s, d).where(col("value").isNotNull)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            count(when(col("value") > 250, 1)).as("k"))
        val tot = arms.agg(sum("n").as("nn"))
        arms.crossJoin(broadcast(tot))
          .select(col("event_type").as("arm"),
            col("n").cast("long").as("pulls"),
            col("k").cast("long").as("successes"),
            expr("CAST((1000 * k) div n AS BIGINT)").as("mean_milli"),
            expr("""CAST(round(1000 * (CAST(k AS DOUBLE)/n
                   |  + sqrt(2 * ln(CAST(nn AS DOUBLE)) / n))) AS BIGINT)"""
              .stripMargin).as("ucb_milli"))
          .orderBy(col("ucb_milli").desc, col("arm"))
      },
      Some("""WITH arms AS (SELECT event_type, count(*) AS n,
             |    count(*) FILTER (WHERE value > 250) AS k
             |  FROM events WHERE value IS NOT NULL GROUP BY 1),
             |t AS (SELECT sum(n) AS nn FROM arms)
             |SELECT event_type AS arm, CAST(n AS BIGINT) AS pulls,
             |  CAST(k AS BIGINT) AS successes,
             |  CAST((1000 * k) // n AS BIGINT) AS mean_milli,
             |  CAST(round(1000 * (CAST(k AS DOUBLE)/n
             |    + sqrt(2 * ln(CAST(nn AS DOUBLE)) / n))) AS BIGINT) AS ucb_milli
             |FROM arms CROSS JOIN t
             |ORDER BY ucb_milli DESC, arm""".stripMargin)),

    // BCG growth-share matrix per brand — split the shipping calendar
    // at its midpoint date (deterministic, from min/max ship epochs),
    // score each brand's recent-half revenue share against its
    // half-over-half growth, and place it in the classic quadrant
    // (star / cash_cow / question_mark / dog) using the natural
    // thresholds: share above the uniform 1/|brands| line, growth above
    // 1.0. The portfolio readout that q_market_share_trend's monthly
    // series feeds in practice, here as one self-contained exact-cents
    // aggregate: one lineitem pass splits the halves conditionally, the
    // part dim broadcasts, totals ride 1-row broadcasts.
    QueryDef(
      "q_bcg_matrix",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
            col("p_partkey") === col("l_partkey"))
          .select(col("p_brand").as("brand"),
            datediff(col("l_shipdate").cast("date"),
              lit("1970-01-01").cast("date")).cast("long").as("t"),
            expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)")
              .as("cents"))
        val span = li.agg(min("t").as("t0"), max("t").as("t1"))
        val b = li.crossJoin(broadcast(span))
          .groupBy("brand")
          .agg(sum(when(expr("t * 2 >= t0 + t1"),
              expr("CAST(cents AS DECIMAL(38,0))")).otherwise(lit(0))).as("r2"),
            sum(when(expr("t * 2 < t0 + t1"),
              expr("CAST(cents AS DECIMAL(38,0))")).otherwise(lit(0))).as("r1"))
        val tot = b.agg(sum("r2").as("tr2"), count(lit(1)).as("nb"))
        b.crossJoin(broadcast(tot))
          .select(col("brand"),
            expr("CAST(r2 AS BIGINT)").as("recent_cents"),
            expr("CAST((1000000 * r2) div tr2 AS BIGINT)").as("share_micro"),
            expr("CAST((1000 * r2) div greatest(r1, 1) AS BIGINT)").as("growth_milli"),
            expr("""CASE
                   |  WHEN (1000000 * r2) div tr2 >= 1000000 div nb
                   |   AND (1000 * r2) div greatest(r1, 1) >= 1000 THEN 'star'
                   |  WHEN (1000000 * r2) div tr2 >= 1000000 div nb THEN 'cash_cow'
                   |  WHEN (1000 * r2) div greatest(r1, 1) >= 1000 THEN 'question_mark'
                   |  ELSE 'dog' END""".stripMargin).as("quadrant"))
          .orderBy("brand")
      },
      Some("""WITH li AS (SELECT p.p_brand AS brand,
             |    CAST(CAST(l.l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
             |    CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT) AS cents
             |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
             |sp AS (SELECT min(t) AS t0, max(t) AS t1 FROM li),
             |b AS (SELECT brand,
             |    sum(CASE WHEN t * 2 >= t0 + t1 THEN CAST(cents AS HUGEINT) ELSE 0 END) AS r2,
             |    sum(CASE WHEN t * 2 < t0 + t1 THEN CAST(cents AS HUGEINT) ELSE 0 END) AS r1
             |  FROM li CROSS JOIN sp GROUP BY 1),
             |t AS (SELECT sum(r2) AS tr2, count(*) AS nb FROM b)
             |SELECT brand, CAST(r2 AS BIGINT) AS recent_cents,
             |  CAST((1000000 * r2) // tr2 AS BIGINT) AS share_micro,
             |  CAST((1000 * r2) // greatest(r1, 1) AS BIGINT) AS growth_milli,
             |  CASE
             |    WHEN (1000000 * r2) // tr2 >= 1000000 // nb
             |     AND (1000 * r2) // greatest(r1, 1) >= 1000 THEN 'star'
             |    WHEN (1000000 * r2) // tr2 >= 1000000 // nb THEN 'cash_cow'
             |    WHEN (1000 * r2) // greatest(r1, 1) >= 1000 THEN 'question_mark'
             |    ELSE 'dog' END AS quadrant
             |FROM b CROSS JOIN t ORDER BY brand""".stripMargin)),

    // CDC changelog compaction — the Debezium-stream kernel beyond
    // q_upsert_latest's latest-wins merge: a keyed op stream where
    // DELETES are first-class (error events tombstone the user, value
    // events upsert), compacted to the net final state per key — last
    // op by (ts, event_id) wins, a winning tombstone removes the key.
    // One user-partitioned rank window (never global) + one aggregate;
    // the live-state checksum is an exact DECIMAL(38,0) cents sum. The
    // batch form of what the streaming IncrementalUpsert applies per
    // micro-batch; at 100 TB this compaction IS how a changelog table
    // becomes a snapshot.
    QueryDef(
      "q_cdc_compact",
      (s, d) => {
        val log = Tables.events(s, d).where(col("value").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type") === "error", lit("d")).otherwise(lit("u"))
              .as("op"),
            expr("CAST(round(value*100) AS BIGINT)").as("cents"))
        val last = log.withColumn("rn",
            row_number().over(Window.partitionBy("user_id")
              .orderBy(col("ts").desc, col("event_id").desc)))
          .where(col("rn") === 1)
        last.agg(count(lit(1)).as("n_keys"),
            sum(when(col("op") === "d", 1L).otherwise(0L)).as("n_tombstoned"),
            sum(when(col("op") === "u", 1L).otherwise(0L)).as("n_live"),
            sum(when(col("op") === "u",
              expr("CAST(cents AS DECIMAL(38,0))")).otherwise(lit(0)))
              .as("live_cents"))
          .select(col("n_keys").cast("long").as("n_keys"),
            col("n_tombstoned").cast("long").as("n_tombstoned"),
            col("n_live").cast("long").as("n_live"),
            col("live_cents").cast("long").as("live_cents"))
      },
      Some("""WITH log AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             |    CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op,
             |    CAST(round(value*100) AS BIGINT) AS cents
             |  FROM events WHERE value IS NOT NULL),
             |last AS (SELECT * FROM (SELECT *, row_number() OVER (
             |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM log) WHERE rn = 1)
             |SELECT count(*) AS n_keys,
             |  CAST(sum(CASE WHEN op = 'd' THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstoned,
             |  CAST(sum(CASE WHEN op = 'u' THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
             |  CAST(sum(CASE WHEN op = 'u' THEN CAST(cents AS HUGEINT) ELSE 0 END) AS BIGINT)
             |    AS live_cents
             |FROM last""".stripMargin)),

    // SCD2 as-of reconstruction — the type-2 slowly-changing-dimension
    // read: each user's purchase stream defines value-band "dimension
    // versions" with validity [ts, next purchase ts); the as-of instant
    // is the corpus midpoint (deterministic from min/max event epochs),
    // and the readout is how many users sit in each band AT that
    // instant — the point-in-time dimension join every fact backfill
    // runs. Validity intervals come from one user-partitioned lead
    // window; the as-of filter is a broadcast 1-row frame; bands are
    // the value-cents div 10000 domain.
    QueryDef(
      "q_scd2_asof",
      (s, d) => {
        // validity arithmetic runs in exact epoch-micro LONG space —
        // engine-portable and free of the NTZ/TZ comparison snags
        val p = Tables.events(s, d)
          .where(col("event_type") === "purchase" && col("value").isNotNull)
          .select(col("user_id"),
            expr("unix_micros(CAST(ts AS TIMESTAMP))").as("tsu"),
            col("event_id"),
            expr("CAST(round(value*100) AS BIGINT) div 10000").as("band"))
        val scd = p.withColumn("valid_to",
          lead(col("tsu"), 1).over(Window.partitionBy("user_id")
            .orderBy(col("tsu").asc, col("event_id").asc)))
        val asof = p.agg(expr("(min(tsu) + max(tsu)) div 2").as("t"))
        scd.crossJoin(broadcast(asof))
          .where(col("tsu") <= col("t") &&
            (col("valid_to").isNull || col("valid_to") > col("t")))
          .groupBy("band").agg(count(lit(1)).as("n_users"))
          .select(col("band").cast("long").as("value_band"),
            col("n_users").cast("long").as("n_users_asof"))
          .orderBy("value_band")
      },
      Some("""WITH p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id,
             |    CAST(round(value*100) AS BIGINT) // 10000 AS band
             |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
             |scd AS (SELECT *, lead(tsu) OVER (PARTITION BY user_id
             |    ORDER BY tsu, event_id) AS valid_to FROM p),
             |a AS (SELECT (min(tsu) + max(tsu)) // 2 AS t FROM p)
             |SELECT CAST(band AS BIGINT) AS value_band,
             |  count(*) AS n_users_asof
             |FROM scd CROSS JOIN a
             |WHERE tsu <= t AND (valid_to IS NULL OR valid_to > t)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // instrumental-variable Wald estimator with the first-stage
    // diagnostic — completes the causal battery (q_did, q_ipw_ate,
    // q_propensity_strat) with the estimator for UNOBSERVED
    // confounding: instrument z = weekend (epoch-day mod 7, the
    // engine-portable classification), treatment x = afternoon
    // exposure, outcome y = value cents; Wald β = (ȳ₁−ȳ₀)/(x̄₁−x̄₀).
    // The fixture assigns hour independent of weekday, so the first
    // stage is ≈ 0 — a WEAK instrument — and the honest deliverable is
    // exactly that diagnostic: the first-stage delta is reported in
    // micro and the Wald ratio is zero-sentineled when the first stage
    // vanishes (the blow-up a real pipeline must refuse to ship). One
    // conditional-moment pass; one mirrored closed form.
    QueryDef(
      "q_iv_wald",
      (s, d) => {
        Tables.events(s, d).where(col("value").isNotNull)
          .select(
            (datediff(col("ts").cast("date"),
              lit("1970-01-01").cast("date")) % 7).isin(2, 3).as("z"),
            when(expr("hour(ts)") >= 12, 1L).otherwise(0L).as("x"),
            expr("CAST(round(value*100) AS BIGINT)").as("y"))
          .agg(count(when(col("z"), 1)).as("n1"),
            count(when(!col("z"), 1)).as("n0"),
            sum(when(col("z"), col("x")).otherwise(0L)).as("x1"),
            sum(when(!col("z"), col("x")).otherwise(0L)).as("x0"),
            sum(when(col("z"), expr("CAST(y AS DECIMAL(38,0))"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("y1"),
            sum(when(!col("z"), expr("CAST(y AS DECIMAL(38,0))"))
              .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("y0"))
          .select(col("n0").cast("long").as("n_z0"),
            col("n1").cast("long").as("n_z1"),
            expr("""CAST((1000000 * x1) div n1 - (1000000 * x0) div n0
                   |AS BIGINT)""".stripMargin).as("first_stage_micro"),
            expr("""CAST((1000 * y1) div n1 - (1000 * y0) div n0
                   |AS BIGINT)""".stripMargin).as("reduced_form_milli"),
            expr("""CAST(CASE
                   |  WHEN (1000000 * x1) div n1 = (1000000 * x0) div n0 THEN 0
                   |  ELSE round((CAST(y1 AS DOUBLE)/n1 - CAST(y0 AS DOUBLE)/n0)
                   |    / (CAST(x1 AS DOUBLE)/n1 - CAST(x0 AS DOUBLE)/n0) * 1000)
                   |END AS BIGINT)""".stripMargin).as("wald_beta_milli"))
      },
      Some("""WITH e AS (SELECT
             |    ((CAST(ts AS DATE) - DATE '1970-01-01') % 7) IN (2, 3) AS z,
             |    CASE WHEN hour(CAST(ts AS TIMESTAMP)) >= 12 THEN 1 ELSE 0 END AS x,
             |    CAST(round(value*100) AS BIGINT) AS y
             |  FROM events WHERE value IS NOT NULL),
             |a AS (SELECT count(*) FILTER (WHERE z) AS n1,
             |    count(*) FILTER (WHERE NOT z) AS n0,
             |    sum(CASE WHEN z THEN x ELSE 0 END) AS x1,
             |    sum(CASE WHEN NOT z THEN x ELSE 0 END) AS x0,
             |    sum(CASE WHEN z THEN CAST(y AS HUGEINT) ELSE 0 END) AS y1,
             |    sum(CASE WHEN NOT z THEN CAST(y AS HUGEINT) ELSE 0 END) AS y0
             |  FROM e)
             |SELECT CAST(n0 AS BIGINT) AS n_z0, CAST(n1 AS BIGINT) AS n_z1,
             |  CAST((1000000 * x1) // n1 - (1000000 * x0) // n0 AS BIGINT)
             |    AS first_stage_micro,
             |  CAST((1000 * y1) // n1 - (1000 * y0) // n0 AS BIGINT)
             |    AS reduced_form_milli,
             |  CAST(CASE
             |    WHEN (1000000 * x1) // n1 = (1000000 * x0) // n0 THEN 0
             |    ELSE round((CAST(y1 AS DOUBLE)/n1 - CAST(y0 AS DOUBLE)/n0)
             |      / (CAST(x1 AS DOUBLE)/n1 - CAST(x0 AS DOUBLE)/n0) * 1000)
             |  END AS BIGINT) AS wald_beta_milli
             |FROM a""".stripMargin)),

    // sharp regression-discontinuity estimate at an account-balance
    // cutoff — the last member of the causal battery: running variable
    // c_acctbal (cents), cutoff 5000.00, outcome per-customer order
    // count, bandwidth ±2500.00, LOCAL LINEAR fit on each side (the
    // standard RD spec — a raw mean gap would conflate the
    // discontinuity with the slope). Both side-fits close over exact
    // 128-bit moments from ONE conditional pass; the effect is the gap
    // between the two fitted intercepts AT the cutoff. The fixture
    // draws balance independent of behavior ⇒ effect ≈ 0: the honest
    // null, with the machinery (and the per-side slopes) on display.
    QueryDef(
      "q_reg_discontinuity",
      (s, d) => {
        val c = Tables.customer(s, d)
          .select(col("c_custkey"),
            (round(col("c_acctbal") * 100).cast("long") - 500000L).as("r"))
          .where(col("r") >= -250000L && col("r") < 250000L)
        val o = Tables.orders(s, d).groupBy("o_custkey")
          .agg(count(lit(1)).as("y"))
        val pts = c.join(o, col("c_custkey") === col("o_custkey"), "left")
          .select(col("r"), coalesce(col("y"), lit(0L)).as("y"),
            (col("r") >= 0L).as("side"))
        def fitCols(side: Boolean, tag: String) = Seq(
          count(when(col("side") === side, 1)).as(s"n$tag"),
          sum(when(col("side") === side, expr("CAST(r AS DECIMAL(38,0))"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as(s"sx$tag"),
          sum(when(col("side") === side, expr("CAST(r AS DECIMAL(38,0)) * r"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as(s"sxx$tag"),
          sum(when(col("side") === side, expr("CAST(y AS DECIMAL(38,0))"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as(s"sy$tag"),
          sum(when(col("side") === side, expr("CAST(r AS DECIMAL(38,0)) * y"))
            .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as(s"sxy$tag"))
        val m = pts.agg((fitCols(false, "l") ++ fitCols(true, "r")).head,
          (fitCols(false, "l") ++ fitCols(true, "r")).tail: _*)
        def icept(t: String) =
          s"""(CAST(sy$t AS DOUBLE)*sxx$t - CAST(sx$t AS DOUBLE)*sxy$t)
             |/ (CAST(n$t AS DOUBLE)*sxx$t - CAST(sx$t AS DOUBLE)*sx$t)""".stripMargin
        m.select(col("nl").cast("long").as("n_left"),
          col("nr").cast("long").as("n_right"),
          expr(s"CAST(round(1000 * ${icept("l")}) AS BIGINT)")
            .as("left_at_cutoff_milli"),
          expr(s"CAST(round(1000 * ${icept("r")}) AS BIGINT)")
            .as("right_at_cutoff_milli"),
          expr(s"CAST(round(1000 * (${icept("r")} - ${icept("l")})) AS BIGINT)")
            .as("rd_effect_milli"))
      },
      Some("""WITH c AS (SELECT c_custkey,
             |    CAST(round(c_acctbal * 100) AS BIGINT) - 500000 AS r
             |  FROM customer
             |  WHERE CAST(round(c_acctbal * 100) AS BIGINT) - 500000 >= -250000
             |    AND CAST(round(c_acctbal * 100) AS BIGINT) - 500000 < 250000),
             |o AS (SELECT o_custkey, count(*) AS y FROM orders GROUP BY 1),
             |pts AS (SELECT c.r, coalesce(o.y, 0) AS y, c.r >= 0 AS side
             |  FROM c LEFT JOIN o ON o.o_custkey = c.c_custkey),
             |m AS (SELECT
             |    count(*) FILTER (WHERE NOT side) AS nl,
             |    sum(CASE WHEN NOT side THEN CAST(r AS HUGEINT) ELSE 0 END) AS sxl,
             |    sum(CASE WHEN NOT side THEN CAST(r AS HUGEINT) * r ELSE 0 END) AS sxxl,
             |    sum(CASE WHEN NOT side THEN CAST(y AS HUGEINT) ELSE 0 END) AS syl,
             |    sum(CASE WHEN NOT side THEN CAST(r AS HUGEINT) * y ELSE 0 END) AS sxyl,
             |    count(*) FILTER (WHERE side) AS nr,
             |    sum(CASE WHEN side THEN CAST(r AS HUGEINT) ELSE 0 END) AS sxr,
             |    sum(CASE WHEN side THEN CAST(r AS HUGEINT) * r ELSE 0 END) AS sxxr,
             |    sum(CASE WHEN side THEN CAST(y AS HUGEINT) ELSE 0 END) AS syr,
             |    sum(CASE WHEN side THEN CAST(r AS HUGEINT) * y ELSE 0 END) AS sxyr
             |  FROM pts)
             |SELECT CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
             |  CAST(round(1000 * (CAST(syl AS DOUBLE)*sxxl - CAST(sxl AS DOUBLE)*sxyl)
             |    / (CAST(nl AS DOUBLE)*sxxl - CAST(sxl AS DOUBLE)*sxl)) AS BIGINT)
             |    AS left_at_cutoff_milli,
             |  CAST(round(1000 * (CAST(syr AS DOUBLE)*sxxr - CAST(sxr AS DOUBLE)*sxyr)
             |    / (CAST(nr AS DOUBLE)*sxxr - CAST(sxr AS DOUBLE)*sxr)) AS BIGINT)
             |    AS right_at_cutoff_milli,
             |  CAST(round(1000 * ((CAST(syr AS DOUBLE)*sxxr - CAST(sxr AS DOUBLE)*sxyr)
             |    / (CAST(nr AS DOUBLE)*sxxr - CAST(sxr AS DOUBLE)*sxr)
             |    - (CAST(syl AS DOUBLE)*sxxl - CAST(sxl AS DOUBLE)*sxyl)
             |    / (CAST(nl AS DOUBLE)*sxxl - CAST(sxl AS DOUBLE)*sxl))) AS BIGINT)
             |    AS rd_effect_milli
             |FROM m""".stripMargin))
  )

  /** Fixed-point absorbing-chain oracle — twenty unrolled Neumann steps
    * t ← 1 + Q·t over the transient |types|² submatrix, MATERIALIZED
    * per step (each references its predecessor), exact truncating
    * arithmetic mirroring the Spark loop term for term. */
  private def absorptionOracle: String = {
    val steps = (1 to 20).map { k =>
      s"""t$k AS MATERIALIZED (SELECT q.a AS st,
         |      CAST(1000000000 + sum(CAST(q.pn AS HUGEINT) * coalesce(t${k - 1}.t, 0)
         |        // 1000000000) AS BIGINT) AS t
         |    FROM q LEFT JOIN t${k - 1} ON t${k - 1}.st = q.b
         |    GROUP BY 1)""".stripMargin
    }
    s"""WITH ord AS (SELECT event_type AS a,
       |      lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
       |    FROM events),
       |tr AS (SELECT a, b, count(*) AS c FROM ord WHERE b IS NOT NULL GROUP BY 1, 2),
       |rs AS (SELECT a, sum(c) AS tot FROM tr GROUP BY 1),
       |q AS MATERIALIZED (SELECT tr.a, tr.b,
       |      CAST(tr.c AS HUGEINT) * 1000000000 // rs.tot AS pn
       |    FROM tr JOIN rs ON rs.a = tr.a
       |    WHERE tr.a <> 'purchase' AND tr.b <> 'purchase'),
       |t0 AS MATERIALIZED (SELECT a AS st, CAST(1000000000 AS BIGINT) AS t
       |    FROM (SELECT DISTINCT a FROM q)),
       |${steps.mkString(",\n")}
       |SELECT st AS event_type, t AS steps_nano FROM t20 ORDER BY st""".stripMargin
  }

  /** Fixed-point Erlang-B/C oracle — the 32-step blocking recursion
    * unrolled as MATERIALIZED CTEs (each step references its predecessor
    * twice; without materialization DuckDB's default inlining goes
    * exponential), truncating nano arithmetic mirroring the Spark chain
    * term for term. */
  private def erlangOracle: String = {
    val steps = (1 to 32).map { k =>
      s"""b$k AS MATERIALIZED (SELECT CAST((SELECT p FROM pk) * (SELECT b FROM b${k - 1})
         |  // (CAST($k AS HUGEINT)*18000
         |     + ((SELECT p FROM pk) * (SELECT b FROM b${k - 1})) // 1000000000) AS BIGINT) AS b)"""
        .stripMargin
    }
    val union = (1 to 32).map(k => s"SELECT $k AS c, b FROM b$k")
      .mkString("\nUNION ALL ")
    s"""WITH pk AS MATERIALIZED (SELECT CAST(max(n) AS HUGEINT) AS p FROM
       |      (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, count(*) AS n
       |       FROM events GROUP BY 1)),
       |b0 AS MATERIALIZED (SELECT CAST(1000000000 AS BIGINT) AS b),
       |${steps.mkString(",\n")},
       |tab AS ($union)
       |SELECT CAST(c AS BIGINT) AS servers,
       |  CAST((SELECT p FROM pk) * 1000000 // (18000*c) AS BIGINT) AS util_micro,
       |  CAST(b AS BIGINT) AS erlang_b_nano,
       |  CAST(CAST(b AS HUGEINT)*c*18000
       |    // (CAST(c AS HUGEINT)*18000
       |        - (SELECT p FROM pk)*(1000000000 - b) // 1000000000) AS BIGINT)
       |    AS erlang_c_nano,
       |  CAST(3600 * (CAST(b AS HUGEINT)*c*18000
       |    // (CAST(c AS HUGEINT)*18000
       |        - (SELECT p FROM pk)*(1000000000 - b) // 1000000000))
       |    // (18000*c - (SELECT p FROM pk)) AS BIGINT) AS asa_micro_s
       |FROM tab WHERE 18000*c > (SELECT p FROM pk)
       |ORDER BY c""".stripMargin
  }

  /** Fixed-point Markov stationary oracle — ten unrolled power-iteration
    * stages over the |types|² transition matrix, exact truncating
    * arithmetic mirroring the Spark loop term for term. */
  private def markovOracle: String = {
    val base =
      """WITH ord AS (SELECT event_type AS a,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS b
        |  FROM events),
        |tr AS (SELECT a, b, count(*) AS c FROM ord WHERE b IS NOT NULL GROUP BY 1, 2),
        |rs AS (SELECT a, sum(c) AS tot FROM tr GROUP BY 1),
        |ns AS (SELECT count(*) AS k FROM rs),
        |p0 AS (SELECT a AS st, CAST(1000000000 // (SELECT k FROM ns) AS BIGINT) AS pi
        |       FROM rs)""".stripMargin
    val iters = (1 to 10).map { k =>
      s"""p$k AS (SELECT tr.b AS st,
         |    CAST(sum(CAST(p${k - 1}.pi AS HUGEINT) * tr.c // rs.tot) AS BIGINT) AS pi
         |  FROM tr JOIN p${k - 1} ON p${k - 1}.st = tr.a JOIN rs ON rs.a = tr.a
         |  GROUP BY 1)""".stripMargin
    }
    (base +: iters).mkString(",\n") +
      "\nSELECT st AS event_type, pi AS pi_nano FROM p10 ORDER BY st"
  }
}
