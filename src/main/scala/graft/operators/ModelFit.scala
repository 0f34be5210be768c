package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Closed-form model fits — distributed training steps whose entire data
  * pass is ONE map-combined moment aggregate, with the solve a driver-free
  * closed form over the exact sums (the U21 family pattern: q_logreg_irls
  * does one IRLS step, q_kmeans_iter one Lloyd step; these do the whole
  * fit because the normal equations close over second moments).
  */
object ModelFit {

  val defs: Seq[QueryDef] = Seq(

    // two-feature OLS with intercept via the 3×3 normal equations
    // (Cramer's rule): purchase value on hour-of-day and day-of-month.
    // The data pass is ONE aggregate of nine exact 128-bit moments
    // (n, Σx₁, Σx₂, Σx₁², Σx₁x₂, Σx₂², Σy, Σx₁y, Σx₂y, Σy²); the
    // determinant expansion and R² are single mirrored IEEE expressions
    // over those integers — at 100 TB the fit costs exactly one scan,
    // no iteration, no driver matrix. Fixture value ⊥ time, so the
    // slopes sit near zero and R² ≈ 0.7%: the honest null.
    QueryDef(
      "q_ols_multi",
      (s, d) => Tables.events(s, d)
        .where(col("event_type") === "purchase" && col("value").isNotNull)
        .select(expr("CAST(round(value*100) AS BIGINT)").as("y"),
          expr("CAST(hour(ts) AS BIGINT)").as("x1"),
          expr("CAST(dayofmonth(ts) AS BIGINT)").as("x2"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(x1 AS DECIMAL(38,0))")).as("s1"),
          sum(expr("CAST(x2 AS DECIMAL(38,0))")).as("s2"),
          sum(expr("CAST(x1 AS DECIMAL(38,0))*x1")).as("s11"),
          sum(expr("CAST(x1 AS DECIMAL(38,0))*x2")).as("s12"),
          sum(expr("CAST(x2 AS DECIMAL(38,0))*x2")).as("s22"),
          sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
          sum(expr("CAST(x1 AS DECIMAL(38,0))*y")).as("s1y"),
          sum(expr("CAST(x2 AS DECIMAL(38,0))*y")).as("s2y"),
          sum(expr("CAST(y AS DECIMAL(38,0))*y")).as("syy"))
        .select(col("n"), expr("CAST(s1 AS DOUBLE)").as("s1"),
          expr("CAST(s2 AS DOUBLE)").as("s2"),
          expr("CAST(s11 AS DOUBLE)").as("s11"),
          expr("CAST(s12 AS DOUBLE)").as("s12"),
          expr("CAST(s22 AS DOUBLE)").as("s22"),
          expr("CAST(sy AS DOUBLE)").as("sy"),
          expr("CAST(s1y AS DOUBLE)").as("s1y"),
          expr("CAST(s2y AS DOUBLE)").as("s2y"),
          expr("CAST(syy AS DOUBLE)").as("syy"))
        .select(col("n"), col("sy"), col("s1y"), col("s2y"), col("syy"),
          expr("n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2)")
            .as("det"),
          expr("sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y)")
            .as("d0"),
          expr("n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2)")
            .as("d1"),
          expr("n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2)")
            .as("d2"))
        .select(col("n").cast("long").as("n_obs"),
          expr("CAST(round(d0 / det * 1000) AS BIGINT)").as("b0_milli"),
          expr("CAST(round(d1 / det * 1000) AS BIGINT)").as("b1_milli"),
          expr("CAST(round(d2 / det * 1000) AS BIGINT)").as("b2_milli"),
          expr("""CAST(round((1 - (syy - (d0/det)*sy - (d1/det)*s1y - (d2/det)*s2y)
                 |  / (syy - sy*sy/n)) * 1000000) AS BIGINT)""".stripMargin)
            .as("r2_micro")),
      Some("""WITH v AS (SELECT CAST(round(value*100) AS BIGINT) AS y,
             |    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x1,
             |    CAST(dayofmonth(CAST(ts AS TIMESTAMP)) AS BIGINT) AS x2
             |  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
             |m AS (SELECT count(*) AS n,
             |    sum(CAST(x1 AS HUGEINT)) AS s1, sum(CAST(x2 AS HUGEINT)) AS s2,
             |    sum(CAST(x1 AS HUGEINT)*x1) AS s11, sum(CAST(x1 AS HUGEINT)*x2) AS s12,
             |    sum(CAST(x2 AS HUGEINT)*x2) AS s22,
             |    sum(CAST(y AS HUGEINT)) AS sy, sum(CAST(x1 AS HUGEINT)*y) AS s1y,
             |    sum(CAST(x2 AS HUGEINT)*y) AS s2y, sum(CAST(y AS HUGEINT)*y) AS syy
             |  FROM v),
             |d AS (SELECT n, CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
             |    CAST(s11 AS DOUBLE) AS s11, CAST(s12 AS DOUBLE) AS s12,
             |    CAST(s22 AS DOUBLE) AS s22, CAST(sy AS DOUBLE) AS sy,
             |    CAST(s1y AS DOUBLE) AS s1y, CAST(s2y AS DOUBLE) AS s2y,
             |    CAST(syy AS DOUBLE) AS syy FROM m),
             |sol AS (SELECT n, sy, s1y, s2y, syy,
             |    n*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2) AS det,
             |    sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y) AS d0,
             |    n*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2) AS d1,
             |    n*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2) AS d2
             |  FROM d)
             |SELECT CAST(n AS BIGINT) AS n_obs,
             |  CAST(round(d0 / det * 1000) AS BIGINT) AS b0_milli,
             |  CAST(round(d1 / det * 1000) AS BIGINT) AS b1_milli,
             |  CAST(round(d2 / det * 1000) AS BIGINT) AS b2_milli,
             |  CAST(round((1 - (syy - (d0/det)*sy - (d1/det)*s1y - (d2/det)*s2y)
             |    / (syy - sy*sy/n)) * 1000000) AS BIGINT) AS r2_micro
             |FROM sol""".stripMargin))
  )
}
