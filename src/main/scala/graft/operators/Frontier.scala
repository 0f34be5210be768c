package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-frontier (skyline) and incremental aggregate maintenance —
  * two patterns a 100 TB store needs that no single Spark builtin
  * provides.
  *
  * Skyline: the textbook formulation is a quadratic NOT EXISTS self-join
  * (the oracle uses exactly that, as an independent algorithm). The
  * engine's plan is the two-phase bucket decomposition: a per-bucket
  * running-max window eliminates locally dominated points (parallel over
  * buckets), then a bucket-level cumulative max — computed over the TINY
  * distinct-bucket table — eliminates points dominated from any higher
  * bucket. No global-order window over the data, no quadratic join;
  * shuffle is one hash partition by bucket + one |buckets|-row window.
  *
  * Proof sketch of equivalence (strict dominance over distinct points):
  * a dominator of p either shares p's floor-bucket — then it precedes p
  * in the (x desc, y desc) bucket order and its y reaches the running
  * max — or sits in a strictly higher bucket, where bucket monotonicity
  * makes its x strictly greater, so domination reduces to y' ≥ y, i.e.
  * y ≤ cummax of higher buckets.
  */
object Frontier {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_skyline",
      (s, d) => {
        val pts = Tables.events(s, d)
          .where(col("event_type") === "click")
          .select(col("value").as("x"), col("ts").cast("timestamp_ntz").as("y"))
          .distinct()
          .withColumn("bucket", floor(col("x")))
        // phase 1: within-bucket domination via running max over the
        // (x desc, y desc) prefix — strictly-preceding rows only
        val wLocal = Window.partitionBy("bucket")
          .orderBy(col("x").desc, col("y").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val local = pts
          .withColumn("prevMax", max("y").over(wLocal))
          .where(col("prevMax").isNull || col("y") > col("prevMax"))
        // phase 2: domination from any strictly-higher bucket — cumulative
        // max over the bucket-level table (|buckets| rows, not |points|)
        val wHigher = Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val bucketMax = pts.groupBy("bucket").agg(max("y").as("bmax"))
          .withColumn("higherMax", max("bmax").over(wHigher))
          .select("bucket", "higherMax")
        local.join(broadcast(bucketMax), Seq("bucket"))
          .where(col("higherMax").isNull || col("y") > col("higherMax"))
          .select("x", "y")
          .orderBy(col("x").desc)
      },
      Some("""WITH p AS (SELECT DISTINCT value AS x, CAST(ts AS TIMESTAMP) AS y
             |          FROM events WHERE event_type = 'click')
             |SELECT x, y FROM p a
             |WHERE NOT EXISTS (SELECT 1 FROM p b
             |  WHERE b.x >= a.x AND b.y >= a.y AND (b.x > a.x OR b.y > a.y))
             |ORDER BY x DESC""".stripMargin)),

    // incremental aggregate maintenance: the base aggregate (rows before
    // the cutoff — in production a STORED table) merges with the delta
    // batch's aggregate through the aggregates' own algebra (counts and
    // cent-sums add, min/max combine) in a full-outer join. Touching
    // |groups| + |delta| rows instead of rescanning the base fact table
    // is the whole point at 100 TB. The oracle recomputes from scratch —
    // the gate proves merge ≡ recompute, including groups that exist on
    // only one side.
    QueryDef(
      "q_incremental_agg",
      (s, d) => {
        val cut = lit("2024-01-25 00:00:00").cast("timestamp_ntz")
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("ts"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
            col("value"))
        def aggOf(df: org.apache.spark.sql.DataFrame, p: String) = df
          .groupBy("event_type")
          .agg(count(lit(1)).as(s"${p}_n"), sum("cents").as(s"${p}_c"),
            min("value").as(s"${p}_mn"), max("value").as(s"${p}_mx"))
        val base = aggOf(ev.where(col("ts") < cut), "b")
        val delta = aggOf(ev.where(col("ts") >= cut), "d")
        base.join(delta, Seq("event_type"), "full_outer")
          .select(col("event_type"),
            (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
            (coalesce(col("b_c"), lit(0L)) + coalesce(col("d_c"), lit(0L))).as("cents"),
            least(coalesce(col("b_mn"), col("d_mn")),
              coalesce(col("d_mn"), col("b_mn"))).as("mn"),
            greatest(coalesce(col("b_mx"), col("d_mx")),
              coalesce(col("d_mx"), col("b_mx"))).as("mx"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
             |  min(value) AS mn, max(value) AS mx
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))
  )
}
