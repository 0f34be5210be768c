package graft.plans

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.Sort
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.PlanBridge

/** Column-API entry point for the [[TopKPerGroup]] operator plus its
  * declared gate query. */
object GroupTopK {

  /** Top `k` rows of `df` per `groupCols` under `orderCols` (a total
    * order — include a unique tiebreaker). Plans as two heap passes
    * around one hash exchange; output order within groups is undefined
    * (sort afterwards if needed). */
  def topK(df: DataFrame, k: Int, groupCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    graft.GraftRuntime.ensure(spark)
    // Spark 4 Columns carry lazy ColumnNodes that only become (resolved,
    // serializable) catalyst expressions through analysis — so feed the
    // sort columns through a throwaway sortWithinPartitions plan and lift
    // the analyzed Sort node's order out of it
    val (order, analyzed) =
      df.sortWithinPartitions(orderCols: _*).queryExecution.analyzed match {
        case s: Sort => (s.order, s.child)
        case other => throw new IllegalStateException(
          s"expected a Sort node from sortWithinPartitions, got:\n$other")
      }
    val resolver = spark.sessionState.conf.resolver
    def attrOf(n: String) = analyzed.output.find(a => resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"no column '$n' among ${analyzed.output.map(_.name).mkString(", ")}"))
    // float/double group keys must normalize (-0.0 → 0.0, canonical NaN)
    // BEFORE hashing/heap-keying — Spark's NormalizeFloatingNumbers rule
    // does this for its own operators but knows nothing about this node
    val groups = groupCols.map(attrOf)
      .map(org.apache.spark.sql.graftbridge.ColumnBridge.normalizeFloats)
    PlanBridge.ofRows(spark, TopKPerGroup(k, groups, order, analyzed))
  }

  val defs: Seq[QueryDef] = Seq(
    // the custom operator under the oracle gate: top-3 events per type by
    // (value desc, event_id) — the heap plan must equal DuckDB's
    // row_number formulation exactly, which also proves the partial pass
    // never drops a global winner
    QueryDef(
      "q_topk_heap",
      (s, d) => topK(
        Tables.events(s, d).select("event_type", "event_id", "value"),
        k = 3,
        groupCols = Seq("event_type"),
        orderCols = Seq(col("value").desc, col("event_id")))
        .orderBy(col("event_type"), col("value").desc, col("event_id")),
      Some("""SELECT event_type, event_id, value FROM (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY value DESC, event_id) AS rn
             |  FROM events)
             |WHERE rn <= 3
             |ORDER BY event_type, value DESC, event_id""".stripMargin))
  )
}
