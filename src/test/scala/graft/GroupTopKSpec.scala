package graft

import graft.plans.GroupTopK
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom heap top-k operator vs the window formulation, plus the
  * plan shape that justifies its existence. */
class GroupTopKSpec extends SparkSpec {

  import spark.implicits._

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    Tables.events(spark, sf).select("event_type", "event_id", "value")
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k).drop("rn")
  }

  private def heapTopK(k: Int) = GroupTopK.topK(
    Tables.events(spark, sf).select("event_type", "event_id", "value"),
    k, Seq("event_type"), Seq(col("value").desc, col("event_id")))

  test("heap top-k equals the window formulation for several k") {
    for (k <- Seq(1, 3, 17)) {
      val got = heapTopK(k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      val want = windowTopK(k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == want, s"k=$k: ${got.diff(want)} extra, ${want.diff(got)} missing")
    }
  }

  test("groups smaller than k pass through whole") {
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("g", "v")
    val got = GroupTopK.topK(df, 10, Seq("g"), Seq(col("v")))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("plan: two heap passes around one hash exchange, and NO sort") {
    val plan = heapTopK(3).queryExecution.executedPlan.toString
    assert("TopKPerGroup ".r.findAllIn(plan).size == 2, s"expected 2 passes:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no hash exchange:\n$plan")
    assert(!plan.contains("Sort "), s"a sort sneaked into the heap plan:\n$plan")
  }
}
