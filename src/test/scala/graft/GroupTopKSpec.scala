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

  test("property: heap top-k equals brute-force selection on generated data with ties") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowsGen = Gen.listOfN(60, for {
      g <- Gen.oneOf("x", "y", "z")
      v <- Gen.choose(0, 5) // heavy ties on the order value — the
      id <- Gen.choose(0L, 1000L) // unique-ish id is the tiebreaker
    } yield (g, v, id))
    val cases = (1 to 5).flatMap(i =>
      rowsGen.apply(Gen.Parameters.default, Seed(1000L + i)))
    for ((rows, i) <- cases.zipWithIndex; k <- Seq(1, 4)) {
      val distinctRows = rows.distinct // duplicate (g,v,id) would break total order
      val df = distinctRows.toDF("g", "v", "id")
      val got = GroupTopK.topK(df, k, Seq("g"), Seq(col("v").desc, col("id")))
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      val want = distinctRows.groupBy(_._1).flatMap { case (_, rs) =>
        rs.sortBy(t => (-t._2, t._3)).take(k)
      }.toSet
      assert(got == want, s"case $i k=$k")
    }
  }

  test("float group keys normalize: -0.0 and 0.0 are ONE group, like the window form") {
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L)).toDF("g", "id")
    val got = GroupTopK.topK(df, 2, Seq("g"), Seq(col("id")))
      .collect().map(r => r.getLong(1)).toSet
    // one merged zero-group keeps ids 1,2 (top-2 by id); group 1.5 keeps 4
    assert(got == Set(1L, 2L, 4L), s"zero groups split: kept $got")
  }

  test("plan: two heap passes around one hash exchange, and NO sort") {
    val plan = heapTopK(3).queryExecution.executedPlan.toString
    assert("TopKPerGroup ".r.findAllIn(plan).size == 2, s"expected 2 passes:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"), s"no hash exchange:\n$plan")
    assert(!plan.contains("Sort "), s"a sort sneaked into the heap plan:\n$plan")
  }
}
