package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed global-ordering primitive must reproduce the
  * single-partition window semantics exactly — on ragged sizes, ties in
  * the value column (broken by the unique key), and n < k. */
class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  test("withGlobalRowNumber equals the single-partition row_number window") {
    for (n <- Seq(0, 1, 3, 97, 1000)) {
      val df = spark.range(n.toLong).select(col("id"),
        (col("id") * 2654435761L % 101).as("v")) // many ties
      val got = GlobalOrder.withGlobalRowNumber(
          df, Seq(col("v").desc, col("id").asc), "pos")
        .select("id", "pos")
      val want = df.select(col("id"),
        row_number().over(Window.orderBy(col("v").desc, col("id").asc))
          .cast("long").as("pos"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty, s"n=$n")
    }
  }

  test("ntileFrom matches ntile() for every (n, k) shape incl. n < k") {
    for (n <- Seq(1, 2, 3, 4, 5, 7, 8, 97, 400); k <- Seq(1, 2, 3, 4, 10)) {
      val df = spark.range(n.toLong).toDF("id")
      val got = df
        .select(col("id"), GlobalOrder.ntileFrom(
          col("id") + 1, lit(n.toLong), k).as("t"))
      val want = df.select(col("id"),
        ntile(k).over(Window.orderBy("id")).as("t"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"n=$n k=$k")
    }
  }

  test("withRunningTotal equals the single-partition cumulative-sum window") {
    for (n <- Seq(0, 1, 3, 97, 1000)) {
      val df = spark.range(n.toLong).select(col("id"),
        (col("id") * 2654435761L % 101).as("v"), // many order ties
        (col("id") % 13 + 1).as("w"))
      val got = GlobalOrder.withRunningTotal(
          df, Seq(col("v").desc, col("id").asc), col("w"), "cum")
        .select("id", "cum")
      val want = df.select(col("id"),
        sum("w").over(Window.orderBy(col("v").desc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, 0)).cast("long").as("cum"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty, s"n=$n")
    }
  }

  test("release() leaves no pinned blocks after a GlobalOrder query completes") {
    // the ranked projection is persisted for cross-job boundary
    // consistency; after the consuming action the harness must be able
    // to drop it — otherwise a 300+-query session accumulates unbounded
    // MEMORY_AND_DISK blocks (the round-8 lesson: pinned blocks starve
    // hash-agg execution memory at scale)
    GlobalOrder.release() // clean slate in case earlier tests pinned
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = spark.range(5000).select(col("id"),
      (col("id") * 2654435761L % 101).as("v"))
    val out = GlobalOrder.withRunningTotal(
      GlobalOrder.withGlobalRowNumber(df, Seq(col("v").asc, col("id").asc), "pos"),
      Seq(col("v").asc, col("id").asc), col("pos"), "cum")
    out.count() // the consuming action — blocks are pinned while it runs
    val pinnedNow = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(pinnedNow.nonEmpty, "expected the ranked projections to be cached")
    GlobalOrder.release()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty,
      s"${after.size} GlobalOrder block(s) still pinned after release()")
    // idempotent on an empty registry
    GlobalOrder.release()
  }

  test("withGlobalNtile equals the global ntile window under a total order") {
    val df = spark.range(500).select(col("id"),
      (col("id") * 1103515245L % 37).as("v"))
    val got = GlobalOrder.withGlobalNtile(
        df, Seq(col("v").asc, col("id").asc), 4, "q")
      .select("id", "q")
    val want = df.select(col("id"),
      ntile(4).over(Window.orderBy(col("v").asc, col("id").asc)).as("q"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
