package graft

import java.nio.file.Files

import graft.operators.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    // a crashed previous run can leave the managed location without the
    // catalog entry — remove it too
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(new java.io.File(s"spark-warehouse/$name"))
  }

  test("bucketed co-keyed join runs with zero Exchange in the plan") {
    dropTable("ev_bucketed_a")
    dropTable("ev_bucketed_b")
    val ev = Tables.events(spark, sf)
    Layout.writeBucketed(ev.select("event_id", "user_id", "value"),
      "ev_bucketed_a", 8, Seq("user_id"))
    Layout.writeBucketed(ev.select("user_id", "event_type"),
      "ev_bucketed_b", 8, Seq("user_id"))
    // at fixture size the planner rightly prefers broadcast; disable it
    // to surface the bucketed sort-merge path a large-large join would use
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_bucketed_a")
        .join(spark.table("ev_bucketed_b"), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scan:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bucketed aggregation on the bucket key also skips the shuffle") {
    val agg = spark.table("ev_bucketed_a").groupBy("user_id")
      .agg(count(lit(1)).as("n"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle:\n$plan")
    assert(agg.count() == 15)
  }

  test("daily partitioning prunes directories via PartitionFilters") {
    val dir = Files.createTempDirectory("graft-layout").toString + "/ev"
    Layout.writeDailyPartitioned(Tables.events(spark, sf), "ts", dir)
    val narrow = Layout.readDays(spark, dir, "2024-01-10", "2024-01-12")
    val plan = narrow.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p_date"),
      s"expected partition filters:\n$plan")
    // row counts agree with the unpartitioned range filter
    val expected = Tables.events(spark, sf)
      .where(col("ts") >= lit("2024-01-10").cast("timestamp_ntz")
        && col("ts") < lit("2024-01-12").cast("timestamp_ntz")).count()
    assert(narrow.count() == expected)
  }
}
