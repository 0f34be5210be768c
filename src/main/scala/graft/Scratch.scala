package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: `runMain graft.Scratch q_name [q_name2 ...]`
  * prints the formatted physical plan of each named query (default: a
  * representative set) at sf0.001. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("session-probe")) {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // events exactly 1h apart (u=1) vs 1s under the gap (u=2)
      val df = Seq(
        (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 01:00:00"),
        (2L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:59:59"))
        .toDF("u", "s").select($"u", $"s".cast("timestamp_ntz").as("ts"))
      df.groupBy(session_window($"ts", "1 hour").as("sw"), $"u")
        .agg(count(lit(1)).as("n"))
        .select($"u", $"sw.start", $"sw.end", $"n")
        .orderBy("u", "sw.start").show(false)
    } else if (args.headOption.contains("dot-probe")) {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val df = Seq(
        ("equal", Some(Seq(1.0f, 2.0f)), Some(Seq(3.0, 4.0))),
        ("shorter-left", Some(Seq(2.0f)), Some(Seq(5.0, 100.0))),
        ("empty", Some(Seq.empty[Float]), Some(Seq(1.0))),
        ("null-side", None, Some(Seq(1.0))))
        .toDF("case", "a", "b")
      df.select(col("case"),
        functions.Similarity.dot(col("a"), col("b")).as("dot"))
        .show(truncate = false)
    } else {
      val names = if (args.nonEmpty) args.toSeq
        else Seq("q_pushdown_scan", "q_topk_groups", "q_dim_lookup", "q_upsert_latest")
      for (n <- names) {
        println(s"\n========== $n ==========")
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
      }
    }
    spark.stop()
  }
}
