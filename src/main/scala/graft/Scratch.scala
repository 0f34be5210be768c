package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for schema/plan inspection. */
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
    val d = "/root/testdata/sf0.001"
    println(s"entry rows = ${SparkEntry.entry(spark).count()}")
    for (t <- Seq("events", "documents", "embeddings", "lineitem")) {
      println(s"=== $t ===")
      val df = Tables.load(spark, d, t)
      df.printSchema()
      df.show(3, truncate = 60)
    }
    spark.stop()
  }
}
