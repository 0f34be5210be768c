package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scratch main for schema/plan inspection and manual drives. */
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
    import spark.implicits._

    println(s"entry rows = ${SparkEntry.entry(spark).count()}")

    // wkt_centroid via the SQL surface
    functions.WktCentroid.register(spark)
    spark.sql(
      """SELECT wkt_centroid(w) AS c FROM VALUES
        |  ('POINT (12.5 -3.25)'),
        |  ('LINESTRING (0 0, 2 0, 2 2)'),
        |  ('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 1 2, 2 2, 2 1, 1 1))'),
        |  ('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((10 10, 12 10, 12 12, 10 12, 10 10)))'),
        |  ('SRID garbage 42'),
        |  ('no numbers at all'),
        |  (CAST(NULL AS STRING)) AS t(w)""".stripMargin)
      .show(truncate = false)

    // streaming incremental upsert on a temp dir, three runs:
    // two batches + an empty restart (idempotence probe)
    val dir = java.nio.file.Files.createTempDirectory("graft-drive").toString
    val (src, tgt, chk) = (s"$dir/src", s"$dir/tgt", s"$dir/chk")
    def stream() = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, value DOUBLE").parquet(src)
    Seq((1L, "2024-01-01 00:00:00", 1.0), (1L, "2024-01-01 01:00:00", 1.5),
      (2L, "2024-01-01 00:00:00", 2.0))
      .toDF("event_id", "s", "value")
      .select($"event_id", $"s".cast("timestamp").as("ts"), $"value")
      .write.mode("append").parquet(src)
    streaming.IncrementalUpsert.run(stream(), tgt, chk, Seq("event_id"), "ts", "ts")
      .awaitTermination()
    Seq((2L, "2024-01-02 00:00:00", 2.5), (3L, "2024-01-02 00:00:00", 3.0))
      .toDF("event_id", "s", "value")
      .select($"event_id", $"s".cast("timestamp").as("ts"), $"value")
      .write.mode("append").parquet(src)
    streaming.IncrementalUpsert.run(stream(), tgt, chk, Seq("event_id"), "ts", "ts")
      .awaitTermination()
    streaming.IncrementalUpsert.run(stream(), tgt, chk, Seq("event_id"), "ts", "ts")
      .awaitTermination() // no new data: target must be unchanged
    println("streaming target after 2 batches + empty restart:")
    spark.read.parquet(tgt).orderBy("event_id").show()

    spark.stop()
  }
}
