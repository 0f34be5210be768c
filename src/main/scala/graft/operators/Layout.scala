package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical data layout for scale: bucketing (pre-shuffled storage so
  * co-keyed joins/aggregations skip the exchange entirely) and date
  * partitioning (directory-level pruning — the parquet analogue of the
  * reference's SQLite secondary indexes, src/trv/load_sqlite.py:22-24,
  * per SURVEY §4 "indexes ≈ partitioning + min/max stats").
  */
object Layout {

  /** Persist `df` bucketed by `keys` into the session catalog. Joins and
    * aggregations on exactly these keys against an equally-bucketed table
    * read pre-shuffled data — zero Exchange in the plan, the single
    * biggest shuffle saving available for repeated co-keyed work. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` partitioned by the DATE of `tsCol` (one directory per
    * day). Readers filtering on `p_date` scan only matching directories. */
  def writeDailyPartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("p_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("p_date")
      .parquet(path)

  /** Read a daily-partitioned table restricted to [from, until) — the
    * filter lands in PartitionFilters, pruning directories before any
    * file is opened. */
  def readDays(spark: SparkSession, path: String, from: String, until: String): DataFrame =
    spark.read.parquet(path)
      .where(col("p_date") >= lit(from) && col("p_date") < lit(until))
}
