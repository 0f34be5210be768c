package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated fixtures (TESTDATA.md).
  *
  * Mirrors the reference's fixed, explicit schemas (reference
  * src/trv/load_sqlite.py:6-25 — schema is declared, never inferred); on
  * parquet the footer IS the schema, so we read directly and keep the
  * loader as the single place a table name is spelled.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a nanos-epoch
    * long (legacy conf) and convert to a micros TimestampType column —
    * lossless here (fixture timestamps are second-scale) and matching
    * the oracle side's `CAST(ts AS TIMESTAMP)` (FIXTURES.md determinism
    * rules).
    */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // integer `div`, NOT `/`: ns-epoch values exceed double's 2^53 exact
    // range, so float division would be off by ±1µs
    raw.withColumn(
      "ts",
      org.apache.spark.sql.functions
        .timestamp_micros(org.apache.spark.sql.functions.expr("ts div 1000"))
        .cast("timestamp_ntz"))
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
