package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (100 TB design point): when one
  * key holds a disproportionate share of rows, the single reducer owning
  * it becomes the stage's straggler. Salting splits each key into
  * `buckets` sub-keys for a partial aggregate, then combines partials in
  * a second (tiny) shuffle.
  *
  * AQE's skew-join handling covers joins; this utility covers
  * aggregations, which AQE does not re-balance. Only reassociatable
  * aggregates (count/sum/min/max) are supported — exactly the ones whose
  * partial+final decomposition is lossless.
  */
object Skew {

  /** Salted group-by-count. Salt is derived from a hash of the full row's
    * partition-local position, which is irrelevant to the result (counts
    * re-combine exactly); `buckets` bounds the fan-out of the hot key. */
  def saltedCount(df: DataFrame, keys: Seq[String], buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(buckets)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__pn"))
    partial.groupBy(keys.map(col): _*).agg(sum("__pn").as("n"))
  }

  /** Salted sum over a numeric column (same two-phase shape). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spark_partition_id(), lit(buckets)))
    val partial = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__ps"))
    partial.groupBy(keys.map(col): _*).agg(sum("__ps").as(s"sum_$valueCol"))
  }

  /** Salted broadcast-side replication for a skewed join: replicate each
    * small-side row `buckets` times with an explicit salt so the big
    * side's salted keys all find their match. Returns (bigSalted,
    * smallReplicated, joinCols). */
  def saltedJoinSides(big: DataFrame, small: DataFrame, key: String, buckets: Int)
      : (DataFrame, DataFrame, Seq[String]) = {
    val bigSalted = big.withColumn("__salt", pmod(spark_partition_id(), lit(buckets)))
    val smallRep = small.withColumn("__salt", explode(
      array((0 until buckets).map(lit): _*)))
    (bigSalted, smallRep, Seq(key, "__salt"))
  }
}
