package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (100 TB design point).
  *
  * Decomposable aggregates (count/sum/min/max) do NOT need salting:
  * map-side partial aggregation already reduces every key to at most one
  * row per input partition before the shuffle, so a hot key's reducer
  * receives ≤ numPartitions tiny partials. Salting those would add a
  * shuffle and make things strictly slower.
  *
  * The genuine straggler cases are aggregates whose per-key state is
  * itself huge — countDistinct (the final per-key reducer receives every
  * distinct value) and collect-style aggregates. There, bucketing by a
  * hash of the VALUE splits the hot key's state across `buckets`
  * reducers, and a second (tiny) shuffle combines exact partials.
  * AQE's skew handling covers joins only; these cover aggregation.
  */
object Skew {

  /** Exact distinct count per key, hot-key safe: stage 1 groups by
    * (key, hash(value) % buckets) — value-hash buckets partition the
    * distinct value set disjointly, so stage 2's per-key sum of bucket
    * counts is exact, and no reducer ever holds more than ~1/buckets of
    * a hot key's values. */
  def saltedDistinctCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(buckets)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(countDistinct(col(valueCol)).as("__pd"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum("__pd").as(s"n_distinct_$valueCol"))
  }

  /** Salted replication for a skewed join: replicate each small-side row
    * `buckets` times with an explicit salt so the big side's salted keys
    * all find their match. The big side's salt is derived from the ROW
    * (hash of every column mod buckets), not from the physical partition:
    * a hot key that arrives physically clustered — one file, one
    * kafka partition — would map to a single `spark_partition_id` and
    * stay on one reducer, while a row hash spreads it uniformly no matter
    * how the input is laid out. Any deterministic row-dependent value
    * works (the salt never reaches the output); hash collisions merely
    * co-bucket rows. Returns (bigSalted, smallReplicated, joinCols). */
  def saltedJoinSides(big: DataFrame, small: DataFrame, key: String, buckets: Int)
      : (DataFrame, DataFrame, Seq[String]) = {
    val bigSalted = big.withColumn(
      "__salt", pmod(hash(big.columns.map(col): _*), lit(buckets)))
    val smallRep = small.withColumn("__salt", explode(
      array((0 until buckets).map(lit): _*)))
    (bigSalted, smallRep, Seq(key, "__salt"))
  }
}
