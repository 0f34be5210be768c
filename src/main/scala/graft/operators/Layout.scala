package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.ZOrder
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

  /** Write `df` globally ordered by the Morton interleave of two integer
    * dimension columns. Every parquet row group then covers a compact
    * z-range, so min/max pruning works for range predicates on EITHER
    * column — the multi-dimensional analogue of a sorted write. The sort
    * is a range-partitioned total order (one shuffle), same cost shape as
    * any sorted write at 100 TB. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String): Unit = {
    // collision-proof working column: a user column named "z" must
    // survive the write untouched
    val zc = "__graft_zorder"
    require(!df.columns.contains(zc), s"input already has a $zc column")
    df.withColumn(zc, ZOrder.interleaveBits(col(xCol), col(yCol)))
      .orderBy(zc)
      .drop(zc)
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction (the OPTIMIZE maintenance pass): rewrite a
    * parquet directory into ⌈bytes / targetBytes⌉ files and publish the
    * result through [[graft.AtomicPublish.overwrite]], so readers see
    * either the fragmented table or the compacted one, never a partial
    * rewrite. Streaming sinks and incremental upserts accrete small
    * files; at 100 TB the file count — not the byte count — is what
    * kills scan planning (one footer read and one task per file).
    * Returns (filesBefore, filesAfter). Uses coalesce, not repartition:
    * bin-packing reads without a shuffle is the entire point. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): (Int, Int) = {
    val (fs, path) = graft.AtomicPublish.fsFor(spark, dir)
    val parts = fs.listStatus(path).filter(_.getPath.getName.endsWith(".parquet"))
    val before = parts.length
    val totalBytes = parts.map(_.getLen).sum
    val want = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    graft.AtomicPublish.overwrite(spark.read.parquet(dir).coalesce(want), dir)
    val after = fs.listStatus(path)
      .count(_.getPath.getName.endsWith(".parquet"))
    (before, after)
  }

  val defs: Seq[QueryDef] = Seq(
    // the clustering key itself under the oracle gate: the native
    // expression vs 64 shift-mask-add terms of plain SQL bit arithmetic —
    // any drift in the bit layout breaks the hash. Dimensions are
    // pmod-quantized to 10 bits each, the realistic grid for file-level
    // clustering (finer grids thrash row-group boundaries).
    QueryDef(
      "q_zorder_key",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          pmod(col("user_id"), lit(1024)).cast("int").as("zx"),
          pmod(expr("CAST(round(value * 100) AS BIGINT)"), lit(1024)).cast("int").as("zy"))
        .select(col("event_id"), col("zx"), col("zy"),
          ZOrder.interleaveBits(col("zx"), col("zy")).as("zkey"))
        .orderBy("event_id"),
      Some(s"""SELECT event_id, zx, zy, ${ZOrder.mortonSql("zx", "zy")} AS zkey
             |FROM (SELECT event_id,
             |    CAST(((user_id % 1024) + 1024) % 1024 AS INT) AS zx,
             |    CAST(((CAST(round(value * 100) AS BIGINT) % 1024) + 1024) % 1024 AS INT) AS zy
             |  FROM events)
             |ORDER BY event_id""".stripMargin)),

    // zone-map pruning simulation — the number that justifies a sort
    // layout at 100 TB: bucket the purchase stream into 64 equal
    // "files" under (a) natural insertion order and (b) value-sorted
    // order, record each file's min/max value (exactly the parquet
    // row-group zone map), and count how many files a 1%-band predicate
    // [25000, 26000) cents must scan under each layout. Natural order
    // scatters the band across ~every file (zone maps useless); the
    // sorted layout confines it to ~1 file — the measured gap IS the
    // argument for value-clustering this column. File assignment is
    // GlobalOrder's closed-form ntile over the range shuffle (rows are
    // data-sized; the oracle uses native ntile over the same total
    // orders — the q_global_order equivalence proof covers this).
    QueryDef(
      "q_zonemap_prune",
      (s, d) => {
        val ev = Tables.events(s, d)
          .where(col("event_type") === "purchase" && col("value").isNotNull)
          .select(col("event_id"),
            expr("CAST(round(value*100) AS BIGINT)").as("c"))
        def scanned(files: DataFrame, layout: String) = files
          .groupBy("f").agg(min("c").as("lo"), max("c").as("hi"))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("lo") < 26000L && col("hi") >= 25000L, 1L)
              .otherwise(0L)).as("files_scanned"))
          .select(lit(layout).as("layout"), col("n_files").cast("long").as("n_files"),
            col("files_scanned").cast("long").as("files_scanned"),
            expr("CAST((1000000 * files_scanned) div n_files AS BIGINT)")
              .as("scan_share_micro"))
        val nat = GlobalOrder.withGlobalNtile(ev,
          Seq(col("event_id").asc), 64, "f")
        val srt = GlobalOrder.withGlobalNtile(ev,
          Seq(col("c").asc, col("event_id").asc), 64, "f")
        scanned(nat, "natural").unionByName(scanned(srt, "value_sorted"))
          .orderBy("layout")
      },
      Some("""WITH ev AS (SELECT event_id, CAST(round(value*100) AS BIGINT) AS c
             |    FROM events WHERE event_type = 'purchase' AND value IS NOT NULL),
             |nat AS (SELECT c, ntile(64) OVER (ORDER BY event_id) AS f FROM ev),
             |srt AS (SELECT c, ntile(64) OVER (ORDER BY c, event_id) AS f FROM ev),
             |zn AS (SELECT f, min(c) AS lo, max(c) AS hi FROM nat GROUP BY 1),
             |zs AS (SELECT f, min(c) AS lo, max(c) AS hi FROM srt GROUP BY 1),
             |a AS (SELECT 'natural' AS layout, count(*) AS n_files,
             |    sum(CASE WHEN lo < 26000 AND hi >= 25000 THEN 1 ELSE 0 END) AS files_scanned
             |  FROM zn
             |  UNION ALL
             |  SELECT 'value_sorted', count(*),
             |    sum(CASE WHEN lo < 26000 AND hi >= 25000 THEN 1 ELSE 0 END)
             |  FROM zs)
             |SELECT layout, CAST(n_files AS BIGINT) AS n_files,
             |  CAST(files_scanned AS BIGINT) AS files_scanned,
             |  CAST((1000000 * files_scanned) // n_files AS BIGINT) AS scan_share_micro
             |FROM a ORDER BY layout""".stripMargin))
  )
}
