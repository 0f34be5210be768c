package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe table publication. A plain `mode("overwrite")` onto the
  * directory being read deletes the old files before committing new ones —
  * a mid-write crash loses the published table (the reference's SQLite
  * upsert was transactional, src/trv/load_sqlite.py:43-62). Writing to a
  * sibling temp dir and swapping via rename keeps a complete table on
  * disk at every instant, and lets the plan read the old target while
  * writing the new one (no lineage break / memory pin needed).
  *
  * All filesystem traffic goes through Hadoop's [[FileSystem]] resolved
  * from the target URI, so the same code publishes to local disk, HDFS,
  * or any `FileSystem`-backed store. On HDFS the two renames are atomic
  * metadata ops; on object stores whose connector implements rename as
  * copy+delete the window is wider but the ordering invariant below still
  * guarantees a complete table exists at either the target or the backup.
  */
object AtomicPublish {

  // shared with Snapshots — the one place FS resolution is spelled
  private[graft] def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    (p.getFileSystem(conf), p)
  }

  /** True if `p` exists and directly contains at least one parquet part.
    * `listStatus` is only called behind `exists` (it throws on a missing
    * path; some local implementations return null-like empties). */
  private def hasParquet(fs: FileSystem, p: Path): Boolean =
    fs.exists(p) && {
      val st = fs.listStatus(p)
      st != null && st.exists(_.getPath.getName.endsWith(".parquet"))
    }

  /** Read the current target if a published table exists (recovers from a
    * crash between the two renames by falling back to the backup). */
  def readIfExists(spark: SparkSession, targetDir: String): Option[DataFrame] = {
    val (fs, target) = fsFor(spark, targetDir)
    val bak = new Path(targetDir + ".bak")
    if (hasParquet(fs, target)) Some(spark.read.parquet(targetDir))
    else if (hasParquet(fs, bak)) Some(spark.read.parquet(bak.toString))
    else None
  }

  /** Write `df` as the new content of `targetDir`: tmp write → backup
    * swap → cleanup. `df` may read from the current target (or the
    * backup, on a recovery re-run). Ordering invariant: at every instant
    * either `targetDir` or `targetDir.bak` holds a complete table — in
    * particular, on a recovery run (no target, only .bak) the new table
    * is published BEFORE the backup is deleted. */
  def overwrite(df: DataFrame, targetDir: String): Unit = {
    val spark = df.sparkSession
    val (fs, target) = fsFor(spark, targetDir)
    val tmp = new Path(targetDir + ".tmp")
    val bak = new Path(targetDir + ".bak")
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(target)) {
      fs.delete(bak, true)
      require(fs.rename(target, bak), s"could not stage backup of $targetDir")
    }
    require(fs.rename(tmp, target), s"could not publish $targetDir")
    fs.delete(bak, true)
  }
}
