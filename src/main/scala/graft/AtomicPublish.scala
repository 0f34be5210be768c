package graft

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe table publication. A plain `mode("overwrite")` onto the
  * directory being read deletes the old files before committing new ones —
  * a mid-write crash loses the published table (the reference's SQLite
  * upsert was transactional, src/trv/load_sqlite.py:43-62). Writing to a
  * sibling temp dir and swapping via rename keeps a complete table on
  * disk at every instant, and lets the plan read the old target while
  * writing the new one (no lineage break / memory pin needed).
  */
object AtomicPublish {

  /** Read the current target if a published table exists (recovers from a
    * crash between the two renames by falling back to the backup). */
  def readIfExists(spark: SparkSession, targetDir: String): Option[DataFrame] = {
    def hasParquet(f: File) =
      f.exists() && f.listFiles().exists(_.getName.endsWith(".parquet"))
    val target = new File(targetDir)
    val bak = new File(targetDir + ".bak")
    if (hasParquet(target)) Some(spark.read.parquet(targetDir))
    else if (hasParquet(bak)) Some(spark.read.parquet(bak.getPath))
    else None
  }

  /** Write `df` as the new content of `targetDir`: tmp write → backup
    * swap → cleanup. `df` may read from the current target (or the
    * backup, on a recovery re-run). Ordering invariant: at every instant
    * either `targetDir` or `targetDir.bak` holds a complete table — in
    * particular, on a recovery run (no target, only .bak) the new table
    * is published BEFORE the backup is deleted. */
  def overwrite(df: DataFrame, targetDir: String): Unit = {
    val target = new File(targetDir)
    val tmp = new File(targetDir + ".tmp")
    val bak = new File(targetDir + ".bak")
    deleteRecursively(tmp)
    df.write.mode("overwrite").parquet(tmp.getPath)
    if (target.exists()) {
      deleteRecursively(bak)
      require(target.renameTo(bak), s"could not stage backup of $targetDir")
    }
    require(tmp.renameTo(target), s"could not publish $targetDir")
    deleteRecursively(bak)
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists()) f.delete()
  }
}
