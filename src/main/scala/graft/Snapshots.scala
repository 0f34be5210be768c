package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table snapshots with time travel: every publish writes a new
  * immutable `v_<n>` directory and then flips a one-line `_latest` pointer
  * file, so readers always resolve a COMPLETE snapshot — there is no
  * instant at which the table is partially visible, and old versions stay
  * readable until [[expire]]d. This is the append-only complement to
  * [[AtomicPublish]] (which swaps one live directory in place): publish
  * history + reproducible reads ("train on the exact corpus snapshot the
  * eval ran against") at the cost of keeping N copies.
  *
  * Commit protocol, in write order:
  *   1. write parquet to `v_<n>.tmp` (invisible to readers),
  *   2. rename to `v_<n>` (atomic on HDFS; complete-or-absent everywhere),
  *   3. write `_latest.tmp` containing "n", rename over `_latest`.
  * A crash between (2) and (3) leaves a complete orphan version the next
  * publish simply supersedes; `_latest` never points at an incomplete
  * directory. Same [[FileSystem]]-API discipline as [[AtomicPublish]] —
  * local disk, HDFS, or any connector-backed store.
  */
object Snapshots {

  private def fsFor(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    val conf: Configuration = spark.sparkContext.hadoopConfiguration
    (p.getFileSystem(conf), p)
  }

  private def versionPath(root: String, v: Long) = new Path(f"$root/v_$v%05d")
  private def latestPath(root: String) = new Path(s"$root/_latest")

  private def readPointer(fs: FileSystem, root: String): Option[Long] = {
    val p = latestPath(root)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        if (s.isEmpty) None else Some(s.toLong)
      } finally in.close()
    }
  }

  /** All complete versions on disk, ascending (includes orphans a crashed
    * publish left behind — they are valid snapshots, just never latest). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, rootPath) = fsFor(spark, root)
    if (!fs.exists(rootPath)) Seq.empty
    else {
      val st = fs.listStatus(rootPath)
      if (st == null) Seq.empty
      else st.toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("v_"))
        .map(_.getPath.getName.stripPrefix("v_").toLong)
        .sorted
    }
  }

  /** Latest published version number, if any. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    readPointer(fsFor(spark, root)._1, root)

  /** Publish `df` as the next version; returns the version number. The
    * input may read from any existing snapshot of the same table (the new
    * version is staged beside, not over, what it reads). */
  def publish(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val (fs, rootPath) = fsFor(spark, root)
    fs.mkdirs(rootPath)
    // next = 1 + max(pointer, dirs on disk): a crash after the version
    // rename but before the pointer flip must not be overwritten
    val next = 1L + (readPointer(fs, root).toSeq ++ versions(spark, root))
      .foldLeft(0L)(math.max)
    val tmp = new Path(versionPath(root, next).toString + ".tmp")
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(tmp, versionPath(root, next)),
      s"could not commit snapshot v_$next under $root")
    val ptrTmp = new Path(latestPath(root).toString + ".tmp")
    val out = fs.create(ptrTmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(latestPath(root), false)
    require(fs.rename(ptrTmp, latestPath(root)),
      s"could not flip _latest to v_$next under $root")
    next
  }

  /** Read the latest published snapshot. */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val v = latestVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"no published snapshot under $root"))
    readVersion(spark, root, v)
  }

  /** Time travel: read an exact pinned version. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame =
    spark.read.parquet(versionPath(root, v).toString)

  /** Retention: delete all but the newest `keep` versions. The version
    * `_latest` points at is never deleted, whatever `keep` says. */
  def expire(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least one version")
    val (fs, _) = fsFor(spark, root)
    val current = readPointer(fs, root)
    val all = versions(spark, root)
    val doomed = all.dropRight(keep).filterNot(current.contains)
    doomed.foreach(v => fs.delete(versionPath(root, v), true))
    doomed
  }
}
