package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned table snapshots with time travel: every publish writes a new
  * immutable `v_<n>` directory and then commits an atomically-created
  * `_latest.v<n>` marker file, so readers always resolve a COMPLETE
  * snapshot — there is no instant at which the table is partially or not
  * visible, and old versions stay readable until [[expire]]d. This is the
  * append-only complement to [[AtomicPublish]] (which swaps one live
  * directory in place): publish history + reproducible reads ("train on
  * the exact corpus snapshot the eval ran against") at the cost of
  * keeping N copies.
  *
  * Commit protocol, in write order:
  *   1. claim a version number by create-exclusive `v_<n>.claim` (two
  *      concurrent publishers can never claim the same n — the loser's
  *      create fails and it retries with n+1, so no rename can ever land
  *      inside another publisher's committed directory),
  *   2. write parquet to `v_<n>.tmp` (invisible to readers),
  *   3. rename to `v_<n>` (atomic on HDFS; complete-or-absent everywhere),
  *   4. create-exclusive marker `_latest.v<n>`; stale markers are
  *      best-effort deleted afterwards. The latest version is the MAX
  *      marker, so the flip is a single atomic create — there is no
  *      delete-then-rename window in which no pointer exists.
  * A crash at any step leaves either nothing visible (before 3) or a
  * complete orphan version the next publish supersedes (between 3 and 4);
  * a leaked `.claim`/`.tmp` burns a number but is ignored by every read
  * path. Same [[FileSystem]]-API discipline as [[AtomicPublish]] — local
  * disk, HDFS, or any connector-backed store.
  */
object Snapshots {

  private val VersionDir = "^v_(\\d+)$".r
  private val ClaimFile = "^v_(\\d+)\\.claim$".r
  private val LatestMarker = "^_latest\\.v(\\d+)$".r

  private def versionPath(root: String, v: Long) = new Path(f"$root/v_$v%05d")

  private def names(fs: FileSystem, root: String): Seq[String] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else {
      val st = fs.listStatus(rootPath)
      if (st == null) Seq.empty else st.toSeq.map(_.getPath.getName)
    }
  }

  /** All complete versions on disk, ascending (includes orphans a crashed
    * publish left behind — they are valid snapshots, just never latest). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, _) = AtomicPublish.fsFor(spark, root)
    names(fs, root).collect { case VersionDir(n) => n.toLong }.sorted
  }

  /** Latest published version number (max committed marker), if any. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, _) = AtomicPublish.fsFor(spark, root)
    val ms = names(fs, root).collect { case LatestMarker(n) => n.toLong }
    if (ms.isEmpty) None else Some(ms.max)
  }

  /** Publish `df` as the next version; returns the version number. The
    * input may read from any existing snapshot of the same table (the new
    * version is staged beside, not over, what it reads). */
  def publish(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val (fs, rootPath) = AtomicPublish.fsFor(spark, root)
    fs.mkdirs(rootPath)
    // step 1: claim a number nothing else has committed, staged, or claimed
    val taken = names(fs, root).collect {
      case VersionDir(n) => n.toLong
      case ClaimFile(n) => n.toLong
      case LatestMarker(n) => n.toLong
    }
    var next = 1L + taken.foldLeft(0L)(math.max)
    var claimed = false
    while (!claimed) {
      try {
        fs.create(new Path(s"$root/v_" + f"$next%05d" + ".claim"), false).close()
        claimed = true
      } catch {
        case _: java.io.IOException => next += 1 // raced by another publisher
      }
    }
    val claim = new Path(s"$root/v_" + f"$next%05d" + ".claim")
    // step 2: stage (the claim makes this path exclusively ours)
    val tmp = new Path(versionPath(root, next).toString + ".tmp")
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    // step 3: commit the immutable version directory
    require(fs.rename(tmp, versionPath(root, next)),
      s"could not commit snapshot v_$next under $root")
    // step 4: flip latest via a single atomic create — never a window
    // with no marker; readers take the max
    fs.create(new Path(s"$root/_latest.v$next"), false).close()
    // best-effort cleanup: older markers and our claim. Failures here are
    // harmless — stale markers lose the max() race, claims are ignored.
    names(fs, root).collect { case LatestMarker(n) if n.toLong < next => n.toLong }
      .foreach(v => fs.delete(new Path(s"$root/_latest.v$v"), false))
    fs.delete(claim, false)
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
    * the latest marker points at is never deleted, whatever `keep` says. */
  def expire(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "must keep at least one version")
    val (fs, _) = AtomicPublish.fsFor(spark, root)
    val current = latestVersion(spark, root)
    val all = versions(spark, root)
    val doomed = all.dropRight(keep).filterNot(current.contains)
    doomed.foreach(v => fs.delete(versionPath(root, v), true))
    doomed
  }
}
