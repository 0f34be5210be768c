package graft

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
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
  *   1. claim a version number by create-exclusive `v_<n>.claim`; claims
  *      are PERMANENT (never deleted), so a claimed number can never be
  *      re-claimed by a publisher working from a stale listing. After the
  *      claim, the version directory is re-checked — if it already exists
  *      the number is abandoned and the claim loop continues.
  *   2. write parquet to `v_<n>.tmp` (invisible to readers),
  *   3. rename to `v_<n>` (atomic on HDFS; complete-or-absent everywhere),
  *   4. create-exclusive marker `_latest.v<n>`; stale markers are
  *      best-effort deleted afterwards. The latest version is the MAX
  *      marker, so the flip is a single atomic create — there is no
  *      delete-then-rename window in which no pointer exists.
  * A crash at any step leaves either nothing visible (before 3) or a
  * complete orphan version the next publish supersedes (between 3 and 4);
  * a leaked `.claim`/`.tmp` burns a number but is ignored by every read
  * path.
  *
  * Concurrency honesty: step 1's mutual exclusion is as atomic as the
  * filesystem's `create(overwrite = false)` — a real metadata op on HDFS,
  * but check-then-create on the local filesystem and object stores. On
  * those, run a single publisher per table (the same constraint
  * Delta-style formats have without an external lock service); the
  * protocol still protects against crashes, stale listings, and any
  * SEQUENTIAL interleaving — only truly simultaneous local claims race.
  */
object Snapshots {

  private val VersionDir = "^v_(\\d+)$".r
  private val ClaimFile = "^v_(\\d+)\\.claim$".r
  private val LatestMarker = "^_latest\\.v(\\d+)$".r

  private def versionPath(root: String, v: Long) = new Path(f"$root/v_$v%05d")
  private def claimPath(root: String, v: Long) =
    new Path(versionPath(root, v).toString + ".claim")
  private def markerPath(root: String, v: Long) = new Path(s"$root/_latest.v$v")

  private def statuses(fs: FileSystem, root: String): Seq[FileStatus] = {
    val rootPath = new Path(root)
    if (!fs.exists(rootPath)) Seq.empty
    else {
      val st = fs.listStatus(rootPath)
      if (st == null) Seq.empty else st.toSeq
    }
  }

  /** All complete versions on disk, ascending (includes orphans a crashed
    * publish left behind — they are valid snapshots, just never latest).
    * Only DIRECTORIES count: a stray file named `v_<n>` is an artifact. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val (fs, _) = AtomicPublish.fsFor(spark, root)
    statuses(fs, root).collect {
      case s if s.isDirectory =>
        s.getPath.getName match { case VersionDir(n) => Some(n.toLong); case _ => None }
    }.flatten.sorted
  }

  /** Latest published version number: max committed marker, falling back
    * to the legacy one-line `_latest` pointer file (tables written by the
    * pre-marker protocol stay readable). */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val (fs, _) = AtomicPublish.fsFor(spark, root)
    val ms = statuses(fs, root).map(_.getPath.getName)
      .collect { case LatestMarker(n) => n.toLong }
    if (ms.nonEmpty) Some(ms.max)
    else {
      val legacy = new Path(s"$root/_latest")
      if (!fs.exists(legacy)) None
      else {
        val in = fs.open(legacy)
        try {
          val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          if (s.isEmpty) None else Some(s.toLong)
        } finally in.close()
      }
    }
  }

  /** Publish `df` as the next version; returns the version number. The
    * input may read from any existing snapshot of the same table (the new
    * version is staged beside, not over, what it reads). */
  def publish(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val (fs, rootPath) = AtomicPublish.fsFor(spark, root)
    fs.mkdirs(rootPath)
    // step 1: claim a number nothing has committed, staged, or claimed
    val names = statuses(fs, root).map(_.getPath.getName)
    val taken = names.collect {
      case VersionDir(n) => n.toLong
      case ClaimFile(n) => n.toLong
      case LatestMarker(n) => n.toLong
    } ++ latestVersion(spark, root) // legacy pointer also reserves its target
    var next = 1L + taken.foldLeft(0L)(math.max)
    var claimed = false
    while (!claimed) {
      val claim = claimPath(root, next)
      val won =
        try { fs.create(claim, false).close(); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case e: java.io.IOException =>
            // FS implementations differ in what they throw for an
            // existing file; only treat it as a lost race if the claim
            // is actually there — otherwise it's a real error
            if (fs.exists(claim)) false else throw e
        }
      // a publisher that predates its stale listing may have committed
      // this number already (its claim could predate our listing too):
      // never rename onto an existing version directory
      claimed = won && !fs.exists(versionPath(root, next))
      if (!claimed) next += 1
    }
    // step 2: stage (the permanent claim makes this path exclusively ours)
    val tmp = new Path(versionPath(root, next).toString + ".tmp")
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    // step 3: commit the immutable version directory
    require(fs.rename(tmp, versionPath(root, next)),
      s"could not commit snapshot v_$next under $root")
    // step 4: flip latest via a single atomic create — never a window
    // with no marker; readers take the max. Older-marker cleanup is
    // best-effort (a stale marker just loses the max() race).
    fs.create(markerPath(root, next), false).close()
    names.collect { case LatestMarker(n) if n.toLong < next => n.toLong }
      .foreach(v => fs.delete(markerPath(root, v), false))
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
    * the latest pointer resolves to is never deleted, whatever `keep`
    * says. */
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
