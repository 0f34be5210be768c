package graft.operators

import java.util.concurrent.ConcurrentHashMap

/** JVM-lifetime build-once cache for derived relations that several
  * registry queries consume — the U11 persisted-index convention
  * (`saveIvfIndex` / `dedupAgainstIndex`) applied to shared query
  * chains: the FIRST caller per (JVM, dataset) materializes the
  * expensive derivation as parquet; every later caller reads the stored
  * skinny tables. At 100 TB this is the honest shape — a co-purchase
  * graph or a corpus's duplicate-cluster labels are published tables a
  * report consumes, not chains each report re-runs (the reference's
  * dashboard caches query results for exactly this reason,
  * `src/app/streamlit_app.py:149`'s st.cache_data).
  *
  * Correctness contract: the builder must be DETERMINISTIC (all of ours
  * are — integer/md5 arithmetic, total orders), and `ArtifactSpec` pins
  * consume-path ≡ build-path row-for-row. The cache key includes the
  * dataset dir, so sf0.001 specs, sf0.01 verification, and sf0.1 bench
  * runs never share an artifact; the root is a fresh per-JVM temp dir,
  * so a stale artifact cannot outlive the process that built it.
  */
private[graft] object Artifacts {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft_artifacts").toString

  private val built = new ConcurrentHashMap[String, String]()

  /** Directory holding the artifact for `key`, building it exactly once
    * per JVM via `build(dir)` on first request (computeIfAbsent gives
    * the once-only locking; a throwing build leaves no mapping, so the
    * next caller retries instead of reading a half-written artifact). */
  def dirFor(key: String, build: String => Unit): String =
    built.computeIfAbsent(key, { k =>
      val dir = s"$root/${java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString}"
      build(dir)
      dir
    })
}
