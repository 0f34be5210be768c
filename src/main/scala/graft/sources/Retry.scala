package graft.sources

import org.apache.spark.internal.Logging

/** Transport retry with exponential backoff + full jitter (SURVEY §2.1
  * S1; reference `fetch_with_retry`, src/trv/endpoints.py:34-57: capped
  * exponential backoff around the HTTP POST). Runs executor-side around
  * each per-partition page fetch, so one flaky page retries alone instead
  * of failing the whole Spark task (task-level retry would re-fetch every
  * row the task already produced).
  *
  * Full jitter (delay ∈ [0, base·2^attempt], capped) is the AWS
  * architecture-blog recommendation for fleets: with 1000 executors
  * hammering a recovering endpoint, deterministic backoff synchronizes
  * the retry storm; jitter spreads it.
  */
object Retry extends Logging {

  /** Transient-transport classifier: IO and XML-parse hiccups retry;
    * anything else (schema errors, NPEs — bugs, not weather) propagates
    * immediately. */
  def transient(t: Throwable): Boolean = t match {
    case _: java.io.IOException => true
    case _: org.xml.sax.SAXException => true
    case _ => false
  }

  /** Run `op`, retrying up to `maxAttempts` total attempts on throwables
    * matching `retryOn`, sleeping base·2^attempt ms (full-jittered,
    * capped at `maxDelayMs`) between attempts. */
  def withBackoff[T](maxAttempts: Int, baseDelayMs: Long, maxDelayMs: Long = 10000L,
      retryOn: Throwable => Boolean = transient)(op: => T): T = {
    require(maxAttempts >= 1, s"maxAttempts must be >= 1, got $maxAttempts")
    var attempt = 0
    while (true) {
      try return op
      catch {
        case t: Throwable if retryOn(t) && attempt < maxAttempts - 1 =>
          val cap = math.min(maxDelayMs, baseDelayMs << attempt)
          val sleep = if (cap <= 0) 0L
            else java.util.concurrent.ThreadLocalRandom.current().nextLong(cap + 1)
          attempt += 1
          logWarning(s"transient failure (attempt $attempt/$maxAttempts), " +
            s"retrying in ${sleep}ms: ${t.getClass.getSimpleName}: ${t.getMessage}")
          if (sleep > 0) Thread.sleep(sleep)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
