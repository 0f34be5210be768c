package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only diagnostic for the inverse-scaling cohort (r16 verdict item 3):
  * runs named queries and reports wall time, JOB count, STAGE count and
  * TASK count per query — the direct evidence for "this query's 32-core
  * slowness is scheduling structure, not data movement". Honors the bench
  * env contract (`SPARK_GRAFT_CPUS`, `SPARK_GRAFT_SF_DIR`) so 8-vs-32-core
  * runs are one env flip. Two timed runs per query (min-of-2, pins
  * released between, the Bench contract); counts are from run 2 so the
  * numbers describe the steady state, not parquet-footer warmup.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.JobProbe q_a q_b ..."
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })

    def once(name: String): (Double, Int, Int, Long) = {
      // listener events are async; a short settle before reset and after
      // the action keeps counts per-run (diagnostic precision, not timing)
      Thread.sleep(500)
      jobs.set(0); stages.set(0); tasks.set(0L)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.operators.GlobalOrder.release(blocking = true)
      Thread.sleep(500)
      (sec, jobs.get(), stages.get(), tasks.get())
    }

    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q_weighted_median", "q_conductance", "q_minhash_accuracy", "q_gbm_round")
    println(f"| query | cpus | run1 s | run2 s | jobs(r2) | stages(r2) | tasks(r2) |")
    println("|---|---:|---:|---:|---:|---:|---:|")
    for (n <- names) {
      try {
        val r1 = once(n)
        val r2 = once(n)
        println(f"| $n | $cpus | ${r1._1}%.2f | ${r2._1}%.2f | ${r2._2} | ${r2._3} | ${r2._4} |")
      } catch {
        case t: Throwable =>
          println(s"| $n | ERROR ${t.getClass.getSimpleName}: " +
            s"${Option(t.getMessage).getOrElse("").take(120)} |")
      }
    }
    spark.stop()
  }
}
