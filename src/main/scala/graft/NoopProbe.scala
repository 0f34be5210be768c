package graft

import org.apache.spark.sql.SparkSession

/** Dev-only noop-sink timer (guide §1.4): computes EVERY column of every
  * row of the named queries and discards the result, so projections that
  * `.count()` would prune (e.g. a reassembled text column) are honestly
  * paid. Two runs per query, pins released between; both times printed.
  *
  * Usage: sbt "runMain graft.NoopProbe <sfDir> q_a q_b ..."
  */
object NoopProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
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
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      graft.operators.GlobalOrder.release(blocking = true)
      sec
    }
    for (n <- args.tail) {
      try {
        val a = once(n); val b = once(n)
        println(f"| $n | noop run1 $a%.2f | run2 $b%.2f |")
      } catch {
        case t: Throwable => println(s"| $n | ERROR ${t.getClass.getSimpleName}: " +
          s"${Option(t.getMessage).getOrElse("").take(120)} |")
      }
    }
    spark.stop()
  }
}
