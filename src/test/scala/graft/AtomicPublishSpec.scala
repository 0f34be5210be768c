package graft

import java.io.File
import java.nio.file.Files

class AtomicPublishSpec extends SparkSpec {
  import spark.implicits._

  test("overwrite keeps a readable table through crash points, incl. recovery runs") {
    val dir = Files.createTempDirectory("graft-pub").toString + "/t"
    AtomicPublish.overwrite(Seq(1, 2).toDF("x"), dir)
    assert(AtomicPublish.readIfExists(spark, dir).get.count() == 2)

    // simulate crash between target→bak and tmp→target: only .bak exists
    assert(new File(dir).renameTo(new File(dir + ".bak")))
    assert(AtomicPublish.readIfExists(spark, dir).get.count() == 2) // bak fallback

    // recovery run must publish the new table BEFORE deleting the backup;
    // afterwards target exists, bak is gone
    AtomicPublish.overwrite(Seq(1, 2, 3).toDF("x"), dir)
    assert(new File(dir).exists() && !new File(dir + ".bak").exists())
    assert(spark.read.parquet(dir).count() == 3)
  }
}
