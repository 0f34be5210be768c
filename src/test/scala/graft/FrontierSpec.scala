package graft

import org.apache.spark.sql.functions._

/** The two-phase bucketed skyline must equal the quadratic definition on
  * adversarial inputs — bucket boundaries, equal-x chains, equal-y ties
  * across buckets — not just on the fixture distribution the oracle sees.
  */
class FrontierSpec extends SparkSpec {

  import spark.implicits._

  private def bruteSkyline(pts: Seq[(Double, Long)]): Set[(Double, Long)] = {
    val distinct = pts.distinct
    distinct.filter { case (x, y) =>
      !distinct.exists { case (bx, by) =>
        bx >= x && by >= y && (bx > x || by > y)
      }
    }.toSet
  }

  private def engineSkyline(pts: Seq[(Double, Long)]): Set[(Double, Long)] = {
    // same plan as q_skyline, over an in-memory frame with y as long
    val df = pts.toDF("x", "y").distinct()
      .withColumn("bucket", floor(col("x")))
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy("bucket").orderBy(col("x").desc, col("y").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val local = df.withColumn("prevMax", max("y").over(wLocal))
      .where(col("prevMax").isNull || col("y") > col("prevMax"))
    val wHigher = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bucketMax = df.groupBy("bucket").agg(max("y").as("bmax"))
      .withColumn("higherMax", max("bmax").over(wHigher))
      .select("bucket", "higherMax")
    local.join(broadcast(bucketMax), Seq("bucket"))
      .where(col("higherMax").isNull || col("y") > col("higherMax"))
      .select("x", "y")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
  }

  test("two-phase skyline equals the quadratic definition on generated inputs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      // cluster x into few integer cells so bucket boundaries and
      // duplicate x values are hit constantly
      val pts = Seq.fill(200)((rnd.nextInt(8) + rnd.nextInt(4) * 0.25,
        rnd.nextInt(20).toLong))
      assert(engineSkyline(pts) == bruteSkyline(pts), s"trial $trial")
    }
  }

  test("skyline edge cases: single point, one bucket, all-collinear") {
    assert(engineSkyline(Seq((1.0, 1L))) == Set((1.0, 1L)))
    // strictly increasing staircase: every point on the frontier... only
    // the top point survives since both coords rise together
    val stairs = (1 to 5).map(i => (i.toDouble, i.toLong))
    assert(engineSkyline(stairs) == Set((5.0, 5L)))
    // anti-chain: x rises while y falls — all survive
    val anti = (1 to 5).map(i => (i.toDouble, (10 - i).toLong))
    assert(engineSkyline(anti) == anti.toSet)
    // equal-x chain: only max y per x survives
    val chain = Seq((2.0, 1L), (2.0, 5L), (2.0, 3L))
    assert(engineSkyline(chain) == Set((2.0, 5L)))
  }
}
