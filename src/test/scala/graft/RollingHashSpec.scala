package graft

import graft.functions.{ArrayMath, RollingHash}
import org.apache.spark.sql.functions.col

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic, distinct on different strings, NULL-safe over a DataFrame") {
    val df = Seq(Some("hello world"), Some("hello worle"), Some(""), None).toDF("s")
    val got = df.select(ArrayMath.rollingHash(col("s")).as("h")).collect()
    assert(got(0).getLong(0) == RollingHash.hashBytes("hello world".getBytes("UTF-8")))
    assert(got(0).getLong(0) != got(1).getLong(0)) // one-char difference
    assert(got(2).getLong(0) == 0L)
    assert(got(3).isNullAt(0))
  }

  test("composition law: hash(x ++ y) == combine(hash(x), hash(y), |y|)") {
    val x = "the quick brown "
    val y = "fox jumps"
    val hx = RollingHash.hashBytes(x.getBytes("UTF-8"))
    val hy = RollingHash.hashBytes(y.getBytes("UTF-8"))
    val whole = RollingHash.hashBytes((x + y).getBytes("UTF-8"))
    assert(RollingHash.combine(hx, hy, y.getBytes("UTF-8").length) == whole)
  }

  test("powMod agrees with iterated multiplication") {
    var p = 1L
    for (e <- 0 to 70) {
      assert(RollingHash.powMod(e) == p, s"e=$e")
      // iterate using the same 61-bit modular multiply
      p = RollingHash.combine(p, 0L, 1) // p * B^1 + 0
    }
  }

  test("type check rejects non-string input at analysis time") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("n").select(ArrayMath.rollingHash(col("n"))).collect()
    }
    assert(e.getMessage.contains("rolling_hash requires a string input"))
  }
}
