package graft

import graft.operators.CoreQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class CoreOpsSpec extends SparkSpec {
  import spark.implicits._

  private def now = expr("TIMESTAMP_NTZ '2024-01-15 00:00:00'")

  test("statusOf trichotomy: future → KOMMANDE, ongoing/open-ended → PÅGÅR, ended → NULL") {
    val df = Seq(
      ("future", "2024-01-20 00:00:00", Some("2024-01-25 00:00:00")),
      ("ongoing", "2024-01-10 00:00:00", Some("2024-01-20 00:00:00")),
      ("open", "2024-01-10 00:00:00", None),
      ("ended", "2024-01-01 00:00:00", Some("2024-01-02 00:00:00")))
      .toDF("name", "s", "e")
      .select(col("name"), col("s").cast("timestamp_ntz").as("s"),
        col("e").cast("timestamp_ntz").as("e"))
    val got = df.select(col("name"), CoreQueries.statusOf(col("s"), col("e"), now).as("st"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got == Map("future" -> Some("KOMMANDE"), "ongoing" -> Some("PÅGÅR"),
      "open" -> Some("PÅGÅR"), "ended" -> None))
  }

  test("latestWins keeps exactly the max row per key and is idempotent") {
    val df = Seq((1L, 10, "a"), (1L, 20, "b"), (2L, 5, "c"), (2L, 5, "d"))
      .toDF("k", "v", "tag")
    val once = CoreQueries.latestWins(df, Seq("k"), Seq(col("v").desc, col("tag").desc))
    val twice = CoreQueries.latestWins(once, Seq("k"), Seq(col("v").desc, col("tag").desc))
    val got = once.orderBy("k").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 20, "b"), (2L, 5, "d")))
    assert(twice.orderBy("k").collect().toSeq == once.orderBy("k").collect().toSeq)
  }

  test("upsert is idempotent and update side wins") {
    val target = Seq((1L, "old"), (2L, "keep")).toDF("k", "v")
    val updates = Seq((1L, "new"), (3L, "ins")).toDF("k", "v")
    val once = CoreQueries.upsert(target, updates, Seq("k"))
    val again = CoreQueries.upsert(once, updates, Seq("k"))
    val got = once.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "new"), (2L, "keep"), (3L, "ins")))
    assert(again.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq == got)
  }

  test("upsert commutes over update batch order (latest batch wins per key)") {
    val target = Seq((1L, "t")).toDF("k", "v")
    val u1 = Seq((1L, "u1")).toDF("k", "v")
    val u2 = Seq((2L, "u2")).toDF("k", "v")
    val a = CoreQueries.upsert(CoreQueries.upsert(target, u1, Seq("k")), u2, Seq("k"))
    val b = CoreQueries.upsert(CoreQueries.upsert(target, u2, Seq("k")), u1, Seq("k"))
    assert(a.orderBy("k").collect().toSeq == b.orderBy("k").collect().toSeq)
  }

  test("textSearch treats NULL columns as no-match, not NULL (pandas na=False)") {
    val df = Seq(
      (1, Some("needle here"), None: Option[String]),
      (2, None: Option[String], None: Option[String]),
      (3, None: Option[String], Some("NEEDLE upper")))
      .toDF("id", "a", "b")
    val got = df.where(CoreQueries.textSearch(Seq(col("a"), col("b")), "needle"))
      .select("id").as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 3))
  }

  test("wktPoint lon/lat parse POINT and yield NULL on malformed input") {
    val df = Seq("POINT (12.5 -3.25)", "LINESTRING (0 0, 1 1)", "garbage", "")
      .toDF("wkt")
    val got = df.select(
      CoreQueries.wktPointLon(col("wkt")).as("lon"),
      CoreQueries.wktPointLat(col("wkt")).as("lat")).collect()
    assert(got(0) == Row(12.5, -3.25))
    assert(got(1) == Row(null, null))
    assert(got(2) == Row(null, null))
    assert(got(3) == Row(null, null))
  }
}
