package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("as-of semantics: latest at-or-before, inclusive ties, NULL before first version") {
    val left = Seq(
      (1L, 1L, "2024-01-01 10:00:00"),
      (2L, 1L, "2024-01-01 12:00:00"), // exactly at version v2 → inclusive
      (3L, 1L, "2024-01-01 09:00:00"), // before any version → NULL
      (4L, 2L, "2024-01-01 10:00:00")) // key with no versions → NULL
      .toDF("id", "k", "s")
      .select(col("id"), col("k"), col("s").cast("timestamp_ntz").as("ts"))
    val right = Seq(
      (1L, "2024-01-01 09:30:00", "v1"),
      (1L, "2024-01-01 12:00:00", "v2"))
      .toDF("k", "vs", "ver")
      .select(col("k"), col("vs").cast("timestamp_ntz").as("v_ts"), col("ver"))
    val got = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "v_ts", Seq("ver"))
      .orderBy("id").select("id", "ver").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("v1"), 2L -> Some("v2"), 3L -> None, 4L -> None))
  }

  test("forward as-of: earliest at-or-after, inclusive ties, NULL after last version") {
    val left = Seq(
      (1L, 1L, "2024-01-01 09:00:00"), // before both versions → v1
      (2L, 1L, "2024-01-01 09:30:00"), // exactly at v1 → inclusive
      (3L, 1L, "2024-01-01 13:00:00"), // after last version → NULL
      (4L, 2L, "2024-01-01 10:00:00")) // key with no versions → NULL
      .toDF("id", "k", "s")
      .select(col("id"), col("k"), col("s").cast("timestamp_ntz").as("ts"))
    val right = Seq(
      (1L, "2024-01-01 09:30:00", "v1"),
      (1L, "2024-01-01 12:00:00", "v2"))
      .toDF("k", "vs", "ver")
      .select(col("k"), col("vs").cast("timestamp_ntz").as("v_ts"), col("ver"))
    val got = AsofJoin.asofJoinForward(left, right, Seq("k"), "ts", "v_ts", Seq("ver"))
      .orderBy("id").select("id", "ver").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("v1"), 2L -> Some("v1"), 3L -> None, 4L -> None))
  }
}
