package graft

import org.apache.spark.sql.types.TimestampNTZType

/** Tripwire against driver-side fixture regeneration (r4: ANSI-overflowing
  * values; r5/r6: events.ts NANOS → MICROS). Fails loudly, with the drift
  * spelled out, if `/root/testdata` no longer matches the logical shape the
  * loaders normalize — so a fixture change surfaces as ONE red spec naming
  * the table/column, not 86 identical analysis errors. */
class FixtureDriftSpec extends SparkSpec {

  test("fixture schemas match the expected logical shape (sf0.001)") {
    val drift = FixtureCheck.check(spark, sf)
    assert(drift.isEmpty, s"\nFIXTURE DRIFT:\n${drift.mkString("\n")}")
  }

  test("Tables.events normalizes real fixture ts to timestamp_ntz") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampNTZType)
    // and analysis+execution actually work on the real file — this is the
    // exact surface that silently broke for two rounds
    val n = ev.filter(ev.col("ts").isNotNull).count()
    assert(n > 0L, "events fixture has no non-null ts rows")
    // both the min and max must land in the documented 2024 range — a
    // unit-confusion bug (ns read as µs) would throw the dates off by ~50k×
    val mm = ev.selectExpr("min(ts)", "max(ts)").head()
    val (lo, hi) =
      (mm.getAs[java.time.LocalDateTime](0), mm.getAs[java.time.LocalDateTime](1))
    assert(lo.getYear >= 2020 && hi.getYear <= 2030,
      s"events ts range [$lo, $hi] outside plausible fixture epoch")
  }
}
