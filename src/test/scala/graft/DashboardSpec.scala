package graft

import org.apache.spark.sql.functions._

class DashboardSpec extends SparkSpec {
  import spark.implicits._

  private lazy val incidents = Seq(
    ("a", "PÅGÅR", Some("Stockholms län"), "2024-01-05 10:00:00", "Crash on ramp", "E4 north", "E4", Some(59.3), Some(18.0), "Olycka"),
    ("b", "PÅGÅR", Some("Skåne län"), "2024-01-06 11:00:00", "Roadwork lane closed", "E6 south", "E6", Some(55.6), Some(13.0), "Vägarbete"),
    ("c", "KOMMANDE", None, "2024-01-07 12:00:00", "Planned closure", "E18 west", "E18", None, None, "Avstängning"),
    ("d", "PÅGÅR", Some("Stockholms län"), "2024-01-01 09:00:00", "Old crash", "E4 south", "E4", Some(59.2), Some(17.9), "Olycka"))
    .toDF("incident_id", "status", "county_name", "s", "message",
      "location_descriptor", "road_number", "latitude", "longitude", "message_type")
    .withColumn("start_ts", col("s").cast("timestamp_ntz")).drop("s")

  private lazy val base = Dashboard.baseView(spark, incidents,
    Some(expr("TIMESTAMP_NTZ '2024-01-02 00:00:00'")))

  test("base view applies the scan window, coalesces display name, and caches") {
    assert(base.count() == 3) // 'd' is before the window
    assert(base.where(col("incident_id") === "c").head()
      .getAs[String]("county_display") == "Okänt län")
    assert(base.storageLevel.useMemory)
  }

  test("filter chain composes conjunctively with na=False text semantics") {
    val f = Dashboard.Filters(statuses = Seq("PÅGÅR"), freeText = Some("crash"))
    val got = Dashboard.applyFilters(base, f).select("incident_id").as[String].collect()
    assert(got.toSeq == Seq("a"))
    val geo = Dashboard.applyFilters(base, Dashboard.Filters(geoOnly = true))
    assert(geo.count() == 2) // 'c' has no coords
  }

  test("kpis / county counts / table / trend / histogram over the shared view") {
    assert(Dashboard.kpis(base) == ((2L, 1L, 3L)))
    val counties = Dashboard.countyCounts(base, Some(2))
      .as[(String, Long)].collect().toSeq
    assert(counties.head._2 == 1 && counties.size == 2)
    val table = Dashboard.tableView(base, "start_ts", ascending = false, 2)
      .select("incident_id").as[String].collect()
    assert(table.toSeq == Seq("c", "b"))
    assert(Dashboard.dailyTrend(base).count() == 3)
    assert(Dashboard.typeHistogram(base).head().getLong(1) == 1)
    assert(Dashboard.mapPoints(base).count() == 2)
  }

  test("mapPoints imputes missing coordinates from county centers") {
    // give 'c' a county that IS in the dim but keep its NULL coords
    val withCounty = base.withColumn("county_display",
      when(col("incident_id") === "c", "Uppsala län").otherwise(col("county_display")))
    // default: dropped; approxMissing: back-filled with the county center
    assert(Dashboard.mapPoints(withCounty).count() == 2)
    val imputed = Dashboard.mapPoints(withCounty, approxMissing = true)
    assert(imputed.count() == 3)
    val c = imputed.where(col("incident_id") === "c").head()
    assert(c.getAs[Double]("latitude") == 59.858 && c.getAs[Double]("longitude") == 17.638)
    // a county outside the dim still drops (reference (None, None) default)
    val unknown = base // 'c' has county_display "Okänt län" — not in the dim
    assert(Dashboard.mapPoints(unknown, approxMissing = true).count() == 2)
  }

  test("viewport computes center and the reference zoom ladder") {
    val v = Dashboard.viewport(Dashboard.mapPoints(base)).head()
    // lat 55.6..59.3, lon 13.0..18.0 → span 5.0 → zoom 4
    assert(math.abs(v.getAs[Double]("span") - 5.0) < 1e-9)
    assert(v.getAs[Int]("zoom") == 4)
  }
}
