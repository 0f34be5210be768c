package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main: `runMain graft.Scratch q_name [q_name2 ...]`
  * prints the formatted physical plan of each named query (default: a
  * representative set) at sf0.001. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("fix-probe")) {
      import org.apache.spark.sql.functions._
      val xml =
        """<RESPONSE><RESULT><Situation><Id>s1</Id>
          |<ModifiedTime>2024-01-09T10:00:00Z</ModifiedTime>
          |<PublicationTime>2024-01-09T10:00:00Z</PublicationTime>
          |<Deviation><DeviationId>d1</DeviationId><Message>Crash</Message>
          |<MessageType>Olycka</MessageType><LocationDescriptor>E4</LocationDescriptor>
          |<RoadNumber>E4</RoadNumber><CountyNo>1</CountyNo>
          |<StartTime>2024-01-09T00:00:00Z</StartTime>
          |<WGS84>POINT (18 59)</WGS84></Deviation>
          |<Deviation><DeviationId>d2</DeviationId><Message>Roadwork</Message>
          |<MessageType>Vägarbete</MessageType><LocationDescriptor>E6</LocationDescriptor>
          |<RoadNumber>E6</RoadNumber><CountyNo>12</CountyNo>
          |<StartTime>2024-01-20T00:00:00Z</StartTime>
          |<WGS84>POINT (13 55)</WGS84></Deviation>
          |</Situation></RESULT></RESPONSE>""".stripMargin
      val dir = java.nio.file.Files.createTempDirectory("graft-fix").toString
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/sit.xml"), xml)
      val now = expr("TIMESTAMP_NTZ '2024-01-10 00:00:00'")
      Pipeline.runIngest(spark, s"$dir/sit.xml", s"$dir/tgt", now)
      // simulate a crash between the two publish renames: target gone,
      // backup present — the next ingest must recover from .bak
      val t = new java.io.File(s"$dir/tgt")
      assert(t.renameTo(new java.io.File(s"$dir/tgt.bak")))
      val recovered = Pipeline.runIngest(spark, s"$dir/sit.xml", s"$dir/tgt", now)
      println(s"recovered rows after simulated crash = ${recovered.count()}")
      // malformed dashboard date filter: must filter nothing out cleanly
      val base = Dashboard.baseView(spark, recovered, None, cache = false)
      val n = Dashboard.applyFilters(base,
        Dashboard.Filters(tsFrom = Some("01/05/2024 not-a-date"))).count()
      println(s"rows under malformed tsFrom filter = $n (no throw)")
      // truncated scan warning
      spark.read.format("graft.sources.PagedXmlSource")
        .option("path", s"$dir/sit.xml").option("pageSize", "1").option("maxPages", "1")
        .load().count()
      println("maxPages=1 scan done (see warning above)")
      // multimodal resize + frame-sample stages over real documents
      val pay = operators.Multimodal.withPayload(
        Tables.documents(spark, "/root/testdata/sf0.001").limit(10))
      operators.Multimodal.resizeAll(spark, pay, 16, 16)
        .agg(count(lit(1)).as("docs"), max("n_bytes").as("max_bytes")).show()
      println(s"frames = ${operators.Multimodal.sampleFrames(spark, pay, 4).count()}")
      // physical layout: bucketed join plan + partition pruning
      spark.sql("DROP TABLE IF EXISTS probe_bucketed")
      operators.Layout.writeBucketed(
        Tables.events(spark, "/root/testdata/sf0.001").select("event_id", "user_id"),
        "probe_bucketed", 8, Seq("user_id"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.table("probe_bucketed").groupBy("user_id").count().explain()
      val pdir = dir + "/daily"
      operators.Layout.writeDailyPartitioned(
        Tables.events(spark, "/root/testdata/sf0.001"), "ts", pdir)
      operators.Layout.readDays(spark, pdir, "2024-01-10", "2024-01-12").explain()
    } else if (args.headOption.contains("sess-probe")) {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.streaming.Trigger
      val dir = java.nio.file.Files.createTempDirectory("graft-sessp").toString
      def runOnce(): Unit = {
        val stream = spark.readStream
          .schema("user_id LONG, ts TIMESTAMP, value DOUBLE").parquet(s"$dir/src")
          .withWatermark("ts", "10 minutes").as[streaming.Sessionize.Ev]
        streaming.Sessionize.sessions(stream, 60 * 60 * 1000L)
          .writeStream.format("parquet").option("path", s"$dir/out")
          .option("checkpointLocation", s"$dir/chk")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
          .awaitTermination()
      }
      def feed(rows: (Long, String, Double)*): Unit =
        rows.toSeq.toDF("user_id", "s", "value")
          .select($"user_id", $"s".cast("timestamp").as("ts"), $"value")
          .write.mode("append").parquet(s"$dir/src")
      feed((1L, "2024-01-01 00:00:00", 1.0), (1L, "2024-01-01 00:20:00", 2.0))
      runOnce()
      feed((1L, "2024-01-01 06:00:00", 5.0), (2L, "2024-01-01 06:00:00", 9.0))
      runOnce()
      println("closed sessions after 2 runs:")
      spark.read.parquet(s"$dir/out").orderBy("user_id", "session_start").show(false)
    } else if (args.headOption.contains("ml-probe")) {
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      val withDup = docs.select(col("doc_id"), col("text"))
        .unionByName(docs.where(col("doc_id") === 7)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      for (n <- Seq(1, 3)) {
        val pairs = operators.DedupOps.mlNearDupPairs(withDup, "doc_id", "text",
          0.3, shingleN = n)
        println(s"shingleN=$n pairs under distance 0.3 = ${pairs.count()}")
        pairs.orderBy("jaccard_distance", "id1").show(3, truncate = false)
      }
    } else if (args.headOption.contains("dashboard-probe")) {
      import org.apache.spark.sql.functions._
      // full system: ingest the XML window, then run the dashboard over
      // the published target — the reference's two programs end to end
      val xml =
        """<RESPONSE><RESULT><Situation><Id>s1</Id>
          |<ModifiedTime>2024-01-09T10:00:00Z</ModifiedTime>
          |<PublicationTime>2024-01-09T10:00:00Z</PublicationTime>
          |<Deviation><DeviationId>d1</DeviationId><Message>Crash northbound</Message>
          |<MessageType>Olycka</MessageType><LocationDescriptor>E4 north</LocationDescriptor>
          |<RoadNumber>E4</RoadNumber><CountyNo>1</CountyNo>
          |<StartTime>2024-01-09T00:00:00Z</StartTime>
          |<WGS84>POINT (18.06 59.33)</WGS84></Deviation>
          |<Deviation><DeviationId>d2</DeviationId><Message>Planned roadwork</Message>
          |<MessageType>Vägarbete</MessageType><LocationDescriptor>E6</LocationDescriptor>
          |<RoadNumber>E6</RoadNumber><CountyNo>12</CountyNo>
          |<StartTime>2024-01-20T00:00:00Z</StartTime>
          |<WGS84>POINT (13.0 55.6)</WGS84></Deviation>
          |</Situation></RESULT></RESPONSE>""".stripMargin
      val dir = java.nio.file.Files.createTempDirectory("graft-dash").toString
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/sit.xml"), xml)
      val now = expr("TIMESTAMP_NTZ '2024-01-10 00:00:00'")
      val tgt = Pipeline.runIngest(spark, s"$dir/sit.xml", s"$dir/tgt", now)
      val base = Dashboard.baseView(spark, tgt, None)
      println(s"kpis = ${Dashboard.kpis(base)}")
      Dashboard.countyCounts(base).show(false)
      Dashboard.applyFilters(base, Dashboard.Filters(freeText = Some("crash")))
        .select("incident_id", "status", "county_display").show(false)
      Dashboard.mapPoints(base).show(false)
    } else if (args.headOption.contains("source-probe")) {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft-sp").toString
      val ok = s"$dir/ok.xml"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(ok),
        "<RESPONSE><RESULT><Situation><Id>s</Id><ModifiedTime>2024-01-05T00:00:00Z</ModifiedTime>" +
          "<Deviation><DeviationId>d</DeviationId><Message>m</Message></Deviation>" +
          "</Situation></RESULT></RESPONSE>")
      def attempt(label: String)(f: => Any): Unit =
        try println(s"$label -> " + f)
        catch { case e: Throwable => println(s"$label -> ${e.getClass.getSimpleName}: ${e.getMessage.linesIterator.next()}") }
      attempt("missing path") {
        spark.read.format("graft.sources.PagedXmlSource").load().count()
      }
      val bad = s"$dir/bad.xml"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(bad), "<RESPONSE><oops")
      attempt("malformed xml") {
        spark.read.format("graft.sources.PagedXmlSource").option("path", bad).load().count()
      }
      attempt("filter excludes all") {
        spark.read.format("graft.sources.PagedXmlSource").option("path", ok).load()
          .where(col("modified_time") > "2030-01-01").count()
      }
      attempt("nulls for absent tags") {
        spark.read.format("graft.sources.PagedXmlSource").option("path", ok).load()
          .select("deviation_id", "county_no", "wkt").collect().mkString(";")
      }
    } else if (args.headOption.contains("pipeline-probe")) {
      import org.apache.spark.sql.functions._
      val xml =
        """<RESPONSE><RESULT><Situation><Id>s1</Id>
          |<ModifiedTime>2024-01-09T10:00:00Z</ModifiedTime>
          |<PublicationTime>2024-01-09T10:00:00Z</PublicationTime>
          |<Deviation><DeviationId>d1</DeviationId><Message>Ongoing roadwork</Message>
          |<MessageType>Vägarbete</MessageType><LocationDescriptor>E4</LocationDescriptor>
          |<RoadNumber>E4</RoadNumber><CountyNo>14</CountyNo>
          |<StartTime>2024-01-09T00:00:00Z</StartTime>
          |<WGS84>POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))</WGS84></Deviation>
          |</Situation></RESULT></RESPONSE>""".stripMargin
      val dir = java.nio.file.Files.createTempDirectory("graft-pp").toString
      val xmlPath = s"$dir/sit.xml"
      java.nio.file.Files.writeString(java.nio.file.Paths.get(xmlPath), xml)
      val out = Pipeline.runIngest(spark, xmlPath, s"$dir/tgt",
        expr("TIMESTAMP_NTZ '2024-01-10 00:00:00'"))
      out.select("incident_id", "status", "county_display", "latitude",
        "longitude", "modified_ts").show(false)
      // second run (idempotence) + re-show
      Pipeline.runIngest(spark, xmlPath, s"$dir/tgt",
        expr("TIMESTAMP_NTZ '2024-01-10 00:00:00'"))
      println(s"after rerun rows = ${spark.read.parquet(s"$dir/tgt").count()}")
    } else if (args.headOption.contains("obs-probe")) {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // RunReport over a real status derivation on the fixture events
      val st = SparkEntry.queries("q_status_case")(spark, "/root/testdata/sf0.001")
      val r1 = observability.RunReport.report(st, "status", notify = m => println(s"[notify] $m"))
      println(s"report: $r1")
      val r2 = observability.RunReport.report(st, "status", expectMin = 1000000,
        notify = m => println(s"[notify] $m"))
      println(s"anomaly: ${r2.anomaly}")
      // KPI aggregator over the same column
      val kpi = st.select(col("status")).as[String]
        .select(functions.KpiAggregator.byStatus.toColumn).head()
      println(s"kpi: $kpi")
      // skew-salted distinct count on a deliberately hot key
      val skewed = spark.range(0, 100000)
        .select(when(col("id") % 100 =!= 0, lit("hot")).otherwise(lit("cold")).as("k"),
          col("id").as("v"))
      println("salted distinct:")
      operators.Skew.saltedDistinctCount(skewed, Seq("k"), "v", 16).orderBy("k").show()
      // extensions-built session (separate context-sharing session)
      GraftFunctions.registerAll(spark)
      spark.sql("SELECT wkt_centroid('LINESTRING (0 0, 2 0, 2 2)') AS c, " +
        "dot_product(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(3.0D, 4.0D)) AS dp, " +
        "rolling_hash('spark shingle') AS rh, rolling_hash('spark shingl') AS rh2")
        .show(false)
    } else if (args.headOption.contains("session-probe")) {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // events exactly 1h apart (u=1) vs 1s under the gap (u=2)
      val df = Seq(
        (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 01:00:00"),
        (2L, "2024-01-01 00:00:00"), (2L, "2024-01-01 00:59:59"))
        .toDF("u", "s").select($"u", $"s".cast("timestamp_ntz").as("ts"))
      df.groupBy(session_window($"ts", "1 hour").as("sw"), $"u")
        .agg(count(lit(1)).as("n"))
        .select($"u", $"sw.start", $"sw.end", $"n")
        .orderBy("u", "sw.start").show(false)
    } else if (args.headOption.contains("dot-probe")) {
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val df = Seq(
        ("equal", Some(Seq(1.0f, 2.0f)), Some(Seq(3.0, 4.0))),
        ("shorter-left", Some(Seq(2.0f)), Some(Seq(5.0, 100.0))),
        ("empty", Some(Seq.empty[Float]), Some(Seq(1.0))),
        ("null-side", None, Some(Seq(1.0))))
        .toDF("case", "a", "b")
      df.select(col("case"),
        functions.Similarity.dot(col("a"), col("b")).as("dot"))
        .show(truncate = false)
    } else {
      val names = if (args.nonEmpty) args.toSeq
        else Seq("q_pushdown_scan", "q_topk_groups", "q_dim_lookup", "q_upsert_latest")
      for (n <- names) {
        println(s"\n========== $n ==========")
        SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").explain("formatted")
      }
    }
    spark.stop()
  }
}
