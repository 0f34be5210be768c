package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, SortOrder => connectorSortOrder}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector mirroring the reference's paginated incident
  * API (SURVEY §2.1 S1–S3): a nested Situation→Deviation XML document is
  * flattened to one row per Deviation at the source (S4,
  * reference src/trv/endpoints.py:107-163), pages become Spark input
  * partitions (cursor pagination → parallel partition reads,
  * src/trv/endpoints.py:166-207), and the reference's server-side query
  * DSL (`<FILTER><GT/LT>` + `<INCLUDE>`, src/trv/endpoints.py:60-104)
  * becomes `SupportsPushDownFilters` on the time columns plus
  * `SupportsPushDownRequiredColumns` column pruning — the filter runs
  * inside the reader, before pagination, exactly like the remote server
  * would.
  *
  * The transport here is a local XML file standing in for the HTTP POST
  * (this environment has no egress); the per-partition fetch is wrapped
  * in [[Retry.withBackoff]] (S1/T6 — capped exponential backoff with
  * full jitter, `retries`/`retryBaseMs` options), so a transient
  * transport failure retries the one page instead of failing the Spark
  * task. Cross-page dedup by id (S3 `seen_ids`) remains a downstream
  * `dropDuplicates`, as in the reference where the client dedups across
  * page boundaries.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.PagedXmlSource")
  *     .option("path", "/data/situations.xml")
  *     .option("pageSize", "500").option("maxPages", "20")
  *     .load()
  * }}}
  */
class PagedXmlSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  // META-INF/services registration → spark.read.format("paged-xml")
  override def shortName(): String = "paged-xml"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedXmlSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new PagedXmlTable(new CaseInsensitiveStringMap(properties))
}

object PagedXmlSource {
  /** Fixed source schema (reference DDL src/trv/load_sqlite.py:6-25;
    * timestamps stay ISO strings at the source, normalized downstream by
    * the P2 operator). */
  val schema: StructType = StructType(Seq(
    StructField("situation_id", StringType),
    StructField("deviation_id", StringType),
    StructField("message", StringType),
    StructField("message_type", StringType),
    StructField("location_descriptor", StringType),
    StructField("road_number", StringType),
    StructField("county_no", IntegerType),
    StructField("start_time", StringType),
    StructField("end_time", StringType),
    StructField("modified_time", StringType),
    StructField("publication_time", StringType),
    StructField("wkt", StringType)))

  private[sources] val timeCols = Set("modified_time", "publication_time", "start_time")

  /** A pushed filter is honorable iff it's a bound on an ISO-string time
    * column (lexicographic order == chronological order for ISO-8601). */
  private[sources] def pushable(f: Filter): Boolean = f match {
    case GreaterThan(c, _: String) => timeCols(c)
    case GreaterThanOrEqual(c, _: String) => timeCols(c)
    case LessThan(c, _: String) => timeCols(c)
    case LessThanOrEqual(c, _: String) => timeCols(c)
    case IsNotNull(c) => timeCols(c)
    case _ => false
  }

  private[sources] def eval(f: Filter, row: Map[String, Any]): Boolean = f match {
    case GreaterThan(c, v: String) => row(c) != null && row(c).toString > v
    case GreaterThanOrEqual(c, v: String) => row(c) != null && row(c).toString >= v
    case LessThan(c, v: String) => row(c) != null && row(c).toString < v
    case LessThanOrEqual(c, v: String) => row(c) != null && row(c).toString <= v
    case IsNotNull(c) => row(c) != null
    case _ => true
  }

  /** Server-side sort + row cap over the filtered rows — what the
    * reference DSL's `orderby`/`limit` parameters do remotely. Sort keys
    * are (column, ascending, nullsFirst); the sort is stable, so parse
    * order breaks ties deterministically on every executor. */
  private[sources] def applyPushed(
      rows: Seq[Map[String, Any]], filters: Array[Filter],
      topN: Seq[(String, Boolean, Boolean)], limit: Option[Int],
      offset: Option[Int] = None)
      : Seq[Map[String, Any]] = {
    val filtered = rows.filter(r => filters.forall(eval(_, r)))
    val sorted =
      if (topN.isEmpty) filtered
      else filtered.sortWith((a, b) => compareRows(a, b, topN) < 0)
    val skipped = offset.fold(sorted)(sorted.drop)
    limit.fold(skipped)(skipped.take)
  }

  /** Unsigned byte-wise comparison of the UTF-8 encodings — the order
    * Spark itself uses for strings (`UTF8String.binaryCompare`). UTF-16
    * `String.compareTo` disagrees on any pair straddling the surrogate
    * range (e.g. U+FF01 vs U+10000), and under pushed TopN the source
    * truncates to its OWN top-N, so an ordering mismatch would return
    * rows Spark cannot repair. */
  private def compareUtf8(s: String, t: String): Int = {
    val x = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Column types the source has a Spark-order-faithful comparator for;
    * `pushTopN` refuses sort keys outside this set. */
  private[sources] def topNComparable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == StringType || dt == IntegerType

  private def compareRows(a: Map[String, Any], b: Map[String, Any],
      keys: Seq[(String, Boolean, Boolean)]): Int = {
    for ((col, asc, nullsFirst) <- keys) {
      val (x, y) = (a(col), b(col))
      val c = (x, y) match {
        case (null, null) => 0
        case (null, _) => if (nullsFirst) -1 else 1
        case (_, null) => if (nullsFirst) 1 else -1
        case (i: Int, j: Int) => Integer.compare(i, j)
        case (s: String, t: String) => compareUtf8(s, t)
        case (u, v) => throw new IllegalStateException(
          s"no typed comparator for $col: ${u.getClass} vs ${v.getClass} — " +
            "pushTopN should have refused this key")
      }
      if (c != 0) return if (asc) c else -c
    }
    0
  }

  // Memoize the last parsed document per JVM keyed by (path, mtime): the
  // planner counts pages and every partition reader slices the same
  // parse, so without this a k-page scan DOM-parses the file k+1 times.
  // (A real HTTP source fetches per page server-side; the local-file
  // stand-in shares the parse instead.)
  @volatile private var cache: (String, Long, Seq[Map[String, Any]]) = null

  /** `retries` counts RETRIES, not attempts: retries=0 disables retrying
    * (one attempt), the default 4 gives 5 total attempts like the
    * reference's fetch_with_retry (src/trv/endpoints.py:34-57). */
  private[sources] def parseRows(path: String, retries: Int = 4,
      retryBaseMs: Long = 50L): Seq[Map[String, Any]] = {
    val mtime = new java.io.File(path).lastModified()
    val c = cache
    if (c != null && c._1 == path && c._2 == mtime) return c._3
    // the "page fetch": transient transport failures back off and retry
    // executor-side (S1/T6)
    val rows = Retry.withBackoff(retries + 1, retryBaseMs)(doParse(path))
    cache = (path, mtime, rows)
    rows
  }

  /** StAX pull-parse the document and flatten to per-Deviation row maps
    * (the per-partition equivalent of one page fetch + parse). Streaming,
    * not DOM: memory is O(one Deviation), not O(document) — a multi-GB
    * feed file parses in constant space. First occurrence of a tag wins
    * (matching the previous DOM `getElementsByTagName(...).item(0)`
    * behavior); DTDs and external entities are disabled (XXE hardening
    * for a feed of untrusted XML). */
  private def doParse(path: String): Seq[Map[String, Any]] =
    doParseStream(new java.io.BufferedInputStream(new java.io.FileInputStream(path)))

  /** Parse an already-fetched XML document (the shape a streaming
    * file-arrival pipeline holds after `wholetext` read: one document per
    * row, no path). Same StAX flattening as the batch scan. */
  private[graft] def parseString(xml: String): Seq[Map[String, Any]] =
    doParseStream(new java.io.ByteArrayInputStream(
      xml.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  private def doParseStream(in0: java.io.InputStream): Seq[Map[String, Any]] = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, java.lang.Boolean.FALSE)
    val in = in0
    val r = f.createXMLStreamReader(in)
    try {
      val rows = Seq.newBuilder[Map[String, Any]]
      val sit = scala.collection.mutable.Map.empty[String, String]
      val dev = scala.collection.mutable.Map.empty[String, String]
      var inDeviation = false
      var text: StringBuilder = null
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "Situation" => sit.clear()
              case "Deviation" => dev.clear(); inDeviation = true
              case _ => text = new StringBuilder
            }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (text != null) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            val name = r.getLocalName
            name match {
              case "Deviation" =>
                inDeviation = false
                val county = dev.get("CountyNo").flatMap(_.trim.toIntOption)
                rows += Map[String, Any](
                  "situation_id" -> sit.getOrElse("Id", null),
                  "deviation_id" -> dev.getOrElse("DeviationId", null),
                  "message" -> dev.getOrElse("Message", null),
                  "message_type" -> dev.getOrElse("MessageType", null),
                  "location_descriptor" -> dev.getOrElse("LocationDescriptor", null),
                  "road_number" -> dev.getOrElse("RoadNumber", null),
                  "county_no" -> county.orNull,
                  "start_time" -> dev.getOrElse("StartTime", null),
                  "end_time" -> dev.getOrElse("EndTime", null),
                  "modified_time" -> sit.getOrElse("ModifiedTime", null),
                  "publication_time" -> sit.getOrElse("PublicationTime", null),
                  "wkt" -> dev.getOrElse("WGS84", null))
              case "Situation" => // row-per-Deviation; nothing to emit
              case _ if text != null =>
                val target = if (inDeviation) dev else sit
                if (!target.contains(name)) target += name -> text.toString
                text = null
              case _ =>
            }
          case _ =>
        }
      }
      rows.result()
    } finally {
      r.close()
      in.close()
    }
  }
}

private[sources] class PagedXmlTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"paged_xml(${options.get("path")})"
  override def schema(): StructType = PagedXmlSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new PagedXmlScanBuilder(opts)
}

/** The translated form of a pushed aggregation: group-by column names plus
  * (func, column) aggregate terms — `("count", "")`, `("min", c)`,
  * `("max", c)`. Serializable strings only, so the Scan ships to readers. */
private[sources] case class PushedAgg(groupCols: Seq[String], aggs: Seq[(String, String)])

private[sources] class PagedXmlScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = PagedXmlSource.schema
  private var agg: Option[PushedAgg] = None
  private var limit: Option[Int] = None
  private var offset: Option[Int] = None
  private var topN: Seq[(String, Boolean, Boolean)] = Nil

  /** LIMIT reaches the source as a page-count cap (the reference DSL's
    * `limit` parameter): the scan plans only ceil(limit/pageSize) pages.
    * Partial pushdown — Spark keeps its exact limit on top. Refused once
    * an aggregation is pushed (the agg output is already tiny). */
  override def pushLimit(l: Int): Boolean =
    if (agg.isDefined) false
    else { limit = Some(limit.fold(l)(math.min(_, l))); true }

  /** ORDER BY + LIMIT (the DSL's `orderby`): the source sorts the
    * filtered rows and serves only the top pages. Partial pushdown —
    * Spark re-sorts the ≤limit surviving rows for the final order. */
  override def pushTopN(orders: Array[connectorSortOrder], l: Int): Boolean = {
    if (agg.isDefined) return false
    val keys = orders.toSeq.map { o =>
      o.expression() match {
        case nr: NamedReference if nr.fieldNames.length == 1 &&
            PagedXmlSource.schema.fields.exists(f =>
              f.name == nr.fieldNames()(0) &&
                PagedXmlSource.topNComparable(f.dataType)) =>
          Some((nr.fieldNames()(0),
            o.direction() == org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING,
            o.nullOrdering() == org.apache.spark.sql.connector.expressions.NullOrdering.NULLS_FIRST))
        case _ => None
      }
    }
    if (keys.exists(_.isEmpty)) false
    else {
      topN = keys.flatten
      limit = Some(limit.fold(l)(math.min(_, l)))
      true
    }
  }

  /** OFFSET (the DSL's `skip`): rows skipped at the source, after the
    * pushed sort, before the limit — Spark only calls this when it can
    * drop its own offset, so the pushdown must be EXACT, which the
    * deterministic filter→sort→slice pipeline guarantees. */
  override def pushOffset(n: Int): Boolean =
    if (agg.isDefined) false
    else { offset = Some(offset.fold(n)(_ + n)); true }

  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, residual) = filters.partition(PagedXmlSource.pushable)
    pushed = accept
    residual // Spark re-applies only these
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** COUNT(*) / MIN(col) / MAX(col) grouped by plain columns — the shapes
    * the reference's server DSL can answer without shipping rows (the
    * local stand-in computes them at the source the same way). Sum/avg
    * stay in Spark: the source's ISO-string time columns have no
    * meaningful sum, and partial-agg count+sum already minimizes their
    * shuffle. */
  private def translate(a: Aggregation): Option[PushedAgg] = {
    def name(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames()(0))
        case _ => None
      }
    val groups = a.groupByExpressions.toSeq.map(name)
    val funcs = a.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(("count", ""))
      case m: Min => name(m.column).map(("min", _))
      case m: Max => name(m.column).map(("max", _))
      case _ => None
    }
    if (groups.forall(_.isDefined) && funcs.forall(_.isDefined))
      Some(PushedAgg(groups.flatten, funcs.flatten))
    else None
  }

  // complete pushdown: the scan emits FINAL aggregated rows, Spark plans
  // no aggregate node at all above this scan
  override def supportCompletePushDown(a: Aggregation): Boolean =
    translate(a).isDefined

  override def pushAggregation(a: Aggregation): Boolean = translate(a) match {
    case Some(p) =>
      agg = Some(p)
      val src = PagedXmlSource.schema
      required = StructType(
        p.groupCols.map(c => src(c)) ++
          p.aggs.map {
            case ("count", _) => StructField("count(*)", LongType, nullable = false)
            case (f, c) => StructField(s"$f($c)", src(c).dataType)
          })
      true
    case None => false
  }

  override def pruneColumns(requiredSchema: StructType): Unit =
    // after an aggregation is pushed the scan's output IS the agg schema;
    // Spark's later prune call carries that same shape
    if (agg.isEmpty) required = requiredSchema

  override def build(): Scan = new PagedXmlScan(
    Option(options.get("path")).getOrElse(throw new IllegalArgumentException(
      "graft.sources.PagedXmlSource requires the 'path' option " +
        "(spark.read.format(...).option(\"path\", \"/data/situations.xml\"))")),
    Option(options.get("pageSize")).map(_.toInt).getOrElse(500),
    Option(options.get("maxPages")).map(_.toInt).getOrElse(20),
    Option(options.get("retries")).map(_.toInt).getOrElse(4),
    Option(options.get("retryBaseMs")).map(_.toLong).getOrElse(50L),
    pushed, required, agg, limit, offset, topN)
}

private[sources] class PagedXmlScan(path: String, pageSize: Int, maxPages: Int,
    retries: Int, retryBaseMs: Long,
    filters: Array[Filter], required: StructType, agg: Option[PushedAgg],
    limit: Option[Int], offset: Option[Int], topN: Seq[(String, Boolean, Boolean)])
    extends Scan with Batch with org.apache.spark.internal.Logging {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // surfaces what was pushed in .explain() output, like file sources do
  override def description(): String =
    s"PagedXmlScan path=$path pageSize=$pageSize " +
      s"PushedFilters: [${filters.mkString(", ")}], " +
      agg.map(a => s"PushedAggregates: [${a.aggs.map(t => s"${t._1}(${t._2})").mkString(", ")}], " +
        s"PushedGroupBy: [${a.groupCols.mkString(", ")}], ").getOrElse("") +
      limit.map(l => s"PushedLimit: $l, ").getOrElse("") +
      offset.map(o => s"PushedOffset: $o, ").getOrElse("") +
      (if (topN.isEmpty) ""
       else s"PushedTopN: [${topN.map(t => s"${t._1} ${if (t._2) "ASC" else "DESC"}").mkString(", ")}], ") +
      s"ReadSchema: ${required.catalogString}"

  override def planInputPartitions(): Array[InputPartition] = {
    // a pushed aggregation answers from one partition (the "server"
    // returns |groups| rows, not pages of raw rows)
    if (agg.isDefined) return Array(PagedXmlPartition(0))
    // driver-side page count (the cursor-pagination analogue: how many
    // pages exist after server-side filtering, sorting and the pushed
    // row cap); the parse is memoized so partition readers reuse it
    val n = PagedXmlSource.applyPushed(
      PagedXmlSource.parseRows(path, retries, retryBaseMs),
      filters, topN, limit, offset).size
    val needed = math.max(1, (n + pageSize - 1) / pageSize)
    val pages = math.min(maxPages, needed)
    if (pages < needed) {
      logWarning(s"paged_xml($path): maxPages=$maxPages truncates the scan to " +
        s"${pages.toLong * pageSize} of $n rows — raise maxPages if this is an ingest")
    }
    (0 until pages).map(p => PagedXmlPartition(p): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedXmlReaderFactory(path, pageSize, maxPages, retries, retryBaseMs,
      filters, required, agg, limit, offset, topN)
}

private[sources] case class PagedXmlPartition(page: Int) extends InputPartition

private[sources] class PagedXmlReaderFactory(path: String, pageSize: Int,
    maxPages: Int, retries: Int, retryBaseMs: Long,
    filters: Array[Filter], required: StructType, agg: Option[PushedAgg],
    limit: Option[Int], offset: Option[Int], topN: Seq[(String, Boolean, Boolean)])
    extends PartitionReaderFactory {

  private def toCatalyst(v: Any): Any = v match {
    case null => null
    case s: String => UTF8String.fromString(s)
    case other => other
  }

  /** Evaluate a completely-pushed aggregation over the filtered rows —
    * what the reference's server would compute from its query DSL. */
  private def aggregated(base: Seq[Map[String, Any]], p: PushedAgg): Seq[Seq[Any]] = {
    def extreme(rs: Seq[Map[String, Any]], c: String, wantMin: Boolean): Any = {
      val vs = rs.map(_(c)).filter(_ != null)
      if (vs.isEmpty) null
      else vs.head match {
        case _: String =>
          val ss = vs.map(_.asInstanceOf[String]); if (wantMin) ss.min else ss.max
        case _: Int =>
          val is = vs.map(_.asInstanceOf[Int]); if (wantMin) is.min else is.max
        case other => throw new IllegalStateException(s"un-aggregable value $other")
      }
    }
    def evalAggs(rs: Seq[Map[String, Any]]): Seq[Any] = p.aggs.map {
      case ("count", _) => rs.size.toLong
      case ("min", c) => extreme(rs, c, wantMin = true)
      case ("max", c) => extreme(rs, c, wantMin = false)
      case (f, c) => throw new IllegalStateException(s"unsupported pushed agg $f($c)")
    }
    if (p.groupCols.isEmpty) Seq(evalAggs(base)) // global agg: one row even on empty input
    else base.groupBy(r => p.groupCols.map(r(_))).toSeq
      .map { case (k, rs) => k ++ evalAggs(rs) }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[PagedXmlPartition].page
    // same deterministic filter→sort→cap pipeline the planner counted
    val filtered = () => PagedXmlSource.applyPushed(
      PagedXmlSource.parseRows(path, retries, retryBaseMs), filters, topN, limit, offset)
    agg match {
      case Some(p) =>
        new PartitionReader[InternalRow] {
          // the aggregation must see exactly what a row scan would have
          // returned — including the maxPages truncation, which the row
          // path applies by planning only `maxPages` partitions
          private val cap =
            math.min(Int.MaxValue.toLong, maxPages.toLong * pageSize).toInt
          private val rows = aggregated(filtered().take(cap), p).iterator
          private var current: Seq[Any] = _
          override def next(): Boolean = {
            if (!rows.hasNext) return false
            current = rows.next(); true
          }
          override def get(): InternalRow =
            InternalRow.fromSeq(current.map(toCatalyst))
          override def close(): Unit = ()
        }
      case None =>
        new PartitionReader[InternalRow] {
          // one "page fetch": parse, server-side filter, slice this page
          private val rows = filtered()
            .slice(page * pageSize, (page + 1) * pageSize)
            .iterator
          private var current: Map[String, Any] = _

          override def next(): Boolean = {
            if (!rows.hasNext) return false
            current = rows.next(); true
          }

          override def get(): InternalRow = InternalRow.fromSeq(
            required.fields.toSeq.map(f => toCatalyst(current(f.name))))

          override def close(): Unit = ()
        }
    }
  }
}
