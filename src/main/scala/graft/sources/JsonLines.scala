package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Newline-delimited JSON ingest with malformed-line quarantine — the
  * ingestion contract a web-scale text pipeline needs: at 100 TB some
  * lines WILL be truncated or invalid, and neither FAILFAST (one bad line
  * kills the job) nor DROPMALFORMED (silent data loss, no audit) is
  * acceptable. PERMISSIVE mode routes bad lines into a corrupt-record
  * column; this wrapper splits them into a clean frame and an auditable
  * quarantine frame in one pass.
  */
object JsonLines {

  private val CorruptCol = "_corrupt_record"

  /** Read JSONL at `path` against `schema`. Returns (clean, quarantine):
    * clean rows parsed to the schema, quarantine rows as raw line text.
    *
    * A type mismatch on one FIELD nulls that field and quarantines the
    * line (Spark keeps the raw text when any field fails); only a line
    * that parses fully clean lands in `clean`.
    */
  def readWithQuarantine(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not predeclare $CorruptCol")
    // read as text and parse with from_json carrying the corrupt-record
    // field INSIDE the struct: no caching (the json-scan route refuses to
    // select only the corrupt column unless the whole parse is cached —
    // a non-starter when the input is the 100 TB corpus itself), and the
    // raw line stays available verbatim for the quarantine
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"),
        schema.add(CorruptCol, StringType),
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> CorruptCol)).as("j"))
    // a line that parses to a NULL struct (blank line, literal `null`) has
    // a null corrupt column too — require j itself non-null for clean, or
    // those lines would land as all-null rows instead of the quarantine
    val clean = parsed.where(col("j").isNotNull && col(s"j.$CorruptCol").isNull)
      .select(col("j.*")).drop(CorruptCol)
    val quarantine = parsed.where(col("j").isNull || col(s"j.$CorruptCol").isNotNull)
      .select(col("value").as("raw_line"))
    (clean, quarantine)
  }

  /** Write `df` as JSONL (one object per line) — the interchange format
    * of every public text-corpus pipeline. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
