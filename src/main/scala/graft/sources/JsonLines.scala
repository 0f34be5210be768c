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
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      // Spark refuses a query that selects ONLY the corrupt column from a
      // JSON scan (the parser would never materialize it); persisting the
      // full parse once is also what keeps this one pass over the input
      .cache()
    val clean = raw.where(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantine = raw.where(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantine)
  }

  /** Write `df` as JSONL (one object per line) — the interchange format
    * of every public text-corpus pipeline. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
