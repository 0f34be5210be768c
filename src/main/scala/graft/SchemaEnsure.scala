package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StructField, StructType}

/** Idempotent table DDL for parquet-directory tables (SURVEY §2.1 S5;
  * reference `ensure_schema`, src/trv/load_sqlite.py:28-41: CREATE TABLE
  * IF NOT EXISTS + additive ALTER). On a lake there is no catalog to
  * ALTER — the declared [[StructType]] IS the DDL:
  *
  *  - [[ensure]] creates an empty, correctly-typed table directory when
  *    absent (so downstream readers never die on a missing path) and is
  *    a no-op when present — safe to call from every pipeline run, like
  *    the reference's per-run ensure.
  *  - [[read]] reads THROUGH the declared schema: columns added to the
  *    declaration after old files were written come back as typed NULLs
  *    (additive evolution without rewriting data), and dropped-from-
  *    declaration columns are pruned at the scan.
  *  - [[conform]] projects any DataFrame onto the declared schema before
  *    a write — order, casts, and NULL back-fill for missing columns —
  *    so writers can't drift the table layout.
  *
  * Incompatible drift (same column name, different incompatible type)
  * fails loudly at [[conform]] via the cast's ANSI semantics rather than
  * corrupting the table.
  */
object SchemaEnsure {

  /** Create the table directory with an empty parquet file of `schema`
    * iff it does not already hold a table. Detection is RECURSIVE: a
    * partitioned table keeps its parquet parts under `key=value/`
    * subdirectories with nothing directly in `dir`, and treating that as
    * absent would let the create-path `mode("overwrite")` destroy it.
    * Returns true when created. */
  def ensure(spark: SparkSession, dir: String, schema: StructType): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(p) && {
      val it = fs.listFiles(p, /* recursive = */ true)
      var found = false
      while (!found && it != null && it.hasNext) {
        found = it.next().getPath.getName.endsWith(".parquet")
      }
      found
    }
    if (!exists) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.mode("overwrite").parquet(dir)
    }
    !exists
  }

  /** Read `dir` through the declared schema: files written before a
    * column was declared yield typed NULLs for it; columns no longer
    * declared are pruned. */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(dir)

  /** Project `df` onto the declared schema: declared order, declared
    * types (cast), NULL back-fill for declared-but-missing columns.
    * Extra undeclared columns are dropped. */
  def conform(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    df.select(schema.fields.toSeq.map { case StructField(n, t, _, _) =>
      (if (have(n)) col(n).cast(t) else lit(null).cast(t)).as(n)
    }: _*)
  }
}
