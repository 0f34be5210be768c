package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge for graft's native expressions.
  *
  * Spark 4 made `Column` expression-agnostic and gated the conversion
  * helpers `private[sql]`; a package-local bridge is the supported way for
  * extension libraries to lift a custom Catalyst `Expression` into the
  * Column API without going through the session function registry.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Float/double canonicalization (-0.0 → 0.0, one NaN bit pattern) via
    * Spark's own rule — `private[sql]`, so exposed here for the custom
    * operators whose grouping keys Spark's optimizer can't see. */
  def normalizeFloats(e: Expression): Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
