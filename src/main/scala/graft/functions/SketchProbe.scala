package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Point-query into a serialized count-min sketch (the binary produced by
  * Spark's `count_min_sketch` aggregate): returns the sketch's estimated
  * count for `item`.
  *
  * Spark builds CMS binaries (`CountMinSketchAgg`) but ships no expression
  * to READ them inside a query — estimates normally require collecting the
  * sketch to the driver. This expression keeps the probe distributed: the
  * one-row sketch broadcasts and each probe row does d hash lookups.
  *
  * CMS counters merge by elementwise addition (fully commutative), so the
  * estimate is deterministic whatever partial-aggregation order produced
  * the sketch — which is what lets `q_cms_topk` put the sketch's error
  * GUARANTEE (exact ≤ est ≤ exact + ε·N, seed-pinned) under the oracle
  * gate as a boolean.
  *
  * Deliberately CodegenFallback: the probe side of every intended plan is
  * a handful of candidate keys (top-k verification), never a fact-table
  * scan — deserialization cost dominates and is cached per sketch binary,
  * so codegen would buy nothing. Keys hash via the same
  * `CountMinSketch.estimateCount` the aggregate used to add them.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType | IntegerType | StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires (binary sketch, bigint|int|string key), got ${l.catalogString} and ${r.catalogString}")
  }

  // one sketch row fans out to every probe row — cache the deserialized
  // sketch keyed on byte-array identity (broadcast rows reuse the array)
  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastSketch: CountMinSketch = _

  override def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (!(bytes eq lastBytes)) {
      lastSketch = CountMinSketch.readFrom(bytes)
      lastBytes = bytes
    }
    val key: Any = item match {
      // UTF8String → String: the aggregate added JVM strings
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case other => other
    }
    lastSketch.estimateCount(key)
  }

  override def prettyName: String = "cms_estimate"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object SketchProbe {
  /** Column-API count-min-sketch point estimate (see [[CmsEstimate]]). */
  def cmsEstimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
}
