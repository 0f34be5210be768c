package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two non-negative 32-bit keys into one
  * 64-bit clustering key: bit i of `left` lands at position 2i, bit i of
  * `right` at 2i+1.
  *
  * Why it exists: sorting/bucketing a 100 TB table can only physically
  * cluster ONE axis — a range query on the second axis then reads every
  * file. Writing the table ordered by the interleaved key gives every
  * dimension locality that decays gracefully (a 2-D box query touches
  * O(perimeter) z-runs instead of O(table) files), which is what makes
  * parquet min/max pruning effective on BOTH columns. Used with
  * `Layout`-style sorted writes; the expression itself is a pure scalar
  * so it rides whole-stage codegen in the write path.
  *
  * Negative inputs are rejected at analysis time where provable and
  * yield NULL at runtime otherwise (a sign bit would interleave into the
  * middle of the key and break the ordering contract).
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"interleave_bits requires (int, int), got ${l.catalogString} and ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Int]
    val y = b.asInstanceOf[Int]
    if (x < 0 || y < 0) null else ZOrder.morton(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // $-less call resolves the static forwarder on the companion class
      s"""
         |if ($x < 0 || $y < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.ZOrder.morton($x, $y);
         |}
       """.stripMargin
    })

  override def prettyName: String = "interleave_bits"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object ZOrder {
  /** Spread the 32 bits of `v` to the even bit positions of a long. */
  def spread(v: Int): Long = {
    var x = v.toLong & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 64-bit Morton code of two non-negative ints. */
  def morton(x: Int, y: Int): Long = spread(x) | (spread(y) << 1)

  /** Column-API interleave (see [[InterleaveBits]]). */
  def interleaveBits(x: Column, y: Column): Column =
    ColumnBridge.column(
      InterleaveBits(ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** The equivalent ANSI-SQL bit arithmetic (for oracles / engines without
    * the native expression): 64 shift-mask-or terms over BIGINT. */
  def mortonSql(x: String, y: String): String = {
    val terms = (0 until 32).flatMap { i =>
      Seq(s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})",
        s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }
    terms.mkString("(", " + ", ")")
  }
}
