package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over float/double array columns.
  *
  * The composable form (`zip_with` + `aggregate` higher-order functions)
  * allocates a lambda frame per element and is CodegenFallback anyway; at
  * 100 TB the dot product is the innermost loop of similarity search, so
  * it gets a dedicated expression: one tight primitive loop over the
  * underlying ArrayData, no per-element allocation.
  *
  * Accumulation is left-to-right in IEEE double (floats widened exactly),
  * bit-identical to the composed form and to the DuckDB oracle for
  * equal-length inputs. Ragged inputs use min-length semantics (the
  * composed `zip_with` form would instead NULL-pad and propagate NULL).
  *
  * Participates in whole-stage codegen: `doGenCode` emits the same
  * primitive loop directly over the `ArrayData` accessors, so the hot
  * path has no boxing and no virtual `eval` dispatch per row.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Set[DataType](FloatType, DoubleType)(lt) && Set[DataType](FloatType, DoubleType)(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"dot_product requires array<float|double> inputs, got ${l.catalogString} and ${r.catalogString}")
  }

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    // a NULL element poisons the whole product (matches the composed
    // zip_with/aggregate form, where null * v → null propagates through
    // the fold) — getDouble on a null slot would silently read 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    var acc = 0.0
    i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      case (DoubleType, DoubleType) =>
        while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { acc += x.getFloat(i).toDouble * y.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { acc += x.getDouble(i) * y.getFloat(i).toDouble; i += 1 }
      case other =>
        throw new IllegalArgumentException(s"dot_product over $other")
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // element getters are resolved at plan time (the array element type is
    // static), so the generated loop is monomorphic primitive code
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += (double) $x.$lGet($i) * (double) $y.$rGet($i);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })
  }

  override def prettyName: String = "dot_product"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayMath {
  /** Column-API dot product (double result, element-wise, min-length). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API one-pass cosine similarity (see [[CosineSim]]). */
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column-API rolling hash (see [[RollingHash]]). */
  def rollingHash(s: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(s)))
}

/** One-pass cosine similarity: a·b / (‖a‖·‖b‖) with all three accumulators
  * (dot, ‖a‖², ‖b‖²) folded in a single traversal — the composed form
  * (one [[DotProduct]] plus two `aggregate(x*x)` folds) walks the arrays
  * three times and drops the norm folds out of whole-stage codegen.
  *
  * Semantics: each accumulator folds left-to-right in IEEE double over the
  * first min(|a|,|b|) elements, so for equal-length inputs the result is
  * bit-identical to the composed form (independent accumulators commute
  * with loop fusion). Ragged inputs truncate BOTH the dot and the norms to
  * the common prefix — the composed form would norm each array over its
  * full length. NULL elements poison the result to NULL (as in
  * [[DotProduct]]); zero-norm inputs follow IEEE division (NaN/Infinity),
  * matching `x / sqrt(0.0)` in the composed form.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Set[DataType](FloatType, DoubleType)(lt) && Set[DataType](FloatType, DoubleType)(rt) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double> inputs, got ${l.catalogString} and ${r.catalogString}")
  }

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t, _) => t
    case t => t
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      i += 1
    }
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  final double $xv = (double) $x.$lGet($i);
         |  final double $yv = (double) $y.$rGet($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
       """.stripMargin
    })
  }

  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Rabin–Karp polynomial rolling hash over a string's UTF-8 bytes:
  * `h = Σ b_i · B^(n-1-i) mod M` with B=257, M=2^61−1 (a Mersenne prime,
  * so the reduction is two shifts and an add — no division). The
  * composable property (`hash(xy) = hash(x)·B^|y| + hash(y)`) is what
  * makes shingle fingerprints O(1) per slide at corpus scale, unlike a
  * cryptographic digest recomputed per window (TextAnalysis.fingerprint's
  * md5 is for whole-document identity; this is for windows).
  * Deterministic, engine-independent, and a tight primitive loop —
  * codegen'd (`doGenCode` calls the shared static hash over the string's
  * bytes, keeping the expression inside whole-stage codegen spans).
  */
case class RollingHash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    RollingHash.hashBytes(bytes)
  }

  // the $-less form calls the Scala-generated static forwarder on the
  // companion class — the conventional shape for generated code (Spark's
  // own StaticInvoke strips the trailing $ the same way)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHash.hashBytes($c.getBytes())")

  override def prettyName: String = "rolling_hash"

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Base = 257L
  val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  private def mulMod(a: Long, b: Long): Long = {
    // 61-bit modular multiply via Math.multiplyHigh (Java 9+)
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 128-bit product into 61 bits: (x mod 2^61) + (x >> 61)
    var r = (lo & Mod) + ((hi << 3) | (lo >>> 61))
    if (r >= Mod) r -= Mod
    r
  }

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = mulMod(h, Base) + (bytes(i) & 0xffL)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  /** B^e mod M by square-and-multiply — O(log e), so window slides that
    * combine per position stay O(1)-ish rather than O(window). */
  def powMod(e: Long): Long = {
    var result = 1L
    var base = Base
    var k = e
    while (k > 0) {
      if ((k & 1) == 1) result = mulMod(result, base)
      base = mulMod(base, base)
      k >>= 1
    }
    result
  }

  /** hash(x concat y) from hash(x), hash(y), |y| — the composition law
    * rolling windows rely on. */
  def combine(hx: Long, hy: Long, yLen: Int): Long = {
    var r = mulMod(hx, powMod(yLen)) + hy
    if (r >= Mod) r -= Mod
    r
  }
}
