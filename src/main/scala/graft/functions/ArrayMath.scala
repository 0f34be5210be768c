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

  /** Column-API banded hyperplane signatures (see [[HyperplaneSigs]]). */
  def hyperplaneSigs(v: Column, bands: Int, bits: Int): Column =
    ColumnBridge.column(HyperplaneSigs(ColumnBridge.expression(v), bands, bits))
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

/** Banded random-hyperplane LSH signatures with UNBOUNDED bits-per-band.
  *
  * The coordinate-sign construction used by the fixed-shape queries (sig =
  * sign bits of `bits` consecutive dims) caps total signature width at the
  * vector dimension — 64 bits for the fixture — which caps the bucket
  * count per band at 2^(64/bands). All-pairs mining is quadratic in
  * bucket occupancy (background candidates ≈ bands·n²/2^bits), so at
  * growing corpus size `bits` must track log₂(n) past what coordinate
  * signs can supply. This expression draws each hyperplane as a ±1 vector
  * from a splitmix64-mixed counter keyed on (band, bit, dim-block) — the
  * standard SRP (signed random projection) scheme: P(bit agrees) =
  * 1 − θ(a,b)/π, independent across bits, unlimited supply.
  *
  * Returns `array<bigint>` of length `bands`; bit j of band b is set iff
  * Σ_d ±v_d ≥ 0 for that hyperplane (accumulated left-to-right in IEEE
  * double — deterministic). NULL elements poison the row to NULL (as in
  * [[DotProduct]]). One traversal per (band, bit); the whole computation
  * stays inside whole-stage codegen via a static helper call.
  */
case class HyperplaneSigs(child: Expression, bands: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bands > 0 && bits > 0 && bits <= 64,
    s"hyperplane_sigs needs 1..64 bits per band, got bands=$bands bits=$bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if Set[DataType](FloatType, DoubleType)(t) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs requires array<float|double> input, got ${t.catalogString}")
  }

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    HyperplaneSigs.compute(input.asInstanceOf[ArrayData], isFloat, bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val r = ctx.freshName("sigs")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r = graft.functions.HyperplaneSigs.compute(
         |  $x, $isFloat, $bands, $bits);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override def prettyName: String = "hyperplane_sigs"

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

object HyperplaneSigs {
  /** The ±1 Rademacher sign pattern of hyperplane (band, bit) over `dims`
    * dimensions — data-INDEPENDENT constants (a pure function of the
    * band/bit counters), so an oracle can inline them as SQL literals and
    * provably share this exact derivation with [[compute]]. */
  def signPattern(band: Int, bit: Int, dims: Int): Array[Int] = {
    val out = new Array[Int](dims)
    var mask = 0L
    var d = 0
    while (d < dims) {
      if ((d & 63) == 0) mask = mix((band.toLong * 1048576L + bit) * 1024L + (d >> 6))
      out(d) = if (((mask >>> (d & 63)) & 1L) == 1L) 1 else -1
      d += 1
    }
    out
  }

  /** splitmix64 finalizer — full-avalanche mix of a counter. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Null on any NULL element (poison semantics); otherwise bands longs. */
  def compute(x: ArrayData, isFloat: Boolean, bands: Int, bits: Int): ArrayData = {
    val n = x.numElements()
    var d = 0
    while (d < n) { if (x.isNullAt(d)) return null; d += 1 }
    val v = new Array[Double](n)
    d = 0
    while (d < n) {
      v(d) = if (isFloat) x.getFloat(d).toDouble else x.getDouble(d)
      d += 1
    }
    val sigs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var j = 0
      while (j < bits) {
        var acc = 0.0
        var mask = 0L
        d = 0
        while (d < n) {
          if ((d & 63) == 0) mask = mix((b.toLong * 1048576L + j) * 1024L + (d >> 6))
          acc += (if (((mask >>> (d & 63)) & 1L) == 1L) v(d) else -v(d))
          d += 1
        }
        if (acc >= 0) sig |= (1L << j)
        j += 1
      }
      sigs(b) = sig
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }
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
