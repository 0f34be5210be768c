package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-permutation MinHash: the k 8-hex-char md5 slices of a
  * document's word-`shingleN`-gram set, as one array-returning expression.
  *
  * Semantics are EXACTLY `DedupOps.minhashComponents`'s declarative form
  * (split on single spaces keeping empties, shingles joined with one
  * space, lexicographic min over each digest's disjoint 8-hex slices —
  * which equals unsigned numeric min over the 4-byte groups), so every
  * DuckDB oracle that mirrors the md5 construction stays valid. What
  * changes is the cost: the higher-order `transform`+`aggregate` fold is
  * interpreted per ELEMENT (a closure call, an Md5 eval, a struct
  * allocation and a k-way `least` per shingle — measured 2.3 s for the
  * sf0.1 corpus's 350 k shingles once column pruning stops hiding it);
  * this expression runs one tight per-ROW loop (reused MessageDigest,
  * byte-level unsigned mins, zero per-element allocation) and generates
  * a plain static call under whole-stage codegen, so the signature stage
  * stays inside the codegen pipeline instead of falling back.
  */
case class MinHashSlices(child: Expression, k: Int, shingleN: Int)
    extends UnaryExpression {
  require(k >= 1 && k <= 4,
    "one-permutation minhash slices a 16-byte md5 into at most 4 components")
  require(shingleN >= 1, "shingleN must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_slices needs a string column, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    MinHashSlices.compute(input.asInstanceOf[UTF8String], k, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSlices.compute($c, $k, $shingleN)")

  override def prettyName: String = "minhash_slices"

  override protected def withNewChildInternal(newChild: Expression): MinHashSlices =
    copy(child = newChild)
}

/** Native word n-gram builder: the array of space-joined n-grams of a
  * document's tokens, one pass, no per-element lambda frames.
  *
  * Exactly `transform(sequence(1, greatest(size(toks) − n + 1, 1)),
  * i => concat_ws(" ", slice(toks, i, n)))` over `split(text, " ")` —
  * the declarative form is interpreted per GRAM (a closure, a slice
  * allocation and a concat per window), which dominates every
  * shingle-exploding query once the explode materializes the grams.
  * Shorter-than-n docs produce their single whole-document gram; NULL
  * text stays NULL.
  */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams needs a string column, got $other")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordNGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordNGrams.compute($c, $n)")

  override def prettyName: String = "word_ngrams"

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  /** One pass over the row's token windows; called from generated code. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val len = toks.length
    val m = math.max(len - (n - 1), 1)
    val out = new Array[Any](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      val end = math.min(i + n, len)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object MinHashSlices {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  /** One pass over the row's shingles; called from generated code. */
  def compute(text: UTF8String, k: Int, n: Int): ArrayData = {
    // split(text, " ") semantics: single-space separator, empties kept
    val toks = text.toString.split(" ", -1)
    val len = toks.length
    val m = math.max(len - (n - 1), 1)
    val md = digests.get()
    // unsigned 32-bit mins; 0xFFFFFFFF is the fold identity (the hex
    // identity "~" in the declarative form sorts after every hex char,
    // and every real digest slice is <= 0xFFFFFFFF)
    val mins = Array.fill(k)(0xFFFFFFFFL)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      val end = math.min(i + n, len)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      md.reset()
      val digest = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var c = 0
      while (c < k) {
        val b = c * 4
        val v = ((digest(b) & 0xffL) << 24) | ((digest(b + 1) & 0xffL) << 16) |
          ((digest(b + 2) & 0xffL) << 8) | (digest(b + 3) & 0xffL)
        if (v < mins(c)) mins(c) = v
        c += 1
      }
      i += 1
    }
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val hex = new Array[Char](8)
      var h = 0
      while (h < 8) {
        hex(h) = HexChars(((mins(c) >>> ((7 - h) * 4)) & 0xfL).toInt)
        h += 1
      }
      out(c) = UTF8String.fromString(new String(hex))
      c += 1
    }
    new GenericArrayData(out)
  }
}
