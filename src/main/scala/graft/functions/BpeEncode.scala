package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy BPE encoding: apply a trained, rank-ordered merge list to a
  * document, returning the flat piece array (words encoded independently,
  * pieces in reading order) — the APPLY half of the tokenizer story whose
  * train half is `Curation.bpeTrain`.
  *
  * Algorithm (the one shipped tokenizers use): per word, start from
  * characters and repeatedly merge the adjacent pair with the LOWEST
  * merge rank, leftmost first on ties, until no adjacent pair is in the
  * merge table. For a genuinely-trained merge list this is equivalent to
  * replaying the merges in training order (a compound's constituents
  * always carry lower ranks than the compound, so creation order and
  * rank order agree) — `BpeSpec` proves that equivalence empirically
  * against an independent sequential-replay implementation over every
  * distinct corpus word.
  *
  * The merge table is a plan-time artifact (rank = array index; each
  * element is "a b"); rows only carry text. The rank map is memoized per
  * thread keyed on the evaluated array instance — a Literal evaluates to
  * the same object every call, so the map builds once per task, not per
  * row. Participates in whole-stage codegen via a static call.
  */
case class BpeEncode(text: Expression, merges: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = merges

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, merges.dataType) match {
      case (StringType, ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode needs (string, array<string>), got $other")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(t: Any, m: Any): Any =
    BpeEncode.compute(t.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, m) => s"graft.functions.BpeEncode.compute($t, $m)")

  override def prettyName: String = "bpe_encode"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(text = newLeft, merges = newRight)
}

object BpeEncode {

  /** Column-API encode; merges as an array<string> column of "a b" pairs
    * in rank order (normally a plan-time literal from `bpeTrain`). */
  def bpeEncode(text: Column, merges: Column): Column =
    ColumnBridge.column(
      BpeEncode(ColumnBridge.expression(text), ColumnBridge.expression(merges)))

  // (merges instance, its rank map) — identity-keyed memo; a Literal's
  // eval returns the same ArrayData every call, so per task this builds
  // exactly once. A non-literal merge column still works (rebuilds when
  // the instance changes), it just loses the memo.
  private val cached =
    new ThreadLocal[(ArrayData, java.util.HashMap[String, Integer])]

  private def ranksOf(merges: ArrayData): java.util.HashMap[String, Integer] = {
    val hit = cached.get()
    if (hit != null && (hit._1 eq merges)) return hit._2
    val m = new java.util.HashMap[String, Integer]()
    var i = 0
    val n = merges.numElements()
    while (i < n) {
      val pair = merges.getUTF8String(i).toString
      // first merge wins if a pair somehow repeats (lower rank)
      m.putIfAbsent(pair, Integer.valueOf(i))
      i += 1
    }
    cached.set((merges, m))
    m
  }

  /** One document → flat piece array; called from generated code. */
  def compute(text: UTF8String, merges: ArrayData): ArrayData = {
    val ranks = ranksOf(merges)
    val words = text.toString.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[Any](words.length * 2)
    var w = 0
    while (w < words.length) {
      encodeWord(words(w), ranks, out)
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(word: String, ranks: java.util.HashMap[String, Integer],
      out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
    val n = word.length
    if (n == 0) return // split(" ", -1) keeps empties; they carry no pieces
    val syms = new scala.collection.mutable.ArrayBuffer[String](n)
    // seed by CODE POINT, not code unit: bpeTrain's split(w, "") keeps
    // surrogate pairs whole (Java regex is code-point-aware), and a lone
    // surrogate would be corrupted to '?' by the UTF-8 encoder — the
    // alphabets must agree or non-BMP text breaks concat-identity
    var i = 0
    while (i < n) {
      val cc = Character.charCount(word.codePointAt(i))
      syms += word.substring(i, i + cc)
      i += cc
    }
    var done = false
    while (!done && syms.length >= 2) {
      var best = -1
      var bestRank = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); best = j }
        j += 1
      }
      if (best < 0) done = true
      else {
        syms(best) = syms(best) + syms(best + 1)
        syms.remove(best + 1)
      }
    }
    var k = 0
    while (k < syms.length) { out += UTF8String.fromString(syms(k)); k += 1 }
  }
}
