package graft

import graft.operators.Curation

/** Pins [[Curation.bpeTrain]] to the reference BPE algorithm (Sennrich
  * et al. 2016): greedy most-frequent adjacent pair per round over the
  * word-frequency table, lexicographic tie-break, left-to-right
  * non-overlapping merging. The toy-corpus sequence below is
  * hand-computed; `q_bpe_first_merge` oracle-gates round one's pair
  * statistics against DuckDB on the fixture corpus.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain reproduces the hand-computed merge sequence") {
    // words: low(3), lower(1), lowest(1)
    // round 1: (l,o)=5 ties (o,w)=5 → lexicographic → (l,o)
    // round 2: (lo,w)=5 → (lo,w)
    // round 3: (low,e)=2 → (low,e)
    // round 4: all pairs n=1 → lexicographic → (lowe,r)
    val docs = Seq("low low low", "lower lowest").toDF("text")
    val merges = Curation.bpeTrain(docs, "text", 4)
    assert(merges == Seq("l" -> "o", "lo" -> "w", "low" -> "e", "lowe" -> "r"))
  }

  test("overlapping pairs merge left-to-right non-overlapping") {
    // [a,a,a] under merge (a,a) must become [aa,a], so round 2 merges
    // (aa,a) — an overlapping (right-to-left) rewrite would give (a,aa)
    val docs = Seq("aaa aaa").toDF("text")
    assert(Curation.bpeTrain(docs, "text", 2) ==
      Seq("a" -> "a", "aa" -> "a"))
  }

  test("training stops when no pair remains") {
    val docs = Seq("ab ab").toDF("text")
    // one pair exists; asking for 5 merges returns just the one
    assert(Curation.bpeTrain(docs, "text", 5) == Seq("a" -> "b"))
  }

  test("deterministic across runs on the fixture corpus") {
    val docs = Tables.documents(spark, sf).select("text")
    val a = Curation.bpeTrain(docs, "text", 6)
    val b = Curation.bpeTrain(docs, "text", 6)
    assert(a == b)
    assert(a.size == 6)
    assert(a.distinct.size == 6, "a merge pair repeated — merging is broken")
  }

  // ---- bpe_encode (the native greedy APPLY expression) ----

  /** Independent reference encoder: replay the merges IN TRAINING ORDER,
    * each applied left-to-right non-overlapping (the bpeTrain rewrite
    * rule) — a different algorithm from the expression's greedy
    * lowest-rank loop; agreement between the two is the correctness
    * argument. */
  private def replayEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString).toList
    for ((a, b) <- merges) {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
        case x :: tail => out += x; rest = tail
        case Nil => ()
      }
      syms = out.toList
    }
    syms
  }

  private def encodeDf(texts: Seq[String], merges: Seq[(String, String)]) = {
    import org.apache.spark.sql.functions._
    val m = array(merges.map { case (a, b) => lit(a + " " + b) }: _*)
      .cast("array<string>") // empty list would otherwise type as array<null>
    texts.toDF("text")
      .select(graft.functions.BpeEncode.bpeEncode(col("text"), m).as("p"))
      .collect().map(_.getSeq[String](0)).toSeq
  }

  test("bpe_encode: hand-computed cases") {
    val merges = Seq("a" -> "b", "ab" -> "c")
    assert(encodeDf(Seq("abc xabc"), merges) == Seq(Seq("abc", "x", "abc")))
    // no merges → characters; empty words (double space) carry no pieces
    assert(encodeDf(Seq("ab  c"), Nil) == Seq(Seq("a", "b", "c")))
    // run of a's under (a,a): greedy leftmost = [aa, a], like the trainer
    assert(encodeDf(Seq("aaa"), Seq("a" -> "a")) == Seq(Seq("aa", "a")))
    // non-BMP text: symbols seed by CODE POINT — a surrogate pair stays
    // one symbol (lone surrogates would be corrupted to '?' in UTF-8)
    assert(encodeDf(Seq("a😀b"), Nil) ==
      Seq(Seq("a", "😀", "b")))
  }

  test("bpe_encode: concat-identity and count bounds on the fixture corpus") {
    val merges = Curation.bpeTrain(Tables.documents(spark, sf).select("text"), "text", 8)
    val texts = Tables.documents(spark, sf).select("text")
      .collect().map(_.getString(0)).toSeq
    val encoded = encodeDf(texts, merges)
    for ((t, p) <- texts.zip(encoded)) {
      assert(p.mkString == t.replace(" ", ""), "pieces must concat to the text")
      assert(p.size <= t.count(_ != ' ') , "merging can only shrink the piece count")
    }
  }

  test("bpe_encode: greedy rank loop ≡ sequential training-order replay, full vocabulary") {
    val docs = Tables.documents(spark, sf).select("text")
    val merges = Curation.bpeTrain(docs, "text", 8)
    val words = docs.select(
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("w"))
      .where(org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("w")) > 0)
      .distinct().collect().map(_.getString(0)).toSeq
    val got = encodeDf(words, merges)
    for ((w, g) <- words.zip(got))
      assert(g == replayEncode(w, merges), s"divergence on word '$w'")
  }

  test("bpe_encode: interpreted eval matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    import org.apache.spark.unsafe.types.UTF8String
    val merges = Seq("l" -> "o", "lo" -> "w", "low" -> "e")
    val mLit = Literal.create(
      new GenericArrayData(merges.map { case (a, b) =>
        UTF8String.fromString(a + " " + b) }.toArray[Any]),
      ArrayType(StringType))
    for (t <- Seq("lower lowest low", "", "x", "lll ooo")) {
      val interp = graft.functions.BpeEncode(
          Literal(UTF8String.fromString(t), StringType), mLit)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val viaDf = encodeDf(Seq(t), merges).head
      assert(interp.toArray[UTF8String](StringType).map(_.toString).toSeq == viaDf,
        s"parity broke on '$t'")
    }
  }
}
