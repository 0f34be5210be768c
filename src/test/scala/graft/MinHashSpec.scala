package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

/** Pins the native `functions.MinHashSlices` to the declarative
  * transform+aggregate fold it replaced: identical signatures on the
  * fixture corpus AND the edge rows (empty text, single token, adjacent
  * spaces producing empty tokens, sub-shingle-length docs, NULL text),
  * for both unigram and 3-gram shingles. The DuckDB oracle mirrors the
  * md5 construction, so this equivalence is what keeps every dedup-chain
  * oracle valid.
  */
class MinHashSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(n: Int) = {
    val sh =
      if (n <= 1) array_distinct(split(col("text"), " "))
      else DedupOps.shingles(col("text"), n)
    val hashes = transform(sh, t => md5(t))
    val init = struct((1 to 4).map(i => lit("~").as(s"m$i")): _*)
    val folded = aggregate(hashes, init, (acc, h) =>
      struct((1 to 4).map(i =>
        least(acc.getField(s"m$i"), substring(h, (i - 1) * 8 + 1, 8)).as(s"m$i")): _*))
    (1 to 4).map(i => folded.getField(s"m$i").as(s"sig$i"))
  }

  test("native minhash equals the declarative fold on fixture + edge rows") {
    val edges = Seq(
      (100001L, ""), (100002L, "a"), (100003L, "a  b"), (100004L, "x y"))
      .toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(edges)
    for (n <- Seq(1, 3)) {
      val ref = docs.select(col("doc_id") +: declarative(n): _*)
      val got = DedupOps.minhashSignature(docs, "doc_id", "text", 4, shingleN = n)
      assert(got.schema.fieldNames.toSeq == ref.schema.fieldNames.toSeq)
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"shingleN=$n: native and declarative signatures differ")
    }
  }

  test("NULL text yields NULL signatures at every shingle width") {
    // the replaced declarative fold was inconsistent here: n=1 gave NULL
    // but n>=2 silently signed NULL as the empty document (concat_ws
    // swallows a NULL slice). NULL in, NULL out is the defined semantics
    // now — a missing document must not collide with an empty one.
    val one = Seq((1L, None: Option[String])).toDF("doc_id", "text")
    for (n <- Seq(1, 3)) {
      val row = DedupOps.minhashSignature(one, "doc_id", "text", 4, shingleN = n)
        .collect().head
      for (i <- 1 to 4)
        assert(row.isNullAt(row.fieldIndex(s"sig$i")), s"shingleN=$n sig$i")
    }
  }

  test("native word n-grams equal the declarative transform on fixture + edge rows") {
    val edges = Seq(
      (100001L, ""), (100002L, "a"), (100003L, "a  b"), (100004L, "x y"))
      .toDF("doc_id", "text")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .unionByName(edges)
    for (n <- Seq(2, 3, 5)) {
      val toks = split(col("text"), " ")
      val starts = sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1)))
      val ref = docs.select(col("doc_id"),
        transform(starts, i => concat_ws(" ", slice(toks, i, lit(n)))).as("g"))
      val got = docs.select(col("doc_id"), DedupOps.wordNGrams(col("text"), n).as("g"))
      assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
        s"n=$n: native and declarative n-grams differ")
    }
  }

  test("SQL registration: minhash_slices and word_ngrams callable from SQL") {
    GraftFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT minhash_slices('a b c', 4, 3) AS mh, word_ngrams('a b c', 2) AS ng")
      .head()
    assert(r.getSeq[String](0).length == 4)
    assert(r.getSeq[String](0).forall(_.matches("[0-9a-f]{8}")))
    assert(r.getSeq[String](1) == Seq("a b", "b c"))
  }

  test("the signature stage stays inside whole-stage codegen") {
    val plan = DedupOps.minhashSignature(
      Tables.documents(spark, sf), "doc_id", "text", 4, shingleN = 3)
      .queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("minhash_slices"), plan)
  }
}
