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
}
