package graft

import graft.functions.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gates on the ADAPTIVE kNN-graph build (`knnGraphAdaptive`) — the
  * 100 TB path beside the fixed-shape `q_knn_graph` oracle:
  *
  *  1. recall PARITY at fixture scale: graph recall@3 against the exact
  *     brute-force top-3 must meet or beat the fixed 8×8 build's (the
  *     VERDICT r7 "done" criterion). Measured: adaptive 0.42 vs fixed
  *     0.13 at n=500 — the floors below pin that with slack, so a recall
  *     REGRESSION fails loudly while fixture evolution has headroom.
  *  2. shape law: adaptiveBits follows ceil(log₂ n)+4 with the NdBits
  *     floor — the occupancy bound that keeps candidate work linear.
  *  3. determinism: two independent builds return identical edges
  *     (hash-derived hyperplanes, rounded sims, total tie-breaks).
  */
class KnnAdaptiveSpec extends SparkSpec {

  private def recallAt3(approx: DataFrame): Double = {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("ed"))
    val w = Window.partitionBy("id1").orderBy(col("sim").desc, col("id2").asc)
    val truth = emb.select(col("vec_id").as("id1"), col("ed").as("e1"))
      .join(emb.select(col("vec_id").as("id2"), col("ed").as("e2")),
        col("id1") =!= col("id2"))
      .withColumn("sim", round(Similarity.dot(col("e1"), col("e2")), 4))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("id1").as("vec_id"), col("id2").as("neighbor"))
    val n = truth.count()
    val hit = truth.join(approx.select("vec_id", "neighbor"),
      Seq("vec_id", "neighbor"), "left_semi").count()
    hit.toDouble / n
  }

  test("adaptive build recall@3 meets or beats the fixed 8x8 build") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val adaptive = recallAt3(Similarity.knnGraphAdaptive(emb))
    val fixed = recallAt3(
      SparkEntry.queries("q_knn_graph")(spark, sf)
        .select("vec_id", "neighbor"))
    assert(adaptive >= fixed,
      s"adaptive recall $adaptive regressed below fixed build's $fixed")
    // absolute floor well under the measured 0.42 but well over the fixed
    // build's 0.13: catches a broken probe expansion without being brittle
    assert(adaptive >= 0.30, s"adaptive recall $adaptive below 0.30 floor")
  }

  test("adaptiveBits follows the ceil(log2 n)+4 occupancy law") {
    assert(Similarity.adaptiveBits(1) == Similarity.NdBits)
    assert(Similarity.adaptiveBits(256) == 12)   // ceil(log2 255)=8 → 12
    assert(Similarity.adaptiveBits(500) == 13)   // the verification-fixture shape
    assert(Similarity.adaptiveBits(2000) == 15)  // sf0.1
    assert(Similarity.adaptiveBits(200000) == 22) // the 100x probe corpus
    assert(Similarity.adaptiveBits(Long.MaxValue) == 64)
  }

  test("two builds of the same corpus return identical edges") {
    val emb = Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val a = Similarity.knnGraphAdaptive(emb)
      .orderBy("vec_id", "neighbor").collect().toSeq
    val b = Similarity.knnGraphAdaptive(emb)
      .orderBy("vec_id", "neighbor").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
