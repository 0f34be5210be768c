package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("mapPartitions feature extraction agrees with the declarative plan") {
    val docs = Tables.documents(spark, sf)
    val viaMap = Multimodal.extractFeatures(spark, Multimodal.withPayload(docs))
    val declarative = SparkEntry.queries("q_multimodal_features")(spark, sf)
      .select("doc_id", "n_bytes", "width", "height")
    val diff = viaMap.exceptAll(declarative).count() +
      declarative.exceptAll(viaMap).count()
    assert(diff == 0)
  }

  test("payload bytes round-trip the document text") {
    val docs = Tables.documents(spark, sf).limit(5)
    val rows = Multimodal.withPayload(docs)
      .join(docs, "doc_id")
      .select(col("text"), decode(col("payload"), "UTF-8").as("back"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getString(0) == r.getString(1)))
  }

  test("resize and frame-sample stages keep the binary contract, executor-side") {
    val docs = Tables.documents(spark, sf).limit(20)
    val payloads = Multimodal.withPayload(docs)
    val resized = Multimodal.resizeAll(spark, payloads, 16, 16)
    assert(resized.count() == 20)
    assert(resized.agg(max("n_bytes")).head().getInt(0) <= 256)
    val frames = Multimodal.sampleFrames(spark, payloads, 4)
    assert(frames.count() == 80) // 4 frames per doc
    assert(frames.groupBy("doc_id").count().agg(min("count")).head().getLong(0) == 4)
  }

  test("stub decode dims are deterministic and in range") {
    val (w, h) = Multimodal.stubDecodeDims(1000)
    assert((w, h) == Multimodal.stubDecodeDims(1000))
    assert(w >= 32 && w < 64 && h >= 32 && h < 64)
  }
}
