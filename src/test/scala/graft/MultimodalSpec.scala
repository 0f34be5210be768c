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

  test("real PNG payloads decode to true dimensions and resize through the imageio codec") {
    import spark.implicits._
    // build a real 40×20 PNG in-process (no fixture files needed)
    val img = new java.awt.image.BufferedImage(40, 20, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 40).foreach(x => (0 until 20).foreach(y => img.setRGB(x, y, x * 31 + y)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val df = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    // decode: the real image reports its true dims, junk falls to the stub
    val feats = Multimodal.extractFeatures(spark, df)
      .orderBy("doc_id").collect()
    assert(feats(0).getInt(2) == 40 && feats(0).getInt(3) == 20)
    val (sw, sh) = Multimodal.stubDecodeDims("not an image".getBytes("UTF-8").length)
    assert(feats(1).getInt(2) == sw && feats(1).getInt(3) == sh)

    // resize: output is a real PNG that decodes back at the target dims
    val resized = Multimodal.resizeAll(spark, df, 16, 8)
      .orderBy("doc_id").collect()
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(0).getAs[Array[Byte]]("resized")))
    assert(back.getWidth == 16 && back.getHeight == 8)
    // undecodable payload keeps the stub contract (length bounded by w*h)
    assert(resized(1).getAs[Array[Byte]]("resized").length <= 16 * 8)
  }

  test("corrupt-but-recognized image bytes degrade to the stub instead of failing the task") {
    // a real PNG truncated mid-body: a reader CLAIMS the format (magic
    // header intact), then throws during decode — must not kill the task
    val img = new java.awt.image.BufferedImage(20, 10, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val corrupt = bos.toByteArray.take(bos.size() / 2)
    val (w, h) = Multimodal.decodeDims(corrupt)
    assert((w, h) == Multimodal.stubDecodeDims(corrupt.length))
    val resized = Multimodal.resizePayload(corrupt, 8, 8)
    assert(resized.length <= 64) // stub contract
    import spark.implicits._
    val df = Seq((1L, corrupt)).toDF("doc_id", "payload")
    assert(Multimodal.extractFeatures(spark, df).count() == 1) // no task failure
  }

  test("stub decode dims are deterministic and in range") {
    val (w, h) = Multimodal.stubDecodeDims(1000)
    assert((w, h) == Multimodal.stubDecodeDims(1000))
    assert(w >= 32 && w < 64 && h >= 32 && h < 64)
  }
}
