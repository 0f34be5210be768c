package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star scope): media payloads as opaque
  * `binary` columns with typed metadata structs, plus a per-partition
  * feature-extraction stage. Image decode and resize run through
  * `javax.imageio` (pure-JDK PNG/BMP/GIF/JPEG codecs) with a
  * clearly-marked deterministic STUB fallback for undecodable payloads
  * (the text-bytes fixtures, and any format the JDK lacks — video frame
  * sampling stays stubbed, there is no JDK video codec). The Spark-side
  * contract — schema, batching, partition-parallel execution — is real
  * and is what matters at 100 TB (payload bytes never pass through the
  * driver; features are computed executor-side, partition by partition).
  */
object Multimodal {

  /** Output schema of the feature-extraction stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Attach a fake media payload to each document: the UTF-8 bytes of its
    * text standing in for an encoded image, plus a metadata struct. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source").as("origin"), col("n_chars").as("declared_len"))
        .as("meta"))

  /** STUB decode: derives "dimensions" from the byte length so the
    * pipeline shape is testable on payloads that aren't real images
    * (the text-bytes fixtures). Real images go through [[decodeDims]]. */
  def stubDecodeDims(nBytes: Int): (Int, Int) =
    (32 + nBytes % 32, 32 + (nBytes / 64) % 32)

  // inputs are in-memory byte arrays: without this, ImageIO spools every
  // payload to an executor-local temp FILE before decoding (per-record
  // disk I/O inside the mapPartitions hot loop)
  javax.imageio.ImageIO.setUseCache(false)

  /** ImageIO decode that treats BOTH "no reader claims the format"
    * (read returns null) and "a reader claimed it but the bytes are
    * corrupt" (read throws) as undecodable — at corpus scale corrupt
    * images are guaranteed, and one bad record must degrade to the stub,
    * not kill the task. */
  private def tryDecode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Real decode via `javax.imageio` (ships with the JDK — PNG, BMP, GIF,
    * JPEG readers; no native deps, works headless). Undecodable payloads
    * (unknown format OR corrupt bytes) fall back to the deterministic
    * stub, so one code path serves both real images and the codec-less
    * fixtures. */
  def decodeDims(payload: Array[Byte]): (Int, Int) =
    tryDecode(payload)
      .map(img => (img.getWidth, img.getHeight))
      .getOrElse(stubDecodeDims(payload.length))

  /** STUB resize for undecodable payloads: binary in, binary out, output
    * length a function of the target dims — keeps downstream stages
    * (storage sizing, schema) exercised without a decodable image. */
  def stubResize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.min(payload.length, w * h))
    var i = 0
    while (i < out.length) { out(i) = payload(i % payload.length); i += 1 }
    out
  }

  /** Real resize: decode with `javax.imageio`, bilinear-scale onto a
    * w×h canvas, re-encode as PNG. Falls back to [[stubResize]] when the
    * payload isn't a decodable image. */
  def resizePayload(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = tryDecode(payload).orNull
    if (img == null) stubResize(payload, w, h)
    else {
      val out = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** STUB frame sampling: a real implementation would decode a video
    * container and grab every k-th frame; the fake slices the payload
    * into `frames` equal chunks. Output shape (array<binary> with frame
    * index struct) is the real contract. */
  def stubFrameSample(payload: Array[Byte], frames: Int): Seq[(Int, Array[Byte])] = {
    val n = math.max(1, frames)
    val step = math.max(1, payload.length / n)
    (0 until n).map(i => i -> payload.slice(i * step, math.min((i + 1) * step, payload.length)))
  }

  /** Resize stage over the payload column: partition-parallel, no driver
    * involvement (the 100 TB contract — payload bytes move executor to
    * executor only). */
  def resizeAll(spark: SparkSession, withBytes: DataFrame, w: Int, h: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("resized", BinaryType),
      StructField("n_bytes", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withBytes.select("doc_id", "payload").mapPartitions { it =>
      it.map { r =>
        val out = resizePayload(r.getAs[Array[Byte]](1), w, h)
        Row(r.getLong(0), out, out.length)
      }
    }(enc).toDF()
  }

  /** Frame-sample stage: one row per (doc, frame). */
  def sampleFrames(spark: SparkSession, withBytes: DataFrame, frames: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    withBytes.select("doc_id", "payload").mapPartitions { it =>
      it.flatMap { r =>
        stubFrameSample(r.getAs[Array[Byte]](1), frames).map {
          case (i, b) => Row(r.getLong(0), i, b)
        }
      }
    }(enc).toDF()
  }

  /** Partition-parallel feature extraction over binary payloads. Runs as
    * `mapPartitions` so a real decoder could batch/reuse native resources
    * per partition (the JVM analogue of a Pandas-UDF batch loop). */
  def extractFeatures(spark: SparkSession, withBytes: DataFrame): DataFrame = {
    val rowEnc = org.apache.spark.sql.Encoders.row(featureSchema)
    val ds: Dataset[Row] = withBytes.select("doc_id", "payload").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h) = decodeDims(bytes)
        Row(id, bytes.length, w, h)
      }
    }(rowEnc)
    ds.toDF()
  }

  val defs: Seq[QueryDef] = Seq(

    // binary payload + metadata + feature extraction, expressed with
    // pure built-ins (the mapPartitions variant above is unit-tested and
    // must agree with this declarative form)
    QueryDef(
      "q_multimodal_features",
      (s, d) => withPayload(Tables.documents(s, d))
        .select(
          col("doc_id"),
          octet_length(col("payload")).as("n_bytes"),
          (lit(32) + octet_length(col("payload")) % 32).as("width"),
          (lit(32) + expr("octet_length(payload) div 64") % 32).as("height"),
          col("meta.origin").as("origin"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  CAST(octet_length(payload) AS INT) AS n_bytes,
             |  CAST(32 + octet_length(payload) % 32 AS INT) AS width,
             |  CAST(32 + (octet_length(payload) // 64) % 32 AS INT) AS height,
             |  source AS origin
             |FROM (SELECT doc_id, encode(text) AS payload, source FROM documents)
             |ORDER BY doc_id""".stripMargin))
  )
}
