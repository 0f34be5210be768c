package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming cross-batch dedup (SURVEY §2.4 D3 as a stream): the
  * reference dedups ids across page boundaries within one run
  * (src/trv/endpoints.py:177-202); the streaming analogue must dedup
  * across MICRO-BATCHES with bounded state. `dropDuplicatesWithinWatermark`
  * keeps a key's dedup state only until the watermark passes its event
  * time + delay — unlike plain `dropDuplicates(keys)`, whose state grows
  * forever when the event-time column isn't part of the key (the usual
  * case: the same logical record re-arrives with a new fetch timestamp).
  *
  * At 100 TB/day this is the difference between a dedup whose state is
  * bounded by (keys seen within the watermark horizon) and one that
  * eventually OOMs the state store.
  */
object StreamDedup {

  /** Emit each key once per watermark horizon: duplicates of a key that
    * arrive while its first occurrence is still within the watermark are
    * dropped; state evicts as the watermark advances. */
  def run(stream: DataFrame, outDir: String, checkpointDir: String,
      keys: Seq[String], eventTimeCol: String, watermark: String): StreamingQuery =
    stream
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(keys)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** CONTENT-based streaming near-dup filter: the dedup key is the full
    * k-component minhash signature of `textCol` (a stateless projection,
    * [[graft.operators.DedupOps.minhashComponents]]), so two documents
    * collide when ALL k signature slices agree — the AND-composition.
    * That is deliberately the high-precision end of the LSH spectrum:
    * one state row per distinct signature, one stateful operator, state
    * bounded by the watermark horizon exactly like [[run]]. The
    * OR-composition (drop on ANY shared band — higher recall) needs
    * per-band state plus a doc-level join back, i.e. two stateful
    * operators; that recall belongs to the batch/incremental path
    * (`DedupOps.dedupAgainstIndex`), with this filter as the cheap
    * in-flight guard in front of it.
    *
    * `shingleN=1` keys on the token SET (catches reorderings and
    * repetitions); `shingleN>=3` keys on order-preserving shingles
    * (catches only near-verbatim text, matching the incremental index). */
  def runNearDupSignature(stream: DataFrame, outDir: String,
      checkpointDir: String, textCol: String, eventTimeCol: String,
      watermark: String, k: Int = 4, shingleN: Int = 1): StreamingQuery = {
    import org.apache.spark.sql.functions._
    val sigKey = md5(concat(
      graft.operators.DedupOps.minhashComponents(col(textCol), k, shingleN): _*))
    stream
      .withColumn("__graft_sig", sigKey)
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("__graft_sig"))
      .drop("__graft_sig")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
