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
}
