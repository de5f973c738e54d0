package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup: drop duplicate records by key as they arrive,
  * with a watermark bounding the dedup state (the streaming member of the
  * dedup family — exact/MinHash/SimHash/jaccard/embedding run batch, this
  * guards a live ingest pipeline against replayed events).
  *
  * `dropDuplicatesWithinWatermark` keeps one state entry per key only
  * until the watermark passes it — bounded state at any ingest rate,
  * unlike an unbounded `dropDuplicates` on a stream. Reference:
  * etl/pipeline.py's ingest path re-delivering websocket payloads;
  * cleaner.py:109 deduplicate is the batch analog.
  */
object StreamingDedup {

  /** @param events streaming DataFrame with an event-time column `ts`
    *               (TimestampType) and the dedup key columns
    */
  def dedup(events: DataFrame, watermark: String, keys: Seq[String]): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys)
}
