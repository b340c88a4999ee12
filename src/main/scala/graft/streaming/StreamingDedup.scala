package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming analogue of the batch
  * d01 operator, for ingest-time dedup of a live document/record feed.
  *
  * State discipline (100 TB): `dropDuplicatesWithinWatermark` keys the
  * dedup state on the cheap 64-bit content hash only (not the payload)
  * and Spark evicts entries once they age past the event-time
  * watermark, so state is bounded by (arrival rate × watermark
  * horizon) regardless of stream length — an unwatermarked
  * `dropDuplicates` would grow state forever. Within the horizon,
  * delivery of a given content is exactly-once; a duplicate arriving
  * later than the watermark can re-emit (the standard horizon trade —
  * the batch d01 pass downstream stays the global guarantee).
  */
object StreamingDedup {

  /** Distinct-content rows of a streaming DataFrame with a `text`
    * column and an event-time column: first arrival per content hash
    * within the watermark horizon survives. */
  def dedupByContent(stream: DataFrame, eventTimeCol: String,
                     watermark: String): DataFrame =
    stream
      .withColumn("content_hash", xxhash64(col("text")))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
