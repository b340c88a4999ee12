package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the streaming analogue of the batch
  * d01 operator, for ingest-time dedup of a live document/record feed.
  *
  * State discipline (100 TB): `dropDuplicatesWithinWatermark` keys the
  * dedup state on cheap content hashes only (not the payload) and
  * Spark evicts entries once they age past the event-time watermark,
  * so state is bounded by (arrival rate × watermark horizon)
  * regardless of stream length — an unwatermarked `dropDuplicates`
  * would grow state forever. The key is the PAIR of independent
  * hashes (xxhash64, crc32): a single 64-bit key would FALSE-DROP a
  * colliding distinct record (~50% odds of some collision by ~5e9
  * keys in a horizon — plausible at ingest scale); the 96-bit pair
  * pushes that to ~1e-29 per pair while keeping state payload-free.
  * Within the horizon, delivery of a given content is exactly-once; a
  * duplicate arriving later than the watermark can re-emit (the
  * standard horizon trade — the batch d01 pass downstream stays the
  * global guarantee).
  */
object StreamingDedup {

  /** Distinct-content rows of a streaming DataFrame with a `text`
    * column and an event-time column: first arrival per content hash
    * pair within the watermark horizon survives. */
  def dedupByContent(stream: DataFrame, eventTimeCol: String,
                     watermark: String): DataFrame =
    stream
      .withColumn("content_hash", xxhash64(col("text")))
      .withColumn("content_crc", crc32(col("text").cast("binary")))
      .withWatermark(eventTimeCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash", "content_crc")
}
