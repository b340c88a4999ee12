package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming NEAR-duplicate suppression — the ingest-time analogue of
  * the batch d02/d07 near-dup operators: drop documents whose
  * 3-shingle Jaccard with ANY earlier-arrived document (within the
  * watermark horizon) is ≥ the threshold.
  *
  * Mechanics per micro-batch: MinHash64 signature → 16×4 band keys
  * (the d02 banding) → explode → `flatMapGroupsWithState` keyed on
  * the band bucket. Each bucket retains the hashed shingle sets of
  * the docs it has seen inside the horizon and exact-verifies
  * incoming docs against them (Jaccard on xxhash64'd shingles —
  * collision-negligible), so a band collision alone never suppresses
  * anything. A doc's 16 band verdicts are OR-reduced batch-locally
  * (all of a doc's band rows travel in the same micro-batch), which
  * the `run` wrapper does inside foreachBatch.
  *
  * Semantics (stated, matching d07's transitive clusters): the
  * suppressor set is "every earlier-arrived doc", not "every RETAINED
  * doc" — a doc suppressed by an already-suppressed doc is treated as
  * part of the same near-dup cluster, exactly as d07's connected
  * components treat chains. This is what removes the cross-bucket
  * feedback loop that would otherwise make distributed streaming
  * near-dup unimplementable without a coordinator.
  *
  * State discipline (100 TB): per bucket, (doc count in horizon) ×
  * ~n_shingles longs; eviction is data-driven (entries older than
  * horizon drop on every update) plus an event-time timeout that
  * clears idle buckets entirely once the watermark passes them. A doc
  * arriving later than the horizon can re-emit — the standard horizon
  * trade; batch d02/d07 downstream remain the global guarantee.
  *
  * Late-data trade (the OTHER side of the horizon): a ≥3-word doc
  * whose event time lags the watermark by more than the watermark
  * delay is dropped by FlatMapGroupsWithStateExec's pre-filter BEFORE
  * the suppressor runs — it is neither kept nor suppressed, it simply
  * never appears in the output (only <3-word docs bypass that filter,
  * via the `run` short-doc path). Size the watermark delay to the
  * source's real disorder bound; the batch d02/d07 pass downstream is
  * what recovers any doc the streaming layer dropped as too-late.
  */
object StreamingNearDup {

  final case class DocVerdict(
      doc_id: Long, event_ms: Long, text: String, suppressed: Boolean)

  final case class BucketEntry(docId: Long, ts: Long, hashes: Array[Long])
  final case class BucketState(entries: List[BucketEntry])
  final case class BandRow(
      bucket: Long, doc_id: Long, ts: java.sql.Timestamp, event_ms: Long,
      text: String, hashes: Array[Long])

  private def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val sa = a.toSet
    var inter = 0
    var i = 0
    while (i < b.length) { if (sa.contains(b(i))) inter += 1; i += 1 }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** Per-(band, doc) verdict stream (append). Docs with <3 words
    * produce no rows here — `run` routes them around the band path. */
  private[streaming] def bandVerdicts(
      stream: DataFrame, eventTimeCol: String, watermark: String,
      horizonMs: Long, threshold: Double): Dataset[DocVerdict] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val banded = stream
      .withColumn("event_ms", (unix_timestamp(col(eventTimeCol)) * 1000).cast("long"))
      .withWatermark(eventTimeCol, watermark)
      .withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 3)
      .withColumn("sh", expr(
        "array_distinct(transform(slice(sequence(0, size(ws)), 1, greatest(size(ws) - 2, 0)), " +
          "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))"))
      .withColumn("hashes", expr("transform(sh, s -> xxhash64(s))"))
      .withColumn("sig", graft.functions.GraftFunctions.minhash64(col("sh")))
      .withColumn("bucket", explode(expr(
        "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))")))
      // the watermarked timestamp column must survive into the typed
      // row — event-time timeout needs it downstream of the explode
      .select(col("bucket"), col("doc_id"), col(eventTimeCol).as("ts"),
        col("event_ms"), col("text"), col("hashes").cast("array<long>"))
      .as[BandRow]

    banded
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, DocVerdict](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // idle bucket aged past the watermark — drop it whole
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq.sortBy(r => (r.event_ms, r.doc_id))
            var entries = state.getOption.map(_.entries).getOrElse(Nil)
            val maxTs = (batch.map(_.event_ms) ++ entries.map(_.ts)).max
            // data-driven eviction: horizon is measured on event time
            entries = entries.filter(_.ts > maxTs - horizonMs)
            val out = batch.map { r =>
              val hit = entries.exists(e => jaccard(e.hashes, r.hashes) >= threshold)
              entries = BucketEntry(r.doc_id, r.event_ms, r.hashes) :: entries
              DocVerdict(r.doc_id, r.event_ms, r.text, suppressed = hit)
            }
            state.update(BucketState(entries))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.iterator
          }
      }
  }

  /** Start the suppression pipeline: `onBatch` receives, per
    * micro-batch, the KEPT documents (doc_id, event_ms, text) after
    * OR-reducing the band verdicts; short (<3-word) docs bypass the
    * band path unsuppressed. */
  def run(stream: DataFrame, eventTimeCol: String, watermark: String,
          horizonMs: Long, threshold: Double = 0.9,
          queryName: String = "near_dup_suppress")(
          onBatch: DataFrame => Unit): StreamingQuery = {
    val verdicts = bandVerdicts(stream, eventTimeCol, watermark, horizonMs, threshold)
    val short = stream
      .withColumn("event_ms", (unix_timestamp(col(eventTimeCol)) * 1000).cast("long"))
      .filter(size(split(col("text"), " ")) < 3)
      .select(col("doc_id"), col("event_ms"), col("text"), lit(false).as("suppressed"))
    verdicts.toDF().unionByName(short)
      .writeStream.queryName(queryName)
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // all band rows of a doc travel in the same micro-batch, so
        // the OR-reduction is batch-local and stateless
        val kept = batch.groupBy(col("doc_id"))
          .agg(first(col("event_ms")).as("event_ms"),
            first(col("text")).as("text"),
            max(col("suppressed")).as("suppressed"))
          .filter(!col("suppressed"))
          .drop("suppressed")
        onBatch(kept)
        ()
      }
      .start()
  }
}
