package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming normalization + PII scrub — c12 over a LIVE document
  * feed: redaction runs AT INGEST (the operating mode of a
  * continuously-fed pipeline; scrubbing post-hoc means PII sits in
  * the lake until the next batch pass). The scrub itself
  * ([[graft.queries.PiiScrub.scrub]] — NFC + the one-pass byte
  * kernel) is a STATELESS projection; the only state is the
  * per-(window, source) counter row, watermark-evicted — bounded by
  * (arrival rate × horizon) × |sources|, never corpus-sized. Every
  * c12 output column is a SUM of per-doc values, so the Append window
  * emissions re-aggregate to EXACTLY the batch report (sums
  * distribute over disjoint windows) — which is why batch c12's
  * planted-corpus SQL oracle checks this query too (the t20/t22
  * evidence pattern).
  *
  * The replay gate is ~15 lines on [[ReplayHarness.runDocGate]] — the
  * consolidated harness owns staging/sentinel/drive-loop/cleanup; the
  * `_flush` doc DOES flow through the scrub (its doc_id hits planted
  * branches like any other) and is dropped by the read-back on its
  * `_flush` source, never pre-watermark (the t16 stalled-clock
  * lesson).
  */
object StreamingPiiScrub {

  /** Windowed per-source scrub counters of a streaming (doc_id,
    * source, text, `eventTimeCol`) feed over the SAME planted corpus
    * as batch c12; emits on watermark close (Append). */
  def scrubReport(stream: DataFrame, eventTimeCol: String, watermark: String,
                  windowLen: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val planted = graft.queries.PiiScrub.planted(
      stream.withWatermark(eventTimeCol, watermark))
    graft.queries.PiiScrub.scrub(planted, "planted")
      .groupBy(window(col(eventTimeCol), windowLen), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("n_emails"),
        sum(col("n_phones")).as("n_phones"),
        sum(col("n_ips")).as("n_ips"),
        sum(when(col("n_emails") + col("n_phones") + col("n_ips") > 0, 1L)
          .otherwise(0L)).as("n_docs_pii"),
        sum(when(col("nfc") =!= col("planted"), 1L).otherwise(0L)).as("n_docs_nfc"),
        sum(length(col("planted")).cast(LongType) -
          length(col("scrubbed")).cast(LongType)).as("chars_removed"))
      .select("source", "n_docs", "n_emails", "n_phones", "n_ips",
        "n_docs_pii", "n_docs_nfc", "chars_removed")
  }

  /** Driver-gate replay (the shared doc-gate convention): final
    * report = per-source re-aggregation of the window emissions =
    * batch c12 exactly. */
  def replayGate(s: SparkSession, sfDir: String, nBatches: Int = 3): DataFrame = {
    val all = graft.Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    ReplayHarness.runDocGate(s, "graft-c12-replay", nBatches, all,
      stream => scrubReport(stream, "evt", "1 hour"),
      (sp, out) => sp.read.parquet(out)
        .filter(col("source") =!= "_flush")
        .groupBy(col("source"))
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("n_emails")).as("n_emails"),
          sum(col("n_phones")).as("n_phones"),
          sum(col("n_ips")).as("n_ips"),
          sum(col("n_docs_pii")).as("n_docs_pii"),
          sum(col("n_docs_nfc")).as("n_docs_nfc"),
          sum(col("chars_removed")).as("chars_removed"))
        .orderBy("source"))
  }
}
