package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming classifier scoring — t24's tree applied AT INGEST: the
  * deployment mode of a trained quality filter (train once on the
  * curated batch corpus, then score every arriving crawl doc before
  * it lands in the lake — the fastText/quality-classifier serving
  * pattern). The tree is TRAINED BATCH-SIDE ([[graft.queries
  * .TextAnalysis.t24TrainLevels]], the t19/s06/d13 two-phase
  * convention: build on the corpus, serve against the feed); scoring
  * is a STATELESS projection (feature kernel + the broadcast CASE
  * chain over ≤7 splits), so the only streaming state is the
  * per-(window, leaf, source) counter row, watermark-evicted. Every
  * t24 leaf count is a SUM of per-doc indicators, so the Append
  * window emissions re-aggregate to EXACTLY the batch leaf report —
  * which is why batch t24's SQL oracle (the full training
  * restatement) checks this query too.
  *
  * The replay gate rides [[ReplayHarness.runDocGate]]; the `_flush`
  * doc flows through scoring like any other (w = 0 features land it
  * in some leaf) and is dropped by the read-back on its `_flush`
  * source, never pre-watermark.
  */
object StreamingQualityScore {

  import graft.queries.TextAnalysis.{t24Assign, t24FeatsOf, t24LeafReport, t24TrainLevels, T24Depth, T24Split}

  /** Windowed per-(leaf, source) counts of a streaming (doc_id,
    * source, text, `eventTimeCol`) feed under a pre-trained tree;
    * emits on watermark close (Append). */
  def scoreReport(stream: DataFrame, levels: Seq[Seq[T24Split]],
                  eventTimeCol: String, watermark: String,
                  windowLen: String = "1 hour"): DataFrame = {
    val feats = t24FeatsOf(
      stream.withWatermark(eventTimeCol, watermark), Seq("source", eventTimeCol))
    t24Assign(feats, levels)
      .groupBy(window(col(eventTimeCol), windowLen), col("node"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"))
      .select("node", "source", "n_docs", "n_pos")
  }

  /** Driver-gate replay: train on the batch corpus, score the same
    * corpus as a replayed feed, re-aggregate the window emissions —
    * equals batch t24 exactly, so t24's oracle SQL states the check. */
  def replayGate(s: SparkSession, sfDir: String, nBatches: Int = 3): DataFrame = {
    val feats = graft.queries.TextAnalysis.t24Feats(s, sfDir).cache()
    val levels = t24TrainLevels(feats, T24Depth)
    val nSplits = levels.map(_.size).sum.toLong
    val all = graft.Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    ReplayHarness.runDocGate(s, "graft-t24-replay", nBatches, all,
      stream => scoreReport(stream, levels, "evt", "1 hour"),
      (sp, out) => t24LeafReport(
        sp.read.parquet(out)
          .filter(col("source") =!= "_flush")
          .groupBy(col("node").as("node_id"))
          .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_pos")).as("n_pos")),
        nSplits))
  }
}
