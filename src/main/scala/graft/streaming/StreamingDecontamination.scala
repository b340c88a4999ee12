package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.LongType

/** Streaming benchmark decontamination — the t16 overlap report over a
  * LIVE document feed: each arriving doc is scored against a STATIC
  * benchmark gram set (benchmarks are fixed while ingest runs), so a
  * pipeline can tag or divert contaminated docs at ingest time instead
  * of re-scanning the corpus.
  *
  * Plan shape (identical contract to batch t16, re-expressed for
  * Structured Streaming):
  *   - grams from the codegen'd trigram_tf_pairs scan kernel
  *     (stateless projection);
  *   - the broadcast Bloom probe drops ~96% of the gram stream
  *     scan-side (stateless filter; sketch built ONCE from the static
  *     eval side before the stream starts);
  *   - the exact verify is a STREAM-STATIC left-semi join — stateless,
  *     no watermark interaction, false positives removed;
  *   - the only STATE is the per-(window, doc) hit count: docs are
  *     row-atomic so each group completes within its micro-batch, and
  *     the event-time watermark evicts it after the horizon — state is
  *     bounded by (arrival rate × horizon), never corpus-sized.
  *
  * The watermark is declared on the INPUT, and the gram explode is
  * explode_OUTER: an inner explode lets Catalyst infer `size(ps) > 0`
  * (InferFiltersFromGenerate) and push it BELOW the EventTimeWatermark
  * node, so zero-gram rows — the flush sentinel, short docs — would be
  * dropped before the event-time stats and the watermark would never
  * advance past the last real window (observed: the report stayed
  * empty). The outer explode keeps every row's event time visible to
  * the clock; its null-gram rows die at the exact LEFT-SEMI join
  * (null never equi-matches) — NOT at the bloom probe, whose
  * xxhash64(null) folds to the seed value and can collide to a
  * might_contain=true. Both operators sit safely ABOVE the watermark
  * node; do not remove or reorder the semi join without adding an
  * explicit gram IS NOT NULL filter (kept out today because a
  * null-filter adjacent to the generate invites Catalyst to rewrite
  * the outer explode back to the inner form this comment exists to
  * forbid).
  */
object StreamingDecontamination {

  /** Per-doc eval-overlap report rows (doc_id, source, n_grams,
    * n_hits) of a streaming feed with (doc_id, source, text,
    * `eventTimeCol`) against the static distinct eval grams + its
    * prebuilt bloom sketch. Emits on watermark close (Append). */
  def overlapReport(stream: DataFrame, evalGrams: DataFrame,
                    sketch: Array[Byte], eventTimeCol: String,
                    watermark: String, windowLen: String = "1 hour"): DataFrame = {
    import graft.functions.GraftFunctions.trigramTfPairs
    stream
      .withWatermark(eventTimeCol, watermark)
      .select(col(eventTimeCol).as("evt"), col("doc_id"), col("source"),
        trigramTfPairs(col("text")).as("ps"))
      .select(col("evt"), col("doc_id"), col("source"),
        size(col("ps")).cast(LongType).as("n_grams"), explode_outer(col("ps")).as("p"))
      .select(col("evt"), col("doc_id"), col("source"), col("n_grams"),
        col("p.t").as("gram"))
      .filter(graft.operators.BloomSketch.probe(sketch, col("gram")))
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(window(col("evt"), windowLen),
        col("doc_id"), col("source"), col("n_grams"))
      .agg(count(lit(1)).as("n_hits"))
      .select("doc_id", "source", "n_grams", "n_hits")
  }

  /** Build the static eval side from a batch documents frame: the
    * distinct eval 3-grams (cached — bounded by the benchmark) and
    * their bloom sketch, shared by probe and verify. */
  def evalSide(evalDocs: DataFrame): (DataFrame, Array[Byte]) = {
    import graft.functions.GraftFunctions.trigramTfPairs
    val evalGrams = evalDocs
      .select(trigramTfPairs(col("text")).as("ps"))
      .select(explode(col("ps")).as("p")).select(col("p.t").as("gram"))
      .distinct().cache()
    (evalGrams, graft.operators.BloomSketch.build(evalGrams, "gram"))
  }

  /** Driver-gate replay: the sf documents table split into `nBatches`
    * doc_id-ranged parquet chunks fed through a file-source stream
    * (event time synthesized as epoch + doc_id seconds, so arrival
    * order = event-time order), a far-future zero-gram flush doc
    * closing the last window; the per-window report lands in a parquet
    * FILE sink and only the final (bounded-at-gate-SF) report is
    * collected. Result = batch t16's report exactly, which is why the
    * same CTE oracle checks this query. */
  def replayGate(s: SparkSession, sfDir: String, nBatches: Int = 3): DataFrame = {
    val all = graft.Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val (evalGrams, sketch) =
      evalSide(all.filter(col("doc_id") % 37 === 0))
    val train = all.filter(col("doc_id") % 37 =!= 0)
    // the flush doc has zero grams (empty text) so it never reaches the
    // report; the harness's doc-gate sentinel margin dominates every
    // real window end
    ReplayHarness.runDocGate(s, "graft-t16-replay", nBatches, train,
      stream => overlapReport(stream, evalGrams, sketch, "evt", "1 hour"),
      (sp, out) => sp.read.parquet(out).orderBy("doc_id"))
  }
}
