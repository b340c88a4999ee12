package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.LongType

/** Streaming BPE tokenization — t22's apply pass over a LIVE document
  * feed against the PERSISTED tokenizer (operators.BpeTokenizer):
  * the tokenizer is trained once, then every arriving corpus batch is
  * tokenized at ingest — train-once / tokenize-many composed with the
  * streaming operating mode, the full 100 TB ingest shape.
  *
  * Plan: the per-doc (word, tf) pairs come from the codegen'd
  * WordTfPairs kernel (stateless projection; explode_OUTER so the
  * zero-word flush row keeps the event-time clock visible — the t16
  * lesson); the vocab lookup is a STREAM-STATIC inner join against
  * the persisted (word → n_tok) parquet — stateless, null/unknown
  * words drop out ABOVE the watermark node; the only STATE is the
  * per-(window, doc) token accumulator — docs are row-atomic, each
  * group completes within its micro-batch, watermark-evicted. The
  * per-doc Append emissions re-aggregate per source to EXACTLY the
  * batch t22 report (count/sum/max over disjoint doc sets), which is
  * why t22's full-chain SQL oracle checks this query too.
  */
object StreamingBpeTokenize {

  /** Per-doc token rows (source, doc_id, tokens, chars) of a streaming
    * (doc_id, source, text, `eventTimeCol`) feed against a static
    * (word, n_tok) vocabulary; emits on watermark close (Append). */
  def tokenRows(stream: DataFrame, vocab: DataFrame, eventTimeCol: String,
                watermark: String, windowLen: String = "1 hour"): DataFrame = {
    import graft.functions.GraftFunctions.wordTfPairs
    stream
      .withWatermark(eventTimeCol, watermark)
      .select(col(eventTimeCol).as("evt"), col("doc_id"), col("source"),
        explode_outer(wordTfPairs(col("text"))).as("p"))
      .select(col("evt"), col("doc_id"), col("source"),
        col("p.t").as("word"), col("p.c").as("tf"))
      .join(vocab, Seq("word")) // stream-static, stateless
      .groupBy(window(col("evt"), windowLen), col("doc_id"), col("source"))
      .agg(sum(col("tf") * col("n_tok")).as("tokens"),
        sum(col("tf") * length(col("word")).cast(LongType)).as("chars"))
      .select("source", "doc_id", "tokens", "chars")
  }

  /** Driver-gate replay (the t16/t20 file-source convention); the
    * final report = per-source re-aggregation of the per-doc
    * emissions = batch t22 exactly. */
  def replayGate(s: SparkSession, sfDir: String, nBatches: Int = 3): DataFrame = {
    import s.implicits._
    import java.nio.file.{Files, Path, StandardCopyOption}
    import graft.queries.Q._
    val tokDir = graft.operators.BpeTokenizer.ensureBuilt(s, sfDir)
    val vocab = graft.operators.BpeTokenizer.vocab(s, tokDir)
    val all = graft.Tables.load(s, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val maxId = all.agg(max(col("doc_id"))).head().getLong(0)
    val width = maxId / nBatches + 1
    val root = Files.createTempDirectory("graft-t22-replay")
    val staged = root.resolve("staged")
    val watch = Files.createDirectories(root.resolve("in"))
    val outDir = root.resolve("report")
    all.withColumn("chunk", expr(s"cast(doc_id div ${width}L as int)"))
      .repartition(col("chunk"))
      .write.partitionBy("chunk").mode("overwrite").parquet(staged.toString)
    Seq((maxId * 2 + 7L * 24 * 3600, "", "_flush"))
      .toDF("doc_id", "text", "source").select("doc_id", "source", "text")
      .coalesce(1).write.parquet(staged.resolve(s"chunk=$nBatches").toString)
    val stream = s.readStream.schema(all.schema).parquet(watch.toString)
      .withColumn("evt", expr("timestamp_seconds(1700000000L + doc_id)"))
    val oldParts = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val q = try {
      tokenRows(stream, vocab, "evt", "1 hour")
        .writeStream.format("parquet").option("path", outDir.toString)
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", root.resolve("ckpt").toString)
        .start()
    } finally s.conf.set("spark.sql.shuffle.partitions", oldParts)
    try {
      (0 to nBatches).foreach { i =>
        val chunkDir = staged.resolve(s"chunk=$i")
        if (Files.isDirectory(chunkDir)) {
          StreamingSlidingWindows.moveChunk(chunkDir, watch, i)
          q.processAllAvailable()
        }
      }
    } finally q.stop()
    val report = s.read.parquet(outDir.toString)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_bpe_tokens"),
        max(col("tokens")).as("max_doc_tokens"),
        fixedDec(rhu(sum(col("chars")), sum(col("tokens")), 1000000L), 6)
          .as("chars_per_token"))
      .orderBy("source")
    // materialize before deleting the replay root (staged chunks +
    // checkpoint + report parquet are corpus-sized — a lazy return
    // would leak them under /tmp on every gate/bench run)
    val res = s.createDataFrame(report.collectAsList(), report.schema)
    StreamingSlidingWindows.deleteRec(root)
    res
  }
}
