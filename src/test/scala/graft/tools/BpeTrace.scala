package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: run the incremental BPE trainer with per-round tracing
  * (affected words + wall seconds) — the BENCH_NOTES cost-table
  * source. `SPARK_GRAFT_BPE_TRACE=1 Test/runMain graft.tools.BpeTrace
  * [sfDir] [rounds] [word|bigram]`.
  *
  * `bigram` mode trains on the compound-bigram vocabulary (adjacent
  * word pairs joined with '_', derived deterministically from the
  * same documents table): the sf corpora's ~30-word vocabulary
  * exhausts after a few hundred merges, so a credible-R run (1024+)
  * needs the wider vocab — ~900 compound words, ~8k initial symbols.
  * The corpus pass (initial vocabulary aggregate) is unchanged in
  * shape: one explode + groupBy over every word instance. */
object BpeTrace {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val rounds = if (args.length > 1) args(1).toInt else 64
    val mode = if (args.length > 2) args(2) else "word"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val (_, learned) =
      if (mode == "bigram")
        graft.queries.BpeTrain.trainFrom(bigramVocab(spark, sfDir), rounds)
      else graft.queries.BpeTrain.train(spark, sfDir, rounds)
    println(f"[bpe-trace] TOTAL rounds=${learned.size} mode=$mode " +
      f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
  }

  /** Compound-bigram (word, freq, syms) vocabulary of the documents
    * table — deterministic, one corpus pass, ~|word-vocab|² rows. */
  def bigramVocab(spark: SparkSession, sfDir: String) =
    graft.Tables.load(spark, sfDir, "documents")
      .select(explode(expr(
        "transform(sequence(1, size(split(text, ' ')) - 1), " +
          "i -> concat(split(text, ' ')[i-1], '_', split(text, ' ')[i]))"))
        .as("word"))
      .filter(!col("word").startsWith("_") && !col("word").endsWith("_"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("word"), col("freq"),
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
          .as("syms"))
}
