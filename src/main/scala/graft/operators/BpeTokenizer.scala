package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted BPE tokenizer — the operating mode of t22 (the
  * DecontamIndex/IvfIndex pattern applied to tokenization): a
  * tokenizer is trained ONCE (t21's bounded-rounds merge induction)
  * and then applied to every corpus batch forever — the artifact
  * ships with the model, the training corpus pass is never repeated.
  * Persisted layout: `dir/vocab/…parquet` (word → n_tok, the
  * vocabulary with per-word token counts after all merges) +
  * `dir/merges/…parquet` (the learned rule list, the exportable
  * tokenizer definition). The apply pass joins the corpus tf-pairs
  * against the persisted vocab — bit-identical to training inline and
  * applying (BpeTrainSpec proves it), which is why t22's SQL oracle
  * (which recomputes the whole chain) checks the persisted pipeline
  * too — the s06/s03/t19 evidence pattern.
  */
object BpeTokenizer {

  /** Deterministic per-corpus tokenizer location ([[ArtifactDir]]):
    * repeated gate/bench runs reuse the build, a data change forces a
    * rebuild in a new dir. */
  def tokenizerDirFor(sfDir: String): String =
    ArtifactDir.dirFor(sfDir, "documents.parquet", "bpe")

  /** Build at [[tokenizerDirFor]] unless already complete there. */
  def ensureBuilt(s: SparkSession, sfDir: String): String = {
    val dir = tokenizerDirFor(sfDir)
    val done = new java.io.File(dir, "vocab/_SUCCESS").exists &&
      new java.io.File(dir, "merges/_SUCCESS").exists
    if (!done) build(s, sfDir, dir)
    dir
  }

  /** Train the R-round BPE and persist vocabulary + rule list. */
  def build(s: SparkSession, sfDir: String, dir: String): Unit = {
    import s.implicits._
    val (vocab, rules) = graft.queries.BpeTrain.train(s, sfDir)
    vocab.select(col("word"), size(col("syms")).cast(LongType).as("n_tok"))
      .write.mode("overwrite").parquet(s"$dir/vocab")
    rules.toDF("round", "l", "r", "pair_n")
      .write.mode("overwrite").parquet(s"$dir/merges")
  }

  /** The persisted (word → n_tok) vocabulary. */
  def vocab(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/vocab")
}
