package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persisted quality-classifier model — t24's tree in the
  * train-once / serve-many operating mode (the s06/t19/d13 pattern,
  * applied to the trainable filter stage): a training job writes the
  * model artifact (split table + leaf stats) to a keyed parquet dir;
  * scoring jobs LOAD it and route docs without retraining — the model
  * registry deployment every production classifier stage uses
  * (fastText ships a .bin; this ships two tiny parquet tables).
  *
  * The artifact is driver-bounded by construction (≤ 2^depth−1 splits,
  * ≤ 2^depth leaves), so load = one tiny read + a broadcast; apply =
  * the stateless feature kernel + CASE-chain routing, embarrassingly
  * parallel. Training is deterministic (t24's contract), so the
  * persisted model's apply-report over the training corpus equals a
  * fresh train — which is how the oracle states the check.
  */
object TreeModel {

  /** Deterministic per-corpus model location ([[ArtifactDir]]).
    * The prefix carries a training-contract version ("treeq" = the
    * quantile-bucket histogram): ArtifactDir keys on CORPUS identity
    * only, so a contract change must re-key or a stale pre-change
    * model would keep serving against the new oracle. */
  def modelDirFor(sfDir: String): String =
    ArtifactDir.dirFor(sfDir, "documents.parquet", "treeq")

  def ensureBuilt(s: SparkSession, sfDir: String): String = {
    val dir = modelDirFor(sfDir)
    val done = new java.io.File(dir, "splits/_SUCCESS").exists &&
      new java.io.File(dir, "leaves/_SUCCESS").exists
    if (!done) build(s, sfDir, dir)
    dir
  }

  /** Train on the corpus and persist splits + leaf stats. */
  def build(s: SparkSession, sfDir: String, dir: String): Unit = {
    import graft.queries.TextAnalysis
    import s.implicits._
    val feats = TextAnalysis.t24Feats(s, sfDir).cache()
    val levels = TextAnalysis.t24TrainLevels(feats, TextAnalysis.T24Depth)
    levels.zipWithIndex.flatMap { case (sps, l) =>
      sps.map(sp => (l + 1, sp.node, sp.f, sp.thr))
    }.toDF("level", "node", "f", "thr")
      .write.mode("overwrite").parquet(s"$dir/splits")
    TextAnalysis.t24Assign(feats, levels)
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_docs"), sum(col("y")).as("n_pos"))
      .withColumn("pred",
        when(lit(2L) * col("n_pos") > col("n_docs"), 1L).otherwise(0L))
      .write.mode("overwrite").parquet(s"$dir/leaves")
  }

  /** The persisted split chain, reassembled per level. */
  def levels(s: SparkSession, dir: String): Seq[Seq[graft.queries.TextAnalysis.T24Split]] = {
    val rows = s.read.parquet(s"$dir/splits")
      .collect()
      .map(r => (r.getInt(0), graft.queries.TextAnalysis.T24Split(
        r.getLong(1), r.getInt(2), r.getLong(3))))
    (1 to graft.queries.TextAnalysis.T24Depth).map(l =>
      rows.filter(_._1 == l).map(_._2).sortBy(_.node).toSeq)
  }

  /** The persisted (node, pred) leaf predictions. */
  def leafPreds(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/leaves").select(col("node").as("m_node"),
      col("pred").cast(LongType).as("m_pred"))
}
