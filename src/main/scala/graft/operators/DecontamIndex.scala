package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted decontamination index — the 100 TB operating mode of the
  * t16 benchmark-overlap check (the IvfIndex pattern applied to
  * decontamination): benchmark/eval sets are ~static while the train
  * corpus streams through, so the eval side is built ONCE — distinct
  * eval 3-grams as parquet + their bloom sketch as one small binary —
  * and every corpus batch pays only the probe-and-verify pass. The
  * report is bit-identical to t16's inline form (same gram kernel,
  * same sketch contract via [[BloomSketch]], same exact semi-join
  * verify killing bloom false positives), which is why t16's CTE
  * oracle checks the persisted pipeline too — the s06/s03 evidence
  * pattern.
  *
  * Layout: `dir/evalgrams/…parquet` (gram) + `dir/sketch.bin` (the
  * BloomSketch bytes, driver-held at probe time — bounded by the 8 MB
  * runtime-filter cap, never the grams).
  */
object DecontamIndex {

  /** Deterministic per-corpus index location ([[ArtifactDir]]): gate
    * and bench runs reuse the build, a data change forces a rebuild
    * in a new dir. */
  def indexDirFor(sfDir: String): String =
    ArtifactDir.dirFor(sfDir, "documents.parquet", "decon")

  /** Build at [[indexDirFor]] unless already complete there. */
  def ensureBuilt(s: SparkSession, sfDir: String): String = {
    val dir = indexDirFor(sfDir)
    val done = new java.io.File(dir, "evalgrams/_SUCCESS").exists &&
      new java.io.File(dir, "sketch.bin").exists
    if (!done) build(s, sfDir, dir)
    dir
  }

  /** Distinct eval grams → parquet; their sketch → one small file.
    * Build cost is one pass over the EVAL split only (the corpus is
    * never read) — the amortization point of the whole design. */
  def build(s: SparkSession, sfDir: String, indexDir: String): Unit =
    buildFrom(s, Tables.load(s, sfDir, "documents")
      .filter(col("doc_id") % 37 === 0), indexDir)

  /** Build from an explicit eval-doc set (doc_id, source, text …). */
  def buildFrom(s: SparkSession, evalDocs: DataFrame, indexDir: String): Unit = {
    graft.queries.CorpusOps.trigrams3(evalDocs)
      .select(col("gram")).distinct()
      .write.mode("overwrite").parquet(s"$indexDir/evalgrams")
    refreshSketch(s, indexDir)
  }

  /** Incremental benchmark onboarding: a NEW eval set's grams are
    * anti-joined against the persisted ones (the gram store stays
    * duplicate-free) and APPENDED; the sketch is rebuilt from the
    * persisted union. Cost is one bounded pass over the EVAL side —
    * the corpus is never read, and existing gram files are never
    * rewritten. An appended index is content-equivalent to a fresh
    * build over the union of eval sets (DecontamIndexSpec proves the
    * reports equal row-for-row). */
  def append(s: SparkSession, newEvalDocs: DataFrame, indexDir: String): Unit = {
    val existing = s.read.parquet(s"$indexDir/evalgrams")
    graft.queries.CorpusOps.trigrams3(newEvalDocs)
      .select(col("gram")).distinct()
      .join(existing, Seq("gram"), "left_anti")
      .write.mode("append").parquet(s"$indexDir/evalgrams")
    refreshSketch(s, indexDir)
  }

  /** Sketch from the WRITTEN grams (one bounded read-back), so probe
    * and verify provably derive from the same persisted artifact. */
  private def refreshSketch(s: SparkSession, indexDir: String): Unit = {
    val sketch = BloomSketch.build(s.read.parquet(s"$indexDir/evalgrams"), "gram")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(indexDir, "sketch.bin"), sketch)
  }

  /** The t16 overlap report for the TRAIN split of `sfDir`, served
    * from the persisted eval side: the sketch file loads driver-side
    * (bounded), the gram parquet feeds the exact verify join, and the
    * corpus pays one probe-filtered pass. */
  def search(s: SparkSession, sfDir: String, indexDir: String): DataFrame =
    searchFrom(s, Tables.load(s, sfDir, "documents")
      .filter(col("doc_id") % 37 =!= 0), indexDir)

  /** Same report over an explicit train-doc set. */
  def searchFrom(s: SparkSession, train: DataFrame, indexDir: String): DataFrame = {
    val sketch = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(indexDir, "sketch.bin"))
    val evalGrams = s.read.parquet(s"$indexDir/evalgrams")
    graft.queries.CorpusOps.overlapReportFrom(train, evalGrams, sketch)
  }
}
