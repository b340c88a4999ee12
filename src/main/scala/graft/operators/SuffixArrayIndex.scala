package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Persisted GENERALIZED suffix array — the build-once / derive-many
  * operating mode of the SA family (the s06/t19/d13/t26 pattern): a
  * corpus snapshot's suffix array is a deterministic artifact, and
  * the derived operations — d15 substring removal, d16 exact
  * decontamination, d17's repeat report, c16's funnel stage — are
  * linear passes over it: in a production session the 17-min sf10
  * construction is paid once per snapshot, not once per question
  * (d14 remains the standalone fresh-build form of the report, the
  * cross-check the spec compares the index path against). Layout:
  * `dir/sa` parquet of (doc_id, off, rank, rank32), written DIRECTLY
  * by [[GeneralizedSuffixArray.build]]'s resultDir path (one write,
  * both construction modes; the build itself is oracle-exact at
  * three SFs), `_SUCCESS`-gated like every persisted artifact here.
  * Bench charges the build to its own metric (`d17_sa_index_build`);
  * each derived query line measures the derive-from-index cost a
  * repeated analysis actually pays. */
object SuffixArrayIndex {

  /** Deterministic per-corpus index location ([[ArtifactDir]]). */
  def indexDirFor(sfDir: String): String =
    ArtifactDir.dirFor(sfDir, "documents.parquet", "saidx")

  def ensureBuilt(s: SparkSession, sfDir: String): String = {
    val dir = indexDirFor(sfDir)
    if (!new java.io.File(dir, "sa/_SUCCESS").exists) build(s, sfDir, dir)
    dir
  }

  def build(s: SparkSession, sfDir: String, dir: String): Unit = {
    val docs = graft.Tables.load(s, sfDir, "documents")
      .selectExpr("doc_id", "text")
    // the build lands the array DIRECTLY at dir/sa (one write in both
    // construction modes — the spill-bounded mode would otherwise
    // write its own result copy and rewrite it here, doubling peak
    // disk + I/O for the corpus-sized artifact)
    GeneralizedSuffixArray.build(docs, Some(s"$dir/sa")): Unit
  }

  /** The persisted array: (doc_id, off, rank, rank32). */
  def load(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/sa")
}
