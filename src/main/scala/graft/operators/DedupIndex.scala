package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH near-dup index + incremental batch probe —
  * the dedup family's PERSISTED-INDEX operating mode, completing the
  * (batch, streaming, persisted-index) × (dedup, decontamination,
  * ANN) matrix: d02/d07/d08 are the batch forms, StreamingNearDup the
  * at-ingest form, and this is the t19/s06 pattern applied to
  * near-dup detection — build the corpus's band postings ONCE, then
  * dedupe every NEW crawl batch against the full corpus WITHOUT
  * rescanning it (the operation a 100 TB corpus actually needs: the
  * corpus only ever grows, and re-running d02 over corpus ∪ batch
  * re-pays the corpus-sized work per batch).
  *
  * Layout: `dir/postings/band=B/…parquet`, rows (band_hash, doc_id),
  * one sorted file per band. Probe: the batch's band signatures
  * equi-join the postings on (band, band_hash) — bucket-local exactly
  * like d03's banding, NEVER all-pairs — then d02's exact
  * shingle-Jaccard ≥ 0.9 verify runs on candidate pairs only, and
  * only the candidates' documents are fetched (a doc_id-keyed join —
  * a pruned point read at scale). Postings are 16 fixed-width rows
  * per corpus doc; at cluster scale they would be written BUCKETED by
  * band_hash so a batch probe shuffles only the batch side.
  * [[append]] folds an accepted batch's postings into the index (the
  * IvfIndex incremental contract): probing after append equals
  * probing a fresh build over the union (DedupIndexSpec).
  *
  * Reference scope: NTRIPmonitor has no corpus operators — extension
  * family (SURVEY §2.5), like d01–d12/c10.
  */
object DedupIndex {

  /** Word 3-shingles, distinct, from a pre-materialized word array —
    * THE shingle definition (single owner; queries.Dedup's batch
    * pipeline states the same contract through this expression).
    * The index list is TOTAL (empty for <3 words): sequence(0,
    * size-3) DESCENDS for short docs and ws[i+2] throws under ANSI —
    * an upstream size filter does not reliably guard the projection
    * once the optimizer collapses it. */
  val ShinglesExpr: String =
    "array_distinct(transform(slice(sequence(0, size(ws)), 1, greatest(size(ws) - 2, 0)), " +
      "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))"

  /** (doc_id, band, band_hash) LSH band signatures of (doc_id, sh)
    * rows — 64 minhash perms, 16 bands × 4 rows (the d02 parameters:
    * P[miss | J ≥ 0.9] = (1−0.9⁴)¹⁶ ≈ 4e-8). Single owner of the
    * banding rule, shared by the batch pair pipeline and this index. */
  def bandsOf(sh: DataFrame): DataFrame =
    sh.withColumn("sig", graft.functions.GraftFunctions.minhash64(col("sh")))
      .select(col("doc_id"),
        posexplode(expr(
          "transform(sequence(0, 15), b -> xxhash64(b, sig[4*b], sig[4*b+1], sig[4*b+2], sig[4*b+3]))"))
          .as(Seq("band", "band_hash")))

  /** Deterministic per-corpus index location ([[ArtifactDir]]). */
  def indexDirFor(sfDir: String): String =
    ArtifactDir.dirFor(sfDir, "documents.parquet", "dedupidx")

  /** Build postings over the gate's EXISTING-corpus split (documents
    * with doc_id % 7 ≠ 3 — the rest play the incoming batch) at
    * [[indexDirFor]] unless already complete there. */
  def ensureBuilt(s: SparkSession, sfDir: String): String = {
    val dir = indexDirFor(sfDir)
    if (!new java.io.File(dir, "postings/_SUCCESS").exists) {
      val corpus = graft.Tables.load(s, sfDir, "documents")
        .filter(pmod(col("doc_id"), lit(7L)) =!= 3)
      build(shingle(corpus), dir)
    }
    dir
  }

  /** (doc_id, sh) shingle rows of a documents frame (docs with ≥3
    * words; shorter docs have no shingles and can never near-dup). */
  def shingle(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), expr(ShinglesExpr).as("sh"))

  /** Write band postings for `sh` — one exchange clusters by band, so
    * each band lands as one sorted file (the IvfIndex layout lesson:
    * tasks × bands tiny files otherwise). */
  def build(sh: DataFrame, dir: String): Unit =
    bandsOf(sh)
      .repartition(col("band"))
      .sortWithinPartitions(col("band"), col("band_hash"))
      .write.mode("overwrite").partitionBy("band").parquet(s"$dir/postings")

  /** Incremental maintenance: fold an ACCEPTED batch's postings into
    * the index — O(batch) work, the corpus is never re-signed. */
  def append(sh: DataFrame, dir: String): Unit =
    bandsOf(sh)
      .repartition(col("band"))
      .sortWithinPartitions(col("band"), col("band_hash"))
      .write.mode("append").partitionBy("band").parquet(s"$dir/postings")

  def postings(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/postings")

  /** Distinct (new_id, idx_id) candidate pairs of a batch's shingle
    * rows against the index: ONE (band, band_hash) equi-join. */
  def candidates(s: SparkSession, dir: String, shNew: DataFrame): DataFrame =
    bandsOf(shNew).select(col("doc_id").as("new_id"), col("band"), col("band_hash"))
      .join(postings(s, dir).select(col("band"), col("band_hash"),
        col("doc_id").as("idx_id")), Seq("band", "band_hash"))
      .select(col("new_id"), col("idx_id"))
      .distinct()
}
