package graft.operators

/** Single owner of the keyed-artifact-dir rule shared by every
  * persisted operator artifact (IVF postings, decontamination index,
  * BPE tokenizer, dedup band postings, tree model): one fixed dir
  * under the JVM temp root, keyed by the corpus identity — the
  * canonical sfDir path plus the key table file's mtime and length.
  * Repeated bench/gate runs in a session — or across sessions on
  * unchanged data — reuse the same dir instead of accumulating fresh
  * temp copies; a data change (regenerated parquet, different SF)
  * changes the key and forces a rebuild in a new dir.
  *
  * The key hash is FNV-1a-style over the key string — stable across
  * JVMs (no String.hashCode dependence), collision-irrelevant at the
  * handful-of-corpora scale the temp root ever holds.
  */
object ArtifactDir {

  /** `graft_<prefix>_<hash>` under java.io.tmpdir, keyed by
    * `sfDir/keyFile`'s identity. */
  def dirFor(sfDir: String, keyFile: String, prefix: String): String = {
    val f = new java.io.File(sfDir, keyFile)
    val key = s"${new java.io.File(sfDir).getCanonicalPath}|${f.lastModified}|${f.length}"
    val h = java.lang.Long.toHexString(
      key.getBytes("UTF-8").foldLeft(1469598103934665603L)((a, b) => a * 1000003L + (b & 0xFF)))
    new java.io.File(System.getProperty("java.io.tmpdir"), s"graft_${prefix}_$h").getAbsolutePath
  }
}
