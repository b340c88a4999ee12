package graft.streaming

import graft.etl.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** StreamingSaProbe: the at-ingest d19 twin must equal batch d19
  * row-for-row on a planted corpus (the python oracle is the
  * cross-engine check at the gates; this is the chunked-replay ==
  * one-shot check on a corpus where spans are KNOWN to exist). */
class StreamingSaProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("chunked at-ingest probe equals the one-shot batch report") {
    import spark.implicits._
    val rep = "the quick brown fox jumps over the lazy dog again and again"
    // doc_ids chosen so the %53==7 batch synthesis hits several docs
    // spread across the replay's doc_id-range chunks
    val rows = (0 until 8).map { i =>
      val id = 7L + 53L * i
      (id, s"doc-$id header $rep trailer words $i with some more text to slice from position two hundred")
    }
    val dir = java.nio.file.Files.createTempDirectory("d19stream").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val batch = graft.SparkEntry.queries("d19_sa_probe_decontamination")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val stream = graft.SparkEntry.queries("d19_probe_stream")(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(stream === batch)
      assert(batch.nonEmpty)
      // non-vacuous: the planted repeat must contaminate every batch doc
      assert(batch.forall(_.apply(3).asInstanceOf[Long] >= 1L),
        s"every synthesized doc should carry >=1 span: $batch")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("over-bound sidecar falls back to the per-batch filtered read, same rows") {
    import spark.implicits._
    val rep = "the quick brown fox jumps over the lazy dog again and again"
    val rows = (0 until 8).map { i =>
      val id = 7L + 53L * i
      (id, s"doc-$id header $rep trailer words $i with some more text to slice from position two hundred")
    }
    val dir = java.nio.file.Files.createTempDirectory("d19fallback").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val cached = graft.SparkEntry.queries("d19_probe_stream")(spark, dir)
        .collect().map(_.toSeq).toSeq
      // bound = 0 forces the corpus-scale path: no cached sidecar
      // override, every micro-batch takes the scan-side-filtered read
      spark.conf.set("spark.graft.saStreamSidecarCacheMaxRows", "0")
      val fallback =
        try graft.SparkEntry.queries("d19_probe_stream")(spark, dir)
          .collect().map(_.toSeq).toSeq
        finally spark.conf.unset("spark.graft.saStreamSidecarCacheMaxRows")
      assert(fallback === cached)
      assert(fallback.nonEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
