package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** c11's funnel semantics, one planted casualty per stage: a
  * gate-fail doc dies at 1_gated, an exact duplicate dies at
  * 2_deduped, a doc sharing all its 5-grams with the eval split dies
  * at 3_decontaminated, and the single-lang quota (200 ≥ survivors)
  * passes the rest into the mixture, which the Knuth-hash rule then
  * splits 1/1/1 across train/val/test (doc ids 1, 6, 9 — buckets
  * 1, 8, 9 by construction).
  */
class PipelineE2eSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def longDoc(prefix: String): String =
    "the of " + (1 to 60).map(i => s"$prefix$i").mkString(" ")

  private val texts: Map[Long, String] = Map(
    1L -> longDoc("word"),   // survives everything → 5_train (bucket 1)
    2L -> longDoc("word"),   // exact dup of 1 → dies at 2_deduped
    3L -> "tiny doc",        // <50 words, <2 stopwords → dies at 1_gated
    5L -> longDoc("mix"),    // identical to eval doc 37 → dies at decon
    6L -> longDoc("alt"),    // survives → 5_val (bucket 8)
    9L -> longDoc("casa"),   // survives → 5_test (bucket 9)
    37L -> longDoc("mix"))   // the eval split (37 % 37 == 0)

  private def writeDocs(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_e2e").toString
    texts.toSeq.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("every stage drops exactly its planted casualty; split is the Knuth rule") {
    val dir = writeDocs()
    val out = graft.SparkEntry.queries("c11_pipeline_e2e")(spark, dir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def chars(ids: Long*) = ids.map(texts(_).length.toLong).sum
    assert(out("0_raw") == ((6L, chars(1, 2, 3, 5, 6, 9))), s"got $out")
    assert(out("1_gated") == ((5L, chars(1, 2, 5, 6, 9))), s"got $out")
    assert(out("2_deduped") == ((4L, chars(1, 5, 6, 9))), s"got $out")
    assert(out("3_decontaminated") == ((3L, chars(1, 6, 9))), s"got $out")
    assert(out("4_mixture") == ((3L, chars(1, 6, 9))), s"got $out")
    assert(out("5_train") == ((1L, chars(1))), s"got $out")
    assert(out("5_val") == ((1L, chars(6))), s"got $out")
    assert(out("5_test") == ((1L, chars(9))), s"got $out")
  }
}
