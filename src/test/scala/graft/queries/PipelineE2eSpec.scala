package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** c11's funnel semantics, one planted casualty per stage: a
  * gate-fail doc dies at 2_gated, an exact duplicate dies at
  * 3_deduped, a doc sharing all its 5-grams with the eval split dies
  * at 4_decontaminated, and the single-lang quota (200 ≥ survivors)
  * passes the rest into the mixture, which the Knuth-hash rule then
  * splits 1/1/1 across train/val/test (doc ids 1, 6, 9 — buckets
  * 1, 8, 9 by construction). The scrub stage (1_scrubbed) is the
  * value-identity on this PII-free fixture — c12's own spec covers
  * redaction — and the terminal stages run over the 1-doc train
  * split: one 512-budget pack bin, the persisted BPE tokenizer's
  * apply pass, one 100-doc shard.
  */
class PipelineE2eSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def longDoc(prefix: String): String =
    "the of " + (1 to 60).map(i => s"$prefix$i").mkString(" ")

  private val texts: Map[Long, String] = Map(
    1L -> longDoc("word"),   // survives everything → 6_train (bucket 1)
    2L -> longDoc("word"),   // exact dup of 1 → dies at 3_deduped
    3L -> "tiny doc",        // <50 words, <2 stopwords → dies at 2_gated
    5L -> longDoc("mix"),    // identical to eval doc 37 → dies at decon
    6L -> longDoc("alt"),    // survives → 6_val (bucket 8)
    9L -> longDoc("casa"),   // survives → 6_test (bucket 9)
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
    val rows = graft.SparkEntry.queries("c11_pipeline_e2e")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    def chars(ids: Long*) = ids.map(texts(_).length.toLong).sum
    // every fixture doc is "the of " + 60 words = 62 whitespace tokens
    def toks(ids: Long*) = 62L * ids.size
    val out = rows.view.mapValues(v => (v._1, v._2)).toMap
    assert(out("0_raw") == ((6L, chars(1, 2, 3, 5, 6, 9))), s"got $rows")
    assert(rows("0_raw")._3 == toks(1, 2, 5, 6, 9) + 2L, s"got $rows") // doc 3 = 2 tokens
    assert(out("1_scrubbed") == out("0_raw"), s"got $rows") // identity on PII-free text
    assert(out("2_gated") == ((5L, chars(1, 2, 5, 6, 9))), s"got $rows")
    assert(out("3_deduped") == ((4L, chars(1, 5, 6, 9))), s"got $rows")
    assert(out("4_decontaminated") == ((3L, chars(1, 6, 9))), s"got $rows")
    assert(out("5_mixture") == ((3L, chars(1, 6, 9))), s"got $rows")
    assert(rows("6_train") == ((1L, chars(1), 62L)), s"got $rows")
    assert(rows("6_val") == ((1L, chars(6), 62L)), s"got $rows")
    assert(rows("6_test") == ((1L, chars(9), 62L)), s"got $rows")
    // terminal stages over the 1-doc train split
    assert(rows("7_packed") == ((1L, chars(1), 62L)), s"got $rows") // one bin
    val (tu, tc, tt) = rows("8_tokenized")
    assert(tu == 1L, s"got $rows")
    assert(tc == chars(1) - 61L, s"got $rows") // chars minus the 61 separators
    assert(tt >= 62L, s"got $rows") // >= one BPE token per word
    assert(rows("9_sharded") == ((1L, chars(1), 62L)), s"got $rows") // one shard
    assert(rows.size == 12, s"got ${rows.keys.toSeq.sorted}")
  }

  test("c16 substring-dedup funnel: conservation invariants hold stage by stage") {
    import spark.implicits._
    // span borrowed from doc 6's PREFIX: doc 9's continuation after
    // it ("zulu…", 'z' > '8') sorts AFTER doc 6's ("8 alt9…"), so
    // doc 9's copy is the SA-later casualty and the donor keeps its
    // text intact
    val donor = longDoc("alt")
    val span = donor.substring(0, 45) // "the of alt1 … alt7 alt" ≥ 32 chars
    val c16texts: Map[Long, String] = Map(
      1L -> longDoc("word"),              // unique, survives to the split
      2L -> longDoc("word"),              // exact dup of 1 → fully scrubbed → gate-dead
      3L -> "tiny doc",                   // gate casualty (unchanged by d15)
      6L -> donor,                        // span donor, survives
      9L -> (longDoc("casa") + " " + span + "zulu zebra"))
    val dir = java.nio.file.Files.createTempDirectory("graft_c16").toString
    c16texts.toSeq.map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val rows = graft.SparkEntry.queries("c16_pipeline_substr")(spark, dir)
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val d15 = graft.SparkEntry.queries("d15_substring_removal")(spark, dir)
        .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getString(4)))).toMap
      // removal semantics the funnel builds on: the exact dup is
      // FULLY scrubbed (substring removal at threshold 32 subsumes
      // exact dedup of ≥32-char docs), the borrowed span leaves doc 9
      // (≥ the span, at its SA-later occurrence), donors untouched
      assert(d15(2L)._2 == "", s"exact dup must scrub to empty, got ${d15(2L)}")
      assert(d15(1L)._1 == 0L && d15(6L)._1 == 0L, s"keepers must be untouched: $d15")
      assert(d15(9L)._1 >= span.length.toLong, s"doc 9 must lose the borrowed span: $d15")
      assert(d15(3L)._1 == 0L)
      // conservation: raw chars − removed == substr-stage chars; no
      // doc is dropped by removal itself
      val removedSum = d15.values.map(_._1).sum
      assert(rows("1_substr_removed")._1 == rows("0_raw")._1)
      assert(rows("1_substr_removed")._2 == rows("0_raw")._2 - removedSum,
        s"char conservation broke: $rows, removed=$removedSum")
      // gate drops the tiny doc AND the scrubbed-to-empty dup
      assert(rows("2_gated")._1 == 3L, s"got $rows")
      // ≥32-char clean-text coincidences were already scrubbed by the
      // substring stage, so exact dedup is a no-op safety net here
      assert(rows("3_deduped") == rows("2_gated"), s"got $rows")
      // the split partitions the dedup survivors exactly
      val split = rows.filter(_._1.startsWith("4_")).values
      assert(split.map(_._1).sum == rows("3_deduped")._1, s"got $rows")
      assert(split.map(_._2).sum == rows("3_deduped")._2, s"got $rows")
      assert(split.map(_._3).sum == rows("3_deduped")._3, s"got $rows")
      // monotone funnel: units and chars never grow downstream
      val order = Seq("0_raw", "1_substr_removed", "2_gated", "3_deduped")
      order.sliding(2).foreach { case Seq(a, b) =>
        assert(rows(b)._1 <= rows(a)._1 && rows(b)._2 <= rows(a)._2,
          s"$b grew over $a: $rows")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
