package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed gram inventories for the corpus hygiene operators:
  * t08's eval/train split, hit counting and the ≥10% contamination
  * threshold; t09's document-frequency definition of a duplicated
  * span (distinct-per-doc grams, so in-doc repetition never counts).
  */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    Seq(
      // doc 0: eval split (0 % 37 == 0); 5-grams {a b c d e, b c d e f}
      (0L, "a b c d e f", "en", "s0", 11L),
      // doc 1: train; 3 5-grams, 2 of them in the eval set → 2·10 ≥ 3
      (1L, "a b c d e f g", "en", "s1", 13L),
      // doc 2: train; 3 5-grams, zero eval overlap
      (2L, "x y z w v u t", "en", "s1", 13L),
      // doc 3: 4 words — below t08's 5-gram minimum, still in t09
      (3L, "p q r s", "en", "s1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("t08: eval grams hit-count train docs and flag the ≥10% overlaps") {
    val rows = graft.SparkEntry.queries("t08_decontamination")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // train docs 1 (3 grams, 2 hits, contaminated) and 2 (3 grams, 0
    // hits); doc 0 is eval-side only, doc 3 too short
    assert(rows.toSeq == Seq(("s1", 2L, 6L, 2L, 1L)))
  }

  test("t09: a span is duplicated only when ≥2 distinct docs carry it") {
    val rows = graft.SparkEntry.queries("t09_dupspan_profile")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // 3-grams: doc0 {abc,bcd,cde,def}, doc1 {abc,bcd,cde,def,efg},
    // doc2 5 unique, doc3 {pqr,qrs}; shared = the 4 doc0∩doc1 grams
    assert(rows.toSeq == Seq(
      ("s0", 1L, 4L, 4L, 1L),
      ("s1", 3L, 12L, 4L, 1L)))
  }

  test("t10: char-LM micro-probs match hand computation") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_lm").toString
    // transitions: doc20 → "aa"; doc21 → "ab"; model: P(a|a)=P(b|a)=1/2
    Seq((20L, "aa", "en", "s0", 2L), (21L, "ab", "en", "s0", 2L),
      (22L, "x", "en", "s0", 1L)) // 1 char → no transitions, drops out
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("t10_char_lm_quality")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(("en", 2L, 2L, 1000000L, 500000L)))
  }

  test("t09: in-doc repetition of a span does not make it 'duplicated'") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_corpus2").toString
    Seq(
      // "m n o" occurs twice INSIDE doc 10 but in no other doc
      (10L, "m n o z m n o", "en", "sA", 13L),
      (11L, "q r s t u", "en", "sA", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("t09_dupspan_profile")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(("sA", 0L, 0L)))
  }

  test("c05: eval split, contaminated and unverifiable docs never reach the fill") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_c05").toString
    val words40 = (1 to 40).map(i => s"a$i").mkString(" ")
    val words70 = (1 to 70).map(i => s"b$i").mkString(" ")
    Seq(
      // doc 0: the eval split itself — excluded from assembly
      (0L, "a b c d e f", "en", "src0", 11L),
      // doc 1: 2 of 3 train grams hit the eval set → contaminated
      (1L, "a b c d e f g", "en", "src1", 13L),
      // docs 2/4: clean survivors in src2 (wgt = 2%4+1 = 3); their
      // 110 surviving tokens → budget 3·(110 div 100) = 3; hash order
      // puts doc 2 first, so exactly it is taken
      (2L, words40, "en", "src2", 200L),
      (4L, words70, "en", "src2", 350L),
      // doc 3: under 5 words — can't be checked, never cleared
      (3L, "p q r s", "en", "src3", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("c05_decontaminated_mixture")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(("src2", 3L, 1L, 40L, 2L)))
  }
}
