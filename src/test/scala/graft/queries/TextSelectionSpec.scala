package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the data-selection additions: t18's
  * importance-ratio arithmetic (target-word affinity, inner-join drop
  * of target-free docs) and c06's value-tercile assignment over the
  * (lang, score) histogram including a tie at the lowest score.
  */
class TextSelectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("t18: affinity = sum tf*tgt_df*n_raw / (dl*raw_df*n_tgt); target-free docs drop") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_t18").toString
    Seq(
      // doc 0 is the eval/target split (0 % 37 == 0)
      (0L, "alpha beta", "en", "s0", 10L),
      (1L, "alpha alpha", "en", "s0", 11L),
      (2L, "gamma gamma", "en", "s0", 11L),
      (3L, "alpha gamma", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("t18_importance_weights")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // n_tgt = 1 (doc 0), n_raw = 3 (docs 1..3)
    // tgt_df: alpha 1, beta 1; raw_df: alpha 2 (docs 1,3), gamma 2 (2,3)
    // doc 1: alpha tf=2, dl=2 -> (2*1*3)/(2*2*1) = 1.5
    // doc 3: alpha tf=1, dl=2 -> (1*1*3)/(2*2*1) = 0.75
    // doc 2: no target words -> dropped by the inner join
    assert(rows.toSeq == Seq((1L, 1L, 1.5), (3L, 1L, 0.75)))
  }

  test("c06: value terciles over the score histogram; ties share a bucket") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_c06").toString
    Seq(
      // qs = floor(stop*1000/toks); stop = occurrences of " the "
      (1L, "a b c d", "en", "s0", 7L),          // qs 0
      (2L, "x y z w", "en", "s0", 7L),          // qs 0 (tie with doc 1)
      (3L, "a the b c d", "en", "s0", 11L),     // toks 5, stop 1 -> 200
      (4L, "a the b c", "en", "s0", 9L),        // toks 4, stop 1 -> 250
      (5L, "a the b", "en", "s0", 7L),          // toks 3, stop 1 -> 333
      (6L, "a the b the c", "en", "s0", 13L))   // toks 5, stop 2 -> 400
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("c06_quality_buckets")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // n = 6; exclusive cumsum per value: 0->0, 200->2, 250->3,
    // 333->4, 400->5; bucket = floor(3*cumx/6), the two qs=0 docs
    // land together in bucket 0
    assert(rows.toSeq == Seq(
      ("en", 0L, 2L, 8L, 0L, 0L),
      ("en", 1L, 2L, 9L, 200L, 250L),
      ("en", 2L, 2L, 8L, 333L, 400L)))
  }
}
