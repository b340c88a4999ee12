package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the round-10 additions: a08's
  * grouping-set membership + grouping_id bit order, w09's first/last
  * touch frames (self-attribution exclusion, 'direct', same-ts
  * event_id tie-break), t14's rank tie-break + doubling buckets, and
  * t15's gram ownership/novelty accounting.
  */
class AnalyticsExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a08: grouping sets emit exactly ((f,s),(f),()) with MSB-first grouping_id") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_a08").toString
    Seq(("A", "F", 1.0), ("A", "O", 2.0), ("B", "F", 3.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    val rows = graft.SparkEntry.queries("a08_grouping_sets")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(rows.toSeq == Seq(
      ("A", "F", 0L, 1L, 1.0), ("A", "O", 0L, 1L, 2.0), ("B", "F", 0L, 1L, 3.0),
      ("A", null, 1L, 2L, 3.0), ("B", null, 1L, 1L, 3.0),
      (null, null, 3L, 3L, 6.0)))
  }

  test("w09: purchases attribute to first-ever and latest preceding non-purchase touch") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_w09").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(
      // user 1: two purchases after a view→click history — both
      // last-touch to the click, never to the earlier purchase
      (1L, ts("2024-01-01 00:00:01"), 1L, "view", 0.0),
      (2L, ts("2024-01-01 00:00:02"), 1L, "click", 0.0),
      (3L, ts("2024-01-01 00:00:03"), 1L, "purchase", 10.0),
      (4L, ts("2024-01-01 00:00:04"), 1L, "purchase", 5.0),
      // user 2: purchase opens the history → first=purchase, 'direct'
      (5L, ts("2024-01-01 00:00:01"), 2L, "purchase", 7.0),
      // user 3: same-ts signup/purchase — event_id breaks the tie, so
      // the signup precedes and takes both touches
      (6L, ts("2024-01-01 00:00:01"), 3L, "signup", 0.0),
      (7L, ts("2024-01-01 00:00:01"), 3L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val rows = graft.SparkEntry.queries("w09_attribution")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSeq == Seq(
      ("purchase", "direct", 1L, 7.0),
      ("signup", "signup", 1L, 1.0),
      ("view", "click", 2L, 15.0)))
  }

  test("t14: rank = freq desc then word asc; doubling buckets; exact ppm share") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_t14").toString
    Seq(
      (0L, "a a a a a", "en", "s0", 9L),
      (1L, "b b b c c c", "en", "s0", 11L),
      (2L, "d", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("t14_zipf_rank_profile")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // vocab: a=5 (rank 1 → bucket 0), b=3/c=3 (ranks 2,3 → bucket 1,
    // word-asc tie-break), d=1 (rank 4 → bucket 2); tot=12
    assert(rows.toSeq == Seq(
      ("en", 0L, 1L, 5L, 5L, 416667L),
      ("en", 1L, 2L, 6L, 3L, 500000L),
      ("en", 2L, 1L, 1L, 1L, 83333L)))
  }

  test("t15: a trigram occurrence is novel iff its gram's min doc_id is this doc") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_t15").toString
    Seq(
      // doc 0 owns all grams of the shared text, incl. its own repeat
      (0L, "x y z x y z", "en", "s0", 11L),
      (1L, "x y z x y z", "en", "s1", 11L), // 4 occurrences, 0 novel
      (2L, "p q", "en", "s0", 3L),          // <3 words: no grams
      (3L, "q r s", "en", "s1", 5L))        // 1 novel gram
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("t15_ngram_novelty")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("s0", 1L, 4L, 4L, 1000000L),
      ("s1", 2L, 5L, 1L, 200000L)))
  }
}
