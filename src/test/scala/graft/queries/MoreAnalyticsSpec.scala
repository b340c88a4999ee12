package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the round-8/9 additions: d09's gram
  * ownership (including the within-doc duplicate case), a07's k-th
  * smallest semantics across coarse-bin boundaries and ties, w06's
  * cohort/offset accounting, w08's hop-window membership and
  * boundaries, g04's session-overlap edges + triangle census.
  */
class MoreAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("d09: owner occurrence keeps its tokens; every other occurrence's cover is removed") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_d09").toString
    Seq(
      // docs 0/1 share both 5-grams; doc 0 owns them (min doc_id)
      (0L, "a b c d e f", "en", "s0", 11L),
      (1L, "a b c d e f", "en", "s1", 11L),
      // doc 2 repeats one gram WITHIN itself: "z z z z z" occurs at
      // p=1 (owner) and p=2 → positions 2..6 removed
      (2L, "z z z z z z", "en", "s0", 11L),
      // doc 3: under 5 tokens — no grams, still counted in the summary
      (3L, "p q r s", "en", "s1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("d09_span_removal")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.toSeq == Seq(
      // s0: docs 0,2 — doc 0 owns its grams (0 removed), doc 2 loses 2..6
      ("s0", 2L, 12L, 5L, 1L, 5L),
      // s1: docs 1,3 — doc 1 loses all 6 (covered by both non-owner
      // occurrences), doc 3 has no grams
      ("s1", 2L, 10L, 6L, 1L, 6L)))
  }

  test("d10: cleaned text keeps owner tokens in order; fully-covered docs come back empty") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_d10").toString
    Seq(
      (0L, "a b c d e f", "en", "s0", 11L),
      (1L, "a b c d e f", "en", "s1", 11L),
      (2L, "z z z z z z", "en", "s0", 11L),
      (3L, "p q r s", "en", "s1", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("d10_span_removal_text")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq == Seq(
      (0L, "s0", 6L, "a b c d e f"), // owner doc untouched
      (1L, "s1", 0L, ""),            // every position covered
      (2L, "s0", 1L, "z"),           // within-doc dup: only p=1 kept
      (3L, "s1", 4L, "p q r s")))    // too short for grams: untouched
  }

  test("a07: k-th smallest = ceil(p*n/100), exact across bins and ties") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_a07").toString
    // A: 4 values in one coarse bin; B: spans three 100-wide bins;
    // C: duplicate values (the histogram's c>1 path)
    (Seq.empty[(String, Double)]
      ++ Seq("A" -> 10.0, "A" -> 20.0, "A" -> 30.0, "A" -> 40.0)
      ++ Seq("B" -> 50.0, "B" -> 150.0, "B" -> 250.0)
      ++ Seq("C" -> 5.0, "C" -> 5.0, "C" -> 7.0))
      .toDF("l_returnflag", "l_extendedprice")
      .write.parquet(s"$d/lineitem.parquet")
    val rows = graft.SparkEntry.queries("a07_exact_quantiles")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // n=4: k(1,25,50,75,95,99) = 1,1,2,3,4,4 ; n=3: k = 1,1,2,3,3,3
    assert(rows.toSeq == Seq(
      ("A", 1L, 10.0), ("A", 25L, 10.0), ("A", 50L, 20.0),
      ("A", 75L, 30.0), ("A", 95L, 40.0), ("A", 99L, 40.0),
      ("B", 1L, 50.0), ("B", 25L, 50.0), ("B", 50L, 150.0),
      ("B", 75L, 250.0), ("B", 95L, 250.0), ("B", 99L, 250.0),
      ("C", 1L, 5.0), ("C", 25L, 5.0), ("C", 50L, 5.0),
      ("C", 75L, 7.0), ("C", 95L, 7.0), ("C", 99L, 7.0)))
  }

  test("g03: repeat-trade threshold sparsifies; components summarize per type") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_g03").toString
    // custs 1,2 both trade supp 1 twice → one component {2,3,4};
    // cust 1 × supp 2 is a one-off order → NOT an edge;
    // cust 3 × supp 5 twice → component {6,11};
    // cust 4 × supp 6 once → excluded entirely (no singleton rows)
    Seq((101L, 1L), (102L, 1L), (103L, 2L), (104L, 2L), (105L, 3L),
      (106L, 3L), (107L, 4L))
      .toDF("o_orderkey", "o_custkey").write.parquet(s"$d/orders.parquet")
    Seq((101L, 1L), (102L, 1L), (101L, 2L), (103L, 1L), (104L, 1L),
      (105L, 5L), (106L, 5L), (107L, 6L))
      .toDF("l_orderkey", "l_suppkey").write.parquet(s"$d/lineitem.parquet")
    val rows = graft.SparkEntry.queries("g03_connected_components")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq((2L, 3L, 2L, 1L), (6L, 2L, 1L, 1L)))
  }

  test("w06: cohort = first active day; offsets count distinct returning users") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_w06").toString
    def ts(day: Long, sec: Long) = new java.sql.Timestamp((day * 86400L + sec) * 1000L)
    Seq(
      // user 1: cohort day 0; active 0 (twice — still one row), 1, 7
      (1L, ts(0, 10)), (1L, ts(0, 20)), (1L, ts(1, 5)), (1L, ts(7, 0)),
      // user 2: cohort day 0; day-2 activity is not a tracked offset
      (2L, ts(0, 30)), (2L, ts(2, 0)),
      // user 3: cohort day 1; offsets 0, 1, 14
      (3L, ts(1, 0)), (3L, ts(2, 0)), (3L, ts(15, 0)))
      .toDF("user_id", "ts")
      .write.parquet(s"$d/events.parquet")
    val rows = graft.SparkEntry.queries("w06_retention_cohorts")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 7L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L), (1L, 14L, 1L)))
  }

  test("w13: time-to-convert quantiles — purchase must follow first view; minutes, type-1 kth") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_w13").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    Seq(
      // user 1: purchase at 400 precedes the first view (1000) and
      // must NOT qualify; the 1600 purchase does — delta 600 s = 10 min
      (1L, "purchase", ts(400)), (1L, "view", ts(1000)), (1L, "purchase", ts(1600)),
      (2L, "view", ts(2000)), (2L, "purchase", ts(5600)),   // 60 min
      (3L, "view", ts(500)), (3L, "purchase", ts(590)),     // 1 min (90 s)
      // cohort day 1
      (4L, "view", ts(86500)), (4L, "purchase", ts(86620)), // 2 min
      (5L, "view", ts(100)),                                // never converts
      (6L, "purchase", ts(100)))                            // no view
      .toDF("user_id", "event_type", "ts")
      .write.parquet(s"$d/events.parquet")
    val rows = graft.SparkEntry.queries("w13_time_to_convert")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // cohort 0 deltas sorted [1, 10, 60]: n=3, k50=2→10, k90=k99=3→60
    assert(rows.toSeq == Seq((0L, 3L, 10L, 60L, 60L), (1L, 1L, 2L, 2L, 2L)), s"got ${rows.toSeq}")
  }

  test("w08: each event lands in exactly the 4 hop windows covering it") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_w08").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    Seq(
      (1L, "a", 1.25, ts(0)),    // windows -2700..0
      (1L, "a", 2.50, ts(900)),  // windows -1800..900
      (2L, "a", 0.25, ts(3599)), // windows 900..3599->2700; base 2700: windows 0..2700
      (2L, "a", 4.00, ts(3600))) // windows 900..3600 — NOT window 0
      .toDF("user_id", "event_type", "value", "ts")
      .write.parquet(s"$d/events.parquet")
    val rows = graft.SparkEntry.queries("w08_sliding_windows")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    // window 0 = [0, 3600): events at 0, 900, 3599; 3600 excluded
    assert(rows(0L) == ((3L, 2L, 4.00)))
    // window 900 = [900, 4500): events at 900, 3599, 3600
    assert(rows(900L) == ((3L, 2L, 6.75)))
    // window 3600 = [3600, 7200): only the 3600 event
    assert(rows(3600L) == ((1L, 1L, 4.00)))
    // window -2700 covers only the sec-0 event
    assert(rows(-2700L) == ((1L, 1L, 1.25)))
    // every event appears in exactly 4 windows
    assert(rows.values.map(_._1).sum == 16L)
  }

  test("g04: co-active sessions form edges; triangle census is exact") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_g04").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // sessions: u1 [0,1000], u2 [100,600], u3 [500,800], u4 [950,960]
    // overlaps: 1-2, 1-3, 1-4, 2-3 -> one triangle {1,2,3};
    // deg = (3,2,2,1) -> wedges 3+1+1 = 5; transitivity 3e6*1//5
    Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(1000)),
      (3L, 2L, ts(100)), (4L, 2L, ts(600)),
      (5L, 3L, ts(500)), (6L, 3L, ts(800)),
      (7L, 4L, ts(950)), (8L, 4L, ts(960)))
      .toDF("event_id", "user_id", "ts")
      .write.parquet(s"$d/events.parquet")
    val r = graft.SparkEntry.queries("g04_triangle_census")(spark, d)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 4L, 5L, 1L, 600000L)))
  }

  test("w07: funnel stages require strictly increasing event times") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_w07").toString
    def ts(day: Long, sec: Long) = new java.sql.Timestamp((day * 86400L + sec) * 1000L)
    Seq(
      // user 1: full ordered funnel
      (1L, "view", ts(0, 10)), (1L, "click", ts(0, 20)), (1L, "purchase", ts(0, 30)),
      // user 2: click BEFORE the first view doesn't count; the
      // purchase can't count without a qualifying click
      (2L, "click", ts(0, 8)), (2L, "view", ts(0, 10)), (2L, "purchase", ts(0, 50)),
      // user 3: no view at all; separate cohort day
      (3L, "signup", ts(1, 0)),
      // user 4: click at the SAME instant as the view — strict > fails
      (4L, "view", ts(0, 10)), (4L, "click", ts(0, 10)), (4L, "purchase", ts(0, 30)))
      .toDF("user_id", "event_type", "ts")
      .write.parquet(s"$d/events.parquet")
    val rows = graft.SparkEntry.queries("w07_conversion_funnel")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq((0L, 3L, 3L, 1L, 1L), (1L, 1L, 0L, 0L, 0L)))
  }
}
