package graft.operators

import graft.etl.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def pairs(ivs: Seq[(Long, Long, Long)], pts: Seq[(Long, Long)],
                    w: Long): Set[(Long, Long)] = {
    import spark.implicits._
    val intervals = ivs.toDF("iid", "lo", "hi")
    val points = pts.toDF("pid", "p")
    RangeJoin.pointInInterval(intervals, points, "lo", "hi", "p", w)
      .select(col("iid"), col("pid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def oracle(ivs: Seq[(Long, Long, Long)],
                     pts: Seq[(Long, Long)]): Set[(Long, Long)] =
    (for ((iid, lo, hi) <- ivs; (pid, p) <- pts if p >= lo && p <= hi)
      yield (iid, pid)).toSet

  test("matches the naive quadratic join, each pair exactly once") {
    import spark.implicits._
    // pseudorandom but deterministic fixture spanning many bins,
    // boundary-heavy (multiples of the widths under test)
    val ivs = (0L until 60L).map { i =>
      val lo = (i * 2654435761L) % 1000 - 500
      (i, lo, lo + (i * 40503L) % 97)
    }
    val pts = (0L until 300L).map(j => (j, (j * 40503L) % 1100 - 550))
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = (ivs.toDF("iid", "lo", "hi"), pts.toDF("pid", "p"))
      val joined = RangeJoin.pointInInterval(
        got._1, got._2, "lo", "hi", "p", w)
        .select(col("iid"), col("pid")).collect().map(r => (r.getLong(0), r.getLong(1)))
      // exactly-once: the multiset has no duplicates
      assert(joined.length == joined.toSet.size, s"duplicate pairs at w=$w")
      assert(joined.toSet == oracle(ivs, pts), s"pair-set mismatch at w=$w")
    }
  }

  test("bounds are inclusive on both ends") {
    assert(pairs(Seq((1L, 10L, 20L)), Seq((1L, 10L), (2L, 20L), (3L, 9L), (4L, 21L)), 5L)
      == Set((1L, 1L), (1L, 2L)))
  }

  test("negative values bin correctly (floor, not truncate-toward-zero)") {
    // with truncating division -3 div 5 = 0 = 3 div 5 would merge the
    // bins around zero and (with the re-check) still pass; pin the
    // floor by checking a pair whose point and interval sit in the
    // same NEGATIVE bin and one straddling zero
    assert(pairs(Seq((1L, -12L, -8L), (2L, -2L, 2L)),
      Seq((1L, -10L), (2L, 0L), (3L, -3L), (4L, 3L)), 5L)
      == Set((1L, 1L), (2L, 2L)))
  }

  test("empty and degenerate intervals") {
    // hi < lo: sequence(floorDiv(lo), floorDiv(hi)) would DESCEND and
    // mis-replicate; the re-check keeps results correct (no pairs)
    assert(pairs(Seq((1L, 20L, 10L)), Seq((1L, 15L)), 5L).isEmpty)
    // zero-length interval matches exactly its point
    assert(pairs(Seq((1L, 15L, 15L)), Seq((1L, 15L), (2L, 14L)), 5L)
      == Set((1L, 1L)))
  }

  private def ovPairs(as: Seq[(Long, Long, Long)], bs: Seq[(Long, Long, Long)],
                      w: Long): Seq[(Long, Long)] = {
    import spark.implicits._
    RangeJoin.intervalOverlap(
      as.toDF("aid", "alo", "ahi"), bs.toDF("bid", "blo", "bhi"),
      "alo", "ahi", "blo", "bhi", w)
      .select(col("aid"), col("bid"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
  }

  test("interval overlap matches the naive quadratic join, each pair exactly once") {
    val as = (0L until 50L).map { i =>
      val lo = (i * 2654435761L) % 900 - 450
      (i, lo, lo + (i * 40503L) % 120)
    }
    val bs = (0L until 70L).map { j =>
      val lo = (j * 40503L) % 1000 - 500
      (j, lo, lo + (j * 2654435761L) % 90)
    }
    val want = (for ((aid, alo, ahi) <- as; (bid, blo, bhi) <- bs
                     if alo <= bhi && blo <= ahi) yield (aid, bid)).toSet
    for (w <- Seq(1L, 13L, 100L, 2000L)) {
      val got = ovPairs(as, bs, w)
      assert(got.length == got.toSet.size, s"duplicate overlap pairs at w=$w")
      assert(got.toSet == want, s"overlap pair-set mismatch at w=$w")
    }
  }

  test("interval overlap: touching endpoints count, disjoint do not") {
    // [0,10] and [10,20] share the instant 10 → overlap (inclusive);
    // [0,10] and [11,20] do not
    assert(ovPairs(Seq((1L, 0L, 10L)), Seq((1L, 10L, 20L), (2L, 11L, 20L)), 7L)
      == Seq((1L, 1L)))
    // containment and negative-range overlap
    assert(ovPairs(Seq((1L, -100L, 100L)), Seq((1L, -5L, 5L), (2L, -300L, -101L)), 64L)
      == Seq((1L, 1L)))
  }

  test("plans as an equi join on the bin, not a nested loop") {
    import spark.implicits._
    val intervals = (0L until 100L).map(i => (i, i * 10, i * 10 + 30)).toDF("iid", "lo", "hi")
    val points = (0L until 100L).map(j => (j, j * 7)).toDF("pid", "p")
    val df = RangeJoin.pointInInterval(intervals, points, "lo", "hi", "p", 30L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"nested-loop plan:\n$plan")
  }
}
