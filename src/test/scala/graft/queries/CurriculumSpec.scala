package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** c14 (curriculum-ordered shards): the rank-without-global-sort
  * machinery must equal the plain global sort. The spec recomputes the
  * manifest driver-side from the engine's OWN per-doc scores (t23's
  * scorer — its exactness is t23's oracle contract) via an actual
  * sort, and checks the curriculum invariants: score envelopes
  * monotone across shards, ranks a contiguous 1..n permutation.
  */
class CurriculumSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def knuth32(c: Long): Long = {
    val d = java.lang.Math.floorMod(c, 4294967296L)
    java.lang.Math.floorMod(
      java.lang.Math.floorMod(d * 40503L, 65536L) * 65536L + d * 31153L,
      4294967296L)
  }

  test("c14 equals a driver-side global sort of the same keys") {
    val scores = TextAnalysis.t23DocScores(spark, sf)
      .select("doc_id", "qs").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ordered = docs.map { case (id, text) =>
      val nTok = text.split(" ", -1).count(_.nonEmpty).toLong
      (scores.getOrElse(id, 0L), knuth32(id), id, nTok)
    }.sortBy { case (qs, sk, id, _) => (qs, sk, id) }
    val expected = ordered.zipWithIndex.map { case ((qs, _, _, nTok), i) =>
      ((i.toLong) / 100, qs, nTok, i + 1L)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (shard, rows) =>
      (shard, rows.length.toLong, rows.map(_._3).sum,
        rows.map(_._2).min, rows.map(_._2).max,
        rows.map(_._4).min, rows.map(_._4).max)
    }
    val got = graft.SparkEntry.queries("c14_curriculum_shards")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
    // curriculum invariants: shard score envelopes are monotone and
    // ranks tile 1..n contiguously
    got.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._5 <= b._4 || a._5 <= b._5, s"score envelope not monotone: $a -> $b")
        assert(a._7 + 1 == b._6, s"ranks not contiguous: $a -> $b")
      case _ =>
    }
    assert(got.map(_._2).sum == docs.length.toLong)
  }
}
