package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** c15 (corpus diff): driver recompute of the planted snapshot rules —
  * every class count and the char delta follow from doc_id arithmetic
  * alone, so the expected report is computable without running the
  * diff. Also checks the class partition (added+removed+changed+
  * unchanged covers both snapshots exactly).
  */
class CorpusDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def knuth32(c: Long): Long = {
    val d = java.lang.Math.floorMod(c, 4294967296L)
    java.lang.Math.floorMod(
      java.lang.Math.floorMod(d * 40503L, 65536L) * 65536L + d * 31153L,
      4294967296L)
  }

  test("c15 equals the planted-rule recompute at sf0.001") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = docs.groupBy(_._3).toSeq.sortBy(_._1).map {
      case (src, rows) =>
        val m = rows.map { case (id, text, _) => (knuth32(id) % 7, text) }
        val nRemoved = m.count(_._1 == 0).toLong
        val nChanged = m.count(_._1 == 1).toLong
        val nAdded = m.count(_._1 == 2).toLong
        val nUnchanged = (m.length - nRemoved - nChanged).toLong
        // changed docs append " rev" (+4 chars); added rows join on a
        // fresh id so they never contribute to chars_delta
        (src, nAdded, nRemoved, nChanged, nUnchanged, 4L * nChanged)
    }
    val got = graft.SparkEntry.queries("c15_corpus_diff")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    // partition sanity: every A doc is removed/changed/unchanged,
    // every B-only doc is added
    val n = docs.length.toLong
    assert(got.map(r => r._3 + r._4 + r._5).sum == n)
  }
}
