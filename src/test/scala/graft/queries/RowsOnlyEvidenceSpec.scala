package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Value-level evidence for the two rows-only entries whose outputs
  * are engine-specific by construction: a03's sketches are checked
  * against the exact values they approximate (the query emits both
  * side by side), and d03's LSH candidate stage is checked against
  * the verified pair set it must contain.
  */
class RowsOnlyEvidenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.01"

  test("a03: HLL++ count-distinct lands within its 5% rsd contract of the exact value") {
    val rows = graft.SparkEntry.queries("a03_approx_sketches")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1)
      val exact = r.getLong(2)
      // approx_count_distinct(rsd=0.05): allow 4 sigma
      val tol = math.max(1.0, 0.20 * exact)
      assert(math.abs(approx - exact) <= tol,
        s"${r.getString(0)}: approx $approx vs exact $exact")
    }
  }

  test("a03: approximate percentiles are bracketed by the column's true range and order") {
    val rows = graft.SparkEntry.queries("a03_approx_sketches")(spark, sf).collect()
    rows.foreach { r =>
      val p50 = r.getDouble(3)
      val p99 = r.getDouble(4)
      assert(p50 <= p99, s"${r.getString(0)}: p50 $p50 > p99 $p99")
    }
    // percentile_approx with accuracy=100 must sit within the exact
    // central mass: check p50 against the exact median within 20%
    import org.apache.spark.sql.functions._
    val exact = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("true_p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val t = exact(r.getString(0))
      assert(math.abs(r.getDouble(3) - t) <= math.max(0.2 * math.abs(t), 1e-6),
        s"${r.getString(0)}: approx p50 ${r.getDouble(3)} vs exact $t")
    }
  }

  test("d03: the candidate stage contains every verified d02 near-dup pair") {
    val cands = graft.SparkEntry.queries("d03_lsh_candidates")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = graft.SparkEntry.queries("d02_minhash_jaccard_pairs")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty)
    assert(verified.subsetOf(cands),
      s"verified pairs missing from candidates: ${verified -- cands}")
    // and the banding actually prunes: candidates ≪ all pairs
    val n = graft.Tables.load(spark, sf, "documents").count()
    assert(cands.size < n * (n - 1) / 20,
      s"candidate set ${cands.size} is not sub-quadratic for $n docs")
  }
}
