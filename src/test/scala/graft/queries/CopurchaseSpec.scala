package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixture for the g06 streaming pair kernel: a basket
  * larger than the kernel's initial 64-slot buffer (growth, no silent
  * truncation), a duplicated (order, part) row (membership dedup), a
  * support-1 pair (minsup filter), and the (support DESC, p1, p2)
  * ordering — on the plain (non-bucketed) layout, so the co-locating
  * repartition branch is the one exercised.
  */
class CopurchaseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("g06 kernel: 70-item basket, dup rows, minsup, ordering") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_g06").toString
    val rows =
      (1L to 70L).map(p => (1L, p)) ++ Seq((1L, 1L)) ++ // dup (1,1)
        (1L to 70L).map(p => (2L, p)) ++
        Seq((3L, 200L), (3L, 201L)) ++ // support-1 pair -> filtered
        // filler singleton orders so nf(part 1) = 3 stays under the
        // hot cap (nf*50 <= n_lines): n_lines = 143 + 107 = 250
        (10L until 117L).map(ok => (ok, 1000L + ok))
    rows.toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$d/lineitem.parquet")
    val out = graft.SparkEntry.queries("g06_copurchase_pairs")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // every pair from the 70-part basket has support 2 (both orders);
    // top-20 by (n DESC, p1, p2) = (1,2)..(1,21), each n=2 — a C(70,2)
    // expansion that overflows a 64-slot buffer if the kernel dropped
    // items instead of growing
    assert(out == (2L to 21L).map(j => (1L, j, 2L)))
  }

  test("pair kernel: C(n,2) in Long, loud error past the basket bound") {
    // a 4k-part basket: n*(n-1)/2 still fits Int here, but the count
    // must be exact and every pair must be emitted once, packed
    val n = 4000
    val rows = (1 to n).iterator.map(p => (7L, p.toLong))
    var count = 0L
    val it = GraphOps.pairKernel(rows)
    while (it.hasNext) { it.next(); count += 1 }
    assert(count == n.toLong * (n - 1) / 2)
    // past maxBasket the kernel throws the named contract error
    // instead of overflowing C(n,2) to a negative Int array size
    val big = (1 to GraphOps.maxBasket + 1).iterator.map(p => (9L, p.toLong))
    val ex = intercept[IllegalStateException] {
      GraphOps.pairKernel(big).hasNext
    }
    assert(ex.getMessage.contains("out of contract"))
  }
}
