package graft.operators

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Reference implementation of the exact integer contract. */
  private def oracle(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = edges.map(_._1).distinct.sorted
    val n = nodes.size.toLong
    val base = (15L * PageRank.Scale) / (100L * n)
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to iters) {
      val contribs = edges.map { case (s, d) => d -> (r(s) * 85L) / (100L * deg(s)) }
      r = contribs.groupBy(_._1).map { case (d, cs) => d -> (base + cs.map(_._2).sum) }
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
  }

  test("matches the exact-arithmetic reference on a 2-regular ring") {
    // ring 0→1→2→3→4→0 plus reverse edges: every node outdeg 2
    val ring = (0L until 5L).flatMap(i => Seq((i, (i + 1) % 5), ((i + 1) % 5, i)))
    for (k <- Seq(1, 3, 5)) assert(run(ring, k) == oracle(ring, k))
    // symmetric graph → uniform ranks at every iteration
    assert(run(ring, 5).values.toSet.size == 1)
  }

  test("matches the reference on an asymmetric graph and orders hubs first") {
    // star with a tail: hub 0 connected to 1..4, plus chain 4-5;
    // symmetrized so outdeg >= 1 everywhere
    val raw = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (4L, 5L))
    val edges = raw ++ raw.map(_.swap)
    val got = run(edges, 5)
    assert(got == oracle(edges, 5))
    // the hub outranks everything; the degree-1 star leaves rank
    // lowest (the tail node 5 beats them: it receives HALF of
    // degree-2 node 4's rank, a leaf only a quarter of the hub's)
    assert(got(0L) == got.values.max)
    assert(got(1L) == got.values.min && got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(5L) > got(1L))
  }

  test("rank mass stays within floor loss of Scale") {
    val raw = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (4L, 5L))
    val edges = raw ++ raw.map(_.swap)
    val total = run(edges, 5).values.sum
    // each of 6 nodes loses < 1 unit per floor, 3 floors per iter, 5 iters
    assert(total <= PageRank.Scale && total > PageRank.Scale - 6L * 3L * 5L)
  }
}
