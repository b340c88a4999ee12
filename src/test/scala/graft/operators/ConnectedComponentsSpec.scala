package graft.operators

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.components(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain propagates the min label across multiple hops") {
    // 1-2, 2-3, 3-4, 4-5: diameter 4, needs >1 round — catches any
    // one-hop-only 'star' shortcut
    val got = run(Seq((2L, 1L), (2L, 3L), (3L, 4L), (5L, 4L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate keepers") {
    val got = run(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L)))
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("bridged cliques merge into one component") {
    val c1 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val c2 = for (i <- 11L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val got = run(c1 ++ c2 :+ ((4L, 11L)))
    assert(got.values.toSet == Set(1L))
    assert(got.keySet == ((1L to 4L) ++ (11L to 14L)).toSet)
  }

  test("only nodes present in edges are labeled") {
    val got = run(Seq((7L, 8L)))
    assert(got == Map(7L -> 7L, 8L -> 7L))
  }

  test("a 200-node path converges within the pointer-jumping round bound") {
    import spark.implicits._
    // path graph = worst-case diameter (a drifting near-dup chain in
    // d07 terms). Plain min-propagation needs ~200 rounds; pointer
    // jumping halves distance-to-root each round, so 12 rounds
    // suffice — the tight maxRounds makes the complexity claim the
    // assertion, not just termination
    val edges = (1L until 200L).map(i => (i + 1, i))
    val got = ConnectedComponents
      .components(edges.toDF("a", "b"), maxRounds = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200 && got.values.forall(_ == 1L))
  }
}
