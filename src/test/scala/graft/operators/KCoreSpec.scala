package graft.operators

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

class KCoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(edges: Seq[(Long, Long)], k: Int,
                  maxRounds: Int = 12): Set[(Long, Long)] = {
    import spark.implicits._
    KCore.core(edges.toDF("a", "b"), k, maxRounds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("complete graph K4 is its own 3-core (zero peel rounds)") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(run(k4, k = 3) == k4.toSet)
  }

  test("triangle + pendant tail: tail peels off in a 2-round cascade") {
    // triangle 1-2-3 plus tail 3-4-5. Round 1 drops 5 (deg 1),
    // round 2 drops 4 (deg now 1); the triangle is the 2-core.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(run(g, k = 2) == Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("cascade of exactly maxRounds peel rounds SUCCEEDS (detection round is free)") {
    // same 2-round cascade with maxRounds = 2: the fixed-point
    // detection round after the second peel must not count against
    // the bound (the documented contract: only chains LONGER than
    // maxRounds fail)
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(run(g, k = 2, maxRounds = 2) == Set((1L, 2L), (2L, 3L), (1L, 3L)))
  }

  test("cascade deeper than maxRounds throws loudly") {
    // path 1-…-8 under k=2 peels both endpoints each round:
    // round 1 drops {1,8}, round 2 {2,7}, round 3 {3,6}, round 4
    // empties — 4 peel rounds, so maxRounds = 3 must throw instead of
    // silently returning a partial peel that diverges from the oracle
    val path = (1L until 8L).map(i => (i, i + 1))
    val ex = intercept[IllegalStateException](run(path, k = 2, maxRounds = 3))
    assert(ex.getMessage.contains("did not converge"))
    // and the same cascade within the bound converges to the empty core
    assert(run(path, k = 2, maxRounds = 4) == Set.empty)
  }

  test("hand-computed mixed graph: dense core survives, fringe cascades off") {
    // K4 on {1,2,3,4} (3-core) + a chain 4-5-6 and a pendant 2-7.
    // k=3: round 1 drops {5,6,7} (deg ≤ 2)... after dropping, node 4
    // is back to deg 3 inside K4 — exactly one peel round.
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val g = k4 ++ Seq((4L, 5L), (5L, 6L), (2L, 7L))
    assert(run(g, k = 3) == k4.toSet)
  }

  test("empty input and fully-subcritical graph both return empty") {
    assert(run(Seq.empty, k = 2) == Set.empty)
    // star: center deg 3, leaves deg 1 — k=2 kills leaves then center
    assert(run(Seq((1L, 2L), (1L, 3L), (1L, 4L)), k = 2) == Set.empty)
  }
}
