package graft.operators

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.util.Random

/** TriangleCount must equal the brute-force triple count on known
  * shapes and randomized graphs, including skewed (star/hub) inputs
  * where the degree orientation is what keeps the wedge set bounded. */
class TriangleCountSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  /** brute force on the driver: count unordered triples pairwise
    * connected */
  private def naive(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val deg = nodes.map(n => n ->
      es.count(e => e._1 == n || e._2 == n).toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val tri = (for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      a = nodes(i); b = nodes(j); c = nodes(k)
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield 1).size.toLong
    (nodes.size.toLong, es.size.toLong, wedges, tri)
  }

  private def run(edges: Seq[(Long, Long)], clue: String): Unit = {
    import spark.implicits._
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("u", "v")
    val row = TriangleCount.stats(e, "u", "v").collect().head
    val got = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val want = naive(edges)
    withClue(s"$clue: got $got want $want\n") { assert(got == want) }
    // transitivity cross-check: exact floor fixed-point
    val trans = if (row.isNullAt(4)) None else Some(row.getLong(4))
    val wantTrans = if (want._3 == 0) None else Some(3000000L * want._4 / want._3)
    assert(trans == wantTrans, clue)
  }

  test("known shapes") {
    run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)), "triangle with tail")
    run(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)),
      "two triangles sharing an edge")
    run((2L to 9L).map(i => (1L, i)), "star: hub has no triangles")
    run(for { i <- 1L to 5L; j <- (i + 1) to 5L } yield (i, j), "K5 = 10")
    run(Seq((1L, 2L)), "single edge: no wedges, NULL transitivity")
  }

  test("randomized graphs match brute force") {
    for (seed <- 1 to 6) {
      val rnd = new Random(seed)
      val n = 12 + rnd.nextInt(14)
      val edges = (for {
        i <- 1L to n; j <- (i + 1) to n
        if rnd.nextDouble() < 0.3
      } yield (i, j)).toSeq
      if (edges.nonEmpty) run(edges, s"seed=$seed n=$n")
    }
  }

  test("skewed hub graph and plan shape") {
    import spark.implicits._
    // hub 0 connected to all; a sparse ring among the leaves
    val hub = (1L to 40L).map(i => (0L, i))
    val ring = (1L to 39L).map(i => (i, i + 1)) :+ (40L, 1L)
    run(hub ++ ring, "hub+ring")
    val e = (hub ++ ring).toDF("u", "v")
    val plan = TriangleCount.stats(e, "u", "v")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    // the only nested-loop join allowed is the final one-row scalar
    // cross of the three aggregate totals
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).length
    assert(bnlj <= 2, s"unexpected nested loops:\n$plan")
  }
}
