package graft.operators

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** LabelPropagation: exact synchronous rounds (hand-checked plurality
  * with ties to the smallest label) and the loud contract guard for
  * unsymmetrized graphs (nodes never appearing as dst used to vanish
  * silently from the result).
  */
class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("exact synchronous rounds, ties to smallest label") {
    import spark.implicits._
    // triangle {1,2,3} + disconnected pair {10,11}, symmetrized.
    // round 1: 1←{2,3} tie→2; 2←{1,3}→1; 3←{1,2}→1; 10↔11 swap labels.
    // round 2: 1←{1,1}→1; 2←{2,1} tie→1; 3←{2,1} tie→1; pair swaps back.
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = LabelPropagation.run(edges, "src", "dst", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 11L))
  }

  test("contract guard: unsymmetrized graph fails loudly") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // 1 never a dst
    val e = intercept[IllegalArgumentException] {
      LabelPropagation.run(edges, "src", "dst", 1)
    }
    assert(e.getMessage.contains("symmetrize"))
  }
}
