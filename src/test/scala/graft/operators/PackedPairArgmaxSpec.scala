package graft.operators

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The packed streaming argmax must equal the declarative
  * pair-count + struct-max form on any input within its contract,
  * and fail loudly outside it. */
class PackedPairArgmaxSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def declarative(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    pairs.groupBy(identity).map { case ((a, b), g) => (a, b, g.size.toLong) }
      .groupBy(_._1)
      .map { case (a, rows) =>
        // max count, ties to smallest b
        val best = rows.minBy { case (_, b, c) => (-c, b) }
        a -> (best._2, best._3)
      }

  private def viaKernel(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    PackedPairArgmax(pairs.toDF("a", "b"), "a", "b", "a", "b", "c")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("hand fixtures: ties to smallest b, singletons, one key") {
    val fx = Seq[Seq[(Long, Long)]](
      Seq((1L, 5L), (1L, 5L), (1L, 3L)),               // clear winner
      Seq((1L, 5L), (1L, 3L)),                         // tie -> smaller b
      Seq((7L, 0L)),                                   // singleton
      Seq((1L, 2L), (2L, 1L), (3L, 3L)),               // one pair per key
      Seq.empty)
    for (f <- fx) assert(viaKernel(f) == declarative(f), s"fixture $f")
  }

  test("randomized sweep vs declarative form") {
    val rnd = new Random(11)
    for (_ <- 1 to 20) {
      val pairs = (1 to rnd.nextInt(500) + 1).map(_ =>
        (rnd.nextInt(20).toLong, rnd.nextInt(15).toLong))
      assert(viaKernel(pairs) == declarative(pairs))
    }
  }

  test("contract bounds: large keys survive, violations raise") {
    val big = Seq(((1L << 32) - 1, (1L << 31) - 1), ((1L << 32) - 1, (1L << 31) - 1))
    assert(viaKernel(big) == declarative(big))
    val ex = intercept[Exception] { viaKernel(Seq((1L, 1L << 31))) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("PackedPairArgmax contract")))
    val ex2 = intercept[Exception] { viaKernel(Seq((-1L, 1L))) }
    assert(msgs(ex2).exists(_.contains("PackedPairArgmax contract")))
  }
}
