package graft.operators

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.util.Random

/** NeighborAgg must be PAIR-EXACT: identical output to enumerating
  * the qualifying pairs with RangeJoin.pointInInterval and running
  * the countDistinct aggregate over them — including duplicate
  * timestamps, same-timestamp anchors, anchors at the timeline
  * edges (probes below/above every point), types with zero pairs
  * (absent from the output), and the self-pair exclusion. */
class NeighborAggSpec extends AnyFunSuite with Matchers {
  private lazy val spark = SparkTestSession.spark

  private val W = 500L
  private val R = 8 // few ranges, so boundaries + offsets are exercised

  /** The reference shape: RangeJoin pair enumeration + aggregate. */
  private def pairPlan(ev: DataFrame): DataFrame = {
    val pts = ev.select(col("id").as("p_id"), col("tpe").as("nbr_type"),
      col("us").as("p_us"))
    val anchors = ev.filter(col("tpe") === "error")
      .select(col("id").as("a_id"), col("us").as("a_us"),
        (col("us") - W).as("lo"), (col("us") + W).as("hi"))
    RangeJoin.pointInInterval(anchors, pts, "lo", "hi", "p_us", 2 * W)
      .filter(col("p_id") =!= col("a_id"))
      .groupBy(col("nbr_type"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("a_id")).as("n_anchors"),
        countDistinct(col("p_id")).as("n_points"),
        sum(abs(col("p_us") - col("a_us"))).as("sum_abs_dt_us"))
      .orderBy("nbr_type")
  }

  private def prefixPlan(ev: DataFrame): DataFrame =
    NeighborAgg.neighborStats(ev, "id", "tpe", "us", "error", W, R)
      .select(col("tpe").as("nbr_type"), col("n_pairs"), col("n_anchors"),
        col("n_points"), col("sum_abs_dt_us"))
      .orderBy("nbr_type")

  private def check(rows: Seq[(Long, String, Long)], clue: String): Unit = {
    import spark.implicits._
    val ev = rows.toDF("id", "tpe", "us")
    val got = prefixPlan(ev).collect().map(_.toSeq).toSeq
    val want = pairPlan(ev).collect().map(_.toSeq).toSeq
    withClue(s"$clue: got $got want $want\n") { assert(got == want) }
  }

  test("randomized timelines match the pair plan exactly") {
    val types = Array("click", "view", "error", "purchase")
    for (seed <- 1 to 12) {
      val rnd = new Random(seed)
      val n = 30 + rnd.nextInt(170)
      // dense timeline with duplicate timestamps and negative times
      val rows = (1L to n).map { id =>
        (id, types(rnd.nextInt(types.length)),
          rnd.nextInt(40 * W.toInt).toLong - 20 * W + (seed % 3))
      }
      check(rows, s"seed=$seed")
    }
  }

  test("edge shapes") {
    // single anchor alone: no pairs at all -> empty output
    check(Seq((1L, "error", 100L)), "lone anchor")
    // two same-timestamp errors: each is the other's pair
    check(Seq((1L, "error", 100L), (2L, "error", 100L)), "same-ts errors")
    // anchors at the extreme ends of the timeline (probe clamping)
    check(Seq((1L, "error", 0L), (2L, "click", 10L), (3L, "error", 5000L),
      (4L, "view", 4990L)), "edge anchors")
    // a type entirely outside every window is absent from the output
    check(Seq((1L, "error", 0L), (2L, "click", 10L),
      (3L, "purchase", 100000L)), "out-of-range type")
    // no anchors -> empty
    check(Seq((1L, "click", 10L), (2L, "view", 20L)), "no anchors")
  }

  test("pairStats and the auto selector match the sweep exactly") {
    import spark.implicits._
    val rnd = new Random(77)
    val types = Array("click", "view", "error", "purchase")
    val rows = (1L to 150L).map { id =>
      (id, types(rnd.nextInt(types.length)),
        rnd.nextInt(40 * W.toInt).toLong - 20 * W)
    }
    val ev = rows.toDF("id", "tpe", "us")
    def norm(df: DataFrame) =
      df.orderBy("tpe").collect().map(_.toSeq).toSeq
    val sweep = norm(NeighborAgg.neighborStats(ev, "id", "tpe", "us", "error", W, R))
    val pairs = norm(NeighborAgg.pairStats(ev, "id", "tpe", "us", "error", W))
    val auto = norm(NeighborAgg.neighborStatsAuto(ev, "id", "tpe", "us", "error", W, R))
    assert(pairs == sweep)
    assert(auto == sweep)
    // the dense fixture (150 events in a ±20W band, ±W windows) must
    // put the selector on the sweep side; an empty input stays on the
    // cheap pair side and yields the empty frame
    assert(NeighborAgg.neighborStatsAuto(
      ev.filter(col("tpe") === "none"), "id", "tpe", "us", "error", W, R)
      .collect().isEmpty)
  }

  test("r01 plan stays free of nested-loop joins") {
    import spark.implicits._
    val ev = (1L to 50L).map(i => (i, if (i % 5 == 0) "error" else "click", i * 37 % 3000))
      .toDF("id", "tpe", "us")
    val plan = prefixPlan(ev).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // the whole point: no Expand-based multi-distinct over a pair stream
    assert(!plan.contains("Expand"))
  }
}
