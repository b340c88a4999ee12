package graft.operators

import graft.etl.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class L(k: String, ts: java.sql.Timestamp, lv: Int)
final case class R(k: String, ts: java.sql.Timestamp, rv: String)

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def ts(s: Double) = new java.sql.Timestamp((s * 1000).toLong)

  test("backward as-of picks the latest right row at-or-before each left row") {
    import spark.implicits._
    val left = Seq(
      L("a", ts(10), 1), L("a", ts(20), 2), L("a", ts(5), 3),
      L("b", ts(50), 4)).toDF()
    val right = Seq(
      R("a", ts(8), "r8"), R("a", ts(15), "r15"), R("a", ts(20), "r20"),
      R("b", ts(100), "r100")).toDF()
    val out = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("rv"))
      .select(col("k"), col("lv"), col("asof_rv"), col("asof_age_s"))
      .collect().map(r => (r.getString(0), r.getInt(1),
        Option(r.getString(2)), Option(r.get(3)).map(_.toString))).toSet
    assert(out == Set(
      ("a", 1, Some("r8"), Some("2")),     // 10 ← r@8
      ("a", 2, Some("r20"), Some("0")),    // 20 ← r@20 (equal ts visible)
      ("a", 3, None, None),                // 5: nothing before
      ("b", 4, None, None)))               // b: right only at 100 > 50
  }

  test("tolerance bounds the match age") {
    import spark.implicits._
    val left = Seq(L("a", ts(100), 1)).toDF()
    val right = Seq(R("a", ts(10), "old")).toDF()
    val hit = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("rv"), Some(200L))
    assert(hit.select("asof_rv").collect()(0).getString(0) == "old")
    val miss = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("rv"), Some(30L))
    assert(miss.select("asof_rv").collect()(0).isNullAt(0))
  }

  test("sub-second ordering: right row later in the same second does not match") {
    import spark.implicits._
    val left = Seq(L("a", ts(10.2), 1)).toDF()
    val right = Seq(R("a", ts(10.8), "late")).toDF()
    val out = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("rv"))
    assert(out.select("asof_rv").collect()(0).isNullAt(0))
  }

  test("null payload on the newest matching right row is carried as null, not an older value") {
    import spark.implicits._
    val left = Seq(L("a", ts(30), 1)).toDF()
    // newest matching right row (ts 20) has a NULL payload; the old
    // per-column last(ignoreNulls) skipped it and leaked r10's value
    // while age still came from ts 20 — the struct carry must keep
    // the null AND the newest row's age together
    val right = Seq(R("a", ts(10), "older"), R("a", ts(20), null)).toDF()
    val row = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("rv"))
      .select("asof_rv", "asof_age_s").collect()(0)
    assert(row.isNullAt(0))
    assert(row.getLong(1) == 10L)
  }

  test("plan shuffles once on the key (window exchange), no join node") {
    import spark.implicits._
    val left = Seq(L("a", ts(10), 1)).toDF()
    val right = Seq(R("a", ts(8), "x")).toDF()
    val out = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("rv"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"))
    assert(plan.contains("Window"))
  }
}
