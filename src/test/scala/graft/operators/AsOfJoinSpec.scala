package graft.operators

import graft.etl.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

final case class L(k: String, ts: java.sql.Timestamp, lv: Int)
final case class R(k: String, ts: java.sql.Timestamp, rv: String)

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def ts(s: Double) = new java.sql.Timestamp((s * 1000).toLong)

  // every semantics test runs through BOTH physical paths: the
  // shuffle-merge (no hint; the tiny local relations stay under the
  // broadcast threshold, so disable auto to force the merge) and the
  // broadcast probe (explicit hint)
  private def bothPaths(name: String)(
      f: ((DataFrame, DataFrame, String, String, String, Seq[String], Option[Long]) => DataFrame) => Unit): Unit = {
    test(s"$name (shuffle-merge)") {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try f((l, r, k, lt, rt, p, tol) => AsOfJoin.backward(l, r, k, lt, rt, p, tol))
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
    }
    test(s"$name (broadcast)") {
      f((l, r, k, lt, rt, p, tol) => AsOfJoin.backward(l, broadcast(r), k, lt, rt, p, tol))
    }
  }

  bothPaths("backward as-of picks the latest right row at-or-before each left row") { asof =>
    import spark.implicits._
    val left = Seq(
      L("a", ts(10), 1), L("a", ts(20), 2), L("a", ts(5), 3),
      L("b", ts(50), 4)).toDF()
    val right = Seq(
      R("a", ts(8), "r8"), R("a", ts(15), "r15"), R("a", ts(20), "r20"),
      R("b", ts(100), "r100")).toDF()
    val out = asof(left, right, "k", "ts", "ts", Seq("rv"), None)
      .select(col("k"), col("lv"), col("asof_rv"), col("asof_age_s"))
      .collect().map(r => (r.getString(0), r.getInt(1),
        Option(r.getString(2)), Option(r.get(3)).map(_.toString))).toSet
    assert(out == Set(
      ("a", 1, Some("r8"), Some("2")),     // 10 ← r@8
      ("a", 2, Some("r20"), Some("0")),    // 20 ← r@20 (equal ts visible)
      ("a", 3, None, None),                // 5: nothing before
      ("b", 4, None, None)))               // b: right only at 100 > 50
  }

  bothPaths("tolerance bounds the match age") { asof =>
    import spark.implicits._
    val left = Seq(L("a", ts(100), 1)).toDF()
    val right = Seq(R("a", ts(10), "old")).toDF()
    val hit = asof(left, right, "k", "ts", "ts", Seq("rv"), Some(200L))
    assert(hit.select("asof_rv").collect()(0).getString(0) == "old")
    val miss = asof(left, right, "k", "ts", "ts", Seq("rv"), Some(30L))
    assert(miss.select("asof_rv").collect()(0).isNullAt(0))
  }

  bothPaths("sub-second ordering: right row later in the same second does not match") { asof =>
    import spark.implicits._
    val left = Seq(L("a", ts(10.2), 1)).toDF()
    val right = Seq(R("a", ts(10.8), "late")).toDF()
    val out = asof(left, right, "k", "ts", "ts", Seq("rv"), None)
    assert(out.select("asof_rv").collect()(0).isNullAt(0))
  }

  bothPaths("null payload on the newest matching right row is carried as null, not an older value") { asof =>
    import spark.implicits._
    val left = Seq(L("a", ts(30), 1)).toDF()
    // newest matching right row (ts 20) has a NULL payload; the carry
    // must keep the null AND the newest row's age together (a
    // per-column last(ignoreNulls) would leak r10's value)
    val right = Seq(R("a", ts(10), "older"), R("a", ts(20), null)).toDF()
    val row = asof(left, right, "k", "ts", "ts", Seq("rv"), None)
      .select("asof_rv", "asof_age_s").collect()(0)
    assert(row.isNullAt(0))
    assert(row.getLong(1) == 10L)
  }

  bothPaths("multiple keys reset the carry / probe independent lookups") { asof =>
    import spark.implicits._
    val left = Seq(L("a", ts(10), 1), L("b", ts(10), 2)).toDF()
    val right = Seq(R("a", ts(5), "ra")).toDF()
    val out = asof(left, right, "k", "ts", "ts", Seq("rv"), None)
      .select("k", "asof_rv").collect().map(r => (r.getString(0), Option(r.getString(1)))).toSet
    assert(out == Set(("a", Some("ra")), ("b", None)))
  }

  test("merge plan shuffles once on the key, no join/window nodes") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = Seq(L("a", ts(10), 1)).toDF()
      val right = Seq(R("a", ts(8), "x")).toDF()
      val out = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("rv"))
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
        !plan.contains("CartesianProduct"))
      assert(!plan.contains("Window"))
      assert(plan.contains("AsOfMerge"))
      assert(plan.split("Exchange").length - 1 == 1, s"expected exactly one shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
  }

  test("broadcast plan never shuffles or sorts the LEFT (fact) side") {
    import spark.implicits._
    val left = Seq(L("a", ts(10), 1)).toDF()
    val right = Seq(R("a", ts(8), "x")).toDF()
    // AQE's wrapper hides the inner plan from collect(); plan shape
    // is identical without it
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try AsOfJoin.backward(left, broadcast(right), "k", "ts", "ts", Seq("rv"))
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // the broadcast path is Spark's own BroadcastHashJoin + the
    // asof_search codegen probe — no custom exec node at all
    val joins = plan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(joins.nonEmpty, s"no broadcast hash join in:\n$plan")
    // the right side groups/sorts DISTRIBUTED (its own small shuffle);
    // the fact side must stream through untouched
    val leftPlan = joins.head.left.toString
    assert(!leftPlan.contains("Exchange"), s"left side shuffled:\n$leftPlan")
    assert(!leftPlan.contains("Sort"), s"left side sorted:\n$leftPlan")
    assert(plan.toString.contains("asof_search"), s"probe expression missing:\n$plan")
  }

  test("column pruning shrinks the merge node (unused left cols + payload dropped)") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val left = Seq(L("a", ts(10), 1)).toDF()
      val right = Seq(R("a", ts(8), "x")).toDF()
      val out = AsOfJoin.backward(left, right, "k", "ts", "ts", Seq("rv"))
        .select("k", "asof_age_s") // drops lv, ts AND the rv payload
      // the test session has no extensions, so the self-healed
      // post-hoc copy of AsOfMergePruning applies here; in an
      // extensions session the same rule runs inside the fixed-point
      // batch and the projection reaches the parquet scans (asserted
      // in PlanAudit against real tables)
      val nodes = out.queryExecution.optimizedPlan.collect {
        case m: graft.plans.AsOfMergeLogical => m
      }
      assert(nodes.nonEmpty)
      assert(nodes.head.leftAttrs.map(_.name) == Seq("k"))
      assert(nodes.head.payloadAttrs.isEmpty)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
  }

  test("backwardSelf equals the two-sided form on a partitioned table, with one scan") {
    import spark.implicits._
    // deterministic pseudo-random mix of marker (rv even) / probe rows
    val rows = (0 until 500).map { i =>
      val k = s"k${(i * 7) % 5}"
      val t = ts(((i * 131) % 97) + (i % 3) * 0.25)
      (k, t, i, i % 4 == 0) // every 4th row is a marker
    }.toDF("k", "ts", "id", "marker")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val twoSided = AsOfJoin.backward(
        rows.filter(!col("marker")), rows.filter(col("marker")).select("k", "ts", "id"),
        "k", "ts", "ts", Seq("id"))
        .select("k", "id", "asof_id", "asof_age_s")
      val self = AsOfJoin.backwardSelf(rows, col("marker"), "k", "ts", Seq("id"))
        .select("k", "id", "asof_id", "asof_age_s")
      val a = twoSided.collect().map(_.toSeq).toSet
      val b = self.collect().map(_.toSeq).toSet
      assert(a == b && a.size == 375)
      // one scan: the self plan contains no Union (and therefore one
      // LocalRelation leaf); the two-sided plan has two
      val leaves = self.queryExecution.optimizedPlan.collectLeaves()
      assert(leaves.size == 1)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
  }
}
