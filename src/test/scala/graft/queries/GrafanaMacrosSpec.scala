package graft.queries

import graft.queries.GrafanaMacros.{TimeRange, translate}
import org.scalatest.funsuite.AnyFunSuite

class GrafanaMacrosSpec extends AnyFunSuite {
  private val r = TimeRange("2024-01-01 00:00:00", "2024-02-01 00:00:00")

  test("$__timeFilter expands to a half-open range predicate") {
    val got = translate("SELECT 1 FROM t WHERE $__timeFilter(ts)", r)
    assert(got.contains("ts >= TIMESTAMP '2024-01-01 00:00:00'"))
    assert(got.contains("ts < TIMESTAMP '2024-02-01 00:00:00'"))
  }

  test("$__timeGroup/$__timeGroupAlias expand to epoch buckets") {
    assert(translate("$__timeGroup(ts, '5m')", r) ==
      "CAST(floor(unix_timestamp(ts) / 300) * 300 AS BIGINT)")
    assert(translate("$__timeGroupAlias(ts, '1h')", r) ==
      "CAST(floor(unix_timestamp(ts) / 3600) * 3600 AS BIGINT) AS time")
    assert(translate("$__timeGroup(ts, 90s)", r).contains("/ 90)"))
  }

  test("$__interval_ms and template vars substitute") {
    val got = translate("SELECT SUM(x)/$__interval_ms FROM t WHERE m IN ($mp)", r,
      intervalMs = 30000, templateVars = Map("mp" -> "'A','B'"))
    assert(got == "SELECT SUM(x)/30000 FROM t WHERE m IN ('A','B')")
  }

  test("a full dashboard-shaped query translates to runnable Spark SQL") {
    val spark = graft.etl.SparkTestSession.spark
    graft.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val sql = translate(
      """SELECT $__timeGroupAlias(ts, '10m'), user_id, SUM(value) AS v
        |FROM events WHERE $__timeFilter(ts) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin, r)
    val out = spark.sql(sql)
    assert(out.columns.toSeq == Seq("time", "user_id", "v"))
    assert(out.count() > 0)
  }
}
