package graft.queries

import graft.etl.{ReferenceCatalog, SparkTestSession}
import org.scalatest.funsuite.AnyFunSuite

/** Query-surface parity: every panel query of the reference's two
  * dashboards — the VERBATIM rawSql read from the dashboard JSONs at
  * /root/reference — runs against the engine's reference catalog after
  * Grafana-macro + PostgreSQL-dialect translation.
  */
class DashboardParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rawSqls(path: String): Seq[String] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new java.io.File(path))
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit = {
      if (n.isObject) {
        val it = n.fields()
        while (it.hasNext) {
          val e = it.next()
          if (e.getKey == "rawSql" && e.getValue.isTextual) out += e.getValue.asText()
          walk(e.getValue)
        }
      } else if (n.isArray) n.forEach(walk(_))
    }
    walk(root)
    out.toSeq
  }

  private val vars = Map(
    "mountpoints" -> "'MNT01','MNT02','MNT03','MNT04'",
    "selected_mountpoint" -> "MNT01",
    "GPSleapseconds" -> "18",
    "GLOleapseconds" -> "0",
    "GALleapseconds" -> "18",
    "BEIleapseconds" -> "4")

  // starts a day early: GLONASS obs epochs carry the −3 h UTC(SU)
  // shift, so their event time falls before the receive date's midnight
  private val range =
    GrafanaMacros.TimeRange("2023-12-31 00:00:00", "2024-01-02 00:00:00")

  private def runAll(path: String): Seq[(String, Long)] = {
    ReferenceCatalog.register(spark)
    rawSqls(path).map { raw =>
      val sql = GrafanaMacros.translate(PgDialect.translate(raw), range,
        intervalMs = 60000L, templateVars = vars)
      val n = spark.sql(sql).collect().length.toLong
      (raw.linesIterator.find(_.trim.nonEmpty).getOrElse("").take(60), n)
    }
  }

  test("all RTCM monitor panel queries run verbatim (translated) and return data") {
    val results = runAll("/root/reference/initgrafana/dashboards/RTCM monitor.json")
    assert(results.size == 11)
    // every panel query executes; the time-series/table panels over
    // populated tables return rows
    val nonEmpty = results.count(_._2 > 0)
    assert(nonEmpty >= 9, results.mkString("\n"))
  }

  test("all Disturbances SNR panel queries run verbatim (translated)") {
    val results = runAll("/root/reference/initgrafana/dashboards/Disturbances.json")
    assert(results.size == 4)
    // GPS/GLONASS/Galileo have synthetic MSM5/7 traffic; BeiDou none
    assert(results.count(_._2 > 0) >= 3, results.mkString("\n"))
  }

  test("PgDialect unit rewrites") {
    assert(PgDialect.translate("(x + y)::NUMERIC(15,3)") ==
      "CAST((x + y) AS DECIMAL(15,3))")
    assert(PgDialect.translate("a::text") == "CAST(a AS STRING)")
    assert(PgDialect.translate("EXTRACT(epoch FROM receive_time)") ==
      "unix_timestamp(receive_time)")
    assert(PgDialect.translate(
      "to_char(coalesce(reconnect_time, CURRENT_TIMESTAMP)-disconnect_time, 'HH24:MI:SS') as \"Duration\"") ==
      "date_format(timestamp_seconds(unix_timestamp(coalesce(reconnect_time, CURRENT_TIMESTAMP)) - " +
        "unix_timestamp(disconnect_time)), 'HH:mm:ss') as `Duration`")
  }
}
