package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-cutting entries: multimodal feature extraction and the
  * Grafana-macro SQL path (raw dashboard SQL → translate → spark.sql).
  */
object MiscQueries extends QueryModule {

  // m01: multimodal binary-column pipeline (stub codec; real plumbing).
  private def m01(s: SparkSession, d: String): DataFrame =
    graft.multimodal.Multimodal.featureSummary(s, d)

  // g01: a dashboard query in Grafana macro form, translated and run
  // through spark.sql over registered views — the reference's query
  // transport (SURVEY.md §3.2 entry point B).
  private val g01Raw =
    """SELECT $__timeGroupAlias(ts, '10m'), user_id,
      |  CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS bytes
      |FROM events
      |WHERE $__timeFilter(ts) AND event_type IN ($event_types)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def g01(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    val sql = GrafanaMacros.translate(g01Raw,
      GrafanaMacros.TimeRange("2024-01-05 00:00:00", "2024-01-20 00:00:00"),
      templateVars = Map("event_types" -> "'click','purchase'"))
    s.sql(sql)
  }

  private val g01Sql =
    """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS time, user_id,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS bytes
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      |  AND event_type IN ('click','purchase')
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_features" -> m01,
    "g01_grafana_macro_sql" -> g01)

  override def oracle: Map[String, String] = Map(
    "g01_grafana_macro_sql" -> g01Sql)
}
