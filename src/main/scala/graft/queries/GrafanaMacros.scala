package graft.queries

/** Translation of the Grafana/TimescaleDB macro surface the reference
  * dashboards use (SURVEY.md §3.2; RTCM monitor.json rawSql) into
  * Spark SQL, so the reference's raw dashboard queries run verbatim
  * against the engine's views via spark.sql.
  *
  * Supported: $__timeFilter(col), $__timeGroup(col, 'Ns'|'Nm'|'Nh'),
  * $__timeGroupAlias(col, i), $__interval_ms, and $var template
  * substitution.
  */
object GrafanaMacros {

  final case class TimeRange(fromIso: String, toIso: String)

  private val TimeFilter = raw"\$$__timeFilter\(([^)]+)\)".r
  private val TimeGroupAlias = raw"\$$__timeGroupAlias\(([^,)]+),\s*'?([0-9]+)([smh])'?\)".r
  private val TimeGroup = raw"\$$__timeGroup\(([^,)]+),\s*'?([0-9]+)([smh])'?\)".r
  private val IntervalMs = raw"\$$__interval_ms".r

  private def seconds(n: String, unit: String): Long = unit match {
    case "s" => n.toLong
    case "m" => n.toLong * 60
    case "h" => n.toLong * 3600
  }

  private def bucketSql(col: String, secs: Long): String =
    s"CAST(floor(unix_timestamp($col) / $secs) * $secs AS BIGINT)"

  def translate(rawSql: String, range: TimeRange,
                intervalMs: Long = 600000L,
                templateVars: Map[String, String] = Map.empty): String = {
    var sql = rawSql
    // interval substitutions first: the dashboards write
    // $__timeGroup(col, $__interval) with the bare interval token
    // ($__interval_ms before $__interval — prefix collision)
    sql = IntervalMs.replaceAllIn(sql, intervalMs.toString)
    sql = sql.replace("$__interval", s"${intervalMs / 1000}s")
    sql = TimeFilter.replaceAllIn(sql, m =>
      s"(${m.group(1)} >= TIMESTAMP '${range.fromIso}' AND ${m.group(1)} < TIMESTAMP '${range.toIso}')")
    sql = TimeGroupAlias.replaceAllIn(sql, m =>
      s"${bucketSql(m.group(1), seconds(m.group(2), m.group(3)))} AS time")
    sql = TimeGroup.replaceAllIn(sql, m =>
      bucketSql(m.group(1), seconds(m.group(2), m.group(3))))
    templateVars.foreach { case (k, v) =>
      sql = sql.replace("${" + k + "}", v).replace("$" + k, v)
    }
    sql
  }
}
