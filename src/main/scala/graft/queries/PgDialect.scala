package graft.queries

/** PostgreSQL-dialect → Spark SQL rewrites for the constructs the
  * reference dashboards use beyond the Grafana macros
  * (SURVEY.md §2.3 scalar-function inventory):
  *
  *  - `expr::TYPE` postfix casts (incl. `::NUMERIC(p,s)`)
  *  - `EXTRACT(epoch FROM x)` → `unix_timestamp(x)`
  *  - `to_char(a - b, 'HH24:MI:SS')` interval formatting
  *  - `AS "Alias"` double-quoted identifiers → backticks
  *
  * Together with GrafanaMacros this lets the dashboards' rawSql run
  * verbatim against the engine's view catalog (DashboardParitySpec
  * runs every panel query of both dashboard JSONs).
  */
object PgDialect {

  def translate(sql: String): String =
    quotedAliases(toCharInterval(postfixCasts(extractEpoch(sql))))

  private val ExtractEpoch = raw"(?i)EXTRACT\s*\(\s*epoch\s+FROM\s+([A-Za-z_][\w.]*)\s*\)".r

  def extractEpoch(sql: String): String =
    ExtractEpoch.replaceAllIn(sql, m => s"unix_timestamp(${m.group(1)})")

  private val TypeMap = Map(
    "text" -> "STRING", "int" -> "INT", "int4" -> "INT", "int8" -> "BIGINT",
    "bigint" -> "BIGINT", "float" -> "DOUBLE", "float8" -> "DOUBLE",
    "numeric" -> "DECIMAL", "decimal" -> "DECIMAL")

  /** Rewrite `expr::TYPE` where expr is an identifier, literal, or a
    * parenthesized group (scanned back over balanced parens). */
  def postfixCasts(sql: String): String = {
    val s = new StringBuilder(sql)
    var idx = s.indexOf("::")
    while (idx >= 0) {
      // parse the type after ::
      var t = idx + 2
      while (t < s.length && (s(t).isLetterOrDigit || s(t) == '_')) t += 1
      var typeEnd = t
      if (t < s.length && s(t) == '(') { // NUMERIC(15,3)
        var depth = 1; t += 1
        while (t < s.length && depth > 0) {
          if (s(t) == '(') depth += 1 else if (s(t) == ')') depth -= 1
          t += 1
        }
        typeEnd = t
      }
      val rawType = s.substring(idx + 2, typeEnd)
      val baseName = rawType.takeWhile(c => c.isLetterOrDigit || c == '_').toLowerCase
      val args = rawType.drop(baseName.length)
      val sparkType = TypeMap.getOrElse(baseName, baseName.toUpperCase) + args
      // scan the expression leftwards
      var start = idx - 1
      if (start >= 0 && s(start) == ')') {
        var depth = 1; start -= 1
        while (start >= 0 && depth > 0) {
          if (s(start) == ')') depth += 1 else if (s(start) == '(') depth -= 1
          start -= 1
        }
        start += 1
      } else {
        while (start >= 0 && (s(start).isLetterOrDigit || s(start) == '_' ||
          s(start) == '.' || s(start) == '\'')) start -= 1
        start += 1
      }
      val exprStr = s.substring(start, idx)
      s.replace(start, typeEnd, s"CAST($exprStr AS $sparkType)")
      idx = s.indexOf("::")
    }
    s.toString
  }

  /** `to_char(a - b, 'HH24:MI:SS')` (interval formatting in the
    * disconnect panel) → epoch-difference formatting. Handles nested
    * parens in `a`/`b` by balanced scanning; duration < 24 h like the
    * PG pattern itself. */
  def toCharInterval(sql: String): String = {
    val marker = "to_char("
    val lower = sql.toLowerCase
    val at = lower.indexOf(marker)
    if (at < 0) return sql
    var i = at + marker.length
    var depth = 1
    val start = i
    while (i < sql.length && depth > 0) {
      if (sql(i) == '(') depth += 1 else if (sql(i) == ')') depth -= 1
      i += 1
    }
    val inner = sql.substring(start, i - 1)
    // split top-level comma: expr , 'FMT'
    var d = 0; var commaAt = -1; var j = 0
    while (j < inner.length && commaAt < 0) {
      if (inner(j) == '(') d += 1
      else if (inner(j) == ')') d -= 1
      else if (inner(j) == ',' && d == 0) commaAt = j
      j += 1
    }
    val expr = inner.substring(0, commaAt).trim
    val fmt = inner.substring(commaAt + 1).trim.stripPrefix("'").stripSuffix("'")
    val sparkFmt = fmt.replace("HH24", "HH").replace("MI", "mm").replace("SS", "ss")
    // a - b over timestamps → seconds difference rendered as a clock
    val minusAt = {
      var dd = 0; var k = 0; var found = -1
      while (k < expr.length && found < 0) {
        if (expr(k) == '(') dd += 1
        else if (expr(k) == ')') dd -= 1
        else if (expr(k) == '-' && dd == 0) found = k
        k += 1
      }
      found
    }
    val a = expr.substring(0, minusAt).trim
    val b = expr.substring(minusAt + 1).trim
    val replacement =
      s"date_format(timestamp_seconds(unix_timestamp($a) - unix_timestamp($b)), '$sparkFmt')"
    toCharInterval(sql.substring(0, at) + replacement + sql.substring(i))
  }

  private val QuotedAlias = raw"""(?i)(AS\s+)"([^"]+)"""".r

  def quotedAliases(sql: String): String =
    QuotedAlias.replaceAllIn(sql, m => java.util.regex.Matcher.quoteReplacement(
      m.group(1) + "`" + m.group(2) + "`"))
}
