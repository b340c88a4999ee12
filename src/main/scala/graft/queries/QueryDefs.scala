package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A named query module: Spark DataFrame builders plus (where
  * SQL-expressible) the equivalent ANSI SQL for the DuckDB oracle.
  * Column names MUST match between the two (driver sorts by column
  * name before hashing values).
  */
trait QueryModule {
  /** name -> (spark, sfDir) -> result */
  def defs: Map[String, (SparkSession, String) => DataFrame]
  /** name -> DuckDB-compatible ANSI SQL over the same tables. */
  def oracle: Map[String, String]
}

/** Shared helpers enforcing oracle-compare discipline:
  *  - time buckets as BIGINT epoch seconds (no timestamp formatting
  *    ambiguity between engines);
  *  - floating aggregates routed through fixed-scale Decimal so the
  *    result is exact and independent of partial-aggregation order
  *    (Spark sums per-partition then merges; DuckDB sums in scan
  *    order — double sums would differ in the last bits).
  */
object Q {
  /** Tumbling window start, as epoch seconds. Equivalent DuckDB SQL:
    * CAST(floor(epoch(ts)/S)*S AS BIGINT). */
  def bucket(ts: Column, secs: Long): Column =
    (floor(unix_timestamp(ts) / secs) * secs).cast(LongType)

  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** Exact decimal sum: cast input to DECIMAL(p,s) pre-agg, cast the
    * result back to DECIMAL(p,s). Matches SQL
    * CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DECIMAL(p,s)). */
  def dsum(c: Column, p: Int, s: Int): Column =
    sum(dec(c, p, s)).cast(DecimalType(p, s))

  /** Order-insensitive "average": exact decimal sum divided as double,
    * rounded, then fixed to DECIMAL(18,6). Matches SQL
    * CAST(ROUND(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)/COUNT(x), 6)
    *      AS DECIMAL(18,6)). */
  def davg(c: Column): Column =
    round(sum(dec(c, 18, 4)).cast(DoubleType) / count(c), 6)
      .cast(DecimalType(18, 6))

  /** SQL fragment for davg over expression `x` (DuckDB side). */
  def davgSql(x: String): String =
    s"CAST(ROUND(CAST(SUM(CAST(($x) AS DECIMAL(18,4))) AS DOUBLE)/COUNT($x), 6) AS DECIMAL(18,6))"

  def dsumSql(x: String, p: Int, s: Int): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL($p,$s))) AS DECIMAL($p,$s))"

  def bucketSql(ts: String, secs: Long): String =
    s"CAST(floor(epoch($ts)/$secs)*$secs AS BIGINT)"
}
