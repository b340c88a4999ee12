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

  /** Exact decimal sum: equivalent to SQL
    * CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DECIMAL(p,s)), but summed as
    * scaled longs — a primitive codegen sum instead of per-row
    * BigDecimal — then rescaled. Identical values (both paths are
    * exact integer arithmetic on round(x·10^s)); ~3-4× faster on wide
    * aggregations. Overflow bound: |Σ x·10^s| < 2^63 (~9e18). */
  def dsum(c: Column, p: Int, s: Int): Column = {
    val scale = math.pow(10, s)
    // divide by an INTEGER literal: decimal / double would fall back to
    // double division and lose the exactness this exists for
    (sum(round(c * scale, 0).cast(LongType)).cast(DecimalType(38, 0)) /
      lit(scale.toLong)).cast(DecimalType(p, s))
  }

  /** Order-insensitive "average": exact scaled-long sum divided as
    * double, rounded, fixed to DECIMAL(18,6). Value-identical to SQL
    * CAST(ROUND(CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)/COUNT(x), 6)
    *      AS DECIMAL(18,6)) while |Σ x·10^4| < 2^53 (double-exact). */
  def davg(c: Column): Column =
    round((sum(round(c * 1e4, 0).cast(LongType)).cast(DoubleType) / 1e4) / count(c), 6)
      .cast(DecimalType(18, 6))

  /** SQL fragment for davg over expression `x` (DuckDB side). */
  def davgSql(x: String): String =
    s"CAST(ROUND(CAST(SUM(CAST(($x) AS DECIMAL(18,4))) AS DOUBLE)/COUNT($x), 6) AS DECIMAL(18,6))"

  def dsumSql(x: String, p: Int, s: Int): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL($p,$s))) AS DECIMAL($p,$s))"

  def bucketSql(ts: String, secs: Long): String =
    s"CAST(floor(epoch($ts)/$secs)*$secs AS BIGINT)"
}
