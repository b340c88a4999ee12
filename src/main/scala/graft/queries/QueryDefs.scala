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
  /** Cost probe for the ordered-output plan choices (Dashboard
    * `orderedOut`/`sortedSmallOut`, w02): scanned fact bytes from the
    * optimized plan's file-index stats — driver-side parquet metadata,
    * no job. Above the threshold the input range-partition / staged-
    * shuffle forms win; below it their sampling or extra stage is pure
    * overhead against a small result (the round-10 cold-sf0.1
    * regression). Filters don't shrink the stat without CBO, which
    * errs toward the scale-safe plan. */
  val rangeInputMinBytes: Long = 64L << 20
  def bigInput(in: DataFrame): Boolean =
    in.sparkSession.conf.getOption(forceBigKey) match {
      // test/gate override: the sf-scaled gate data never crosses the
      // byte threshold, so without this the big-input branches (input
      // range partition ≡ total order, w02 range form, custDim merge
      // hint) would ship oracle-UNVERIFIED — the *_bigpath gate twins
      // force the branch and hash against the same SQL
      case Some("true")  => true
      case Some("false") => false
      case _ =>
        in.queryExecution.optimizedPlan.stats.sizeInBytes >= rangeInputMinBytes
    }
  val forceBigKey = "spark.graft.forceBigInput"

  /** Gate twin of a cost-based query with the big-input branch pinned
    * on: the branch choice is taken at BUILD time (every bigInput
    * caller resolves it while constructing the plan), so pinning the
    * conf for the build fixes the plan and the returned frame can be
    * lazily executed afterwards. The pin lives on a CLONED session
    * (`newSession`: shared context, cache and extensions; isolated
    * conf), not a set/unset window on the caller's session — a sibling
    * query built concurrently on `s` could otherwise observe the pin
    * and silently take the big-input branch. */
  def forcedBig(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => {
      val pinned = s.newSession()
      pinned.conf.set(forceBigKey, "true")
      f(pinned, d)
    }

  /** (c · 2654435761) mod 2³² — the Knuth multiplicative order/split
    * key used by the sampling / mixture / shard / split operators —
    * computed OVERFLOW-SAFE under Spark's default ANSI mode: the naive
    * single multiply raises ARITHMETIC_OVERFLOW for c ≳ 3.47e9
    * (c·M ≥ 2⁶³), which would contradict the operators' "works past
    * 2³² docs" ordering contract with a crash at exactly the scale the
    * contract is about. Identity (M = 40503·2¹⁶ + 31153; multiplication
    * mod 2³² factors through c mod 2³²): with d = c mod 2³²,
    *   (c·M) mod 2³² = ((d·40503 mod 2¹⁶)·2¹⁶ + d·31153) mod 2³²
    * — every intermediate < 2⁴⁸, no overflow for any long c ≥ 0.
    * Value-identical to the naive form wherever that form evaluates,
    * so the (doc_id·2654435761)%4294967296 oracle SQL states the same
    * key (DuckDB's 128-bit multiply never overflows at oracle scale). */
  def knuth32(c: Column): Column = {
    val d = pmod(c, lit(4294967296L))
    pmod(pmod(d * lit(40503L), lit(65536L)) * lit(65536L) + d * lit(31153L),
      lit(4294967296L))
  }

  /** Tumbling window start, as epoch seconds. Equivalent DuckDB SQL:
    * CAST(floor(epoch(ts)/S)*S AS BIGINT). */
  def bucket(ts: Column, secs: Long): Column =
    (floor(unix_timestamp(ts) / secs) * secs).cast(LongType)

  def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))

  /** OUTPUT-COLUMN decimal: exact fixed-point arithmetic, then a final
    * DOUBLE cast. The verify gate canonicalizes result cells as floats,
    * so a DECIMAL output's trailing zero at scale ("94201.00") would
    * hash differently from the float form ("94201.0") even though the
    * values are identical. Both engines convert the same exact decimal
    * to the same nearest double, so a final CAST(x AS DOUBLE) on BOTH
    * sides is representation-proof. Every query's *final* decimal
    * column must go through decd/dsum/fixedDec/davg (all DOUBLE-final);
    * intermediates may stay decimal. */
  def decd(c: Column, p: Int, s: Int): Column =
    c.cast(DecimalType(p, s)).cast(DoubleType)

  def decdSql(x: String, p: Int, s: Int): String =
    s"CAST(CAST($x AS DECIMAL($p,$s)) AS DOUBLE)"

  /** Exact decimal sum: equivalent to SQL
    * CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DECIMAL(p,s)), but summed as
    * scaled longs — a primitive codegen sum instead of per-row
    * BigDecimal — then rescaled. Identical values (both paths are
    * exact integer arithmetic on round(x·10^s)); ~3-4× faster on wide
    * aggregations. Overflow bound: |Σ x·10^s| < 2^63 (~9e18). */
  def dsum(c: Column, p: Int, s: Int): Column = {
    val scale = math.pow(10, s)
    // scaledLong = codegen'd round(c·10^s) (value-identical, no
    // per-row BigDecimal); divide by an INTEGER literal: decimal /
    // double would fall back to double division and lose the
    // exactness this exists for
    (sum(graft.functions.GraftFunctions.scaledLong(c, s)).cast(DecimalType(38, 0)) /
      lit(scale.toLong)).cast(DecimalType(p, s)).cast(DoubleType)
  }

  /** Exact round-half-away-from-zero of (S·mul)/C for integer S
    * (possibly negative) and C > 0, computed with the integer identity
    * n = sign(S)·⌊(2·|S|·mul + C) / (2·C)⌋ in double arithmetic —
    * exact while 2·|S|·mul < 2^53. This replaces ROUND(double, s)
    * for count-divided averages: a quotient with a power-of-two
    * denominator can be EXACTLY a decimal tie in double, and the
    * engines break ties differently (Spark half-up, DuckDB
    * half-even). */
  def rhu(s: Column, c: Column, mul: Long): Column =
    (signum(s) * floor((abs(s).cast(DoubleType) * (2L * mul) + c) /
      (c.cast(DoubleType) * 2))).cast(LongType)

  def rhuSql(s: String, c: String, mul: Long): String =
    s"CAST(SIGN($s) * FLOOR((ABS($s) * ${2 * mul} + ($c)) / (($c) * 2)) AS BIGINT)"

  /** Fixed-point value from an integer numerator at `outScale`, final
    * DOUBLE (see decd for why outputs must not stay DECIMAL). */
  def fixedDec(n: Column, outScale: Int): Column =
    (n.cast(DecimalType(38, 0)) / lit(math.pow(10, outScale).toLong))
      .cast(DecimalType(18, outScale)).cast(DoubleType)

  def fixedDecSql(n: String, outScale: Int): String =
    s"CAST(CAST(CAST($n AS DECIMAL(38,0)) / ${math.pow(10, outScale).toLong} AS DECIMAL(18,$outScale)) AS DOUBLE)"

  /** Order-insensitive exact "average" of a 2-dp-exact column, exact
    * at 6 decimals (scaled-long sum, integer round-half-up division by
    * the count), emitted as DOUBLE via fixedDec. */
  def davg(c: Column): Column = {
    val s = sum(graft.functions.GraftFunctions.scaledLong(c, 4))
    fixedDec(rhu(s, count(c), 100), 6)
  }

  /** SQL fragment for davg over expression `x` (DuckDB side). */
  def davgSql(x: String): String = {
    val s = s"SUM(CAST(ROUND(($x) * 10000, 0) AS BIGINT))"
    fixedDecSql(rhuSql(s, s"COUNT($x)", 100), 6)
  }

  def dsumSql(x: String, p: Int, s: Int): String =
    s"CAST(CAST(SUM(CAST(($x) AS DECIMAL($p,$s))) AS DECIMAL($p,$s)) AS DOUBLE)"

  def bucketSql(ts: String, secs: Long): String =
    s"CAST(floor(epoch($ts)/$secs)*$secs AS BIGINT)"
}
