package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * so that a parquet scan filtered on ANY of the layout dimensions
  * skips most files/row-groups via their min/max statistics.
  *
  * A single-column sort gives tight file stats on that column only: a
  * predicate on the second column overlaps EVERY file. Interleaving
  * the bits of both columns (the Morton key) makes each contiguous
  * key range a compact rectangle in (x, y) space, so each written
  * file covers a small range of BOTH columns and a filter on either
  * one prunes most files — the layout trick behind multi-dimensional
  * clustering in modern lakehouse table formats, applied here with
  * plain Spark primitives.
  *
  * The bit interleave is pure long arithmetic (shift/AND/OR magic-
  * number bit spreading), built from codegen'd Spark SQL functions —
  * no UDF, stays inside whole-stage codegen. Values are masked to
  * their low 32 bits and must be non-negative for the curve to order
  * meaningfully (negative/larger domains: pre-rank to a 32-bit dense
  * rank first).
  *
  * At 100 TB the write is one range shuffle on the Morton key
  * (repartitionByRange gives non-overlapping per-file key ranges —
  * what makes per-file stats disjoint and pruning sharp), and the
  * payoff is permanent: every subsequent selective scan on either
  * dimension reads a fraction of the files. ZOrderSpec measures
  * exactly that with per-file min/max read back from the layout.
  */
object ZOrder {

  /** Spread the low 32 bits of `v` to the even bit positions 0,2,..62. */
  private def spread2(v: Column): Column = {
    val m0 = v.bitwiseAND(lit(0xFFFFFFFFL))
    val s1 = m0.bitwiseOR(shiftleft(m0, 16)).bitwiseAND(lit(0x0000FFFF0000FFFFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 8)).bitwiseAND(lit(0x00FF00FF00FF00FFL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 4)).bitwiseAND(lit(0x0F0F0F0F0F0F0F0FL))
    val s4 = s3.bitwiseOR(shiftleft(s3, 2)).bitwiseAND(lit(0x3333333333333333L))
    s4.bitwiseOR(shiftleft(s4, 1)).bitwiseAND(lit(0x5555555555555555L))
  }

  /** 2-D Morton key: x's bits at even positions, y's at odd. */
  def mortonKey2(x: Column, y: Column): Column =
    spread2(x).bitwiseOR(shiftleft(spread2(y), 1))

  /** Write `df` clustered on the Morton curve of (`xCol`, `yCol`)
    * into `numFiles` files with non-overlapping key ranges. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    outDir: String, numFiles: Int): Unit =
    df.withColumn("__z", mortonKey2(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
}
