package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join: pair every point `p` with every interval
  * `[lo, hi]` that contains it, WITHOUT a nested-loop plan.
  *
  * Spark plans a bare `p BETWEEN lo AND hi` join (no equi key) as
  * BroadcastNestedLoopJoin or a cartesian product — O(|L|·|R|)
  * comparisons and a broadcast/replication wall that dies at scale.
  * The standard fix (the bin technique behind range-join hints and
  * the interval join of stream processors) turns the range predicate
  * into an equi join on a fixed-width bin:
  *
  *  - each point owns exactly one bin: `floorDiv(p, w)`;
  *  - each interval replicates to every bin it overlaps:
  *    `sequence(floorDiv(lo, w), floorDiv(hi, w))` — ⌈len/w⌉+1 rows;
  *  - join on the bin, then re-check `p BETWEEN lo AND hi`.
  *
  * Each qualifying (interval, point) pair meets EXACTLY once — the
  * point has one bin, and the interval covers that bin exactly once —
  * so no post-join dedup is needed. Cost: one shuffle on the bin key
  * (or a broadcast-hash join when a side fits), interval replication
  * factor ⌈len/w⌉+1, and only same-bin pairs are compared. The bin
  * width trades replication against in-bin selectivity; callers pass
  * `w ≈` the typical interval length so replication is ~2×.
  *
  * At 100 TB this is shuffle-partitioned by bin — time-local data is
  * bin-local, so the join parallelizes over the full timeline; a
  * skewed hot bin splits under AQE skew-join like any equi join
  * (which is precisely what the nested-loop plan can't do).
  *
  * Bin arithmetic is exact integer floor division over the FULL long
  * range (no doubles): `(x - ((x % w + w) % w)) div w` — the
  * numerator is an exact multiple of w, so `div`'s truncation is the
  * exact quotient, and the non-negative remainder makes it a floor
  * for negative x (pre-1970 timestamps bin correctly).
  */
object RangeJoin {

  /** Exact floor division of integral column `x` by positive `w`,
    * as a SQL expression (pure long arithmetic, no doubles). */
  def floorDivExpr(x: String, w: Long): Column =
    expr(s"(($x) - (((($x) % $w) + $w) % $w)) div $w")

  /** Join `points` to `intervals` on `points(pointCol) BETWEEN
    * intervals(loCol) AND intervals(hiCol)` (inclusive), with bin
    * width `w`. The three columns must be integral (e.g. epoch
    * micros) and name-distinct from the other side's columns.
    * Returns interval columns ++ point columns.
    */
  def pointInInterval(intervals: DataFrame, points: DataFrame,
                      loCol: String, hiCol: String, pointCol: String,
                      w: Long): DataFrame = {
    require(w > 0, s"bin width must be positive, got $w")
    val binned = points.withColumn("__rj_bin", floorDivExpr(pointCol, w))
    val expanded = intervals.withColumn("__rj_bin",
      explode(sequence(floorDivExpr(loCol, w), floorDivExpr(hiCol, w))))
    expanded.join(binned, "__rj_bin")
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__rj_bin")
  }

  /** Join `left` to `right` on interval overlap:
    * `left.[lo1, hi1] ∩ right.[lo2, hi2] ≠ ∅` (inclusive ends, i.e.
    * `lo1 <= hi2 AND lo2 <= hi1`), as a binned equi join.
    *
    * Both sides replicate to every bin they cover. An overlapping
    * pair shares EVERY bin of the overlap region, so naive bin-join
    * would emit it once per shared bin; the ownership rule keeps
    * exactly one copy: a pair is counted only in the bin holding the
    * overlap's START, `max(lo1, lo2)`. That instant lies inside BOTH
    * intervals (it is ≥ each lo, and ≤ each hi because the overlap is
    * non-empty), so both sides replicated into its bin exactly once —
    * every qualifying pair survives in exactly one bin, no dedup
    * shuffle needed.
    *
    * Cost: one shuffle on the bin key; replication ⌈len/w⌉+1 per row
    * on each side. Pick `w ≈` the typical interval length.
    * Column names must be distinct across the two sides.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
                      lo1: String, hi1: String, lo2: String, hi2: String,
                      w: Long): DataFrame = {
    require(w > 0, s"bin width must be positive, got $w")
    val lx = left.withColumn("__rj_bin",
      explode(sequence(floorDivExpr(lo1, w), floorDivExpr(hi1, w))))
    val rx = right.withColumn("__rj_bin",
      explode(sequence(floorDivExpr(lo2, w), floorDivExpr(hi2, w))))
    lx.join(rx, "__rj_bin")
      .where(col(lo1) <= col(hi2) && col(lo2) <= col(hi1) &&
        floorDivExpr(s"greatest($lo1, $lo2)", w) === col("__rj_bin"))
      .drop("__rj_bin")
  }
}
