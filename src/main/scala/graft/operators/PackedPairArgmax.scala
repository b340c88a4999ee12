package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Per-key argmax over pair occurrence counts — for each distinct `a`,
  * the `b` it co-occurs with most often (ties to the SMALLEST `b`),
  * computed without ever materializing the pair-count table.
  *
  * This is the g06 packed-long lesson applied one step further. The
  * declarative form — groupBy(a, b).count then groupBy(a).max(struct)
  * — builds partial AND final hash-aggregate maps over the pair
  * cardinality, which for near-unique pairs reduces nothing and
  * double-builds giant maps (t17 at sf10: 734 M joined rows →
  * ~0.5 B distinct pairs; the pair agg alone cost 71 s of the 126 s
  * query). Here each (a, b) packs into ONE long (a in the high 32
  * bits, b in the low 31), the raw longs take a single a-keyed
  * exchange, Spark's SPILLABLE external sort orders each partition
  * (8-byte rows, radix-sorted, never resident), and a streaming fold
  * run-lengths consecutive equal keys and keeps the per-`a` argmax in
  * O(1) task memory — no buffering, no aggregate map. Sorted order
  * gives b ascending within each a, so strict-greater keeps the
  * smallest b on count ties. Measured (BENCH_NOTES round 12): full
  * t17 126 s → 56 s at sf10 from the kernel, → 44 s once the kernel
  * exchange was sized at 4× the session parallelism (below), ahead of
  * the single-node baseline's 64.8 s; an array-buffering variant of
  * the same fold OOMs the 8g bench heap at this fan-out, which is why
  * the sort is delegated to Spark's spill-aware machinery rather than
  * done in the task.
  *
  * At 100 TB the same plan holds: one shuffle of 8-byte rows,
  * per-task external sort, constant-memory fold. A single hot `a`
  * concentrates its rows in one partition, but they stream through
  * the fold — the skew cost is the sort's spill, not task memory.
  *
  * Contract: 0 ≤ a < 2³², 0 ≤ b < 2³¹ (the pack layout). Violations
  * raise a named error row-side (codegen'd branch in the pack
  * projection) rather than corrupting keys silently.
  */
object PackedPairArgmax {

  /** `pairs`: one row per (a, b) occurrence (integral columns).
    * Returns (`outA`, `outB`, `outCnt`) = (a, argmax b, its count),
    * one row per distinct a, unordered. */
  def apply(pairs: DataFrame, aCol: String, bCol: String,
            outA: String, outB: String, outCnt: String): DataFrame = {
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    // isNull is part of the guard: a null key would otherwise make the
    // WHEN condition null, fall through to a null packed key, and die
    // later in Dataset[Long] deserialization with an NPE that names
    // neither the operator nor the column
    val guarded = when(
      a.isNull || b.isNull ||
        a < 0L || a >= (1L << 32) || b < 0L || b >= (1L << 31),
      raise_error(concat(lit("PackedPairArgmax contract: need non-null 0 <= "),
        lit(s"$aCol < 2^32 and 0 <= $bCol < 2^31, got ("),
        coalesce(a.cast("string"), lit("null")), lit(", "),
        coalesce(b.cast("string"), lit("null")), lit(")"))))
      .otherwise(shiftleft(a, 31) + b)
    // 4× the session's shuffle parallelism: partition count does not
    // change how many sorts run CONCURRENTLY (that's the core count),
    // it divides each one's footprint — at sf10 the 32-partition form
    // left 32 full-width concurrent sorter reservations racing the
    // surrounding plan's consumers for the pool and intermittently
    // died in UNABLE_TO_ACQUIRE_MEMORY; quartering the per-task
    // working set removes the contention without touching the plan
    // shape. At cluster scale this is the standard "shuffle partitions
    // ≫ cores" sizing rule, applied where the operator knows its
    // exchange is the wide one.
    val parts = 4 * pairs.sparkSession.sessionState.conf.numShufflePartitions
    pairs
      .select(guarded.as("pk"))
      .as[Long](Encoders.scalaLong)
      .repartition(parts, shiftright(col("pk"), 31))
      .sortWithinPartitions(col("pk"))
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long)] {
          private var cur = 0L
          private var done = {
            if (it.hasNext) { cur = it.next(); false } else true
          }
          override def hasNext: Boolean = !done
          override def next(): (Long, Long, Long) = {
            val key = cur >>> 31
            var bestB = -1L
            var bestC = 0L
            var inKey = true
            while (inKey) {
              val k0 = cur
              var c = 1L
              var run = true
              while (run) {
                if (it.hasNext) {
                  cur = it.next()
                  if (cur == k0) c += 1 else run = false
                } else { done = true; run = false }
              }
              if (c > bestC) { bestC = c; bestB = k0 & ((1L << 31) - 1) }
              if (done || (cur >>> 31) != key) inKey = false
            }
            (key, bestB, bestC)
          }
        }
      }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF(outA, outB, outCnt)
  }
}
