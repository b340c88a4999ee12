package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming range join — the streaming analogue of the batch
  * operators.RangeJoin (r01): pair each left event with the right
  * events of the same key whose event time falls in
  * `[leftTs − before, leftTs + after]`.
  *
  * Executed as Spark's stream-stream inner join with BOTH sides
  * watermarked and the range stated as an event-time constraint.
  * That combination is what bounds state: the symmetric hash join
  * buffers each side only until the other side's watermark passes the
  * far edge of the range window, then evicts — state is
  * (rate × (watermark + range)) per side, independent of stream
  * length. An un-watermarked formulation would buffer both streams
  * forever; a processing-time formulation would give
  * non-reproducible pairs. Matches the batch RangeJoin's inclusive
  * bounds, so a replay of the same events through the streaming and
  * batch forms yields the SAME pair set (StreamingRangeJoinSpec
  * asserts the parity).
  *
  * The equi key is required: Spark hash-partitions both streams on
  * it, so the join parallelizes across executors exactly like the
  * batch bin join — each task sees one key slice of both streams.
  * (The batch form's time-bin key is unnecessary here: the watermark
  * plays the role the bin plays at rest.)
  */
object StreamingRangeJoin {

  /** `left` and `right` must have disjoint column names. Returns the
    * inner join of `left` and `right` on `leftKey = rightKey` with
    * `rightTs` in `[leftTs − beforeSec, leftTs + afterSec]`
    * (inclusive); both sides watermarked by `watermark`.
    */
  def within(left: DataFrame, right: DataFrame,
             leftKey: String, rightKey: String,
             leftTs: String, rightTs: String,
             beforeSec: Long, afterSec: Long,
             watermark: String): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $beforeSec SECONDS") &&
          col(rightTs) <= col(leftTs) + expr(s"INTERVAL $afterSec SECONDS"))
}
