package graft.streaming

import java.sql.Timestamp

import graft.etl.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingRangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("stream-stream range join matches the batch pair set across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val anchors = MemoryStream[(Timestamp, Long, Long)]
    val points = MemoryStream[(Timestamp, Long, Long)]
    val joined = StreamingRangeJoin.within(
      anchors.toDF().toDF("a_ts", "a_key", "a_id"),
      points.toDF().toDF("p_ts", "p_key", "p_id"),
      "a_key", "p_key", "a_ts", "p_ts",
      beforeSec = 60, afterSec = 60, watermark = "2 minutes")
    val q = joined.select("a_id", "p_id")
      .writeStream.format("memory").queryName("srj_out")
      .outputMode(OutputMode.Append).start()

    val aRows = Seq((ts(10), 1L, 100L), (ts(20), 1L, 101L), (ts(20), 2L, 102L))
    val pRows = Seq(
      (ts(9, 30), 1L, 200L),  // 30 s before anchor 100 → pair
      (ts(11), 1L, 201L),     // 60 s after  anchor 100 → pair (inclusive)
      (ts(12), 1L, 202L),     // 2 min after → no pair
      (ts(19), 2L, 203L),     // right key-2 window of anchor 102 → pair
      (ts(19), 3L, 204L))     // no matching key
    try {
      // interleave arrival across micro-batches, points first so the
      // join buffers them until the matching anchors arrive
      points.addData(pRows.take(2))
      anchors.addData(aRows.take(1))
      points.addData(pRows.drop(2))
      anchors.addData(aRows.drop(1))
      q.processAllAvailable()

      val got = spark.table("srj_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for ((ats, ak, aid) <- aRows; (pts2, pk, pid) <- pRows
                       if ak == pk &&
                         math.abs(pts2.getTime - ats.getTime) <= 60000L)
        yield (aid, pid)).toSet
      assert(want.nonEmpty && got == want)
    } finally q.stop()
  }

  test("watermark bounds the buffered state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val anchors = MemoryStream[(Timestamp, Long, Long)]
    val points = MemoryStream[(Timestamp, Long, Long)]
    val joined = StreamingRangeJoin.within(
      anchors.toDF().toDF("a_ts", "a_key", "a_id"),
      points.toDF().toDF("p_ts", "p_key", "p_id"),
      "a_key", "p_key", "a_ts", "p_ts",
      beforeSec = 60, afterSec = 60, watermark = "2 minutes")
    val q = joined.select("a_id", "p_id")
      .writeStream.format("memory").queryName("srj_state_out")
      .outputMode(OutputMode.Append).start()
    try {
      points.addData((ts(0), 1L, 1L), (ts(1), 1L, 2L))
      anchors.addData((ts(0), 1L, 10L))
      q.processAllAvailable()
      // advance BOTH watermarks far past the old rows (+ range + delay)
      points.addData((ts(50), 1L, 3L))
      anchors.addData((ts(50), 1L, 11L))
      q.processAllAvailable()
      // one more batch so eviction from the advanced watermark lands
      points.addData((ts(52), 1L, 4L))
      anchors.addData((ts(52), 1L, 12L))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators.asScala.map(_.numRowsTotal).sum
      // only the recent rows may remain buffered; the minute-0 rows
      // must have been evicted (un-watermarked joins keep everything)
      assert(state <= 6, s"state not bounded: $state rows buffered")
    } finally q.stop()
  }

  private implicit class ArrOps[T](a: Array[T]) { def asScala: Seq[T] = a.toSeq }
}
