package graft.streaming

import graft.etl.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Event-time windowed aggregation with a watermark over the decoded
  * package stream (SURVEY.md §2.4): tumbling per-mountpoint message
  * counts on receive_time, late rows beyond the watermark dropped,
  * finalized windows emitted append-mode — the streaming form of the
  * Q8 data-gap heatmap.
  */
final case class Pkg(mountpoint: String, receive_time: java.sql.Timestamp)

class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("windowed count with watermark finalizes windows and drops late data") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def ts(s: Long) = new java.sql.Timestamp((1704067200L + s) * 1000L)

    val input = MemoryStream[Pkg]
    // NB group by the window column itself — projecting window.start
    // before the agg detaches the watermark and append mode rejects it
    val agg = input.toDS()
      .withWatermark("receive_time", "30 seconds")
      .groupBy(window(col("receive_time"), "60 seconds"), col("mountpoint"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("bucket"), col("mountpoint"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two windows of data for mount A
      input.addData(Pkg("A", ts(5)), Pkg("A", ts(20)), Pkg("A", ts(70)))
      q.processAllAvailable()
      // batch 2: advance watermark past both windows (wm = 200-30 =
      // 170) → windows [0,60) and [60,120) finalize and emit
      input.addData(Pkg("A", ts(200)))
      q.processAllAvailable()
      // batch 3: a LATE row for the finalized [0,60) window (its
      // window end 60 < watermark 170 → dropped, never re-emitted)
      input.addData(Pkg("A", ts(10)), Pkg("A", ts(400)))
      q.processAllAvailable()

      val out = spark.table("wm_out")
        .select(unix_timestamp(col("bucket")).as("b"), col("n"))
        .collect().map(r => (r.getLong(0) - 1704067200L, r.getLong(1))).toMap
      // first window finalized with 2 rows — the late ts(10) row was
      // dropped, not merged
      assert(out(0L) == 2L)
      assert(out(60L) == 1L)
    } finally q.stop()
  }

  test("streaming exact dedup: dropDuplicatesWithinWatermark across batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp((1704067200L + s) * 1000L)

    val input = MemoryStream[Pkg]
    val dedup = input.toDS()
      .withWatermark("receive_time", "60 seconds")
      .dropDuplicatesWithinWatermark("mountpoint", "receive_time")
    val q = dedup.writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(Pkg("A", ts(1)), Pkg("A", ts(1)), Pkg("B", ts(2)))
      q.processAllAvailable()
      // duplicate of ("A", ts(1)) arriving in a LATER batch while the
      // key is still inside the watermark → suppressed by state
      input.addData(Pkg("A", ts(1)), Pkg("A", ts(30)))
      q.processAllAvailable()
      assert(spark.table("dd_out").count() == 3)
    } finally q.stop()
  }
}
