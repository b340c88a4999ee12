package graft.streaming

import java.sql.Timestamp

import graft.etl.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming retention == batch w06: aggregating the hit stream per
  * (cohort_day, offset) reproduces the batch distinct-user counts on
  * the same corpus, with arrival deliberately out of event-time
  * order (the cohort must still be the user's global first day).
  */
class StreamingRetentionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(day: Int, sec: Int) = Timestamp.from(
    Timestamp.valueOf("2024-01-01 00:00:00").toInstant
      .plusSeconds(day * 86400L + sec))

  test("out-of-order hit stream aggregates to the batch w06 counts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the MoreAnalyticsSpec w06 fixture: user 1 active days 0,0,1,7;
    // user 2 days 0,2 (2 untracked); user 3 days 1,2,15
    val corpus = Seq(
      (1L, 0, 10), (1L, 0, 20), (1L, 1, 5), (1L, 7, 0),
      (2L, 0, 30), (2L, 2, 0),
      (3L, 1, 0), (3L, 2, 0), (3L, 15, 0))
    val input = MemoryStream[(Timestamp, Long, String)]
    val hits = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    // the corpus is delivered up to 15 days out of event-time order,
    // so the watermark delay must cover that disorder — anything
    // later than the watermark is (correctly) dropped as late
    val q = StreamingRetention.run(
      input.toDF().toDF("ts", "user_id", "event_type"), "ts", "20 days",
      idleEvictMs = 100L * 86400L * 1000L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingRetention.RetentionHit], _: Long) =>
        hits ++= b.collect().map(h => (h.user_id, h.cohort_day, h.offset)); ()
      }.start()
    try {
      // later days arrive FIRST; the cohort must still be the min day
      input.addData(corpus.filter(_._2 > 0)
        .map { case (u, d, s) => (ts(d, s), u, "view") }: _*)
      q.processAllAvailable()
      input.addData(corpus.filter(_._2 == 0)
        .map { case (u, d, s) => (ts(d, s), u, "view") }: _*)
      q.processAllAvailable()
      // sentinel advances the watermark past the corpus
      input.addData((ts(40, 0), 99L, "view"))
      q.processAllAvailable()
      input.addData((ts(80, 0), 99L, "view"))
      q.processAllAvailable()
      val day0 = ts(0, 0).toInstant.toEpochMilli / 86400000L
      val agg = hits.filter(_._1 != 99L)
        .groupBy(h => (h._2 - day0, h._3)).map { case (k, v) => (k._1, k._2, v.size.toLong) }
        .toSeq.sorted
      // batch w06 on this corpus (MoreAnalyticsSpec):
      assert(agg == Seq(
        (0L, 0L, 2L), (0L, 1L, 1L), (0L, 7L, 1L),
        (1L, 0L, 1L), (1L, 1L, 1L), (1L, 14L, 1L)), s"agg=$agg hits=$hits")
      // at-most-once per (user, cohort, offset)
      assert(hits.size == hits.distinct.size)
    } finally q.stop()
  }
}
