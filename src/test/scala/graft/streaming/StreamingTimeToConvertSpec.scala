package graft.streaming

import java.sql.Timestamp

import graft.etl.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming time-to-convert == the batch w13 per-user contract:
  * exactly one (first view, first STRICTLY-later purchase) conversion
  * per qualifying user, emitted with the batch values even when
  * events arrive out of event-time order across micro-batches.
  */
class StreamingTimeToConvertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(sec: Int) = Timestamp.from(
    Timestamp.valueOf("2024-01-01 10:00:00").toInstant.plusSeconds(sec))
  private def us(sec: Int) = ts(sec).toInstant.toEpochMilli * 1000L

  test("out-of-order arrival matches the batch (min view, first qualifying purchase) pairs") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // user 1: pre-view purchase must NOT qualify; the post-view one does
    // user 2: two qualifying purchases — only the FIRST emits
    // user 3: purchase ties the view timestamp (strict > fails): never converts
    // user 4: view only: never converts
    val corpus = Seq(
      (1L, "purchase", 5), (1L, "view", 10), (1L, "purchase", 70),
      (2L, "view", 0), (2L, "purchase", 40), (2L, "purchase", 90),
      (3L, "view", 20), (3L, "purchase", 20),
      (4L, "view", 30))
    val input = MemoryStream[(Timestamp, Long, String)]
    val got = scala.collection.mutable.Set.empty[(Long, Long, Long)]
    val q = StreamingTimeToConvert.run(
      input.toDF().toDF("ts", "user_id", "event_type"), "ts", "2 minutes",
      idleEvictMs = 60 * 60 * 1000L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingTimeToConvert.Conversion], _: Long) =>
        got ++= b.collect().map(c => (c.user_id, c.tv, c.tp)); ()
      }.start()
    try {
      // purchases first, views later — disorder within the watermark
      input.addData(corpus.filter(_._2 == "purchase")
        .map { case (u, t, s) => (ts(s), u, t) }: _*)
      q.processAllAvailable()
      input.addData(corpus.filter(_._2 == "view")
        .map { case (u, t, s) => (ts(s), u, t) }: _*)
      q.processAllAvailable()
      assert(got.isEmpty, "nothing may fold before the watermark moves")
      input.addData((ts(3600), 99L, "signup"))
      q.processAllAvailable()
      input.addData((ts(7200), 99L, "signup"))
      q.processAllAvailable()
      assert(got.toSet == Set(
        (1L, us(10), us(70)),
        (2L, us(0), us(40))), s"got=$got")
    } finally q.stop()
  }
}
