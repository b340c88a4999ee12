package graft.streaming

import java.sql.Timestamp

import graft.etl.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel == batch w07 contract: stage hits carry exactly
  * the event times the batch min-based query computes, even when
  * events arrive OUT of event-time order across micro-batches —
  * folding is deferred until the watermark passes an event.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(sec: Int) = Timestamp.from(
    Timestamp.valueOf("2024-01-01 10:00:00").toInstant.plusSeconds(sec))

  /** The batch w07 stage-time contract, computed directly. */
  private def batchStageTimes(evs: Seq[(Long, String, Long)]): Set[(Long, String, Long)] = {
    val byUser = evs.groupBy(_._1)
    byUser.flatMap { case (u, rows) =>
      val tv = rows.filter(_._2 == "view").map(_._3).minOption
      val tc = tv.flatMap(v =>
        rows.filter(r => r._2 == "click" && r._3 > v).map(_._3).minOption)
      val tp = tc.flatMap(c =>
        rows.filter(r => r._2 == "purchase" && r._3 > c).map(_._3).minOption)
      tv.map((u, "view", _)) ++ tc.map((u, "click", _)) ++ tp.map((u, "purchase", _))
    }.toSet
  }

  test("out-of-order arrival within the watermark matches the batch funnel exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (user, type, sec): user 1 full funnel; user 2's click precedes
    // its first view (never qualifies); user 3's click ties the view
    // timestamp (strict > fails)
    val corpus = Seq(
      (1L, "view", 0), (1L, "click", 30), (1L, "purchase", 60),
      (2L, "click", 0), (2L, "view", 10), (2L, "purchase", 50),
      (3L, "view", 0), (3L, "click", 0))
    val input = MemoryStream[(Timestamp, Long, String)]
    val hits = scala.collection.mutable.Set.empty[(Long, String, Long)]
    val q = StreamingFunnel.run(
      input.toDF().toDF("ts", "user_id", "event_type"), "ts", "2 minutes",
      idleEvictMs = 60 * 60 * 1000L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingFunnel.StageHit], _: Long) =>
        hits ++= b.collect().map(h => (h.user_id, h.stage, h.us)); ()
      }.start()
    try {
      // deliver DELIBERATELY out of event-time order, split across
      // batches: the clicks and purchases first, views later
      input.addData(corpus.filter(_._2 != "view")
        .map { case (u, t, s) => (ts(s), u, t) }: _*)
      q.processAllAvailable()
      input.addData(corpus.filter(_._2 == "view")
        .map { case (u, t, s) => (ts(s), u, t) }: _*)
      q.processAllAvailable()
      assert(hits.isEmpty, "nothing may fold before the watermark moves")
      // sentinel far ahead advances the watermark past the corpus;
      // 'signup' never matches a stage
      input.addData((ts(3600), 99L, "signup"))
      q.processAllAvailable()
      input.addData((ts(7200), 99L, "signup"))
      q.processAllAvailable()
      val expected = batchStageTimes(
        corpus.map { case (u, t, s) =>
          (u, t, ts(s).toInstant.toEpochMilli * 1000L) })
      assert(hits.toSet == expected, s"hits=$hits expected=$expected")
    } finally q.stop()
  }

  test("idle eviction folds the remaining buffer before dropping state") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val hits = scala.collection.mutable.Set.empty[(Long, String)]
    val q = StreamingFunnel.run(
      input.toDF().toDF("ts", "user_id", "event_type"), "ts", "1 minutes",
      idleEvictMs = 5 * 60 * 1000L)
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[StreamingFunnel.StageHit], _: Long) =>
        hits ++= b.collect().map(h => (h.user_id, h.stage)); ()
      }.start()
    try {
      input.addData((ts(0), 1L, "view"), (ts(10), 1L, "click"))
      q.processAllAvailable()
      // push the watermark beyond lastEvent + idleEvictMs: the timeout
      // path must fold the buffered view+click, then evict
      input.addData((ts(1200), 99L, "signup"))
      q.processAllAvailable()
      input.addData((ts(2400), 99L, "signup"))
      q.processAllAvailable()
      assert(hits.toSet == Set((1L, "view"), (1L, "click")), s"hits=$hits")
    } finally q.stop()
  }
}
