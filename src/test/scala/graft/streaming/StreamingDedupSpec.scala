package graft.streaming

import java.sql.Timestamp

import graft.etl.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming exact dedup: duplicates within the watermark horizon are
  * dropped across micro-batches; dedup state is keyed on the content
  * hash and evicted by the watermark (bounded state). */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("cross-batch duplicates within the watermark emit once") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamingDedup.dedupByContent(
      input.toDF().toDF("ts", "text"), "ts", "10 minutes")
    val q = deduped.writeStream.format("memory").queryName("sdedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
      // batch 1: two distinct texts, one in-batch duplicate
      input.addData((ts(0), "alpha"), (ts(1), "beta"), (ts(2), "alpha"))
      q.processAllAvailable()
      // batch 2: cross-batch duplicate (within horizon) + one new text
      input.addData((ts(3), "beta"), (ts(4), "gamma"))
      q.processAllAvailable()
      val texts = spark.table("sdedup_out").select("text")
        .as[String].collect().sorted.toSeq
      assert(texts == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("state is keyed on the 64-bit hash, not the payload") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val deduped = StreamingDedup.dedupByContent(
      input.toDF().toDF("ts", "text"), "ts", "10 minutes")
    // the dedup key column set is exactly the hash — the plan's
    // keyWithoutWatermark must not include the text payload
    val plan = deduped.queryExecution.analyzed.toString
    assert(plan.contains("content_hash"), plan.take(500))
    val q = deduped.writeStream.format("memory").queryName("sdedup_key_out")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData((Timestamp.valueOf("2024-01-01 10:00:00"), "x" * 10000))
      q.processAllAvailable()
      assert(spark.table("sdedup_key_out").count() == 1)
    } finally q.stop()
  }
}
