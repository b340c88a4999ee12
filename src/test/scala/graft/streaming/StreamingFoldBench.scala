package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Watermark-ordered-fold throughput (dev tool): replays the events
  * table in event-time order through [[StreamingFunnel]] and
  * [[StreamingRetention]] and reports sustained events/s plus the
  * emission counts. Arrival order is event-time order here, so the
  * watermark lags one micro-batch and every batch folds the previous
  * one — the steady-state regime of an ingest pipeline.
  *
  * Run: sbt "Test/runMain graft.streaming.StreamingFoldBench [sfDir] [batchSize]"
  */
object StreamingFoldBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val batchSize = args.lift(1).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = graft.Tables.load(spark, sfDir, "events")
      .selectExpr("cast(ts as timestamp) as ts", "user_id", "event_type")
      .as[(Timestamp, Long, String)].collect().sortBy(_._1.getTime)
    println(s"[foldbench] corpus: ${events.length} events from $sfDir")
    if (events.isEmpty) { println("[foldbench] empty corpus — nothing to drive"); spark.stop(); return }

    def drive(name: String,
              run: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_]): Unit = {
      val input = MemoryStream[(Timestamp, Long, String)]
      val hits = new AtomicLong()
      val q = run(input.toDF().toDF("ts", "user_id", "event_type"))
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[_], _: Long) =>
          // the flush sentinel (user -1) emits retention hits of its
          // own (step ignores the tag) — keep it out of the count
          hits.addAndGet(b.toDF()
            .filter(org.apache.spark.sql.functions.col("user_id") =!= -1L).count()); ()
        }.start()
      val t0 = System.nanoTime()
      try {
        events.grouped(batchSize).foreach { chunk =>
          input.addData(chunk.toSeq)
          q.processAllAvailable()
        }
        // flush: sentinel a day past the corpus advances the watermark
        val last = events.last._1.getTime
        input.addData((new Timestamp(last + 86400000L), -1L, "flush"))
        q.processAllAvailable()
        input.addData((new Timestamp(last + 2 * 86400000L), -1L, "flush"))
        q.processAllAvailable()
      } finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[foldbench] $name: ${events.length} events in $secs%.1f s = " +
        f"${events.length / secs}%.0f events/s; ${hits.get()} emissions")
    }

    drive("funnel", df => StreamingFunnel.run(df, "ts", "10 minutes", 3600000L))
    drive("retention", df => StreamingRetention.run(df, "ts", "10 minutes", 3600000L))
    spark.stop()
  }
}
