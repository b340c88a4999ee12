package graft.streaming

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming near-dup suppression throughput (dev tool): replays a
  * documents corpus through MemoryStream micro-batches into
  * [[StreamingNearDup.run]] and reports sustained docs/s plus the
  * suppression ratio. Use a SALTED corpus (gen_sf.py … salt) so the
  * planted near-dup clusters are real and cross-replica copies are
  * honest non-duplicates.
  *
  * Run: sbt "Test/runMain graft.streaming.StreamingNearDupBench [sfDir] [batchSize]"
  */
object StreamingNearDupBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/sfdata/sf1s")
    val batchSize = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    println(s"[ndbench] corpus: ${docs.length} docs from $sfDir")

    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val input = MemoryStream[(Timestamp, Long, String)]
    val kept = new AtomicLong()
    val q = StreamingNearDup.run(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "30 minutes",
      horizonMs = 30 * 60 * 1000L) { batch =>
      kept.addAndGet(batch.count())
      ()
    }
    val t0 = System.nanoTime()
    try {
      docs.grouped(batchSize).zipWithIndex.foreach { case (chunk, bi) =>
        input.addData(chunk.zipWithIndex.map { case ((id, text), i) =>
          (new Timestamp(base + bi.toLong * batchSize + i), id, text)
        }.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    val total = docs.length
    println(f"[ndbench] $total docs in $secs%.1f s = ${total / secs}%.0f docs/s; " +
      f"kept ${kept.get()} (suppressed ${total - kept.get()}, " +
      f"${100.0 * (total - kept.get()) / total}%.1f%%), batches of $batchSize")
    spark.stop()
  }
}
