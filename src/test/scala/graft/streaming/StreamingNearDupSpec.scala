package graft.streaming

import java.sql.Timestamp

import graft.etl.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming near-dup suppression: a doc whose 3-shingle Jaccard with
  * any earlier-arrived doc (within the horizon) reaches the threshold
  * is dropped — across AND within micro-batches; unrelated docs and
  * band-colliding-but-dissimilar docs survive (exact verify). */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 40 words → 38 shingles; editing the LAST word changes exactly one
  // shingle → jac 37/39 ≈ 0.949 ≥ 0.9
  private val baseWords = (1 to 40).map(i => s"word$i")
  private val base = baseWords.mkString(" ")
  private val nearDup = (baseWords.dropRight(1) :+ "changed").mkString(" ")
  // ~half the words changed → jac far below 0.9
  private val farDoc = baseWords.zipWithIndex
    .map { case (w, i) => if (i % 2 == 0) s"other$i" else w }.mkString(" ")

  private def ts(min: Int, sec: Int = 0) =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("near-dups are suppressed across and within batches; dissimilar docs survive") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val kept = scala.collection.mutable.SortedSet.empty[Long]
    val q = StreamingNearDup.run(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes",
      horizonMs = 10 * 60 * 1000L) { batch =>
      kept ++= batch.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect()
    }
    try {
      // batch 1: base doc, an IN-BATCH near-dup of it, and a far doc
      input.addData((ts(0), 1L, base), (ts(0, 30), 2L, nearDup), (ts(1), 3L, farDoc))
      q.processAllAvailable()
      assert(kept.toSeq == Seq(1L, 3L), s"kept $kept")
      // batch 2: cross-batch near-dup of base + an unrelated doc + a
      // short doc (bypass path)
      input.addData(
        (ts(2), 4L, nearDup),
        (ts(2, 30), 5L, (1 to 40).map(i => s"fresh$i").mkString(" ")),
        (ts(3), 6L, "tiny doc"))
      q.processAllAvailable()
      assert(kept.toSeq == Seq(1L, 3L, 5L, 6L), s"kept $kept")
    } finally q.stop()
  }

  test("suppression is transitive through an already-suppressed doc (d07 semantics)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // A ~ B (1 edit), B ~ C (2 edits vs A: still ≥0.9 vs B) — C is
    // suppressed even though its suppressor B never emitted
    val a = base
    val b = (baseWords.dropRight(1) :+ "edit1").mkString(" ")
    val c = (baseWords.dropRight(2) ++ Seq("edit2", "edit1")).mkString(" ")
    val input = MemoryStream[(Timestamp, Long, String)]
    val kept = scala.collection.mutable.SortedSet.empty[Long]
    val q = StreamingNearDup.run(
      input.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes",
      horizonMs = 10 * 60 * 1000L) { batch =>
      kept ++= batch.select("doc_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
        .collect()
    }
    try {
      input.addData((ts(0), 1L, a))
      q.processAllAvailable()
      input.addData((ts(1), 2L, b))
      q.processAllAvailable()
      input.addData((ts(2), 3L, c))
      q.processAllAvailable()
      assert(kept.toSeq == Seq(1L), s"kept $kept")
    } finally q.stop()
  }

  test("bucket state survives a checkpointed restart: post-restart near-dups still suppressed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_nd_ckpt").toString
    val input = MemoryStream[(Timestamp, Long, String)]
    val kept = scala.collection.mutable.SortedSet.empty[Long]
    def start() = {
      val verdicts = StreamingNearDup.bandVerdicts(
        input.toDF().toDF("ts", "doc_id", "text"), "ts", "10 minutes",
        horizonMs = 10 * 60 * 1000L, threshold = 0.9)
      verdicts.toDF().writeStream
        .option("checkpointLocation", ckpt)
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          kept ++= batch.groupBy("doc_id")
            .agg(org.apache.spark.sql.functions.max("suppressed").as("s"))
            .filter(!org.apache.spark.sql.functions.col("s"))
            .select("doc_id").as[Long].collect()
          ()
        }
        .start()
    }
    val q1 = start()
    try {
      input.addData((ts(0), 1L, base))
      q1.processAllAvailable()
      assert(kept.toSeq == Seq(1L))
    } finally q1.stop()
    // restart from the checkpoint: the bucket shingle-set state must
    // come back, so a near-dup of the PRE-restart doc is suppressed
    val q2 = start()
    try {
      input.addData((ts(1), 2L, nearDup), (ts(2), 3L, farDoc))
      q2.processAllAvailable()
      assert(kept.toSeq == Seq(1L, 3L), s"kept $kept")
    } finally q2.stop()
  }
}
