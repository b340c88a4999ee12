package graft.operators

import graft.etl.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The persisted decontamination index's incremental contract: an
  * index built on eval set A then APPENDED with eval set B must
  * produce the same overlap report as a fresh build over A∪B — the
  * benchmark-onboarding guarantee a static-eval-side design rests on.
  * Also asserts the anti-join keeps the gram store duplicate-free.
  */
class DecontamIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("append(B) after build(A) == fresh build(A ∪ B); gram store stays duplicate-free") {
    // eval A and B share the gram "q r s" — the dedupe case
    val evalA = docs(Seq((100L, "a b c d"), (101L, "q r s t")))
    val evalB = docs(Seq((200L, "q r s u"), (201L, "x y z w")))
    // train docs overlapping A-only, B-only, both, and neither grams
    val train = docs(Seq(
      (1L, "a b c d e"),   // hits A's grams
      (2L, "x y z w v"),   // hits B's grams
      (3L, "q r s m n"),   // hits the shared gram
      (4L, "m n o p q")))  // no eval gram
    val base = java.nio.file.Files.createTempDirectory("graft_decon_spec").toString

    DecontamIndex.buildFrom(spark, evalA, s"$base/incr")
    DecontamIndex.append(spark, evalB, s"$base/incr")
    DecontamIndex.buildFrom(spark, evalA.union(evalB), s"$base/fresh")

    val incr = DecontamIndex.searchFrom(spark, train, s"$base/incr")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val fresh = DecontamIndex.searchFrom(spark, train, s"$base/fresh")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(incr.toSeq == fresh.toSeq)
    assert(incr.map(_._1).toSet == Set(1L, 2L, 3L)) // doc 4 reports nothing

    // duplicate-free: the shared "q r s" gram appears once
    val grams = spark.read.parquet(s"$base/incr/evalgrams")
      .collect().map(_.getString(0))
    assert(grams.length == grams.distinct.length)
    assert(grams.count(_ == "q r s") == 1)
  }

  test("streaming corpus probed against the persisted index equals the batch report") {
    // the 100 TB operating mode end-to-end: a STATIC persisted eval
    // side (grams parquet + sketch file) serving a STREAMING corpus —
    // the report must equal the batch searchFrom over the same docs
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import java.sql.Timestamp

    val evalDocs = docs(Seq((100L, "a b c d"), (101L, "x y z w")))
    val dir = java.nio.file.Files.createTempDirectory("graft_decon_stream").toString
    DecontamIndex.buildFrom(spark, evalDocs, dir)
    val sketch = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "sketch.bin"))
    val evalGrams = spark.read.parquet(s"$dir/evalgrams")

    val train = Seq((1L, "s0", "p b c d q"), (2L, "s0", "x y z w v"),
      (3L, "s1", "m n o p q"))
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val report = graft.streaming.StreamingDecontamination.overlapReport(
      input.toDF().toDF("evt", "doc_id", "source", "text"),
      evalGrams, sketch, "evt", "10 minutes", "10 minutes")
    val q = report.writeStream.format("memory").queryName("decon_idx_out")
      .outputMode(OutputMode.Append).start()
    val streamed = try {
      input.addData(train.zipWithIndex.map { case ((id, src, t), i) =>
        (ts(i), id, src, t) }: _*)
      q.processAllAvailable()
      input.addData((Timestamp.valueOf("2024-01-02 10:00:00"), 99L, "_flush", ""))
      q.processAllAvailable()
      spark.table("decon_idx_out")
        .select("doc_id", "source", "n_grams", "n_hits")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
    } finally q.stop()
    val batch = DecontamIndex.searchFrom(spark,
      docs(train.map { case (id, _, t) => (id, t) }), dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(streamed == batch && streamed.map(_._1) == Seq(1L, 2L))
  }
}
