package graft.streaming

import graft.etl.{RawChunk, RtcmPipeline, SparkTestSession, SyntheticRtcm}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end streaming landing: chunk stream → stateful framing →
  * decode → foreachBatch parquet sink (packages + constellation-
  * partitioned observations + coordinate log), across several
  * micro-batches with checkpointing.
  */
class SinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("startParquetSink lands all three tables across micro-batches") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toString

    val corpus = SyntheticRtcm.corpus(2, 64)
    val input = MemoryStream[RawChunk]
    val q = RtcmStreaming.startParquetSink(
      RtcmStreaming.decodeStream(input.toDS()), out, ckpt)
    try {
      corpus.grouped(corpus.size / 3 + 1).foreach { part =>
        input.addData(part)
        q.processAllAvailable()
      }
    } finally q.stop()

    val pkgs = spark.read.parquet(s"$out/rtcm_packages")
    assert(pkgs.count() == 128) // 2 mounts × 64 frames, across batches
    val obs = spark.read.parquet(s"$out/observations")
    assert(obs.count() > 0)
    // constellation is a physical partition column of the landed table
    assert(obs.schema.fieldNames.contains("constellation"))
    val dirs = new java.io.File(s"$out/observations").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("constellation=")))
    val coords = spark.read.parquet(s"$out/coordinates_log")
    assert(coords.count() > 0)

    // landed packages match the batch pipeline on the same corpus
    val batch = RtcmPipeline.packages(
      RtcmPipeline.decode(RtcmPipeline.frameChunks(spark.createDataset(corpus))))
    assert(pkgs.select("rtcm_package_id").collect().map(_.getLong(0)).sorted.toSeq ==
      batch.select("rtcm_package_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("startJdbcSink executes batched inserts and the coordinates upsert") {
    import graft.etl.{RecordingJdbc, Sinks}
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    RecordingJdbc.clear()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_jdbc_ckpt").toString

    val corpus = SyntheticRtcm.corpus(3, 48)
    val input = MemoryStream[RawChunk]
    val q = RtcmStreaming.startJdbcSink(
      RtcmStreaming.decodeStream(input.toDS()), new RecordingJdbc.Factory, ckpt)
    try {
      corpus.grouped(corpus.size / 2 + 1).foreach { part =>
        input.addData(part)
        q.processAllAvailable()
      }
    } finally q.stop()

    val execs = RecordingJdbc.execs.toArray(Array.empty[RecordingJdbc.Exec])
    def rowsFor(table: String) =
      execs.filter(_.sql.startsWith(s"INSERT INTO $table ")).map(_.rows).sum

    // the executed inserts use EXACTLY the declared landed-table
    // schemas (the fake endpoint accepts any SQL, so column drift vs
    // the reference schema must be caught here)
    assert(execs.filter(_.sql.startsWith("INSERT INTO rtcm_packages "))
      .forall(_.sql == Sinks.insertSql("rtcm_packages", Sinks.PackagesColumns, 1)))
    assert(execs.filter(_.sql.startsWith("INSERT INTO observations "))
      .forall(_.sql == Sinks.insertSql("observations", Sinks.ObservationsColumns, 1)))

    // every decoded frame landed exactly once as a package row
    val expected = RtcmPipeline.decode(
      RtcmPipeline.frameChunks(spark.createDataset(corpus)))
    assert(rowsFor("rtcm_packages") == expected.count())
    assert(rowsFor("observations") ==
      RtcmPipeline.observations(expected).count())

    // the upsert ran with the reference's ON CONFLICT shape, once per
    // mountpoint with an ARP fix per batch
    val upserts = execs.filter(_.sql.contains("ON CONFLICT (mountpoint) DO UPDATE"))
    assert(upserts.nonEmpty)
    assert(upserts.map(_.rows).sum >= 3) // ≥ one latest row per mountpoint overall

    // bound parameters are real row values: package ids seen in the
    // insert params match the pipeline's deterministic FNV ids
    val pkgSql = execs.find(_.sql.startsWith("INSERT INTO rtcm_packages")).get.sql
    val insertedIds = RecordingJdbc.paramRows.toArray(Array.empty[(String, Vector[Any])])
      .filter(_._1 == pkgSql).map(_._2.head.asInstanceOf[Long]).sorted.toSeq
    val expectedIds = expected.select("rtcm_package_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(insertedIds == expectedIds)
  }
}
