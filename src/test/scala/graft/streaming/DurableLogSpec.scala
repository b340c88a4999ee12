package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.Files

import graft.etl.{SparkTestSession, SyntheticRtcm}
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once live-source option: NtripClient → durable chunk log
  * (atomically-rolled JSON files) → Spark file streaming source. The
  * restart test kills the query mid-stream, appends more live data to
  * the log, restarts from the same checkpoint, and asserts every frame
  * landed exactly once — the delivery the raw TCP source cannot give. */
class DurableLogSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** One-shot chunked caster for a fixed frame list. */
  private def serve(server: ServerSocket, frames: Seq[Array[Byte]]): Thread = {
    val t = new Thread(() => {
      val sock = server.accept()
      try {
        val rd = new BufferedReader(new InputStreamReader(sock.getInputStream, ISO_8859_1))
        Iterator.continually(rd.readLine()).takeWhile(l => l != null && l.nonEmpty).foreach(_ => ())
        val out = sock.getOutputStream
        def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
        w("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n")
        val body = frames.flatMap(_.toSeq).toArray
        var off = 0
        val lens = Iterator.continually(Seq(9, 41, 103, 222)).flatten
        while (off < body.length) {
          val n = math.min(lens.next(), body.length - off)
          w(f"$n%x\r\n"); out.write(body, off, n); w("\r\n")
          off += n
        }
        w("0\r\n\r\n")
        out.flush()
      } finally sock.close()
    })
    t.setDaemon(true)
    t.start()
    t
  }

  private def drainCasterToLog(frames: Seq[Array[Byte]], logDir: java.nio.file.Path,
                               startSeq: Long,
                               microsStart: Long = 1700000000000000L,
                               stepMicros: Long = 1000L): Long = {
    val server = new ServerSocket(0)
    try {
      serve(server, frames)
      val c = new NtripClient("127.0.0.1", server.getLocalPort)
      c.openStream("MNT0")
      var micros = microsStart
      val n = NtripDurableLog.drain(c, "MNT0", logDir,
        () => { micros += stepMicros; micros }, rollEvery = 5, startSeq = startSeq)
      c.close()
      n
    } finally server.close()
  }

  test("restart replays from the durable log without loss or duplication") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val root = Files.createTempDirectory("graft-durable")
    val logDir = root.resolve("log")
    val outDir = root.resolve("out").toString
    val ckDir = root.resolve("ck").toString

    val phase1 = SyntheticRtcm.framesFor("MNT0", 100, 40, 61L).map(_._2)
    val phase2 = SyntheticRtcm.framesFor("MNT0", 101, 20, 62L).map(_._2)
    assert((phase1 ++ phase2).map(_.toSeq).distinct.size == 60)

    def runQuery(): Unit = {
      val q = RtcmStreaming.frameStream(NtripDurableLog.readStream(spark, logDir.toString))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }

    // phase 1: live data → log → query lands it, then "crashes" (stop)
    val n1 = drainCasterToLog(phase1, logDir, startSeq = 0L)
    assert(n1 > 0)
    runQuery()
    val afterPhase1 = spark.read.parquet(outDir).count()
    assert(afterPhase1 == 40, s"phase 1 landed $afterPhase1")

    // while "down": more live data arrives; the writer resumes its
    // numbering from the directory (its own restart story)
    val resumeAt = NtripDurableLog.nextSeq(logDir, "MNT0")
    assert(resumeAt == n1)
    drainCasterToLog(phase2, logDir, startSeq = resumeAt)

    // restart from the SAME checkpoint: only the new files replay
    runQuery()
    val frames = spark.read.parquet(outDir)
      .selectExpr("frame").as[Array[Byte]].collect().map(_.toSeq)
    assert(frames.length == 60, s"expected 60 frames exactly once, got ${frames.length}")
    assert(frames.toSet == (phase1 ++ phase2).map(_.toSeq).toSet)
  }

  test("windowed dashboard aggregate survives a mid-stream restart exactly once") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.OutputMode
    // the full streaming-analytics loop under failure: durable log →
    // stateful framing → decode → watermarked 30 s gap windows →
    // parquet sink, killed between two live phases and restarted from
    // the same checkpoint; the landed windows must EQUAL the batch
    // recompute over the whole log — no lost, duplicated, or partial
    // window despite open window state at the kill point
    val root = Files.createTempDirectory("graft-durable-win")
    val logDir = root.resolve("log")
    val outDir = root.resolve("out").toString
    val ckDir = root.resolve("ck").toString

    // 2 s of receive time per chunk → phases span several 30 s windows
    val t0 = 1700000000000000L
    val phase1 = SyntheticRtcm.framesFor("MNT0", 100, 40, 71L).map(_._2)
    val phase2 = SyntheticRtcm.framesFor("MNT0", 101, 40, 72L).map(_._2)

    def runQuery(): Unit = {
      val decoded = RtcmStreaming.decodeStream(
        NtripDurableLog.readStream(spark, logDir.toString))
      val q = DashboardStreams.gapHeatmap(decoded, watermark = "2 minutes")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode(OutputMode.Append).start()
      try q.processAllAvailable() finally q.stop()
    }

    val n1 = drainCasterToLog(phase1, logDir, startSeq = 0L,
      microsStart = t0, stepMicros = 2000000L)
    runQuery() // "crash" with windows open
    val resumeAt = NtripDurableLog.nextSeq(logDir, "MNT0")
    assert(resumeAt == n1)
    val n2 = drainCasterToLog(phase2, logDir, startSeq = resumeAt,
      microsStart = t0 + n1 * 2000000L, stepMicros = 2000000L)
    // watermark flush: one frame far past everything
    drainCasterToLog(phase1.take(1), logDir, startSeq = resumeAt + n2,
      microsStart = t0 + (n1 + n2) * 2000000L + 600000000L, stepMicros = 2000000L)
    runQuery() // restart from the same checkpoint

    // ground truth: the batch pipeline over the SAME durable log,
    // minus windows the flush could not close (≥ watermark horizon)
    val allChunks = NtripDurableLog.readBatch(spark, logDir.toString)
    val batchPkgs = graft.etl.RtcmPipeline.packages(
      graft.etl.RtcmPipeline.decode(graft.etl.RtcmPipeline.frameChunks(allChunks)))
    val horizon = (t0 + (n1 + n2) * 2000000L + 600000000L) / 1000000L - 120
    val expected = batchPkgs
      .filter(col("rtcm_obs_epoch").isNotNull)
      .groupBy(graft.queries.Q.bucket(col("receive_time"), 30).as("bucket"),
        col("mountpoint"))
      .agg(count(lit(1)).as("n"))
      .filter(col("bucket") + 30 <= horizon)
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(outDir)
      .filter(col("bucket") + 30 <= horizon)
      .collect().map(_.toSeq).toSet
    assert(got == expected, s"streamed windows != batch recompute")
    assert(got.size >= 4, s"expected several closed windows, got ${got.size}")
    // exactly-once: no duplicate (bucket, mountpoint) rows landed
    val all = spark.read.parquet(outDir).collect()
    assert(all.map(r => (r.getLong(0), r.getString(1))).distinct.length == all.length)
  }
}
