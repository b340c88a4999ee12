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
                               startSeq: Long): Long = {
    val server = new ServerSocket(0)
    try {
      serve(server, frames)
      val c = new NtripClient("127.0.0.1", server.getLocalPort)
      c.openStream("MNT0")
      var micros = 1700000000000000L
      val n = NtripDurableLog.drain(c, "MNT0", logDir,
        () => { micros += 1000; micros }, rollEvery = 5, startSeq = startSeq)
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
}
