package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.etl.{RawChunk, SparkTestSession, SyntheticRtcm}
import org.scalatest.funsuite.AnyFunSuite

/** Live-socket NTRIP path: a localhost caster serving a chunked
  * HTTP body (the reference's transfer mode, ntripclient.py:437-455)
  * feeds the client → RawChunk bridge → stateful streaming framer —
  * the byte-level contract end-to-end over a real TCP connection. */
class NtripClientSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** One-shot caster: handles a single connection. Chunked RTCM body
    * split at deliberately frame-misaligned boundaries. */
  private def serveOnce(server: ServerSocket, frames: Seq[Array[Byte]],
                        chunkLens: Iterator[Int]): Thread = {
    val t = new Thread(() => {
      val sock = server.accept()
      try {
        val rd = new BufferedReader(new InputStreamReader(sock.getInputStream, ISO_8859_1))
        val req = Iterator.continually(rd.readLine())
          .takeWhile(l => l != null && l.nonEmpty).toSeq
        val out = sock.getOutputStream
        def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
        if (req.head.startsWith("POST / ")) {
          w("HTTP/1.1 200 OK\r\n\r\n")
          w("CAS;caster;2101\r\nSTR;MNT0;MNT0;RTCM 3.2\r\nENDSOURCETABLE\r\n")
        } else {
          assert(req.head.startsWith("POST /MNT0 "), req.head)
          assert(req.exists(_.startsWith("Ntrip-Version: Ntrip/2.0")))
          w("HTTP/1.1 200 OK\r\nContent-Type: gnss/data\r\nTransfer-Encoding: chunked\r\n\r\n")
          val body = frames.flatMap(_.toSeq).toArray
          var off = 0
          while (off < body.length) {
            val n = math.min(chunkLens.next(), body.length - off)
            w(f"$n%x\r\n")
            out.write(body, off, n)
            w("\r\n")
            off += n
          }
          w("0\r\n\r\n")
        }
        out.flush()
      } finally sock.close()
    })
    t.setDaemon(true)
    t.start()
    t
  }

  /** Multi-connection caster: serves the mountpoint each request asks
    * for (chunked), until closed. */
  private def serveMany(server: ServerSocket,
                        perMount: Map[String, Seq[Array[Byte]]]): Thread = {
    val t = new Thread(() => {
      try {
        while (!server.isClosed) {
          val sock = server.accept()
          val h = new Thread(() => {
            try {
              val rd = new BufferedReader(new InputStreamReader(sock.getInputStream, ISO_8859_1))
              val req = Iterator.continually(rd.readLine())
                .takeWhile(l => l != null && l.nonEmpty).toSeq
              val mount = req.head.split(" ")(1).stripPrefix("/")
              val out = sock.getOutputStream
              def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
              w("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n")
              val body = perMount(mount).flatMap(_.toSeq).toArray
              var off = 0
              val lens = Iterator.continually(Seq(11, 47, 96, 201)).flatten
              while (off < body.length) {
                val n = math.min(lens.next(), body.length - off)
                w(f"$n%x\r\n"); out.write(body, off, n); w("\r\n")
                off += n
              }
              w("0\r\n\r\n")
              out.flush()
            } finally sock.close()
          })
          h.setDaemon(true)
          h.start()
        }
      } catch { case _: Throwable => () } // server closed
    })
    t.setDaemon(true)
    t.start()
    t
  }

  test("DataSourceV2 micro-batch source: live caster → readStream → framer") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val frames = Map(
      "MNT0" -> SyntheticRtcm.framesFor("MNT0", 100, 30, 42L).map(_._2),
      "MNT1" -> SyntheticRtcm.framesFor("MNT1", 101, 30, 43L).map(_._2))
    val server = new ServerSocket(0)
    try {
      serveMany(server, frames)
      val chunks = spark.readStream
        .format("graft.streaming.NtripSourceProvider")
        .option("host", "127.0.0.1").option("port", server.getLocalPort.toString)
        .option("mountpoints", "MNT0,MNT1")
        .load()
        .as[RawChunk]
      val q = RtcmStreaming.frameStream(chunks)
        .writeStream.format("memory").queryName("ntrip_dsv2_out")
        .outputMode(OutputMode.Append).start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        def landed(): Long = spark.table("ntrip_dsv2_out").count()
        while (landed() < 60 && System.currentTimeMillis() < deadline) {
          Thread.sleep(200)
          q.processAllAvailable()
        }
        val got = spark.table("ntrip_dsv2_out")
          .selectExpr("mountPoint", "frame").collect()
          .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq)
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        assert(got == frames.map { case (m, fs) => m -> fs.map(_.toSeq).toSet })
      } finally q.stop()
    } finally server.close()
  }

  test("maxChunksPerTrigger bounds each micro-batch (admission control)") {
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    val frames = Map("MNT0" -> SyntheticRtcm.framesFor("MNT0", 100, 40, 44L).map(_._2))
    val server = new ServerSocket(0)
    try {
      serveMany(server, frames)
      val chunks = spark.readStream
        .format("graft.streaming.NtripSourceProvider")
        .option("host", "127.0.0.1").option("port", server.getLocalPort.toString)
        .option("mountpoints", "MNT0")
        .option("maxChunksPerTrigger", "7")
        .load()
        .as[RawChunk]
      val q = chunks.writeStream.format("memory").queryName("ntrip_ratelimit_out")
        .outputMode(OutputMode.Append).start()
      try {
        val deadline = System.currentTimeMillis() + 30000
        def total(): Long = spark.table("ntrip_ratelimit_out").count()
        var last = -1L
        while (System.currentTimeMillis() < deadline &&
          (total() == 0 || total() != last)) {
          last = total()
          Thread.sleep(200)
          q.processAllAvailable()
        }
        assert(total() > 7) // stream fully drained over multiple batches
        val batchSizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
        assert(batchSizes.nonEmpty)
        assert(batchSizes.max <= 7, batchSizes.mkString(","))
      } finally q.stop()
    } finally server.close()
  }

  test("sourcetable request over a live socket") {
    val server = new ServerSocket(0)
    try {
      serveOnce(server, Nil, Iterator.empty)
      val c = new NtripClient("127.0.0.1", server.getLocalPort)
      val table = c.sourceTable()
      assert(table.last == "ENDSOURCETABLE")
      assert(table.exists(_.startsWith("STR;MNT0")))
    } finally server.close()
  }

  test("chunked live stream → client → RawChunk bridge → streaming framer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val frames = SyntheticRtcm.framesFor("MNT0", 100, 40, 42L).map(_._2)
    val server = new ServerSocket(0)
    try {
      // chunk lengths cycle through frame-misaligned sizes: every
      // chunk boundary lands mid-frame somewhere, so realign + carry
      // state are exercised over the live socket
      serveOnce(server, frames, Iterator.continually(Seq(7, 33, 64, 129, 250)).flatten)
      val client = new NtripClient("127.0.0.1", server.getLocalPort)
      client.openStream("MNT0", user = Some("u"), passwd = Some("p"))
      assert(client.chunked, client.responseHeader.mkString("|"))
      var micros = 1700000000000000L
      val chunks = NtripClient.drain(client, "MNT0",
        () => { micros += 1000; micros }).toVector
      client.close()
      assert(chunks.map(_.data.length).sum == frames.map(_.length).sum)

      val input = MemoryStream[RawChunk]
      val q = RtcmStreaming.frameStream(input.toDS())
        .writeStream.format("memory").queryName("ntrip_live_out")
        .outputMode(OutputMode.Append).start()
      try {
        // two batches: state must carry a partial frame across
        chunks.grouped(math.max(1, chunks.size / 2)).foreach { part =>
          input.addData(part); q.processAllAvailable()
        }
        val got = spark.table("ntrip_live_out")
          .selectExpr("frame").as[Array[Byte]].collect().map(_.toSeq).toSet
        assert(got == frames.map(_.toSeq).toSet)
        assert(got.size == 40)
      } finally q.stop()
    } finally server.close()
  }
}
