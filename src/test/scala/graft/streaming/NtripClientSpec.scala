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
    * split at deliberately frame-misaligned boundaries. Captures the
    * request header lines for wire-format assertions. */
  private def serveOnce(server: ServerSocket, frames: Seq[Array[Byte]],
                        chunkLens: Iterator[Int],
                        reqSink: Seq[String] => Unit = _ => ()): Thread = {
    val t = new Thread(() => {
      val sock = server.accept()
      try {
        val rd = new BufferedReader(new InputStreamReader(sock.getInputStream, ISO_8859_1))
        val req = Iterator.continually(rd.readLine())
          .takeWhile(l => l != null && l.nonEmpty).toSeq
        reqSink(req)
        val out = sock.getOutputStream
        def w(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
        // a real caster accepts ONLY GET on the client path — the
        // reference's stream request line (ntripclient.py:160)
        if (req.head.startsWith("GET / ")) {
          w("HTTP/1.1 200 OK\r\n\r\n")
          w("CAS;caster;2101\r\nSTR;MNT0;MNT0;RTCM 3.2\r\nENDSOURCETABLE\r\n")
        } else if (!req.head.startsWith("GET /")) {
          w("HTTP/1.1 405 Method Not Allowed\r\n\r\n")
        } else {
          assert(req.head.startsWith("GET /MNT0 "), req.head)
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

  test("sourcetable request over a live socket is GET /") {
    val server = new ServerSocket(0)
    val captured = new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)
    try {
      serveOnce(server, Nil, Iterator.empty, captured.set)
      val c = new NtripClient("127.0.0.1", server.getLocalPort)
      val table = c.sourceTable()
      assert(table.last == "ENDSOURCETABLE")
      assert(table.exists(_.startsWith("STR;MNT0")))
      val req = captured.get()
      assert(req.head.startsWith("GET / HTTP/1.1"), req.head)
      assert(req.exists(_.startsWith("Date: ")), req.mkString("|"))
    } finally server.close()
  }

  test("stream request wire format: GET /<mount>, Basic auth, NMEA GGA line") {
    val frames = SyntheticRtcm.framesFor("MNT0", 100, 3, 45L).map(_._2)
    val server = new ServerSocket(0)
    val captured = new java.util.concurrent.atomic.AtomicReference[Seq[String]](Nil)
    try {
      val gga = "$GPGGA,123519,4807.038,N,01131.000,E,1,08,0.9,545.4,M,46.9,M,,*47"
      serveOnce(server, frames, Iterator.continually(64), captured.set)
      val c = new NtripClient("127.0.0.1", server.getLocalPort)
      c.openStream("MNT0", user = Some("u"), passwd = Some("p"), nmeaGga = Some(gga))
      val req = captured.get()
      // the reference's client stream request (ntripclient.py:159-169):
      // GET verb — a real caster rejects POST (that's the server/upload
      // verb, ntripclient.py:216) — plus version, auth, GGA, Date
      assert(req.head == "GET /MNT0 HTTP/1.1", req.head)
      assert(req.exists(_ == "Ntrip-Version: Ntrip/2.0"), req.mkString("|"))
      assert(req.exists(_.startsWith("Authorization: Basic ")), req.mkString("|"))
      assert(req.contains(s"Ntrip-GGA: $gga"), req.mkString("|"))
      assert(req.exists(_.matches("Date: \\w{3}, \\d{2} \\w{3} \\d{4} \\d{2}:\\d{2}:\\d{2} GMT")),
        req.mkString("|"))
      c.close()
    } finally server.close()
  }

  test("TLS caster (self-signed localhost): stream over SSLSocket") {
    import java.io.FileInputStream
    import java.security.KeyStore
    import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}
    import scala.sys.process._

    val dir = java.nio.file.Files.createTempDirectory("graft-tls")
    val ksPath = dir.resolve("caster.p12").toString
    // SAN ip entry: the client enables HTTPS endpoint identification,
    // which matches an IP peer against subjectAltName, not CN
    val genOk = Seq("keytool", "-genkeypair", "-alias", "graft", "-keyalg", "RSA",
      "-keysize", "2048", "-storetype", "PKCS12", "-keystore", ksPath,
      "-storepass", "changeit", "-dname", "CN=127.0.0.1",
      "-ext", "SAN=ip:127.0.0.1", "-validity", "2").! == 0
    assert(genOk, "keytool self-signed keypair generation failed")

    val ks = KeyStore.getInstance("PKCS12")
    val fis = new FileInputStream(ksPath)
    try ks.load(fis, "changeit".toCharArray) finally fis.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, "changeit".toCharArray)
    val serverCtx = SSLContext.getInstance("TLS")
    serverCtx.init(kmf.getKeyManagers, null, null)
    // client trusts exactly the caster's self-signed cert — the test
    // analogue of the reference's ssl=True https path (ntripclient.py:64-67)
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val clientCtx = SSLContext.getInstance("TLS")
    clientCtx.init(null, tmf.getTrustManagers, null)

    val frames = SyntheticRtcm.framesFor("MNT0", 100, 10, 46L).map(_._2)
    val server = serverCtx.getServerSocketFactory.createServerSocket(0)
    try {
      serveOnce(server, frames, Iterator.continually(Seq(13, 77, 190)).flatten)
      val c = new NtripClient("127.0.0.1", server.getLocalPort,
        tls = true, sslContext = Some(clientCtx))
      c.openStream("MNT0")
      assert(c.chunked, c.responseHeader.mkString("|"))
      val got = Iterator.continually(c.readChunk()).takeWhile(_.isDefined)
        .flatMap(_.get).toArray
      assert(got.toSeq == frames.flatMap(_.toSeq))
      c.close()
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

  // --- NtripMicroBatchStream driver-buffer behavior (direct harness) ---

  import org.apache.spark.sql.connector.read.streaming.ReadLimit
  import org.apache.spark.sql.util.CaseInsensitiveStringMap
  import scala.jdk.CollectionConverters._

  private def mkStream(port: Int, extra: (String, String)*): NtripMicroBatchStream =
    new NtripMicroBatchStream(new CaseInsensitiveStringMap(
      (Map("host" -> "127.0.0.1", "port" -> port.toString, "mountpoints" -> "MNT0")
        ++ extra).asJava))

  /** Manual micro-batch loop: latestOffset → plan → commit until
    * `expectedBytes` have been read or the deadline passes. */
  private def drainAll(stream: NtripMicroBatchStream, startN: Long,
                       expectedBytes: Long, deadlineMs: Long = 30000): Long = {
    val deadline = System.currentTimeMillis() + deadlineMs
    var cur = startN
    var total = 0L
    while (total < expectedBytes && System.currentTimeMillis() < deadline) {
      val end = stream.latestOffset(NtripOffset(cur), ReadLimit.allAvailable())
        .asInstanceOf[NtripOffset].n
      if (end > cur) {
        val rows = stream.planInputPartitions(NtripOffset(cur), NtripOffset(end))
          .flatMap(_.asInstanceOf[NtripInputPartition].rows)
        total += rows.map(_._4.length.toLong).sum
        stream.commit(NtripOffset(end))
        cur = end
      } else Thread.sleep(50)
    }
    total
  }

  test("maxBufferedChunks bounds driver memory while the query stalls, then resumes") {
    val frames = SyntheticRtcm.framesFor("MNT0", 100, 200, 47L).map(_._2)
    val bodyBytes = frames.map(_.length.toLong).sum
    val server = new ServerSocket(0)
    try {
      serveMany(server, Map("MNT0" -> frames))
      val stream = mkStream(server.getLocalPort, "maxBufferedChunks" -> "8")
      try {
        // stalled query: nothing consumes; the reader must block on the
        // cap (TCP backpressure), not grow the buffer
        val stallUntil = System.currentTimeMillis() + 1500
        var maxSeen = 0
        while (System.currentTimeMillis() < stallUntil) {
          maxSeen = math.max(maxSeen, stream.bufferedCount)
          Thread.sleep(25)
        }
        assert(maxSeen <= 8, s"buffer grew past cap: $maxSeen")
        assert(maxSeen > 0, "caster never delivered")
        // resume: the stalled stream must still deliver every byte
        val total = drainAll(stream, 0L, bodyBytes)
        assert(total == bodyBytes, s"$total != $bodyBytes")
      } finally stream.stop()
    } finally server.close()
  }

  test("restart rebase: checkpointed offset beyond fresh counter loses no live chunks") {
    val frames = SyntheticRtcm.framesFor("MNT0", 100, 30, 48L).map(_._2)
    val bodyBytes = frames.map(_.length.toLong).sum
    val server = new ServerSocket(0)
    try {
      serveMany(server, Map("MNT0" -> frames))
      val stream = mkStream(server.getLocalPort)
      try {
        // let live chunks accumulate before the "recovered" query asks
        val deadline = System.currentTimeMillis() + 10000
        while (stream.bufferedCount == 0 && System.currentTimeMillis() < deadline)
          Thread.sleep(25)
        assert(stream.bufferedCount > 0)
        // driver restart: Spark first REPLAYS the pending checkpointed
        // batch [500, 520) via planInputPartitions (no latestOffset
        // yet), then commits its end — the rebase must anchor on the
        // batch END or that commit drops the live chunks buffered here
        val replayed = stream.planInputPartitions(NtripOffset(500L), NtripOffset(520L))
          .flatMap(_.asInstanceOf[NtripInputPartition].rows)
        assert(replayed.isEmpty, "pre-restart data cannot be replayed from a live socket")
        stream.commit(NtripOffset(520L))
        val total = drainAll(stream, 520L, bodyBytes)
        assert(total == bodyBytes, s"$total != $bodyBytes — live chunks were dropped")
      } finally stream.stop()
    } finally server.close()
  }
}
