package graft.streaming

import java.io.{BufferedInputStream, InputStream, OutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.Base64

/** Minimal live NTRIP caster client — the byte-level transport the
  * reference implements with asyncio streams
  * (`/root/reference/src/ntripclient.py`):
  *
  *  - v2 request = HTTP POST with `Ntrip-Version: Ntrip/2.0` + Basic
  *    auth; v1 = `SOURCE <pw> /<mount>` (ntripclient.py:209-236);
  *  - response = header lines to the first blank line; status must be
  *    200 (ntripclient.py:262-332);
  *  - `Transfer-Encoding: chunked` switches body reads to
  *    hex-length-line + exactly length+2 bytes (ntripclient.py:295-300,
  *    437-455); otherwise raw bounded reads (ntripclient.py:500-558);
  *  - sourcetable = text lines until `ENDSOURCETABLE`
  *    (ntripclient.py:379-401).
  *
  * Blocking JVM sockets on purpose: one caster connection is a
  * single sequential byte stream; concurrency comes from running one
  * client per mountpoint on the ingest host (or inside a streaming
  * source's partition reader), not from async IO. Downstream framing/
  * CRC/decode is the Spark pipeline — this class only yields raw body
  * chunks, which become `RawChunk` rows.
  */
final class NtripClient(
    host: String,
    port: Int,
    userAgent: String = "graft",
    connectTimeoutMs: Int = 5000,
    readTimeoutMs: Int = 10000) extends AutoCloseable {

  private var socket: Socket = _
  private var in: BufferedInputStream = _
  private var out: OutputStream = _

  /** Response header lines of the last request. */
  var responseHeader: Seq[String] = Nil
  /** True when the caster answered `Transfer-Encoding: chunked`. */
  var chunked: Boolean = false

  private def connect(): Unit = {
    socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), connectTimeoutMs)
    socket.setSoTimeout(readTimeoutMs)
    in = new BufferedInputStream(socket.getInputStream)
    out = socket.getOutputStream
  }

  private def requestHeader(path: String, user: Option[String], passwd: Option[String],
                            ntripVersion: Int): Array[Byte] = {
    if (ntripVersion >= 2) {
      val auth = (for (u <- user; p <- passwd) yield
        "Authorization: Basic " +
          Base64.getEncoder.encodeToString(s"$u:$p".getBytes(ISO_8859_1)) + "\r\n")
        .getOrElse("")
      (s"POST $path HTTP/1.1\r\n" +
        s"Host: $host:$port\r\n" +
        "Ntrip-Version: Ntrip/2.0\r\n" +
        auth +
        s"User-Agent: NTRIP $userAgent\r\n" +
        "Connection: close\r\n" +
        "\r\n").getBytes(ISO_8859_1)
    } else {
      val auth = passwd.map(p =>
        Base64.getEncoder.encodeToString(p.getBytes(ISO_8859_1))).getOrElse("")
      (s"SOURCE $auth $path HTTP/1.1\r\n" +
        s"Source-Agent: NTRIP $userAgent\r\n" +
        "\r\n").getBytes(ISO_8859_1)
    }
  }

  /** One ISO-8859-1 line (up to and excluding CRLF/LF); null at EOF. */
  private def readLine(): String = {
    val sb = new StringBuilder
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (b != '\r') sb.append(b.toChar)
      b = in.read()
    }
    sb.toString
  }

  private def readHeaderAndStatus(): Unit = {
    val lines = Iterator.continually(readLine())
      .takeWhile(l => l != null && l.nonEmpty).toSeq
    responseHeader = lines
    chunked = lines.exists(_.equalsIgnoreCase("Transfer-Encoding: chunked"))
    val status = lines.headOption.map(_.split(" ")).filter(_.length > 1).map(_(1))
    if (!status.contains("200"))
      throw new java.io.IOException(
        s"NTRIP response not OK: ${lines.headOption.getOrElse("<empty>")}")
  }

  /** Open the RTCM stream for a mountpoint. */
  def openStream(mountPoint: String, user: Option[String] = None,
                 passwd: Option[String] = None, ntripVersion: Int = 2): Unit = {
    connect()
    out.write(requestHeader(s"/$mountPoint", user, passwd, ntripVersion))
    out.flush()
    readHeaderAndStatus()
  }

  /** Fetch the caster sourcetable (lines until ENDSOURCETABLE). */
  def sourceTable(user: Option[String] = None, passwd: Option[String] = None): Seq[String] = {
    connect()
    out.write(requestHeader("/", user, passwd, ntripVersion = 2))
    out.flush()
    readHeaderAndStatus()
    val body = Iterator.continually(readLine())
      .takeWhile(l => l != null)
      .span(l => l != "ENDSOURCETABLE") match {
        case (pre, post) => (pre ++ post.take(1)).toSeq
      }
    close()
    body
  }

  private def readExactly(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new java.io.EOFException(s"stream closed at $off/$n")
      off += r
    }
    buf
  }

  /** Next body chunk: a full chunked-transfer block (hex length line,
    * then length+2 bytes, CRLF stripped), or a bounded raw read.
    * None = orderly end of stream (terminal 0-length chunk or EOF). */
  def readChunk(rawBufSize: Int = 4096): Option[Array[Byte]] = {
    if (chunked) {
      var lenLine = readLine()
      while (lenLine != null && lenLine.trim.isEmpty) lenLine = readLine()
      if (lenLine == null) return None
      // RFC 9112 §7.1: the length may carry chunk extensions (";ext")
      val len = Integer.parseInt(lenLine.trim.takeWhile(_ != ';').trim, 16)
      if (len == 0) { readLine(); None } // trailing CRLF after last chunk
      else {
        val body = readExactly(len + 2) // payload + CRLF (ntripclient.py:449)
        Some(java.util.Arrays.copyOfRange(body, 0, len))
      }
    } else {
      val buf = new Array[Byte](rawBufSize)
      val r = in.read(buf)
      if (r < 0) None
      else Some(java.util.Arrays.copyOfRange(buf, 0, r))
    }
  }

  override def close(): Unit = {
    if (socket != null && !socket.isClosed) socket.close()
  }
}

object NtripClient {
  /** Drain a mountpoint stream into RawChunk rows (receive time from
    * the supplied clock, seq = arrival index) — the bridge from one
    * live caster connection to the streaming pipeline's input rows.
    * The test harness pushes these into a MemoryStream; production
    * would do the same from a custom streaming source's partition
    * reader or a message-bus producer. */
  def drain(client: NtripClient, mountPoint: String, nowMicros: () => Long,
            maxChunks: Int = Int.MaxValue): Iterator[graft.etl.RawChunk] = {
    Iterator.from(0)
      .take(maxChunks)
      .map(i => client.readChunk().map(b => graft.etl.RawChunk(mountPoint, nowMicros(), i.toLong, b)))
      .takeWhile(_.isDefined)
      .map(_.get)
  }
}
