package graft.multimodal

/** Real (pure-Scala) media header codecs: container sniffing +
  * dimension/duration extraction from magic bytes for the formats
  * whose headers are public, simple structures — PNG, JPEG, GIF, BMP
  * (image dimensions) and WAV (PCM duration). No external codec
  * library: these parse the published header layouts only, which is
  * exactly the metadata a training-data pipeline extracts in the scan
  * pass (full pixel/sample decode stays a declared stub — see
  * Multimodal.FakeCodec — because this container ships no imaging
  * libs).
  */
object MediaCodec {

  final case class ImageInfo(format: String, width: Int, height: Int)
  final case class AudioInfo(format: String, durationMs: Int, sampleRate: Int, channels: Int)
  final case class VideoInfo(format: String, durationMs: Int, width: Int, height: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  /** PNG: 8-byte signature, then the IHDR chunk (must be first):
    * length(4) "IHDR"(4) width(4 BE) height(4 BE). */
  private def png(b: Array[Byte]): Option[ImageInfo] =
    if (b.length >= 24 &&
      u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      u8(b, 4) == 0x0D && u8(b, 5) == 0x0A && u8(b, 6) == 0x1A && u8(b, 7) == 0x0A &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(ImageInfo("png", be32(b, 16), be32(b, 20)))
    else None

  /** JPEG: FFD8, then marker segments FF xx len(2 BE incl itself);
    * dimensions live in the first SOF0/1/2/3/5/6/7/9/A/B/D/E/F frame
    * header: [len][precision][height BE16][width BE16]. */
  private def jpeg(b: Array[Byte]): Option[ImageInfo] = {
    if (b.length < 4 || u8(b, 0) != 0xFF || u8(b, 1) != 0xD8) return None
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xFF) return None
      val marker = u8(b, i + 1)
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) i += 2 // standalone
      else if (marker == 0xD9 || marker == 0xDA) return None // EOI / scan start: no SOF seen
      else {
        val len = be16(b, i + 2)
        val isSof = marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (i + 9 >= b.length) return None
          return Some(ImageInfo("jpeg", be16(b, i + 7), be16(b, i + 5)))
        }
        i += 2 + len
      }
    }
    None
  }

  /** GIF87a/GIF89a: logical screen width/height LE16 at offsets 6/8. */
  private def gif(b: Array[Byte]): Option[ImageInfo] =
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(ImageInfo("gif", le16(b, 6), le16(b, 8)))
    else None

  /** BMP: "BM", BITMAPINFOHEADER width LE32 at 18, height LE32 at 22
    * (negative height = top-down rows). The 2-byte magic alone matches
    * ordinary text ("BM..."), so also require the INFO-header size and
    * planes fields to be plausible. */
  private def bmp(b: Array[Byte]): Option[ImageInfo] =
    if (b.length >= 30 && b(0) == 'B' && b(1) == 'M' &&
      Seq(12, 40, 52, 56, 108, 124).contains(le32(b, 14)) && // known DIB header sizes
      (le32(b, 14) == 12 || le16(b, 26) == 1)) // planes must be 1 (BITMAPINFO)
      Some(ImageInfo("bmp", le32(b, 18), math.abs(le32(b, 22))))
    else None

  /** Sniff an image container and read its dimensions. */
  def sniffImage(bytes: Array[Byte]): Option[ImageInfo] =
    png(bytes).orElse(jpeg(bytes)).orElse(gif(bytes)).orElse(bmp(bytes))

  /** WAV (RIFF/WAVE): walk chunks; "fmt " gives channels(LE16@+2),
    * sampleRate(LE32@+4), byteRate(LE32@+8); "data" size / byteRate =
    * duration. */
  def sniffWav(b: Array[Byte]): Option[AudioInfo] = {
    if (b.length < 44 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var byteRate = 0
    var sampleRate = 0
    var channels = 0
    var dataSize = -1
    while (i + 8 <= b.length && (byteRate == 0 || dataSize < 0)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = le32(b, i + 4)
      if (size < 0) return None // corrupt header: would loop forever
      if (id == "fmt " && i + 20 <= b.length) {
        channels = le16(b, i + 10)
        sampleRate = le32(b, i + 12)
        byteRate = le32(b, i + 16)
      } else if (id == "data") dataSize = size
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (byteRate > 0 && dataSize >= 0)
      Some(AudioInfo("wav", ((dataSize.toLong * 1000) / byteRate).toInt,
        sampleRate, channels))
    else None
  }

  /** MP4/ISO-BMFF (ISO 14496-12, published box layouts): walk
    * top-level boxes [size(4 BE) type(4)]; a leading `ftyp` gates the
    * sniff (arbitrary bytes can collide with a 4-char type); `moov`
    * children give `mvhd` (movie timescale + duration, version 0 =
    * 32-bit fields, version 1 = 64-bit) and per-`trak` `tkhd` boxes
    * whose trailing width/height are 16.16 fixed-point — the first
    * track with nonzero dims is the video track. 64-bit (size==1)
    * and to-end (size==0) boxes abort the sniff rather than misparse. */
  def sniffMp4(b: Array[Byte]): Option[VideoInfo] = {
    if (b.length < 16) return None
    def boxes(from: Int, end: Int): Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
      private var i = from
      private var broken = false
      def hasNext: Boolean = !broken && i + 8 <= end
      def next(): (String, Int, Int) = {
        val size = be32(b, i)
        val typ = new String(b, i + 4, 4, "US-ASCII")
        if (size < 8 || i.toLong + size > end) { broken = true; ("", i + 8, end) }
        else { val r = (typ, i + 8, i + size); i += size; r }
      }
    }
    val top = boxes(0, b.length).toSeq
    if (top.isEmpty || top.head._1 != "ftyp") return None
    val moov = top.find(_._1 == "moov").getOrElse(return None)
    var durationMs = 0
    var w = 0
    var h = 0
    boxes(moov._2, moov._3).foreach {
      case ("mvhd", s, e) if e - s >= 20 =>
        val v = u8(b, s)
        // v0: timescale@12 dur@16 (4B); v1: timescale@20 dur@24 (8B)
        val (ts, dur) =
          if (v == 1 && e - s >= 32)
            (be32(b, s + 20).toLong,
              (be32(b, s + 24).toLong << 32) | (be32(b, s + 28).toLong & 0xFFFFFFFFL))
          else (be32(b, s + 12).toLong, be32(b, s + 16).toLong & 0xFFFFFFFFL)
        if (ts > 0) durationMs = ((dur * 1000) / ts).toInt
      case ("trak", s, e) if w == 0 =>
        boxes(s, e).foreach {
          case ("tkhd", ts, te) =>
            val v = u8(b, ts)
            // width/height are the LAST 8 bytes of the fixed-size body
            // (v0 body 84 B, v1 96 B) as 16.16 fixed-point
            val need = if (v == 1) 96 else 84
            if (te - ts >= need && w == 0) {
              val tw = be32(b, ts + need - 8) >>> 16
              val th = be32(b, ts + need - 4) >>> 16
              if (tw > 0 && th > 0) { w = tw; h = th }
            }
          case _ => ()
        }
      case _ => ()
    }
    if (durationMs > 0 || (w > 0 && h > 0)) Some(VideoInfo("mp4", durationMs, w, h))
    else None
  }

  // ---- pixel-level decode (pure JDK: Inflater + published layouts) ----

  /** Row-major, channel-interleaved RGB; read samples as
    * `rgb(i) & 0xFF` (bytes, not ints: an Int array would cost 4× the
    * memory, and an OutOfMemoryError inside a task is fatal, not
    * caught). */
  final case class PixelImage(width: Int, height: Int, rgb: Array[Byte])

  /** Pixel-count cap for full decodes. 16 M pixels bounds the ONLY
    * whole-image allocation (the RGB output) at 48 MB per record —
    * the unfilter itself streams scanline-by-scanline with a two-row
    * window, so there is no multiple-of-the-image transient. A 64 M
    * cap with whole-image raw+recon buffers measured ~770 MB
    * transient per RGBA task — exactly the fatal-OOM scenario the cap
    * exists to prevent. */
  val MaxPixels = 16_000_000L

  /** Full PNG pixel decode — public spec (RFC 2083 / ISO 15948), pure
    * JDK: concatenated IDAT chunks inflate with `java.util.zip.
    * Inflater`, then per-scanline unfilter (None/Sub/Up/Average/Paeth)
    * and color-type expansion to RGB. Supported: bit depth 8, color
    * types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
    * non-interlaced. Anything else → None (falls back to the declared
    * pseudo path — honest, not wrong). */
  def decodePngPixels(b: Array[Byte]): Option[PixelImage] = {
    // png() guarantees 24 bytes; depth/color/interlace live at 24-28
    if (png(b).isEmpty || b.length < 29) return None
    val width = be32(b, 16)
    val height = be32(b, 20)
    if (width <= 0 || height <= 0 || width.toLong * height > MaxPixels) return None
    val bitDepth = u8(b, 24)
    val colorType = u8(b, 25)
    val interlace = u8(b, 28)
    if (bitDepth != 8 || interlace != 0) return None
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    // walk chunks for IDAT (concatenate) and PLTE
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(b, i)
      // long arithmetic: a corrupt 2 GB-ish declared length must fail
      // this check, not overflow past it into an uncaught AIOOBE
      if (len < 0 || i.toLong + 12 + len > b.length) return None
      val typ = new String(b, i + 4, 4, "US-ASCII")
      typ match {
        case "IDAT" => idat.write(b, i + 8, len)
        case "PLTE" => plte = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len)
        case "IEND" => done = true
        case _ => ()
      }
      i += 12 + len
    }
    if (colorType == 3 && (plte == null || plte.length % 3 != 0)) return None
    // inflate + unfilter SCANLINE-BY-SCANLINE with a two-row window
    // (cur/prev), expanding each row straight into the RGB output —
    // no whole-image raw or recon buffer ever exists, so the only
    // image-sized allocation is the output itself (see MaxPixels)
    val stride = width * channels
    val bpp = channels
    val rgb = new Array[Byte](width * height * 3)
    val rowBuf = new Array[Byte](1 + stride) // filter byte + samples
    var cur = new Array[Byte](stride) // unfiltered current row
    var prev = new Array[Byte](stride) // unfiltered previous row
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var y = 0
      while (y < height) {
        var off = 0
        while (off < rowBuf.length) {
          val n = inf.inflate(rowBuf, off, rowBuf.length - off)
          if (n == 0 && (inf.finished() || inf.needsInput() || inf.needsDictionary()))
            return None
          off += n
        }
        val filter = rowBuf(0) & 0xFF
        var x = 0
        while (x < stride) {
          val v = rowBuf(1 + x) & 0xFF
          val a = if (x >= bpp) cur(x - bpp) & 0xFF else 0
          val up = if (y > 0) prev(x) & 0xFF else 0
          val c = if (x >= bpp && y > 0) prev(x - bpp) & 0xFF else 0
          val pred = filter match {
            case 0 => 0
            case 1 => a
            case 2 => up
            case 3 => (a + up) / 2
            case 4 => // Paeth
              val p = a + up - c
              val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
            case _ => return None
          }
          cur(x) = ((v + pred) & 0xFF).toByte
          x += 1
        }
        // expand this row to RGB
        var p = y * width * 3
        var s = 0
        var k = 0
        while (k < width) {
          colorType match {
            case 0 => val g = cur(s); rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g; s += 1
            case 2 => rgb(p) = cur(s); rgb(p + 1) = cur(s + 1); rgb(p + 2) = cur(s + 2); s += 3
            case 3 =>
              val idx = (cur(s) & 0xFF) * 3
              if (idx + 2 >= plte.length) return None
              rgb(p) = plte(idx); rgb(p + 1) = plte(idx + 1)
              rgb(p + 2) = plte(idx + 2); s += 1
            case 4 => val g = cur(s); rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g; s += 2
            case 6 => rgb(p) = cur(s); rgb(p + 1) = cur(s + 1); rgb(p + 2) = cur(s + 2); s += 4
          }
          p += 3
          k += 1
        }
        val t = prev; prev = cur; cur = t // swap the two-row window
        y += 1
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    Some(PixelImage(width, height, rgb))
  }

  /** BMP 24-bpp uncompressed pixel decode: BGR samples, rows padded to
    * 4 bytes, bottom-up unless height is negative (top-down). */
  def decodeBmpPixels(b: Array[Byte]): Option[PixelImage] = {
    if (bmp(b).isEmpty || b.length < 34 || le32(b, 14) < 40) return None
    val dataOff = le32(b, 10)
    val width = le32(b, 18)
    val rawH = le32(b, 22)
    // long abs: math.abs(Int.MinValue) stays negative and would slide
    // through every product guard below (negative products pass `>`)
    val heightL = math.abs(rawH.toLong)
    val bits = le16(b, 28)
    val compression = le32(b, 30)
    if (bits != 24 || compression != 0 || width <= 0 || heightL == 0) return None
    // overflow guards mirroring the PNG cap: corrupt huge/negative
    // header fields must return None, not wrap Int math past the
    // bounds check and crash the task mid-extraction
    if (dataOff < 54 || width.toLong * heightL > MaxPixels) return None
    val height = heightL.toInt
    val rowBytes = ((width.toLong * 3 + 3) & ~3L).toInt
    if (dataOff.toLong + rowBytes.toLong * height > b.length) return None
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      // row 0 of the file is the BOTTOM image row when height > 0
      val imgY = if (rawH > 0) height - 1 - y else y
      val src = dataOff + y * rowBytes
      var x = 0
      while (x < width) {
        val p = (imgY * width + x) * 3
        rgb(p) = b(src + x * 3 + 2)     // R
        rgb(p + 1) = b(src + x * 3 + 1) // G
        rgb(p + 2) = b(src + x * 3)     // B
        x += 1
      }
      y += 1
    }
    Some(PixelImage(width, height, rgb))
  }

  /** GIF pixel decode (GIF87a/89a, public spec): first image frame,
    * LZW-decompressed, palette-expanded to RGB. Handles global/local
    * color tables, extension blocks, interlaced row order, and the
    * full LZW code-table lifecycle (clear codes, width growth to 12
    * bits). Corrupt streams → None. */
  def decodeGifPixels(b: Array[Byte]): Option[PixelImage] = {
    if (gif(b).isEmpty || b.length < 13) return None
    val flags = u8(b, 10)
    var i = 13
    var gct: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 3 * (1 << ((flags & 7) + 1))
      if (i + n > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, i, i + n)
      i += n
    }
    // walk blocks to the first image descriptor
    while (i < b.length) {
      u8(b, i) match {
        case 0x21 => // extension: label + sub-blocks
          i += 2
          while (i < b.length && u8(b, i) != 0) i += 1 + u8(b, i)
          i += 1
        case 0x2C =>
          if (i + 10 > b.length) return None
          val w = le16(b, i + 5)
          val h = le16(b, i + 7)
          val iflags = u8(b, i + 9)
          if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
          i += 10
          var ct = gct
          if ((iflags & 0x80) != 0) {
            val n = 3 * (1 << ((iflags & 7) + 1))
            if (i + n > b.length) return None
            ct = java.util.Arrays.copyOfRange(b, i, i + n)
            i += n
          }
          if (ct == null) return None
          val interlaced = (iflags & 0x40) != 0
          return decodeGifLzw(b, i, w, h, ct, interlaced)
        case 0x3B => return None // trailer before any image
        case _ => return None
      }
    }
    None
  }

  /** LZW decompression of one GIF image's data sub-blocks into
    * palette indices, then RGB expansion. */
  private def decodeGifLzw(b: Array[Byte], start: Int, w: Int, h: Int,
                           ct: Array[Byte], interlaced: Boolean): Option[PixelImage] = {
    if (start >= b.length) return None
    val minCode = u8(b, start)
    if (minCode < 2 || minCode > 11) return None
    // concatenate the data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var i = start + 1
    while (i < b.length && u8(b, i) != 0) {
      val n = u8(b, i)
      if (i + 1 + n > b.length) return None
      data.write(b, i + 1, n)
      i += 1 + n
    }
    val bytes = data.toByteArray
    val clear = 1 << minCode
    val eoi = clear + 1
    // code table: prefix link + suffix byte per code, max 4096
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = eoi + 1
    var width = minCode + 1
    val nPix = w * h
    val idx = new Array[Int](nPix)
    var out = 0
    var bitPos = 0
    var prev = -1
    val stack = new Array[Int](4097)
    def readCode(): Int = {
      if (bitPos + width > bytes.length * 8) return -1
      var v = 0
      var k = 0
      while (k < width) {
        val bit = bitPos + k
        if ((bytes(bit >> 3) >> (bit & 7) & 1) != 0) v |= 1 << k
        k += 1
      }
      bitPos += width
      v
    }
    var done = false
    while (!done && out < nPix) {
      val code = readCode()
      if (code < 0 || code == eoi) done = true
      else if (code == clear) {
        next = eoi + 1
        width = minCode + 1
        prev = -1
      } else {
        // expand `code` (or the prev+firstChar special case) via the
        // prefix chain, emit reversed
        if (code >= next && !(code == next && prev >= 0)) return None
        var sp = 0
        var c = code
        if (c == next) { // KwKwK case: emit prev + first(prev)
          c = prev
          stack(sp) = -1 // placeholder, patched after first char known
          sp += 1
        }
        while (c >= clear + 2) { // composite code
          stack(sp) = suffix(c); sp += 1; c = prefix(c)
        }
        val first = c // a literal (< clear)
        if (stack.nonEmpty && sp > 0 && stack(0) == -1) stack(0) = first
        // emit first + reversed stack
        if (out < nPix) { idx(out) = first; out += 1 }
        var k = sp - 1
        while (k >= 0 && out < nPix) { idx(out) = stack(k); out += 1; k -= 1 }
        // grow the table
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          next += 1
          if (next < 4096 && (next & (next - 1)) == 0 && width < 12) width += 1
        }
        prev = code
      }
    }
    if (out < nPix) return None
    // palette-expand, undoing interlace row order if set
    val rgb = new Array[Byte](nPix * 3)
    val rowOrder: Array[Int] =
      if (!interlaced) Array.tabulate(h)(identity)
      else {
        val order = new Array[Int](h)
        var r = 0
        for ((start0, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)); y <- start0 until h by step) {
          order(r) = y; r += 1
        }
        order
      }
    var row = 0
    while (row < h) {
      val imgY = rowOrder(row)
      var x = 0
      while (x < w) {
        val pi = idx(row * w + x) * 3
        if (pi + 2 >= ct.length) return None
        val p = (imgY * w + x) * 3
        rgb(p) = ct(pi); rgb(p + 1) = ct(pi + 1); rgb(p + 2) = ct(pi + 2)
        x += 1
      }
      row += 1
    }
    Some(PixelImage(w, h, rgb))
  }

  // ---- deterministic VALID container builders (test-data side) ----

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
                       body: Array[Byte]): Unit = {
    val len = java.nio.ByteBuffer.allocate(4).putInt(body.length).array()
    out.write(len)
    val tb = typ.getBytes("US-ASCII")
    out.write(tb)
    out.write(body)
    val crc = new java.util.zip.CRC32()
    crc.update(tb)
    crc.update(body)
    out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
  }

  /** Minimal valid 8-bit RGB non-interlaced PNG; pixel bytes from
    * `payload` cyclically. Each row's filter type cycles 0..4, and the
    * encoder APPLIES the filter (raw = sample − predictor mod 256), so
    * a round-trip through [[decodePngPixels]] exercises every
    * unfilter branch, not just None. */
  def buildPng(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val stride = width * 3
    val bpp = 3
    val pix = new Array[Int](height * stride)
    var i = 0
    while (i < pix.length) {
      pix(i) = if (payload.nonEmpty) payload(i % payload.length) & 0xFF else 0
      i += 1
    }
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val filter = y % 5
      raw(y * (1 + stride)) = filter.toByte
      var x = 0
      while (x < stride) {
        val v = pix(y * stride + x)
        val a = if (x >= bpp) pix(y * stride + x - bpp) else 0
        val up = if (y > 0) pix((y - 1) * stride + x) else 0
        val c = if (x >= bpp && y > 0) pix((y - 1) * stride + x - bpp) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => a
          case 2 => up
          case 3 => (a + up) / 2
          case 4 =>
            val p = a + up - c
            val pa = math.abs(p - a); val pb = math.abs(p - up); val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) up else c
        }
        raw(y * (1 + stride) + 1 + x) = ((v - pred) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw)
    def_.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!def_.finished()) comp.write(buf, 0, def_.deflate(buf))
    def_.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type RGB
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", comp.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }


  /** Minimal valid 24-bpp BMP of the given size; pixel bytes are taken
    * from `payload` cyclically (rows padded to 4-byte boundaries). */
  def buildBmp(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val dataSize = rowBytes * height
    val fileSize = 54 + dataSize
    val out = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    out.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var i = 0
    while (i < dataSize) {
      out.put(if (payload.nonEmpty) payload(i % payload.length) else 0.toByte)
      i += 1
    }
    out.array()
  }

  /** Minimal valid GIF89a: 256-entry grayscale palette, pixel indices
    * from `payload` cyclically. LZW body uses literal codes with a
    * clear code every 254 symbols, so code width stays 9 bits — a
    * valid stream any GIF decoder accepts (the classic
    * "uncompressed GIF" technique). */
  def buildGif(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16w(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    le16w(width); le16w(height)
    out.write(0xF7) // GCT present, 256 entries
    out.write(0); out.write(0)
    var ci = 0
    while (ci < 256) { out.write(ci); out.write(ci); out.write(ci); ci += 1 }
    out.write(0x2C); le16w(0); le16w(0); le16w(width); le16w(height); out.write(0)
    out.write(8) // LZW minimum code size
    val body = new java.io.ByteArrayOutputStream()
    var acc = 0L
    var nacc = 0
    def putCode(c: Int): Unit = {
      acc |= c.toLong << nacc; nacc += 9
      while (nacc >= 8) { body.write((acc & 0xFF).toInt); acc >>= 8; nacc -= 8 }
    }
    val nPix = width * height
    putCode(256) // clear
    var k = 0
    while (k < nPix) {
      if (k > 0 && k % 254 == 0) putCode(256)
      putCode(if (payload.nonEmpty) payload(k % payload.length) & 0xFF else 0)
      k += 1
    }
    putCode(257) // end of information
    if (nacc > 0) body.write((acc & 0xFF).toInt)
    val bb = body.toByteArray
    var off = 0
    while (off < bb.length) {
      val n = math.min(255, bb.length - off)
      out.write(n); out.write(bb, off, n); off += n
    }
    out.write(0)    // block terminator
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Minimal valid 8-bit mono PCM WAV; sample bytes from `payload`. */
  /** Minimal valid MP4: ftyp(20) + moov(216) = mvhd v0(108) +
    * trak(100) = tkhd v0(92), + mdat(8 + nData) — total size has the
    * closed form 244 + nData, which the m02 oracle restates in SQL.
    * Timescale 1000 so mvhd duration IS milliseconds; width/height as
    * 16.16 fixed-point. */
  def buildMp4(durationMs: Int, width: Int, height: Int, nData: Int,
               payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(244 + nData) // big-endian default
    out.putInt(20).put("ftyp".getBytes).put("isom".getBytes).putInt(0).put("isom".getBytes)
    out.putInt(216).put("moov".getBytes)
    out.putInt(108).put("mvhd".getBytes)
      .putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // ctime mtime
      .putInt(1000).putInt(durationMs) // timescale 1000 → duration in ms
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate 1.0, volume 1.0
      .putInt(0).putInt(0) // reserved(8)
      .putInt(0x00010000).putInt(0).putInt(0) // unity matrix (36 B)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // pre_defined(24)
      .putInt(2) // next_track_ID
    out.putInt(100).put("trak".getBytes)
    out.putInt(92).put("tkhd".getBytes)
      .putInt(7) // version 0 + flags (enabled|in-movie|in-preview)
      .putInt(0).putInt(0) // ctime mtime
      .putInt(1).putInt(0) // track_ID, reserved
      .putInt(durationMs)
      .putInt(0).putInt(0) // reserved(8)
      .putShort(0).putShort(0).putShort(0).putShort(0) // layer alt_group volume reserved
      .putInt(0x00010000).putInt(0).putInt(0) // unity matrix (36 B)
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(width << 16).putInt(height << 16) // 16.16 fixed
    out.putInt(8 + nData).put("mdat".getBytes)
    var i = 0
    while (i < nData) {
      out.put(if (payload.nonEmpty) payload(i % payload.length) else 0.toByte)
      i += 1
    }
    out.array()
  }

  def buildWav(sampleRate: Int, nSamples: Int, payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(44 + nSamples)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(36 + nSamples).put("WAVE".getBytes)
    out.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(sampleRate).putInt(sampleRate).putShort(1).putShort(8)
    out.put("data".getBytes).putInt(nSamples)
    var i = 0
    while (i < nSamples) {
      out.put(if (payload.nonEmpty) payload(i % payload.length) else 0.toByte)
      i += 1
    }
    out.array()
  }
}
