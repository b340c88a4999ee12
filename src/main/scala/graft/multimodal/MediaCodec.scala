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

  // ---- deterministic VALID container builders (test-data side) ----

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

  /** Minimal valid 8-bit mono PCM WAV; sample bytes from `payload`. */
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
