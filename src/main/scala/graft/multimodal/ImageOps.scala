package graft.multimodal

/** Pixel-level image operations for the multimodal pipeline: resize
  * (integer area-average) and a perceptual hash over the resized
  * luma. Everything is integer arithmetic end-to-end, so results are
  * bit-identical across JVMs AND across language boundaries — the
  * m04 oracle recomputes the full chain in pure Python.
  *
  * The perceptual hash is the classic DCT-pHash recipe with the DCT
  * replaced by a sequency-ordered Walsh-Hadamard transform: WHT rows
  * are ±1 patterns (pure integer adds), and ordering rows by
  * sequency (sign-change count) gives the same low-frequency
  * energy-compaction role the low DCT band plays. A float DCT would
  * hash-diverge between libm implementations; the WHT cannot.
  */
object ImageOps {

  /** Rec.601 integer luma (the standard 8-bit fixed-point form). */
  @inline def luma(r: Int, g: Int, b: Int): Int = (77 * r + 150 * g + 29 * b) >> 8

  /** Area-average resize of an interleaved-RGB image to W×H luma.
    * Each target cell averages the source box [floor(i·h/H),
    * floor((i+1)·h/H)) (at least one pixel — nearest sample when
    * upscaling), round-half-up. Deterministic integer math. */
  def resizeLuma(img: MediaCodec.PixelImage, outW: Int, outH: Int): Array[Int] = {
    val (w, h) = (img.width, img.height)
    val out = new Array[Int](outW * outH)
    var i = 0
    while (i < outH) {
      val y0 = i * h / outH
      val y1 = math.max(y0 + 1, (i + 1) * h / outH)
      var j = 0
      while (j < outW) {
        val x0 = j * w / outW
        val x1 = math.max(x0 + 1, (j + 1) * w / outW)
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = (y * w + x) * 3
            sum += luma(img.rgb(p) & 0xFF, img.rgb(p + 1) & 0xFF, img.rgb(p + 2) & 0xFF)
            x += 1
          }
          y += 1
        }
        val cnt = (y1 - y0).toLong * (x1 - x0)
        out(i * outW + j) = ((2 * sum + cnt) / (2 * cnt)).toInt // round-half-up
        j += 1
      }
      i += 1
    }
    out
  }

  /** Hadamard (natural-order) row index for sequency `s` over 32
    * points: bit-reverse(gray(s)) in 5 bits. */
  private[multimodal] def seqRow(s: Int): Int = {
    val g = s ^ (s >> 1)
    var (rev, k) = (0, 0)
    while (k < 5) { rev = (rev << 1) | ((g >> k) & 1); k += 1 }
    rev
  }

  /** 63-bit perceptual hash of a 32×32 luma grid: 2-D sequency-
    * ordered WHT, coefficients (u,v) ∈ [0,8)² except (0,0), bit set
    * iff coefficient > lower-median of the 63. */
  def phash64(luma32: Array[Int]): Long = {
    require(luma32.length == 32 * 32)
    val rows = (0 until 8).map(seqRow).toArray
    val coeffs = new Array[Long](63)
    var idx = 0
    var u = 0
    while (u < 8) {
      val hu = rows(u)
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          val hv = rows(v)
          var acc = 0L
          var y = 0
          while (y < 32) {
            val sy = if (java.lang.Integer.bitCount(hu & y) % 2 == 0) 1 else -1
            var x = 0
            while (x < 32) {
              val sx = if (java.lang.Integer.bitCount(hv & x) % 2 == 0) 1 else -1
              acc += sy * sx * luma32(y * 32 + x)
              x += 1
            }
            y += 1
          }
          coeffs(idx) = acc
          idx += 1
        }
        v += 1
      }
      u += 1
    }
    val sorted = coeffs.clone().sorted
    val med = sorted(31) // lower median of 63
    var hash = 0L
    var k = 0
    while (k < 63) {
      if (coeffs(k) > med) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** Perceptual hash of a decoded image: resize to 32×32 luma, WHT
    * hash. */
  def phash(img: MediaCodec.PixelImage): Long = phash64(resizeLuma(img, 32, 32))
}
