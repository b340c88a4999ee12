package graft.rtcm

/** Big-endian bit cursor over a byte array — the decode substrate for
  * RTCM v3 messages (fields are arbitrary-width big-endian ints).
  * Pure JVM, no Spark dependency; used inside `Dataset.flatMap` so it
  * must be allocation-light.
  *
  * Bit-layout semantics follow the reference's bitstring format
  * strings (reference: src/rtcm3.py:315-391).
  */
final class BitReader(val bytes: Array[Byte], startBit: Int = 0) {
  private var pos: Int = startBit

  def position: Int = pos
  def remaining: Int = bytes.length * 8 - pos

  /** Read an unsigned big-endian field of `n` bits (n <= 63). */
  def uint(n: Int): Long = {
    require(n >= 0 && n <= 63, s"uint width $n")
    require(remaining >= n, s"need $n bits, have $remaining")
    var v = 0L
    var i = 0
    while (i < n) {
      val bit = (bytes(pos >> 3) >> (7 - (pos & 7))) & 1
      v = (v << 1) | bit
      pos += 1
      i += 1
    }
    v
  }

  /** Read a two's-complement signed field of `n` bits. */
  def int(n: Int): Long = {
    val v = uint(n)
    if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
  }

  def bool(): Boolean = uint(1) == 1L

  def skip(n: Int): Unit = {
    require(remaining >= n, s"skip $n bits, have $remaining")
    pos += n
  }

  /** Read `n` bits as a mask, MSB first (mask(0) = first bit on wire). */
  def mask(n: Int): Array[Boolean] = {
    val out = new Array[Boolean](n)
    var i = 0
    while (i < n) { out(i) = bool(); i += 1 }
    out
  }
}

/** Append-only big-endian bit writer (test-fixture / 1029 encode path). */
final class BitWriter {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
  private var bitLen = 0

  def lengthBits: Int = bitLen

  def uint(value: Long, n: Int): this.type = {
    require(n >= 0 && n <= 63 && value >= 0 && (n == 63 || value < (1L << n)),
      s"uint $value does not fit in $n bits")
    var i = n - 1
    while (i >= 0) {
      val bit = ((value >> i) & 1L).toInt
      if ((bitLen & 7) == 0) buf += 0
      if (bit == 1) buf(bitLen >> 3) = (buf(bitLen >> 3) | (1 << (7 - (bitLen & 7)))).toByte
      bitLen += 1
      i -= 1
    }
    this
  }

  def int(value: Long, n: Int): this.type = {
    require(value >= -(1L << (n - 1)) && value < (1L << (n - 1)),
      s"int $value does not fit in $n bits")
    uint(if (value < 0) value + (1L << n) else value, n)
  }

  def bool(b: Boolean): this.type = uint(if (b) 1 else 0, 1)

  def maskBits(m: Array[Boolean]): this.type = { m.foreach(bool); this }

  /** Zero-pad to a byte boundary and return the bytes. */
  def toBytes: Array[Byte] = {
    val out = buf.toArray
    out
  }
}
