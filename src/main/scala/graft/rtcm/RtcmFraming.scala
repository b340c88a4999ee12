package graft.rtcm

/** RTCM v3 frame alignment over an unbounded byte stream.
  *
  * Wire format (reference: src/ntripclient.py:20-21,523-554):
  * {{{
  * frame := 0xD3 | 6 reserved bits | 10-bit payload length
  *        | payload | 24-bit CRC-24Q over everything before it
  * }}}
  *
  * Semantics mirrored from the reference's state machine: scan for the
  * 0xD3 preamble byte-aligned, peek the length, wait for the full
  * frame, CRC-check; on mismatch drop ONE byte and realign
  * (src/ntripclient.py:546-552). State is the residual buffer — kept
  * bounded (maxBuffer) so per-key streaming state can't grow without
  * limit at scale (SURVEY.md §7 risk 6).
  *
  * Pure function of (state, chunk) → (state', frames) so it can run
  * inside `flatMapGroupsWithState` keyed by mountpoint, or be folded
  * over batch rows.
  */
object RtcmFraming {
  final val Preamble: Byte = 0xD3.toByte

  /** Residual undecoded bytes carried between chunks. */
  final case class State(buffer: Array[Byte]) {
    def size: Int = buffer.length
  }
  val emptyState: State = State(Array.emptyByteArray)

  final val DefaultMaxBuffer: Int = 1 << 20 // 1 MiB per mountpoint

  /** Feed one chunk; returns the new state and any complete CRC-valid
    * frames (each including header + payload + CRC). */
  def feed(state: State, chunk: Array[Byte],
           maxBuffer: Int = DefaultMaxBuffer): (State, Vector[Array[Byte]]) = {
    var buf =
      if (state.buffer.isEmpty) chunk
      else {
        val b = new Array[Byte](state.buffer.length + chunk.length)
        System.arraycopy(state.buffer, 0, b, 0, state.buffer.length)
        System.arraycopy(chunk, 0, b, state.buffer.length, chunk.length)
        b
      }
    val frames = Vector.newBuilder[Array[Byte]]
    var start = 0

    def scanPreamble(): Unit = {
      while (start < buf.length && buf(start) != Preamble) start += 1
    }

    var done = false
    while (!done) {
      scanPreamble()
      if (buf.length - start < 6) {
        done = true // not enough bytes for header+CRC
      } else {
        val payloadLen = ((buf(start + 1) & 0x03) << 8) | (buf(start + 2) & 0xFF)
        val frameLen = payloadLen + 6
        if (buf.length - start < frameLen) {
          done = true // incomplete frame: wait for more bytes
        } else {
          val frame = java.util.Arrays.copyOfRange(buf, start, start + frameLen)
          if (Crc24q.frameValid(frame)) {
            frames += frame
            start += frameLen
          } else {
            start += 1 // CRC mismatch: drop one byte, realign
          }
        }
      }
    }
    var residual =
      if (start == 0) buf
      else java.util.Arrays.copyOfRange(buf, start, buf.length)
    // Bound the carried state: a hostile/garbled stream must not grow
    // per-key state without limit. Keep the newest bytes.
    if (residual.length > maxBuffer)
      residual = java.util.Arrays.copyOfRange(residual, residual.length - maxBuffer, residual.length)
    (State(residual), frames.result())
  }

  /** Convenience: extract all frames from a self-contained byte blob. */
  def frames(data: Array[Byte]): Vector[Array[Byte]] = feed(emptyState, data)._2
}
