package graft.rtcm

/** RTCM v3 payload decoder: bytes → typed message IR.
  *
  * Layouts follow the reference's bitstring typesets
  * (reference: src/rtcm3.py:114-175,315-391) but are implemented as
  * straight-line reads into case classes — no reflection, suitable for
  * per-row use inside `Dataset.flatMap`.
  */
object RtcmDecoder {

  /** Decode a complete frame (3-byte header + payload + 3-byte CRC).
    * CRC is assumed already validated by the framing layer. */
  def decodeFrame(frame: Array[Byte]): RtcmMessage = {
    require(frame.length >= 6, "frame too short")
    decodePayload(frame, 3, frame.length - 3)
  }

  /** Decode the payload region bytes[from, until). */
  def decodePayload(bytes: Array[Byte], from: Int, until: Int): RtcmMessage = {
    val r = new BitReader(java.util.Arrays.copyOfRange(bytes, from, until))
    val messageType = new BitReader(r.bytes).uint(12).toInt
    messageType match {
      case t if t >= 1001 && t <= 1004 => decodeLegacyGps(r)
      case t if t >= 1009 && t <= 1012 => decodeLegacyGlonass(r)
      case 1005 | 1006                 => decodeArp(r)
      case t if isMsm(t)               => decodeMsm(r)
      case 1029                        => decodeText(r)
      case t                           => OpaqueMessage(t)
    }
  }

  def isMsm(t: Int): Boolean =
    (t >= 1071 && t <= 1077) || (t >= 1081 && t <= 1087) ||
      (t >= 1091 && t <= 1097) || (t >= 1101 && t <= 1107) ||
      (t >= 1111 && t <= 1117) || (t >= 1121 && t <= 1127)

  // ---- legacy GPS 1001-1004 (reference: src/rtcm3.py:320-328) ----
  private def decodeLegacyGps(r: BitReader): LegacyObsMessage = {
    val t = r.uint(12).toInt
    val stationId = r.uint(12).toInt
    val tow = r.uint(30)
    r.bool() // synchronous flag
    val satCount = r.uint(5).toInt
    r.bool(); r.skip(3) // smoothing + interval
    val obsBits = t match {
      case 1001 => 58; case 1002 => 74; case 1003 => 110; case 1004 => 134
    }
    var i = 0
    while (i < satCount) { r.skip(obsBits); i += 1 } // structural validation
    LegacyObsMessage(t, stationId, tow, satCount)
  }

  // ---- legacy GLONASS 1009-1012 (reference: src/rtcm3.py:331-339) ----
  private def decodeLegacyGlonass(r: BitReader): LegacyObsMessage = {
    val t = r.uint(12).toInt
    val stationId = r.uint(12).toInt
    val tod = r.uint(27)
    r.bool()
    val satCount = r.uint(5).toInt
    r.bool(); r.skip(3)
    val obsBits = t match {
      case 1009 => 63; case 1010 => 79; case 1011 => 115; case 1012 => 139
    }
    var i = 0
    while (i < satCount) { r.skip(obsBits); i += 1 }
    LegacyObsMessage(t, stationId, tod, satCount)
  }

  // ---- station ARP 1005/1006 (reference: src/rtcm3.py:344-357) ----
  private def decodeArp(r: BitReader): ArpMessage = {
    val t = r.uint(12).toInt
    val stationId = r.uint(12).toInt
    r.skip(6)            // ITRF realization year
    r.bool(); r.bool(); r.bool() // GPS/GLONASS/Galileo indicators
    r.bool()             // reference-station indicator
    val x = r.int(38)
    r.bool()             // single receiver oscillator
    r.skip(1)
    val y = r.int(38)
    r.skip(2)
    val z = r.int(38)
    val antHgt = if (t == 1006) Some(r.uint(16)) else None
    ArpMessage(t, stationId, x, y, z, antHgt)
  }

  // ---- text 1029 (reference: src/rtcm3.py:342) ----
  private def decodeText(r: BitReader): TextMessage = {
    val t = r.uint(12).toInt
    val stationId = r.uint(12).toInt
    val mjd = r.uint(16).toInt
    val utc = r.uint(17).toInt
    val utfChars = r.uint(7).toInt
    val charBytes = r.uint(8).toInt
    val sb = new Array[Byte](charBytes)
    var i = 0
    while (i < charBytes) { sb(i) = r.uint(8).toByte; i += 1 }
    TextMessage(t, stationId, mjd, utc, utfChars, new String(sb, "UTF-8"))
  }

  // ---- MSM 1071-1127 (reference: src/rtcm3.py:98-111,149-167,360-391) ----
  private def decodeMsm(r: BitReader): MsmMessage = {
    val t = r.uint(12).toInt
    val stationId = r.uint(12).toInt
    val rawEpoch = r.uint(30)
    val multiple = r.bool()
    val iods = r.uint(3).toInt
    r.skip(7) // reserved
    val clockSteering = r.uint(2).toInt
    val extClock = r.uint(2).toInt
    val smoothing = r.bool()
    val smoothingInterval = r.uint(3).toInt
    val satMask = r.mask(64)
    val signalMask = r.mask(32)
    val numSats = satMask.count(identity)
    val numSignals = signalMask.count(identity)
    val cellMask = r.mask(numSats * numSignals)
    val numCells = cellMask.count(identity)

    // GLONASS epoch: 3-bit day-of-week + 27-bit time-of-day-ms packed
    // into the 30-bit epoch field (reference: src/rtcm3.py:106-110).
    val (epochMs, gloDow) =
      if (t >= 1081 && t <= 1087) (rawEpoch & ((1L << 27) - 1), Some((rawEpoch >> 27).toInt))
      else (rawEpoch, None)

    val header = MsmHeader(t, stationId, epochMs, multiple, iods, clockSteering,
      extClock, smoothing, smoothingInterval, satMask, signalMask, cellMask, gloDow)

    // Field-major on the wire: all field-1 values, then all field-2 …
    // (reference reads "N*uint:w" per field then transposes,
    // src/rtcm3.py:159-166; we read field-major directly into arrays).
    val flavor = t % 10
    val sats = Array.fill(numSats)(MsmSat(0, 0, 0, 0))
    def readSatField(width: Int, signed: Boolean): Array[Long] = {
      val a = new Array[Long](numSats)
      var i = 0
      while (i < numSats) { a(i) = if (signed) r.int(width) else r.uint(width); i += 1 }
      a
    }
    flavor match {
      case 1 | 2 | 3 =>
        val mod = readSatField(10, signed = false)
        var i = 0
        while (i < numSats) { sats(i) = MsmSat(0, 0, mod(i).toInt, 0); i += 1 }
      case 4 | 6 =>
        val ri = readSatField(8, signed = false)
        val mod = readSatField(10, signed = false)
        var i = 0
        while (i < numSats) { sats(i) = MsmSat(ri(i).toInt, 0, mod(i).toInt, 0); i += 1 }
      case 5 | 7 =>
        val ri = readSatField(8, signed = false)
        val ext = readSatField(4, signed = false)
        val mod = readSatField(10, signed = false)
        val rate = readSatField(14, signed = true)
        var i = 0
        while (i < numSats) {
          sats(i) = MsmSat(ri(i).toInt, ext(i).toInt, mod(i).toInt, rate(i).toInt)
          i += 1
        }
      case other => throw new IllegalArgumentException(s"MSM flavor $other")
    }

    def readCellField(width: Int, signed: Boolean): Array[Long] = {
      val a = new Array[Long](numCells)
      var i = 0
      while (i < numCells) { a(i) = if (signed) r.int(width) else r.uint(width); i += 1 }
      a
    }
    val cells: Array[MsmCell] = flavor match {
      case 1 =>
        val code = readCellField(15, signed = true)
        code.map(c => MsmCell(c, 0L, 0, halfCycleAmbiguity = false, 0, 0))
      case 2 =>
        val phase = readCellField(22, signed = true)
        val lock = readCellField(4, signed = false)
        val half = readCellField(1, signed = false)
        Array.tabulate(numCells)(i =>
          MsmCell(0L, phase(i), lock(i).toInt, half(i) == 1L, 0, 0))
      case 3 | 4 | 5 =>
        val code = readCellField(15, signed = true)
        val phase = readCellField(22, signed = true)
        val lock = readCellField(4, signed = false)
        val half = readCellField(1, signed = false)
        val cnr = if (flavor >= 4) readCellField(6, signed = false) else new Array[Long](numCells)
        val rate = if (flavor == 5) readCellField(15, signed = true) else new Array[Long](numCells)
        Array.tabulate(numCells)(i =>
          MsmCell(code(i), phase(i), lock(i).toInt, half(i) == 1L, cnr(i).toInt, rate(i).toInt))
      case 6 | 7 =>
        val code = readCellField(20, signed = true)
        val phase = readCellField(24, signed = true)
        val lock = readCellField(10, signed = false)
        val half = readCellField(1, signed = false)
        val cnr = readCellField(10, signed = false)
        val rate = if (flavor == 7) readCellField(15, signed = true) else new Array[Long](numCells)
        Array.tabulate(numCells)(i =>
          MsmCell(code(i), phase(i), lock(i).toInt, half(i) == 1L, cnr(i).toInt, rate(i).toInt))
    }
    MsmMessage(header, sats, cells)
  }
}
