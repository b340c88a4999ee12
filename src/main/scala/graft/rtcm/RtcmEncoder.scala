package graft.rtcm

/** RTCM v3 frame builder — fixture/replay generation for tests and the
  * end-to-end pipeline queries (FIXTURES.md §1). Encodes the same wire
  * layouts the decoder reads; decode(encode(x)) == x is property-tested.
  */
object RtcmEncoder {

  /** Wrap an encoded payload in a frame: preamble, 10-bit length, CRC. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    require(payload.length < 1024, "payload must fit 10-bit length")
    val out = new Array[Byte](payload.length + 6)
    out(0) = RtcmFraming.Preamble
    out(1) = ((payload.length >> 8) & 0x03).toByte
    out(2) = (payload.length & 0xFF).toByte
    System.arraycopy(payload, 0, out, 3, payload.length)
    val crc = Crc24q.compute(out, 0, payload.length + 3)
    out(payload.length + 3) = ((crc >> 16) & 0xFF).toByte
    out(payload.length + 4) = ((crc >> 8) & 0xFF).toByte
    out(payload.length + 5) = (crc & 0xFF).toByte
    out
  }

  /** Encode an MSM message (flavors 4/5/6/7 supported). Fields are
    * written field-major, mirroring the wire layout the decoder reads. */
  def encodeMsm(msg: MsmMessage): Array[Byte] = {
    val h = msg.header
    val w = new BitWriter
    w.uint(h.messageType, 12)
    w.uint(h.stationId, 12)
    val rawEpoch = h.glonassDow match {
      case Some(dow) => (dow.toLong << 27) | h.epochMs
      case None => h.epochMs
    }
    w.uint(rawEpoch, 30)
    w.bool(h.multipleMessage)
    w.uint(h.issueOfDataStation, 3)
    w.uint(0, 7) // reserved
    w.uint(h.clockSteering, 2)
    w.uint(h.externalClock, 2)
    w.bool(h.smoothing)
    w.uint(h.smoothingInterval, 3)
    w.maskBits(h.satMask)
    w.maskBits(h.signalMask)
    w.maskBits(h.cellMask)

    val flavor = h.messageType % 10
    flavor match {
      case 4 | 6 =>
        msg.sats.foreach(s => w.uint(s.roughRangeInt, 8))
        msg.sats.foreach(s => w.uint(s.roughRangeMod, 10))
      case 5 | 7 =>
        msg.sats.foreach(s => w.uint(s.roughRangeInt, 8))
        msg.sats.foreach(s => w.uint(s.extendedInfo, 4))
        msg.sats.foreach(s => w.uint(s.roughRangeMod, 10))
        msg.sats.foreach(s => w.int(s.roughRangeRate, 14))
      case other => throw new IllegalArgumentException(s"encode MSM flavor $other")
    }
    flavor match {
      case 4 =>
        msg.cells.foreach(c => w.int(c.codeFine, 15))
        msg.cells.foreach(c => w.int(c.phaseFine, 22))
        msg.cells.foreach(c => w.uint(c.lockTime, 4))
        msg.cells.foreach(c => w.bool(c.halfCycleAmbiguity))
        msg.cells.foreach(c => w.uint(c.cnr, 6))
      case 5 =>
        msg.cells.foreach(c => w.int(c.codeFine, 15))
        msg.cells.foreach(c => w.int(c.phaseFine, 22))
        msg.cells.foreach(c => w.uint(c.lockTime, 4))
        msg.cells.foreach(c => w.bool(c.halfCycleAmbiguity))
        msg.cells.foreach(c => w.uint(c.cnr, 6))
        msg.cells.foreach(c => w.int(c.rateFine, 15))
      case 6 =>
        msg.cells.foreach(c => w.int(c.codeFine, 20))
        msg.cells.foreach(c => w.int(c.phaseFine, 24))
        msg.cells.foreach(c => w.uint(c.lockTime, 10))
        msg.cells.foreach(c => w.bool(c.halfCycleAmbiguity))
        msg.cells.foreach(c => w.uint(c.cnr, 10))
      case 7 =>
        msg.cells.foreach(c => w.int(c.codeFine, 20))
        msg.cells.foreach(c => w.int(c.phaseFine, 24))
        msg.cells.foreach(c => w.uint(c.lockTime, 10))
        msg.cells.foreach(c => w.bool(c.halfCycleAmbiguity))
        msg.cells.foreach(c => w.uint(c.cnr, 10))
        msg.cells.foreach(c => w.int(c.rateFine, 15))
    }
    w.toBytes
  }

  /** Encode a 1005/1006 station ARP payload. */
  def encodeArp(msg: ArpMessage): Array[Byte] = {
    val w = new BitWriter
    w.uint(msg.messageType, 12)
    w.uint(msg.stationId, 12)
    w.uint(0, 6)                      // ITRF year
    w.bool(true); w.bool(true); w.bool(false) // GPS/GLONASS/Galileo
    w.bool(false)                     // reference-station indicator
    w.int(msg.ecefX, 38)
    w.bool(false)                     // oscillator indicator
    w.uint(0, 1)                      // reserved
    w.int(msg.ecefY, 38)
    w.uint(0, 2)                      // quarter-cycle indicator
    w.int(msg.ecefZ, 38)
    msg.antennaHeight.foreach(h => w.uint(h, 16))
    w.toBytes
  }

  /** Encode a 1029 text payload. */
  def encodeText(msg: TextMessage): Array[Byte] = {
    val bytes = msg.text.getBytes("UTF-8")
    val w = new BitWriter
    w.uint(msg.messageType, 12)
    w.uint(msg.stationId, 12)
    w.uint(msg.mjd, 16)
    w.uint(msg.utcSeconds, 17)
    w.uint(msg.text.length, 7)
    w.uint(bytes.length, 8)
    bytes.foreach(b => w.uint(b & 0xFF, 8))
    w.toBytes
  }

  /** Encode a legacy GPS/GLONASS observable payload with zeroed obs
    * blocks (metadata-path fixture). */
  def encodeLegacy(msg: LegacyObsMessage): Array[Byte] = {
    val w = new BitWriter
    val gps = msg.messageType <= 1004
    w.uint(msg.messageType, 12)
    w.uint(msg.stationId, 12)
    w.uint(msg.epoch, if (gps) 30 else 27)
    w.bool(false)
    w.uint(msg.satCount, 5)
    w.bool(false)
    w.uint(0, 3)
    val obsBits = msg.messageType match {
      case 1001 => 58; case 1002 => 74; case 1003 => 110; case 1004 => 134
      case 1009 => 63; case 1010 => 79; case 1011 => 115; case 1012 => 139
    }
    var i = 0
    while (i < msg.satCount * obsBits) { w.uint(0, 1); i += 1 }
    w.toBytes
  }

  def msmFrame(msg: MsmMessage): Array[Byte] = frame(encodeMsm(msg))
  def arpFrame(msg: ArpMessage): Array[Byte] = frame(encodeArp(msg))
  def textFrame(msg: TextMessage): Array[Byte] = frame(encodeText(msg))
  def legacyFrame(msg: LegacyObsMessage): Array[Byte] = frame(encodeLegacy(msg))
}
