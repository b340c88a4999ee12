package graft.rtcm

/** Decoded RTCM v3 message IR — the typed equivalent of the
  * reference's `[head, satData, signalData]` lists
  * (reference: src/rtcm3.py:114-175).
  */
sealed trait RtcmMessage {
  def messageType: Int
}

/** MSM header (types 1071–1127; reference: src/rtcm3.py:98-111,360-366).
  * For GLONASS MSM (1081–1087) the 30-bit epoch field carries
  * 3-bit day-of-week + 27-bit time-of-day-ms; `epochMs` is then the
  * 27-bit TOD and `glonassDow` the DOW (src/rtcm3.py:106-110).
  */
final case class MsmHeader(
    messageType: Int,
    stationId: Int,
    epochMs: Long,
    multipleMessage: Boolean,
    issueOfDataStation: Int,
    clockSteering: Int,
    externalClock: Int,
    smoothing: Boolean,
    smoothingInterval: Int,
    satMask: Array[Boolean],   // 64 bits, index i → satellite i+1
    signalMask: Array[Boolean], // 32 bits, index i → signal-table row i
    cellMask: Array[Boolean],   // numSats × numSignals bits
    glonassDow: Option[Int])

/** Per-satellite MSM fields (field widths vary by MSM flavor; unused
  * fields are 0 / -1). Flavors (reference: src/rtcm3.py:367-374):
  * MSM1/2/3: roughRangeMod only; MSM4/6: +roughRangeInt;
  * MSM5/7: +extendedInfo +roughRangeRate. */
final case class MsmSat(
    roughRangeInt: Int,    // uint8 integer milliseconds (MSM4-7)
    extendedInfo: Int,     // uint4 (MSM5/7)
    roughRangeMod: Int,    // uint10 1/1024 ms
    roughRangeRate: Int)   // int14 m/s (MSM5/7)

/** Per-cell (satellite × signal) MSM fields, semantic order shared by
  * MSM5 (int15/int22/uint4/bool/uint6/int15) and MSM7
  * (int20/int24/uint10/bool/uint10/int15); MSM1-4/6 fill the fields
  * they carry (reference: src/rtcm3.py:376-391). */
final case class MsmCell(
    codeFine: Long,
    phaseFine: Long,
    lockTime: Int,
    halfCycleAmbiguity: Boolean,
    cnr: Int,
    rateFine: Int)

final case class MsmMessage(
    header: MsmHeader,
    sats: Array[MsmSat],
    cells: Array[MsmCell]) extends RtcmMessage {
  def messageType: Int = header.messageType
  def satCount: Int = sats.length
}

/** Station antenna reference point, types 1005/1006
  * (reference: src/rtcm3.py:133-147,344-357). ECEF in 0.1 mm units. */
final case class ArpMessage(
    messageType: Int,
    stationId: Int,
    ecefX: Long,
    ecefY: Long,
    ecefZ: Long,
    antennaHeight: Option[Long]) extends RtcmMessage

/** Legacy GPS/GLONASS RTK observables 1001–1004 / 1009–1012: decoded
  * structurally (satCount from the header, obs bits validated) but —
  * matching the reference — never expanded to observation rows
  * (reference: src/decoderclasses.py:84-87 DECODER_MAP has no entry).
  */
final case class LegacyObsMessage(
    messageType: Int,
    stationId: Int,
    epoch: Long,     // GPS TOW ms (30 bit) or GLONASS TOD ms (27 bit)
    satCount: Int) extends RtcmMessage

/** Unicode text message 1029 (reference: src/rtcm3.py:80-96,342). */
final case class TextMessage(
    messageType: Int,
    stationId: Int,
    mjd: Int,
    utcSeconds: Int,
    utfChars: Int,
    text: String) extends RtcmMessage

/** Message types with no structural decoder — metadata row only
  * (reference: src/rtcm3.py:171-172 "Message type not implemented"). */
final case class OpaqueMessage(messageType: Int) extends RtcmMessage
