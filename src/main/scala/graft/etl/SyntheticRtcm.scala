package graft.etl

import graft.rtcm._

/** Deterministic synthetic RTCM traffic (seeded java.util.Random — the
  * LCG is spec-fixed, so output is stable across JVMs). Drives the
  * end-to-end pipeline queries and tests (FIXTURES.md §1-§2) without
  * reading anything outside the repo.
  */
object SyntheticRtcm {
  /** 2024-01-01T00:00:00Z in µs. */
  final val T0Micros: Long = 1704067200L * 1000000L

  private val msm7Gps = 1077
  private val msm5Glonass = 1085
  private val msm5Galileo = 1095

  def mountPoints(n: Int): Seq[String] = (1 to n).map(i => f"MNT$i%02d")

  private def mask(n: Int, bits: Seq[Int]): Array[Boolean] = {
    val m = new Array[Boolean](n)
    bits.foreach(b => m(b) = true)
    m
  }

  /** Build one deterministic MSM message. */
  def msm(rnd: java.util.Random, msgType: Int, stationId: Int, epochMs: Long): MsmMessage = {
    val nSats = 4 + rnd.nextInt(5)
    val nSignals = 2 + rnd.nextInt(2)
    val sr = new scala.util.Random(rnd)
    val satBits = sr.shuffle((0 until 64).toList).take(nSats).sorted
    val sigPool = SignalTables.signalNames(SignalTables.msmConstellation(msgType))
      .zipWithIndex.collect { case (n, i) if n != "Res" => i }
    val sigBits = sr.shuffle(sigPool.toList).take(nSignals).sorted
    val cellMask = Array.fill(nSats * nSignals)(rnd.nextInt(4) != 0) // ~75% present
    val nCells = cellMask.count(identity)
    val glonass = msgType >= 1081 && msgType <= 1087
    val header = MsmHeader(msgType, stationId, epochMs,
      multipleMessage = false, issueOfDataStation = 0, clockSteering = 0,
      externalClock = 0, smoothing = false, smoothingInterval = 0,
      satMask = mask(64, satBits), signalMask = mask(32, sigBits),
      cellMask = cellMask, glonassDow = if (glonass) Some(3) else None)
    val flavor = msgType % 10
    val hasRate = flavor == 5 || flavor == 7
    val sats = Array.fill(nSats)(MsmSat(
      roughRangeInt = 60 + rnd.nextInt(80),
      extendedInfo = 0,
      roughRangeMod = rnd.nextInt(1024),
      roughRangeRate = if (hasRate) rnd.nextInt(1000) - 500 else 0))
    val cells = Array.fill(nCells)(MsmCell(
      codeFine = (rnd.nextInt(1 << 14) - (1 << 13)).toLong,
      phaseFine = (rnd.nextInt(1 << 21) - (1 << 20)).toLong,
      lockTime = rnd.nextInt(if (flavor >= 6) 1024 else 16),
      halfCycleAmbiguity = rnd.nextBoolean(),
      cnr = rnd.nextInt(if (flavor >= 6) 1024 else 64),
      rateFine = if (hasRate) rnd.nextInt(1 << 14) - (1 << 13) else 0))
    MsmMessage(header, sats, cells)
  }

  /** Deterministic frame sequence for one mountpoint: a mix of MSM7
    * GPS, MSM5 GLONASS/Galileo, ARP 1005/1006, legacy 1004/1012 and a
    * 1029 text message, 1 frame/s from T0. */
  def framesFor(mount: String, stationId: Int, nFrames: Int, seed: Long): Seq[(Long, Array[Byte])] = {
    val rnd = new java.util.Random(seed)
    (0 until nFrames).map { i =>
      val receiveMicros = T0Micros + i * 1000000L + rnd.nextInt(1000) * 1000L
      val secOfDay = (receiveMicros / 1000000L) % 86400L
      val epochMs = secOfDay * 1000L + (rnd.nextInt(10)) * 100L
      val frame = (i % 8) match {
        case 0 | 1 | 2 => RtcmEncoder.msmFrame(msm(rnd, msm7Gps, stationId, epochMs))
        case 3 | 4     => RtcmEncoder.msmFrame(msm(rnd, msm5Glonass, stationId, epochMs))
        case 5         => RtcmEncoder.msmFrame(msm(rnd, msm5Galileo, stationId, epochMs))
        case 6 =>
          val withH = i % 16 == 6
          RtcmEncoder.arpFrame(ArpMessage(if (withH) 1006 else 1005, stationId,
            35000000000L + rnd.nextInt(1000000), 9000000000L + rnd.nextInt(1000000),
            52000000000L + rnd.nextInt(1000000), if (withH) Some(rnd.nextInt(60000).toLong) else None))
        case 7 =>
          if (i % 16 == 7) RtcmEncoder.legacyFrame(LegacyObsMessage(1004, stationId, epochMs, 1 + rnd.nextInt(8)))
          else RtcmEncoder.textFrame(TextMessage(1029, stationId, 60310, secOfDay.toInt, 5, "hello"))
      }
      (receiveMicros, frame)
    }
  }

  /** Shred a mountpoint's frames into transport chunks with garbage
    * prefixes and mid-frame splits (exercises the alignment/realign
    * paths of RtcmFraming deterministically). */
  def chunksFor(mount: String, stationId: Int, nFrames: Int, seed: Long): Seq[RawChunk] = {
    val rnd = new java.util.Random(seed ^ 0x5DEECE66DL)
    val frames = framesFor(mount, stationId, nFrames, seed)
    val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
    // deterministic garbage prefix (alignment scan path)
    val garbage = new Array[Byte](17)
    rnd.nextBytes(garbage)
    bytes ++= garbage.map(b => if (b == RtcmFraming.Preamble) 0.toByte else b)
    frames.foreach { case (_, f) =>
      bytes ++= f
      if (rnd.nextInt(10) == 0) { // occasional inter-frame noise
        val g = new Array[Byte](1 + rnd.nextInt(5))
        rnd.nextBytes(g)
        bytes ++= g.map(b => if (b == RtcmFraming.Preamble) 0.toByte else b)
      }
    }
    // split into chunks of 64..575 bytes
    val all = bytes.toArray
    val out = Vector.newBuilder[RawChunk]
    var pos = 0
    var seq = 0L
    while (pos < all.length) {
      val len = math.min(64 + rnd.nextInt(512), all.length - pos)
      // one receive timestamp per read burst (reference stamps once per
      // read, src/ntripclient.py:454-456): chunks arrive every 0.5 s
      val receiveMicros = T0Micros + seq * 500000L
      out += RawChunk(mount, receiveMicros, seq, java.util.Arrays.copyOfRange(all, pos, pos + len))
      pos += len
      seq += 1
    }
    out.result()
  }

  /** Full deterministic corpus: `nMounts` mountpoints × `nFrames`. */
  def corpus(nMounts: Int, nFrames: Int): Seq[RawChunk] =
    mountPoints(nMounts).zipWithIndex.flatMap { case (m, i) =>
      chunksFor(m, 100 + i, nFrames, seed = 42L + i)
    }
}
