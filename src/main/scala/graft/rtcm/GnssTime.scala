package graft.rtcm

/** GNSS intra-day epoch → absolute timestamp resolution.
  *
  * Reference semantics (src/decoderclasses.py:18-52): the message
  * carries only milliseconds-of-day; the absolute date comes from the
  * receiver clock with a day-rollover heuristic (if the observation
  * second-of-day is more than 5 h behind the clock's second-of-day,
  * assume next day), and GLONASS epochs (1009-1012, 1081-1087) are
  * UTC(SU), shifted −3 h.
  *
  * Deliberate, semantics-preserving deviation: the reference mixes the
  * *wall clock* into event time (`time()`), which is untestable and
  * non-reproducible; we derive "now" from the frame's receive
  * timestamp instead (SURVEY.md §7 risk 1) — identical output for live
  * data, deterministic for replay.
  */
object GnssTime {
  private final val MicrosPerSec = 1000000L
  private final val SecPerDay = 86400L

  /** Resolve an epoch to absolute microseconds since the Unix epoch.
    *
    * @param messageType    RTCM message type (selects GLONASS shift)
    * @param epochMs        milliseconds-of-day from the message
    * @param receiveMicros  frame receive time, µs since Unix epoch
    */
  def resolveEpochMicros(messageType: Int, epochMs: Long, receiveMicros: Long): Long = {
    val nowSec = receiveMicros / MicrosPerSec
    val nowSecOfDay = nowSec % SecPerDay
    val nowSecOfDate = nowSec - nowSecOfDay

    val obsSecOfDay = (epochMs / 1000L) % SecPerDay
    val micros = (epochMs % 1000L) * 1000L

    var obsSec = nowSecOfDate + obsSecOfDay
    if (obsSecOfDay - nowSecOfDay < -5L * 3600L) obsSec += SecPerDay
    if ((messageType >= 1009 && messageType <= 1012) ||
        (messageType >= 1081 && messageType <= 1087)) obsSec -= 3L * 3600L
    obsSec * MicrosPerSec + micros
  }
}
