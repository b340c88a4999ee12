package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Streaming retention tracking — the streaming twin of the batch w06
  * query, built on [[WatermarkOrderedFold]]: cohort_day = a user's
  * first active day, and the user contributes one hit per tracked
  * offset day they return on.
  *
  * Correctness: folding in event-time order makes the first folded
  * day the user's GLOBAL minimum day (the batch cohort), and each
  * tracked (cohort, offset) pair is emitted at most once per user —
  * so counting hits per (cohort_day, offset) downstream equals the
  * batch w06 distinct-user counts exactly. Emissions are final
  * (Append, no retraction).
  */
object StreamingRetention {

  final case class RetentionHit(user_id: Long, cohort_day: Long, offset: Long)
  final case class Machine(cohortDay: Long, emitted: List[Long])

  private val Unset = Long.MinValue
  private val Tracked = Set(0L, 1L, 3L, 7L, 14L)

  private[streaming] def step(uid: Long, m: Machine, t: Long,
                              tag: String): (Machine, List[RetentionHit]) = {
    // match batch w06 exactly, including pre-epoch: unix_timestamp
    // FLOORS micros to seconds, then `div` (like the oracle's `//`)
    // TRUNCATES seconds to days
    val day = Math.floorDiv(t, 1000000L) / 86400L
    if (m.cohortDay == Unset)
      (Machine(day, List(0L)), List(RetentionHit(uid, day, 0L)))
    else {
      val off = day - m.cohortDay
      if (Tracked(off) && !m.emitted.contains(off))
        (m.copy(emitted = off :: m.emitted), List(RetentionHit(uid, m.cohortDay, off)))
      else (m, Nil)
    }
  }

  /** Retention-hit stream from an events stream with `user_id`,
    * `event_type` and an event-time column; count hits per
    * (cohort_day, offset) downstream for the w06 shape. */
  def run(stream: DataFrame, eventTimeCol: String, watermark: String,
          idleEvictMs: Long): Dataset[RetentionHit] = {
    implicit val stateEnc = Encoders.product[WatermarkOrderedFold.FoldState[Machine]]
    implicit val machineEnc = Encoders.product[Machine]
    implicit val outEnc = Encoders.product[RetentionHit]
    WatermarkOrderedFold.run[Machine, RetentionHit](
      stream, "user_id", eventTimeCol, "event_type", watermark, idleEvictMs)(
      Machine(Unset, Nil))(step)
  }
}
