package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Streaming ordered-funnel tracking — the streaming twin of the
  * batch w07 query (view → click → purchase with strictly increasing
  * event times, first qualifying sequence per user), built on
  * [[WatermarkOrderedFold]].
  *
  * Correctness: the fold sees each user's events in event-time order
  * once the watermark has passed them, so each stage's first
  * qualifying event IS the batch minimum — when a click at time t is
  * folded, every view before t has already been folded, so the
  * running min-view equals the global min-view below t and the
  * strict-inequality test matches the batch one (the argument chains
  * to purchase via the click time). Stage times are final the moment
  * they are set — no retraction, clean Append output.
  */
object StreamingFunnel {

  final case class StageHit(user_id: Long, stage: String, us: Long)
  final case class Machine(tv: Long, tc: Long, tp: Long)

  private val Unset = Long.MinValue

  private[streaming] def step(uid: Long, m: Machine, t: Long,
                              typ: String): (Machine, List[StageHit]) =
    typ match {
      case "view" if m.tv == Unset =>
        (m.copy(tv = t), List(StageHit(uid, "view", t)))
      case "click" if m.tc == Unset && m.tv != Unset && t > m.tv =>
        (m.copy(tc = t), List(StageHit(uid, "click", t)))
      case "purchase" if m.tp == Unset && m.tc != Unset && t > m.tc =>
        (m.copy(tp = t), List(StageHit(uid, "purchase", t)))
      case _ => (m, Nil)
    }

  /** Stage-hit stream from an events stream with `user_id`,
    * `event_type` and an event-time column. */
  def run(stream: DataFrame, eventTimeCol: String, watermark: String,
          idleEvictMs: Long): Dataset[StageHit] = {
    implicit val stateEnc = Encoders.product[WatermarkOrderedFold.FoldState[Machine]]
    implicit val machineEnc = Encoders.product[Machine]
    implicit val outEnc = Encoders.product[StageHit]
    WatermarkOrderedFold.run[Machine, StageHit](
      stream, "user_id", eventTimeCol, "event_type", watermark, idleEvictMs)(
      Machine(Unset, Unset, Unset))(step)
  }
}
