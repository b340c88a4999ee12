package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-funnel tracking — the streaming twin of the
  * batch w07 query (view → click → purchase with strictly increasing
  * event times, first qualifying sequence per user).
  *
  * Correctness contract: a stage hit is emitted with EXACTLY the
  * event time the batch query would compute, because per-user events
  * are folded in EVENT-TIME order, and only once the watermark has
  * passed them (so no earlier event can still arrive). Folding in
  * event-time order makes each stage's first qualifying event the
  * batch minimum: when a click at time t is folded, every view before
  * t has already been folded, so the running min-view equals the
  * global min-view below t — the strict-inequality qualification
  * test is identical to the batch one (and the same argument chains
  * to purchase via the click time). Stage times are therefore FINAL
  * the moment they are set — no retraction, clean Append output.
  *
  * State discipline (100 TB): per user the state is a bounded buffer
  * of not-yet-foldable events (those newer than the current
  * watermark — bounded by rate × watermark horizon) plus three longs
  * for the folded machine. An idle user's state is evicted by
  * event-time timeout after `idleEvictMs` beyond their last event —
  * the remaining buffer is folded (watermark has passed it by then)
  * before eviction, so nothing is lost; a user returning AFTER
  * eviction restarts the machine, which can re-emit a stage — the
  * standard horizon trade (cf. StreamingDedup), with the batch w07
  * pass downstream as the global guarantee.
  */
object StreamingFunnel {

  final case class StageHit(user_id: Long, stage: String, us: Long)
  // the watermarked timestamp column must survive into the typed row
  // — event-time timeout requires it downstream (cf. StreamingNearDup)
  final case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp,
                               us: Long, event_type: String)
  final case class FunnelState(buffer: List[(Long, String)],
                               tv: Long, tc: Long, tp: Long)

  private val Unset = Long.MinValue

  /** Fold events (event-time-ordered) into the machine; returns the
    * new machine state and the stage hits achieved. */
  private[streaming] def fold(uid: Long, st: FunnelState,
                              evs: Seq[(Long, String)]): (FunnelState, List[StageHit]) = {
    var (tv, tc, tp) = (st.tv, st.tc, st.tp)
    var hits = List.empty[StageHit]
    evs.foreach { case (t, typ) =>
      typ match {
        case "view" if tv == Unset =>
          tv = t; hits ::= StageHit(uid, "view", t)
        case "click" if tc == Unset && tv != Unset && t > tv =>
          tc = t; hits ::= StageHit(uid, "click", t)
        case "purchase" if tp == Unset && tc != Unset && t > tc =>
          tp = t; hits ::= StageHit(uid, "purchase", t)
        case _ => ()
      }
    }
    (FunnelState(Nil, tv, tc, tp), hits.reverse)
  }

  /** Stage-hit stream from an events stream with `user_id`,
    * `event_type` and an event-time column (micro-second exactness is
    * kept in `us`; the millisecond column drives watermark/timeout). */
  def run(stream: DataFrame, eventTimeCol: String, watermark: String,
          idleEvictMs: Long): Dataset[StageHit] = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withWatermark(eventTimeCol, watermark)
      .select(col("user_id").cast("long").as("user_id"),
        col(eventTimeCol).as("ts"),
        expr(s"unix_micros(cast($eventTimeCol as timestamp))").as("us"),
        col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, StageHit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid, rows, state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(Nil, Unset, Unset, Unset))
          if (state.hasTimedOut) {
            // watermark has passed the whole buffer (timeout fires at
            // lastEvent + idleEvictMs > every buffered time): fold the
            // remainder, emit, evict
            val (_, hits) = fold(uid, st, st.buffer.sortBy(identity))
            state.remove()
            hits.iterator
          } else {
            val buf = st.buffer ++ rows.map(r => (r.us, r.event_type))
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // fold only what the watermark guarantees is complete;
            // keep the rest buffered for a later trigger
            val (ready, pending) = buf.partition(_._1 <= wmUs)
            val (folded, hits) = fold(uid, st, ready.sortBy(identity))
            val ns = folded.copy(buffer = pending)
            state.update(ns)
            val lastMs = if (buf.nonEmpty) buf.map(_._1).max / 1000L
                         else state.getCurrentWatermarkMs()
            // must stay ahead of the (possibly already-advanced)
            // watermark or Spark rejects the timestamp
            state.setTimeoutTimestamp(
              math.max(lastMs + idleEvictMs, state.getCurrentWatermarkMs() + 1))
            hits.iterator
          }
      }
  }
}
