package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Watermark-ordered per-key fold — the reusable core behind
  * StreamingFunnel and StreamingRetention: buffer each key's events
  * until the event-time watermark passes them, then fold them into a
  * per-key machine in EVENT-TIME order.
  *
  * Why this reproduces batch semantics: when an event at time t is
  * folded, every event of that key with time < t has already been
  * folded (the watermark guarantees no earlier event can still
  * arrive, and the buffer is drained in sorted order) — so any fold
  * function that only depends on the prefix-in-event-time-order
  * computes exactly what a batch pass over the key's sorted history
  * would. Outputs are final on emission: clean Append, no retraction.
  *
  * Emission latency is WATERMARK-bounded, not arrival-bounded: the
  * event-time timeout is armed at the earliest pending event, so a
  * key folds as soon as the watermark passes its buffer even if no
  * further event for that key ever arrives.
  *
  * State discipline (100 TB): per key, the machine state plus a
  * buffer bounded by rate × watermark horizon (only events newer
  * than the watermark wait). Idle keys are evicted `idleEvictMs`
  * after their last event, once nothing is pending — a key returning
  * after eviction restarts its machine (the StreamingDedup horizon
  * trade; the batch operator downstream stays the global guarantee).
  */
object WatermarkOrderedFold {

  final case class KeyedEvent(k: Long, ts: java.sql.Timestamp,
                              us: Long, tag: String)
  final case class FoldState[S](buffer: List[(Long, String)],
                                lastMs: Long, machine: S)

  /** @param stream    input with key/eventTime/tag columns
    * @param keyCol    long key column (e.g. user_id)
    * @param eventTimeCol timestamp column (watermark source; folded
    *                  order is its micro-second value)
    * @param tagCol    string payload column (e.g. event_type)
    * @param init      initial machine per key
    * @param step      (key, machine, eventUs, tag) => (machine', emissions)
    */
  def run[S: Encoder, O: Encoder](
      stream: DataFrame, keyCol: String, eventTimeCol: String, tagCol: String,
      watermark: String, idleEvictMs: Long)(
      init: => S)(
      step: (Long, S, Long, String) => (S, List[O]))(
      implicit stateEnc: Encoder[FoldState[S]]): Dataset[O] = {
    val spark = stream.sparkSession
    import spark.implicits._

    def foldReady(k: Long, m0: S, ready: Seq[(Long, String)]): (S, List[O]) = {
      var m = m0
      var out = List.empty[O]
      ready.sortBy(identity).foreach { case (t, tag) =>
        val (m2, os) = step(k, m, t, tag)
        m = m2
        out = os.reverse ::: out
      }
      (m, out.reverse)
    }

    stream
      .withWatermark(eventTimeCol, watermark)
      .select(col(keyCol).cast("long").as("k"),
        // the watermarked timestamp column must survive into the
        // typed row — event-time timeout requires it downstream
        col(eventTimeCol).as("ts"),
        expr(s"unix_micros(cast($eventTimeCol as timestamp))").as("us"),
        col(tagCol).as("tag"))
      .as[KeyedEvent]
      .groupByKey(_.k)
      .flatMapGroupsWithState[FoldState[S], O](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (k, rows, state: GroupState[FoldState[S]]) =>
          val st = state.getOption.getOrElse(FoldState[S](Nil, 0L, init))
          val fresh = rows.map(r => (r.us, r.tag)).toList
          val buf = st.buffer ++ fresh
          val lastMs = (st.lastMs :: fresh.map(_._1 / 1000L)).max
          val wmMs = state.getCurrentWatermarkMs()
          // wmMs == 0 also means "no watermark computed yet" (first
          // micro-batch): buffer everything rather than fold events
          // with time <= epoch immediately and possibly out of
          // event-time order. Consequence: a stream whose event times
          // never exceed the epoch never advances the watermark past 0
          // and never emits — the ordering guarantee is scoped to
          // post-1970 event time.
          val (ready, pending) =
            if (wmMs == 0L) (Nil, buf)
            else buf.partition(_._1 <= wmMs * 1000L)
          val (m, out) = foldReady(k, st.machine, ready)
          if (pending.isEmpty && state.hasTimedOut && wmMs >= lastMs + idleEvictMs) {
            state.remove()
          } else {
            state.update(FoldState(pending, lastMs, m))
            // wake when the watermark reaches the earliest pending
            // event (fold latency = watermark lag), else at the idle
            // deadline; always strictly ahead of the current watermark
            // or Spark rejects the timestamp
            val next =
              if (pending.nonEmpty)
                math.min(pending.map(_._1).min / 1000L + 1, lastMs + idleEvictMs)
              else lastMs + idleEvictMs
            state.setTimeoutTimestamp(math.max(next, wmMs + 1))
          }
          out.iterator
      }
  }
}
