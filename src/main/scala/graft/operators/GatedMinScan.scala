package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The SA family's directional gated-min scan (single owner — shared
  * by d16/d18's cross-split decontamination over the persisted suffix
  * array and d19's incremental probe of a new batch against it): over
  * rows in `ord` order, each carrying the boundary LCP to its
  * predecessor, compute for every EMIT-side row the longest prefix it
  * shares with the nearest RESET-side row at smaller `ord` — the
  * running MIN of boundary LCPs since that row (nearest is optimal:
  * mins only shrink with distance in suffix order). Run once over
  * `ord` and once over `-ord` (with the successor boundary as lcpIn)
  * and the max of the two directions is the longest prefix shared
  * with ANY reset-side row.
  *
  * Transition per row: reset (train=true) ⇒ S := ∞; emit ⇒
  * S := min(S, lcpIn) (S = "none seen yet" before the first reset
  * row). Emits (doc_id, off, m = S) for emit-side rows with m ≥ 32
  * (the SA family's span contract).
  *
  * Distributed as the denseRank two-pass (the Terasort shape): range
  * exchange on `ord`, bounded per-partition transition summary (a
  * partition composes to either the concrete state after its last
  * reset row, or min(S_in, partition-min)), driver composition over
  * ≤ |partitions| rows, broadcast second pass. 100 TB shape: one
  * fixed-width range exchange, driver state ≤ |partitions| rows.
  */
object GatedMinScan {

  /** `rows` = (ord: scan order ascending, doc_id, off, train: reset
    * side, lcpIn: boundary LCP to the scan-order predecessor, 0 when
    * absent/broken). Returns (result, the cached range-sorted frame
    * backing it — caller unpersists after materializing downstream). */
  private[graft] def scan(rows: DataFrame): (DataFrame, DataFrame) = {
    val s = rows.sparkSession
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val NoTrain = -1L
    val ordered = rows
      .select(col("ord").cast(LongType), col("doc_id").cast(LongType),
        col("off").cast(LongType), col("train"), col("lcpIn").cast(LongType))
      .repartitionByRange(parts, col("ord"))
      .sortWithinPartitions(col("ord"))
      .cache()
    val summaries: Array[(Int, Boolean, Long)] =
      ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
        var sawTrain = false
        var cur = Long.MaxValue // C after the last train, or A overall
        it.foreach { rr =>
          if (rr.getBoolean(3)) { sawTrain = true; cur = Long.MaxValue }
          else cur = math.min(cur, rr.getLong(4))
        }
        Iterator((pid, sawTrain, cur))
      }.collect().sortBy(_._1)
    var state = NoTrain
    val incoming = summaries.map { case (pid, hasTrain, v) =>
      val in = state
      state =
        if (hasTrain) v
        else if (in == NoTrain) NoTrain
        else math.min(in, v)
      pid -> in
    }.toMap
    val bc = s.sparkContext.broadcast(incoming)
    val outRdd = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        var st = bc.value(pid)
        it.flatMap { rr =>
          if (rr.getBoolean(3)) { st = Long.MaxValue; None }
          else {
            st = if (st == NoTrain) NoTrain else math.min(st, rr.getLong(4))
            if (st >= 32L) Some(Row(rr.getLong(1), rr.getLong(2), st))
            else None
          }
        }
      }
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("off", LongType, nullable = false),
      StructField("m", LongType, nullable = false)))
    (s.createDataFrame(outRdd, schema), ordered)
  }
}
