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

  /** FUSED bidirectional scan (optimization round 18, guide §2.4):
    * both directions of the d16/d18 composition in ONE range exchange
    * instead of two — `rows` additionally carries `lcpOut` (the
    * boundary LCP to the scan-order SUCCESSOR, 0 when absent), and
    * the result per emit row is max(forward, backward) ≥ 32 directly,
    * so the former union+groupBy merge of the two directional outputs
    * disappears too. Same arithmetic as two [[scan]] calls (the
    * descending scan's `lcpIn` IS the ascending order's `lcpOut`).
    *
    * The backward direction needs rows after their successors, which
    * a forward pass can only provide by buffering the current SEGMENT
    * (the run of emit rows since the last reset row — a reset clears
    * backward state, so nothing older is needed). Segments are tiny
    * whenever reset rows are dense (d16: 36/37 of suffixes reset;
    * d18: 1/37 — runs of ~36), but an adversarial corpus could make
    * one partition-sized: pass 1 therefore also measures the longest
    * per-partition emit run, and when it exceeds the bound
    * (`spark.graft.saScanMaxSegmentRows`) the method returns None and
    * the CALLER falls back to the two-exchange [[scan]] form — the
    * loud-bound + fallback idiom, decided at the driver BEFORE any
    * task buffers anything. Driver state: one summary row per
    * partition, both directions composed in one walk each.
    * Returns (result or None, the cached range-sorted frame — caller
    * unpersists either way). */
  private[graft] def scanBoth(rows: DataFrame): (Option[DataFrame], DataFrame) = {
    val s = rows.sparkSession
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val maxSeg = s.conf.getOption("spark.graft.saScanMaxSegmentRows")
      .map(_.toLong).getOrElse(1L << 20)
    val NoTrain = -1L
    val Inf = Long.MaxValue
    val ordered = rows
      .select(col("ord").cast(LongType), col("doc_id").cast(LongType),
        col("off").cast(LongType), col("train"), col("lcpIn").cast(LongType),
        col("lcpOut").cast(LongType))
      .repartitionByRange(parts, col("ord"))
      .sortWithinPartitions(col("ord"))
      .cache()
    // pass 1: (pid, sawTrain, curF = forward state after the last
    // reset (or min of all lcpIn when none), curB = min of lcpOut
    // BEFORE the first reset (the backward mirror), maxRun = longest
    // run of consecutive emit rows)
    val summ: Array[(Int, Boolean, Long, Long, Long)] =
      ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
        var sawTrain = false
        var curF = Inf
        var curB = Inf
        var run = 0L
        var maxRun = 0L
        it.foreach { rr =>
          if (rr.getBoolean(3)) { sawTrain = true; curF = Inf; run = 0L }
          else {
            curF = math.min(curF, rr.getLong(4))
            if (!sawTrain) curB = math.min(curB, rr.getLong(5))
            run += 1L
            if (run > maxRun) maxRun = run
          }
        }
        Iterator((pid, sawTrain, curF, curB, maxRun))
      }.collect().sortBy(_._1)
    if (summ.exists(_._5 > maxSeg)) return (None, ordered)
    var stF = NoTrain
    val inF = summ.map { case (pid, hasTrain, curF, _, _) =>
      val in = stF
      stF = if (hasTrain) curF
        else if (in == NoTrain) NoTrain
        else math.min(in, curF)
      pid -> in
    }.toMap
    var stB = NoTrain
    val inB = summ.reverse.map { case (pid, hasTrain, _, curB, _) =>
      val in = stB
      stB = if (hasTrain) curB
        else if (in == NoTrain) NoTrain
        else math.min(in, curB)
      pid -> in
    }.toMap
    val bc = s.sparkContext.broadcast(
      summ.map(t => t._1 -> ((inF(t._1), inB(t._1)))).toMap)
    // pass 2: forward state streams; the backward value of an emit row
    // is the running min of lcpOut from it up to the next reset row,
    // computed by flushing the buffered segment in reverse at each
    // reset (and at the partition end with the composed incoming
    // backward state). Buffers are unboxed and bounded by maxSeg
    // (verified at the driver above).
    val outRdd = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val (pInF, pInB) = bc.value(pid)
        var st = pInF
        val ids = new scala.collection.mutable.ArrayBuilder.ofLong
        val offs = new scala.collection.mutable.ArrayBuilder.ofLong
        val mFs = new scala.collection.mutable.ArrayBuilder.ofLong
        val lcpOs = new scala.collection.mutable.ArrayBuilder.ofLong
        def flush(st0: Long): Iterator[Row] = {
          val idsA = ids.result(); val offsA = offs.result()
          val mFA = mFs.result(); val loA = lcpOs.result()
          ids.clear(); offs.clear(); mFs.clear(); lcpOs.clear()
          val m = idsA.length
          val best = new Array[Long](m)
          var b = st0
          var k = m - 1
          while (k >= 0) {
            b = if (b == NoTrain) NoTrain else math.min(b, loA(k))
            best(k) = math.max(mFA(k), b)
            k -= 1
          }
          (0 until m).iterator.flatMap { j =>
            if (best(j) >= 32L) Some(Row(idsA(j), offsA(j), best(j)))
            else None
          }
        }
        (it.map(Option(_)) ++ Iterator(None)).flatMap {
          case Some(rr) =>
            if (rr.getBoolean(3)) {
              val out = flush(Inf) // the reset row restarts backward state
              st = Inf
              out
            } else {
              st = if (st == NoTrain) NoTrain else math.min(st, rr.getLong(4))
              ids += rr.getLong(1); offs += rr.getLong(2)
              mFs += st; lcpOs += rr.getLong(5)
              Iterator.empty
            }
          case None => flush(pInB)
        }
      }
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("off", LongType, nullable = false),
      StructField("m", LongType, nullable = false)))
    (Some(s.createDataFrame(outRdd, schema)), ordered)
  }
}
