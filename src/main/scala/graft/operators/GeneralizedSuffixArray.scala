package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed GENERALIZED suffix array over the document corpus —
  * prefix doubling (Manber–Myers, the construction every published
  * distributed SA uses: one keyed exchange per doubling round) on
  * DataFrames, built for arbitrary-length duplicated-substring
  * discovery (d14) where the fixed-k gram ownership of d09 can't ask
  * the question. No text concatenation and no separator-sentinel
  * tricks: the array ranks the suffixes of EACH document (the
  * generalized form), so the round count is O(log max-doc-length) —
  * not O(log corpus-length) — and cross-document repeats surface as
  * adjacent suffixes from different docs.
  *
  * Per round: rank2 lookup = ONE (doc_id, off)-keyed equi join (the
  * shifted self-join; missing = −1 sentinel, which sorts first exactly
  * like the shorter-string-is-a-prefix rule), then a DENSE RANK of
  * (rank, rank2) WITHOUT a global single-partition sort:
  * range-repartition + sortWithinPartitions (Spark's Terasort shape),
  * one bounded per-partition stats collect (first key, last key,
  * distinct count — ≤ |partitions| rows of driver state), a driver
  * scan that merges boundary-spanning key groups, and a
  * broadcast-offset assignment pass. Early exit when all ranks are
  * distinct. Residual ties after the last round are IDENTICAL
  * suffixes; the final total order breaks them by (doc_id, off).
  *
  * The round whose prefix cover reaches 32 is snapshotted as `rank32`:
  * two suffixes share a 32-char prefix iff their rank32 is equal, so
  * the LCP stage downstream fetches text only for those candidate
  * adjacent pairs — never for the corpus-sized rest.
  *
  * 100 TB shape: every pass is a keyed or range exchange of
  * fixed-width rows; driver state is one |partitions|-row stats table
  * per round. Ranks are near-uniform after round 1 except over heavy
  * repeats — exactly the data the operator exists to find — and a
  * pathological single-repeat corpus degrades the range split with
  * the same mitigation as any sort (more partitions). Character
  * granularity is UTF-16 code units of the BMP (split-by-empty; the
  * corpora are BMP text) — the oracle mirrors code points, identical
  * on BMP.
  */
object GeneralizedSuffixArray {

  private val payloadCols: Seq[(String, DataType)] =
    Seq("doc_id" -> LongType, "off" -> LongType)

  /** Dense 0-based ranks of `df` rows under the `keys` order, plus the
    * distinct-key count and the cached range-sorted frame backing the
    * result's lineage (the caller retires caches once a later round is
    * materialized). Exact for any partitioning: boundary-spanning key
    * groups are merged in the driver scan. `df` must expose `keys`
    * followed by the (doc_id, off) payload under distinct names. */
  private[operators] def denseRank(df: DataFrame, keys: Seq[String])
      : (DataFrame, Long, DataFrame) = {
    val s = df.sparkSession
    val kN = keys.length
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ordered = df
      .select((keys ++ payloadCols.map(_._1)).map(col): _*)
      .repartitionByRange(parts, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .cache()
    val stats: Array[(Int, Seq[Any], Seq[Any], Long)] =
      ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
        if (it.isEmpty) Iterator.empty
        else {
          var first: Seq[Any] = null
          var prev: Seq[Any] = null
          var nd = 0L
          it.foreach { r =>
            val k: Seq[Any] = (0 until kN).map(r.get)
            if (first == null) first = k
            if (k != prev) { nd += 1; prev = k }
          }
          Iterator((pid, first, prev, nd))
        }
      }.collect().sortBy(_._1)
    var running = 0L
    var prevLast: Seq[Any] = null
    val offsets = stats.map { case (pid, first, last, nd) =>
      val off = if (prevLast != null && first == prevLast) running - 1 else running
      running = off + nd
      prevLast = last
      pid -> off
    }.toMap
    val total = running
    val bc = s.sparkContext.broadcast(offsets)
    val rankedRdd = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
      if (it.isEmpty) Iterator.empty
      else {
        val off = bc.value(pid)
        var prev: Seq[Any] = null
        var r = off - 1
        it.map { row =>
          val k: Seq[Any] = (0 until kN).map(row.get)
          if (k != prev) { r += 1; prev = k }
          Row.fromSeq(payloadCols.indices.map(i => row.get(kN + i)) :+ r)
        }
      }
    }
    val schema = StructType(payloadCols.map { case (n, t) =>
      StructField(n, t, nullable = false)
    } :+ StructField("rank", LongType, nullable = false))
    (s.createDataFrame(rankedRdd, schema), total, ordered)
  }

  /** The suffix array: (doc_id, off, rank, rank32) — `rank` is the
    * 0-based position of suffix (doc_id, off) in the total suffix
    * order (ties between identical suffixes broken by (doc_id, off)),
    * `rank32` the dense rank under the 32-char-prefix equivalence. */
  def build(docs: DataFrame): DataFrame = {
    val chars = docs.select(col("doc_id").cast(LongType).as("doc_id"),
      posexplode(split(col("text"), "")).as(Seq("off", "ch")))
      .select(col("ch"), col("doc_id"), col("off").cast(LongType).as("off"))
    val n = chars.count()
    val maxLen = docs.agg(max(length(col("text")))).head().getInt(0).toLong
    var (ranked, nd, newest) = denseRank(chars, Seq("ch"))
    var cover = 1L
    var rank32: DataFrame = null
    var rank32Backing: DataFrame = null
    while (nd < n && cover < maxLen) {
      val shifted = ranked.select(col("doc_id"),
        (col("off") - cover).as("off"), col("rank").as("rank2"))
      val paired = ranked.join(shifted, Seq("doc_id", "off"), "left")
        .select(col("rank"), coalesce(col("rank2"), lit(-1L)).as("rank2"),
          col("doc_id"), col("off"))
      val (r2, d2, c2) = denseRank(paired, Seq("rank", "rank2"))
      // round i is materialized (the stats collect inside denseRank),
      // so round i−1's cache can be RETIRED NOW unless it backs the
      // rank32 snapshot — holding every round alive accumulates
      // rounds × corpus-sized cache AND keeps each round's shuffle
      // files referenced (the ContextCleaner only reclaims a shuffle
      // when its dependency is GC-able), which is what breaks a
      // 150 M-suffix build on local disk
      if (!newest.eq(rank32Backing)) {
        newest.unpersist()
        newest = null
        System.gc() // let the cleaner drop the retired round's shuffle
      }
      newest = c2
      ranked = r2; nd = d2; cover *= 2
      if (cover >= 32 && rank32 == null) { rank32 = ranked; rank32Backing = c2 }
    }
    if (rank32 == null) { rank32 = ranked; rank32Backing = newest }
    val pre = ranked.select(col("rank").as("r0"), col("doc_id").as("kd"),
      col("off").as("ko"), col("doc_id"), col("off"))
    val (fin, _, finCache) = denseRank(pre, Seq("r0", "kd", "ko"))
    // materialize the result, then retire the remaining caches
    val result = fin
      .join(rank32.select(col("doc_id"), col("off"), col("rank").as("rank32")),
        Seq("doc_id", "off"))
      .cache()
    result.count()
    Seq(finCache, rank32Backing, newest).filter(_ != null).distinct
      .foreach(_.unpersist())
    result
  }
}
