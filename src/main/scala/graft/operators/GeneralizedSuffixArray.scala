package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed GENERALIZED suffix array over the document corpus —
  * prefix doubling (Manber–Myers, the construction every published
  * distributed SA uses: one keyed exchange per doubling round) on
  * DataFrames, built for arbitrary-length duplicated-substring
  * discovery (d14/d15) where the fixed-k gram ownership of d09 can't
  * ask the question. No text concatenation and no separator-sentinel
  * tricks: the array ranks the suffixes of EACH document (the
  * generalized form), so the round count is O(log max-doc-length) —
  * not O(log corpus-length) — and cross-document repeats surface as
  * adjacent suffixes from different docs.
  *
  * Suffix identity is ONE packed long `pk = doc_id << 32 | off`
  * (round-14 rewrite: the (doc_id: long, off: long) pair doubled the
  * width of every per-round exchange and spill — at the sf10 build
  * that width was the difference between fitting the local disk and
  * not). The packing is exact under the loudly-guarded bounds
  * 0 ≤ doc_id < 2³¹ and doc-length < 2³⁰: the shifted lookup key
  * pk − cover for off < cover borrows into the doc_id bits and yields
  * a low-32 field ≥ 2³² − cover, which can only alias a REAL offset of
  * doc_id−1 if cover > 2³² − maxLen — impossible while
  * maxLen < 2³⁰ (cover < 2·maxLen) — so the equi join matches exactly
  * the (doc_id, off−cover)-exists pairs, and misses stay the −1
  * sentinel (sorting first, exactly the shorter-string-is-a-prefix
  * rule). Packed order == (doc_id, off) lexicographic order for the
  * final tie-break.
  *
  * Per round: rank2 lookup = ONE pk-keyed equi join (the shifted
  * self-join), then a DENSE RANK of (rank, rank2) WITHOUT a global
  * single-partition sort: range-repartition + sortWithinPartitions
  * (Spark's Terasort shape), one bounded per-partition stats collect
  * (first key, last key, distinct count — ≤ |partitions| rows of
  * driver state), a driver scan that merges boundary-spanning key
  * groups, and a broadcast-offset assignment pass. Early exit when
  * all ranks are distinct. Residual ties after the last round are
  * IDENTICAL suffixes; the final total order breaks them by
  * (doc_id, off).
  *
  * The round whose prefix cover reaches 32 is snapshotted as `rank32`:
  * two suffixes share a 32-char prefix iff their rank32 is equal, so
  * the LCP stage downstream fetches text only for those candidate
  * adjacent pairs — never for the corpus-sized rest.
  *
  * 100 TB shape: every pass is a keyed or range exchange of
  * fixed-width (pk, rank[, rank2]) longs; driver state is one
  * |partitions|-row stats table per round. Ranks are near-uniform
  * after round 1 except over heavy repeats — exactly the data the
  * operator exists to find — and a pathological single-repeat corpus
  * degrades the range split with the same mitigation as any sort
  * (more partitions). Character granularity is UNICODE CODE POINTS on
  * every step of the chain — probed and spec-enforced, not assumed
  * (SuffixArraySpec "astral"): Spark's `split(text, "")` emits one
  * element per code point, `substring`/`length` index and count code
  * points, UTF8String's binary sort order IS code-point order, and
  * functions.CommonPrefixLen counts non-continuation UTF-8 bytes =
  * code points. The Python oracle's string ops are code-point
  * semantics too, so the two engines agree on astral text as well as
  * BMP — no surrogate-half divergence exists to guard against.
  */
object GeneralizedSuffixArray {

  private val payloadCols: Seq[(String, DataType)] =
    Seq("pk" -> LongType)

  /** Dense 0-based ranks of `df` rows under the `keys` order, plus the
    * distinct-key count and the cached range-sorted frame backing the
    * result's lineage (the caller retires caches once a later round is
    * materialized). Exact for any partitioning: boundary-spanning key
    * groups are merged in the driver scan. `df` must expose `keys`
    * followed by the packed-suffix payload under distinct names. */
  private[operators] def denseRank(df: DataFrame, keys: Seq[String])
      : (DataFrame, Long, DataFrame) = {
    val s = df.sparkSession
    val kN = keys.length
    val parts = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // repartitionByRange SAMPLES its input to pick boundaries — a full
    // extra evaluation of `df` (for the doubling rounds that is the
    // whole pk-keyed join, run twice per round). A round-lifetime
    // cache makes the sampling pass the one real evaluation; the
    // caller's materialization of `ordered` (the stats collect below)
    // ends its useful life, so it is retired HERE — no round input
    // outlives its round (the spill-bound discipline).
    val input = df
      .select((keys ++ payloadCols.map(_._1)).map(col): _*)
      .cache()
    val ordered = input
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
    input.unpersist()
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

  /** Suffix-count threshold above which [[build]] switches to the
    * SPILL-BOUNDED mode: every doubling round is handed off through a
    * parquet dir (2 longs/suffix, snappy) instead of a cached plan.
    * The handoff CUTS THE LINEAGE, so the previous round's join/sort
    * shuffle files become unreachable the moment `ranked` rebinds —
    * the forced GC then reclaims them INSIDE the round, and the
    * retired round's parquet dir is deleted eagerly. In-flight disk
    * is therefore bounded by ~2 rounds (one live handoff + one being
    * written + the current round's shuffle), independent of the round
    * count — the property the round-13 sf10 attempts lacked: with
    * pure in-memory lineage the ContextCleaner's ASYNC reclamation
    * lagged the build and rounds × shuffle accumulated past the local
    * disk. On a cluster the same bound holds per node. Below the
    * threshold the build keeps the all-in-memory lineage (no I/O,
    * oracle-verified at the gates). Override for tests via
    * `spark.graft.saCheckpointMinSuffixes`. */
  private val CkptMinSuffixesDefault: Long = 64L << 20

  /** The suffix array: (doc_id, off, rank, rank32) — `rank` is the
    * 0-based position of suffix (doc_id, off) in the total suffix
    * order (ties between identical suffixes broken by (doc_id, off)),
    * `rank32` the dense rank under the 32-char-prefix equivalence.
    * Returned frame: cached+materialized (in-memory mode) or backed
    * by a session-lifetime temp parquet dir (spill-bounded mode);
    * callers treat both uniformly (unpersist() is a no-op on the
    * latter).
    *
    * `resultDir`: when given, the final array is WRITTEN THERE (one
    * parquet write, both modes) and the returned frame reads it back
    * — the caller owns that dir's lifecycle. This is the persisted-
    * index path (SuffixArrayIndex): without it the spill-bounded mode
    * would land the result in its own temp root and the index build
    * would re-read + rewrite a corpus-sized array (double peak disk
    * and I/O for the ~17-min sf10 construction, the round-14 ADVICE
    * item). */
  def build(docs: DataFrame, resultDir: Option[String] = None): DataFrame = {
    // empty-text docs have NO suffixes (split("", "") would emit one
    // phantom "" row) and an all-empty/empty corpus has a NULL
    // max(length) — both must yield the documented suffix set, which
    // the Python oracle states over non-empty texts only
    val nonEmpty = docs.filter(length(col("text")) > 0)
    // ONE bounds pass also carries the suffix count (sum of code-point
    // lengths == number of exploded suffixes) — previously a separate
    // corpus-sized count() job materialized the per-character explode
    // just to count it
    val bounds = nonEmpty.agg(max(length(col("text"))),
      min(col("doc_id").cast(LongType)), max(col("doc_id").cast(LongType)),
      sum(length(col("text")).cast(LongType))).head()
    val maxLen = Option(bounds.get(0)).map(_.asInstanceOf[Int].toLong).getOrElse(0L)
    val (minDoc, maxDoc) =
      if (bounds.isNullAt(1)) (0L, 0L) else (bounds.getLong(1), bounds.getLong(2))
    // loud pk-packing guards (see the scaladoc aliasing analysis)
    require(minDoc >= 0L && maxDoc < (1L << 31),
      s"suffix-array pk packing needs 0 <= doc_id < 2^31, got [$minDoc, $maxDoc]")
    require(maxLen < (1L << 30),
      s"suffix-array pk packing needs doc length < 2^30 chars, got $maxLen")
    val n = if (bounds.isNullAt(3)) 0L else bounds.getLong(3)
    // BOOTSTRAP AT COVER=32 (optimization round 17, guide §2.4 "remove
    // shuffles outright"): dense-ranking the 32-code-point prefix
    // directly IS the prefix-doubling rank at cover=32 — UTF8String
    // binary order is code-point order, and a suffix shorter than the
    // cover contributes its full remainder, which sorts before any
    // continuation exactly like the doubling sentinel (-1 sorts
    // first). One range exchange of (p32, pk) therefore replaces the
    // first FIVE doubling rounds (cover 1→32: 5 pk-keyed joins + 5
    // denseRank exchanges + their driver round-trips), and the rank32
    // snapshot is by definition this first ranking. Equivalence is
    // exact (same equivalence classes, same class order ⇒ identical
    // dense ranks), spec-held by SuffixArraySpec + the three-SF
    // Python-oracle gate.
    val chars = nonEmpty.select(col("doc_id").cast(LongType).as("doc_id"),
      col("text"), posexplode(split(col("text"), "")).as(Seq("off", "ch")))
      .select(expr("substring(text, off + 1, 32)").as("p32"),
        (shiftleft(col("doc_id"), 32) + col("off").cast(LongType)).as("pk"))
    val s = docs.sparkSession
    val ckpt = n >= s.conf.getOption("spark.graft.saCheckpointMinSuffixes")
      .map(_.toLong).getOrElse(CkptMinSuffixesDefault)
    val tmpRoot: java.nio.file.Path =
      if (ckpt) {
        val p = java.nio.file.Files.createTempDirectory("graft_sa_")
        sys.addShutdownHook(deleteRecursively(p.toFile)) // session-lifetime
        p
      } else null
    var roundIdx = 0
    var curDir: String = null // parquet backing `ranked` (ckpt mode)
    var rank32Dir: String = null
    // parquet handoff: write the round (consuming `cache`), rebind to
    // the read, retire the PREVIOUS round's dir (unless it backs the
    // rank32 snapshot), and force the cleaner to reclaim the now-
    // unreachable shuffles — the spill bound of the scaladoc
    def handoff(df: DataFrame, cache: DataFrame): DataFrame = {
      roundIdx += 1
      val dir = tmpRoot.resolve(s"r$roundIdx").toString
      df.write.mode("overwrite").parquet(dir)
      cache.unpersist()
      val prev = curDir
      curDir = dir
      if (prev != null && prev != rank32Dir)
        deleteRecursively(new java.io.File(prev))
      System.gc()
      s.read.parquet(dir)
    }
    var (ranked, nd, newest) = denseRank(chars, Seq("p32"))
    if (ckpt) { ranked = handoff(ranked, newest); newest = null }
    var cover = 32L
    // rank32 = the bootstrap ranking itself (see above): the dense
    // rank under the 32-char-prefix equivalence IS the first ranking
    val rank32: DataFrame = ranked
    val rank32Backing: DataFrame = if (ckpt) null else newest
    rank32Dir = curDir
    while (nd < n && cover < maxLen) {
      val shifted = ranked.select((col("pk") - cover).as("pk"),
        col("rank").as("rank2"))
      // join strategy stays SORT-MERGE deliberately (guide §3.1): a
      // shuffled-hash hint was tried this round and skips the two
      // per-round sorts locally, but at the sf10 build the 32
      // concurrent per-task hash builds (~7 M rows each) are
      // UNSPILLABLE consumers and died with "Can't acquire … to build
      // hash relation" — the same measured failure class the
      // LabelPropagation notes record. SMJ spills gracefully.
      val paired = ranked.join(shifted, Seq("pk"), "left")
        .select(col("rank"), coalesce(col("rank2"), lit(-1L)).as("rank2"),
          col("pk"))
      val (r2, d2, c2) = denseRank(paired, Seq("rank", "rank2"))
      if (ckpt) {
        ranked = handoff(r2, c2)
      } else {
        // round i is materialized (the stats collect inside denseRank),
        // so round i−1's cache can be RETIRED NOW unless it backs the
        // rank32 snapshot — holding every round alive accumulates
        // rounds × corpus-sized cache AND keeps each round's shuffle
        // files referenced (the ContextCleaner only reclaims a shuffle
        // when its dependency is GC-able)
        if (!newest.eq(rank32Backing)) { newest.unpersist(); newest = null }
        newest = c2
        ranked = r2
      }
      nd = d2; cover *= 2
    }
    // final total order: (rank, pk) — pk order IS (doc_id, off) order.
    // When the loop exited with every rank distinct (nd == n) the
    // ranks already ARE the dense total order and re-ranking would be
    // a no-op pass; identical-suffix ties (nd < n) still need the
    // deterministic (rank, pk) re-rank.
    val (fin, finCache) =
      if (nd == n) (ranked, null: DataFrame)
      else {
        val pre = ranked.select(col("rank").as("r0"), col("pk").as("kp"), col("pk"))
        val (f, _, fc) = denseRank(pre, Seq("r0", "kp"))
        (f, fc)
      }
    val joined = fin
      .join(rank32.select(col("pk"), col("rank").as("rank32")), Seq("pk"))
      .select(shiftright(col("pk"), 32).as("doc_id"),
        col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("off"),
        col("rank"), col("rank32"))
    if (ckpt) {
      // land the result (in the caller's dir when given, else the
      // temp root), then retire EVERY intermediate: the returned
      // frame is a plain parquet read, no cache to leak, lineage
      // independent of the retired rounds
      val resDir = resultDir.getOrElse(tmpRoot.resolve("result").toString)
      joined.write.mode("overwrite").parquet(resDir)
      if (finCache != null) finCache.unpersist()
      Seq(curDir, rank32Dir).filter(_ != null).distinct
        .foreach(d => deleteRecursively(new java.io.File(d)))
      // caller-owned result ⇒ nothing of the build remains in the
      // temp root; reclaim it now instead of at JVM shutdown
      if (resultDir.isDefined) deleteRecursively(tmpRoot.toFile)
      System.gc()
      s.read.parquet(resDir)
    } else resultDir match {
      case Some(resDir) =>
        // persisted-index path: ONE write (the write materializes the
        // plan), caches retired, returned frame reads the artifact
        joined.write.mode("overwrite").parquet(resDir)
        Seq(finCache, rank32Backing, newest).filter(_ != null).distinct
          .foreach(_.unpersist())
        s.read.parquet(resDir)
      case None =>
        // materialize the result, then retire the remaining caches
        val result = joined.cache()
        result.count()
        Seq(finCache, rank32Backing, newest).filter(_ != null).distinct
          .foreach(_.unpersist())
        result
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val cs = f.listFiles()
    if (cs != null) cs.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
