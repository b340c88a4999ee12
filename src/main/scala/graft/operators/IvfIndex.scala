package graft.operators

import graft.functions.GraftFunctions
import graft.queries.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Persisted IVF index — the 100 TB shape of the ANN story: train the
  * coarse quantizer ONCE, write the posting lists as parquet
  * PARTITIONED BY centroid id, and serve every query by reading only
  * the `nprobe` probed partitions (Spark's partition pruning turns
  * the probe filter into a directory listing — the scan never touches
  * the other buckets' files). s03's in-query training is the
  * oracle-checkable form of the SAME pipeline (shared trainer:
  * [[Similarity.trainCodebook]]); this operator is what amortizes it:
  * build cost O(rounds · corpus), per-query cost O(corpus/nlist ·
  * nprobe).
  *
  * Layout: `dir/postings/cid=<c>/…parquet` (vec_id, label, embedding)
  * + `dir/codebook` (cid, cv) — the codebook is nlist × 64 doubles,
  * driver-held at search time (the same bounded collect the in-query
  * form uses).
  */
object IvfIndex {

  /** Bound on the collected/broadcast query side of a probe (each row
    * carries a 64-float embedding ≈ 1 KB → ≤ ~64 MB of driver state;
    * the probe table replicates each row nprobe× before broadcast, so
    * the worst-case broadcast is a few hundred MB at nprobe=4).
    * sf10's eval split is 5,406 rows — 12× headroom; anything past
    * this bound is a mis-aimed predicate, not a benchmark eval set. */
  val MaxQueryRows: Long = 1L << 16

  /** Deterministic per-corpus index location: one fixed dir under the
    * JVM temp root, keyed by the corpus identity (canonical sfDir path
    * + embeddings file mtime/size). Repeated bench/gate runs in a
    * session — or across sessions on unchanged data — reuse the same
    * dir instead of accumulating fresh temp copies; a data change
    * changes the key and forces a rebuild in a new dir. */
  def indexDirFor(sfDir: String): String =
    ArtifactDir.dirFor(sfDir, "embeddings.parquet", "ivf")

  /** Build the index at [[indexDirFor]] unless it is already complete
    * there (both parquet `_SUCCESS` markers present). Returns the dir.
    * This is the amortization point: the 100 TB operating mode is
    * build-once / search-many, and the bench reports build and search
    * as separate costs. */
  def ensureBuilt(s: SparkSession, sfDir: String): String = {
    val dir = indexDirFor(sfDir)
    val done = new java.io.File(dir, "postings/_SUCCESS").exists &&
      new java.io.File(dir, "codebook/_SUCCESS").exists
    if (!done) build(s, sfDir, dir)
    dir
  }

  /** Train on the SF corpus and write the index. The shared corpus
    * cache ([[Similarity.corpus]]) is deliberately NOT unpersisted
    * here — other similarity queries in the session read the same
    * cached plan, so its lifecycle belongs to the session, not to one
    * build call. */
  def build(s: SparkSession, sfDir: String, indexDir: String): Unit = {
    val e = Similarity.corpus(s, sfDir)
    val cents = Similarity.trainCodebook(e)
    e.withColumn("cid",
      GraftFunctions.argMaxCosine(col("v"), cents.map(_.toArray)))
      .select(col("vec_id"), col("label"), col("embedding"), col("cid"))
      // cluster by cid before the partitioned write: straight off the
      // vec_id-partitioned cache every task holds every cell, so the
      // writer emits tasks × nlist tiny files (~14k at nlist=448) —
      // the dominant build cost, and extra per-file overhead on every
      // probed read. One exchange makes it one file per cell. The
      // explicit cid sort satisfies the writer's required ordering
      // (same prefix rule as CorpusSharder.write).
      .repartition(col("cid"))
      .sortWithinPartitions(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$indexDir/postings")
    import s.implicits._
    cents.zipWithIndex.toSeq.map { case (c, i) => (i.toLong, c) }
      .toDF("cid", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebook")
  }

  /** Incremental index maintenance: assign each new vector to its
    * coarse cell with the FROZEN codebook and APPEND to the cid
    * partitions — the ingest-side operation a live corpus needs
    * between retrains (no retrain, no rebuild; untouched partitions'
    * files are never rewritten, so the write is O(batch)). The
    * standard IVF trade is stated, not hidden: the quantizer drifts
    * as the corpus distribution shifts, so production retrains on a
    * cadence; with the codebook frozen, an index grown by appends is
    * BYTE-EQUIVALENT in content to a fresh build under that codebook
    * (IvfSpec asserts search equality).
    * `newVecs`: (vec_id, label, embedding: array<float>). */
  def append(s: SparkSession, indexDir: String, newVecs: DataFrame): Unit = {
    val cb = s.read.parquet(s"$indexDir/codebook")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map(_._2.toArray)
    newVecs
      .withColumn("cid", GraftFunctions.argMaxCosine(
        expr("transform(embedding, x -> cast(x as double))"), cb))
      .select(col("vec_id"), col("label"), col("embedding"), col("cid"))
      .write.mode("append").partitionBy("cid").parquet(s"$indexDir/postings")
  }

  /** Streaming ingest into the index: every micro-batch of new
    * vectors is assigned and appended via [[append]] — the
    * vectors-arrive/index-stays-fresh loop of a live similarity
    * service. Parquet appends are idempotent per batch only via the
    * checkpoint (foreachBatch re-runs a failed batch whole); searches
    * see a batch's vectors once its files land. */
  def appendStream(indexDir: String, newVecs: DataFrame,
                   checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    newVecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        append(batch.sparkSession, indexDir, batch)
      }
      .start()

  /** FILTERED probe-pruned search — the metadata-constrained ANN mode
    * (neighbors of the query vector WITHIN its own label class, the
    * "same-source near-dup" query a curation pipeline asks). The
    * label predicate COMPOSES with the index layout: cid pruning cuts
    * the directory listing to `nprobe` buckets, and the label
    * equality is a parquet pushed filter inside those buckets' scans
    * (row-group stats skip non-matching groups) — the scan touches
    * neither other buckets' files nor, mostly, other labels' row
    * groups. The standard filtered-ANN recall trade is stated, not
    * hidden: a selective predicate empties probed cells, so callers
    * raise nprobe relative to the unfiltered query (s09 probes 4
    * where s03/s06 probe 2). */
  def searchFiltered(s: SparkSession, sfDir: String, indexDir: String,
                     nprobe: Int, k: Int): DataFrame = {
    val cb = s.read.parquet(s"$indexDir/codebook")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map(_._2)
    val q = graft.Tables.load(s, sfDir, "embeddings")
      .filter(col("vec_id") === 0)
      .select(col("embedding").as("qvemb"),
        col("label").cast(LongType).as("qlab"),
        expr("transform(embedding, x -> cast(x as double))").as("qvd"))
    val qRow = q.collect()(0)
    val qv = qRow.getSeq[Double](2)
    val qlab = qRow.getLong(1)
    val probes = Similarity.probeIds(cb, qv, nprobe)
    s.read.parquet(s"$indexDir/postings")
      .filter(col("cid").isin(probes: _*))
      .filter(col("label") === qlab && col("vec_id") =!= 0)
      .crossJoin(broadcast(q.select(col("qvemb"))))
      .select(col("vec_id"), col("label"),
        round(GraftFunctions.cosineSimilarity(col("embedding"), col("qvemb")), 6)
          .cast(DecimalType(18, 6)).cast(DoubleType).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(k)
  }

  /** BATCH probe-pruned search — every real retrieval workload is
    * many queries, not one. The `nQueries` query vectors (vec_id <
    * nQueries — bounded by construction, the s08 lesson) rank their
    * probes against the driver-held codebook; the postings scan reads
    * the UNION of all probed cid partitions ONCE (partition pruning
    * on the combined IN-list), the (q_id, cid, query-embedding) probe
    * table (nQueries·nprobe rows) broadcast-joins on cid, and
    * per-query top-k is the rank-window idiom (plans.TopKRewrite →
    * bounded map-side aggregate, never a global sort). A vector lives
    * in exactly one cid partition and the probe table is distinct on
    * (q_id, cid), so each (query, candidate) pair is scored at most
    * once. Per-query cost stays O(corpus/nlist · nprobe); the batch
    * amortizes the scan setup across queries. */
  def searchBatch(s: SparkSession, sfDir: String, indexDir: String,
                  nprobe: Int, k: Int, nQueries: Int): DataFrame =
    searchWhere(s, sfDir, indexDir, nprobe, k, col("vec_id") < nQueries)

  /** [[searchBatch]] for an explicit query-id set (s11's hybrid
    * fusion queries by named ids, not a prefix range). */
  def searchIds(s: SparkSession, sfDir: String, indexDir: String,
                nprobe: Int, k: Int, ids: Seq[Long]): DataFrame =
    searchWhere(s, sfDir, indexDir, nprobe, k, col("vec_id").isin(ids: _*))

  /** [[searchBatch]] with the CANDIDATE side restricted too — the
    * split-corpus probe (s12 semantic decontamination: queries are
    * the eval vectors, candidates only the train vectors). `candPred`
    * is pushed into the probed postings scan, composing with the cid
    * partition pruning exactly like s09's label filter. */
  def searchSplit(s: SparkSession, sfDir: String, indexDir: String,
                  nprobe: Int, k: Int, qPred: org.apache.spark.sql.Column,
                  candPred: org.apache.spark.sql.Column): DataFrame =
    searchWhere(s, sfDir, indexDir, nprobe, k, qPred, candPred)

  private def searchWhere(s: SparkSession, sfDir: String, indexDir: String,
                          nprobe: Int, k: Int,
                          qPred: org.apache.spark.sql.Column,
                          candPred: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val cb = s.read.parquet(s"$indexDir/codebook")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map(_._2)
    val qSide = graft.Tables.load(s, sfDir, "embeddings")
      .filter(qPred)
      .select(col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> cast(x as double))").as("qvd"))
    // LOUD driver-state bound (the t24-guard precedent): the query
    // side is collected + broadcast under the benchmark-sized-eval
    // assumption (eval sets are bounded by nature; train grows with
    // the crawl). Counted BEFORE the collect so a mis-aimed qPred
    // fails with a diagnosis instead of a driver OOM.
    val nQ = qSide.count()
    require(nQ <= MaxQueryRows,
      s"IVF probe query side has $nQ rows (> $MaxQueryRows driver/broadcast bound): " +
        "the probe table is collected + broadcast under the bounded-eval assumption — " +
        "batch the query side (or flip roles: probe the smaller side) before scaling up")
    val qRows = qSide.collect()
    import s.implicits._
    val probePairs = qRows.toSeq.flatMap { r =>
      val qid = r.getLong(0)
      val qemb = r.getSeq[Float](1).toArray
      Similarity.probeIds(cb, r.getSeq[Double](2), nprobe).map(cid => (qid, cid, qemb))
    }
    val pr = probePairs.toDF("q_id", "cid", "qemb")
    val allCids = probePairs.map(_._2).distinct
    // per-query top-k as the native bounded TopKByScore aggregate
    // (the w05 idiom): a rank window here would shuffle every probed
    // posting into |queries| partitions; the aggregate keeps a k-row
    // buffer per query map-side
    val topk = GraftFunctions.topKByScore(col("cos_sim"), col("vec_id"),
      struct(col("vec_id"), col("label")), k)
    s.read.parquet(s"$indexDir/postings")
      .filter(col("cid").isin(allCids: _*))
      .filter(candPred)
      .join(broadcast(pr), Seq("cid"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("label"),
        round(GraftFunctions.cosineSimilarity(col("embedding"), col("qemb")), 6)
          .cast(DecimalType(18, 6)).cast(DoubleType).as("cos_sim"))
      .groupBy(col("q_id"))
      .agg(topk.as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("q_id"), (col("i") + 1).cast(LongType).as("rnk"),
        col("e.payload.vec_id").as("vec_id"),
        col("e.payload.label").as("label"),
        col("e.score").as("cos_sim"))
      .orderBy("q_id", "rnk")
  }

  /** Probe-pruned top-k search for the corpus query vector vec_id=0
    * (the s03 contract): loads the codebook, ranks probes on the
    * driver, and reads ONLY the probed cid partitions. */
  def search(s: SparkSession, sfDir: String, indexDir: String,
             nprobe: Int, k: Int): DataFrame = {
    val cb = s.read.parquet(s"$indexDir/codebook")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map(_._2)
    val q = graft.Tables.load(s, sfDir, "embeddings")
      .filter(col("vec_id") === 0)
      .select(col("embedding").as("qvemb"),
        expr("transform(embedding, x -> cast(x as double))").as("qvd"))
    val qRow = q.collect()(0)
    val qv = qRow.getSeq[Double](1)
    val probes = Similarity.probeIds(cb, qv, nprobe)
    s.read.parquet(s"$indexDir/postings")
      .filter(col("cid").isin(probes: _*))
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q.select(col("qvemb"))))
      .select(col("vec_id"), col("label"),
        round(GraftFunctions.cosineSimilarity(col("embedding"), col("qvemb")), 6)
          .cast(DecimalType(18, 6)).cast(DoubleType).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(k)
  }
}
