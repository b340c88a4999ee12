package graft.streaming

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Streaming semantic decontamination — s12's probe applied AT
  * INGEST: the deployment mode of the paraphrase-contamination check
  * (the eval benchmark is fixed; TRAIN vectors arrive with the
  * crawl), the t24/t19/d13 two-phase convention on the embedding
  * side. The coarse quantizer comes from the PERSISTED IVF index
  * (built batch-side, [[graft.operators.IvfIndex]]); each arriving
  * train vector is assigned its cid by the SAME argmax-cosine kernel
  * that laid out the postings, joined against the BROADCAST
  * (eval, probed-cid, query-embedding) table — so the scored
  * (eval, train) pair set is EXACTLY batch s12's (cid(t) ∈
  * probes(e, 4)) — and each window emits per-eval partial maxima of
  * struct(cos_sim, −train_id, …) on watermark close (Append). A max
  * of per-window maxima is the global max and the −train_id field
  * reproduces the ties-to-smaller-id rule, so the read-back
  * re-aggregation equals batch s12 row-for-row — which is why s12's
  * SQL oracle (k-means chain + probe/rescore restatement) checks
  * this query too.
  *
  * Streaming state: one (window, eval) row per open window — bounded
  * by the (small by nature) eval set, watermark-evicted. The
  * `_flush` sentinel is deliberately TRAIN-side (≢ 0 mod 37) with a
  * well-defined unit vector: the train filter does not reference the
  * event-time column, so the optimizer pushes it BELOW the
  * EventTimeWatermark operator — an eval-side sentinel would be
  * dropped before its far-future timestamp ever advanced the clock
  * and no window would close (observed: 0 emissions). The sentinel's
  * own window is past the final watermark so it never emits, and the
  * read-back filters its id as belt-and-braces.
  */
object StreamingSemanticDecon {

  /** Windowed per-eval best-train-neighbor partial maxima of a
    * streaming (vec_id, label, embedding, `eventTimeCol`) feed under
    * a pre-built codebook + probe table; emits on watermark close. */
  def deconReport(stream: DataFrame, cb: Array[Seq[Double]],
                  probes: Seq[(Long, Long, Array[Float])],
                  eventTimeCol: String, watermark: String,
                  windowLen: String = "1 hour"): DataFrame = {
    val s = stream.sparkSession
    import s.implicits._
    // LOUD broadcast bound (the t24-guard precedent, round-15 verdict
    // item 4): the probe table is driver-held + broadcast under the
    // bounded-eval assumption — eval benchmarks are small by nature;
    // a probe table past this is a mis-aimed split, not an eval set
    require(probes.size <= graft.operators.IvfIndex.MaxQueryRows,
      s"streaming decon probe table has ${probes.size} rows " +
        s"(> ${graft.operators.IvfIndex.MaxQueryRows} broadcast bound): " +
        "the eval side must stay benchmark-sized — restrict the probe split")
    val pr = broadcast(probes.toDF("q_id", "cid", "qemb"))
    stream.withWatermark(eventTimeCol, watermark)
      // train side only (the _flush sentinel is train-side BY DESIGN:
      // this predicate is pushed below the watermark operator, so a
      // row it drops never advances the event clock — see scaladoc)
      .filter(pmod(col("vec_id"), lit(37L)) =!= 0L)
      .withColumn("cid", GraftFunctions.argMaxCosine(
        expr("transform(embedding, x -> cast(x as double))"),
        cb.map(_.toArray)))
      .join(pr, Seq("cid"))
      .select(col(eventTimeCol), col("q_id"),
        struct(
          round(GraftFunctions.cosineSimilarity(col("embedding"), col("qemb")), 6)
            .cast(DecimalType(18, 6)).cast(DoubleType).as("cos_sim"),
          (-col("vec_id")).as("neg_id"),
          col("vec_id").as("train_id"),
          col("label").cast(LongType).as("label")).as("cand"))
      .groupBy(window(col(eventTimeCol), windowLen), col("q_id"))
      .agg(max(col("cand")).as("best"))
      .select(col("q_id"), col("best"))
  }

  /** Driver-gate replay: ensure the persisted index, rank the eval
    * probes batch-side (the bounded searchWhere collect), replay the
    * embeddings table as a vec_id-ordered feed, re-aggregate the
    * window emissions — equals batch s12 exactly, so s12's oracle
    * SQL states the check. */
  def replayGate(s: SparkSession, sfDir: String, nBatches: Int = 3): DataFrame = {
    import s.implicits._
    val dir = graft.operators.IvfIndex.ensureBuilt(s, sfDir)
    val cb = s.read.parquet(s"$dir/codebook")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1).map(_._2)
    val evalSide = graft.Tables.load(s, sfDir, "embeddings")
      .filter(pmod(col("vec_id"), lit(37L)) === 0L)
      .select(col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> cast(x as double))").as("qvd"))
    // counted BEFORE the collect (the searchWhere guard's discipline):
    // a corpus-sized eval split fails loud, not with a driver OOM
    val nEval = evalSide.count()
    require(nEval * 4 <= graft.operators.IvfIndex.MaxQueryRows,
      s"streaming decon eval split has $nEval rows — at nprobe=4 its probe " +
        s"table exceeds the ${graft.operators.IvfIndex.MaxQueryRows}-row " +
        "broadcast bound (bounded-eval assumption): restrict the probe split")
    val evalRows = evalSide.collect()
    val probes: Seq[(Long, Long, Array[Float])] = evalRows.toSeq.flatMap { r =>
      graft.queries.Similarity.probeIds(cb, r.getSeq[Double](2), nprobe = 4)
        .map(cid => (r.getLong(0), cid, r.getSeq[Float](1).toArray))
    }
    val all = graft.Tables.load(s, sfDir, "embeddings")
      .select(col("vec_id").cast(LongType).as("vec_id"),
        col("label").cast(LongType).as("label"), col("embedding"))
    val maxId = all.agg(max(col("vec_id"))).head().getLong(0)
    val width = maxId / nBatches + 1
    val chunked = all.withColumn("chunk",
      expr(s"cast(vec_id div ${width}L as int)"))
    // sentinel: far-future TRAIN-side id (≢ 0 mod 37, so the
    // below-watermark train filter KEEPS it and its timestamp
    // advances the clock) with a well-defined unit vector; its own
    // window is past the final watermark so it never emits, and the
    // read-back drops its id regardless
    val raw = maxId * 2 + 7L * 24 * 3600
    val flushId = if (raw % 37 == 0) raw + 1 else raw
    val sentinel = Seq((flushId, 0L, Seq.fill(64)(1f)))
      .toDF("vec_id", "label", "embedding")
    ReplayHarness.run(s, "graft-s12-replay", nBatches, chunked, sentinel,
      stream => deconReport(
        stream.withColumn("evt",
          expr("timestamp_seconds(1700000000L + vec_id)")),
        cb, probes, "evt", "1 hour"),
      (sp, out) => {
        val best = sp.read.parquet(out)
          .filter(col("best.train_id") =!= flushId)
          .groupBy(col("q_id")).agg(max(col("best")).as("b"))
        best.select(col("q_id").as("eval_id"),
            col("b.train_id").as("train_id"), col("b.label").as("label"),
            col("b.cos_sim").as("cos_sim"),
            (col("b.cos_sim") >= graft.queries.Similarity.SemanticContamTau)
              .as("contaminated"))
          .orderBy("eval_id")
      })
  }
}
