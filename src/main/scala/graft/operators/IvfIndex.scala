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

  /** Train on the SF corpus and write the index. */
  def build(s: SparkSession, sfDir: String, indexDir: String): Unit = {
    val e = Similarity.corpus(s, sfDir)
    val cents = Similarity.trainCodebook(e)
    e.withColumn("cid",
      GraftFunctions.argMaxCosine(col("v"), cents.map(_.toArray)))
      .select(col("vec_id"), col("label"), col("embedding"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(s"$indexDir/postings")
    import s.implicits._
    cents.zipWithIndex.toSeq.map { case (c, i) => (i.toLong, c) }
      .toDF("cid", "cv")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexDir/codebook")
    e.unpersist()
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
