package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the exactness baseline, an
  * IVF (centroid-bucketed) variant as the scale path, and per-label
  * centroid statistics.
  *
  * Numeric discipline: all arithmetic in double with a left-to-right
  * fold (`aggregate`), matching DuckDB's list_sum order, so the
  * oracle values are bit-identical before the final fixed rounding.
  * Scale notes: top-k never full-sorts the corpus in the IVF path —
  * candidates come from the 2 nearest centroid buckets; the brute
  * path is one map + one small sort of scores only.
  */
object Similarity extends QueryModule {

  import graft.functions.GraftFunctions.{cosineSimilarity, vectorDot, vectorNorm}

  private def emb(s: SparkSession, d: String) =
    Tables.load(s, d, "embeddings")

  // s01: brute-force cosine top-20 for the query vector vec_id = 0.
  // Scoring runs through the codegen'd VectorDot/VectorNorm
  // expressions — numerically identical (left-to-right double fold) to
  // the oracle's list_sum formula.
  private def s01(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        cosineSimilarity(col("embedding"), col("qv")).as("cos"))
      .select(col("vec_id"), round(col("cos"), 6).cast(DecimalType(18, 6)).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(20)
  }

  private val s01Sql =
    """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
      |SELECT vec_id, CAST(ROUND(
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE)))
      |    / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |     * sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |  , 6) AS DECIMAL(18,6)) AS cos_sim
      |FROM embeddings e, q
      |WHERE e.vec_id <> 0
      |ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin

  // s02: per-label centroid norm — element-wise exact-decimal mean
  // (posexplode ⇄ unnest zip), then norm of the mean vector.
  // DECIMAL(38,30) sums make the element means order-independent.
  private def s02(s: SparkSession, d: String): DataFrame =
    emb(s, d)
      .select(col("label"),
        posexplode(expr("transform(embedding, x -> cast(x as double))")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg((sum(col("v").cast(DecimalType(38, 30))).cast(DoubleType) /
        count(col("v"))).as("mean_v"))
      .groupBy(col("label"))
      .agg(round(sqrt(sum(col("mean_v") * col("mean_v"))), 6)
        .cast(DecimalType(18, 6)).as("centroid_norm"),
        count(lit(1)).as("n_dims"))
      .orderBy("label")

  private val s02Sql =
    """SELECT label,
      |  CAST(ROUND(sqrt(SUM(mean_v * mean_v)), 6) AS DECIMAL(18,6)) AS centroid_norm,
      |  COUNT(*) AS n_dims
      |FROM (
      |  SELECT label, pos,
      |    CAST(SUM(CAST(v AS DECIMAL(38,30))) AS DOUBLE) / COUNT(v) AS mean_v
      |  FROM (
      |    SELECT label, unnest(range(1, 65)) AS pos,
      |      unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v
      |    FROM embeddings) x
      |  GROUP BY 1, 2) m
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // s03: IVF approximate top-k — assign vectors to their label
  // centroid (the coarse quantizer), probe the 2 centroids nearest the
  // query, exact-score only those buckets. Rows-only: approximation
  // contract (recall vs s01) is asserted in the ScalaTest suite.
  private def s03(s: SparkSession, d: String): DataFrame = {
    val e = emb(s, d).select(col("vec_id"), col("label"), col("embedding")).cache()
    // coarse quantizer: per-label element-wise mean (collect 10×64 to
    // the driver — the quantizer is tiny and broadcast, as in IVF)
    val cent = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x")).as("m"))
      .groupBy("label").agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label"), expr("transform(pm, t -> t.m)").as("cv"))
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val probes = cent.crossJoin(broadcast(q))
      .select(col("label"), cosineSimilarity(col("cv"), col("qv")).as("cc"))
      .orderBy(desc("cc")).limit(2)
      .select(col("label"))
    e.join(broadcast(probes), "label")
      .filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("label"),
        round(cosineSimilarity(col("embedding"), col("qv")), 6)
          .cast(DecimalType(18, 6)).as("cos_sim"))
      .orderBy(desc("cos_sim"), col("vec_id"))
      .limit(10)
  }

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s01_knn_brute_cosine" -> s01,
    "s02_centroid_norms" -> s02,
    "s03_ivf_ann_topk" -> s03)

  override def oracle: Map[String, String] = Map(
    "s01_knn_brute_cosine" -> s01Sql,
    "s02_centroid_norms" -> s02Sql)
}
