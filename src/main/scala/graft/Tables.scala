package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * At 100 TB these would be partitioned (`date(ts)` for `events`,
  * `date(o_orderdate)` for `orders`, …) and bucketed by join key; the
  * loaders keep a single code path so the same queries run on a
  * partitioned production layout — Catalyst partition-prunes when the
  * layout has partitions and no-ops when (as here) it doesn't.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.etl.BucketedLayout.loadIfBucketed(spark, dir, name)
      .getOrElse(loadPlain(spark, dir, name))

  /** The raw parquet read, bypassing any materialized layout. */
  private[graft] def loadPlain(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
      // reader refuses as a timestamp; read it as a nanos-long and
      // convert with exact integer division (a double division would
      // lose sub-ms precision at 2e18 nanos).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view (for spark.sql access). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** `documents` with the compute width decoupled from the file
    * layout — the shared input of every CPU-heavy per-doc kernel
    * (shingling, minhash, featurization, BPE): sf-dir corpora land as
    * ONE parquet file, so kernels chained straight onto the scan run
    * on a single core (measured: multi-second one-task stages all
    * over the dedup/text families at sf0.1). One hash exchange of the
    * compact (doc_id, text[, source]) rows is the guide §2.5
    * input-skew remedy; the cache boundary keeps the optimizer from
    * sinking the (deterministic) kernel projections back below the
    * exchange onto the serial scan side. Identical plans share one
    * cache entry; Bench clears caches between queries.
    *
    * SCALE-GUARDED (optimization round 18, verdict item 5): the
    * widen+cache is the remedy for a NARROW scan, so it applies only
    * when the scan yields fewer splits than the session's
    * parallelism. On a production many-file layout the scan is
    * already wide, and the unconditional form would materialize the
    * full corpus text into the cache per query family — forfeiting
    * scan-side pushdown for an exchange nobody needs. The plain
    * selected scan is returned in that case. */
  def loadDocsWide(spark: SparkSession, dir: String,
                   withSource: Boolean = false): DataFrame = {
    val base = load(spark, dir, "documents")
    val cols = if (withSource) Seq("doc_id", "source", "text")
               else Seq("doc_id", "text")
    val sel = base.select(cols.map(org.apache.spark.sql.functions.col): _*)
    // file-split count of the scan itself (no exchange in this plan,
    // so the RDD partition count IS the split count)
    val scanParts = sel.rdd.getNumPartitions
    if (scanParts >= spark.sparkContext.defaultParallelism) sel
    else sel.repartition(org.apache.spark.sql.functions.col("doc_id")).cache()
  }
}
