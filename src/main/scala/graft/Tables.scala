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
}
