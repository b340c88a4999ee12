package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** c12 stage ladder (dev tool): where does the scrub spend its time —
  * planted-corpus construction, NFC, the regexp counts, the regexp
  * replaces, or the whitespace collapse. Bench-protocol confs
  * (16m maxPartitionBytes — the T17Lab lesson). */
object C12Lab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf10"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.PiiScrub
    def docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    def pl = PiiScrub.planted(docs)
    def agg(df: DataFrame, c: String) =
      df.agg(sum(length(col(c)).cast(LongType)))
    PerfLab.time("scan+length(text)")(agg(docs, "text"))
    PerfLab.time("planted")(agg(pl, "planted"))
    PerfLab.time("planted+nfc")(agg(
      pl.withColumn("nfc", graft.functions.GraftFunctions.nfcNormalize(col("planted"))), "nfc"))
    PerfLab.time("plant+count_email")(
      pl.withColumn("n", regexp_count(col("planted"), lit(PiiScrub.EmailRe)))
        .agg(sum(col("n"))).toDF())
    PerfLab.time("plant+replace_email")(agg(
      pl.withColumn("t1", regexp_replace(col("planted"), PiiScrub.EmailRe, "<EMAIL>")), "t1"))
    PerfLab.time("plant+collapse")(agg(
      pl.withColumn("t", trim(regexp_replace(col("planted"), " +", " "))), "t"))
    PerfLab.time("full scrub")(agg(PiiScrub.scrub(pl, "planted"), "scrubbed"))
    PerfLab.time("c12 full query")(
      graft.SparkEntry.queries("c12_pii_scrub")(spark, sfDir))
    spark.stop()
  }
}
