package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Landed-table layout: partitioned parquet writes + partition pruning
  * + the per-constellation view catalog (SURVEY.md §1.4, §4).
  */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def decoded = {
    import spark.implicits._
    val chunks = spark.createDataset(SyntheticRtcm.corpus(2, 64))
    RtcmPipeline.decode(RtcmPipeline.frameChunks(chunks))
  }

  test("observations land partitioned by constellation and scans prune partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_layout").toString
    RtcmPipeline.observations(decoded)
      .withColumn("obs_date", to_date(col("obs_epoch")))
      .write.mode("overwrite")
      .partitionBy("obs_date", "constellation")
      .parquet(s"$dir/observations")

    val read = spark.read.parquet(s"$dir/observations")
      .filter(col("constellation") === "GPS")
    read.collect()
    val plan = read.queryExecution.executedPlan.toString
    // the constellation predicate lands in PartitionFilters (directory
    // pruning), not in the data filter
    assert("PartitionFilters: \\[[^\\]]*constellation".r.findFirstIn(plan).isDefined, plan.take(800))
    assert(read.select("constellation").distinct().collect().map(_.getString(0)).toSeq == Seq("GPS"))
  }

  test("per-constellation views expose the reference catalog names") {
    val d = decoded.persist()
    try {
      RtcmPipeline.registerConstellationViews(d)
      val gps = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT sat_id) AS sats FROM gps_observations").collect()(0)
      assert(gps.getLong(0) > 0)
      val glo = spark.sql("SELECT COUNT(*) FROM glonass_observations").collect()(0).getLong(0)
      assert(glo > 0)
      val sbas = spark.sql("SELECT COUNT(*) FROM sbas_observations").collect()(0).getLong(0)
      assert(sbas == 0) // synthetic corpus emits no SBAS MSM5/7
      // Q12-shaped SQL over the view catalog
      val pivot = spark.sql(
        """SELECT CAST(floor(unix_timestamp(obs_epoch) / 60) * 60 AS BIGINT) AS bucket,
          |  AVG(CASE WHEN sat_signal = 'L1C' THEN obs_snr END) AS avg_l1c
          |FROM gps_observations GROUP BY 1 ORDER BY 1""".stripMargin)
      assert(pivot.count() > 0)
      assert(spark.sql("SELECT COUNT(*) FROM rtcm_packages").collect()(0).getLong(0) == 128)
      assert(spark.sql("SELECT COUNT(*) FROM coordinates").collect()(0).getLong(0) == 2)
    } finally d.unpersist()
  }
}
