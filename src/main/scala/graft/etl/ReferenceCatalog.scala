package graft.etl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's complete table catalog (SURVEY.md §1.4) as views
  * over the synthetic pipeline output, with reference column names —
  * the environment the dashboards' verbatim SQL runs against:
  * rtcm_packages, {gps…sbas}_observations, coordinates (with the
  * reference's `anthgt` name), sourcetable_constants,
  * connection_logger.
  */
object ReferenceCatalog {

  def register(spark: SparkSession, nMounts: Int = 4, nFrames: Int = 240): Unit = {
    import spark.implicits._
    val chunks = spark.createDataset(SyntheticRtcm.corpus(nMounts, nFrames))
    val decoded = RtcmPipeline.decode(RtcmPipeline.frameChunks(chunks)).persist()
    RtcmPipeline.registerConstellationViews(decoded)
    // reference column name for the antenna height is anthgt
    // (initdb/02-coordinates.sql)
    RtcmPipeline.latestCoordinates(decoded)
      .withColumnRenamed("antenna_height", "anthgt")
      .createOrReplaceTempView("coordinates")

    SourceTable.parse(
        spark.createDataset(SourceTable.syntheticLines(math.max(nMounts, 4))), "casterA")
      .filter(col("mountpoint").isin(SyntheticRtcm.mountPoints(nMounts): _*))
      .createOrReplaceTempView("sourcetable_constants")

    // deterministic connection log: one closed + one open interval per
    // mountpoint (initdb/30-connection_logger.sql shape)
    val t0 = SyntheticRtcm.T0Micros / 1000000L
    val logs = SyntheticRtcm.mountPoints(nMounts).zipWithIndex.flatMap { case (m, i) =>
      Seq(
        (m, ts(t0 + 30 + i * 7), Some(ts(t0 + 90 + i * 11))),
        (m, ts(t0 + 150 + i * 13), Option.empty[java.sql.Timestamp]))
    }
    logs.toDF("mountpoint", "disconnect_time", "reconnect_time")
      .createOrReplaceTempView("connection_logger")
  }

  private def ts(epochSec: Long): java.sql.Timestamp =
    new java.sql.Timestamp(epochSec * 1000L)
}
