package graft.queries

import graft.etl.{RtcmPipeline, SyntheticRtcm}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end RTCM pipeline queries over a deterministic synthetic
  * corpus (SyntheticRtcm, seed-fixed): transport chunks → framing →
  * CRC → decode → MSM expansion → table projections → dashboard-shaped
  * analytics. Not SQL-expressible from the parquet test tables, so no
  * DuckDB oracle — the driver records rows-only checks; full
  * value-level assertions live in the ScalaTest suites.
  */
object RtcmQueries extends QueryModule {

  private val NMounts = 4
  private val NFrames = 240

  // The corpus is deterministic, so the decoded Dataset is cached per
  // session: six queries share one framing+decode pass.
  private val cache =
    new java.util.WeakHashMap[SparkSession, org.apache.spark.sql.Dataset[graft.etl.DecodedFrame]]()

  private def decoded(s: SparkSession): org.apache.spark.sql.Dataset[graft.etl.DecodedFrame] =
    cache.synchronized {
      Option(cache.get(s)).getOrElse {
        import s.implicits._
        val chunks = s.createDataset(SyntheticRtcm.corpus(NMounts, NFrames))
          .repartition(8, col("mountPoint"))
        val d = RtcmPipeline.decode(RtcmPipeline.frameChunks(chunks)).persist()
        cache.put(s, d)
        d
      }
    }

  /** rtcm_packages: one metadata row per CRC-valid frame. */
  private def packages(s: SparkSession, d: String): DataFrame =
    RtcmPipeline.packages(decoded(s)).orderBy("mountpoint", "receive_time", "rtcm_package_id")

  /** Per-(sat, signal) observation rows from MSM5/MSM7 expansion. */
  private def observations(s: SparkSession, d: String): DataFrame =
    RtcmPipeline.observations(decoded(s))
      .orderBy("mountpoint", "obs_epoch", "sat_id", "sat_signal")

  /** Latest ARP per mountpoint (upsert-table semantics as window dedup). */
  private def coordinatesLatest(s: SparkSession, d: String): DataFrame =
    RtcmPipeline.latestCoordinates(decoded(s)).orderBy("mountpoint")

  /** Q12-shaped SNR pivot over the decoded GPS observations
    * (Disturbances.json:122): avg SNR per minute per signal, fixed
    * column set incl. never-emitted L5X. */
  private def snrPivot(s: SparkSession, d: String): DataFrame = {
    def p(sig: String) =
      round(avg(when(col("sat_signal") === sig, col("obs_snr"))), 6).as(s"avg_snr_$sig")
    RtcmPipeline.observations(decoded(s))
      .filter(col("constellation") === "GPS")
      .groupBy(window(col("obs_epoch"), "60 seconds").getField("start").as("bucket"),
        col("mountpoint"))
      .agg(p("L1C"), p("L2W"), p("L2X"), p("L5X"))
      .orderBy("bucket", "mountpoint")
  }

  /** Q9-shaped latency: receive_time vs obs_epoch seconds-of-day delta
    * per mountpoint (RTCM monitor.json:1072). */
  private def latency(s: SparkSession, d: String): DataFrame = {
    val leap = when(col("constellation").isin("GPS", "GALILEO"), 18L)
      .when(col("constellation") === "BEIDOU", 4L).otherwise(0L)
    val lat = pmod(unix_timestamp(col("receive_time")) + leap, lit(86400L)) -
      pmod(unix_timestamp(col("rtcm_obs_epoch")), lit(86400L))
    RtcmPipeline.packages(decoded(s))
      .filter(col("rtcm_obs_epoch").isNotNull)
      .groupBy(col("mountpoint"), col("constellation"))
      .agg(round(avg(lat), 3).as("avg_latency_s"), max(lat).as("max_latency_s"),
        min(lat).as("min_latency_s"), count(lit(1)).as("n"))
      .orderBy("mountpoint", "constellation")
  }

  /** Data-gap heatmap over packages (Q8 shape, RTCM monitor.json:949). */
  private def gaps(s: SparkSession, d: String): DataFrame =
    RtcmPipeline.packages(decoded(s))
      .filter(col("rtcm_obs_epoch").isNotNull)
      .groupBy(window(col("receive_time"), "30 seconds").getField("start").as("bucket"),
        col("mountpoint"))
      .agg(count(col("rtcm_obs_epoch")).as("n"))
      .orderBy("bucket", "mountpoint")

  /** SQL-facing CRC audit via the codegen'd crc24q expression: every
    * synthetic frame's stored CRC matches a recompute over its body
    * (the same LUT the framing layer uses). */
  private def crcAudit(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.crc24q
    import s.implicits._
    val frames = SyntheticRtcm.mountPoints(NMounts).zipWithIndex.flatMap { case (m, i) =>
      SyntheticRtcm.framesFor(m, 100 + i, NFrames, 42L + i).map { case (_, f) => (m, f) }
    }
    s.createDataset(frames).toDF("mountpoint", "frame")
      .withColumn("calc_crc", crc24q(expr("substring(frame, 1, length(frame) - 3)")))
      .withColumn("stored_crc",
        expr("conv(hex(substring(frame, length(frame) - 2, 3)), 16, 10)").cast("int"))
      .groupBy(col("mountpoint"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("calc_crc") === col("stored_crc"), 1L).otherwise(0L)).as("n_valid"))
      .orderBy("mountpoint")
  }

  /** Q16-shaped template-variable query from the Disturbances
    * dashboard: DISTINCT signals per constellation, ordered (the list
    * feeding the SNR panels' column sets). */
  private def templateSignals(s: SparkSession, d: String): DataFrame =
    RtcmPipeline.observations(decoded(s))
      .select(col("constellation"), col("sat_signal")).distinct()
      .orderBy("constellation", "sat_signal")

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rtcm_template_signals" -> templateSignals,
    "rtcm_crc_audit" -> crcAudit,
    "rtcm_packages_e2e" -> packages,
    "rtcm_observations_e2e" -> observations,
    "rtcm_coordinates_latest" -> coordinatesLatest,
    "rtcm_snr_pivot" -> snrPivot,
    "rtcm_latency_stats" -> latency,
    "rtcm_gap_heatmap" -> gaps)

  /** Pipeline outputs aren't derivable from the parquet tables by SQL —
    * no oracle entries (driver: rows-only). */
  override def oracle: Map[String, String] = Map.empty
}
