package graft

import graft.etl.{RtcmPipeline, SyntheticRtcm}
import org.apache.spark.sql.SparkSession

/** Ingest-path throughput: frames/s through framing+CRC+decode and
  * observation rows/s through MSM expansion, on a synthetic corpus at
  * local[32]. Compare BASELINE.md's implied reference envelope
  * (~10⁴ obs rows/s sustained for a full deployment).
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val nMounts = args.headOption.map(_.toInt).getOrElse(16)
    val nFrames = args.drop(1).headOption.map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val chunks = spark.createDataset(SyntheticRtcm.corpus(nMounts, nFrames))
      .repartition(32, org.apache.spark.sql.functions.col("mountPoint"))
      .persist()
    val nChunks = chunks.count() // materialize input outside the timed section
    val bytes = chunks.map(_.data.length.toLong).reduce(_ + _)

    val t0 = System.nanoTime()
    val decoded = RtcmPipeline.decode(RtcmPipeline.frameChunks(chunks)).persist()
    val frames = decoded.count()
    val tFrames = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val obs = RtcmPipeline.observations(decoded).count()
    val tObs = (System.nanoTime() - t1) / 1e9

    println(f"""{"metric":"ingest","mounts":$nMounts,"chunks":$nChunks,"mb":${bytes / 1e6}%.1f,"frames":$frames,"frames_per_s":${frames / tFrames}%.0f,"obs_rows":$obs,"obs_rows_per_s":${obs / (tFrames + tObs)}%.0f,"decode_s":$tFrames%.2f,"expand_s":$tObs%.2f}""")
    spark.stop()
  }
}
