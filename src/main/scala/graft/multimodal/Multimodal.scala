package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: media as opaque `binary` columns + typed metadata,
  * decode/feature-extract as batched partition-local transforms.
  *
  * The Spark-side plumbing — schema, partitioning by modality, batch
  * shape, feature schema — is real and tested. The codec step itself
  * is STUBBED (`FakeCodec`): this container has no image/audio
  * libraries, so decode produces deterministic pseudo-features from
  * the bytes. Swapping in a real decoder changes ONE function.
  *
  * Scale notes: extraction is `mapPartitions` in fixed-size batches —
  * the same shape as a Pandas-UDF/`mapInPandas` stage (amortize model
  * init per batch, bound memory per batch); no shuffle until the
  * per-modality aggregate; binary payloads never pass through a wide
  * transformation.
  */
object Multimodal {

  final case class MediaRecord(
      media_id: Long,
      kind: String,          // image | audio | video
      content: Array[Byte],
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,            // images/video (stub-decoded)
      height: Int,
      duration_ms: Int,      // audio/video (stub-decoded)
      byte_histogram: Array[Double],  // 16-bin normalized histogram
      content_hash: Long)

  /** STUB decoder — deterministic pseudo-decode of the binary payload.
    * Replace with a real image/audio codec in production (???-marker):
    * the signature and batch shape are the real contract. */
  object FakeCodec {
    def decode(r: MediaRecord): MediaFeatures = {
      val bytes = r.content
      val hist = new Array[Double](16)
      var i = 0
      var h = 1469598103934665603L
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) >> 4) += 1
        h = h * 1000003L + (bytes(i) & 0xFF)
        i += 1
      }
      val n = math.max(1, bytes.length)
      var b = 0
      while (b < 16) { hist(b) /= n; b += 1 }
      // pseudo-dimensions derived deterministically from content
      val w = 64 + (math.abs(h % 1024)).toInt
      MediaFeatures(r.media_id, r.kind, bytes.length,
        width = if (r.kind != "audio") w else 0,
        height = if (r.kind != "audio") (w * 3) / 4 else 0,
        duration_ms = if (r.kind != "image") 1000 + (math.abs(h % 59000)).toInt else 0,
        byte_histogram = hist,
        content_hash = h)
    }
  }

  final val BatchSize = 64

  /** Batched feature extraction: partition-local, `BatchSize` records
    * per decode batch (the mapInPandas batch contract). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch init hook: a real codec/model loads here, once per
        // batch, not once per record
        batch.map(FakeCodec.decode)
      }
    }
  }

  /** Synthesize a deterministic media table from the documents table
    * (no binary test data exists): UTF-8 payload + kind by id. */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRecord(id, kind, text.getBytes("UTF-8"), src)
      }
  }

  /** Per-modality feature aggregate (rows-only query). */
  def featureSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = extractFeatures(
      syntheticMedia(spark, sfDir).repartition(8, col("kind")))
    feats.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 3).as("avg_width"),
        round(avg(col("duration_ms")), 3).as("avg_duration_ms"),
        round(avg(expr("byte_histogram[0]")), 6).as("avg_hist_bin0"),
        countDistinct(col("content_hash")).as("n_distinct"))
      .orderBy("kind")
  }
}
