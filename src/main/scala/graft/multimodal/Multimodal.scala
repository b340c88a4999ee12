package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for a training-data
  * pipeline: media as opaque `binary` columns + typed metadata,
  * decode/feature-extract as batched partition-local transforms.
  *
  * The Spark-side plumbing — schema, partitioning by modality, batch
  * shape, feature schema — is real and tested. The metadata decode is
  * REAL header parsing (`MediaCodec`: PNG/JPEG/GIF/BMP dimensions,
  * WAV duration — published byte layouts, pure Scala); only the full
  * pixel/sample decode is a declared stub (`FakeCodec` pseudo-
  * features) because this container ships no imaging libraries —
  * swapping in a real pixel decoder changes ONE function. Video
  * container parsing (MP4 boxes) is not implemented: video records
  * take the pseudo path, clearly marked per record by `format`.
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
      format: String,        // sniffed container (png/jpeg/gif/bmp/wav) or "unknown"
      n_bytes: Int,
      width: Int,            // images: real header dims; video: pseudo
      height: Int,
      duration_ms: Int,      // audio: real (data bytes / byte rate); video: pseudo
      byte_histogram: Array[Double],  // 16-bin normalized histogram
      content_hash: Long)

  /** STUB pixel-level decoder — deterministic pseudo-features for
    * payloads whose container we can't parse (video: no MP4 box parser
    * here). The signature and batch shape are the real contract. */
  object FakeCodec {
    def decode(r: MediaRecord): MediaFeatures = {
      val (hist, h) = histAndHash(r.content)
      // pseudo-dimensions derived deterministically from content
      val w = 64 + (math.abs(h % 1024)).toInt
      MediaFeatures(r.media_id, r.kind, "unknown", r.content.length,
        width = if (r.kind != "audio") w else 0,
        height = if (r.kind != "audio") (w * 3) / 4 else 0,
        duration_ms = if (r.kind != "image") 1000 + (math.abs(h % 59000)).toInt else 0,
        byte_histogram = hist,
        content_hash = h)
    }
  }

  private def histAndHash(bytes: Array[Byte]): (Array[Double], Long) = {
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
    (hist, h)
  }

  /** Real metadata decode, GATED BY the record's declared modality —
    * magic-byte sniffing alone can false-positive on arbitrary bytes
    * (BMP's 2-byte magic matches text starting "BM"), so an image
    * record only tries image containers and an audio record only WAV;
    * unrecognized payloads fall back to the declared pseudo path. */
  def decodeRecord(r: MediaRecord): MediaFeatures = r.kind match {
    case "image" => MediaCodec.sniffImage(r.content) match {
      case Some(img) =>
        val (hist, h) = histAndHash(r.content)
        MediaFeatures(r.media_id, r.kind, img.format, r.content.length,
          img.width, img.height, 0, hist, h)
      case None => FakeCodec.decode(r)
    }
    case "audio" => MediaCodec.sniffWav(r.content) match {
      case Some(a) =>
        val (hist, h) = histAndHash(r.content)
        MediaFeatures(r.media_id, r.kind, a.format, r.content.length,
          0, 0, a.durationMs, hist, h)
      case None => FakeCodec.decode(r)
    }
    case _ => FakeCodec.decode(r)
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
        batch.map(decodeRecord)
      }
    }
  }

  /** Synthesize a deterministic media table from the documents table
    * (no binary test data exists): REAL containers — a valid 24-bpp
    * BMP per image record, a valid 8-bit PCM WAV per audio record
    * (payload bytes from the text) — and raw bytes for video (the
    * pseudo-decode path). */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val payload = text.getBytes("UTF-8")
        (id % 3) match {
          case 0 => MediaRecord(id, "image",
            MediaCodec.buildBmp(16 + (id % 32).toInt, 12 + (id % 24).toInt, payload), src)
          case 1 => MediaRecord(id, "audio",
            MediaCodec.buildWav(8000, 2000 + (id % 6000).toInt * 8, payload), src)
          case _ => MediaRecord(id, "video", payload, src)
        }
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
        sum(when(col("format") =!= "unknown", 1L).otherwise(0L)).as("n_sniffed"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("width")), 3).as("avg_width"),
        round(avg(col("duration_ms")), 3).as("avg_duration_ms"),
        round(avg(expr("byte_histogram[0]")), 6).as("avg_hist_bin0"),
        countDistinct(col("content_hash")).as("n_distinct"))
      .orderBy("kind")
  }
}
