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
  * WAV duration, MP4 box walk for video duration/track dims —
  * published byte layouts, pure Scala); only the full pixel/sample
  * decode of compressed codecs is a declared stub (`FakeCodec`
  * pseudo-features) because this container ships no codec
  * libraries — swapping in a real decoder changes ONE function.
  * Unrecognized payloads take the pseudo path, clearly marked per
  * record by `format`.
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
      format: String,        // sniffed container (png/jpeg/gif/bmp/wav/mp4) or "unknown"
      n_bytes: Int,
      width: Int,            // images: real header dims; video: real tkhd dims (mp4)
      height: Int,
      duration_ms: Int,      // audio: real (data bytes / byte rate); video: real mvhd duration (mp4)
      byte_histogram: Array[Double],  // 16-bin normalized histogram
      content_hash: Long,
      mean_r: Double,        // REAL pixel statistics (png/bmp/gif decode; jpeg
      mean_g: Double,        // baseline SOF0 + progressive SOF2); 0.0 +
      mean_b: Double,        // pixels_real=false only on the fallback path
      mean_luma: Double,     // (unparseable container or inter-frame video codec)
      pixels_real: Boolean)

  /** STUB pixel-level decoder — deterministic pseudo-features for
    * payloads whose container we can't parse. The signature and batch
    * shape are the real contract. */
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
        content_hash = h,
        mean_r = 0.0, mean_g = 0.0, mean_b = 0.0, mean_luma = 0.0,
        pixels_real = false)
    }
  }

  /** Mean R/G/B and Rec.601 luma over decoded pixels. */
  private def pixelStats(img: MediaCodec.PixelImage): (Double, Double, Double, Double) = {
    var (sr, sg, sb) = (0.0, 0.0, 0.0)
    val n = img.width.toLong * img.height
    var i = 0
    while (i < img.rgb.length) {
      sr += img.rgb(i) & 0xFF; sg += img.rgb(i + 1) & 0xFF; sb += img.rgb(i + 2) & 0xFF
      i += 3
    }
    val (mr, mg, mb) = (sr / n, sg / n, sb / n)
    (mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb)
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
        // REAL pixel decode where the container is fully parseable
        // pure-JVM: PNG (Inflater + unfilter), uncompressed BMP, GIF
        // (LZW), and baseline JPEG (Huffman + IDCT); progressive JPEG
        // falls back to header-only
        // a corrupt container must degrade to the pseudo path, never
        // kill the task — the decoders guard their bounds, this is the
        // last line of defense for the ones they miss
        val pix = try {
          img.format match {
            case "png" => MediaCodec.decodePngPixels(r.content)
            case "bmp" => MediaCodec.decodeBmpPixels(r.content)
            case "gif" => MediaCodec.decodeGifPixels(r.content)
            case "jpeg" => MediaCodec.decodeJpegPixels(r.content)
            case _ => None
          }
        } catch { case scala.util.control.NonFatal(_) => None }
        val (mr, mg, mb, ml) = pix.map(pixelStats).getOrElse((0.0, 0.0, 0.0, 0.0))
        MediaFeatures(r.media_id, r.kind, img.format, r.content.length,
          img.width, img.height, 0, hist, h,
          mr, mg, mb, ml, pixels_real = pix.isDefined)
      case None => FakeCodec.decode(r)
    }
    case "audio" => MediaCodec.sniffWav(r.content) match {
      case Some(a) =>
        val (hist, h) = histAndHash(r.content)
        MediaFeatures(r.media_id, r.kind, a.format, r.content.length,
          0, 0, a.durationMs, hist, h,
          0.0, 0.0, 0.0, 0.0, pixels_real = false)
      case None => FakeCodec.decode(r)
    }
    case "video" => MediaCodec.sniffMp4(r.content) match {
      case Some(v) =>
        // REAL container metadata (MP4 box walk: mvhd duration, tkhd
        // track dims); frame pixels stay a declared stub (the mdat
        // payload needs a video codec)
        val (hist, h) = histAndHash(r.content)
        MediaFeatures(r.media_id, r.kind, v.format, r.content.length,
          v.width, v.height, v.durationMs, hist, h,
          0.0, 0.0, 0.0, 0.0, pixels_real = false)
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
    * (no binary test data exists): REAL containers — image records
    * rotate through a valid 8-bit RGB PNG ((doc_id/3) % 4 = 0), a
    * valid 24-bpp BMP (= 1), a valid JPEG (= 2, block-constant
    * colors → exact decode, alternating baseline SOF0 and progressive
    * SOF2 encodes of identical pixels), and a valid GIF89a (= 3,
    * grayscale palette, uncompressed-LZW body) so all four image
    * decoders sit under the pixel oracles; audio records are valid
    * 8-bit PCM WAVs; video records alternate real MP4 containers with
    * raw bytes (the pseudo-decode path). */
  def syntheticMedia(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val payload = text.getBytes("UTF-8")
        (id % 3) match {
          case 0 =>
            val (w, h) = (16 + (id % 32).toInt, 12 + (id % 24).toInt)
            MediaRecord(id, "image",
              (id / 3) % 4 match {
                case 0 => MediaCodec.buildPng(w, h, payload)
                case 1 => MediaCodec.buildBmp(w, h, payload)
                case 2 =>
                  // alternate baseline SOF0 / progressive SOF2 encodes
                  // of the SAME block colors — the five-scan progressive
                  // accumulation decodes to bit-identical pixels, so
                  // the m05 oracle covers both without a format split
                  val colors = (bx: Int, by: Int) =>
                    (((id * 7 + bx * 31 + by * 17) % 256).toInt,
                      ((id * 3 + bx * 13 + by * 7) % 256).toInt,
                      ((id * 11 + bx * 5 + by * 29) % 256).toInt)
                  if ((id / 9) % 2 == 0) MediaCodec.buildJpeg(w, h, colors)
                  else MediaCodec.buildProgressiveJpeg(w, h, colors)
                case _ => MediaCodec.buildGif(w, h, payload)
              }, src)
          case 1 => MediaRecord(id, "audio",
            // alternate 8-bit and 16-bit PCM so both decode branches
            // sit under the m03/m01 oracles; same sample count, so
            // the sniffed duration formula is shared
            if ((id / 3) % 2 == 0)
              MediaCodec.buildWav(8000, 2000 + (id % 6000).toInt * 8, payload)
            else
              MediaCodec.buildWav16(8000, 2000 + (id % 6000).toInt * 8, payload), src)
          case _ => MediaRecord(id, "video",
            // alternate real MP4 containers with raw bytes so the
            // declared pseudo fallback stays exercised (same pattern
            // as the PNG/BMP image alternation)
            if ((id / 3) % 2 == 0)
              MediaCodec.buildMp4(3000 + (id % 9000).toInt,
                160 + (id % 8).toInt * 16, 96 + (id % 6).toInt * 16,
                500 + (id % 1500).toInt, payload)
            else payload, src)
        }
      }
  }

  /** Per-record audio signal features over decoded PCM samples —
    * all integer-exact so the aggregate is order-independent and
    * oracle-checkable: peak = max |s|, sum_abs / sum_sq for
    * amplitude/energy, zero crossings = sign changes (negative →
    * non-negative or back) over the interleaved stream. */
  final case class AudioFeatures(
      media_id: Long,
      source: String,
      sample_rate: Int,
      n_samples: Long,
      peak: Long,
      sum_abs: Long,
      sum_sq: Long,
      zero_crossings: Long,
      pcm_real: Boolean)

  def audioFeatures(records: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          MediaCodec.decodeWavSamples(r.content) match {
            case Some(pcm) =>
              var (sumAbs, sumSq, zc, peak) = (0L, 0L, 0L, 0L)
              var prevNeg = false
              var i = 0
              while (i < pcm.samples.length) {
                val s = pcm.samples(i)
                val a = math.abs(s).toLong
                sumAbs += a; sumSq += a * a
                if (a > peak) peak = a
                val neg = s < 0
                if (i > 0 && neg != prevNeg) zc += 1
                prevNeg = neg
                i += 1
              }
              AudioFeatures(r.media_id, r.source, pcm.sampleRate,
                pcm.samples.length.toLong, peak, sumAbs, sumSq, zc, pcm_real = true)
            case None =>
              AudioFeatures(r.media_id, r.source, 0, 0L, 0L, 0L, 0L, 0L, pcm_real = false)
          }
        }
      }
    }
  }

  /** m03: per-source audio profile over REAL decoded PCM — the
    * feature-extract stage of an audio training-data pipeline
    * (amplitude/energy/zero-crossing-rate), aggregated with
    * integer-exact sums so the result hash-matches an independent
    * decoder's. */
  def audioSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val audio = syntheticMedia(spark, sfDir)
      .filter(col("kind") === "audio")
      .repartition(8, col("media_id"))
    audioFeatures(audio).toDF()
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_audio"),
        sum(when(col("pcm_real"), 1L).otherwise(0L)).as("n_pcm_real"),
        sum(col("n_samples")).as("total_samples"),
        max(col("peak")).as("peak"),
        sum(col("zero_crossings")).as("zero_crossings"),
        sum(col("sum_sq")).as("energy"),
        graft.queries.Q.fixedDec(
          graft.queries.Q.rhu(sum(col("sum_abs")) * 1000L, sum(col("n_samples")), 1000L), 6)
          .as("mean_abs"))
      .orderBy("source")
  }

  /** m08: integer stride decimation (↓M, M = 4) of the decoded PCM —
    * the sample-rate-reduction stage of an audio pipeline, done as
    * the exact-integer choice: a production resampler FIR-filters
    * before decimating, which is floating-point and implementation-
    * defined across engines, so the stated contract here is plain
    * stride decimation (every M-th sample; the synthetic corpus is
    * mono, so channel interleaving is not disturbed — a multichannel
    * input would decimate per channel). Reports the m03 integer-exact
    * aggregate family over the decimated stream, so an independent
    * decoder + decimator reproduces it bit-for-bit. */
  def decimationSummary(spark: SparkSession, sfDir: String,
                        stride: Int = 4): DataFrame = {
    import spark.implicits._
    val audio = syntheticMedia(spark, sfDir)
      .filter(col("kind") === "audio")
      .repartition(8, col("media_id"))
    val feats = audio.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { r =>
          MediaCodec.decodeWavSamples(r.content) match {
            case Some(pcm) =>
              var sumAbs = 0L; var sumSq = 0L; var peak = 0L; var nOut = 0L
              var i = 0
              while (i < pcm.samples.length) {
                val a = math.abs(pcm.samples(i)).toLong
                sumAbs += a; sumSq += a * a
                if (a > peak) peak = a
                nOut += 1
                i += stride
              }
              (r.media_id, r.source, pcm.sampleRate / stride, nOut,
                peak, sumAbs, sumSq, true)
            case None => (r.media_id, r.source, 0, 0L, 0L, 0L, 0L, false)
          }
        }
      }
    }.toDF("media_id", "source", "out_rate", "n_out", "peak",
      "sum_abs", "sum_sq", "pcm_real")
    feats.groupBy(col("source"))
      .agg(count(lit(1)).as("n_audio"),
        sum(col("n_out")).as("total_out_samples"),
        max(col("peak")).as("peak"),
        sum(col("sum_sq")).as("energy"),
        graft.queries.Q.fixedDec(
          graft.queries.Q.rhu(sum(col("sum_abs")) * 1000L, sum(col("n_out")), 1000L), 6)
          .as("mean_abs"))
      .orderBy("source")
  }

  /** Per-record perceptual hash over REAL decoded pixels (resize →
    * 32×32 luma → sequency-WHT hash, see [[ImageOps]]). */
  final case class ImageHash(
      media_id: Long, source: String, format: String, phash: Long)

  def imageHashes(records: Dataset[MediaRecord]): Dataset[ImageHash] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { r =>
          MediaCodec.sniffImage(r.content).flatMap { info =>
            (try {
              info.format match {
                case "png" => MediaCodec.decodePngPixels(r.content)
                case "bmp" => MediaCodec.decodeBmpPixels(r.content)
                case "gif" => MediaCodec.decodeGifPixels(r.content)
                case "jpeg" => MediaCodec.decodeJpegPixels(r.content)
                case _ => None
              }
            } catch { case scala.util.control.NonFatal(_) => None })
              .map(img => ImageHash(r.media_id, r.source, info.format, ImageOps.phash(img)))
          }
        }
      }
    }
  }

  /** m04: per-source image fingerprint profile — decode → resize →
    * perceptual hash, aggregated integer-exact. Scoped to the png/bmp
    * records, whose pixel construction the oracle can restate without
    * a second JPEG decoder (JPEG pHash is exercised in ImageOpsSpec);
    * a divergence anywhere in inflate/unfilter/flip → luma → resize →
    * WHT → hash fails the gate. */
  def imagePhashSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val images = syntheticMedia(spark, sfDir)
      .filter(col("kind") === "image")
      .repartition(8, col("media_id"))
    imageHashes(images).toDF()
      .filter(col("format").isin("png", "bmp"))
      .groupBy(col("source"), col("format"))
      .agg(
        count(lit(1)).as("n_images"),
        countDistinct(col("phash")).as("n_distinct_phash"),
        sum(bit_count(col("phash"))).as("set_bits"))
      .orderBy("source", "format")
  }

  /** m09: image NEAR-DUP detection — the dedup family's LSH banding
    * (d03) applied to m04's perceptual hashes over REAL decoded
    * pixels: the 64-bit pHash splits into 4 × 16-bit bands; CANDIDATE
    * pairs share at least one (band, value); verified near-dups have
    * hamming(pHash_a, pHash_b) ≤ 10. Banding bounds the pair space by
    * band-bucket co-membership (never all-pairs — at corpus scale the
    * candidate join is bucket-local exactly like d03's), and recall
    * is exact for hamming ≤ 3 by pigeonhole (4 bands, ≤ 3 differing
    * bits leave ≥ 1 band untouched); past that it is the standard
    * probabilistic LSH recall trade, stated not hidden. Scoped to the
    * png/bmp records like m04 so the Python oracle can reconstruct
    * the pixels without a second JPEG decoder; the oracle recomputes
    * decode→resize→hash→bands→hamming independently.
    */
  def imageNearDups(spark: SparkSession, sfDir: String): DataFrame = {
    val images = syntheticMedia(spark, sfDir)
      .filter(col("kind") === "image")
      .repartition(8, col("media_id"))
    val hashes = imageHashes(images).toDF()
      .filter(col("format").isin("png", "bmp"))
      .select(col("media_id"), col("phash")).cache()
    val bands = hashes.select(col("media_id"), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("bid"),
          shiftrightunsigned(col("phash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("bval"))): _*)).as("bd"))
      .select(col("media_id"), col("phash"),
        col("bd.bid").as("bid"), col("bd.bval").as("bval"))
    // a pair matching in several bands must count once: distinct on
    // ids (phash is id-determined, carried through for the verify)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bid") === col("b.bid") && col("a.bval") === col("b.bval") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.phash").as("ph_a"), col("b.phash").as("ph_b"))
      .distinct()
    val isDup = bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= 10
    val nd = cand.filter(isDup)
    val dupIds = nd.select(col("id_a").as("id"))
      .union(nd.select(col("id_b").as("id"))).distinct()
    // (metric, value) rows via union — a single-row crossJoin
    // assembly would plan two CartesianProducts and trip the
    // no-cartesian audit the candidate join is held to
    hashes.agg(count(lit(1)).as("v"))
      .select(lit("n_images").as("metric"), col("v"))
      .union(cand
        .agg(count(lit(1)).as("c"), sum(when(isDup, 1L).otherwise(0L)).as("n"))
        .selectExpr("stack(2, 'n_candidate_pairs', c, 'n_neardup_pairs', n) " +
          "as (metric, v)"))
      .union(dupIds.agg(count(lit(1)).as("v"))
        .select(lit("n_dup_images").as("metric"), col("v")))
      .orderBy("metric")
  }

  /** Per-record integer pixel sums over REAL decoded pixels — the
    * mean-color/luma feature stage of an image pipeline with
    * order-independent integer arithmetic (sums, not means, so the
    * aggregate is exact under any partial-aggregation order). Luma is
    * the same integer weighting ImageOps uses: (77r+150g+29b)>>8. */
  final case class PixelSums(
      media_id: Long, source: String, format: String,
      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long, sum_luma: Long)

  def pixelSums(records: Dataset[MediaRecord]): Dataset[PixelSums] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { r =>
          MediaCodec.sniffImage(r.content).flatMap { info =>
            (try {
              info.format match {
                case "png" => MediaCodec.decodePngPixels(r.content)
                case "bmp" => MediaCodec.decodeBmpPixels(r.content)
                case "gif" => MediaCodec.decodeGifPixels(r.content)
                case "jpeg" => MediaCodec.decodeJpegPixels(r.content)
                case _ => None
              }
            } catch { case scala.util.control.NonFatal(_) => None })
              .map { img =>
                var (sr, sg, sb, sl) = (0L, 0L, 0L, 0L)
                var p = 0
                while (p < img.rgb.length) {
                  val rr = img.rgb(p) & 0xFF
                  val gg = img.rgb(p + 1) & 0xFF
                  val bb = img.rgb(p + 2) & 0xFF
                  sr += rr; sg += gg; sb += bb
                  sl += (77 * rr + 150 * gg + 29 * bb) >> 8
                  p += 3
                }
                PixelSums(r.media_id, r.source, info.format,
                  (img.rgb.length / 3).toLong, sr, sg, sb, sl)
              }
          }
        }
      }
    }
  }

  /** m05: per-(source, container) pixel-statistic profile over every
    * REAL image decode path — png (inflate+unfilter), bmp (bottom-up
    * BGR), and, unlike m04, JPEG: the synthetic baseline JPEGs are
    * block-constant at Q=1, so the block DCT is DC-only and decode
    * reconstructs each block's Y/Cb/Cr exactly — the only residual
    * decoder math is the deterministic double-precision color convert,
    * which the Python oracle mirrors operation-for-operation
    * (including Java's floor(x+0.5) rounding). A divergence anywhere
    * in any of the three decoders fails the hash. */
  def pixelStatSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val images = syntheticMedia(spark, sfDir)
      .filter(col("kind") === "image")
      .repartition(8, col("media_id"))
    pixelSums(images).toDF()
      .groupBy(col("source"), col("format"))
      .agg(
        count(lit(1)).as("n_images"),
        sum(col("n_pixels")).as("n_pixels"),
        sum(col("sum_r")).as("sum_r"),
        sum(col("sum_g")).as("sum_g"),
        sum(col("sum_b")).as("sum_b"),
        sum(col("sum_luma")).as("sum_luma"))
      .orderBy("source", "format")
  }

  /** Per-video frame-sample descriptors: the frame-sampling stage of
    * a video training pipeline. Timing comes from the REAL parsed
    * container (mvhd duration), and each sample reads the ACTUAL
    * mdat byte at the sampled offset — only the codec decode of that
    * frame stays stubbed (no video codec in a pure-JVM engine). Evenly
    * spaced integer sampling: frame i of n → ts = i·dur/n,
    * offset = i·mdatLen/n. */
  final case class FrameSample(
      media_id: Long, source: String, frame_idx: Long,
      ts_ms: Long, byte_off: Long, sample_byte: Long)

  def frameSamples(records: Dataset[MediaRecord], nFrames: Int = 8): Dataset[FrameSample] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { r =>
          MediaCodec.sniffMp4(r.content).toSeq.flatMap { info =>
            MediaCodec.mdatRange(r.content).toSeq.flatMap { case (off, len) =>
              if (len <= 0) Seq.empty
              else (0 until nFrames).map { i =>
                val ts = i.toLong * info.durationMs / nFrames
                val bo = i.toLong * len / nFrames
                FrameSample(r.media_id, r.source, i.toLong, ts, bo,
                  (r.content(off + bo.toInt) & 0xFF).toLong)
              }
            }
          }
        }
      }
    }
  }

  /** MJPEG corpus for the frame-PIXEL path (m07): every video-subset
    * doc becomes an MJPEG-in-MP4 — N complete baseline JPEG samples
    * located by real stsd/stts/stsz/stco tables
    * ([[MediaCodec.buildMjpegMp4]]). Frame colors are block-constant
    * keyed by (doc_id, frame_idx, bx, by), so decode is exact (DC-only
    * blocks) and a Python oracle can reconstruct every pixel. */
  def syntheticMjpegVideos(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"))
      .as[(Long, String)]
      .filter(_._1 % 3 == 2)
      .map { case (id, src) =>
        val (w, h) = (16 + (id % 16).toInt, 16 + (id % 8).toInt)
        val nFrames = 3 + (id % 4).toInt
        val frames = (0 until nFrames).map { fi =>
          MediaCodec.buildJpeg(w, h, (bx, by) => (
            ((id * 7 + fi * 19 + bx * 31 + by * 17) % 256).toInt,
            ((id * 3 + fi * 23 + bx * 13 + by * 7) % 256).toInt,
            ((id * 11 + fi * 29 + bx * 5 + by * 29) % 256).toInt))
        }
        MediaRecord(id, "video",
          MediaCodec.buildMjpegMp4(w, h, 100 + (id % 10).toInt * 20, frames), src)
      }
  }

  /** Per-frame REAL pixel statistics: demux via the sample tables,
    * decode each sample with the baseline JPEG decoder — the video
    * path loses its last stub for MJPEG content. Integer sums,
    * order-independent.
    *
    * Video codec boundary (DECIDED, round 9): intra-frame content —
    * MJPEG samples located by real stsd/stts/stsz/stco tables —
    * decodes to pixels in pure JVM here; inter-frame codecs (H.264/
    * H.265/VP9/AV1) are PERMANENTLY out of scope for this library,
    * including keyframe-only I-frame decode. Rationale: even a
    * single H.264 I-frame needs CABAC/CAVLC entropy decode, intra
    * prediction across 9+ modes and the deblocking filter to be
    * bit-correct — thousands of lines of codec, none of it Spark —
    * while the Spark-side contract this module exists to prove
    * (binary column → demux → per-sample batch decode → typed
    * feature rows, partition-parallel over media ids) is identical
    * for every codec. A production deployment plugs a JNI/ffmpeg
    * decoder into the same [[FramePixels]] shape; rows from
    * non-MJPEG samples surface honestly as `pixels_real = false`
    * (container metadata still real), never as fabricated pixels. */
  final case class FramePixels(
      media_id: Long, source: String, frame_idx: Long, ts_ms: Long,
      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long, sum_luma: Long,
      pixels_real: Boolean)

  def framePixels(records: Dataset[MediaRecord]): Dataset[FramePixels] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { r =>
          MediaCodec.mjpegSamples(r.content).toSeq.flatMap { samples =>
            samples.zipWithIndex.map { case (s, fi) =>
              val frameBytes = java.util.Arrays.copyOfRange(
                r.content, s.offset, s.offset + s.size)
              (try MediaCodec.decodeJpegPixels(frameBytes)
               catch { case scala.util.control.NonFatal(_) => None }) match {
                case Some(img) =>
                  var (sr, sg, sb, sl) = (0L, 0L, 0L, 0L)
                  var i = 0
                  while (i < img.rgb.length) {
                    val (rr, gg, bb) =
                      (img.rgb(i) & 0xFF, img.rgb(i + 1) & 0xFF, img.rgb(i + 2) & 0xFF)
                    sr += rr; sg += gg; sb += bb
                    sl += (77 * rr + 150 * gg + 29 * bb) >> 8
                    i += 3
                  }
                  FramePixels(r.media_id, r.source, fi.toLong, s.tsMs,
                    img.width.toLong * img.height, sr, sg, sb, sl, pixels_real = true)
                case None =>
                  FramePixels(r.media_id, r.source, fi.toLong, s.tsMs,
                    0L, 0L, 0L, 0L, 0L, pixels_real = false)
              }
            }
          }
        }
      }
    }
  }

  /** m07: per-(source, frame index) REAL-pixel profile over the MJPEG
    * corpus — n_real counts frames whose pixels decoded (all of them,
    * which the oracle checks by recomputing the sums). */
  def framePixelSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val videos = syntheticMjpegVideos(spark, sfDir)
      .repartition(8, col("media_id"))
    framePixels(videos).toDF()
      .groupBy(col("source"), col("frame_idx"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(when(col("pixels_real"), 1L).otherwise(0L)).as("n_real"),
        sum(col("ts_ms")).as("sum_ts_ms"),
        sum(col("n_pixels")).as("n_pixels"),
        sum(col("sum_r")).as("sum_r"),
        sum(col("sum_g")).as("sum_g"),
        sum(col("sum_b")).as("sum_b"),
        sum(col("sum_luma")).as("sum_luma"))
      .orderBy("source", "frame_idx")
  }

  /** m06: per-(source, frame index) sampling profile — exercised
    * across the container boundary (real mvhd duration, real mdat
    * bytes); the oracle recomputes both from the deterministic
    * construction formulas. */
  def frameSampleSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val videos = syntheticMedia(spark, sfDir)
      .filter(col("kind") === "video")
      .repartition(8, col("media_id"))
    frameSamples(videos).toDF()
      .groupBy(col("source"), col("frame_idx"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(col("ts_ms")).as("sum_ts_ms"),
        sum(col("sample_byte")).as("sum_byte"))
      .orderBy("source", "frame_idx")
  }

  /** Per-(modality, container) feature aggregate (rows-only query) —
    * pixel statistics are REAL for the png/bmp rows (pixels_real). */
  /** m01: per-(kind, format) pipeline summary over the full
    * decode surface. Every aggregate is integer-exact and
    * order-independent so the Python oracle (scripts/py_oracles.py
    * m01_media_features) can recompute it by reconstructing every
    * container BYTE-FOR-BYTE from the deterministic builders (stored-
    * block PNG zlib, hand-rolled JPEG entropy streams, fixed BMP/WAV/
    * MP4 layouts) and mirroring the sniff → decode → feature path:
    * sniff rates, byte totals, header dims/durations, bin-0 byte
    * counts of the 16-bin histogram, and FNV-style content-hash
    * distincts (pixel statistics are m05's oracle surface).
    * `bin0 = round(hist[0]·n_bytes)` recovers the pre-normalization
    * integer count exactly (error < 0.5 ulp-scaled). */
  def featureSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val feats = extractFeatures(
      syntheticMedia(spark, sfDir).repartition(8, col("kind")))
    feats.toDF()
      .groupBy(col("kind"), col("format"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(when(col("format") =!= "unknown", 1L).otherwise(0L)).as("n_sniffed"),
        sum(when(col("pixels_real"), 1L).otherwise(0L)).as("n_pixels_real"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(col("width").cast("long")).as("sum_width"),
        sum(col("height").cast("long")).as("sum_height"),
        sum(col("duration_ms").cast("long")).as("sum_duration_ms"),
        sum(round(expr("byte_histogram[0]") * col("n_bytes")).cast("long"))
          .as("bin0_bytes"),
        countDistinct(col("content_hash")).as("n_distinct"))
      .orderBy("kind", "format")
  }
}
