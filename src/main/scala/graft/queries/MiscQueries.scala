package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-cutting entries: multimodal feature extraction and the
  * Grafana-macro SQL path (raw dashboard SQL → translate → spark.sql).
  */
object MiscQueries extends QueryModule {
  import Q._

  // m01: multimodal binary-column pipeline summary, ORACLE-CHECKED
  // ACROSS THE FULL CONTAINER SURFACE — the Python oracle
  // (scripts/py_oracles.py m01_media_features) reconstructs every
  // synthetic container byte-for-byte (stored-block PNG zlib,
  // hand-rolled baseline+progressive JPEG entropy streams, GIF
  // uncompressed-LZW body, fixed BMP/WAV/MP4 layouts) and mirrors sniff → decode → aggregate:
  // sniff/pixel counts, byte totals, header dims/durations, bin-0
  // histogram byte counts, content-hash distincts.
  private def m01(s: SparkSession, d: String): DataFrame =
    graft.multimodal.Multimodal.featureSummary(s, d)

  // m03: audio feature extraction ORACLE-CHECKED ACROSS THE BINARY
  // AND CODEC BOUNDARY — the engine builds real 8-bit PCM WAVs from
  // the documents table, decodes the samples back out of the RIFF
  // container (MediaCodec.decodeWavSamples), computes integer-exact
  // signal features (peak / Σ|s| / Σs² / zero crossings) and
  // aggregates per source; the oracle (scripts/py_oracles.py)
  // re-parses the same containers with Python's independent stdlib
  // `wave` decoder and recomputes every value. A divergence anywhere
  // in build→parse→decode→feature→aggregate fails the hash.
  private def m03(s: SparkSession, d: String): DataFrame =
    graft.multimodal.Multimodal.audioSummary(s, d)

  // m04: image perceptual-hash profile ORACLE-CHECKED ACROSS THE
  // PIXEL-DECODE BOUNDARY — the engine decodes real PNG (inflate +
  // unfilter) and BMP (bottom-up BGR) containers, resizes to 32×32
  // luma (integer area-average) and hashes with the sequency-WHT
  // pHash; the oracle reconstructs the expected PIXELS from the
  // deterministic construction rule and recomputes resize+hash in
  // pure Python — any decoder or image-op divergence fails the hash.
  private def m04(s: SparkSession, d: String): DataFrame =
    graft.multimodal.Multimodal.imagePhashSummary(s, d)

  // m02: media metadata ORACLE-CHECKED ACROSS THE BINARY BOUNDARY —
  // the engine builds real BMP/WAV containers from the documents
  // table, parses dimensions/durations back out of the binary headers
  // (MediaCodec), and aggregates; the oracle recomputes the same
  // values from the deterministic construction formulas in pure SQL.
  // A mismatch anywhere in build→parse→aggregate fails the hash.
  private def m02(s: SparkSession, d: String): DataFrame = {
    val feats = graft.multimodal.Multimodal.extractFeatures(
      graft.multimodal.Multimodal.syntheticMedia(s, d)
        .repartition(8, org.apache.spark.sql.functions.col("kind"))).toDF()
    // the SNIFFED container gates the subset: only bmp/wav/mp4 sizes
    // have closed-form construction formulas the oracle can restate
    // (png payloads deflate — no closed form); selecting on the
    // parsed format (not the id rule) means a sniffing regression
    // breaks the row set, not just the aggregates
    feats.filter(col("format").isin("bmp", "wav", "mp4"))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        fixedDec(rhu(sum(col("width")), count(lit(1)), 1000000L), 6).as("avg_width"),
        fixedDec(rhu(sum(col("duration_ms")), count(lit(1)), 1000000L), 6)
          .as("avg_duration_ms"))
      .orderBy("kind")
  }

  // Construction formulas (Multimodal.syntheticMedia + MediaCodec
  // builders): image = BMP(16+id%32, 12+id%24) for (id/3)%4 = 1 (PNG
  // deflates, JPEG entropy-codes, GIF LZW-packs — no closed-form size,
  // excluded),
  // 54-byte header + 4-byte-aligned 24-bpp rows; audio = WAV(8 kHz,
  // 2000+(id%6000)*8 samples; 8-bit for (id/3) even, 16-bit LE for odd
  // — 1 or 2 bytes/sample), 44-byte header, duration = samples/8 ms
  // exactly either way (byte rate scales with sample width); video = MP4(dur 3000+id%9000 ms, w 160+(id%8)*16,
  // h 96+(id%6)*16, mdat data 500+id%1500) for (id/3) even — fixed
  // 244-byte box overhead (ftyp 20 + moov 216 + mdat header 8).
  private val m02Sql =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
       |         WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       |    CASE WHEN doc_id % 3 = 0 THEN 16 + CAST(doc_id % 32 AS BIGINT)
       |         WHEN doc_id % 3 = 2 THEN 160 + CAST(doc_id % 8 AS BIGINT) * 16
       |         ELSE 0 END AS width,
       |    CASE WHEN doc_id % 3 = 0 THEN 0
       |         WHEN doc_id % 3 = 2 THEN 3000 + CAST(doc_id % 9000 AS BIGINT)
       |         ELSE 250 + CAST(doc_id % 6000 AS BIGINT) END AS duration_ms,
       |    CASE WHEN doc_id % 3 = 0
       |         THEN 54 + (((16 + doc_id % 32) * 3 + 3) // 4) * 4 * (12 + doc_id % 24)
       |         WHEN doc_id % 3 = 2 THEN 244 + 500 + (doc_id % 1500)
       |         ELSE 44 + (2000 + (doc_id % 6000) * 8) * (1 + (doc_id // 3) % 2) END AS n_bytes
       |  FROM documents
       |  WHERE doc_id % 3 = 1 OR (doc_id % 3 = 0 AND (doc_id // 3) % 4 = 1)
       |     OR (doc_id % 3 = 2 AND (doc_id // 3) % 2 = 0))
       |SELECT kind, COUNT(*) AS n_media,
       |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       |  ${fixedDecSql(rhuSql("CAST(SUM(width) AS BIGINT)", "COUNT(*)", 1000000L), 6)} AS avg_width,
       |  ${fixedDecSql(rhuSql("CAST(SUM(duration_ms) AS BIGINT)", "COUNT(*)", 1000000L), 6)} AS avg_duration_ms
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  // g01: a dashboard query in Grafana macro form, translated and run
  // through spark.sql over registered views — the reference's query
  // transport (SURVEY.md §3.2 entry point B).
  private val g01Raw =
    """SELECT $__timeGroupAlias(ts, '10m'), user_id,
      |  CAST(SUM(CAST(get_json_object(props, '$.k') AS BIGINT)) AS BIGINT) AS bytes
      |FROM events
      |WHERE $__timeFilter(ts) AND event_type IN ($event_types)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def g01(s: SparkSession, d: String): DataFrame = {
    Tables.registerAll(s, d)
    val sql = GrafanaMacros.translate(g01Raw,
      GrafanaMacros.TimeRange("2024-01-05 00:00:00", "2024-01-20 00:00:00"),
      templateVars = Map("event_types" -> "'click','purchase'"))
    s.sql(sql)
  }

  private val g01Sql =
    """SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS time, user_id,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS bytes
      |FROM events
      |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
      |  AND event_type IN ('click','purchase')
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // m05: pixel statistics ORACLE-CHECKED ACROSS ALL FOUR IMAGE
  // DECODERS — integer R/G/B/luma sums over real PNG, BMP, GIF and
  // JPEG (baseline + progressive) pixel decodes (the JPEG fixtures
  // are exact through DC-only DCT at Q=1; the oracle mirrors the
  // deterministic color-convert doubles).
  private def m05(s: SparkSession, d: String): DataFrame =
    graft.multimodal.Multimodal.pixelStatSummary(s, d)

  // m06: video frame sampling ORACLE-CHECKED ACROSS THE CONTAINER
  // BOUNDARY — timing from the parsed mvhd duration, sample bytes
  // read from the actual mdat payload at evenly spaced offsets; the
  // oracle recomputes both from the construction formulas (the mdat
  // body is the UTF-8 text cycled, and the corpus is all-ASCII so
  // substr/ord equals byte access).
  private def m06(s: SparkSession, d: String): DataFrame =
    graft.multimodal.Multimodal.frameSampleSummary(s, d)

  // m07: video frame PIXELS — MJPEG-in-MP4 demuxed via the real
  // stsd/stts/stsz/stco sample tables, each sample decoded by the
  // baseline JPEG decoder; integer pixel sums per (source, frame_idx).
  // Python oracle (py_oracles.m07) reconstructs every frame's pixels
  // from the block-constant construction through the same
  // encoder/decoder color-convert doubles as m05, PLUS the sample
  // timing from the stts formula — pixels_real=true end to end.
  private def m07(s: SparkSession, d: String): DataFrame =
    graft.multimodal.Multimodal.framePixelSummary(s, d)

  private val m06Sql =
    """WITH v AS (
      |  SELECT doc_id, source, text,
      |    3000 + CAST(doc_id % 9000 AS BIGINT) AS dur,
      |    500 + CAST(doc_id % 1500 AS BIGINT) AS dlen
      |  FROM documents
      |  WHERE doc_id % 3 = 2 AND (doc_id // 3) % 2 = 0),
      |f AS (
      |  SELECT source, i AS frame_idx,
      |    (i * dur) // 8 AS ts_ms,
      |    ord(substr(text, CAST(((i * dlen) // 8) % length(text) AS INT) + 1, 1)) AS sample_byte
      |  FROM v, UNNEST(range(0, 8)) AS t(i))
      |SELECT source, CAST(frame_idx AS BIGINT) AS frame_idx,
      |  COUNT(*) AS n_frames,
      |  CAST(SUM(ts_ms) AS BIGINT) AS sum_ts_ms,
      |  CAST(SUM(sample_byte) AS BIGINT) AS sum_byte
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_media_features" -> m01,
    "m02_media_meta" -> m02,
    "m03_audio_features" -> m03,
    "m04_image_phash" -> m04,
    "m05_pixel_stats" -> m05,
    "m06_frame_sample" -> m06,
    "m07_frame_pixels" -> m07,
    "m08_audio_decimate" -> ((s, d) =>
      graft.multimodal.Multimodal.decimationSummary(s, d)),
    // m09: near-dup detection over decoded-pixel perceptual hashes —
    // d03's banding on m04's pHash; Python-oracle (py_oracles.py
    // recomputes decode→resize→hash→bands→hamming independently)
    "m09_image_neardup" -> ((s, d) =>
      graft.multimodal.Multimodal.imageNearDups(s, d)),
    "g01_grafana_macro_sql" -> g01)

  override def oracle: Map[String, String] = Map(
    "m02_media_meta" -> m02Sql,
    "m06_frame_sample" -> m06Sql,
    "g01_grafana_macro_sql" -> g01Sql)
}
