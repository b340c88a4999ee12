package graft.multimodal

import graft.etl.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("binary media pipeline: schema, batching, deterministic features") {
    val media = Multimodal.syntheticMedia(spark, sf)
    val feats = Multimodal.extractFeatures(media)
    val df = feats.toDF()
    assert(df.schema("byte_histogram").dataType.typeName == "array")
    assert(df.schema("content_hash").dataType.typeName == "long")

    val n = media.count()
    assert(feats.count() == n) // one feature row per media record

    // histogram is a distribution (sums to ~1) for every record
    val badHist = df.filter(
      abs(expr("aggregate(byte_histogram, 0D, (a, x) -> a + x)") - 1.0) > 1e-9).count()
    assert(badHist == 0)

    // deterministic across runs
    val h1 = feats.select("media_id", "content_hash").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val h2 = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, sf))
      .select("media_id", "content_hash").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(h1.toSeq == h2.toSeq)

    // modality semantics of the stub decode
    val img = df.filter(col("kind") === "image")
    assert(img.filter(col("duration_ms") =!= 0).count() == 0)
    assert(img.filter(col("width") === 0).count() == 0)
    val audio = df.filter(col("kind") === "audio")
    assert(audio.filter(col("width") =!= 0).count() == 0)
  }

  test("feature summary groups per modality") {
    val s = Multimodal.featureSummary(spark, sf)
    val kinds = s.collect().map(_.getString(0)).toSeq
    assert(kinds == Seq("audio", "image", "video"))
  }

  test("MediaCodec parses real container headers (PNG/JPEG/GIF/BMP/WAV)") {
    import MediaCodec._
    // PNG: signature + IHDR 640×480
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 2, 0x80, 0, 0, 1, 0xE0, 8, 6, 0, 0, 0).map(_.toByte)
    assert(sniffImage(png).contains(ImageInfo("png", 640, 480)))
    // JPEG: SOI, APP0 (16 bytes), SOF0 with height 333 width 444
    val jpg = (Array[Int](0xFF, 0xD8,
      0xFF, 0xE0, 0x00, 0x10) ++ Array.fill(14)(0) ++
      Array[Int](0xFF, 0xC0, 0x00, 0x11, 8, 0x01, 0x4D, 0x01, 0xBC, 3) ++
      Array.fill(10)(0)).map(_.toByte)
    assert(sniffImage(jpg).contains(ImageInfo("jpeg", 444, 333)))
    // GIF 89a 320×200
    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array[Int](0x40, 0x01, 0xC8, 0x00, 0, 0, 0, 0).map(_.toByte))
    assert(sniffImage(gif).contains(ImageInfo("gif", 320, 200)))
    // builders round-trip through the sniffers
    val bmp = buildBmp(31, 17, "payload".getBytes)
    assert(sniffImage(bmp).contains(ImageInfo("bmp", 31, 17)))
    val wav = buildWav(8000, 4000, "audio".getBytes)
    assert(sniffWav(wav).contains(AudioInfo("wav", 500, 8000, 1))) // 4000/8000 s
    // non-media bytes sniff as nothing
    assert(sniffImage("just text".getBytes).isEmpty)
    assert(sniffWav("just text".getBytes).isEmpty)
  }

  test("extracted features carry REAL header dimensions and durations") {
    import spark.implicits._
    val df = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, sf)).toDF()
    // every image record: dims match the deterministic construction
    val imgs = df.filter(col("kind") === "image")
      .select("media_id", "format", "width", "height").collect()
    assert(imgs.nonEmpty)
    imgs.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "bmp")
      assert(r.getInt(2) == 16 + (id % 32).toInt, s"id $id width")
      assert(r.getInt(3) == 12 + (id % 24).toInt, s"id $id height")
    }
    // every audio record: duration = nSamples / 8000 Hz
    val auds = df.filter(col("kind") === "audio")
      .select("media_id", "format", "duration_ms").collect()
    assert(auds.nonEmpty)
    auds.foreach { r =>
      val id = r.getLong(0)
      val nSamples = 2000 + (id % 6000).toInt * 8
      assert(r.getString(1) == "wav")
      assert(r.getInt(2) == (nSamples.toLong * 1000 / 8000).toInt, s"id $id duration")
    }
    // video stays on the declared pseudo path
    assert(df.filter(col("kind") === "video" && col("format") =!= "unknown").count() == 0)
  }
}
