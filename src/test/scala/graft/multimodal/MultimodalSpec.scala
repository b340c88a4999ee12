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
}
