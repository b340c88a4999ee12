package graft.multimodal

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** m09 banding fixture: the gate SF has no actual near-dups (all 84
  * hashes distinct), so this spec fabricates a corpus where two PNGs
  * are pixel-identical (same text, doc ids 0 and 96 — same format
  * branch, same 16×12 dims under the syntheticMedia rule) and one is
  * unrelated, and asserts the banded pipeline finds exactly that
  * pair: identical hashes collide in all 4 bands (one candidate),
  * hamming 0 ≤ 10 verifies, both ids counted as dup images. */
class ImageNearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("banded phash near-dup finds the identical-image pair") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_m09_fix").toString
    try {
      val same = "the quick brown fox jumps over the lazy dog"
      Seq(
        (0L, same, "en", "srcA", same.length.toLong),
        (96L, same, "en", "srcB", same.length.toLong),
        (12L, "completely different text with other bytes entirely", "en",
          "srcC", 52L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val r = Multimodal.imageNearDups(spark, dir).collect()
        .map(x => x.getAs[String]("metric") -> x.getAs[Long]("v")).toMap
      assert(r("n_images") == 3L)
      assert(r("n_neardup_pairs") == 1L)
      assert(r("n_dup_images") == 2L)
      assert(r("n_candidate_pairs") >= 1L)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
