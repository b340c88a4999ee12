package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** s07 MMR re-rank: the diversity trade must actually reorder — a
  * near-duplicate of the top hit is demoted below a less-relevant but
  * diverse candidate — and the selection must be deterministic.
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixture(vecs: (Long, Array[Float])*): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_mmr").toString
    vecs.toSeq.map { case (id, v) => (id, v.toSeq, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  private def pad(xs: Double*): Array[Float] =
    (xs.map(_.toFloat) ++ Seq.fill(64 - xs.length)(0.0f)).toArray

  test("near-duplicate of the top hit is demoted below a diverse candidate") {
    // q = e1. v1/v2: both ≈0.9 relevant and ≈1.0 mutually similar
    // (redundant pair); v3: 0.85 relevant but on the other side of q
    // (sim(v1,v3) ≈ 0.53). Greedy: v1 first; then v2 scores
    // 0.7·0.90 − 0.3·1.00 ≈ 0.33 < v3's 0.7·0.85 − 0.3·0.53 ≈ 0.43,
    // so MMR returns (v1, v3, v2) where plain top-k returns (v1, v2, v3).
    val d = fixture(
      0L -> pad(1.0, 0.0),
      1L -> pad(0.9, 0.436),
      2L -> pad(0.9, 0.437),
      3L -> pad(0.85, -0.527))
    val rows = graft.SparkEntry.queries("s07_mmr_rerank")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("rank 1 is the plain cosine top-1; ranks distinct; k=8 at sf0.001") {
    val d = "/root/testdata/sf0.001"
    val mmr = graft.SparkEntry.queries("s07_mmr_rerank")(spark, d).collect()
    assert(mmr.length == 8)
    assert(mmr.map(_.getLong(0)).toSeq == (1L to 8L))
    assert(mmr.map(_.getLong(1)).distinct.length == 8)
    val top1 = graft.SparkEntry.queries("s01_knn_brute_cosine")(spark, d)
      .collect().head.getLong(0)
    assert(mmr.head.getLong(1) == top1)
    // determinism: a second construction returns the identical ranking
    val again = graft.SparkEntry.queries("s07_mmr_rerank")(spark, d).collect()
    assert(mmr.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
