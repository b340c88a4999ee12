package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** c13 (cluster-balanced temperature mixture): driver recompute of
  * the mixture layer — cluster assignment under the SAME trained
  * codebook (trainCodebook's cross-implementation parity is already
  * pinned by SemDedupSpec/IvfSpec), then sqrt-temperature quotas and
  * the Knuth-hash rank selection in plain Scala — compared row-exactly
  * against the engine, plus the τ-mixture invariants.
  */
class ClusterMixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def knuth32(c: Long): Long = {
    val d = java.lang.Math.floorMod(c, 4294967296L)
    java.lang.Math.floorMod(
      java.lang.Math.floorMod(d * 40503L, 65536L) * 65536L + d * 31153L,
      4294967296L)
  }

  test("c13 engine matches a driver recompute of the mixture layer") {
    val e = Similarity.corpus(spark, sf)
    val cents = Similarity.trainCodebook(e)
    val vecs = e.select("vec_id", "v").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).sortBy(_._1)
    val cid: Map[Long, Long] = vecs.map { case (id, v) =>
      var bi = 0; var bs = Double.NegativeInfinity
      cents.zipWithIndex.foreach { case (c, i) =>
        val s = cos(v, c); if (s > bs) { bs = s; bi = i }
      }
      id -> bi.toLong
    }.toMap
    val byCid = cid.groupBy(_._2).view.mapValues(_.keys.toSeq.sorted).toMap
    val w: Map[Long, Long] = byCid.view.mapValues(ids =>
      math.round(math.sqrt(ids.size.toDouble) * 1e9)).toMap
    val stot = w.values.sum
    val quota: Map[Long, Long] = w.view.mapValues(wv => (200L * wv) / stot).toMap
    val expected = byCid.toSeq.sortBy(_._1).flatMap { case (c, ids) =>
      ids.sortBy(id => (knuth32(id), id)).zipWithIndex
        .filter { case (_, i) => i + 1 <= quota(c) }
        .map { case (id, i) =>
          (c, ids.size.toLong, quota(c), (i + 1).toLong, id)
        }
    }
    val got = graft.SparkEntry.queries("c13_cluster_mixture")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    // τ-mixture invariants: total within budget; every represented
    // cluster contributes min(quota, size) members
    assert(got.size <= 200)
    val perCluster = got.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    perCluster.foreach { case (c, n) =>
      assert(n == math.min(quota(c), byCid(c).size.toLong))
    }
  }
}
