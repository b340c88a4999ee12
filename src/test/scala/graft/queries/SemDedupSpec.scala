package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** d11 SemDeDup (embedding-cluster semantic dedup): a fully
  * independent driver-side recompute of the WHOLE contract — planted
  * corpus, fixed-point k-means training, cluster assignment, and the
  * id-ordered removal rule — compared row-exactly against the engine.
  * (The DuckDB oracle is the cross-engine check; this spec is the
  * cross-IMPLEMENTATION check: plain Scala loops vs the distributed
  * plan.)
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private val Off = 1L << 40
  private val Tau = 0.8

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Driver recompute: (vec_id -> (cid, keeperId, cosToKeeper)). */
  private def expected(): (Map[Long, (Long, Long, Double)], Int) = {
    val base = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("cast(vec_id as long) as vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val corpus: Array[(Long, Array[Double])] =
      base ++ base.map { case (id, v) =>
        val p = v.clone(); p(0) += 0.02; (id + Off, p)
      }
    val sorted = corpus.sortBy(_._1)
    val k = math.ceil(math.sqrt(sorted.length.toDouble)).toInt
    var cents: Array[Array[Double]] = sorted.take(k).map(_._2)
    for (_ <- 1 to 3) {
      // assign: argmax cosine, ties to the smallest cid
      val sums = scala.collection.mutable.SortedMap.empty[Int, (Array[Long], Long)]
      sorted.foreach { case (_, v) =>
        var bi = 0; var bs = Double.NegativeInfinity
        cents.zipWithIndex.foreach { case (c, i) =>
          val s = cos(v, c); if (s > bs) { bs = s; bi = i }
        }
        val (buf, n) = sums.getOrElse(bi, (new Array[Long](64), 0L))
        var i = 0
        while (i < 64) { buf(i) += graft.functions.ScaledLong.round(v(i) * 1e9); i += 1 }
        sums(bi) = (buf, n + 1)
      }
      // update: scaled-long integer mean; empty clusters drop and
      // survivors renumber in old-cid order (SortedMap iteration)
      cents = sums.values.map { case (buf, n) =>
        buf.map(sl => (sl.toDouble / 1e9) / n)
      }.toArray
    }
    val cid: Map[Long, Long] = sorted.map { case (id, v) =>
      var bi = 0; var bs = Double.NegativeInfinity
      cents.zipWithIndex.foreach { case (c, i) =>
        val s = cos(v, c); if (s > bs) { bs = s; bi = i }
      }
      id -> bi.toLong
    }.toMap
    val byCid = sorted.groupBy { case (id, _) => cid(id) }
    val removed = for {
      (c, members) <- byCid.toSeq
      sortedM = members.sortBy(_._1)
      (i, vi) <- sortedM
      mates = sortedM.filter { case (j, vj) => j < i && cos(vi, vj) >= Tau }
      if mates.nonEmpty
    } yield {
      val (kj, kv) = mates.minBy(_._1)
      i -> (c, kj, BigDecimal(cos(vi, kv)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    (removed.toMap, base.length)
  }

  test("engine d11 equals the independent driver recompute, row-exactly") {
    val (want, nBase) = expected()
    val got = graft.SparkEntry.queries("d11_semantic_dedup")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got.keySet == want.keySet,
      s"removed-set mismatch: extra=${(got.keySet -- want.keySet).take(5)} " +
        s"missing=${(want.keySet -- got.keySet).take(5)}")
    got.foreach { case (id, (c, kj, cs)) =>
      val (wc, wkj, wcs) = want(id)
      assert(c == wc && kj == wkj, s"vec $id: got cid=$c keeper=$kj want cid=$wc keeper=$wkj")
      assert(math.abs(cs - wcs) <= 1e-6, s"vec $id: cos $cs vs $wcs")
    }
    // semantic teeth: the planted duplicates are actually caught —
    // (near-)every perturbed copy is removed with its source (or an
    // even closer earlier mate) as keeper. Allow a tiny slack for
    // cluster-boundary splits, the paper's documented recall trade.
    val pertRemoved = got.keySet.count(_ >= Off)
    assert(pertRemoved >= (nBase * 99) / 100,
      s"only $pertRemoved/$nBase planted duplicates removed")
  }
}
