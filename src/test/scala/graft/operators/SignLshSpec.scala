package graft.operators

import graft.etl.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SignLshSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // 32 dims keeps the isotropic background's |cos| below ~0.5, so the
  // 16-bit bands separate planted near-dups (cos ≈ 0.9998) cleanly
  private val Dims = 32

  /** n deterministic unit-ish vectors + a near-dup (tiny perturbation)
    * for each of the first nDup. */
  private def corpus(n: Int, nDup: Int): Seq[(Long, Seq[Double])] = {
    val rnd = new java.util.Random(7L)
    val base = (0 until n).map { i =>
      val v = Seq.fill(Dims)(rnd.nextGaussian())
      val norm = math.sqrt(v.map(x => x * x).sum)
      (i.toLong, v.map(_ / norm))
    }
    val dups = base.take(nDup).map { case (id, v) =>
      (id + 1000000L, v.updated(0, v.head + 0.02))
    }
    base ++ dups
  }

  test("band values are deterministic and band-major stable") {
    import spark.implicits._
    val planes = SignLsh.hyperplanes(Dims, nBands = 4, bitsPerBand = 8, seed = 99L)
    assert(planes == SignLsh.hyperplanes(Dims, 4, 8, 99L))
    val df = corpus(20, 0).toDF("vec_id", "v")
      .withColumn("bands", SignLsh.bandValues(col("v"), planes, 4, 8))
    val a = df.select("bands").collect().map(_.getSeq[Long](0).toList).toList
    val b = df.select("bands").collect().map(_.getSeq[Long](0).toList).toList
    assert(a == b)
    assert(a.forall(bs => bs.length == 4 && bs.forall(x => x >= 0 && x < 256)))
  }

  test("high-threshold near-dups all collide; candidate set is sub-quadratic") {
    import spark.implicits._
    val n = 400
    val nDup = 50
    val planes = SignLsh.hyperplanes(Dims, nBands = 16, bitsPerBand = 16, seed = 0x5eed5L)
    val df = corpus(n, nDup).toDF("vec_id", "v")
      .withColumn("bands", SignLsh.bandValues(col("v"), planes, 16, 16))
    val ex = df.select(col("vec_id"), posexplode(col("bands")).as(Seq("band", "bh")))
    val cand = ex.as("x").join(ex.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("y.vec_id").as("b")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted near-dup pair surfaces (cos ≈ 0.9998 → p_bit ≈
    // 0.994 → P[miss | 16 bands × 16 bits] ≈ 6e-17)
    (0 until nDup).foreach { i =>
      assert(cand.contains((i.toLong, i + 1000000L)), s"missed planted pair $i")
    }
    // and the banding is selective: far fewer candidates than all pairs
    val total = (n + nDup).toLong
    val allPairs = total * (total - 1) / 2
    assert(cand.size < allPairs / 10, s"${cand.size} candidates of $allPairs pairs")
  }
}
