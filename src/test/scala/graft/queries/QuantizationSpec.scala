package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** int8 embedding quantization (s04): the approximation contract vs
  * the full-precision baseline (s01) — symmetric per-vector int8
  * keeps top-k recall near-perfect on unit-norm embeddings
  * (quantization error ~0.4% of the value range). */
class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("int8-quantized top-10 recalls >= 9 of the exact top-10") {
    val exact = graft.SparkEntry.queries("s01_knn_brute_cosine")(spark, sf)
      .collect().take(10).map(_.getLong(0)).toSet
    val quant = graft.SparkEntry.queries("s04_int8_quant_topk")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(quant.size == 10)
    assert((exact & quant).size >= 9, s"exact=$exact quant=$quant")
  }

  test("quantized cosines stay within the int8 error envelope of exact") {
    val exact = graft.SparkEntry.queries("s01_knn_brute_cosine")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val quant = graft.SparkEntry.queries("s04_int8_quant_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val errs = quant.collect { case (id, cq) if exact.contains(id) =>
      math.abs(cq - exact(id))
    }
    assert(errs.nonEmpty)
    // per-element error ≤ amax/254; accumulated over a 64-dim dot of
    // unit vectors this stays well under 0.02 cosine
    assert(errs.max < 0.02, s"max err ${errs.max}")
  }
}
