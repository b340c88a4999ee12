package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sign-random-projection band values for one vector: for each of
  * `nBands` bands, `bitsPerBand` sign bits of plane dot products
  * packed into a long (plane layout band-major, matching
  * operators.SignLsh.hyperplanes). Returns array<long>[nBands].
  *
  * A dedicated expression because the same computation as nested
  * higher-order-function lambdas (transform/aggregate/zip_with) runs
  * interpreted with per-element boxing — ~256×64 boxed ops per row
  * made the LSH signature the bottleneck of the whole near-dup query
  * at sf1. Here it is one tight primitive-double loop per row
  * (CodegenFallback: codegen would only remove a virtual call). */
case class SignLshBands(child: Expression, planes: Array[Array[Double]],
                        nBands: Int, bitsPerBand: Int)
    extends UnaryExpression with CodegenFallback {
  require(planes.length == nBands * bitsPerBand,
    s"${planes.length} planes for $nBands bands × $bitsPerBand bits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"sign_lsh_bands needs array<double|float>, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](nBands)
    var b = 0
    var p = 0
    while (b < nBands) {
      var acc = 0L
      var j = 0
      while (j < bitsPerBand) {
        val plane = planes(p)
        val kMax = math.min(plane.length, n)
        var dot = 0d
        var k = 0
        while (k < kMax) {
          val x = if (elemIsFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
          dot += x * plane(k)
          k += 1
        }
        acc = acc * 2 + (if (dot >= 0) 1L else 0L)
        p += 1
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
