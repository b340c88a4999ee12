package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused element-wise vector sum: one aggregate carrying an
  * Array[Long] buffer of `dims` scaled-long element sums
  * (round(x·10^scale) per element — the same exact fixed-point rule as
  * Q.dsum, so results are order-independent and engine-exact).
  *
  * Replaces `dims` separate SUM(round(v[i]·s)) aggregate expressions:
  * the unfused plan evaluates `dims` array-extract + BigDecimal-round
  * expressions per row against `dims` independent buffer slots, which
  * benchmarked 16× slower than DuckDB on s02 at sf10; this is one
  * tight primitive loop per row. The oracle SQL stays the 64-column
  * SUM form — values are identical by construction.
  *
  * Overflow bound: per-group Σ|v_i|·10^scale < 2^63 per element.
  */
case class VectorScaledLongSum(
    child: Expression,
    dims: Int,
    scale: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val mult = math.pow(10, scale)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
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
        .TypeCheckFailure(s"vector_scaled_sum needs array<double|float>, got ${other.sql}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](dims)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(dims, arr.numElements())
      var i = 0
      while (i < n) {
        val x = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        // identical to Spark's round(x·10^scale, 0) — see ScaledLong
        // for the fast-path equivalence argument
        buffer(i) += ScaledLong.round(x * mult)
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < dims) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * dims)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dims)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorScaledLongSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorScaledLongSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
