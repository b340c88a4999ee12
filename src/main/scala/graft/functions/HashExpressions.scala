package graft.functions

import graft.rtcm.Crc24q
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CRC-24Q over a binary column — the frame-integrity check exposed as
  * a SQL-usable scalar (reference: src/crc.py; SURVEY.md §2.5). Eval
  * delegates to the shared pure-Scala LUT implementation so the
  * SQL-facing value can never drift from the ingest path's.
  */
case class Crc24qExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"crc24q needs binary, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    Crc24q.compute(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => s"${ev.value} = graft.rtcm.Crc24q.compute($b);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit polynomial rolling hash (base 1000003, mod 2^64) over a
  * string's UTF-8 bytes — the document-fingerprint primitive: cheap,
  * order-sensitive (unlike a bag-of-words hash), and codegen'd.
  */
case class RollingHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"rolling_hash64 needs string, got ${other.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    RollingHash64.compute(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.RollingHash64.compute($s.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash64 {
  final val Base = 1000003L
  def compute(bytes: Array[Byte]): Long = {
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    h
  }
}
