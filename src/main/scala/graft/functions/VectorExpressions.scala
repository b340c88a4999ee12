package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>` /
  * `array<double>` columns. Interpreted higher-order functions
  * (`aggregate(zip_with(...))`) cost a lambda dispatch per element —
  * on an N²-pair similarity join that dominates the runtime. These
  * expressions generate a tight primitive loop inside whole-stage
  * codegen instead (~100× on the d05 pair sweep).
  *
  * Numeric contract: strict left-to-right double accumulation —
  * bit-identical to the interpreted fold and to DuckDB's list_sum, so
  * oracle-checked queries can swap implementations freely.
  */
trait VectorArrayHelpers {
  protected def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  protected def checkVectorType(dt: DataType, side: String): TypeCheckResultCompat =
    dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckOk
      case other => TypeCheckFail(s"$side must be array<float|double>, got ${other.sql}")
    }
}

// Minimal success/failure shim so we don't depend on the (moving)
// TypeCheckResult helper API across Spark versions.
sealed trait TypeCheckResultCompat { def toResult: org.apache.spark.sql.catalyst.analysis.TypeCheckResult }
case object TypeCheckOk extends TypeCheckResultCompat {
  def toResult = org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
}
final case class TypeCheckFail(msg: String) extends TypeCheckResultCompat {
  def toResult = org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(msg)
}

/** dot(a, b) = Σ a_i·b_i over min(len(a), len(b)), left-to-right. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression with VectorArrayHelpers {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val l = checkVectorType(left.dataType, "left")
    if (l != TypeCheckOk) l.toResult else checkVectorType(right.dataType, "right").toResult
  }

  private lazy val leftFloat = elemIsFloat(left.dataType)
  private lazy val rightFloat = elemIsFloat(right.dataType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getL = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getR = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += $getL * $getR; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** norm(a) = sqrt(Σ a_i²), left-to-right accumulation. */
case class VectorNorm(child: Expression)
    extends UnaryExpression with VectorArrayHelpers {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    checkVectorType(child.dataType, "input").toResult

  private lazy val isFloat = elemIsFloat(child.dataType)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val xi = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
      acc += xi * xi
      i += 1
    }
    math.sqrt(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = $get; $acc += $x * $x; }
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
