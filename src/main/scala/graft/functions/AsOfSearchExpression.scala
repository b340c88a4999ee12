package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Backward as-of probe: greatest element of a ts-sorted
  * `array<struct<ts:long, payload…>>` whose leading ts is ≤ the probe
  * ts, or NULL when none qualifies (or either input is NULL).
  *
  * This is the scalar half of the broadcast as-of join
  * ([[graft.operators.AsOfJoin]]): the reference side is grouped into
  * per-key sorted arrays and broadcast through Spark's own
  * BroadcastHashJoin, and this expression binary-searches the array
  * per fact row — O(log n) per row, inside whole-stage codegen, so
  * the fact side's scan → join → probe → partial-agg pipeline stays a
  * single generated loop with no custom physical node at all.
  */
case class AsOfSearch(left: Expression, right: Expression) extends BinaryExpression {

  override def prettyName: String = "asof_search"
  override def nullable: Boolean = true
  override def dataType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(s: StructType, _), LongType) if s.nonEmpty && s.head.dataType == LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"asof_search expects (array<struct<long,…>>, long), got (${l.sql}, ${r.sql})")
    }

  private lazy val nFields: Int =
    left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType].size

  override def nullSafeEval(arrAny: Any, tsAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val ts = tsAny.asInstanceOf[Long]
    var lo = 0
    var hi = arr.numElements() - 1
    var found = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getStruct(mid, nFields).getLong(0) <= ts) { found = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    if (found < 0) null else arr.getStruct(found, nFields)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, ts) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val found = ctx.freshName("found")
      s"""
         |int $lo = 0, $hi = $arr.numElements() - 1, $found = -1;
         |while ($lo <= $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($arr.getStruct($mid, $nFields).getLong(0) <= $ts) { $found = $mid; $lo = $mid + 1; }
         |  else $hi = $mid - 1;
         |}
         |if ($found >= 0) { ${ev.value} = $arr.getStruct($found, $nFields); }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AsOfSearch =
    copy(left = newLeft, right = newRight)
}
