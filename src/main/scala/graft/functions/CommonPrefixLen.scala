package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `common_prefix_len(a, b)` — the length in CHARACTERS of the longest
  * common prefix of two strings, as one byte loop over the UTF8String
  * buffers (no String materialization): compare bytes, back a
  * partially-matched multi-byte character off the end (valid UTF-8's
  * prefix property makes byte-prefix-on-a-char-boundary ≡ code-point
  * prefix), then count characters as non-continuation bytes.
  *
  * Built for the suffix-array LCP stage (d14), where it runs over the
  * CANDIDATE adjacent pairs only — but it codegens like the other scan
  * kernels so it stays WSCG-resident wherever it appears.
  */
case class CommonPrefixLen(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"common_prefix_len needs two string columns, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    CommonPrefixLen.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CommonPrefixLen.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CommonPrefixLen {

  /** Longest common prefix in characters. */
  def compute(a: UTF8String, b: UTF8String): Long = {
    val ab = a.getBytes
    val bb = b.getBytes
    val n = math.min(ab.length, bb.length)
    var i = 0
    while (i < n && ab(i) == bb(i)) i += 1
    // If the mismatch (or the shorter string's end — only reachable
    // mid-char for invalid UTF-8) landed inside a multi-byte char,
    // back off to that char's lead byte: the partial char is NOT a
    // common character.
    if (i > 0 && i < ab.length && (ab(i) & 0xC0) == 0x80) {
      var s = i - 1
      while (s > 0 && (ab(s) & 0xC0) == 0x80) s -= 1
      // s is the lead byte of the char containing position i iff that
      // char extends past the matched region
      if (s + charLen(ab(s)) > i) i = s
    }
    var chars = 0L
    var j = 0
    while (j < i) {
      if ((ab(j) & 0xC0) != 0x80) chars += 1
      j += 1
    }
    chars
  }

  private def charLen(lead: Byte): Int = {
    val u = lead & 0xFF
    if (u < 0x80) 1
    else if (u < 0xE0) 2
    else if (u < 0xF0) 3
    else 4
  }
}
