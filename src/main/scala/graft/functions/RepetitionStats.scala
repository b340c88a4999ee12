package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `repetition_stats(text)` — the five per-document repetition
  * counters of the t11/c02 Gopher-style quality profile, in ONE
  * allocation-light pass over the raw bytes:
  *
  *   [w, dw, topw, b, db] =
  *   [#non-empty words, #distinct non-empty words, max word
  *    multiplicity, #bigrams, #distinct bigrams]
  *
  * with EXACTLY the semantics of the exploded form it replaces:
  * words = split(text, ' ') keeping empties (Spark split limit −1);
  * word stats over the non-empty words; bigrams = adjacent RAW token
  * pairs joined by one space (tokens never contain spaces, so the
  * pair ↔ joined-string mapping is bijective and pair-distinct ==
  * string-distinct), b = max(#tokens−1, 0) counting empty-component
  * pairs, db their distinct count.
  *
  * Why an expression and not the explode: the per-doc counters need
  * NO cross-row state, but the declarative form shuffles every word
  * occurrence twice ((doc, word) count then per-doc roll-up) — at
  * sf10 that is ~85 M exploded rows through two hash aggregates,
  * 12.2 s of t11's runtime. As a scan-side kernel the whole query
  * becomes scan → per-row loop → 5-group aggregate: no shuffle at
  * all before the final per-source rows. At 100 TB the difference is
  * the cluster exchanging its entire tokenized corpus twice versus
  * exchanging five rows per source.
  *
  * Distinctness is open-addressed hashing over token byte-slices
  * (FNV-1a), bigrams as component-pair keys reusing the precomputed
  * token hashes — no per-token String materializes.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats needs a string column, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(RepetitionStats.compute(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val r = ctx.freshName("r")
      s"""
         |long[] $r = graft.functions.RepetitionStats.compute($t);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($r);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {

  /** One pass: tokenize on single spaces (keeping empties), count
    * non-empty words / distinct / top multiplicity, and adjacent-pair
    * bigram totals / distincts. Returns [w, dw, topw, b, db]. */
  def compute(text: UTF8String): Array[Long] = {
    val b = text.getBytes
    val n = b.length
    // token boundaries (split on 0x20; multi-byte UTF-8 never
    // contains an ASCII space byte)
    var nTok = 1
    var i = 0
    while (i < n) { if (b(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val lens = new Array[Int](nTok)
    val hashes = new Array[Int](nTok)
    var t = 0
    var s = 0
    i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        starts(t) = s; lens(t) = i - s
        // FNV-1a over the token bytes
        var h = 0x811c9dc5
        var j = s
        while (j < i) { h = (h ^ (b(j) & 0xff)) * 0x01000193; j += 1 }
        hashes(t) = h
        t += 1; s = i + 1
      }
      i += 1
    }

    @inline def tokEq(a: Int, c: Int): Boolean = {
      if (lens(a) != lens(c)) return false
      var j = 0
      while (j < lens(a)) {
        if (b(starts(a) + j) != b(starts(c) + j)) return false
        j += 1
      }
      true
    }

    // word table: open addressing, slot -> representative token idx
    var cap = 8
    while (cap < nTok * 2) cap <<= 1
    val mask = cap - 1
    val slot = new Array[Int](cap)
    java.util.Arrays.fill(slot, -1)
    val cnt = new Array[Int](cap)
    var w = 0L
    var dw = 0L
    var topw = 0L
    t = 0
    while (t < nTok) {
      if (lens(t) > 0) {
        w += 1
        var p = hashes(t) & mask
        var done = false
        while (!done) {
          val r = slot(p)
          if (r == -1) {
            slot(p) = t; cnt(p) = 1; dw += 1
            if (topw < 1) topw = 1
            done = true
          } else if (hashes(r) == hashes(t) && tokEq(r, t)) {
            cnt(p) += 1
            if (cnt(p) > topw) topw = cnt(p)
            done = true
          } else p = (p + 1) & mask
        }
      }
      t += 1
    }

    // bigram table: key = adjacent token pair (components are
    // space-free, so pair identity == joined-string identity)
    val nb = math.max(nTok - 1, 0)
    var db = 0L
    if (nb > 0) {
      var bcap = 8
      while (bcap < nb * 2) bcap <<= 1
      val bmask = bcap - 1
      val bslot = new Array[Int](bcap)
      java.util.Arrays.fill(bslot, -1)
      t = 0
      while (t < nb) {
        val h = (hashes(t) * 0x9e3779b1) ^ hashes(t + 1)
        var p = h & bmask
        var done = false
        while (!done) {
          val r = bslot(p)
          if (r == -1) { bslot(p) = t; db += 1; done = true }
          else if (tokEq(r, t) && tokEq(r + 1, t + 1)) done = true
          else p = (p + 1) & bmask
        }
        t += 1
      }
    }
    Array(w, dw, topw, nb.toLong, db)
  }
}
