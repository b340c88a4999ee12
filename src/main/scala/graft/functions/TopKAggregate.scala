package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as an aggregate: per group, keep the k rows that rank
  * first under (`score` DESC NULLS LAST, `tiebreak` ASC NULLS FIRST),
  * carrying a `payload` struct. Returns array<struct<score double,
  * tiebreak long, payload>> sorted best-first — `posexplode` + pos+1
  * reproduces ROW_NUMBER() ... WHERE rn <= k exactly, INCLUDING rows
  * with null score/tiebreak (round 10: nulls used to be dropped, which
  * confined plans.TopKRewrite to provably non-nullable columns — every
  * parquet scan column is nullable, so the always-on rewrite never
  * fired on real tables; nulls now rank exactly as the window sort
  * ranks them).
  *
  * Why an aggregate and not a window: a rank window must shuffle and
  * sort EVERY row into its group's partition — with few groups that's
  * a skewed shuffle of the full table. This aggregate keeps a bounded
  * k-row buffer per group on the MAP side, so the shuffle carries at
  * most partitions × groups × k rows no matter how large the fact is
  * — the grouped-top-k analogue of TakeOrderedAndProject.
  *
  * Buffer: insertion into a k-sized sorted array (k is small; O(k)
  * insert beats heap constant factors and keeps merge trivial).
  */
case class TopKByScore(
    score: Expression,
    tiebreak: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScore.Buf] {
  require(k > 0 && k <= 1024, s"k=$k out of range")

  override def children: Seq[Expression] = Seq(score, tiebreak, payload)
  override def nullable: Boolean = false

  private def payloadType: StructType = payload.dataType.asInstanceOf[StructType]

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = score.nullable),
    StructField("tiebreak", LongType, nullable = tiebreak.nullable),
    StructField("payload", payloadType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (score.dataType, tiebreak.dataType, payload.dataType) match {
      case (DoubleType, LongType, _: StructType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"top_k_by_score needs (double, bigint, struct), got $other")
    }

  @transient private lazy val toUnsafe = UnsafeProjection.create(payloadType)

  override def createAggregationBuffer(): TopKByScore.Buf = new TopKByScore.Buf(k)

  /** Score comparison matching Spark SQL's double ordering exactly
    * (SQLOrderingUtil semantics): IEEE equality first (so -0.0 == 0.0
    * falls through to the tiebreak, as a window sort would), NaN
    * greater than everything (so with DESC ordering NaN rows rank
    * first, as they do under a window sort). Plain IEEE `>` would
    * silently DROP NaN rows and mis-order -0.0 — diverging from the
    * row_number plan TopKRewrite replaces. */
  private def cmpScore(s1: Double, s2: Double): Int =
    if (s1 == s2) 0 // IEEE ==: -0.0 equals 0.0, fall through to tiebreak
    // Double.compare: NaN compares equal to NaN (so the tiebreak still
    // applies between two NaN rows — an isNaN(s1)-first branch would
    // rank every NaN strictly above every other NaN, making the kept k
    // rows depend on encounter/merge order) and greater than all else
    else java.lang.Double.compare(s1, s2)

  /** better(a, b): does entry a rank strictly before entry b under
    * (score DESC NULLS LAST, tie ASC NULLS FIRST)? Null score ranks
    * after every double (incl. NaN and -Inf — a null-as--Inf encoding
    * would wrongly interleave with real -Inf rows); null tie ranks
    * before every long. */
  private def better(sN1: Boolean, s1: Double, tN1: Boolean, t1: Long,
                     sN2: Boolean, s2: Double, tN2: Boolean, t2: Long): Boolean = {
    if (sN1 != sN2) return !sN1
    val c = if (sN1) 0 else cmpScore(s1, s2)
    if (c != 0) return c > 0
    if (tN1 != tN2) tN1
    else if (tN1) false // both-null ties are equal — not strictly better
    else t1 < t2
  }

  override def update(buf: TopKByScore.Buf, input: InternalRow): TopKByScore.Buf = {
    val s = score.eval(input)
    val t = tiebreak.eval(input)
    val p = payload.eval(input)
    if (p != null) {
      insert(buf,
        s == null, if (s == null) 0.0 else s.asInstanceOf[Double],
        t == null, if (t == null) 0L else t.asInstanceOf[Long],
        toUnsafe(p.asInstanceOf[InternalRow]).copy())
    }
    buf
  }

  private def insert(buf: TopKByScore.Buf, sN: Boolean, s: Double,
                     tN: Boolean, t: Long, p: UnsafeRow): Unit = {
    if (buf.n == k && !better(sN, s, tN, t,
        buf.sNull(k - 1), buf.scores(k - 1), buf.tNull(k - 1), buf.ties(k - 1))) return
    var i = math.min(buf.n, k - 1)
    // shift worse entries down, drop the overflow
    while (i > 0 && better(sN, s, tN, t,
        buf.sNull(i - 1), buf.scores(i - 1), buf.tNull(i - 1), buf.ties(i - 1))) {
      buf.scores(i) = buf.scores(i - 1)
      buf.ties(i) = buf.ties(i - 1)
      buf.sNull(i) = buf.sNull(i - 1)
      buf.tNull(i) = buf.tNull(i - 1)
      buf.rows(i) = buf.rows(i - 1)
      i -= 1
    }
    buf.scores(i) = s
    buf.ties(i) = t
    buf.sNull(i) = sN
    buf.tNull(i) = tN
    buf.rows(i) = p
    if (buf.n < k) buf.n += 1
  }

  override def merge(buf: TopKByScore.Buf, other: TopKByScore.Buf): TopKByScore.Buf = {
    var i = 0
    while (i < other.n) {
      insert(buf, other.sNull(i), other.scores(i),
        other.tNull(i), other.ties(i), other.rows(i))
      i += 1
    }
    buf
  }

  override def eval(buf: TopKByScore.Buf): Any =
    new GenericArrayData((0 until buf.n).map(i =>
      InternalRow(
        if (buf.sNull(i)) null else buf.scores(i),
        if (buf.tNull(i)) null else buf.ties(i),
        buf.rows(i))).toArray[Any])

  override def serialize(buf: TopKByScore.Buf): Array[Byte] = {
    val rowBytes = (0 until buf.n).map(i => buf.rows(i).getBytes)
    val bb = ByteBuffer.allocate(4 + buf.n * 21 + rowBytes.map(_.length).sum)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      val flags = (if (buf.sNull(i)) 1 else 0) | (if (buf.tNull(i)) 2 else 0)
      bb.put(flags.toByte)
      bb.putDouble(buf.scores(i)).putLong(buf.ties(i))
      bb.putInt(rowBytes(i).length).put(rowBytes(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKByScore.Buf(k)
    buf.n = bb.getInt()
    var i = 0
    while (i < buf.n) {
      val flags = bb.get()
      buf.sNull(i) = (flags & 1) != 0
      buf.tNull(i) = (flags & 2) != 0
      buf.scores(i) = bb.getDouble()
      buf.ties(i) = bb.getLong()
      val len = bb.getInt()
      val rb = new Array[Byte](len)
      bb.get(rb)
      val row = new UnsafeRow(payloadType.size)
      row.pointTo(rb, len)
      buf.rows(i) = row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), tiebreak = newChildren(1), payload = newChildren(2))
}

object TopKByScore {
  /** Sorted best-first; parallel arrays sized k, n entries valid. */
  final class Buf(k: Int) {
    var n: Int = 0
    val scores = new Array[Double](k)
    val ties = new Array[Long](k)
    val sNull = new Array[Boolean](k)
    val tNull = new Array[Boolean](k)
    val rows = new Array[UnsafeRow](k)
  }
}
