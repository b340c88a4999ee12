package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator physical as-of merge (custom-operator ladder (c):
  * LogicalPlan + SparkStrategy + SparkPlan), used by
  * [[graft.operators.AsOfJoin]].
  *
  * The child is the tagged union of both sides. The node REQUIRES
  * `ClusteredDistribution(key)` and per-partition ordering
  * `(key, ts, tag)` — EnsureRequirements inserts the one hash
  * exchange and sort, exactly the shuffle a sort-merge join would
  * need — and then a single forward pass per partition carries the
  * most recent right row's payload onto each left row, entirely over
  * `InternalRow`/`UnsafeProjection` (no external-Row round-trip; a
  * `Dataset.mapPartitions` formulation of the same merge measured
  * ~20× slower at sf10 from encoder ser/de alone, and the windowed
  * `last(struct)` formulation 2.4× a native ASOF operator from
  * per-row frame evaluation).
  *
  * Per-task state is one copied key row and one copied payload row —
  * O(1) memory regardless of partition size, no frame buffering.
  */
case class AsOfMergeLogical(
    key: Attribute,
    ts: Attribute,
    tag: Attribute,
    leftAttrs: Seq[Attribute],
    payloadAttrs: Seq[Attribute],
    payloadOut: Seq[AttributeReference],
    ageAttr: AttributeReference,
    tolerance: Option[Long],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = leftAttrs ++ payloadOut :+ ageAttr
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut :+ ageAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): AsOfMergeLogical =
    copy(child = newChild)
}

/** Broadcast as-of (the small-right-side fast path, mirroring
  * Spark's own broadcast-hash join): the right side is collected and
  * broadcast as a per-key ts-sorted lookup, and the left side streams
  * through a hash-probe + binary-search with NO shuffle and NO sort —
  * the left scan's partitioning passes straight through to downstream
  * operators. Chosen by [[graft.operators.AsOfJoin]] when the right
  * side carries a `broadcast()` hint or its optimizer size estimate
  * is under `spark.sql.autoBroadcastJoinThreshold`; the shuffle-merge
  * node above remains the unbounded-size path.
  *
  * At 100 TB this is the plan you want whenever the reference side is
  * dimension-sized (latest station coordinates, error markers): the
  * fact side is never moved.
  */
case class AsOfBroadcastLogical(
    leftKey: Attribute,
    leftTsMicros: Attribute,
    rightKey: Attribute,
    sortedArr: Attribute, // per-key ts-sorted array<struct<ts,payload...>>
    leftAttrs: Seq[Attribute],
    payloadFieldIdx: Seq[Int], // struct field ordinals of the kept payload columns
    payloadOut: Seq[AttributeReference],
    ageAttr: AttributeReference,
    tolerance: Option[Long],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = leftAttrs ++ payloadOut :+ ageAttr
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut :+ ageAttr)
  override def maxRows: Option[Long] = left.maxRows
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfBroadcastLogical =
    copy(left = newLeft, right = newRight)
}

case class AsOfBroadcastExec(
    leftKey: Attribute,
    leftTsMicros: Attribute,
    rightKey: Attribute,
    sortedArr: Attribute,
    leftAttrs: Seq[Attribute],
    payloadFieldIdx: Seq[Int],
    payloadOut: Seq[AttributeReference],
    ageAttr: AttributeReference,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = leftAttrs ++ payloadOut :+ ageAttr
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut :+ ageAttr)
  // left rows pass through 1:1 in place — downstream operators keep
  // the left scan's partitioning and ordering
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    import AsOfBroadcastExec.{Bucket, integralKey, Lookup}
    val rightOutput = right.output
    val rKeyOrd = rightOutput.indexWhere(_.exprId == rightKey.exprId)
    val rArrOrd = rightOutput.indexWhere(_.exprId == sortedArr.exprId)
    val keyType = rightKey.dataType
    val longKeys = integralKey(keyType)
    val structType = sortedArr.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType]
      .elementType.asInstanceOf[org.apache.spark.sql.types.StructType]
    val nStructFields = structType.size
    val payExprs = payloadFieldIdx.map(i =>
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        i, structType(i).dataType, structType(i).nullable))
    val nPay = payloadFieldIdx.size

    // Driver-side collect of the SMALL side only — the same move (and
    // the same responsibility) as BroadcastExchangeExec inside a
    // broadcast-hash join; the operator picks this plan only under
    // the broadcast hint / threshold. The child plan already grouped
    // and ts-sorted the right rows DISTRIBUTED (one row per key with
    // an array<struct<ts,payload>>), so the driver does O(keys) work,
    // and the lookup is packed into primitive arrays + one payload
    // byte blob per key so the broadcast serializes as a handful of
    // arrays, not row objects.
    val collected = right.executeCollect()
    val payProj = UnsafeProjection.create(payExprs)
    val longKeyed = if (longKeys) new scala.collection.mutable.LongMap[Bucket](collected.length) else null
    val anyKeyed = if (longKeys) null else new java.util.HashMap[Any, Bucket](collected.length)
    var nullBucket: Bucket = null
    collected.foreach { row =>
      val arr = row.getArray(rArrOrd)
      val n = arr.numElements()
      if (n > 0) {
        val ts = new Array[Long](n)
        val offsets = new Array[Int](n + 1)
        val blobOut = new java.io.ByteArrayOutputStream()
        var i = 0
        while (i < n) {
          val s = arr.getStruct(i, nStructFields)
          ts(i) = s.getLong(0)
          val bytes = payProj(s).getBytes
          blobOut.write(bytes, 0, bytes.length)
          offsets(i + 1) = offsets(i) + bytes.length
          i += 1
        }
        val bucket = new Bucket(ts, offsets, blobOut.toByteArray)
        if (row.isNullAt(rKeyOrd)) nullBucket = bucket
        else if (longKeys)
          longKeyed.put(AsOfBroadcastExec.keyAsLong(row, rKeyOrd, keyType), bucket)
        else anyKeyed.put(InternalRow.copyValue(row.get(rKeyOrd, keyType)), bucket)
      }
    }
    val leftRdd = left.execute()
    val bc = leftRdd.sparkContext.broadcast(new Lookup(longKeyed, anyKeyed, nullBucket))

    val leftOutput = left.output
    val lKeyOrd = leftOutput.indexWhere(_.exprId == leftKey.exprId)
    val lTsOrd = leftOutput.indexWhere(_.exprId == leftTsMicros.exprId)
    val lKeyType = leftKey.dataType
    val outExprs = output
    val joinSchema = leftOutput ++ payloadOut :+ ageAttr
    val payTypes = payExprs.map(_.dataType).toArray
    val tol = tolerance

    leftRdd.mapPartitions({ iter =>
      val outProj = UnsafeProjection.create(outExprs, joinSchema)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(nPay + 1)
      val lookup = bc.value
      val longMap = lookup.longKeyed
      val anyMap = lookup.anyKeyed
      val payRow = new UnsafeRow(nPay) // points into the bucket blob
      iter.map { row =>
        var ok = false
        var age = 0L
        var payloadSet = false
        if (!row.isNullAt(lTsOrd)) {
          val bucket =
            if (row.isNullAt(lKeyOrd)) lookup.nullBucket
            else if (longMap != null)
              longMap.getOrNull(AsOfBroadcastExec.keyAsLong(row, lKeyOrd, lKeyType))
            else anyMap.get(row.get(lKeyOrd, lKeyType))
          if (bucket != null) {
            val ts = row.getLong(lTsOrd)
            // greatest index with rightTs <= leftTs
            val tsArr = bucket.ts
            var lo = 0; var hi = tsArr.length - 1; var found = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tsArr(mid) <= ts) { found = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (found >= 0) {
              age = Math.floorDiv(ts, 1000000L) - Math.floorDiv(tsArr(found), 1000000L)
              ok = tol.forall(age <= _)
              if (ok) {
                val off = bucket.offsets(found)
                payRow.pointTo(bucket.blob,
                  org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
                  bucket.offsets(found + 1) - off)
                payloadSet = true
              }
            }
          }
        }
        var j = 0
        while (j < nPay) {
          extra.update(j,
            if (payloadSet && !payRow.isNullAt(j)) payRow.get(j, payTypes(j)) else null)
          j += 1
        }
        extra.update(nPay, if (ok) age else null)
        outProj(joined(row, extra)): InternalRow
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfBroadcastExec =
    copy(left = newLeft, right = newRight)
}

object AsOfBroadcastExec {
  /** One key's right rows: ts-sorted parallel arrays; payloads are
    * one concatenated UnsafeRow blob sliced by offsets at probe time
    * (primitive arrays serialize compactly in the broadcast). */
  final class Bucket(val ts: Array[Long], val offsets: Array[Int], val blob: Array[Byte])
    extends Serializable

  /** longKeyed (unboxed probe) for integral keys, anyKeyed otherwise;
    * NULL keys group together (as a window partition would) in the
    * side slot. */
  final class Lookup(
      val longKeyed: scala.collection.mutable.LongMap[Bucket],
      val anyKeyed: java.util.HashMap[Any, Bucket],
      val nullBucket: Bucket) extends Serializable

  private[plans] def integralKey(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType |
         org.apache.spark.sql.types.DateType | org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  /** Width-correct long extraction (getLong on an int column would
    * misread columnar rows). Call only when integralKey(dt). */
  private[plans] def keyAsLong(row: InternalRow, ord: Int,
                               dt: org.apache.spark.sql.types.DataType): Long = dt match {
    case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.DateType =>
      row.getInt(ord).toLong
    case org.apache.spark.sql.types.ShortType => row.getShort(ord).toLong
    case org.apache.spark.sql.types.ByteType => row.getByte(ord).toLong
    case _ => row.getLong(ord)
  }
}

/** Column pruning through [[AsOfMergeLogical]]. Catalyst's built-in
  * ColumnPruning treats an unknown node conservatively: it inserts a
  * `Project` ABOVE it but cannot shrink what flows THROUGH it, so a
  * query aggregating two columns would still shuffle and sort every
  * left column (at sf10 that is the difference between a 3-narrow-
  * column exchange and one carrying a fat JSON string per row). This
  * rule runs inside the same fixed-point batch (injectOptimizerRule):
  * it drops unused left columns and unused payload slots from the
  * node and projects the child, and the built-in ColumnPruning then
  * pushes that projection through the union into both parquet scans.
  */
object AsOfMergePruning extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, m: AsOfMergeLogical) =>
      val needed = p.references
      val keptLeft = m.leftAttrs.filter(needed.contains)
      val keptPay = m.payloadAttrs.zip(m.payloadOut).filter { case (_, out) => needed.contains(out) }
      if (keptLeft.size == m.leftAttrs.size && keptPay.size == m.payloadAttrs.size) p
      else {
        val childNeeded =
          (Seq(m.key, m.ts, m.tag) ++ keptLeft ++ keptPay.map(_._1)).distinct
        p.copy(child = m.copy(
          leftAttrs = keptLeft,
          payloadAttrs = keptPay.map(_._1),
          payloadOut = keptPay.map(_._2),
          child = Project(childNeeded, m.child)))
      }
    case p @ Project(_, b: AsOfBroadcastLogical) =>
      val needed = p.references
      val keptLeft = b.leftAttrs.filter(needed.contains)
      // unused payload slots are dropped from the node's output and
      // the broadcast blob (the struct array itself stays as built)
      val keptPay = b.payloadFieldIdx.zip(b.payloadOut).filter { case (_, out) => needed.contains(out) }
      if (keptLeft.size == b.leftAttrs.size && keptPay.size == b.payloadFieldIdx.size) p
      else {
        val leftNeeded = (Seq(b.leftKey, b.leftTsMicros) ++ keptLeft).distinct
        p.copy(child = b.copy(
          leftAttrs = keptLeft,
          payloadFieldIdx = keptPay.map(_._1),
          payloadOut = keptPay.map(_._2),
          left = Project(leftNeeded, b.left)))
      }
  }
}

/** Plans [[AsOfMergeLogical]]; registered through GraftExtensions and
  * self-healed into `spark.experimental.extraStrategies` by
  * [[graft.operators.AsOfJoin]] so the operator works in any session. */
object AsOfMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case m: AsOfMergeLogical =>
      AsOfMergeExec(m.key, m.ts, m.tag, m.leftAttrs, m.payloadAttrs,
        m.payloadOut, m.ageAttr, m.tolerance, planLater(m.child)) :: Nil
    case b: AsOfBroadcastLogical =>
      AsOfBroadcastExec(b.leftKey, b.leftTsMicros, b.rightKey, b.sortedArr,
        b.leftAttrs, b.payloadFieldIdx, b.payloadOut, b.ageAttr, b.tolerance,
        planLater(b.left), planLater(b.right)) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeExec(
    key: Attribute,
    ts: Attribute,
    tag: Attribute,
    leftAttrs: Seq[Attribute],
    payloadAttrs: Seq[Attribute],
    payloadOut: Seq[AttributeReference],
    ageAttr: AttributeReference,
    tolerance: Option[Long],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = leftAttrs ++ payloadOut :+ ageAttr
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut :+ ageAttr)

  // ONE hash shuffle on the key; in-partition sort (key, ts, tag) so
  // each key's rows are contiguous and time-ordered, right rows (tag
  // 0) before left rows (tag 1) at equal ts — a right row AT the left
  // timestamp is visible to it. NULL keys group together (as a window
  // partition would); NULL timestamps sort first, so a left row with
  // NULL ts only ever sees NULL-ts right rows, which never establish
  // a match (age is undefined).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(key)) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(key, Ascending), SortOrder(ts, Ascending), SortOrder(tag, Ascending)))
  // left rows are emitted in child order with key/ts untouched
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftAttrs.find(_.exprId == key.exprId).map(k => SortOrder(k, Ascending)).toSeq

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val tsOrd = childOutput.indexWhere(_.exprId == ts.exprId)
    val tagOrd = childOutput.indexWhere(_.exprId == tag.exprId)
    val keyExpr = key
    val payAttrs = payloadAttrs
    val outExprs = output
    val joinSchema = childOutput ++ payloadOut :+ ageAttr
    val tol = tolerance
    val nPay = payloadAttrs.size

    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
      val payProj = UnsafeProjection.create(payAttrs, childOutput)
      val outProj = UnsafeProjection.create(outExprs, joinSchema)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(nPay + 1)
      val payTypes = payAttrs.map(_.dataType).toArray
      // Hand-rolled iterator: right rows are consumed inline while
      // scanning for the next left row — no per-row Iterator
      // allocation (a flatMap{Iterator.single/empty} formulation
      // measured ~20% slower on a 10 M-row merge from the per-row
      // iterator churn alone).
      new Iterator[InternalRow] {
        // running per-task state: current key + most recent right row
        private var curKey: UnsafeRow = null
        private var haveRight = false
        private var rightTsMicros = 0L
        private var carried: UnsafeRow = null
        private var nextLeft: InternalRow = null

        private def advance(): Unit = {
          nextLeft = null
          while (nextLeft == null && iter.hasNext) {
            val row = iter.next()
            val k = keyProj(row)
            if (curKey == null || k != curKey) {
              curKey = k.copy(); haveRight = false
            }
            if (row.getInt(tagOrd) == 0) { // right row: update the carry
              if (!row.isNullAt(tsOrd)) {
                haveRight = true
                rightTsMicros = row.getLong(tsOrd)
                carried = payProj(row).copy() // sort iterators reuse rows
              }
            } else nextLeft = row
          }
        }

        advance()
        override def hasNext: Boolean = nextLeft != null
        override def next(): InternalRow = {
          val row = nextLeft
          val matched = haveRight && !row.isNullAt(tsOrd)
          // age in whole seconds (floor(epoch) difference), ordering
          // at full microsecond precision
          val age =
            if (matched)
              Math.floorDiv(row.getLong(tsOrd), 1000000L) -
                Math.floorDiv(rightTsMicros, 1000000L)
            else 0L
          val ok = matched && tol.forall(age <= _)
          var j = 0
          while (j < nPay) {
            extra.update(j,
              if (ok && !carried.isNullAt(j)) carried.get(j, payTypes(j)) else null)
            j += 1
          }
          extra.update(nPay, if (ok) age else null)
          val out = outProj(joined(row, extra))
          advance()
          out
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): AsOfMergeExec =
    copy(child = newChild)
}
