package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row
  * with `right.ts <= left.ts` (backward) within the same key — the
  * time-series join behind "state at time of event" queries
  * (e.g. pairing observations with the station's last reported
  * coordinates, or events with the last disconnect).
  *
  * Spark-first composition (preference (a) of the custom-operator
  * ladder — built-ins express this, so no custom SparkPlan): tag and
  * union both sides, ONE shuffle on (key), in-partition sort by
  * (ts, tag), then `last(right_payload, ignoreNulls)` over the
  * running window carries the latest right payload forward onto each
  * left row. No join explosion, no range-join quadratic blowup; state
  * per partition is one row of carried payload.
  *
  * At 100 TB: identical shape to sessionization — shuffle bounded by
  * the key cardinality split, AQE handles skewed keys, and the sort
  * is the same per-partition sort a sort-merge join would need
  * anyway.
  */
object AsOfJoin {

  /** @param left       left (probe) rows
    * @param right      right (reference) rows
    * @param key        equi-key column name present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param payload    right columns to carry onto left rows
    * @param tolerance  max allowed left.ts - right.ts in seconds
    *                   (None = unbounded)
    */
  def backward(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, payload: Seq[String],
               tolerance: Option[Long] = None): DataFrame = {
    // cast("timestamp") first: parquet written without UTC adjustment
    // loads as TIMESTAMP_NTZ, which the strict unix_micros rejects;
    // under the session's UTC zone the NTZ→LTZ cast is the identity
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", unix_micros(col(leftTs).cast("timestamp")))
      .withColumn("__tag", lit(1))
      .withColumn("__asof_ts", lit(null).cast("long"))
    val lWithNullPayload = payload.foldLeft(l)((df, p) =>
      df.withColumn(s"__p_$p", lit(null).cast(right.schema(p).dataType)))
    val r = right
      .select((key +: rightTs +: payload).distinct.map(col): _*)
      .withColumn("__ts", unix_micros(col(rightTs).cast("timestamp")))
      .withColumn("__tag", lit(0))
      .withColumn("__asof_ts", col("__ts"))
    // rename payload BEFORE aligning: a payload column may share its
    // name with a left column (both sides carrying event_id etc.)
    val rRenamed = payload.foldLeft(r)((df, p) => df.withColumnRenamed(p, s"__p_$p"))
    val rFinal = leftCols.foldLeft(rRenamed)((df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val unionCols = (leftCols ++ Seq("__ts", "__tag", "__asof_ts") ++ payload.map(p => s"__p_$p"))
      .distinct
    val unioned = lWithNullPayload.select(unionCols.map(col): _*)
      .unionByName(rFinal.select(unionCols.map(col): _*))

    // right rows sort before left rows at equal ts (tag 0 < 1): a
    // right row AT the left timestamp is visible to it
    val w = Window.partitionBy(key).orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry ONE struct of (ts, payload...): the struct is non-null for
    // every right row even when its payload fields are NULL, so the
    // matched timestamp and payload always come from the SAME (most
    // recent) right row — per-column last(ignoreNulls) would skip a
    // null payload cell and mix fields of two different right rows
    val rightStruct = when(col("__tag") === 0,
      struct((col("__asof_ts").as("__mts") +: payload.map(p => col(s"__p_$p").as(p))): _*))
    val carried = unioned
      .withColumn("__asof", last(rightStruct, ignoreNulls = true).over(w))
      .withColumn("__matched_ts", col("__asof").getField("__mts"))

    // age in whole seconds (floor(epoch) difference), ordering at
    // full microsecond precision
    val ageS = expr("(__ts div 1000000) - (__matched_ts div 1000000)")
    val inTolerance = tolerance match {
      case Some(t) => col("__matched_ts").isNotNull && ageS <= t
      case None => col("__matched_ts").isNotNull
    }
    val out = carried
      .filter(col("__tag") === 1)
      .withColumn("asof_age_s", when(inTolerance, ageS).cast("long"))
    val finalCols = leftCols.map(col) ++
      payload.map(p => when(inTolerance, col("__asof").getField(p)).as(s"asof_$p")) :+
      col("asof_age_s")
    out.select(finalCols: _*)
  }
}
