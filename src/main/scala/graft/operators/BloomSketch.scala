package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, xxhash64}

/** The ONE place that owns the bloom build/probe contract shared by
  * the decontamination family (t08/c05 core, t16, t17, the streaming
  * twin): XXH64-hashed values, fpp target 1%, numBits capped at
  * Spark's runtime-filter ceiling (8 MB), distributed build via
  * Spark's own BloomFilterAggregate with the driver receiving only
  * the sketch. Build and probe MUST hash identically — keeping both
  * here makes that a single point of change.
  */
object BloomSketch {

  /** Distributed sketch over `df`'s `valueCol` strings. Sized from a
    * row count of `df` (an overcount of distinct values only lowers
    * the fpp); pass `items` to skip that counting job when the caller
    * already knows a bound. */
  def build(df: DataFrame, valueCol: String, items: Option[Long] = None): Array[Byte] = {
    import graft.functions.GraftFunctions.bloomAgg
    val n = math.max(1L, items.getOrElse(df.count()))
    val numBits = math.min(64L << 20, // Spark's runtime-filter max (8 MB)
      org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(n, 0.01))
    df.agg(bloomAgg(xxhash64(col(valueCol)), n, numBits).as("bf"))
      .first().getAs[Array[Byte]]("bf") // ONE bounded row: the sketch
  }

  /** Codegen'd probe predicate for a [[build]]-produced sketch: false
    * positives possible, false negatives impossible — a downstream
    * exact join sees every true hit. The sketch literal ships in the
    * task closure (bounded by the build's numBits). */
  def probe(sketch: Array[Byte], value: Column): Column = {
    import graft.functions.GraftFunctions.bloomMightContain
    bloomMightContain(lit(sketch), xxhash64(value))
  }
}
