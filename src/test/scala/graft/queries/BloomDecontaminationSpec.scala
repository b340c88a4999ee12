package graft.queries

import graft.etl.SparkTestSession
import graft.functions.GraftFunctions.{bloomAgg, bloomMightContain}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** t16 bloom-prefiltered decontamination: the probe is a pure
  * prefilter — no false negatives, so the bloom plan's output must be
  * BIT-IDENTICAL to the exact (probe-less) plan on any input. Checked
  * against an in-spec exact twin on sf0.001 and a hand fixture, plus
  * the sketch-level no-false-negative property on its own.
  */
class BloomDecontaminationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Exact (bloom-less) twin of t16's contract: per-train-doc 3-gram
    * eval-overlap report, docs with ≥1 hit only. */
  private def exactReport(d: String) = {
    val g = graft.Tables.load(spark, d, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), col("source"), expr(
        "array_distinct(transform(slice(sequence(0, size(ws)), 1, greatest(size(ws) - 2, 0)), " +
          "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])))").as("grams"))
    val evalGrams = g.filter(col("doc_id") % 37 === 0)
      .select(explode(col("grams")).as("gram")).distinct()
    val hits = g.filter(col("doc_id") % 37 =!= 0)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    g.filter(col("doc_id") % 37 =!= 0)
      .select(col("doc_id"), col("source"), size(col("grams")).cast(LongType).as("n_grams"))
      .join(hits, Seq("doc_id"), "inner")
      .select("doc_id", "source", "n_grams", "n_hits")
      .orderBy("doc_id")
  }

  test("t16 equals the exact (bloom-less) plan on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val bloom = graft.SparkEntry.queries("t16_bloom_decontamination")(spark, d)
      .collect().map(_.toSeq).toSeq
    val exact = exactReport(d).collect().map(_.toSeq).toSeq
    assert(bloom.nonEmpty, "fixture must exercise the report")
    assert(bloom == exact)
  }

  test("t16 hand fixture: hit counts, eval/train split, short-doc gate") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_t16").toString
    Seq(
      // doc 0: eval (0 % 37 == 0) — contributes grams, never reported
      (0L, "a b c d", "ev", 7L),
      // doc 1: train, shares gram "b c d" with eval → 1 hit of 2 grams
      (1L, "x b c d", "s0", 7L),
      // doc 2: train, no shared gram → absent from the report
      (2L, "p q r s", "s0", 7L),
      // doc 3: train, 2 words < minWords → gated out entirely
      (3L, "a b", "s0", 3L),
      // doc 4: train, duplicated gram counts ONCE (distinct grams)
      (4L, "a b c a b c", "s1", 11L))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("t16_bloom_decontamination")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (1L, "s0", 2L, 1L), // "b c d" hits; "x b c" doesn't
      (4L, "s1", 3L, 1L))) // distinct {a b c, b c a, c a b}; "a b c" hits
  }

  test("sketch has no false negatives over its build set") {
    import spark.implicits._
    val vals = (0L until 10000L).map(i => s"gram_$i")
    val df = vals.toDF("gram")
    val sketch = df
      .agg(bloomAgg(xxhash64(col("gram")), 10000L, 1L << 17).as("bf"))
      .first().getAs[Array[Byte]]("bf")
    val misses = df
      .filter(!bloomMightContain(lit(sketch), xxhash64(col("gram"))))
      .count()
    assert(misses == 0L)
  }
}
