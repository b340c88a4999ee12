package graft.operators

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** GeneralizedSuffixArray: the distributed prefix-doubling
  * construction against a plain driver-side suffix sort — the SA
  * order, the rank32 equivalence, and the d14 repeat report over a
  * planted corpus with KNOWN longest repeats. (The python oracle is
  * the cross-engine check at the gate; this is the
  * cross-implementation check plus the planted-structure case.)
  */
class SuffixArraySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def saDriver(rows: Seq[(Long, String)]): Seq[(String, Long, Long)] =
    rows.flatMap { case (id, t) =>
      (0 until t.length).map(o => (t.substring(o), id, o.toLong))
    }.sortBy(identity)

  test("SA order and rank32 match a driver suffix sort at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = saDriver(docs)
    val got = GeneralizedSuffixArray.build(
      graft.Tables.load(spark, sf, "documents").selectExpr("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == expected.length)
    // rank = position in the driver sort
    val byRank = got.sortBy(_._3)
    byRank.zip(expected).foreach { case ((d, o, _, _), (_, ed, eo)) =>
      assert((d, o) == (ed, eo), s"SA order diverges at ($d,$o) vs ($ed,$eo)")
    }
    // rank32 equivalence == equality of 32-char prefixes
    val textOf = docs.toMap
    val r32 = got.map { case (d, o, _, r32v) =>
      (textOf(d).substring(o.toInt).take(32), r32v)
    }
    val byPrefix = r32.groupBy(_._1).values
    byPrefix.foreach(g => assert(g.map(_._2).distinct.length == 1))
    assert(r32.map(_._1).distinct.length == r32.map(_._2).distinct.length)
  }

  test("d14 finds a planted long repeat") {
    import spark.implicits._
    val repeat = "the quick brown fox jumps over the lazy dog again and again"
    val rows = Seq(
      (0L, s"alpha beta $repeat gamma delta"),
      (1L, s"zeta eta theta $repeat iota"),
      (2L, "completely unrelated words only here"),
      (3L, "another unrelated document with its own content"))
    val dir = java.nio.file.Files.createTempDirectory("d14spec").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = graft.SparkEntry.queries("d14_longest_dup_substrings")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
      assert(out.nonEmpty)
      // full driver recompute of the report from the suffix sort
      val sufs = saDriver(rows)
      val expected = sufs.zip(sufs.tail).flatMap {
        case ((s1, d1, o1), (s2, d2, o2)) =>
          val l = s1.zip(s2).takeWhile(p => p._1 == p._2).length.toLong
          if (l >= 32) Some((math.min(l, 2048L), d1, o1, d2, o2)) else None
      }.sortBy { case (l, da, oa, db, ob) => (-l, da, oa, db, ob) }.take(20)
      assert(out.toSeq === expected)
      // the planted repeat surfaces at full strength: the top hit's
      // common prefix CONTAINS the planted string ("eta " from
      // beta/theta extends it left of the plant — the arbitrary-length
      // property the operator exists for)
      val topText = rows.toMap.apply(out.head._2)
        .substring(out.head._3.toInt, out.head._3.toInt + out.head._1.toInt)
      assert(topText.contains(repeat))
      assert(out.head._1 >= repeat.length.toLong)
      // every reported lcp is a genuine common substring
      val textOf = rows.toMap
      out.foreach { case (l, da, oa, db, ob) =>
        val a = textOf(da).substring(oa.toInt)
        val b = textOf(db).substring(ob.toInt)
        assert(a.take(l.toInt) == b.take(l.toInt))
        assert(l >= 32)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
