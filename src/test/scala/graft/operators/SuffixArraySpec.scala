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

  /** Driver recompute of the d15 contract: predecessor-LCP ≥ 32 spans
    * on the SA-later suffix, union-merged per doc, complement text. */
  private def d15Driver(rows: Seq[(Long, String)])
      : Seq[(Long, Long, Long, String)] = {
    val sufs = saDriver(rows)
    val spans = scala.collection.mutable.Map.empty[Long, List[(Long, Long)]]
    sufs.zip(sufs.tail).foreach { case ((s1, _, _), (s2, d2, o2)) =>
      val l = math.min(s1.zip(s2).takeWhile(p => p._1 == p._2).length.toLong, 2048L)
      if (l >= 32) spans(d2) = (o2, o2 + l) :: spans.getOrElse(d2, Nil)
    }
    rows.sortBy(_._1).map { case (id, t) =>
      val merged = spans.getOrElse(id, Nil).sorted
        .foldLeft(List.empty[(Long, Long)]) {
          case ((ps, pe) :: acc, (st, en)) if st <= pe =>
            (ps, math.max(pe, en)) :: acc
          case (acc, iv) => iv :: acc
        }.reverse
      val removed = merged.map { case (st, en) => en - st }.sum
      val sb = new StringBuilder
      var pos = 0L
      merged.foreach { case (st, en) =>
        sb.append(t.substring(pos.toInt, st.toInt)); pos = en
      }
      sb.append(t.substring(pos.toInt))
      (id, t.length.toLong, removed, sb.toString)
    }
  }

  test("d15 removes planted repeats, keeps the SA-first occurrence") {
    import spark.implicits._
    val repeat = "the quick brown fox jumps over the lazy dog again and again"
    val rows = Seq(
      (0L, s"alpha beta $repeat gamma delta"),
      (1L, s"zeta eta theta $repeat iota"),
      (2L, s"mid $repeat tail $repeat end"), // self-repeat inside one doc
      (3L, "another unrelated document with its own content"),
      (4L, "")) // empty text must round-trip untouched
    val dir = java.nio.file.Files.createTempDirectory("d15spec").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = graft.SparkEntry.queries("d15_substring_removal")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getString(4)))
        .toSeq
      val expected = d15Driver(rows)
      assert(out === expected)
      // the planted repeat is GONE from every doc except exactly one
      // keeper occurrence corpus-wide (SA-first), and untouched docs
      // round-trip byte-identical
      val cleaned = out.map(_._4)
      val keptOccurrences = cleaned.map { t =>
        var c = 0; var i = t.indexOf(repeat)
        while (i >= 0) { c += 1; i = t.indexOf(repeat, i + 1) }
        c
      }.sum
      assert(keptOccurrences == 1, s"expected exactly one kept copy, got $keptOccurrences")
      assert(out(3)._4 == rows(3)._2) // no spans → identity
      assert(out(3)._3 == 0L)
      assert(out(4) == ((4L, 0L, 0L, ""))) // empty doc: no phantom suffix
      // removal accounting is consistent
      out.foreach { case (_, nChars, nRemoved, clean) =>
        assert(clean.length.toLong == nChars - nRemoved)
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("spill-bounded (parquet-handoff) build equals the in-memory build") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, sf, "documents").selectExpr("doc_id", "text")
    val inMem = GeneralizedSuffixArray.build(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    inMem // materialized before flipping the mode
    val pinned = spark.newSession() // conf-isolated clone (Q.forcedBig idiom)
    pinned.conf.set("spark.graft.saCheckpointMinSuffixes", "1")
    val ckpt = GeneralizedSuffixArray.build(
      graft.Tables.load(pinned, sf, "documents").selectExpr("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(ckpt === inMem)
  }

  test("SA of an all-empty corpus is empty (no NPE, no phantom rows)") {
    import spark.implicits._
    val sa = GeneralizedSuffixArray.build(
      Seq((0L, ""), (1L, "")).toDF("doc_id", "text"))
    assert(sa.count() == 0L)
    sa.unpersist()
    // and a mixed corpus ranks only the non-empty docs' suffixes
    val sa2 = GeneralizedSuffixArray.build(
      Seq((0L, ""), (1L, "ab")).toDF("doc_id", "text"))
    val got = sa2.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == Seq((1L, 0L), (1L, 1L)))
    sa2.unpersist()
  }
}
