package graft.operators

import graft.etl.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SuffixArrayIndex.probe — the SA family's incremental operating
  * mode: a new batch probed against the PERSISTED corpus index.
  * Checks: (1) probe == an independent driver recompute (max LCP of
  * each batch suffix against EVERY corpus suffix — the brute-force
  * statement of the semantics, code-point exact) over a planted
  * corpus covering multi-span, overlap-merge, sub-threshold, and
  * no-match cases; (2) probe == derive-from-a-FRESH-build over
  * corpus ∪ batch (the fresh-union cross-check the verdict asks
  * for); (3) astral (non-BMP) text keeps code-point offsets/lengths;
  * (4) the batch-suffix broadcast guard fires loud. (The python
  * oracle is the cross-engine check at the gates; this is the
  * cross-implementation + planted-structure check.)
  */
class SuffixArrayProbeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cps(s: String): Array[Int] = s.codePoints.toArray

  /** Driver brute-force: merged spans per batch doc of the longest
    * prefix (≥ 32 code points, capped 2048) each batch suffix shares
    * with ANY corpus suffix. */
  private def refSpans(corpus: Seq[String], batch: Seq[(Long, String)])
      : Map[Long, Seq[(Long, Long)]] = {
    val csufs: Seq[Array[Int]] = corpus.flatMap { t =>
      val c = cps(t); c.indices.map(o => c.drop(o))
    }
    def lcp(a: Array[Int], b: Array[Int]): Long = {
      val m = math.min(math.min(a.length, b.length), 2048)
      var i = 0
      while (i < m && a(i) == b(i)) i += 1
      i.toLong
    }
    batch.map { case (id, bt) =>
      val bc = cps(bt)
      val spans = bc.indices.flatMap { o =>
        val s = bc.drop(o)
        val m = if (csufs.isEmpty) 0L else csufs.map(cs => lcp(s, cs)).max
        if (m >= 32L) Some((o.toLong, o + m)) else None
      }
      id -> mergeSpans(spans)
    }.toMap.withDefaultValue(Seq.empty)
  }

  private def mergeSpans(spans: Seq[(Long, Long)]): Seq[(Long, Long)] =
    spans.sorted.foldLeft(Vector.empty[(Long, Long)]) { (acc, sp) =>
      if (acc.nonEmpty && sp._1 <= acc.last._2)
        acc.init :+ (acc.last._1, math.max(acc.last._2, sp._2))
      else acc :+ sp
    }

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("saprobe").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s0"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def runProbe(sfDir: String, batch: Seq[(Long, String)])
      : Map[Long, Seq[(Long, Long)]] = {
    import spark.implicits._
    val spansDir = java.nio.file.Files.createTempDirectory("saprobe_sp").toString
    val got = SuffixArrayIndex.probe(spark, sfDir,
      batch.toDF("doc_id", "text"), s"$spansDir/spans")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).map { case (k, v) => k -> mergeSpans(v.map(_._2).toSeq) }
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(spansDir))
    got.withDefaultValue(Seq.empty)
  }

  private val rep =
    "the quick brown fox jumps over the lazy dog again and again"

  test("probe matches the brute-force reference on a planted corpus") {
    val corpus = Seq(
      0L -> s"alpha beta $rep gamma delta",
      1L -> s"prefix words $rep and some more shared passage here to find later",
      2L -> "completely unrelated words only here",
      3L -> "short")
    val dir = writeDocs(corpus)
    val batch = Seq(
      // two spans from different docs, novel framing between them
      10L -> s"NEW! $rep ... unrelated filler ... shared passage here to find later END",
      // sub-threshold: only 20 chars copied
      11L -> s"NOVEL ${rep.take(20)} NOTHING ELSE MATCHES HERE TODAY",
      // overlap-merge: two overlapping copies of the repeat region
      12L -> s"x$rep${rep.drop(10)}y",
      // nothing shared at all
      13L -> "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh")
    val got = runProbe(dir, batch)
    val exp = refSpans(corpus.map(_._2), batch)
    batch.foreach { case (id, _) =>
      assert(got(id) === exp(id), s"batch doc $id")
    }
    assert(exp(10L).size >= 2, "planted two-span case must have two spans")
    assert(exp(11L).isEmpty, "sub-threshold copy must not span")
    assert(exp(13L).isEmpty)
  }

  test("probe == derive from a FRESH build over corpus UNION batch") {
    val corpus = Seq(
      0L -> s"one $rep two",
      1L -> s"three $rep four and a second shared run of words that is long enough",
      2L -> "nothing in common with anything else at all")
    val batch = Seq(
      100L -> s"N1 $rep N2 second shared run of words that is long enough N3",
      101L -> "entirely novel content with no verbatim overlap anywhere")
    val dir = writeDocs(corpus)
    val got = runProbe(dir, batch)
    // fresh build over the union (batch ids shifted clear of corpus)
    import spark.implicits._
    val shift = 1000L
    val union = (corpus ++ batch.map { case (id, t) => (id + shift, t) })
    val sa = GeneralizedSuffixArray.build(union.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    val textOf = union.toMap.map { case (k, v) => k -> cps(v) }
    def lcp(a: Array[Int], ao: Int, b: Array[Int], bo: Int): Long = {
      val m = math.min(math.min(a.length - ao, b.length - bo), 2048)
      var i = 0
      while (i < m && a(ao + i) == b(bo + i)) i += 1
      i.toLong
    }
    val lcps = sa.zip(sa.tail).map { case ((d1, o1, _), (d2, o2, _)) =>
      lcp(textOf(d1), o1.toInt, textOf(d2), o2.toInt)
    }
    // two directional gated-min scans: reset on CORPUS suffixes, emit
    // batch suffixes — the d16 composition over the fresh union array
    val n = sa.length
    val best = Array.fill(n)(0L)
    var st = -1L
    for (i <- 0 until n) {
      if (sa(i)._1 < shift) st = Long.MaxValue
      else {
        st = if (st == -1L) -1L else math.min(st, if (i == 0) 0L else lcps(i - 1))
        if (st > best(i)) best(i) = st
      }
    }
    st = -1L
    for (i <- (n - 1) to 0 by -1) {
      if (sa(i)._1 < shift) st = Long.MaxValue
      else {
        st = if (st == -1L) -1L else math.min(st, if (i == n - 1) 0L else lcps(i))
        if (st > best(i)) best(i) = st
      }
    }
    val freshSpans = (0 until n).flatMap { i =>
      if (sa(i)._1 >= shift && best(i) >= 32L)
        Some((sa(i)._1 - shift, (sa(i)._2, sa(i)._2 + best(i))))
      else None
    }.groupBy(_._1).map { case (k, v) => k -> mergeSpans(v.map(_._2)) }
      .withDefaultValue(Seq.empty[(Long, Long)])
    batch.foreach { case (id, _) =>
      assert(got(id) === freshSpans(id), s"batch doc $id: probe vs fresh-union")
    }
    assert(freshSpans(100L).nonEmpty)
  }

  test("astral text: offsets and span lengths are code points") {
    // 𝄞 and 𝔘 are non-BMP (2 UTF-16 units each); the 36-code-point
    // run is shared verbatim — offsets/lengths must count code points
    val run = "𝄞𝔘" * 6 + "abcdefghij𝄞𝔘" * 2 // 12 + 24 = 36 code points
    assert(cps(run).length == 36)
    val corpus = Seq(0L -> s"head $run tail", 1L -> "unrelated words entirely")
    val batch = Seq(50L -> s"𝔘-prefix $run 𝄞-suffix")
    val dir = writeDocs(corpus)
    val got = runProbe(dir, batch)
    val exp = refSpans(corpus.map(_._2), batch)
    assert(got(50L) === exp(50L))
    assert(exp(50L).nonEmpty)
  }

  test("batch-suffix broadcast guard fires loud") {
    val corpus = Seq(0L -> ("corpus words that are long enough to index " * 3))
    val dir = writeDocs(corpus)
    import spark.implicits._
    spark.conf.set("spark.graft.saProbeMaxBatchSuffixes", "4")
    try {
      val e = intercept[IllegalArgumentException] {
        SuffixArrayIndex.probe(spark, dir,
          Seq((1L, "a batch doc with clearly more than four suffixes in it"))
            .toDF("doc_id", "text"),
          java.nio.file.Files.createTempDirectory("saprobe_g").toString + "/s")
      }
      assert(e.getMessage.contains("broadcast bound"))
    } finally spark.conf.unset("spark.graft.saProbeMaxBatchSuffixes")
  }
}
