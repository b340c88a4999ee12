package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** t24 (trainable quality classifier): an independent driver-side
  * recompute of the WHOLE contract — integer feature extraction, the
  * ≥3-of-4 gate label, depth-3 histogram CART training with the exact
  * |pl·nr − pr·nl| criterion and (feature, value) tie-break, and the
  * leaf report — compared row-exactly against the engine. (The DuckDB
  * oracle is the cross-engine check; this spec is the
  * cross-IMPLEMENTATION check: plain Scala loops vs the distributed
  * histogram plan.) A second case plants a corpus where the best
  * split is KNOWN and asserts the learned structure itself.
  */
class QualityTreeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def rhu(s: Long, c: Long, mul: Long): Long =
    (math.signum(s.toDouble) *
      math.floor((math.abs(s).toDouble * (2 * mul) + c) / (c.toDouble * 2))).toLong

  /** (features, label) exactly as t24 defines them. */
  private def featrow(text: String): (Array[Long], Long) = {
    val ws = text.split(" ", -1).filter(_.nonEmpty)
    val w = ws.length.toLong
    val ns = text.count(_ != ' ').toLong
    val dw = ws.distinct.length.toLong
    val pad = " " + text + " "
    val sw = Seq(" the ", " a ", " and ", " of ").count(pad.contains).toLong
    val g = (if (w >= 50 && w <= 100000) 1 else 0) +
      (if (3 * w <= ns && ns <= 10 * w) 1 else 0) +
      (if (sw >= 2) 1 else 0) +
      (if (2 * dw >= w) 1 else 0)
    val cpw10 = if (w == 0) 0L else rhu(ns, w, 10)
    val dpm = if (w == 0) 0L else rhu(dw, w, 1000)
    (Array(w, cpw10, sw, dpm), if (g >= 3) 1L else 0L)
  }

  /** Quantile bucketing over the TRAINING rows — the t24 contract:
    * per feature, nd ≤ 256 distinct values ⇒ bucket = 0-based value
    * rank (identity candidate set), else the equal-frequency
    * (cum−1)·256 div n formula; thrOf(b) = the bucket's max training
    * value (v ascending ⇒ last write wins). */
  private def bucketize(rows: Seq[(Array[Long], Long)])
      : (Map[(Int, Long), Long], Map[(Int, Long), Long]) = {
    val n = rows.size.toLong
    val bOf = scala.collection.mutable.Map.empty[(Int, Long), Long]
    val tOf = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for (f <- 1 to 4) {
      val byV = rows.groupBy(_._1(f - 1)).toSeq.sortBy(_._1)
      val nd = byV.size.toLong
      var cum = 0L
      byV.zipWithIndex.foreach { case ((v, g), rank) =>
        cum += g.size
        val b = if (nd <= 256L) rank.toLong else (cum - 1) * 256L / n
        bOf((f, v)) = b
        tOf((f, b)) = v
      }
    }
    (bOf.toMap, tOf.toMap)
  }

  /** Plain-loop recompute: leaves (node -> (n, pos)) + split count —
    * training rows routed through the reconstructed split chain. */
  private def trainExpected(rows: Seq[(Array[Long], Long)], depth: Int)
      : (Map[Long, (Long, Long)], Int) = {
    val splits = reconstructSplits(rows, depth)
    val leaves = rows.map { case (fv, y) =>
      var node = 1L
      while (splits.contains(node)) {
        val (f, thr) = splits(node)
        node = if (fv(f - 1) <= thr) 2 * node else 2 * node + 1
      }
      (node, y)
    }.groupBy(_._1).map { case (node, rs) =>
      node -> ((rs.size.toLong, rs.map(_._2).sum))
    }
    (leaves, splits.size)
  }

  private def engineRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq

  test("t24 engine matches an independent driver recompute at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val texts = graft.Tables.load(spark, sf, "documents")
      .selectExpr("text").collect().map(_.getString(0)).toSeq
    val (leaves, nSplits) = trainExpected(texts.map(featrow), 3)
    val correct = leaves.values.map { case (n, p) =>
      if (2 * p > n) p else n - p
    }.sum
    val tot = leaves.values.map(_._1).sum
    val accPpm = rhu(correct, tot, 1000000)
    val expected = leaves.toSeq.sortBy(_._1).map { case (node, (n, p)) =>
      (node, n, p, if (2 * p > n) 1L else 0L, accPpm, nSplits.toLong)
    }
    val got = engineRows(graft.SparkEntry.queries("t24_quality_classifier")(spark, sf))
    assert(got === expected)
    // the teacher signal is learnable: distillation beats the majority
    // class on its own training labels
    val nPos = leaves.values.map(_._2).sum
    assert(correct > math.max(nPos, tot - nPos))
  }

  private def knuth32(c: Long): Long = {
    val d = java.lang.Math.floorMod(c, 4294967296L)
    java.lang.Math.floorMod(
      java.lang.Math.floorMod(d * 40503L, 65536L) * 65536L + d * 31153L,
      4294967296L)
  }

  test("t25 cross-validation matches an independent driver recompute at sf0.001") {
    cvCheck("t25_classifier_cv", flip = _ => false)
  }

  test("t27 noisy-label CV matches the driver recompute and separates train from test") {
    val got = cvCheck("t27_classifier_noisy_cv",
      flip = id => knuth32(id + 7L) % 17L == 0L)
    // the whole point of the noisy twin: the label is no longer a
    // deterministic function of the features, so the depth-3 tree
    // cannot fit it — training accuracy leaves 1.0, and held-out
    // accuracy is measurably below training accuracy overall
    assert(got.forall(_._4 < 1000000L), s"train acc should be < 1.0: $got")
    assert(got.map(_._5).min < 1000000L, s"some fold must miss held-out docs: $got")
  }

  /** Runs the CV query and asserts it equals the independent driver
    * recompute under the given deterministic label flip; returns the
    * engine rows (fold, n_train, n_test, train_ppm, test_ppm, splits). */
  private def cvCheck(query: String, flip: Long => Boolean)
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val withFold = docs.map { case (id, text) =>
      val (fv, y0) = featrow(text)
      val y = if (flip(id)) 1L - y0 else y0
      (knuth32(id) % 5, fv, y)
    }
    val expected = (0L until 5L).map { k =>
      val train = withFold.filter(_._1 != k).map(t => (t._2, t._3))
      val test = withFold.filter(_._1 == k).map(t => (t._2, t._3))
      val (leaves, nSplits) = trainExpected(train, 3)
      // replay the split chain on the held-out docs
      val splits = reconstructSplits(train, 3)
      val preds = leaves.map { case (node, (n, p)) =>
        node -> (if (2 * p > n) 1L else 0L)
      }
      val testPairs = test.map { case (fv, y) =>
        var node = 1L
        var continue = true
        while (continue) {
          splits.get(node) match {
            case Some((f, thr)) =>
              node = if (fv(f - 1) <= thr) 2 * node else 2 * node + 1
            case None => continue = false
          }
        }
        (preds(node), y)
      }
      val nTrain = train.size.toLong
      val trainCorrect = leaves.values.map { case (n, p) =>
        if (2 * p > n) p else n - p
      }.sum
      val testCorrect = testPairs.count { case (pr, y) => pr == y }.toLong
      (k, nTrain, test.size.toLong,
        rhu(trainCorrect, nTrain, 1000000),
        rhu(testCorrect, test.size.toLong, 1000000), nSplits.toLong)
    }
    val got = graft.SparkEntry.queries(query)(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    got
  }

  /** The split map (node -> (f, thr)) of the t24 training procedure:
    * features quantized ONCE over the whole training set
    * ([[bucketize]]), per level the histogram criterion over BUCKET
    * candidates with the (f, bucket)-ascending tie-break, the chosen
    * bucket's threshold its max training value. */
  private def reconstructSplits(rows: Seq[(Array[Long], Long)], depth: Int)
      : Map[Long, (Int, Long)] = {
    val (bOf, tOf) = bucketize(rows)
    var assign: Seq[(Array[Long], Long, Long)] = rows.map { case (f, y) => (f, y, 1L) }
    var all = Map.empty[Long, (Int, Long)]
    for (_ <- 1 to depth) {
      val splits = assign.groupBy(_._3).toSeq.sortBy(_._1).flatMap {
        case (node, rs) =>
          val n = rs.size.toLong
          val pos = rs.map(_._2).sum
          var best: Option[(Long, Int, Long)] = None // (criterion, f, bucket)
          for (f <- 1 to 4) {
            val byB = rs.groupBy(r => bOf((f, r._1(f - 1)))).toSeq.sortBy(_._1)
            var nl = 0L; var pl = 0L
            byB.foreach { case (b, g) =>
              nl += g.size; pl += g.map(_._2).sum
              if (nl < n) {
                val crit = math.abs(pl * (n - nl) - (pos - pl) * nl)
                val better = best.forall { case (bd, bf, bb) =>
                  crit > bd || (crit == bd && (f < bf || (f == bf && b < bb)))
                }
                if (crit > 0 && better) best = Some((crit, f, b))
              }
            }
          }
          best.map { case (_, f, b) => node -> ((f, tOf((f, b)))) }
      }.toMap
      all ++= splits
      assign = assign.map { case (fv, y, node) =>
        splits.get(node) match {
          case Some((f, thr)) =>
            (fv, y, if (fv(f - 1) <= thr) 2 * node else 2 * node + 1)
          case None => (fv, y, node)
        }
      }
    }
    all
  }

  test("t24 quantized-bucket path (>256 distinct values) matches the driver recompute") {
    import spark.implicits._
    // 600 docs with 600 DISTINCT word counts (50..649) — w (and dpm)
    // cross the 256-distinct identity bound, so the equal-frequency
    // bucket formula is the live path on BOTH the engine and this
    // recompute (the gate corpora only cross it for dpm at sf0.1)
    val voc = Seq("the", "a", "and", "of", "table", "row", "scan", "sort",
      "merge", "hash", "sketch", "probe")
    def long(n: Int, salt: Int): String =
      (0 until n).map(i => voc((i * 5 + salt) % voc.length)).mkString(" ")
    // every third doc is single-word spam (fails stopword + diversity
    // gates -> y=0) so the teacher signal is splittable; word counts
    // stay 600 distinct values either way
    val rows = (0 until 600).map { i =>
      val t = if (i % 3 == 0) Seq.fill(50 + i)("table").mkString(" ")
              else long(50 + i, i)
      (i.toLong, t)
    }
    val feats = rows.map(r => featrow(r._2))
    assert(feats.map(_._1(0)).distinct.size > 256,
      "fixture must cross the identity bound on w")
    assert(feats.map(_._2).distinct.size == 2,
      "fixture must carry both labels")
    val dir = java.nio.file.Files.createTempDirectory("t24qspec").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = engineRows(graft.SparkEntry.queries("t24_quality_classifier")(spark, dir))
      val (leaves, nSplits) = trainExpected(feats, 3)
      val correct = leaves.values.map { case (n, p) =>
        if (2 * p > n) p else n - p
      }.sum
      val tot = leaves.values.map(_._1).sum
      val accPpm = rhu(correct, tot, 1000000)
      val expected = leaves.toSeq.sortBy(_._1).map { case (node, (n, p)) =>
        (node, n, p, if (2 * p > n) 1L else 0L, accPpm, nSplits.toLong)
      }
      assert(out === expected)
      assert(nSplits >= 1, "the planted mix must be splittable")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("t26 persisted-model apply equals a fresh train; preds come from the artifact") {
    val sf = "/root/testdata/sf0.001"
    val dir = graft.operators.TreeModel.ensureBuilt(spark, sf)
    // artifact shape: bounded split/leaf tables with _SUCCESS markers
    assert(new java.io.File(dir, "splits/_SUCCESS").exists)
    assert(new java.io.File(dir, "leaves/_SUCCESS").exists)
    val nSplits = spark.read.parquet(s"$dir/splits").count()
    assert(nSplits <= 7)
    val fresh = graft.SparkEntry.queries("t24_quality_classifier")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val served = graft.SparkEntry.queries("t26_classifier_index")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(served === fresh)
  }

  test("t24 learns a planted single-threshold rule exactly") {
    import spark.implicits._
    // 40 docs: 20 short spam docs ("table" x (10+i): fail g1 word
    // count, fail g3 stopwords, fail g4 diversity -> 1 of 4, label 0)
    // and 20 long mixed docs (60+i words with stopwords: pass g1, g2,
    // g3 -> >= 3 of 4, label 1). Separable by a single threshold on
    // several features; the test asserts pure leaves, not which one.
    val voc = Seq("the", "a", "and", "of", "table", "row", "scan", "sort")
    def long(n: Int, salt: Int): String =
      (0 until n).map(i => voc((i * 3 + salt) % voc.length)).mkString(" ")
    val rows = (0 until 20).map(i => (i.toLong, Seq.fill(10 + i)("table").mkString(" "))) ++
      (20 until 40).map(i => (i.toLong, long(60 + i, i)))
    val dir = java.nio.file.Files.createTempDirectory("t24spec").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s0"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val (feats, labels) = rows.map(r => featrow(r._2)).unzip
      assert(labels.take(20).forall(_ == 0L) && labels.drop(20).forall(_ == 1L),
        s"fixture labels not separable as planted: $labels")
      val out = engineRows(graft.SparkEntry.queries("t24_quality_classifier")(spark, dir))
      // perfect accuracy, every leaf pure
      assert(out.forall(_._5 == 1000000L), s"expected pure distillation, got $out")
      assert(out.map(_._2).sum == 40L)
      // the recompute agrees on the exact leaf table too
      val (leaves, nSplits) = trainExpected(feats.zip(labels), 3)
      val accPpm = 1000000L
      val expected = leaves.toSeq.sortBy(_._1).map { case (node, (n, p)) =>
        (node, n, p, if (2 * p > n) 1L else 0L, accPpm, nSplits.toLong)
      }
      assert(out === expected)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
