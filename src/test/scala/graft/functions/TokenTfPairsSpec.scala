package graft.functions

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The tf-pair kernels must be value-identical (as multisets) to the
  * exploded split/filter/group forms they replace. */
class TokenTfPairsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def refWords(text: String): Map[String, Long] =
    text.split(" ", -1).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => w -> g.length.toLong }

  private def refBigrams(text: String): Map[String, Long] = {
    val toks = text.split(" ", -1)
    toks.sliding(2).filter(_.length == 2).map(p => p(0) + " " + p(1))
      .toSeq.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
  }

  private def refNgrams(text: String, n: Int): Map[String, Long] = {
    val toks = text.split(" ", -1)
    toks.sliding(n).filter(_.length == n).map(_.mkString(" "))
      .toSeq.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
  }

  private def viaKernel(text: String, ng: Int): Map[String, Long] = {
    val arr = TokenTfPairs.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(text), ng)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      r.getUTF8String(0).toString -> r.getLong(1)
    }.toMap
  }

  private def refCharBigrams(text: String): Map[String, Long] = {
    // code-point pairs (the kernel contract)
    val cps = text.codePoints().toArray
      .map(cp => new String(Character.toChars(cp)))
    cps.sliding(2).filter(_.length == 2).map(_.mkString)
      .toSeq.groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }
  }

  private def viaCharKernel(text: String): Map[String, Long] = {
    val arr = TokenTfPairs.computeCharBigrams(
      org.apache.spark.unsafe.types.UTF8String.fromString(text))
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 2)
      r.getUTF8String(0).toString -> r.getLong(1)
    }.toMap
  }

  test("char-bigram hand cases") {
    for (t <- Seq("", " ", "a", "ab", "aba", "aa aa", "abcabc",
      "éüé", "日本語日本", "mississippi", "a b"))
      assert(viaCharKernel(t) == refCharBigrams(t), s"char bigrams <$t>")
  }

  test("char-bigram randomized sweep") {
    val rnd = new Random(7)
    val alpha = "ab cdé日ÿ"
    for (_ <- 1 to 2000) {
      val t = (1 to rnd.nextInt(40))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      assert(viaCharKernel(t) == refCharBigrams(t), s"char bigrams <$t>")
    }
  }

  test("hand cases") {
    for (t <- Seq("", " ", "a", "a a b", "a  b", " x y x ", "é ü é",
      "w w w w", "one two one two three")) {
      assert(viaKernel(t, 1) == refWords(t), s"words <$t>")
      assert(viaKernel(t, 2) == refBigrams(t), s"bigrams <$t>")
      assert(viaKernel(t, 3) == refNgrams(t, 3), s"trigrams <$t>")
    }
  }

  test("randomized sweep") {
    val rnd = new Random(3)
    val vocab = Array("a", "bb", "ccc", "é", "日本", "", "x")
    for (_ <- 1 to 2000) {
      val t = (1 to rnd.nextInt(25))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      assert(viaKernel(t, 1) == refWords(t), s"words <$t>")
      assert(viaKernel(t, 2) == refBigrams(t), s"bigrams <$t>")
      assert(viaKernel(t, 3) == refNgrams(t, 3), s"trigrams <$t>")
    }
  }

  test("DataFrame explode of the kernel equals the exploded groupBy") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(17)
    val vocab = Array("key", "agg", "row", "scan", "", "fast")
    val docsDf = (1L to 150L).map { id =>
      (id, (1 to rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val viaK = docsDf.select(col("doc_id"),
      explode(GraftFunctions.wordTfPairs(col("text"))).as("p"))
      .select(col("doc_id"), col("p.t"), col("p.c"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaE = docsDf
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaK == viaE)
  }

  test("trigram kernel explode equals the split/slice/array_join form") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(23)
    val vocab = Array("key", "agg", "row", "", "scan")
    val docsDf = (1L to 150L).map { id =>
      (id, (1 to rnd.nextInt(30)).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    val viaK = docsDf.select(col("doc_id"),
      explode(GraftFunctions.trigramTfPairs(col("text"))).as("p"))
      .select(col("doc_id"), col("p.t"), col("p.c"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    val viaE = docsDf
      .withColumn("ws", split(col("text"), " "))
      .select(col("doc_id"), explode(expr(
        "transform(slice(sequence(1, size(ws)), 1, greatest(size(ws) - 2, 0)), " +
          "p -> array_join(slice(ws, p, 3), ' '))")).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaK == viaE)
  }

  test("word_count equals the higher-order fold over word_tf_pairs") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new Random(29)
    val vocab = Array("a", "bb", "", "ccc", "é", "x")
    val texts = Seq("", " ", "a", "a  b", " x y x ", "a\tb") ++
      (1 to 300).map(_ => (1 to rnd.nextInt(20))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(col("id"), GraftFunctions.wordCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.select(col("id"),
        aggregate(GraftFunctions.wordTfPairs(col("text")), lit(0L),
          (acc, p) => acc + p("c")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
