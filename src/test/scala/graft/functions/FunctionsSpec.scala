package graft.functions

import graft.rtcm.Crc24q
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = graft.etl.SparkTestSession.spark

  test("VectorDot/VectorNorm are bit-identical to the interpreted fold") {
    import spark.implicits._
    val rnd = new java.util.Random(21)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f), Array.fill(64)(rnd.nextFloat() - 0.5f))
    }
    val df = spark.createDataset(rows).toDF("id", "a", "b")
      .withColumn("dot_native", GraftFunctions.vectorDot(col("a"), col("b")))
      .withColumn("dot_fold", expr(
        "aggregate(zip_with(transform(a, x -> cast(x as double)), transform(b, x -> cast(x as double)), (p, q) -> p * q), 0D, (acc, t) -> acc + t)"))
      .withColumn("norm_native", GraftFunctions.vectorNorm(col("a")))
      .withColumn("norm_fold", expr(
        "sqrt(aggregate(transform(a, x -> cast(x as double)), 0D, (acc, t) -> acc + t * t))"))
    val bad = df.filter(col("dot_native") =!= col("dot_fold") ||
      col("norm_native") =!= col("norm_fold")).count()
    assert(bad == 0)
  }

  test("crc24q expression equals the codec LUT implementation") {
    import spark.implicits._
    val rnd = new java.util.Random(33)
    val blobs = (0 until 100).map { i =>
      val b = new Array[Byte](1 + rnd.nextInt(300)); rnd.nextBytes(b); (i, b)
    }
    val got = spark.createDataset(blobs).toDF("i", "b")
      .select(col("i"), GraftFunctions.crc24q(col("b")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    blobs.foreach { case (i, b) => assert(got(i) == Crc24q.compute(b)) }
  }

  test("rolling_hash64 expression matches compute() and is order-sensitive") {
    import spark.implicits._
    val df = Seq("abc", "cba", "", "hello world").toDF("s")
      .select(col("s"), GraftFunctions.rollingHash64(col("s")).as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("abc") == RollingHash64.compute("abc".getBytes("UTF-8")))
    assert(m("abc") != m("cba"))
    assert(m("") == 1469598103934665603L)
  }

  test("SQL registration: functions callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d, " +
        "vector_norm(array(3.0D, 4.0D)) AS n, " +
        "rolling_hash64('x') AS h, crc24q(cast('x' as binary)) AS c").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 5.0)
    assert(r.getLong(2) == RollingHash64.compute("x".getBytes))
    assert(r.getInt(3) == Crc24q.compute("x".getBytes))
  }

  test("codegen actually engages (no fallback) for a wide scan") {
    import spark.implicits._
    val rnd = new java.util.Random(5)
    val df = spark.createDataset((0 until 10000).map(i =>
        (i.toLong, Array.fill(64)(rnd.nextFloat())))).toDF("id", "v")
      .select(sum(GraftFunctions.vectorNorm(col("v"))).as("s"))
    assert(df.collect()(0).getDouble(0) > 0)
  }

  test("BPE pre-tokenizer matches hand-tokenized GPT-2-pattern examples") {
    import spark.implicits._
    import graft.functions.TextTokens
    // hand-worked against the published GPT-2 pattern semantics
    assert(TextTokens.tokens("Hello world") == Vector("Hello", " world"))
    assert(TextTokens.tokens("don't stop") == Vector("don", "'t", " stop"))
    assert(TextTokens.tokens("I'll pay $5.50!") ==
      Vector("I", "'ll", " pay", " $", "5", ".", "50", "!"))
    assert(TextTokens.tokens("a  b") == Vector("a", " ", " b")) // residual ws before non-ws
    assert(TextTokens.tokens("tail  ") == Vector("tail", "  ")) // trailing ws run
    assert(TextTokens.tokens("") == Vector())
    assert(TextTokens.count("Hello world") == 2L)
    // Unicode whitespace behaves as \s (UNICODE_CHARACTER_CLASS —
    // Java's default ASCII \s would merge the NBSP into the
    // punctuation run, diverging from the published pattern)
    assert(TextTokens.tokens("a !b") == Vector("a", " ", "!", "b"))
    // the column expression agrees with the Scala tokenizer
    val rows = Seq("Hello world", "don't stop", "I'll pay $5.50!", "", "x y z")
      .toDF("s")
      .select(col("s"), GraftFunctions.bpeTokenCount(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (s, n) => assert(n == TextTokens.count(s), s) }
    // and from SQL
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT bpe_token_count('don''t stop') AS n")
      .collect()(0).getLong(0) == 3L)
  }

  test("scaledLong equals round(x*10^s, 0).cast(long) on adversarial values") {
    import spark.implicits._
    val adversarial = Seq(
      0.0, -0.0, 1.0, -1.0, 2.5, -2.5, 3.5, -3.5,
      0.5, -0.5, 0.05, -0.05, 0.049999999999999994, // binade-crossing bug value /10
      0.49999999999999994, -0.49999999999999994,
      0.0009765625, -0.0009765625,                  // exact 2^-10: *1e4 has no tie, *1e9 does
      976562.5e-9, 12345.6789, -98765.4321,
      4.9999999999999996, 5.000000000000001,
      1.0e-12, -1.0e-12, 4.0e8, -4.0e8, 123456789.123)
    val rnd = new java.util.Random(11)
    val vals = adversarial ++ Seq.fill(20000)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(9) - 4))
    Seq(2, 4, 9).foreach { s =>
      val df = vals.toDF("x").select(
        GraftFunctions.scaledLong(col("x"), s).as("fast"),
        round(col("x") * math.pow(10, s), 0).cast("long").as("ref"))
      val bad = df.filter(col("fast") =!= col("ref")).collect()
      assert(bad.isEmpty, s"scale $s: ${bad.take(3).mkString(",")}")
    }
    // interpreted path (ScaledLong.round) agrees with the codegen path
    adversarial.foreach { x =>
      Seq(2, 4, 9).foreach { s =>
        val y = x * math.pow(10, s)
        assert(ScaledLong.round(y) == ScaledLong.roundSlow(y), s"x=$x s=$s")
      }
    }
    // non-finite inputs raise, exactly like ANSI round+cast does
    // (silent 0 would corrupt exact aggregates)
    Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity).foreach { x =>
      intercept[Exception] {
        Seq(x).toDF("x").select(round(col("x") * 100, 0).cast("long")).collect()
      }
      intercept[Exception] {
        Seq(x).toDF("x").select(GraftFunctions.scaledLong(col("x"), 2)).collect()
      }
      intercept[ArithmeticException] { ScaledLong.round(x) }
    }
  }

  test("VectorScaledLongSum equals per-element SUM of scaledLong") {
    import spark.implicits._
    val rnd = new java.util.Random(23)
    val df = spark.createDataset((0 until 2000).map(i =>
      (i % 7, Array.fill(16)(rnd.nextGaussian().toFloat)))).toDF("g", "v")
    val fused = df.groupBy(col("g"))
      .agg(GraftFunctions.vectorScaledSum(col("v"), 16, 9).as("sums"))
      .select(col("g"), posexplode(col("sums")).as(Seq("i", "s")))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val unfused = df.groupBy(col("g"))
      .agg((0 until 16).map(i => sum(
        GraftFunctions.scaledLong(col("v").getItem(i).cast("double"), 9)).as(s"s_$i")).head,
        (1 until 16).map(i => sum(
          GraftFunctions.scaledLong(col("v").getItem(i).cast("double"), 9)).as(s"s_$i")): _*)
      .collect().flatMap(r => (0 until 16).map(i => (r.getInt(0), i) -> r.getLong(1 + i))).toMap
    assert(fused == unfused)
  }

  test("ArgMaxCosine equals the transform+array_position form, incl. duplicate-centroid ties") {
    import spark.implicits._
    val rnd = new java.util.Random(77)
    val rows = (0 until 500).map(i => (i.toLong, Array.fill(32)(rnd.nextDouble() - 0.5)))
    // duplicate the FIRST centroid at the end: the max is attained at
    // two indices and both forms must pick the first
    val base = Array.fill(7)(Array.fill(32)(rnd.nextDouble() - 0.5))
    val cents = base :+ base(0).clone()
    val centsLit = typedLit(cents.map(_.toIndexedSeq).toIndexedSeq)
    val df = spark.createDataset(rows).toDF("id", "v")
      .withColumn("native", GraftFunctions.argMaxCosine(col("v"), cents))
      .withColumn("hof", {
        val sims = transform(centsLit, c => GraftFunctions.cosineSimilarity(col("v"), c))
        (array_position(sims, array_max(sims)) - 1).cast("long")
      })
    val mismatch = df.filter(col("native") =!= col("hof")).count()
    assert(mismatch == 0)
    // tie rows exist in spirit: force one exact-duplicate query vector
    val tieDf = spark.createDataset(Seq((0L, cents(0))))
      .toDF("id", "v")
      .withColumn("native", GraftFunctions.argMaxCosine(col("v"), cents))
    // cos(v, c0) == cos(v, c7) == 1 exactly → first index wins
    assert(tieDf.collect().head.getLong(2) == 0L)
  }
}
