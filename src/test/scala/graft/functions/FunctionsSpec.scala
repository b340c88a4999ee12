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
}
