package graft.plans

import graft.etl.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def idiom(k: Int): DataFrame = {
    import spark.implicits._
    val rnd = new java.util.Random(41L)
    val df = (0 until 20000).map(i =>
      (s"g${i % 3}", rnd.nextDouble() * 100, i.toLong)).toDF("g", "score", "id")
    val w = Window.partitionBy("g").orderBy(desc("score"), col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations = Seq(TopKRewrite)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

  private def windowNodes(df: DataFrame) =
    df.queryExecution.optimizedPlan.collect { case w: LogicalWindow => w }

  test("rewrites row_number()<=k window-filter into the bounded top-k aggregate") {
    val expected = idiom(5).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
    withRule {
      val df = idiom(5)
      val plan = df.queryExecution.optimizedPlan.toString
      // no Window NODE left (Spark's own WindowGroupLimit pre-filter
      // below the aggregate is kept — it's a free candidate reducer)
      assert(windowNodes(df).isEmpty, plan.take(800))
      assert(plan.contains("topkbyscore"), plan.take(800))
      val got = df.collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getInt(3))).toSet
      assert(got == expected)
      assert(got.size == 15) // 3 groups × 5
    }
  }

  test("NaN and -0.0 scores rank identically to the window plan") {
    import spark.implicits._
    // NaN sorts greatest (rn=1 under DESC), -0.0 ties with 0.0 and
    // falls to the id tiebreak — Spark's double ordering on both paths
    val df = Seq(
      ("g", Double.NaN, 1L), ("g", 5.0, 2L), ("g", -0.0, 3L),
      ("g", 0.0, 4L), ("g", 5.0, 5L), ("g", -1.0, 6L)).toDF("g", "score", "id")
    val w = Window.partitionBy("g").orderBy(desc("score"), col("id"))
    def run(): Seq[(Long, Int)] =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
        .select(col("id"), col("rn")).collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._2).toSeq
    val unrewritten = run()
    val rewritten = withRule {
      val d = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      assert(windowNodes(d).isEmpty)
      run() // re-plan inside the rule scope
    }
    assert(rewritten == unrewritten)
    assert(unrewritten.head == (1L, 1)) // the NaN row ranks first
  }

  test("multiple NaN scores: tiebreak still applies, matching the window plan") {
    import spark.implicits._
    // ≥2 NaN rows per group across several partitions: the window plan
    // orders NaN ties by id; the aggregate's comparator must treat
    // NaN==NaN as equal (Double.compare) or the kept rows depend on
    // encounter/merge order
    val rows = Seq(
      ("g", Double.NaN, 7L), ("g", Double.NaN, 2L), ("g", Double.NaN, 9L),
      ("g", Double.NaN, 4L), ("g", 99.0, 1L), ("g", 1.0, 3L),
      ("h", Double.NaN, 12L), ("h", Double.NaN, 11L), ("h", 5.0, 10L))
    val df = spark.sparkContext.parallelize(rows, 4).toDF("g", "score", "id")
    val w = Window.partitionBy("g").orderBy(desc("score"), col("id"))
    def run(): Seq[(String, Long, Int)] =
      df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("g"), col("id"), col("rn")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._3)).toSeq
    val unrewritten = run()
    val rewritten = withRule {
      val d = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      assert(windowNodes(d).isEmpty)
      run()
    }
    assert(rewritten == unrewritten)
    // NaN rows rank first, ordered among themselves by ascending id
    assert(unrewritten.filter(_._1 == "g").map(_._2) == Seq(2L, 4L, 7L))
    assert(unrewritten.filter(_._1 == "h").map(_._2) == Seq(11L, 12L, 10L))
  }

  test("nullable score/tie columns: rewrite fires and nulls rank as the window ranks them") {
    import spark.implicits._
    val rnd = new java.util.Random(43L)
    // nullable columns (Option encoding) with real nulls, -Inf collisions
    // (a null-as--Inf shortcut would interleave them wrongly) and null ties
    val rows = (0 until 8000).map { i =>
      val score: Option[Double] =
        if (i % 7 == 0) None
        else if (i % 11 == 0) Some(Double.NegativeInfinity)
        else Some(rnd.nextDouble() * 10)
      val id: Option[Long] = if (i % 13 == 0) None else Some(i.toLong)
      (s"g${i % 4}", score, id)
    }
    val df = rows.toDF("g", "score", "id")
    assert(df.schema("score").nullable && df.schema("id").nullable)
    val w = Window.partitionBy("g").orderBy(desc("score"), col("id"))
    def run() = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 9)
    def canon(d: DataFrame) = d.collect().map(r =>
      (r.getString(0), Option(r.get(1)), Option(r.get(2)), r.getInt(3))).toSet
    val windowed = canon(run()) // no rule: the window plan is the truth
    withRule {
      // nullable columns need the explicit profitability opt-in
      // (raw-scan columns usually mean high group cardinality — see
      // the rule scaladoc); without it the window plan is kept
      assert(windowNodes(run()).nonEmpty)
      spark.conf.set("spark.graft.topkRewrite.acceptNullable", "true")
      try {
        val rewritten = run()
        assert(windowNodes(rewritten).isEmpty,
          rewritten.queryExecution.optimizedPlan.toString.take(800))
        assert(canon(rewritten) == windowed)
      } finally spark.conf.unset("spark.graft.topkRewrite.acceptNullable")
    }
  }

  test("bails out when the guard conditions do not hold") {
    import spark.implicits._
    withRule {
      // k too large → keep the window plan
      assert(windowNodes(idiom(5000)).nonEmpty)
      // ascending score → not the top-k shape → keep the window plan
      val df = (0 until 100).map(i => (s"g${i % 2}", i.toDouble, i.toLong))
        .toDF("g", "score", "id")
      val w = Window.partitionBy("g").orderBy(col("score"), col("id"))
      val asc = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      assert(windowNodes(asc).nonEmpty)
    }
  }
}
