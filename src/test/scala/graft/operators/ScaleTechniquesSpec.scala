package graft.operators

import graft.etl.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleTechniquesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of big rows share one hot key
    val big = (0 until 20000).map(i =>
      (if (i % 10 == 0) s"k${i % 100}" else "HOT", i.toLong)).toDF("k", "v")
    val small = (0 until 100).map(i => (s"k$i", s"dim$i")).toDF("k", "d")
      .union(Seq(("HOT", "dimHot")).toDF("k", "d"))
    val expected = big.join(small, "k")
    val got = SaltedJoin.inner(big, small, "k", salts = 8)
    assert(got.count() == expected.count())
    assert(got.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      expected.groupBy("k").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  test("bucketed tables co-locate the join: no shuffle exchange") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (0 until 10000).map(i => (i.toLong, i * 2.0)).toDF("id", "x")
      val b = (0 until 10000).map(i => (i.toLong, s"n$i")).toDF("id", "nm")
      a.write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("bkt_a")
      b.write.mode("overwrite").bucketBy(8, "id").sortBy("id").saveAsTable("bkt_b")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // both sides are bucketed on the join key: sort-merge join with
      // NO shuffle exchange in the plan
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}
