package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: stage decomposition of the q01/q04 dashboard residual
  * at a data-bound SF (the per-action floor table). */
object Q01Lab {
  def time(name: String)(f: => DataFrame): Double = {
    f.write.format("noop").mode("overwrite").save()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[lab] $name%-44s ${ts.min}%8.3f s")
    ts.min
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .appName("q01lab")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("graft.layout.bucketed", "true")
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Q._
    def ev = graft.Tables.load(spark, d, "events")
    def cust = graft.Tables.load(spark, d, "customer")

    time("scan only (value col)")(ev.select(col("value")).groupBy().sum("value"))
    time("scan + ts bucket")(
      ev.select(bucket(col("ts"), 600).as("b")).groupBy().agg(max("b")))
    def rate(cond: org.apache.spark.sql.Column) =
      round(sum(when(cond, graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
        .cast(DoubleType) / 10000 / 600, 6)
    val inner = ev
      .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
      .agg(
        rate(col("event_type").isin("click", "view")).as("click_rate"),
        rate(col("event_type") === "error").as("error_rate"))
    time("inner agg (user,bucket)")(inner.groupBy().agg(sum("click_rate"), sum("error_rate")))
    def outerAvg(rc: String) =
      fixedDec(rhu(sum(graft.functions.GraftFunctions.scaledLong(col(rc), 6)),
        count(col(rc)), 1), 6)
    val outer = inner.groupBy(col("user_id")).agg(
      outerAvg("click_rate").as("avg_click_rate"),
      outerAvg("error_rate").as("avg_error_rate"))
    time("+ outer agg (user)")(outer.groupBy().agg(sum("avg_click_rate"), sum("avg_error_rate")))
    val joined = outer
      .join(cust.hint("merge"), outer("user_id") === col("c_custkey"))
      .select(col("user_id"), col("c_mktsegment").as("segment"),
        col("avg_click_rate"), col("avg_error_rate"))
    time("+ customer merge join")(joined.groupBy().agg(sum("avg_click_rate"), count(lit(1))))
    time("+ staged sort (full q01)")(
      joined.repartition(col("segment"), col("user_id"))
        .orderBy(col("segment"), col("user_id")))
    time("full q01 via entry")(
      graft.SparkEntry.queries("q01_rate_avg_2level")(spark, d))
    time("full q04 via entry")(
      graft.SparkEntry.queries("q04_flow_avg_json")(spark, d))
    println(s"[lab] events rows = ${ev.count()}; inner groups = ${inner.count()}; users = ${inner.select("user_id").distinct().count()}")
    // EXPERIMENT: single packed-long inner key (user_id << 32 | bucketIdx)
    val pk = (shiftleft(col("user_id"), 32) +
      floor(unix_timestamp(col("ts")) / 600).cast(LongType)).as("pk")
    val inner2 = ev
      .select(pk, col("value"), col("event_type"))
      .groupBy(col("pk"))
      .agg(
        rate(col("event_type").isin("click", "view")).as("click_rate"),
        rate(col("event_type") === "error").as("error_rate"))
    time("inner agg PACKED key")(inner2.groupBy().agg(sum("click_rate"), sum("error_rate")))
    val outer2 = inner2
      .withColumn("user_id", shiftright(col("pk"), 32))
      .groupBy(col("user_id")).agg(
      outerAvg("click_rate").as("avg_click_rate"),
      outerAvg("error_rate").as("avg_error_rate"))
    time("+ outer agg PACKED")(outer2.groupBy().agg(sum("avg_click_rate"), sum("avg_error_rate")))
    val joined2 = outer2
      .join(cust.hint("merge"), outer2("user_id") === col("c_custkey"))
      .select(col("user_id"), col("c_mktsegment").as("segment"),
        col("avg_click_rate"), col("avg_error_rate"))
    time("full q01 PACKED")(
      joined2.repartition(col("segment"), col("user_id"))
        .orderBy(col("segment"), col("user_id")))
    // json probe cost alone
    time("scan + json k probe")(
      ev.select(graft.functions.GraftFunctions.jsonGetLong(col("props"), "k").as("k"))
        .groupBy().sum("k"))
  }
}
