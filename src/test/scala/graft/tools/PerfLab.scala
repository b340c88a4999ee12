package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch per-stage profiler for sf10 dashboard outliers (dev tool,
  * not part of the query surface). */
object PerfLab {
  def time(name: String)(f: => DataFrame): Unit = {
    // warm once, then best-of-3
    f.write.format("noop").mode("overwrite").save()
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[lab] $name%-40s ${ts.min}%8.3f s")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/data/sf10")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("perflab")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Q._

    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")

    time("scan_count")(ev.groupBy().agg(count(lit(1)).as("n")))

    time("inner_decimal") {
      ev.groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(
          round(sum(when(col("event_type").isin("click", "view"), dec(col("value"), 18, 4)))
            .cast(DoubleType) / 600, 6).cast(DecimalType(18, 6)).as("click_rate"),
          round(sum(when(col("event_type") === "error", dec(col("value"), 18, 4)))
            .cast(DoubleType) / 600, 6).cast(DecimalType(18, 6)).as("error_rate"))
        .groupBy().agg(count(lit(1)).as("n"))
    }

    time("inner_scaledlong") {
      ev.groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(
          round(sum(when(col("event_type").isin("click", "view"),
            graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
            .cast(DoubleType) / 10000 / 600, 6).cast(DecimalType(18, 6)).as("click_rate"),
          round(sum(when(col("event_type") === "error",
            graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
            .cast(DoubleType) / 10000 / 600, 6).cast(DecimalType(18, 6)).as("error_rate"))
        .groupBy().agg(count(lit(1)).as("n"))
    }

    time("inner_scaledlong_rawsum") {
      ev.groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(
          sum(when(col("event_type").isin("click", "view"),
            graft.functions.GraftFunctions.scaledLong(col("value"), 4))).as("cr"),
          sum(when(col("event_type") === "error",
            graft.functions.GraftFunctions.scaledLong(col("value"), 4))).as("er"))
        .groupBy().agg(count(lit(1)).as("n"))
    }

    time("inner_groups_only") {
      ev.groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .groupBy().agg(count(lit(1)).as("n"))
    }

    // the full current q01 vs scaled-long q01
    def outerAvg(rc: String) =
      fixedDec(rhu((sum(col(rc)) * lit(1000000L)).cast(LongType), count(col(rc)), 1), 6)

    time("q01_current") {
      val inner = ev
        .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(
          round(sum(when(col("event_type").isin("click", "view"), dec(col("value"), 18, 4)))
            .cast(DoubleType) / 600, 6).cast(DecimalType(18, 6)).as("click_rate"),
          round(sum(when(col("event_type") === "error", dec(col("value"), 18, 4)))
            .cast(DoubleType) / 600, 6).cast(DecimalType(18, 6)).as("error_rate"))
      val outer = inner.groupBy(col("user_id")).agg(
        outerAvg("click_rate").as("avg_click_rate"),
        outerAvg("error_rate").as("avg_error_rate"))
      outer
        .join(broadcast(cust), outer("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
        .orderBy(col("segment"), col("user_id"))
    }

    // scaled-long inner + long-μunit outer (exactness argued per stage)
    time("q01_scaledlong") {
      val inner = ev
        .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(
          round(sum(when(col("event_type").isin("click", "view"),
            graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
            .cast(DoubleType) / 10000 / 600, 6).cast(DecimalType(18, 6)).as("click_rate"),
          round(sum(when(col("event_type") === "error",
            graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
            .cast(DoubleType) / 10000 / 600, 6).cast(DecimalType(18, 6)).as("error_rate"))
      val outer = inner.groupBy(col("user_id")).agg(
        outerAvg("click_rate").as("avg_click_rate"),
        outerAvg("error_rate").as("avg_error_rate"))
      outer
        .join(broadcast(cust), outer("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
        .orderBy(col("segment"), col("user_id"))
    }

    // all-long q01: inner emits round6 DOUBLE rates, outer sums
    // scaledLong(rate, 6) — exactness: rate = k/1e6 exactly as the
    // nearest double; scaledLong recovers k while |k| < ~4.5e15
    time("q01_alllong") {
      def rate(c: Column) =
        round(sum(c).cast(DoubleType) / 10000 / 600, 6)
      val sl = (cond: Column) => when(cond,
        graft.functions.GraftFunctions.scaledLong(col("value"), 4))
      val inner = ev
        .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(
          rate(sl(col("event_type").isin("click", "view"))).as("click_rate"),
          rate(sl(col("event_type") === "error")).as("error_rate"))
      def avg6(rc: String) =
        fixedDec(rhu(sum(graft.functions.GraftFunctions.scaledLong(col(rc), 6)),
          count(col(rc)), 1), 6)
      val outer = inner.groupBy(col("user_id")).agg(
        avg6("click_rate").as("avg_click_rate"),
        avg6("error_rate").as("avg_error_rate"))
      outer
        .join(broadcast(cust), outer("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
        .orderBy(col("segment"), col("user_id"))
    }

    time("q04_alllong") {
      val inner = ev
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(round(sum(col("k")).cast(DoubleType) / 600, 9).as("kps"))
      inner.groupBy(col("user_id"))
        .agg(fixedDec(rhu(sum(graft.functions.GraftFunctions.scaledLong(col("kps"), 9)),
          count(col("kps")) * lit(1000L), 1), 6).as("avg_kps"))
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"), col("avg_kps"))
        .orderBy(col("segment"), col("user_id"))
    }

    // q04: json-extract cost isolated
    time("q04_json_only") {
      ev.withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy().agg(sum(col("k")).as("s"))
    }

    time("q04_from_json") {
      ev.withColumn("k", from_json(col("props"),
          StructType(Seq(StructField("k", LongType)))).getField("k"))
        .groupBy().agg(sum(col("k")).as("s"))
    }

    time("q04_variant") {
      ev.withColumn("k", expr("variant_get(parse_json(props), '$.k', 'bigint')"))
        .groupBy().agg(sum(col("k")).as("s"))
    }

    time("q04_current") {
      val inner = ev
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(round(sum(col("k")).cast(DoubleType) / 600, 9).cast(DecimalType(18, 9)).as("kps"))
      inner.groupBy(col("user_id"))
        .agg(fixedDec(rhu((sum(col("kps")) * lit(1000000000L)).cast(LongType),
          count(col("kps")) * lit(1000L), 1), 6).as("avg_kps"))
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"), col("avg_kps"))
        .orderBy(col("segment"), col("user_id"))
    }

    // bucketed-vs-plain q01 (set SPARK_GRAFT_LAB_BUCKETED=1)
    if (sys.env.get("SPARK_GRAFT_LAB_BUCKETED").contains("1")) {
      spark.conf.set("graft.layout.bucketed", "true")
      graft.etl.BucketedLayout.ensure(spark, sfDir)
      val evB = graft.Tables.load(spark, sfDir, "events")
      def q01Of(e: DataFrame): DataFrame = {
        def rate(cond: Column) =
          round(sum(when(cond, graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
            .cast(DoubleType) / 10000 / 600, 6)
        val inner = e
          .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
          .agg(rate(col("event_type").isin("click", "view")).as("click_rate"),
            rate(col("event_type") === "error").as("error_rate"))
        def avg6(rc: String) =
          fixedDec(rhu(sum(graft.functions.GraftFunctions.scaledLong(col(rc), 6)),
            count(col(rc)), 1), 6)
        val outer = inner.groupBy(col("user_id")).agg(
          avg6("click_rate").as("avg_click_rate"),
          avg6("error_rate").as("avg_error_rate"))
        outer.join(broadcast(cust), outer("user_id") === col("c_custkey"))
          .select(col("user_id"), col("c_mktsegment").as("segment"),
            col("avg_click_rate"), col("avg_error_rate"))
          .orderBy(col("segment"), col("user_id"))
      }
      time("q01_bucketed")(q01Of(evB))
      time("q01_plain")(q01Of(ev))
      println("=== bucketed plan ===")
      q01Of(evB).explain("formatted")
      println("=== plain plan ===")
      q01Of(ev).explain("formatted")
    }

    spark.stop()
  }
}
