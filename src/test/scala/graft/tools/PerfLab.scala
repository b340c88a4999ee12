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

    // q01 stage decomposition on the bucketed layout
    // (set SPARK_GRAFT_LAB_Q01STAGES=1)
    if (sys.env.get("SPARK_GRAFT_LAB_Q01STAGES").contains("1")) {
      spark.conf.set("graft.layout.bucketed", "true")
      graft.etl.BucketedLayout.ensure(spark, sfDir)
      val evB = graft.Tables.load(spark, sfDir, "events")
      def rate(cond: Column) =
        round(sum(when(cond, graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
          .cast(DoubleType) / 10000 / 600, 6)
      def inner = evB
        .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(rate(col("event_type").isin("click", "view")).as("click_rate"),
          rate(col("event_type") === "error").as("error_rate"))
      def avg6(rc: String) =
        fixedDec(rhu(sum(graft.functions.GraftFunctions.scaledLong(col(rc), 6)),
          count(col(rc)), 1), 6)
      def outer = inner.groupBy(col("user_id")).agg(
        avg6("click_rate").as("avg_click_rate"),
        avg6("error_rate").as("avg_error_rate"))
      time("s1_scan_only")(evB.groupBy().agg(count(lit(1)).as("n")))
      time("s2_bucket_expr_only")(evB
        .select(bucket(col("ts"), 600).as("b"), col("user_id"))
        .groupBy().agg(sum(col("b")).as("s"), sum(col("user_id")).as("u")))
      time("s3_inner_agg")(inner.groupBy().agg(count(lit(1)).as("n")))
      time("s4_outer_agg")(outer.groupBy().agg(count(lit(1)).as("n")))
      time("s5_join_smj")(outer
        .join(cust, col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"))
        .groupBy().agg(count(lit(1)).as("n")))
      time("s5_join_bcast")(outer
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"))
        .groupBy().agg(count(lit(1)).as("n")))
      time("s6_full_smj")(outer
        .join(cust, col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
        .orderBy(col("segment"), col("user_id")))
      time("s6_full_bcast")(outer
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
        .orderBy(col("segment"), col("user_id")))
    }

    // q01 join/sort variants (set SPARK_GRAFT_LAB_Q01VAR=1)
    if (sys.env.get("SPARK_GRAFT_LAB_Q01VAR").contains("1")) {
      spark.conf.set("graft.layout.bucketed", "true")
      graft.etl.BucketedLayout.ensure(spark, sfDir)
      val evB = graft.Tables.load(spark, sfDir, "events")
      def rate(cond: Column) =
        round(sum(when(cond, graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
          .cast(DoubleType) / 10000 / 600, 6)
      def inner = evB
        .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
        .agg(rate(col("event_type").isin("click", "view")).as("click_rate"),
          rate(col("event_type") === "error").as("error_rate"))
      def avg6(rc: String) =
        fixedDec(rhu(sum(graft.functions.GraftFunctions.scaledLong(col(rc), 6)),
          count(col(rc)), 1), 6)
      def outer = inner.groupBy(col("user_id")).agg(
        avg6("click_rate").as("avg_click_rate"),
        avg6("error_rate").as("avg_error_rate"))
      val segMap = cust.select(col("c_custkey"), col("c_mktsegment"))
      def joined(o: DataFrame) = o
        .join(broadcast(segMap), col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
      time("v1_bcast2col_sort")(joined(outer).orderBy(col("segment"), col("user_id")))
      time("v2_bcast2col_ckpt_sort") {
        val j = joined(outer).localCheckpoint(true)
        j.orderBy(col("segment"), col("user_id"))
      }
      time("v3_smj_ckpt_sort") {
        val j = outer.join(cust, col("user_id") === col("c_custkey"))
          .select(col("user_id"), col("c_mktsegment").as("segment"),
            col("avg_click_rate"), col("avg_error_rate"))
          .localCheckpoint(true)
        j.orderBy(col("segment"), col("user_id"))
      }
      time("v4_bcast2col_nosort")(joined(outer)
        .groupBy().agg(count(lit(1)).as("n")))
      // customer served bucketed by c_custkey (facts map) → co-located
      // SMJ, and the join output is re-materialized as a hash-shuffle
      // stage so the range sampler reads shuffle files
      val custB = graft.Tables.load(spark, sfDir, "customer")
      def joinedB = outer.join(custB, col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
      time("v5_smj_reshuffle_sort")(outer
        .join(cust, col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
        .repartition(col("segment"), col("user_id"))
        .orderBy(col("segment"), col("user_id")))
      time("v6_bktcust_sort")(joinedB.orderBy(col("segment"), col("user_id")))
      time("v7_bktcust_reshuffle_sort")(joinedB
        .repartition(col("segment"), col("user_id"))
        .orderBy(col("segment"), col("user_id")))
      time("v8_bktcust_nosort")(joinedB.groupBy().agg(count(lit(1)).as("n")))
      def joinedB2 = outer
        .join(custB.repartition(col("c_custkey")), col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
      time("v9_bktcust_rt_reshuffle_sort")(joinedB2
        .repartition(col("segment"), col("user_id"))
        .orderBy(col("segment"), col("user_id")))
      def joinedB3 = outer
        .join(custB.hint("merge"), col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
      time("v10_bktcust_merge_reshuffle_sort")(joinedB3
        .repartition(col("segment"), col("user_id"))
        .orderBy(col("segment"), col("user_id")))
      println("=== v10 plan ===")
      joinedB3.repartition(col("segment"), col("user_id"))
        .orderBy(col("segment"), col("user_id")).explain()
      println("=== v5 plan ===")
      outer.join(cust, col("user_id") === col("c_custkey"))
        .select(col("user_id"), col("c_mktsegment").as("segment"),
          col("avg_click_rate"), col("avg_error_rate"))
        .repartition(col("segment"), col("user_id"))
        .orderBy(col("segment"), col("user_id")).explain()
      println("=== v7 plan ===")
      joinedB.repartition(col("segment"), col("user_id"))
        .orderBy(col("segment"), col("user_id")).explain()
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
