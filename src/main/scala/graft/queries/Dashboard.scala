package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's 16-query dashboard surface (SURVEY.md §2.3, Q1–Q16 —
  * `initgrafana/dashboards/RTCM monitor.json`, `Disturbances.json`),
  * re-expressed over the driver test tables: `events` plays the
  * time-series fact (`rtcm_packages`: ts→receive_time, user_id→
  * mountpoint, event_type→rtcm_msg_type class, value→sat_count/size),
  * `customer`/`nation` play the station-metadata dimensions
  * (`sourcetable_constants`).
  *
  * Scale notes (100 TB): every query is a partial+final hash aggregate
  * over the fact with at most one shuffle on the grouping key; the
  * O(#stations) dimensions (nation, the 1-row max) are explicit
  * `broadcast()`, while `customer` is a SEMI-dimension that grows with
  * the corpus (1.5 M rows at sf10, where the driver-side broadcast
  * build alone cost ~1.4 s/query) — its joins are UNHINTED so AQE
  * broadcasts while it fits and shuffles only the dim beyond that (the
  * fact side never moves: it already carries HashPartitioning(user_id)
  * from the bucketed layout); "latest per key" is a window dedup that
  * shuffles once on the key. Big ordered timeseries outputs (q02, q05,
  * q09) range-partition the INPUT on the output key instead of
  * `orderBy` on the result: a global sort's range sampling re-executes
  * its child, and when the child is the whole exchange-free
  * scan+aggregate pipeline that doubles the query (measured q05 sf10:
  * 3.08 s → 2.10 s); range partitioning clusters (bucket, user) just
  * like hash, so the aggregate stays exchange-free and the
  * partition-local sort yields the same total order. The choice is
  * COST-BASED (orderedOut): below a scanned-bytes threshold the
  * result is small and the plain orderBy wins.
  */
object Dashboard extends QueryModule {
  import Q._

  private def ev(s: SparkSession, d: String) = Tables.load(s, d, "events")
  private def cust(s: SparkSession, d: String) = Tables.load(s, d, "customer")

  /** Cost-based ordered-timeseries output (q02/q05/q09). Above
    * `rangeInputMinBytes` of scanned fact bytes, range-partition the
    * INPUT on the output key — the aggregate stays exchange-free and
    * the partition-local sort yields the total order (module scaladoc;
    * measured q05 sf10: 3.08 s → 2.10 s). Below it the aggregate
    * result is small and repartitionByRange's range sampling — which
    * re-executes the scan plus any per-row kernel — costs more than
    * the plain result orderBy it replaces (the round-10 cold-sf0.1
    * regression). The stat is the optimized plan's file-index
    * sizeInBytes: driver-side parquet metadata, no job; filters
    * don't shrink it without CBO, which errs toward the scale-safe
    * plan. */
  private def orderedOut(in: DataFrame, k1: Column, k2: Column,
      outCols: Seq[String] = Seq("bucket", "user_id"))
      (aggOf: DataFrame => DataFrame): DataFrame =
    // outCols must be the OUTPUT names of (k1, k2): the input range
    // partition co-locates by the keys, the final sort names the
    // aggregate's columns for them
    if (bigInput(in))
      aggOf(in.repartitionByRange(k1, k2))
        .sortWithinPartitions(outCols.head, outCols.tail: _*)
    else aggOf(in).orderBy(outCols.head, outCols.tail: _*)

  /** Global sort of a MUCH-SMALLER-than-input result (q01/q04: the
    * per-user aggregate ⋈ dimension, ≤|customer| rows) whose pipeline
    * is expensive to run twice. A bare orderBy's RangePartitioning
    * sampling job re-executes the child — here the whole exchange-free
    * two-level aggregate plus the customer merge join (measured sf10:
    * the sort alone pays ~0.7 s of q01's 1.29 s). Re-materializing the
    * bounded result as a hash-shuffle stage first means the sampler
    * (and the final range exchange) read shuffle files instead:
    * measured sf10 q01 1.29 s → 0.91 s. The extra exchange ships only
    * the aggregate output, so it scales with |customer|, not the fact.
    * Below the same input-stats threshold as orderedOut the result is
    * tiny and the extra stage is pure overhead — plain orderBy. */
  private def sortedSmallOut(big: Boolean, out: DataFrame,
      keys: Column*): DataFrame =
    if (big) out.repartition(keys: _*).orderBy(keys: _*)
    else out.orderBy(keys: _*)

  /** The customer dimension for a big-input join, per the
    * semi-dimension rule (never build the dimension on the driver —
    * the form that survives customer outgrowing it). When customer is
    * served from the bucketed layout its catalog table carries
    * row-count stats, and the planner estimates the pruned 2-3 column
    * projection under the broadcast threshold — silently flipping the
    * join to a 1.5 M-row driver broadcast build (measured sf10 q01:
    * 1.28 s SMJ → 1.66 s BHJ). The merge hint pins the sort-merge
    * form; against the bucketed layout that join is CO-LOCATED (both
    * sides HashPartitioning(key, 32), customer pre-sorted by the
    * sorted-bucket-scan flag): zero exchanges, measured q01 0.73 s. */
  private def custDim(s: SparkSession, d: String, big: Boolean): DataFrame =
    if (big) cust(s, d).hint("merge") else cust(s, d)

  // Q1 analog: 2-level agg — per-(user, 10 min bucket) filtered-CASE
  // rates, then per-user average, broadcast-joined to the dimension.
  // Ref: "Satellite count average", RTCM monitor.json:126.
  private def q01(s: SparkSession, d: String): DataFrame = {
    // ALL-LONG two-level plan (sf10: 5.1 s → 2.1 s vs the decimal
    // form). Value-identity with the decimal oracle, stage by stage:
    //  - inner sum: Σ scaledLong(value,4) = 10⁴·Σ CAST(value AS
    //    DECIMAL(18,4)) exactly (ScaledLong ≡ the per-value half-up
    //    cast; both are integer arithmetic);
    //  - the rate double: CAST(S AS DOUBLE)/10⁴ is the correctly-
    //    rounded double of S/10⁴ (S exact in double for |S| < 2⁵³) =
    //    CAST(decimal-sum AS DOUBLE); the subsequent /600 and
    //    round(·,6) then operate on the identical double;
    //  - outer sum: round6 emits k/10⁶ as its nearest double, and
    //    scaledLong(·,6) recovers the integer k exactly while
    //    |k| < ~4.5e15 — so Σ long = (SUM(decimal)·10⁶) exactly.
    def rate(cond: Column) =
      round(sum(when(cond, graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
        .cast(DoubleType) / 10000 / 600, 6)
    val inner = ev(s, d)
      .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
      .agg(
        rate(col("event_type").isin("click", "view")).as("click_rate"),
        rate(col("event_type") === "error").as("error_rate"))
    def outerAvg(rc: String) =
      fixedDec(rhu(sum(graft.functions.GraftFunctions.scaledLong(col(rc), 6)),
        count(col(rc)), 1), 6)
    val outer = inner.groupBy(col("user_id")).agg(
      outerAvg("click_rate").as("avg_click_rate"),
      outerAvg("error_rate").as("avg_error_rate"))
    val big = bigInput(ev(s, d))
    val joined = outer
      .join(custDim(s, d, big), outer("user_id") === col("c_custkey"))
      .select(col("user_id"), col("c_mktsegment").as("segment"),
        col("avg_click_rate"), col("avg_error_rate"))
    sortedSmallOut(big, joined, col("segment"), col("user_id"))
  }

  private val q01Sql =
    s"""SELECT u.user_id, c.c_mktsegment AS segment,
       |  ${fixedDecSql(rhuSql("CAST(SUM(u.click_rate)*1000000 AS BIGINT)", "COUNT(u.click_rate)", 1), 6)} AS avg_click_rate,
       |  ${fixedDecSql(rhuSql("CAST(SUM(u.error_rate)*1000000 AS BIGINT)", "COUNT(u.error_rate)", 1), 6)} AS avg_error_rate
       |FROM (
       |  SELECT user_id, ${bucketSql("ts", 600)} AS bucket,
       |    CAST(ROUND(CAST(SUM(CASE WHEN event_type IN ('click','view') THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)/600, 6) AS DECIMAL(18,6)) AS click_rate,
       |    CAST(ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN CAST(value AS DECIMAL(18,4)) END) AS DOUBLE)/600, 6) AS DECIMAL(18,6)) AS error_rate
       |  FROM events GROUP BY 1, 2) u
       |JOIN customer c ON u.user_id = c.c_custkey
       |GROUP BY 1, 2 ORDER BY 2, 1""".stripMargin

  // Q2 analog: time-bucketed rate timeseries with an IN filter.
  // Ref: "Satellite count $interval-average", RTCM monitor.json:248.
  private def q02(s: SparkSession, d: String): DataFrame =
    // cost-based input range partitioning vs plain result orderBy —
    // see orderedOut
    orderedOut(ev(s, d).filter(col("event_type").isin("click", "view")),
      bucket(col("ts"), 600), col("user_id")) {
      _.groupBy(bucket(col("ts"), 600).as("bucket"), col("user_id"))
        .agg(round(sum(dec(col("value"), 18, 4)).cast(DoubleType) / 600, 6)
          .cast(DecimalType(18, 6)).cast(DoubleType).as("rate"))
    }

  private val q02Sql =
    s"""SELECT ${bucketSql("ts", 600)} AS bucket, user_id,
       |  CAST(CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)/600, 6) AS DECIMAL(18,6)) AS DOUBLE) AS rate
       |FROM events WHERE event_type IN ('click','view')
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q3 analog: DISTINCT over the fact within a time range, joined to
  // the dimension (semi-join shape). Ref: "Mountpoint location",
  // RTCM monitor.json:422.
  private def q03(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .filter(col("ts") >= lit("2024-01-08 00:00:00").cast(TimestampType) &&
        col("ts") < lit("2024-01-15 00:00:00").cast(TimestampType))
      .select("user_id").distinct()
      .join(cust(s, d), col("user_id") === col("c_custkey"))
      .select(col("user_id"), col("c_name").as("name"), col("c_mktsegment").as("segment"))
      .orderBy("user_id")

  private val q03Sql =
    """SELECT e.user_id, c.c_name AS name, c.c_mktsegment AS segment
      |FROM (SELECT DISTINCT user_id FROM events
      |      WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |        AND ts <  TIMESTAMP '2024-01-15 00:00:00') e
      |JOIN customer c ON e.user_id = c.c_custkey
      |ORDER BY 1""".stripMargin

  // Q4 analog: 2-level agg over a JSON-extracted payload-size column.
  // Ref: "Data flow average [kB/s]", RTCM monitor.json:529.
  private def q04(s: SparkSession, d: String): DataFrame = {
    // project the JSON extraction ONCE before the aggregate — and via
    // the byte-scan kernel (functions.JsonGetLong): at 100 TB the JSON
    // parse IS the scan cost, and Jackson was ~1.5 s of this query's
    // 4.2 s at sf10. Outer level sums long micro-units instead of
    // DECIMAL(18,9) (scaledLong(kps,9) recovers the round9 integer
    // exactly — see q01's stage-by-stage identity argument).
    val inner = ev(s, d)
      .withColumn("k", graft.functions.GraftFunctions.jsonGetLong(col("props"), "k"))
      .groupBy(col("user_id"), bucket(col("ts"), 600).as("bucket"))
      .agg(round(sum(col("k")).cast(DoubleType) / 600, 9).as("kps"))
    val big = bigInput(ev(s, d))
    val joined = inner.groupBy(col("user_id"))
      .agg(fixedDec(rhu(sum(graft.functions.GraftFunctions.scaledLong(col("kps"), 9)),
        count(col("kps")) * lit(1000L), 1), 6).as("avg_kps"))
      .join(custDim(s, d, big), col("user_id") === col("c_custkey"))
      .select(col("user_id"), col("c_mktsegment").as("segment"), col("avg_kps"))
    sortedSmallOut(big, joined, col("segment"), col("user_id"))
  }

  private val q04Sql =
    s"""SELECT u.user_id, c.c_mktsegment AS segment,
       |  ${fixedDecSql(rhuSql("CAST(SUM(u.kps)*1000000000 AS BIGINT)", "COUNT(u.kps)*1000", 1), 6)} AS avg_kps
       |FROM (
       |  SELECT user_id, ${bucketSql("ts", 600)} AS bucket,
       |    CAST(ROUND(CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS DOUBLE)/600, 9) AS DECIMAL(18,9)) AS kps
       |  FROM events GROUP BY 1, 2) u
       |JOIN customer c ON u.user_id = c.c_custkey
       |GROUP BY 1, 2 ORDER BY 2, 1""".stripMargin

  // Q5 analog: bucketed sum-rate timeseries over the JSON payload size.
  // Ref: "Data flow $interval-average", RTCM monitor.json:645.
  private def q05(s: SparkSession, d: String): DataFrame =
    // one byte-scan JSON probe per row (not per aggregate expression);
    // cost-based input range partitioning — see orderedOut
    orderedOut(
      ev(s, d).withColumn("k",
        graft.functions.GraftFunctions.jsonGetLong(col("props"), "k")),
      bucket(col("ts"), 600), col("user_id")) {
      _.groupBy(bucket(col("ts"), 600).as("bucket"), col("user_id"))
        .agg(sum(col("k")).as("bytes"),
          round(sum(col("k")).cast(DoubleType) / 600 / 8 / 1024, 9)
            .cast(DecimalType(18, 9)).cast(DoubleType).as("kbps"))
    }

  private val q05Sql =
    s"""SELECT ${bucketSql("ts", 600)} AS bucket, user_id,
       |  CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS BIGINT) AS bytes,
       |  CAST(CAST(ROUND(CAST(SUM(CAST(json_extract_string(props, '$$.k') AS BIGINT)) AS DOUBLE)/600/8/1024, 9) AS DECIMAL(18,9)) AS DOUBLE) AS kbps
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q6 analog: disconnect table — pair each 'error' event with the next
  // one per user (lead window), open interval closed by the global max
  // timestamp (CURRENT_TIMESTAMP stand-in, kept deterministic).
  // Ref: "Disconnected mountpoints", RTCM monitor.json:765 + S9 pairing.
  private def q06(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val errs = e.filter(col("event_type") === "error")
      .select(col("user_id"), unix_timestamp(col("ts")).as("disconnect_epoch"),
        col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("disconnect_epoch", "event_id")
    val mx = e.agg(unix_timestamp(max(col("ts"))).as("max_epoch"))
    errs
      .withColumn("reconnect_epoch", lead(col("disconnect_epoch"), 1).over(w))
      .crossJoin(broadcast(mx))
      .select(col("user_id"), col("disconnect_epoch"), col("reconnect_epoch"),
        (coalesce(col("reconnect_epoch"), col("max_epoch")) - col("disconnect_epoch"))
          .as("duration_s"))
      .orderBy(desc("disconnect_epoch"), col("user_id"))
  }

  private val q06Sql =
    """SELECT user_id, disconnect_epoch, reconnect_epoch,
      |  COALESCE(reconnect_epoch, max_epoch) - disconnect_epoch AS duration_s
      |FROM (
      |  SELECT user_id,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS disconnect_epoch,
      |    LEAD(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER
      |      (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS reconnect_epoch
      |  FROM events WHERE event_type = 'error') e
      |CROSS JOIN (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS max_epoch FROM events) m
      |ORDER BY 2 DESC, 1""".stripMargin

  // Q7 analog: latest-value-per-key (window dedup = the `coordinates`
  // upsert semantics) three-way joined to two dimensions.
  // Ref: "Coordinates [m]", RTCM monitor.json:850 + S7.
  private def q07(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val latest = ev(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), unix_timestamp(col("ts")).as("last_epoch"),
        decd(col("value"), 18, 4).as("last_value"))
    latest
      .join(cust(s, d), col("user_id") === col("c_custkey"))
      .join(broadcast(Tables.load(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .select(col("user_id"), col("last_epoch"), col("last_value"),
        col("c_name").as("name"), col("n_name").as("nation"))
      .orderBy("user_id")
  }

  private val q07Sql =
    """SELECT e.user_id, e.last_epoch, e.last_value, c.c_name AS name, n.n_name AS nation
      |FROM (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS last_epoch,
      |         CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) AS last_value,
      |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) e
      |JOIN customer c ON e.user_id = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE e.rn = 1
      |ORDER BY 1""".stripMargin

  // Q8 analog: data-gap heatmap — event counts per (hour bucket, user)
  // under IS NOT NULL / <> 0 / type predicates.
  // Ref: "Data gaps", RTCM monitor.json:949.
  private def q08(s: SparkSession, d: String): DataFrame =
    ev(s, d)
      .filter(col("event_type").isin("click", "view", "purchase") &&
        col("value").isNotNull && col("value") =!= 0)
      .groupBy(bucket(col("ts"), 3600).as("bucket"), col("user_id"))
      .agg(count(col("value")).as("n"))
      .orderBy("bucket", "user_id")

  private val q08Sql =
    s"""SELECT ${bucketSql("ts", 3600)} AS bucket, user_id, COUNT(value) AS n
       |FROM events
       |WHERE event_type IN ('click','view','purchase') AND value IS NOT NULL AND value <> 0
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Latency expression shared by Q9–Q11: wall-clock epoch vs event
  // epoch mod 86400, with a per-constellation leap-second CASE.
  // Ref: RTCM monitor.json:1072 latency expr.
  private def latencyCol = {
    val leap = when(col("event_type") === "click", 18L)
      .when(col("event_type") === "view", 0L)
      .when(col("event_type") === "purchase", 4L)
      .otherwise(18L)
    val rx = unix_timestamp(col("ts"))
    val obs = rx - floor(col("value")).cast(LongType)
    pmod(rx + leap, lit(86400L)) - pmod(obs, lit(86400L))
  }

  private val latencySqlExpr =
    """(CAST(floor(epoch(ts)) AS BIGINT) + CASE WHEN event_type = 'click' THEN 18
      | WHEN event_type = 'view' THEN 0 WHEN event_type = 'purchase' THEN 4
      | ELSE 18 END) % 86400
      | - (CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(value) AS BIGINT)) % 86400"""
      .stripMargin.replace("\n", "")

  // Q9 analog: average latency per (hour bucket, user).
  private def q09(s: SparkSession, d: String): DataFrame =
    // cost-based input range partitioning — see orderedOut
    orderedOut(ev(s, d), bucket(col("ts"), 3600), col("user_id")) {
      _.groupBy(bucket(col("ts"), 3600).as("bucket"), col("user_id"))
        .agg(davg(latencyCol).as("avg_latency_s"))
    }

  private val q09Sql =
    s"""SELECT ${bucketSql("ts", 3600)} AS bucket, user_id,
       |  ${davgSql(latencySqlExpr)} AS avg_latency_s
       |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Q10/Q11 analogs: max/min latency gauges per user.
  private def q10(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(col("user_id"))
      .agg(max(latencyCol).as("max_latency_s"),
        max(unix_timestamp(col("ts"))).as("last_epoch"))
      .orderBy("user_id")

  private val q10Sql =
    s"""SELECT user_id, MAX($latencySqlExpr) AS max_latency_s,
       |  MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS last_epoch
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  private def q11(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(col("user_id"))
      .agg(min(latencyCol).as("min_latency_s"),
        max(unix_timestamp(col("ts"))).as("last_epoch"))
      .orderBy("user_id")

  private val q11Sql =
    s"""SELECT user_id, MIN($latencySqlExpr) AS min_latency_s,
       |  MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS last_epoch
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // Q12–Q15 analogs: fixed-column CASE pivots (avg per category per
  // bucket) — explicit columns incl. one the data never produces
  // ('stream' ≙ BeiDou B5D), so NULL-column parity is explicit rather
  // than pivot()'s observed-values mode. Ref: Disturbances.json:122+.
  private def pivotAvg(cat: String): org.apache.spark.sql.Column = {
    val s = sum(when(col("event_type") === cat,
      graft.functions.GraftFunctions.scaledLong(col("value"), 4)))
    val c = count(when(col("event_type") === cat, col("value")))
    fixedDec(rhu(s, c, 100), 6)
  }

  private def pivotAvgSql(cat: String): String = {
    val s = s"SUM(CASE WHEN event_type = '$cat' THEN CAST(ROUND(value * 10000, 0) AS BIGINT) END)"
    val c = s"COUNT(CASE WHEN event_type = '$cat' THEN value END)"
    fixedDecSql(rhuSql(s, c, 100), 6)
  }

  private def q12(s: SparkSession, d: String): DataFrame =
    ev(s, d).filter(col("user_id") < 50)
      .groupBy(bucket(col("ts"), 86400).as("bucket"))
      .agg(pivotAvg("click").as("avg_click"), pivotAvg("view").as("avg_view"),
        pivotAvg("purchase").as("avg_purchase"), pivotAvg("signup").as("avg_signup"),
        pivotAvg("error").as("avg_error"), pivotAvg("stream").as("avg_stream"))
      .orderBy("bucket")

  private val q12Sql =
    s"""SELECT ${bucketSql("ts", 86400)} AS bucket,
       |  ${pivotAvgSql("click")} AS avg_click, ${pivotAvgSql("view")} AS avg_view,
       |  ${pivotAvgSql("purchase")} AS avg_purchase, ${pivotAvgSql("signup")} AS avg_signup,
       |  ${pivotAvgSql("error")} AS avg_error, ${pivotAvgSql("stream")} AS avg_stream
       |FROM events WHERE user_id < 50 GROUP BY 1 ORDER BY 1""".stripMargin

  private def q13(s: SparkSession, d: String): DataFrame =
    ev(s, d).filter(col("user_id") === 7)
      .groupBy(bucket(col("ts"), 21600).as("bucket"))
      .agg(pivotAvg("click").as("avg_click"), pivotAvg("error").as("avg_error"),
        pivotAvg("view").as("avg_view"))
      .orderBy("bucket")

  private val q13Sql =
    s"""SELECT ${bucketSql("ts", 21600)} AS bucket,
       |  ${pivotAvgSql("click")} AS avg_click, ${pivotAvgSql("error")} AS avg_error,
       |  ${pivotAvgSql("view")} AS avg_view
       |FROM events WHERE user_id = 7 GROUP BY 1 ORDER BY 1""".stripMargin

  // Q14 analog on lineitem: monthly pivot by returnflag.
  private def q14(s: SparkSession, d: String): DataFrame = {
    def p(f: String) = {
      val sm = sum(when(col("l_returnflag") === f,
        graft.functions.GraftFunctions.scaledLong(col("l_extendedprice"), 2)))
      val c = count(when(col("l_returnflag") === f, col("l_extendedprice")))
      fixedDec(rhu(sm, c, 100), 4)
    }
    Tables.load(s, d, "lineitem")
      .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
        .cast(LongType).as("ym"))
      .agg(p("A").as("avg_price_a"), p("N").as("avg_price_n"), p("R").as("avg_price_r"))
      .orderBy("ym")
  }

  private def q14PSql(f: String) = fixedDecSql(rhuSql(
    s"SUM(CASE WHEN l_returnflag = '$f' THEN CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) END)",
    s"COUNT(CASE WHEN l_returnflag = '$f' THEN l_extendedprice END)", 100), 4)

  private val q14Sql =
    s"""SELECT CAST(EXTRACT(YEAR FROM l_shipdate) * 100 + EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS ym,
       |  ${q14PSql("A")} AS avg_price_a, ${q14PSql("N")} AS avg_price_n, ${q14PSql("R")} AS avg_price_r
       |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // Q15 analog on orders: pivot by orderstatus per priority.
  private def q15(s: SparkSession, d: String): DataFrame = {
    def p(st: String) = {
      val sm = sum(when(col("o_orderstatus") === st,
        graft.functions.GraftFunctions.scaledLong(col("o_totalprice"), 2)))
      val c = count(when(col("o_orderstatus") === st, col("o_totalprice")))
      fixedDec(rhu(sm, c, 100), 4)
    }
    Tables.load(s, d, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(p("F").as("avg_f"), p("O").as("avg_o"), p("P").as("avg_p"),
        count(lit(1)).as("n_orders"))
      .orderBy("priority")
  }

  private def q15PSql(st: String) = fixedDecSql(rhuSql(
    s"SUM(CASE WHEN o_orderstatus = '$st' THEN CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) END)",
    s"COUNT(CASE WHEN o_orderstatus = '$st' THEN o_totalprice END)", 100), 4)

  private val q15Sql =
    s"""SELECT o_orderpriority AS priority,
       |  ${q15PSql("F")} AS avg_f, ${q15PSql("O")} AS avg_o, ${q15PSql("P")} AS avg_p,
       |  COUNT(*) AS n_orders
       |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // Q16 analogs: template-variable queries — DISTINCT value lists and
  // an IN-subquery (planned as a left-semi join).
  private def q16a(s: SparkSession, d: String): DataFrame =
    ev(s, d).select(col("event_type")).distinct().orderBy("event_type")

  private val q16aSql = "SELECT DISTINCT event_type FROM events ORDER BY 1"

  private def q16b(s: SparkSession, d: String): DataFrame = {
    val active = ev(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 20).select(col("user_id"))
    cust(s, d)
      .join(broadcast(active), col("c_custkey") === col("user_id"), "left_semi")
      .select(col("c_custkey").as("user_id"), col("c_name").as("name"))
      .orderBy("user_id")
  }

  private val q16bSql =
    """SELECT c_custkey AS user_id, c_name AS name FROM customer
      |WHERE c_custkey IN (SELECT user_id FROM events GROUP BY user_id HAVING COUNT(*) >= 20)
      |ORDER BY 1""".stripMargin

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_rate_avg_2level" -> q01,
    "q02_rate_timeseries" -> q02,
    "q03_distinct_dim_join" -> q03,
    "q04_flow_avg_json" -> q04,
    "q05_flow_timeseries" -> q05,
    "q06_disconnect_pairing" -> q06,
    "q07_latest_per_key_join" -> q07,
    "q08_gap_heatmap" -> q08,
    "q09_latency_avg" -> q09,
    "q10_latency_max" -> q10,
    "q11_latency_min" -> q11,
    "q12_pivot_case_wide" -> q12,
    "q13_pivot_case_single_key" -> q13,
    "q14_pivot_monthly_lineitem" -> q14,
    "q15_pivot_status_orders" -> q15,
    "q16a_distinct_values" -> q16a,
    "q16b_in_subquery_semi" -> q16b,
    // big-input-branch gate twins: the cost probe never crosses its
    // byte threshold at gate SF, so these pin bigInput=true (build-time
    // conf, Q.forcedBig) and hash the big branch — input range
    // partition + sortWithinPartitions ≡ orderBy (q02/q05/q09),
    // staged-shuffle sort + merge-hinted custDim (q01/q04) — against
    // the SAME oracle SQL as the small branch
    "q01_bigpath" -> Q.forcedBig(q01),
    "q02_bigpath" -> Q.forcedBig(q02),
    "q04_bigpath" -> Q.forcedBig(q04),
    "q05_bigpath" -> Q.forcedBig(q05),
    "q09_bigpath" -> Q.forcedBig(q09))

  override def oracle: Map[String, String] = Map(
    "q01_rate_avg_2level" -> q01Sql,
    "q02_rate_timeseries" -> q02Sql,
    "q03_distinct_dim_join" -> q03Sql,
    "q04_flow_avg_json" -> q04Sql,
    "q05_flow_timeseries" -> q05Sql,
    "q06_disconnect_pairing" -> q06Sql,
    "q07_latest_per_key_join" -> q07Sql,
    "q08_gap_heatmap" -> q08Sql,
    "q09_latency_avg" -> q09Sql,
    "q10_latency_max" -> q10Sql,
    "q11_latency_min" -> q11Sql,
    "q12_pivot_case_wide" -> q12Sql,
    "q13_pivot_case_single_key" -> q13Sql,
    "q14_pivot_monthly_lineitem" -> q14Sql,
    "q15_pivot_status_orders" -> q15Sql,
    "q16a_distinct_values" -> q16aSql,
    "q16b_in_subquery_semi" -> q16bSql,
    "q01_bigpath" -> q01Sql,
    "q02_bigpath" -> q02Sql,
    "q04_bigpath" -> q04Sql,
    "q05_bigpath" -> q05Sql,
    "q09_bigpath" -> q09Sql)
}
