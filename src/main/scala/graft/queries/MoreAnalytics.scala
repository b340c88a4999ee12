package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-8 analytics additions:
  *
  *  - a07: EXACT distributed quantiles (k-th smallest, no
  *    interpolation, no approximation) via the two-level histogram
  *    plan — the scalable alternative to Spark's built-in
  *    `percentile`, whose aggregation buffer collects every value of
  *    a group into memory and therefore cannot run on a 20-billion-row
  *    group. Semantics: for percentile p over n rows the answer is the
  *    k-th smallest value with k = ceil(p·n/100) (type-1/discrete
  *    quantile — an actual element, engine-independent; interpolated
  *    variants differ across engines in tie and rounding behavior).
  *
  *  - w06: retention cohorts over the events stream — the canonical
  *    event-analytics query (reference dashboards are exactly this
  *    kind of per-time-bucket monitoring surface; cf.
  *    /root/reference/grafana/provisioning/dashboards/RTCM monitor.json
  *    time-bucketed panels): cohort = a user's first active day,
  *    retention = distinct users active again at fixed day offsets.
  */
object MoreAnalytics extends QueryModule {

  // a07 plan, stage by stage (all linear, every partition bounded):
  //   1. per-(group, value) counts — one shuffle keyed on (g, v) with
  //      map-side combine; output is the distinct-value histogram.
  //   2. coarse bins (floor(v/100)): per-(group, bin) counts, then a
  //      cumulative window over bins — the window partition is a
  //      group's BIN LIST (~1e3 rows for TPC-H price domains), not its
  //      row count, so it stays driver-of-scale-free at 100 TB.
  //   3. k = ceil(p·n/100) per (group, percentile) from the group
  //      totals (6-row × group-count broadcast).
  //   4. locate the target bin: min bin whose cumulative count ≥ k.
  //   5. resolve inside the bin only: the candidate set is one bin's
  //      distinct values (≤ bin-width many); a cumulative window over
  //      that bounded set finds the k-th value exactly.
  // DuckDB oracle states the SEMANTICS (row_number = k), not the plan.
  private def a07(s: SparkSession, d: String): DataFrame = {
    val pcts = Seq(1, 25, 50, 75, 95, 99)
    val li = Tables.load(s, d, "lineitem")
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val h = li.groupBy(col("g"), col("v")).agg(count(lit(1)).as("c"))
    val hb = h.withColumn("bin", floor(col("v") / 100.0d).cast(LongType))
    val bcum = hb.groupBy(col("g"), col("bin")).agg(sum(col("c")).as("bc"))
      .withColumn("bincum",
        sum(col("bc")).over(Window.partitionBy(col("g")).orderBy(col("bin"))))
    // group totals fall out of the bin cumulative (n = last bincum) —
    // a separate sum over h would re-scan and re-shuffle the histogram
    val n = bcum.groupBy(col("g")).agg(max(col("bincum")).as("n"))
    val ks = n.crossJoin(
      broadcast(s.createDataFrame(pcts.map(Tuple1(_))).toDF("pct")))
      .select(col("g"), col("pct").cast(LongType).as("pct"),
        expr("(pct * n + 99) div 100").as("k"))
    val tb = bcum.join(ks, Seq("g"))
      .filter(col("bincum") >= col("k"))
      .groupBy(col("g"), col("pct"), col("k"))
      .agg(min(struct(col("bin"), col("bincum"), col("bc"))).as("m"))
      .select(col("g"), col("pct"), col("k"),
        col("m.bin").as("tbin"), (col("m.bincum") - col("m.bc")).as("base"))
    hb.join(tb, hb("g") === tb("g") && hb("bin") === tb("tbin"))
      .drop(tb("g"))
      .withColumn("cw", sum(col("c")).over(
        Window.partitionBy(col("g"), col("pct"), col("bin")).orderBy(col("v"))))
      .filter(col("base") + col("cw") >= col("k"))
      .groupBy(col("g"), col("pct"))
      .agg(min(col("v")).cast(DoubleType).as("val"))
      .select(col("g").as("l_returnflag"), col("pct"), col("val"))
      .orderBy("l_returnflag", "pct")
  }

  private val a07Sql =
    """WITH n AS (SELECT l_returnflag AS g, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |p AS (SELECT UNNEST([1, 25, 50, 75, 95, 99]) AS pct),
      |k AS (SELECT g, pct, (pct * n + 99) // 100 AS k FROM n, p),
      |r AS (SELECT l_returnflag AS g, l_extendedprice AS v,
      |        ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn
      |      FROM lineitem)
      |SELECT k.g AS l_returnflag, CAST(pct AS BIGINT) AS pct, CAST(r.v AS DOUBLE) AS val
      |FROM k JOIN r ON k.g = r.g AND r.rn = k.k
      |ORDER BY 1, 2""".stripMargin

  // w06: cohort_day = a user's first active day (epoch days); a user
  // counts toward (cohort_day, offset) when active cohort_day+offset.
  // ONE user-keyed exchange serves every per-user stage: hash
  // partitioning on user_id satisfies the clustering the (user, day)
  // distinct needs (a user's rows are co-located, so its (user, day)
  // pairs are too), the per-user min, and the self-join — left to the
  // default plan, the distinct would shuffle on (user, day) and the
  // min/join would re-shuffle on user_id, three corpus-sized
  // exchanges instead of one. The final (cohort, offset) aggregate is
  // day-cardinality sized. countDistinct is avoided: (user, day) rows
  // are already distinct, so count(*) IS the distinct-user count.
  /** user_id-clustered events: from the bucketed layout the scan
    * itself carries HashPartitioning(user_id) and the explicit
    * repartition would ADD an exchange, so it's applied only on the
    * plain-parquet path. One layout resolution serves both the
    * DataFrame and the decision. */
  private def userClustered(s: SparkSession, d: String, cols: Column*): DataFrame =
    graft.etl.BucketedLayout.loadIfBucketed(s, d, "events") match {
      case Some(bucketed) => bucketed.select(cols: _*)
      case None => Tables.load(s, d, "events").select(cols: _*)
        .repartition(col("user_id"))
    }

  private def w06(s: SparkSession, d: String): DataFrame = {
    val dd = userClustered(s, d,
      col("user_id"), expr("unix_timestamp(ts) div 86400").as("day"))
      .distinct()
    val cohort = dd.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    dd.join(cohort, Seq("user_id"))
      .withColumn("offset", col("day") - col("cohort_day"))
      .filter(col("offset").isin(0L, 1L, 3L, 7L, 14L))
      .groupBy(col("cohort_day"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "offset")
  }

  private val w06Sql =
    """WITH dd AS (SELECT DISTINCT user_id,
      |              CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day
      |            FROM events),
      |c AS (SELECT user_id, MIN(day) AS cohort_day FROM dd GROUP BY 1)
      |SELECT cohort_day, day - cohort_day AS "offset", COUNT(*) AS n_users
      |FROM dd JOIN c USING (user_id)
      |WHERE day - cohort_day IN (0, 1, 3, 7, 14)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // w07: ordered conversion funnel — view → click → purchase with
  // STRICTLY increasing event times (a click before the first view
  // doesn't count; micro-second epoch longs make the ordering exact).
  // Stage times are per-user minima over the qualifying events, so
  // the funnel is the standard "first qualifying sequence" contract.
  // Grouped by the user's cohort day (first activity). Scale: every
  // stage joins and aggregates on user_id — the same single-exchange
  // discipline as w06 (the up-front repartition makes the stage
  // pipeline exchange-free); the final aggregate is day-cardinality.
  private def w07(s: SparkSession, d: String): DataFrame = {
    val base = userClustered(s, d,
      col("user_id"), col("event_type"),
      // events.ts arrives TIMESTAMP_NTZ from the nanos conversion;
      // unix_micros wants TIMESTAMP (same cast as the range joins —
      // session TZ is UTC, so the reinterpretation is exact)
      expr("unix_micros(cast(ts as timestamp))").as("us"))
      // four consumers (cohort + three stage branches) with DIFFERENT
      // pushed filters: uncached, each branch re-scans and re-shuffles
      // its filtered subset (per-branch REPARTITION exchanges defeat
      // reuse). The cache pins ONE scan + ONE user exchange; the
      // cached partitioning serves every branch (plan-audited ≤2 hash
      // exchanges total).
      .cache()
    val cohort = base.groupBy(col("user_id"))
      .agg(expr("min(us) div 86400000000").as("cohort_day"))
    val v = base.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("tv"))
    val c = base.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("us") > col("tv"))
      .groupBy(col("user_id")).agg(min(col("us")).as("tc"))
    val p = base.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("us") > col("tc"))
      .groupBy(col("user_id")).agg(min(col("us")).as("tp"))
    cohort
      .join(v, Seq("user_id"), "left_outer")
      .join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .groupBy(col("cohort_day"))
      .agg(
        count(lit(1)).as("n_users"),
        count(col("tv")).as("n_view"),
        count(col("tc")).as("n_click"),
        count(col("tp")).as("n_purchase"))
      .orderBy("cohort_day")
  }

  private val w07Sql =
    """WITH base AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |coh AS (SELECT user_id, MIN(us) // 86400000000 AS cohort_day
      |        FROM base GROUP BY 1),
      |v AS (SELECT user_id, MIN(us) AS tv FROM base
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT b.user_id, MIN(b.us) AS tc FROM base b
      |      JOIN v ON b.user_id = v.user_id
      |      WHERE b.event_type = 'click' AND b.us > v.tv GROUP BY 1),
      |p AS (SELECT b.user_id, MIN(b.us) AS tp FROM base b
      |      JOIN c ON b.user_id = c.user_id
      |      WHERE b.event_type = 'purchase' AND b.us > c.tc GROUP BY 1)
      |SELECT cohort_day, COUNT(*) AS n_users,
      |  COUNT(tv) AS n_view, COUNT(tc) AS n_click, COUNT(tp) AS n_purchase
      |FROM coh
      |LEFT JOIN v USING (user_id)
      |LEFT JOIN c USING (user_id)
      |LEFT JOIN p USING (user_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // w08: sliding (hopping) window aggregates — the Grafana
  // moving-panel shape: per event type, a 1-hour window hopping every
  // 15 minutes. The window assignment is EXPLICIT integer arithmetic
  // (each event lands in exactly the 4 hop-aligned windows covering
  // it: starts floor(s/900)·900 − {0,1,2,3}·900), which is precisely
  // the ×(window/slide) Expand Spark's own window(ts, '1 hour',
  // '15 minutes') plans — stated as arithmetic so the oracle is the
  // identical expression and the output key is a plain epoch-second
  // BIGINT.
  //
  // Scale shape — no O(rows)-key hash table anywhere. The naive plan
  // (explode ×4, then a (window, type) aggregate with a user
  // count-distinct) pays a ~4·N-key partial hash aggregate for the
  // distinct — the entire cost at sf10 (8.5 s for 10 M events: the
  // 40 M-key (window, type, user) dedup map, spilling). Both output
  // columns are instead computed against LOW-cardinality keys:
  //
  //  • n_events / sum_value: per-(hop, type) totals first (|hops ×
  //    types| keys — map-side collapse of the 10 M rows, a
  //    partials-only shuffle), then the ×4 hop→window explode runs
  //    over the TOTALS (≈48 k rows), not the events.
  //  • n_users: an interval sweep. A user covers window starts
  //    wh ∈ [hop−3, hop], so per (user, type) the covered windows are
  //    a UNION OF INTERVALS: after the one data-sized repartition on
  //    (user_id, event_type), lag/lead over one in-partition sort
  //    mark interval starts (gap > 3) and ends, each emitting a ±1
  //    delta at the interval's boundary window. Distinct users per
  //    window = prefix sum of the deltas. No (user, type, hop) dedup
  //    pass is needed — duplicate hops have gap 0 and fire no
  //    boundary, so the sweep is duplicate-tolerant by construction.
  //    Delta rows collapse to ≤ |windows × types| by a map-side sum.
  //
  // The two branches full-outer-merge on (window, type) via a union +
  // one running-sum window partitioned by event_type ordered by
  // (window, kind) — delta rows sort before count rows at equal
  // window so a +1 opening at wh applies to wh itself. That window's
  // per-partition row count is |windows| (time-range-bound: a year of
  // 15-min hops is 35 k rows/type), never O(events). The value sum
  // stays exact: scaled-long partials at hop level, long-summed, one
  // decimal division at the end — bit-identical to Q.dsum over the
  // raw rows. Only windows with ≥1 event exist on either side.
  // Measured sf10, 10 M events, warm best-of-3: 8.5 s (naive) →
  // 7.8 s (single-exchange naive) → this plan; see BENCH_NOTES.
  private def w08(s: SparkSession, d: String): DataFrame = {
    val base = Tables.load(s, d, "events")
      .select(col("user_id"), col("event_type"),
        graft.functions.GraftFunctions.scaledLong(col("value"), 2).as("sv"),
        expr("unix_timestamp(ts) div 900").as("hop"))

    val counts = base
      .groupBy("hop", "event_type")
      .agg(count(lit(1)).as("cnt"), sum(col("sv")).as("sv"))
      .withColumn("i", explode(array(lit(0L), lit(1L), lit(2L), lit(3L))))
      .select(expr("(hop - i) * 900").as("ws"), col("event_type"),
        col("cnt"), col("sv"))
      .groupBy("ws", "event_type")
      .agg(sum(col("cnt")).as("n_events"), sum(col("sv")).as("sv"))

    // NULL guard (sweep-specific semantics): a NULL user_id would form
    // its own lag/lead partition and count as one distinct user, where
    // COUNT(DISTINCT user_id) excludes NULLs; a NULL ts/hop row emits
    // ill-defined boundary deltas. The generator keeps both non-null,
    // but the sweep must not depend on that contract. NOTE: the plan
    // audit's "interval-sweep present" check keys on the `hop` alias
    // surviving into the physical lag/lead — rename in both places.
    val uw = Window.partitionBy("user_id", "event_type").orderBy("hop")
    val deltas = base
      .select("user_id", "event_type", "hop")
      .where(col("user_id").isNotNull && col("hop").isNotNull)
      .repartition(col("user_id"), col("event_type"))
      .withColumn("prev", lag(col("hop"), 1).over(uw))
      .withColumn("nxt", lead(col("hop"), 1).over(uw))
      .select(col("event_type"), explode(array(
        when(col("prev").isNull || col("hop") - col("prev") > lit(3L),
          struct((col("hop") - lit(3L)).as("wh"), lit(1L).as("delta"))),
        when(col("nxt").isNull || col("nxt") - col("hop") > lit(3L),
          struct((col("hop") + lit(1L)).as("wh"), lit(-1L).as("delta")))
      )).as("m"))
      .where(col("m").isNotNull)
      .select((col("m.wh") * 900).as("ws"), col("event_type"),
        col("m.delta").as("delta"))
      .groupBy("ws", "event_type").agg(sum(col("delta")).as("delta"))

    val tw = Window.partitionBy("event_type").orderBy("ws", "kind")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts.select(col("ws"), col("event_type"), lit(1).as("kind"),
        col("n_events"), col("sv"), lit(0L).as("delta"))
      .unionByName(deltas.select(col("ws"), col("event_type"),
        lit(0).as("kind"), lit(null).cast("long").as("n_events"),
        lit(null).cast("long").as("sv"), col("delta")))
      .withColumn("n_users", sum(col("delta")).over(tw))
      .where(col("kind") === 1)
      .select(col("ws").as("window_start"), col("event_type"),
        col("n_events"), col("n_users"),
        (col("sv").cast(DecimalType(38, 0)) / lit(100L))
          .cast(DecimalType(18, 2)).cast(DoubleType).as("sum_value"))
      .orderBy("window_start", "event_type")
  }

  private val w08Sql =
    s"""WITH e AS (SELECT user_id, event_type, value,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS sec
      |       FROM events),
      |w AS (SELECT user_id, event_type, value,
      |        (sec // 900) * 900 - 900 * i.i AS window_start
      |      FROM e CROSS JOIN (SELECT UNNEST(range(4)) AS i) i)
      |SELECT window_start, event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  ${Q.dsumSql("value", 18, 2)} AS sum_value
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // w08's streaming twin: replay the events table through a
  // MemoryStream (event-time sliding windows, Append close on the
  // watermark, (window, type, user)-keyed streamed partials + batch
  // distinct rollup — see streaming.StreamingSlidingWindows), flushed
  // by a far-future sentinel; must hash-match the BATCH w08 oracle —
  // streaming == batch end-to-end.
  private def w08Stream(s: SparkSession, d: String): DataFrame =
    graft.streaming.StreamingSlidingWindows.replayGate(s, d)

  // w09: purchase attribution — the event-analytics companion to the
  // w07 funnel: every purchase is credited to the user's FIRST event
  // ever (first-touch) and to the LATEST strictly-preceding
  // non-purchase event (last-touch; 'direct' when the purchase opens
  // the history). Both are single ordered passes over each user's
  // event stream — first_value over the unbounded-preceding frame,
  // and a frame-bounded last(..., ignoreNulls) ending at the previous
  // row, so a purchase never attributes to itself.
  //
  // Scale shape: one exchange on user_id, per-user in-partition sort
  // (user histories are bounded ≪ corpus; the same key the bucketed
  // events layout serves exchange-free), then a |types|²-key final
  // aggregate. Revenue stays exact via Q.dsum. Deterministic total
  // order inside a user: (ts, event_id).
  private def w09(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    Tables.load(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        col("value"),
        first(col("event_type"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("first_touch"),
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(wPrev).as("lt"))
      .where(col("event_type") === "purchase")
      .groupBy(col("first_touch"), coalesce(col("lt"), lit("direct")).as("last_touch"))
      .agg(count(lit(1)).as("n_purchases"), Q.dsum(col("value"), 18, 2).as("revenue"))
      .orderBy("first_touch", "last_touch")
  }

  private val w09Sql =
    s"""WITH t AS (
       |  SELECT user_id, event_type, value,
       |    first_value(event_type) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id) AS first_touch,
       |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
       |        IGNORE NULLS) OVER
       |      (PARTITION BY user_id ORDER BY ts, event_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
       |  FROM events)
       |SELECT first_touch, COALESCE(lt, 'direct') AS last_touch,
       |  COUNT(*) AS n_purchases, ${Q.dsumSql("value", 18, 2)} AS revenue
       |FROM t WHERE event_type = 'purchase'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // w10: per-user EWMA of event values — the order-SENSITIVE recursive
  // analytic (ewma_t = α·v_t + (1−α)·ewma_{t−1}, α = 0.25, seed =
  // first value), the smoothing every monitoring surface runs over a
  // metric stream. Exactness: a recursive double fold is
  // order-dependent by nature, so BOTH engines evaluate the identical
  // left-to-right fold over the identically-ordered (ts, event_id)
  // sequence — IEEE doubles then agree bit-for-bit with no rounding
  // step at all (α = 1/4 is an exact binary constant; the repo-wide
  // no-raw-double-aggregate rule bans order-INDEPENDENT float sums,
  // not a fold whose order is pinned on both sides).
  //
  // Scale shape: ONE user-keyed exchange (zero under the user-bucketed
  // events layout — the same ClusteredDistribution w06/w07 ride);
  // per-user sequences are bounded by per-user activity (the
  // sessionize/funnel class), so the collect_list buffer is a few
  // dozen structs, not corpus-sized. The fold itself is a higher-order
  // expression (interpreted) but runs once per USER row, not per
  // event — the event-sized work (collect, sort) is codegen'd
  // aggregate machinery.
  private def w10(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(struct(col("ts"), col("event_id"), col("value"))))
          .as("seq"))
      .select(col("user_id"), col("n_events"),
        aggregate(
          slice(col("seq"), lit(2), greatest(size(col("seq")) - 1, lit(0))),
          element_at(col("seq"), 1)("value"),
          (acc, x) => lit(0.25) * x("value") + lit(0.75) * acc).as("ewma"))
      .orderBy("user_id")

  private val w10Sql =
    """SELECT user_id, COUNT(*) AS n_events,
      |  list_reduce(list(CAST(value AS DOUBLE) ORDER BY ts, event_id),
      |    (acc, x) -> CAST(0.25 AS DOUBLE) * x + CAST(0.75 AS DOUBLE) * acc) AS ewma
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // a09: exact MODE per group (the SQL aggregate Spark lacks) done
  // scale-right: most frequent o_custkey per (priority, status),
  // deterministic tie-break (count DESC, custkey ASC). Spark's own
  // `mode` expression hashes every distinct value into one aggregation
  // buffer per group — fine until a group holds billions of distinct
  // values; this plan is the two-level histogram idiom instead:
  // (group, value) counts with map-side combine, then a struct-min
  // argmax — min(struct(−n, value)) picks max-count-then-min-value in
  // ONE order-free aggregate, no rank window, no value-sized state.
  // Both exchanges carry aggregated histogram rows, never raw facts.
  private def a09(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderstatus").as("status"), col("o_custkey"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("priority"), col("status"))
      .agg(sum(col("n")).as("n_orders"),
        min(struct((col("n") * -1L).as("neg"), col("o_custkey").as("k"))).as("m"))
      .select(col("priority"), col("status"), col("n_orders"),
        col("m.k").as("mode_custkey"), (col("m.neg") * -1L).as("mode_n"))
      .orderBy("priority", "status")

  private val a09Sql =
    """WITH c AS (SELECT o_orderpriority AS priority, o_orderstatus AS status,
      |             o_custkey, COUNT(*) AS n
      |           FROM orders GROUP BY 1, 2, 3),
      |r AS (SELECT priority, status, o_custkey, n,
      |        CAST(SUM(n) OVER (PARTITION BY priority, status) AS BIGINT) AS n_orders,
      |        ROW_NUMBER() OVER (PARTITION BY priority, status
      |          ORDER BY n DESC, o_custkey) AS rn
      |      FROM c)
      |SELECT priority, status, n_orders, o_custkey AS mode_custkey,
      |  CAST(n AS BIGINT) AS mode_n
      |FROM r WHERE rn = 1 ORDER BY 1, 2""".stripMargin

  // a10: EXACT distributed correlation + regression slope per group.
  // Spark's builtin corr/covar aggregates sum doubles in partition
  // order — the result changes run to run with partitioning — so this
  // is the exact form: the five sufficient statistics (Σx, Σy, Σxy,
  // Σx², Σy²) as order-free INTEGER sums (values scaled to cents by
  // the codegen'd scaledLong kernel), each cast to double ONCE, then
  // corr/beta as identical IEEE double arithmetic on identical inputs
  // — bit-identical cross-engine, and identical across any
  // partitioning. The product sums would overflow int64 at scale
  // (Σy² ≈ 6e21 at sf10) and Spark's DECIMAL sum is an order of
  // magnitude slower than a codegen long sum (measured 3.3 s vs
  // 1.4 s for this scan), so each product is split at 2²³ into
  // (quotient, remainder) long sums — the split point balances the
  // two partial ranges near √(max product): with cent-scaled values
  // ≤ ~1.1e7 the product is ≤ ~1.2e14, so quotient ≤ ~1.5e7/row and
  // remainder < 2²³ ≈ 8.4e6/row, and both long sums stay in-range
  // past ~6e11 rows per group (a 2³¹ split's remainder sum would
  // wrap silently at ~4.3e9 rows/group — below the 100 TB design
  // point) — and recombined EXACTLY in decimal on the |groups|
  // output rows before the single double cast, which is the same
  // nearest-double the oracle's HUGEINT→DOUBLE cast produces. One
  // scan, one |groups|-key exchange of seven-number partials; corr is
  // scale-invariant so the cent scaling drops out, and beta's 100/100
  // cancels likewise.
  private def a10(s: SparkSession, d: String): DataFrame = {
    import graft.functions.GraftFunctions.scaledLong
    val split = 1L << 23
    def dd(c: Column) = c.cast(DoubleType)
    def splitSums(prod: Column, n: String) = Seq(
      sum(shiftright(prod, 23)).as(s"${n}_q"),
      sum(prod.bitwiseAND(lit(split - 1))).as(s"${n}_r"))
    def recomb(n: String) = dd(
      col(s"${n}_q").cast(DecimalType(38, 0)) * lit(split) +
        col(s"${n}_r").cast(DecimalType(38, 0)))
    val x = scaledLong(col("l_quantity"), 2)
    val y = scaledLong(col("l_extendedprice"), 2)
    val num = col("n_items") * col("sxy") - col("sx") * col("sy")
    val varx = col("n_items") * col("sxx") - col("sx") * col("sx")
    val vary = col("n_items") * col("syy") - col("sy") * col("sy")
    val aggs = Seq(count(lit(1)).as("n_items"),
      sum(col("x")).as("sxl"), sum(col("y")).as("syl")) ++
      splitSums(col("x") * col("y"), "sxy") ++
      splitSums(col("x") * col("x"), "sxx") ++
      splitSums(col("y") * col("y"), "syy")
    Tables.load(s, d, "lineitem")
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy(col("l_returnflag"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("l_returnflag"), col("n_items"),
        dd(col("sxl")).as("sx"), dd(col("syl")).as("sy"),
        recomb("sxy").as("sxy"), recomb("sxx").as("sxx"),
        recomb("syy").as("syy"))
      .select(col("l_returnflag"), col("n_items"),
        (num / (sqrt(varx) * sqrt(vary))).as("corr_qty_price"),
        (num / varx).as("beta_price_per_qty"))
      .orderBy("l_returnflag")
  }

  private val a10Sql =
    """WITH b AS (SELECT l_returnflag,
      |    CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS x,
      |    CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS y
      |  FROM lineitem),
      |a AS (SELECT l_returnflag, COUNT(*) AS n_items,
      |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
      |    CAST(SUM(x*y) AS DOUBLE) AS sxy,
      |    CAST(SUM(x*x) AS DOUBLE) AS sxx,
      |    CAST(SUM(y*y) AS DOUBLE) AS syy
      |  FROM b GROUP BY 1)
      |SELECT l_returnflag, n_items,
      |  (n_items*sxy - sx*sy)
      |    / (sqrt(n_items*sxx - sx*sx) * sqrt(n_items*syy - sy*sy)) AS corr_qty_price,
      |  (n_items*sxy - sx*sy) / (n_items*sxx - sx*sx) AS beta_price_per_qty
      |FROM a ORDER BY 1""".stripMargin

  // w11: gap-filled time series with last-observation-carried-forward
  // — the resample/interpolate operator every monitoring surface needs
  // (the reference's dashboards plot per-interval series that simply
  // have holes where a mountpoint was silent; this materializes the
  // dense grid). Three scale-shaped stages: (1) last stored reading
  // per (type, hour) via the struct-max pick — ONE corpus aggregate,
  // deterministic (ts, event_id) tie-break, never a window over raw
  // events; (2) the dense hour grid per type from a sequence explode —
  // sized by the TIME SPAN, not the corpus; (3) LOCF as an ignoreNulls
  // running last over the GRID rows (span-bounded keyed window — the
  // few-strata-by-construction c01 precedent). The carried value is a
  // stored double moved verbatim — no float arithmetic, exact
  // cross-engine.
  private def w11(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.load(s, d, "events")
    val hr = Q.bucket(col("ts"), 3600L)
    val lastIn = ev.select(col("event_type"), hr.as("h"),
        struct(col("ts"), col("event_id"), col("value")).as("m"))
      .groupBy(col("event_type"), col("h"))
      .agg(max(col("m")).as("m"))
      .select(col("event_type"), col("h"), col("m").getField("value").as("reading"))
    val grid = lastIn.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(sequence(col("h0"), col("h1"), lit(3600L))).as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(lastIn, Seq("event_type", "h"), "left_outer")
      .select(col("event_type"), col("h"),
        last(col("reading"), ignoreNulls = true).over(w).as("reading"),
        when(col("reading").isNull, 1L).otherwise(0L).as("filled"))
      .orderBy("event_type", "h")
  }

  private val w11Sql =
    """WITH r AS (SELECT event_type,
      |        CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS h, value,
      |        ROW_NUMBER() OVER (PARTITION BY event_type,
      |            CAST(floor(epoch(ts)/3600)*3600 AS BIGINT)
      |          ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events),
      |li AS (SELECT event_type, h, value AS reading FROM r WHERE rn = 1),
      |sp AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM li GROUP BY 1),
      |g AS (SELECT event_type,
      |        CAST(UNNEST(generate_series(h0, h1, 3600)) AS BIGINT) AS h FROM sp),
      |j AS (SELECT g.event_type, g.h, li.reading
      |      FROM g LEFT JOIN li ON g.event_type = li.event_type AND g.h = li.h)
      |SELECT event_type, h,
      |  LAST_VALUE(reading IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS reading,
      |  CAST(CASE WHEN reading IS NULL THEN 1 ELSE 0 END AS BIGINT) AS filled
      |FROM j ORDER BY 1, 2""".stripMargin

  // w12: behavioral path mining — the top event-type TRIGRAM paths
  // across all users (the "what do users do before X" funnel-path
  // query): each user's event stream in (ts, event_id) order yields
  // its consecutive 3-step paths via two lag windows — user-keyed
  // (~|users| partitions, never global) — then one path-keyed count
  // (path space ≤ |types|³, tiny) and a bounded TakeOrdered with a
  // deterministic (n DESC, path) tie-break.
  private def w12(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(s, d, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lag(col("event_type"), 1).over(w))
      .withColumn("e3", lag(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("e3"), col("e2"), col("event_type")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("path"))
      .limit(15)
  }

  private val w12Sql =
    """WITH t AS (SELECT event_type,
      |    LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
      |    LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      |  FROM events)
      |SELECT e3 || '>' || e2 || '>' || event_type AS path,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM t WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin

  // w13: time-to-convert distribution — the product-analytics twin of
  // w07's funnel counts: for every user whose first purchase STRICTLY
  // follows their first view (w07's qualifying contract), the elapsed
  // time, reported as exact p50/p90/p99 minutes per first-view cohort
  // day. The quantile is the h23 bounded-domain histogram idiom, NOT a
  // per-user sort: deltas are bucketed to minutes (the operator's
  // stated resolution — the observation window bounds the domain, here
  // ≤ 30 d ≈ 43 200 keys), counts combine map-side into a
  // (cohort_day, minute) histogram whose size is domain-bounded and
  // corpus-INDEPENDENT, and the k-th-smallest resolution (type-1
  // discrete, same integer-ceil contract as h23/a07) is a window
  // cumsum over histogram rows. Per-user first-event times ride w07's
  // single user_id exchange (bucketed layout ⇒ exchange-free).
  /** The w13 report tail over per-user (tv, tp) conversion rows —
    * shared with the streaming twin (StreamingTimeToConvert, which
    * emits the same rows at ingest): minute-bucketed bounded-domain
    * histogram, type-1 k-th over histogram cumsums. */
  private[graft] def ttcReport(p: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = p
      .select(expr("tv div 86400000000").as("cohort_day"),
        expr("(tp - tv) div 60000000").as("m"))
      .groupBy(col("cohort_day"), col("m")).agg(count(lit(1)).as("c"))
    val wTot = Window.partitionBy(col("cohort_day"))
    val wCum = Window.partitionBy(col("cohort_day")).orderBy(col("m"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def kth(q: Int) = expr(s"(n * $q + 99) div 100")
    def pick(q: Int) = min(when(col("cum") >= kth(q), col("m")))
    hist
      .withColumn("n", sum(col("c")).over(wTot))
      .withColumn("cum", sum(col("c")).over(wCum))
      .groupBy(col("cohort_day"))
      .agg(max(col("n")).as("n_converted"), pick(50).as("p50_ttc_min"),
        pick(90).as("p90_ttc_min"), pick(99).as("p99_ttc_min"))
      .orderBy("cohort_day")
  }

  private def w13(s: SparkSession, d: String): DataFrame = {
    val base = userClustered(s, d,
      col("user_id"), col("event_type"),
      expr("unix_micros(cast(ts as timestamp))").as("us"))
      .filter(col("event_type").isin("view", "purchase"))
      .cache()
    val v = base.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("tv"))
    val p = base.filter(col("event_type") === "purchase")
      .join(v, Seq("user_id")).filter(col("us") > col("tv"))
      .groupBy(col("user_id")).agg(min(col("us")).as("tp"), min(col("tv")).as("tv"))
    ttcReport(p)
  }

  private val w13Sql =
    """WITH base AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events
      |              WHERE event_type IN ('view', 'purchase')),
      |v AS (SELECT user_id, MIN(us) AS tv FROM base
      |      WHERE event_type = 'view' GROUP BY 1),
      |p AS (SELECT b.user_id, MIN(b.us) AS tp, MIN(v.tv) AS tv FROM base b
      |      JOIN v ON b.user_id = v.user_id
      |      WHERE b.event_type = 'purchase' AND b.us > v.tv GROUP BY 1),
      |h AS (SELECT tv // 86400000000 AS cohort_day,
      |        (tp - tv) // 60000000 AS m, CAST(COUNT(*) AS BIGINT) AS c
      |      FROM p GROUP BY 1, 2),
      |w AS (SELECT cohort_day, m, c,
      |        CAST(SUM(c) OVER (PARTITION BY cohort_day) AS BIGINT) AS n,
      |        CAST(SUM(c) OVER (PARTITION BY cohort_day ORDER BY m
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM h)
      |SELECT cohort_day, MAX(n) AS n_converted,
      |  MIN(CASE WHEN cum >= (n*50 + 99) // 100 THEN m END) AS p50_ttc_min,
      |  MIN(CASE WHEN cum >= (n*90 + 99) // 100 THEN m END) AS p90_ttc_min,
      |  MIN(CASE WHEN cum >= (n*99 + 99) // 100 THEN m END) AS p99_ttc_min
      |FROM w GROUP BY 1 ORDER BY 1""".stripMargin

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w13_time_to_convert" -> w13,
    // streaming twin: conversions emitted at ingest by the
    // watermark-ordered fold, the same report tail, the same oracle —
    // stream == batch end-to-end (the w08/t16 gate pattern)
    "w13_ttc_stream" ->
      ((s, d) => graft.streaming.StreamingTimeToConvert.replayGate(s, d)),
    "w12_event_paths" -> w12,
    "w11_gapfill_locf" -> w11,
    "a10_exact_corr" -> a10,
    "a09_mode_per_group" -> a09,
    "a07_exact_quantiles" -> a07,
    "w06_retention_cohorts" -> w06,
    "w07_conversion_funnel" -> w07,
    "w08_sliding_windows" -> w08,
    "w08_sliding_stream" -> w08Stream,
    "w09_attribution" -> w09,
    "w10_ewma" -> w10)

  override def oracle: Map[String, String] = Map(
    "w13_time_to_convert" -> w13Sql,
    "w13_ttc_stream" -> w13Sql,
    "w12_event_paths" -> w12Sql,
    "w11_gapfill_locf" -> w11Sql,
    "a10_exact_corr" -> a10Sql,
    "a09_mode_per_group" -> a09Sql,
    "a07_exact_quantiles" -> a07Sql,
    "w06_retention_cohorts" -> w06Sql,
    "w07_conversion_funnel" -> w07Sql,
    "w08_sliding_windows" -> w08Sql,
    "w08_sliding_stream" -> w08Sql,
    "w09_attribution" -> w09Sql,
    "w10_ewma" -> w10Sql)
}
