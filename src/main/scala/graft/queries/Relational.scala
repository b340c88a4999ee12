package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** General relational coverage beyond the dashboard surface: multi-way
  * joins, exact/distinct aggregation, windows, HAVING, rollup — the
  * query shapes a user of the engine runs on the stored tables.
  *
  * Scale notes: fact-to-fact joins (lineitem⋈orders) shuffle on the
  * join key and benefit from bucketing at 100 TB; every dimension join
  * is `broadcast()`; top-k is computed with a full sort only on the
  * already-aggregated (small) side, or rank-per-group windows which
  * shuffle once on the partition key.
  */
object Relational extends QueryModule {
  import Q._

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // TPC-H Q1 shape: pricing summary — wide partial+final hash agg.
  private def h01(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") <= lit("2001-09-02 00:00:00").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 18, 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 18, 2).as("sum_base_price"),
        // price/discount/tax are exact 2-dp values, so the products have
        // exactly 4/6 decimals — casting at that scale avoids engine-
        // dependent tie-rounding of the double→decimal conversion.
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 22, 4).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 24, 6).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  private val h01Sql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumSql("l_quantity", 18, 2)} AS sum_qty,
       |  ${dsumSql("l_extendedprice", 18, 2)} AS sum_base_price,
       |  ${dsumSql("l_extendedprice * (1 - l_discount)", 22, 4)} AS sum_disc_price,
       |  ${dsumSql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 24, 6)} AS sum_charge,
       |  ${davgSql("l_quantity")} AS avg_qty,
       |  ${davgSql("l_extendedprice")} AS avg_price,
       |  ${davgSql("l_discount")} AS avg_disc,
       |  COUNT(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // TPC-H Q3 shape: dim-filtered fact⋈fact join + grouped top-k.
  private def h03(s: SparkSession, d: String): DataFrame = {
    val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, d, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
    val l = t(s, d, "lineitem")
      .filter(col("l_shipdate") > lit("1997-01-01 00:00:00").cast(TimestampType))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("orderdate_epoch"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 22, 4).as("revenue"))
      .orderBy(desc("revenue"), col("o_orderkey"))
      .limit(10)
  }

  private val h03Sql =
    s"""SELECT o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS orderdate_epoch,
       |  ${dsumSql("l_extendedprice * (1 - l_discount)", 22, 4)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
       |GROUP BY 1, 2 ORDER BY 3 DESC, 1 LIMIT 10""".stripMargin

  // TPC-H Q5 shape: 6-way join chain (region→nation→customer→orders→
  // lineitem→supplier with co-nation predicate), grouped revenue.
  private def h05(s: SparkSession, d: String): DataFrame = {
    val r = t(s, d, "region").filter(col("r_name") === "ASIA")
    val n = t(s, d, "nation").join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val c = t(s, d, "customer").join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val o = t(s, d, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast(TimestampType) &&
        col("o_orderdate") < lit("1998-01-01 00:00:00").cast(TimestampType))
      .select("o_orderkey", "o_custkey")
    val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
    t(s, d, "lineitem")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 22, 4).as("revenue"))
      .orderBy(desc("revenue"), col("nation"))
  }

  private val h05Sql =
    s"""SELECT n_name AS nation,
       |  ${dsumSql("l_extendedprice * (1 - l_discount)", 22, 4)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin

  // TPC-H Q6 shape: pure filter + scalar aggregate (pushdown showcase).
  private def h06(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01 00:00:00").cast(TimestampType) &&
        col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 18, 4).as("revenue"))

  private val h06Sql =
    s"""SELECT ${dsumSql("l_extendedprice * l_discount", 18, 4)} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin

  // TPC-H Q4 shape: EXISTS / left-semi join + grouped count.
  private def h04(s: SparkSession, d: String): DataFrame = {
    val big = t(s, d, "lineitem").filter(col("l_quantity") >= 45)
      .select("l_orderkey")
    t(s, d, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("priority")
  }

  private val h04Sql =
    """SELECT o_orderpriority AS priority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // TPC-H Q18 shape: HAVING over a grouped fact, joined back to orders.
  private def h18(s: SparkSession, d: String): DataFrame = {
    val bigOrders = t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity"), 18, 2).as("sum_qty"))
      .filter(col("sum_qty") > 100)
    bigOrders
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        decd(col("o_totalprice"), 18, 2).as("totalprice"), col("sum_qty"))
      .orderBy(desc("sum_qty"), col("o_orderkey"))
      .limit(100)
  }

  private val h18Sql =
    s"""SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice, sum_qty
       |FROM (SELECT l_orderkey, ${dsumSql("l_quantity", 18, 2)} AS sum_qty
       |      FROM lineitem GROUP BY 1) l
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE sum_qty > 100
       |ORDER BY 4 DESC, 1 LIMIT 100""".stripMargin

  // TPC-H Q10 shape: returned-item revenue per customer, top 20.
  // customer is UNHINTED (the semi-dimension rule — Dashboard scaladoc):
  // beyond AQE's broadcast range the dim shuffles on c_custkey and the
  // joined fact's one custkey shuffle also serves the per-customer
  // aggregate (grouping keys ⊇ partition key), where the broadcast plan
  // paid the 1.5 M-row driver build AND a separate groupBy shuffle.
  // At sf10 the two shapes measure ~equal (2.6 s; the floor is the
  // 20 M⋈15 M orderkey merge at 1.55 s plus one custkey exchange —
  // BENCH_NOTES decomposition); the unhinted form is the one that
  // still works when customer outgrows the driver.
  private def h10(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name").as("nation"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 22, 4).as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  private val h10Sql =
    s"""SELECT c_custkey, c_name, n_name AS nation,
       |  ${dsumSql("l_extendedprice * (1 - l_discount)", 22, 4)} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |GROUP BY 1, 2, 3 ORDER BY 4 DESC, 1 LIMIT 20""".stripMargin

  // TPC-H Q13 shape: LEFT OUTER join with a non-equi ON predicate +
  // two-level aggregation (order-count distribution incl. the
  // zero-order customers only an outer join can produce).
  private def h13(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    t(s, d, "customer").select("c_custkey")
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count skips outer nulls
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  private val h13Sql =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY 1) c
      |GROUP BY 1 ORDER BY 2 DESC, 1 DESC""".stripMargin

  // Exact distinct aggregation (COUNT(DISTINCT) expands to two-phase agg).
  private def a01(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy("event_type")

  private val a01Sql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ROLLUP grouping-sets aggregate over two dimension levels.
  private def a02(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer")
      .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("c_mktsegment").as("segment"), col("n_name").as("nation"))
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal"), 18, 2).as("sum_bal"))
      .orderBy(col("segment").asc_nulls_first, col("nation").asc_nulls_first)

  private val a02Sql =
    s"""SELECT c_mktsegment AS segment, n_name AS nation, COUNT(*) AS n,
       |  ${dsumSql("c_acctbal", 18, 2)} AS sum_bal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY ROLLUP(1, 2) ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // Window: running revenue per customer over order dates.
  private def w01(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, d, "orders").filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("orderdate_epoch"),
        sum(dec(col("o_totalprice"), 18, 2)).over(w).cast(DecimalType(18, 2))
          .cast(DoubleType).as("running_total"))
      .orderBy("o_custkey", "orderdate_epoch", "o_orderkey")
  }

  private val w01Sql =
    """SELECT o_custkey, o_orderkey, CAST(floor(epoch(o_orderdate)) AS BIGINT) AS orderdate_epoch,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(18,2)) AS DOUBLE) AS running_total
      |FROM orders WHERE o_custkey < 100
      |ORDER BY 1, 3, 2""".stripMargin

  // Window: top-3 orders per customer by price (rank-per-group).
  private def w02(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
    val o = t(s, d, "orders")
    // Ordered-output plan choice (the Dashboard orderedOut idiom): the
    // window needs one custkey-clustered exchange either way, and a
    // result orderBy's range sampling re-executes the whole window
    // pipeline. Above the stats threshold, make the one exchange a
    // RANGE partition (equal keys co-locate, so it satisfies the
    // window's ClusteredDistribution) and the partition-local sort
    // yields the total (custkey, rn) order with no second exchange —
    // sampling re-runs only the pruned orders scan. Below it the
    // result is small and the plain orderBy wins.
    val big = Q.bigInput(o)
    val base = if (big) o.repartitionByRange(col("o_custkey")) else o
    val r = base
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        decd(col("o_totalprice"), 18, 2).as("totalprice"))
    if (big) r.sortWithinPartitions("o_custkey", "rn")
    else r.orderBy("o_custkey", "rn")
  }

  private val w02Sql =
    """SELECT o_custkey, rn, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) x
      |WHERE rn <= 3 ORDER BY 1, 2""".stripMargin

  // Window: sessionization by inactivity gap (30 min) — lag + running
  // conditional sum; session count and avg session length per user.
  private def w03(s: SparkSession, d: String): DataFrame = {
    val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val e = t(s, d, "events")
      .withColumn("prev_epoch", lag(unix_timestamp(col("ts")), 1).over(byTs))
      .withColumn("new_session",
        when(col("prev_epoch").isNull ||
          unix_timestamp(col("ts")) - col("prev_epoch") > 1800, 1L).otherwise(0L))
    e.groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  private val w03Sql =
    """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
      |FROM (
      |  SELECT user_id,
      |    CASE WHEN prev_epoch IS NULL
      |           OR CAST(floor(epoch(ts)) AS BIGINT) - prev_epoch > 1800
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM (
      |    SELECT user_id, ts,
      |      LAG(CAST(floor(epoch(ts)) AS BIGINT), 1) OVER
      |        (PARTITION BY user_id ORDER BY ts, event_id) AS prev_epoch
      |    FROM events) x) y
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // Approximate aggregates — the sketch-based scale path (HLL++ count
  // distinct, GK quantiles). Rows-only: sketch results are
  // engine-specific by construction; the exactness baseline is a01.
  private def a03(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.05).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"),
        percentile_approx(col("value"), lit(0.5), lit(100)).as("p50_value"),
        percentile_approx(col("value"), lit(0.99), lit(100)).as("p99_value"))
      .orderBy("event_type")

  // Anti-join coverage (NOT EXISTS): customers with no urgent orders.
  private def a04(s: SparkSession, d: String): DataFrame = {
    val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    t(s, d, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal"), 18, 2).as("sum_bal"))
      .orderBy("segment")
  }

  private val a04Sql =
    s"""SELECT c_mktsegment AS segment, COUNT(*) AS n_customers,
       |  ${dsumSql("c_acctbal", 18, 2)} AS sum_bal
       |FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // As-of join (graft.operators.AsOfJoin): each non-error event picks
  // up the user's most recent error at-or-before it; aggregated per
  // user. Oracle: DuckDB's native ASOF LEFT JOIN.
  private def a05(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    // both sides are filters of the SAME table (non-errors vs their
    // own error markers: errors are ~20% of events — NOT a
    // dimension-sized side, so broadcasting would collect millions of
    // rows at sf10+; measured slower and higher-variance than the
    // merge). backwardSelf reads events ONCE: the tag is the
    // predicate, one shuffle, one in-partition sort, O(1)-state merge.
    graft.operators.AsOfJoin
      .backwardSelf(ev, col("event_type") === "error",
        "user_id", "ts", payload = Seq("event_id"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("asof_age_s")).as("n_matched"),
        davg(col("asof_age_s")).as("avg_age_s"),
        max(col("asof_age_s")).as("max_age_s"))
      .orderBy("user_id")
  }

  private val a05Sql =
    s"""SELECT user_id, COUNT(*) AS n_events, COUNT(age) AS n_matched,
       |  ${davgSql("age")} AS avg_age_s, MAX(age) AS max_age_s
       |FROM (
       |  SELECT l.user_id,
       |    CAST(floor(epoch(l.ts)) AS BIGINT) - CAST(floor(epoch(r.ts)) AS BIGINT) AS age
       |  FROM (SELECT * FROM events WHERE event_type <> 'error') l
       |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') r
       |    ON l.user_id = r.user_id AND l.ts >= r.ts) x
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // TPC-H Q17 shape: correlated scalar subquery (per-part average),
  // expressed Spark-first as an aggregate + equi-join.
  private def h17(s: SparkSession, d: String): DataFrame = {
    val li = t(s, d, "lineitem")
    val partAvg = li.groupBy(col("l_partkey").as("pk"))
      .agg((sum(round(col("l_quantity") * 100, 0).cast(LongType)).cast(DoubleType) / 100 /
        count(col("l_quantity"))).as("avg_qty"))
    li.join(partAvg, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("avg_qty") * 0.2)
      .agg(dsum(col("l_extendedprice"), 18, 2).as("low_qty_revenue"),
        count(lit(1)).as("n_lines"))
  }

  private val h17Sql =
    s"""SELECT ${dsumSql("l_extendedprice", 18, 2)} AS low_qty_revenue, COUNT(*) AS n_lines
       |FROM lineitem l1
       |WHERE l_quantity < 0.2 * (
       |  SELECT CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS DOUBLE) / 100 / COUNT(l_quantity)
       |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin

  // Set operations: INTERSECT/EXCEPT of active-user sets between two
  // weeks (reference uses none — engine-breadth coverage).
  private def set01(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
    def usersIn(from: String, to: String) = ev
      .filter(col("ts") >= lit(from).cast(TimestampType) && col("ts") < lit(to).cast(TimestampType))
      .select(col("user_id"))
    val w1 = usersIn("2024-01-01 00:00:00", "2024-01-08 00:00:00")
    val w2 = usersIn("2024-01-08 00:00:00", "2024-01-15 00:00:00")
    val both = w1.intersect(w2).agg(count(lit(1)).as("n")).withColumn("set_op", lit("both_weeks"))
    val only1 = w1.except(w2).agg(count(lit(1)).as("n")).withColumn("set_op", lit("week1_only"))
    val all = w1.union(w2).distinct().agg(count(lit(1)).as("n")).withColumn("set_op", lit("union"))
    both.unionByName(only1).unionByName(all).select(col("set_op"), col("n")).orderBy("set_op")
  }

  private val set01Sql =
    """WITH w1 AS (SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-08 00:00:00'),
      |     w2 AS (SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-08 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00')
      |SELECT 'both_weeks' AS set_op, COUNT(*) AS n FROM (SELECT * FROM w1 INTERSECT SELECT * FROM w2) x
      |UNION ALL
      |SELECT 'union' AS set_op, COUNT(*) AS n FROM (SELECT * FROM w1 UNION SELECT * FROM w2) y
      |UNION ALL
      |SELECT 'week1_only' AS set_op, COUNT(*) AS n FROM (SELECT * FROM w1 EXCEPT SELECT * FROM w2) z
      |ORDER BY 1""".stripMargin

  // ntile decile distribution of order values. NTILE over an
  // unpartitioned window would move ALL rows to one partition (the
  // scale-killer Spark itself warns about), so the global rank is
  // computed distributed: split the sort-key domain into ranges at
  // SAMPLED boundaries (one approxQuantile pass — the same sampling a
  // distributed sort-rank's range partitioner does), rank locally per
  // range, then add each range's exclusive prefix count (≤32 numbers,
  // driver-side prefix sum). The range id is a deterministic
  // EXPRESSION over the row (boundary literals baked into the plan),
  // so the count pass and the rank pass agree by construction — no
  // checkpoint materialization pinning the ranged dataset (round-2
  // used repartitionByRange + localCheckpoint; the checkpoint wrote
  // the whole projected table to executor storage). The decile follows
  // from the rank by NTILE's closed form: the first n%10 tiles get
  // ⌈n/10⌉ rows, the rest ⌊n/10⌋.
  private def w04(s: SparkSession, d: String): DataFrame = {
    val o = t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"))
    val nRanges = 32
    val probs = (1 until nRanges).map(_.toDouble / nRanges).toArray
    // boundary ties all land in one range (price <= b), so equal-price
    // rows never straddle a boundary and global order is preserved;
    // relativeError trades only range-size balance, never correctness
    val bounds = o.stat.approxQuantile("o_totalprice", probs, 0.001).distinct.sorted
    val rangeId = bounds.zipWithIndex.foldRight(lit(bounds.length): org.apache.spark.sql.Column) {
      case ((b, i), acc) => when(col("o_totalprice") <= lit(b), lit(i)).otherwise(acc)
    }
    val ranged = o.withColumn("pid", rangeId)
    val perPid = ranged.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nTotal = perPid.values.sum
    val pids = perPid.keys.toSeq.sorted
    // pid -> rows in all preceding ranges (exclusive prefix sum)
    val offsets = pids.zip(
      pids.scanLeft(0L)((acc, pid) => acc + perPid(pid)).dropRight(1)).toMap
    val offExpr = offsets.foldLeft(lit(0L)) { case (e, (pid, off)) =>
      when(col("pid") === pid, lit(off)).otherwise(e)
    }
    val localW = Window.partitionBy(col("pid"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val base = nTotal / 10
    val rem = nTotal % 10
    val rn = col("rn")
    // exact while n < 2^53 (double floor-division on long-valued args)
    val decile =
      if (base == 0) rn
      else when(rn <= rem * (base + 1), floor((rn - 1) / (base + 1)) + 1)
        .otherwise(floor((rn - 1 - rem * (base + 1)) / base) + rem + 1)
    ranged
      .withColumn("rn", (row_number().over(localW).cast(LongType)) + offExpr)
      .withColumn("decile", decile.cast(LongType))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice"), 18, 2).as("sum_price"),
        decd(min(col("o_totalprice")), 18, 2).as("min_price"),
        decd(max(col("o_totalprice")), 18, 2).as("max_price"))
      .orderBy("decile")
  }

  private val w04Sql =
    s"""SELECT decile, COUNT(*) AS n, ${dsumSql("o_totalprice", 18, 2)} AS sum_price,
       |  CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS min_price,
       |  CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS DOUBLE) AS max_price
       |FROM (SELECT o_totalprice,
       |        NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
       |      FROM orders) x
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // Grouped top-k via the native TopKByScore aggregate: top-5 orders
  // per priority. With 5 groups, a rank window would shuffle the WHOLE
  // fact into 5 partitions (maximally skewed); the aggregate keeps a
  // bounded k-row buffer per group map-side, so the shuffle carries
  // ≤ partitions × 5 groups × 5 rows at any table size.
  private def w05(s: SparkSession, d: String): DataFrame = {
    val topk = graft.functions.GraftFunctions.topKByScore(
      col("o_totalprice"), col("o_orderkey"),
      struct(col("o_orderkey"), col("o_custkey")), 5)
    t(s, d, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(topk.as("top"))
      .select(col("priority"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("priority"), (col("i") + 1).cast(LongType).as("rn"),
        col("e.payload.o_orderkey").as("o_orderkey"),
        col("e.payload.o_custkey").as("o_custkey"),
        decd(col("e.score"), 18, 2).as("totalprice"))
      .orderBy("priority", "rn")
  }

  private val w05Sql =
    """SELECT priority, rn, o_orderkey, o_custkey,
      |  CAST(CAST(totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
      |FROM (SELECT o_orderpriority AS priority, o_orderkey, o_custkey,
      |        o_totalprice AS totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) x
      |WHERE rn <= 5 ORDER BY 1, 2""".stripMargin

  // CUBE grouping-sets over two dimensions.
  private def a06(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .cube(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 18, 2).as("sum_price"))
      .orderBy(col("status").asc_nulls_first, col("priority").asc_nulls_first)

  private val a06Sql =
    s"""SELECT o_orderstatus AS status, o_orderpriority AS priority, COUNT(*) AS n,
       |  ${dsumSql("o_totalprice", 18, 2)} AS sum_price
       |FROM orders GROUP BY CUBE(1, 2)
       |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // a08: explicit GROUPING SETS — the third grouping-set flavor next
  // to a02's ROLLUP and a06's CUBE, with a chosen (non-prefix, non-
  // powerset) set list the other two can't express: ((flag, status),
  // (flag), ()). grouping_id() disambiguates a grouped-out NULL from a
  // data NULL — emitted as BIGINT on both engines (identical MSB-first
  // bit order, verified: (a,b)→0, (a)→1, ()→3). Plans as an Expand
  // feeding the PARTIAL aggregate inside the scan stage, so the one
  // data-sized exchange ships partially-aggregated (group, set) rows,
  // never ×|sets| raw lineitem rows (PlanAudit-asserted).
  private def a08(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().cast(LongType).as("gid"), count(lit(1)).as("n"),
        dsum(col("l_quantity"), 18, 2).as("sum_qty"))
      .select(col("l_returnflag").as("returnflag"),
        col("l_linestatus").as("linestatus"), col("gid"), col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("returnflag").asc_nulls_first,
        col("linestatus").asc_nulls_first)

  private val a08Sql =
    s"""SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       |  COUNT(*) AS n, ${dsumSql("l_quantity", 18, 2)} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
       |ORDER BY 3, 1 NULLS FIRST, 2 NULLS FIRST""".stripMargin

  // r01: range (interval containment) aggregate — each error event's
  // ±60 s neighborhood over ALL events. The CONSUMER here is an
  // aggregate, so the plan comes from graft.operators.NeighborAgg's
  // cost-based choice: pair enumeration (RangeJoin binned equi join —
  // cheaper constants) while the estimated pair count stays small,
  // the LINEAR distributed timeline sweep (exact per-type prefix sums
  // F/S, three evaluations per anchor) once density × anchors makes
  // the pair stream the bottleneck — at sf10 the pair plan + Spark's
  // multi-countDistinct Expand over the 1.1e9-row stream measured
  // 26.9 s vs 14.1 s warm for the sweep + selector (DuckDB's native
  // IEJoin: 8.9 s), and pairs grow QUADRATICALLY with density while
  // the sweep stays linear. RangeJoin.pointInInterval remains the
  // operator when the pairs themselves are the output (r02, the
  // streaming twin); NeighborAggSpec proves sweep, pair plan and the
  // auto selector value-identical on randomized timelines. Integer
  // micros end to end: counts and the Σ|Δt| are exact on both engines
  // (DuckDB's µs timestamps equal Spark's ns-div-1000 load). The
  // oracle states the textbook non-equi form; DuckDB plans it
  // natively as an IEJoin.
  private def r01(s: SparkSession, d: String): DataFrame = {
    val W = 60000000L // ±60 s in epoch micros
    val ev = t(s, d, "events")
      .select(col("event_id"), col("event_type"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
    graft.operators.NeighborAgg.neighborStatsAuto(
      ev, "event_id", "event_type", "us", "error", W)
      .select(col("event_type").as("nbr_type"), col("n_pairs"),
        col("n_anchors"), col("n_points"), col("sum_abs_dt_us"))
      .orderBy("nbr_type")
  }

  private val r01Sql =
    """SELECT p.event_type AS nbr_type, COUNT(*) AS n_pairs,
      |  COUNT(DISTINCT a.event_id) AS n_anchors,
      |  COUNT(DISTINCT p.event_id) AS n_points,
      |  CAST(SUM(ABS(epoch_us(p.ts) - epoch_us(a.ts))) AS BIGINT) AS sum_abs_dt_us
      |FROM (SELECT * FROM events WHERE event_type = 'error') a
      |JOIN events p
      |  ON epoch_us(p.ts) BETWEEN epoch_us(a.ts) - 60000000
      |                        AND epoch_us(a.ts) + 60000000
      | AND p.event_id <> a.event_id
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // r02: interval-OVERLAP join (the interval×interval sibling of r01)
  // — which users were co-active? Sessionize each user's events by
  // the w03 30-min-gap rule into [first, last]-event intervals, then
  // pair sessions of DIFFERENT users whose intervals overlap, via
  // RangeJoin.intervalOverlap: both session sets replicate to 1-hour
  // bins, equi-join on the bin, and the ownership rule (pair counted
  // only in the bin of the overlap start) keeps exactly-once
  // semantics with no dedup shuffle. The naive form is a non-equi
  // self-join the optimizer can only nested-loop. Aggregated per
  // lower user id; overlap durations are exact integer micros
  // (inclusive instants, hence the +1-free min−max form both sides
  // share). Oracle states the textbook non-equi self-join; DuckDB
  // plans it as an IEJoin.
  private def r02(s: SparkSession, d: String): DataFrame = {
    val gapUs = 1800L * 1000000L
    val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val us = expr("unix_micros(cast(ts as timestamp))")
    val flagged = t(s, d, "events")
      .withColumn("us", us)
      .withColumn("prev_us", lag(col("us"), 1).over(byTs))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("us") - col("prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = flagged.groupBy(col("user_id"), col("sid"))
      .agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
    val a = sessions.select(col("user_id").as("a_user"),
      col("lo").as("a_lo"), col("hi").as("a_hi"))
    val b = sessions.select(col("user_id").as("b_user"),
      col("lo").as("b_lo"), col("hi").as("b_hi"))
    graft.operators.RangeJoin.intervalOverlap(
      a, b, "a_lo", "a_hi", "b_lo", "b_hi", 3600L * 1000000L)
      .filter(col("a_user") < col("b_user"))
      .groupBy(col("a_user").as("user_id"))
      .agg(countDistinct(col("b_user")).as("n_partners"),
        count(lit(1)).as("n_sess_pairs"),
        sum(least(col("a_hi"), col("b_hi")) -
          greatest(col("a_lo"), col("b_lo"))).as("sum_overlap_us"))
      .orderBy("user_id")
  }

  private val r02Sql =
    """WITH e AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us,
      |         LAG(epoch_us(ts), 1) OVER
      |           (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |       FROM events),
      |f AS (SELECT user_id, event_id, ts, us,
      |        CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
      |             THEN 1 ELSE 0 END AS new_s
      |      FROM e),
      |g AS (SELECT user_id, us,
      |        SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |      FROM f),
      |s AS (SELECT user_id, sid, MIN(us) AS lo, MAX(us) AS hi
      |      FROM g GROUP BY 1, 2)
      |SELECT a.user_id AS user_id,
      |  COUNT(DISTINCT b.user_id) AS n_partners,
      |  COUNT(*) AS n_sess_pairs,
      |  CAST(SUM(LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo)) AS BIGINT) AS sum_overlap_us
      |FROM s a JOIN s b
      |  ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi
      |GROUP BY 1 ORDER BY 1""".stripMargin

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r01_range_join" -> r01,
    "r02_interval_overlap" -> r02,
    "a03_approx_sketches" -> a03,
    "a04_anti_join" -> a04,
    "a05_asof_join" -> a05,
    "a06_cube" -> a06,
    "a08_grouping_sets" -> a08,
    "h17_corr_subquery" -> h17,
    "set01_intersect_except" -> set01,
    "w04_ntile_deciles" -> w04,
    "h01_pricing_summary" -> h01,
    "h03_topk_join" -> h03,
    "h04_exists_semi" -> h04,
    "h05_join_chain" -> h05,
    "h06_filter_agg" -> h06,
    "h10_returned_topk" -> h10,
    "h13_outer_join_dist" -> h13,
    "h18_having_join" -> h18,
    "a01_count_distinct" -> a01,
    "a02_rollup" -> a02,
    "w01_running_total" -> w01,
    "w02_rank_per_group" -> w02,
    // big-branch gate twin (see Q.forcedBig / Dashboard *_bigpath):
    // pins the range-partitioned window form so its total-order claim
    // is oracle-hashed, not just argued
    "w02_bigpath" -> Q.forcedBig(w02),
    "w03_sessionize_gap" -> w03,
    "w05_topk_per_group" -> w05)

  override def oracle: Map[String, String] = Map(
    "r01_range_join" -> r01Sql,
    "r02_interval_overlap" -> r02Sql,
    "w05_topk_per_group" -> w05Sql,
    "a04_anti_join" -> a04Sql,
    "a05_asof_join" -> a05Sql,
    "a06_cube" -> a06Sql,
    "a08_grouping_sets" -> a08Sql,
    "h17_corr_subquery" -> h17Sql,
    "set01_intersect_except" -> set01Sql,
    "w04_ntile_deciles" -> w04Sql,
    "h01_pricing_summary" -> h01Sql,
    "h03_topk_join" -> h03Sql,
    "h04_exists_semi" -> h04Sql,
    "h05_join_chain" -> h05Sql,
    "h06_filter_agg" -> h06Sql,
    "h10_returned_topk" -> h10Sql,
    "h13_outer_join_dist" -> h13Sql,
    "h18_having_join" -> h18Sql,
    "a01_count_distinct" -> a01Sql,
    "a02_rollup" -> a02Sql,
    "w01_running_total" -> w01Sql,
    "w02_rank_per_group" -> w02Sql,
    "w02_bigpath" -> w02Sql,
    "w03_sessionize_gap" -> w03Sql)
}
