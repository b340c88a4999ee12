package graft.queries

import graft.etl.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed fixtures for the TpchMore semantics the synthetic
  * data doesn't stress: h21's only-returner EXISTS/NOT-EXISTS pair
  * (single-supplier orders and two-returner orders must both be
  * excluded), h15's MAX-revenue tie (both suppliers emitted), h02's
  * per-part min tie-back, and h22's exact-average threshold combined
  * with never-ordered customers in the anti-join.
  */
class TpchMoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** Tiny TPC-H dir where every query's answer is derivable by hand. */
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft_tpch").toString
    Seq((0, "ASIA")).toDF("r_regionkey", "r_name")
      .write.parquet(s"$d/region.parquet")
    Seq((0, "NATION_3", 0), (1, "NATION_8", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    Seq((1L, "SUPP_A", 0, 100.0), (2L, "SUPP_B", 0, 50.0), (3L, "SUPP_C", 1, 50.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .write.parquet(s"$d/supplier.parquet")
    Seq((1L, "CUST_1", 0, 500.0, "BUILDING"), (2L, "CUST_2", 1, 1000.0, "AUTO"),
      (3L, "CUST_3", 0, 2000.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    Seq((1L, "small ring", "Brand#2", "LARGE", 12, 10.0),
      (2L, "red widget", "Brand#3", "MEDIUM", 20, 5.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .write.parquet(s"$d/part.parquet")
    Seq(
      (1L, 1L, "F", 100.0, ts("1997-02-01 00:00:00"), "1-URGENT"),
      (2L, 1L, "F", 100.0, ts("1997-03-01 00:00:00"), "5-LOW"),
      (3L, 2L, "O", 100.0, ts("2001-01-01 00:00:00"), "2-HIGH"),
      (4L, 2L, "F", 100.0, ts("1997-06-01 00:00:00"), "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    Seq(
      // o1: two suppliers, only s1 returns — the h21 positive case
      (1L, 1L, 1L, 1, 10.0, 100.0, 0.0, 0.0, "R", "F", ts("1997-01-15 00:00:00")),
      (1L, 1L, 2L, 2, 5.0, 50.0, 0.0, 0.0, "N", "F", ts("1997-01-20 00:00:00")),
      // o2: two suppliers, BOTH return — each sees the other's R line
      (2L, 1L, 1L, 1, 10.0, 100.0, 0.0, 0.0, "R", "F", ts("1997-03-05 00:00:00")),
      (2L, 2L, 2L, 2, 40.0, 150.0, 0.0, 0.0, "R", "F", ts("1997-03-06 00:00:00")),
      // o3: open order, other nation, outside h15's quarter
      (3L, 2L, 3L, 1, 35.0, 70.0, 0.0, 0.0, "N", "O", ts("1999-05-01 00:00:00")),
      // o4: single-supplier order with an R line — no other supplier
      (4L, 1L, 1L, 1, 50.0, 60.0, 0.0, 0.0, "R", "F", ts("1997-06-05 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    d
  }

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("h21: only the sole returner on a multi-supplier F order counts") {
    // o1 → SUPP_A qualifies; o2 (two returners) and o4 (no other
    // supplier) are excluded by NOT-EXISTS / EXISTS respectively
    val rows = run("h21_only_returner").map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("SUPP_A", 1L)))
  }

  test("h15: a revenue tie emits every max supplier, ordered by key") {
    // 1997-Q1 revenue (disc=0): s1 = 100+100 = 200, s2 = 50+150 = 200
    val rows = run("h15_top_supplier").map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq == Seq((1L, "SUPP_A", 200.0), (2L, "SUPP_B", 200.0)))
  }

  test("h02: join-back picks the min-balance supplier of the filtered part") {
    // only p1 passes (size 12, LARGE); its suppliers are s1(100), s2(50)
    val rows = run("h02_min_supplier_part").map(r =>
      (r.getLong(0), r.getLong(2), r.getString(3), r.getDouble(5)))
    assert(rows.toSeq == Seq((1L, 2L, "SUPP_B", 50.0)))
  }

  test("h22: exact-avg threshold + anti-join keeps only the dormant rich customer") {
    // avg positive balance = (500+1000+2000)/3 = 1166.666667 exactly at
    // 6 dp; only CUST_3 (2000, zero orders ever) is above it AND dormant
    val rows = run("h22_dormant_customers").map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("AUTO", 1L, 2000.0)))
  }

  test("h12: high/low line counts partition the joined rows") {
    // 1997 shipments: o1(URGENT,2 lines), o2(LOW,2 lines), o4(MEDIUM,1)
    val rows = run("h12_priority_by_status").map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq(("F", 2L, 3L)))
  }

  test("h14: an empty ship window yields one all-null summary row (SQL SUM semantics)") {
    // window 1997-09: no fixture lines ship → global agg over zero
    // rows = single row of NULL sums (matches DuckDB's SUM), and the
    // share division propagates the NULL rather than faking a 0
    val rows = run("h14_promo_share")
    assert(rows.length == 1)
    assert(rows.head.isNullAt(0) && rows.head.isNullAt(1) && rows.head.isNullAt(2))
  }
}
