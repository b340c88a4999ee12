package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph analytics over relations (the iterative-computation family;
  * the other member is the connected-components clustering inside
  * d07 — graft.operators.ConnectedComponents).
  */
object GraphOps extends QueryModule {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  // g02: PageRank centrality on the customer–supplier trade graph —
  // nodes are customers and suppliers (disambiguated as 2·custkey /
  // 2·suppkey+1), one undirected edge per distinct trading pair from
  // orders⋈lineitem, symmetrized so every node has outdegree ≥ 1 (no
  // dangling-mass term). graft.operators.PageRank runs 5 exact
  // integer iterations (scaled-long ranks, floor division — see the
  // operator scaladoc for why exactness makes an iterative
  // fixed-point oracle-comparable at all); output is the top 10 nodes
  // per node type. The oracle unrolls the same 5 iterations as CTEs —
  // DuckDB's `//` and Spark's `div` are the same floor division on
  // these all-positive longs.
  //
  // Scale shape: the pair-distinct is one shuffle; PageRank caches
  // the degreed edge list partitioned on src and pays one
  // contribution shuffle per iteration (the Pregel pattern); top-10
  // per type is the rank-window idiom, rewritten to a bounded
  // map-side aggregate by plans.TopKRewrite.
  private def g02(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
      .union(pairs.select(col("p").as("src"), col("c").as("dst")))
    val ranks = graft.operators.PageRank.run(edges, "src", "dst", iters = 5)
    val typed = ranks.select(
      when(pmod(col("node"), lit(2)) === 0, "customer").otherwise("supplier")
        .as("node_type"),
      (col("node") / 2).cast(LongType).as("key"),
      col("r"))
    val w = Window.partitionBy(col("node_type")).orderBy(desc("r"), col("key"))
    typed.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= 10)
      .select(col("node_type"), col("rnk"), col("key"), col("r"))
      .orderBy("node_type", "rnk")
  }

  private val g02Sql =
    """WITH pairs AS (SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS p
      |               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |edges AS (SELECT c AS src, p AS dst FROM pairs
      |          UNION ALL SELECT p, c FROM pairs),
      |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY 1),
      |ed AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
      |st AS (SELECT COUNT(DISTINCT src) AS n,
      |         1000000000000 // COUNT(DISTINCT src) AS r_init,
      |         (15 * 1000000000000) // (100 * COUNT(DISTINCT src)) AS b
      |       FROM edges),
      |r0 AS (SELECT DISTINCT src AS node, st.r_init AS r FROM edges, st),
      |r1 AS (SELECT ed.dst AS node, st.b + SUM((r.r * 85) // (100 * ed.deg)) AS r
      |       FROM ed JOIN r0 r ON ed.src = r.node, st GROUP BY 1, st.b),
      |r2 AS (SELECT ed.dst AS node, st.b + SUM((r.r * 85) // (100 * ed.deg)) AS r
      |       FROM ed JOIN r1 r ON ed.src = r.node, st GROUP BY 1, st.b),
      |r3 AS (SELECT ed.dst AS node, st.b + SUM((r.r * 85) // (100 * ed.deg)) AS r
      |       FROM ed JOIN r2 r ON ed.src = r.node, st GROUP BY 1, st.b),
      |r4 AS (SELECT ed.dst AS node, st.b + SUM((r.r * 85) // (100 * ed.deg)) AS r
      |       FROM ed JOIN r3 r ON ed.src = r.node, st GROUP BY 1, st.b),
      |r5 AS (SELECT ed.dst AS node, st.b + SUM((r.r * 85) // (100 * ed.deg)) AS r
      |       FROM ed JOIN r4 r ON ed.src = r.node, st GROUP BY 1, st.b),
      |typed AS (SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
      |            node // 2 AS key, r,
      |            CAST(ROW_NUMBER() OVER (PARTITION BY CASE WHEN node % 2 = 0
      |                THEN 'customer' ELSE 'supplier' END
      |              ORDER BY r DESC, node // 2) AS BIGINT) AS rnk
      |          FROM r5)
      |SELECT node_type, rnk, key, CAST(r AS BIGINT) AS r
      |FROM typed WHERE rnk <= 10 ORDER BY 1, 2""".stripMargin

  // g03: connected components as a first-class gate-checked query
  // (the operator — graft.operators.ConnectedComponents, pointer-
  // jumping min-label propagation — previously ran only inside d07's
  // keeper-set clustering and its specs). Graph: the REPEAT-trade
  // relation — an edge links customer 2c and supplier 2s+1 when the
  // pair shares ≥2 distinct orders (the one-off pairs that would
  // collapse everything into a trivial clique are excluded by the
  // threshold, matching how entity-resolution graphs are sparsified
  // in practice). Output is one row per component: representative
  // (= min node id, the operator's keeper contract), size, and the
  // per-type split. Oracle: independent Python union-find over the
  // same pair extraction (scripts/py_oracles.py) — an iterative
  // fixed-point needs no unrolled-SQL trick when the checker can run
  // a real disjoint-set structure.
  //
  // Scale shape: pair aggregation is one (cust, supp)-keyed shuffle
  // with partial count-distinct; each CC round is two node-keyed
  // joins + one aggregate, O(log diameter) rounds (operator scaladoc);
  // the component summary is a keeper-keyed hash aggregate.
  private def g03(s: SparkSession, d: String): DataFrame = {
    val pairs = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(countDistinct(col("o_orderkey")).as("n_ord"))
      .filter(col("n_ord") >= 2)
    val edges = pairs.select((col("o_custkey") * 2).as("a"),
      (col("l_suppkey") * 2 + 1).as("b"))
    graft.operators.ConnectedComponents.components(edges)
      .groupBy(col("keeper"))
      .agg(
        count(lit(1)).as("n_nodes"),
        sum(when(pmod(col("node"), lit(2)) === 0, 1L).otherwise(0L)).as("n_customers"),
        sum(when(pmod(col("node"), lit(2)) === 1, 1L).otherwise(0L)).as("n_suppliers"))
      .select(col("keeper").as("comp_rep"), col("n_nodes"),
        col("n_customers"), col("n_suppliers"))
      .orderBy("comp_rep")
  }

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g02_pagerank" -> g02,
    "g03_connected_components" -> g03)

  override def oracle: Map[String, String] = Map(
    "g02_pagerank" -> g02Sql)
}
