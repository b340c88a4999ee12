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

  // g04: triangle census of the co-active user graph — nodes are
  // users, an edge links two users with ≥1 overlapping 30-min-gap
  // session (r02's sessionize + interval-overlap machinery; the
  // binned RangeJoin keeps the pairing an equi join). The triangle
  // count, wedge count and global clustering coefficient come from
  // graft.operators.TriangleCount — degree-ordered orientation, so
  // the wedge set is bounded by m^{3/2} regardless of hub skew (see
  // the operator scaladoc for why the naive neighbor join is the
  // Σdeg² trap). Everything BIGINT/floor-div exact; the oracle states
  // the textbook three-way self-join over the same edge CTE, which
  // DuckDB plans natively.
  private def g04(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = 1800L * 1000000L
    val byTs = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val flagged = t(s, d, "events")
      .withColumn("us", expr("unix_micros(cast(ts as timestamp))"))
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
    val edges = graft.operators.RangeJoin.intervalOverlap(
      a, b, "a_lo", "a_hi", "b_lo", "b_hi", 3600L * 1000000L)
      .filter(col("a_user") < col("b_user"))
      .select(col("a_user").as("u"), col("b_user").as("v"))
      .distinct()
    graft.operators.TriangleCount.stats(edges, "u", "v")
  }

  private val g04Sql =
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
      |      FROM g GROUP BY 1, 2),
      |edges AS (SELECT DISTINCT a.user_id AS u, b.user_id AS v
      |          FROM s a JOIN s b
      |          ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi),
      |deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS d
      |        FROM (SELECT u AS node FROM edges
      |              UNION ALL SELECT v FROM edges)
      |        GROUP BY 1),
      |tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS t
      |        FROM edges e1
      |        JOIN edges e2 ON e1.v = e2.u
      |        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
      |agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |          COALESCE(CAST(SUM((d * (d - 1)) // 2) AS BIGINT), 0) AS n_wedges
      |        FROM deg)
      |SELECT agg.n_nodes,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
      |  agg.n_wedges,
      |  tri.t AS n_triangles,
      |  CASE WHEN agg.n_wedges = 0 THEN NULL
      |       ELSE CAST((3000000 * tri.t) // agg.n_wedges AS BIGINT)
      |  END AS transitivity_x1e6
      |FROM agg, tri""".stripMargin

  // g05: k-core of the repeat-trade graph (g03's edge construction —
  // customer 2c ↔ supplier 2s+1 when the pair shares ≥2 distinct
  // orders) peeled to the 10-core by graft.operators.KCore: repeatedly
  // drop every node of degree < 10 until a fixed point. Output is one
  // row per surviving node with its core degree — the cohesive trading
  // center stripped of the tree-like fringe.
  //
  // BOUNDED-ROUNDS ORACLE CONTRACT (operator scaladoc): the engine
  // peels at most `kcoreMaxRounds` rounds or THROWS; the oracle
  // unrolls exactly `kcoreMaxRounds` peel CTEs (extra rounds are
  // no-ops once converged), so whenever the engine query succeeds
  // both sides computed the identical true k-core.
  //
  // Scale shape: each peel round is one node-keyed degree aggregate
  // (map-side combined) + two left-semi joins on the surviving node
  // set — O(|E|) per round, lineage truncated per round; no driver-
  // side data beyond the 1-row convergence count.
  private val kcoreK = 10
  private val kcoreMaxRounds = 4

  private def g05(s: SparkSession, d: String): DataFrame = {
    val pairs = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(countDistinct(col("o_orderkey")).as("n_ord"))
      .filter(col("n_ord") >= 2)
    val edges = pairs.select((col("o_custkey") * 2).as("a"),
      (col("l_suppkey") * 2 + 1).as("b"))
    val core = graft.operators.KCore.core(edges, kcoreK, kcoreMaxRounds)
    core.select(col("a").as("n")).unionByName(core.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("core_deg"))
      .select(
        when(pmod(col("n"), lit(2)) === 0, "customer").otherwise("supplier")
          .as("node_type"),
        (col("n") / 2).cast(LongType).as("key"),
        col("core_deg"))
      .orderBy("node_type", "key")
  }

  // The oracle unrolls kcoreMaxRounds peel rounds as CTE pairs
  // (d_i = surviving node set, e_i = filtered edges); converged
  // rounds are no-ops, so the unroll depth only has to be ≥ the
  // engine's bound (which throws past it) for exact agreement.
  private val g05Sql: String = {
    val base =
      """WITH e0 AS (
        |  SELECT o_custkey*2 AS a, l_suppkey*2+1 AS b
        |  FROM (SELECT o_custkey, l_suppkey
        |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |        GROUP BY 1, 2 HAVING COUNT(DISTINCT o_orderkey) >= 2)),""".stripMargin
    val peels = (1 to kcoreMaxRounds).map { i =>
      s"""d$i AS (SELECT n FROM (SELECT a AS n FROM e${i - 1}
         |          UNION ALL SELECT b FROM e${i - 1})
         |        GROUP BY n HAVING COUNT(*) >= $kcoreK),
         |e$i AS (SELECT a, b FROM e${i - 1}
         |        WHERE a IN (SELECT n FROM d$i) AND b IN (SELECT n FROM d$i))""".stripMargin
    }.mkString(",\n")
    val last = s"e$kcoreMaxRounds"
    base + "\n" + peels +
      s"""
         |SELECT CASE WHEN n % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |  n // 2 AS key, CAST(COUNT(*) AS BIGINT) AS core_deg
         |FROM (SELECT a AS n FROM $last UNION ALL SELECT b FROM $last)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // g06: co-purchase pair mining — the bipartite projection of the
  // order⋈part graph (market-basket support counting, the candidate
  // stage of association-rule mining): pairs of parts bought together
  // in ≥ minsup orders, top-20 by (support DESC, p1, p2). Scale shape
  // (the basket-collect form — measured 2.9× faster than the
  // order-keyed self-join it replaces at sf10): group lineitem into
  // per-order sorted distinct baskets — a collect_set aggregate that
  // rides the orderkey-BUCKETED layout with ZERO exchange — then
  // expand each basket's C(b,2) pairs map-side with a nested
  // transform (quadratic only within a basket, ≤7 items in TPC-H)
  // into one map-side-combined (p1, p2) aggregate and a bounded
  // TakeOrdered. The standard hot-item cap bounds the quadratic term
  // under real-world skew (a part carrying > 1/50 of all lineitem
  // rows is excluded before pairing — the d08 frequency-cap idiom;
  // vacuous on TPC-H's uniform parts, binding exactly when a hot item
  // would otherwise explode the expansion). The cap list is collected
  // to the driver: BOUNDED BY CONSTRUCTION at < 50 parts (each holds
  // > Σnf/50 of the total), the KCore/a07 bounded-action class.
  /** g06's streaming pair-expansion kernel over orderkey-clustered,
    * order-grouped (orderkey, partkey) rows: basket-bounded buffer,
    * membership dedup (baskets are ≤ single digits; no pk sort
    * needed), pairs packed into one long while emitting — no per-row
    * boxing, no closures in the hot loop. Exposed at object level so
    * the spec can drive it directly (fixture baskets + the bound).
    *
    * BASKET BOUND (loud, not silent): C(n,2) is computed in Long —
    * the Int product overflows to a NEGATIVE array size past ~65k
    * distinct parts in one basket — and a basket with more than
    * `maxBasket` distinct parts (2^16 → ≤ ~2.1e9 pairs… far past any
    * real order, which holds tens of items) throws a named error
    * instead of materializing a multi-gigabyte pair block per basket.
    * The hot-item DF cap bounds per-PART frequency, not per-order
    * distinct-item count, so this guard is the contract, not dead
    * code. */
  private[graft] val maxBasket = 1 << 16
  private[graft] def pairKernel(rows: Iterator[(Long, Long)]): Iterator[Long] =
    new Iterator[Long] {
      private var buf = new Array[Long](64) // grows with the basket
      private var n = 0
      private var cur = 0L
      private var started = false
      private var out: Array[Long] = Array.emptyLongArray
      private var oi = 0
      private def flush(): Unit = {
        if (n > maxBasket) throw new IllegalStateException(
          s"g06 pair kernel: basket for orderkey=$cur holds $n distinct " +
            s"parts (> $maxBasket) — C(n,2) pair expansion out of contract")
        val m = (n.toLong * (n - 1) / 2).toInt // safe: n ≤ 2^16
        if (out.length < m) out = new Array[Long](m)
        var k = 0
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val a = buf(i); val b = buf(j)
            out(k) = if (a < b) (a << 31) | b else (b << 31) | a
            k += 1; j += 1
          }
          i += 1
        }
        oi = 0
        outLen = k
        n = 0
      }
      private var outLen = 0
      private def advance(): Unit = {
        while (oi >= outLen && rows.hasNext) {
          val (ok, pk) = rows.next()
          if (!started) { started = true; cur = ok; buf(0) = pk; n = 1 }
          else if (ok != cur) { flush(); cur = ok; buf(0) = pk; n = 1 }
          else {
            var i = 0
            var seen = false
            while (i < n && !seen) { seen = buf(i) == pk; i += 1 }
            if (!seen) {
              if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
              buf(n) = pk; n += 1
            }
          }
        }
        if (oi >= outLen && !rows.hasNext && started && n > 0) flush()
      }
      override def hasNext: Boolean = { advance(); oi < outLen }
      override def next(): Long = { val v = out(oi); oi += 1; v }
    }

  private def g06(s: SparkSession, d: String): DataFrame = {
    val li = Tables.load(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val freq = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("nf"))
      .persist() // 1 corpus pass serves both bounded probes below
    val stats = freq.agg(sum(col("nf")).as("n_lines"),
      max(col("l_partkey")).as("max_pk")).collect()(0)
    val (nLines, maxPk) = (stats.getLong(0), stats.getLong(1))
    val hot = freq.filter(col("nf") * 50 > lit(nLines))
      .select(col("l_partkey")).collect().map(_.getLong(0))
    freq.unpersist()
    val kept = if (hot.isEmpty) li else li.filter(!col("l_partkey").isin(hot: _*))
    // Pair expansion as a streaming per-partition kernel over the
    // orderkey-clustered, (orderkey, partkey)-sorted rows — the r01
    // mapPartitions escape hatch, measured at sf10: the declarative
    // forms pay either a 60 M-row self-join (two scans + two sorts,
    // 29.9 s) or a 15 M-group collect_set ObjectHashAggregate
    // (40.5 s); the kernel streams each order's ≤b sorted distinct
    // parts through a basket-bounded buffer and emits its C(b,2)
    // pairs map-side. Two cost-based plan choices (the NeighborAgg
    // selector idiom): (a) the orderkey-bucketed layout already
    // clusters every order inside one sorted bucket file, so the
    // 60 M-row repartition is skipped when the layout is on — plain
    // parquet pays it (rows of one order must be co-located for the
    // kernel to see the whole basket); (b) pairs ship through the
    // count exchange as ONE packed long while partkeys fit 31 bits
    // (checked from the same freq pass), halving the ~90 M-row
    // exchange width; wider keys fall back to the two-column form.
    import org.apache.spark.sql.Encoders
    // grouped-by-order input: the bucketed layout's sorted one-file
    // buckets already deliver it (the added sort self-elides against
    // the scan's reported ordering); plain parquet pays the
    // co-locating repartition + sort
    val clustered =
      if (graft.etl.BucketedLayout.loadIfBucketed(s, d, "lineitem").isDefined)
        kept.sortWithinPartitions("l_orderkey")
      else kept.repartition(col("l_orderkey")).sortWithinPartitions("l_orderkey")
    val tupleEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    // packed-key count while partkeys fit 31 bits (checked from the
    // freq pass — halves the pair-exchange width); wider keys take the
    // two-column form
    val typed = clustered.as[(Long, Long)](tupleEnc)
    val counted =
      if (maxPk < (1L << 31) && maxPk >= 0) {
        // support counting as exchange → primitive sort → run-length:
        // pair keys are ~97% unique here, so a hash aggregate's
        // partial pass reduces nothing and its final pass builds a
        // pairs-sized hash map; sorting each exchanged partition's
        // longs (Arrays.sort, dual-pivot primitive) and run-length
        // counting is the measured faster form and applies the minsup
        // filter in-kernel, so only qualifying pairs surface. Memory
        // holds ONE partition's 8-byte keys — size
        // spark.sql.shuffle.partitions so a partition's pair slice
        // fits (the spill-discipline note from the brief); the
        // declarative wide-key branch below is the graceful fallback.
        typed.mapPartitions(pairKernel _)(Encoders.scalaLong)
          .repartition(col("value"))
          .mapPartitions { it =>
            var arr = new Array[Long](1 << 16)
            var n = 0
            while (it.hasNext) {
              if (n == arr.length) arr = java.util.Arrays.copyOf(arr, n * 2)
              arr(n) = it.next(); n += 1
            }
            java.util.Arrays.sort(arr, 0, n)
            new Iterator[(Long, Long)] {
              private var i = 0
              private var k = 0L
              private var c = 0L
              private def advance(): Unit = {
                c = 0
                while (c < 2 && i < n) {
                  k = arr(i)
                  var j = i
                  while (j < n && arr(j) == k) j += 1
                  c = j - i
                  i = j
                }
              }
              override def hasNext: Boolean = {
                if (c < 2) advance(); c >= 2
              }
              override def next(): (Long, Long) = {
                val out = (k, c); c = 0; out
              }
            }
          }(tupleEnc)
          .toDF("pk12", "n_pairs")
          .select(shiftright(col("pk12"), 31).as("p1"),
            (col("pk12") bitwiseAND lit((1L << 31) - 1)).as("p2"),
            col("n_pairs"))
      } else {
        // wide-key fallback: the declarative distinct + order-keyed
        // equi self-join (correct at any key width; slower — the
        // packed kernel is the measured fast path)
        val items = kept.distinct()
        val a = items.select(col("l_orderkey"), col("l_partkey").as("p1"))
        val b = items.select(col("l_orderkey"), col("l_partkey").as("p2"))
        a.join(b, Seq("l_orderkey")).filter(col("p1") < col("p2"))
          .groupBy(col("p1"), col("p2")).agg(count(lit(1)).as("n_pairs"))
      }
    counted
      .filter(col("n_pairs") >= 2)
      .orderBy(desc("n_pairs"), col("p1"), col("p2"))
      .limit(20)
  }

  private val g06Sql =
    """WITH f AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS nf
      |           FROM lineitem GROUP BY 1),
      |tot AS (SELECT CAST(SUM(nf) AS BIGINT) AS n_lines FROM f),
      |keep AS (SELECT l_partkey FROM f, tot WHERE nf * 50 <= n_lines),
      |items AS (SELECT DISTINCT l_orderkey, l_partkey
      |          FROM lineitem JOIN keep USING (l_partkey)),
      |p AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
      |        CAST(COUNT(*) AS BIGINT) AS n_pairs
      |      FROM items a JOIN items b
      |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |      GROUP BY 1, 2)
      |SELECT p1, p2, n_pairs FROM p WHERE n_pairs >= 2
      |ORDER BY n_pairs DESC, p1, p2 LIMIT 20""".stripMargin

  // g07: community detection by LABEL PROPAGATION on the g02
  // customer–supplier trade graph (same node encoding: 2·custkey /
  // 2·suppkey+1). Four exact synchronous rounds, plurality label
  // with ties to the smallest (operators.LabelPropagation — see its
  // scaladoc for why a fixed round count with a total tie order is
  // the oracle-comparable contract for LPA). Report = community
  // roster sizes split by node side.
  //
  // Scale shape: the edge distinct is one shuffle; each round is a
  // labels→edges ship (broadcast while the labels table hashes
  // small, else the cached src partitioning lines up) into ONE
  // PackedPairArgmax pass — the plurality/min-tie rule is the
  // kernel's contract, and the round's (dst, lbl) pairs are
  // near-unique early (the t17 shape; declarative aggregates 46.4 s
  // → kernel 20.1 s at sf10, ahead of DuckDB's 44.5 s on the
  // unrolled oracle). No window, no driver state; the report is one
  // lbl-keyed aggregate over n_nodes rows. The oracle unrolls the
  // same four rounds as CTEs (the g02/g05 pattern).
  private def g07(s: SparkSession, d: String): DataFrame = {
    val pairs = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct()
    val edges = pairs.select(col("c").as("src"), col("p").as("dst"))
      .union(pairs.select(col("p").as("src"), col("c").as("dst")))
    graft.operators.LabelPropagation.run(edges, "src", "dst", rounds = 4)
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(when(pmod(col("node"), lit(2)) === 0, 1L).otherwise(0L)).as("n_customers"),
        sum(when(pmod(col("node"), lit(2)) === 1, 1L).otherwise(0L)).as("n_suppliers"))
      .orderBy("community")
  }

  private val g07Sql = {
    def round(r: Int): String =
      s"""c$r AS (SELECT e.dst AS node, l.lbl, COUNT(*) AS c
         |      FROM edges e JOIN l${r - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$r AS (SELECT node, lbl FROM (
         |        SELECT node, lbl, ROW_NUMBER() OVER (PARTITION BY node
         |          ORDER BY c DESC, lbl) AS rn FROM c$r) WHERE rn = 1)""".stripMargin
    s"""WITH pairs AS (SELECT DISTINCT o_custkey*2 AS c, l_suppkey*2+1 AS p
       |               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT c AS src, p AS dst FROM pairs
       |          UNION ALL SELECT p, c FROM pairs),
       |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
       |${round(1)},
       |${round(2)},
       |${round(3)},
       |${round(4)}
       |SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       |  CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_customers,
       |  CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers
       |FROM l4 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  override def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g07_label_propagation" -> g07,
    "g02_pagerank" -> g02,
    "g03_connected_components" -> g03,
    "g04_triangle_census" -> g04,
    "g05_kcore" -> g05,
    "g06_copurchase_pairs" -> g06)

  override def oracle: Map[String, String] = Map(
    "g07_label_propagation" -> g07Sql,
    "g02_pagerank" -> g02Sql,
    "g04_triangle_census" -> g04Sql,
    "g05_kcore" -> g05Sql,
    "g06_copurchase_pairs" -> g06Sql)
}
