package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list, with EXACT integer
  * arithmetic so two engines computing the same iteration count get
  * bit-identical ranks (no float sum-order or libm drift).
  *
  * Ranks are scaled longs at `Scale` = 1e12. With damping d = 0.85:
  *
  *   r₀(v)    = Scale div N
  *   rₖ₊₁(v) = (15·Scale) div (100·N)
  *             + Σ over in-edges (u,v):  (rₖ(u)·85) div (100·deg(u))
  *
  * Every operation is long multiply / floor-divide / order-free long
  * sum — deterministic on any engine. The floor losses mean Σr drifts
  * slightly below Scale; that loss is itself deterministic and
  * identical across engines, which is the point: this is a FIXED
  * ITERATION COUNT contract (power iteration to convergence is not
  * oracle-comparable; k fixed steps of exact arithmetic are).
  *
  * Execution shape (the Pregel pattern on DataFrames): the degreed
  * edge list is hash-partitioned on `src` ONCE and cached; each
  * iteration is one join of ranks against that fixed layout (ranks
  * arrive partitioned on `node` = src from the previous groupBy, so
  * the join reuses both partitionings) plus one shuffle for the
  * `groupBy(dst)` re-aggregation — O(edges) per step, k steps, no
  * driver-side data movement. At 100 TB the same plan holds: edges
  * partition across the cluster, ranks are one long per node, and
  * the only per-iteration traffic is the contribution shuffle.
  *
  * Overflow: rank < Scale = 1e12, ×85 < 8.5e13 — far inside int64.
  *
  * Dangling nodes: callers must pass an edge list where every node
  * has outdegree ≥ 1 (e.g. symmetrize an undirected graph); this
  * keeps the contract free of the dangling-mass redistribution term.
  */
object PageRank {
  val Scale = 1000000000000L

  /** `edges` must have integral columns (`srcCol`, `dstCol`), one row
    * per directed edge, every node appearing at least once as src.
    * Returns (node, r) after `iters` exact iterations.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    val deg = edges.groupBy(col(srcCol).as("src")).agg(count(lit(1)).as("deg"))
    // the deg join's own shuffle leaves the output hash-partitioned on
    // src — cache THAT layout (an explicit repartition(src) here would
    // be a second, redundant exchange)
    val ed = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .join(deg, "src")
      .cache()
    // node set materialized ONCE (it seeds r₀ and supplies N); without
    // the cache the distinct's shuffle re-runs inside the final plan
    val nodes = ed.select(col("src").as("node")).distinct().cache()
    val n = nodes.count()
    val base = (15L * Scale) / (100L * n)
    var ranks = nodes.withColumn("r", lit(Scale / n))
    // ranks is one (long, long) row per node — orders of magnitude
    // smaller than the edge list, so ship ranks to the edges, never
    // the reverse. n is EXACT (just counted), so the broadcast choice
    // is data-driven, not a blind hint: under ~1M nodes (≈16 MB
    // hashed) broadcast-join each iteration against the cached edge
    // list — one stage per iteration, no sort; beyond that fall back
    // to the shuffle join, where ed's cached src partitioning lines
    // up with ranks' groupBy output and neither side re-shuffles.
    val small = n < 1000000L
    for (_ <- 1 to iters) {
      val rhs = if (small) broadcast(ranks) else ranks
      ranks = ed.join(rhs, ed("src") === rhs("node"))
        .select(col("dst"), expr("(r * 85) div (100 * deg)").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg((lit(base) + sum(col("contrib"))).as("r"))
    }
    ranks
  }
}
