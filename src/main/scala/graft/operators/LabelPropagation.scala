package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed label propagation (Raghavan et al. 2007) over an edge
  * list, as a FIXED ITERATION COUNT contract so the result is
  * oracle-comparable (run-to-convergence is not: synchronous LPA can
  * oscillate on bipartite structure, and asynchronous update order is
  * engine-defined — k exact synchronous rounds with a total tie order
  * are deterministic on any engine).
  *
  * Round rule: every node starts labeled with itself; each round,
  * node v adopts the label that the most in-neighbors carry, ties to
  * the SMALLEST label — argmax over (count, −label), no floats, no
  * window. Nodes keep the round-r label even if their own label won
  * no plurality elsewhere (labels are values, not owners).
  *
  * Execution shape (the PageRank Pregel pattern): the edge list is
  * hash-partitioned on `src` once and cached; each round is one join
  * of the (node, lbl) table against that fixed layout, one
  * (dst, lbl)-keyed count, and one dst-keyed struct-max argmax —
  * O(edges) per round. The labels table is one (long, long) row per
  * node, so it ships to the edges (broadcast under the same 1M-node
  * bound PageRank uses), never the reverse. At 100 TB: edges stay
  * partitioned across the cluster; per-round traffic is the
  * contribution count's shuffle, whose partial aggregation collapses
  * per-partition duplicates of the SAME (dst, lbl) map-side — as
  * communities form, rounds get cheaper, not costlier.
  *
  * Labels must be non-negative longs (the −label tie encoding).
  */
object LabelPropagation {
  /** `edges`: one row per directed edge (integral `srcCol`,
    * `dstCol`), every node appearing at least once as dst (symmetrize
    * undirected graphs). Returns (node, lbl) after `rounds` exact
    * synchronous rounds.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    val ed = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .repartition(col("src"))
      .cache()
    val nodes = ed.select(col("src").as("node")).distinct().cache()
    val small = nodes.count() < 1000000L
    var labels = nodes.withColumn("lbl", col("node"))
    for (_ <- 1 to rounds) {
      val rhs = if (small) broadcast(labels) else labels
      labels = ed.join(rhs, ed("src") === rhs("node"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst").as("node"))
        .agg(max(struct(col("c"), (-col("lbl")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("lbl"))
    }
    labels
  }
}
