package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster
  * step behind keeper-set deduplication (d07): a near-dup PAIR list
  * is quadratic in cluster size (a 10⁶-copy boilerplate cluster is
  * 5·10¹¹ pairs no matter how good the banding), while the keeper-set
  * output — one row per cluster — is linear in the corpus.
  *
  * Algorithm: Pregel-style alternating min-label propagation (the
  * same shape as GraphX's ConnectedComponents, expressed on
  * DataFrames): every node starts labeled with itself; each round
  * every node adopts the minimum label among itself and its
  * neighbors; stop when a round changes nothing. Each round is one
  * join + one aggregation, both shuffling on node id — cost bounded
  * by |edges| per round, rounds bounded by the component diameter.
  * Near-dup clusters are near-cliques (members share LSH buckets), so
  * 2-3 rounds in practice; termination is guaranteed within the
  * longest shortest path. Lineage is truncated per round
  * (localCheckpoint) — labels are value-deterministic, so checkpoint
  * non-determinism concerns don't apply.
  *
  * The per-round driver-side `count()` is the convergence check of
  * the standard iterative-algorithm loop (bounded by the round count),
  * not a data collect.
  */
object ConnectedComponents {

  /** @param edges 2-column DataFrame of undirected edges (a, b)
    * @return (node, keeper) — keeper = min node id of the component;
    *         only nodes that appear in `edges` are labeled */
  def components(edges: DataFrame): DataFrame = {
    val a = edges.columns(0)
    val b = edges.columns(1)
    // both directions once, so a single round moves labels both ways
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(edges.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("keeper", col("node"))
      .localCheckpoint(true)
    var converged = false
    while (!converged) {
      // min incoming neighbor label per node
      val msgs = sym.join(labels, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("keeper")).as("nbr_min"))
      val updated = labels.join(msgs, col("node") === col("dst"), "left")
        .select(col("node"),
          least(col("keeper"), coalesce(col("nbr_min"), col("keeper"))).as("keeper"),
          (coalesce(col("nbr_min"), col("keeper")) < col("keeper")).as("changed"))
        .localCheckpoint(true)
      converged = updated.filter(col("changed")).isEmpty
      labels = updated.select("node", "keeper")
    }
    labels
  }
}
