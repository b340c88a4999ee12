package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the cluster
  * step behind keeper-set deduplication (d07): a near-dup PAIR list
  * is quadratic in cluster size (a 10⁶-copy boilerplate cluster is
  * 5·10¹¹ pairs no matter how good the banding), while the keeper-set
  * output — one row per cluster — is linear in the corpus.
  *
  * Algorithm: Pregel-style min-label propagation (the same shape as
  * GraphX's ConnectedComponents, expressed on DataFrames) PLUS
  * pointer jumping: every node starts labeled with itself; each round
  * every node adopts the minimum label among itself and its
  * neighbors, then shortcuts to its label's label (label(label(n))).
  * The shortcut halves the distance-to-root every round, so
  * convergence is O(log diameter) instead of O(diameter) — without
  * it, a pathological drifting-near-dup CHAIN (A≈B≈C…, A̸≈C: a path
  * graph, which d07's sparse rep+chain edges can produce across
  * buckets) of 10⁶ members would need 10⁶ rounds; with it, ~20.
  * Each round is two joins + one aggregation, all shuffling on node
  * id — cost bounded by |edges| + |nodes| per round. Near-dup
  * clusters are near-cliques (members share LSH buckets), so 2-3
  * rounds in practice. Lineage is truncated per round
  * (localCheckpoint) — labels are value-deterministic, so checkpoint
  * non-determinism concerns don't apply.
  *
  * The per-round driver-side `isEmpty` is the convergence check of
  * the standard iterative-algorithm loop (bounded by the round count),
  * not a data collect.
  */
object ConnectedComponents {

  /** @param edges 2-column DataFrame of undirected edges (a, b)
    * @param maxRounds safety bound (throws beyond it — with pointer
    *        jumping, 50 rounds covers components of diameter ~2⁵⁰)
    * @return (node, keeper) — keeper = min node id of the component;
    *         only nodes that appear in `edges` are labeled */
  def components(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
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
    var round = 0
    while (!converged) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"connected components did not converge in $maxRounds rounds")
      // min incoming neighbor label per node
      val msgs = sym.join(labels, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("keeper")).as("nbr_min"))
      val stepped = labels.join(msgs, col("node") === col("dst"), "left")
        .select(col("node"),
          least(col("keeper"), coalesce(col("nbr_min"), col("keeper"))).as("keeper"),
          (coalesce(col("nbr_min"), col("keeper")) < col("keeper")).as("changed"))
      // pointer jump: keeper ← label(keeper). keeper is always a
      // labeled node (labels are mins over existing node ids), so the
      // left join only misses when keeper == node (already a root)
      val jump = stepped.select(col("node").as("jn"), col("keeper").as("jk"))
      val updated = stepped.join(jump, col("keeper") === col("jn"), "left")
        .select(col("node"),
          least(col("keeper"), coalesce(col("jk"), col("keeper"))).as("keeper"),
          (col("changed") ||
            coalesce(col("jk"), col("keeper")) < col("keeper")).as("changed"))
        .localCheckpoint(true)
      converged = updated.filter(col("changed")).isEmpty
      labels = updated.select("node", "keeper")
    }
    labels
  }
}
