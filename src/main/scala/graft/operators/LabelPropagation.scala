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
  * Execution shape (the PageRank Pregel pattern, with the t17
  * lesson): the edge list is hash-partitioned on `src` once and
  * cached; each round is one join of the (node, lbl) table against
  * that fixed layout, then ONE [[PackedPairArgmax]] pass — the
  * plurality-with-min-tie rule is exactly that kernel's contract,
  * and the (dst, lbl) pairs are near-unique in early rounds, the
  * reduce-nothing shape where count + argmax aggregates double-build
  * giant maps. O(edges) per round, one exchange of packed 8-byte
  * keys. The labels table is one (long, long) row per node, so it
  * ships to the edges (broadcast while it hashes small), never the
  * reverse. At 100 TB: edges stay partitioned across the cluster;
  * per-round traffic is the packed-pair shuffle — as communities
  * form, the label diversity per dst collapses and rounds get
  * cheaper, not costlier.
  *
  * Node ids must fit the kernel's pack contract (< 2³¹ — labels are
  * node ids and ride the low half; guard-checked, fails loudly).
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
    // Loud contract check (the PackedPairArgmax discipline): each
    // round's inner join keeps only nodes that appear as dst, so a
    // node violating the "every node appears at least once as dst"
    // contract (unsymmetrized graph) would silently VANISH from the
    // result instead of erroring. One anti-join count over the cached
    // edge list — trivial next to a propagation round.
    val orphans = nodes
      .join(ed.select(col("dst").as("node")).distinct(), Seq("node"), "left_anti")
      .count()
    require(orphans == 0L,
      s"LabelPropagation contract violated: $orphans node(s) appear as src " +
        "but never as dst and would be dropped — symmetrize the edge list")
    // broadcast bound is higher than PageRank's 1M: a labels row is
    // two longs (~26 MB hashed at 1.6M nodes — comfortably inside the
    // bench heap), and it keeps each round to one stage up to the
    // argmax. Beyond the bound the plain shuffle join path keeps the
    // cached src partitioning aligned with the previous round's
    // output. (A shuffle_hash hint is NOT the fallback: 32 concurrent
    // per-task hash builds are unspillable consumers and exhaust the
    // pool the kernel's sorts share — measured 3/3 OOM at sf10 where
    // the broadcast form passes.)
    val small = nodes.count() < 4000000L
    var labels = nodes.withColumn("lbl", col("node"))
    for (round <- 1 to rounds) {
      val rhs = if (small) broadcast(labels) else labels
      // The round rule — per dst, the plurality label with ties to
      // the smallest — IS PackedPairArgmax's contract, and the
      // (dst, lbl) pairs entering it are NEAR-UNIQUE in early rounds
      // (round 1: every neighbor carries a distinct self-label, so
      // distinct pairs ≈ directed edges), the reduce-nothing shape
      // where count + argmax AGGREGATES double-build giant maps.
      // Measured at sf10 (1.6M nodes / 12.6M directed edges, 4
      // rounds): declarative pair-count + struct-max 46.4 s → packed
      // kernel 20.1 s, ahead of the single-node baseline (44.5 s).
      // Labels are node ids, so the kernel's b < 2³¹
      // contract bounds supported node ids (guard-checked; g07's
      // encoded keys stay far inside it).
      val next = PackedPairArgmax(
        ed.join(rhs, ed("src") === rhs("node")).select(col("dst"), col("lbl")),
        "dst", "lbl", "node", "lbl", "c")
        .select(col("node"), col("lbl"))
      // Materialize every round but the last (the ConnectedComponents
      // /PageRank pattern; labels are value-deterministic). Without
      // this the k rounds execute as ONE nested DAG whose earlier
      // rounds' broadcast relations stay pinned while the final
      // round's concurrent external sorts reserve pages — observed
      // intermittent UNABLE_TO_ACQUIRE_MEMORY at sf10 on the 8 g
      // bench heap. A labels round is two longs per node (~26 MB at
      // 1.6 M nodes), so the per-round materialization is free. The
      // LAST round stays lazy so callers (and the plan audit) see the
      // real join + kernel plan rather than a checkpoint scan.
      labels = if (round < rounds) next.localCheckpoint(true) else next
    }
    // nodes fed only round 1, and rounds 1..k-1 just materialized
    // eagerly above — release it now (unless rounds == 1, where the
    // still-lazy final round IS round 1 and reads it). `ed` stays
    // cached: the returned final round is deliberately LAZY (so
    // callers and the plan audit see the real join+kernel plan, not a
    // checkpoint scan) and its execution reads ed; the cache lives
    // until the session drops it (Bench clears caches between
    // queries; gate corpora are small).
    if (rounds > 1) nodes.unpersist()
    labels
  }
}
