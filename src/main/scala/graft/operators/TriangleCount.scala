package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact triangle counting by degree-ordered edge orientation (the
  * MapReduce wedge algorithm of Suri & Vassilvitskii, WWW'11, rooted
  * in Chiba–Nishizeki).
  *
  * Input: one row per UNDIRECTED edge with u < v, no duplicates, no
  * self-loops. Orient every edge from its lower endpoint to its
  * higher endpoint under the total order (degree, id). Every triangle
  * then has EXACTLY one corner with both its triangle edges outgoing
  * (its lowest-ordered vertex), so
  *
  *   triangles = |{ wedge (a→b, a→c), b ≺ c : oriented edge b→c }|,
  *
  * counted by one equi self-join on the wedge center plus one equi
  * join of the wedge set against the oriented edge set — never a
  * cartesian, never an unbounded neighborhood product.
  *
  * Why orientation is the 100 TB design and not a nicety: the naive
  * neighbor self-join generates Σ deg(v)² wedges — one celebrity node
  * with 10 M neighbors contributes 10^14 rows on its own. Under the
  * (degree, id) order every out-degree is bounded by O(√m) (a vertex
  * with out-degree d has d neighbors of degree ≥ its own, so
  * d² ≤ Σdeg = 2m), giving Σ outdeg² ≤ m^{3/2} TOTAL — skew-proof:
  * the hub's edges all orient INTO it and it centers no wedges. Both
  * joins shuffle on plain keys (center id; (b,c) pair), so 1000
  * executors split the wedge set evenly.
  */
object TriangleCount {

  /** One-row exact summary of the undirected graph:
    *   n_nodes, n_edges,
    *   n_wedges       = Σ_v C(deg v, 2)   (paths of length 2),
    *   n_triangles,
    *   transitivity_x1e6 = (3·10^6·n_triangles) div n_wedges
    *     (the global clustering coefficient in exact fixed-point —
    *      NULL when the graph has no wedges),
    * all BIGINT, engine-independent (counts and floor divisions
    * only). `edges` must hold distinct undirected edges with
    * `uCol` < `vCol`.
    */
  def stats(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = edges.select(col(uCol).cast(LongType).as("u"),
      col(vCol).cast(LongType).as("v"))

    val deg = e.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))

    // orient by (degree, id); carry the dst order key for the wedge
    // ordering below
    val du = deg.select(col("node").as("u"), col("d").as("du"))
    val dv = deg.select(col("node").as("v"), col("d").as("dv"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = e.join(du, "u").join(dv, "v")
      .select(when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))

    // wedges at their lowest-ordered corner: out-neighbor pairs in
    // (degree, id) order — an equi self-join on the center
    val o1 = oriented.select(col("src"), col("dst").as("b"),
      col("ddst").as("db"))
    val o2 = oriented.select(col("src"), col("dst").as("c"),
      col("ddst").as("dc"))
    val wedges = o1.join(o2, Seq("src"))
      .where(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
      .select(col("b"), col("c"))

    // a wedge closes iff its (b ≺ c) leg is an oriented edge
    val closing = oriented.select(col("src").as("b"), col("dst").as("c"))
    val triangles = wedges.join(closing, Seq("b", "c"))
      .groupBy().agg(count(lit(1)).as("n_triangles"))

    val degStats = deg.groupBy().agg(
      count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("(d * (d - 1)) div 2")), lit(0L)).as("n_wedges"))
    val edgeStats = e.groupBy().agg(count(lit(1)).as("n_edges"))

    // one-row × one-row × one-row: broadcast cross of scalar totals
    degStats.crossJoin(edgeStats).crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") === 0, lit(null).cast(LongType))
          .otherwise(expr("(3000000 * n_triangles) div n_wedges"))
          .as("transitivity_x1e6"))
  }
}
