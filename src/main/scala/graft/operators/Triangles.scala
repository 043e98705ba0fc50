package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed per-node triangle counting over the undirected simple
  * support of an edge list — the scale face of q213's census, next to
  * [[Bfs]] (reachability), [[PageRank]] (rank), and [[DedupClusters]]
  * (components) in the graph family's two-face discipline: a
  * dimension-grain caller can stay on plain joins, but a corpus-grain
  * graph (doc-similarity edges, user interaction edges) needs a plan
  * whose wedge fan-out is bounded by structure, not by hub degree.
  *
  * Algorithm: degree orientation (the node-iterator / "forward"
  * MapReduce formulation). Each undirected edge points from its
  * lower-(degree, name) endpoint to the higher; every triangle then
  * has exactly ONE node with two out-edges in the oriented DAG (its
  * three nodes are totally ordered by (degree, name), and only the
  * least emits two), so enumerating out-neighbor pairs per node and
  * closing them against the edge set counts each triangle exactly
  * once — no /3 correction, no duplicate elimination. The payoff at
  * scale: oriented out-degree is O(√m) for ANY graph (a node with
  * out-degree d has d neighbors of degree ≥ d, so d(d−1) ≤ 2m), which
  * caps the wedge fan-out a hub can emit at O(m) pairs total where
  * the naive per-node enumeration is Θ(Σ deg²) — a single
  * corpus-scale hub (every boilerplate doc linked to one template)
  * would otherwise emit |corpus|² wedges from one reducer. Two
  * edge-keyed hash joins (wedge build on the apex, closure on the
  * canonical pair), both AQE-skew-eligible; nothing collects.
  *
  * Determinism: the (degree, name) total order is a pure function of
  * the edge SET, so the oriented DAG — and with it every count — is
  * edge-order and duplicate independent ([[TrianglesSpec]] pins it,
  * and pins ≡ the O(n³) definitional brute force on chains, cliques,
  * stars, bipartite squares, and LCG-random graphs).
  */
object Triangles {

  /** Per-node profile of the undirected simple support: `node`,
    * `deg` (distinct neighbors), `tri` (triangles through the node).
    * Self-loops are dropped; parallel/reversed duplicates collapse.
    * Nodes with no surviving edge do not appear (no edges ⇒ no row —
    * callers with an authoritative node dimension left-join it, the
    * q213 pattern).
    *
    * @param edges two string columns `src`, `dst`
    */
  def perNode(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).cast("long").as("deg"))
    // orient a→b toward the higher (deg, name); ties break on name,
    // total because und is simple (a ≠ b)
    val aLow = deg.select(col("node").as("a"), col("deg").as("da"))
    val bLow = deg.select(col("node").as("b"), col("deg").as("db"))
    val oriented = und.join(aLow, Seq("a")).join(bLow, Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("u"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("v"))
    // wedges at the least apex (out-degree ≤ O(√m) bounds the pair
    // fan-out); canonicalize the open pair so the closing join is a
    // plain equi-join against und (an OR-of-directions closure would
    // demote to a nested-loop join)
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("x"),
        col("e1.v").as("lo"), col("e2.v").as("hi"))
    val tri = wedges
      .join(und, col("lo") === col("a") && col("hi") === col("b"),
        "left_semi")
    val perNodeTri = tri
      .select(explode(array(col("x"), col("lo"), col("hi"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).cast("long").as("tri"))
    deg.join(perNodeTri, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri"), lit(0L)).as("tri"))
  }
}
