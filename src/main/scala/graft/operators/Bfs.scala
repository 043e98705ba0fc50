package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** All-pairs minimum hop distances over a directed edge list — the
  * reachability face of the graph family next to [[PageRank]] (rank),
  * [[DedupClusters]] (components), and q213's triangle census.
  *
  * This is the driver-local face for DIMENSION-GRAIN graphs (the
  * nation trade graph: ≤|nations|² edges, the bounded-collect pattern
  * q204 established). For graphs that don't collapse to a dimension,
  * the same frontier expansion distributes as an iterative edge join
  * with [[DedupClusters]]'s loop discipline — one shuffle per hop,
  * convergence in diameter rounds, fail-loud on a hop cap — and
  * nothing downstream assumes the small grain.
  *
  * Determinism: plain BFS — each node's distance is fixed the first
  * time the frontier reaches it, independent of edge order; the
  * result map is therefore a pure function of the edge SET.
  */
object Bfs {

  /** Minimum hops between every ordered reachable pair, following
    * edge direction; self-loops and cycle-returns are excluded
    * (`dst != src` — d(s,s) is conventionally 0 and carries no
    * reachability information).
    */
  def allPairsHops(
      edges: Seq[(String, String)]): Map[(String, String), Int] = {
    val adj = edges.filter(e => e._1 != e._2).distinct
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    nodes.flatMap { s =>
      val dist = mutable.Map.empty[String, Int]
      var frontier = adj.getOrElse(s, Set.empty) - s
      var d = 1
      while (frontier.nonEmpty) {
        frontier.foreach(n => dist(n) = d)
        frontier = frontier
          .flatMap(n => adj.getOrElse(n, Set.empty))
          .filterNot(n => n == s || dist.contains(n))
        d += 1
      }
      dist.iterator.map { case (t, h) => ((s, t), h) }
    }.toMap
  }

  /** Distributed face — the frontier expansion as iterative edge
    * joins, for graphs that DON'T collapse to a dimension (doc-level
    * similarity graphs, user interaction graphs). [[BfsSpec]] proves
    * it row-identical to [[allPairsHops]].
    *
    * Per hop: frontier ⋈ edges (one shuffle keyed on the frontier's
    * endpoint), minus already-settled pairs (left-anti on the settled
    * set), dedup, localCheckpoint (truncates the growing lineage —
    * DedupClusters' loop discipline), release the previous round's
    * blocks. Convergence is O(diameter) rounds; hitting `maxHops`
    * with a non-empty frontier FAILS LOUDLY ([[DedupClusters
    * .NotConverged]]'s rule) instead of returning distances that are
    * silently upper bounds. State is the settled pair set — exactly
    * the output — so memory is the answer's own size, the minimum any
    * all-pairs reachability can hold. For single- or few-source BFS
    * (the common corpus-scale ask), seed `sources` to keep the pair
    * frame |sources|×|nodes| instead of all-pairs.
    *
    * @param edges two string columns `src`, `dst`; self-loops ignored
    * @param sources optional source restriction (defaults: every src)
    * @return (src, dst, hops INT) — min hops, dst != src
    */
  def hopsDistributed(
      edges: DataFrame,
      maxHops: Int = 64,
      sources: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    // the edge table keyed by its tail: frontier endpoint = hop_from
    val step = e.select(col("src").as("hop_from"), col("dst"))
    var settled = sources match {
      case None => e.withColumn("hops", lit(1))
      case Some(ss) =>
        e.join(broadcast(ss.select(col("src"))), Seq("src"), "left_semi")
          .withColumn("hops", lit(1))
    }
    settled = settled.localCheckpoint(true)
    var frontier = settled
    var hop = 1
    def expand(f: DataFrame, s: DataFrame, h: Int): DataFrame = f
      .select(col("src"), col("dst").as("hop_from"))
      .join(step, Seq("hop_from"))
      .select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .join(s.select(col("src"), col("dst")),
        Seq("src", "dst"), "left_anti")
      .withColumn("hops", lit(h))
      .localCheckpoint(true)
    while (hop < maxHops && !frontier.isEmpty) {
      hop += 1
      val prevS = settled
      val prevF = frontier
      val next = expand(frontier, settled, hop)
      settled = settled.union(next).localCheckpoint(true)
      prevS.unpersist()
      prevF.unpersist()
      frontier = next
    }
    if (!frontier.isEmpty) {
      // hop == maxHops with frontier pairs settled THIS round: the
      // graph's diameter may equal maxHops exactly, in which case the
      // distances are already complete and the frontier simply has
      // nothing left to expand. Probe one more expansion and fail
      // only if it actually produces new pairs — so maxHops is an
      // inclusive diameter bound, matching the scaladoc.
      val probe = expand(frontier, settled, hop + 1)
      val pending = probe.count()
      probe.unpersist()
      if (pending > 0) {
        settled.unpersist()
        frontier.unpersist()
        throw DedupClusters.NotConverged(maxHops, pending,
          "frontier pairs still expanding")
      }
    }
    frontier.unpersist()
    settled
  }
}
