package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Connected-components cluster assignment over near-duplicate pairs
  * (north star: dedup needs *clusters*, not just pairs — every doc
  * maps to a canonical representative so one survivor per cluster can
  * be kept).
  *
  * Algorithm: iterative min-label propagation (the simple alternating
  * form of large-star/small-star; Kiveris et al., "Connected
  * Components in MapReduce and Beyond"): every node repeatedly adopts
  * the smallest label among itself and its neighbors until a fixpoint.
  * Each iteration is one shuffle; convergence is O(log n) rounds on
  * realistic dup graphs (dup clusters are tiny and dense, so in
  * practice 2–3 rounds). Driver-side work is one `isEmpty` check per
  * round on an aggregated frame — no `collect()` of data.
  */
object DedupClusters {

  /** @param pairs near-dup edges with two long columns (`aCol`,`bCol`)
    * @return (id LONG, cluster LONG) — cluster = min id reachable;
    *         singletons (ids never appearing in pairs) are absent, by
    *         design: join the corpus with `coalesce(cluster, id)`.
    */
  def assign(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): DataFrame = {
    // Persist the input edges BEFORE fanning them into the 4-way union:
    // `pairs` is typically an expensive candidate-pair plan (q36 feeds
    // the full shingle inverted-index join in), and without the persist
    // each union branch would recompute it.
    val edges = pairs.select(col(aCol).cast("long").as("a"),
      col(bCol).cast("long").as("b")).persist()
    // undirected: keep both directions, plus self-loops to retain ids
    val sym = edges
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .union(edges.select(col("a"), col("a").as("b")))
      .union(edges.select(col("b").as("a"), col("b").as("b")))
      .distinct()
      .persist()
    sym.count() // materialize once; iterations reuse
    edges.unpersist()

    var labels = sym.groupBy(col("a").as("id"))
      .agg(min(col("b")).as("cluster"))
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // propagate: each id adopts min(cluster) over neighbors' labels
      val next = sym
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("cluster")).as("cluster"))
        .persist()
      next.count()
      val changed = next.as("n")
        .join(labels.as("l"), col("n.id") === col("l.id"))
        .filter(col("n.cluster") =!= col("l.cluster"))
        .limit(1)
      converged = changed.isEmpty
      labels.unpersist()
      labels = next
      it += 1
    }
    sym.unpersist()
    labels
  }

  /** One survivor per cluster: the minimum id (deterministic). Input
    * as [[assign]]; output (cluster LONG, survivor LONG, size LONG).
    */
  def survivors(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    assign(pairs, aCol, bCol)
      .groupBy(col("cluster"))
      .agg(min(col("id")).as("survivor"), count(lit(1)).as("size"))
}
