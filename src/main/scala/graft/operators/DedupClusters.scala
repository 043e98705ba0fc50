package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Connected-components cluster assignment over near-duplicate pairs
  * (north star: dedup needs *clusters*, not just pairs — every doc
  * maps to a canonical representative so one survivor per cluster can
  * be kept).
  *
  * Algorithm: iterative min-label propagation — every node repeatedly
  * adopts the smallest label among itself and its neighbors until a
  * fixpoint. Each iteration is one shuffle. Convergence is
  * O(graph diameter) rounds (one hop per round), NOT O(log n) — the
  * logarithmic bound belongs to large-star/small-star (Kiveris et
  * al., "Connected Components in MapReduce and Beyond"), which this
  * loop does not implement. On realistic dup graphs that distinction
  * is moot (dup clusters are tiny and dense — 2–3 rounds in
  * practice), and a pathological long chain FAILS LOUDLY: hitting
  * `maxIters` without a fixpoint throws [[NotConverged]] instead of
  * silently returning wrong labels. Driver-side work is one count per
  * round on an aggregated frame — no `collect()` of data.
  */
object DedupClusters {

  final case class NotConverged(iters: Int, stillChanging: Long)
    extends RuntimeException(
      s"min-label propagation did not reach a fixpoint in $iters rounds " +
        s"($stillChanging labels still changing): the pair graph has a " +
        s"component with diameter > $iters. Raise maxIters, or pre-split " +
        "the component — returning the partial labels would silently " +
        "mis-cluster.")

  /** @param pairs near-dup edges with two long columns (`aCol`,`bCol`)
    * @return (id LONG, cluster LONG) — cluster = min id reachable;
    *         singletons (ids never appearing in pairs) are absent, by
    *         design: join the corpus with `coalesce(cluster, id)`.
    * @throws NotConverged if `maxIters` rounds pass without a fixpoint
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
    var cached: DataFrame = null // the persisted frame `labels` derives from
    var converged = false
    var lastChanges = 0L
    var it = 0
    while (!converged && it < maxIters) {
      // propagate, carrying the old label alongside so convergence is
      // read off the same materialized round. localCheckpoint (eager)
      // both materializes the round and TRUNCATES lineage — `labels`
      // appears twice in the round's plan, so without truncation the
      // logical plan would double every round (exponential analysis
      // cost on long chains).
      val next = sym
        .join(labels.toDF("b", "nb_cluster"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("nb_cluster")).as("cluster"))
        .join(labels.toDF("id", "old"), Seq("id"))
        .localCheckpoint(true)
      val changes = next
        .agg(coalesce(sum(when(col("cluster") =!= col("old"), 1L)
          .otherwise(0L)), lit(0L))) // sum over 0 rows is NULL
        .head().getLong(0)
      converged = changes == 0L
      lastChanges = changes
      if (cached != null) cached.unpersist()
      cached = next
      labels = next.select(col("id"), col("cluster"))
      it += 1
    }
    sym.unpersist()
    if (!converged) throw NotConverged(maxIters, lastChanges)
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
