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

  final case class NotConverged(iters: Int, stillChanging: Long, what: String)
    extends RuntimeException(
      s"connected components did not reach a fixpoint in $iters rounds " +
        s"($stillChanging $what): raise maxIters, or pre-split the " +
        "component — returning the partial result would silently " +
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
    if (!converged)
      throw NotConverged(maxIters, lastChanges, "labels still changing")
    labels
  }

  /** One survivor per cluster: the minimum id (deterministic). Input
    * as [[assign]]; output (cluster LONG, survivor LONG, size LONG).
    */
  def survivors(pairs: DataFrame, aCol: String, bCol: String): DataFrame =
    assign(pairs, aCol, bCol)
      .groupBy(col("cluster"))
      .agg(min(col("id")).as("survivor"), count(lit(1)).as("size"))

  /** Connected components in O(log n) rounds via alternating
    * large-star/small-star (Kiveris et al., "Connected Components in
    * MapReduce and Beyond") — the scale path for graphs whose
    * components can be DEEP (long chains), where [[assign]]'s
    * one-hop-per-round min-label propagation would need O(diameter)
    * rounds. Two shuffles per round instead of one, so on the shallow
    * dense clusters of real near-dup graphs [[assign]] is cheaper;
    * choose this form when depth is unknown or adversarial.
    *
    * Each round: large-star points every neighbor LARGER than u at
    * u's minimum neighborhood label (halving long chains), small-star
    * re-hangs the smaller neighbors onto that minimum. Fixpoint =
    * star forests; every node's remaining edge is (node → component
    * min). Same output contract as [[assign]].
    */
  def assignLogRounds(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 25): DataFrame = {
    val ids = pairs
      .select(col(aCol).cast("long").as("id"))
      .union(pairs.select(col(bCol).cast("long").as("id")))
      .distinct()
    var edges = pairs
      .select(col(aCol).cast("long").as("u"), col(bCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

    // cheap order-independent fingerprint: (count, xor of edge
    // hashes) — xor, not sum: ANSI mode makes a long-sum overflow
    // throw, and xor is overflow-free and order-independent
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    def largeStar(e: DataFrame): DataFrame = {
      val nbrs = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      nbrs.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val mins = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
      val hang = oriented.join(mins, Seq("u"))
        .select(col("v").as("u"), col("m").as("v"))
      val self = mins.select(col("u"), col("m").as("v"))
      hang.union(self)
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var fp = fingerprint(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      // each round materializes a fresh localCheckpoint; release the
      // previous round's blocks or up to maxIters edge-set copies pin
      // executor storage for the session
      val prev = edges
      edges = smallStar(largeStar(edges)).localCheckpoint(true)
      prev.unpersist()
      val nfp = fingerprint(edges)
      converged = nfp == fp
      fp = nfp
      it += 1
    }
    if (!converged) {
      edges.unpersist()
      throw NotConverged(maxIters, fp._1, "star edges at abort")
    }

    // fixpoint edges are (node → component min) stars; ids with no
    // surviving edge are their own component minimum
    ids
      .join(edges.toDF("id", "root"), Seq("id"), "left")
      .select(col("id"), coalesce(col("root"), col("id")).as("cluster"))
  }
}
