package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental IVF index maintenance: when a maintained corpus gains a
  * delta of embeddings, the index update is a MAP-SIDE assignment of
  * the delta against the FIXED stored centroids — no k-means refit, no
  * join, no shuffle, no corpus re-scan. The vector twin of
  * [[IncrementalDedup]] (which maintains the shingle pair set the same
  * way), with the same spec-proved invariant: assignment of
  * (corpus ∪ delta) at fixed centroids ≡ stored corpus assignment ∪
  * [[assignDelta]] of the delta (IncrementalVectorsSpec).
  *
  * Quantizer staleness is the caller's visible decision, not a silent
  * drift: [[balanceDrift]] measures how differently the delta
  * distributes over the inverted lists than the standing corpus does
  * (total-variation distance of the first-choice list shares), and
  * [[needsRefit]] turns it into the refit trigger. A drifting delta
  * means the centroids no longer describe the incoming data — recall
  * decays even though every assignment is individually "nearest".
  * Centroids come from wherever the caller keeps them
  * ([[graft.sources.IndexStore.readCentroids]] for the durable tier,
  * [[graft.functions.KMeansLite.fit]] for a refit).
  */
object IncrementalVectors {

  /** Assign a delta of `(vec_id, embedding)` rows to its `nLists`
    * nearest of the FIXED `cents`, producing the stored assignment
    * schema `(vec_id, embedding, nrm, cids)` — the exact shape of the
    * corpus IVF base in [[graft.queries.VectorQueries]], so the union
    * IS the maintained index. Pure map work
    * ([[graft.functions.NearestCentroids]] with codegen): a 1 M-row
    * delta against a 100 TB corpus costs one pass over the delta.
    */
  def assignDelta(
      delta: DataFrame,
      cents: Array[Array[Double]],
      nLists: Int = 2): DataFrame = {
    require(cents.nonEmpty, "cannot assign against zero centroids")
    graft.functions.GraftFunctions.register(delta.sparkSession)
    delta
      .select(col("vec_id"), col("embedding"),
        graft.functions.GraftFunctions.vecNorm(col("embedding")).as("nrm"))
      .withColumn("cids",
        graft.functions.NearestCentroids(col("embedding"), cents, nLists))
  }

  /** Canonical drift threshold — referenced by [[needsRefit]] and the
    * streaming face ([[graft.streaming.VectorIndexMaintenance]]) so
    * the batch and streaming paths can never flag refits differently
    * for the same data.
    */
  val DefaultDriftThreshold = 0.25

  /** First-choice list share distribution of an assigned frame: one
    * small aggregate (NCents rows) collected to the driver. Rows
    * without a usable assignment (null/empty cids — e.g. a row whose
    * embedding was null at assignment time) carry no list evidence
    * and are skipped, not NPE'd on.
    */
  private def listShares(assigned: DataFrame): Map[Int, Double] = {
    val counts = assigned
      .filter(col("cids").isNotNull && size(col("cids")) > 0)
      .select(element_at(col("cids"), 1).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1).toDouble)
    val total = counts.map(_._2).sum
    if (total == 0) Map.empty
    else counts.map { case (k, v) => k -> v / total }.toMap
  }

  /** Assignment-balance drift between the standing corpus and a delta,
    * as total-variation distance of their first-choice list-share
    * distributions: 0 = the delta fills the lists exactly like the
    * corpus does, 1 = entirely different lists. Two small aggregates
    * (one per frame, ≤ NCents result rows each) — cheap enough to run
    * per delivery.
    */
  def balanceDrift(corpusAssigned: DataFrame, deltaAssigned: DataFrame): Double = {
    val b = listShares(deltaAssigned)
    // an empty side carries no drift evidence — without these guards
    // an empty delta (no-op delivery) or an empty standing assignment
    // (first real delivery after an empty table) would read as TV
    // distance 0.5 and spuriously trigger a full refit
    if (b.isEmpty) return 0.0
    val a = listShares(corpusAssigned)
    if (a.isEmpty) return 0.0
    (a.keySet ++ b.keySet).toSeq
      .map(k => math.abs(a.getOrElse(k, 0.0) - b.getOrElse(k, 0.0)))
      .sum / 2.0
  }

  /** Refit trigger: true when the delta's list distribution has
    * drifted past `threshold` (default [[DefaultDriftThreshold]] — a
    * quarter of the delta's mass lands in lists the corpus doesn't
    * use that way).
    * On true, the caller refits ([[graft.functions.KMeansLite.fit]]
    * over corpus ∪ delta) and rebuilds the stored assignment; on
    * false, the stored index plus [[assignDelta]] IS the maintained
    * index.
    */
  def needsRefit(
      corpusAssigned: DataFrame,
      deltaAssigned: DataFrame,
      threshold: Double = DefaultDriftThreshold): Boolean =
    balanceDrift(corpusAssigned, deltaAssigned) > threshold
}
