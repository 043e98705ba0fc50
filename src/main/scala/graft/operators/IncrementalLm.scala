package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental bigram-LM maintenance (the model behind q77, kept
  * fresh the way [[IncrementalDedup]] keeps the shingle index fresh
  * and [[IncrementalVectors]] the IVF lists).
  *
  * The LM state is the corpus bigram-count table `(w1, bigram, bc)`.
  * Counts are ADDITIVE under disjoint corpus union —
  * `counts(corpus ⊎ delta) = counts(corpus) + counts(delta)` — so a
  * delta batch folds in EXACTLY (no approximation, no refit trigger
  * needed, unlike the k-means quantizer): [[merge]] costs one
  * delta-sized count pass plus a vocabulary-bounded sum, never a
  * corpus re-scan, and [[IncrementalLmSpec]] proves incremental ≡
  * one-pass rebuild. Start counts `sc(w1) = Σ bc(w1, ·)` and the
  * cost table derive from the state by vocabulary-bounded
  * aggregation.
  *
  * [[score]] evaluates documents against a FIXED cost table. When the
  * scored corpus is the fitted corpus (q77), every bigram is present
  * and the OOV cost is irrelevant (pass 0); when scoring NEW text
  * against a standing LM, pass [[oovCost]]'s `ln(N + 1)` (N = total
  * bigram mass — "rarer than anything observed") so a delta document
  * is never silently dropped, scored on a subset of its bigrams, or —
  * worst — handed p = 1 for text the model has never seen.
  */
object IncrementalLm {

  /** One row per bigram instance `(doc_id, w1, bigram)`: tokens bind
    * once per row, window enumeration is a codegen'd HOF — the shared
    * exploded-bigram pass under the trainer and every scorer.
    */
  def bigrams(docs: DataFrame): DataFrame =
    docs
      .withColumn("tk",
        filter(split(col("text"), " "), tk => length(tk) > 0))
      .withColumn("n", size(col("tk")))
      .filter(col("n") >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), col("n") - 1),
          i => struct(
            element_at(col("tk"), i).as("w1"),
            concat_ws(" ",
              element_at(col("tk"), i),
              element_at(col("tk"), i + 1)).as("bigram")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.bigram").as("bigram"))

  /** Fit the count state `(w1, bigram, bc)` from a corpus frame. */
  def fit(docs: DataFrame): DataFrame =
    bigrams(docs)
      .groupBy(col("w1"), col("bigram"))
      .agg(count(lit(1)).as("bc"))

  /** Per-document term frequencies `(doc_id, w1, bigram, tf)` — the
    * KEYED form of the LM state a maintained pipeline stores: because
    * rows carry their doc_id, an updated document's old bigrams retire
    * by key upsert (batch wins per doc) exactly like the shingle
    * index, with no subtract-old-text step and no crash window between
    * a count commit and a corpus commit. [[countsFromTf]] folds it to
    * the aggregate state.
    */
  def docTf(docs: DataFrame): DataFrame =
    bigrams(docs)
      .groupBy(col("doc_id"), col("w1"), col("bigram"))
      .agg(count(lit(1)).as("tf"))

  /** Aggregate count state from the stored per-doc tf table — one
    * vocabulary-bounded shuffle, never a corpus text re-scan.
    */
  def countsFromTf(tf: DataFrame): DataFrame =
    tf.groupBy(col("w1"), col("bigram"))
      .agg(sum(col("tf")).as("bc"))

  /** Fold a DELTA batch of documents into standing counts — exact,
    * delta-sized: the only corpus-grain work is counting the delta;
    * the merge shuffles vocabulary-bounded count rows.
    */
  def merge(standing: DataFrame, deltaDocs: DataFrame): DataFrame =
    standing.unionByName(fit(deltaDocs))
      .groupBy(col("w1"), col("bigram"))
      .agg(sum(col("bc")).as("bc"))

  /** Cost table `(w1, bigram, cost_micro)` from the count state.
    * `cost_micro = round(1e6·ln(sc/bc))` — one exact integer per
    * vocabulary entry, so per-document sums are
    * aggregation-order-independent (q77's float discipline).
    */
  def costTable(counts: DataFrame): DataFrame = {
    val sc = counts.groupBy(col("w1")).agg(sum(col("bc")).as("sc"))
    counts.join(sc, "w1")
      .select(col("w1"), col("bigram"),
        round(log(col("sc").cast("double") / col("bc").cast("double"))
          * 1000000.0, 0).cast("long").as("cost_micro"))
  }

  /** Score documents against a fixed cost table: per doc, mean
    * `cost_micro/1e6` over its bigram instances (q77's output shape
    * `(doc_id, n_bigrams, nll)`). `oovCostMicro` prices bigrams the
    * table has never seen — derive it with [[oovCost]] when scoring
    * text the model was not fitted on. Deliberately NO default: a
    * silent 0 would price unseen bigrams as p = 1, handing
    * keyboard-mash the best score in the corpus — the exact documents
    * a perplexity filter exists to drop. Pass 0 explicitly only when
    * scoring the fitted corpus itself, where OOV cannot occur.
    */
  def score(
      docs: DataFrame,
      cost: DataFrame,
      oovCostMicro: Long): DataFrame =
    bigrams(docs)
      .groupBy(col("doc_id"), col("w1"), col("bigram"))
      .agg(count(lit(1)).as("tf"))
      .join(cost, Seq("w1", "bigram"), "left")
      .withColumn("c", coalesce(col("cost_micro"), lit(oovCostMicro)))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).cast("long").as("n_bigrams"),
        sum(col("tf") * col("c")).as("tot"))
      .select(col("doc_id"), col("n_bigrams"),
        round(col("tot").cast("double") /
          (col("n_bigrams").cast("double") * 1000000.0), 6).as("nll"))
      .orderBy(col("doc_id"))

  /** Out-of-vocabulary cost from the count state: `ln(N + 1)` micros,
    * N = total bigram mass (an unseen continuation is priced as rarer
    * than any observed one). One tiny aggregate over the vocabulary
    * table.
    */
  def oovCost(counts: DataFrame): Long = {
    val n = counts.agg(coalesce(sum(col("bc")), lit(0L)).cast("long"))
      .head().getLong(0)
    oovCostOfMass(n)
  }

  /** [[oovCost]] from an already-known total mass (the maintained
    * counts artifact keeps N in its bucket markers — no scan needed).
    */
  def oovCostOfMass(n: Long): Long =
    math.round(math.log(n.toDouble + 1.0) * 1000000.0)

  // ---------------------------------------------------------------
  // Maintained counts artifact — the delta-sized standing model.
  //
  // The aggregate state `(w1, bigram, bc)` is ADDITIVE, so a batch
  // folds in as a ± delta derived from the keyed per-doc tf artifact:
  //   delta = docTf(batch docs) − standing tf rows of the batch keys.
  // Additive application is NOT naturally idempotent under
  // at-least-once replay, so the artifact is bucketed by
  // `hash(w1)` and every bucket commit carries an applied-batch STAMP
  // in its marker ([[PartitionedCommit.BucketMarkerFile]], atomic
  // with the bucket's rows): on replay, a bucket whose stamp equals
  // the batch's stamp is skipped — exactly-once per (batch, bucket).
  // The marker also carries the bucket's bigram MASS, so the total N
  // (the OOV price) is a driver-side sum over markers, never a scan.
  //
  // Cost shape: delta is batch-sized; the merge reads and rewrites
  // only the buckets holding the batch's w1 values — O(batch
  // vocabulary share), never O(standing vocabulary), and never the
  // corpus-grain re-aggregation of the standing tf table this
  // replaces (the r11 lm_score term that grew with corpus size).
  // Bucketing by w1 (not by bigram) is what makes the drift score
  // cheap too: a w1's ENTIRE row group lives in one bucket, so
  // `sc(w1)` for the batch's w1 set is exact on the pruned slice.
  // ---------------------------------------------------------------

  /** Bucket count of the maintained counts artifact. Fixed at table
    * creation (it keys the layout); 64 keeps per-bucket mass in the
    * tens-of-MB range up to ~10^9-bigram vocabularies while touched
    * buckets stay ≤ min(batch w1s, 64).
    */
  val CountsBuckets = 64

  private val B = PartitionedCommit.BucketCol

  private def countsBucket(w1: Column): Column =
    PartitionedCommit.bucketOf(w1, CountsBuckets)

  /** ± delta of the aggregate counts: `docTf(new) − old tf rows`,
    * zero rows dropped. Both inputs are batch-key-scoped tf frames.
    */
  def deltaCounts(newTf: DataFrame, oldTf: DataFrame): DataFrame =
    newTf.select(col("w1"), col("bigram"), col("tf").as("d"))
      .unionByName(
        oldTf.select(col("w1"), col("bigram"), (-col("tf")).as("d")))
      .groupBy(col("w1"), col("bigram"))
      .agg(sum(col("d")).as("d"))
      .filter(col("d") =!= 0L)

  /** Deterministic replay stamp of a batch: order-independent sum of
    * per-row hashes over the columns that define the batch's identity.
    */
  def batchStamp(batch: DataFrame, cols: Seq[String]): String = {
    // decimal-space sum: a long sum of 64-bit hashes overflows under
    // ANSI arithmetic on the second row
    val h = batch.agg(coalesce(
      sum(xxhash64(cols.map(col): _*).cast("decimal(38,0)")),
      lit(0).cast("decimal(38,0)")))
      .head().getDecimal(0)
    s"stamp=$h"
  }

  /** Apply one batch's delta to the maintained counts artifact at
    * `countsPath`, exactly once per bucket (stamp-gated; see the
    * section comment). `oldTf` must be the standing tf rows of the
    * batch's keys read BEFORE the tf artifact commits — calling this
    * AFTER the tf commit is also safe (the delta computes to zero).
    * Returns the number of touched buckets (0 on a fully-stamped
    * replay or an empty delta).
    */
  def upsertCounts(
      countsPath: String, newTf: DataFrame, oldTf: DataFrame,
      stamp: String): Int = {
    val spark = newTf.sparkSession
    val delta = deltaCounts(newTf, oldTf)
      .withColumn(B, countsBucket(col("w1")))
      .persist()
    try {
      val touchedAll = delta.select(col(B)).distinct()
        .collect().map(_.getInt(0)).toSeq.sorted
      if (touchedAll.isEmpty) return 0
      val standing = PartitionedCommit.readIfAny(spark, countsPath)
      val stamped = PartitionedCommit.readBucketMarkers(spark, countsPath)
        .collect { case (b, m) if m.linesIterator.contains(stamp) => b }
        .toSet
      // buckets already stamped with THIS batch landed in a previous
      // attempt (crash between bucket swaps, or between the counts and
      // tf commits) — exactly-once means skipping them on the replay
      val touched = touchedAll.filterNot(stamped)
      if (touched.isEmpty) return 0
      val deltaSlice = delta.filter(col(B).isin(touched: _*))
      val merged = (standing match {
        case None => deltaSlice
        case Some(st) => st
          .filter(col(B).isin(touched: _*)) // planning-time pruning
          .select(col("w1"), col("bigram"), col("bc").as("d"), col(B))
          .unionByName(deltaSlice)
      })
        .groupBy(col("w1"), col("bigram"), col(B))
        .agg(sum(col("d")).as("bc"))
        // bc < 0 is only reachable by re-applying a negative delta to
        // a bucket a crash emptied (its marker died with the dir);
        // dropping it reconverges to the emptied state
        .filter(col("bc") > 0L)
        .select(col("w1"), col("bigram"), col("bc"), col(B))
      // per-bucket mass rides the marker so the OOV total needs no
      // scan. Persisted: the mass rollup AND the commit's stage write
      // both consume `merged` — unpersisted, the standing-bucket read
      // + merge aggregation would execute twice per batch on the hot
      // counts path (r12 ADVICE).
      val mergedP = merged.persist()
      try {
        val massByBucket = mergedP.groupBy(col(B))
          .agg(sum(col("bc")).as("m"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val markers = touched.map(b =>
          b -> s"$stamp\nmass=${massByBucket.getOrElse(b, 0L)}").toMap
        PartitionedCommit.commitPartitions(
          spark, mergedP, countsPath, touched, markers)
        touched.size
      } finally {
        mergedP.unpersist()
        ()
      }
    } finally {
      delta.unpersist()
      ()
    }
  }

  /** One-time creation of the counts artifact from an EXISTING
    * standing tf table (migration of a pre-counts pipeline): one
    * vocabulary-bounded aggregation, then an ATOMIC single-rename
    * install — a crash mid-bootstrap leaves only staging residue, so
    * a replay never sees (and never increments against) a partial
    * base. No-op when the artifact already exists.
    */
  def bootstrapCounts(countsPath: String, tf: DataFrame): Unit = {
    val spark = tf.sparkSession
    val root = new org.apache.hadoop.fs.Path(countsPath)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(root)) return
    val stage = new org.apache.hadoop.fs.Path(countsPath + ".__bootstage__")
    val counts = countsFromTf(tf).withColumn(B, countsBucket(col("w1")))
    counts.repartition(col(B)) // one file per bucket dir (see upsertCounts)
      .write.partitionBy(B).mode("overwrite").parquet(stage.toString)
    val mass = spark.read.parquet(stage.toString)
      .groupBy(col(B)).agg(sum(col("bc")).as("m"), count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    mass.foreach { case (b, m, n) =>
      val p = new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(stage, s"$B=$b"),
        PartitionedCommit.BucketMarkerFile)
      val out = f.create(p, true)
      try out.write(s"rows=$n\nstamp=boot\nmass=$m".getBytes("UTF-8"))
      finally out.close()
    }
    require(f.rename(stage, root), s"could not install bootstrap $root")
  }

  /** Total bigram mass of the maintained counts artifact, from its
    * bucket markers — driver-side O(buckets), no scan. A bucket
    * without a mass line (never written by [[upsertCounts]]) falls
    * back to scanning just that bucket.
    */
  def totalMass(spark: org.apache.spark.sql.SparkSession,
      countsPath: String): Long = {
    if (!PartitionedCommit.healInterrupted(spark, countsPath)) return 0L
    val markers = PartitionedCommit.readBucketMarkers(spark, countsPath)
    val masses = markers.values.flatMap(_.linesIterator
      .find(_.startsWith("mass="))
      .map(_.stripPrefix("mass=").toLong))
    if (masses.size == markers.size && markers.nonEmpty) masses.sum
    else spark.read.parquet(countsPath)
      .agg(coalesce(sum(col("bc")), lit(0L)).cast("long")).head().getLong(0)
  }

  /** The standing counts rows of a w1 SET (batch-sized), read with
    * planning-time bucket pruning — the drift score's model slice.
    * Exact per-w1 (`sc`) because a w1's rows all live in its bucket.
    */
  def countsSlice(
      spark: org.apache.spark.sql.SparkSession, countsPath: String,
      w1s: DataFrame): DataFrame = {
    val buckets = w1s.select(countsBucket(col("w1")).as(B)).distinct()
      .collect().map(_.getInt(0)).toSeq
    PartitionedCommit.readIfAny(spark, countsPath) match {
      case None => spark.emptyDataFrame
          .withColumn("w1", lit(null).cast("string"))
          .withColumn("bigram", lit(null).cast("string"))
          .withColumn("bc", lit(null).cast("long"))
      case Some(st) => st
        .filter(col(B).isin(buckets: _*))
        .drop(B)
        .join(broadcast(w1s.select("w1").distinct()), Seq("w1"), "left_semi")
    }
  }
}
