package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained shingle-postings index — the mine-side twin of the
  * doc-keyed shingle index, stored so the incremental near-dup miner
  * reads O(batch vocabulary), never O(corpus), per delivery.
  *
  * The doc-keyed index `(doc_id, s: array<long>)` is the right shape
  * for per-doc consumers (cluster rebuild, release, cardinality), but
  * the DELTA MINE consumes it inverted: every batch exploded the FULL
  * standing frame to postings and streamed them past the broadcast
  * delta — a per-batch corpus-wide read that grew linearly with
  * standing size (15.6 s of the 31.2 s batch at 300 k standing docs,
  * r13 BASELINE — the one non-O(batch) maintenance term left).
  *
  * This artifact stores the postings `(doc_id, w1h, g, n)` — `g` the
  * shingle hash (bit-identical to [[graft.functions.ShingleHash]]),
  * `w1h` the seed-42 xxhash64 of the shingle's FIRST token, `n` the
  * doc's distinct-shingle count — hash-bucketed on `w1h`
  * ([[graft.operators.IncrementalLm]]'s `hash(w1)` discipline applied
  * to the miner): a shingle can only match a shingle with the same
  * first token, so the mine reads ONLY the buckets of the batch's
  * first-token vocabulary, then semi-joins `w1h` to the batch's token
  * set before the postings join. Cost shape per batch:
  *
  *   - touched buckets ≤ min(batch first-token vocabulary, numBuckets)
  *     — the lm_counts bound, vocabulary- not corpus-sized;
  *   - rows SCANNED = the touched buckets' mass ≈ corpus postings ×
  *     touched/numBuckets — a linear term with slope 1/numBuckets
  *     (size numBuckets ≫ expected batch vocabulary to keep it flat;
  *     once per-batch vocabulary spans the bucket set the read
  *     degrades to a full parallel scan, the same documented regime
  *     boundary as [[Layout.Hash]] commits);
  *   - rows ENTERING the join = exactly the batch-token postings
  *     (df-bounded), because the `w1h` semi-join drops co-bucketed
  *     strangers after the scan.
  *
  * Commit discipline: set semantics (a bucket's content is a pure
  * function of the corpus), so the upsert is IDEMPOTENT under
  * at-least-once replay with no applied-batch stamps — unlike the
  * additive lm counts. The pipeline sequences this commit BEFORE the
  * corpus/shingle commits (next to the candidates commit), so a
  * replay always derives the retired postings from the still-pre-batch
  * corpus text; after the postings commit lands, the derivation is
  * idempotent whatever the corpus holds (the batch's rows rewrite to
  * the same bytes, the old rows are already gone).
  */
object ShingleIndex {

  /** Fixed at table creation (recorded in [[LayoutFile]], adopted on
    * every later call). 4096 keeps the scanned-mass slope at
    * 1/4096 of the corpus postings per touched bucket while the
    * directory census stays a single LIST call per batch; tests use
    * small counts for speed.
    */
  val DefaultBuckets = 4096

  private val B = PartitionedCommit.BucketCol

  /** Self-describing bucket count: `buckets=N`, written at creation.
    * The count keys the layout — a later caller passing a different
    * default must NOT re-bucket, so the file wins over the parameter.
    */
  val LayoutFile = "_postings_layout"

  /** The one tokenizer of the dedup family (whitespace split, empties
    * dropped) — postings derived here MUST agree with the doc-keyed
    * index's `shingleHashes` derivation or the two artifacts desync.
    */
  def tokensOf(text: Column): Column =
    filter(split(text, " "), tk => length(tk) > 0)

  /** Postings of a `(doc_id, text)` frame: one row per distinct
    * shingle per doc — `(doc_id, w1h, g, n)`, `g` bit-identical to
    * [[graft.functions.ShingleHash]] (spec-proved), `n` the doc's
    * distinct-shingle count carried ON the posting so pair scoring
    * never needs a corpus-wide cardinality join. Docs below 3 tokens
    * produce no rows (their shingle set is empty — they cannot pair).
    */
  def postings(docs: DataFrame): DataFrame = {
    val ps = org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.ShinglePostings(
        org.apache.spark.sql.GraftPlanBridge.expression(
          tokensOf(col("text"))), 3))
    docs
      .select(col("doc_id"), ps.as("ps"))
      .withColumn("n", size(col("ps")).cast("long"))
      .filter(col("n") > 0L)
      .select(col("doc_id"), explode(col("ps")).as("p"), col("n"))
      .select(col("doc_id"), col("p.w1h").as("w1h"), col("p.g").as("g"),
        col("n"))
  }

  /** Bucket of a first-token hash — [[PartitionedCommit.bucketOf]]'s
    * `pmod(xxhash64(w1h), n)`: rehashing the hash is uniform and keeps
    * the one bucket function shared with every Hash-layout artifact.
    */
  def bucketOf(w1h: Column, numBuckets: Int): Column =
    PartitionedCommit.bucketOf(w1h, numBuckets)

  /** The table's bucket count: the recorded layout when the artifact
    * exists, else `default` (which a creating call then records).
    */
  def resolveBuckets(spark: SparkSession, path: String, default: Int): Int =
    recordedBuckets(spark, path).getOrElse(default)

  /** The recorded bucket count, when the layout file exists. */
  def recordedBuckets(spark: SparkSession, path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(path, LayoutFile)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try {
        val bytes = new Array[Byte](f.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        val s = new String(bytes, "UTF-8")
        Some(s.linesIterator.find(_.startsWith("buckets="))
          .map(_.stripPrefix("buckets=").trim.toInt)
          .getOrElse(sys.error(s"unparseable $LayoutFile at $path: $s")))
      } finally in.close()
    }
  }

  private def writeLayout(
      spark: SparkSession, path: String, numBuckets: Int): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(root)) f.mkdirs(root)
    val p = new org.apache.hadoop.fs.Path(root, LayoutFile)
    if (!f.exists(p)) {
      val out = f.create(p, false)
      try out.write(s"buckets=$numBuckets".getBytes("UTF-8"))
      finally out.close()
    }
  }

  /** One-time creation from an existing corpus (migration of a
    * pipeline that predates the postings artifact — the
    * [[IncrementalLm.bootstrapCounts]] discipline): derive all
    * postings in one corpus pass, stage, and install atomically with
    * a single rename; a crash mid-bootstrap leaves only staging
    * residue. No-op when the artifact already exists.
    */
  def bootstrap(
      spark: SparkSession, path: String, corpusDocs: DataFrame,
      numBuckets: Int = DefaultBuckets): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (f.exists(root)) return
    val stage = new org.apache.hadoop.fs.Path(path + ".__bootstage__")
    postings(corpusDocs)
      .withColumn(B, bucketOf(col("w1h"), numBuckets))
      .repartition(col(B)) // one file per bucket dir (see upsert)
      .write.partitionBy(B).mode("overwrite").parquet(stage.toString)
    val lp = new org.apache.hadoop.fs.Path(stage, LayoutFile)
    val out = f.create(lp, true)
    try out.write(s"buckets=$numBuckets".getBytes("UTF-8"))
    finally out.close()
    require(f.rename(stage, root), s"could not install bootstrap $root")
  }

  /** Fold one batch into the index: `newP`/`oldP` are the batch's new
    * postings and the REPLACED docs' standing postings (derived from
    * the pre-batch corpus text of `batchIds ∩ standing`); touched
    * buckets = both sides' bucket sets, and each touched bucket
    * rewrites to (standing minus batch doc_ids) ∪ (its new rows) —
    * set semantics, idempotent under replay. Returns the touched
    * bucket count (0 for an empty batch).
    */
  def upsert(
      spark: SparkSession, path: String, newP: DataFrame, oldP: DataFrame,
      batchIds: DataFrame, numBuckets: Int = DefaultBuckets): Int = {
    val buckets = resolveBuckets(spark, path, numBuckets)
    PartitionedCommit.healInterrupted(spark, path)
    val withB = newP.withColumn(B, bucketOf(col("w1h"), buckets)).persist()
    try {
      val touched = withB.select(col(B)).distinct()
        .unionByName(oldP.select(bucketOf(col("w1h"), buckets).as(B)).distinct())
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      if (touched.isEmpty) return 0
      writeLayout(spark, path, buckets)
      val ids = broadcast(batchIds.select(col("doc_id")).distinct())
      val merged = readTouchedDirs(spark, path, touched) match {
        case None => withB
        case Some(st) => st
          .join(ids, Seq("doc_id"), "left_anti")
          .select(withB.columns.map(col): _*)
          .unionByName(withB)
      }
      // commitPartitions stages one file per bucket dir (its own
      // repartition) — the vocabulary-bounded merge needs nothing here
      PartitionedCommit.commitPartitions(spark, merged, path, touched)
      touched.size
    } finally {
      withB.unpersist()
      ()
    }
  }

  /** Read ONLY the touched bucket directories, by explicit path —
    * `spark.read.parquet(root)` would build a partition index over
    * EVERY bucket dir per call, and a high-numBuckets artifact pays
    * that census twice per batch (the mine's slice and the upsert's
    * merge; measured at 3 M standing: ~7 s of the 8.4 s postings
    * commit wall was listings + planning, not data). Caller must have
    * healed first; never-written touched dirs are skipped (one
    * exists() probe each — touched is vocabulary-bounded); None when
    * no touched dir exists.
    */
  private def readTouchedDirs(
      spark: SparkSession, path: String, touched: Seq[Int])
      : Option[DataFrame] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = touched
      .map(b => new org.apache.hadoop.fs.Path(root, s"$B=$b"))
      .filter(f.exists(_))
      .map(_.toString)
    if (dirs.isEmpty) None
    else Some(spark.read.option("basePath", path).parquet(dirs: _*))
  }

  /** The bucket-pruned delta mine: scored candidates (the
    * `pair_candidates` schema, containment ≥ `floor`) of
    * (delta × standing) ∪ (delta × delta), reading ONLY the postings
    * buckets of the delta's first-token vocabulary. `deltaP` is
    * [[postings]] of the batch; standing rows of `batchIds` are
    * dropped (replacement semantics — and what makes the mine
    * REPLAY-STABLE: after this batch's postings commit lands, the
    * anti-join reproduces the pre-batch standing side exactly).
    * Returns None when the artifact does not exist (caller falls back
    * to the delta-only mine). Spec-proved equal to the full-read
    * [[IncrementalDedup.deltaCandidates]].
    */
  def deltaCandidates(
      spark: SparkSession, path: String, deltaP: DataFrame,
      batchIds: DataFrame, floor: Double): Option[DataFrame] = {
    if (!PartitionedCommit.healInterrupted(spark, path)) return None
    val buckets = recordedBuckets(spark, path).getOrElse(
      sys.error(s"postings table at $path has data but no $LayoutFile"))
    val touched = deltaP.select(bucketOf(col("w1h"), buckets).as(B))
      .distinct().collect().map(_.getInt(0)).toSeq
    Some(mineSlice(readTouchedDirs(spark, path, touched),
      deltaP, batchIds, floor))
  }

  /** [[deltaCandidates]]' body, standing frame injected — the testing
    * seam (the disk path prunes to touched DIRECTORIES before this).
    */
  private[graft] def mineAgainst(
      standing: DataFrame, numBuckets: Int, deltaP: DataFrame,
      batchIds: DataFrame, floor: Double): DataFrame = {
    val touched = deltaP.select(bucketOf(col("w1h"), numBuckets).as(B))
      .distinct().collect().map(_.getInt(0)).toSeq
    mineSlice(Some(standing.filter(col(B).isin(touched: _*))),
      deltaP, batchIds, floor)
  }

  private def mineSlice(
      sliceOpt: Option[DataFrame], deltaP: DataFrame,
      batchIds: DataFrame, floor: Double): DataFrame = {
    val ids = broadcast(batchIds.select(col("doc_id")).distinct())
    val deltaW1h = deltaP.select(col("w1h")).distinct()
    // delta × delta through the hot-key-guarded self miner, same as
    // the full path (the delivery itself can be a near-dup clique)
    val within = SkewJoin
      .saltedSelfPairs(deltaP.select(col("doc_id"), col("g")), "g", "doc_id",
        relativeHot = graft.queries.DedupQueries.MinerRelativeHot)
      .toDF("doc_a", "doc_b")
    val cards = deltaP.select(col("doc_id"), col("n")).distinct()
    val withinScored = graft.queries.DedupQueries
      .scoreCandidatesCards(within, cards, floor)
    sliceOpt match {
      case None => withinScored // no touched standing dir: batch-only
      case Some(slice0) =>
        // touched-dir scan → post-scan vocabulary filter → the
        // postings equi-join; the standing side never shuffles (the
        // delta side broadcasts), and no corpus-wide cardinality join
        // follows because every row carries its doc's n
        val slice = slice0
          .join(broadcast(deltaW1h), Seq("w1h"), "left_semi")
          .join(ids, Seq("doc_id"), "left_anti")
        val d = deltaP.select(col("doc_id").as("d_id"), col("g"),
          col("n").as("d_n"))
        val cross = slice
          .select(col("doc_id").as("c_id"), col("g"), col("n").as("c_n"))
          .join(broadcast(d), Seq("g"))
          .select(
            least(col("d_id"), col("c_id")).as("doc_a"),
            greatest(col("d_id"), col("c_id")).as("doc_b"),
            when(col("d_id") < col("c_id"), col("d_n")).otherwise(col("c_n"))
              .as("na"),
            when(col("d_id") < col("c_id"), col("c_n")).otherwise(col("d_n"))
              .as("nb"))
        val crossScored = cross
          .groupBy(col("doc_a"), col("doc_b"), col("na"), col("nb"))
          .agg(count(lit(1)).as("inter_cnt"))
          .withColumn("jaccard",
            col("inter_cnt").cast("double") /
              (col("na") + col("nb") - col("inter_cnt")).cast("double"))
          .withColumn("containment",
            col("inter_cnt").cast("double") /
              least(col("na"), col("nb")).cast("double"))
          .filter(col("containment") >= floor)
          .select(withinScored.columns.map(col): _*)
        // cross pairs have exactly one standing end, within pairs
        // none — the key spaces are disjoint, so the union IS the
        // candidate set
        crossScored.unionByName(withinScored)
    }
  }
}
