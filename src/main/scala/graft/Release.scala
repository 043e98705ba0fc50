package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch corpus RELEASE — the end-to-end path a training run consumes
  * (ref behavioral progenitor: the reference's whole-batch "Process
  * Files" run, `Batch Processor.py:287-365`, composed set-at-a-time
  * from this library's pieces instead of per-record stages):
  *
  *   1. near-dup clusters collapse to one survivor each
  *      ([[graft.queries.DedupQueries.clusterMap]] — q36's exact
  *      Jaccard components; survivor = `is_dup = 0`),
  *   2. the quality gate drops documents below `minQuality`
  *      (q31's score, shared [[graft.queries.TextQueries
  *      .qualityScores]] base),
  *   3. PII is scrubbed (q67's shared `scrubPii` chain — the released
  *     corpus never holds a raw email/IP/phone),
  *   4. the result ships as k balanced, manifested, verifiable shards
  *      ([[graft.sources.ShardWriter]]).
  *
  * Every filter is a LEFT SEMI join on a narrow (doc_id) frame — the
  * corpus text crosses the wire exactly once, into the shard writer.
  * `equalizeSources = true` additionally applies q69's source-mixing
  * arithmetic over the kept frame before export, so the SHIPPED
  * mixture is token-mass-equalized. The report's reconciliation
  * `inputDocs = dupDropped + qualityDropped + mixDropped +
  * releasedDocs` is a REAL check, not an identity: the frame handed
  * to the shard writer is counted independently while `releasedDocs`
  * comes from the committed manifest (disk), so an export that lost
  * or duplicated rows fails the `require` instead of silently
  * absorbing into a drop count.
  *
  * The streaming twin is [[graft.streaming.DocumentPipeline]] (scrub
  * and mine per delivery, standing artifacts maintained in lockstep);
  * this is the one-shot batch face over a fixture/corpus directory.
  */
object Release {

  final case class ReleaseReport(
      inputDocs: Long,
      dupDropped: Long,
      qualityDropped: Long,
      releasedDocs: Long,
      shards: Seq[graft.sources.ShardWriter.ShardManifest],
      mixDropped: Long = 0L) {
    // Not a tautology: releasedDocs is the committed manifest's row
    // count (re-read from disk) while the drop terms derive from
    // counts of the frames ACTUALLY handed down the pipeline — the
    // sum telescopes to "rows given to the shard writer == rows the
    // manifest certifies on disk", the failure the export layer could
    // otherwise hide.
    require(
      inputDocs == dupDropped + qualityDropped + mixDropped + releasedDocs,
      s"release accounting broken: $this")
  }

  /** Release the corpus under `sfDir` to a shard export at `dest`.
    * Returns the committed manifest and the drop accounting.
    * `bestQualitySurvivors` switches the per-cluster survivor rule
    * from min-id (q36's, first-crawled-wins) to highest-quality-score
    * (q84's — of N mirrored copies ship the cleanest); both read the
    * same cached cluster map, the quality rule adds one narrow score
    * join + cluster argmax.
    */
  def release(
      spark: SparkSession,
      sfDir: String,
      dest: String,
      shardCount: Int = 16,
      minQuality: Double = 0.0,
      equalizeSources: Boolean = false,
      bestQualitySurvivors: Boolean = false,
      jsonl: Boolean = false): ReleaseReport = {
    val corpus = graft.sources.Tables(spark, sfDir, "documents")
    val survivors =
      if (bestQualitySurvivors)
        graft.queries.DedupQueries.qualitySurvivorMap(spark, sfDir)
          .filter(col("keep") === 1).select(col("doc_id"))
      else
        graft.queries.DedupQueries.clusterMap(spark, sfDir)
          .filter(col("is_dup") === 0).select(col("doc_id"))
    // the fixture corpus is raw: scrub on the way out
    ship(corpus, survivors, dest, shardCount, minQuality, scrub = true,
      equalizeSources, jsonl)
  }

  /** Release FROM the standing state a [[graft.streaming
    * .DocumentPipeline]] maintains — corpus and pair-candidates paths
    * instead of a fixture dir. This is the 100 TB release shape: the
    * pipeline already paid for dedup mining (the candidates artifact)
    * and PII scrubbing (the stored corpus is redacted), so the release
    * re-mines NOTHING — it clusters the stored pairs at the consumer's
    * threshold, gates quality, and ships. `jaccardThreshold` must be
    * ≥ the pipeline's candidate floor (the artifact is complete down
    * to the floor, silent below it).
    */
  def fromStanding(
      spark: SparkSession,
      corpusPath: String,
      candidatesPath: String,
      dest: String,
      shardCount: Int = 16,
      minQuality: Double = 0.0,
      jaccardThreshold: Double = 0.5,
      equalizeSources: Boolean = false,
      jsonl: Boolean = false): ReleaseReport = {
    require(jaccardThreshold >= graft.queries.DedupQueries.CandidateFloor,
      s"threshold $jaccardThreshold below the stored candidate floor " +
        s"${graft.queries.DedupQueries.CandidateFloor}: the artifact is " +
        "silent below the floor, the release would under-drop")
    val corpus = standingRead(spark, corpusPath).getOrElse(
      throw new IllegalArgumentException(s"no standing corpus at $corpusPath"))

    // no candidates artifact = no mined pairs = everything survives
    val survivors = standingRead(spark, candidatesPath) match {
      case None => corpus.select(col("doc_id"))
      case Some(cands) =>
        val pairs = cands
          .filter(col("jaccard") >= jaccardThreshold)
          .select(col("doc_a"), col("doc_b"))
        val losers = graft.operators.DedupClusters.assign(pairs, "doc_a", "doc_b")
          .filter(col("id") =!= col("cluster")) // min-label ⇒ survivor = min id
          .select(col("id").as("doc_id"))
        corpus.select(col("doc_id")).join(losers, Seq("doc_id"), "left_anti")
    }
    // the stored corpus is already scrubbed (the pipeline's contract);
    // scrubbing again would pay the regex chain a second time over
    // 100 TB for an idempotent no-op
    ship(corpus, survivors, dest, shardCount, minQuality, scrub = false,
      equalizeSources, jsonl)
  }

  /** Layout-aware healed read of a standing artifact: heals the
    * bucket-grain parked dirs of the partitioned layout AND the
    * whole-dir swap window of the unpartitioned one (each heal is a
    * no-op on the other layout — [[graft.operators.PartitionedCommit
    * .healInterrupted]] only restores `__bucket=` dirs, [[graft
    * .operators.CommitSink.healInterrupted]] only a fully-absent
    * dest). The bucket column never leaks into a release.
    */
  private def standingRead(
      spark: SparkSession,
      path: String): Option[org.apache.spark.sql.DataFrame] = {
    import graft.operators.{CommitSink, PartitionedCommit}
    if (PartitionedCommit.healInterrupted(spark, path))
      Some(spark.read.parquet(path).drop(PartitionedCommit.BucketCol))
    else if (CommitSink.healInterrupted(spark, path))
      Some(spark.read.parquet(path))
    else None
  }

  /** The shared release tail: quality-gate → semi joins → optional
    * source equalization → optional scrub → shard export → reconciling
    * report. One definition so the fixture and standing paths cannot
    * drift.
    */
  private def ship(
      corpus: org.apache.spark.sql.DataFrame,
      survivors: org.apache.spark.sql.DataFrame,
      dest: String,
      shardCount: Int,
      minQuality: Double,
      scrub: Boolean,
      equalizeSources: Boolean,
      jsonl: Boolean = false): ReleaseReport = {
    val spark = corpus.sparkSession
    val inputDocs = corpus.count()
    val survivorDocs = survivors.count()
    // Zero-token discipline: scoreOf yields NULL for a whitespace-only
    // doc (guarded division — raw 0/0 is a hard ANSI error, NaN
    // otherwise, and Spark orders NaN ABOVE every double so it would
    // pass any floor). NULL fails `>=` and the doc drops; the isnan
    // guard stays as defense in depth should a future score path
    // reintroduce an unguarded float division.
    val gated = graft.queries.TextQueries.scoreOf(corpus)
      .filter(col("score") >= minQuality && !isnan(col("score")))
      .select(col("doc_id"))
    // both gates are (doc_id)-only frames: the narrow projection is
    // the real win (corpus text never duplicates through a join);
    // broadcast-vs-shuffle for the semi joins is AQE's call by size
    val kept = corpus
      .join(survivors, Seq("doc_id"), "left_semi")
      .join(gated, Seq("doc_id"), "left_semi")
    // q69's mixing arithmetic over the KEPT frame (shared
    // [[TextQueries.sourceRates]] — rates computed AFTER dedup +
    // quality so the shipped mixture is equalized, not the raw
    // corpus): integer-thousandth rates + the deterministic
    // hash-membership filter — same mixture on every engine/run.
    // Release masses are WHITESPACE token counts regardless of the
    // BPE session flag (the standing path has no fixture dir to learn
    // merges from; one tokenizer for both release paths beats a
    // flag-dependent mixture). `floorOne` keeps a ≥1000× source in
    // the mixture at the minimum rate instead of silently dropping
    // it, and the null-source group joins through a sentinel key
    // (an equi-join on a null source matches nothing — those docs
    // would vanish and be miscounted as mixDropped).
    val MixKey = "__mix_src"
    val (mixed, keptDocsOpt) =
      if (!equalizeSources) (kept, None)
      else {
        require(kept.columns.contains("source"),
          "equalizeSources needs a 'source' column in the corpus")
        val keptP = kept.persist() // consumed by count + rates + export
        val srcKey = coalesce(col("source").cast("string"), lit("\u0000null"))
        val tok = keptP.select(col("doc_id"), srcKey.as("source"),
          size(filter(split(col("text"), " "), tk => length(tk) > 0))
            .cast("long").as("n_tok"))
        val rates = graft.queries.TextQueries
          .sourceRates(tok, floorOne = true)
          .select(col("source").as(MixKey), col("rate_k"))
        val eq = keptP
          .withColumn(MixKey, srcKey)
          .join(broadcast(rates), Seq(MixKey))
          .filter(expr(
            graft.queries.Q.knuthBucketSql("doc_id", 1000)) < col("rate_k"))
          .drop(MixKey, "rate_k")
        (eq, Some(keptP.count()))
      }
    val released =
      if (scrub)
        mixed.withColumn("text",
          graft.queries.TextQueries.scrubPii(col("text")))
      else mixed
    // The rows handed to the shard writer are OBSERVED on the same
    // execution that writes them — no second corpus pass — while
    // releasedDocs below is the committed manifest re-read from disk.
    // That independence is what arms ReleaseReport's reconciliation
    // check against an export losing rows. (The scrub rewrites text
    // in place, never drops rows, so the observed count is also the
    // post-mix row count.)
    val obs = new org.apache.spark.sql.Observation("release_rows")
    val observed = released.observe(obs, count(lit(1)).as("rows"))
    // same shard assignment, manifest, and crash contract either way;
    // jsonl is the loader-facing text interchange, parquet the
    // analytical layout
    val manifest =
      if (jsonl) graft.sources.ShardWriter.writeJsonl(
        spark, observed, dest, shardCount, "doc_id")
      else graft.sources.ShardWriter.write(
        spark, observed, dest, shardCount, "doc_id")
    val mixedDocs = obs.get("rows").asInstanceOf[Long]
    if (equalizeSources) kept.unpersist()
    val releasedDocs = manifest.map(_.rows).sum
    // without equalization nothing drops between the gates and the
    // writer, so the observed write count IS the kept count
    val keptDocs = keptDocsOpt.getOrElse(mixedDocs)
    ReleaseReport(
      inputDocs,
      dupDropped = inputDocs - survivorDocs,
      qualityDropped = survivorDocs - keptDocs,
      releasedDocs = releasedDocs,
      shards = manifest,
      mixDropped = keptDocs - mixedDocs)
  }
}
