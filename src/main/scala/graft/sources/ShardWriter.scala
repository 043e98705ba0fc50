package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Balanced training-shard export — the RELEASE writer at the end of
  * the pipeline (ref behavioral progenitor: the reference's one-shot
  * "save processed batch" output, `Batch Processor.py:347-361`,
  * generalized to the sharded layout a data loader consumes).
  *
  * A trained-on corpus ships as k fixed shards so loaders can assign
  * shard ↔ worker without a coordinator. The contract here:
  *
  *   - shard(row) = pmod(xxhash64(key), k) — a pure function of the
  *     KEY, so re-exports of the same corpus (any row order, any
  *     partitioning, any cluster size) place every document in the
  *     same shard. No rand(), no round-robin, no task-id dependence.
  *   - exactly ONE parquet file per shard: all rows of a shard value
  *     hash to one task of the pre-write `repartition(k, shard)`, so
  *     each hive `shard=N/` dir receives a single part file. At 100 TB
  *     a shard is still one ownable unit (raise k, not files-per-shard;
  *     the writer takes k as the scale knob).
  *   - a MANIFEST (`_manifest.json`) computed by RE-READING the
  *     staged files — rows + an order-independent content digest
  *     (bit_xor of per-row xxhash64 over all columns) per shard — so
  *     the manifest certifies bytes on disk, not the plan that was
  *     supposed to produce them.
  *   - staging + backup-rename swap and read-back verification, same
  *     crash contract as [[graft.operators.CommitSink]] (heal with
  *     [[graft.operators.CommitSink.healInterrupted]] before reads).
  *
  * [[verify]] recomputes the digests from the committed files and
  * compares them to the manifest — the integrity check a consumer
  * runs before training (a lost/truncated/bit-rotted shard surfaces
  * as a digest mismatch, not as silently-missing documents).
  */
object ShardWriter {

  final case class ShardManifest(shard: Int, rows: Long, digest: Long)

  final case class ShardVerificationFailed(dest: String, detail: String)
    extends RuntimeException(s"shard export at $dest failed verify: $detail")

  private val ManifestName = "_manifest.json"
  private val SchemaName = "_schema.json"

  /** Shared export tail: stats from the STAGED files, row-count
    * reconciliation against the observed write, manifest (+ optional
    * schema sidecar), backup-rename swap. Every writer variant ends
    * here so the crash/verify contract cannot drift between formats.
    */
  private def sealStaging(
      spark: SparkSession,
      dest: String,
      staging: String,
      expected: Long,
      readStaged: String => DataFrame,
      schemaJson: Option[String]): Seq[ShardManifest] = {
    // manifest from the staged files, not the input plan: certify
    // disk. A zero-row export is legal (a fully-filtered release):
    // the staged dir then has no part files or schema to re-read, and
    // its manifest is empty.
    val stats =
      if (expected == 0L) Seq.empty[ShardManifest]
      else shardStats(readStaged(staging))
    val total = stats.map(_.rows).sum
    if (total != expected)
      throw ShardVerificationFailed(dest,
        s"staged rows $total != written rows $expected")
    val conf = spark.sparkContext.hadoopConfiguration
    val stagingPath = new Path(staging)
    val fs = stagingPath.getFileSystem(conf)
    writeManifest(fs, new Path(staging, ManifestName), stats)
    schemaJson.foreach { j =>
      val out = fs.create(new Path(staging, SchemaName), true)
      try out.write(j.getBytes("UTF-8")) finally out.close()
    }
    swapIn(fs, stagingPath, new Path(dest))
    stats
  }

  /** Per-shard (rows, digest) of a frame already carrying `shard`. */
  private def shardStats(df: DataFrame): Seq[ShardManifest] = {
    val dataCols = df.columns.filter(_ != "shard").sorted.map(col)
    df.groupBy(col("shard"))
      .agg(count(lit(1)).as("rows"),
        // bit_xor is order- and partition-independent — the digest is
        // a pure function of the row multiset, never of layout. The
        // row hash spans ALL data columns in sorted-name order so the
        // digest pins content, not just keys. (An even row-count of
        // identical rows xors to 0 for that pair — acceptable for a
        // corruption check; rows also carries cardinality.)
        bit_xor(xxhash64(struct(dataCols: _*))).as("digest"))
      .collect()
      .map(r => ShardManifest(r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_.shard)
      .toSeq
  }

  /** Export `df` as exactly `k` shards under `dest`, keyed by
    * `keyCol`. Returns the committed manifest.
    */
  def write(
      spark: SparkSession,
      df: DataFrame,
      dest: String,
      k: Int,
      keyCol: String,
      codec: String = "zstd"): Seq[ShardManifest] = {
    require(k > 0, s"shard count must be positive, got $k")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column")
    // Heal a PRIOR interrupted swap before staging: a previous export
    // that crashed between its two renames left the only committed
    // copy parked at `dest.__old__` — without this, swapIn would
    // delete that backup before the new commit lands, and a failure
    // of the staging→dest rename would then leave NO export at all.
    graft.operators.CommitSink.healInterrupted(spark, dest)
    val staging = dest + ".__staging__"
    val sharded = df
      .withColumn("shard", pmod(xxhash64(col(keyCol)), lit(k)).cast("int"))
      // all rows of one shard value land in one task → one file per
      // hive shard dir (a task holding two shard values writes one
      // file into EACH dir, still one per shard)
      .repartition(k, col("shard"))
    // expected count OBSERVED on the writing execution (CommitSink's
    // rule): no second pass over the input plan, and a
    // nondeterministic input cannot spuriously mismatch itself
    // zstd default: a release export is written once and read by every
    // training run — trade write CPU for wire/disk bytes (the manifest
    // digests are content-based, so the codec never affects identity)
    val obs = new org.apache.spark.sql.Observation("shard_rows")
    sharded.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").option("compression", codec)
      .partitionBy("shard").parquet(staging)
    val expected = obs.get("rows").asInstanceOf[Long]
    sealStaging(spark, dest, staging, expected,
      p => spark.read.parquet(p), None)
  }

  /** Backup-rename swap (CommitSink's contract): a crash between the
    * renames leaves the old export at `dest.__old__`, never destroyed.
    */
  private def swapIn(
      fs: org.apache.hadoop.fs.FileSystem,
      stagingPath: Path,
      destPath: Path): Unit = {
    val backupPath = new Path(destPath.toString + ".__old__")
    if (fs.exists(backupPath)) fs.delete(backupPath, true)
    val hadOld = fs.exists(destPath)
    if (hadOld && !fs.rename(destPath, backupPath))
      throw new RuntimeException(s"could not stage out old $destPath")
    if (!fs.rename(stagingPath, destPath)) {
      if (hadOld) fs.rename(backupPath, destPath)
      throw new RuntimeException(
        s"could not commit $stagingPath -> $destPath")
    }
    if (hadOld) fs.delete(backupPath, true)
  }

  /** Globally-ORDERED export: range-sharded on `orderCol` (shard i's
    * max key ≤ shard i+1's min key) with rows sorted inside each
    * shard — the layout for resumable/ordered consumption
    * (time-ordered eval splits, merge-friendly downstream joins).
    * The scale-safe global sort: `repartitionByRange` samples range
    * bounds and sorts per partition — no single-partition SortExec
    * ever appears (spec-asserted). Unlike [[write]], shard membership
    * depends on sampled bounds, so the BYTE layout is not guaranteed
    * identical across cluster shapes — the manifest (computed from
    * staged files, like [[write]]'s) still certifies exactly what
    * shipped, and the CONTENT (row multiset, global order) is
    * deterministic.
    */
  def writeSorted(
      spark: SparkSession,
      df: DataFrame,
      dest: String,
      k: Int,
      orderCol: String,
      codec: String = "zstd"): Seq[ShardManifest] = {
    require(k > 0, s"shard count must be positive, got $k")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column")
    // heal a parked prior export before its backup is deleted (see
    // [[write]])
    graft.operators.CommitSink.healInterrupted(spark, dest)
    val staging = dest + ".__staging__"
    // Sort by (shard, orderCol), not orderCol alone: the partitionBy
    // write REQUIRES a partition-local ordering on the partition
    // column, and with only [orderCol] in the child's ordering Spark
    // plans its own Sort(shard) on top — whose stability is NOT
    // guaranteed once a spilling merge interleaves equal-key runs, so
    // a big shard could ship internally unsorted. With the shard
    // column leading the sort, the required ordering is already
    // satisfied and no extra sort is planned (shard is constant per
    // partition, so this is the same per-partition work).
    val sorted = df
      .repartitionByRange(k, col(orderCol))
      .withColumn("shard", spark_partition_id())
      .sortWithinPartitions(col("shard"), col(orderCol))
    val obs = new org.apache.spark.sql.Observation("sorted_shard_rows")
    sorted.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").option("compression", codec)
      .partitionBy("shard").parquet(staging)
    val expected = obs.get("rows").asInstanceOf[Long]
    sealStaging(spark, dest, staging, expected,
      p => spark.read.parquet(p), None)
  }

  /** Deterministically SHUFFLED export — the training-order layout:
    * a reproducible pseudo-random global permutation (order by
    * `xxhash64(key)`), range-sharded so shard i holds a contiguous
    * slice of the permutation and a loader replays the exact same
    * data order on every run, any cluster. Shuffling at EXPORT time
    * is the 100 TB shape: the alternative — shuffling at load time —
    * either buffers the corpus or approximates with small windows.
    * The `shuffle_ord` column ships with the data as the loader's
    * resume cursor (restart from the last consumed ordinal without
    * re-reading). Same manifest/crash/verify contract as
    * [[writeSorted]], which this delegates to.
    */
  def writeShuffled(
      spark: SparkSession,
      df: DataFrame,
      dest: String,
      k: Int,
      keyCol: String,
      codec: String = "zstd"): Seq[ShardManifest] = {
    require(!df.columns.contains("shuffle_ord"),
      "input already has a 'shuffle_ord' column")
    writeSorted(spark,
      df.withColumn("shuffle_ord", xxhash64(col(keyCol))),
      dest, k, "shuffle_ord", codec)
  }

  /** JSONL export — the lingua-franca interchange layout for LLM
    * training corpora: `shard=N/part-*.json.gz`, one gzipped
    * JSON-lines file per shard, same key-hash shard assignment,
    * manifest, and crash contract as [[write]]. For loaders that
    * stream text (most tokenizer pipelines) rather than read
    * columns; parquet ([[write]]) stays the analytical layout.
    *
    * gzip, not zstd: Spark's TEXT sources compress through Hadoop
    * codecs, and the Hadoop zstd codec needs the native library that
    * a plain JVM deployment lacks — gzip is pure-JVM and universally
    * readable, and a shard is one file either way (compression
    * splittability never matters).
    *
    * JSON carries no types, so the export is made self-describing: a
    * `_schema.json` sidecar (Spark's canonical schema JSON) commits
    * with the data, and [[readJsonl]]/[[verifyJsonl]] read with THAT
    * schema — never inference, which would turn binary columns into
    * base64 strings and break the digest. The manifest digests are
    * computed from a schema-true re-read of the staged files, so
    * verify certifies exactly what a schema-aware consumer decodes.
    */
  def writeJsonl(
      spark: SparkSession,
      df: DataFrame,
      dest: String,
      k: Int,
      keyCol: String,
      codec: String = "gzip"): Seq[ShardManifest] = {
    require(k > 0, s"shard count must be positive, got $k")
    require(!df.columns.contains("shard"),
      "input already has a 'shard' column")
    graft.operators.CommitSink.healInterrupted(spark, dest)
    val staging = dest + ".__staging__"
    val sharded = df
      .withColumn("shard", pmod(xxhash64(col(keyCol)), lit(k)).cast("int"))
      .repartition(k, col("shard"))
    val obs = new org.apache.spark.sql.Observation("jsonl_shard_rows")
    sharded.observe(obs, count(lit(1)).as("rows"))
      .write.mode("overwrite").option("compression", codec)
      .partitionBy("shard").json(staging)
    val expected = obs.get("rows").asInstanceOf[Long]
    sealStaging(spark, dest, staging, expected,
      p => readWithSchema(spark, p, df.schema),
      Some(df.schema.json))
  }

  /** Read a committed JSONL export with its committed schema — the
    * types the writer declared, never inference.
    */
  def readJsonl(spark: SparkSession, dest: String): DataFrame = {
    graft.operators.CommitSink.healInterrupted(spark, dest)
    readWithSchema(spark, dest, committedSchema(spark, dest))
  }

  /** JSONL twin of [[verify]]: recompute per-shard stats from the
    * committed files through the committed schema and compare with
    * the manifest.
    */
  def verifyJsonl(spark: SparkSession, dest: String): Unit = {
    graft.operators.CommitSink.healInterrupted(spark, dest)
    val manifest = readManifest(spark, dest)
    if (manifest.isEmpty) return
    compareStats(dest, manifest,
      shardStats(readWithSchema(spark, dest, committedSchema(spark, dest))))
  }

  private def readWithSchema(
      spark: SparkSession,
      path: String,
      dataSchema: org.apache.spark.sql.types.StructType): DataFrame =
    // data schema only — the hive `shard=N` partition column is
    // discovered from the layout and appended by the source
    spark.read.schema(dataSchema).json(path)

  private def committedSchema(
      spark: SparkSession,
      dest: String): org.apache.spark.sql.types.StructType = {
    val p = new Path(dest, SchemaName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw ShardVerificationFailed(dest, s"no $SchemaName sidecar")
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    org.apache.spark.sql.types.DataType.fromJson(text)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
  }

  /** The committed manifest at `dest`. */
  def readManifest(spark: SparkSession, dest: String): Seq[ShardManifest] = {
    val p = new Path(dest, ManifestName)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    // one {"shard":N,"rows":N,"digest":N} object per line
    text.linesIterator.filter(_.nonEmpty).map { l =>
      def field(name: String): String = {
        val m = ("\"" + name + "\":(-?\\d+)").r.findFirstMatchIn(l)
        m.getOrElse(throw ShardVerificationFailed(dest,
          s"manifest line missing $name: $l")).group(1)
      }
      ShardManifest(field("shard").toInt, field("rows").toLong,
        field("digest").toLong)
    }.toSeq.sortBy(_.shard)
  }

  /** Recompute per-shard stats from the committed files and compare
    * with the manifest; throws [[ShardVerificationFailed]] naming the
    * first mismatched shard.
    */
  def verify(spark: SparkSession, dest: String): Unit = {
    graft.operators.CommitSink.healInterrupted(spark, dest)
    val manifest = readManifest(spark, dest)
    // an empty manifest certifies an empty export — nothing to read
    // (and no schema on disk to read it with)
    if (manifest.isEmpty) return
    compareStats(dest, manifest, shardStats(spark.read.parquet(dest)))
  }

  private def compareStats(
      dest: String,
      manifest: Seq[ShardManifest],
      actual: Seq[ShardManifest]): Unit = {
    val byShard = actual.map(s => s.shard -> s).toMap
    manifest.foreach { m =>
      val a = byShard.getOrElse(m.shard,
        throw ShardVerificationFailed(dest, s"shard ${m.shard} missing"))
      if (a.rows != m.rows || a.digest != m.digest)
        throw ShardVerificationFailed(dest,
          s"shard ${m.shard}: manifest (${m.rows}, ${m.digest}) " +
            s"vs data (${a.rows}, ${a.digest})")
    }
    val extra = actual.map(_.shard).toSet -- manifest.map(_.shard).toSet
    if (extra.nonEmpty)
      throw ShardVerificationFailed(dest, s"unmanifested shards $extra")
  }

  private def writeManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      p: Path,
      stats: Seq[ShardManifest]): Unit = {
    val out = fs.create(p, true)
    try out.write(stats.map(s =>
      s"""{"shard":${s.shard},"rows":${s.rows},"digest":${s.digest}}""")
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }
}
