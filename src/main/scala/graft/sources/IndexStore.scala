package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable storage for derived index frames (shingle inverted index,
  * MinHash bands, SimHash signatures, exact near-dup pair set, IVF
  * assignment + centroids) — the "build once at ingest, read forever"
  * layer that a 100 TB corpus needs: those indexes are multi-TB
  * artifacts, and recomputing them from raw text in every new session
  * (the session-cache-only behavior) re-pays the full corpus pass each
  * time.
  *
  * Layout: `<root>/l<layout>/<corpusId>/<indexName>/v<stamp>-f<format>`
  * parquet, where `stamp` is the corpus-directory fingerprint the
  * session caches already key staleness on — a corpus rewrite changes
  * the stamp, so a stale durable index can never be served; writing a
  * new version retires older `v*` siblings (and older `l*` epochs).
  * A directory only counts as present when its `_SUCCESS` marker
  * exists, so a crashed half-write is rebuilt, not trusted.
  *
  * Deliberately path-based parquet, not `bucketBy` catalog tables: the
  * bucketing metadata of a catalog table lives in the (session-scoped,
  * in-memory here) metastore and does not survive a new JVM — an
  * ingest-time artifact must be self-describing from storage alone.
  * The trade is one exchange on the first join key per query; the
  * corpus-sized compute (shingling, MinHash, k-means, pair mining)
  * is what the store amortizes. All filesystem access goes through
  * the Hadoop `FileSystem` API, so `root` may be any Hadoop-supported
  * scheme (HDFS, S3A, local).
  *
  * Enablement: set `spark.graft.index.root`. Unset (the default), the
  * whole layer is a no-op and index frames live only in the session
  * cache — correctness is identical either way (IndexStoreSpec proves
  * cold-session reads hash-match the built frames).
  *
  * Reference analog: the app persists its corpus/pipeline state across
  * runs via settings.json (`Batch Processor.py:87-97`) — state
  * survives the process; this is that discipline applied to derived
  * indexes.
  */
object IndexStore {

  /** Session conf naming the store root; absent/empty disables. */
  val RootConf = "spark.graft.index.root"

  def root(s: SparkSession): Option[String] =
    s.conf.getOption(RootConf).map(_.trim).filter(_.nonEmpty)

  /** Harness hook: enable the store when `SPARK_GRAFT_INDEX_ROOT` is
    * set in the environment (one shared definition for the Verify and
    * Bench mains).
    */
  def enableFromEnv(s: SparkSession): Unit =
    sys.env.get("SPARK_GRAFT_INDEX_ROOT").foreach(r => s.conf.set(RootConf, r))

  /** Index FORMAT version, a path segment next to the corpus stamp.
    * The stamp tracks DATA staleness only — without a format segment, a
    * code upgrade that changes a builder's semantics or schema (shingle
    * width, band count, NCents, hot-df policy, column layout) would
    * silently keep serving indexes built by the old code, because the
    * corpus underneath is unchanged. Bump on any such change; the cost
    * is one rebuild per corpus, after which [[retireStaleVersions]]
    * drops the old-format copy.
    */
  val FormatVersion = 2

  /** Store LAYOUT epoch, the directory level ABOVE the corpus id.
    * [[retireStaleVersions]] can only clean within one corpus tree —
    * a change to the corpusId derivation or the directory scheme
    * re-keys every corpus, and the old trees (full index copies)
    * would otherwise leak forever, unreachable by any retire pass.
    * Bump on such changes: publishing under the new epoch retires
    * older `l*` roots wholesale (the store is engine-owned; an
    * old-epoch tree after an upgrade is dead weight by definition).
    */
  val LayoutVersion = 2

  /** Human-readable, collision-resistant corpus directory id: last
    * path segment + 16-hex 64-bit fingerprint (two seeded 32-bit
    * murmurs) of the normalized path. Normalization goes through
    * Hadoop [[Path]], not `java.io.File` — a URI-scheme corpus dir
    * (`s3a://…`, `hdfs://…`) must not be resolved against the local
    * cwd, or the store key would differ per working directory. Only a
    * scheme-less relative path is made absolute against the cwd.
    */
  private[graft] def corpusId(corpusDir: String): String = {
    val p = new Path(corpusDir)
    val norm =
      if (p.toUri.getScheme != null || p.isAbsolute) p.toString
      else new Path(new java.io.File(corpusDir).getAbsolutePath).toString
    val h1 = scala.util.hashing.MurmurHash3.stringHash(norm, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(norm, 0x85ebca6b)
    val h = (h1.toLong << 32) | (h2.toLong & 0xFFFFFFFFL)
    f"${p.getName}-$h%016x"
  }

  def indexPath(
      rootDir: String, corpusDir: String, name: String, stamp: Long): String =
    s"${rootDir.stripSuffix("/")}/l$LayoutVersion/${corpusId(corpusDir)}/" +
      s"$name/v$stamp-f$FormatVersion"

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  private def isComplete(s: SparkSession, p: Path): Boolean =
    fs(s, p).exists(new Path(p, "_SUCCESS"))

  /** Get the durable copy of index `name` for `corpusDir` at `stamp`,
    * building and writing it first when absent (or when the store is
    * disabled, in which case the built plan is returned directly).
    * When the store is active the returned frame's lineage is the
    * PARQUET SCAN of the stored index — not the build plan — so query
    * plans downstream read the index table and a cache-evicted frame
    * recomputes from storage, never from the raw corpus.
    */
  def readThrough(
      s: SparkSession, corpusDir: String, name: String, stamp: Long)(
      build: => DataFrame): DataFrame =
    root(s) match {
      case None => build
      case Some(r) =>
        val pathStr = indexPath(r, corpusDir, name, stamp)
        val p = new Path(pathStr)
        if (!isComplete(s, p)) publish(s, p)(build)
        s.read.parquet(pathStr)
    }

  /** Atomic publish: build into a writer-private hidden temp sibling,
    * then rename into place. Two store-enabled sessions that both see
    * an absent index may both run build jobs, but each job writes its
    * OWN directory — the final path is always one job's complete
    * output, never an interleaving of part-files from two overwrite
    * jobs (the corruption a plain `write(dest)` check-then-act race
    * allows). The losing writer detects the occupied destination and
    * discards its copy — including the nested case where Hadoop
    * `rename` moved the temp INSIDE a destination that appeared
    * between the existence check and the rename.
    */
  private def publish(s: SparkSession, dest: Path)(build: => DataFrame): Unit = {
    val f = fs(s, dest)
    val tmp = new Path(dest.getParent,
      s".tmp-${dest.getName}-${java.util.UUID.randomUUID()}")
    build.write.mode("overwrite").parquet(tmp.toString)
    // a pre-existing dest WITHOUT _SUCCESS is a crashed half-write: no
    // reader trusts it (the isComplete gate), so clearing it is safe
    if (f.exists(dest) && !isComplete(s, dest)) f.delete(dest, true)
    val renamed = !f.exists(dest) && f.rename(tmp, dest)
    // Hadoop rename into a dest that appeared between the check and
    // the rename NESTS tmp inside it and still returns true — winning
    // means the rename landed AND nothing nested: check the nested
    // path either way, or the loser would leave an index-sized temp
    // inside the live version directory forever.
    val nested = new Path(dest, tmp.getName)
    val won = renamed && !f.exists(nested)
    if (won) {
      retireStaleVersions(s, dest)
      retireStaleLayouts(s, dest)
    } else {
      f.delete(tmp, true)
      f.delete(nested, true)
      require(isComplete(s, dest),
        s"lost index publish race for $dest but no complete winner found")
    }
  }

  /** Drop `v*` siblings of the just-written version — stale stamps of
    * a rewritten corpus (and old-format copies after a
    * [[FormatVersion]] bump). Keeping them would leak one full index
    * copy per rewrite. In-flight `.tmp-*` temps of concurrent writers
    * are left alone; each writer cleans its own.
    */
  private def retireStaleVersions(s: SparkSession, current: Path): Unit = {
    val f = fs(s, current)
    val parent = current.getParent
    if (f.exists(parent))
      f.listStatus(parent).foreach { st =>
        if (st.isDirectory && st.getPath.getName != current.getName &&
          !st.getPath.getName.startsWith(".tmp-"))
          f.delete(st.getPath, true)
      }
  }

  /** Drop other-epoch roots after a successful publish under the
    * current epoch: `current` is `<root>/l<V>/<corpusId>/<name>/v…`,
    * so the store root is three levels up. Two recognized stale
    * shapes, both strictly pattern-matched (never a user's file):
    * `l<digits>` epoch roots other than the current one, and the
    * PRE-epoch layout's bare corpus trees — that layout wrote
    * `<root>/<corpusId>/…` with no `l` segment, so its
    * `<seg>-<16 hex>` directories would otherwise never match the
    * epoch pattern and leak one full index copy per corpus forever.
    * The `<seg>-<16 hex>` NAME alone is not proof (hash-suffixed
    * names are a common user convention — `backup-0123456789abcdef`
    * must survive a store root shared with other artifacts), so a
    * candidate is deleted only when its internal STRUCTURE matches
    * the old store layout too: all children are directories and at
    * least one contains a `v<stamp>-f<ver>` version directory.
    */
  private def retireStaleLayouts(s: SparkSession, current: Path): Unit = {
    val f = fs(s, current)
    val storeRoot = current.getParent.getParent.getParent.getParent
    if (storeRoot != null && f.exists(storeRoot))
      f.listStatus(storeRoot).foreach { st =>
        val n = st.getPath.getName
        val staleEpoch = n.matches("l\\d+") && n != s"l$LayoutVersion"
        val preEpochCorpus =
          n.matches(".+-[0-9a-f]{16}") && isOldLayoutCorpusTree(f, st.getPath)
        if (st.isDirectory && (staleEpoch || preEpochCorpus))
          f.delete(st.getPath, true)
      }
  }

  /** Structural probe of the pre-epoch corpus layout
    * `<corpusId>/<name>/v<stamp>-f<ver>`: every child an index-family
    * directory, at least one holding a version directory. Any read
    * surprise means "not ours" — never delete on doubt.
    */
  private def isOldLayoutCorpusTree(
      f: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    try {
      val fams = f.listStatus(p)
      fams.nonEmpty && fams.forall(_.isDirectory) && fams.exists { fam =>
        f.listStatus(fam.getPath).exists(v =>
          v.isDirectory && v.getPath.getName.matches("v-?\\d+-f\\d+"))
      }
    } catch { case scala.util.control.NonFatal(_) => false }

  /** Durable small-object sidecar for non-frame index state (the IVF
    * centroid array): stored as a tiny parquet so the same staleness /
    * completeness rules apply. Returns None when the store is disabled
    * or the object is absent.
    */
  def readCentroids(
      s: SparkSession, corpusDir: String, stamp: Long): Option[Array[Array[Double]]] =
    root(s).flatMap { r =>
      val p = new Path(indexPath(r, corpusDir, "ivf_centroids", stamp))
      if (!isComplete(s, p)) None
      else Some(
        s.read.parquet(p.toString)
          .collect()
          .map(row => (row.getInt(0), row.getSeq[Double](1).toArray))
          .sortBy(_._1)
          .map(_._2))
    }

  def writeCentroids(
      s: SparkSession, corpusDir: String, stamp: Long,
      cents: Array[Array[Double]]): Unit =
    root(s).foreach { r =>
      val pathStr = indexPath(r, corpusDir, "ivf_centroids", stamp)
      import scala.jdk.CollectionConverters._
      val rows = cents.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.Row(i, c.toSeq)
      }.toSeq.asJava
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cent_id",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("c",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false),
          nullable = false)))
      val p = new Path(pathStr)
      if (!isComplete(s, p))
        publish(s, p)(s.createDataFrame(rows, schema).coalesce(1))
    }
}
