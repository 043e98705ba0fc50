package graft.sources

import graft.{SparkEntry, SparkTestBase}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.Files

/** The durable index layer's contract (cited by `IndexStore.scala` and
  * `Q.scala`'s StampedCache scaladoc): cold-session read-through
  * hash-matches the fresh build for every index family, a crashed
  * half-write (no `_SUCCESS`) is rebuilt rather than trusted, stale
  * `v*` versions are retired on publish, and the centroid sidecar
  * round-trips. All store-enabled work runs on `spark.newSession()`
  * children so the shared base session (used by every other suite)
  * never sees the conf.
  */
class IndexStoreSpec extends SparkTestBase {

  private def storeSession(root: String): SparkSession = {
    val s = spark.newSession()
    s.conf.set(IndexStore.RootConf, root)
    s
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("disabled store is a pass-through: the build plan itself is served") {
    val s = spark.newSession() // RootConf unset
    import s.implicits._
    val built = Seq(1, 2, 3).toDF("id")
    // reference equality: the None branch must hand back the build
    // plan untouched — no write, no parquet re-read lineage
    assert(IndexStore.readThrough(s, "/tmp/corpus-x", "t", 1L)(built) eq built)
    // an empty/blank conf value also means disabled
    s.conf.set(IndexStore.RootConf, "  ")
    assert(IndexStore.readThrough(s, "/tmp/corpus-x", "t", 1L)(built) eq built)
  }

  test("readThrough builds once, then serves the stored copy (no rebuild)") {
    val root = Files.createTempDirectory("graft-ixs").toString
    val s = storeSession(root)
    import s.implicits._
    var builds = 0
    def build: DataFrame = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("k", "v") }
    val first = rows(IndexStore.readThrough(s, "/tmp/corpus-a", "idx", 7L)(build))
    assert(builds == 1)
    val again = rows(IndexStore.readThrough(s, "/tmp/corpus-a", "idx", 7L)(build))
    assert(builds == 1, "a complete stored index must not rebuild")
    assert(first == again && first.size == 2)
  }

  test("missing _SUCCESS means crashed half-write: rebuilt, not trusted") {
    val root = Files.createTempDirectory("graft-ixs").toString
    val s = storeSession(root)
    import s.implicits._
    var builds = 0
    def build: DataFrame = { builds += 1; Seq(1, 2, 3).toDF("id") }
    IndexStore.readThrough(s, "/tmp/corpus-b", "idx", 7L)(build).count()
    assert(builds == 1)
    val p = new Path(IndexStore.indexPath(root, "/tmp/corpus-b", "idx", 7L))
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(p, "_SUCCESS"), false))
    val back = IndexStore.readThrough(s, "/tmp/corpus-b", "idx", 7L)(build)
    assert(builds == 2, "absent _SUCCESS must trigger a rebuild")
    assert(back.count() == 3)
  }

  test("publishing a new stamp retires stale v* versions") {
    val root = Files.createTempDirectory("graft-ixs").toString
    val s = storeSession(root)
    import s.implicits._
    IndexStore.readThrough(s, "/tmp/corpus-c", "idx", 1L)(Seq(1).toDF("id")).count()
    IndexStore.readThrough(s, "/tmp/corpus-c", "idx", 2L)(Seq(2).toDF("id")).count()
    val parent = new Path(
      IndexStore.indexPath(root, "/tmp/corpus-c", "idx", 2L)).getParent
    val fs = parent.getFileSystem(s.sparkContext.hadoopConfiguration)
    val versions = fs.listStatus(parent).map(_.getPath.getName).sorted
    assert(versions.toSeq == Seq(s"v2-f${IndexStore.FormatVersion}"),
      s"stale v1 must be retired, got ${versions.mkString(",")}")
  }

  test("publishing retires stale layout epochs, never user files") {
    val root = Files.createTempDirectory("graft-ixs-layout").toString
    val s = storeSession(root)
    import s.implicits._
    // an orphaned old-epoch tree (e.g. pre-upgrade corpusId scheme)
    // and an unrelated user directory under the same root
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "l1", "old-corpus", "idx"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, "not-an-epoch"))
    // the PRE-epoch layout wrote bare `<seg>-<16hex>` corpus trees
    // directly under the root (no l-segment, families holding
    // `v<stamp>-f<ver>` version dirs) — those must be retired too, or
    // one full index copy per corpus leaks forever
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
      root, "corpus-0123456789abcdef", "idx", "v42-f1"))
    // a USER directory that merely shares the hash-suffix NAMING
    // convention (no store-layout structure inside): deleting it
    // would destroy someone's data on a shared root
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(
      root, "backup-abcdef0123456789"))
    java.nio.file.Files.write(java.nio.file.Paths.get(
      root, "backup-abcdef0123456789", "precious.txt"),
      "keep me".getBytes)
    IndexStore.readThrough(s, "/tmp/corpus-e", "idx", 1L)(Seq(1).toDF("id")).count()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root, "l1")),
      "old layout epoch must be retired on publish")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(
      root, "corpus-0123456789abcdef")),
      "pre-epoch bare corpus trees must be retired on publish")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root, "not-an-epoch")),
      "non-epoch directories must never be touched")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
      root, "backup-abcdef0123456789", "precious.txt")),
      "a hash-suffixed user directory without store structure must survive")
  }

  test("centroid sidecar round-trips; absent reads as None") {
    val root = Files.createTempDirectory("graft-ixs").toString
    val s = storeSession(root)
    assert(IndexStore.readCentroids(s, "/tmp/corpus-d", 5L).isEmpty)
    val cents = Array(Array(1.0, 0.0, 0.25), Array(0.0, -1.0, 0.5))
    IndexStore.writeCentroids(s, "/tmp/corpus-d", 5L, cents)
    val back = IndexStore.readCentroids(s, "/tmp/corpus-d", 5L)
    assert(back.isDefined)
    assert(back.get.map(_.toSeq).toSeq == cents.map(_.toSeq).toSeq,
      "centroids must round-trip in order and value")
    // the disabled-store session sees nothing
    assert(IndexStore.readCentroids(spark.newSession(), "/tmp/corpus-d", 5L).isEmpty)
  }

  test("corpusId: 16-hex 64-bit fingerprint, cwd-independent for URI paths") {
    val a = IndexStore.corpusId("s3a://bucket/data/corpus")
    assert(a == IndexStore.corpusId("s3a://bucket/data/corpus"))
    assert(a.startsWith("corpus-") && a.length == "corpus-".length + 16,
      s"expected 16-hex suffix, got $a")
    // distinct dirs get distinct ids; trailing slash is normalized away
    assert(IndexStore.corpusId("s3a://bucket/data/corpus/") == a)
    assert(IndexStore.corpusId("s3a://bucket/data/other") != a)
  }

  test("cold-session read-through hash-matches fresh builds for every index family") {
    val root = Files.createTempDirectory("graft-ixs-cold").toString
    val dir = sf()
    // store-off truth from the shared base session (its StampedCache
    // entries are fresh builds by construction)
    val families = Seq("q25_dedup_ngram_jaccard", "q26_dedup_minhash",
      "q27_dedup_simhash", "q40_ann_ivf", "q54_dedup_embedding_ivf",
      "q73_image_phash_dedup", "q75_image_dedup_clusters",
      // round 7: the last per-session rebuilders joined the tier —
      // BM25 stats + tf hits (q99), phrase posting list (q114),
      // term-df dictionary (q121's stopword prune), PQ codes (q172 —
      // the codebooks refit deterministically per session, the NARROW
      // codes frame is the stored full-corpus pass)
      "q99_bm25_search", "q114_phrase_search", "q121_cooccurrence",
      "q172_ann_pq")
    val truth = families.map(q => q -> rows(SparkEntry.queries(q)(spark, dir))).toMap

    // warm store-enabled session: builds and persists every index
    val s1 = storeSession(root)
    families.foreach { q =>
      assert(rows(SparkEntry.queries(q)(s1, dir)) == truth(q),
        s"$q store-enabled build diverges from fresh build")
    }
    // the store now holds the index families on disk, each complete
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val corpusRoot = new Path(root,
      s"l${IndexStore.LayoutVersion}/${IndexStore.corpusId(dir)}")
    val stored = fs.listStatus(corpusRoot).map(_.getPath.getName).toSet
    // the probe-backed artifacts (bm25/phrase) carry their probe-set
    // hash in the name (the artifact-identity rule: an edited probe
    // list must MISS the store) — match them by prefix
    Seq("shingles", "minhash_bands", "simhash_sigs", "exact_pairs",
      "minhash_pairs", "simhash_pairs", "phash_sigs", "phash_pairs",
      "phash_cluster_map", "ivf_cids", "ivf_centroids",
      "bm25_tf_hits", "bm25_stats", "phrase_hits", "term_df",
      "pq_codes").foreach(n =>
      assert(stored.exists(_.startsWith(n)),
        s"expected stored index $n*, got $stored"))

    // cold session (fresh StampedCache keys): must serve the stored
    // copies and hash-match
    val s2 = storeSession(root)
    families.foreach { q =>
      assert(rows(SparkEntry.queries(q)(s2, dir)) == truth(q),
        s"$q cold-session read-through diverges")
    }
    graft.queries.DedupQueries.clearCaches(s1)
    graft.queries.DedupQueries.clearCaches(s2)
    graft.queries.VectorQueries.clearCaches(s1)
    graft.queries.VectorQueries.clearCaches(s2)
    graft.queries.MultimodalQueries.clearCaches(s1)
    graft.queries.MultimodalQueries.clearCaches(s2)
    graft.queries.TextQueries.clearCaches(s1)
    graft.queries.TextQueries.clearCaches(s2)
    graft.queries.Analytics2.clearCaches(s1)
    graft.queries.Analytics2.clearCaches(s2)
  }

  test("the stored index is the source of truth for a cold session") {
    val root = Files.createTempDirectory("graft-ixs-auth").toString
    val dir = sf()
    val s1 = storeSession(root)
    val fresh = rows(SparkEntry.queries("q25_dedup_ngram_jaccard")(s1, dir))
    // doctor the stored pair table: append a sentinel pair the corpus
    // cannot produce, keeping the directory complete (_SUCCESS intact)
    val pairsDir = new Path(root,
      s"l${IndexStore.LayoutVersion}/${IndexStore.corpusId(dir)}/exact_pairs")
      .toString
    val fs = new Path(pairsDir).getFileSystem(s1.sparkContext.hadoopConfiguration)
    val vDir = fs.listStatus(new Path(pairsDir)).head.getPath.toString
    val stored = spark.read.parquet(vDir)
    import spark.implicits._
    val sentinel = Seq((999998L, 999999L, 1L, 1.0))
      .toDF("doc_a", "doc_b", "inter_cnt", "jaccard")
    val doctored = stored.unionByName(sentinel)
    val tmpOut = Files.createTempDirectory("graft-ixs-doc").toString + "/p"
    doctored.write.parquet(tmpOut)
    assert(fs.delete(new Path(vDir), true))
    assert(fs.rename(new Path(tmpOut), new Path(vDir)))
    // the doctored directory must be complete and visibly larger, at
    // the exact path readThrough will resolve for this corpus + stamp
    assert(fs.exists(new Path(new Path(vDir), "_SUCCESS")))
    assert(spark.read.parquet(vDir).count() == fresh.size + 1)
    val expectPath = IndexStore.indexPath(
      root, dir, "exact_pairs", graft.queries.Q.dirStamp(dir))
    assert(new Path(expectPath).toUri.getPath == new Path(vDir).toUri.getPath,
      s"stamp drift: readThrough resolves $expectPath but store holds $vDir")
    // drop s1's persisted frames first: Spark's CacheManager is shared
    // per-CONTEXT, so an identical parquet-scan plan from another
    // in-JVM session would be served s1's cached (pre-doctor) blocks —
    // a real cold session is a new JVM and has no such cache
    graft.queries.DedupQueries.clearCaches(s1)
    // a cold session must serve the doctored store — proof it reads
    // storage, not a silent rebuild from the raw corpus
    val s2 = storeSession(root)
    val cold = rows(SparkEntry.queries("q25_dedup_ngram_jaccard")(s2, dir))
    assert(cold.size == fresh.size + 1 &&
      cold.exists(_.contains("999998")),
      "cold session did not serve the stored (doctored) index")
    graft.queries.DedupQueries.clearCaches(s1)
    graft.queries.DedupQueries.clearCaches(s2)
  }
}
