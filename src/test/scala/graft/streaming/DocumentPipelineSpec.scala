package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The ingest trio (scrubbed corpus, shingle index, pair candidates)
  * stays consistent under fresh deliveries, updates, replay, and
  * streaming: maintained state always equals the one-pass rebuild
  * over the maintained corpus, PII never reaches any stored artifact,
  * and an updated document drops its stale candidates.
  */
import graft.operators.PartitionedCommit.Layout

class DocumentPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(name).toString

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private case class Paths(root: String) {
    val corpus = root + "/corpus"
    val shingles = root + "/shingles"
    val cands = root + "/cands"
  }

  private def candSet(df: DataFrame) = df
    .select("doc_a", "doc_b", "inter_cnt", "jaccard", "containment")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4))).toSet

  /** One-pass rebuild of the candidates from the stored corpus — what
    * the maintained artifact must always equal.
    */
  private def rebuilt(p: Paths) = candSet(
    graft.queries.DedupQueries.candidatesFromShingles(
      spark.read.parquet(p.corpus).select(col("doc_id"),
        graft.queries.DedupQueries.shingleHashes(
          filter(split(col("text"), " "), tk => length(tk) > 0)).as("s")),
      floor = 0.25))

  private val base = (1 to 14).map(i => s"w$i").mkString(" ")

  test("incremental deliveries converge to the one-pass rebuild") {
    val p = Paths(tmp("docpipe"))
    val r1 = DocumentPipeline.upsertBatch(
      docs((1L, s"$base a1"), (2L, "totally unrelated content here six seven")),
      p.corpus, p.shingles, p.cands)
    assert(r1.corpusRows == 2 && r1.replacedDocs == 0)
    val r2 = DocumentPipeline.upsertBatch(
      docs((3L, s"$base a3"), (4L, "another fresh island of text nine ten")),
      p.corpus, p.shingles, p.cands)
    assert(r2.corpusRows == 4 && r2.newCandidates >= 1,
      s"doc 3 near-dups doc 1: $r2")
    val stored = candSet(spark.read.parquet(p.cands))
    assert(stored == rebuilt(p), "maintained candidates != one-pass rebuild")
    assert(stored.exists { case (a, b, _, j, _) => a == 1L && b == 3L && j >= 0.5 })
  }

  test("maintained pHash signatures equal a one-pass recompute; updates replace") {
    val p = Paths(tmp("docpipe-sigs"))
    val sigs = p.root + "/sigs"
    graft.functions.GraftFunctions.register(spark)
    def recompute() = spark.read.parquet(p.corpus)
      .select(col("doc_id"), graft.functions.GraftFunctions.phash64(
        lower(col("text")).cast("binary")).as("sig"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def stored() = spark.read.parquet(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r1 = DocumentPipeline.upsertBatch(
      docs((1L, s"$base a1"), (2L, "totally unrelated content here six seven")),
      p.corpus, p.shingles, p.cands, signaturesPath = Some(sigs))
    assert(r1.signatureRows == 2)
    assert(stored() == recompute(),
      "maintained signatures != one-pass recompute over the stored corpus")
    // an update must replace the signature, not leave the stale one
    val before = stored()
    val r2 = DocumentPipeline.upsertBatch(
      docs((2L, "rewritten into an entirely different document now")),
      p.corpus, p.shingles, p.cands, signaturesPath = Some(sigs))
    assert(r2.signatureRows == 2 && stored() == recompute())
    assert(stored() != before, "doc 2's signature must change with its text")
    // signatures describe the SCRUBBED text: a PII edit hashes the
    // redacted form, identically to re-hashing the stored corpus
    DocumentPipeline.upsertBatch(
      docs((3L, s"$base mail bob@example.com")),
      p.corpus, p.shingles, p.cands, signaturesPath = Some(sigs))
    assert(stored() == recompute())
  }

  test("an update drops stale candidates and re-mines the new content") {
    val p = Paths(tmp("docpipe-upd"))
    DocumentPipeline.upsertBatch(
      docs((1L, s"$base a1"), (2L, s"$base a2")),
      p.corpus, p.shingles, p.cands)
    assert(candSet(spark.read.parquet(p.cands))
      .exists { case (a, b, _, _, _) => a == 1L && b == 2L })
    // doc 2 rewritten to something unrelated: the (1,2) pair must die
    val r = DocumentPipeline.upsertBatch(
      docs((2L, "rewritten into an entirely different document now")),
      p.corpus, p.shingles, p.cands)
    assert(r.replacedDocs == 1 && r.corpusRows == 2)
    val stored = candSet(spark.read.parquet(p.cands))
    assert(!stored.exists { case (a, b, _, _, _) => a == 1L && b == 2L },
      s"stale pair survived the update: $stored")
    assert(stored == rebuilt(p))
  }

  test("a replayed batch recommits identical state (at-least-once safe)") {
    val p = Paths(tmp("docpipe-replay"))
    DocumentPipeline.upsertBatch(
      docs((1L, s"$base a1"), (2L, "some other unrelated words entirely")),
      p.corpus, p.shingles, p.cands)
    val batch2 = docs((3L, s"$base a3"))
    DocumentPipeline.upsertBatch(batch2, p.corpus, p.shingles, p.cands)
    def snapshot() = (
      spark.read.parquet(p.corpus).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet,
      spark.read.parquet(p.shingles).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet,
      candSet(spark.read.parquet(p.cands)))
    val before = snapshot()
    val r = DocumentPipeline.upsertBatch(batch2, p.corpus, p.shingles, p.cands)
    assert(snapshot() == before, "replay changed stored state")
    assert(r.replacedDocs == 1, "replayed doc counts as replacing itself")
  }

  test("a crash between commit renames heals for every artifact read") {
    val p = Paths(tmp("docpipe-crash"))
    DocumentPipeline.upsertBatch(
      docs((1L, s"$base a1"), (2L, s"$base a2"),
        (3L, "totally unrelated content here six seven")),
      p.corpus, p.shingles, p.cands)
    val standing = candSet(spark.read.parquet(p.cands))
    assert(standing.exists { case (a, b, _, _, _) => a == 1L && b == 2L })
    // simulate dying between CommitSink's two renames on EVERY artifact
    // of the trio at once: dest absent, only copy parked at .__old__.
    // Bare exists() gates would read this as "no standing state" — all
    // standing candidates dropped, the mine delta-only, and the next
    // commit deletes the backups (permanent loss).
    val fs = new org.apache.hadoop.fs.Path(p.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(p.corpus, p.shingles, p.cands).foreach { path =>
      assert(fs.rename(new org.apache.hadoop.fs.Path(path),
        new org.apache.hadoop.fs.Path(path + ".__old__")))
    }
    val r = DocumentPipeline.upsertBatch(
      docs((4L, "another fresh island of text nine ten")),
      p.corpus, p.shingles, p.cands)
    assert(r.corpusRows == 4, s"healed corpus must hold all docs: $r")
    val stored = candSet(spark.read.parquet(p.cands))
    assert(stored.exists { case (a, b, _, _, _) => a == 1L && b == 2L },
      s"standing candidates must survive the interrupted commit: $stored")
    assert(stored == rebuilt(p), "healed state != one-pass rebuild")
  }

  test("crash matrix: a kill between EVERY pair of lockstep commits heals on replay") {
    // the individual crash contracts (mid-rename heal, replay
    // idempotence) are pinned above; this closes their COMPOSITION:
    // for each point in the commit sequence candidates -> shingles ->
    // corpus, kill the pipeline right after that commit lands (the
    // onCommitted seam throws = the process dies between two
    // commits), then replay the same batch and require the trio to
    // equal a never-crashed control run AND the one-pass rebuild.
    // The batch includes a REPLACEMENT (doc 2 rewritten, its (1,2)
    // pair must die) so every interleaving also exercises stale-state
    // retirement, not just append.
    val b1 = Seq((1L, s"$base a1"), (2L, s"$base a2"))
    val b2 = Seq((3L, s"$base a3"),
      (2L, "rewritten into an entirely different document now"))
    def snap(p: Paths) = (
      spark.read.parquet(p.corpus).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet,
      spark.read.parquet(p.shingles).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet,
      candSet(spark.read.parquet(p.cands)))
    val ctl = Paths(tmp("docpipe-matrix-ctl"))
    DocumentPipeline.upsertBatch(docs(b1: _*), ctl.corpus, ctl.shingles, ctl.cands)
    DocumentPipeline.upsertBatch(docs(b2: _*), ctl.corpus, ctl.shingles, ctl.cands)
    val want = snap(ctl)
    assert(want._3.exists { case (a, b, _, _, _) => a == 1L && b == 3L } &&
      !want._3.exists { case (a, b, _, _, _) => a == 1L && b == 2L },
      s"control run must replace the (1,2) pair with (1,3): ${want._3}")
    case class Killed() extends RuntimeException("killed between commits")
    for (point <- Seq("candidates", "shingles", "corpus")) {
      val p = Paths(tmp(s"docpipe-matrix-$point"))
      DocumentPipeline.upsertBatch(docs(b1: _*), p.corpus, p.shingles, p.cands)
      intercept[Killed] {
        DocumentPipeline.upsertBatch(
          docs(b2: _*), p.corpus, p.shingles, p.cands,
          onCommitted = a => if (a == point) throw Killed())
      }
      val r = DocumentPipeline.upsertBatch(
        docs(b2: _*), p.corpus, p.shingles, p.cands)
      assert(r.corpusRows == 3, s"crash after $point: $r")
      assert(snap(p) == want,
        s"crash after $point: healed trio != never-crashed control")
      assert(candSet(spark.read.parquet(p.cands)) == rebuilt(p),
        s"crash after $point: candidates != one-pass rebuild")
    }
    // the FIVE-artifact sequence: with signatures + LM maintained the
    // commit order is candidates -> shingles -> corpus -> signatures
    // -> lm; kill after each and require the full quintet to heal.
    // The interesting new states are corpus-new/signatures-stale and
    // signatures-new/lm-stale.
    graft.functions.GraftFunctions.register(spark)
    def snap5(p: Paths) = {
      val sigs = spark.read.parquet(p.root + "/sigs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lm = spark.read.parquet(p.root + "/lm").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
      val counts = spark.read.parquet(p.root + "/lm__counts")
        .select("w1", "bigram", "bc").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      (snap(p), sigs, lm, counts)
    }
    val ctl5 = Paths(tmp("docpipe-matrix5-ctl"))
    for (b <- Seq(b1, b2))
      DocumentPipeline.upsertBatch(docs(b: _*), ctl5.corpus, ctl5.shingles,
        ctl5.cands, signaturesPath = Some(ctl5.root + "/sigs"),
        lmPath = Some(ctl5.root + "/lm"))
    val want5 = snap5(ctl5)
    // the maintained aggregate counts must equal fit() over the corpus
    assert(want5._4 == graft.operators.IncrementalLm
      .fit(spark.read.parquet(ctl5.corpus)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet,
      "maintained counts artifact != fit(corpus)")
    for (point <- Seq("candidates", "shingles", "corpus",
        "signatures", "lm_counts", "lm")) {
      val p = Paths(tmp(s"docpipe-matrix5-$point"))
      DocumentPipeline.upsertBatch(docs(b1: _*), p.corpus, p.shingles,
        p.cands, signaturesPath = Some(p.root + "/sigs"),
        lmPath = Some(p.root + "/lm"))
      intercept[Killed] {
        DocumentPipeline.upsertBatch(
          docs(b2: _*), p.corpus, p.shingles, p.cands,
          signaturesPath = Some(p.root + "/sigs"),
          lmPath = Some(p.root + "/lm"),
          onCommitted = a => if (a == point) throw Killed())
      }
      DocumentPipeline.upsertBatch(docs(b2: _*), p.corpus, p.shingles,
        p.cands, signaturesPath = Some(p.root + "/sigs"),
        lmPath = Some(p.root + "/lm"))
      assert(snap5(p) == want5,
        s"crash after $point: healed quintet != never-crashed control")
    }
  }

  test("parallel commits: quintet identical to sequential; mid-flight kill heals on replay") {
    // parallelCommits overlaps the four post-candidate commits; the
    // contract is (a) byte-identical final state to the sequential
    // order, and (b) a kill while SOME of the four have landed (an
    // arbitrary subset, not a prefix) heals on replay — strictly more
    // states than the sequential crash matrix covers.
    val b1 = Seq((1L, s"$base a1"), (2L, s"$base a2"))
    val b2 = Seq((3L, s"$base a3"),
      (2L, "rewritten into an entirely different document now"))
    graft.functions.GraftFunctions.register(spark)
    def run(p: Paths, b: Seq[(Long, String)], par: Boolean,
        onC: String => Unit = _ => ()) =
      DocumentPipeline.upsertBatch(docs(b: _*), p.corpus, p.shingles,
        p.cands, layout = Some(Layout.Hash(4)),
        signaturesPath = Some(p.root + "/sigs"),
        lmPath = Some(p.root + "/lm"),
        postingsPath = Some(p.root + "/postings"), postingsBuckets = 16,
        onCommitted = onC, parallelCommits = par)
    def snap5(p: Paths) = (
      spark.read.parquet(p.corpus).select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet,
      spark.read.parquet(p.shingles).select("doc_id", "s").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet,
      candSet(spark.read.parquet(p.cands)),
      spark.read.parquet(p.root + "/sigs").select("doc_id", "sig")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      lmStored(p.root + "/lm"),
      spark.read.parquet(p.root + "/lm__counts")
        .select("w1", "bigram", "bc").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet,
      spark.read.parquet(p.root + "/postings")
        .select("doc_id", "w1h", "g", "n").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet)
    val ctl = Paths(tmp("docpipe-par-ctl"))
    run(ctl, b1, par = false)
    val ctlRep = run(ctl, b2, par = false)
    val want = snap5(ctl)
    // (a) parallel end state ≡ sequential end state, same report
    val par = Paths(tmp("docpipe-par"))
    run(par, b1, par = true)
    val parRep = run(par, b2, par = true)
    assert(snap5(par) == want, "parallel quintet != sequential quintet")
    assert(parRep == ctlRep, s"parallel report drifted: $parRep vs $ctlRep")
    // (b) a parallel-phase death leaves an ARBITRARY SUBSET of the four
    // commits landed, not a prefix. Construct those states exactly (run
    // the batch fully, then roll the artifacts OUTSIDE the subset back
    // to their pre-batch snapshot — deterministic, no racing zombie
    // threads like an in-flight kill would leave) and require replay to
    // converge to the control for representative subsets: none landed,
    // one landed, a non-contiguous pair landed.
    def copyDir(src: String, dst: String): Unit = {
      val s = java.nio.file.Paths.get(src)
      java.nio.file.Files.walk(s).sorted().forEach { f =>
        val d = java.nio.file.Paths.get(dst).resolve(s.relativize(f))
        if (java.nio.file.Files.isDirectory(f))
          java.nio.file.Files.createDirectories(d)
        else java.nio.file.Files.copy(f, d)
        ()
      }
    }
    def deleteDir(dir: String): Unit = {
      val d = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(d))
        java.nio.file.Files.walk(d)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { java.nio.file.Files.delete(f); () })
    }
    // subsets respect the one ordering edge the pool enforces (corpus
    // commits only after postings), so "corpus landed without
    // postings" — a state the live system cannot produce, and whose
    // heal the postings old-derivation deliberately does not promise
    // — is excluded; everything else is an arbitrary subset
    val arts = Seq("shingles", "corpus", "sigs", "lm", "postings")
    for (landed <- Seq(Set.empty[String], Set("postings"),
        Set("shingles", "lm"), Set("postings", "corpus", "lm"))) {
      val p = Paths(tmp(s"docpipe-par-subset"))
      run(p, b1, par = true)
      val pre = tmp("docpipe-par-pre")
      arts.foreach(a => copyDir(s"${p.root}/$a", s"$pre/$a"))
      run(p, b2, par = true)
      // roll back everything NOT in `landed` — candidates stay (they
      // commit first, before the parallel phase, in both modes)
      arts.filterNot(landed).foreach { a =>
        deleteDir(s"${p.root}/$a")
        copyDir(s"$pre/$a", s"${p.root}/$a")
      }
      run(p, b2, par = true)
      assert(snap5(p) == want,
        s"subset $landed landed: healed parallel quintet != control")
    }
  }

  test("PII is scrubbed before any artifact sees the text") {
    val p = Paths(tmp("docpipe-pii"))
    DocumentPipeline.upsertBatch(
      docs((1L, "write to alice.smith@example.com about w1 w2 w3 w4")),
      p.corpus, p.shingles, p.cands)
    val stored = spark.read.parquet(p.corpus).collect().head.getString(1)
    assert(!stored.contains("alice.smith@example.com") &&
      stored.contains("<EMAIL>"), stored)
    // the shingle index describes the SCRUBBED text: re-shingling the
    // stored doc reproduces the stored index row exactly
    val fromCorpus = spark.read.parquet(p.corpus).select(col("doc_id"),
      graft.queries.DedupQueries.shingleHashes(
        filter(split(col("text"), " "), tk => length(tk) > 0)).as("s"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet
    val storedSh = spark.read.parquet(p.shingles)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet
    assert(fromCorpus == storedSh)
  }

  test("partitioned trio: converges, update drops cross-bucket pairs, replay idempotent") {
    val p = Paths(tmp("docpipe-part"))
    val nb = Some(Layout.Hash(8))
    val r1 = DocumentPipeline.upsertBatch(
      docs((1L, s"$base a1"), (2L, "totally unrelated content here six seven")),
      p.corpus, p.shingles, p.cands, layout = nb)
    assert(r1.corpusRows == 2 && r1.replacedDocs == 0)
    val r2 = DocumentPipeline.upsertBatch(
      docs((3L, s"$base a3"), (4L, "another fresh island of text nine ten")),
      p.corpus, p.shingles, p.cands, layout = nb)
    assert(r2.corpusRows == 4 && r2.newCandidates >= 1)
    val stored = candSet(spark.read.parquet(p.cands))
    assert(stored == rebuilt(p),
      "partitioned maintained candidates != one-pass rebuild")
    assert(stored.exists { case (a, b, _, j, _) => a == 1L && b == 3L && j >= 0.5 })

    // update: doc 3 rewritten to something unrelated — the (1,3)
    // victim pair lives in bucket(doc_a=1), NOT in doc 3's bucket, so
    // this exercises the cross-bucket victim probe
    val r3 = DocumentPipeline.upsertBatch(
      docs((3L, "rewritten into an entirely different document now")),
      p.corpus, p.shingles, p.cands, layout = nb)
    assert(r3.replacedDocs == 1 && r3.corpusRows == 4)
    val afterUpd = candSet(spark.read.parquet(p.cands))
    assert(!afterUpd.exists { case (a, b, _, _, _) => a == 1L && b == 3L },
      s"stale cross-bucket pair survived the partitioned update: $afterUpd")
    assert(afterUpd == rebuilt(p))

    // replay recommits identical state
    def snap() = (
      spark.read.parquet(p.corpus).select("doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet,
      spark.read.parquet(p.shingles).select("doc_id", "s")
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet,
      candSet(spark.read.parquet(p.cands)))
    val before = snap()
    DocumentPipeline.upsertBatch(
      docs((3L, "rewritten into an entirely different document now")),
      p.corpus, p.shingles, p.cands, layout = nb)
    assert(snap() == before, "partitioned replay changed stored state")
  }

  test("streaming maintain on the partitioned layout") {
    implicit val sq = spark.sqlContext
    val p = Paths(tmp("docpipe-stream-part"))
    val in = MemoryStream[(Long, String)]
    val q = DocumentPipeline.maintain(
      in.toDF().toDF("doc_id", "text"), p.corpus, p.shingles, p.cands,
      tmp("docpipe-ckpt-part"), layout = Some(Layout.Hash(4)))
    in.addData((1L, s"$base a1"), (2L, "unrelated content one two three"))
    q.processAllAvailable()
    in.addData((3L, s"$base a3"))
    q.processAllAvailable()
    q.stop()
    assert(candSet(spark.read.parquet(p.cands)) == rebuilt(p))
    assert(spark.read.parquet(p.corpus).count() == 3)
  }

  test("streaming maintain: two micro-batches, reports, stored trio") {
    implicit val sq = spark.sqlContext
    val p = Paths(tmp("docpipe-stream"))
    val reports = scala.collection.mutable.ListBuffer[DocumentPipeline.BatchReport]()
    val in = MemoryStream[(Long, String)]
    val q = DocumentPipeline.maintain(
      in.toDF().toDF("doc_id", "text"), p.corpus, p.shingles, p.cands,
      tmp("docpipe-ckpt"),
      onBatch = r => reports.synchronized { reports += r })
    in.addData((1L, s"$base a1"), (2L, "unrelated content one two three"))
    q.processAllAvailable()
    in.addData((3L, s"$base a3"))
    q.processAllAvailable()
    q.stop()
    assert(reports.size == 2)
    assert(reports.last.corpusRows == 3 && reports.last.newCandidates >= 1)
    assert(candSet(spark.read.parquet(p.cands)) == rebuilt(p))
  }

  private def lmStored(lm: String) = spark.read.parquet(lm)
    .select("doc_id", "w1", "bigram", "tf").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    .toSet

  private def lmRecompute(p: Paths) =
    graft.operators.IncrementalLm.docTf(spark.read.parquet(p.corpus))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet

  test("maintained LM tf table equals a one-pass recompute; derived counts match fit") {
    val p = Paths(tmp("docpipe-lm"))
    val lm = p.root + "/lm"
    val r1 = DocumentPipeline.upsertBatch(
      docs((1L, s"$base a1"), (2L, "totally unrelated content here six seven")),
      p.corpus, p.shingles, p.cands, lmPath = Some(lm))
    assert(r1.lmRows == lmStored(lm).size && r1.lmRows > 0)
    assert(lmStored(lm) == lmRecompute(p),
      "maintained LM tf != one-pass recompute over the stored corpus")
    // update replaces the whole group, replay recommits identically
    DocumentPipeline.upsertBatch(
      docs((2L, "rewritten into an entirely different document now")),
      p.corpus, p.shingles, p.cands, lmPath = Some(lm))
    val afterUpdate = lmStored(lm)
    assert(afterUpdate == lmRecompute(p))
    DocumentPipeline.upsertBatch(
      docs((2L, "rewritten into an entirely different document now")),
      p.corpus, p.shingles, p.cands, lmPath = Some(lm))
    assert(lmStored(lm) == afterUpdate, "replay must be idempotent")
    // the aggregate count state derived from the stored tf table is
    // exactly fit() over the stored corpus — the q77 model, maintained
    val derived = graft.operators.IncrementalLm
      .countsFromTf(spark.read.parquet(lm))
    val direct = graft.operators.IncrementalLm.fit(spark.read.parquet(p.corpus))
    assert(derived.exceptAll(direct).isEmpty && direct.exceptAll(derived).isEmpty)
  }

  test("batchNll drift: in-distribution delivery scores low, foreign text high") {
    val p = Paths(tmp("docpipe-lm-drift"))
    val lm = p.root + "/lm"
    val typical = "the cat sat on the mat and the cat sat on the mat again"
    // batch 1: fits the model — no standing LM yet, so no score
    val r1 = DocumentPipeline.upsertBatch(
      docs((1L, typical), (2L, typical + " for sure")),
      p.corpus, p.shingles, p.cands, lmPath = Some(lm))
    assert(r1.batchNll.isEmpty, "first delivery has no standing model to drift from")
    // batch 2: same distribution — low nll
    val r2 = DocumentPipeline.upsertBatch(
      docs((3L, typical + " once more")),
      p.corpus, p.shingles, p.cands, lmPath = Some(lm))
    // batch 3: fully foreign text — all bigrams OOV — must score HIGHER
    val r3 = DocumentPipeline.upsertBatch(
      docs((4L, "zzq vvk qqj wwx jjr kkp")),
      p.corpus, p.shingles, p.cands, lmPath = Some(lm))
    assert(r2.batchNll.isDefined && r3.batchNll.isDefined, s"$r2 / $r3")
    assert(r3.batchNll.get > r2.batchNll.get,
      s"foreign delivery must read off-distribution: $r2 vs $r3")
    // a batch with no scorable bigrams reports no score, not NaN
    val r4 = DocumentPipeline.upsertBatch(
      docs((5L, "single")),
      p.corpus, p.shingles, p.cands, lmPath = Some(lm))
    assert(r4.batchNll.isEmpty, s"$r4")
  }

  test("range layout: quintet parity with hash + unpartitioned; append leaves " +
      "doc-keyed buckets untouched; old-key update + crash replay heal") {
    // The O(batch) ingest contract wired end-to-end (r11 verdict ask
    // #1): under Layout.Range an ARRIVAL-ORDERED batch (the next id
    // range) must create exactly its own new bucket in every
    // doc-keyed artifact (corpus, shingles, signatures, LM tf) and
    // rewrite NO pre-existing bucket file — fingerprinted by
    // (name, mtime, length) as in CorpusMaintenanceSpec. Candidates
    // are the documented exception (keyed by doc_a = the OLD partner
    // of a cross-batch pair). End state must equal the unpartitioned
    // and hash-layout controls on all five artifacts.
    graft.functions.GraftFunctions.register(spark)
    val b1 = Seq((0L, s"$base a1"),
      (1L, "totally unrelated content here six seven"))
    val b2 = Seq((2L, s"$base a3"),
      (3L, "another fresh island of text nine ten"))
    val b3 = Seq((1L, "rewritten into an entirely different document now"))
    def run(p: Paths, b: Seq[(Long, String)], l: Option[Layout],
        onC: String => Unit = _ => ()) =
      DocumentPipeline.upsertBatch(docs(b: _*), p.corpus, p.shingles,
        p.cands, layout = l, signaturesPath = Some(p.root + "/sigs"),
        lmPath = Some(p.root + "/lm"), onCommitted = onC)
    def snap5(p: Paths) = (
      spark.read.parquet(p.corpus).select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet,
      spark.read.parquet(p.shingles).select("doc_id", "s").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet,
      candSet(spark.read.parquet(p.cands)),
      spark.read.parquet(p.root + "/sigs").select("doc_id", "sig")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      lmStored(p.root + "/lm"),
      spark.read.parquet(p.root + "/lm__counts")
        .select("w1", "bigram", "bc").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet)
    val ctl = Paths(tmp("docpipe-range-ctl"))
    Seq(b1, b2, b3).foreach(b => run(ctl, b, None))
    val want = snap5(ctl)
    assert(want._3.exists { case (a, b, _, _, _) => a == 0L && b == 2L },
      s"fixture must mine the cross-batch (0,2) pair: ${want._3}")

    val B = graft.operators.PartitionedCommit.BucketCol
    def bucketFiles(path: String): Map[String, Set[(String, Long, Long)]] =
      new java.io.File(path).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith(B))
        .map(d => d.getName -> d.listFiles()
          .map(f => (f.getName, f.lastModified(), f.length())).toSet)
        .toMap
    val rl = Some(Layout.Range(2L)): Option[Layout]
    val rng = Paths(tmp("docpipe-range"))
    run(rng, b1, rl)
    val docKeyed = Seq(rng.corpus, rng.shingles,
      rng.root + "/sigs", rng.root + "/lm")
    val before = docKeyed.map(a => a -> bucketFiles(a)).toMap
    before.values.foreach(fp => assert(fp.keySet == Set(s"$B=0")))
    run(rng, b2, rl) // arrival-ordered append: ids 2..3 = bucket 1
    docKeyed.foreach { a =>
      val after = bucketFiles(a)
      assert(after.keySet == before(a).keySet + s"$B=1",
        s"$a: append must create exactly bucket 1: ${after.keySet}")
      before(a).foreach { case (b, files) =>
        assert(after(b) == files,
          s"$a: append rewrote untouched bucket $b (O(batch) broken)")
      }
    }
    run(rng, b3, rl) // old-key update: doc 1 lives in bucket 0
    assert(snap5(rng) == want, "range quintet != unpartitioned control")

    val hsh = Paths(tmp("docpipe-range-hash"))
    Seq(b1, b2, b3).foreach(b => run(hsh, b, Some(Layout.Hash(4))))
    assert(snap5(hsh) == want, "hash quintet != unpartitioned control")

    // crash between lockstep commits on the range layout heals on replay
    case class Killed() extends RuntimeException("killed")
    for (point <- Seq("candidates", "shingles", "corpus", "signatures",
        "lm_counts", "lm")) {
      val p = Paths(tmp(s"docpipe-range-crash-$point"))
      run(p, b1, rl)
      run(p, b2, rl)
      intercept[Killed] {
        run(p, b3, rl, onC = a => if (a == point) throw Killed())
      }
      run(p, b3, rl)
      assert(snap5(p) == want,
        s"range crash after $point: healed quintet != control")
    }
  }

  test("raw html pages flow through the pipeline identically to pre-extracted text") {
    // the crawl face composes with the maintenance face (r11 verdict
    // ask #6): delivering PAGES (url, html) through Html.articleText +
    // docsFromPages must produce byte-identical artifacts to
    // delivering the SAME extraction's output as pre-extracted
    // (doc_id, text) rows — i.e. extraction inside the delivery is
    // exactly the q300 chain, not a second dialect of it.
    val proseA = (1 to 14).map(i => s"word$i").mkString(" ")
    val proseB = proseA + " tail"
    def page(p: String) =
      s"<html><head><title>t</title></head><body><p>$p</p>" +
        "<div>nav</div><script>var x=1;</script></body></html>"
    val pages = Seq(
      ("http://x.test/1", page(proseA)),
      ("http://x.test/2", page(proseB)),
      ("http://x.test/3", page("a totally unrelated island of content here")))
      .toDF("url", "html")
      .withColumn("text", graft.sources.Html.articleText(col("html")))
    val asDocs = graft.sources.Html.docsFromPages(pages)

    val viaPages = Paths(tmp("docpipe-pages"))
    DocumentPipeline.upsertBatch(asDocs,
      viaPages.corpus, viaPages.shingles, viaPages.cands)
    // control: the q300-chain output collected FIRST, then delivered
    // as plain pre-extracted rows
    val pre = asDocs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.toDF("doc_id", "text", "url")
    val viaText = Paths(tmp("docpipe-pretext"))
    DocumentPipeline.upsertBatch(pre,
      viaText.corpus, viaText.shingles, viaText.cands)

    def snap(p: Paths) = (
      spark.read.parquet(p.corpus).select("doc_id", "text", "url")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .toSet,
      spark.read.parquet(p.shingles).select("doc_id", "s").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet,
      candSet(spark.read.parquet(p.cands)))
    val got = snap(viaPages)
    assert(got == snap(viaText),
      "html-page delivery != pre-extracted delivery of the same extraction")
    // non-vacuous: the extraction stripped chrome, and the near-dup
    // pair (pages 1, 2) was mined
    assert(got._1.forall { case (_, t, _) =>
      !t.contains("nav") && !t.contains("var x") })
    assert(got._3.nonEmpty, "near-dup pages must mine a candidate")
  }

  test("maintained counts artifact: delta upkeep ≡ fit(corpus) through append, " +
      "update, retire-only, replay, and migration bootstrap") {
    // the delta-sized lm_score contract (r11 verdict ask #2): the
    // aggregate counts table is maintained by ± batch deltas (stamp-
    // gated per bucket), never by re-aggregating the standing tf —
    // and must stay EXACTLY equal to a one-pass fit over the corpus
    // at every step, with the marker-held total mass matching too.
    val p = Paths(tmp("docpipe-lmc"))
    val lmp = p.root + "/lm"
    val cp = lmp + "__counts"
    def run(b: (Long, String)*) = DocumentPipeline.upsertBatch(
      docs(b: _*), p.corpus, p.shingles, p.cands, lmPath = Some(lmp))
    def countsSet() = spark.read.parquet(cp)
      .select("w1", "bigram", "bc").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    def want() = graft.operators.IncrementalLm
      .fit(spark.read.parquet(p.corpus)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    def checkMass() = assert(
      graft.operators.IncrementalLm.totalMass(spark, cp) ==
        countsSet().toSeq.map(_._3).sum, "marker mass drifted from sum(bc)")

    run((1L, "the cat sat on the mat"), (2L, "a dog ran in the park"))
    assert(countsSet() == want()); checkMass()
    run((3L, "the cat sat on the rug today")) // append
    assert(countsSet() == want()); checkMass()
    run((2L, "entirely new words for doc two")) // update: old bigrams retire
    assert(countsSet() == want()); checkMass()
    run((3L, "single")) // retire-only: empty new group, old rows leave
    assert(countsSet() == want()); checkMass()
    val before = countsSet()
    run((3L, "single")) // replay of a completed batch: zero delta
    assert(countsSet() == before, "replay must not re-apply the delta")
    checkMass()
    // migration: a standing tf WITHOUT a counts artifact (pre-counts
    // era) bootstraps once, atomically, then continues incrementally
    val d = java.nio.file.Paths.get(cp)
    java.nio.file.Files.walk(d)
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(f => { java.nio.file.Files.delete(f); () })
    run((4L, "yet another little document arrives"))
    assert(countsSet() == want(),
      "bootstrap + incremental != fit over the corpus")
    checkMass()
  }

  test("postings-pruned mine: parity, migration bootstrap, crash matrix") {
    val si = graft.operators.ShingleIndex
    def postingsSet(path: String) = spark.read.parquet(path)
      .select("doc_id", "w1h", "g", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    def corpusPostings(p: Paths) = si.postings(
      spark.read.parquet(p.corpus).select(col("doc_id"), col("text")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // batch 1 runs LEGACY (no postings); batch 2 turns the artifact
    // on — the migration bootstrap must derive it from the pre-batch
    // corpus, mine through it, and land the batch into it
    val p = Paths(tmp("docpipe-postings"))
    val pp = p.root + "/postings"
    DocumentPipeline.upsertBatch(
      docs((1L, s"$base a1"), (2L, s"$base a2"),
        (5L, "unrelated island of words entirely alone")),
      p.corpus, p.shingles, p.cands)
    val r2 = DocumentPipeline.upsertBatch(
      docs((3L, s"$base a3"),
        (2L, "rewritten into an entirely different document now")),
      p.corpus, p.shingles, p.cands,
      postingsPath = Some(pp), postingsBuckets = 16)
    assert(r2.postingsTouchedBuckets > 0, r2.toString)
    assert(si.recordedBuckets(spark, pp).contains(16))
    assert(postingsSet(pp) == corpusPostings(p),
      "postings artifact != one-pass derivation from the stored corpus")
    val stored = candSet(spark.read.parquet(p.cands))
    assert(stored == rebuilt(p),
      "pruned-mine candidates != one-pass rebuild")
    assert(stored.exists { case (a, b, _, _, _) => a == 1L && b == 3L } &&
      !stored.exists { case (a, b, _, _, _) => a == 1L && b == 2L },
      s"replacement must swap the (1,2) pair for (1,3): $stored")
    // crash matrix with the postings commit in the sequence:
    // candidates -> postings -> shingles -> corpus; kill after each,
    // replay, require quartet == never-crashed control == rebuild
    val b1 = Seq((1L, s"$base a1"), (2L, s"$base a2"))
    val b2 = Seq((3L, s"$base a3"),
      (2L, "rewritten into an entirely different document now"))
    def snap4(q: Paths) = (
      spark.read.parquet(q.corpus).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet,
      spark.read.parquet(q.shingles).collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1).toList)).toSet,
      candSet(spark.read.parquet(q.cands)),
      postingsSet(q.root + "/postings"))
    val ctl = Paths(tmp("docpipe-postings-ctl"))
    for (b <- Seq(b1, b2))
      DocumentPipeline.upsertBatch(docs(b: _*), ctl.corpus, ctl.shingles,
        ctl.cands, postingsPath = Some(ctl.root + "/postings"),
        postingsBuckets = 16)
    val want = snap4(ctl)
    assert(want._4 == corpusPostings(ctl))
    case class Killed() extends RuntimeException("killed between commits")
    for (point <- Seq("candidates", "postings", "shingles", "corpus")) {
      val q = Paths(tmp(s"docpipe-postings-$point"))
      val qp = q.root + "/postings"
      DocumentPipeline.upsertBatch(docs(b1: _*), q.corpus, q.shingles,
        q.cands, postingsPath = Some(qp), postingsBuckets = 16)
      intercept[Killed] {
        DocumentPipeline.upsertBatch(
          docs(b2: _*), q.corpus, q.shingles, q.cands,
          postingsPath = Some(qp), postingsBuckets = 16,
          onCommitted = a => if (a == point) throw Killed())
      }
      DocumentPipeline.upsertBatch(docs(b2: _*), q.corpus, q.shingles,
        q.cands, postingsPath = Some(qp), postingsBuckets = 16)
      assert(snap4(q) == want,
        s"crash after $point: healed quartet != never-crashed control")
      assert(candSet(spark.read.parquet(q.cands)) == rebuilt(q),
        s"crash after $point: candidates != one-pass rebuild")
    }
  }

  test("LM retire-only update: a one-token replacement removes its stale rows") {
    // partitioned layout so the retire-only bucket rewrite is exercised
    val p = Paths(tmp("docpipe-lm-retire"))
    val lm = p.root + "/lm"
    DocumentPipeline.upsertBatch(
      docs((1L, s"$base a1"), (2L, "some multi token document body here")),
      p.corpus, p.shingles, p.cands, layout = Some(Layout.Hash(4)), lmPath = Some(lm))
    assert(lmStored(lm).exists(_._1 == 2L))
    // doc 2 shrinks to ONE token: its new LM group is empty, and its
    // old bigrams must leave the table anyway
    DocumentPipeline.upsertBatch(
      docs((2L, "single")),
      p.corpus, p.shingles, p.cands, layout = Some(Layout.Hash(4)), lmPath = Some(lm))
    assert(!lmStored(lm).exists(_._1 == 2L),
      "stale bigrams of the shrunk doc must retire")
    assert(lmStored(lm) == lmRecompute(p))
  }
}
