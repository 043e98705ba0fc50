package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Near-duplicate detection over `documents` (north star): exact n-gram
  * Jaccard (q25, oracle-checked), MinHash+LSH banding (q26), and
  * SimHash Hamming-distance blocking (q27).
  *
  * Scale shape: q25's shingle-inverted-index self-join is exact and
  * shuffle-bound by shingle frequency; q26/q27 are the 100 TB paths —
  * candidates only meet when a band/block collides, so the join key
  * space shrinks from |docs|² to bucket-local pairs, and the exact
  * verify runs on candidates only.
  */
object DedupQueries {
  import Q._

  /** Distinct 3-gram token shingles of a *pre-tokenized* array column,
    * pre-hashed to 64-bit keys (empty array below 3 tokens).
    * Joining/intersecting on 8-byte hashes instead of shingle strings
    * shrinks the shuffle and makes per-seed MinHash rehashing O(1) per
    * shingle; a 64-bit collision (~|shingles|²/2⁶⁴) is the standard
    * accepted error of hashed-shingle dedup.
    *
    * Runs through the native [[graft.functions.ShingleHash]]
    * expression — one JVM loop per row. The previous
    * `array_distinct(transform(...))` formulation evaluated the
    * lambda interpreted PER ELEMENT (higher-order functions are
    * CodegenFallback) with a fresh concatenated String each, and
    * re-evaluated any unbound `toks` expression per window; the
    * native form produces bit-identical hashes (oracle-proved:
    * q25/q36/q64 keep hash-matching).
    */
  private[graft] def shingleHashes(toks: Column): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      graft.functions.ShingleHash(
        org.apache.spark.sql.GraftPlanBridge.expression(toks), 3))

  /** Per-doc shingle-hash arrays, spread across the cluster and
    * persisted: every dedup query fans this frame into several join
    * branches, and at 100 TB you materialize the shingle index once,
    * never thrice. The explicit repartition matters on small/few-file
    * inputs too — a single parquet file is one split, and without it
    * the whole O(n·k) shingle pass and the pair joins downstream run
    * on one core.
    */
  private val shingleCache = new StampedCache("shingles")

  /** Drop this session's cached shingle index / pair set (the caches
    * are stamped with a dir fingerprint so a corpus REWRITE rebuilds
    * automatically — see [[StampedCache]] — but a long-lived service
    * should still evict on shutdown to release the session pin).
    */
  def clearCaches(s: SparkSession): Unit = {
    shingleCache.clear(s)
    pairsCache.clear(s)
    candidatesCache.clear(s)
    bandsCache.clear(s)
    simhashCache.clear(s)
    minhashPairsCache.clear(s)
    simhashPairsCache.clear(s)
    clusterCache.clear(s)
    auditShCache.clear(s)
    auditExactCache.clear(s)
    auditLshCache.clear(s)
  }

  /** MinHash band index, persisted per (session, dir): (band key,
    * doc_id). The salted pair miner fans its input into FIVE plan
    * branches (df agg, cold ×2, hot ×2) — without materializing the
    * bands first, every branch would recompute the 32-hash MinHash
    * signatures from the raw corpus. At 100 TB this frame IS the
    * stored LSH index.
    */
  private val bandsCache = new StampedCache("minhash_bands")

  private def minhashBands(s: SparkSession, d: String): DataFrame =
    bandsCache.get(s, d) {
      GraftFunctions.register(s)
      bandsFromShingles(docShingles(s, d).filter(size(col("s")) > 0))
    }

  /** (band key, doc_id) LSH index rows from a (doc_id, s) shingle
    * frame — 32 MinHash rows folded into 16 bands × 2 rows. Factored
    * from [[minhashBands]] so the recall audit (q192) can index its
    * seeded audit corpus through the IDENTICAL band layout the real
    * miner uses (an audit of a different layout would measure
    * nothing).
    */
  private def bandsFromShingles(sh: DataFrame): DataFrame = {
    val sig = sh.select(col("doc_id"),
      GraftFunctions.minhashSig(col("s")).as("sig"))
    val bandArr = transform(sequence(lit(0), lit(15)),
      j => xxhash64(element_at(col("sig"), j * 2 + 1),
        element_at(col("sig"), j * 2 + 2)))
    sig.select(col("doc_id"), posexplode(bandArr))
      .toDF("doc_id", "band_idx", "band_hash")
      .select(xxhash64(col("band_idx"), col("band_hash")).as("k"),
        col("doc_id"))
  }

  /** SimHash signatures, persisted per (session, dir): (doc_id, sig).
    * Blocks derive from the persisted sigs with four bit-ops — cheap —
    * while the signature itself (a full token pass per doc) computes
    * once, not once per miner branch plus twice more in the verify
    * joins.
    */
  private val simhashCache = new StampedCache("simhash_sigs")

  private def simhashSigs(s: SparkSession, d: String): DataFrame =
    simhashCache.get(s, d) {
      GraftFunctions.register(s)
      t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          GraftFunctions.simhash64(
            filter(split(col("text"), " "), tk => length(tk) > 0)).as("sig"))
    }

  private def docShingles(s: SparkSession, d: String): DataFrame =
    shingleCache.get(s, d) {
      t(s, d, "documents")
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("tk",
          filter(split(col("text"), " "), tk => length(tk) > 0))
        .select(col("doc_id"), shingleHashes(col("tk")).as("s"))
    }

  /** q26's VERIFIED pair set, cached/persisted like [[exactPairs]] —
    * the mine + exact-Jaccard verify is the expensive step and is
    * deterministic per corpus, so it is an ingest-time artifact, not a
    * per-query cost (the same discipline as q25's `exact_pairs`; the
    * band index alone amortizes only the cheap signature pass). A
    * cluster of near-identical docs shares whole bands — the same
    * quadratic hot-key shape as q25's shingles — so the band join runs
    * through the shared salted pair miner (64-bit composite key; a
    * hash collision only adds a candidate, which the verify discards).
    */
  private val minhashPairsCache = new StampedCache("minhash_pairs")

  private def minhashPairs(s: SparkSession, d: String): DataFrame =
    minhashPairsCache.get(s, d) {
      GraftFunctions.register(s)
      val cands = graft.operators.SkewJoin
        .saltedSelfPairs(minhashBands(s, d), "k", "doc_id",
          relativeHot = MinerRelativeHot)
        .toDF("doc_a", "doc_b")
        .distinct()
      verifyJaccard(cands,
        docShingles(s, d).filter(size(col("s")) > 0)
          .select(col("doc_id"), col("s")))
    }

  /** q27's VERIFIED pair set, cached/persisted like [[minhashPairs]]:
    * 4×16-bit Hamming block index (any pair within distance 3 shares
    * at least one block — pigeonhole-complete), candidates through the
    * salted miner (exact-duplicate clusters share ALL FOUR blocks, the
    * hottest possible keys), exact Hamming verify on signatures.
    */
  private val simhashPairsCache = new StampedCache("simhash_pairs")

  private def simhashPairs(s: SparkSession, d: String): DataFrame =
    simhashPairsCache.get(s, d) {
      GraftFunctions.register(s)
      graft.operators.HammingBlocks.hammingPairs(
        simhashSigs(s, d), "doc_id", "sig",
        maxBits = 3, relativeHot = MinerRelativeHot)
    }

  /** Recall-audit corpus: the real shingle index plus deterministic
    * PREFIX variants seeded at known mid-band Jaccard. Every doc with
    * `doc_id % 10 == 0` contributes a variant (id `-doc_id - 1`, a
    * range no fixture uses) whose token stream is the first `p`
    * fraction of the original's, `p` cycling through
    * [[AuditPrefixFracs]] — a prefix's distinct shingles are a subset
    * of the original's, so the pair's exact Jaccard lands ≈ p, i.e.
    * deliberately INSIDE the 0.55–0.8 bands where LSH banding theory
    * (1−(1−j²)^16) still predicts ≥0.99 recall but a broken band
    * layout or over-aggressive hot-key guard first shows. The natural
    * corpus populates only the ≥0.9 bands (its near-dups are
    * whole-document copies), which made the audit's mid-range vacuous
    * (r10 verdict ask #4); seeding is the honest fix — the fixture is
    * read-only and a recall audit is exactly the place a curator
    * plants known-overlap probes.
    */
  private val auditShCache = new StampedCache("audit_shingles")

  /** Sampling stride for audit variants: one seeded prefix variant per
    * 10 documents — 10% corpus growth, bounded audit cost at any SF.
    */
  private[graft] val AuditSampleMod = 10L

  /** Prefix fractions the seeded variants cycle through — band centers
    * of the five 0.55–0.8 recall bands (J ≈ p for a prefix variant, so
    * each lands mid-band with margin for shingle-set granularity).
    */
  private[graft] val AuditPrefixFracs =
    Seq(0.575, 0.625, 0.675, 0.725, 0.775)

  private[graft] def auditShingles(s: SparkSession, d: String): DataFrame =
    auditShCache.get(s, d) {
      val frac = element_at(
        array(AuditPrefixFracs.map(lit): _*),
        (expr(s"pmod(doc_id DIV $AuditSampleMod, " +
          s"${AuditPrefixFracs.size})") + 1).cast("int"))
      val variants = t(s, d, "documents")
        .filter(pmod(col("doc_id"), lit(AuditSampleMod)) === 0)
        .withColumn("tk",
          filter(split(col("text"), " "), tk => length(tk) > 0))
        .select((-col("doc_id") - 1).as("doc_id"),
          shingleHashes(slice(col("tk"), lit(1),
            ceil(size(col("tk")) * frac).cast("int"))).as("s"))
        .filter(size(col("s")) > 0)
      docShingles(s, d).filter(size(col("s")) > 0).unionByName(variants)
    }

  /** Exact Jaccard-≥0.5 pairs over the audit corpus — the audit's
    * ground truth, mined by the same inverted-index machinery as q25
    * (shared [[candidatesFromShingles]]). Persisted: ground truth per
    * corpus is an ingest-time artifact like `exact_pairs` itself.
    */
  private val auditExactCache = new StampedCache("audit_exact_pairs")

  private[graft] def auditExactPairs(s: SparkSession, d: String): DataFrame =
    auditExactCache.get(s, d) {
      candidatesFromShingles(auditShingles(s, d))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
    }

  /** MinHash-LSH verified pairs over the audit corpus — the same band
    * layout, salted miner, and exact-Jaccard verify as q26's
    * production path ([[minhashPairs]]), pointed at the seeded corpus.
    */
  private val auditLshCache = new StampedCache("audit_lsh_pairs")

  private[graft] def auditLshPairs(s: SparkSession, d: String): DataFrame =
    auditLshCache.get(s, d) {
      GraftFunctions.register(s)
      val sh = auditShingles(s, d)
      val cands = graft.operators.SkewJoin
        .saltedSelfPairs(bandsFromShingles(sh), "k", "doc_id",
          relativeHot = MinerRelativeHot)
        .toDF("doc_a", "doc_b")
        .distinct()
      verifyJaccard(cands, sh)
    }

  /** Exact Jaccard over candidate pairs given per-doc shingle arrays. */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame): DataFrame =
    cands
      .join(sh.toDF("doc_a", "sa"), "doc_a")
      .join(sh.toDF("doc_b", "sb"), "doc_b")
      .withColumn("inter_cnt",
        size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard",
        col("inter_cnt").cast("double") /
          (size(col("sa")).cast("long") + size(col("sb")).cast("long") -
            col("inter_cnt")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))

  /** Exact Jaccard-≥0.5 near-dup pairs via shingle inverted index —
    * shared by q25 (pair listing) and q36 (cluster assignment), and
    * persisted like the shingle index: the inverted-index self-join is
    * the expensive step, and the cluster pass should consume its
    * result, not replay it.
    */
  private val pairsCache = new StampedCache("exact_pairs")

  private def exactPairs(s: SparkSession, d: String): DataFrame =
    pairsCache.get(s, d)(exactPairsPlan(s, d))

  private def exactPairsPlan(s: SparkSession, d: String): DataFrame =
    pairCandidates(s, d)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"), col("jaccard"))

  /** Scored co-occurring-pair candidates from the salted miner — the
    * shared expensive intermediate under both overlap measures
    * (q25/q36/q64 Jaccard, q68 containment): one mine + cardinality
    * join scores BOTH measures, and each consumer is a filter +
    * column select over this frame. The persisted/durable artifact is
    * kept at the LOOSEST declared threshold — containment ≥
    * [[CandidateFloor]], which is a superset of every consumer
    * because containment ≥ jaccard for any pair — so the stored frame
    * is output-sized (pairs that pass some measure), NOT the raw
    * Σ df²-sized co-occurrence stream, which exists only transiently
    * inside the mine's shuffle as before. A new consumer with a
    * looser threshold than the floor must lower [[CandidateFloor]]
    * (and the stamp-keyed cache rebuilds).
    */
  private val candidatesCache = new StampedCache("pair_candidates")

  /** Loosest overlap threshold any consumer declares (q68's 0.25).
    * `private[graft]` because the streamed/incremental producers of the
    * same `pair_candidates` artifact ([[graft.streaming.DocumentPipeline]],
    * [[graft.operators.IncrementalDedup]]) must default to THIS floor —
    * a literal copy there would silently desync the streamed artifact
    * from the batch-rebuilt one if either side were retuned.
    */
  private[graft] val CandidateFloor = 0.25

  private[graft] def pairCandidates(s: SparkSession, d: String): DataFrame =
    candidatesCache.get(s, d)(
      candidatesFromShingles(docShingles(s, d), HotShingleDf, CandidateFloor))

  /** Scored candidates from a (doc_id, s: array<long>) shingle frame —
    * the full-rebuild form of the stored artifact; the incremental
    * twin is [[graft.operators.IncrementalDedup.deltaCandidates]].
    */
  private[graft] def candidatesFromShingles(
      sh: DataFrame, hotDf: Int = HotShingleDf,
      floor: Double = CandidateFloor): DataFrame =
    scoreCandidates(minedHits(sh, hotDf), sh, floor)

  /** The raw mine: one (doc_a, doc_b) row per shared shingle, via the
    * hot-key-salted self-join (corpus-scaled hot threshold — see
    * [[MinerRelativeHot]]).
    */
  private def minedHits(sh: DataFrame, hotDf: Int): DataFrame =
    graft.operators.SkewJoin
      .saltedSelfPairs(
        sh.select(col("doc_id"), explode(col("s")).as("g")),
        "g", "doc_id", hotDf, SaltBuckets, MinerRelativeHot)
      .toDF("doc_a", "doc_b")

  /** Both overlap measures scored over raw (doc_a, doc_b) hit rows —
    * the ONE copy of the count/cardinality-join/measure math under
    * every miner (full and incremental): (doc_a, doc_b, inter_cnt,
    * na, nb, jaccard, containment), kept where containment ≥ `floor`.
    */
  private[graft] def scoreCandidates(
      hits: DataFrame, sh: DataFrame, floor: Double): DataFrame =
    scoreCandidatesCards(hits,
      sh.select(col("doc_id"), size(col("s")).cast("long").as("n")), floor)

  /** [[scoreCandidates]] with the cardinalities `(doc_id, n)` already
    * at hand — the postings-index path ([[graft.operators
    * .ShingleIndex]]) carries `n` on every posting row, so it never
    * materializes a corpus-wide shingle frame just to size it.
    */
  private[graft] def scoreCandidatesCards(
      hits: DataFrame, card: DataFrame, floor: Double): DataFrame = {
    hits
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter_cnt"))
      .join(card.toDF("doc_a", "na"), "doc_a")
      .join(card.toDF("doc_b", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter_cnt").cast("double") /
          (col("na") + col("nb") - col("inter_cnt")).cast("double"))
      .withColumn("containment",
        col("inter_cnt").cast("double") /
          least(col("na"), col("nb")).cast("double"))
      .filter(col("containment") >= floor)
  }

  /** Document-frequency threshold above which a shingle's self-join is
    * salted, and the salt fan-out. A shingle shared by f documents
    * produces f²/2 join rows through ONE join key — on skewed real
    * text (boilerplate headers) that pins one reducer. Above the
    * threshold the pair enumeration is spread across SaltBuckets²
    * reducer cells (the [[graft.operators.SkewJoin]] discipline,
    * generalized to self-join pair mining: BOTH sides replicate
    * SaltBuckets ways so each pair meets in exactly one (bx, by)
    * cell). The output pair set is IDENTICAL — only the shuffle
    * layout changes; PairSkewSpec proves set equality. The quadratic
    * pair COUNT itself is inherent to exact Jaccard (a production
    * near-dup pass would additionally cap df and drop
    * boilerplate shingles — that changes semantics, so the exact
    * oracle-checked q25 only spreads the work).
    */
  private val HotShingleDf = 128
  private val SaltBuckets = 8

  /** Corpus-scaled half of the miners' hot threshold: a key salts when
    * its df exceeds max([[HotShingleDf]]-style absolute floor,
    * [[MinerRelativeHot]] × mean df) — the [[graft.operators.SkewJoin
    * .saltedSelfJoin]] adaptive form q54's IVF miner already used.
    * The absolute floor alone silently expires with corpus growth: a
    * corpus whose MEAN shingle/band/block df outgrows the constant
    * would start salting every balanced key (paying the five-branch
    * fan-out corpus-wide), while 4× the observed mean tracks the df
    * distribution at any scale. Shared by the shingle (q25/q36/q64/
    * q68), MinHash-band (q26), SimHash-block (q27), pHash-block
    * (q73/q75) and incremental miners — the threshold only picks the
    * shuffle layout, never the pair set (PairSkewSpec proves set
    * equality), so batch/streamed artifacts cannot desync over it.
    */
  private[graft] val MinerRelativeHot = 4.0

  /** Exact Jaccard-≥`threshold` pairs from a (doc_id, s: array<long>)
    * shingle frame — the inverted-index self-join through the shared
    * hot-key-salted pair miner ([[graft.operators.SkewJoin
    * .saltedSelfPairs]]). `hotDf` overridable for tests.
    */
  private[graft] def pairsFromShingles(
      sh: DataFrame, hotDf: Int = HotShingleDf,
      threshold: Double = 0.5): DataFrame =
    scorePairs(minedHits(sh, hotDf), sh, threshold)

  /** Jaccard-thresholded pair view over [[scoreCandidates]] (q25's
    * output shape — every exact-Jaccard miner, full and incremental,
    * shares the one scoring copy there). No mandatory broadcast hints
    * in the scoring joins: the pair side is usually small on the
    * incremental path, but its size is bounded by corpus shingle
    * document frequency, not delta size — one boilerplate shingle can
    * make it huge, and a forced broadcast would then OOM the driver.
    * AQE converts these joins to broadcast at runtime exactly when
    * the pair side measures small.
    */
  private[graft] def scorePairs(
      hits: DataFrame, sh: DataFrame, threshold: Double): DataFrame =
    scoreCandidates(hits, sh, floor = 0.0)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("inter_cnt"), col("jaccard"))

  /** The shingle-derivation CTE prefix (string shingles — the oracle
    * twin of the hashed [[shingleHashes]] index), shared by every
    * shingle-family oracle (q25/q36/q64 pair mining, q68 containment,
    * q70 novelty).
    */
  private val shingleSql =
    """toks AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
      |  FROM documents),
      |sh AS (SELECT doc_id, list_distinct(list_transform(
      |    range(1, greatest(len(t) - 1, 1)),
      |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
      |  FROM toks),
      |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
      |card AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n FROM sh)""".stripMargin

  /** Full-corpus near-dup cluster map `(doc_id, cluster, is_dup)` —
    * q36's body, shared with the batch release pipeline
    * ([[graft.Release]]): cluster = min-label component id over the
    * exact Jaccard ≥ 0.5 pairs, singletons self-clustered, and a doc
    * is the cluster's survivor exactly when `is_dup = 0`
    * (min-label ⇒ survivor = minimum id, [[graft.operators
    * .DedupClusters.survivors]]' rule).
    */
  private val clusterCache = new StampedCache("cluster_map")

  private[graft] def clusterMap(s: SparkSession, d: String): DataFrame =
    clusterCache.get(s, d) {
      // assign() runs the iterative min-label loop EAGERLY (a job per
      // round) — the stamped cache makes that a once-per-corpus cost
      // instead of once per q36/release/SQL-view invocation
      val pairs = exactPairs(s, d).select(col("doc_a"), col("doc_b"))
      val labels = graft.operators.DedupClusters
        .assign(pairs, "doc_a", "doc_b")
        .withColumnRenamed("id", "doc_id")
      t(s, d, "documents").select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .withColumn("is_dup",
          when(col("cluster") =!= col("doc_id"), 1).otherwise(0).cast("int"))
    }

  /** Quality-aware survivor map `(doc_id, cluster, keep)` — q84's body,
    * shared with [[graft.Release]]'s best-quality survivor policy:
    * survivor = argmax (q31 score, then min doc_id on ties) within each
    * [[clusterMap]] component. The argmax is a partial-aggregable max
    * over a (score, -doc_id) struct — one shuffle on cluster,
    * associative, so a corpus-sized boilerplate cluster combines
    * map-side instead of pinning a reducer. Zero-token docs score NULL
    * and can never be chosen over a scored member.
    */
  private[graft] def qualitySurvivorMap(s: SparkSession, d: String): DataFrame = {
    val cm = clusterMap(s, d)
    val sc = TextQueries.qualityScores(s, d)
      .select(col("doc_id"), col("score"))
    val best = cm.join(sc, Seq("doc_id"))
      .groupBy(col("cluster"))
      .agg(max(struct(col("score"), (-col("doc_id")).as("nid"))).as("b"))
      .select(col("cluster"), (-col("b.nid")).as("survivor_id"))
    cm.join(best, Seq("cluster"))
      .select(col("doc_id"), col("cluster"),
        when(col("doc_id") === col("survivor_id"), 1).otherwise(0)
          .cast("int").as("keep"))
  }

  /** One row per fixed 16-token segment occurrence
    * `(doc_id, idx: 0-based segment position, hh: md5, ntok)` — the
    * shared single-scan pass under q76 (per-doc dup accounting), q81
    * (corpus-wide boilerplate report) and q223 (maximal duplicated
    * runs, which needs the position to merge adjacency): tokens bind
    * once, segment enumeration is a codegen'd HOF, and rows carry
    * 16-byte digests, never segment text.
    */
  private def docSegments(s: SparkSession, d: String): DataFrame = {
    val W = 16
    t(s, d, "documents")
      .withColumn("tk",
        filter(split(col("text"), " "), tk => length(tk) > 0))
      .withColumn("n", size(col("tk")))
      .filter(col("n") > 0)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), expr(s"CAST((n + ${W - 1}) DIV $W AS INT) - 1")),
          i => slice(col("tk"), i * W + 1, lit(W)))).as(Seq("idx", "seg")))
      .select(col("doc_id"),
        col("idx").cast("long").as("idx"),
        md5(array_join(col("seg"), " ")).as("hh"),
        size(col("seg")).cast("long").as("ntok"))
  }

  /** q276's whole pipeline over an arbitrary `(doc_id, text)` frame —
    * factored out so the spec can feed CRAFTED documents (the
    * 10-token cross-doc duplicate q223's fixed grid provably misses,
    * and a shifted copy) through the exact production path.
    *
    * Content-defined segmentation: a token whose md5 leads with hex
    * 0/1 OPENS a segment (P=1/8, mean ≈8 tokens). Boundaries are a
    * function of content alone, so two copies of a passage share
    * their interior boundaries at any position — the property the
    * fixed 16-token grid lacks.
    */
  private[graft] def cdcDupSpans(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .withColumn("tk",
        filter(split(col("text"), " "), tk => length(tk) > 0))
      .filter(size(col("tk")) > 0)
      .select(col("doc_id"), posexplode(col("tk")).as(Seq("ti", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("ti"))
    val seg = toks
      .withColumn("bd",
        when(substring(md5(col("tok")), 1, 1).isin("0", "1"), 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("bd")).over(w))
      .groupBy(col("doc_id"), col("sid"))
      .agg(
        min(col("ti")).cast("long").as("tok_start"),
        count(lit(1)).cast("long").as("ntok"),
        md5(array_join(
          transform(
            sort_array(collect_list(struct(col("ti"), col("tok")))),
            x => x.getField("tok")), " ")).as("hh"))
    val dfq = seg.groupBy(col("hh"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val dup = seg.join(dfq, Seq("hh")).filter(col("df") >= 2)
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("sid"))
    dup
      .withColumn("grp", col("sid") - row_number().over(wd))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("tok_start")).cast("long").as("span_start_tok"),
        count(lit(1)).cast("long").as("span_segs"),
        sum(col("ntok")).cast("long").as("span_tokens"),
        min(col("df")).cast("long").as("min_df"))
      .filter(col("span_tokens") >= 8)
      .select(col("doc_id"), col("span_start_tok"), col("span_segs"),
        col("span_tokens"), col("min_df"))
      .orderBy(col("doc_id"), col("span_start_tok"))
  }

  /** The q76/q81/q223 segment-derivation CTE chain (DuckDB twin of
    * [[docSegments]]), shared so the oracles cannot drift.
    */
  private val segSql: String =
    """toks AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
      |  FROM documents),
      |d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
      |segs AS (SELECT doc_id, CAST(i AS BIGINT) AS idx,
      |    list_slice(t, i*16 + 1, i*16 + 16) AS seg
      |  FROM d, unnest(range(0, (n + 15) // 16)) AS r(i)),
      |h AS (SELECT doc_id, idx, md5(array_to_string(seg, ' ')) AS hh,
      |    CAST(len(seg) AS BIGINT) AS ntok
      |  FROM segs)""".stripMargin

  /** The q25 pair-derivation CTE chain, reused verbatim by q36's oracle. */
  private val pairsSql =
    s"""$shingleSql,
      |inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
      |    count(*) AS inter_cnt
      |  FROM ex x JOIN ex y ON x.g = y.g AND x.doc_id < y.doc_id
      |  GROUP BY x.doc_id, y.doc_id)""".stripMargin

  /** Jaccard-≥0.5-thresholded `pairs` CTE over [[pairsSql]]'s `inter` —
    * ONE definition of the oracle-side pair threshold, shared by every
    * oracle consuming scored pairs (q36/q84 clustering, q85 leakage).
    */
  private val pairsThresholdSql =
    """pairs AS (SELECT doc_a, doc_b FROM inter
      |  JOIN card ca ON ca.doc_id = doc_a
      |  JOIN card cb ON cb.doc_id = doc_b
      |  WHERE CAST(inter_cnt AS DOUBLE)/CAST(ca.n + cb.n - inter_cnt AS DOUBLE)
      |    >= 0.5)""".stripMargin

  /** Recursive min-label `lab` CTE over `pairs` — the oracle twin of
    * [[clusterMap]]'s component labeling, shared by q36 and q84 so the
    * two cluster oracles cannot drift. Requires `WITH RECURSIVE`,
    * [[pairsSql]] and [[pairsThresholdSql]] upstream.
    */
  private val clusterLabSql =
    s"""$pairsThresholdSql,
      |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
      |  UNION SELECT doc_b, doc_a FROM pairs
      |  UNION SELECT doc_a, doc_a FROM pairs
      |  UNION SELECT doc_b, doc_b FROM pairs),
      |reach AS (SELECT a AS id, b AS r FROM sym
      |  UNION SELECT reach.id, sym.b FROM reach JOIN sym ON reach.r = sym.a),
      |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ── q25: exact n-gram Jaccard near-dup pairs via shingle inverted
    // index (ref: normalized-key dedup `Batch Processor.py:263-265`
    // generalized to fuzzy content keys).
    QueryDef(
      "q25_dedup_ngram_jaccard",
      (s, d) => exactPairs(s, d).orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $pairsSql
              |SELECT doc_a, doc_b, inter_cnt,
              |  CAST(inter_cnt AS DOUBLE)/CAST(ca.n + cb.n - inter_cnt AS DOUBLE)
              |    AS jaccard
              |FROM inter
              |JOIN card ca ON ca.doc_id = doc_a
              |JOIN card cb ON cb.doc_id = doc_b
              |WHERE CAST(inter_cnt AS DOUBLE)/CAST(ca.n + cb.n - inter_cnt AS DOUBLE)
              |  >= 0.5
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ── q36: near-dup *cluster* assignment (north star: dedup keeps one
    // survivor per cluster, not per pair). Exact q25 pairs → iterative
    // min-label connected components ([[graft.operators.DedupClusters]],
    // one shuffle per round, O(diameter) rounds — 2-3 on real dup
    // graphs, loud failure past maxIters) → full-corpus mapping with
    // singletons self-clustered. Oracle: recursive-CTE reachability min.
    QueryDef(
      "q36_dedup_clusters",
      (s, d) => clusterMap(s, d).orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $pairsSql,
              |$clusterLabSql
              |SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster,
              |  CAST(CASE WHEN COALESCE(l.cluster, d.doc_id) <> d.doc_id
              |    THEN 1 ELSE 0 END AS INTEGER) AS is_dup
              |FROM documents d LEFT JOIN lab l ON l.id = d.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // ── q26: MinHash + LSH banding (north star scale path). 32 hashes,
    // 16 bands × 2 rows; candidates verified with exact Jaccard, so
    // output ⊆ q25's (approximate recall — rows-only driver check,
    // equality vs q25 asserted probabilistically in scalatest).
    QueryDef(
      "q26_dedup_minhash",
      (s, d) => minhashPairs(s, d).orderBy(col("doc_a"), col("doc_b")),
      None),

    // ── q27: SimHash near-dup pairs (north star). 64-bit signatures,
    // 4×16-bit block index (any pair within Hamming distance 3 shares
    // at least one block), exact Hamming verify on candidates.
    QueryDef(
      "q27_dedup_simhash",
      (s, d) => simhashPairs(s, d).orderBy(col("doc_a"), col("doc_b")),
      None),

    // ── q64: benchmark decontamination — the named LLM-pipeline step
    // of flagging training documents that share n-gram content with an
    // evaluation set (docs 0-19 stand in for the benchmark). The
    // benchmark's shingle postings are tiny by construction →
    // BROADCAST into the corpus postings: contamination detection is a
    // map-side pass over the training corpus, no shuffle of corpus
    // postings, reusing the persisted shingle index. Same
    // hashed-shingle-vs-string-shingle oracle equivalence as q25.
    QueryDef(
      "q64_decontaminate",
      (s, d) => {
        val sh = docShingles(s, d)
        val bench = sh.filter(col("doc_id") < 20)
          .select(col("doc_id").as("bench_id"), explode(col("s")).as("g"))
        val train = sh.filter(col("doc_id") >= 20)
          .select(col("doc_id"), explode(col("s")).as("g"))
        train.join(broadcast(bench), Seq("g"))
          .groupBy(col("doc_id"), col("bench_id"))
          .agg(count(lit(1)).as("overlap_cnt"))
          .filter(col("overlap_cnt") >= 3)
          .orderBy(col("doc_id"), col("bench_id"))
      },
      Some(s"""WITH $pairsSql,
              |b AS (SELECT doc_id AS bench_id, unnest(s) AS g FROM sh
              |  WHERE doc_id < 20),
              |tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id >= 20)
              |SELECT tr.doc_id, bench_id, count(*) AS overlap_cnt
              |FROM tr JOIN b USING (g)
              |GROUP BY tr.doc_id, bench_id
              |HAVING count(*) >= 3
              |ORDER BY doc_id, bench_id""".stripMargin)),

    // ── q68: containment near-dup pairs — the ASYMMETRIC overlap
    // measure (|A∩B| / min(|A|,|B|)) that Jaccard misses: a short
    // document wholly embedded in a long one scores near 1.0 here but
    // can sit far below any Jaccard threshold because the union is
    // dominated by the long side. This is the detector for
    // quote/excerpt/chunk duplication inside a training corpus. Shares
    // the persisted [[pairCounts]] co-occurrence index with q25 — the
    // hot-key-salted mine runs once per corpus, and each overlap
    // measure is a cardinality join + filter over it; the threshold
    // (0.25) runs on an exact integer ratio so both engines compare
    // identical IEEE doubles.
    QueryDef(
      "q68_doc_containment",
      (s, d) =>
        pairCandidates(s, d)
          .filter(col("containment") >= 0.25)
          .select(col("doc_a"), col("doc_b"), col("inter_cnt"), col("containment"))
          .orderBy(col("doc_a"), col("doc_b")),
      Some(s"""WITH $pairsSql
              |SELECT doc_a, doc_b, inter_cnt,
              |  CAST(inter_cnt AS DOUBLE)/CAST(least(ca.n, cb.n) AS DOUBLE)
              |    AS containment
              |FROM inter
              |JOIN card ca ON ca.doc_id = doc_a
              |JOIN card cb ON cb.doc_id = doc_b
              |WHERE CAST(inter_cnt AS DOUBLE)/CAST(least(ca.n, cb.n) AS DOUBLE)
              |  >= 0.25
              |ORDER BY doc_a, doc_b""".stripMargin)),

    // ── q70: n-gram novelty — per-document fraction of shingles unique
    // to that document in the corpus (df = 1). The inverse boilerplate
    // signal: low novelty means the document is assembled from content
    // that appears elsewhere (template spam, mirrored chunks) even when
    // no single pair passes a dedup threshold — a corpus-level quality
    // gate the pairwise family cannot express. Reuses the persisted
    // hashed-shingle index; document frequency is one map-side-partial
    // aggregate on the shingle key (the same key the q25 join
    // shuffles), and the df join is shuffle-bound by distinct-shingle
    // cardinality, not corpus bytes.
    QueryDef(
      "q70_ngram_novelty",
      (s, d) => {
        val ex = docShingles(s, d)
          .select(col("doc_id"), explode(col("s")).as("g"))
        val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
        ex.join(dfreq, Seq("g"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("long").as("n_shingles"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).cast("long")
              .as("novel_cnt"))
          .withColumn("novelty",
            round(col("novel_cnt").cast("double") /
              col("n_shingles").cast("double"), 6))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $shingleSql,
              |dfreq AS (SELECT g, count(*) AS df FROM ex GROUP BY g),
              |nov AS (SELECT ex.doc_id,
              |    CAST(count(*) AS BIGINT) AS n_shingles,
              |    CAST(count(*) FILTER (WHERE df = 1) AS BIGINT) AS novel_cnt
              |  FROM ex JOIN dfreq USING (g) GROUP BY ex.doc_id)
              |SELECT doc_id, n_shingles, novel_cnt,
              |  round(CAST(novel_cnt AS DOUBLE)/CAST(n_shingles AS DOUBLE), 6)
              |    AS novelty
              |FROM nov ORDER BY doc_id""".stripMargin)),

    // ── q76: duplicated-passage stats (CCNet-style cross-document
    // segment scrub). Documents split into FIXED non-overlapping
    // 16-token segments; a segment whose hash occurs in ≥ 2 distinct
    // documents is boilerplate (nav bars, license headers, mirrored
    // paragraphs) and its token mass is flagged for removal. This is
    // the passage-grain member of the dedup family: q25/q68 score
    // whole-document overlap, q70 scores shingle novelty, q76 names
    // the exact byte ranges a release pipeline would CUT — per doc it
    // reports total/duplicated segment counts and the token masses on
    // each side, all exact integers.
    //
    // Scale shape: ONE corpus scan (tokens bind once, segment
    // enumeration is a codegen'd HOF; the emitted row carries the
    // 16-byte segment md5, never segment text), then aggregation at
    // (segment, doc) grain with map-side partials, a window count
    // over the segment hash for document frequency, and a final
    // rollup on doc_id — three exchanges, every one bounded by
    // segment cardinality (≈ corpus_tokens/16 rows of digests), not
    // corpus bytes. No join back to the corpus and no second scan.
    QueryDef(
      "q76_dup_segments",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        docSegments(s, d)
          .groupBy(col("hh"), col("doc_id"))
          .agg(count(lit(1)).as("cnt"), sum(col("ntok")).as("ntok_sum"))
          .withColumn("df", count(lit(1)).over(Window.partitionBy(col("hh"))))
          .groupBy(col("doc_id"))
          .agg(
            sum(col("cnt")).cast("long").as("n_segments"),
            sum(when(col("df") >= 2, col("cnt")).otherwise(0L)).cast("long")
              .as("dup_segments"),
            sum(when(col("df") >= 2, col("ntok_sum")).otherwise(0L)).cast("long")
              .as("dup_tokens"),
            sum(when(col("df") < 2, col("ntok_sum")).otherwise(0L)).cast("long")
              .as("kept_tokens"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $segSql,
              |dfq AS (SELECT hh, count(DISTINCT doc_id) AS df FROM h GROUP BY 1)
              |SELECT h.doc_id, CAST(count(*) AS BIGINT) AS n_segments,
              |  CAST(count(*) FILTER (WHERE df >= 2) AS BIGINT) AS dup_segments,
              |  CAST(coalesce(sum(ntok) FILTER (WHERE df >= 2), 0) AS BIGINT)
              |    AS dup_tokens,
              |  CAST(coalesce(sum(ntok) FILTER (WHERE df < 2), 0) AS BIGINT)
              |    AS kept_tokens
              |FROM h JOIN dfq USING (hh) GROUP BY 1
              |ORDER BY doc_id""".stripMargin)),

    // ── q81: boilerplate passages — the corpus-wide face of q76: q76
    // tells each document how much duplicated mass to cut, q81 NAMES
    // the passages (top-20 segments by document frequency) — the
    // report a curator reads to find the nav bar / license header /
    // mirrored template behind the numbers, with an example document
    // to open. Same single-scan segment pass (shared [[docSegments]]),
    // one segment-cardinality-bounded aggregation, top-20 as
    // TakeOrdered — no global sort.
    QueryDef(
      "q81_boilerplate_passages",
      (s, d) =>
        docSegments(s, d)
          .groupBy(col("hh").as("seg_md5"))
          .agg(
            countDistinct(col("doc_id")).as("df"),
            count(lit(1)).as("occurrences"),
            min(col("doc_id")).as("example_doc"))
          .filter(col("df") >= 2)
          .orderBy(col("df").desc, col("occurrences").desc, col("seg_md5"))
          .limit(20),
      Some(s"""WITH $segSql,
              |agg AS (SELECT hh AS seg_md5, count(DISTINCT doc_id) AS df,
              |    CAST(count(*) AS BIGINT) AS occurrences,
              |    min(doc_id) AS example_doc
              |  FROM h GROUP BY 1)
              |SELECT seg_md5, df, occurrences, example_doc FROM agg
              |WHERE df >= 2
              |ORDER BY df DESC, occurrences DESC, seg_md5 LIMIT 20""".stripMargin)),

    // ── q223: maximal duplicated SPANS — q76's segment scrub at the
    // grain a cutter actually cuts: adjacent duplicated 16-token
    // segments (segment-hash df ≥ 2) merge into MAXIMAL runs per
    // document, so a 400-token mirrored block reports as ONE span,
    // not 25 segments. Per run: (doc_id, span_start = first segment
    // index, span_segs, span_tokens, min_df = the weakest
    // cross-document evidence inside the run), plus the per-doc
    // readouts a release report leads with (longest run, duplicated
    // mass in runs) denormalized onto each row. q76 stays the
    // per-doc accounting face; q81 the corpus-wide passage report;
    // q223 names the byte ranges.
    //
    // Scale shape: the shared [[docSegments]] single scan, df as one
    // segment-cardinality-bounded aggregate joined back on the
    // segment hash (the q76 exchange), then gaps-and-islands: run id
    // = idx − row_number within the doc's duplicated segments — the
    // ONLY window is per-document, bounded by doc length / 16, never
    // corpus-wide (Q.scala's window rule); runs and the per-doc
    // rollup aggregate at run grain. Every measure is an exact
    // integer; output carries a total order.
    QueryDef(
      "q223_dup_spans",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val segs = docSegments(s, d)
        val dfq = segs.groupBy(col("hh"))
          .agg(countDistinct(col("doc_id")).as("df"))
        val dup = segs.join(dfq, Seq("hh")).filter(col("df") >= 2)
        val runs = dup
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("doc_id")).orderBy(col("idx"))))
          .withColumn("grp", col("idx") - col("rn"))
          .groupBy(col("doc_id"), col("grp"))
          .agg(
            min(col("idx")).cast("long").as("span_start"),
            count(lit(1)).cast("long").as("span_segs"),
            sum(col("ntok")).cast("long").as("span_tokens"),
            min(col("df")).cast("long").as("min_df"))
          .drop("grp")
        val per = runs.groupBy(col("doc_id"))
          .agg(max(col("span_segs")).cast("long").as("doc_longest_segs"),
            sum(col("span_tokens")).cast("long").as("doc_run_tokens"))
        runs.join(per, Seq("doc_id"))
          .select(col("doc_id"), col("span_start"), col("span_segs"),
            col("span_tokens"), col("min_df"),
            col("doc_longest_segs"), col("doc_run_tokens"))
          .orderBy(col("doc_id"), col("span_start"))
      },
      Some(s"""WITH $segSql,
              |dfq AS (SELECT hh, count(DISTINCT doc_id) AS df
              |  FROM h GROUP BY 1),
              |dup AS (SELECT h.doc_id, idx, ntok, df
              |  FROM h JOIN dfq USING (hh) WHERE df >= 2),
              |r AS (SELECT doc_id, idx, ntok, df,
              |    idx - row_number() OVER (PARTITION BY doc_id ORDER BY idx)
              |      AS grp
              |  FROM dup),
              |runs AS (SELECT doc_id,
              |    CAST(min(idx) AS BIGINT) AS span_start,
              |    CAST(count(*) AS BIGINT) AS span_segs,
              |    CAST(sum(ntok) AS BIGINT) AS span_tokens,
              |    CAST(min(df) AS BIGINT) AS min_df
              |  FROM r GROUP BY doc_id, grp),
              |per AS (SELECT doc_id,
              |    CAST(max(span_segs) AS BIGINT) AS doc_longest_segs,
              |    CAST(sum(span_tokens) AS BIGINT) AS doc_run_tokens
              |  FROM runs GROUP BY doc_id)
              |SELECT runs.doc_id, span_start, span_segs, span_tokens,
              |  min_df, doc_longest_segs, doc_run_tokens
              |FROM runs JOIN per USING (doc_id)
              |ORDER BY doc_id, span_start""".stripMargin)),

    // ── q276: CONTENT-DEFINED duplicated spans — q223's residual
    // (r9 verdict gap): a duplicated passage SHORTER than 16 tokens,
    // or one whose copies sit at different offsets, never fills a
    // fixed 16-token segment with identical content, so the fixed
    // grid is blind to it. Here segment boundaries are ANCHORED ON
    // CONTENT (a token whose md5 leads with hex 0/1 opens a segment —
    // P=1/8, mean ≈8 tokens, the CDC/winnowing idea from the
    // published dedup literature): the copies of a passage carry the
    // same interior boundaries WHEREVER they sit, so any duplicated
    // region containing ≥1 complete interior segment is caught —
    // down to ~8 tokens and at ANY relative alignment, without a
    // distributed suffix array. Runs of adjacent duplicated segments
    // merge exactly as in q223; only runs of ≥8 duplicated tokens
    // report (a trivial 1-2-token common segment is real duplication
    // but not a cuttable span). min_df is the weakest cross-document
    // evidence inside the run (q223's caveat: a run's segments need
    // not share the SAME partner document).
    //
    // Scale shape: one corpus scan; the boundary flag and segment id
    // are per-DOC windows (bounded by a document's token count, never
    // corpus-wide); df is one segment-grain exchange joined back on
    // the digest; the run merge is again a per-doc window. Identical
    // exchange structure to q223 — the finer grain only multiplies
    // the segment-row count ~2× (mean 8 vs 16 tokens).
    QueryDef(
      "q276_dup_spans_cdc",
      (s, d) => cdcDupSpans(t(s, d, "documents")),
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> len(x) > 0)
             |      AS t
             |  FROM documents),
             |tok AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS ti,
             |    t[i] AS tok
             |  FROM toks, unnest(range(1, len(t) + 1)) AS r(i)
             |  WHERE len(t) > 0),
             |b AS (SELECT doc_id, ti, tok,
             |    CASE WHEN substring(md5(tok), 1, 1) IN ('0', '1')
             |      THEN 1 ELSE 0 END AS bd
             |  FROM tok),
             |sg AS (SELECT doc_id, ti, tok,
             |    sum(bd) OVER (PARTITION BY doc_id ORDER BY ti) AS sid
             |  FROM b),
             |seg AS (SELECT doc_id, sid,
             |    CAST(min(ti) AS BIGINT) AS tok_start,
             |    CAST(count(*) AS BIGINT) AS ntok,
             |    md5(string_agg(tok, ' ' ORDER BY ti)) AS hh
             |  FROM sg GROUP BY 1, 2),
             |dfq AS (SELECT hh, count(DISTINCT doc_id) AS df
             |  FROM seg GROUP BY 1),
             |dup AS (SELECT seg.doc_id, sid, tok_start, ntok, df
             |  FROM seg JOIN dfq USING (hh) WHERE df >= 2),
             |r AS (SELECT *, sid - row_number()
             |    OVER (PARTITION BY doc_id ORDER BY sid) AS grp
             |  FROM dup),
             |runs AS (SELECT doc_id,
             |    CAST(min(tok_start) AS BIGINT) AS span_start_tok,
             |    CAST(count(*) AS BIGINT) AS span_segs,
             |    CAST(sum(ntok) AS BIGINT) AS span_tokens,
             |    CAST(min(df) AS BIGINT) AS min_df
             |  FROM r GROUP BY doc_id, grp)
             |SELECT doc_id, span_start_tok, span_segs, span_tokens,
             |  min_df
             |FROM runs WHERE span_tokens >= 8
             |ORDER BY doc_id, span_start_tok""".stripMargin)),

    // ── q295: DEDUP QUALITY GAP — per source: kept vs dropped doc
    // counts under q36's cluster map, and the mean q31 quality score
    // of each side: "is dedup deleting good content or trash" — the
    // reassurance readout a curation review wants BEFORE shipping a
    // survivor rule (a dropped-mean ABOVE the kept-mean argues for
    // q84's best-quality survivors instead of first-crawled). Scores
    // quantize to micro longs map-side (a raw float SUM would be
    // shuffle-order-dependent — the exactness rule), sums ride
    // DECIMAL(38,0), and each mean is one mirrored double chain;
    // zero-token docs score NULL and are excluded from means (but
    // counted in kept/dropped).
    //
    // Scale shape: two cached narrow bases (cluster map, scores) join
    // the (doc_id, source) projection; one |sources| exchange.
    QueryDef(
      "q295_dedup_quality_gap",
      (s, d) => {
        val cm = clusterMap(s, d).select(col("doc_id"), col("is_dup"))
        val qs = TextQueries.qualityScores(s, d)
          .select(col("doc_id"),
            round(col("score") * lit(1000000.0), 0).cast("long").as("sm"))
        val m = t(s, d, "documents").select(col("doc_id"), col("source"))
          .join(cm, Seq("doc_id"))
          .join(qs, Seq("doc_id"), "left")
          .groupBy(col("source"))
          .agg(count(when(col("is_dup") === 0, 1)).cast("long").as("kept"),
            count(when(col("is_dup") === 1, 1)).cast("long").as("dropped"),
            count(when(col("is_dup") === 0 && col("sm").isNotNull, 1))
              .cast("long").as("ks"),
            count(when(col("is_dup") === 1 && col("sm").isNotNull, 1))
              .cast("long").as("ds"),
            sum(when(col("is_dup") === 0, col("sm"))
              .cast("decimal(38,0)")).as("sk"),
            sum(when(col("is_dup") === 1, col("sm"))
              .cast("decimal(38,0)")).as("sd"))
        val mk = m("sk").cast("double") / m("ks").cast("double") /
          lit(1000000.0)
        val md = m("sd").cast("double") / m("ds").cast("double") /
          lit(1000000.0)
        m.select(col("source"), col("kept"), col("dropped"),
          round(mk, 6).as("kept_mean_score"),
          round(md, 6).as("dropped_mean_score"),
          round(mk - md, 6).as("quality_gap"))
          .orderBy(col("source"))
      },
      Some(s"""WITH RECURSIVE $pairsSql,
              |$clusterLabSql,
              |${TextQueries.QualityCteSql},
              |cm AS (SELECT d.doc_id, d.source,
              |    CASE WHEN COALESCE(l.cluster, d.doc_id) <> d.doc_id
              |      THEN 1 ELSE 0 END AS is_dup
              |  FROM documents d LEFT JOIN lab l ON l.id = d.doc_id),
              |x AS (SELECT cm.doc_id, source, is_dup,
              |    CAST(round(1000000*q.score) AS BIGINT) AS sm
              |  FROM cm LEFT JOIN q ON q.doc_id = cm.doc_id),
              |g AS (SELECT source,
              |    CAST(count(*) FILTER (WHERE is_dup = 0) AS BIGINT)
              |      AS kept,
              |    CAST(count(*) FILTER (WHERE is_dup = 1) AS BIGINT)
              |      AS dropped,
              |    CAST(count(*) FILTER (WHERE is_dup = 0
              |      AND sm IS NOT NULL) AS BIGINT) AS ks,
              |    CAST(count(*) FILTER (WHERE is_dup = 1
              |      AND sm IS NOT NULL) AS BIGINT) AS ds,
              |    sum(CASE WHEN is_dup = 0 THEN sm END) AS sk,
              |    sum(CASE WHEN is_dup = 1 THEN sm END) AS sd
              |  FROM x GROUP BY 1)
              |SELECT source, kept, dropped,
              |  round(CAST(sk AS DOUBLE)/CAST(ks AS DOUBLE)/1000000.0,
              |    6) AS kept_mean_score,
              |  round(CAST(sd AS DOUBLE)/CAST(ds AS DOUBLE)/1000000.0,
              |    6) AS dropped_mean_score,
              |  round(CAST(sk AS DOUBLE)/CAST(ks AS DOUBLE)/1000000.0
              |    - CAST(sd AS DOUBLE)/CAST(ds AS DOUBLE)/1000000.0,
              |    6) AS quality_gap
              |FROM g ORDER BY source""".stripMargin)),

    // ── q298: SENTENCE duplication mass — per source: sentences,
    // sentences whose exact text recurs in ≥2 DOCUMENTS, and the dup
    // share: the sentence-grain rung of the duplication ladder
    // between q22 (whole doc), q76/q223 (fixed 16-token segments),
    // and q276 (content-defined spans) — boilerplate legal lines and
    // templated openers live exactly at this grain (q263 reads
    // sentence SHAPE; this reads sentence REUSE). Same '. '-splitter
    // as q263 so the two readouts reconcile; df counts distinct
    // documents via a (doc, hash) pre-collapse — no distinct
    // aggregate (the r10 rule).
    //
    // Scale shape: one corpus scan explodes to the sentence grain
    // with 16-byte digests (never sentence text); the (doc, hash)
    // dedup and the hash-grain df are successive collapses; join-back
    // on the digest, |sources| rollup.
    QueryDef(
      "q298_sentence_dup_mass",
      (s, d) => {
        val sents = filter(transform(split(col("text"), "\\. "),
          x => trim(x)), x => length(x) > 0)
        // df ≥ 2 is the ONLY fact the rollup reads, and "a hash seen
        // in ≥2 distinct documents" is exactly min(doc_id) ≠
        // max(doc_id) over the hash family — two constant-memory
        // windows sharing ONE digest-grain exchange (r14). The former
        // (doc, hash) pre-collapse + df aggregate + join-back cloned
        // the scan AND the sentence explode per consumer (documents
        // EXECUTED 2×, finalized-plan ranScans). No distinct
        // aggregate appears, keeping the r10 rule this query already
        // declared. Output unchanged (oracle hash-green).
        val wH = org.apache.spark.sql.expressions.Window
          .partitionBy(col("h"))
        t(s, d, "documents")
          .select(col("source"), col("doc_id"), explode(sents).as("sx"))
          .select(col("source"), col("doc_id"), md5(col("sx")).as("h"))
          .withColumn("dup",
            min(col("doc_id")).over(wH) =!= max(col("doc_id")).over(wH))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_sentences"),
            count(when(col("dup"), 1)).cast("long")
              .as("dup_sentences"),
            round(count(when(col("dup"), 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("dup_share"))
          .orderBy(col("source"))
      },
      Some("""WITH sent AS (SELECT source, doc_id, md5(s.sx) AS h
              |  FROM documents,
              |    unnest(list_filter(list_transform(
              |      string_split(text, '. '), x -> trim(x)),
              |      x -> len(x) > 0)) AS s(sx)),
              |dfq AS (SELECT h, CAST(count(*) AS BIGINT) AS df
              |  FROM (SELECT DISTINCT doc_id, h FROM sent) GROUP BY 1)
              |SELECT source,
              |  CAST(count(*) AS BIGINT) AS n_sentences,
              |  CAST(count(*) FILTER (WHERE df >= 2) AS BIGINT)
              |    AS dup_sentences,
              |  round(CAST(count(*) FILTER (WHERE df >= 2) AS DOUBLE)
              |    / CAST(count(*) AS DOUBLE), 6) AS dup_share
              |FROM sent JOIN dfq USING (h)
              |GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── q84: QUALITY-aware survivor selection — collapse each near-dup
    // cluster to its highest-quality member instead of q36's min-id
    // (the choice a real release pipeline makes: of N mirrored copies,
    // keep the cleanest, not the first-crawled). Composes two cached
    // bases — the cluster map and the q31 quality scores — so the
    // query itself is three narrow joins and one agg: survivor =
    // argmax (score, then min doc_id on ties), computed as a
    // partial-aggregable max over a (score, -doc_id) struct (one
    // shuffle on cluster, associative — a corpus-sized boilerplate
    // cluster partial-aggregates map-side instead of pinning a
    // reducer). Scores compare identically on both engines (same IEEE
    // ops from exact integer counts), so the argmax and the hash
    // match. Zero-token docs score NULL and can never be chosen over
    // a scored member.
    QueryDef(
      "q84_quality_survivor",
      (s, d) => qualitySurvivorMap(s, d).orderBy(col("doc_id")),
      Some(s"""WITH RECURSIVE $pairsSql,
              |$clusterLabSql,
              |${TextQueries.QualityCteSql},
              |cm AS (SELECT d.doc_id, COALESCE(l.cluster, d.doc_id) AS cluster
              |  FROM documents d LEFT JOIN lab l ON l.id = d.doc_id),
              |r AS (SELECT cm.doc_id, cm.cluster,
              |    row_number() OVER (PARTITION BY cluster
              |      ORDER BY q.score DESC, cm.doc_id ASC) AS rn
              |  FROM cm JOIN q ON q.doc_id = cm.doc_id)
              |SELECT doc_id, cluster,
              |  CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS INTEGER) AS keep
              |FROM r ORDER BY doc_id""".stripMargin)),

    // ── q85: cross-source duplicate leakage — near-dup pair counts by
    // (source, source) cell, the "how much does crawl A mirror crawl
    // B" report a mixture designer reads before weighting sources
    // (within-source cells measure internal redundancy; off-diagonal
    // cells measure overlap a per-source dedup would MISS). Pure
    // composition over the persisted exact-pair artifact: the pair
    // frame is output-sized (never the co-occurrence stream), the two
    // source lookups are narrow (doc_id, source) joins, and the final
    // agg is |sources|² rows with map-side partials. The (least,
    // greatest) key normalization makes the cell symmetric so A→B and
    // B→A land in one row on both engines.
    QueryDef(
      "q85_cross_source_leakage",
      (s, d) => {
        val p = exactPairs(s, d).select(col("doc_a"), col("doc_b"))
        // NULL sources report as the " null" sentinel cell (the
        // Release mix's convention — leading space cannot collide
        // with a real source name): Spark's least/greatest SKIP
        // nulls, so without the sentinel a (null, X) pair would fold
        // into the (X, X) diagonal and unattributed-doc leakage would
        // masquerade as internal redundancy
        val src = t(s, d, "documents").select(col("doc_id"),
          coalesce(col("source"), lit(" null")).as("source"))
        // Melt each pair into its two (side, key) rows so the
        // documents (doc_id, source) frame joins ONCE, then fold the
        // sides back at the pair grain (exactPairs emits distinct
        // doc_a < doc_b pairs, so the regroup is lossless). The
        // former two per-side joins planned the documents scan twice
        // and exchanged the corpus by doc_id twice (the r12 q305
        // duplicated-subtree class); the melt exchanges the
        // output-sized pair frame instead.
        p.select(col("doc_a"), col("doc_b"), explode(array(
            struct(lit("a").as("side"), col("doc_a").as("doc_id")),
            struct(lit("b").as("side"), col("doc_b").as("doc_id")))).as("e"))
          .select(col("doc_a"), col("doc_b"), col("e.side").as("side"),
            col("e.doc_id").as("doc_id"))
          .join(src, Seq("doc_id"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(max(when(col("side") === "a", col("source"))).as("source_a"),
            max(when(col("side") === "b", col("source"))).as("source_b"))
          .groupBy(
            least(col("source_a"), col("source_b")).as("source_x"),
            greatest(col("source_a"), col("source_b")).as("source_y"))
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy(col("source_x"), col("source_y"))
      },
      Some(s"""WITH $pairsSql,
              |$pairsThresholdSql
              |SELECT least(coalesce(sa.source, ' null'),
              |    coalesce(sb.source, ' null')) AS source_x,
              |  greatest(coalesce(sa.source, ' null'),
              |    coalesce(sb.source, ' null')) AS source_y,
              |  count(*) AS n_pairs
              |FROM pairs
              |JOIN documents sa ON sa.doc_id = doc_a
              |JOIN documents sb ON sb.doc_id = doc_b
              |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── q86: fuzzy ENTITY matching (record linkage) via
    // deletion-neighborhood blocking — FastSS/SymSpell (Bocek et al.
    // 2007): two strings at Levenshtein distance ≤ 1 always share a
    // member of their single-deletion neighborhoods (a substitution
    // pair shares the variant with the differing position deleted; an
    // insert/delete pair shares the shorter string itself), so the
    // candidate space is the |name|+1 variants per record instead of
    // the |records|² cross product — edit distance runs on candidates
    // only. The variants hash to 8-byte keys (a collision is a false
    // CANDIDATE the verify kills, never a false pair) and the
    // candidate join is the same hot-key-salted, relative-threshold
    // self-join engine as every other blocking index here, payload
    // form so the names ride the join and levenshtein verifies
    // in-join. Neighborhoods are per-record-bounded (|name|+1) and
    // bucket df is data-bounded (strings sharing a variant), so the
    // shuffle is O(n·L) — the 100 TB record-linkage shape. A pair can
    // share several variants (repeated characters), hence the
    // distinct. The HOF variant lambda is interpreted, but it runs
    // |name| times per RECORD (not per shingle) — entity tables are
    // orders smaller than corpora, so this never dominates.
    QueryDef(
      "q86_fuzzy_match",
      (s, d) => {
        val name = col("c_name")
        // single-deletion neighborhood ∪ the string itself;
        // array_union also drops within-row duplicate variants
        // ("aab" deletes to "ab" twice), so a record occurs at most
        // once under a key and can never pair with itself
        val variants = array_union(
          array(name),
          transform(sequence(lit(1), length(name)), i =>
            concat(name.substr(lit(1), i - lit(1)),
              name.substr(i + lit(1), length(name)))))
        // repartition BEFORE the neighborhood explode: an entity table
        // small enough to arrive as one parquet split would otherwise
        // run the whole mine — variant generation, the candidate join,
        // and every in-join levenshtein — on a single core (measured:
        // 10 s → 1 s at sf0.1 on local[32]; the narrow pre-explode
        // exchange is |records|-sized and buys full parallelism)
        val occ = t(s, d, "customer")
          .repartition(s.sparkContext.defaultParallelism)
          .select(col("c_custkey"), name,
            explode(variants).as("variant"))
          .select(xxhash64(col("variant")).as("k"),
            col("c_custkey"), col("c_name"))
        graft.operators.SkewJoin
          .saltedSelfJoin(occ, "k", "c_custkey",
            relativeHot = MinerRelativeHot)
          .filter(levenshtein(col("c_name_a"), col("c_name_b")) === 1)
          .select(col("c_custkey_a").as("id_a"),
            col("c_custkey_b").as("id_b"))
          .distinct()
          .orderBy(col("id_a"), col("id_b"))
      },
      // oracle: the O(n²) definitional join — DuckDB at sf0.01 only;
      // the length guard prunes |dist| ≥ 2 cheaply before levenshtein
      Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
             |FROM customer a JOIN customer b
             |  ON a.c_custkey < b.c_custkey
             |  AND abs(length(a.c_name) - length(b.c_name)) <= 1
             |  AND levenshtein(a.c_name, b.c_name) = 1
             |ORDER BY id_a, id_b""".stripMargin)),

    // ── q87: NORMALIZATION dedup — q22's exact-hash dedup after text
    // canonicalization (collapse whitespace runs → trim → Unicode NFC
    // → casefold), the first pass of a real ingest pipeline (CCNet-
    // style): "café" typed with a composed U+00E9 vs decomposed
    // "e"+U+0301, CRLF vs LF, double-spaced copies, and case variants
    // are the SAME document to a reader and must land in one dedup
    // group. The chain is pure map-side work feeding the one groupBy
    // shuffle — identical plan shape to q22, so canonicalization is
    // FREE at 100 TB relative to the dedup it feeds. NFC runs through
    // the native codegen [[graft.functions.NfcNormalize]] (whole-stage
    // codegen keeps the scan→project→partial-agg span fused); both
    // engines apply the same ASCII \s+ collapse and simple-lowercase,
    // so the group keys hash-match (NfcNormSpec pins the non-ASCII
    // semantics the all-ASCII fixture cannot reach).
    QueryDef(
      "q87_normalize_dedup",
      (s, d) => {
        GraftFunctions.register(s)
        val canon = lower(GraftFunctions.nfcNormalize(
          trim(regexp_replace(col("text"), "\\s+", " "))))
        t(s, d, "documents")
          .withColumn("h", md5(canon))
          .groupBy(col("h"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
          .select(col("doc_id"), col("dup_cnt"), col("h"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt,
             |  md5(lower(nfc_normalize(trim(
             |    regexp_replace(text, '\s+', ' ', 'g'))))) AS h
             |FROM documents
             |GROUP BY md5(lower(nfc_normalize(trim(
             |    regexp_replace(text, '\s+', ' ', 'g')))))
             |ORDER BY doc_id""".stripMargin)),

    // ── q95: SPLIT-leakage report — near-dup pairs that CROSS the
    // q94 train/val/test boundary. The eval-integrity check run after
    // cutting a holdout: a val/test document whose near-duplicate
    // sits in train is memorization leaking into the eval number, and
    // per-document dedup (q36) can still ship both members when
    // survivor selection lands them in different splits. Cells are
    // (split, split) pair counts — (train, val)/(train, test)
    // off-diagonals are the contamination; diagonals are same-split
    // redundancy (harmless to eval, still dedup debt). q85's shape
    // over the same persisted pair artifact, with the q94 split
    // arithmetic replacing the source column.
    //
    // Scale shape: pure composition — the pair artifact is
    // output-sized (never the candidate stream), the split is
    // per-doc masked-Knuth arithmetic computed IN the join
    // projection (no doc-table scan at all: doc_id rides the pair
    // row), and the rollup is a ≤9-cell aggregate.
    QueryDef(
      "q95_split_leakage",
      (s, d) => {
        def split(idCol: String) = {
          // the one engine-portable membership fragment (Q.knuthBucketSql)
          // interpolated per pair side — split arithmetic CANNOT drift
          // from q94's because it is the same string
          val b = expr(Q.knuthBucketSql(idCol, 100))
          when(b < 98, "train").when(b === 98, "val").otherwise("test")
        }
        exactPairs(s, d).select(col("doc_a"), col("doc_b"))
          .groupBy(
            least(split("doc_a"), split("doc_b")).as("split_x"),
            greatest(split("doc_a"), split("doc_b")).as("split_y"))
          .agg(count(lit(1)).as("n_pairs"))
          .withColumn("crosses_eval",
            (col("split_x") =!= col("split_y")).cast("int"))
          .orderBy(col("split_x"), col("split_y"))
      },
      Some(s"""WITH $pairsSql,
              |$pairsThresholdSql,
              |sp AS (SELECT doc_a, doc_b,
              |    CASE WHEN ${Q.knuthBucketSql("doc_a", 100)} < 98 THEN 'train'
              |      WHEN ${Q.knuthBucketSql("doc_a", 100)} = 98 THEN 'val'
              |      ELSE 'test' END AS sa,
              |    CASE WHEN ${Q.knuthBucketSql("doc_b", 100)} < 98 THEN 'train'
              |      WHEN ${Q.knuthBucketSql("doc_b", 100)} = 98 THEN 'val'
              |      ELSE 'test' END AS sb
              |  FROM pairs)
              |SELECT least(sa, sb) AS split_x, greatest(sa, sb) AS split_y,
              |  count(*) AS n_pairs,
              |  CAST(CASE WHEN least(sa, sb) <> greatest(sa, sb)
              |    THEN 1 ELSE 0 END AS INTEGER) AS crosses_eval
              |FROM sp GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ── q96: dup-FAMILY size histogram — how big are the near-dup
    // clusters (the release diagnostics read next to q36: a corpus
    // dominated by 2-doc families dedups cheaply; a 10 000-member
    // boilerplate family means one template is a measurable slice of
    // the corpus and survivor choice actually matters). Rows:
    // (family_size, n_families, n_docs), singletons included — their
    // row is the "already unique" mass every release report quotes.
    // Scale shape: the cached cluster map (built once, stamped) rolls
    // up twice — |corpus| → |clusters| → |distinct sizes| — both hash
    // aggs with map-side partials; nothing here touches text or pairs.
    QueryDef(
      "q96_dup_family_hist",
      (s, d) => clusterMap(s, d)
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("family_size"))
        .groupBy(col("family_size"))
        .agg(count(lit(1)).as("n_families"))
        .select(col("family_size"),
          col("n_families"),
          (col("family_size") * col("n_families")).as("n_docs"))
        .orderBy(col("family_size")),
      Some(s"""WITH RECURSIVE $pairsSql,
              |$clusterLabSql,
              |cm AS (SELECT d.doc_id,
              |    COALESCE(l.cluster, d.doc_id) AS cluster
              |  FROM documents d LEFT JOIN lab l ON l.id = d.doc_id),
              |fam AS (SELECT cluster, count(*) AS family_size
              |  FROM cm GROUP BY cluster)
              |SELECT family_size, count(*) AS n_families,
              |  family_size * count(*) AS n_docs
              |FROM fam GROUP BY family_size ORDER BY family_size"""
        .stripMargin)),

    // ── q97: dedup threshold-SENSITIVITY curve — pair mass per 0.05
    // Jaccard band over [0.5, 1], with the cumulative count a release
    // at threshold t would act on. The tuning read before moving the
    // dedup threshold: a fat 0.50–0.55 band says the corpus sits on
    // the knife edge and a small loosening explodes the cluster graph;
    // mass piled at 1.0 is exact mirrors that any threshold removes.
    // Bucket = floor(jaccard·20)/20 — both engines compute jaccard as
    // the SAME two-integer division and the same IEEE multiply, so the
    // floor flips identically on every pair (the q56 determinism
    // argument, applied to a derived double). Scale shape: one scan of
    // the output-sized persisted pair artifact → ≤ 11 bucket rows; the
    // cumulative window runs over those 11 rows, not data (bounded-
    // cardinality window, q50's rule doesn't apply).
    QueryDef(
      "q97_jaccard_threshold_curve",
      (s, d) => {
        val b = exactPairs(s, d)
          .groupBy((floor(col("jaccard") * 20) / 20).as("bucket"))
          .agg(count(lit(1)).as("n_pairs"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        b.select(col("bucket"), col("n_pairs"),
            sum(col("n_pairs")).over(w).as("pairs_at_or_above"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH $pairsSql,
              |j AS (SELECT CAST(inter_cnt AS DOUBLE) /
              |      CAST(ca.n + cb.n - inter_cnt AS DOUBLE) AS jaccard
              |  FROM inter
              |  JOIN card ca ON ca.doc_id = doc_a
              |  JOIN card cb ON cb.doc_id = doc_b
              |  WHERE CAST(inter_cnt AS DOUBLE) /
              |    CAST(ca.n + cb.n - inter_cnt AS DOUBLE) >= 0.5),
              |b AS (SELECT floor(jaccard * 20) / 20 AS bucket,
              |    count(*) AS n_pairs
              |  FROM j GROUP BY 1)
              |SELECT bucket, n_pairs,
              |  CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
              |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              |    AS BIGINT) AS pairs_at_or_above
              |FROM b ORDER BY bucket""".stripMargin)),

    // ── q120: duplication coverage curve — the top-20 near-dup
    // families by size with each family's share of the corpus and
    // the running cumulative share (q96 histograms the family SIZES;
    // q120 answers the release question those sizes imply: "if I
    // collapse just the k biggest templates, what fraction of the
    // corpus have I already addressed?" — a steep curve means a
    // handful of boilerplate families carry the dedup win). Scale
    // shape: the cached cluster map rolls up to |families| (hash
    // agg, map-side partials), top-20 plans as TakeOrdered (never a
    // global sort), the 1-row corpus total broadcasts (q91's scalar
    // shape), and the rank/cumulative window runs over exactly 20
    // rows — bounded by the LIMIT, not the corpus.
    QueryDef(
      "q120_dup_coverage",
      (s, d) => Q.coverageCurve(
          clusterMap(s, d)
            .groupBy(col("cluster"))
            .agg(count(lit(1)).cast("long").as("family_size")),
          "cluster", "family_size", 20)
        .select(col("rank"), col("cluster"), col("family_size"),
          col("share"), col("cum_share"))
        .orderBy(col("rank")),
      Some(s"""WITH RECURSIVE $pairsSql,
              |$clusterLabSql,
              |cm AS (SELECT d.doc_id,
              |    COALESCE(l.cluster, d.doc_id) AS cluster
              |  FROM documents d LEFT JOIN lab l ON l.id = d.doc_id),
              |pk AS (SELECT cluster,
              |    CAST(count(*) AS BIGINT) AS family_size
              |  FROM cm GROUP BY cluster),
              |${Q.coverageCurveSql("cluster", "family_size", 20)}
              |SELECT rank, cluster, family_size,
              |  round(CAST(family_size AS DOUBLE)/CAST(tot_u AS DOUBLE), 6)
              |    AS share,
              |  round(CAST(cum_mass AS DOUBLE)/CAST(tot_u AS DOUBLE), 6)
              |    AS cum_share
              |FROM r CROSS JOIN tot ORDER BY rank""".stripMargin)),

    // ── q134: shingle document-frequency PROFILE — the 3-gram index's
    // df distribution in power-of-two buckets (shingles at df=1 are
    // unique content; the high buckets are boilerplate templates),
    // with each bucket's share of total index postings: the
    // TUNING read behind the miner's hot-shingle thresholds
    // (`HotShingleDf` / `MinerRelativeHot`) — where the posting mass
    // actually sits decides where salting starts paying, and a corpus
    // whose top bucket grows across deliveries is accreting
    // boilerplate (q81 names the passages; q134 sizes the
    // phenomenon). Bucket = floor(log2(df)): boundaries sit exactly
    // on powers of two, where log2 is exact in IEEE double on both
    // engines, so bucketing cannot diverge (between boundaries
    // monotonicity suffices). Scale shape: the (doc, shingle) grain
    // aggregates to |distinct shingles| (hash agg, map-side
    // partials), then to ≤ 64 buckets; the share is a window over
    // that bounded frame (q09's rule) — no scalar broadcast needed.
    QueryDef(
      "q134_shingle_df_profile",
      (s, d) => {
        val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
        val ex = t(s, d, "documents")
          .withColumn("tk", toks)
          .filter(size(col("tk")) >= 3)
          .select(col("doc_id"),
            explode(array_distinct(
              transform(sequence(lit(0), size(col("tk")) - 3), i =>
                concat_ws(" ", element_at(col("tk"), i + 1),
                  element_at(col("tk"), i + 2),
                  element_at(col("tk"), i + 3))))).as("g"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(lit(1))
        ex.groupBy(col("g"))
          .agg(count(lit(1)).cast("long").as("df"))
          .withColumn("bucket", floor(log2(col("df"))).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).cast("long").as("n_shingles"),
            sum(col("df")).cast("long").as("n_postings"))
          .withColumn("df_lo", expr("CAST(pow(2, bucket) AS BIGINT)"))
          .withColumn("postings_share",
            round(col("n_postings").cast("double") /
              sum(col("n_postings")).over(w).cast("double"), 6))
          .select(col("bucket"), col("df_lo"), col("n_shingles"),
            col("n_postings"), col("postings_share"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH $shingleSql,
              |df AS (SELECT g, CAST(count(*) AS BIGINT) AS df
              |  FROM ex GROUP BY 1),
              |b AS (SELECT CAST(floor(log2(df)) AS BIGINT) AS bucket,
              |    CAST(count(*) AS BIGINT) AS n_shingles,
              |    CAST(sum(df) AS BIGINT) AS n_postings
              |  FROM df GROUP BY 1)
              |SELECT bucket, CAST(power(2, bucket) AS BIGINT) AS df_lo,
              |  n_shingles, n_postings,
              |  round(CAST(n_postings AS DOUBLE) /
              |    CAST(sum(n_postings) OVER () AS DOUBLE), 6)
              |    AS postings_share
              |FROM b ORDER BY bucket""".stripMargin)),

    // ── q157: cluster CONFLICT report — near-dup families whose
    // members disagree on source or language. A multi-source family
    // is a template circulating across providers (one copy should
    // ship, and q85's cross-source-leakage view counts the pairs —
    // this names the family and its span); a multi-LANG family is
    // usually a lang-ID error inside near-identical text (q30's
    // classifier flagging siblings differently), i.e. a labeling bug
    // surfaced by dedup structure. Consumes the cached cluster map —
    // cross-family composition like q149, no new mining.
    //
    // Scale shape: cluster map (built once, stamped) joins documents
    // on doc_id (key-grain), rolls up to |clusters|, filters to the
    // conflicted few. The member list is NOT collected — only
    // bounded distinct-count measures and the sorted source list
    // (bounded by |sources| = 20, a dimension).
    QueryDef(
      "q157_cluster_conflicts",
      (s, d) => {
        clusterMap(s, d)
          .join(t(s, d, "documents")
            .select(col("doc_id"), col("source"), col("lang")),
            Seq("doc_id"))
          .groupBy(col("cluster"))
          // the source SET is already collected for display, so both
          // distinct counts read their sets' size instead of
          // countDistinct — one ordinary hash-agg pass, no
          // multi-distinct Expand (3× rows, and gid branch order that
          // varies per session, wobbling the canonical plan hash on
          // identical code — r8 PlanHash finding); sources/langs are
          // low-cardinality dims, so the per-cluster sets stay tiny
          .agg(count(lit(1)).cast("long").as("n_docs"),
            array_sort(collect_set(col("source"))).as("src_set"),
            size(collect_set(col("lang"))).cast("long").as("n_langs"))
          .select(col("cluster"), col("n_docs"),
            size(col("src_set")).cast("long").as("n_sources"),
            col("n_langs"),
            array_join(col("src_set"), ",").as("sources"))
          .filter(col("n_docs") > 1 &&
            (col("n_sources") > 1 || col("n_langs") > 1))
          .orderBy(col("cluster"))
      },
      Some(s"""WITH RECURSIVE $pairsSql,
              |$clusterLabSql,
              |cm AS (SELECT d.doc_id,
              |    COALESCE(l.cluster, d.doc_id) AS cluster,
              |    d.source, d.lang
              |  FROM documents d LEFT JOIN lab l ON l.id = d.doc_id),
              |g AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_docs,
              |    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
              |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
              |    string_agg(DISTINCT source, ',' ORDER BY source)
              |      AS sources
              |  FROM cm GROUP BY 1)
              |SELECT cluster, n_docs, n_sources, n_langs, sources
              |FROM g
              |WHERE n_docs > 1 AND (n_sources > 1 OR n_langs > 1)
              |ORDER BY cluster""".stripMargin)),

    // ── q165: near-dup pair-graph DEGREE histogram — how many direct
    // near-dup partners each document has, bucketed. q96 sizes the
    // connected FAMILIES; degree sees the graph's local density
    // instead: a family of 10 can be a chain (degrees ≤ 2 —
    // drift-of-versions) or a clique (degree 9 — one template
    // stamped 10×), and the two dedup very differently (a chain's
    // endpoints may not even meet the pair threshold against each
    // other). Degree-0 docs (nothing near-duplicated) anchor the
    // histogram as the unique mass.
    //
    // Scale shape: rides the persisted verified-pair artifact (built
    // once, stamped); both pair directions union to the (doc, degree)
    // grain (map-side partials), the left join against the corpus
    // id-frame fills degree-0, and the histogram is a ≤|distinct
    // degrees| agg. Text is never touched.
    QueryDef(
      "q165_dup_degree_hist",
      (s, d) => {
        val pairs = exactPairs(s, d)
        val deg = pairs.select(col("doc_a").as("doc_id"))
          .unionAll(pairs.select(col("doc_b").as("doc_id")))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).cast("long").as("degree"))
        t(s, d, "documents").select(col("doc_id"))
          .join(deg, Seq("doc_id"), "left")
          .select(coalesce(col("degree"), lit(0L)).as("degree"))
          .groupBy(col("degree"))
          .agg(count(lit(1)).cast("long").as("n_docs"))
          .orderBy(col("degree"))
      },
      Some(s"""WITH $pairsSql,
              |$pairsThresholdSql,
              |deg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
              |  FROM (SELECT doc_a AS doc_id FROM pairs
              |    UNION ALL SELECT doc_b FROM pairs)
              |  GROUP BY 1),
              |j AS (SELECT coalesce(deg.degree, 0) AS degree
              |  FROM documents d LEFT JOIN deg ON d.doc_id = deg.doc_id)
              |SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
              |FROM j GROUP BY 1 ORDER BY degree""".stripMargin)),

    // ── q192: LSH miner RECALL audit — the mining-quality readout a
    // curator runs before trusting the approximate dedup path at
    // 100 TB, where the exact miner (q25) is the thing being replaced:
    // per 0.05 Jaccard band of the exact ≥0.5 pair set over the SEEDED
    // audit corpus ([[auditShingles]] — the real corpus plus prefix
    // variants planted at known 0.55–0.8 Jaccard), how many pairs did
    // the MinHash-LSH miner also surface? The LSH side is
    // exact-Jaccard-VERIFIED, so it is a subset of the exact side by
    // construction — precision is 1.0 and the only question is recall,
    // which banding theory says follows 1−(1−j²)^16 (16 bands × 2
    // rows): ≈0.99 at j=0.5, →1 above. A recall dip in a band is the
    // first symptom of a broken band layout or an over-aggressive
    // hot-key guard, caught here per band instead of buried in one
    // corpus-wide average — and the seeding is what makes the
    // mid-range bands non-vacuous: the natural corpus's near-dups are
    // whole-document copies, all ≥0.9 (q97 curves the exact pair mass
    // by threshold; this curves the MINER's coverage of it).
    //
    // Scale shape: both inputs are persisted output-sized pair
    // artifacts over the 1.1× audit corpus (mined once per corpus —
    // StampedCache/IndexStore), the join is pair-keyed on frames
    // bounded by the dup mass, and the band histogram is a ≤10-row
    // aggregate. No oracle: MinHash is not SQL-expressible —
    // rows-only driver check (≥5 populated bands at every SF by
    // construction) + the QueriesSpec gate (band-wise found ≤ exact,
    // exact equality to a recomputation from the declared audit pair
    // frames, floor on overall recall, mid-band population).
    QueryDef(
      "q192_lsh_recall_audit",
      (s, d) => {
        val exact = auditExactPairs(s, d)
        val found = auditLshPairs(s, d)
          .select(col("doc_a"), col("doc_b"), lit(1L).as("hit"))
        exact.join(found, Seq("doc_a", "doc_b"), "left")
          .select(
            // jaccard ∈ [0.5, 1]; j = 1.0 folds into the top band
            (least(floor(col("jaccard") * 20), lit(19.0)) / 20.0)
              .as("band_lo"),
            coalesce(col("hit"), lit(0L)).as("hit"))
          .groupBy(col("band_lo"))
          .agg(count(lit(1)).cast("long").as("n_exact"),
            sum(col("hit")).cast("long").as("n_found"))
          .withColumn("recall",
            round(col("n_found").cast("double") /
              col("n_exact").cast("double"), 4))
          .orderBy(col("band_lo"))
      },
      None)
  )
}
