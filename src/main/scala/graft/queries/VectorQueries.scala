package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Similarity search over the `embeddings` fixture (north star): exact
  * cosine top-k as the correctness baseline (q23), threshold near-dup
  * pairs (q28), and the hyperplane-LSH-bucketed ANN scale path (q29).
  *
  * All cosine math runs through the native codegen'd
  * [[graft.functions.CosineSimilarity]] expression — no UDF boxing in
  * the pairwise loops.
  *
  * Scale notes: q23 broadcasts the single query vector (one pass over
  * the corpus, TakeOrderedAndProject top-k — no shuffle of the corpus);
  * q28's all-pairs form is the *oracle-checkable* baseline, and q29 is
  * the shape that survives 100×: candidates meet only inside an LSH
  * bucket, turning O(n²) into a bucket-local equi-join.
  */
object VectorQueries {
  import Q._

  /** Repartitioned embeddings + precomputed norms, persisted once per
    * (session, dir) and fanned into every vector query's branches —
    * measured: AQE does NOT collapse the identical repartition
    * exchanges across branches (0 ReusedExchange in q40's final
    * plan), so without this cache each branch re-scans the corpus. At
    * 100 TB this frame is the stored "vector index base" you build
    * once, like the shingle index in [[DedupQueries]]. Keys carry a
    * dir fingerprint ([[Q.dirStamp]]) so a corpus rewrite rebuilds
    * instead of serving stale blocks.
    */
  // NOT durable: this frame is the raw corpus plus a norm column —
  // storing it would double vector storage for compute that is one
  // cheap map pass; the durable artifacts are the DERIVED indexes
  // (assignment + centroids), as with the text bases.
  private val embCache = new StampedCache("emb_base", durable = false)

  /** IVF coarse quantizer: 16 unit centroids from deterministic
    * sampled spherical k-means ([[graft.functions.KMeansLite]]),
    * refitted when the corpus stamp changes. Stamp lives in the VALUE
    * (like [[StampedCache]]), not the key — a stamp-in-key layout
    * would strand one dead entry per corpus rewrite.
    */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), (Long, Array[Array[Double]])]()

  /** Corpus with its 2 nearest IVF lists precomputed (map-side
    * [[graft.functions.NearestCentroids]] — no join, no shuffle) and
    * persisted: q40 reads list 1, q54 co-assigns on both. At 100 TB
    * this is the stored IVF index you build once at ingest.
    *
    * NOT durable as-is: the frame carries `embedding` and `nrm`, i.e.
    * a full copy of the raw vector corpus — storing it would double
    * vector storage. The durable artifact is the narrow `ivf_cids`
    * (vec_id, cids) table written inside [[assigned]]; a cold session
    * re-joins it with the session vector base. The trade is one vec_id
    * shuffle join per cold session against 2× corpus storage forever —
    * at multi-TB vector scale the join wins.
    */
  private val assignedCache = new StampedCache("ivf_assigned", durable = false)

  /** Drop this session's cached vector bases (see
    * [[DedupQueries.clearCaches]] for when eviction matters).
    */
  def clearCaches(s: org.apache.spark.sql.SparkSession): Unit = {
    embCache.clear(s)
    assignedCache.clear(s)
    int8Cache.clear(s)
    centroidCache.forEach { (k, _) => if (k._1 eq s) centroidCache.remove(k) }
    sizeGuardCache.forEach { (k, _) => if (k._1 eq s) sizeGuardCache.remove(k) }
  }

  /** Stamped per-(session, dir) verdict of q28's bounded size probe:
    * the guard must run before every exact all-pairs scan, but the
    * probe JOB (limit+count) costs a scheduling round-trip each time —
    * cache the boolean, re-probe only when the corpus stamp moves.
    */
  private val sizeGuardCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String), (Long, Boolean)]()

  private def overPairLimit(
      s: org.apache.spark.sql.SparkSession, d: String): Boolean = {
    // Probe OUTSIDE any map lock: compute() would hold the bin lock for
    // the whole Spark limit+count job, blocking a concurrent
    // session/dir that hashes to the same bin for the job's duration.
    // A lost race just means a redundant probe — cheaper than a held
    // bin lock — and put() publishes the latest stamp's verdict.
    val stamp = Q.dirStamp(d)
    val cur = sizeGuardCache.get((s, d))
    if (cur != null && cur._1 == stamp) cur._2
    else {
      val verdict = emb(s, d).limit(100001).count() > 100000
      sizeGuardCache.put((s, d), (stamp, verdict))
      verdict
    }
  }

  private def emb(s: org.apache.spark.sql.SparkSession, d: String) =
    embCache.get(s, d) {
      GraftFunctions.register(s)
      t(s, d, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("embedding"),
          GraftFunctions.vecNorm(col("embedding")).as("nrm"))
    }

  private val NCents = 16

  private def centroids(
      s: org.apache.spark.sql.SparkSession, d: String): Array[Array[Double]] =
    centroidCache.compute((s, d), { case ((ss, dir), cur) =>
      val stamp = Q.dirStamp(dir)
      if (cur != null && cur._1 == stamp) cur
      else {
        // durable read-through like the frame caches: a cold session
        // loads the stored quantizer instead of re-running k-means
        // over the corpus; a fit on a store-enabled session persists
        // it for every later session
        val cents = graft.sources.IndexStore.readCentroids(ss, dir, stamp)
          .getOrElse {
            val fitted = graft.functions.KMeansLite.fit(
              emb(ss, dir), "embedding", "vec_id", k = NCents)
            graft.sources.IndexStore.writeCentroids(ss, dir, stamp, fitted)
            fitted
          }
        (stamp, cents)
      }
    })._2

  private def assigned(s: org.apache.spark.sql.SparkSession, d: String) = {
    val cents = centroids(s, d)
    assignedCache.get(s, d) {
      val direct = emb(s, d).withColumn("cids",
        graft.functions.NearestCentroids(col("embedding"), cents, 2))
      if (graft.sources.IndexStore.root(s).isEmpty) direct
      else {
        // durable tier: store only the narrow (vec_id, cids) mapping
        // and rehydrate by joining the session vector base back on —
        // see the cache's scaladoc for the storage-vs-join trade
        val cids = graft.sources.IndexStore
          .readThrough(s, d, "ivf_cids", Q.dirStamp(d)) {
            direct.select(col("vec_id"), col("cids"))
          }
        emb(s, d).join(cids, Seq("vec_id"))
      }
    }
  }

  /** DuckDB-side exact cosine between embeddings, computed in double
    * via positional unnest (works without any DuckDB extension).
    */
  private def cosSql(filterA: String, filterB: String): String =
    s"""WITH a AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |    CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings WHERE $filterA),
       |b AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |    CAST(unnest(embedding) AS DOUBLE) AS v
       |  FROM embeddings WHERE $filterB),
       |s AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    sum(a.v*b.v) AS dot, sum(a.v*a.v) AS na, sum(b.v*b.v) AS nb
       |  FROM a JOIN b ON a.i = b.i GROUP BY a.vec_id, b.vec_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ── q23: brute-force cosine top-k of vec_id=0's neighbors (ref:
    // membership probe generalized to nearest-neighbor probe,
    // `Batch Processor.py:367-374`).
    QueryDef(
      "q23_sim_topk",
      (s, d) => {
        GraftFunctions.register(s)
        val e = emb(s, d)
        val q0 = e.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
        e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q0))
          .select(col("vec_id"),
            round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6)
              .as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""${cosSql("vec_id = 0", "vec_id <> 0")}
              |SELECT vec_b AS vec_id,
              |  round(dot/(sqrt(na)*sqrt(nb)), 6) AS cos_sim
              |FROM s ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin)),

    // ── q28: embedding-cosine near-duplicate pairs (north star
    // "embedding near-dup"). Exact all-pairs baseline; the filter runs
    // on the 6-decimal-rounded value on both sides so the threshold
    // cannot straddle float noise.
    QueryDef(
      "q28_dedup_embedding",
      (s, d) => {
        GraftFunctions.register(s)
        // Precompute each vector's norm once; the O(n²) pair loop then
        // does only the dot product (1/3 the flops of full cosine).
        // Repartition the streamed side: a single-file input is one
        // split, and the nested-loop pair scan must spread across
        // cores/executors or it runs serially.
        val e = emb(s, d)
        // HARD size guard: this exact all-pairs form exists as the
        // oracle-checkable baseline; past ~10⁵ vectors its n²/2 pair
        // space is a scale-killer by construction. Refuse loudly and
        // point at the IVF twin rather than quietly melting a cluster.
        // Bounded probe, not a full count: refusing must not itself
        // materialize the complete vector base on a huge corpus. The
        // verdict is stamped-cached so repeat runs skip the probe job.
        require(!overPairLimit(s, d),
          "q28 is the exact all-pairs baseline (>100k vectors => >5e9 " +
            "pairs); use q54_dedup_embedding_ivf at this scale")
        val a = e
          .select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
          col("nrm").as("na"))
        val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
          col("nrm").as("nb"))
        a.join(b, col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"),
            round(GraftFunctions.dotProduct(col("ea"), col("eb")) /
              (col("na") * col("nb")), 6).as("cos_sim"))
          .filter(col("cos_sim") >= 0.4)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      Some(s"""${cosSql("TRUE", "TRUE")}
              |SELECT vec_a, vec_b, round(dot/(sqrt(na)*sqrt(nb)), 6) AS cos_sim
              |FROM s WHERE vec_a < vec_b
              |  AND round(dot/(sqrt(na)*sqrt(nb)), 6) >= 0.4
              |ORDER BY vec_a, vec_b""".stripMargin)),

    // ── q29: multi-table LSH ANN (scale path; approximate — no SQL
    // oracle, rows-only check + scalatest recall gate). Top-3 neighbors
    // for query vectors 0..9. One 8-bit table recalls only ~10% of
    // these weakly-clustered neighbors (measured), so candidates come
    // from the UNION of 4 independent tables (OR-amplification,
    // 1-(1-p)^4) plus Hamming-≤2 multiprobe per table (37 probes —
    // fan-out on the QUERY side only, so the corpus index stays 4
    // entries/vector; measured recall 0.2 → 0.6+ on the fixture) —
    // candidates stay bucket-local, the O(n²) space never forms.
    QueryDef(
      "q29_ann_lsh",
      (s, d) => {
        GraftFunctions.register(s)
        val e = emb(s, d)
        val tableBuckets = array((0 until GraftFunctions.LshTables).map(tb =>
          struct(lit(tb).as("tb"),
            GraftFunctions.lshBucketT(col("embedding"), tb).as("b"))): _*)
        val corpus = e
          .select(col("vec_id"), col("embedding"),
            explode(tableBuckets).as("tbb"))
          .select(col("vec_id"), col("embedding"),
            col("tbb.tb").as("tb"), col("tbb.b").as("bucket"))
        // Multiprobe: each query probes its bucket plus all 8
        // Hamming-1 and 28 Hamming-2 neighbors, in EVERY table.
        val masks = Seq(0) ++ (0 until 8).map(1 << _) ++
          (for { a <- 0 until 8; b <- a + 1 until 8 } yield (1 << a) | (1 << b))
        val probes = array(masks.map(lit): _*)
        val queries = e.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            explode(tableBuckets).as("tbb"))
          .select(col("q_id"), col("q_emb"), col("tbb.tb").as("tb"),
            explode(transform(probes, m => col("tbb.b").bitwiseXOR(m)))
              .as("bucket"))
        val cands = queries
          .join(corpus.select(col("vec_id"), col("embedding"),
            col("tb"), col("bucket")), Seq("tb", "bucket"))
          .filter(col("q_id") =!= col("vec_id"))
          .select(col("q_id"), col("vec_id"),
            round(GraftFunctions.cosineSim(col("q_emb"), col("embedding")), 6)
              .as("cos_sim"))
          .distinct() // a pair can meet in several tables/probes
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
        cands.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("q_id"), col("rn"), col("vec_id"), col("cos_sim"))
          .orderBy(col("q_id"), col("rn"))
      },
      None),

    // ── q40: IVF ANN (the second north-star scale path next to q29's
    // LSH). Coarse quantizer = 16 learned centroids (deterministic
    // sampled spherical k-means, [[graft.functions.KMeansLite]]);
    // every corpus vector carries its nearest-list id from the cached
    // map-side assignment (no join, no shuffle — the index is built
    // once), and a query probes only its nprobe=6 nearest inverted
    // lists via a broadcast equi-join on the list id. Candidate top-3
    // runs through [[graft.plans.GroupedTopK]], whose map-side heaps
    // bound the exchange at k·partitions rows per query — at 100 TB
    // the O(n²) pair space never forms and the shuffle carries
    // kilobytes. Approximate ⇒ rows-only driver check; recall vs the
    // exact brute force is gated ≥ 0.7 in scalatest.
    QueryDef(
      "q40_ann_ivf",
      (s, d) => {
        GraftFunctions.register(s)
        val cents = centroids(s, d)
        val corpus = assigned(s, d)
          .select(col("vec_id"), col("embedding"),
            element_at(col("cids"), 1).as("cent_id"))
        val probes = emb(s, d).filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            explode(graft.functions.NearestCentroids(col("embedding"), cents, 6))
              .as("cent_id"))
        val cands = corpus.join(broadcast(probes), Seq("cent_id"))
          .filter(col("q_id") =!= col("vec_id"))
          .select(col("q_id"), col("vec_id"),
            round(GraftFunctions.cosineSim(col("q_emb"), col("embedding")), 6)
              .as("cos_sim"))
        val top = graft.plans.GroupedTopK.topK(cands,
          Seq("q_id"), Seq(("cos_sim", true), ("vec_id", false)), 3)
        // rank materialization over ≤ 3·|queries| survivor rows only
        top.withColumn("rn", row_number().over(
            Window.partitionBy(col("q_id"))
              .orderBy(col("cos_sim").desc, col("vec_id"))))
          .select(col("q_id"), col("rn"), col("vec_id"), col("cos_sim"))
          .orderBy(col("q_id"), col("rn"))
      },
      None),

    // ── q54: coarse-quantized near-dup pairs — the scale twin of
    // q28's exact all-pairs scan, mirroring how q26 accelerates q25.
    // Hyperplane LSH cannot prune at a weak threshold like cos ≥ 0.4
    // (measured 12% recall), so the honest scale path is IVF-style
    // co-assignment: each vector joins its 2 nearest of 16 centroids,
    // candidates are pairs sharing an assigned centroid (near vectors
    // share near centroids), exact cosine verifies. Pair space shrinks
    // from n²/2 to Σ|list|²; output ⊆ q28, recall asserted in
    // scalatest. Rows-only driver check (approximate).
    //
    // The co-assignment join runs through the PAYLOAD form of the
    // shared hot-key-salted miner ([[graft.operators.SkewJoin
    // .saltedSelfJoin]]): a skewed corpus whose vectors pile into one
    // dominant IVF list would otherwise make that list's |list|² pair
    // enumeration quadratic on ONE reducer. A list counts as hot past
    // 4× the balanced share (2n/NCents occurrences per list when
    // even); hot lists spread across buckets² cells with a spec-proved
    // identical pair set (PairSkewSpec). The payload (vector + norm)
    // rides the join so the cosine verify runs in-join — hot replicas
    // shuffle LINEAR payload bytes, where mining narrow pairs first
    // would shuffle the quadratic candidate set into verify joins.
    QueryDef(
      "q54_dedup_embedding_ivf",
      (s, d) => {
        GraftFunctions.register(s)
        val asg = assigned(s, d)
        val occ = asg.select(explode(col("cids")).as("cent_id"),
          col("vec_id"), col("embedding"), col("nrm"))
        // a list is hot past MinerRelativeHot × the mean list size —
        // the threshold scales with the corpus inside the miner's own
        // probe job (the shared constant every index miner salts by),
        // so no separate count pass is needed
        graft.operators.SkewJoin
          .saltedSelfJoin(occ, "cent_id", "vec_id",
            relativeHot = DedupQueries.MinerRelativeHot)
          .select(col("vec_id_a").as("vec_a"), col("vec_id_b").as("vec_b"),
            round(GraftFunctions.dotProduct(col("embedding_a"), col("embedding_b")) /
              (col("nrm_a") * col("nrm_b")), 6).as("cos_sim"))
          .filter(col("cos_sim") >= 0.4)
          .distinct() // a pair may share both assigned lists
          .orderBy(col("vec_a"), col("vec_b"))
      },
      None),

    // ── q71: int8 scalar-quantized cosine top-k — the STORAGE scale
    // path, orthogonal to the pruning paths (q29 LSH, q40 IVF): each
    // vector is scaled by its own max-abs into [-127, 127] bytes, 4×
    // smaller than float32 at rest and on the wire. Cosine is
    // invariant to positive per-vector scaling, so the scale factor
    // needn't be stored at all — the byte vector preserves direction
    // up to rounding, and the query dequantizes in-register (codegen
    // cast) against the compressed corpus. The persisted/durable
    // artifact is the byte frame: at 100 TB of vectors this is 25 TB
    // scanned per query instead of 100. Approximate (rounding error
    // only — no candidate pruning), so rows-only driver check;
    // QueriesSpec gates per-vector quantization fidelity (cos ≥ 0.99
    // vs the original) and top-k recall vs exact q23.
    QueryDef(
      "q71_ann_int8",
      (s, d) => {
        GraftFunctions.register(s)
        val deq = int8Vecs(s, d)
          .withColumn("dq", transform(col("qv"), b => b.cast("float")))
        val q0 = deq.filter(col("vec_id") === 0)
          .select(col("dq").as("q_emb"))
        deq.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q0))
          .select(col("vec_id"),
            round(GraftFunctions.cosineSim(col("dq"), col("q_emb")), 6)
              .as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(5)
      },
      None),

    // ── q78: metadata-filtered similarity search — top-5 cosine
    // neighbors of vec 0 among documents passing the q31 quality gate
    // (score ≥ 0.7). The standard vector-DB "filtered ANN" op: a
    // retrieval pipeline never searches the raw corpus, it searches
    // the quality/language/license-gated subset. The gate composes as
    // a LEFT SEMI join on vec_id = doc_id against the narrow
    // (doc_id)-only filter frame — the embedding column never
    // duplicates, and at 100 TB the semi join is the standard
    // pre-filter shape (equivalently a bloom-filter pushdown); the
    // same gated frame feeds q40's IVF probe when candidate pruning
    // is needed on top of the metadata cut. Exact scoring here keeps
    // the oracle anchor; top-5 plans as TakeOrdered (no global sort).
    QueryDef(
      "q78_filtered_ann",
      (s, d) => {
        GraftFunctions.register(s)
        val e = emb(s, d)
        val good = TextQueries.qualityScores(s, d)
          .filter(col("score") >= 0.7)
          .select(col("doc_id"))
        val q0 = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_emb"))
        e.filter(col("vec_id") =!= 0)
          .join(good, col("vec_id") === col("doc_id"), "left_semi")
          .crossJoin(broadcast(q0))
          .select(col("vec_id"),
            round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6)
              .as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""WITH ${TextQueries.QualityCteSql},
              |ga AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
              |    CAST(unnest(embedding) AS DOUBLE) AS v
              |  FROM embeddings WHERE vec_id = 0),
              |gb AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
              |    CAST(unnest(embedding) AS DOUBLE) AS v
              |  FROM embeddings WHERE vec_id <> 0
              |    AND vec_id IN (SELECT doc_id FROM q WHERE score >= 0.7)),
              |ps AS (SELECT ga.vec_id AS vec_a, gb.vec_id AS vec_b,
              |    sum(ga.v*gb.v) AS dot, sum(ga.v*ga.v) AS na,
              |    sum(gb.v*gb.v) AS nb
              |  FROM ga JOIN gb ON ga.i = gb.i GROUP BY ga.vec_id, gb.vec_id)
              |SELECT vec_b AS vec_id,
              |  round(dot/(sqrt(na)*sqrt(nb)), 6) AS cos_sim
              |FROM ps ORDER BY cos_sim DESC, vec_id LIMIT 5""".stripMargin)),

    // ── q79: cluster-mix corpus cartography — per-embedding-cluster
    // document count, token mass, and mean quality. The "what is my
    // corpus made of" report a mixture designer reads before setting
    // sampling rates (the cluster-level twin of q69's source-level
    // mix), and the monitoring face of the IVF index: a cluster whose
    // token mass or quality drifts is where curation looks next.
    // Scale shape: reuses the cached map-side centroid assignment
    // (zero-shuffle `NearestCentroids`, same index as q40/q54), joins
    // the narrow (doc_id, n_tokens, score) quality base, and rolls up
    // to NCents rows — ONE shuffle of per-doc stats, everything else
    // amortized index work. Mean quality is fixed-point (per-doc
    // micro-units summed exactly, one final divide) so the report is
    // bit-identical on every run/partitioning. No oracle: the
    // k-means quantizer is not SQL-expressible (rows-only driver
    // check; spec gates partition totals + bounds).
    QueryDef(
      "q79_cluster_mix",
      (s, d) => {
        GraftFunctions.register(s)
        val asg = assigned(s, d)
          .select(col("vec_id"), element_at(col("cids"), 1).as("cent_id"))
        val q = graft.queries.TextQueries.qualityScores(s, d)
          .select(col("doc_id"), col("n_tokens"),
            round(col("score") * 1000000.0, 0).cast("long").as("score_micro"))
        asg.join(q, col("vec_id") === col("doc_id"))
          .groupBy(col("cent_id"))
          .agg(
            count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_tokens")).cast("long").as("token_mass"),
            sum(col("score_micro")).as("score_sum"))
          .select(col("cent_id"), col("n_docs"), col("token_mass"),
            round(col("score_sum").cast("double") /
              (col("n_docs").cast("double") * 1000000.0), 6).as("avg_score"))
          .orderBy(col("cent_id"))
      },
      None),

    // ── q80: SEMANTIC benchmark decontamination — the embedding-space
    // twin of q64's n-gram overlap: flag training vectors whose cosine
    // against ANY benchmark vector clears the threshold. Paraphrased
    // or reformatted eval contamination shares no 3-gram (invisible to
    // q64) but still sits close in embedding space — both gates run
    // before a release. Same bench/train split convention as q64
    // (ids < 20 are the benchmark suite).
    //
    // Scale shape: a benchmark suite is TINY next to a training corpus
    // — it broadcasts whole, scoring is one map-side pass over the
    // corpus (the BNLJ against a broadcast benchmark IS the design,
    // like q23's 1-row probe), no shuffle at any corpus size. A
    // benchmark too large to broadcast routes through the same IVF
    // co-assignment as q54 instead. The threshold compares the
    // 6-decimal-rounded value on both sides so it cannot straddle
    // float noise (q28's rule).
    QueryDef(
      "q80_semantic_decontaminate",
      (s, d) => {
        GraftFunctions.register(s)
        val e = emb(s, d)
        val bench = e.filter(col("vec_id") < 20)
          .select(col("vec_id").as("bench_id"), col("embedding").as("b_emb"))
        e.filter(col("vec_id") >= 20)
          .crossJoin(broadcast(bench))
          .select(col("vec_id"), col("bench_id"),
            round(GraftFunctions.cosineSim(col("embedding"), col("b_emb")), 6)
              .as("cos_sim"))
          .filter(col("cos_sim") >= 0.35)
          .orderBy(col("vec_id"), col("bench_id"))
      },
      Some(s"""${cosSql("vec_id < 20", "vec_id >= 20")}
              |SELECT vec_b AS vec_id, vec_a AS bench_id,
              |  round(dot/(sqrt(na)*sqrt(nb)), 6) AS cos_sim
              |FROM s
              |WHERE round(dot/(sqrt(na)*sqrt(nb)), 6) >= 0.35
              |ORDER BY vec_id, bench_id""".stripMargin)),

    // ── q88: kNN label-vote evaluation — the embedding-quality probe
    // a pipeline runs before TRUSTING an embedding column for
    // clustering/dedup/mixing decisions: hold out a deterministic
    // probe set (vec_id ≡ 0 mod 50, id < 5000 — an eval holdout is a
    // FIXED-SIZE set by design, so the id cap bounds it at 100 probes
    // on any corpus size; the modulus spreads the picks across the id
    // space), predict each probe's label by majority vote of its 5
    // exact nearest neighbors, report per-probe hit/miss. Low
    // accuracy = the embeddings don't encode the label structure the
    // pipeline is about to lean on. Scale shape: probes are a bounded
    // broadcast, scoring is map-side against it, and per-probe top-5
    // runs through [[graft.plans
    // .GroupedTopK]]'s bounded heaps — the exchange carries
    // 5·partitions rows per probe, never the |corpus|×|probes| score
    // stream. The vote argmax is the q84 struct-max trick: most
    // votes, ties to the smaller label, associative so it partial-
    // aggregates map-side. Cosines round to 6 decimals on both
    // engines before ranking (q23's discipline) so the neighbor sets
    // and therefore the votes hash-match.
    QueryDef(
      "q88_knn_label_eval",
      (s, d) => {
        GraftFunctions.register(s)
        // raw table, not the emb() base: the vote needs the label
        // column the cosine-only base prunes away
        val e = t(s, d, "embeddings")
        val probes = e
          .filter(pmod(col("vec_id"), lit(50)) === 0 && col("vec_id") < 5000)
          .select(col("vec_id").as("probe_id"),
            col("label").as("true_label"),
            col("embedding").as("q_emb"))
        val scored = e
          .filter(pmod(col("vec_id"), lit(50)) =!= 0 || col("vec_id") >= 5000)
          .crossJoin(broadcast(probes))
          .select(col("probe_id"), col("true_label"), col("label"),
            col("vec_id"),
            round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6)
              .as("cos_sim"))
        val top = graft.plans.GroupedTopK.topK(scored,
          Seq("probe_id"), Seq(("cos_sim", true), ("vec_id", false)), 5)
        top.groupBy(col("probe_id"), col("true_label"), col("label"))
          .agg(count(lit(1)).as("votes"))
          .groupBy(col("probe_id"), col("true_label"))
          .agg(max(struct(col("votes"), (-col("label")).as("nl"))).as("w"))
          .select(col("probe_id"), col("true_label"),
            (-col("w.nl")).as("pred_label"),
            when(col("true_label") === -col("w.nl"), 1).otherwise(0)
              .cast("int").as("correct"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH p AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings WHERE vec_id % 50 = 0 AND vec_id < 5000),
             |c AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
             |    CAST(unnest(embedding) AS DOUBLE) AS v
             |  FROM embeddings WHERE vec_id % 50 <> 0 OR vec_id >= 5000),
             |s AS (SELECT p.vec_id AS pid, c.vec_id AS cid,
             |    sum(p.v*c.v) AS dot, sum(p.v*p.v) AS na, sum(c.v*c.v) AS nb
             |  FROM p JOIN c ON p.i = c.i GROUP BY 1, 2),
             |scored AS (SELECT pid, cid,
             |    round(dot/(sqrt(na)*sqrt(nb)), 6) AS cos_sim FROM s),
             |top AS (SELECT pid, cid, row_number()
             |    OVER (PARTITION BY pid ORDER BY cos_sim DESC, cid) AS rn
             |  FROM scored),
             |votes AS (SELECT t.pid, e.label, count(*) AS votes
             |  FROM top t JOIN embeddings e ON e.vec_id = t.cid
             |  WHERE t.rn <= 5 GROUP BY 1, 2),
             |pred AS (SELECT pid, label, row_number()
             |    OVER (PARTITION BY pid ORDER BY votes DESC, label) AS rn
             |  FROM votes)
             |SELECT pred.pid AS probe_id, pe.label AS true_label,
             |  pred.label AS pred_label,
             |  CAST(CASE WHEN pred.label = pe.label THEN 1 ELSE 0 END
             |    AS INTEGER) AS correct
             |FROM pred JOIN embeddings pe ON pe.vec_id = pred.pid
             |WHERE pred.rn = 1 ORDER BY probe_id""".stripMargin)),

    // ── q98: embedding-column HEALTH profile — the trust check run
    // BEFORE any ANN/clustering/dedup consumes an embedding column
    // (q88 checks semantic quality; this checks mechanical quality):
    // per label, vector count, dimension min/max (a mixed-dimension
    // column breaks every dot product downstream), zero-norm count
    // (no direction — every cosine consumer here drops them), and the
    // squared-norm min/max/mean (an unnormalized or wildly-scaled
    // batch shows up as norm spread).
    //
    // Float discipline: per-element squared terms are FIXED-POINT —
    // round(x²·10¹²) as exact longs — so the per-vector sum is
    // order-free and both engines fold identical integers (the q77
    // cost-table trick applied per element); means divide the exact
    // integer sum once, rounded to 6. Scale shape: one scan, all
    // per-vector work map-side inside codegen HOFs, one shuffle to
    // the |labels| grain with map-side partials.
    QueryDef(
      "q98_embedding_health",
      (s, d) => {
        val sq = aggregate(
          transform(col("embedding"),
            x => round(x.cast("double") * x.cast("double") * 1e12)
              .cast("long")),
          lit(0L), (acc, v) => acc + v)
        t(s, d, "embeddings")
          .select(col("label"), size(col("embedding")).as("dims"),
            sq.as("norm2_fx"))
          .groupBy(col("label"))
          .agg(count(lit(1)).cast("long").as("n_vecs"),
            min(col("dims")).cast("long").as("min_dims"),
            max(col("dims")).cast("long").as("max_dims"),
            sum(when(col("norm2_fx") === 0, 1L).otherwise(0L)).cast("long")
              .as("n_zero"),
            round(min(col("norm2_fx")) / 1e12, 6).as("min_norm2"),
            round(max(col("norm2_fx")) / 1e12, 6).as("max_norm2"),
            // DECIMAL(38,0) accumulation (the q58 moment discipline —
            // a 10¹³-vector corpus's Σnorm2_fx crosses 2⁶³); the mean
            // then divides once in double, the same op chain as the
            // oracle's HUGEINT sum
            round((sum(col("norm2_fx").cast("decimal(38,0)")).cast("double")
              / count(lit(1)).cast("double")) / 1e12, 6)
              .as("mean_norm2"))
          .orderBy(col("label"))
      },
      Some("""WITH v AS (SELECT label,
             |    CAST(len(embedding) AS BIGINT) AS dims,
             |    CAST(list_sum(list_transform(embedding, x ->
             |      CAST(round(CAST(x AS DOUBLE)*CAST(x AS DOUBLE)*1e12)
             |        AS BIGINT))) AS BIGINT) AS norm2_fx
             |  FROM embeddings)
             |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
             |  CAST(min(dims) AS BIGINT) AS min_dims,
             |  CAST(max(dims) AS BIGINT) AS max_dims,
             |  CAST(sum(CASE WHEN norm2_fx = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_zero,
             |  round(CAST(min(norm2_fx) AS DOUBLE) / 1e12, 6) AS min_norm2,
             |  round(CAST(max(norm2_fx) AS DOUBLE) / 1e12, 6) AS max_norm2,
             |  round((CAST(sum(norm2_fx) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             |    / 1e12, 6) AS mean_norm2
             |FROM v GROUP BY label ORDER BY label""".stripMargin)),

    // ── q131: embedding centroid DRIFT per label — L2 distance
    // between the even-vec_id and odd-vec_id halves' centroids (the
    // two-batch proxy: a re-embedded or model-bumped delivery shifts
    // a label's centroid long before any downstream eval notices;
    // this is the embedding-space face of q92's value drift, and the
    // batch twin of `IncrementalVectors`' TV-drift refit trigger).
    // The float trap is double: a Σ of 64 per-dim doubles is
    // aggregation-order-dependent, AND a centroid difference of two
    // divisions isn't exact — so the per-dim delta cross-multiplies
    // to the exact integer sE·nO − sO·nE (micro-unit sums × counts,
    // q108's exact-rational discipline), then QUANTIZES back to
    // per-dim micro-units (round(dc/(nE·nO)) — both engines divide
    // the same exact integers as the same doubles, so the rounded
    // long is identical) BEFORE squaring. The quantized delta is
    // bounded by the VALUE DOMAIN (≤ 2·10⁶·max|x| micro-units —
    // q116's rule), not the corpus, so its square can never overflow
    // the DECIMAL(38,0) accumulator — squaring dc directly would
    // cross 38 digits once a label's halves reach ~10⁶ vectors, and
    // Spark non-ANSI NULLs the product while DuckDB's HUGEINT
    // errors: a silent underreport on one engine and a failure on
    // the other. Cost of the quantize: ≤ 0.5 micro-unit per dim
    // (the q77/q107 rounding argument; spec tolerance covers it).
    // Scale shape: the (vec, dim) posexplode grain — 64·|vecs|
    // narrow rows — aggregates with map-side partials to
    // |labels|×2×64 cells, everything after is dimension-bounded.
    QueryDef(
      "q131_embedding_drift",
      (s, d) => {
        val dec19 = "decimal(19,0)"
        val dec38 = "decimal(38,0)"
        val cells = t(s, d, "embeddings")
          .select(col("label"), (col("vec_id") % 2).as("parity"),
            posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy(col("label"), col("parity"), col("dim"))
          .agg(sum(round(col("x").cast("double") * 1e6).cast("long"))
            .cast("long").as("sx"),
            count(lit(1)).cast("long").as("n"))
        val e = cells.filter(col("parity") === 0)
          .select(col("label"), col("dim"), col("sx").as("sx_e"),
            col("n").as("n_e"))
        val o = cells.filter(col("parity") === 1)
          .select(col("label"), col("dim"), col("sx").as("sx_o"),
            col("n").as("n_o"))
        e.join(o, Seq("label", "dim"))
          .withColumn("dc",
            (col("sx_e").cast(dec19) * col("n_o").cast(dec19) -
              col("sx_o").cast(dec19) * col("n_e").cast(dec19))
              .cast(dec38))
          .withColumn("d_fx",
            round(col("dc").cast("double") /
              (col("n_e").cast("double") * col("n_o").cast("double")))
              .cast("long"))
          .groupBy(col("label"))
          .agg(max(col("n_e")).as("n_even"), max(col("n_o")).as("n_odd"),
            sum((col("d_fx").cast(dec19) * col("d_fx").cast(dec19))
              .cast(dec38)).as("ss"))
          .select(col("label"), col("n_even"), col("n_odd"),
            round(sqrt(col("ss").cast("double")) / 1e6, 6).as("drift_l2"))
          .orderBy(col("label"))
      },
      Some("""WITH g AS (SELECT label, vec_id % 2 AS parity, dim,
             |    CAST(round(CAST(embedding[dim] AS DOUBLE)*1e6) AS BIGINT)
             |      AS ux
             |  FROM embeddings,
             |    unnest(range(1, len(embedding)+1)) AS u(dim)),
             |cells AS (SELECT label, parity, dim,
             |    CAST(sum(ux) AS BIGINT) AS sx,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM g GROUP BY 1, 2, 3),
             |j AS (SELECT e.label, e.dim,
             |    CAST(round(CAST(CAST(e.sx AS HUGEINT)*o.n
             |        - CAST(o.sx AS HUGEINT)*e.n AS DOUBLE) /
             |      (CAST(e.n AS DOUBLE)*CAST(o.n AS DOUBLE))) AS BIGINT)
             |      AS d_fx,
             |    e.n AS n_e, o.n AS n_o
             |  FROM cells e JOIN cells o
             |    ON e.label = o.label AND e.dim = o.dim
             |    AND e.parity = 0 AND o.parity = 1)
             |SELECT label, max(n_e) AS n_even, max(n_o) AS n_odd,
             |  round(sqrt(CAST(sum(CAST(d_fx AS HUGEINT)*d_fx) AS DOUBLE))
             |    / 1e6, 6) AS drift_l2
             |FROM j GROUP BY label ORDER BY label""".stripMargin)),

    // ── q138: MUTUAL nearest-neighbor pairs — vectors that are each
    // other's top-1 cosine neighbor (the dedup-confidence upgrade
    // over one-sided similarity: a near-dup claim where BOTH sides
    // agree is the high-precision subset every alignment/dedup
    // pipeline keeps first; one-sided kNN lists are q23/q29/q40's
    // job). Determinism: the argmax runs on the 6-rounded cosine
    // with a smallest-id tiebreak — a lexicographic max over the
    // (cos, −id) struct, identical in both engines (q109's
    // struct-max trick). Exact all-pairs form, q28's rule: the
    // oracle-checkable baseline, HARD-guarded past 100k vectors
    // (use the IVF family at scale); each side's rows spread via
    // the repartitioned vector base so the pair scan parallelizes.
    QueryDef(
      "q138_mutual_nn",
      (s, d) => {
        GraftFunctions.register(s)
        val e = emb(s, d)
        require(!overPairLimit(s, d),
          "q138 is the exact mutual-NN baseline (>100k vectors => " +
            ">5e9 pairs); compose the IVF family (q40/q54) at this scale")
        val a = e.select(col("vec_id").as("vec_a"),
          col("embedding").as("ea"), col("nrm").as("na"))
        val b = e.select(col("vec_id").as("vec_b"),
          col("embedding").as("eb"), col("nrm").as("nb"))
        val nn = a.join(b, col("vec_a") =!= col("vec_b"))
          .select(col("vec_a"),
            round(GraftFunctions.dotProduct(col("ea"), col("eb")) /
              (col("na") * col("nb")), 6).as("c"),
            col("vec_b"))
          .groupBy(col("vec_a"))
          .agg(max(struct(col("c").as("c"), (-col("vec_b")).as("nid")))
            .as("m"))
          .select(col("vec_a"), col("m.c").as("cos_sim"),
            (-col("m.nid")).as("nn_b"))
        nn.toDF("x_id", "x_cos", "x_nn")
          .join(nn.toDF("y_id", "y_cos", "y_nn"),
            col("x_nn") === col("y_id") && col("y_nn") === col("x_id") &&
              col("x_id") < col("y_id"))
          .select(col("x_id").as("vec_a"), col("y_id").as("vec_b"),
            col("x_cos").as("cos_sim"))
          .orderBy(col("vec_a"))
      },
      Some(s"""${cosSql("TRUE", "TRUE")},
              |p AS (SELECT vec_a, vec_b,
              |    round(dot/(sqrt(na)*sqrt(nb)), 6) AS c
              |  FROM s WHERE vec_a <> vec_b),
              |nn AS (SELECT vec_a,
              |    max({'c': c, 'nid': -vec_b}) AS m
              |  FROM p GROUP BY 1),
              |n2 AS (SELECT vec_a, m.c AS cos_sim, -m.nid AS nn_b
              |  FROM nn)
              |SELECT x.vec_a AS vec_a, x.nn_b AS vec_b,
              |  x.cos_sim AS cos_sim
              |FROM n2 x JOIN n2 y ON x.nn_b = y.vec_a
              |  AND y.nn_b = x.vec_a AND x.vec_a < y.vec_a
              |ORDER BY vec_a""".stripMargin)),

    // ── q201: HYBRID retrieval — reciprocal-rank fusion (RRF, k=60)
    // of the lexical BM25 ranking (ONE shared scoring definition with
    // q99 — [[TextQueries.bm25ScoredHits]]) and the semantic cosine
    // ranking against the query document's embedding (q23's measure;
    // doc_id ≡ vec_id in the corpus, the q80 linkage): the
    // two-retriever fusion every RAG-ish eval pipeline runs, where
    // lexical misses (paraphrase) and semantic misses (rare exact
    // terms) cover each other. Docs outside the BM25 hit set keep a
    // NULL lexical rank and contribute only their semantic term
    // (honest absence, not a pseudo-rank).
    //
    // Scale shape: both rankings are CORPUS-grain, so neither may ride
    // an unpartitioned ranking window — each uses the two-pass
    // [[Q.globalRankByRange]] (range exchange + zipWithIndex; the
    // q50/q193 family). The fusion join is rank-frame against
    // hit-sized rank-frame (AQE broadcasts the hits side), and the
    // top-15 cut is TakeOrdered on the rounded fusion score with
    // doc_id tiebreak — a total order. Exactness: both ranks are
    // exact integers over round-6 sort keys; the RRF sum is one
    // mirrored double chain, round 6.
    QueryDef(
      "q201_hybrid_search",
      (s, d) => {
        GraftFunctions.register(s)
        val e = emb(s, d)
        val q0 = e.filter(col("vec_id") === 0)
          .select(col("embedding").as("q_emb"))
        val semScored = e.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q0))
          .select(col("vec_id"),
            round(GraftFunctions.cosineSim(col("embedding"), col("q_emb")), 6)
              .as("cos_sim"))
        val semRank = Q.globalRankByRange(semScored,
          Seq(col("cos_sim").desc, col("vec_id")))
          .select(col("vec_id"), col("rn").as("rank_sem"))
        val lexRank = Q.globalRankByRange(
          TextQueries.bm25ScoredHits(s, d)
            .filter(col("doc_id") =!= 0)
            .select(col("doc_id"), col("score")),
          Seq(col("score").desc, col("doc_id")))
          .select(col("doc_id").as("lex_id"), col("rn").as("rank_lex"))
        semRank
          .join(lexRank, col("vec_id") === col("lex_id"), "left")
          .select(col("vec_id").as("doc_id"), col("rank_sem"),
            col("rank_lex"),
            round(lit(1.0) / (lit(60.0) + col("rank_sem").cast("double")) +
              coalesce(
                lit(1.0) / (lit(60.0) + col("rank_lex").cast("double")),
                lit(0.0)), 6).as("rrf"))
          .orderBy(col("rrf").desc, col("doc_id"))
          .limit(15)
      },
      Some(s"""${cosSql("vec_id = 0", "vec_id <> 0")},
              |${TextQueries.bm25ScoredSqlCteBody},
              |sem AS (SELECT vec_b AS doc_id,
              |    row_number() OVER (ORDER BY
              |      round(dot/(sqrt(na)*sqrt(nb)), 6) DESC, vec_b)
              |      AS rank_sem
              |  FROM s),
              |lex AS (SELECT doc_id,
              |    row_number() OVER (ORDER BY score DESC, doc_id)
              |      AS rank_lex
              |  FROM sc WHERE doc_id <> 0)
              |SELECT sem.doc_id AS doc_id,
              |  CAST(rank_sem AS BIGINT) AS rank_sem,
              |  CAST(rank_lex AS BIGINT) AS rank_lex,
              |  round(1.0/(60.0 + CAST(rank_sem AS DOUBLE)) +
              |    COALESCE(1.0/(60.0 + CAST(rank_lex AS DOUBLE)), 0.0), 6)
              |    AS rrf
              |FROM sem LEFT JOIN lex ON sem.doc_id = lex.doc_id
              |ORDER BY rrf DESC, doc_id
              |LIMIT 15""".stripMargin))
  )

  /** Int8 scalar-quantized vector base (see q71): `round(x·127 /
    * max|x|)` per vector, stored as `array<tinyint>`. Durable — unlike
    * the raw-corpus-plus-norm [[embCache]], this IS a derived
    * compressed artifact worth 4× storage savings. Zero vectors have
    * no direction (cosine undefined) and are dropped, matching their
    * absence from any cosine ranking.
    */
  private[queries] val int8Cache = new StampedCache("int8_vecs")

  private[queries] def int8Vecs(
      s: org.apache.spark.sql.SparkSession, d: String) =
    int8Cache.get(s, d) {
      t(s, d, "embeddings")
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("ma", array_max(transform(col("embedding"), x => abs(x))))
        .filter(col("ma") > 0)
        .select(col("vec_id"),
          transform(col("embedding"),
            x => round(x / col("ma") * 127).cast("tinyint")).as("qv"))
    }
}
