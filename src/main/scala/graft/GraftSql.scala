package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pure-SQL entry point: one call makes a session SQL-ready against a
  * corpus directory — every fixture table registered as a temp view
  * and every graft native expression registered in the function
  * registry — so `spark.sql("SELECT simhash64(split(text, ' ')) FROM
  * documents")` works with no Column-API code at all.
  *
  * This is the runtime twin of [[graft.plans.GraftExtensions]] (which
  * injects the same functions at session BUILD time via
  * `spark.sql.extensions`): extensions cover deployments that own the
  * session builder; `GraftSql.open` covers notebook/REPL sessions that
  * already exist. Views are session-scoped temp views — no catalog
  * writes, safe on a shared metastore.
  *
  * The expressions with plan-time data (learned centroids, BPE merge
  * tables) cannot be name-registered — their SQL face is the view the
  * Column API materializes, not a function call.
  */
object GraftSql {

  /** Register all corpus tables under `sfDir` as temp views plus the
    * graft native functions. Idempotent and CHEAP (plan-only view
    * registration — no jobs run); re-opening against a new dir
    * re-points the views. Derived-artifact views are a separate,
    * explicitly-paid call: [[openDerived]].
    */
  def open(spark: SparkSession, sfDir: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    graft.sources.Tables.names.foreach { n =>
      graft.sources.Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }
  }

  /** [[open]] plus the DERIVED corpus bases as SQL views — the
    * artifacts a SQL-only analyst actually joins against (raw tables
    * alone make them re-derive quality scores or dup clusters by
    * hand):
    *
    *   - `quality_scores` — q31's per-doc score base
    *   - `dup_clusters`   — q36's cluster map (`doc_id, cluster, is_dup`)
    *   - `quality_survivors` — q84's quality-aware survivor map
    *     (`doc_id, cluster, keep`; keep = best-scored member)
    *   - `pair_candidates` — the mined near-dup pair artifact with both
    *     overlap measures (q25/q68's shared index)
    *   - `lm_cost`        — q77's bigram cost table
    *   - `trade_edges`    — the graph family's nation-to-nation
    *     shipment edge frame (`src, dst, w`; q204/q208/q213/q215's
    *     one corpus collapse)
    *   - `user_bitmaps`   — the bitmap family's (event_type, bucket)
    *     user-id bitmap frame (`et, bkt, bm`; q209 popcounts it,
    *     q210 ANDs it — `bitmap_count`/`bitmap_and_agg` compose in
    *     SQL directly)
    *   - `phash_sigs` / `video_sigs` / `audio_sigs` — the media
    *     signature bases (`doc_id, sig` / `doc_id, sigs`): the
    *     decode+DCT pass materializes once, then Hamming probes are
    *     plain `bit_count(sig ^ ?)` SQL
    *
    * Each is the SAME cached/persisted frame the Column API serves
    * (one definition, amortized build), so e.g.
    * `SELECT d.* FROM documents d JOIN dup_clusters c USING (doc_id)
    * WHERE c.is_dup = 0` is the SQL spelling of the release's
    * survivor filter. NOT folded into [[open]] because building these
    * bases RUNS JOBS (the pair mine's hot-key probe, the iterative
    * cluster assignment) — a convenience `sql()` statement that never
    * touches a derived view should not pay for them. First call per
    * (session, corpus) pays the build; the stamped caches serve every
    * later call.
    */
  def openDerived(spark: SparkSession, sfDir: String): Unit = {
    open(spark, sfDir)
    graft.queries.TextQueries.qualityScores(spark, sfDir)
      .createOrReplaceTempView("quality_scores")
    graft.queries.DedupQueries.clusterMap(spark, sfDir)
      .createOrReplaceTempView("dup_clusters")
    graft.queries.DedupQueries.qualitySurvivorMap(spark, sfDir)
      .createOrReplaceTempView("quality_survivors")
    graft.queries.DedupQueries.pairCandidates(spark, sfDir)
      .createOrReplaceTempView("pair_candidates")
    graft.queries.TextQueries.lmCostTable(spark, sfDir)
      .createOrReplaceTempView("lm_cost")
    graft.queries.Analytics3.tradeEdges(spark, sfDir)
      .createOrReplaceTempView("trade_edges")
    graft.queries.Analytics3.userBitmaps(spark, sfDir)
      .createOrReplaceTempView("user_bitmaps")
    graft.queries.MultimodalQueries.phashSigs(spark, sfDir)
      .createOrReplaceTempView("phash_sigs")
    graft.queries.MultimodalQueries.videoSigs(spark, sfDir)
      .createOrReplaceTempView("video_sigs")
    graft.queries.MultimodalQueries.audioSigs(spark, sfDir)
      .createOrReplaceTempView("audio_sigs")
  }

  /** Convenience: open + run one statement. */
  def sql(spark: SparkSession, sfDir: String, statement: String): DataFrame = {
    open(spark, sfDir)
    spark.sql(statement)
  }

  /** Register a completed release's ACCOUNTING as SQL views, so a
    * SQL-only analyst reads the release without touching Scala (r9
    * verdict ask):
    *
    *   - `release_report` — ONE row mirroring
    *     [[Release.ReleaseReport]]: `input_docs, dup_dropped,
    *     quality_dropped, mix_dropped, released_docs, n_shards` (the
    *     reconciliation `input = drops + released` already `require`d
    *     at construction, so the view can never show broken books)
    *   - `release_shards` — one row per committed shard manifest:
    *     `shard, rows, digest` (digest = the writer's order-free
    *     content hash; `SELECT sum(rows) FROM release_shards` equals
    *     `released_docs` by the manifest contract)
    *
    * Plain LocalRelation views over already-computed numbers — no
    * jobs run.
    */
  def openRelease(spark: SparkSession, report: Release.ReleaseReport): Unit = {
    import spark.implicits._
    Seq((report.inputDocs, report.dupDropped, report.qualityDropped,
      report.mixDropped, report.releasedDocs, report.shards.size.toLong))
      .toDF("input_docs", "dup_dropped", "quality_dropped",
        "mix_dropped", "released_docs", "n_shards")
      .createOrReplaceTempView("release_report")
    report.shards.map(m => (m.shard, m.rows, m.digest))
      .toDF("shard", "rows", "digest")
      .createOrReplaceTempView("release_shards")
  }

  /** Register a [[graft.operators.QualityRules.audit]] result as the
    * `quality_audit` SQL view (`rule, n_rows, n_bad, bad_frac` — one
    * row per rule): the audit a release review reads next to
    * `release_report`. View registration is plan-only; the one audit
    * scan runs when the view is queried.
    */
  def openAudit(
      spark: SparkSession,
      df: DataFrame,
      rules: Seq[graft.operators.QualityRules.Rule]): Unit =
    graft.operators.QualityRules.audit(df, rules)
      .createOrReplaceTempView("quality_audit")
}
