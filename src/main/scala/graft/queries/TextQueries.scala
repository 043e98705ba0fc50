package graft.queries

import org.apache.spark.sql.functions._

/** JSON, tokenization, and text-analysis queries (SURVEY.md §2.3 q15,
  * q19, q24 + north-star text-analysis extensions q30–q33): language-ID
  * heuristic, quality scoring, token counting, document fingerprinting.
  *
  * All token work uses codegen'd higher-order functions
  * (`split`/`filter`/`explode`) — no UDFs — so the per-doc loops stay
  * inside whole-stage codegen and scale linearly with corpus bytes.
  */
object TextQueries {
  import Q._

  /** The q99 probe terms — drawn from the corpus vocabulary so tf/df
    * are non-degenerate; ONE definition shared by the Spark builder,
    * the oracle SQL, and the spec's driver-side recompute. (Declared
    * before `defs`: the oracle strings interpolate it at object init.)
    */
  private[graft] val Bm25Terms = Seq("hash", "join", "window")

  /** The q114 probe phrases — adjacent pairs that actually occur in
    * the corpus (so hit sets are non-degenerate); ONE definition
    * shared by the Spark builder, the oracle SQL, and the spec's
    * driver-side recompute (the [[Bm25Terms]] rule).
    */
  private[graft] val PhraseProbes =
    Seq("customer join", "data stream", "table hash")

  /** Stopword list for the n-gram/stopword language heuristic (q30). */
  private[graft] val EnStops = Seq("the", "a", "of", "to", "in", "and")
  private[graft] val EnStopsSql = EnStops.map(w => s"'$w'").mkString(", ")

  /** q30's language-ID decision threshold and verdict — ONE definition
    * shared by the classifier (q30) and its confusion-matrix eval
    * (q122), Spark and SQL sides alike: tuning the threshold or the
    * [[EnStops]] list can never silently de-link the eval from the
    * classifier it claims to measure (the [[Bm25Terms]] rule).
    */
  private[graft] val EnRatioThreshold = 0.05

  private[graft] def predLangFromRatio(r: org.apache.spark.sql.Column) =
    when(r >= EnRatioThreshold, "en").otherwise("unknown")

  /** The q67 PII patterns (Java-regex ∩ RE2 syntax so every engine
    * agrees) and the stage-sequential redaction chain, shared with the
    * streaming ingest path ([[graft.streaming.DocumentPipeline]]) —
    * the scrub a release corpus runs is ONE definition, not a batch
    * copy and a streaming copy that drift.
    */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  private[graft] val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  private[graft] def scrubPii(text: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(text,
      EmailRe, "<EMAIL>"), Ipv4Re, "<IP>"), PhoneRe, "<PHONE>")

  /** Session flag: re-base token masses on the corpus-learned BPE
    * tokenizer ([[graft.functions.BpeVocab]]) instead of whitespace
    * splitting. DEFAULT OFF so the whitespace-token oracles stay
    * hash-exact; a training pipeline that wants subword-real token
    * masses flips it per session. Affects q32's approximate count,
    * q69's mixing masses, and q72's chunk grain.
    */
  private[graft] val BpeFlag = "spark.graft.tokens.bpe"

  private def bpeOn(s: org.apache.spark.sql.SparkSession): Boolean =
    s.conf.get(BpeFlag, "false").toBoolean

  /** Token mass of a text column under the session's tokenizer. */
  private def tokenMass(
      s: org.apache.spark.sql.SparkSession, d: String,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    if (bpeOn(s))
      graft.functions.BpeVocab.tokenCount(c, graft.functions.BpeVocab.merges(s, d))
    else size(filter(split(c, " "), tk => length(tk) > 0)).cast("long")

  /** Subword token count of `text` under the session tokenizer — the
    * oracle-checkable regex approximation by default, the
    * corpus-learned REAL BPE under [[BpeFlag]]. ONE definition shared
    * by q32 and q200 (fertility), so the budget-planner readout can
    * never de-link from the suite's own token masses.
    */
  private[graft] def subwordCount(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.Column =
    if (bpeOn(s))
      graft.functions.BpeVocab.tokenCount(
        col("text"), graft.functions.BpeVocab.merges(s, d))
    else size(regexp_extract_all(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0))).cast("long")

  /** Token array of a text column under the session's tokenizer. */
  private def tokenArray(
      s: org.apache.spark.sql.SparkSession, d: String,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    if (bpeOn(s))
      graft.functions.BpeVocab.tokens(c, graft.functions.BpeVocab.merges(s, d))
    else filter(split(c, " "), tk => length(tk) > 0)

  /** Shared per-document quality base (doc_id, n_ch, n_tokens,
    * avg_token_len, long_frac, score): the one corpus text pass behind
    * the quality family — q31 projects it, q65 filters it. Materialized
    * through the same stamped persist/durable tier as the shingle and
    * vector bases because the score is EXPENSIVE (split + two HOF
    * filters + a regexp per document) and, consumed inline, Catalyst's
    * predicate pushdown would substitute its definition into any
    * filter over `score` — evaluating the whole token stack twice per
    * row (the attributed round-4 q65 regression: 0.51 s → 0.90 s).
    */
  private val qualityCache = new StampedCache("quality_scores")

  /** DuckDB CTE computing the q31 quality score — exposes
    * `q(doc_id, score)`. ONE definition shared by every oracle that
    * gates on the score (q65, q78), so the SQL-side score can never
    * drift from itself; it mirrors [[qualityScores]]'s arithmetic
    * term-for-term (exact integer counts, then the same
    * IEEE-operation-order combination both engines evaluate
    * identically).
    */
  private[graft] val QualityCteSql: String =
    """s AS (SELECT doc_id,
      |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
      |  CAST(len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS BIGINT)
      |    AS n_tokens,
      |  CAST(len(list_filter(string_split(text,' '), x -> len(x) > 4)) AS BIGINT)
      |    AS n_long_tokens
      |  FROM documents),
      |q AS (SELECT doc_id,
      |  CASE WHEN n_tokens > 0 THEN
      |    (CAST(n_letters AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.1 +
      |    (CAST(n_long_tokens AS DOUBLE)/CAST(n_tokens AS DOUBLE))*0.5
      |  END AS score
      |  FROM s)""".stripMargin

  private[graft] def qualityScores(
      s: org.apache.spark.sql.SparkSession, d: String) =
    qualityCache.get(s, d) { scoreOf(t(s, d, "documents")) }

  /** The q31 score over an arbitrary documents FRAME — one definition
    * serves the cached fixture base above AND standing corpora (the
    * release-from-pipeline path, which is keyed by path + content
    * rather than a fixture dir).
    */
  private[graft] def scoreOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
    docs
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_ch"),
        size(toks).cast("long").as("n_tokens"),
        length(regexp_replace(col("text"), " ", "")).cast("long")
          .as("n_letters"),
        size(filter(toks, tk => length(tk) > 4)).cast("long")
          .as("n_long_tokens"))
      // Zero-token guard: a whitespace-only doc divides 0/0, which is
      // a hard DIVIDE_BY_ZERO error under ANSI mode (Spark 4 default)
      // — one empty doc would fail any job scoring the corpus — and
      // NaN otherwise, which Spark orders ABOVE every double so the
      // doc would pass any quality floor. NULL instead: comparisons
      // are false, the doc fails every gate, nothing throws.
      .withColumn("avg_token_len",
        when(col("n_tokens") > 0,
          col("n_letters").cast("double") / col("n_tokens").cast("double")))
      .withColumn("long_frac",
        when(col("n_tokens") > 0,
          col("n_long_tokens").cast("double") / col("n_tokens").cast("double")))
      .withColumn("score",
        col("avg_token_len") * 0.1 + col("long_frac") * 0.5)
      .select(col("doc_id"), col("n_ch"), col("n_tokens"),
        col("avg_token_len"), col("long_frac"), col("score"))
  }

  /** Drop this session's cached text bases (see
    * [[DedupQueries.clearCaches]] for when eviction matters).
    */
  def clearCaches(s: org.apache.spark.sql.SparkSession): Unit = {
    qualityCache.clear(s)
    lmCache.clear(s)
    termDfCache.clear(s)
    bm25Cache.clear(s)
    bm25StatsCache.clear(s)
    phraseHitsCache.clear(s)
    // the hot-term memo is keyed by session too — dropping it here
    // keeps a retired session collectable (r7 review: it was the one
    // per-session cache this hook missed)
    hotTermsCache.forEach { (k, _) =>
      if (k._1 eq s) hotTermsCache.remove(k)
    }
  }

  // q99's BM25 corpus stats (1 row) + probe-term tf hit rows, and
  // q114's phrase-hit posting list — the last derived bases that
  // rebuilt per session before round 7; now uniform with the shingle/
  // LM/vector families (build once, stamp-checked, durable-tier read
  // in a cold session). The PROBE SET is part of each artifact's
  // identity (the pq_codes_m8k16 rule): an edited Bm25Terms /
  // PhraseProbes must MISS the durable store and rebuild — the stored
  // tf0..tfN column names would still line up, so a cold session
  // would otherwise silently score the old terms.
  private def probeTag(probes: Seq[String]): String =
    f"${scala.util.hashing.MurmurHash3.orderedHash(probes)}%08x"
  private val bm25Cache =
    new StampedCache(s"bm25_tf_hits_${probeTag(Bm25Terms)}")
  private val bm25StatsCache =
    new StampedCache(s"bm25_stats_${probeTag(Bm25Terms)}")
  private val phraseHitsCache =
    new StampedCache(s"phrase_hits_${probeTag(PhraseProbes)}")

  private val termDfCache = new StampedCache("term_df")

  /** ONE definition of the Okapi BM25 scoring pass (k1 = 1.2,
    * b = 0.75, fixed [[Bm25Terms]] probe) shared by the ranked search
    * (q99) and the hybrid RRF fusion (q201) — the [[Bm25Terms]] rule:
    * a tuned constant or a changed probe set can never de-link a
    * consumer from the definition it claims to rank by. Returns the
    * scored HIT frame `(doc_id, dl, tf0..tfN, score)` pre-ordering:
    * tf/dl compute map-side in one corpus scan (codegen HOF over the
    * bound token array — no explode, no token shuffle), the 1-row
    * corpus stats broadcast back, the ≥1-hit filter prunes before
    * anything sorts, and both derived frames ride the stamped/durable
    * tier (a cold session reads two small artifacts instead of
    * re-scanning the corpus). Score rounds to 6 HERE so every consumer
    * ranks by the same value.
    */
  private[graft] def bm25ScoredHits(
      s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val terms = Bm25Terms
    val dbl = (c: org.apache.spark.sql.Column) => c.cast("double")
    def withTf = t(s, d, "documents")
      .withColumn("tk",
        filter(split(col("text"), " "), tk => length(tk) > 0))
      .select(Seq(
        col("doc_id"), size(col("tk")).cast("long").as("dl")) ++
        terms.zipWithIndex.map { case (tm, i) =>
          size(filter(col("tk"), x => x === tm)).cast("long").as(s"tf$i")
        }: _*)
    // the stats frame stays the corpus-WIDE aggregate (it must count
    // non-matching docs, so it cannot derive from the hits artifact)
    val stats = bm25StatsCache.get(s, d) {
      withTf.agg(
        count(lit(1)).cast("long").as("n_docs"),
        Seq(sum(col("dl")).cast("long").as("total_dl")) ++
          terms.indices.map(i =>
            sum(when(col(s"tf$i") > 0, 1L).otherwise(0L)).cast("long")
              .as(s"df$i")): _*)
    }
    val hits = bm25Cache.get(s, d) {
      withTf.filter(terms.indices.map(i => col(s"tf$i") > 0)
        .reduce(_ || _))
    }
    val avgdl = dbl(col("total_dl")) / dbl(col("n_docs"))
    def contrib(i: Int) = {
      val tf = dbl(col(s"tf$i"))
      val df = col(s"df$i")
      log((dbl(col("n_docs") - df) + 0.5) / (dbl(df) + 0.5) + 1.0) *
        (tf * 2.2) /
        (tf + lit(1.2) * (lit(0.25) + (lit(0.75) * dbl(col("dl"))) / avgdl))
    }
    hits.crossJoin(broadcast(stats))
      .select(Seq(col("doc_id"), col("dl")) ++
        terms.indices.map(i => col(s"tf$i")) :+
        round(terms.indices.map(contrib).reduce(_ + _), 6).as("score"): _*)
  }

  /** Oracle twin of [[bm25ScoredHits]]: CTE chain ending in
    * `sc(doc_id, dl, tf0..tfN, score)` — same literal operation order,
    * same round-6. [[bm25ScoredSqlCteBody]] is the same chain without
    * the `WITH` keyword, for oracles composing it after other CTEs.
    */
  private[graft] def bm25ScoredSqlCte: String =
    "WITH " + bm25ScoredSqlCteBody

  private[graft] def bm25ScoredSqlCteBody: String = {
    val terms = Bm25Terms
    val tfCols = terms.zipWithIndex.map { case (tm, i) =>
      s"CAST(len(list_filter(tk, x -> x = '$tm')) AS BIGINT) AS tf$i"
    }.mkString(",\n           |    ")
    val dfCols = terms.indices.map(i =>
      s"CAST(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n           |    ")
    val contribs = terms.indices.map(i =>
      s"""ln((CAST(n_docs - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5) + 1.0) * (CAST(tf$i AS DOUBLE) * 2.2) / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + (0.75 * CAST(dl AS DOUBLE)) / (CAST(total_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))""")
      .mkString(" + ")
    val tfSel = terms.indices.map(i => s"tf$i").mkString(", ")
    val anyHit = terms.indices.map(i => s"tf$i > 0").mkString(" OR ")
    s"""base AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
       |  FROM documents),
       |tf AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS dl,
       |    $tfCols
       |  FROM base),
       |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS total_dl,
       |    $dfCols
       |  FROM tf),
       |sc AS (SELECT doc_id, dl, $tfSel,
       |    round($contribs, 6) AS score
       |  FROM tf CROSS JOIN st
       |  WHERE $anyHit)""".stripMargin
  }

  /** q121's plan-time hot-term set, memoized per (session, dir,
    * ceiling, corpus stamp) — a bounded Seq (require-guarded ≤100k),
    * not a frame, so it lives outside StampedCache. Entries die with
    * the session map itself; the stamp key retires stale corpora.
    */
  private val hotTermsCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, Double, Long), Seq[String]]()

  /** Corpus term document-frequency table `(term, df)` — the derived
    * base behind q121's stopword prune (and the natural artifact any
    * df-weighted statistic reads). Built once per corpus as a
    * wordcount-shaped pass — per-doc distinct token set exploded into
    * ONE hash agg at term grain, map-side partials — then persisted
    * through the stamped/durable tier like the shingle and LM bases:
    * at 100 TB this is the build-at-ingest dictionary, never a
    * per-query recompute.
    */
  private[graft] def termDf(
      s: org.apache.spark.sql.SparkSession, d: String) =
    termDfCache.get(s, d) {
      t(s, d, "documents")
        .select(explode(array_distinct(
          filter(split(col("text"), " "), tk => length(tk) > 0)))
          .as("term"))
        .groupBy(col("term"))
        .agg(count(lit(1)).cast("long").as("df"))
    }

  private val lmCache = new StampedCache("lm_bigram_cost")

  /** Corpus bigram-LM cost table `(w1, bigram, cost_micro)` — the
    * trained model behind q77, cached/persisted like the other derived
    * corpus bases (shingles, quality scores, int8 vectors): the LM is
    * fit once per corpus and scored by many queries, and without the
    * cache the cost-table lineage would re-scan the corpus on every
    * branch that consumes it (measured: 3 scans / 7 exchanges
    * uncached vs 1 scan / 2 at query time). `cost_micro` =
    * round(1e6·ln(sc/bc)) — an exact integer per vocabulary entry, so
    * per-document sums are aggregation-order-independent.
    */
  private[graft] def lmCostTable(
      s: org.apache.spark.sql.SparkSession, d: String) =
    lmCache.get(s, d) {
      graft.operators.IncrementalLm.costTable(
        graft.operators.IncrementalLm.fit(t(s, d, "documents")))
    }

  /** Source-equalization rate table from a `(source, n_tok)`-grain
    * frame: `(source, n_docs, src_tokens, rate_k)` with `rate_k` in
    * integer thousandths of documents kept — ONE definition of the
    * mixing arithmetic shared by q69's report and the release path.
    * Zero-token sources rate 0 either way. `floorOne = true` (the
    * release) clamps a token-bearing source's rate to ≥ 1: a source
    * more than 1000× the smallest would otherwise floor to rate 0 and
    * VANISH from the shipped mixture — silent data loss in an export,
    * where in the q69 report the same 0 is a visible row.
    */
  /** Fold the smallest token-BEARING source mass out of a packed
    * per-source struct array — null when no source bears tokens,
    * matching the former `st.filter(>0).agg(min)` scalar exactly.
    * Shared by [[sourceRates]] and q69 so the mixing arithmetic stays
    * ONE definition even though q69 carries its sampling buckets
    * through the same packed row.
    */
  private[graft] def minTokFold(srcs: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    aggregate(srcs, lit(null).cast("long"),
      (a, x) => when(x("src_tokens") > 0 &&
        (a.isNull || x("src_tokens") < a), x("src_tokens")).otherwise(a))

  /** `rate_k` from (`src_tokens`, `min_tok`) columns in scope — the
    * single definition of the equalization arithmetic (exact integer
    * DIV; zero-token sources rate 0; `floorOne` per the scaladoc
    * above).
    */
  private[graft] def rateKCol(floorOne: Boolean)
      : org.apache.spark.sql.Column = {
    val raw = expr("min_tok * 1000 DIV src_tokens")
    when(col("src_tokens") === 0, lit(0L))
      .otherwise(if (floorOne) greatest(lit(1L), raw) else raw)
  }

  private[graft] def sourceRates(
      tok: org.apache.spark.sql.DataFrame,
      floorOne: Boolean): org.apache.spark.sql.DataFrame = {
    val st = tok.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("src_tokens"))
    // Pack the (bounded, |sources|-row) table into one row, fold the
    // global min INSIDE it, explode back: the min never becomes a
    // second plan branch, so the corpus subtree beneath `st` is
    // planned exactly once. The former filter+agg+crossJoin scalar
    // made Spark re-plan the whole scan→st chain for the min (column
    // pruning diverged the partial aggregates, defeating exchange
    // reuse — the r12 q305 duplicated-subtree class).
    st.agg(collect_list(struct(col("source"), col("n_docs"),
        col("src_tokens"))).as("srcs"))
      .select(minTokFold(col("srcs")).as("min_tok"),
        explode(col("srcs")).as("s"))
      .select(col("s.source").as("source"), col("s.n_docs").as("n_docs"),
        col("s.src_tokens").as("src_tokens"), col("min_tok"))
      .withColumn("rate_k", rateKCol(floorOne))
      .select(col("source"), col("n_docs"), col("src_tokens"), col("rate_k"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ── q15: JSON extraction (ref: JSON settings read/write
    // `Batch Processor.py:87-97`; fixture `events.props`). Both sides
    // parse the JSON properly (get_json_object / json_extract_string)
    // and admit only integer-SHAPED field values before the cast —
    // engine casts of a non-integer string diverge (Spark truncates or
    // nulls, DuckDB TRY_CAST rounds), so the shape guard IS the shared
    // contract, robust to a fixture re-serialization (r9 ADVICE
    // discipline, same fix as q259).
    QueryDef(
      "q15_json_extract",
      (s, d) => {
        // {1,18} bound: every 18-digit string is representable in
        // int64, so BOTH engines' plain casts are total over the
        // admitted shape — an unbounded [0-9]+ would let a >19-digit
        // value NULL in Spark's non-ANSI cast but RAISE in DuckDB's
        // CAST (r10 ADVICE finding).
        t(s, d, "events")
          .withColumn("ks", get_json_object(col("props"), "$.k"))
          .withColumn("k", when(col("ks").rlike("^-?[0-9]{1,18}$"),
            col("ks").cast("long")))
          .groupBy(col("event_type"))
          .agg(
            count(col("k")).as("n_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"),
            (sum(col("k")).cast("double") / count(col("k")).cast("double"))
              .as("avg_k"))
          .orderBy(col("event_type"))
      },
      Some("""WITH x AS (SELECT event_type,
             |    json_extract_string(props, '$.k') AS ks FROM events),
             |j AS (SELECT event_type,
             |  CAST(CASE WHEN ks IS NOT NULL
             |    AND regexp_full_match(ks, '-?[0-9]{1,18}') THEN ks END
             |    AS BIGINT) AS k
             |  FROM x)
             |SELECT event_type, count(k) AS n_k, min(k) AS min_k, max(k) AS max_k,
             |  CAST(CAST(sum(k) AS BIGINT) AS DOUBLE)/CAST(count(k) AS DOUBLE) AS avg_k
             |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── q19: generator / explode + top-k word counts (ref: directory
    // tree flatten `Batch Processor.py:53-60`).
    QueryDef(
      "q19_explode_tokens",
      (s, d) => {
        t(s, d, "documents")
          .select(explode(split(col("text"), " ")).as("token"))
          .filter(length(col("token")) > 0)
          .groupBy(col("token"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("token"))
          .limit(20)
      },
      Some("""SELECT tok AS token, count(*) AS cnt
             |FROM documents, unnest(string_split(text, ' ')) AS t(tok)
             |WHERE length(tok) > 0
             |GROUP BY tok ORDER BY cnt DESC, token LIMIT 20""".stripMargin)),

    // ── q24: per-language text stats (north star "text analysis";
    // ref severity classes D4).
    QueryDef(
      "q24_text_stats",
      (s, d) => {
        t(s, d, "documents")
          .withColumn("n_tokens",
            size(filter(split(col("text"), " "),
              tk => length(tk) > 0)).cast("long"))
          .withColumn("n_ch", length(col("text")).cast("long"))
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).cast("long").as("sum_tokens"),
            (sum(col("n_tokens")).cast("double") / count(lit(1)).cast("double"))
              .as("avg_tokens"),
            (sum(col("n_ch")).cast("double") / count(lit(1)).cast("double"))
              .as("avg_chars"))
          .orderBy(col("lang"))
      },
      Some("""WITH s AS (SELECT lang,
             |  CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT)
             |    AS n_tokens,
             |  CAST(length(text) AS BIGINT) AS n_ch
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
             |  CAST(CAST(sum(n_tokens) AS BIGINT) AS DOUBLE)/CAST(count(*) AS DOUBLE)
             |    AS avg_tokens,
             |  CAST(CAST(sum(n_ch) AS BIGINT) AS DOUBLE)/CAST(count(*) AS DOUBLE)
             |    AS avg_chars
             |FROM s GROUP BY lang ORDER BY lang""".stripMargin)),

    // ── q30: language-ID heuristic (north star) — stopword-ratio
    // scoring, the classic cheap lang-ID signal.
    QueryDef(
      "q30_lang_id",
      (s, d) => {
        val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
        t(s, d, "documents")
          .select(
            col("doc_id"),
            size(toks).cast("long").as("n_tokens"),
            size(filter(toks, tk => tk.isin(EnStops: _*))).cast("long")
              .as("stop_cnt"))
          .withColumn("en_ratio",
            col("stop_cnt").cast("double") / col("n_tokens").cast("double"))
          .withColumn("pred_lang", predLangFromRatio(col("en_ratio")))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH s AS (SELECT doc_id,
              |  CAST(len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS BIGINT)
              |    AS n_tokens,
              |  CAST(len(list_filter(string_split(text,' '),
              |    x -> x IN ($EnStopsSql))) AS BIGINT) AS stop_cnt
              |  FROM documents)
              |SELECT doc_id, n_tokens, stop_cnt,
              |  CAST(stop_cnt AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS en_ratio,
              |  CASE WHEN CAST(stop_cnt AS DOUBLE)/CAST(n_tokens AS DOUBLE)
              |    >= $EnRatioThreshold
              |    THEN 'en' ELSE 'unknown' END AS pred_lang
              |FROM s ORDER BY doc_id""".stripMargin)),

    // ── q31: quality scoring (north star) — length/word-shape ratios
    // combined into one deterministic score, projected off the shared
    // [[qualityScores]] base.
    QueryDef(
      "q31_quality_score",
      (s, d) => {
        qualityScores(s, d)
          .withColumn("quality",
            when(col("score") >= 0.6, "high").otherwise("low"))
          .select(col("doc_id"), col("n_ch"), col("n_tokens"),
            col("avg_token_len"), col("long_frac"), col("score"), col("quality"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH s AS (SELECT doc_id,
             |  CAST(length(text) AS BIGINT) AS n_ch,
             |  CAST(len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS BIGINT)
             |    AS n_tokens,
             |  CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_letters,
             |  CAST(len(list_filter(string_split(text,' '), x -> len(x) > 4)) AS BIGINT)
             |    AS n_long_tokens
             |  FROM documents),
             |r AS (SELECT doc_id, n_ch, n_tokens,
             |  CAST(n_letters AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS avg_token_len,
             |  CAST(n_long_tokens AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS long_frac
             |  FROM s)
             |SELECT doc_id, n_ch, n_tokens, avg_token_len, long_frac,
             |  avg_token_len*0.1 + long_frac*0.5 AS score,
             |  CASE WHEN avg_token_len*0.1 + long_frac*0.5 >= 0.6
             |    THEN 'high' ELSE 'low' END AS quality
             |FROM r ORDER BY doc_id""".stripMargin)),

    // ── q32: token counting (north star) — whitespace tokens + a
    // subword token count, aggregated per source. The subword count is
    // the oracle-checkable regex approximation by default and the
    // corpus-learned REAL BPE under [[BpeFlag]] (q74 exposes the BPE
    // numbers unconditionally).
    QueryDef(
      "q32_token_count",
      (s, d) => {
        val subword = subwordCount(s, d)
        t(s, d, "documents")
          .withColumn("ws_tokens",
            size(filter(split(col("text"), " "), tk => length(tk) > 0))
              .cast("long"))
          .withColumn("re_tokens", subword)
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("ws_tokens")).cast("long").as("sum_ws_tokens"),
            sum(col("re_tokens")).cast("long").as("sum_re_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH s AS (SELECT source,
             |  CAST(len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS BIGINT)
             |    AS ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
             |    AS BIGINT) AS re_tokens
             |  FROM documents)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(ws_tokens) AS BIGINT) AS sum_ws_tokens,
             |  CAST(sum(re_tokens) AS BIGINT) AS sum_re_tokens
             |FROM s GROUP BY source ORDER BY source""".stripMargin)),

    // ── q44: rolling-window fingerprint (north star "rolling hash" —
    // winnowing-lite, cf. MOSS): hash every 4-token sliding window,
    // keep the minimum as the doc fingerprint. Content-shift-robust
    // where q33's whole-doc hash is not; md5 as the window hash keeps
    // both engines bit-identical. All inside codegen'd higher-order
    // fns — the window pass is one linear scan per doc.
    QueryDef(
      "q44_winnow_fingerprint",
      (s, d) => {
        val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
        // native WinnowMin: null below 4 tokens → whole-text fallback
        // (bit-identical to the HOF array_min(md5(concat_ws)) form —
        // oracle-proved by q44's hash-match)
        val winnow = org.apache.spark.sql.GraftPlanBridge.column(
          graft.functions.WinnowMin(
            org.apache.spark.sql.GraftPlanBridge.expression(col("tk")), 4))
        t(s, d, "documents")
          .withColumn("tk", toks)
          .select(
            col("doc_id"),
            size(col("tk")).cast("long").as("n_tokens"),
            coalesce(winnow, md5(col("text"))).as("fp_win"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, text,
             |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
             |  FROM documents)
             |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
             |  CASE WHEN len(tk) >= 4 THEN
             |    list_min(list_transform(range(1, len(tk) - 2),
             |      i -> md5(tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
             |        || ' ' || tk[i+3])))
             |  ELSE md5(text) END AS fp_win
             |FROM t ORDER BY doc_id""".stripMargin)),

    // ── q33: document fingerprinting (north star) — whitespace-collapse
    // normalize then md5; head prefix as a short fingerprint.
    QueryDef(
      "q33_fingerprint",
      (s, d) => {
        t(s, d, "documents")
          .select(
            col("doc_id"),
            md5(trim(regexp_replace(lower(col("text")), " +", " "))).as("fp"))
          .withColumn("fp_head", substring(col("fp"), 1, 8))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |  md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp,
             |  substring(md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))), 1, 8)
             |    AS fp_head
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ── q59: TF-IDF top terms per document (text analysis north
    // star — the classic salient-term extractor). Term frequency and
    // document frequency are two hash aggs sharing the term shuffle
    // key; corpus size N joins in as a broadcast scalar; per-doc top-3
    // runs through [[graft.plans.GroupedTopK]]'s map-side heaps.
    // Ranking uses the 6-decimal-ROUNDED score on BOTH engines so the
    // ln() last-ulp difference between libm implementations cannot
    // reorder ranks (ties break on the term itself).
    QueryDef(
      "q59_tfidf_top_terms",
      (s, d) => {
        val toks = t(s, d, "documents")
          .select(col("doc_id"),
            explode(filter(split(col("text"), " "),
              tk => length(tk) > 0)).as("term"))
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        // df via a term-partitioned window over tf, not a separate
        // groupBy + join-back: the join form re-planned the tokenize
        // scan for the df branch (Catalyst rewrites count-over-an-
        // aggregate into a keys-only distinct, diverging the partials
        // and defeating exchange reuse — the r12 q305
        // duplicated-subtree class). The window's term exchange is
        // the SAME exchange the old join needed on its probe side, so
        // this is strictly one corpus pass cheaper; hot-term
        // partitions sort-buffer with spill, the same memory story as
        // the join's shuffle. The corpus-count branch reads no
        // columns (metadata count), not a second text pass.
        val wTerm = org.apache.spark.sql.expressions.Window
          .partitionBy(col("term"))
        val n = t(s, d, "documents").agg(count(lit(1)).as("n"))
        val scored = tf.withColumn("df", count(lit(1)).over(wTerm))
          .crossJoin(broadcast(n))
          .withColumn("score",
            round(col("tf").cast("double") *
              log(col("n").cast("double") / col("df").cast("double")), 6))
        graft.plans.GroupedTopK.topK(
            scored.select(col("doc_id"), col("term"), col("score")),
            Seq("doc_id"), Seq(("score", true), ("term", false)), 3)
          .orderBy(col("doc_id"), col("score").desc, col("term"))
      },
      Some("""WITH toks AS (SELECT doc_id, tok AS term
             |    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
             |    WHERE len(tok) > 0),
             |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n FROM documents),
             |scored AS (SELECT doc_id, term,
             |    round(CAST(tf AS DOUBLE) *
             |      ln(CAST(n AS DOUBLE)/CAST(df AS DOUBLE)), 6) AS score
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
             |SELECT doc_id, term, score FROM (
             |  SELECT doc_id, term, score, row_number() OVER (
             |    PARTITION BY doc_id ORDER BY score DESC, term) AS rn
             |  FROM scored) WHERE rn <= 3
             |ORDER BY doc_id, score DESC, term""".stripMargin)),

    // ── q60: corpus bigram counts (n-gram language-model statistics;
    // the 2-gram sibling of q19's unigram counts and q25's 3-gram
    // shingles). The window pass is codegen'd higher-order functions
    // over a BOUND token column (lambda re-eval gotcha), one shuffle
    // on the bigram, TakeOrdered top-20.
    QueryDef(
      "q60_bigram_counts",
      (s, d) => {
        t(s, d, "documents")
          .withColumn("tk",
            filter(split(col("text"), " "), tk => length(tk) > 0))
          .filter(size(col("tk")) >= 2)
          .select(explode(transform(sequence(lit(0), size(col("tk")) - 2),
            i => concat_ws(" ",
              element_at(col("tk"), i + 1),
              element_at(col("tk"), i + 2)))).as("bigram"))
          .groupBy(col("bigram"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("bigram"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
             |  FROM documents),
             |bg AS (SELECT b FROM toks,
             |    unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
             |      AS u(b)
             |  WHERE len(t) >= 2)
             |SELECT b AS bigram, count(*) AS cnt FROM bg
             |GROUP BY b ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin)),

    // ── q65: quality-weighted sampling (data mixing) — keep each
    // document with probability proportional to its q31 quality score,
    // DETERMINISTICALLY: membership is `hash(doc_id) % 1000 <
    // score*1000`, a pure map-side filter that yields the same mix on
    // every engine and run (rand()-weighted sampling is neither
    // reproducible nor oracle-checkable). The id hash is independent
    // of the score, so inclusion is unbiased within each score level;
    // the masked Knuth multiply is ANSI-overflow-safe at any id.
    // Filters the MATERIALIZED [[qualityScores]] frame rather than an
    // inline score projection: with an inline score, predicate
    // pushdown substitutes the score definition into the membership
    // filter below the project, and the split/filter token stack is
    // evaluated TWICE per row (filter + surviving projection) — the
    // attributed round-4 q65 regression. Against the shared persisted
    // base the filter reads a stored column, and the corpus text pass
    // is paid once for the whole quality family (q31/q65).
    QueryDef(
      "q65_weighted_sample",
      (s, d) => {
        qualityScores(s, d)
          .filter(expr(Q.knuthBucketSql("doc_id", 1000)) < col("score") * 1000)
          .select(col("doc_id"), col("score"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $QualityCteSql
             |SELECT doc_id, score FROM q
             |WHERE ${Q.knuthBucketSql("doc_id", 1000)} < score*1000
             |ORDER BY doc_id""".stripMargin)),

    // ── q66: repetition-based quality stats (the Gopher-style
    // "repetitious document" filter: excessive duplicate-token mass or
    // one dominant token ⇒ boilerplate/spam, drop before training).
    // Scale shape: two key-compatible shuffles — (doc_id, token) with
    // map-side partial counts (the per-token frequency map never
    // materializes per row; an `array_max(transform(array_distinct(
    // ...)))` HOF form would be O(n·distinct) per doc, quadratic on
    // diverse documents), then the reduced per-(doc, distinct-token)
    // counts re-key on doc_id for the rollup. The second shuffle
    // moves distinct-token counts, not raw tokens — bounded by corpus
    // vocabulary occurrences, and the dominant exploded-token pass is
    // combined before it ever crosses the wire. Flags derive from
    // exact integer ratios, so both engines compare identical IEEE
    // doubles.
    QueryDef(
      "q66_repetition_stats",
      (s, d) => {
        t(s, d, "documents")
          .select(col("doc_id"),
            explode(filter(split(col("text"), " "),
              tk => length(tk) > 0)).as("token"))
          .groupBy(col("doc_id"), col("token"))
          .agg(count(lit(1)).as("cnt"))
          .groupBy(col("doc_id"))
          .agg(
            sum(col("cnt")).cast("long").as("n_tokens"),
            count(lit(1)).cast("long").as("n_distinct"),
            max(col("cnt")).cast("long").as("top_cnt"))
          .withColumn("dup_frac",
            round((col("n_tokens") - col("n_distinct")).cast("double") /
              col("n_tokens").cast("double"), 6))
          .withColumn("top_frac",
            round(col("top_cnt").cast("double") /
              col("n_tokens").cast("double"), 6))
          .withColumn("flag_repetitive",
            (col("dup_frac") > 0.55 || col("top_frac") > 0.15).cast("int"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, tok AS token
             |    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
             |    WHERE len(tok) > 0),
             |tc AS (SELECT doc_id, token, count(*) AS cnt
             |  FROM toks GROUP BY doc_id, token),
             |agg AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             |    CAST(count(*) AS BIGINT) AS n_distinct,
             |    CAST(max(cnt) AS BIGINT) AS top_cnt
             |  FROM tc GROUP BY doc_id)
             |SELECT doc_id, n_tokens, n_distinct, top_cnt,
             |  round(CAST(n_tokens - n_distinct AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6)
             |    AS dup_frac,
             |  round(CAST(top_cnt AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6) AS top_frac,
             |  CAST(CASE WHEN
             |    round(CAST(n_tokens - n_distinct AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6)
             |      > 0.55
             |    OR round(CAST(top_cnt AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6) > 0.15
             |    THEN 1 ELSE 0 END AS INTEGER) AS flag_repetitive
             |FROM agg ORDER BY doc_id""".stripMargin)),

    // ── q67: PII detection + redaction (the scrub pass every training
    // corpus runs before release: find emails / IPv4s / phone numbers,
    // replace with typed placeholders). Pure MAP-SIDE regex work over
    // one corpus scan; the only shuffles are the rollup's
    // exact-distinct pair ((source, clean-hash) partials, then the
    // source agg — count rows and 16-byte digests on the wire, never
    // text), the standard price of an exact distinct count. The patterns stay inside the syntax
    // Java regex and RE2 share (character classes, bounded repeats, no
    // backrefs/lookarounds), so Spark and the oracle match identically;
    // `QualityQueriesSpec` proves the detectors on a crafted PII
    // fixture (this corpus is synthetic word-salad, so the interesting
    // assertions — real emails/IPs/phones found and redacted — live in
    // the spec, and the oracle proves cross-engine equivalence of the
    // full transform via the redacted-text hash). Each stage counts on
    // the PREVIOUS stage's redacted text — exactly what its own
    // replace then removes — so the counts always reconcile with the
    // placeholders in `clean` even when one span matches two patterns
    // (an email with an IPv4 local part counts once, as the email that
    // was actually redacted, not once per pattern).
    QueryDef(
      "q67_pii_scrub",
      (s, d) => {
        t(s, d, "documents")
          .select(col("source"),
            size(regexp_extract_all(col("text"), lit(EmailRe), lit(0)))
              .cast("long").as("email_cnt"),
            regexp_replace(col("text"), EmailRe, "<EMAIL>").as("c1"))
          .withColumn("ip_cnt",
            size(regexp_extract_all(col("c1"), lit(Ipv4Re), lit(0))).cast("long"))
          .withColumn("c2", regexp_replace(col("c1"), Ipv4Re, "<IP>"))
          .withColumn("phone_cnt",
            size(regexp_extract_all(col("c2"), lit(PhoneRe), lit(0))).cast("long"))
          .withColumn("clean", regexp_replace(col("c2"), PhoneRe, "<PHONE>"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("email_cnt")).cast("long").as("email_cnt"),
            sum(col("ip_cnt")).cast("long").as("ip_cnt"),
            sum(col("phone_cnt")).cast("long").as("phone_cnt"),
            sum((col("email_cnt") + col("ip_cnt") + col("phone_cnt") > 0)
              .cast("long")).cast("long").as("n_flagged"),
            countDistinct(md5(col("clean"))).cast("long").as("n_distinct_clean"))
          .orderBy(col("source"))
      },
      Some("""WITH p0 AS (SELECT source,
             |  CAST(len(regexp_extract_all(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             |    AS email_cnt,
             |  regexp_replace(text,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
             |    AS c1
             |  FROM documents),
             |p1 AS (SELECT source, email_cnt,
             |  CAST(len(regexp_extract_all(c1,
             |    '([0-9]{1,3}\.){3}[0-9]{1,3}')) AS BIGINT) AS ip_cnt,
             |  regexp_replace(c1, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS c2
             |  FROM p0),
             |p AS (SELECT source, email_cnt, ip_cnt,
             |  CAST(len(regexp_extract_all(c2,
             |    '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS BIGINT) AS phone_cnt,
             |  regexp_replace(c2,
             |    '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g') AS clean
             |  FROM p1)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(email_cnt) AS BIGINT) AS email_cnt,
             |  CAST(sum(ip_cnt) AS BIGINT) AS ip_cnt,
             |  CAST(sum(phone_cnt) AS BIGINT) AS phone_cnt,
             |  CAST(sum(CASE WHEN email_cnt + ip_cnt + phone_cnt > 0
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
             |  CAST(count(DISTINCT md5(clean)) AS BIGINT) AS n_distinct_clean
             |FROM p GROUP BY source ORDER BY source""".stripMargin)),

    // ── q69: domain mixing (data mixing north star, the per-SOURCE
    // twin of q65's per-document quality weighting): rebalance the
    // corpus so every source contributes equal token mass — the
    // "don't let one crawl dominate the mixture" pass. Per-source
    // rates are exact integer thousandths (min_tokens·1000 DIV
    // src_tokens), membership is the deterministic masked-Knuth hash
    // filter — same sample on every engine and run. Scale shape: the
    // corpus shuffles ONCE (source rollup with map-side partials); the
    // 20-row rate table broadcasts back; sampling is a pure map filter.
    QueryDef(
      "q69_domain_mix",
      (s, d) => {
        // ONE corpus pass. The sampling filter is a pure function of
        // the doc_id's knuth bucket (0..999), so the corpus collapses
        // to the (source, bucket) grain FIRST — ≤ 1000·|sources| rows,
        // a dimension — and both the rate table and the sampled
        // rollup derive from that one frame. Rates use the identical
        // packed-row arithmetic as [[sourceRates]] (shared
        // [[minTokFold]]/[[rateKCol]]; floorOne = false — in THIS
        // report a rate of 0 is a visible row the operator reads, not
        // silent loss), with the per-source bucket list riding inside
        // the same pack so sampling is an array fold, not a second
        // corpus branch: the former rates + join-back form planned
        // the text scan twice (the r12 q305 duplicated-subtree
        // class). min over token-BEARING sources only, and rate 0 for
        // a zero-token source: an all-empty source would otherwise
        // make min_tok = 0 and `0 DIV 0` throw under ANSI mode.
        val bg = t(s, d, "documents")
          .select(col("source"),
            expr(Q.knuthBucketSql("doc_id", 1000)).as("kb"),
            tokenMass(s, d, col("text")).as("n_tok"))
          .groupBy(col("source"), col("kb"))
          .agg(count(lit(1)).cast("long").as("nb"),
            sum(col("n_tok")).cast("long").as("tb"))
        val st = bg.groupBy(col("source"))
          .agg(sum(col("nb")).cast("long").as("n_docs"),
            coalesce(sum(col("tb")), lit(0L)).cast("long").as("src_tokens"),
            collect_list(struct(col("kb"), col("nb"),
              coalesce(col("tb"), lit(0L)).as("tb"))).as("buckets"))
        val sampled = filter(col("buckets"), b => b("kb") < col("rate_k"))
        st.agg(collect_list(struct(col("source"), col("n_docs"),
            col("src_tokens"), col("buckets"))).as("srcs"))
          .select(minTokFold(col("srcs")).as("min_tok"),
            explode(col("srcs")).as("s"))
          .select(col("s.source").as("source"), col("s.n_docs").as("n_docs"),
            col("s.src_tokens").as("src_tokens"), col("min_tok"),
            col("s.buckets").as("buckets"))
          .withColumn("rate_k", rateKCol(floorOne = false))
          .select(col("source"), col("n_docs"), col("src_tokens"),
            col("rate_k"),
            aggregate(sampled, lit(0L), (a, b) => a + b("nb"))
              .as("n_sampled"),
            aggregate(sampled, lit(0L), (a, b) => a + b("tb"))
              .as("sampled_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, source,
             |  CAST(len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS BIGINT)
             |    AS n_tok
             |  FROM documents),
             |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tok) AS BIGINT) AS src_tokens
             |  FROM tok GROUP BY source),
             |m AS (SELECT min(src_tokens) AS min_tok FROM st WHERE src_tokens > 0),
             |rates AS (SELECT source, n_docs, src_tokens,
             |    CASE WHEN src_tokens = 0 THEN 0
             |      ELSE min_tok * 1000 // src_tokens END AS rate_k
             |  FROM st CROSS JOIN m),
             |samp AS (SELECT t.source, CAST(count(*) AS BIGINT) AS n_sampled,
             |    CAST(sum(n_tok) AS BIGINT) AS sampled_tokens
             |  FROM tok t JOIN rates r USING (source)
             |  WHERE ${Q.knuthBucketSql("doc_id", 1000)} < rate_k
             |  GROUP BY t.source)
             |SELECT r.source, n_docs, src_tokens, rate_k,
             |  CAST(coalesce(n_sampled, 0) AS BIGINT) AS n_sampled,
             |  CAST(coalesce(sampled_tokens, 0) AS BIGINT) AS sampled_tokens
             |FROM rates r LEFT JOIN samp USING (source)
             |ORDER BY source""".stripMargin)),

    // ── q89: TEMPERATURE-scaled source mixing — the standard
    // multilingual/multi-source rebalancing rule (the XLM-R/mT5
    // sampler): target share ∝ share^α with α = 0.5, which upweights
    // small sources without letting any source dominate. q69's
    // equalization is the α→0 extreme; α=1 is the raw corpus. α is
    // FIXED at 0.5 deliberately — sqrt is the one power IEEE 754
    // requires correctly rounded, so both engines compute the weights
    // bit-identically where a pow(x, 0.3) could differ in the last
    // ulp and flip a floor. Determinism discipline: weights become
    // integer micro-units via floor (never round — no half-way cases
    // to disagree on), the weight SUM is integer (order-free), and
    // the rate is a fixed three-op IEEE chain ((T/t)·w)/W floored to
    // thousandths and capped at 1000 (no upsampling — a rate above 1
    // needs replication, a different operator). Membership is the
    // same masked-Knuth hash as q56/q57/q69. Scale shape identical to
    // q69: one rollup shuffle, a |sources|-row broadcast back, pure
    // map-side membership filter.
    QueryDef(
      "q89_mix_temperature",
      (s, d) => {
        // ONE corpus pass, q69's packed shape: collapse to the
        // (source, knuth-bucket) grain — ≤ 1000·|sources| rows, a
        // dimension — then pack the per-source table into one row so
        // the GLOBAL sums (t_all, w_all) fold inside it instead of
        // becoming a second plan branch; sampling is an array fold
        // over the bucket list riding in the same pack. The former
        // totals-crossJoin + join-back form planned the text scan
        // twice (the r12 q305 duplicated-subtree class). All
        // arithmetic expressions are byte-identical to the previous
        // form, so values hash-match.
        def weightK(srcTokens: org.apache.spark.sql.Column) =
          when(srcTokens === 0, lit(0L)).otherwise(
            floor(sqrt(srcTokens.cast("double")) * 1000).cast("long"))
        val bg = t(s, d, "documents")
          .select(col("source"),
            expr(Q.knuthBucketSql("doc_id", 1000)).as("kb"),
            tokenMass(s, d, col("text")).as("n_tok"))
          .groupBy(col("source"), col("kb"))
          .agg(count(lit(1)).cast("long").as("nb"),
            sum(col("n_tok")).cast("long").as("tb"))
        val st = bg.groupBy(col("source"))
          .agg(sum(col("nb")).cast("long").as("n_docs"),
            coalesce(sum(col("tb")), lit(0L)).cast("long").as("src_tokens"),
            collect_list(struct(col("kb"), col("nb"),
              coalesce(col("tb"), lit(0L)).as("tb"))).as("buckets"))
        val sampled = filter(col("buckets"), b => b("kb") < col("rate_k"))
        st.agg(collect_list(struct(col("source"), col("n_docs"),
            col("src_tokens"), col("buckets"))).as("srcs"))
          .select(
            aggregate(col("srcs"), lit(0L),
              (a, x) => a + x("src_tokens")).as("t_all"),
            aggregate(col("srcs"), lit(0L),
              (a, x) => a + weightK(x("src_tokens"))).as("w_all"),
            explode(col("srcs")).as("s"))
          .select(col("s.source").as("source"), col("s.n_docs").as("n_docs"),
            col("s.src_tokens").as("src_tokens"),
            weightK(col("s.src_tokens")).as("weight_k"),
            col("t_all"), col("w_all"), col("s.buckets").as("buckets"))
          .withColumn("rate_k",
            when(col("src_tokens") === 0 || col("w_all") === 0, lit(0L))
              .otherwise(least(lit(1000L),
                floor(col("t_all").cast("double")
                  / col("src_tokens").cast("double")
                  * col("weight_k").cast("double")
                  / col("w_all").cast("double") * 1000).cast("long"))))
          .select(col("source"), col("n_docs"), col("src_tokens"),
            col("weight_k"), col("rate_k"),
            aggregate(sampled, lit(0L), (a, b) => a + b("nb"))
              .as("n_sampled"),
            aggregate(sampled, lit(0L), (a, b) => a + b("tb"))
              .as("sampled_tokens"))
          .orderBy(col("source"))
      },
      Some(s"""WITH tok AS (SELECT doc_id, source,
             |  CAST(len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS BIGINT)
             |    AS n_tok
             |  FROM documents),
             |st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tok) AS BIGINT) AS src_tokens
             |  FROM tok GROUP BY source),
             |w AS (SELECT source, n_docs, src_tokens,
             |    CASE WHEN src_tokens = 0 THEN 0
             |      ELSE CAST(floor(sqrt(CAST(src_tokens AS DOUBLE)) * 1000) AS BIGINT)
             |    END AS weight_k
             |  FROM st),
             |tot AS (SELECT CAST(sum(src_tokens) AS BIGINT) AS t_all,
             |    CAST(sum(weight_k) AS BIGINT) AS w_all FROM w),
             |rates AS (SELECT source, n_docs, src_tokens, weight_k,
             |    CASE WHEN src_tokens = 0 OR w_all = 0 THEN 0
             |      ELSE least(1000, CAST(floor(
             |        CAST(t_all AS DOUBLE) / CAST(src_tokens AS DOUBLE)
             |          * CAST(weight_k AS DOUBLE) / CAST(w_all AS DOUBLE)
             |          * 1000) AS BIGINT))
             |    END AS rate_k
             |  FROM w CROSS JOIN tot),
             |samp AS (SELECT t.source, CAST(count(*) AS BIGINT) AS n_sampled,
             |    CAST(sum(n_tok) AS BIGINT) AS sampled_tokens
             |  FROM tok t JOIN rates r USING (source)
             |  WHERE ${Q.knuthBucketSql("doc_id", 1000)} < rate_k
             |  GROUP BY t.source)
             |SELECT r.source, n_docs, src_tokens, weight_k, rate_k,
             |  CAST(coalesce(n_sampled, 0) AS BIGINT) AS n_sampled,
             |  CAST(coalesce(sampled_tokens, 0) AS BIGINT) AS sampled_tokens
             |FROM rates r LEFT JOIN samp USING (source)
             |ORDER BY source""".stripMargin)),

    // ── q72: deterministic document chunking — fixed 32-token windows
    // at stride 24 (8-token overlap), the pre-embedding windowing op
    // every RAG/training pipeline runs between cleaning and encoding.
    // Pure MAP-SIDE work: tokens bind once per row, the window
    // enumeration is a codegen'd HOF over an index sequence, and the
    // output row carries the chunk's md5 (not its text), keeping the
    // emitted frame narrow — at 100 TB the chunk table shuffles
    // 16-byte digests, not re-inflated text. A doc shorter than one
    // window yields exactly one (partial) chunk; an empty doc yields
    // none; the final partial window is kept (its tokens appear
    // nowhere else). Chunk counts, overlap identity, and boundary
    // cases are spec-proved; the oracle re-derives every chunk digest
    // in DuckDB.
    QueryDef(
      "q72_doc_chunks",
      (s, d) => {
        val W = 32
        val S = 24
        t(s, d, "documents")
          .withColumn("tk", tokenArray(s, d, col("text")))
          .withColumn("n", size(col("tk")))
          .filter(col("n") > 0)
          .withColumn("last_idx",
            expr(s"CAST((greatest(n - $W, 0) + ${S - 1}) DIV $S AS INT)"))
          .select(col("doc_id"), posexplode(
            transform(sequence(lit(0), col("last_idx")),
              i => slice(col("tk"), i * S + 1, lit(W)))))
          .toDF("doc_id", "chunk_idx", "chunk")
          .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
            size(col("chunk")).cast("long").as("n_tokens"),
            md5(array_join(col("chunk"), " ")).as("chunk_md5"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
             |  FROM documents),
             |d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
             |c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
             |    list_slice(t, i*24 + 1, i*24 + 32) AS chunk
             |  FROM d, unnest(range(0, (greatest(n - 32, 0) + 23) // 24 + 1))
             |    AS r(i))
             |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_tokens,
             |  md5(array_to_string(chunk, ' ')) AS chunk_md5
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // ── q74: REAL BPE token mass per source (north star "token
    // counting" — replaces the q32 regex approximation with learned
    // byte-pair merges). The vocabulary trains once on the bounded
    // top-2048 word-frequency aggregate (driver-side, like the k-means
    // quantizer); the corpus-wide count is a pure map-side expression
    // with the merge table broadcast in the plan — one scan, one
    // shuffle of |sources| partial aggregates. No oracle: DuckDB has
    // no BPE (rows-only driver check; determinism, round-trip and
    // compression gated in BpeTokenizerSpec). `subword_per_word` > 1
    // by construction — each word is at least one token — and tracks
    // how aggressively the learned merges compress the corpus.
    QueryDef(
      "q74_bpe_token_count",
      (s, d) => {
        val merges = graft.functions.BpeVocab.merges(s, d)
        t(s, d, "documents")
          .select(col("source"),
            size(filter(split(col("text"), " "), tk => length(tk) > 0))
              .cast("long").as("ws_tokens"),
            graft.functions.BpeVocab.tokenCount(col("text"), merges)
              .as("bpe_tokens"))
          .groupBy(col("source"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("ws_tokens")).cast("long").as("sum_ws_tokens"),
            sum(col("bpe_tokens")).cast("long").as("sum_bpe_tokens"))
          .withColumn("subword_per_word",
            col("sum_bpe_tokens").cast("double") /
              col("sum_ws_tokens").cast("double"))
          .orderBy(col("source"))
      },
      None),

    // ── q77: bigram language-model quality score (CCNet-style
    // perplexity filter). A bigram LM is fit on the corpus itself —
    // conditional probability p(w2|w1) = c(w1 w2) / c(w1 ·) from exact
    // corpus counts — and each document is scored by its mean negative
    // log-likelihood: boilerplate/templated text scores LOW (its
    // bigrams are corpus-frequent), keyboard-mash and wrong-language
    // text scores HIGH. The model trains on the scored corpus, so
    // every document bigram has count ≥ 1 and no smoothing is needed.
    //
    // Float discipline: a per-doc sum of ln() doubles is
    // aggregation-order-dependent, so each bigram's cost is FIXED to
    // an exact integer first — round(1e6·ln(sc/bc)) per DISTINCT
    // bigram (one rounding per vocabulary entry, q59's accepted ulp
    // exposure) — then summed exactly as integers in any order and
    // divided once.
    //
    // Scale shape: model fit and scoring are SPLIT. The cached
    // [[lmCostTable]] trains once per corpus (shuffles bounded by
    // bigram vocabulary); query time is one corpus scan → (doc,
    // bigram) term frequencies with map-side partials → cost join →
    // doc rollup. The cost table is vocabulary-sized — AQE broadcasts
    // it into the join at any realistic vocabulary.
    QueryDef(
      "q77_lm_score",
      (s, d) =>
        // scoring the fitted corpus itself: OOV cannot occur, 0 is safe
        graft.operators.IncrementalLm.score(
          t(s, d, "documents"), lmCostTable(s, d), oovCostMicro = 0L),
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
             |  FROM documents),
             |d AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 2),
             |bg AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i+1] AS bigram
             |  FROM d, unnest(range(1, n)) AS r(i)),
             |tf AS (SELECT doc_id, w1, bigram, CAST(count(*) AS BIGINT) AS tf
             |  FROM bg GROUP BY 1, 2, 3),
             |bc AS (SELECT w1, bigram, CAST(sum(tf) AS BIGINT) AS bc
             |  FROM tf GROUP BY 1, 2),
             |sc AS (SELECT w1, CAST(sum(bc) AS BIGINT) AS sc FROM bc GROUP BY 1),
             |cost AS (SELECT w1, bigram,
             |    CAST(round(1000000.0 * ln(CAST(sc AS DOUBLE)/CAST(bc AS DOUBLE)))
             |      AS BIGINT) AS cost_micro
             |  FROM bc JOIN sc USING (w1))
             |SELECT tf.doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
             |  round(CAST(sum(tf*cost_micro) AS DOUBLE) /
             |    (CAST(sum(tf) AS DOUBLE)*1000000.0), 6) AS nll
             |FROM tf JOIN cost USING (w1, bigram)
             |GROUP BY 1 ORDER BY doc_id""".stripMargin)),

    // ── q90: sequence-PACKING map — the concatenate-and-chunk layout
    // every LLM training run performs between the cleaned corpus and
    // the data loader: per source, documents concatenate in doc_id
    // order into one token stream that is cut into fixed 2048-token
    // training sequences, and each document is mapped to the sequence
    // grid — which sequence it starts in, at what offset, and how many
    // sequences it spans (a straddling doc is the loader's
    // cross-boundary case; n_seqs > 1 quantifies it). Zero-token docs
    // occupy no stream positions and are excluded (q72's empty-doc
    // discipline).
    //
    // Scale shape: the running token cumsum is NOT a window over one
    // partition per source (a 100 TB source would serialize through a
    // single WindowExec task — the q50 anti-pattern). It is the q50
    // two-pass form: range-repartition by (source, doc_id), a
    // partition-local cumsum pass, then per-(partition, source) masses
    // — bounded by P + |sources| rows because range partitioning keeps
    // sources contiguous — collected once and broadcast back as exact
    // per-partition offsets. Work is two narrow passes over (doc_id,
    // source, n_tok); text never leaves the first projection.
    QueryDef(
      "q90_pack_sequences",
      (s, d) => {
        val L = 2048L
        val tok = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            tokenMass(s, d, col("text")).as("n_tok"))
          .filter(col("n_tok") > 0)
        // the source-keyed exclusive cumsum is the shared two-pass
        // helper (extracted from this query's inline form; q143 keeps
        // its Window form — its input is domain-bounded to distinct
        // cents, where the keyed rewrite MEASURED 1.4× slower)
        Q.keyedCumBefore(tok, "source", Seq(col("doc_id")), "n_tok")
          .withColumn("cb", col("cum_before"))
          .select(col("doc_id"), col("source"), col("n_tok"),
            expr(s"cb DIV $L").as("seq_id"),
            (col("cb") % L).as("seq_off"),
            (expr(s"(cb + n_tok - 1) DIV $L") - expr(s"cb DIV $L") + 1L)
              .as("n_seqs"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH tok AS (SELECT doc_id, source,
             |  CAST(len(list_filter(string_split(text,' '), x -> len(x) > 0)) AS BIGINT)
             |    AS n_tok
             |  FROM documents),
             |nz AS (SELECT * FROM tok WHERE n_tok > 0),
             |c AS (SELECT doc_id, source, n_tok,
             |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY source
             |      ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cb
             |  FROM nz)
             |SELECT doc_id, source, n_tok,
             |  cb // 2048 AS seq_id, cb % 2048 AS seq_off,
             |  (cb + n_tok - 1) // 2048 - cb // 2048 + 1 AS n_seqs
             |FROM c ORDER BY doc_id""".stripMargin)),

    // ── q91: φ-heavy-hitter tokens — the exact "which tokens dominate
    // the corpus" report (stopword discovery, tokenizer-vocabulary
    // sanity, boilerplate tells) at φ = 1/500 of total token mass.
    // EXACT output from a bounded-memory mine-then-verify pass, the
    // repo's standard discipline: per partition, a Misra–Gries
    // K=1024-counter summary (decrement-all on overflow) whose
    // survivors PROVABLY include every token with partition count >
    // n_p/(K+1); summing that bound over partitions, the union of
    // survivors ⊇ every token with global count > n/(K+1) ⊃ the
    // φ=1/500 set. The exact pass then counts ONLY candidates (a
    // broadcast semi-join — ≤ K·P rows however large the vocabulary)
    // and applies the φ filter on exact integer counts, so the result
    // hash-matches the definitional oracle. Scale story: the full
    // vocabulary NEVER shuffles — the exchange carries per-partition
    // partials of ≤ K·P candidate tokens, where a naive groupBy over a
    // 100 TB corpus shuffles the whole token stream's vocabulary.
    // MG guarantee + pruning proved in scalatest on a constructed
    // vocab > K fixture ([[mgCandidates]] is the spec-callable seam).
    QueryDef(
      "q91_heavy_hitters",
      (s, d) => {
        // TWO corpus passes — the declared mine-then-verify minimum.
        // The mine pass now carries the exact per-partition token
        // counts alongside the MG survivors ([[mgMine]], collected:
        // bounded by (K+1)·P, the same envelope as broadcasting the
        // candidate set), so n_total no longer costs a third scan and
        // the φ threshold becomes a literal — no totals branch, no
        // scalar crossJoin.
        val toks = t(s, d, "documents")
          .select(explode(tokenArray(s, d, col("text"))).as("tok"))
        val (candToks, nTotal) = mgMine(toks, 1024)
        val cand = s.createDataset(candToks)(
          org.apache.spark.sql.Encoders.STRING).toDF("tok")
        toks.join(broadcast(cand), Seq("tok"), "left_semi")
          .groupBy(col("tok"))
          .agg(count(lit(1)).cast("long").as("cnt"))
          .filter(col("cnt") * 500 > lit(nTotal))
          .select(col("tok"), col("cnt"),
            expr(s"cnt * 1000 DIV ${nTotal}L").as("permille"))
          .orderBy(col("cnt").desc, col("tok"))
      },
      Some("""WITH toks AS (SELECT
             |    unnest(list_filter(string_split(text,' '), x -> len(x) > 0))
             |      AS tok
             |  FROM documents),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks),
             |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
             |  FROM toks GROUP BY tok)
             |SELECT tok, cnt, cnt * 1000 // n_total AS permille
             |FROM c CROSS JOIN tot WHERE cnt * 500 > n_total
             |ORDER BY cnt DESC, tok""".stripMargin)),

    // ── q94: train/val/test SPLIT assignment — the deterministic
    // holdout cut every release makes before training (98/1/1 by
    // doc_id bucket). Membership is the masked-Knuth arithmetic shared
    // with q56/q57/q65/q69 (ONE engine-portable SQL fragment), which
    // buys the property rank-based splitting lacks: a document's split
    // is a pure function of its id, so it NEVER migrates when other
    // documents arrive or leave — val stays val across corpus
    // versions, the precondition for comparable eval numbers. Report:
    // per (source, split) doc/token masses — the table release notes
    // print. Scale shape: one corpus scan, split computed map-side,
    // one shuffle to the ≤ 3·|sources| rollup grain.
    QueryDef(
      "q94_split_assign",
      (s, d) => {
        val b = expr(Q.knuthBucketSql("doc_id", 100))
        t(s, d, "documents")
          .select(col("source"),
            when(b < 98, "train").when(b === 98, "val").otherwise("test")
              .as("split"),
            tokenMass(s, d, col("text")).as("n_tok"))
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_tok")).cast("long").as("split_tokens"))
          .orderBy(col("source"), col("split"))
      },
      Some(s"""WITH a AS (SELECT source,
             |    CASE WHEN ${Q.knuthBucketSql("doc_id", 100)} < 98 THEN 'train'
             |      WHEN ${Q.knuthBucketSql("doc_id", 100)} = 98 THEN 'val'
             |      ELSE 'test' END AS split,
             |    CAST(len(list_filter(string_split(text,' '), x -> len(x) > 0))
             |      AS BIGINT) AS n_tok
             |  FROM documents)
             |SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS split_tokens
             |FROM a GROUP BY 1, 2 ORDER BY source, split""".stripMargin)),

    // ── q99: BM25 keyword search — the ranked retrieval face every
    // text corpus eventually needs (retrieval-based decontamination,
    // quality-by-similarity-to-good-text filtering, plain search over
    // a crawl). Okapi BM25 (k1 = 1.2, b = 0.75) over a fixed 3-term
    // probe; top-20 by score.
    //
    // Scale shape: for a BOUNDED query-term set the inverted index is
    // unnecessary — per-term tf is `size(filter(tk, _ == term))`, a
    // codegen HOF over the bound token array, so tf/dl both compute
    // MAP-SIDE in one corpus scan with no explode and no token
    // shuffle. The global stats (N, Σdl, per-term df) are one 1-row
    // scalar aggregate broadcast back (q59/q91's scalar shape), the
    // ≥1-hit filter prunes before any sort, and top-20 is
    // TakeOrdered — no global sort. At 100 TB this is one pass over
    // corpus bytes plus a constant-size broadcast.
    //
    // Float discipline: tf/dl/df/N are exact integers; the score is
    // derived with the SAME literal operation order on both engines
    // and rounded to 6 decimals (q59's ln discipline); ties break on
    // doc_id so the top-20 cut is total-ordered.
    QueryDef(
      "q99_bm25_search",
      (s, d) => {
        val terms = Bm25Terms
        bm25ScoredHits(s, d)
          .select(Seq(col("doc_id"), col("dl").as("n_tokens")) ++
            terms.zipWithIndex.map { case (tm, i) =>
              col(s"tf$i").as(s"tf_$tm") } :+ col("score"): _*)
          .orderBy(col("score").desc, col("doc_id"))
          .limit(20)
      },
      Some {
        val tfOut = Bm25Terms.zipWithIndex.map { case (tm, i) =>
          s"tf$i AS tf_$tm" }.mkString(", ")
        s"""$bm25ScoredSqlCte
           |SELECT doc_id, dl AS n_tokens, $tfOut, score
           |FROM sc
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
      }),

    // ── q107: per-source token-distribution ENTROPY — the diversity
    // number next to q69's source masses (a source whose token entropy
    // collapses is boilerplate/templated text however large it is;
    // rising entropy flags vocabulary churn). Shannon H = ln N −
    // (Σ_t c_t·ln c_t)/N over exact per-(source, term) counts. The
    // float trap is the Σ over the vocabulary: a double sum is
    // aggregation-order-dependent, so each term's ln c_t becomes an
    // integer MICRO-UNIT cost round(10⁶·ln c) (q77's trick — both
    // engines compute ln on the same exact integer and the rounding
    // absorbs sub-ulp libm disagreement), the Σ c·cost accumulates in
    // DECIMAL(38,0)/HUGEINT exactly in any order, and ONE double
    // division + round 6 closes. Scale shape: explode → one shuffle
    // to the (source, term) grain with map-side partials (the
    // wordcount shape), second hash agg to |sources| rows.
    QueryDef(
      "q107_token_entropy",
      (s, d) => {
        val tc = t(s, d, "documents")
          .select(col("source"),
            explode(filter(split(col("text"), " "),
              tk => length(tk) > 0)).as("term"))
          .groupBy(col("source"), col("term"))
          .agg(count(lit(1)).cast("long").as("c"))
        val costed = tc.withColumn("cost_micro",
          round(lit(1000000.0) * log(col("c").cast("double")))
            .cast("long"))
        costed.groupBy(col("source"))
          .agg(sum(col("c")).cast("long").as("n_tokens"),
            count(lit(1)).cast("long").as("n_terms"),
            sum((col("c").cast("decimal(19,0)") *
              col("cost_micro").cast("decimal(19,0)"))
              .cast("decimal(38,0)")).as("num"))
          .select(col("source"), col("n_tokens"), col("n_terms"),
            round(log(col("n_tokens").cast("double")) -
              col("num").cast("double") /
                (col("n_tokens").cast("double") * lit(1000000.0)), 6)
              .as("entropy"))
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (SELECT source, tok AS term
             |    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
             |    WHERE len(tok) > 0),
             |tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
             |  FROM toks GROUP BY 1, 2),
             |cost AS (SELECT source, c,
             |    CAST(round(1000000.0*ln(CAST(c AS DOUBLE))) AS BIGINT)
             |      AS cost_micro
             |  FROM tc),
             |a AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
             |    CAST(count(*) AS BIGINT) AS n_terms,
             |    sum(CAST(c AS HUGEINT)*cost_micro) AS num
             |  FROM cost GROUP BY 1)
             |SELECT source, n_tokens, n_terms,
             |  round(ln(CAST(n_tokens AS DOUBLE)) - CAST(num AS DOUBLE) /
             |    (CAST(n_tokens AS DOUBLE)*1000000.0), 6) AS entropy
             |FROM a ORDER BY source""".stripMargin)),

    // ── q108: Jensen–Shannon divergence of each source's token
    // distribution vs the REST of the corpus — the "does this source
    // even speak the same language as the others" read behind mixing
    // decisions (q69 balances masses; q108 says whether the masses
    // are interchangeable). JSD(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M the
    // mixture — bounded [0, ln 2], symmetric, never infinite. The
    // per-term log ratios are exact-integer rationals: p/m =
    // 2cN_r/(cN_r + rN_s) and q/m = 2rN_s/(cN_r + rN_s), each
    // ln'd once and micro-rounded (q77/q107 discipline), masses
    // accumulated in DECIMAL(38,0)/HUGEINT. Terms ABSENT from the
    // source (c = 0, the |vocab|×|sources| trap) never enumerate:
    // p = 0 kills their KL(P‖M) term and m = q/2 collapses their
    // KL(Q‖M) term to q·ln2, so the whole absent mass folds into
    // the closed form ln2·(N_r − ΣR_present)/N_r from counts the
    // present grain already carries. Scale shape: the (source, term)
    // wordcount grain, one |term|-keyed join against global term
    // counts, broadcast per-source masses, one hash agg to |sources|.
    QueryDef(
      "q108_js_divergence",
      (s, d) => {
        val dec19 = "decimal(19,0)"
        val dec38 = "decimal(38,0)"
        val tc = t(s, d, "documents")
          .select(col("source"),
            explode(filter(split(col("text"), " "),
              tk => length(tk) > 0)).as("term"))
          .groupBy(col("source"), col("term"))
          .agg(count(lit(1)).cast("long").as("c"))
        val g = tc.groupBy(col("term"))
          .agg(sum(col("c")).cast("long").as("gc"))
        val ns = tc.groupBy(col("source"))
          .agg(sum(col("c")).cast("long").as("n_s"))
        val tot = ns.agg(sum(col("n_s")).cast("long").as("n_tot"))
        val base = tc.join(g, Seq("term"))
          .join(broadcast(ns), Seq("source"))
          .crossJoin(broadcast(tot))
          .withColumn("r", col("gc") - col("c"))
          .withColumn("n_r", col("n_tot") - col("n_s"))
          // mixture denominator c·N_r + r·N_s — exact integer
          .withColumn("den",
            (col("c").cast(dec19) * col("n_r").cast(dec19) +
              col("r").cast(dec19) * col("n_s").cast(dec19)).cast(dec38))
        val costP = round(lit(1000000.0) * log(
          (lit(2).cast(dec19) * col("c").cast(dec19) * col("n_r").cast(dec19))
            .cast(dec38).cast("double") / col("den").cast("double")))
          .cast("long")
        val costQ = when(col("r") > 0,
          round(lit(1000000.0) * log(
            (lit(2).cast(dec19) * col("r").cast(dec19) * col("n_s").cast(dec19))
              .cast(dec38).cast("double") / col("den").cast("double")))
            .cast("long")).otherwise(lit(0L))
        val agg = base
          .withColumn("cost_p", costP).withColumn("cost_q", costQ)
          .groupBy(col("source"))
          .agg(max(col("n_s")).as("n_s"), max(col("n_r")).as("n_r"),
            sum((col("c").cast(dec19) * col("cost_p").cast(dec19))
              .cast(dec38)).as("sump"),
            sum((col("r").cast(dec19) * col("cost_q").cast(dec19))
              .cast(dec38)).as("sumq"),
            sum(col("r")).cast("long").as("r_present"))
        agg.filter(col("n_r") > 0)
          .select(col("source"), col("n_s").as("n_tokens"),
            round(
              lit(0.5) * (col("sump").cast("double") /
                (col("n_s").cast("double") * lit(1000000.0))) +
                lit(0.5) * (col("sumq").cast("double") /
                  (col("n_r").cast("double") * lit(1000000.0)) +
                  log(lit(2.0)) *
                    ((col("n_r").cast("double") -
                      col("r_present").cast("double")) /
                      col("n_r").cast("double"))), 6).as("jsd"))
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (SELECT source, tok AS term
             |    FROM documents, unnest(string_split(text, ' ')) AS t(tok)
             |    WHERE len(tok) > 0),
             |tc AS (SELECT source, term, CAST(count(*) AS BIGINT) AS c
             |  FROM toks GROUP BY 1, 2),
             |g AS (SELECT term, CAST(sum(c) AS BIGINT) AS gc
             |  FROM tc GROUP BY 1),
             |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s
             |  FROM tc GROUP BY 1),
             |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot FROM ns),
             |base AS (SELECT tc.source, tc.c, gc - tc.c AS r, n_s,
             |    n_tot - n_s AS n_r,
             |    CAST(tc.c AS HUGEINT)*(n_tot - n_s)
             |      + CAST(gc - tc.c AS HUGEINT)*n_s AS den
             |  FROM tc JOIN g USING (term) JOIN ns USING (source)
             |    CROSS JOIN tot),
             |costed AS (SELECT source, c, r, n_s, n_r,
             |    CAST(round(1000000.0*ln(CAST(2*CAST(c AS HUGEINT)*n_r
             |      AS DOUBLE)/CAST(den AS DOUBLE))) AS BIGINT) AS cost_p,
             |    CASE WHEN r > 0 THEN
             |      CAST(round(1000000.0*ln(CAST(2*CAST(r AS HUGEINT)*n_s
             |        AS DOUBLE)/CAST(den AS DOUBLE))) AS BIGINT)
             |      ELSE 0 END AS cost_q
             |  FROM base),
             |a AS (SELECT source, max(n_s) AS n_s, max(n_r) AS n_r,
             |    sum(CAST(c AS HUGEINT)*cost_p) AS sump,
             |    sum(CAST(r AS HUGEINT)*cost_q) AS sumq,
             |    CAST(sum(r) AS BIGINT) AS r_present
             |  FROM costed GROUP BY 1)
             |SELECT source, n_s AS n_tokens,
             |  round(0.5*(CAST(sump AS DOUBLE)/(CAST(n_s AS DOUBLE)*1000000.0))
             |    + 0.5*(CAST(sumq AS DOUBLE)/(CAST(n_r AS DOUBLE)*1000000.0)
             |      + ln(2.0)*((CAST(n_r AS DOUBLE) - CAST(r_present AS DOUBLE))
             |        / CAST(n_r AS DOUBLE))), 6) AS jsd
             |FROM a WHERE n_r > 0 ORDER BY source""".stripMargin)),

    // ── q110: quality-vs-length Pareto frontier — the documents no
    // selection policy should ever drop: each is the best q31 score
    // achievable at its token budget (maximize score, minimize
    // n_tokens; a doc is dominated iff some other doc is ≤ as long
    // AND ≥ as good, strictly better in one). This is the skyline
    // read behind "where should the quality floor sit at each length
    // bucket" (q97's curve for similarity, re-run for quality).
    // Frontier characterization that avoids the quadratic NOT EXISTS:
    // a doc is on the frontier iff its score equals the max score AT
    // its token count AND strictly beats the best score at every
    // SMALLER token count. Scale shape: the corpus collapses to the
    // |distinct n_tokens| grain with one hash agg (map-side
    // partials); the prefix-max window runs over THAT frame —
    // domain-bounded by document length, not corpus size (q106's
    // rule) — and the surviving frontier token-counts broadcast back
    // against the materialized quality base. No pair join anywhere.
    QueryDef(
      "q110_pareto_frontier",
      (s, d) => {
        val q = qualityScores(s, d)
          .filter(col("score").isNotNull)
          .select(col("doc_id"), col("n_tokens"), col("score"))
        val perT = q.groupBy(col("n_tokens"))
          .agg(max(col("score")).as("t_max"))
        val wPre = org.apache.spark.sql.expressions.Window
          .orderBy(col("n_tokens"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        val frontierT = perT
          .withColumn("pre_max", max(col("t_max")).over(wPre))
          .filter(col("pre_max").isNull || col("t_max") > col("pre_max"))
          .select(col("n_tokens"), col("t_max"))
        q.join(broadcast(frontierT), Seq("n_tokens"))
          .filter(col("score") === col("t_max"))
          .select(col("doc_id"), col("n_tokens"),
            round(col("score"), 6).as("score"))
          .orderBy(col("n_tokens"), col("doc_id"))
      },
      Some(s"""WITH $QualityCteSql,
             |p AS (SELECT q.doc_id, s.n_tokens, q.score
             |  FROM q JOIN s USING (doc_id) WHERE q.score IS NOT NULL),
             |tmax AS (SELECT n_tokens, max(score) AS t_max
             |  FROM p GROUP BY 1),
             |pre AS (SELECT n_tokens, t_max,
             |    max(t_max) OVER (ORDER BY n_tokens
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS pre_max
             |  FROM tmax),
             |ft AS (SELECT n_tokens, t_max FROM pre
             |  WHERE pre_max IS NULL OR t_max > pre_max)
             |SELECT p.doc_id, p.n_tokens, round(p.score, 6) AS score
             |FROM p JOIN ft USING (n_tokens) WHERE p.score = ft.t_max
             |ORDER BY n_tokens, doc_id""".stripMargin)),

    // ── q111: PMI collocations — the corpus's over-represented
    // adjacent word pairs, PMI(a,b) = ln(c_ab·N / (c_a·c_b)) with N
    // the corpus token mass (the classic collocation statistic; the
    // "which bigrams are phrases, not chance" read a tokenizer or
    // stop-phrase list is built from — q60 ranks bigrams by raw
    // count, which just surfaces stopword pairs; PMI normalizes the
    // marginals away). A count floor (c_ab ≥ 5) kills the
    // low-support noise PMI is notorious for. Exact discipline: all
    // counts are integers, c_ab·N and c_a·c_b accumulate as
    // DECIMAL(38,0)/HUGEINT products, ONE double division then one
    // ln then round 6 — identical op order both engines. Scale
    // shape: unigram and bigram counts are two hash aggs off one
    // token pass; the marginal attach is two |vocab|-keyed
    // equi-joins (shuffle joins — vocab is corpus-scale); the 1-row
    // token-total broadcasts (q91's scalar shape); top-20 is
    // TakeOrdered, never a global sort.
    QueryDef(
      "q111_pmi_collocations",
      (s, d) => {
        val dec19 = "decimal(19,0)"
        val dec38 = "decimal(38,0)"
        val toks = t(s, d, "documents")
          .withColumn("tk",
            filter(split(col("text"), " "), tk => length(tk) > 0))
        val uni = toks
          .select(explode(col("tk")).as("term"))
          .groupBy(col("term"))
          .agg(count(lit(1)).cast("long").as("c"))
        val tot = uni.agg(sum(col("c")).cast("long").as("n_tot"))
        val bi = toks
          .filter(size(col("tk")) >= 2)
          .select(explode(transform(sequence(lit(0), size(col("tk")) - 2),
            i => struct(
              element_at(col("tk"), i + 1).as("term_a"),
              element_at(col("tk"), i + 2).as("term_b")))).as("p"))
          .select(col("p.term_a"), col("p.term_b"))
          .groupBy(col("term_a"), col("term_b"))
          .agg(count(lit(1)).cast("long").as("c_ab"))
          .filter(col("c_ab") >= 5)
        bi
          .join(uni.withColumnRenamed("term", "term_a")
            .withColumnRenamed("c", "c_a"), Seq("term_a"))
          .join(uni.withColumnRenamed("term", "term_b")
            .withColumnRenamed("c", "c_b"), Seq("term_b"))
          .crossJoin(broadcast(tot))
          .select(col("term_a"), col("term_b"), col("c_ab"),
            round(log(
              (col("c_ab").cast(dec19) * col("n_tot").cast(dec19))
                .cast(dec38).cast("double") /
                (col("c_a").cast(dec19) * col("c_b").cast(dec19))
                  .cast(dec38).cast("double")), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("term_a"), col("term_b"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
             |  FROM documents),
             |uni AS (SELECT u AS term, CAST(count(*) AS BIGINT) AS c
             |  FROM toks, unnest(t) AS un(u) GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_tot FROM uni),
             |bi AS (SELECT a AS term_a, b AS term_b,
             |    CAST(count(*) AS BIGINT) AS c_ab
             |  FROM (SELECT t[i] AS a, t[i+1] AS b
             |    FROM toks, unnest(range(1, len(t))) AS r(i)
             |    WHERE len(t) >= 2)
             |  GROUP BY 1, 2 HAVING count(*) >= 5)
             |SELECT term_a, term_b, c_ab,
             |  round(ln(CAST(CAST(c_ab AS HUGEINT)*n_tot AS DOUBLE) /
             |    CAST(CAST(ua.c AS HUGEINT)*ub.c AS DOUBLE)), 6) AS pmi
             |FROM bi
             |JOIN uni ua ON ua.term = bi.term_a
             |JOIN uni ub ON ub.term = bi.term_b
             |CROSS JOIN tot
             |ORDER BY pmi DESC, term_a, term_b LIMIT 20""".stripMargin)),

    // ── q114: exact phrase search — order-sensitive occurrence
    // counts for a bounded probe-phrase set, top-10 documents per
    // phrase (the retrieval face q99's bag-of-terms BM25 cannot
    // express: "data stream" as a PHRASE, not two independent
    // terms — and the primitive behind span-level benchmark
    // contamination checks, where the probe is a benchmark sentence).
    // Scale shape: q99's bounded-probe rule — for a FIXED phrase
    // list the inverted positional index is unnecessary: each
    // phrase's occurrence count is a codegen HOF scan over the bound
    // token array (adjacent-pair equality at every start position),
    // so counting runs MAP-SIDE in one corpus pass with no explode,
    // no token shuffle; per-phrase top-10 goes through the
    // GroupedTopK operator (map-side bounded heaps — q46's shape,
    // which also keeps the 3-key phrase grain from pinning three
    // reducers under a naive window), final order is a |phrases|×10
    // row sort.
    QueryDef(
      "q114_phrase_search",
      (s, d) => {
        // ONE corpus scan: all phrase counts as parallel columns over
        // the bound token array, then a |phrases|-way stack unpivot —
        // a per-phrase union would rescan the corpus once per probe
        // (measured 3× the runtime of this shape at sf0.1)
        // the (phrase, doc_id, n_occ) hit list rides the stamped/
        // durable tier (round 7): it is the phrase-search posting
        // artifact — small (hit docs only), rebuilt only when the
        // corpus stamp moves, read cold by any later session
        val perPhrase = phraseHitsCache.get(s, d) {
          val counted = t(s, d, "documents")
            .withColumn("tk",
              filter(split(col("text"), " "), tk => length(tk) > 0))
            .select(col("doc_id") +: PhraseProbes.zipWithIndex.map {
              case (ph, ix) =>
                val Array(w1, w2) = ph.split(" ")
                when(size(col("tk")) >= 2,
                  size(filter(sequence(lit(0), size(col("tk")) - 2),
                    i => element_at(col("tk"), i + 1) === w1 &&
                      element_at(col("tk"), i + 2) === w2)))
                  .otherwise(0).cast("long").as(s"c$ix")
            }: _*)
          val stacked = PhraseProbes.zipWithIndex.map { case (ph, ix) =>
            s"'$ph', c$ix"
          }.mkString(", ")
          counted
            .selectExpr("doc_id",
              s"stack(${PhraseProbes.size}, $stacked) AS (phrase, n_occ)")
            .filter(col("n_occ") > 0)
        }
        graft.plans.GroupedTopK.topK(perPhrase, Seq("phrase"),
            Seq(("n_occ", true), ("doc_id", false)), 10)
          .select(col("phrase"), col("doc_id"), col("n_occ"))
          .orderBy(col("phrase"), col("n_occ").desc, col("doc_id"))
      },
      Some {
        val per = PhraseProbes.map { ph =>
          val Array(w1, w2) = ph.split(" ")
          s"""SELECT '$ph' AS phrase, doc_id,
             |    CAST(len(list_filter(range(1, len(tk)),
             |      i -> tk[i] = '$w1' AND tk[i+1] = '$w2')) AS BIGINT)
             |      AS n_occ
             |  FROM toks WHERE len(tk) >= 2""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""WITH toks AS (SELECT doc_id,
           |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
           |  FROM documents),
           |hits AS ($per),
           |r AS (SELECT *, row_number() OVER (PARTITION BY phrase
           |    ORDER BY n_occ DESC, doc_id) AS rn
           |  FROM hits WHERE n_occ > 0)
           |SELECT phrase, doc_id, n_occ FROM r WHERE rn <= 10
           |ORDER BY phrase, n_occ DESC, doc_id""".stripMargin
      }),

    // ── q115: source vocabulary overlap — pairwise Jaccard of the
    // source vocabularies plus directional token-mass coverage
    // ("what fraction of b's tokens does a's vocabulary cover" — the
    // can-a-tokenizer-trained-on-a-handle-b read, and the lexical
    // companion to q108's distributional divergence: q108 compares
    // the distributions, q115 the supports). Scale shape: the
    // corpus collapses once to the distinct (term, source) grain
    // with per-source term masses (one hash agg); the pair expansion
    // self-joins on term — per-term fanout is bounded by
    // |sources|² (a constant ≤ 25 here, never corpus-scale), then
    // one hash agg to the |sources|² pair grain; vocabulary sizes
    // and masses broadcast back. All counts exact longs, jaccard and
    // coverage are single divisions rounded 6.
    QueryDef(
      "q115_vocab_overlap",
      (s, d) => {
        val ts0 = t(s, d, "documents")
          .select(col("source"),
            explode(filter(split(col("text"), " "),
              tk => length(tk) > 0)).as("term"))
          .groupBy(col("source"), col("term"))
          .agg(count(lit(1)).cast("long").as("c"))
        // ONE corpus pass, fully single-chain. Pair enumeration goes
        // through per-term source lists (a term is held by at most
        // |sources| sources — a dimension — so the collected list is
        // bounded and the a×b fanout happens map-side), and the
        // DIAGONAL cells ride along: (x, x) counts every term of x
        // once, so n_shared(x,x) IS x's vocabulary size and
        // mass_b_covered(x,x) IS x's token mass — the former separate
        // `sizes` frame, whose broadcast join-back made Catalyst plan
        // the text scan twice (the r12 q305 duplicated-subtree
        // class). The ≤ |sources|² cell table then packs into one row
        // where the off-diagonal report looks its diagonal values up
        // with array folds. Exact integers end-to-end, so values
        // hash-match the join-back form.
        def diag(cs: org.apache.spark.sql.Column,
            src: org.apache.spark.sql.Column) =
          element_at(filter(cs, y =>
            y("source_a") === src && y("source_b") === src), 1)
        ts0.groupBy(col("term"))
          .agg(collect_list(struct(col("source"), col("c"))).as("ss"))
          .select(explode(col("ss")).as("a"), col("ss"))
          .select(col("a.source").as("source_a"), explode(col("ss")).as("b"))
          .groupBy(col("source_a"), col("b.source").as("source_b"))
          .agg(count(lit(1)).cast("long").as("n_shared"),
            sum(col("b.c")).cast("long").as("mass_b_covered"))
          .agg(collect_list(struct(col("source_a"), col("source_b"),
            col("n_shared"), col("mass_b_covered"))).as("cs"))
          .select(explode(col("cs")).as("x"), col("cs"))
          .filter(col("x.source_a") =!= col("x.source_b"))
          .select(col("x.source_a").as("source_a"),
            col("x.source_b").as("source_b"),
            col("x.n_shared").as("n_shared"),
            col("x.mass_b_covered").as("mass_b_covered"),
            diag(col("cs"), col("x.source_a"))("n_shared").as("v_a"),
            diag(col("cs"), col("x.source_b"))("n_shared").as("v_b"),
            diag(col("cs"), col("x.source_b"))("mass_b_covered").as("mass_b"))
          .select(col("source_a"), col("source_b"), col("n_shared"),
            round(col("n_shared").cast("double") /
              (col("v_a") + col("v_b") - col("n_shared")).cast("double"), 6)
              .as("jaccard"),
            round(col("mass_b_covered").cast("double") /
              col("mass_b").cast("double"), 6).as("cov_b_by_a"))
          .orderBy(col("source_a"), col("source_b"))
      },
      Some("""WITH ts0 AS (SELECT source, u AS term,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM documents,
             |    unnest(list_filter(string_split(text, ' '),
             |      x -> len(x) > 0)) AS un(u)
             |  GROUP BY 1, 2),
             |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS v,
             |    CAST(sum(c) AS BIGINT) AS mass
             |  FROM ts0 GROUP BY 1),
             |shared AS (SELECT a.source AS source_a, b.source AS source_b,
             |    CAST(count(*) AS BIGINT) AS n_shared,
             |    CAST(sum(b.c) AS BIGINT) AS mass_b_covered
             |  FROM ts0 a JOIN ts0 b ON a.term = b.term
             |    AND a.source <> b.source
             |  GROUP BY 1, 2)
             |SELECT source_a, source_b, n_shared,
             |  round(CAST(n_shared AS DOUBLE) /
             |    CAST(sa.v + sb.v - n_shared AS DOUBLE), 6) AS jaccard,
             |  round(CAST(mass_b_covered AS DOUBLE) /
             |    CAST(sb.mass AS DOUBLE), 6) AS cov_b_by_a
             |FROM shared
             |JOIN sizes sa ON sa.source = shared.source_a
             |JOIN sizes sb ON sb.source = shared.source_b
             |ORDER BY source_a, source_b""".stripMargin)),

    // ── q119: source concentration — Herfindahl–Hirschman index of
    // the corpus token mass across sources, with the top source's
    // share and the effective source count 1/HHI (the
    // "is this corpus really N sources or one source wearing N
    // names" read behind every mixing decision; the concentration
    // summary next to q107's per-source entropy — q107 measures
    // diversity WITHIN a source, q119 across them). One output row.
    // Exactness: per-source masses are exact longs; Σmass² runs in
    // DECIMAL(38,0)/HUGEINT (q58 moment discipline — corpus-scale
    // token masses square past 2⁶³); HHI = Σm²/(Σm)² and the shares
    // derive in double with one literal op order, round 6. Scale
    // shape: wordcount grain → |sources| masses (map-side partials)
    // → a single-row moment aggregate; nothing after the first agg
    // touches the corpus.
    QueryDef(
      "q119_source_concentration",
      (s, d) => {
        val dec19 = "decimal(19,0)"
        val dec38 = "decimal(38,0)"
        val masses = t(s, d, "documents")
          .select(col("source"),
            explode(filter(split(col("text"), " "),
              tk => length(tk) > 0)).as("term"))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("mass"))
        masses.agg(
            count(lit(1)).cast("long").as("n_sources"),
            sum(col("mass")).cast("long").as("total_tokens"),
            max(col("mass")).cast("long").as("top_mass"),
            sum((col("mass").cast(dec19) * col("mass").cast(dec19))
              .cast(dec38)).as("ssq"))
          .select(col("n_sources"), col("total_tokens"),
            round(col("top_mass").cast("double") /
              col("total_tokens").cast("double"), 6).as("top_share"),
            round(col("ssq").cast("double") /
              (col("total_tokens").cast("double") *
                col("total_tokens").cast("double")), 6).as("hhi"),
            round(col("total_tokens").cast("double") *
              col("total_tokens").cast("double") /
              col("ssq").cast("double"), 6).as("eff_sources"))
      },
      Some("""WITH m AS (SELECT source, CAST(count(*) AS BIGINT) AS mass
             |  FROM documents,
             |    unnest(list_filter(string_split(text, ' '),
             |      x -> len(x) > 0)) AS un(u)
             |  GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_sources,
             |  CAST(sum(mass) AS BIGINT) AS total_tokens,
             |  round(CAST(max(mass) AS DOUBLE) /
             |    CAST(CAST(sum(mass) AS BIGINT) AS DOUBLE), 6) AS top_share,
             |  round(CAST(sum(CAST(mass AS HUGEINT)*mass) AS DOUBLE) /
             |    (CAST(CAST(sum(mass) AS BIGINT) AS DOUBLE) *
             |     CAST(CAST(sum(mass) AS BIGINT) AS DOUBLE)), 6) AS hhi,
             |  round(CAST(CAST(sum(mass) AS BIGINT) AS DOUBLE) *
             |    CAST(CAST(sum(mass) AS BIGINT) AS DOUBLE) /
             |    CAST(sum(CAST(mass AS HUGEINT)*mass) AS DOUBLE), 6)
             |    AS eff_sources
             |FROM m""".stripMargin)),

    // ── q121: windowed term co-occurrence — unordered term pairs
    // within a ±3-token window, top-20 by count (the context-pair
    // statistic embedding training consumes — skip-gram/GloVe
    // training data IS this grain; q60/q111 see only ADJACENT pairs,
    // which misses most of a word's context). Pairs normalize
    // (least, greatest) so both orders land in one cell.
    //
    // Stopword df-prune (round 7): terms whose document frequency
    // exceeds `spark.graft.cooc.dfCeiling` (share of docs, default
    // 0.5) are dropped BEFORE pair emission — ubiquitous terms carry
    // no co-occurrence signal (their PMI ≈ 0 by construction) yet
    // dominate pair MASS, which is exactly the cost term at 100 TB.
    // The window stays ±3 ORIGINAL token positions: pruning removes
    // pair endpoints, it does not compress distances (two rare terms
    // separated by 5 stopwords still do NOT pair). Semantics note on
    // the fixtures: the synthetic vocabulary is 31 terms of which 30
    // appear in ~77% of documents, so the prune keeps only the rare
    // 'dup' marker and the result is deliberately small — on a real
    // corpus the df distribution is Zipfian and the ceiling removes
    // the ~1% stopword head that carries ~half the token mass.
    // Ceiling ≥ 1.0 disables the prune (positions survive intact and
    // the gap condition is vacuous, so the plan degrades to the
    // original unpruned pair mining — QueriesSpec proves the
    // equivalence).
    //
    // Scale shape: the hot set derives from the cached/durable
    // `term_df` base (built once per corpus) via a PLAN-TIME collect
    // bounded by avg-distinct-terms-per-doc ÷ ceiling (Σdf ≤ N·avg ⇒
    // ≤ ~2·avg terms at the 0.5 default; require-guarded loud) and
    // compiles into an InSet token filter — no join, no broadcast.
    // Pair generation is nested codegen HOFs over the surviving
    // POSITION array — each surviving position emits ≤ 3 pairs
    // map-side, so the explode carries ≤ 3·surviving-tokens rows into
    // ONE hash agg at the pair-vocabulary grain (map-side partials);
    // top-20 is TakeOrdered, never a global sort.
    QueryDef(
      "q121_cooccurrence",
      (s, d) => {
        val ceiling =
          s.conf.get("spark.graft.cooc.dfCeiling", "0.5").toDouble
        // Hot set memoized per (session, corpus-stamp, ceiling): the
        // set is a plan-time input, and without the memo every
        // invocation re-paid a count job + a collect over the cached
        // term_df frame (measured ~0.4 s/run at sf0.1 — a recurring
        // query re-deriving a constant). Stamp-keyed like every other
        // derived base, so a rewritten corpus rebuilds it.
        val hot: Seq[String] =
          if (ceiling >= 1.0) Nil
          else hotTermsCache.computeIfAbsent(
            (s, d, ceiling, Q.dirStamp(d)), { _ =>
              val nDocs = t(s, d, "documents").count()
              val h = termDf(s, d)
                .filter(col("df").cast("double") > lit(ceiling * nDocs))
                .select(col("term")).collect().map(_.getString(0)).toSeq
              require(h.size <= 100000,
                s"q121 hot-term set ${h.size} exceeds the plan-time bound" +
                  " — raise spark.graft.cooc.dfCeiling or rebuild term_df")
              h
            })
        // Surviving tokens carry their ORIGINAL position as a (t, i)
        // struct built with zip_with, and the prune filter binds the
        // struct as its lambda variable — it never indexes back into
        // an outer array. The previous form (`filter(sequence(...),
        // i => !element_at(tk, i+1).isin(...))`) let CollapseProject
        // inline tk's `filter(split(text))` INTO the position lambda,
        // re-tokenizing the document once per position — O(tokens²)
        // splits per doc (plan-read + measured: the prune tripled the
        // per-run cost at sf0.1; this form re-measures at the
        // unpruned baseline).
        val zs = col("zs")
        val el = (i: org.apache.spark.sql.Column) => element_at(zs, i)
        val zipped = zip_with(
          filter(split(col("text"), " "), t => length(t) > 0),
          sequence(lit(0),
            size(filter(split(col("text"), " "), t => length(t) > 0)) - 1),
          (t, i) => struct(t.as("t"), i.as("i")))
        t(s, d, "documents")
          .withColumn("zs",
            if (hot.isEmpty) zipped
            else filter(zipped, p => !p.getField("t").isin(hot: _*)))
          .filter(size(zs) >= 2)
          .select(explode(flatten(
            transform(sequence(lit(0), size(zs) - 2), a =>
              transform(
                filter(sequence(a + 1, least(a + 3, size(zs) - 1)), b =>
                  el(b + 1).getField("i") - el(a + 1).getField("i") <= 3),
                b => struct(
                  least(el(a + 1).getField("t"), el(b + 1).getField("t"))
                    .as("term_a"),
                  greatest(el(a + 1).getField("t"), el(b + 1).getField("t"))
                    .as("term_b")))))).as("p"))
          .select(col("p.term_a"), col("p.term_b"))
          .groupBy(col("term_a"), col("term_b"))
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy(col("n").desc, col("term_a"), col("term_b"))
          .limit(20)
      },
      Some("""WITH toks AS (SELECT doc_id,
             |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
             |  FROM documents),
             |nd AS (SELECT count(*) AS n_docs FROM toks),
             |df AS (SELECT u AS term, count(DISTINCT doc_id) AS df
             |  FROM toks, unnest(t) AS un(u) GROUP BY 1),
             |hot AS (SELECT term FROM df, nd
             |  WHERE CAST(df AS DOUBLE) > 0.5 * n_docs),
             |pos AS (SELECT doc_id, i, t[i] AS term
             |  FROM toks, unnest(range(1, len(t) + 1)) AS r(i)
             |  WHERE len(t) >= 2
             |    AND t[i] NOT IN (SELECT term FROM hot)),
             |pairs AS (SELECT least(p.term, q.term) AS term_a,
             |    greatest(p.term, q.term) AS term_b
             |  FROM pos p JOIN pos q
             |    ON q.doc_id = p.doc_id AND q.i > p.i AND q.i <= p.i + 3)
             |SELECT term_a, term_b, CAST(count(*) AS BIGINT) AS n
             |FROM pairs GROUP BY 1, 2
             |ORDER BY n DESC, term_a, term_b LIMIT 20""".stripMargin)),

    // ── q122: language-ID confusion matrix — the declared `lang`
    // column vs q30's stopword-heuristic prediction, per (declared,
    // predicted) cell with the within-declared share (the EVAL face
    // of q30: a classifier without a confusion matrix is a guess;
    // here the matrix also measures how anglocentric the heuristic
    // is — non-en rows land in 'unknown' by construction). The cell
    // share derives from two exact counts via the per-declared total
    // broadcast back on an equi-join. Scale shape: one corpus scan
    // to the ≤ |langs|×2 cell grain (map-side partials), a
    // |langs|-row broadcast, done.
    QueryDef(
      "q122_lang_confusion",
      (s, d) => {
        val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
        // null-lang sentinel: the \u0000 prefix cannot collide with
        // any real language tag (Release's null-source convention —
        // a doc whose lang LITERALLY says "null" with a space or NUL
        // prefix must not fold into the NULL cell)
        val pred = t(s, d, "documents")
          .select(coalesce(col("lang"), lit("\u0000null")).as("lang"),
            (size(filter(toks, tk => tk.isin(EnStops: _*))).cast("double") /
              size(toks).cast("double")).as("en_ratio"))
          .select(col("lang"), predLangFromRatio(col("en_ratio"))
            .as("pred_lang"))
        val cells = pred.groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).cast("long").as("n"))
        val totals = cells.groupBy(col("lang"))
          .agg(sum(col("n")).cast("long").as("n_lang"))
        cells.join(broadcast(totals), Seq("lang"))
          .select(col("lang"), col("pred_lang"), col("n"),
            round(col("n").cast("double") / col("n_lang").cast("double"), 6)
              .as("share"))
          .orderBy(col("lang"), col("pred_lang"))
      },
      Some(s"""WITH p AS (SELECT
             |    coalesce(lang, chr(0) || 'null') AS lang,
             |    CASE WHEN
             |      CAST(len(list_filter(string_split(text, ' '),
             |        x -> x IN ($EnStopsSql))) AS DOUBLE) /
             |      CAST(len(list_filter(string_split(text, ' '),
             |        x -> len(x) > 0)) AS DOUBLE) >= $EnRatioThreshold
             |      THEN 'en' ELSE 'unknown' END AS pred_lang
             |  FROM documents),
             |cells AS (SELECT lang, pred_lang,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM p GROUP BY 1, 2),
             |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_lang
             |  FROM cells GROUP BY 1)
             |SELECT cells.lang, pred_lang, n,
             |  round(CAST(n AS DOUBLE)/CAST(n_lang AS DOUBLE), 6) AS share
             |FROM cells JOIN tot ON cells.lang = tot.lang
             |ORDER BY cells.lang, pred_lang""".stripMargin)),

    // ── q123: rare-token documents — per doc, the fraction of its
    // tokens whose CORPUS frequency is ≤ 2, top-20 rarest (the
    // gibberish/transcription-noise detector the q31 shape heuristics
    // miss: a doc of plausible word-lengths built from tokens the
    // rest of the corpus never uses is OCR garbage, a wrong-language
    // leak, or hash salad — high rare_frac is exactly that signal;
    // legitimate technical text rarely exceeds ~0.3). Scale shape:
    // the (doc, term) wordcount grain joins global term counts on the
    // |vocab|-keyed term column (shuffle join — vocab is
    // corpus-scale), one hash agg back to the |docs| grain, top-20
    // is TakeOrdered; rare_frac is two exact counts and one
    // division.
    QueryDef(
      "q123_rare_token_docs",
      (s, d) => {
        val grain = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            explode(filter(split(col("text"), " "),
              tk => length(tk) > 0)).as("term"))
        val global = grain.groupBy(col("term"))
          .agg(count(lit(1)).cast("long").as("gc"))
        grain.join(global, Seq("term"))
          .groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).cast("long").as("n_tokens"),
            sum(when(col("gc") <= 2, 1L).otherwise(0L)).cast("long")
              .as("rare_cnt"))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("rare_cnt"),
            round(col("rare_cnt").cast("double") /
              col("n_tokens").cast("double"), 6).as("rare_frac"))
          .orderBy(col("rare_frac").desc, col("doc_id"))
          .limit(20)
      },
      Some("""WITH grain AS (SELECT doc_id, source, u AS term
             |  FROM documents,
             |    unnest(list_filter(string_split(text, ' '),
             |      x -> len(x) > 0)) AS un(u)),
             |g AS (SELECT term, CAST(count(*) AS BIGINT) AS gc
             |  FROM grain GROUP BY 1),
             |p AS (SELECT doc_id, source,
             |    CAST(count(*) AS BIGINT) AS n_tokens,
             |    CAST(sum(CASE WHEN gc <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS rare_cnt
             |  FROM grain JOIN g USING (term) GROUP BY 1, 2)
             |SELECT doc_id, source, n_tokens, rare_cnt,
             |  round(CAST(rare_cnt AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6)
             |    AS rare_frac
             |FROM p ORDER BY rare_frac DESC, doc_id LIMIT 20"""
        .stripMargin)),

    // ── q133: per-source GLOBAL quality-decile mix — each source's
    // documents bucketed by where their q31 score falls in the
    // CORPUS-WIDE score distribution (9 exact global percentile
    // thresholds → 10 deciles), with within-source shares: the
    // fairness read behind any per-source quality gate (q65/Release
    // apply one absolute floor; q133 shows whether a source is
    // systematically low-quality relative to the corpus, or just
    // differently shaped — the q69 mixing decision needs exactly
    // this). Determinism: both engines interpolate the same 9
    // thresholds from identical doubles (q41's argument) and every
    // doc compares its identical score against them — decile
    // assignment cannot diverge. Scale shape: the materialized
    // quality base joins source once at the corpus grain, the 1-row
    // threshold frame broadcasts (q91's scalar shape), decile
    // assignment is a map-side array scan, one hash agg to the ≤
    // |sources|×10 cell grain; the within-source share is a window
    // over that bounded cell frame (q09's ratio-of-total rule).
    QueryDef(
      "q133_quality_deciles",
      (s, d) => {
        val pcts = (1 to 9).map(_ / 10.0)
        val base = qualityScores(s, d)
          .filter(col("score").isNotNull)
          .join(t(s, d, "documents").select(col("doc_id"), col("source")),
            Seq("doc_id"))
        val ths = base.agg(
          expr(s"percentile(score, array(${pcts.mkString(", ")}))")
            .as("ths"))
        val wSrc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
        base.crossJoin(broadcast(ths))
          .withColumn("decile",
            (size(filter(col("ths"), th => col("score") > th)) + 1)
              .cast("long"))
          .groupBy(col("source"), col("decile"))
          .agg(count(lit(1)).cast("long").as("n"))
          .withColumn("share",
            round(col("n").cast("double") /
              sum(col("n")).over(wSrc).cast("double"), 6))
          .orderBy(col("source"), col("decile"))
      },
      Some {
        val pcts = (1 to 9).map(_ / 10.0)
        s"""WITH $QualityCteSql,
           |p AS (SELECT q.doc_id, d.source, q.score
           |  FROM q JOIN documents d USING (doc_id)
           |  WHERE q.score IS NOT NULL),
           |ths AS (SELECT quantile_cont(score,
           |    [${pcts.mkString(", ")}]) AS ths FROM p),
           |dec AS (SELECT source,
           |    CAST(len(list_filter(ths, th -> score > th)) + 1 AS BIGINT)
           |      AS decile
           |  FROM p CROSS JOIN ths),
           |cells AS (SELECT source, decile, CAST(count(*) AS BIGINT) AS n
           |  FROM dec GROUP BY 1, 2)
           |SELECT source, decile, n,
           |  round(CAST(n AS DOUBLE) /
           |    CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE), 6)
           |    AS share
           |FROM cells ORDER BY source, decile""".stripMargin
      }),

    // ── q193: token-BUDGET greedy selection — the curation step that
    // actually ships a training mix: rank every scored document by the
    // q31 quality score (ties by doc_id) and admit documents in rank
    // order until a global token budget (here 50% of the scored
    // corpus's token mass — scale-free) is exhausted; report each
    // source's share of the survivors. The probabilistic mixers
    // (q65/q69/q89) hit a rate; this is the deterministic "best N
    // tokens" cut whose outcome per source IS the quality ranking's
    // verdict on that source. Admission is by exact integers: a doc is
    // in iff its exclusive prefix mass + own mass ≤ budget.
    //
    // Scale shape: the global rank-order cumsum is NOT an
    // unpartitioned window (the q50 anti-pattern) — [[Q.globalCumBefore]]
    // range-repartitions on (score desc, doc_id), cumsums within
    // partitions, and broadcasts the ≤P exact partition offsets; the
    // budget threshold comes from the same bounded collect (no second
    // corpus aggregate, no scalar cross join). Two narrow passes over
    // (doc_id, n_tok, score, source); text never leaves the score scan.
    QueryDef(
      "q193_budget_select",
      (s, d) => {
        val scored = qualityScores(s, d)
          .filter(col("score").isNotNull)
          .select(col("doc_id"), col("n_tokens").as("n_tok"), col("score"))
          .join(t(s, d, "documents").select(col("doc_id"), col("source")),
            Seq("doc_id"))
        val (cum, total) = Q.globalCumBefore(scored,
          Seq(col("score").desc, col("doc_id")), "n_tok")
        val budget = total / 2
        cum
          .withColumn("sl",
            when(col("cum_before") + col("n_tok") <= budget, 1L)
              .otherwise(0L))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("sl")).cast("long").as("n_sel"),
            sum(col("n_tok")).cast("long").as("tok_total"),
            sum(col("sl") * col("n_tok")).cast("long").as("tok_sel"))
          .withColumn("sel_share",
            round(col("tok_sel").cast("double") /
              col("tok_total").cast("double"), 6))
          .orderBy(col("source"))
      },
      Some(s"""WITH $QualityCteSql,
             |p AS (SELECT q.doc_id, d.source, s.n_tokens AS n_tok, q.score
             |  FROM q JOIN s USING (doc_id) JOIN documents d USING (doc_id)
             |  WHERE q.score IS NOT NULL),
             |tot AS (SELECT sum(n_tok) // 2 AS budget FROM p),
             |c AS (SELECT doc_id, source, n_tok,
             |    CAST(coalesce(sum(n_tok) OVER (ORDER BY score DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS cb
             |  FROM p),
             |sel AS (SELECT source, n_tok,
             |    CASE WHEN cb + n_tok <= budget THEN 1 ELSE 0 END AS sl
             |  FROM c CROSS JOIN tot)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(sl) AS BIGINT) AS n_sel,
             |  CAST(sum(n_tok) AS BIGINT) AS tok_total,
             |  CAST(sum(sl*n_tok) AS BIGINT) AS tok_sel,
             |  round(CAST(sum(sl*n_tok) AS DOUBLE)/CAST(sum(n_tok) AS DOUBLE), 6)
             |    AS sel_share
             |FROM sel GROUP BY source ORDER BY source""".stripMargin)),

    // ── q202: n-gram DIVERSITY (type-token ratio) per source, at
    // unigram and trigram grain — the repetitiveness readout next to
    // q107's entropy (entropy weighs the distribution; TTR counts how
    // much of the emitted mass is NOVEL — templated/boilerplate text
    // craters trigram TTR long before unigram TTR moves, which is why
    // generation papers report distinct-n). Scale shape: gram rows go
    // through ONE wordcount-shaped (source, grain, gram) hash agg with
    // map-side partials, and the distinct count derives by a SECOND
    // map-side rollup over that collapsed frame — the two-level form,
    // never a countDistinct Expand (the r8 plan-hash lesson); trigram
    // construction is a codegen transform over the token array (no
    // self-join, no positional explode join).
    QueryDef(
      "q202_ngram_diversity",
      (s, d) => {
        val tk = filter(split(col("text"), " "), x => length(x) > 0)
        // ONE scan, ONE tokenize (r14): the former unigram/trigram
        // UNION branched the tokenized frame — Catalyst clones shared
        // subtrees per consumer, so documents was scanned AND
        // split-tokenized twice (finalized-plan ranScans:
        // documents×2, and tokenize dominates this query). Both
        // grains now emit from one (grain, gram) struct array per
        // doc: the trigram arm maps over slice(tk, 3, n) — empty for
        // docs under 3 tokens, exactly the old size≥3 filter — where
        // the slice element at 0-based i IS tk[i+2], closing each
        // window started at tk[i]. Same exploded mass, same
        // downstream aggregate. Output unchanged (oracle hash-green).
        t(s, d, "documents")
          .select(col("source"), tk.as("tk"))
          .select(col("source"), explode(expr(
            """concat(
              |  transform(tk, x ->
              |    named_struct('grain', '1_unigram', 'g', x)),
              |  transform(slice(tk, 3, size(tk)), (x, i) ->
              |    named_struct('grain', '3_trigram', 'g',
              |      concat_ws(' ', tk[i], tk[i + 1], x))))""".stripMargin))
            .as("e"))
          .select(col("source"), col("e.grain").as("grain"),
            col("e.g").as("g"))
          .groupBy(col("source"), col("grain"), col("g"))
          .agg(count(lit(1)).cast("long").as("n"))
          .groupBy(col("source"), col("grain"))
          .agg(sum(col("n")).cast("long").as("n_total"),
            count(lit(1)).cast("long").as("n_distinct"))
          .withColumn("ttr",
            round(col("n_distinct").cast("double") /
              col("n_total").cast("double"), 6))
          .orderBy(col("source"), col("grain"))
      },
      Some("""WITH tok AS (SELECT source,
             |    list_filter(string_split(text,' '), x -> len(x) > 0) AS tk
             |  FROM documents),
             |uni AS (SELECT source, '1_unigram' AS grain,
             |    unnest(tk) AS g FROM tok),
             |tri AS (SELECT source, '3_trigram' AS grain,
             |    unnest(list_transform(range(1, len(tk)-1),
             |      i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
             |  FROM tok WHERE len(tk) >= 3),
             |gc AS (SELECT source, grain, g, CAST(count(*) AS BIGINT) AS n
             |  FROM (SELECT * FROM uni UNION ALL SELECT * FROM tri)
             |  GROUP BY source, grain, g)
             |SELECT source, grain,
             |  CAST(sum(n) AS BIGINT) AS n_total,
             |  CAST(count(*) AS BIGINT) AS n_distinct,
             |  round(CAST(count(*) AS DOUBLE)/CAST(sum(n) AS DOUBLE), 6)
             |    AS ttr
             |FROM gc GROUP BY source, grain
             |ORDER BY source, grain""".stripMargin)),

    // ── q203: context-LENGTH coverage — docs bucketed by whitespace
    // token count into fixed power-of-2 ceilings, with each bucket's
    // doc count, token mass, and the CUMULATIVE share of corpus tokens
    // at or below it: reads as "a context window of X tokens covers Y%
    // of the corpus without truncation" — the planning twin of q193's
    // budget cut (q193 answers "which docs fit a token budget", this
    // answers "which window fits the docs"). Exact integer thresholds
    // (no log2 floats), bucket keys sort-prefixed so lexicographic
    // order IS the size order (the q194 bucket discipline). Scale
    // shape: one corpus scan into a ≤6-row histogram; the running
    // share windows over that dimension-bounded frame (q09's form).
    QueryDef(
      "q203_length_coverage",
      (s, d) => {
        val n = size(filter(split(col("text"), " "), x => length(x) > 0))
          .cast("long")
        val bucket = when(col("n_tok") <= 64, "a_le_64")
          .when(col("n_tok") <= 128, "b_le_128")
          .when(col("n_tok") <= 256, "c_le_256")
          .when(col("n_tok") <= 512, "d_le_512")
          .when(col("n_tok") <= 1024, "e_le_1024")
          .otherwise("f_gt_1024")
        val h = t(s, d, "documents")
          .select(n.as("n_tok"))
          .select(bucket.as("bucket"), col("n_tok"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_tok")).cast("long").as("tokens"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .currentRow)
        val wAll = org.apache.spark.sql.expressions.Window
          .orderBy(col("bucket"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, org.apache.spark.sql.expressions.Window
            .unboundedFollowing)
        h.withColumn("cum_tokens", sum(col("tokens")).over(w))
          .withColumn("cum_share",
            round(col("cum_tokens").cast("double") /
              sum(col("tokens")).over(wAll).cast("double"), 6))
          .orderBy(col("bucket"))
      },
      Some("""WITH s AS (SELECT
             |    CAST(len(list_filter(string_split(text,' '),
             |      x -> len(x) > 0)) AS BIGINT) AS n_tok
             |  FROM documents),
             |b AS (SELECT CASE WHEN n_tok <= 64 THEN 'a_le_64'
             |    WHEN n_tok <= 128 THEN 'b_le_128'
             |    WHEN n_tok <= 256 THEN 'c_le_256'
             |    WHEN n_tok <= 512 THEN 'd_le_512'
             |    WHEN n_tok <= 1024 THEN 'e_le_1024'
             |    ELSE 'f_gt_1024' END AS bucket, n_tok
             |  FROM s),
             |h AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(n_tok) AS BIGINT) AS tokens
             |  FROM b GROUP BY bucket)
             |SELECT bucket, n_docs, tokens,
             |  CAST(sum(tokens) OVER (ORDER BY bucket
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cum_tokens,
             |  round(CAST(sum(tokens) OVER (ORDER BY bucket
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS DOUBLE) /
             |    CAST(sum(tokens) OVER () AS DOUBLE), 6) AS cum_share
             |FROM h ORDER BY bucket""".stripMargin)),

    // ── q224: PACKING-efficiency sweep (r9) — the readout a training
    // team reads BEFORE choosing a context length: for each candidate
    // ctx ∈ {512, 1024, 2048, 4096}, the sequence count and padding
    // mass under the three batching layouts — PACKED (per-source
    // cross-doc concatenation, q90's layout: only each source's tail
    // sequence pads), DOC-ALIGNED (each doc padded to its own
    // ⌈n/ctx⌉ boundary — no cross-doc attention leakage, the padding
    // price of that isolation), and SINGLE-SEQUENCE truncation (one
    // sequence per doc, the token mass LOST at each ctx). q90 maps
    // documents to the packed grid at one fixed ctx; this prices the
    // grid choice itself. align_overhead = aligned/packed sequences
    // is the headline multiplier. Exactness: every measure is an
    // exact integer (⌈·⌉ as (n + ctx − 1) div ctx — integer div both
    // engines); the one ratio is a mirrored rounded division.
    //
    // Scale shape: ONE corpus scan computes (source, n_tok); the
    // 4-row ctx dimension broadcast-fans the per-doc stream 4× into
    // a map-side-combined |ctx| hash agg (no corpus shuffle, the
    // q129/q144 dimension-fanout class); the packed side re-uses the
    // |sources| mass rollup crossed with the same 4-row dim at
    // dimension grain. Output 4 rows.
    QueryDef(
      "q224_packing_efficiency",
      (s, d) => {
        import s.implicits._
        val lDim = Seq(512L, 1024L, 2048L, 4096L).toDF("ctx")
        val tok = t(s, d, "documents")
          .select(col("source"), tokenMass(s, d, col("text")).as("n_tok"))
          .filter(col("n_tok") > 0)
        val docside = tok.crossJoin(broadcast(lDim))
          .groupBy(col("ctx"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(expr("(n_tok + ctx - 1) div ctx")).cast("long")
              .as("aligned_seqs"),
            sum(expr("((n_tok + ctx - 1) div ctx) * ctx - n_tok"))
              .cast("long").as("aligned_pad"),
            sum(greatest(col("n_tok") - col("ctx"), lit(0L))).cast("long")
              .as("trunc_tokens"))
        val packed = tok.groupBy(col("source"))
          .agg(sum(col("n_tok")).as("mass"))
          .crossJoin(broadcast(lDim))
          .groupBy(col("ctx"))
          .agg(sum(expr("(mass + ctx - 1) div ctx")).cast("long")
              .as("packed_seqs"),
            sum(expr("((mass + ctx - 1) div ctx) * ctx - mass"))
              .cast("long").as("packed_pad"))
        docside.join(packed, Seq("ctx"))
          .select(col("ctx"), col("n_docs"), col("packed_seqs"),
            col("packed_pad"), col("aligned_seqs"), col("aligned_pad"),
            col("trunc_tokens"),
            round(col("aligned_seqs").cast("double") /
              col("packed_seqs").cast("double"), 6).as("align_overhead"))
          .orderBy(col("ctx"))
      },
      Some("""WITH tok AS (SELECT source,
             |    CAST(len(list_filter(string_split(text,' '),
             |      x -> len(x) > 0)) AS BIGINT) AS n_tok
             |  FROM documents),
             |nz AS (SELECT * FROM tok WHERE n_tok > 0),
             |ls AS (SELECT CAST(u AS BIGINT) AS ctx
             |  FROM unnest([512,1024,2048,4096]) AS t(u)),
             |docside AS (SELECT ctx, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum((n_tok + ctx - 1) // ctx) AS BIGINT)
             |      AS aligned_seqs,
             |    CAST(sum(((n_tok + ctx - 1) // ctx) * ctx - n_tok)
             |      AS BIGINT) AS aligned_pad,
             |    CAST(sum(greatest(n_tok - ctx, 0)) AS BIGINT)
             |      AS trunc_tokens
             |  FROM nz CROSS JOIN ls GROUP BY ctx),
             |srcm AS (SELECT source, sum(n_tok) AS mass
             |  FROM nz GROUP BY 1),
             |packed AS (SELECT ctx,
             |    CAST(sum((mass + ctx - 1) // ctx) AS BIGINT)
             |      AS packed_seqs,
             |    CAST(sum(((mass + ctx - 1) // ctx) * ctx - mass)
             |      AS BIGINT) AS packed_pad
             |  FROM srcm CROSS JOIN ls GROUP BY ctx)
             |SELECT ctx, n_docs, packed_seqs, packed_pad, aligned_seqs,
             |  aligned_pad, trunc_tokens,
             |  round(CAST(aligned_seqs AS DOUBLE)
             |    /CAST(packed_seqs AS DOUBLE), 6) AS align_overhead
             |FROM docside JOIN packed USING (ctx)
             |ORDER BY ctx""".stripMargin))
  )

  /** Per-partition Misra–Gries candidate mine over a one-column token
    * frame: K bounded counters per partition, decrement-all on
    * overflow, survivors unioned and deduplicated. Guarantee (the
    * q91 superset proof, spec-pinned): a token with partition count
    * > n_p/(K+1) always holds a positive counter at partition end, so
    * any token with GLOBAL count > n/(K+1) — which must exceed the
    * per-partition bound somewhere — survives in at least one
    * partition. Output is ≤ K rows per partition regardless of
    * vocabulary size.
    */
  /** Per-partition MG summaries: one `(null, n_p)` row carrying the
    * partition's token count, then the ≤ K survivors as `(tok, 0)`.
    * The count rides in the SAME pass so callers that need the exact
    * global token mass (q91's φ threshold) get it from the mine
    * instead of a third corpus scan.
    */
  private def mgPartitionSummaries(
      toks: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.Dataset[(String, Long)] = {
    import toks.sparkSession.implicits._
    toks.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap[String, Long]()
      var n = 0L
      it.foreach { tk =>
        n += 1
        if (m.contains(tk)) m(tk) += 1
        else if (m.size < k) m(tk) = 1
        else {
          // classic MG step: decrement every counter, shed zeros
          val dead = scala.collection.mutable.ArrayBuffer[String]()
          m.foreach { case (w, c) => if (c == 1) dead += w else m(w) = c - 1 }
          dead.foreach(m.remove)
        }
      }
      Iterator.single((null: String, n)) ++ m.keysIterator.map(w => (w, 0L))
    }
  }

  private[graft] def mgCandidates(
      toks: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame =
    mgPartitionSummaries(toks, k)
      .filter(_._1 != null)
      .map(_._1)(org.apache.spark.sql.Encoders.STRING)
      .toDF("tok").distinct()

  /** Collect the mine pass once: (distinct survivor union, exact total
    * token count). Bounded by (K+1)·P rows — the same envelope the
    * caller already assumes when it BROADCASTS the candidate set.
    */
  private[graft] def mgMine(
      toks: org.apache.spark.sql.DataFrame, k: Int): (Seq[String], Long) = {
    val rows = mgPartitionSummaries(toks, k).collect()
    (rows.iterator.collect { case (w, _) if w != null => w }
       .toSeq.distinct,
     rows.iterator.collect { case (null, n) => n }.sum)
  }
}
