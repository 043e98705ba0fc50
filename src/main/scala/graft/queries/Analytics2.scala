package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 second analytics pack — the classic warehouse reports the
  * suite had not yet declared (SURVEY.md §2.4 q166+): the order-count
  * distribution, bulk-order and sole-blame supplier reports, the
  * idle-capital anti-join × scalar-subquery combo, supplier-diversity
  * distinct-counting, Welch's t-test, promo revenue share, ship-latency
  * SLA buckets, and dimension-grain percent_rank/cume_dist — plus the
  * product-quantization ANN path (q172), the 4-byte-per-vector storage
  * twin of q71's int8 quantization.
  *
  * Same disciplines as the rest of the suite (see [[Q]]): exact
  * fixed-point integer aggregation (DECIMAL(38,0) where products can
  * cross 2⁶³ at corpus scale), doubles only in final single-step
  * derivations mirrored operation-for-operation in the oracle, every
  * query ending in a total order.
  */
object Analytics2 {
  import Q._

  /** PQ layout: the canonical [[graft.operators.IncrementalPq]]
    * constants (M=8 subspaces × 8 dims, 16 codewords — 1 bit/dim, 32×
    * smaller than float32). The layout, trainer, encoder, and drift
    * trigger all live in the operator module; q172 is the declared
    * QUERY VIEW over that maintained index.
    */
  private val PqM = graft.operators.IncrementalPq.M
  private val PqDsub = graft.operators.IncrementalPq.Dsub
  private val PqK = graft.operators.IncrementalPq.K

  /** Per-(session, dir) PQ codebooks: fit by
    * [[graft.operators.IncrementalPq.fitBooks]] on the deterministic
    * 1024-row sample. Stamp lives in the value (the [[StampedCache]]
    * rule) so a corpus rewrite refits instead of serving stale codes.
    * NOT persisted to the index store: the fit is deterministic from
    * the corpus (sample order, init, and tie-breaks are all pinned),
    * so a cold session reproduces bit-identical codebooks — the
    * durable artifact is the narrow CODES frame below, which is the
    * expensive full-corpus pass.
    */
  private val pqBookCache =
    new java.util.concurrent.ConcurrentHashMap[
      (org.apache.spark.sql.SparkSession, String),
      (Long, Array[Array[Array[Double]]])]()

  private val pqBookHooked = java.util.concurrent.ConcurrentHashMap
    .newKeySet[org.apache.spark.sql.SparkSession]()

  /** Codebooks for (session, dir): the fit (8 driver-side k-means
    * fits, each a Spark job) runs OUTSIDE the map lock — running it
    * inside `compute` held the bin lock for the jobs' duration and
    * stalled any concurrent session hashing to the same bin (r7
    * ADVICE; the build-outside-the-lock rule BloomPrune documents).
    * The fit is deterministic from the corpus, so a SAME-STAMP lost
    * race costs one redundant identical fit. The install is still
    * stamp-guarded, NOT a blind put: if the corpus dir was rewritten
    * mid-fit, a slow fitter's stale books must not overwrite a fresh
    * racer's entry (the blind put re-installed the OLD stamp, and
    * every later caller refit until the churn settled — r8 review
    * finding). Entries self-evict at application end (the
    * StampedCache listener rule — same ADVICE pass: a session
    * retired without Analytics2.clearCaches stayed pinned).
    */
  private def pqBooks(
      s: org.apache.spark.sql.SparkSession,
      d: String): Array[Array[Array[Double]]] = {
    if (pqBookHooked.add(s)) {
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler
                .SparkListenerApplicationEnd): Unit = {
            pqBookCache.forEach { (k, _) =>
              if (k._1 eq s) pqBookCache.remove(k) }
            pqBookHooked.remove(s)
            ()
          }
        })
    }
    val stamp = Q.dirStamp(d)
    val cur = pqBookCache.get((s, d))
    if (cur != null && cur._1 == stamp) cur._2
    else {
      val books = graft.operators.IncrementalPq.fitBooks(
        t(s, d, "embeddings"), "embedding", "vec_id")
      // install only while OUR stamp is still the dir's CURRENT stamp
      // (cheap re-walk); keep whatever a fresher racer installed
      pqBookCache.compute((s, d), (_, prev) =>
        if (stamp == Q.dirStamp(d)) (stamp, books)
        else if (prev != null) prev
        else null)
      books
    }
  }

  /** The encoded corpus: (vec_id, c0..c7) — 8 small ints per vector,
    * the 32×-compressed PQ index. Built in ONE map-side pass over the
    * embeddings ([[graft.operators.IncrementalPq.encode]] — codegen'd
    * assignment, no join, no shuffle) and persisted durable: at
    * 100 TB of vectors this narrow frame is what queries scan — the
    * raw vectors are only read again to (re)build it, to rerank
    * survivors, or to encode a delta
    * ([[graft.operators.IncrementalPq]] maintains it without a
    * corpus re-scan).
    */
  // the layout is part of the stored artifact's identity — an M/K
  // change must miss the durable store, not read codes of another shape
  private val pqCodesCache = new StampedCache(s"pq_codes_m${PqM}k$PqK")

  private def pqCodes(
      s: org.apache.spark.sql.SparkSession, d: String) =
    pqCodesCache.get(s, d) {
      graft.operators.IncrementalPq.encode(
        t(s, d, "embeddings"), pqBooks(s, d))
    }

  def clearCaches(s: org.apache.spark.sql.SparkSession): Unit = {
    pqCodesCache.clear(s)
    pqBookCache.forEach { (k, _) => if (k._1 eq s) pqBookCache.remove(k) }
  }

  val defs: Seq[QueryDef] = Seq(

    // ── q166: customer order-count distribution (TPC-H Q13 analog) —
    // how many customers placed exactly k orders, INCLUDING the
    // zero-order mass (the distribution every CRM/capacity report
    // starts from; the zero bucket is what a plain inner-join rollup
    // silently drops). Ref: the reference's grouped-count stage
    // (`Batch Processor.py:299-321`) turned on itself — a groupBy OF a
    // groupBy.
    //
    // Scale shape: orders pre-aggregate to the custkey grain FIRST
    // (map-side partials; the fact table's one exchange), the LEFT
    // join against customer then runs at dimension grain on both
    // sides, and the second aggregate's key space is |distinct order
    // counts| — a few dozen rows at any corpus size. Joining raw
    // orders to customers and counting after (the naive Q13 plan)
    // would carry every order row through the join for nothing.
    QueryDef(
      "q166_custdist",
      (s, d) => {
        val perCust = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).cast("long").as("n"))
        t(s, d, "customer").select(col("c_custkey"))
          .join(perCust, col("c_custkey") === col("o_custkey"), "left")
          .select(coalesce(col("n"), lit(0L)).as("c_orders"))
          .groupBy(col("c_orders"))
          .agg(count(lit(1)).cast("long").as("custdist"))
          .orderBy(col("custdist").desc, col("c_orders").desc)
      },
      Some("""WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
             |  FROM orders GROUP BY o_custkey)
             |SELECT c_orders, CAST(count(*) AS BIGINT) AS custdist
             |FROM (SELECT CAST(coalesce(n, 0) AS BIGINT) AS c_orders
             |  FROM customer LEFT JOIN oc ON c_custkey = o_custkey)
             |GROUP BY c_orders
             |ORDER BY custdist DESC, c_orders DESC""".stripMargin)),

    // ── q167: bulk orders (TPC-H Q18 analog) — orders whose total
    // line quantity clears 300 units, with their customer: the
    // HAVING-then-join-back shape (aggregate a fact table, keep the
    // tail, rejoin dimensions for the report).
    //
    // Scale shape: the quantity rollup is the only corpus-scale
    // exchange (map-side partials on l_orderkey); the HAVING cut runs
    // BEFORE any join, so the surviving frame is the ~0.3% tail and
    // both dimension joins (orders row, customer) probe with that tiny
    // side — under AQE they broadcast. Quantities are integral in the
    // fixture; round-cast to long makes the threshold exact on both
    // engines.
    QueryDef(
      "q167_bulk_orders",
      (s, d) => {
        val bulk = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(Q.fxUnits(col("l_quantity"), 1)).as("sum_qty"))
          .filter(col("sum_qty") >= 300)
        bulk
          .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            Q.day(col("o_orderdate")).as("o_date"),
            (Q.fxUnits(col("o_totalprice"), 100) / 100.0).as("o_total"),
            col("sum_qty"))
          .orderBy(col("sum_qty").desc, col("o_orderkey"))
      },
      Some("""WITH q AS (SELECT l_orderkey,
             |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
             |  FROM lineitem GROUP BY l_orderkey
             |  HAVING sum_qty >= 300)
             |SELECT c_name, c_custkey, o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
             |  CAST(round(o_totalprice*100) AS BIGINT)/100.0 AS o_total,
             |  sum_qty
             |FROM q
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY sum_qty DESC, o_orderkey""".stripMargin)),

    // ── q168: idle capital (TPC-H Q22 analog) — customers holding an
    // above-average positive balance who have placed NO order in the
    // last year of the corpus (since 2000-07-01), rolled up per
    // nation: the scalar-subquery × anti-join combo (q49 exercises the
    // scalar compare, q05 the anti-join; this is the composed report
    // both exist for).
    //
    // Exactness: "above average" never compares doubles — the 1-row
    // global (n_pos, sum_pos) frame broadcasts (q49/q127's scalar
    // shape, BNLJ-allowlisted) and the predicate cross-multiplies in
    // DECIMAL: bal_c·n_pos > sum_pos. Scale shape: the anti-join
    // probes with the date-pruned recent-orders slice (its build side
    // pre-projects to o_custkey only); the nation rollup is a 25-row
    // broadcast join.
    QueryDef(
      "q168_idle_capital",
      (s, d) => {
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            Q.fxUnits(col("c_acctbal"), 100).as("bal_c"))
        val g = cust.filter(col("bal_c") > 0)
          .agg(count(lit(1)).cast("long").as("n_pos"),
            sum(col("bal_c").cast("decimal(38,0)")).as("sum_pos"))
        val recent = t(s, d, "orders")
          .filter(col("o_orderdate") >= Q.ts("2000-07-01"))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(g))
          .filter(col("bal_c").cast("decimal(19,0)") *
            col("n_pos").cast("decimal(19,0)") >
            col("sum_pos").cast("decimal(38,0)"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).cast("long").as("n_cust"),
            (sum(col("bal_c")) / 100.0).as("tot_bal"))
          .orderBy(col("n_name"))
      },
      Some("""WITH c AS (SELECT c_custkey, c_nationkey,
             |    CAST(round(c_acctbal*100) AS BIGINT) AS bal_c FROM customer),
             |g AS (SELECT CAST(count(*) AS BIGINT) AS n_pos,
             |    sum(CAST(bal_c AS HUGEINT)) AS sum_pos
             |  FROM c WHERE bal_c > 0),
             |idle AS (SELECT c_custkey, c_nationkey, bal_c FROM c, g
             |  WHERE CAST(bal_c AS HUGEINT) * n_pos > sum_pos
             |    AND c_custkey NOT IN (SELECT o_custkey FROM orders
             |      WHERE o_orderdate >= TIMESTAMP '2000-07-01'))
             |SELECT n_name, CAST(count(*) AS BIGINT) AS n_cust,
             |  CAST(sum(bal_c) AS BIGINT)/100.0 AS tot_bal
             |FROM idle JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name
             |ORDER BY n_name""".stripMargin)),

    // ── q169: supplier diversity (TPC-H Q16 analog) — how many
    // DISTINCT suppliers can source each (brand, size band), excluding
    // suppliers in bad standing (negative balance): the
    // count-distinct-after-anti-join shape every sourcing/risk report
    // runs.
    //
    // Scale shape: the fact table first collapses to its DISTINCT
    // (partkey, suppkey) pairs — the supply graph's edge set, 10⁴×
    // smaller than the line-item corpus and the only corpus-scale
    // exchange; the part dimension broadcasts; the bad-supplier
    // exclusion is a broadcast anti-join against a frame that
    // pre-filters to the handful of flagged keys. The final
    // count-distinct groups |brands|×|bands| cells of an
    // already-deduplicated edge set.
    QueryDef(
      "q169_supplier_diversity",
      (s, d) => {
        val edges = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val bad = t(s, d, "supplier")
          .filter(Q.fxUnits(col("s_acctbal"), 100) < 0)
          .select(col("s_suppkey"))
        edges
          .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(t(s, d, "part")
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            (expr("(p_size - 1) div 10").cast("int") + 1).as("size_band"),
            col("l_suppkey"))
          .groupBy(col("p_brand"), col("size_band"))
          .agg(countDistinct(col("l_suppkey")).cast("long").as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("size_band"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             |ok AS (SELECT l_partkey, l_suppkey FROM ps
             |  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |    WHERE CAST(round(s_acctbal*100) AS BIGINT) < 0))
             |SELECT p_brand,
             |  CAST((p_size - 1)//10 AS INT) + 1 AS size_band,
             |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM ok JOIN part ON l_partkey = p_partkey
             |GROUP BY p_brand, size_band
             |ORDER BY supplier_cnt DESC, p_brand, size_band""".stripMargin)),

    // ── q170: sole-blame late suppliers (TPC-H Q21 analog) — on
    // multi-supplier orders where EXACTLY ONE supplier shipped late
    // (>60 days after the order date), blame that supplier; report the
    // top-20 most-blamed. The classic correlated exists/not-exists is
    // re-expressed as two grain-collapsing aggregates — the form that
    // actually scales, because each EXISTS becomes a per-order count
    // instead of a per-row subquery probe.
    //
    // Scale shape: orders (projected to key+date) joins line items on
    // the fact key — ONE corpus exchange — then collapses to the
    // (order, supplier) grain with the late flag as max(), then to the
    // order grain for the supplier/late-supplier counts; the blame
    // join reuses the (order, supplier) frame at its tiny filtered
    // grain. Top-20 plans as TakeOrdered; the supplier name join
    // probes with 20 rows.
    QueryDef(
      "q170_sole_blame",
      (s, d) => {
        val osl = t(s, d, "lineitem")
          .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(when(datediff(col("l_shipdate"), col("o_orderdate")) > 60, 1)
            .otherwise(0)).as("sup_late"))
        // STRAIGHT-LINE blame attribution (r14): the former shape
        // consumed osl twice (per-order counts, then a join-back of
        // the late rows) — Catalyst clones shared subtrees per
        // consumer and the diverged column pruning killed exchange
        // reuse, so the lineitem⨝orders tower and its (order,
        // supplier) aggregate EXECUTED twice (PlanDump ranScans:
        // lineitem×2, orders×2). On an order with n_late = 1 the
        // blamed supplier IS max(when(sup_late = 1, suppkey)) — the
        // only late one — so one more grain collapse to the order
        // grain carries everything and the self-join disappears: one
        // scan of each table, two corpus-grain exchanges total.
        // Output unchanged (oracle hash-green).
        osl.groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_supp"), sum(col("sup_late")).as("n_late"),
            max(when(col("sup_late") === 1, col("l_suppkey")))
              .as("l_suppkey"))
          .filter(col("n_supp") >= 2 && col("n_late") === 1)
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).cast("long").as("n_blamed"))
          .join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("n_blamed"))
          .orderBy(col("n_blamed").desc, col("s_name"))
          .limit(20)
      },
      Some("""WITH osl AS (SELECT l_orderkey, l_suppkey,
             |    max(CASE WHEN datediff('day', o_orderdate, l_shipdate) > 60
             |      THEN 1 ELSE 0 END) AS sup_late
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  GROUP BY l_orderkey, l_suppkey),
             |po AS (SELECT l_orderkey FROM osl GROUP BY l_orderkey
             |  HAVING count(*) >= 2 AND sum(sup_late) = 1),
             |blame AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_blamed
             |  FROM osl JOIN po USING (l_orderkey)
             |  WHERE sup_late = 1
             |  GROUP BY l_suppkey)
             |SELECT s_name, n_blamed
             |FROM blame JOIN supplier ON l_suppkey = s_suppkey
             |ORDER BY n_blamed DESC, s_name
             |LIMIT 20""".stripMargin)),

    // ── q171: Welch's t-test — does weekend daily event value differ
    // from weekday? The unequal-variance two-sample test every
    // experimentation readout runs next to q147's chi-square
    // (categorical) test. Sample unit is the DAY (daily totals are the
    // i.i.d.-ish unit; per-event rows are autocorrelated within a
    // day), so the corpus first collapses to |days| exact cent totals.
    //
    // Exactness: group moments (n, Σx, Σx²) accumulate as
    // DECIMAL(38,0) from exact cent units ([[Q.decMoments]]
    // discipline — a 100 TB day's Σx² crosses 2⁶³); mean, Welch
    // variance v = (n·Σx² − (Σx)²)/(n·(n−1)), the t statistic, and
    // the Welch–Satterthwaite dof are single-chain double derivations
    // mirrored operation-for-operation in the oracle, rounded 6.
    // Scale shape: one corpus scan → map-side partials to |days| →
    // ONE 1-row conditional-moment aggregate (no pivot, no second
    // shuffle). Output: one row.
    QueryDef(
      "q171_welch_ttest",
      (s, d) => {
        val daily = t(s, d, "events")
          .select(Q.day(col("ts")).as("day"),
            Q.fxUnits(col("value"), 100).as("v_c"))
          .groupBy(col("day"))
          .agg(sum(col("v_c").cast("decimal(38,0)")).as("dv"))
          .select(col("dv").cast("decimal(19,0)").as("x"),
            (weekday(col("day").cast("date")) >= 5).as("wk"))
        val z = lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
        def mo(flag: Boolean) = {
          val p = if (flag) col("wk") else !col("wk")
          val sfx = if (flag) "we" else "wd"
          Seq(
            sum(when(p, 1L).otherwise(0L)).cast("long").as(s"n_$sfx"),
            sum(when(p, col("x").cast("decimal(38,0)")).otherwise(z))
              .as(s"sv_$sfx"),
            sum(when(p, (col("x") * col("x")).cast("decimal(38,0)"))
              .otherwise(z)).as(s"ssq_$sfx"))
        }
        val m = daily.agg((mo(true) ++ mo(false)).head,
          (mo(true) ++ mo(false)).tail: _*)
        def dbl(c: String) = col(c).cast("double")
        val m1 = dbl("sv_we") / dbl("n_we")
        val m2 = dbl("sv_wd") / dbl("n_wd")
        val v1 = (dbl("n_we") * dbl("ssq_we") - dbl("sv_we") * dbl("sv_we")) /
          (dbl("n_we") * (dbl("n_we") - 1.0))
        val v2 = (dbl("n_wd") * dbl("ssq_wd") - dbl("sv_wd") * dbl("sv_wd")) /
          (dbl("n_wd") * (dbl("n_wd") - 1.0))
        val se1 = v1 / dbl("n_we")
        val se2 = v2 / dbl("n_wd")
        m.select(
          col("n_we"), col("n_wd"),
          round(m1 / 100.0, 6).as("mean_we"),
          round(m2 / 100.0, 6).as("mean_wd"),
          round((m1 - m2) / sqrt(se1 + se2), 6).as("t_stat"),
          round((se1 + se2) * (se1 + se2) /
            (se1 * se1 / (dbl("n_we") - 1.0) +
              se2 * se2 / (dbl("n_wd") - 1.0)), 6).as("dof"))
          .orderBy(col("n_we"))
      },
      Some("""WITH daily AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |    sum(CAST(round(value*100) AS BIGINT)) AS dv
             |  FROM events GROUP BY day),
             |f AS (SELECT CAST(dv AS HUGEINT) AS x,
             |    isodow(CAST(day AS DATE)) >= 6 AS wk FROM daily),
             |m AS (SELECT
             |    CAST(sum(CASE WHEN wk THEN 1 ELSE 0 END) AS BIGINT) AS n_we,
             |    sum(CASE WHEN wk THEN x ELSE 0 END) AS sv_we,
             |    sum(CASE WHEN wk THEN x*x ELSE 0 END) AS ssq_we,
             |    CAST(sum(CASE WHEN wk THEN 0 ELSE 1 END) AS BIGINT) AS n_wd,
             |    sum(CASE WHEN wk THEN 0 ELSE x END) AS sv_wd,
             |    sum(CASE WHEN wk THEN 0 ELSE x*x END) AS ssq_wd
             |  FROM f),
             |t AS (SELECT n_we, n_wd,
             |    CAST(sv_we AS DOUBLE)/CAST(n_we AS DOUBLE) AS m1,
             |    CAST(sv_wd AS DOUBLE)/CAST(n_wd AS DOUBLE) AS m2,
             |    (CAST(n_we AS DOUBLE)*CAST(ssq_we AS DOUBLE)
             |      - CAST(sv_we AS DOUBLE)*CAST(sv_we AS DOUBLE))
             |      /(CAST(n_we AS DOUBLE)*(CAST(n_we AS DOUBLE)-1.0))
             |      /CAST(n_we AS DOUBLE) AS se1,
             |    (CAST(n_wd AS DOUBLE)*CAST(ssq_wd AS DOUBLE)
             |      - CAST(sv_wd AS DOUBLE)*CAST(sv_wd AS DOUBLE))
             |      /(CAST(n_wd AS DOUBLE)*(CAST(n_wd AS DOUBLE)-1.0))
             |      /CAST(n_wd AS DOUBLE) AS se2
             |  FROM m)
             |SELECT n_we, n_wd,
             |  round(m1/100.0, 6) AS mean_we,
             |  round(m2/100.0, 6) AS mean_wd,
             |  round((m1 - m2)/sqrt(se1 + se2), 6) AS t_stat,
             |  round((se1 + se2)*(se1 + se2)
             |    /(se1*se1/(CAST(n_we AS DOUBLE)-1.0)
             |      + se2*se2/(CAST(n_wd AS DOUBLE)-1.0)), 6) AS dof
             |FROM t ORDER BY n_we""".stripMargin)),

    // ── q172: product-quantization ANN — top-5 cosine neighbors of
    // vec 0 through the IVFPQ-refine pipeline: ADC candidate scoring
    // over 8-byte PQ codes (M=8 subspaces × 16 Euclidean codewords;
    // 32× smaller than float32 at rest), then an EXACT rerank of the
    // bounded top-64 candidate slice. The fourth ANN path, orthogonal
    // to q29 (LSH pruning), q40 (IVF pruning), and q71 (int8: 4×
    // storage, near-exact scoring): PQ is the aggressive-storage path
    // whose per-code reconstruction error is too coarse to FINAL-rank
    // a corpus where the rank-5/rank-50 cosine gap is ~0.005 (this
    // fixture — measured), so production PQ always rides with a
    // refine stage; this query declares that honest composition.
    //
    // Plan shape: the query's per-subspace dot/norm² LUTs are computed
    // DRIVER-SIDE from the codebooks (16×8 doubles) and inlined as
    // literal arrays, so the candidate job is scan(codes) →
    // project(8 element_at + arithmetic, whole-stage codegen) →
    // TakeOrdered(64) — zero joins, zero exchanges, float vectors
    // never read. The surviving 64 ids collect (bounded by the LIMIT)
    // and the rerank plan is scan(embeddings, PushedFilters
    // In(vec_id, …)) → exact cosine vs the literal query vector →
    // TakeOrdered(5) — the In pushdown is the parquet point-lookup
    // shape that makes the refine O(R) row-group reads on a
    // key-sorted layout, not a corpus scan. Approximate (the true
    // top-5 must surface in the ADC top-64) → no oracle; QueriesSpec
    // gates recall vs exact q23 and pins both plan halves.
    QueryDef(
      "q172_ann_pq",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        val books = pqBooks(s, d)
        // 1-row bounded probe: vec 0's full embedding (the q23 probe)
        val qv = t(s, d, "embeddings").filter(col("vec_id") === 0)
          .select(col("embedding").cast("array<double>")).collect()
        require(qv.nonEmpty, "probe vector vec_id=0 missing")
        val q = qv.head.getSeq[Double](0).toArray
        val qNorm = math.sqrt(q.map(x => x * x).sum)
        def sub(m: Int): Array[Double] =
          q.slice(m * PqDsub, math.min((m + 1) * PqDsub, q.length))
        // LUT size follows the BOOK's length, not the nominal K:
        // fitEuclidean returns fewer codewords when the training
        // sample is small (sample.length <= k short-circuits), and a
        // fixed-K tabulate would index past the short book
        val ipLut = Array.tabulate(PqM)(m => books(m).map { c =>
          val v = sub(m)
          var t0 = 0.0; var i = 0
          val n = math.min(c.length, v.length)
          while (i < n) { t0 += c(i) * v(i); i += 1 }
          t0
        })
        val n2Lut = Array.tabulate(PqM)(m =>
          books(m).map(_.map(x => x * x).sum))
        def look(lut: Array[Array[Double]], m: Int) =
          element_at(array(lut(m).map(lit): _*), col(s"c$m") + 1)
        val ip = (0 until PqM).map(look(ipLut, _)).reduce(_ + _)
        val n2 = (0 until PqM).map(look(n2Lut, _)).reduce(_ + _)
        // stage 1 (ADC): codes-only candidate mining; the collect is
        // bounded by the LIMIT — ≤64 ids cross the driver
        val cand = pqCodes(s, d)
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"),
            (ip / (lit(qNorm) * sqrt(n2))).as("cos_pq"))
          .orderBy(col("cos_pq").desc, col("vec_id"))
          .limit(64)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSeq
        // stage 2 (refine): exact cosine on the In-pruned candidate
        // slice vs the literal query vector — same arithmetic as q23
        // (float elements widen to double identically), so the gate
        // compares like with like
        t(s, d, "embeddings")
          .filter(col("vec_id").isin(cand: _*))
          .select(col("vec_id"),
            round(graft.functions.GraftFunctions.cosineSim(
              col("embedding"), typedLit(q.toSeq)), 6).as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(5)
      },
      None),

    // ── q173: promo revenue share (TPC-H Q14 analog) — per ship
    // month, the percentage of discounted revenue coming from PROMO
    // parts: the conditional-aggregate ratio report (one scan, no
    // self-join — the CASE-inside-sum form Q14 exists to teach).
    //
    // Scale shape: part (projected to key+type) broadcasts into the
    // line-item scan; ONE hash aggregate to the |months| grain
    // computes both the conditional and total revenue as exact
    // DECIMAL(38,0) micro-units; the share is a single rounded double
    // division per month row.
    QueryDef(
      "q173_promo_share",
      (s, d) => {
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part")
            .select(col("p_partkey"), col("p_type"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(date_format(date_trunc("month", col("l_shipdate")),
            "yyyy-MM").as("ship_month"))
          .agg(
            sum(when(col("p_type") === "PROMO", revMicro)
              .otherwise(lit(java.math.BigDecimal.ZERO)
                .cast("decimal(38,0)"))).as("promo_micro"),
            sum(revMicro).as("tot_micro"))
          .select(col("ship_month"),
            round(lit(100.0) * col("promo_micro").cast("double") /
              col("tot_micro").cast("double"), 6).as("promo_share"),
            (col("tot_micro").cast("double") / 10000.0).as("total_rev"))
          .orderBy(col("ship_month"))
      },
      Some("""WITH l AS (SELECT strftime(date_trunc('month', l_shipdate),
             |      '%Y-%m') AS ship_month,
             |    CAST(round(l_extendedprice*100) AS HUGEINT) *
             |      (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev,
             |    p_type
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |m AS (SELECT ship_month,
             |    sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS promo,
             |    sum(rev) AS tot
             |  FROM l GROUP BY ship_month)
             |SELECT ship_month,
             |  round(100.0*CAST(promo AS DOUBLE)/CAST(tot AS DOUBLE), 6)
             |    AS promo_share,
             |  CAST(tot AS DOUBLE)/10000.0 AS total_rev
             |FROM m ORDER BY ship_month""".stripMargin)),

    // ── q174: ship-latency SLA buckets (TPC-H Q12 analog) — per order
    // priority: how many line shipments ran EARLY (shipped before the
    // order date — a data-quality signal this synthetic fixture is
    // full of), within the one-year SLA, or LATE past it, plus the
    // late share and the exact mean delay. The operational SLA report
    // next to q126 (event-funnel latency) for the order fulfilment
    // domain.
    //
    // Exactness: delays are exact integer day diffs; the mean delay is
    // one rounded double division of DECIMAL sums (a 100 TB Σdelay
    // crosses 2⁶³ at ~10¹⁶ line-days); bucket counts are exact longs.
    // Scale shape: orders (key+date+priority) joins the fact scan on
    // the order key — the one corpus exchange — and the aggregate
    // lands on the |priorities|-row grain with map-side partials.
    QueryDef(
      "q174_ship_latency_sla",
      (s, d) => {
        val delay = datediff(col("l_shipdate"), col("o_orderdate"))
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderdate"),
              col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(delay < 0, 1L).otherwise(0L)).cast("long").as("n_early"),
            sum(when(delay >= 0 && delay <= 365, 1L).otherwise(0L))
              .cast("long").as("n_in_sla"),
            sum(when(delay > 365, 1L).otherwise(0L)).cast("long").as("n_late"),
            count(lit(1)).cast("long").as("n_lines"),
            sum(delay.cast("decimal(38,0)")).as("sum_delay"))
          .select(col("o_orderpriority"), col("n_early"), col("n_in_sla"),
            col("n_late"),
            round(col("n_late").cast("double") /
              col("n_lines").cast("double"), 6).as("late_share"),
            round(col("sum_delay").cast("double") /
              col("n_lines").cast("double"), 6).as("avg_delay_days"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH l AS (SELECT o_orderpriority,
             |    datediff('day', o_orderdate, l_shipdate) AS delay
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |m AS (SELECT o_orderpriority,
             |    CAST(sum(CASE WHEN delay < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_early,
             |    CAST(sum(CASE WHEN delay >= 0 AND delay <= 365 THEN 1
             |      ELSE 0 END) AS BIGINT) AS n_in_sla,
             |    CAST(sum(CASE WHEN delay > 365 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n_late,
             |    CAST(count(*) AS BIGINT) AS n_lines,
             |    sum(CAST(delay AS HUGEINT)) AS sum_delay
             |  FROM l GROUP BY o_orderpriority)
             |SELECT o_orderpriority, n_early, n_in_sla, n_late,
             |  round(CAST(n_late AS DOUBLE)/CAST(n_lines AS DOUBLE), 6)
             |    AS late_share,
             |  round(CAST(sum_delay AS DOUBLE)/CAST(n_lines AS DOUBLE), 6)
             |    AS avg_delay_days
             |FROM m ORDER BY o_orderpriority""".stripMargin)),

    // ── q175: balance rank profile — percent_rank and cume_dist of
    // each supplier's balance within its nation: the two normalized
    // rank functions the window family had not yet exercised (q50
    // covers ntile, q11/q46 row_number/rank). Ranks order by EXACT
    // cent units so ties — and therefore both statistics, which are
    // pure integer-ratio functions of the tie structure — are
    // identical across engines; the doubles round 6.
    //
    // Scale note: supplier is a bounded dimension (the per-nation
    // window frame is |suppliers|/|nations|); a fact-scale variant of
    // this report would use q50's two-pass range-partitioned ranking,
    // never a single unpartitioned window.
    QueryDef(
      "q175_balance_rank",
      (s, d) => {
        val w = Window.partitionBy(col("s_nationkey"))
          .orderBy(col("bal_c").desc)
        t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
            Q.fxUnits(col("s_acctbal"), 100).as("bal_c"))
          .withColumn("pct_rank", round(percent_rank().over(w), 6))
          .withColumn("cume", round(cume_dist().over(w), 6))
          .select(col("s_nationkey").cast("int").as("nation_key"),
            col("s_name"), (col("bal_c") / 100.0).as("bal"),
            col("pct_rank"), col("cume"))
          .orderBy(col("nation_key"), col("pct_rank"), col("s_name"))
      },
      Some("""SELECT CAST(s_nationkey AS INT) AS nation_key, s_name,
             |  CAST(bal_c AS BIGINT)/100.0 AS bal,
             |  round(percent_rank() OVER
             |    (PARTITION BY s_nationkey ORDER BY bal_c DESC), 6)
             |    AS pct_rank,
             |  round(cume_dist() OVER
             |    (PARTITION BY s_nationkey ORDER BY bal_c DESC), 6) AS cume
             |FROM (SELECT s_suppkey, s_name, s_nationkey,
             |    CAST(round(s_acctbal*100) AS BIGINT) AS bal_c FROM supplier)
             |ORDER BY nation_key, pct_rank, s_name""".stripMargin))
  )

  // Exact discounted revenue: ONE definition in [[Q.revMicro]] /
  // [[Q.revMicroSql]] (shared with q146's star rollup).
  private def revMicro = Q.revMicro
  private val revMicroSql = Q.revMicroSql

  /** TPC-H completion pack (q176–q181): the remaining canonical
    * shapes — correlated per-group scalar filters (Q17), market share
    * (Q8), argmax-by-scalar-max (Q15), multi-dim profit (Q9),
    * nested-aggregate dominance (Q20), and multi-OR bracket predicates
    * (Q19) — each adapted to the fixture's columns and re-derived for
    * exactness and scale.
    */
  val defs2: Seq[QueryDef] = Seq(

    // ── q176: small-quantity revenue (TPC-H Q17 analog) — revenue
    // carried by line items whose quantity is below HALF their part's
    // average: the correlated per-group scalar filter (each row
    // compared against its own group's aggregate — the shape DISTINCT
    // from q49's single global scalar).
    //
    // Exactness: the comparison qty < 0.5·(Σqty/n) never divides —
    // it cross-multiplies in integers: 2·qty·n < Σqty. Scale shape:
    // the fact table aggregates to the |parts| grain (map-side
    // partials), then rejoins itself ON THE SAME KEY — at bench scale
    // AQE broadcasts the narrow per-part frame; at 100 TB both sides
    // hash-partition on l_partkey and the join is co-located with the
    // aggregate's own exchange. One output row.
    QueryDef(
      "q176_small_qty_revenue",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val perPart = li.groupBy(col("l_partkey").as("pk"))
          .agg(count(lit(1)).cast("long").as("n_pl"),
            sum(Q.fxUnits(col("l_quantity"), 1)).as("sum_q"))
        li.join(perPart, col("l_partkey") === col("pk"))
          .filter(Q.fxUnits(col("l_quantity"), 1) * 2 * col("n_pl") <
            col("sum_q"))
          .agg(count(lit(1)).cast("long").as("n_small"),
            (sum(Q.fxUnits(col("l_extendedprice"), 100)) / 100.0)
              .as("small_rev"))
          .orderBy(col("n_small"))
      },
      Some("""WITH pa AS (SELECT l_partkey AS pk,
             |    CAST(count(*) AS BIGINT) AS n_pl,
             |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_q
             |  FROM lineitem GROUP BY pk)
             |SELECT CAST(count(*) AS BIGINT) AS n_small,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
             |    /100.0 AS small_rev
             |FROM lineitem JOIN pa ON l_partkey = pk
             |WHERE CAST(round(l_quantity) AS BIGINT) * 2 * n_pl < sum_q
             |ORDER BY n_small""".stripMargin)),

    // ── q177: market share (TPC-H Q8 analog) — per order year, the
    // share of revenue to ASIA-region customers that NATION_0's
    // suppliers delivered: the conditional-ratio-over-a-star report
    // (q146's join tree + q173's CASE-inside-sum, composed).
    //
    // Scale shape: exactly q146's — the 25-row region⋈nation frame
    // broadcasts into customer, fact joins key on custkey/orderkey/
    // suppkey, supplier's nationkey rides to the conditional. Both
    // the conditional and total revenue accumulate DECIMAL(38,0)
    // micro-units in ONE |years|-grain aggregate; one rounded double
    // division per year row.
    QueryDef(
      "q177_market_share",
      (s, d) => {
        val asiaCust = t(s, d, "customer")
          .join(broadcast(t(s, d, "region")
            .filter(col("r_name") === "ASIA")
            .join(t(s, d, "nation"),
              col("r_regionkey") === col("n_regionkey"))
            .select(col("n_nationkey"))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"))
        val z = lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)")
        // prune orders to the ASIA-customer slice BEFORE the fact
        // join (q146's rule): the custkey exchange runs at the orders
        // grain, and the line-item corpus joins once, on the orderkey
        val ord = t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
          .join(asiaCust, col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("o_orderdate"))
        t(s, d, "lineitem")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(date_format(col("o_orderdate"), "yyyy").as("o_year"))
          .agg(
            sum(when(col("s_nationkey") === 0, revMicro).otherwise(z))
              .as("nat_micro"),
            sum(revMicro).as("tot_micro"))
          .select(col("o_year"),
            round(col("nat_micro").cast("double") /
              col("tot_micro").cast("double"), 6).as("mkt_share"),
            (col("tot_micro").cast("double") / 10000.0).as("asia_rev"))
          .orderBy(col("o_year"))
      },
      Some(s"""WITH ac AS (SELECT c_custkey FROM customer
              |  JOIN nation ON c_nationkey = n_nationkey
              |  JOIN region ON n_regionkey = r_regionkey
              |  WHERE r_name = 'ASIA'),
              |l AS (SELECT strftime(o_orderdate, '%Y') AS o_year,
              |    $revMicroSql AS rev,
              |    s_nationkey
              |  FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN ac ON o_custkey = c_custkey
              |  JOIN supplier ON l_suppkey = s_suppkey),
              |m AS (SELECT o_year,
              |    sum(CASE WHEN s_nationkey = 0 THEN rev ELSE 0 END) AS nat,
              |    sum(rev) AS tot
              |  FROM l GROUP BY o_year)
              |SELECT o_year,
              |  round(CAST(nat AS DOUBLE)/CAST(tot AS DOUBLE), 6) AS mkt_share,
              |  CAST(tot AS DOUBLE)/10000.0 AS asia_rev
              |FROM m ORDER BY o_year""".stripMargin)),

    // ── q178: top revenue supplier (TPC-H Q15 analog) — the
    // supplier(s) whose 1997Q1 discounted revenue equals the MAXIMUM
    // over all suppliers: argmax-by-scalar-max, kept as an exact-
    // integer equality join so ties surface (Q15's VIEW + max
    // subquery, without the view).
    //
    // Exactness: revenue compares in exact micro-units — a double
    // revenue equality would be engine-noise-dependent, the integer
    // one cannot be. Scale shape: the corpus date-prunes at the scan,
    // aggregates to the |suppliers| grain map-side, and the 1-row max
    // frame broadcasts back over that bounded frame (q49's scalar
    // shape — BNLJ-allowlisted); the name join probes with the tied
    // winners only.
    QueryDef(
      "q178_top_supplier",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= Q.ts("1997-01-01") &&
            col("l_shipdate") < Q.ts("1997-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(sum(revMicro).as("rev_micro"))
        val mx = rev.agg(max(col("rev_micro")).as("max_micro"))
        rev.crossJoin(broadcast(mx))
          .filter(col("rev_micro") === col("max_micro"))
          .join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"),
            (col("rev_micro").cast("double") / 10000.0).as("total_rev"))
          .orderBy(col("s_name"))
      },
      Some(s"""WITH r AS (SELECT l_suppkey, sum($revMicroSql) AS rev
              |  FROM lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              |    AND l_shipdate <  TIMESTAMP '1997-04-01'
              |  GROUP BY l_suppkey)
              |SELECT s_name, CAST(rev AS DOUBLE)/10000.0 AS total_rev
              |FROM r JOIN supplier ON l_suppkey = s_suppkey
              |WHERE rev = (SELECT max(rev) FROM r)
              |ORDER BY s_name""".stripMargin)),

    // ── q179: national profit (TPC-H Q9 analog) — per supplier
    // nation × order year: discounted revenue minus a retail-cost
    // proxy (p_retailprice × quantity — the fixture carries no
    // partsupp cost table), the multi-dimension profit rollup.
    //
    // Exactness: both sides of the subtraction are micro-dollar
    // DECIMAL(38,0) integers (revenue = cents×pct; cost =
    // retail-cents × qty × 100), so profit is an exact integer until
    // the final /10⁴ display division. Scale shape: part and supplier
    // broadcast into the fact scan; the orders join (for the year) is
    // the one corpus exchange; the aggregate lands on the
    // |nations|×|years| grain with map-side partials.
    QueryDef(
      "q179_national_profit",
      (s, d) => {
        val costMicro = (Q.fxUnits(col("p_retailprice"), 100)
          .cast("decimal(19,0)") *
          (Q.fxUnits(col("l_quantity"), 1) * 100L).cast("decimal(19,0)"))
          .cast("decimal(38,0)")
        t(s, d, "lineitem")
          .join(broadcast(t(s, d, "part")
            .select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"),
            date_format(col("o_orderdate"), "yyyy").as("o_year"))
          .agg(sum(revMicro - costMicro).as("profit_micro"))
          .select(col("n_name"), col("o_year"),
            (col("profit_micro").cast("double") / 10000.0).as("profit"))
          .orderBy(col("n_name"), col("o_year"))
      },
      Some(s"""WITH l AS (SELECT n_name,
              |    strftime(o_orderdate, '%Y') AS o_year,
              |    $revMicroSql
              |      - CAST(round(p_retailprice*100) AS HUGEINT) *
              |        (CAST(round(l_quantity) AS BIGINT) * 100) AS profit
              |  FROM lineitem
              |  JOIN part ON l_partkey = p_partkey
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN nation ON s_nationkey = n_nationkey)
              |SELECT n_name, o_year,
              |  CAST(sum(profit) AS DOUBLE)/10000.0 AS profit
              |FROM l GROUP BY n_name, o_year
              |ORDER BY n_name, o_year""".stripMargin)),

    // ── q180: dominant suppliers (TPC-H Q20 analog) — suppliers who
    // shipped MORE THAN HALF of a part's total 1997 volume, ranked by
    // how many parts they dominate: the nested-aggregate dominance
    // report (per-(part,supplier) volume vs per-part volume — the
    // inner grain ROLLS UP to the outer, so the corpus is scanned
    // once, not twice).
    //
    // Exactness: the >50% cut cross-multiplies exact quantity units
    // (2·sq > tot — no share division). Scale shape: one date-pruned
    // scan → (part, supplier) aggregate (the corpus exchange); the
    // per-part total derives from THAT frame by a second map-side
    // rollup; the dominance join keys on l_partkey at the already-
    // collapsed grain (AQE broadcasts the |parts| totals at bench
    // scale). Top-20 TakeOrdered; name join probes 20 rows.
    QueryDef(
      "q180_dominant_supplier",
      (s, d) => {
        val sv = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= Q.ts("1997-01-01") &&
            col("l_shipdate") < Q.ts("1998-01-01"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(Q.fxUnits(col("l_quantity"), 1)).as("sq"))
        val pv = sv.groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("sq")).as("tot"))
        sv.join(pv, col("l_partkey") === col("pk"))
          .filter(col("sq") * 2 > col("tot"))
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).cast("long").as("n_dominated"))
          .join(broadcast(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .select(col("s_name"), col("n_dominated"))
          .orderBy(col("n_dominated").desc, col("s_name"))
          .limit(20)
      },
      Some("""WITH sv AS (SELECT l_partkey, l_suppkey,
             |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sq
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |    AND l_shipdate <  TIMESTAMP '1998-01-01'
             |  GROUP BY l_partkey, l_suppkey),
             |pv AS (SELECT l_partkey AS pk, CAST(sum(sq) AS BIGINT) AS tot
             |  FROM sv GROUP BY pk)
             |SELECT s_name, CAST(count(*) AS BIGINT) AS n_dominated
             |FROM sv JOIN pv ON l_partkey = pk
             |JOIN supplier ON l_suppkey = s_suppkey
             |WHERE sq * 2 > tot
             |GROUP BY s_name
             |ORDER BY n_dominated DESC, s_name
             |LIMIT 20""".stripMargin)),

    // ── q181: bracketed revenue (TPC-H Q19 analog) — revenue from
    // lines matching ANY of three (brand, size band, quantity band)
    // bracket triples: the multi-OR composite predicate Q19 exists to
    // stress. The interesting plan property: the OR's shared QUANTITY
    // ENVELOPE (1 ≤ qty ≤ 30 across all three brackets) pushes to the
    // fact scan as a bracketing range filter — the scan drops the
    // out-of-envelope majority before the join — while the full
    // per-bracket triple evaluates post-join in one codegen stage.
    // QueriesSpec pins the pushed envelope.
    QueryDef(
      "q181_bracket_revenue",
      (s, d) => {
        val qty = Q.fxUnits(col("l_quantity"), 1)
        val bracket =
          (col("p_brand") === "BRAND_3" && col("p_size").between(1, 10) &&
            qty.between(1, 11)) ||
          (col("p_brand") === "BRAND_7" && col("p_size").between(1, 20) &&
            qty.between(10, 20)) ||
          (col("p_brand") === "BRAND_12" && col("p_size").between(1, 30) &&
            qty.between(20, 30))
        // the envelope is a strict SUPERSET of the brackets' rounded
        // quantity ranges ([0.5, 30.5) rounds into [1, 30]) phrased on
        // the RAW column so it pushes into the parquet scan — a
        // round() wrapper would block the pushdown
        t(s, d, "lineitem")
          .filter(col("l_quantity") >= 0.5 && col("l_quantity") < 30.5)
          .join(broadcast(t(s, d, "part")
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
            col("l_partkey") === col("p_partkey"))
          .filter(bracket)
          .agg(count(lit(1)).cast("long").as("n_lines"),
            (sum(revMicro).cast("double") / 10000.0).as("revenue"))
          .orderBy(col("n_lines"))
      },
      Some(s"""SELECT CAST(count(*) AS BIGINT) AS n_lines,
              |  CAST(sum($revMicroSql) AS DOUBLE)/10000.0 AS revenue
              |FROM lineitem JOIN part ON l_partkey = p_partkey
              |WHERE (p_brand = 'BRAND_3' AND p_size BETWEEN 1 AND 10
              |    AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
              |  OR (p_brand = 'BRAND_7' AND p_size BETWEEN 1 AND 20
              |    AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
              |  OR (p_brand = 'BRAND_12' AND p_size BETWEEN 1 AND 30
              |    AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)
              |ORDER BY n_lines""".stripMargin))
  )

  /** The q182/q183 rule set over order lines joined to their order —
    * ONE definition feeding both the audit counts and the exemplar
    * report, so the two faces cannot drift. Bound predicates phrase
    * through exact fixed-point units ([[Q]] discipline); NULL holds
    * (the orphan join miss) counts as a violation per the
    * [[graft.operators.QualityRules.Rule]] convention.
    */
  private def dqRules: Seq[graft.operators.QualityRules.Rule] = {
    import graft.operators.QualityRules.Rule
    Seq(
      Rule("discount_bounded",
        Q.fxUnits(col("l_discount"), 100).between(0, 10)),
      Rule("flag_known", col("l_returnflag").isin("A", "N", "R")),
      Rule("has_order", col("o_orderkey").isNotNull),
      Rule("price_positive", Q.fxUnits(col("l_extendedprice"), 100) > 0),
      Rule("qty_in_range", Q.fxUnits(col("l_quantity"), 1).between(1, 50)),
      Rule("ship_after_order", col("l_shipdate") >= col("o_orderdate")))
  }

  private def dqFrame(
      s: org.apache.spark.sql.SparkSession, d: String) =
    t(s, d, "lineitem")
      .join(t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"), "left")
      .withColumn("line_uid",
        col("l_orderkey") * 100L + col("l_linenumber"))

  /** Mirror of one rule's VIOLATION predicate in oracle SQL (NOT
    * coalesce(holds, FALSE) — the Rule convention verbatim).
    */
  private val dqViolSql: Seq[(String, String)] = Seq(
    "discount_bounded" ->
      "CAST(round(l_discount*100) AS BIGINT) BETWEEN 0 AND 10",
    "flag_known" -> "l_returnflag IN ('A','N','R')",
    "has_order" -> "ok IS NOT NULL",
    "price_positive" -> "CAST(round(l_extendedprice*100) AS BIGINT) > 0",
    "qty_in_range" -> "CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 50",
    "ship_after_order" -> "l_shipdate >= o_orderdate")

  /** Data-quality pack: the declared faces of
    * [[graft.operators.QualityRules]] (the deequ/dbt-test shape) —
    * q182 counts every rule's violations in ONE corpus pass, q183
    * shows the k smallest violating line ids per rule through the
    * bounded per-group heap.
    */
  val defs3: Seq[QueryDef] = Seq(

    // ── q182: the rule AUDIT — violation counts + rates for six
    // expectations over order lines (bounds, domain membership, FK
    // presence, date ordering; ship_after_order genuinely fails on
    // ~half the fixture's lines — the early-ship mass q174 buckets).
    // Scale shape: ALL rules in ONE aggregate (conditional sums,
    // map-side combined — never a filter().count() per rule, which
    // would scan the corpus |rules| times); the 1×|rules| result
    // unpivots map-side. The left join is the one corpus exchange.
    QueryDef(
      "q182_dq_audit",
      (s, d) =>
        graft.operators.QualityRules.audit(dqFrame(s, d), dqRules),
      Some(s"""WITH f AS (SELECT l.*, o.o_orderkey AS ok, o.o_orderdate
              |  FROM lineitem l LEFT JOIN orders o
              |    ON l.l_orderkey = o.o_orderkey),
              |m AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
              |${dqViolSql.zipWithIndex.map { case ((_, h), i) =>
                 s"    sum(CASE WHEN NOT coalesce($h, FALSE) " +
                   s"THEN 1 ELSE 0 END) AS b$i"
               }.mkString(",\n")}
              |  FROM f)
              |SELECT rule, n_rows, n_bad,
              |  round(CAST(n_bad AS DOUBLE)/CAST(n_rows AS DOUBLE), 6)
              |    AS bad_frac
              |FROM (
              |${dqViolSql.zipWithIndex.map { case ((n, _), i) =>
                 s"  SELECT '$n' AS rule, n_rows, " +
                   s"CAST(b$i AS BIGINT) AS n_bad FROM m"
               }.mkString("\n  UNION ALL\n")}
              |)
              |ORDER BY rule""".stripMargin)),

    // ── q183: the rule EXEMPLARS — up to 5 violating line ids per
    // rule for triage, deterministic (smallest line_uid first; the
    // uid is the unique (orderkey, linenumber) composite). Scale
    // shape: one scan emits (rule, uid) pairs ONLY for violations
    // (map-side explode of the per-row violated-rule array), then
    // GroupedTopK's per-partition heaps bound the exchange at
    // k·partitions rows — a 90%-bad corpus does not ship 90% of
    // itself to the report.
    QueryDef(
      "q183_dq_exemplars",
      (s, d) =>
        graft.operators.QualityRules.exemplars(
          dqFrame(s, d), dqRules, "line_uid", 5),
      Some(s"""WITH f AS (SELECT l.*, o.o_orderkey AS ok, o.o_orderdate,
              |    l.l_orderkey*100 + l.l_linenumber AS line_uid
              |  FROM lineitem l LEFT JOIN orders o
              |    ON l.l_orderkey = o.o_orderkey),
              |v AS (
              |${dqViolSql.map { case (n, h) =>
                 s"  SELECT '$n' AS rule, line_uid FROM f " +
                   s"WHERE NOT coalesce($h, FALSE)"
               }.mkString("\n  UNION ALL\n")}
              |),
              |r AS (SELECT rule, line_uid, row_number() OVER
              |    (PARTITION BY rule ORDER BY line_uid) AS rn FROM v)
              |SELECT rule, CAST(line_uid AS BIGINT) AS line_uid
              |FROM r WHERE rn <= 5
              |ORDER BY rule, line_uid""".stripMargin))
  )

  /** Round-7 tail pack: the sketch-set-algebra overlap matrix and the
    * exact seasonal decomposition.
    */
  val defs4: Seq[QueryDef] = Seq(

    // ── q184: sketch audience-overlap matrix — estimated
    // |users(A) ∩ users(B)| for every event-type pair via HLL
    // inclusion-exclusion (|A|+|B|−|A∪B|) plus the implied Jaccard:
    // the "how much do these segments share" read marketing/growth
    // runs across every segment pair. q115 computes the EXACT overlap
    // for vocabularies by shuffling (token, source) pairs; this is
    // the 100 TB twin for user audiences — the corpus collapses ONCE
    // to |types| mergeable 16 KB sketches (map-side partials, the
    // q145 property), and ALL pairwise math runs on that
    // kilobyte-sized frame: adding a segment costs one sketch, not a
    // corpus re-shuffle, and the same stored sketches answer every
    // future pairwise question.
    //
    // Plan note: the pair enumeration self-joins the |types|-row
    // sketch frame on a < condition — a BNLJ over two
    // dimension-bounded sides (like q129's calendar densify,
    // allowlisted). Approximate (HLL, lgK 14 ≈ 0.8% rsd;
    // inclusion-exclusion amplifies on small intersections) → no
    // oracle; scalatest gates the estimates against exact
    // intersections.
    QueryDef(
      "q184_user_overlap_hll",
      (s, d) => {
        val sk = t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
          .select(col("event_type"),
            hll_sketch_estimate(col("sk")).as("est"), col("sk"))
        val a = sk.select(col("event_type").as("type_a"),
          col("est").as("est_a"), col("sk").as("sk_a"))
        val b = sk.select(col("event_type").as("type_b"),
          col("est").as("est_b"), col("sk").as("sk_b"))
        a.join(b, col("type_a") < col("type_b"))
          .select(col("type_a"), col("type_b"),
            col("est_a").cast("long").as("users_a"),
            col("est_b").cast("long").as("users_b"),
            hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
              .cast("long").as("users_union"))
          .withColumn("overlap_est",
            greatest(col("users_a") + col("users_b") - col("users_union"),
              lit(0L)))
          .withColumn("jaccard_est",
            round(col("overlap_est").cast("double") /
              col("users_union").cast("double"), 6))
          .orderBy(col("type_a"), col("type_b"))
      },
      None),

    // ── q185: STL-style daily revenue decomposition — every day's
    // revenue split into trend (centered 7-day moving average),
    // day-of-week seasonal (the mean detrended value of that
    // weekday), and residual: the classic read that separates "sales
    // are growing" from "it's Friday" from "something happened",
    // composing q43's moving average, q124's DOW profile, and q158's
    // residual ranking into one decomposition whose parts re-add to
    // the series.
    //
    // Exactness: the corpus collapses to exact daily cents; the
    // trend numerator (Σ of 7 days) and the detrended numerator
    // (7·rev − Σ7) stay exact integers — seasonal group sums
    // accumulate DECIMAL(38,0) — and trend/seasonal/residual are
    // single-chain double derivations mirrored op-for-op, rounded 6.
    // Honest extent: trend (and everything derived from it) is NULL
    // on days whose centered window is incomplete (the first/last 3).
    // Scale shape: one scan → |days| grain map-side; the centered
    // window and the 7-row seasonal join run over the
    // dimension-bounded dense calendar (q144's rule); no-order
    // calendar days are honest zero-revenue days.
    QueryDef(
      "q185_stl_decompose",
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("dt"))
          .agg(sum(Q.fxUnits(col("o_totalprice"), 100)).as("rev_c"))
        val cal = daily
          .agg(min(col("dt")).as("lo"), max(col("dt")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("dt"))
        val dense = cal.join(daily, Seq("dt"), "left")
          .select(col("dt"), coalesce(col("rev_c"), lit(0L)).as("rev_c"))
        val w7 = Window.orderBy(col("dt")).rowsBetween(-3, 3)
        val trended = dense
          .withColumn("sum7", sum(col("rev_c")).over(w7))
          .withColumn("cnt7", count(lit(1)).over(w7))
          .withColumn("num",
            when(col("cnt7") === 7, lit(7L) * col("rev_c") - col("sum7")))
        val seasonal = trended.filter(col("cnt7") === 7)
          .select((weekday(col("dt")) + 1).as("dow"),
            col("num").cast("decimal(38,0)").as("numd"))
          .groupBy(col("dow"))
          .agg(sum(col("numd")).as("s_num"),
            count(lit(1)).cast("long").as("n_dow"))
        trended
          .join(broadcast(seasonal),
            (weekday(col("dt")) + 1) === col("dow"), "left")
          .select(
            date_format(col("dt"), "yyyy-MM-dd").as("day"),
            (col("rev_c") / 100.0).as("rev"),
            when(col("cnt7") === 7,
              round(col("sum7") / 700.0, 6)).as("trend"),
            when(col("cnt7") === 7,
              round(col("s_num").cast("double") /
                (col("n_dow").cast("double") * 700.0), 6)).as("seasonal"),
            when(col("cnt7") === 7,
              round(col("rev_c") / 100.0 - col("sum7") / 700.0 -
                col("s_num").cast("double") /
                  (col("n_dow").cast("double") * 700.0), 6)).as("residual"))
          .orderBy(col("day"))
      },
      Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
             |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |      AS rev_c
             |  FROM orders GROUP BY dt),
             |cal AS (SELECT unnest(generate_series(
             |    (SELECT min(dt) FROM daily),
             |    (SELECT max(dt) FROM daily),
             |    INTERVAL 1 DAY))::DATE AS dt),
             |dense AS (SELECT cal.dt, coalesce(daily.rev_c, 0) AS rev_c
             |  FROM cal LEFT JOIN daily ON cal.dt = daily.dt),
             |tr AS (SELECT dt, rev_c,
             |    sum(rev_c) OVER w AS sum7,
             |    count(*) OVER w AS cnt7
             |  FROM dense
             |  WINDOW w AS (ORDER BY dt
             |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |se AS (SELECT isodow(dt) AS dow,
             |    sum(CAST(7*rev_c - sum7 AS HUGEINT)) AS s_num,
             |    CAST(count(*) AS BIGINT) AS n_dow
             |  FROM tr WHERE cnt7 = 7 GROUP BY dow)
             |SELECT strftime(tr.dt, '%Y-%m-%d') AS day,
             |  rev_c/100.0 AS rev,
             |  CASE WHEN cnt7 = 7 THEN round(sum7/700.0, 6) END AS trend,
             |  CASE WHEN cnt7 = 7 THEN round(CAST(s_num AS DOUBLE)
             |    /(CAST(n_dow AS DOUBLE)*700.0), 6) END AS seasonal,
             |  CASE WHEN cnt7 = 7 THEN round(rev_c/100.0 - sum7/700.0
             |    - CAST(s_num AS DOUBLE)/(CAST(n_dow AS DOUBLE)*700.0), 6)
             |    END AS residual
             |FROM tr LEFT JOIN se ON isodow(tr.dt) = se.dow
             |ORDER BY day""".stripMargin)),

    // ── q186: price-volume-mix decomposition — per brand, the
    // 1996→1997 revenue change split into a VOLUME effect (quantity
    // change at the old average price) and a PRICE effect (the rest):
    // the finance-standard "why did revenue move" waterfall, and the
    // decomposition identity vol + price = Δrev holds exactly in real
    // arithmetic (price_eff = rev₂ − q₂·p̄₁ absorbs the joint term).
    //
    // Exactness: both years collapse to exact (Σcents, Σunits) per
    // brand; the effects are single-chain double derivations from
    // those integers, mirrored op-for-op, round 6; a brand with no
    // base-year volume has no meaningful base price — NULL effects
    // (honest extent). Scale shape: the fact scan date-prunes to the
    // two years, part broadcasts, ONE hash agg to the
    // |brands|×2 grain; the year pivot is a |brands|-row self-join of
    // that tiny frame (conditional aggregation keeps it one frame —
    // no join at all).
    QueryDef(
      "q186_price_volume_mix",
      (s, d) => {
        val y = year(col("l_shipdate"))
        val base = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= Q.ts("1996-01-01") &&
            col("l_shipdate") < Q.ts("1998-01-01"))
          .join(broadcast(t(s, d, "part")
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            sum(when(y === 1996, Q.fxUnits(col("l_quantity"), 1))
              .otherwise(0L)).as("q1"),
            sum(when(y === 1996, Q.fxUnits(col("l_extendedprice"), 100))
              .otherwise(0L)).as("r1"),
            sum(when(y === 1997, Q.fxUnits(col("l_quantity"), 1))
              .otherwise(0L)).as("q2"),
            sum(when(y === 1997, Q.fxUnits(col("l_extendedprice"), 100))
              .otherwise(0L)).as("r2"))
        def dbl(c: String) = col(c).cast("double")
        base.select(col("p_brand"),
          ((col("r2") - col("r1")) / 100.0).as("rev_delta"),
          when(col("q1") > 0,
            round((dbl("q2") - dbl("q1")) * (dbl("r1") / dbl("q1")) / 100.0,
              6)).as("volume_effect"),
          when(col("q1") > 0,
            round((dbl("r2") - dbl("q2") * (dbl("r1") / dbl("q1"))) / 100.0,
              6)).as("price_effect"))
          .orderBy(col("p_brand"))
      },
      Some("""WITH y AS (SELECT p_brand,
             |    CAST(sum(CASE WHEN year(l_shipdate) = 1996
             |      THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS q1,
             |    CAST(sum(CASE WHEN year(l_shipdate) = 1996
             |      THEN CAST(round(l_extendedprice*100) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS r1,
             |    CAST(sum(CASE WHEN year(l_shipdate) = 1997
             |      THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS q2,
             |    CAST(sum(CASE WHEN year(l_shipdate) = 1997
             |      THEN CAST(round(l_extendedprice*100) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS r2
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate <  TIMESTAMP '1998-01-01'
             |  GROUP BY p_brand)
             |SELECT p_brand, (r2 - r1)/100.0 AS rev_delta,
             |  CASE WHEN q1 > 0 THEN round((CAST(q2 AS DOUBLE)
             |    - CAST(q1 AS DOUBLE))
             |    *(CAST(r1 AS DOUBLE)/CAST(q1 AS DOUBLE))/100.0, 6)
             |    END AS volume_effect,
             |  CASE WHEN q1 > 0 THEN round((CAST(r2 AS DOUBLE)
             |    - CAST(q2 AS DOUBLE)
             |    *(CAST(r1 AS DOUBLE)/CAST(q1 AS DOUBLE)))/100.0, 6)
             |    END AS price_effect
             |FROM y ORDER BY p_brand""".stripMargin)),

    // ── q187: customer lifetime survival curve — S(m) = share of
    // customers whose first-to-last-order span reaches ≥ m months,
    // with the at-risk count: the Kaplan-Meier-flavored retention
    // read (every customer's span is fully observed in a closed
    // corpus, so this is the exact empirical survival function, no
    // censoring machinery needed). The longitudinal twin of q62's
    // day-over-day retention.
    //
    // Exactness: lifetimes are exact integer day diffs DIV 30 (both
    // engines integer-divide); the curve derives from a reverse
    // cumulative sum over the |months|-bounded lifetime histogram —
    // the corpus collapses to per-customer (first, last) in its ONE
    // exchange, and everything after is dimension-bounded. Share is
    // one rounded double division per month row.
    QueryDef(
      "q187_survival_curve",
      (s, d) => {
        val lt = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg((datediff(max(col("o_orderdate")), min(col("o_orderdate")))
            .cast("long") / 30L).cast("long").as("lt_m"))
        val hist = lt.groupBy(col("lt_m"))
          .agg(count(lit(1)).cast("long").as("n"))
        val months = hist.agg(max(col("lt_m")).as("mx"))
          .select(explode(sequence(lit(0L), col("mx"))).as("m"))
        val w = Window.orderBy(col("m").desc)
          .rowsBetween(Window.unboundedPreceding, 0)
        val tot = Window.partitionBy(lit(1))
        months.join(hist, col("m") === col("lt_m"), "left")
          .select(col("m"), coalesce(col("n"), lit(0L)).as("n"))
          .withColumn("at_risk", sum(col("n")).over(w))
          .withColumn("n_cust", sum(col("n")).over(tot))
          .select(col("m"), col("at_risk"),
            round(col("at_risk").cast("double") /
              col("n_cust").cast("double"), 6).as("survival"))
          .orderBy(col("m"))
      },
      Some("""WITH lt AS (SELECT o_custkey,
             |    datediff('day', min(o_orderdate), max(o_orderdate))//30
             |      AS lt_m
             |  FROM orders GROUP BY o_custkey),
             |h AS (SELECT lt_m, CAST(count(*) AS BIGINT) AS n
             |  FROM lt GROUP BY lt_m),
             |months AS (SELECT unnest(generate_series(0,
             |    (SELECT max(lt_m) FROM h))) AS m),
             |j AS (SELECT m, coalesce(n, 0) AS n
             |  FROM months LEFT JOIN h ON m = lt_m),
             |c AS (SELECT m, n,
             |    sum(n) OVER (ORDER BY m DESC ROWS UNBOUNDED PRECEDING)
             |      AS at_risk,
             |    sum(n) OVER () AS n_cust
             |  FROM j)
             |SELECT CAST(m AS BIGINT) AS m, CAST(at_risk AS BIGINT)
             |    AS at_risk,
             |  round(CAST(at_risk AS DOUBLE)/CAST(n_cust AS DOUBLE), 6)
             |    AS survival
             |FROM c ORDER BY m""".stripMargin)),

    // ── q188: weekly cohort retention MATRIX — users cohorted by
    // their first-ever event week, and for every (cohort, weeks-since)
    // cell the distinct active users plus the share of the cohort
    // still active: the retention TRIANGLE every growth team reads
    // (q62 measures day-over-day return GLOBALLY; the matrix separates
    // "January's users churned" from "users churn"; q152 cohorts by
    // first TYPE — this cohorts by first TIME).
    //
    // Exactness: cohort weeks and offsets are exact date arithmetic
    // (ISO date_trunc('week') on both engines, day-diff DIV 7);
    // retention is one rounded division of exact distinct counts.
    // Scale shape: ONE user-keyed exchange produces both the
    // first-week frame and the (user, week) activity set (the
    // activity distinct re-shuffles the same key space); the cohort
    // join is user-co-partitioned; everything after lives on the
    // \|weeks\|² matrix grain, with the cohort-size denominator read
    // from the matrix's own offset-0 column via a 1-row-per-cohort
    // window (never a second corpus pass).
    QueryDef(
      "q188_cohort_matrix",
      (s, d) => {
        // ONE corpus pass: per user, the set of active weeks
        // (map-side collect_set partials dedup before the single
        // user_id exchange — bounded by |calendar weeks|, a
        // dimension); cohort = array_min, explode back to the
        // (cohort, week) grain where each user contributes exactly
        // one row per active week, so count(*) IS the distinct user
        // count. The former first-week + distinct-activity frames
        // were two scans of events whose exchanges Spark could not
        // reuse (column pruning differs — the r12 q305
        // duplicated-subtree class).
        val perUser = t(s, d, "events")
          .select(col("user_id"),
            date_trunc("week", col("ts")).cast("date").as("wk"))
          .groupBy(col("user_id"))
          .agg(collect_set(col("wk")).as("wks"))
          .select(array_min(col("wks")).as("cohort_wk"),
            explode(col("wks")).as("wk"))
        val cells = perUser
          .groupBy(col("cohort_wk"),
            (datediff(col("wk"), col("cohort_wk")).cast("long") / 7L)
              .cast("long").as("week_offset"))
          .agg(count(lit(1)).cast("long").as("n_active"))
        val wCohort = Window.partitionBy(col("cohort_wk"))
        cells
          .withColumn("cohort_n",
            max(when(col("week_offset") === 0, col("n_active"))).over(wCohort))
          .select(
            date_format(col("cohort_wk"), "yyyy-MM-dd").as("cohort_week"),
            col("week_offset"), col("n_active"), col("cohort_n"),
            round(col("n_active").cast("double") /
              col("cohort_n").cast("double"), 6).as("retention"))
          .orderBy(col("cohort_week"), col("week_offset"))
      },
      Some("""WITH ev AS (SELECT user_id,
             |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events),
             |f AS (SELECT user_id, min(wk) AS cohort_wk
             |  FROM ev GROUP BY user_id),
             |act AS (SELECT DISTINCT user_id, wk FROM ev),
             |cells AS (SELECT cohort_wk,
             |    datediff('day', cohort_wk, wk)//7 AS week_offset,
             |    CAST(count(DISTINCT act.user_id) AS BIGINT) AS n_active
             |  FROM act JOIN f ON act.user_id = f.user_id
             |  GROUP BY cohort_wk, week_offset),
             |m AS (SELECT *, max(CASE WHEN week_offset = 0 THEN n_active
             |    END) OVER (PARTITION BY cohort_wk) AS cohort_n
             |  FROM cells)
             |SELECT strftime(cohort_wk, '%Y-%m-%d') AS cohort_week,
             |  CAST(week_offset AS BIGINT) AS week_offset, n_active,
             |  CAST(cohort_n AS BIGINT) AS cohort_n,
             |  round(CAST(n_active AS DOUBLE)/CAST(cohort_n AS DOUBLE), 6)
             |    AS retention
             |FROM m ORDER BY cohort_week, week_offset""".stripMargin))
  )
}
