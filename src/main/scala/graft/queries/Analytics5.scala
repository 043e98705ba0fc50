package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 extension pack: the five classic product/curation readouts
  * the suite had not yet declared — weekly growth accounting (the
  * new/retained/resurrected/churned ledger every growth review opens),
  * a cross-sectional grouped demand regression (per-brand price→volume
  * slope — q103 regresses over TIME, this over the PRICE axis), a
  * spend-quintile migration matrix (where did last period's best
  * customers go), leading-span (prefix) duplicate families (templated
  * intros that exact-hash dedup misses because the tails differ), and
  * month-over-month top-seller turnover (is the bestseller list stable
  * or churning — the rank-stability face of q129's volume swings).
  *
  * Reference progenitor: the A18 aggregate/summarize + A21 dedup rows
  * of SURVEY §2.1 (`Batch Processor.py:287-365`, `:228-244`) — the
  * reference folds per-record counters and keys exact duplicates; these
  * are the declarative Spark generalizations at warehouse semantics.
  *
  * Disciplines as everywhere else ([[Q]]): exact fixed-point integer
  * sums (DECIMAL(38,0) where a product can cross 2⁶³ at 100 TB),
  * display doubles derive in single mirrored operation chains, output
  * carries a total order, and no corpus-wide window anywhere — the
  * only windows are per-user (q130's bounded class), per-month-top-10,
  * or over the ≤36-row post-aggregate matrix.
  */
object Analytics5 {
  import Q._

  /** ntile(k)-equivalent bucket from the exact global index `rn` over
    * `n` rows — [[Q.exactDecile]]'s arithmetic generalized to any k
    * (SQL ntile: the first n%k buckets take ⌈n/k⌉ rows, the rest
    * ⌊n/k⌋). Shared by q228's two half-period quintile passes so the
    * from/to bucketing cannot drift.
    */
  private[graft] def exactKile(rn: Column, n: Long, k: Int): Column = {
    val q = n / k
    val r = n % k
    val big = r * (q + 1)
    when(rn <= lit(big),
      (floor((rn - 1) / lit((q + 1).toDouble)) + 1).cast("int"))
      .otherwise((lit(r) + floor((rn - lit(big) - 1) /
        lit(q.max(1L).toDouble)) + 1).cast("int"))
  }

  private def epochDay(c: Column): Column =
    datediff(c.cast("date"), lit("1970-01-01").cast("date")).cast("long")

  val defs: Seq[QueryDef] = Seq(

    // ── q226: weekly GROWTH ACCOUNTING — the new/retained/
    // resurrected/churned user ledger per absolute week (q222's
    // epoch-day div 7 calendar): new = first-ever active week,
    // retained = also active the week before, resurrected = active
    // before but not the week before, churned(w) = active in w−1 but
    // not in w (attributed to the week the user went dark, censored
    // at the corpus's last week — we can't observe churn past the
    // data), plus the quick ratio (new+resurrected)/churned (NULL
    // when nothing churned). q225 reads cohort decay, q222 population
    // stickiness, q62 short-horizon retention — this is the
    // week-over-week FLOW decomposition those stocks hide, with the
    // conservation law active(w) = new+retained+resurrected and
    // churned(w) = active(w−1) − retained(w) (spec-pinned). The week
    // axis is calendar-DENSIFIED (q106's lesson): a silent week
    // reads 0 active with last week's actives all churned into it.
    //
    // Scale shape: the corpus collapses ONCE to the distinct
    // (user, week) grain (one exchange — q222/q225's frame); the
    // lag/lead pass is a PER-USER window (q130's bounded class —
    // a user's distinct weeks ≤ |weeks|, never corpus-wide); status
    // and churn both read that one pass; final aggs land on the
    // |weeks| grain; the calendar is a |weeks|-bounded range. The
    // week bounds come from a parquet-stat-backed min/max scan
    // (q50's bounded driver probe class).
    QueryDef(
      "q226_growth_accounting",
      (s, d) => {
        val ev = t(s, d, "events")
        val b = ev.agg(min(epochDay(col("ts"))).as("dmin"),
          max(epochDay(col("ts"))).as("dmax")).head()
        val wmin = Math.floorDiv(b.getLong(0), 7L)
        val wmax = Math.floorDiv(b.getLong(1), 7L)
        val uw = ev
          .select(col("user_id"), epochDay(col("ts")).as("day"))
          // integer `div`, never `/` (Divide is DOUBLE division)
          .select(col("user_id"), expr("day div 7").as("week"))
          .distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("week"))
        val lagd = uw
          .withColumn("pw", lag(col("week"), 1).over(w))
          .withColumn("nw", lead(col("week"), 1).over(w))
        val stat = lagd.groupBy(col("week"))
          .agg(count(lit(1)).cast("long").as("n_active"),
            count(when(col("pw").isNull, 1)).cast("long").as("n_new"),
            count(when(col("pw") === col("week") - 1, 1)).cast("long")
              .as("n_retained"),
            count(when(col("pw").isNotNull && col("pw") < col("week") - 1, 1))
              .cast("long").as("n_resurrected"))
        val churn = lagd
          .filter((col("nw").isNull || col("nw") > col("week") + 1) &&
            col("week") + 1 <= lit(wmax))
          .groupBy((col("week") + 1).as("week"))
          .agg(count(lit(1)).cast("long").as("n_churned"))
        val cal = s.range(wmin, wmax + 1).toDF("week")
        val nn = col("n_new") + col("n_resurrected")
        cal.join(stat, Seq("week"), "left")
          .join(churn, Seq("week"), "left")
          .select(col("week"),
            coalesce(col("n_active"), lit(0L)).as("n_active"),
            coalesce(col("n_new"), lit(0L)).as("n_new"),
            coalesce(col("n_retained"), lit(0L)).as("n_retained"),
            coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
            coalesce(col("n_churned"), lit(0L)).as("n_churned"))
          .withColumn("quick_ratio",
            when(col("n_churned") > 0,
              round(nn.cast("double") / col("n_churned").cast("double"), 6)))
          .orderBy(col("week"))
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
             |    CAST(datediff('day', DATE '1970-01-01',
             |      CAST(ts AS DATE)) AS BIGINT) // 7 AS week
             |  FROM events),
             |b AS (SELECT min(week) AS wmin, max(week) AS wmax FROM uw),
             |lagd AS (SELECT user_id, week,
             |    lag(week) OVER (PARTITION BY user_id ORDER BY week) AS pw,
             |    lead(week) OVER (PARTITION BY user_id ORDER BY week) AS nw
             |  FROM uw),
             |stat AS (SELECT week,
             |    CAST(count(*) AS BIGINT) AS n_active,
             |    CAST(count(*) FILTER (WHERE pw IS NULL) AS BIGINT) AS n_new,
             |    CAST(count(*) FILTER (WHERE pw = week - 1) AS BIGINT)
             |      AS n_retained,
             |    CAST(count(*) FILTER (WHERE pw IS NOT NULL
             |      AND pw < week - 1) AS BIGINT) AS n_resurrected
             |  FROM lagd GROUP BY 1),
             |churn AS (SELECT week + 1 AS week,
             |    CAST(count(*) AS BIGINT) AS n_churned
             |  FROM lagd, b WHERE (nw IS NULL OR nw > week + 1)
             |    AND week + 1 <= b.wmax
             |  GROUP BY 1),
             |cal AS (SELECT unnest(range(wmin, wmax + 1)) AS week FROM b)
             |SELECT week, coalesce(n_active, 0) AS n_active,
             |  coalesce(n_new, 0) AS n_new,
             |  coalesce(n_retained, 0) AS n_retained,
             |  coalesce(n_resurrected, 0) AS n_resurrected,
             |  coalesce(n_churned, 0) AS n_churned,
             |  CASE WHEN coalesce(n_churned, 0) > 0 THEN
             |    round(CAST(coalesce(n_new, 0) + coalesce(n_resurrected, 0)
             |      AS DOUBLE) / CAST(n_churned AS DOUBLE), 6)
             |  END AS quick_ratio
             |FROM cal LEFT JOIN stat USING (week)
             |LEFT JOIN churn USING (week)
             |ORDER BY week""".stripMargin)),

    // ── q227: per-brand DEMAND CURVE — the cross-sectional OLS slope
    // of total quantity sold against retail price across each brand's
    // parts (unsold parts enter at y = 0 — they ARE the demand signal
    // at their price point): the pricing team's first elasticity
    // proxy. q103 fits value-over-TIME per event type; this fits
    // volume-over-PRICE per brand — same five textbook moments, a
    // different axis and a joined fact rollup instead of a raw scan.
    // Slope is qty per price-dollar (the /100 cent scales cancel);
    // intercept rescales to qty units.
    //
    // Scale shape: the fact collapses to the part grain in one
    // partkey exchange; the part-dim left join is partkey-
    // co-partitioned (broadcast under AQE when the dim is small); the
    // five moment sums accumulate map-side onto the |brands| grain.
    // Float discipline: q103's exactly — integer cents moments in
    // DECIMAL(38,0) (Σx² crosses 2⁶³ at ~10¹⁰ parts of 10⁴-cent
    // prices), slope/intercept derive in double with ONE literal op
    // order both engines run, the unrounded slope feeding the
    // intercept; degenerate brands (n < 2 or zero price variance)
    // filtered, not NaN'd.
    QueryDef(
      "q227_demand_curve",
      (s, d) => {
        val dec38 = "decimal(38,0)"
        val sold = t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(fxUnits(col("l_quantity"), 100)).cast("long").as("yc"))
        val pts = t(s, d, "part")
          .select(col("p_brand"), col("p_partkey"),
            fxUnits(col("p_retailprice"), 100).as("xc"))
          .join(sold, col("p_partkey") === col("l_partkey"), "left")
          .select(col("p_brand"), col("xc"),
            coalesce(col("yc"), lit(0L)).as("yc"))
        val xd = col("xc").cast("decimal(19,0)")
        val yd = col("yc").cast("decimal(19,0)")
        val m = pts.groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_parts"),
            sum(xd.cast(dec38)).as("sx"),
            sum(yd.cast(dec38)).as("sy"),
            sum((xd * yd).cast(dec38)).as("sxy"),
            sum((xd * xd).cast(dec38)).as("sxx"))
        val nD = col("n_parts").cast("double")
        val sxD = col("sx").cast("double")
        val syD = col("sy").cast("double")
        val num = nD * col("sxy").cast("double") - sxD * syD
        val den = nD * col("sxx").cast("double") - sxD * sxD
        val slopeRaw = num / den
        m.filter(col("n_parts") >= 2 && den =!= lit(0.0))
          .select(col("p_brand").as("brand"), col("n_parts"),
            round(slopeRaw, 6).as("slope"),
            round(((syD - slopeRaw * sxD) / nD) / 100.0, 6).as("intercept"))
          .orderBy(col("brand"))
      },
      Some("""WITH sold AS (SELECT l_partkey,
             |    CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
             |      AS yc
             |  FROM lineitem GROUP BY 1),
             |pts AS (SELECT p_brand,
             |    CAST(round(p_retailprice*100) AS BIGINT) AS xc,
             |    coalesce(yc, 0) AS yc
             |  FROM part LEFT JOIN sold ON p_partkey = l_partkey),
             |m AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
             |    sum(CAST(xc AS HUGEINT)) AS sx,
             |    sum(CAST(yc AS HUGEINT)) AS sy,
             |    sum(CAST(xc AS HUGEINT)*yc) AS sxy,
             |    sum(CAST(xc AS HUGEINT)*xc) AS sxx
             |  FROM pts GROUP BY 1),
             |dm AS (SELECT p_brand, n_parts,
             |    CAST(n_parts AS DOUBLE)*CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS num,
             |    CAST(n_parts AS DOUBLE)*CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS den,
             |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
             |  FROM m)
             |SELECT p_brand AS brand, n_parts,
             |  round(num/den, 6) AS slope,
             |  round(((syd - (num/den)*sxd)/CAST(n_parts AS DOUBLE))/100.0,
             |    6) AS intercept
             |FROM dm WHERE n_parts >= 2 AND den <> 0.0
             |ORDER BY brand""".stripMargin)),

    // ── q228: spend-quintile MIGRATION matrix — customers bucketed
    // into exact spend quintiles within the first and second halves
    // of the order calendar (half boundary = the integer midpoint of
    // the orderdate day span, a data-derived but deterministic cut),
    // then the full-outer 6×6 flow matrix (q1..q5 plus 'none' for
    // active-in-one-half-only): "where did last period's best
    // customers go" — the migration face of q128's static RFM and
    // q62/q225's binary retention. Quintiles are SQL-ntile-exact
    // ([[exactKile]] ≡ ntile(5), q50's proved equivalence) over the
    // total order (spend DESC, custkey), so q1 is the TOP quintile.
    //
    // Scale shape: orders collapse ONCE to the customer grain with
    // both half-spends as conditional aggregates (one exchange); each
    // half's ranking is [[Q.globalRankByRange]] (two-pass range
    // ranking — never an unpartitioned window); the matrix join is
    // custkey-co-partitioned; the share window runs over the ≤36-row
    // post-aggregate matrix (coverageCurve's bounded-window class).
    // The day bounds are a parquet-stat min/max probe (q50's class).
    QueryDef(
      "q228_spend_migration",
      (s, d) => {
        val o = t(s, d, "orders")
        val b = o.agg(min(epochDay(col("o_orderdate"))).as("dmin"),
          max(epochDay(col("o_orderdate"))).as("dmax")).head()
        val mid = Math.floorDiv(b.getLong(0) + b.getLong(1) + 1L, 2L)
        val cents = fxUnits(col("o_totalprice"), 100)
        val cs = o
          .select(col("o_custkey"), epochDay(col("o_orderdate")).as("day"),
            cents.as("cents"))
          .groupBy(col("o_custkey"))
          .agg(sum(when(col("day") < mid, col("cents")).otherwise(lit(0L)))
            .cast("long").as("s1"),
            sum(when(col("day") >= mid, col("cents")).otherwise(lit(0L)))
              .cast("long").as("s2"))
        def half(spend: String): DataFrame = {
          val act = cs.filter(col(spend) > 0)
            .select(col("o_custkey"), col(spend))
          val n = act.count()
          globalRankByRange(act, Seq(col(spend).desc, col("o_custkey")))
            .select(col("o_custkey"),
              exactKile(col("rn"), n, 5).as("q"))
        }
        val h1 = half("s1").withColumnRenamed("q", "q1")
        val h2 = half("s2").withColumnRenamed("q", "q2")
        val mat = h1.join(h2, Seq("o_custkey"), "full_outer")
          .select(
            coalesce(concat(lit("q"), col("q1")), lit("none")).as("from_q"),
            coalesce(concat(lit("q"), col("q2")), lit("none")).as("to_q"))
          .groupBy(col("from_q"), col("to_q"))
          .agg(count(lit(1)).cast("long").as("n_customers"))
        // share window over the ≤36-row matrix — coverageCurve's
        // bounded-window class, never corpus-scale
        val tot = Window.partitionBy(lit(1))
        mat.select(col("from_q"), col("to_q"), col("n_customers"),
          round(col("n_customers").cast("double") /
            sum(col("n_customers")).over(tot).cast("double"), 6).as("share"))
          .orderBy(col("from_q"), col("to_q"))
      },
      Some("""WITH b AS (SELECT
             |    min(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT)) AS dmin,
             |    max(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT)) AS dmax
             |  FROM orders),
             |cs AS (SELECT o_custkey,
             |    CAST(sum(CASE WHEN CAST(datediff('day', DATE '1970-01-01',
             |        CAST(o_orderdate AS DATE)) AS BIGINT)
             |        < (dmin + dmax + 1) // 2
             |      THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS s1,
             |    CAST(sum(CASE WHEN CAST(datediff('day', DATE '1970-01-01',
             |        CAST(o_orderdate AS DATE)) AS BIGINT)
             |        >= (dmin + dmax + 1) // 2
             |      THEN CAST(round(o_totalprice*100) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS s2
             |  FROM orders, b GROUP BY 1),
             |h1 AS (SELECT o_custkey,
             |    ntile(5) OVER (ORDER BY s1 DESC, o_custkey) AS q
             |  FROM cs WHERE s1 > 0),
             |h2 AS (SELECT o_custkey,
             |    ntile(5) OVER (ORDER BY s2 DESC, o_custkey) AS q
             |  FROM cs WHERE s2 > 0),
             |mat AS (SELECT
             |    coalesce('q' || CAST(h1.q AS VARCHAR), 'none') AS from_q,
             |    coalesce('q' || CAST(h2.q AS VARCHAR), 'none') AS to_q,
             |    CAST(count(*) AS BIGINT) AS n_customers
             |  FROM h1 FULL OUTER JOIN h2 USING (o_custkey) GROUP BY 1, 2)
             |SELECT from_q, to_q, n_customers,
             |  round(CAST(n_customers AS DOUBLE) /
             |    CAST(sum(n_customers) OVER () AS DOUBLE), 6) AS share
             |FROM mat ORDER BY from_q, to_q""".stripMargin)),

    // ── q229: leading-span (PREFIX) duplicate families — documents
    // keyed by the md5 of their first 16 lowercased whitespace tokens
    // (q19/q94's tokenizer), reported per source: docs, distinct
    // prefixes, docs in corpus-wide shared-prefix families (size ≥ 2),
    // dup share, and docs whose family SPANS sources. Exact-hash
    // dedup (q22) misses templated documents whose bodies diverge
    // after a boilerplate intro; prefix families surface exactly that
    // curation signal (q25/q76 mine arbitrary-position overlaps at
    // shingle cost — the prefix key is the one-scan cheap screen).
    //
    // Scale shape: the fingerprint computes MAP-SIDE inside codegen
    // (lower → split → slice → concat_ws → md5) so text never
    // shuffles — only (doc_id, source, fp) moves; family stats are
    // one fp-grain exchange (cross-source detection via
    // min(source) ≠ max(source) — no count-distinct); the join-back
    // reuses the fp key; the rollup lands on |sources| rows.
    QueryDef(
      "q229_prefix_dup",
      (s, d) => {
        val fp = md5(concat_ws(" ",
          slice(filter(split(lower(col("text")), " "),
            tk => length(tk) > 0), 1, 16)))
        val p = t(s, d, "documents")
          .select(col("doc_id"), col("source"), fp.as("fp"))
        val fam = p.groupBy(col("fp"))
          .agg(count(lit(1)).cast("long").as("fam_n"),
            when(min(col("source")) =!= max(col("source")), 1L)
              .otherwise(0L).as("xsrc"))
        p.join(fam, Seq("fp"))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            countDistinct(col("fp")).cast("long").as("n_prefixes"),
            count(when(col("fam_n") >= 2, 1)).cast("long").as("dup_docs"),
            round(count(when(col("fam_n") >= 2, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("dup_share"),
            count(when(col("fam_n") >= 2 && col("xsrc") === 1L, 1))
              .cast("long").as("xsrc_dup_docs"))
          .orderBy(col("source"))
      },
      Some("""WITH p AS (SELECT doc_id, source,
             |    md5(array_to_string(list_filter(string_split(lower(text),
             |      ' '), x -> len(x) > 0)[1:16], ' ')) AS fp
             |  FROM documents),
             |fam AS (SELECT fp, CAST(count(*) AS BIGINT) AS fam_n,
             |    CASE WHEN min(source) <> max(source) THEN 1 ELSE 0 END
             |      AS xsrc
             |  FROM p GROUP BY 1)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(DISTINCT fp) AS BIGINT) AS n_prefixes,
             |  CAST(count(*) FILTER (WHERE fam_n >= 2) AS BIGINT)
             |    AS dup_docs,
             |  round(CAST(count(*) FILTER (WHERE fam_n >= 2) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS dup_share,
             |  CAST(count(*) FILTER (WHERE fam_n >= 2 AND xsrc = 1)
             |    AS BIGINT) AS xsrc_dup_docs
             |FROM p JOIN fam USING (fp)
             |GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── q230: month-over-month TOP-SELLER turnover — the top-10
    // parts by revenue per ship month (exact, tie-broken on partkey),
    // then each consecutive month pair's overlap count and Jaccard:
    // "is the bestseller list stable or churning" — the rank-
    // stability readout next to q129's volume swings (q129 flags the
    // size of daily moves; this reads whether the LEADERBOARD
    // composition persists). Months with no data break the chain
    // (the pair is simply absent — both engines agree).
    //
    // Scale shape: revenue collapses to the (month, part) grain in
    // one exchange; the per-month top-10 goes through the custom
    // GroupedTopK operator (map-side k-reduction BEFORE the exchange
    // — q46's plan, never a per-month ranking window over the corpus
    // grain); everything downstream (sizes, next-month join, overlap
    // self-join) rides the ≤|months|×10 frame — dimension-bounded.
    // Exactness: revenue micro-units are exact integers summed in
    // DECIMAL(38,0); the Jaccard is one mirrored rounded division.
    QueryDef(
      "q230_topseller_turnover",
      (s, d) => {
        val pm = t(s, d, "lineitem")
          .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"),
            col("l_partkey"), revMicro.as("rm"))
          .groupBy(col("month"), col("l_partkey"))
          .agg(sum(col("rm").cast("decimal(38,0)")).as("rev"))
        val top = graft.plans.GroupedTopK.topK(pm, Seq("month"),
            Seq(("rev", true), ("l_partkey", false)), 10)
          .select(col("month"), col("l_partkey"))
        val sz = top.groupBy(col("month"))
          .agg(count(lit(1)).cast("long").as("n_top"))
        val nxt = sz.select(col("month"),
          date_format(add_months(to_date(concat(col("month"), lit("-01"))), 1),
            "yyyy-MM").as("next_month"))
        val ta = top.toDF("month", "pk")
        val tb = top.toDF("bmonth", "bpk")
        val com = ta.join(nxt, Seq("month"))
          .join(tb, col("bmonth") === col("next_month") &&
            col("pk") === col("bpk"))
          .groupBy(col("month"))
          .agg(count(lit(1)).cast("long").as("n_common"))
        sz.join(nxt, Seq("month"))
          .join(sz.toDF("next_month", "n_top_next"), Seq("next_month"))
          .join(com, Seq("month"), "left")
          .select(col("month"), col("next_month"), col("n_top"),
            col("n_top_next"),
            coalesce(col("n_common"), lit(0L)).as("n_common"),
            round(coalesce(col("n_common"), lit(0L)).cast("double") /
              (col("n_top") + col("n_top_next") -
                coalesce(col("n_common"), lit(0L))).cast("double"), 6)
              .as("jaccard"))
          .orderBy(col("month"))
      },
      Some(s"""WITH pm AS (SELECT strftime(l_shipdate, '%Y-%m') AS month,
             |    l_partkey, sum(CAST($revMicroSql AS HUGEINT)) AS rev
             |  FROM lineitem GROUP BY 1, 2),
             |r AS (SELECT month, l_partkey, row_number() OVER (
             |    PARTITION BY month ORDER BY rev DESC, l_partkey) AS rn
             |  FROM pm),
             |top AS (SELECT month, l_partkey FROM r WHERE rn <= 10),
             |sz AS (SELECT month, CAST(count(*) AS BIGINT) AS n_top
             |  FROM top GROUP BY 1),
             |nxt AS (SELECT month, strftime(CAST(month || '-01' AS DATE)
             |    + INTERVAL 1 MONTH, '%Y-%m') AS next_month FROM sz),
             |com AS (SELECT a.month, CAST(count(*) AS BIGINT) AS n_common
             |  FROM top a JOIN nxt USING (month)
             |  JOIN top b ON b.month = nxt.next_month
             |    AND b.l_partkey = a.l_partkey
             |  GROUP BY 1)
             |SELECT s1.month, n.next_month, s1.n_top,
             |  s2.n_top AS n_top_next,
             |  coalesce(c.n_common, 0) AS n_common,
             |  round(CAST(coalesce(c.n_common, 0) AS DOUBLE) /
             |    CAST(s1.n_top + s2.n_top - coalesce(c.n_common, 0)
             |      AS DOUBLE), 6) AS jaccard
             |FROM sz s1 JOIN nxt n USING (month)
             |JOIN sz s2 ON s2.month = n.next_month
             |LEFT JOIN com c ON c.month = s1.month
             |ORDER BY s1.month""".stripMargin))
  )
}
