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
        // ONE corpus pass: collapse to the (fp, source) grain first,
        // roll the family census up from it, and carry the per-source
        // counts through the fp aggregate as a collected list —
        // bounded by |sources|, a dimension. After the explode each
        // (fp, source) pair is exactly one row, so count(*) at the
        // source grain IS the distinct-prefix count (no countDistinct,
        // no Expand). The former census + join-back planned the text
        // scan twice (exchanges not reusable — the r12 q305
        // duplicated-subtree class). Integer counts only, so the
        // regrouped sums hash-match the join-back form exactly.
        val fsrc = t(s, d, "documents")
          .select(col("source"), fp.as("fp"))
          .groupBy(col("fp"), col("source"))
          .agg(count(lit(1)).cast("long").as("n"))
        fsrc.groupBy(col("fp"))
          .agg(sum(col("n")).cast("long").as("fam_n"),
            when(min(col("source")) =!= max(col("source")), 1L)
              .otherwise(0L).as("xsrc"),
            collect_list(struct(col("source"), col("n"))).as("per_src"))
          .select(col("fam_n"), col("xsrc"), explode(col("per_src")).as("e"))
          .select(col("e.source").as("source"), col("e.n").as("n"),
            col("fam_n"), col("xsrc"))
          .groupBy(col("source"))
          .agg(sum(col("n")).cast("long").as("n_docs"),
            count(lit(1)).cast("long").as("n_prefixes"),
            sum(when(col("fam_n") >= 2, col("n")).otherwise(0L))
              .cast("long").as("dup_docs"),
            sum(when(col("fam_n") >= 2 && col("xsrc") === 1L, col("n"))
              .otherwise(0L)).cast("long").as("xsrc_dup_docs"))
          .select(col("source"), col("n_docs"), col("n_prefixes"),
            col("dup_docs"),
            round(col("dup_docs").cast("double") /
              col("n_docs").cast("double"), 6).as("dup_share"),
            col("xsrc_dup_docs"))
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
             |ORDER BY s1.month""".stripMargin)),

    // ── q231: REORDER CADENCE by market segment — per-customer gaps
    // between consecutive orders (day grain), rolled up per segment:
    // gap count, repeat-customer count, exact mean gap, exact p50/p90
    // gap, and the share of gaps ≤ 7 days ("weekly rebuyers"). q116
    // reads event interarrival at the type grain; q128 scores RFM
    // recency as a snapshot — this is the purchase-RHYTHM readout in
    // between (how fast do customers come BACK, per segment). The gap
    // multiset is tie-break-invariant (equal days diff to 0 whatever
    // their order), but the lag window still carries the
    // (day, orderkey) total order so the pass is deterministic.
    //
    // Scale shape: the lag window is PER-CUSTOMER (q130's bounded
    // class — a customer's orders, never corpus-wide); the customer
    // dim join is custkey-co-partitioned (AQE-broadcast when small);
    // the rollup lands on |segments| rows. The exact percentile
    // collects each segment's gaps into one aggregation buffer — the
    // q41 exact-baseline class, with approx_percentile (q55's sketch)
    // as the named 100 TB twin. count(DISTINCT custkey) rides a
    // (segment, custkey) expand of the already-collapsed gap frame —
    // bounded by the customer grain, not the order grain.
    QueryDef(
      "q231_reorder_cadence",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("day"), col("o_orderkey"))
        val gaps = t(s, d, "orders")
          .select(col("o_custkey"), epochDay(col("o_orderdate")).as("day"),
            col("o_orderkey"))
          .withColumn("gap", col("day") - lag(col("day"), 1).over(w))
          .filter(col("gap").isNotNull)
          .select(col("o_custkey"), col("gap"))
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"))
        gaps.join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).cast("long").as("n_gaps"),
            countDistinct(col("o_custkey")).cast("long")
              .as("n_repeat_customers"),
            round(sum(col("gap")).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_gap_days"),
            round(expr("percentile(gap, 0.5)"), 6).as("p50_gap"),
            round(expr("percentile(gap, 0.9)"), 6).as("p90_gap"),
            round(count(when(col("gap") <= 7, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("weekly_share"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH g AS (SELECT o_custkey, o_orderkey,
             |    CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day
             |  FROM orders),
             |lg AS (SELECT o_custkey, day - lag(day) OVER (
             |    PARTITION BY o_custkey ORDER BY day, o_orderkey) AS gap
             |  FROM g),
             |gp AS (SELECT o_custkey, gap FROM lg WHERE gap IS NOT NULL)
             |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
             |  CAST(count(DISTINCT o_custkey) AS BIGINT)
             |    AS n_repeat_customers,
             |  round(CAST(sum(gap) AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |    AS avg_gap_days,
             |  round(quantile_cont(gap, 0.5), 6) AS p50_gap,
             |  round(quantile_cont(gap, 0.9), 6) AS p90_gap,
             |  round(CAST(count(*) FILTER (WHERE gap <= 7) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS weekly_share
             |FROM gp JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin)),

    // ── q232: supplier-nation LATENCY TREND — per supplier nation, the
    // OLS slope of ship latency (shipdate − orderdate, integer days)
    // over the absolute ship-month index: "is this nation's fulfilment
    // getting slower or faster", the TREND face of q174's static SLA
    // quantiles (q174 scores the level; this scores the drift; q148
    // flags the anomalies). q103/q227's moment discipline exactly —
    // the five OLS moments accumulate as DECIMAL(38,0) integer sums
    // (Σx² of ~10⁴·⁵-valued month indexes crosses 2⁶³ near 10¹⁰ rows),
    // slope and mean derive in double through ONE mirrored chain;
    // degenerate nations filtered, not NaN'd.
    //
    // Scale shape: ONE orderkey exchange joins lineitem to orders (the
    // genuine fact-fact price); supplier and nation dims broadcast
    // under AQE; the moments accumulate map-side onto the |nations|
    // grain — no month collapse needed because the raw-point OLS is a
    // pure aggregate (the monthly-average OLS would weight months
    // equally instead of lines equally; raw-point is the declared
    // semantic).
    QueryDef(
      "q232_supplier_latency_trend",
      (s, d) => {
        val dec38 = "decimal(38,0)"
        val f = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_suppkey"),
            datediff(col("l_shipdate").cast("date"),
              col("o_orderdate").cast("date")).cast("long").as("lat"),
            (year(col("l_shipdate")) * 12 + month(col("l_shipdate")) - 1)
              .cast("long").as("mi"))
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val nat = t(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val xd = col("mi").cast("decimal(19,0)")
        val yd = col("lat").cast("decimal(19,0)")
        val m = f.join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(nat, col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(xd.cast(dec38)).as("sx"),
            sum(yd.cast(dec38)).as("sy"),
            sum((xd * yd).cast(dec38)).as("sxy"),
            sum((xd * xd).cast(dec38)).as("sxx"))
        val nD = col("n_lines").cast("double")
        val sxD = col("sx").cast("double")
        val syD = col("sy").cast("double")
        val num = nD * col("sxy").cast("double") - sxD * syD
        val den = nD * col("sxx").cast("double") - sxD * sxD
        m.filter(col("n_lines") >= 2 && den =!= lit(0.0))
          .select(col("n_name").as("nation"), col("n_lines"),
            round(syD / nD, 6).as("avg_latency_days"),
            round(num / den, 6).as("slope_days_per_month"))
          .orderBy(col("nation"))
      },
      Some("""WITH f AS (SELECT l_suppkey,
             |    CAST(datediff('day', CAST(o_orderdate AS DATE),
             |      CAST(l_shipdate AS DATE)) AS BIGINT) AS lat,
             |    CAST(year(l_shipdate)*12 + month(l_shipdate) - 1
             |      AS BIGINT) AS mi
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |m AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_lines,
             |    sum(CAST(mi AS HUGEINT)) AS sx,
             |    sum(CAST(lat AS HUGEINT)) AS sy,
             |    sum(CAST(mi AS HUGEINT)*lat) AS sxy,
             |    sum(CAST(mi AS HUGEINT)*mi) AS sxx
             |  FROM f JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  GROUP BY 1),
             |dm AS (SELECT n_name, n_lines,
             |    CAST(n_lines AS DOUBLE)*CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS num,
             |    CAST(n_lines AS DOUBLE)*CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS den,
             |    CAST(sy AS DOUBLE) AS syd
             |  FROM m)
             |SELECT n_name AS nation, n_lines,
             |  round(syd/CAST(n_lines AS DOUBLE), 6) AS avg_latency_days,
             |  round(num/den, 6) AS slope_days_per_month
             |FROM dm WHERE n_lines >= 2 AND den <> 0.0
             |ORDER BY nation""".stripMargin)),

    // ── q233: part INTRO-COHORT revenue ramp — parts grouped by their
    // introduction month (first ship month), revenue laid out by month
    // OFFSET from introduction (0, 1, 2, 3+): "how fast does a new
    // part's revenue ramp, and does the ramp differ by launch
    // cohort" — the PART-axis face of q188's customer cohort matrix
    // (q220 reads corpus novelty; this reads the revenue consequence).
    // Per cell: distinct parts contributing, exact revenue (micro-unit
    // DECIMAL(38,0) sums → one display division), and the cell's share
    // of its cohort's total revenue.
    //
    // Scale shape: revenue collapses to the (part, month) grain in one
    // exchange; the intro month is a partkey-grain re-aggregate of
    // THAT frame (no second corpus pass) joined back
    // partkey-co-partitioned; the offset/cohort rollup lands on
    // ≤|months|×4 rows and the cohort-share window rides that bounded
    // frame (coverageCurve's window class). The distinct-part count in
    // the 3+ bucket dedups at the already-collapsed (cohort, offset,
    // part) grain.
    QueryDef(
      "q233_part_intro_ramp",
      (s, d) => {
        val pm = t(s, d, "lineitem")
          .select(date_trunc("month", col("l_shipdate")).cast("date")
            .as("m"), col("l_partkey"), revMicro.as("rm"))
          .groupBy(col("l_partkey"), col("m"))
          .agg(sum(col("rm").cast("decimal(38,0)")).as("rev"))
        // intro month as a per-part WINDOW MIN over pm instead of a
        // separate aggregate branch joined back (r14): the branch form
        // cloned the pm tower per consumer (diverged pruning, no
        // exchange reuse — lineitem scanned and collapsed TWICE,
        // PlanDump ranScans). The window partitions on l_partkey — a
        // part's months, ≤|months| rows per partition, q130's bounded
        // class — so one lineitem scan feeds everything. Output
        // unchanged (oracle hash-green).
        val cells = pm
          .withColumn("im",
            min(col("m")).over(Window.partitionBy(col("l_partkey"))))
          .select(date_format(col("im"), "yyyy-MM").as("cohort"),
            when(months_between(col("m"), col("im")) >= 3, lit("3+"))
              .otherwise(months_between(col("m"), col("im"))
                .cast("long").cast("string")).as("m_offset"),
            col("rev"), col("l_partkey"))
          .groupBy(col("cohort"), col("m_offset"))
          .agg(countDistinct(col("l_partkey")).cast("long").as("n_parts"),
            sum(col("rev")).as("revm"))
        val w = Window.partitionBy(col("cohort"))
        cells.select(col("cohort"), col("m_offset"), col("n_parts"),
          round(col("revm").cast("double") / 10000.0, 2).as("revenue"),
          round(col("revm").cast("double") /
            sum(col("revm")).over(w).cast("double"), 6).as("cohort_share"))
          .orderBy(col("cohort"), col("m_offset"))
      },
      Some(s"""WITH pm AS (SELECT l_partkey,
             |    date_trunc('month', CAST(l_shipdate AS DATE)) AS m,
             |    sum(CAST($revMicroSql AS HUGEINT)) AS rev
             |  FROM lineitem GROUP BY 1, 2),
             |intro AS (SELECT l_partkey, min(m) AS im FROM pm GROUP BY 1),
             |cells AS (SELECT strftime(im, '%Y-%m') AS cohort,
             |    CASE WHEN datediff('month', im, m) >= 3 THEN '3+'
             |      ELSE CAST(datediff('month', im, m) AS VARCHAR) END
             |      AS m_offset,
             |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             |    sum(rev) AS revm
             |  FROM pm JOIN intro USING (l_partkey) GROUP BY 1, 2)
             |SELECT cohort, m_offset, n_parts,
             |  round(CAST(revm AS DOUBLE)/10000.0, 2) AS revenue,
             |  round(CAST(revm AS DOUBLE) /
             |    CAST(sum(revm) OVER (PARTITION BY cohort) AS DOUBLE), 6)
             |    AS cohort_share
             |FROM cells ORDER BY cohort, m_offset""".stripMargin)),

    // ── q234: BRAND LOYALTY by market segment — each customer's line
    // purchases collapsed to the (customer, brand) grain, then per
    // customer: distinct brands, total lines, and the top brand's
    // share; per segment: customers, mean brand breadth (exact integer
    // ratio), the share of "loyal" customers (top brand ≥ half their
    // lines — the integer predicate mx·2 ≥ tot, no float compare), and
    // the exact median top-brand share. The assortment-BREADTH readout
    // next to q128's RFM value scores and q135's basket pairs: do
    // segments concentrate on one brand or spread. The median rides
    // per-customer shares QUANTIZED to integer micro-units BEFORE the
    // percentile (mx·10⁶ div tot — the q107/q241 discipline): a median
    // of raw float ratios has no terminating-decimal guarantee, so a
    // 1-ulp interpolation difference between engines could flip the
    // rounded digit (r9 ADVICE; the observed decimal-chain flake
    // class). Median of longs lands on k or k+0.5 micro — the display
    // /10⁶ terminates at 7 decimals, where rounding is tie-free.
    // q55's sketch is the named 100 TB twin.
    //
    // Scale shape: part dim joins partkey-co-partitioned (AQE
    // broadcast when small); ONE orderkey exchange reaches custkey;
    // the (customer, brand) collapse then the customer collapse are
    // successive grain reductions (brand count per customer is
    // domain-bounded); the customer dim join is custkey-co-partitioned
    // and the rollup lands on |segments| rows.
    QueryDef(
      "q234_brand_loyalty",
      (s, d) => {
        val cb = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"), col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n"))
        val pc = cb.groupBy(col("o_custkey"))
          .agg(sum(col("n")).cast("long").as("tot"),
            max(col("n")).cast("long").as("mx"),
            count(lit(1)).cast("long").as("n_brands"))
          .withColumn("sharem",
            expr("mx * CAST(1000000 AS BIGINT) DIV tot"))
        pc.join(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).cast("long").as("n_customers"),
            round(sum(col("n_brands")).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_brands"),
            round(count(when(col("mx") * 2 >= col("tot"), 1)).cast("double")
              / count(lit(1)).cast("double"), 6).as("loyal_share"),
            round(expr("percentile(sharem, 0.5)") / lit(1000000.0), 7)
              .as("p50_top_share"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""WITH cb AS (SELECT o_custkey, p_brand,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM lineitem
             |  JOIN part ON l_partkey = p_partkey
             |  JOIN orders ON l_orderkey = o_orderkey
             |  GROUP BY 1, 2),
             |pc AS (SELECT o_custkey, CAST(sum(n) AS BIGINT) AS tot,
             |    CAST(max(n) AS BIGINT) AS mx,
             |    CAST(count(*) AS BIGINT) AS n_brands
             |  FROM cb GROUP BY 1),
             |pr AS (SELECT *, (mx*1000000)//tot AS sharem FROM pc)
             |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
             |  round(CAST(sum(n_brands) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS avg_brands,
             |  round(CAST(count(*) FILTER (WHERE mx*2 >= tot) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS loyal_share,
             |  round(quantile_cont(sharem, 0.5)/1000000.0, 7)
             |    AS p50_top_share
             |FROM pr JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin)),

    // ── q235: BOILERPLATE POSITION screen — q229's 16-token prefix
    // fingerprint PLUS its suffix mirror (last 16 tokens), classified
    // per document into intro-only / footer-only / both duplicate
    // families: templated INTROS and boilerplate FOOTERS are the two
    // standard positional-duplication patterns, and the overlap tells
    // the curator whether one scrub rule or two are needed (q229
    // reports the prefix screen's families; this is the positional
    // JOINT distribution; q81 names the arbitrary-position passages at
    // shingle cost). Short docs (≤16 tokens) have prefix ≡ suffix by
    // construction and land in both/neither coherently in both
    // engines (the slice arithmetic is the SAME explicit formula on
    // each side — no negative-index dialect dependence).
    //
    // Scale shape: both fingerprints compute MAP-SIDE in codegen
    // (lower → split → filter → slice → concat_ws → md5), so text
    // never shuffles — only (doc_id, source, pfp, sfp) moves; each
    // family count is one fp-grain exchange; the two join-backs reuse
    // the fp keys; the rollup lands on |sources| rows.
    QueryDef(
      "q235_boilerplate_position",
      (s, d) => {
        val toks = filter(split(lower(col("text")), " "),
          tk => length(tk) > 0)
        val pfpC = md5(concat_ws(" ", slice(toks, lit(1), lit(16))))
        val sfpC = md5(concat_ws(" ", slice(toks,
          greatest(size(toks) - 15, lit(1)), lit(16))))
        // ONE text pass (the md5-of-full-text tokenize is the fat
        // step), zero joins: each doc's family sizes are
        // count-over-window partitioned by its own fingerprints — the
        // same two thin corpus exchanges the former census joins paid,
        // WITHOUT the two extra md5(text) scans the separate pf/sfm
        // groupBys planned (the r12 q305 duplicated-subtree class;
        // count-only unbounded frames sort-spill per fingerprint
        // family, the same memory story as the join's shuffle).
        val p = t(s, d, "documents")
          .select(col("source"), pfpC.as("pfp"), sfpC.as("sfp"))
        val wP = org.apache.spark.sql.expressions.Window
          .partitionBy(col("pfp"))
        val wS = org.apache.spark.sql.expressions.Window
          .partitionBy(col("sfp"))
        p.withColumn("pn", count(lit(1)).over(wP))
          .withColumn("sn", count(lit(1)).over(wS))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            count(when(col("pn") >= 2 && col("sn") < 2, 1)).cast("long")
              .as("intro_only"),
            count(when(col("sn") >= 2 && col("pn") < 2, 1)).cast("long")
              .as("footer_only"),
            count(when(col("pn") >= 2 && col("sn") >= 2, 1)).cast("long")
              .as("both_dup"),
            round(count(when(col("pn") >= 2 || col("sn") >= 2, 1))
              .cast("double") / count(lit(1)).cast("double"), 6)
              .as("either_share"))
          .orderBy(col("source"))
      },
      Some("""WITH tk AS (SELECT doc_id, source,
             |    list_filter(string_split(lower(text), ' '),
             |      x -> len(x) > 0) AS l
             |  FROM documents),
             |p AS (SELECT doc_id, source,
             |    md5(array_to_string(l[1:16], ' ')) AS pfp,
             |    md5(array_to_string(l[greatest(len(l)-15, 1):len(l)], ' '))
             |      AS sfp
             |  FROM tk),
             |pf AS (SELECT pfp, CAST(count(*) AS BIGINT) AS pn
             |  FROM p GROUP BY 1),
             |sf AS (SELECT sfp, CAST(count(*) AS BIGINT) AS sn
             |  FROM p GROUP BY 1)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(*) FILTER (WHERE pn >= 2 AND sn < 2) AS BIGINT)
             |    AS intro_only,
             |  CAST(count(*) FILTER (WHERE sn >= 2 AND pn < 2) AS BIGINT)
             |    AS footer_only,
             |  CAST(count(*) FILTER (WHERE pn >= 2 AND sn >= 2) AS BIGINT)
             |    AS both_dup,
             |  round(CAST(count(*) FILTER (WHERE pn >= 2 OR sn >= 2)
             |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS either_share
             |FROM p JOIN pf USING (pfp) JOIN sf USING (sfp)
             |GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── q236: monthly revenue by customer STATUS — each order labeled
    // by the customer's history at that moment: first-ever order,
    // active repeat (previous order ≤ 90 days back), or REACTIVATED
    // (gap > 90 days); per month × status: orders, exact revenue, and
    // the share of the month's revenue. The MONEY face of q226's
    // user-count growth accounting (does growth revenue come from
    // acquisition, habit, or win-back), next to q152's first-touch
    // attribution and q62's binary retention. Same-day order pairs
    // label deterministically through the (day, orderkey) window
    // total order — both engines run the identical spec.
    //
    // Scale shape: the status label is ONE per-customer lag window
    // (q130's bounded class) over the order grain — no corpus-wide
    // window, no self-join; the rollup lands on ≤|months|×3 rows and
    // the month-share window rides that bounded frame. Revenue is
    // exact integer cents (DECIMAL(38,0) sums) with one display
    // division.
    QueryDef(
      "q236_status_revenue",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("day"), col("o_orderkey"))
        val lab = t(s, d, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            epochDay(col("o_orderdate")).as("day"),
            date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            fxUnits(col("o_totalprice"), 100).as("cents"))
          .withColumn("prev", lag(col("day"), 1).over(w))
          .select(col("month"),
            when(col("prev").isNull, "a_first")
              .when(col("day") - col("prev") <= 90, "b_active")
              .otherwise("c_reactivated").as("status"),
            col("cents"))
        val agg = lab.groupBy(col("month"), col("status"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(col("cents").cast("decimal(38,0)")).as("rc"))
        val mw = Window.partitionBy(col("month"))
        agg.select(col("month"), col("status"), col("n_orders"),
          round(col("rc").cast("double") / 100.0, 2).as("revenue"),
          round(col("rc").cast("double") /
            sum(col("rc")).over(mw).cast("double"), 6).as("month_share"))
          .orderBy(col("month"), col("status"))
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderkey,
             |    CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
             |    strftime(o_orderdate, '%Y-%m') AS month,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
             |  FROM orders),
             |lab AS (SELECT month,
             |    CASE WHEN lag(day) OVER (PARTITION BY o_custkey
             |        ORDER BY day, o_orderkey) IS NULL THEN 'a_first'
             |      WHEN day - lag(day) OVER (PARTITION BY o_custkey
             |        ORDER BY day, o_orderkey) <= 90 THEN 'b_active'
             |      ELSE 'c_reactivated' END AS status,
             |    cents
             |  FROM o),
             |agg AS (SELECT month, status,
             |    CAST(count(*) AS BIGINT) AS n_orders,
             |    sum(CAST(cents AS HUGEINT)) AS rc
             |  FROM lab GROUP BY 1, 2)
             |SELECT month, status, n_orders,
             |  round(CAST(rc AS DOUBLE)/100.0, 2) AS revenue,
             |  round(CAST(rc AS DOUBLE) /
             |    CAST(sum(rc) OVER (PARTITION BY month) AS DOUBLE), 6)
             |    AS month_share
             |FROM agg ORDER BY month, status""".stripMargin)),

    // ── q237: DISCOUNT-BAND demand lift — line items bucketed by
    // discount percentage point (0, 1–2, 3–4, 5–6, 7–8, 9–10), per
    // band: lines, exact mean quantity, revenue, revenue share, and
    // the LIFT of mean quantity vs the zero-discount band: "does a
    // deeper discount actually move more units" — the banded
    // first-order answer the per-brand regression (q227) summarizes
    // away, and the promo-effect companion to q173's promo share.
    // Mean quantity derives from exact integer quantity-unit sums
    // with ONE mirrored operation chain; the lift divides the two
    // unrounded means (scale factors cancel) and rounds once.
    //
    // Scale shape: one map-side bucketing pass, moments accumulate
    // onto the ≤6-band grain; the baseline-band mean reaches every
    // row via an unbounded window over the ≤6-row aggregate (never
    // the corpus — coverageCurve's bounded-window class); revenue
    // micro-units sum as DECIMAL(38,0).
    QueryDef(
      "q237_discount_lift",
      (s, d) => {
        val pct = fxUnits(col("l_discount"), 100)
        val band = when(pct === 0, "d00").when(pct <= 2, "d01_02")
          .when(pct <= 4, "d03_04").when(pct <= 6, "d05_06")
          .when(pct <= 8, "d07_08").otherwise("d09_10")
        val agg = t(s, d, "lineitem")
          .select(band.as("band"), fxUnits(col("l_quantity"), 100).as("qu"),
            revMicro.as("rm"))
          .groupBy(col("band"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(col("qu").cast("decimal(38,0)")).as("sq"),
            sum(col("rm").cast("decimal(38,0)")).as("rc"))
        val aq = col("sq").cast("double") / col("n_lines").cast("double")
        val all = Window.partitionBy(lit(1))
        agg.withColumn("aq", aq)
          .withColumn("aq0", max(when(col("band") === "d00", aq)).over(all))
          .select(col("band"), col("n_lines"),
            round(col("aq") / 100.0, 6).as("avg_qty"),
            round(col("rc").cast("double") / 10000.0, 2).as("revenue"),
            round(col("rc").cast("double") /
              sum(col("rc")).over(all).cast("double"), 6).as("rev_share"),
            round(col("aq") / col("aq0"), 6).as("qty_lift"))
          .orderBy(col("band"))
      },
      Some(s"""WITH li AS (SELECT
             |    CASE WHEN CAST(round(l_discount*100) AS BIGINT) = 0
             |        THEN 'd00'
             |      WHEN CAST(round(l_discount*100) AS BIGINT) <= 2
             |        THEN 'd01_02'
             |      WHEN CAST(round(l_discount*100) AS BIGINT) <= 4
             |        THEN 'd03_04'
             |      WHEN CAST(round(l_discount*100) AS BIGINT) <= 6
             |        THEN 'd05_06'
             |      WHEN CAST(round(l_discount*100) AS BIGINT) <= 8
             |        THEN 'd07_08'
             |      ELSE 'd09_10' END AS band,
             |    CAST(round(l_quantity*100) AS BIGINT) AS qu,
             |    CAST($revMicroSql AS HUGEINT) AS rm
             |  FROM lineitem),
             |agg AS (SELECT band, CAST(count(*) AS BIGINT) AS n_lines,
             |    sum(CAST(qu AS HUGEINT)) AS sq, sum(rm) AS rc
             |  FROM li GROUP BY 1),
             |e AS (SELECT *, CAST(sq AS DOUBLE)/CAST(n_lines AS DOUBLE)
             |    AS aq FROM agg),
             |b AS (SELECT *, max(CASE WHEN band = 'd00' THEN aq END)
             |    OVER () AS aq0,
             |    sum(rc) OVER () AS tot FROM e)
             |SELECT band, n_lines, round(aq/100.0, 6) AS avg_qty,
             |  round(CAST(rc AS DOUBLE)/10000.0, 2) AS revenue,
             |  round(CAST(rc AS DOUBLE)/CAST(tot AS DOUBLE), 6)
             |    AS rev_share,
             |  round(aq/aq0, 6) AS qty_lift
             |FROM b ORDER BY band""".stripMargin)),

    // ── q238: BASKET-SIZE profile — orders bucketed by line count
    // (1…6, 7+), per bucket: orders, exact mean order value, total
    // revenue, revenue share: "how much of the business rides small
    // vs large baskets" — the size-marginal q135's pair mining
    // conditions on, and the order-grain companion to q127's customer
    // concentration. Mean order value derives as (Σrevenue / orders)
    // in ONE mirrored chain from exact DECIMAL(38,0) micro-unit sums.
    //
    // Scale shape: lineitem collapses ONCE to the orderkey grain
    // (count + revenue in the same aggregate); the bucket rollup
    // lands on ≤7 rows; the share window rides that bounded frame.
    QueryDef(
      "q238_basket_profile",
      (s, d) => {
        val per = t(s, d, "lineitem")
          .select(col("l_orderkey"), revMicro.as("rm"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(col("rm").cast("decimal(38,0)")).as("rc"))
        val bucket = when(col("n_lines") >= 7, "b7plus")
          .otherwise(concat(lit("b"), col("n_lines")))
        val agg = per.select(bucket.as("bucket"), col("rc"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(col("rc")).as("rc"))
        val all = Window.partitionBy(lit(1))
        agg.select(col("bucket"), col("n_orders"),
          round(col("rc").cast("double") / col("n_orders").cast("double")
            / 10000.0, 2).as("avg_order_value"),
          round(col("rc").cast("double") / 10000.0, 2).as("revenue"),
          round(col("rc").cast("double") /
            sum(col("rc")).over(all).cast("double"), 6).as("rev_share"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH per AS (SELECT l_orderkey,
             |    CAST(count(*) AS BIGINT) AS n_lines,
             |    sum(CAST($revMicroSql AS HUGEINT)) AS rc
             |  FROM lineitem GROUP BY 1),
             |agg AS (SELECT CASE WHEN n_lines >= 7 THEN 'b7plus'
             |      ELSE 'b' || CAST(n_lines AS VARCHAR) END AS bucket,
             |    CAST(count(*) AS BIGINT) AS n_orders,
             |    sum(rc) AS rc
             |  FROM per GROUP BY 1)
             |SELECT bucket, n_orders,
             |  round(CAST(rc AS DOUBLE)/CAST(n_orders AS DOUBLE)/10000.0,
             |    2) AS avg_order_value,
             |  round(CAST(rc AS DOUBLE)/10000.0, 2) AS revenue,
             |  round(CAST(rc AS DOUBLE)/CAST(sum(rc) OVER () AS DOUBLE),
             |    6) AS rev_share
             |FROM agg ORDER BY bucket""".stripMargin)),

    // ── q239: HAPAX / type-token vocabulary profile per source —
    // tokens, distinct types, type-token ratio, and the count+share
    // of types that are corpus-wide hapax legomena (global frequency
    // exactly 1 — such a type lives entirely inside one source):
    // the vocabulary-HEALTH readout next to q107's entropy, q115's
    // cross-source overlap, and q123's rare-token docs — a high
    // hapax share flags noisy/OCR-damaged text, a low one flags
    // templated text. Hapax status is decided on the GLOBAL token
    // grain, then re-attributed to the owning source.
    //
    // Scale shape: q59/q115's vocabulary discipline — tokens
    // aggregate at the (source, token) grain in one exchange, the
    // global re-aggregate rides the token grain (both
    // vocabulary-bounded, never collected); the join-back reuses the
    // token key; the rollup lands on |sources| rows.
    QueryDef(
      "q239_hapax_share",
      (s, d) => {
        val tc = t(s, d, "documents")
          .select(col("source"), explode(filter(
            split(lower(col("text")), " "), tk => length(tk) > 0))
            .as("token"))
          .groupBy(col("source"), col("token"))
          .agg(count(lit(1)).cast("long").as("cnt"))
        val g = tc.groupBy(col("token"))
          .agg(sum(col("cnt")).cast("long").as("gcnt"))
        tc.join(g, Seq("token"))
          .groupBy(col("source"))
          .agg(sum(col("cnt")).cast("long").as("n_tokens"),
            count(lit(1)).cast("long").as("n_types"),
            round(count(lit(1)).cast("double") /
              sum(col("cnt")).cast("double"), 6).as("ttr"),
            count(when(col("gcnt") === 1, 1)).cast("long")
              .as("hapax_types"),
            round(count(when(col("gcnt") === 1, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("hapax_type_share"))
          .orderBy(col("source"))
      },
      Some("""WITH tc AS (SELECT source, t.token,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM documents,
             |    unnest(list_filter(string_split(lower(text), ' '),
             |      x -> len(x) > 0)) AS t(token)
             |  GROUP BY 1, 2),
             |g AS (SELECT token, CAST(sum(cnt) AS BIGINT) AS gcnt
             |  FROM tc GROUP BY 1)
             |SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
             |  CAST(count(*) AS BIGINT) AS n_types,
             |  round(CAST(count(*) AS DOUBLE)/CAST(sum(cnt) AS DOUBLE), 6)
             |    AS ttr,
             |  CAST(count(*) FILTER (WHERE gcnt = 1) AS BIGINT)
             |    AS hapax_types,
             |  round(CAST(count(*) FILTER (WHERE gcnt = 1) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS hapax_type_share
             |FROM tc JOIN g USING (token)
             |GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── q240: nation ASSORTMENT overlap — for each nation pair, the
    // Jaccard of the part sets their suppliers ship: "do two nations
    // sell the same catalogue or complementary ones" — the
    // assortment-similarity face of the trade graph (q196 weighs
    // bilateral VOLUME, q208 profiles the graph structure; this
    // compares what's ON OFFER). Only pairs sharing ≥1 part appear
    // (an absent pair means zero overlap — both engines agree);
    // pairs are unordered, named (a < b) by nation name.
    //
    // Scale shape (r14 single-scan rewrite): the former shape branched
    // the distinct (nation, part) frame three ways — a size aggregate
    // plus both sides of the partkey self-join. The SELF-JOIN sides
    // are identical plans, so AQE exchange reuse already ran them off
    // one scan; the size branch pruned partkey away, fell out of
    // reuse, and re-executed the whole corpus tower (finalized-plan
    // ranScans: lineitem×2). The join now keeps the DIAGONAL
    // (nat_a <= nat_b): the (a,a) row's count IS nation a's
    // assortment size, so na/nb come from windows over the
    // ≤|nations|²-row pair aggregate (q130's dimension-bounded class)
    // and the size branch disappears — one lineitem scan, per-part
    // join fanout still ≤|nations|, no object aggregate (a collect_
    // set variant was tried and measured +40% locally: ObjectHash-
    // Aggregate beats codegen dedup only above the scan it saves).
    // Output unchanged (oracle hash-green).
    QueryDef(
      "q240_assortment_overlap",
      (s, d) => {
        val np = t(s, d, "lineitem")
          .select(col("l_suppkey"), col("l_partkey"))
          .join(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("n_name").as("nat"), col("l_partkey").as("pk"))
          .distinct()
        val a = np.toDF("nat_a", "pk")
        val b = np.toDF("nat_b", "pk")
        val agg = a.join(b, Seq("pk"))
          .filter(col("nat_a") <= col("nat_b"))
          .groupBy(col("nat_a"), col("nat_b"))
          .agg(count(lit(1)).cast("long").as("n_common"))
        val diag = max(when(col("nat_a") === col("nat_b"),
          col("n_common")))
        agg
          .withColumn("na", diag.over(Window.partitionBy(col("nat_a"))))
          .withColumn("nb", diag.over(Window.partitionBy(col("nat_b"))))
          .filter(col("nat_a") < col("nat_b"))
          .select(col("nat_a"), col("nat_b"), col("na"), col("nb"),
            col("n_common"),
            round(col("n_common").cast("double") /
              (col("na") + col("nb") - col("n_common")).cast("double"), 6)
              .as("jaccard"))
          .orderBy(col("nat_a"), col("nat_b"))
      },
      Some("""WITH np AS (SELECT DISTINCT n_name AS nat, l_partkey AS pk
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey),
             |sz AS (SELECT nat, CAST(count(*) AS BIGINT) AS n_parts
             |  FROM np GROUP BY 1),
             |com AS (SELECT a.nat AS nat_a, b.nat AS nat_b,
             |    CAST(count(*) AS BIGINT) AS n_common
             |  FROM np a JOIN np b ON a.pk = b.pk AND a.nat < b.nat
             |  GROUP BY 1, 2)
             |SELECT nat_a, nat_b, sa.n_parts AS na, sb.n_parts AS nb,
             |  n_common,
             |  round(CAST(n_common AS DOUBLE) /
             |    CAST(sa.n_parts + sb.n_parts - n_common AS DOUBLE), 6)
             |    AS jaccard
             |FROM com
             |JOIN sz sa ON sa.nat = nat_a
             |JOIN sz sb ON sb.nat = nat_b
             |ORDER BY nat_a, nat_b""".stripMargin)),

    // ── q241: label CENTROID similarity matrix — pairwise cosine of
    // per-label centroid embeddings: "are two labels' populations
    // separable or near-collinear" — the between-CLASS readout next to
    // q79's within-cluster composition, q131's temporal drift, and
    // q88's per-point kNN eval. EXACT cross-engine: each component
    // quantizes map-side to integer micro-units (round(v·10⁶) — the
    // q107 quantization discipline applied to vectors), centroid SUMS
    // accumulate as exact integers (cosine is scale-invariant, so the
    // sum stands in for the mean with no float division), and
    // dot/norms are integer products summed in DECIMAL(38,0) (a
    // 10¹⁰-vector label's per-dim sum is ~10¹⁶; products cross 2⁶³)
    // with ONE mirrored double chain at the end.
    //
    // Scale shape: posexplode fans each vector to (label, dim) —
    // map-side partial aggregation collapses to the |labels|×dim
    // grain before the only exchange; the pair enumeration joins
    // centroids on dim with fanout |labels|²; everything downstream
    // rides ≤|labels|²·dim rows — dimension-bounded.
    QueryDef(
      "q241_label_centroid_sim",
      (s, d) => {
        val cent = t(s, d, "embeddings")
          .select(col("label"), posexplode(col("embedding")))
          .select(col("label"), col("pos").as("i"),
            round(col("col").cast("double") * 1000000).cast("long").as("q"))
          .groupBy(col("label"), col("i"))
          .agg(sum(col("q")).cast("long").as("c"))
        val sz = t(s, d, "embeddings").groupBy(col("label"))
          .agg(count(lit(1)).cast("long").as("n"))
        val a = cent.toDF("label_a", "i", "ca")
        val b = cent.toDF("label_b", "i", "cb")
        val cad = col("ca").cast("decimal(19,0)")
        val cbd = col("cb").cast("decimal(19,0)")
        val p = a.join(b, Seq("i"))
          .filter(col("label_a") < col("label_b"))
          .groupBy(col("label_a"), col("label_b"))
          .agg(sum((cad * cbd).cast("decimal(38,0)")).as("dot"),
            sum((cad * cad).cast("decimal(38,0)")).as("na"),
            sum((cbd * cbd).cast("decimal(38,0)")).as("nb"))
        p.join(sz.toDF("label_a", "n_a"), Seq("label_a"))
          .join(sz.toDF("label_b", "n_b"), Seq("label_b"))
          .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
            round(col("dot").cast("double") /
              (sqrt(col("na").cast("double")) *
                sqrt(col("nb").cast("double"))), 6).as("cos_sim"))
          .orderBy(col("label_a"), col("label_b"))
      },
      Some("""WITH comp AS (SELECT label,
             |    generate_subscripts(embedding, 1) AS i,
             |    CAST(round(CAST(unnest(embedding) AS DOUBLE)*1000000)
             |      AS BIGINT) AS q
             |  FROM embeddings),
             |cent AS (SELECT label, i, CAST(sum(q) AS BIGINT) AS c
             |  FROM comp GROUP BY 1, 2),
             |sz AS (SELECT label, CAST(count(*) AS BIGINT) AS n
             |  FROM embeddings GROUP BY 1),
             |p AS (SELECT a.label AS label_a, b.label AS label_b,
             |    sum(CAST(a.c AS HUGEINT)*b.c) AS dot,
             |    sum(CAST(a.c AS HUGEINT)*a.c) AS na,
             |    sum(CAST(b.c AS HUGEINT)*b.c) AS nb
             |  FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
             |  GROUP BY 1, 2)
             |SELECT label_a, label_b, sa.n AS n_a, sb.n AS n_b,
             |  round(CAST(dot AS DOUBLE) /
             |    (sqrt(CAST(na AS DOUBLE))*sqrt(CAST(nb AS DOUBLE))), 6)
             |    AS cos_sim
             |FROM p JOIN sz sa ON sa.label = p.label_a
             |JOIN sz sb ON sb.label = p.label_b
             |ORDER BY label_a, label_b""".stripMargin)),

    // ── q242: SESSION DEPTH vs value — q35's sessions (2 h
    // inactivity gap, the ONE shared definition) bucketed by event
    // depth (1, 2–3, 4–9, 10+), per bucket: sessions, events, exact
    // total value, value share, and mean value per session: "do long
    // sessions carry the money" — the engagement-DEPTH face of q105's
    // path shapes and q126's time-to-convert. Value is exact integer
    // cents; the mean derives in ONE mirrored chain.
    //
    // Scale shape: the sessionize window is PER-USER (q35/q130's
    // bounded class); sessions collapse in the same pass (count +
    // value in one aggregate); the bucket rollup lands on ≤4 rows
    // and the share window rides that frame.
    QueryDef(
      "q242_session_depth_value",
      (s, d) => {
        val gapUs = 7200000000L // 2h — q35's shared gap rule
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val sess = t(s, d, "events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("vu", fxUnits(col("value"), 100))
          .withColumn("new_sess",
            when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L)
              .otherwise(0L))
          .withColumn("session_id",
            sum(col("new_sess")).over(
              w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            sum(col("vu").cast("decimal(38,0)")).as("sv"))
        val bucket = when(col("n_events") === 1, "d01")
          .when(col("n_events") <= 3, "d02_03")
          .when(col("n_events") <= 9, "d04_09")
          .otherwise("d10plus")
        val agg = sess.select(bucket.as("depth"), col("n_events"), col("sv"))
          .groupBy(col("depth"))
          .agg(count(lit(1)).cast("long").as("n_sessions"),
            sum(col("n_events")).cast("long").as("n_events"),
            sum(col("sv")).as("sv"))
        val all = Window.partitionBy(lit(1))
        agg.select(col("depth"), col("n_sessions"), col("n_events"),
          round(col("sv").cast("double") / 100.0, 2).as("total_value"),
          round(col("sv").cast("double") /
            sum(col("sv")).over(all).cast("double"), 6).as("value_share"),
          round(col("sv").cast("double") /
            col("n_sessions").cast("double") / 100.0, 6)
            .as("avg_session_value"))
          .orderBy(col("depth"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             |    CAST(round(value*100) AS BIGINT) AS vu FROM events),
             |m AS (SELECT user_id, vu, CASE WHEN ts_us - lag(ts_us)
             |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
             |      > 7200000000 THEN 1 ELSE 0 END AS new_sess,
             |    ts_us, event_id
             |  FROM e),
             |sess0 AS (SELECT user_id, vu,
             |    sum(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
             |      AS session_id
             |  FROM m),
             |sess AS (SELECT user_id, session_id,
             |    CAST(count(*) AS BIGINT) AS n_events,
             |    sum(CAST(vu AS HUGEINT)) AS sv
             |  FROM sess0 GROUP BY 1, 2),
             |agg AS (SELECT CASE WHEN n_events = 1 THEN 'd01'
             |      WHEN n_events <= 3 THEN 'd02_03'
             |      WHEN n_events <= 9 THEN 'd04_09'
             |      ELSE 'd10plus' END AS depth,
             |    CAST(count(*) AS BIGINT) AS n_sessions,
             |    CAST(sum(n_events) AS BIGINT) AS n_events,
             |    sum(sv) AS sv
             |  FROM sess GROUP BY 1)
             |SELECT depth, n_sessions, n_events,
             |  round(CAST(sv AS DOUBLE)/100.0, 2) AS total_value,
             |  round(CAST(sv AS DOUBLE)/CAST(sum(sv) OVER () AS DOUBLE),
             |    6) AS value_share,
             |  round(CAST(sv AS DOUBLE)/CAST(n_sessions AS DOUBLE)/100.0,
             |    6) AS avg_session_value
             |FROM agg ORDER BY depth""".stripMargin)),

    // ── q243: BRAND PRICE DISPERSION — per brand over its parts'
    // retail prices: count, exact mean, coefficient of variation in
    // the algebraically-reduced form cv = √(n·Σx² − (Σx)²)/Σx (the
    // population CV — every factor of the integer-cent scale cancels,
    // so the only float ops are one sqrt and one division), exact
    // p25/p50/p75, and the max/min range ratio: "is the brand's
    // pricing disciplined or scattered" — the catalogue-side spread
    // screen next to q227's demand slope and q93's generic column
    // profile. Moments are exact integer cents in DECIMAL(38,0).
    //
    // Scale shape: part collapses map-side onto the |brands| grain in
    // one aggregate (moments + min/max + the exact percentiles whose
    // buffers are bounded by parts-per-brand — q41's exact-baseline
    // class, q55's sketch the named twin at open-ended cardinality).
    QueryDef(
      "q243_brand_price_dispersion",
      (s, d) => {
        val m = t(s, d, "part")
          .select(col("p_brand"), fxUnits(col("p_retailprice"), 100)
            .as("xc"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_parts"),
            sum(col("xc").cast("decimal(38,0)")).as("sx"),
            sum((col("xc").cast("decimal(19,0)") *
              col("xc").cast("decimal(19,0)")).cast("decimal(38,0)"))
              .as("sxx"),
            min(col("xc")).as("mn"), max(col("xc")).as("mx"),
            expr("percentile(xc, 0.25)").as("p25r"),
            expr("percentile(xc, 0.5)").as("p50r"),
            expr("percentile(xc, 0.75)").as("p75r"))
        val nD = col("n_parts").cast("double")
        val sxD = col("sx").cast("double")
        m.filter(col("n_parts") >= 2)
          .select(col("p_brand").as("brand"), col("n_parts"),
            round(sxD / nD / 100.0, 2).as("mean_price"),
            round(sqrt(nD * col("sxx").cast("double") - sxD * sxD) / sxD,
              6).as("cv"),
            // 4 decimals, not 2: quartiles of integer cents terminate
            // at quarter-cent fractions — round2 would land the
            // half-cent case on the tie digit where the two engines'
            // rounding modes disagree (q246's measured lesson)
            round(col("p25r") / 100.0, 4).as("p25"),
            round(col("p50r") / 100.0, 4).as("p50"),
            round(col("p75r") / 100.0, 4).as("p75"),
            round(col("mx").cast("double") / col("mn").cast("double"), 6)
              .as("range_ratio"))
          .orderBy(col("brand"))
      },
      Some("""WITH px AS (SELECT p_brand,
             |    CAST(round(p_retailprice*100) AS BIGINT) AS xc
             |  FROM part),
             |m AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
             |    sum(CAST(xc AS HUGEINT)) AS sx,
             |    sum(CAST(xc AS HUGEINT)*xc) AS sxx,
             |    min(xc) AS mn, max(xc) AS mx,
             |    quantile_cont(xc, 0.25) AS p25r,
             |    quantile_cont(xc, 0.5) AS p50r,
             |    quantile_cont(xc, 0.75) AS p75r
             |  FROM px GROUP BY 1)
             |SELECT p_brand AS brand, n_parts,
             |  round(CAST(sx AS DOUBLE)/CAST(n_parts AS DOUBLE)/100.0, 2)
             |    AS mean_price,
             |  round(sqrt(CAST(n_parts AS DOUBLE)*CAST(sxx AS DOUBLE)
             |    - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
             |    / CAST(sx AS DOUBLE), 6) AS cv,
             |  round(p25r/100.0, 4) AS p25,
             |  round(p50r/100.0, 4) AS p50,
             |  round(p75r/100.0, 4) AS p75,
             |  round(CAST(mx AS DOUBLE)/CAST(mn AS DOUBLE), 6)
             |    AS range_ratio
             |FROM m WHERE n_parts >= 2
             |ORDER BY brand""".stripMargin)),

    // ── q244: NUMERIC-DENSITY screen — per source: the share of
    // numeric tokens (pure digit/punctuation number shapes) across
    // the corpus (exact ratio of integer token sums) and the
    // count+share of "table-like" docs (more than half their tokens
    // numeric — integer predicate 2·num > tok): price lists, CSV
    // dumps, and scoreboard pages that survive q31's
    // punctuation/stopword screens but add little language signal —
    // a standard curation cut the quality score family doesn't
    // express. The regex is the simple digit class both engines'
    // regex dialects agree on (q32's cross-engine regex precedent).
    //
    // Scale shape: both counts compute MAP-SIDE in codegen (split →
    // filter → size — text never shuffles, only three integers per
    // doc move); the rollup lands on |sources| rows.
    QueryDef(
      "q244_numeric_density",
      (s, d) => {
        val toks = filter(split(lower(col("text")), " "),
          tk => length(tk) > 0)
        val nums = filter(toks, tk => tk.rlike("^[0-9][0-9.,%]*$"))
        val per = t(s, d, "documents")
          .select(col("source"), size(toks).cast("long").as("n_tok"),
            size(nums).cast("long").as("n_num"))
        per.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_tok")).cast("long").as("n_tokens"),
            round(sum(col("n_num")).cast("double") /
              sum(col("n_tok")).cast("double"), 6).as("numeric_share"),
            count(when(col("n_tok") > 0 &&
              col("n_num") * 2 > col("n_tok"), 1)).cast("long")
              .as("table_docs"),
            round(count(when(col("n_tok") > 0 &&
              col("n_num") * 2 > col("n_tok"), 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("table_share"))
          .orderBy(col("source"))
      },
      Some("""WITH per AS (SELECT source,
             |    CAST(len(list_filter(string_split(lower(text), ' '),
             |      x -> len(x) > 0)) AS BIGINT) AS n_tok,
             |    CAST(len(list_filter(string_split(lower(text), ' '),
             |      x -> regexp_matches(x, '^[0-9][0-9.,%]*$')))
             |      AS BIGINT) AS n_num
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
             |  round(CAST(sum(n_num) AS DOUBLE)/CAST(sum(n_tok) AS DOUBLE),
             |    6) AS numeric_share,
             |  CAST(count(*) FILTER (WHERE n_tok > 0 AND n_num*2 > n_tok)
             |    AS BIGINT) AS table_docs,
             |  round(CAST(count(*) FILTER (WHERE n_tok > 0
             |    AND n_num*2 > n_tok) AS DOUBLE)/CAST(count(*) AS DOUBLE),
             |    6) AS table_share
             |FROM per GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── q245: HOUR-OF-DAY activity profile — per event type: events,
    // the peak hour (UTC; ties to the earliest hour), its share, and
    // the Shannon entropy of the 24-bin hour histogram (log e):
    // "is this event type an always-on heartbeat (entropy → log 24)
    // or a burst tied to a daily cycle" — the INTRADAY face of q124's
    // day-of-week seasonality and q106's calendar density. Entropy
    // follows q107's integer micro-unit quantization exactly: each
    // bin's log-cost quantizes once, the Σc·cost accumulates as an
    // exact integer, and the final H = ln N − Σ/(N·10⁶) is one
    // mirrored double chain — no order-dependent float sums.
    //
    // Scale shape: counts collapse map-side onto the ≤|types|×24
    // grain in one exchange; the peak pick is a window over each
    // type's ≤24 rows (bounded-window class); entropy sums ride the
    // same bounded frame.
    QueryDef(
      "q245_hour_profile",
      (s, d) => {
        val hc = t(s, d, "events")
          .select(col("event_type"), hour(col("ts")).as("hr"))
          .groupBy(col("event_type"), col("hr"))
          .agg(count(lit(1)).cast("long").as("c"))
          .withColumn("cost",
            round(lit(1000000.0) * log(col("c").cast("double")))
              .cast("long"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("c").desc, col("hr"))
        val ranked = hc.withColumn("rk", row_number().over(w))
        val agg = ranked.groupBy(col("event_type"))
          .agg(sum(col("c")).cast("long").as("n_events"),
            max(when(col("rk") === 1, col("hr"))).cast("long")
              .as("peak_hour"),
            max(when(col("rk") === 1, col("c"))).as("peak_c"),
            sum((col("c").cast("decimal(19,0)") *
              col("cost").cast("decimal(19,0)")).cast("decimal(38,0)"))
              .as("num"))
        agg.select(col("event_type"), col("n_events"), col("peak_hour"),
          round(col("peak_c").cast("double") /
            col("n_events").cast("double"), 6).as("peak_share"),
          round(log(col("n_events").cast("double")) -
            col("num").cast("double") /
              (col("n_events").cast("double") * lit(1000000.0)), 6)
            .as("hour_entropy"))
          .orderBy(col("event_type"))
      },
      Some("""WITH hc AS (SELECT event_type, hour(ts) AS hr,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |cc AS (SELECT *, CAST(round(1000000.0*ln(CAST(c AS DOUBLE)))
             |      AS BIGINT) AS cost,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY c DESC, hr) AS rk
             |  FROM hc),
             |agg AS (SELECT event_type,
             |    CAST(sum(c) AS BIGINT) AS n_events,
             |    max(CASE WHEN rk = 1 THEN hr END) AS peak_hour,
             |    max(CASE WHEN rk = 1 THEN c END) AS peak_c,
             |    sum(CAST(c AS HUGEINT)*cost) AS num
             |  FROM cc GROUP BY 1)
             |SELECT event_type, n_events, peak_hour,
             |  round(CAST(peak_c AS DOUBLE)/CAST(n_events AS DOUBLE), 6)
             |    AS peak_share,
             |  round(ln(CAST(n_events AS DOUBLE)) -
             |    CAST(num AS DOUBLE)/(CAST(n_events AS DOUBLE)*1000000.0),
             |    6) AS hour_entropy
             |FROM agg ORDER BY event_type""".stripMargin)),

    // ── q246: TYPICAL-ORDER trend — monthly exact p25/median/p75 of
    // order value plus the month-over-month change of the UNROUNDED
    // median: "is the typical order growing" — the robust-center
    // companion to q129's mean-based top movers and q163's WoW sums
    // (a mean trend can be one whale; the median trend is the
    // customer-typical story). Percentile interpolation runs on exact
    // integer cents; the MoM delta subtracts unrounded medians and
    // rounds once — both engines run the identical chain.
    //
    // Scale shape: orders collapse onto the |months| grain in one
    // exchange (the exact per-month percentile buffers bound by
    // orders-per-month — q41's exact-baseline class, q55's sketch the
    // named twin); the MoM lag rides the |months|-row aggregate
    // (bounded-window class).
    QueryDef(
      "q246_median_order_trend",
      (s, d) => {
        val m = t(s, d, "orders")
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            fxUnits(col("o_totalprice"), 100).as("cents"))
          .groupBy(col("month"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            expr("percentile(cents, 0.25)").as("p25r"),
            expr("percentile(cents, 0.5)").as("p50r"),
            expr("percentile(cents, 0.75)").as("p75r"))
        // display at 4 decimals, not 2: a quartile of integer cents
        // interpolates on quarter-cent fractions, so the true value
        // TERMINATES at the 4th decimal and neither engine faces a
        // round-half tie — round(…, 2) would put the half-cent case
        // (…395) exactly on the tie digit, where Spark's
        // decimal-string rounding and DuckDB's binary-double rounding
        // legitimately disagree by one ulp (measured at sf0.01)
        val w = Window.partitionBy(lit(1)).orderBy(col("month"))
        m.withColumn("prev50", lag(col("p50r"), 1).over(w))
          .select(col("month"), col("n_orders"),
            round(col("p25r") / 100.0, 4).as("p25"),
            round(col("p50r") / 100.0, 4).as("p50"),
            round(col("p75r") / 100.0, 4).as("p75"),
            round((col("p50r") - col("prev50")) / 100.0, 4)
              .as("mom_change"))
          .orderBy(col("month"))
      },
      Some("""WITH o AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
             |  FROM orders),
             |m AS (SELECT month, CAST(count(*) AS BIGINT) AS n_orders,
             |    quantile_cont(cents, 0.25) AS p25r,
             |    quantile_cont(cents, 0.5) AS p50r,
             |    quantile_cont(cents, 0.75) AS p75r
             |  FROM o GROUP BY 1)
             |SELECT month, n_orders,
             |  round(p25r/100.0, 4) AS p25,
             |  round(p50r/100.0, 4) AS p50,
             |  round(p75r/100.0, 4) AS p75,
             |  round((p50r - lag(p50r) OVER (ORDER BY month))/100.0, 4)
             |    AS mom_change
             |FROM m ORDER BY month""".stripMargin)),

    // ── q247: SCRIPT-MIX screen — per declared language: docs, total
    // characters, the non-ASCII character share (exact integer
    // ratio), and the count+share of PURE-ASCII docs: a
    // Latin-script-only doc declared as a non-Latin language (or the
    // reverse) is the classic lang-LABEL inconsistency that q30's
    // n-gram detector and q122's confusion matrix read
    // statistically — this is the one-scan character-class ground
    // truth next to them, and an encoding-damage (mojibake) screen
    // per source corpus. The character class `[^ -~]` (printable
    // ASCII complement) is literal-range regex both engines' dialects
    // agree on (q32's cross-engine regex precedent).
    //
    // Scale shape: both counts compute MAP-SIDE in codegen (length +
    // one regexp_replace length diff — text never shuffles, three
    // integers per doc move); the rollup lands on |langs| rows.
    QueryDef(
      "q247_script_mix",
      (s, d) => {
        val chars = length(col("text")).cast("long")
        val ascii = length(regexp_replace(col("text"), "[^ -~]", ""))
          .cast("long")
        val per = t(s, d, "documents")
          .select(col("lang"), chars.as("n_chars"),
            (chars - ascii).as("n_non_ascii"))
        per.groupBy(col("lang"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_chars")).cast("long").as("n_chars"),
            round(sum(col("n_non_ascii")).cast("double") /
              sum(col("n_chars")).cast("double"), 6)
              .as("non_ascii_share"),
            count(when(col("n_non_ascii") === 0, 1)).cast("long")
              .as("pure_ascii_docs"),
            round(count(when(col("n_non_ascii") === 0, 1)).cast("double")
              / count(lit(1)).cast("double"), 6).as("pure_ascii_share"))
          .orderBy(col("lang"))
      },
      Some("""WITH per AS (SELECT lang,
             |    CAST(len(text) AS BIGINT) AS n_chars,
             |    CAST(len(text) - len(regexp_replace(text, '[^ -~]', '',
             |      'g')) AS BIGINT) AS n_non_ascii
             |  FROM documents)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
             |  round(CAST(sum(n_non_ascii) AS DOUBLE)
             |    / CAST(sum(n_chars) AS DOUBLE), 6) AS non_ascii_share,
             |  CAST(count(*) FILTER (WHERE n_non_ascii = 0) AS BIGINT)
             |    AS pure_ascii_docs,
             |  round(CAST(count(*) FILTER (WHERE n_non_ascii = 0)
             |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             |    AS pure_ascii_share
             |FROM per GROUP BY 1 ORDER BY lang""".stripMargin)),

    // ── q248: LINE-NUMBER contiguity audit — per order, is
    // l_linenumber the dense 1…n sequence the schema promises?
    // Bucketed by line count (q238's buckets): orders, contiguous
    // orders (max = count = distinct — the integer three-way test),
    // gapped (max > count), duplicated (distinct < count), and the
    // contiguous share: the ORDER-STRUCTURE face of the DQ family
    // (q101 audits FK edges, q117 reconciles order totals, q194
    // audits out-of-order events — none reads the line sequence
    // itself). The synthetic fixture draws line numbers randomly in
    // 1..7, so the audit reports REAL gap/duplicate mass here; on a
    // production warehouse the expectation is 100% contiguous and
    // any other reading is a loader defect (q101's audit class).
    // Law (spec-pinned): contiguous ⟺ ¬gapped ∧ ¬duplicated, since
    // distinct = count forces max = count when max ≤ count.
    //
    // Scale shape: lineitem collapses ONCE to the orderkey grain
    // (count + max + distinct-count in one aggregate — the distinct
    // rides the per-order line numbers, domain-bounded); the bucket
    // rollup lands on ≤7 rows.
    QueryDef(
      "q248_linenumber_audit",
      (s, d) => {
        val per = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).cast("long").as("cnt"),
            max(col("l_linenumber")).cast("long").as("mx"),
            countDistinct(col("l_linenumber")).cast("long").as("dn"))
        val bucket = when(col("cnt") >= 7, "b7plus")
          .otherwise(concat(lit("b"), col("cnt")))
        val contig = col("mx") === col("cnt") && col("dn") === col("cnt")
        per.select(bucket.as("bucket"), col("cnt"), col("mx"), col("dn"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            count(when(contig, 1)).cast("long").as("n_contiguous"),
            count(when(col("mx") > col("cnt"), 1)).cast("long")
              .as("n_gapped"),
            count(when(col("dn") < col("cnt"), 1)).cast("long")
              .as("n_duplicated"),
            round(count(when(contig, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("contig_share"))
          .orderBy(col("bucket"))
      },
      Some("""WITH per AS (SELECT l_orderkey,
             |    CAST(count(*) AS BIGINT) AS cnt,
             |    CAST(max(l_linenumber) AS BIGINT) AS mx,
             |    CAST(count(DISTINCT l_linenumber) AS BIGINT) AS dn
             |  FROM lineitem GROUP BY 1)
             |SELECT CASE WHEN cnt >= 7 THEN 'b7plus'
             |    ELSE 'b' || CAST(cnt AS VARCHAR) END AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(count(*) FILTER (WHERE mx = cnt AND dn = cnt)
             |    AS BIGINT) AS n_contiguous,
             |  CAST(count(*) FILTER (WHERE mx > cnt) AS BIGINT)
             |    AS n_gapped,
             |  CAST(count(*) FILTER (WHERE dn < cnt) AS BIGINT)
             |    AS n_duplicated,
             |  round(CAST(count(*) FILTER (WHERE mx = cnt AND dn = cnt)
             |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             |    AS contig_share
             |FROM per GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ── q249: CROSS-LANGUAGE prefix leakage — q229's 16-token prefix
    // fingerprint keyed per LANGUAGE label: docs, docs in shared-
    // prefix families (≥2), docs whose family SPANS language labels,
    // and the spanning share. A family spanning langs is either a
    // mislabeled duplicate (the lang-QA signal q122 reads
    // statistically, here with textual ground truth) or an
    // untranslated boilerplate block leaking across language
    // partitions — both are curation actions. Same map-side digest
    // discipline as q229/q235; the lang span detects via
    // min(lang) ≠ max(lang) — no count-distinct on the family grain.
    //
    // Scale shape: identical to q229 — digest map-side, one fp-grain
    // exchange, join-back on the fp key, |langs|-row rollup.
    QueryDef(
      "q249_cross_lang_prefix",
      (s, d) => {
        val fp = md5(concat_ws(" ",
          slice(filter(split(lower(col("text")), " "),
            tk => length(tk) > 0), 1, 16)))
        // ONE corpus pass: collapse to the (fp, lang) grain first
        // (count rides along), roll the family census up from it, and
        // carry the per-lang counts through the fp aggregate as a
        // collected list — bounded by |langs|, a dimension — so the
        // lang report explodes back out without re-joining the
        // doc-grain frame. The former census + join-back planned the
        // text scan twice (exchanges not reusable — the r12 q305
        // duplicated-subtree class). Integer counts only, so the
        // regrouped sums hash-match the join-back form exactly.
        val fl = t(s, d, "documents")
          .select(col("lang"), fp.as("fp"))
          .groupBy(col("fp"), col("lang"))
          .agg(count(lit(1)).cast("long").as("n"))
        fl.groupBy(col("fp"))
          .agg(sum(col("n")).cast("long").as("fam_n"),
            when(min(col("lang")) =!= max(col("lang")), 1L)
              .otherwise(0L).as("xlang"),
            collect_list(struct(col("lang"), col("n"))).as("per_lang"))
          .select(col("fam_n"), col("xlang"), explode(col("per_lang")).as("e"))
          .select(col("e.lang").as("lang"), col("e.n").as("n"),
            col("fam_n"), col("xlang"))
          .groupBy(col("lang"))
          .agg(sum(col("n")).cast("long").as("n_docs"),
            sum(when(col("fam_n") >= 2, col("n")).otherwise(0L))
              .cast("long").as("dup_docs"),
            sum(when(col("fam_n") >= 2 && col("xlang") === 1L, col("n"))
              .otherwise(0L)).cast("long").as("xlang_docs"))
          .select(col("lang"), col("n_docs"), col("dup_docs"),
            col("xlang_docs"),
            round(col("xlang_docs").cast("double") /
              col("n_docs").cast("double"), 6).as("xlang_share"))
          .orderBy(col("lang"))
      },
      Some("""WITH p AS (SELECT doc_id, lang,
             |    md5(array_to_string(list_filter(string_split(lower(text),
             |      ' '), x -> len(x) > 0)[1:16], ' ')) AS fp
             |  FROM documents),
             |fam AS (SELECT fp, CAST(count(*) AS BIGINT) AS fam_n,
             |    CASE WHEN min(lang) <> max(lang) THEN 1 ELSE 0 END
             |      AS xlang
             |  FROM p GROUP BY 1)
             |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(*) FILTER (WHERE fam_n >= 2) AS BIGINT)
             |    AS dup_docs,
             |  CAST(count(*) FILTER (WHERE fam_n >= 2 AND xlang = 1)
             |    AS BIGINT) AS xlang_docs,
             |  round(CAST(count(*) FILTER (WHERE fam_n >= 2 AND xlang = 1)
             |    AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS xlang_share
             |FROM p JOIN fam USING (fp)
             |GROUP BY 1 ORDER BY lang""".stripMargin)),

    // ── q250: event-type ADOPTION overlap — per unordered event-type
    // pair: users doing both, each type's user base, and the Jaccard:
    // "are two features adopted by the same users or different
    // ones" — the USER-level co-occurrence matrix next to q121's
    // token-level co-occurrence and q102's sequential transitions
    // (transitions read order; this reads population overlap
    // regardless of order). Only pairs with ≥1 shared user appear
    // (absent ≡ disjoint — both engines agree).
    //
    // Scale shape: the corpus collapses ONCE to the distinct
    // (user, type) grain (one exchange — q222/q226's frame family);
    // the pair enumeration self-joins on user with per-user fanout
    // bounded by |types|; sizes are |types|-grain; the output is
    // ≤|types|² rows.
    QueryDef(
      "q250_adoption_overlap",
      (s, d) => {
        val ut = t(s, d, "events")
          .select(col("user_id"), col("event_type")).distinct()
        val sz = ut.groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n_users"))
        val a = ut.toDF("user_id", "type_a")
        val b = ut.toDF("user_id", "type_b")
        val com = a.join(b, Seq("user_id"))
          .filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).cast("long").as("n_both"))
        com
          .join(sz.toDF("type_a", "na"), Seq("type_a"))
          .join(sz.toDF("type_b", "nb"), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("na"), col("nb"),
            col("n_both"),
            round(col("n_both").cast("double") /
              (col("na") + col("nb") - col("n_both")).cast("double"), 6)
              .as("jaccard"))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
             |sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
             |  FROM ut GROUP BY 1),
             |com AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
             |    CAST(count(*) AS BIGINT) AS n_both
             |  FROM ut a JOIN ut b ON a.user_id = b.user_id
             |    AND a.event_type < b.event_type
             |  GROUP BY 1, 2)
             |SELECT type_a, type_b, sa.n_users AS na, sb.n_users AS nb,
             |  n_both,
             |  round(CAST(n_both AS DOUBLE) /
             |    CAST(sa.n_users + sb.n_users - n_both AS DOUBLE), 6)
             |    AS jaccard
             |FROM com
             |JOIN sz sa ON sa.event_type = type_a
             |JOIN sz sb ON sb.event_type = type_b
             |ORDER BY type_a, type_b""".stripMargin)),

    // ── q251: PRIORITY vs latency — per order priority: lines, exact
    // mean ship latency, exact p50/p90, max: "does the priority field
    // actually buy faster fulfilment" — the check every ops review
    // runs before trusting the field for routing; q174 scores the
    // SLA per supplier, q232 the trend per nation — this is the
    // priority-dimension cut. Latency is integer days; the mean is
    // one exact-integer ratio; percentiles interpolate on integer
    // days (round-6 display — tenth-of-a-day fractions, no
    // cent-style tie digit).
    //
    // Scale shape: ONE orderkey exchange joins the two facts (q232's
    // shape); moments + bounded percentile buffers accumulate onto
    // the |priorities| grain.
    QueryDef(
      "q251_priority_latency",
      (s, d) => {
        val f = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderdate"),
              col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"),
            datediff(col("l_shipdate").cast("date"),
              col("o_orderdate").cast("date")).cast("long").as("lat"))
        f.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            round(sum(col("lat")).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_latency_days"),
            round(expr("percentile(lat, 0.5)"), 6).as("p50"),
            round(expr("percentile(lat, 0.9)"), 6).as("p90"),
            max(col("lat")).as("max_latency"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH f AS (SELECT o_orderpriority,
             |    CAST(datediff('day', CAST(o_orderdate AS DATE),
             |      CAST(l_shipdate AS DATE)) AS BIGINT) AS lat
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_lines,
             |  round(CAST(sum(lat) AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |    AS avg_latency_days,
             |  round(quantile_cont(lat, 0.5), 6) AS p50,
             |  round(quantile_cont(lat, 0.9), 6) AS p90,
             |  CAST(max(lat) AS BIGINT) AS max_latency
             |FROM f GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // ── q252: BURSTINESS (Fano dispersion) per event type — daily
    // event counts over the CALENDAR-DENSIFIED day axis (q106's
    // lesson: a silent day is a 0 observation, not a missing one),
    // per type: active days, mean events/day, and the Fano index
    // variance/mean in the reduced integer form
    // (n·Σc² − (Σc)²)/(n·Σc): ≈1 is Poisson-like steady traffic, ≫1
    // is bursty — the DISPERSION summary next to q82's point spikes,
    // q148's EWMA anomalies, and q116's interarrival quantiles (those
    // flag WHERE; this scores HOW MUCH overall). Moments are exact
    // integer sums in DECIMAL(38,0); one mirrored double chain.
    //
    // Scale shape: the corpus collapses to the (type, day) grain in
    // one exchange; the calendar densify is a |types|×|days| frame
    // (both dimension-bounded — the |types|-row dim broadcasts onto
    // the range); day bounds come from a parquet-stat min/max probe
    // (q226's bounded driver class); the rollup lands on |types| rows.
    QueryDef(
      "q252_burstiness",
      (s, d) => {
        val ev = t(s, d, "events")
        val b = ev.agg(min(epochDay(col("ts"))).as("dmin"),
          max(epochDay(col("ts"))).as("dmax")).head()
        val (dmin, dmax) = (b.getLong(0), b.getLong(1))
        val counts = ev
          .select(col("event_type"), epochDay(col("ts")).as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).cast("long").as("c"))
        val types = ev.select(col("event_type")).distinct()
        val cal = s.range(dmin, dmax + 1).toDF("day")
          .crossJoin(broadcast(types))
        val dense = cal.join(counts, Seq("event_type", "day"), "left")
          .select(col("event_type"),
            coalesce(col("c"), lit(0L)).as("c"))
        val m = dense.groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n_days"),
            count(when(col("c") > 0, 1)).cast("long").as("active_days"),
            sum(col("c").cast("decimal(38,0)")).as("sc"),
            sum((col("c").cast("decimal(19,0)") *
              col("c").cast("decimal(19,0)")).cast("decimal(38,0)"))
              .as("scc"))
        val nD = col("n_days").cast("double")
        val scD = col("sc").cast("double")
        m.select(col("event_type"), col("n_days"), col("active_days"),
          round(scD / nD, 6).as("mean_per_day"),
          round((nD * col("scc").cast("double") - scD * scD) /
            (nD * scD), 6).as("fano"))
          .orderBy(col("event_type"))
      },
      Some("""WITH b AS (SELECT
             |    min(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(ts AS DATE)) AS BIGINT)) AS dmin,
             |    max(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(ts AS DATE)) AS BIGINT)) AS dmax
             |  FROM events),
             |counts AS (SELECT event_type,
             |    CAST(datediff('day', DATE '1970-01-01',
             |      CAST(ts AS DATE)) AS BIGINT) AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |cal AS (SELECT t.event_type, d.day
             |  FROM (SELECT DISTINCT event_type FROM events) t,
             |    (SELECT unnest(range(dmin, dmax + 1)) AS day FROM b) d),
             |dense AS (SELECT cal.event_type, coalesce(c, 0) AS c
             |  FROM cal LEFT JOIN counts
             |    ON counts.event_type = cal.event_type
             |    AND counts.day = cal.day),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             |    CAST(count(*) FILTER (WHERE c > 0) AS BIGINT)
             |      AS active_days,
             |    sum(CAST(c AS HUGEINT)) AS sc,
             |    sum(CAST(c AS HUGEINT)*c) AS scc
             |  FROM dense GROUP BY 1)
             |SELECT event_type, n_days, active_days,
             |  round(CAST(sc AS DOUBLE)/CAST(n_days AS DOUBLE), 6)
             |    AS mean_per_day,
             |  round((CAST(n_days AS DOUBLE)*CAST(scc AS DOUBLE)
             |    - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE))
             |    / (CAST(n_days AS DOUBLE)*CAST(sc AS DOUBLE)), 6)
             |    AS fano
             |FROM m ORDER BY event_type""".stripMargin)),

    // ── q253: supplier HHI per brand — each brand's shipped quantity
    // concentrated across suppliers: supplier count, Herfindahl index
    // Σshare² in the reduced integer form Σq²/(Σq)², the top
    // supplier's share, and the effective supplier count 1/HHI: the
    // SUPPLY-RISK readout that generalizes q180's top-1 dominant
    // supplier to the whole concentration curve (q169 reads diversity
    // per nation; this reads fragility per product line). All moments
    // are exact integer quantity-unit sums; HHI and its reciprocal
    // derive in ONE mirrored double chain (effective count divides
    // the unrounded squares, not the rounded HHI).
    //
    // Scale shape: the fact collapses to the (brand, supplier) grain
    // in one exchange (part dim partkey-co-partitioned / broadcast);
    // the brand rollup squares the per-supplier totals map-side onto
    // the |brands| grain.
    QueryDef(
      "q253_supplier_hhi",
      (s, d) => {
        val bs = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            fxUnits(col("l_quantity"), 100).as("qu"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("l_suppkey"))
          .agg(sum(col("qu")).cast("long").as("q"))
        val qd = col("q").cast("decimal(19,0)")
        val m = bs.groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_suppliers"),
            sum(col("q").cast("decimal(38,0)")).as("sq"),
            sum((qd * qd).cast("decimal(38,0)")).as("sq2"),
            max(col("q")).as("mx"))
        val totD = col("sq").cast("double")
        val sq2D = col("sq2").cast("double")
        m.select(col("p_brand").as("brand"), col("n_suppliers"),
          round(sq2D / (totD * totD), 6).as("hhi"),
          round(col("mx").cast("double") / totD, 6).as("top_share"),
          round((totD * totD) / sq2D, 2).as("effective_suppliers"))
          .orderBy(col("brand"))
      },
      Some("""WITH bs AS (SELECT p_brand, l_suppkey,
             |    CAST(sum(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT)
             |      AS q
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |m AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_suppliers,
             |    sum(CAST(q AS HUGEINT)) AS sq,
             |    sum(CAST(q AS HUGEINT)*q) AS sq2,
             |    max(q) AS mx
             |  FROM bs GROUP BY 1)
             |SELECT p_brand AS brand, n_suppliers,
             |  round(CAST(sq2 AS DOUBLE) /
             |    (CAST(sq AS DOUBLE)*CAST(sq AS DOUBLE)), 6) AS hhi,
             |  round(CAST(mx AS DOUBLE)/CAST(sq AS DOUBLE), 6)
             |    AS top_share,
             |  round((CAST(sq AS DOUBLE)*CAST(sq AS DOUBLE))
             |    / CAST(sq2 AS DOUBLE), 2) AS effective_suppliers
             |FROM m ORDER BY brand""".stripMargin)),

    // ── q254: UNIT-PRICE drift audit — per part, the realized unit
    // price (Σ extendedprice / Σ quantity) in the first vs second
    // half of the ship calendar; per brand: parts sold in BOTH
    // halves, parts whose price moved more than ±20%, the drift
    // share, and the median price ratio: "which product lines are
    // repricing under us" — the pricing-INTEGRITY audit next to
    // q243's cross-part dispersion and q227's demand slope (q186
    // decomposes revenue price×volume at the aggregate; this names
    // the drifting lines). NO float ratio exists anywhere: the drift
    // predicate is the exact integer cross-multiply (num/den > 1.2 ⟺
    // 5·num > 6·den) over the DECIMAL(38,0) cross products
    // num = ep₂·q₁, den = ep₁·q₂, and the median rides the
    // micro-quantized integer ratio num·10⁶ div den (the q107/q241
    // discipline — r9 ADVICE: a raw float-ratio median has no
    // terminating-decimal guarantee, so engine rounding can diverge
    // by one ulp at the display digit; median of longs lands on k or
    // k+0.5 micro, and /10⁶ terminates at 7 decimals, tie-free). The
    // half boundary is the integer midpoint of the ship-day span
    // (q228's deterministic cut).
    //
    // Scale shape: the fact collapses to the part grain with all four
    // conditional sums in ONE partkey exchange; the brand rollup
    // (with its bounded per-brand percentile) rides the |parts| →
    // |brands| reduction; day bounds are a parquet-stat probe.
    QueryDef(
      "q254_price_drift",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val b = li.agg(min(epochDay(col("l_shipdate"))).as("dmin"),
          max(epochDay(col("l_shipdate"))).as("dmax")).head()
        val mid = Math.floorDiv(b.getLong(0) + b.getLong(1) + 1L, 2L)
        val early = epochDay(col("l_shipdate")) < mid
        val per = li
          .select(col("l_partkey"),
            fxUnits(col("l_extendedprice"), 100).as("ep"),
            fxUnits(col("l_quantity"), 100).as("qu"),
            early.as("h1"))
          .groupBy(col("l_partkey"))
          .agg(sum(when(col("h1"), col("ep")).otherwise(lit(0L)))
            .cast("long").as("ep1"),
            sum(when(col("h1"), col("qu")).otherwise(lit(0L)))
              .cast("long").as("q1"),
            sum(when(!col("h1"), col("ep")).otherwise(lit(0L)))
              .cast("long").as("ep2"),
            sum(when(!col("h1"), col("qu")).otherwise(lit(0L)))
              .cast("long").as("q2"))
          .filter(col("q1") > 0 && col("q2") > 0)
        val num = (col("ep2").cast("decimal(19,0)") *
          col("q1").cast("decimal(19,0)")).cast("decimal(38,0)")
        val den = (col("ep1").cast("decimal(19,0)") *
          col("q2").cast("decimal(19,0)")).cast("decimal(38,0)")
        val withRatio = per
          .withColumn("num", num)
          .withColumn("den", den)
          .withColumn("drifted",
            col("num") * lit(5) > col("den") * lit(6) ||
              col("num") * lit(5) < col("den") * lit(4))
          .withColumn("rm",
            expr("CAST(num * 1000000 AS DECIMAL(38,0)) DIV den"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
        withRatio.groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_parts"),
            count(when(col("drifted"), 1)).cast("long")
              .as("drifted_parts"),
            round(count(when(col("drifted"), 1)).cast("double")
              / count(lit(1)).cast("double"), 6)
              .as("drift_share"),
            round(expr("percentile(rm, 0.5)") / lit(1000000.0), 7)
              .as("median_ratio"))
          .select(col("p_brand").as("brand"), col("n_parts"),
            col("drifted_parts"), col("drift_share"), col("median_ratio"))
          .orderBy(col("brand"))
      },
      Some("""WITH b AS (SELECT
             |    min(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(l_shipdate AS DATE)) AS BIGINT)) AS dmin,
             |    max(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(l_shipdate AS DATE)) AS BIGINT)) AS dmax
             |  FROM lineitem),
             |per AS (SELECT l_partkey,
             |    CAST(sum(CASE WHEN CAST(datediff('day', DATE '1970-01-01',
             |        CAST(l_shipdate AS DATE)) AS BIGINT)
             |        < (dmin + dmax + 1) // 2
             |      THEN CAST(round(l_extendedprice*100) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS ep1,
             |    CAST(sum(CASE WHEN CAST(datediff('day', DATE '1970-01-01',
             |        CAST(l_shipdate AS DATE)) AS BIGINT)
             |        < (dmin + dmax + 1) // 2
             |      THEN CAST(round(l_quantity*100) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS q1,
             |    CAST(sum(CASE WHEN CAST(datediff('day', DATE '1970-01-01',
             |        CAST(l_shipdate AS DATE)) AS BIGINT)
             |        >= (dmin + dmax + 1) // 2
             |      THEN CAST(round(l_extendedprice*100) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS ep2,
             |    CAST(sum(CASE WHEN CAST(datediff('day', DATE '1970-01-01',
             |        CAST(l_shipdate AS DATE)) AS BIGINT)
             |        >= (dmin + dmax + 1) // 2
             |      THEN CAST(round(l_quantity*100) AS BIGINT)
             |      ELSE 0 END) AS BIGINT) AS q2
             |  FROM lineitem, b GROUP BY 1),
             |r AS (SELECT l_partkey,
             |    CAST(ep2 AS HUGEINT)*q1 AS num,
             |    CAST(ep1 AS HUGEINT)*q2 AS den
             |  FROM per WHERE q1 > 0 AND q2 > 0),
             |rr AS (SELECT l_partkey,
             |    num*5 > den*6 OR num*5 < den*4 AS drifted,
             |    (num*1000000)//den AS rm
             |  FROM r)
             |SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_parts,
             |  CAST(count(*) FILTER (WHERE drifted) AS BIGINT)
             |    AS drifted_parts,
             |  round(CAST(count(*) FILTER (WHERE drifted) AS DOUBLE)
             |    /CAST(count(*) AS DOUBLE), 6) AS drift_share,
             |  round(quantile_cont(rm, 0.5)/1000000.0, 7) AS median_ratio
             |FROM rr JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY brand""".stripMargin)),

    // ── q255: VALUE ROUNDNESS audit — per event type: events, the
    // share of whole-dollar values, the share of ten-dollar
    // multiples, and the distinct-value ratio: human-entered or
    // synthetic values cluster on round numbers and small value
    // vocabularies, organic measurements don't — the digit-PATTERN
    // screen next to q140's Benford first-digit audit (Benford reads
    // the leading digit; this reads the trailing zeros and the
    // repertoire). All three are integer predicates/counts on exact
    // cents — no float anywhere before the display divisions.
    //
    // Scale shape: one map-side classification pass; the
    // distinct-value count rides a (type, cents) expand of the
    // already-bucketed frame — bounded by the VALUE VOCABULARY per
    // type, not the event count; rollup |types| rows.
    QueryDef(
      "q255_value_roundness",
      (s, d) => {
        val per = t(s, d, "events")
          .select(col("event_type"), fxUnits(col("value"), 100).as("vc"))
        per.groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            round(count(when(col("vc") % 100 === 0, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("whole_dollar_share"),
            round(count(when(col("vc") % 1000 === 0, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("ten_dollar_share"),
            round(countDistinct(col("vc")).cast("double") /
              count(lit(1)).cast("double"), 6).as("distinct_value_ratio"))
          .orderBy(col("event_type"))
      },
      Some("""WITH per AS (SELECT event_type,
             |    CAST(round(value*100) AS BIGINT) AS vc FROM events)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             |  round(CAST(count(*) FILTER (WHERE vc % 100 = 0) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS whole_dollar_share,
             |  round(CAST(count(*) FILTER (WHERE vc % 1000 = 0) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS ten_dollar_share,
             |  round(CAST(count(DISTINCT vc) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS distinct_value_ratio
             |FROM per GROUP BY 1 ORDER BY event_type""".stripMargin)),

    // ── q256: bigram ENTROPY RATE per source — the conditional
    // entropy H(next | prev) of adjacent token pairs and its
    // perplexity: how predictable is the text token-to-token —
    // templated/boilerplate corpora sit low, diverse prose sits
    // high — the sequence-level complexity readout that completes
    // q107's unigram entropy, q60's raw bigram counts, and q77's
    // per-doc LM scores (q77 scores DOCS under a trained LM; this
    // scores the SOURCE's own statistics). H = Σ c(ab)·(ln c(a·) −
    // ln c(ab)) / M with both logs quantized to integer micro-units
    // (q107's discipline), the weighted sum exact in DECIMAL(38,0),
    // and ONE mirrored double chain for H and e^H.
    //
    // Scale shape: bigrams aggregate at the (source, a, b) grain in
    // one exchange (vocabulary²-bounded, never collected); the
    // prefix marginal is a re-aggregate of THAT frame (no second
    // corpus pass); the join-back reuses the (source, a) key; the
    // rollup lands on |sources| rows.
    QueryDef(
      "q256_bigram_entropy_rate",
      (s, d) => {
        val bg = t(s, d, "documents")
          .withColumn("tk",
            filter(split(lower(col("text")), " "), tk => length(tk) > 0))
          .filter(size(col("tk")) >= 2)
          .select(col("source"),
            explode(transform(sequence(lit(0), size(col("tk")) - 2),
              i => struct(element_at(col("tk"), i + 1).as("a"),
                element_at(col("tk"), i + 2).as("b")))).as("p"))
          .select(col("source"), col("p.a").as("a"), col("p.b").as("b"))
          .groupBy(col("source"), col("a"), col("b"))
          .agg(count(lit(1)).cast("long").as("c"))
        val pre = bg.groupBy(col("source"), col("a"))
          .agg(sum(col("c")).cast("long").as("ca"))
        val cost = (x: Column) =>
          round(lit(1000000.0) * log(x.cast("double"))).cast("long")
        val m = bg.join(pre, Seq("source", "a"))
          .select(col("source"), col("c"),
            ((cost(col("ca")) - cost(col("c"))).cast("decimal(19,0)") *
              col("c").cast("decimal(19,0)")).cast("decimal(38,0)")
              .as("term"))
          .groupBy(col("source"))
          .agg(sum(col("c")).cast("long").as("n_bigrams"),
            sum(col("term")).as("num"))
        val h = col("num").cast("double") /
          (col("n_bigrams").cast("double") * lit(1000000.0))
        m.select(col("source"), col("n_bigrams"),
          round(h, 6).as("cond_entropy"),
          round(exp(h), 6).as("perplexity"))
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (SELECT source,
             |    list_filter(string_split(lower(text), ' '),
             |      x -> len(x) > 0) AS t
             |  FROM documents),
             |bg AS (SELECT source, t[i] AS a, t[i+1] AS b,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM toks, unnest(range(1, len(t))) AS u(i)
             |  WHERE len(t) >= 2 GROUP BY 1, 2, 3),
             |pre AS (SELECT source, a, CAST(sum(c) AS BIGINT) AS ca
             |  FROM bg GROUP BY 1, 2),
             |m AS (SELECT bg.source,
             |    CAST(sum(c) AS BIGINT) AS n_bigrams,
             |    sum(CAST(CAST(round(1000000.0*ln(CAST(ca AS DOUBLE)))
             |        AS BIGINT)
             |      - CAST(round(1000000.0*ln(CAST(c AS DOUBLE)))
             |        AS BIGINT) AS HUGEINT) * c) AS num
             |  FROM bg JOIN pre ON bg.source = pre.source AND bg.a = pre.a
             |  GROUP BY 1)
             |SELECT source, n_bigrams,
             |  round(CAST(num AS DOUBLE) /
             |    (CAST(n_bigrams AS DOUBLE)*1000000.0), 6) AS cond_entropy,
             |  round(exp(CAST(num AS DOUBLE) /
             |    (CAST(n_bigrams AS DOUBLE)*1000000.0)), 6) AS perplexity
             |FROM m ORDER BY source""".stripMargin)),

    // ── q257: brand RETURN impact — per brand: lines, returned lines
    // (l_returnflag = 'R'), exact revenue, returned revenue, and both
    // return shares: "which product lines come back" — the
    // merchandising cut of the returns family (q197 ranks returning
    // CUSTOMERS, TPC-H Q10's angle; this names the product lines
    // whose revenue is at risk). Revenue micro-units exact in
    // DECIMAL(38,0); shares are mirrored one-division chains.
    //
    // Scale shape: part dim partkey-co-partitioned (AQE broadcast);
    // the conditional aggregates collapse map-side onto the |brands|
    // grain in one exchange — the return split costs no second pass.
    QueryDef(
      "q257_brand_returns",
      (s, d) => {
        val isR = col("l_returnflag") === "R"
        t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_returnflag"), revMicro.as("rm"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            count(when(isR, 1)).cast("long").as("returned_lines"),
            sum(col("rm").cast("decimal(38,0)")).as("rev"),
            sum(when(isR, col("rm")).otherwise(lit(0L))
              .cast("decimal(38,0)")).as("ret_rev"))
          .select(col("p_brand").as("brand"), col("n_lines"),
            col("returned_lines"),
            round(col("rev").cast("double") / 10000.0, 2).as("revenue"),
            round(col("ret_rev").cast("double") / 10000.0, 2)
              .as("returned_revenue"),
            round(col("returned_lines").cast("double") /
              col("n_lines").cast("double"), 6).as("line_return_share"),
            round(col("ret_rev").cast("double") /
              col("rev").cast("double"), 6).as("revenue_return_share"))
          .orderBy(col("brand"))
      },
      Some(s"""WITH li AS (SELECT p_brand, l_returnflag,
             |    CAST($revMicroSql AS HUGEINT) AS rm
             |  FROM lineitem JOIN part ON l_partkey = p_partkey)
             |SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
             |    AS returned_lines,
             |  round(CAST(sum(rm) AS DOUBLE)/10000.0, 2) AS revenue,
             |  round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN rm
             |    ELSE 0 END) AS DOUBLE)/10000.0, 2) AS returned_revenue,
             |  round(CAST(count(*) FILTER (WHERE l_returnflag = 'R')
             |    AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |    AS line_return_share,
             |  round(CAST(sum(CASE WHEN l_returnflag = 'R' THEN rm
             |    ELSE 0 END) AS DOUBLE)/CAST(sum(rm) AS DOUBLE), 6)
             |    AS revenue_return_share
             |FROM li GROUP BY 1 ORDER BY brand""".stripMargin)),

    // ── q258: BALANCE-DECILE spend — customers ranked into exact
    // account-balance deciles (d1 = richest), per decile: customers,
    // buyers, exact total and per-customer spend, and the decile's
    // spend share: "does stated balance predict purchasing" — the
    // wallet-vs-behavior calibration next to q128's RFM and q149's
    // score-decile calibration (same exact-ntile machinery, a
    // different predictor under test). Ranking is the two-pass
    // [[Q.globalRankByRange]] + [[Q.exactDecile]] (q50's proved
    // ntile equivalence) — never an unpartitioned window.
    //
    // Scale shape: the rank pass range-partitions the customer dim;
    // spend collapses orders ONCE to the customer grain
    // (custkey-co-partitioned join); the rollup lands on 10 rows and
    // the share window rides that frame.
    QueryDef(
      "q258_balance_decile_spend",
      (s, d) => {
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), fxUnits(col("c_acctbal"), 100)
            .as("bal"))
        val n = cust.count()
        val ranked = globalRankByRange(cust,
          Seq(col("bal").desc, col("c_custkey")))
          .select(col("c_custkey"), exactDecile(col("rn"), n).as("decile"))
        val spend = t(s, d, "orders")
          .select(col("o_custkey"), fxUnits(col("o_totalprice"), 100)
            .as("cents"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(col("cents").cast("decimal(38,0)")).as("sp"))
        val agg = ranked
          .join(spend, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("decile"))
          .agg(count(lit(1)).cast("long").as("n_customers"),
            count(col("sp")).cast("long").as("buyers"),
            sum(coalesce(col("sp"), lit(0L).cast("decimal(38,0)")))
              .as("sp"))
        val all = Window.partitionBy(lit(1))
        agg.select(col("decile"), col("n_customers"), col("buyers"),
          round(col("sp").cast("double") / 100.0, 2).as("total_spend"),
          round(col("sp").cast("double") /
            col("n_customers").cast("double") / 100.0, 6)
            .as("avg_spend_per_customer"),
          round(col("sp").cast("double") /
            sum(col("sp")).over(all).cast("double"), 6).as("spend_share"))
          .orderBy(col("decile"))
      },
      Some("""WITH c AS (SELECT c_custkey,
             |    CAST(round(c_acctbal*100) AS BIGINT) AS bal
             |  FROM customer),
             |r AS (SELECT c_custkey, ntile(10) OVER (
             |    ORDER BY bal DESC, c_custkey) AS decile FROM c),
             |sp AS (SELECT o_custkey,
             |    CAST(count(*) AS BIGINT) AS n_orders,
             |    sum(CAST(CAST(round(o_totalprice*100) AS BIGINT)
             |      AS HUGEINT)) AS sp
             |  FROM orders GROUP BY 1),
             |agg AS (SELECT decile,
             |    CAST(count(*) AS BIGINT) AS n_customers,
             |    CAST(count(sp.sp) AS BIGINT) AS buyers,
             |    sum(coalesce(sp.sp, 0)) AS spv
             |  FROM r LEFT JOIN sp ON c_custkey = o_custkey GROUP BY 1)
             |SELECT decile, n_customers, buyers,
             |  round(CAST(spv AS DOUBLE)/100.0, 2) AS total_spend,
             |  round(CAST(spv AS DOUBLE)/CAST(n_customers AS DOUBLE)
             |    /100.0, 6) AS avg_spend_per_customer,
             |  round(CAST(spv AS DOUBLE)/CAST(sum(spv) OVER () AS DOUBLE),
             |    6) AS spend_share
             |FROM agg ORDER BY decile""".stripMargin)),

    // ── q259: PAYLOAD-value correlation — per event type, the exact
    // Pearson correlation between the JSON payload field `k` (q15's
    // extraction) and the event value: "does the payload predict the
    // money" — the semi-structured-data companion to q104's
    // metric-pair matrix and q160's lead/lag correlation, and the
    // only query exercising JSON extraction INSIDE a statistical
    // aggregate. All six moments are exact integer sums in
    // DECIMAL(38,0) (k·v products cross 2⁶³ at ~10¹⁰ rows of
    // 10²-valued k × 10⁴-cent values); r derives in ONE mirrored
    // double chain; degenerate types filter, not NaN.
    //
    // Scale shape: extraction + quantization are map-side; the six
    // moments accumulate onto the |types| grain in one exchange.
    QueryDef(
      "q259_payload_value_corr",
      (s, d) => {
        val dec38 = "decimal(38,0)"
        val kd = col("k").cast("decimal(19,0)")
        val vd = col("vc").cast("decimal(19,0)")
        // integer-shape guard BEFORE the cast, mirrored in the oracle:
        // engine cast semantics on a non-integer string diverge (Spark
        // nulls/truncates, DuckDB TRY_CAST('1.5') ROUNDS to 2), so the
        // shared contract is "a field the JSON parser read, shaped
        // ^-?[0-9]{1,18}$" — robust to a fixture re-serialization
        // emitting floats or different spacing (r9 ADVICE finding);
        // the {1,18} bound keeps every admitted string representable
        // in int64 so both engines' plain casts are total (r10 ADVICE:
        // unbounded digits would NULL in Spark but RAISE in DuckDB).
        val m = t(s, d, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").as("ks"),
            fxUnits(col("value"), 100).as("vc"))
          .filter(col("ks").rlike("^-?[0-9]{1,18}$"))
          .withColumn("k", col("ks").cast("long"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(kd.cast(dec38)).as("sk"),
            sum(vd.cast(dec38)).as("sv"),
            sum((kd * vd).cast(dec38)).as("skv"),
            sum((kd * kd).cast(dec38)).as("skk"),
            sum((vd * vd).cast(dec38)).as("svv"))
        val nD = col("n").cast("double")
        val skD = col("sk").cast("double")
        val svD = col("sv").cast("double")
        val dk = nD * col("skk").cast("double") - skD * skD
        val dv = nD * col("svv").cast("double") - svD * svD
        m.filter(col("n") >= 2 && dk =!= lit(0.0) && dv =!= lit(0.0))
          .select(col("event_type"), col("n"),
            round(skD / nD, 6).as("mean_k"),
            round((nD * col("skv").cast("double") - skD * svD) /
              (sqrt(dk) * sqrt(dv)), 6).as("corr_k_value"))
          .orderBy(col("event_type"))
      },
      Some("""WITH x AS (SELECT event_type,
             |    json_extract_string(props, '$.k') AS ks,
             |    CAST(round(value*100) AS BIGINT) AS vc
             |  FROM events),
             |e AS (SELECT event_type, CAST(ks AS BIGINT) AS k, vc
             |  FROM x
             |  WHERE ks IS NOT NULL
             |    AND regexp_full_match(ks, '-?[0-9]{1,18}')),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    sum(CAST(k AS HUGEINT)) AS sk,
             |    sum(CAST(vc AS HUGEINT)) AS sv,
             |    sum(CAST(k AS HUGEINT)*vc) AS skv,
             |    sum(CAST(k AS HUGEINT)*k) AS skk,
             |    sum(CAST(vc AS HUGEINT)*vc) AS svv
             |  FROM e GROUP BY 1),
             |dm AS (SELECT *,
             |    CAST(n AS DOUBLE)*CAST(skk AS DOUBLE)
             |      - CAST(sk AS DOUBLE)*CAST(sk AS DOUBLE) AS dk,
             |    CAST(n AS DOUBLE)*CAST(svv AS DOUBLE)
             |      - CAST(sv AS DOUBLE)*CAST(sv AS DOUBLE) AS dv
             |  FROM m)
             |SELECT event_type, n,
             |  round(CAST(sk AS DOUBLE)/CAST(n AS DOUBLE), 6) AS mean_k,
             |  round((CAST(n AS DOUBLE)*CAST(skv AS DOUBLE)
             |    - CAST(sk AS DOUBLE)*CAST(sv AS DOUBLE))
             |    / (sqrt(dk)*sqrt(dv)), 6) AS corr_k_value
             |FROM dm WHERE n >= 2 AND dk <> 0.0 AND dv <> 0.0
             |ORDER BY event_type""".stripMargin)),

    // ── q260: DEDUP FUNNEL — per source, the staged survivor counts
    // of the cheap deterministic dedup screens: docs → exact-hash
    // survivors (q22's md5(lower(text)) min-doc_id rule) → prefix-
    // family survivors among those (q229's 16-token digest, same
    // min-doc_id rule): the one-readout summary a curation review
    // opens with before paying for shingle mining (q25/q26's
    // near-dup layer names what these screens CAN'T see — the
    // funnel's floor, not its ceiling). Both stages are corpus-WIDE
    // families with survivor attribution to the owning source; the
    // canonical-survivor rule is min(doc_id), q22's exactly, so the
    // funnel composes with the declared dedup queries rather than
    // re-deciding winners.
    //
    // Scale shape: both digests compute map-side in one scan; each
    // stage is one fp-grain exchange + a join-back on the fp key
    // (q229/q235's shape); the rollup lands on |sources| rows.
    QueryDef(
      "q260_dedup_funnel",
      (s, d) => {
        val pfp = md5(concat_ws(" ",
          slice(filter(split(lower(col("text")), " "),
            tk => length(tk) > 0), 1, 16)))
        // both stage minima ride WINDOWS over the one digested frame
        // (r14): the former min-per-family aggregate + join-back of
        // each stage cloned the scan + BOTH digests per consumer
        // (Catalyst per-consumer copy, diverged pruning — documents
        // EXECUTED 3×, finalized-plan ranScans, and the md5 + prefix
        // digest re-computed each time). min() over a family
        // partition is constant-memory per group (no set buffering —
        // safe on a corpus-sized boilerplate family, unlike a
        // collect_set/countDistinct window), and each window's
        // exchange is the SAME fp-grain exchange the old aggregate
        // paid. The left-join null case (a pf family with no exact
        // survivor) maps to min(when(...)) returning null — the
        // comparison is null, count(when(pf_surv, 1)) skips it on
        // both engines, exactly the former semantics. Output
        // unchanged (oracle hash-green).
        val f = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            md5(lower(col("text"))).as("h"), pfp.as("pf"))
        val s2 = f
          .withColumn("ex_surv", col("doc_id") ===
            min(col("doc_id")).over(Window.partitionBy(col("h"))))
          .withColumn("pf_surv", col("ex_surv") && col("doc_id") ===
            min(when(col("ex_surv"), col("doc_id")))
              .over(Window.partitionBy(col("pf"))))
        s2.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            count(when(col("ex_surv"), 1)).cast("long").as("after_exact"),
            count(when(col("pf_surv"), 1)).cast("long").as("after_prefix"),
            round(lit(1.0) - count(when(col("pf_surv"), 1)).cast("double")
              / count(lit(1)).cast("double"), 6).as("total_reduction"))
          .orderBy(col("source"))
      },
      Some("""WITH f AS (SELECT doc_id, source, md5(lower(text)) AS h,
             |    md5(array_to_string(list_filter(string_split(lower(text),
             |      ' '), x -> len(x) > 0)[1:16], ' ')) AS pf
             |  FROM documents),
             |ex AS (SELECT h, min(doc_id) AS keep FROM f GROUP BY 1),
             |s1 AS (SELECT f.*, (doc_id = keep) AS ex_surv
             |  FROM f JOIN ex USING (h)),
             |pm AS (SELECT pf, min(doc_id) AS pkeep FROM s1
             |  WHERE ex_surv GROUP BY 1),
             |s2 AS (SELECT s1.*,
             |    (ex_surv AND doc_id = pkeep) AS pf_surv
             |  FROM s1 LEFT JOIN pm USING (pf))
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(count(*) FILTER (WHERE ex_surv) AS BIGINT)
             |    AS after_exact,
             |  CAST(count(*) FILTER (WHERE pf_surv) AS BIGINT)
             |    AS after_prefix,
             |  round(1.0 - CAST(count(*) FILTER (WHERE pf_surv) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS total_reduction
             |FROM s2 GROUP BY 1 ORDER BY source""".stripMargin)),


    // ── q261: FILL SPAN vs basket size — per order, the ship SPAN
    // (days between the first and last line shipping), profiled by
    // q238's basket-size buckets: orders, exact mean span, exact
    // p50/p90 span, and the share of single-shipment orders
    // (span = 0): "do big baskets fulfil in one wave or dribble out"
    // — the within-ORDER spread that completes q251's order→ship
    // latency (how late) and q238's value profile (how big). Span is
    // an integer day difference of per-order min/max — exact.
    //
    // Scale shape: lineitem collapses ONCE to the orderkey grain
    // (count + min + max in one aggregate); the bucket rollup lands
    // on ≤7 rows with bounded percentile buffers per bucket.
    QueryDef(
      "q261_fill_span",
      (s, d) => {
        val per = t(s, d, "lineitem")
          .select(col("l_orderkey"), epochDay(col("l_shipdate")).as("day"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).cast("long").as("cnt"),
            (max(col("day")) - min(col("day"))).as("span"))
        val bucket = when(col("cnt") >= 7, "b7plus")
          .otherwise(concat(lit("b"), col("cnt")))
        per.select(bucket.as("bucket"), col("span"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            round(sum(col("span")).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_span_days"),
            round(expr("percentile(span, 0.5)"), 6).as("p50_span"),
            round(expr("percentile(span, 0.9)"), 6).as("p90_span"),
            round(count(when(col("span") === 0, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("single_wave_share"))
          .orderBy(col("bucket"))
      },
      Some("""WITH per AS (SELECT l_orderkey,
             |    CAST(count(*) AS BIGINT) AS cnt,
             |    CAST(max(datediff('day', DATE '1970-01-01',
             |        CAST(l_shipdate AS DATE)))
             |      - min(datediff('day', DATE '1970-01-01',
             |        CAST(l_shipdate AS DATE))) AS BIGINT) AS span
             |  FROM lineitem GROUP BY 1)
             |SELECT CASE WHEN cnt >= 7 THEN 'b7plus'
             |    ELSE 'b' || CAST(cnt AS VARCHAR) END AS bucket,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  round(CAST(sum(span) AS DOUBLE)/CAST(count(*) AS DOUBLE),
             |    6) AS avg_span_days,
             |  round(quantile_cont(span, 0.5), 6) AS p50_span,
             |  round(quantile_cont(span, 0.9), 6) AS p90_span,
             |  round(CAST(count(*) FILTER (WHERE span = 0) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS single_wave_share
             |FROM per GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // ── q262: user ENGAGEMENT deciles — users ranked into exact
    // deciles by event count (d1 = most active), per decile: users,
    // events + share, exact total value + share: "how concentrated is
    // engagement" — q127's revenue-concentration readout on the USER
    // axis (q222 reads the population's weekly pulse; this reads its
    // inequality; q255 screens the values those users produce). The
    // ranking is the two-pass [[Q.globalRankByRange]] +
    // [[Q.exactDecile]] (q50's proved ntile equivalence) — never an
    // unpartitioned window; value sums are exact integer cents.
    //
    // Scale shape: events collapse ONCE to the user grain (count +
    // value in one aggregate); the rank pass range-partitions the
    // user-grain frame; the rollup lands on 10 rows and the share
    // windows ride that frame.
    QueryDef(
      "q262_user_engagement_deciles",
      (s, d) => {
        val per = t(s, d, "events")
          .select(col("user_id"), fxUnits(col("value"), 100).as("vc"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).cast("long").as("n_ev"),
            sum(col("vc").cast("decimal(38,0)")).as("sv"))
        val n = per.count()
        val ranked = globalRankByRange(per,
          Seq(col("n_ev").desc, col("user_id")))
          .select(exactDecile(col("rn"), n).as("decile"), col("n_ev"),
            col("sv"))
        val agg = ranked.groupBy(col("decile"))
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum(col("n_ev")).cast("long").as("n_events"),
            sum(col("sv")).as("sv"))
        val all = Window.partitionBy(lit(1))
        agg.select(col("decile"), col("n_users"), col("n_events"),
          round(col("n_events").cast("double") /
            sum(col("n_events")).over(all).cast("double"), 6)
            .as("event_share"),
          round(col("sv").cast("double") / 100.0, 2).as("total_value"),
          round(col("sv").cast("double") /
            sum(col("sv")).over(all).cast("double"), 6).as("value_share"))
          .orderBy(col("decile"))
      },
      Some("""WITH per AS (SELECT user_id,
             |    CAST(count(*) AS BIGINT) AS n_ev,
             |    sum(CAST(CAST(round(value*100) AS BIGINT) AS HUGEINT))
             |      AS sv
             |  FROM events GROUP BY 1),
             |r AS (SELECT *, ntile(10) OVER (ORDER BY n_ev DESC, user_id)
             |    AS decile FROM per),
             |agg AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             |    CAST(sum(n_ev) AS BIGINT) AS n_events, sum(sv) AS sv
             |  FROM r GROUP BY 1)
             |SELECT decile, n_users, n_events,
             |  round(CAST(n_events AS DOUBLE) /
             |    CAST(sum(n_events) OVER () AS DOUBLE), 6) AS event_share,
             |  round(CAST(sv AS DOUBLE)/100.0, 2) AS total_value,
             |  round(CAST(sv AS DOUBLE)/CAST(sum(sv) OVER () AS DOUBLE),
             |    6) AS value_share
             |FROM agg ORDER BY decile""".stripMargin)),

    // ── q263: SENTENCE readability stats — per source: docs,
    // sentences, exact mean sentence length in tokens (ratio of two
    // integer sums), the share of LONG sentences (> 40 tokens), and
    // the share of docs averaging long sentences (integer cross
    // predicate tok·1 > 25·sent): the readability screen q24's
    // token/char averages don't see (a 500-token doc of 10 sentences
    // reads very differently from one 500-token run-on) — a standard
    // quality cut next to q31's punctuation ratios and q66's
    // repetition. Sentences split on the period-space boundary;
    // empty fragments (doubled periods) drop on both engines.
    //
    // Scale shape: sentence and token counts compute MAP-SIDE in
    // codegen (split → filter → size + one explode at the sentence
    // grain for the length histogram share); the rollup lands on
    // |sources| rows.
    QueryDef(
      "q263_sentence_stats",
      (s, d) => {
        val sents = filter(transform(split(col("text"), "\\. "),
          x => trim(x)), x => length(x) > 0)
        val sent = t(s, d, "documents")
          .select(col("source"), col("doc_id"),
            explode(sents).as("sentence"))
          .select(col("source"), col("doc_id"),
            size(filter(split(col("sentence"), " "),
              tk => length(tk) > 0)).cast("long").as("slen"))
        val per = sent.groupBy(col("source"), col("doc_id"))
          .agg(count(lit(1)).cast("long").as("n_sent"),
            sum(col("slen")).cast("long").as("n_tok"),
            count(when(col("slen") > 40, 1)).cast("long").as("n_long"))
        per.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_sent")).cast("long").as("n_sentences"),
            round(sum(col("n_tok")).cast("double") /
              sum(col("n_sent")).cast("double"), 6)
              .as("avg_sentence_len"),
            round(sum(col("n_long")).cast("double") /
              sum(col("n_sent")).cast("double"), 6).as("long_share"),
            round(count(when(col("n_tok") > col("n_sent") * 25, 1))
              .cast("double") / count(lit(1)).cast("double"), 6)
              .as("runon_doc_share"))
          .orderBy(col("source"))
      },
      Some("""WITH sent AS (SELECT source, doc_id,
             |    CAST(len(list_filter(string_split(s.sentence, ' '),
             |      x -> len(x) > 0)) AS BIGINT) AS slen
             |  FROM documents,
             |    unnest(list_filter(list_transform(
             |      string_split(text, '. '), x -> trim(x)),
             |      x -> len(x) > 0)) AS s(sentence)),
             |per AS (SELECT source, doc_id,
             |    CAST(count(*) AS BIGINT) AS n_sent,
             |    CAST(sum(slen) AS BIGINT) AS n_tok,
             |    CAST(count(*) FILTER (WHERE slen > 40) AS BIGINT)
             |      AS n_long
             |  FROM sent GROUP BY 1, 2)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_sent) AS BIGINT) AS n_sentences,
             |  round(CAST(sum(n_tok) AS DOUBLE)/CAST(sum(n_sent)
             |    AS DOUBLE), 6) AS avg_sentence_len,
             |  round(CAST(sum(n_long) AS DOUBLE)/CAST(sum(n_sent)
             |    AS DOUBLE), 6) AS long_share,
             |  round(CAST(count(*) FILTER (WHERE n_tok > n_sent*25)
             |    AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |    AS runon_doc_share
             |FROM per GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── q264: cross-nation PRICE PARITY — per part sold to customers
    // in ≥2 nations, the spread between its best and worst realized
    // unit price across nations; per brand: multi-nation parts,
    // parity violators (max/min ratio > 1.2), violator share, median
    // parity ratio: "is the same part priced differently by
    // geography" — the SPATIAL price-integrity audit completing
    // q254's temporal drift (q177 reads market share; this reads
    // price discrimination). Per (part, nation) the unit price is
    // Σep/Σqty; the cross-nation ratio computes as the integer cross
    // product (ep_max·q_min)/(ep_min·q_max)… reduced instead to ONE
    // division of two per-nation ratios — both engines run the
    // identical double chain (each per-nation ratio is one exact-
    // integer division, deterministic; max/min over those doubles is
    // order-free; mx/mn and ·10⁶ are single correctly-rounded IEEE
    // ops, so floor(parity·10⁶) is the same long in both engines).
    // The MEDIAN then rides that micro-quantized long, not the raw
    // float (r9 ADVICE: a float-ratio median has no terminating-
    // decimal guarantee, so engine rounding can diverge at the
    // display digit); median of longs is k or k+0.5 micro and the
    // /10⁶ display terminates at 7 decimals, tie-free.
    //
    // Scale shape: TWO fact joins reach the customer nation (q234's
    // shape — orderkey then custkey, dims broadcast); the collapse to
    // (part, nation) is one exchange; per-part max/min ride the
    // ≤|nations| fanout; the brand rollup bounds the percentile
    // buffers by parts-per-brand.
    QueryDef(
      "q264_price_parity",
      (s, d) => {
        val pn = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"),
            fxUnits(col("l_extendedprice"), 100).as("ep"),
            fxUnits(col("l_quantity"), 100).as("qu"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_partkey"), col("c_nationkey"))
          .agg(sum(col("ep")).cast("long").as("sep"),
            sum(col("qu")).cast("long").as("sq"))
          .select(col("l_partkey"),
            (col("sep").cast("double") / col("sq").cast("double"))
              .as("up"))
        val per = pn.groupBy(col("l_partkey"))
          .agg(count(lit(1)).cast("long").as("n_nations"),
            max(col("up")).as("mx"), min(col("up")).as("mn"))
          .filter(col("n_nations") >= 2)
          .select(col("l_partkey"), (col("mx") / col("mn")).as("parity"))
          .withColumn("parim",
            floor(col("parity") * lit(1000000.0)).cast("long"))
        per.join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_parts"),
            count(when(col("parity") > 1.2, 1)).cast("long")
              .as("violators"),
            round(count(when(col("parity") > 1.2, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("violator_share"),
            round(expr("percentile(parim, 0.5)") / lit(1000000.0), 7)
              .as("median_parity"))
          .select(col("p_brand").as("brand"), col("n_parts"),
            col("violators"), col("violator_share"), col("median_parity"))
          .orderBy(col("brand"))
      },
      Some("""WITH pn AS (SELECT l_partkey, c_nationkey,
             |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
             |      AS DOUBLE) /
             |    CAST(sum(CAST(round(l_quantity*100) AS BIGINT))
             |      AS DOUBLE) AS up
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |per AS (SELECT l_partkey, max(up)/min(up) AS parity
             |  FROM pn GROUP BY 1 HAVING count(*) >= 2),
             |pm AS (SELECT l_partkey, parity,
             |    CAST(floor(parity*1000000.0) AS BIGINT) AS parim
             |  FROM per)
             |SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_parts,
             |  CAST(count(*) FILTER (WHERE parity > 1.2) AS BIGINT)
             |    AS violators,
             |  round(CAST(count(*) FILTER (WHERE parity > 1.2) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS violator_share,
             |  round(quantile_cont(parim, 0.5)/1000000.0, 7)
             |    AS median_parity
             |FROM pm JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY brand""".stripMargin)),

    // ── q265: DEAD CATALOGUE — per brand: parts never shipped, the
    // dead share, and the retail value locked in them (exact cents):
    // "how much of the catalogue is shelf-ware" — the inventory
    // hygiene readout that turns q05's anti-join mechanics into a
    // business number (q218 ranks IMPORTANT parts; this names the
    // opposite tail; q233 reads the ramp of parts that DID sell).
    //
    // Scale shape: the shipped-part set collapses to the distinct
    // partkey grain in one exchange; the dim-side left-anti
    // membership resolves in the partkey-co-partitioned join; the
    // rollup lands on |brands| rows.
    QueryDef(
      "q265_dead_catalogue",
      (s, d) => {
        val shipped = t(s, d, "lineitem")
          .select(col("l_partkey")).distinct()
          .withColumn("sold", lit(1))
        val per = t(s, d, "part")
          .select(col("p_partkey"), col("p_brand"),
            fxUnits(col("p_retailprice"), 100).as("cents"))
          .join(shipped, col("p_partkey") === col("l_partkey"), "left")
        per.groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_parts"),
            count(when(col("sold").isNull, 1)).cast("long")
              .as("dead_parts"),
            round(count(when(col("sold").isNull, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("dead_share"),
            round(sum(when(col("sold").isNull, col("cents"))
              .otherwise(lit(0L))).cast("double") / 100.0, 2)
              .as("locked_retail_value"))
          .select(col("p_brand").as("brand"), col("n_parts"),
            col("dead_parts"), col("dead_share"),
            col("locked_retail_value"))
          .orderBy(col("brand"))
      },
      Some("""WITH shipped AS (SELECT DISTINCT l_partkey FROM lineitem)
             |SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_parts,
             |  CAST(count(*) FILTER (WHERE l_partkey IS NULL) AS BIGINT)
             |    AS dead_parts,
             |  round(CAST(count(*) FILTER (WHERE l_partkey IS NULL)
             |    AS DOUBLE)/CAST(count(*) AS DOUBLE), 6) AS dead_share,
             |  round(CAST(sum(CASE WHEN l_partkey IS NULL
             |    THEN CAST(round(p_retailprice*100) AS BIGINT)
             |    ELSE 0 END) AS DOUBLE)/100.0, 2) AS locked_retail_value
             |FROM part LEFT JOIN shipped ON p_partkey = l_partkey
             |GROUP BY 1 ORDER BY brand""".stripMargin)),

    // ── q266: SEASONAL brand share swing — per brand: its revenue
    // share within each ship quarter, then the max−min share SWING
    // across quarters: "which brands are seasonal vs steady" — the
    // share-STABILITY readout next to q230's leaderboard turnover
    // (composition) and q129's daily movers (volume); a brand can
    // grow every quarter and still hold a flat share, or hold flat
    // revenue while its share whipsaws. Shares derive from exact
    // DECIMAL(38,0) quarter totals in mirrored chains; the swing is
    // max−min over ≤|quarters| deterministic doubles (order-FREE —
    // an avg of the per-quarter shares would be a float sum in
    // shuffle order and is deliberately not offered; the overall
    // share is the exact grand-total ratio instead). The quarter
    // grid is DENSIFIED (r9 ADVICE; q252/q272's silent-bin lesson):
    // an absent brand-quarter is a 0-share observation, so an
    // intermittent brand swings from 0 to its max share — computed
    // via the total-quarter scalar rather than materializing the
    // brand×quarter grid (equivalent: the dense grid's min share is
    // 0 exactly when the brand missed a quarter). n_quarters stays
    // the ACTIVE quarter count (the intermittency readout itself).
    //
    // Scale shape: revenue collapses to the (brand, quarter) grain in
    // one exchange (part dim co-partitioned/broadcast); the quarter
    // totals and the swing ride the ≤|brands|×|quarters| aggregate
    // (bounded-window class); output |brands| rows.
    QueryDef(
      "q266_brand_seasonality",
      (s, d) => {
        val bq = t(s, d, "lineitem")
          .select(col("l_partkey"),
            concat(year(col("l_shipdate")), lit("-Q"),
              quarter(col("l_shipdate"))).as("qtr"), revMicro.as("rm"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("qtr"))
          .agg(sum(col("rm").cast("decimal(38,0)")).as("rev"))
        val wq = Window.partitionBy(col("qtr"))
        val wAll = Window.partitionBy(lit(1))
        // nq rides the SAME global window the grand total already
        // pays for (r14): the former 1-row countDistinct branch
        // cloned the whole corpus tower (Catalyst per-consumer copy,
        // diverged pruning — lineitem and part scanned TWICE,
        // finalized-plan ranScans) to count quarters that are already
        // present in the ≤|brands|×|quarters| aggregate this window
        // walks. collect_set is order-free, so the count is exact and
        // deterministic. Output unchanged (oracle hash-green).
        val shares = bq
          .withColumn("share",
            col("rev").cast("double") /
              sum(col("rev")).over(wq).cast("double"))
          .withColumn("grand", sum(col("rev")).over(wAll))
          .withColumn("nq",
            size(collect_set(col("qtr")).over(wAll)).cast("long"))
        shares.groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_quarters"),
            round(sum(col("rev")).cast("double") / 10000.0, 2)
              .as("revenue"),
            round(sum(col("rev")).cast("double") /
              max(col("grand")).cast("double"), 6).as("overall_share"),
            round(when(count(lit(1)) < max(col("nq")), max(col("share")))
              .otherwise(max(col("share")) - min(col("share"))), 6)
              .as("share_swing"))
          .select(col("p_brand").as("brand"), col("n_quarters"),
            col("revenue"), col("overall_share"), col("share_swing"))
          .orderBy(col("brand"))
      },
      Some(s"""WITH bq AS (SELECT p_brand,
             |    CAST(year(l_shipdate) AS VARCHAR) || '-Q' ||
             |      CAST(quarter(l_shipdate) AS VARCHAR) AS qtr,
             |    sum(CAST($revMicroSql AS HUGEINT)) AS rev
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |sh AS (SELECT p_brand, qtr, rev,
             |    CAST(rev AS DOUBLE) /
             |      CAST(sum(rev) OVER (PARTITION BY qtr) AS DOUBLE)
             |      AS share,
             |    sum(rev) OVER () AS grand
             |  FROM bq),
             |tq AS (SELECT CAST(count(DISTINCT qtr) AS BIGINT) AS nq
             |  FROM bq)
             |SELECT p_brand AS brand,
             |  CAST(count(*) AS BIGINT) AS n_quarters,
             |  round(CAST(sum(rev) AS DOUBLE)/10000.0, 2) AS revenue,
             |  round(CAST(sum(rev) AS DOUBLE)/CAST(max(grand) AS DOUBLE),
             |    6) AS overall_share,
             |  round(CASE WHEN count(*) < max(nq) THEN max(share)
             |    ELSE max(share) - min(share) END, 6) AS share_swing
             |FROM sh, tq GROUP BY 1 ORDER BY brand""".stripMargin)),

    // ── q267: duplicate TEXT MASS — per source: total characters,
    // characters sitting in NON-CANONICAL exact-duplicate docs
    // (q22's md5 min-doc_id rule), and the duplicate char share:
    // the BYTES face of the dedup counts (q22/q260 count DOCS; the
    // storage bill and the training-token budget scale with MASS —
    // one duplicated 100 k-char doc outweighs fifty duplicated
    // tweets). Canonical rule identical to q22/q260 so all three
    // readouts reconcile.
    //
    // Scale shape: digest + length compute map-side; one fp-grain
    // exchange + join-back (q260's shape); rollup |sources| rows.
    QueryDef(
      "q267_dup_text_mass",
      (s, d) => {
        // canonical-min via a WINDOW on the digested frame (r14): the
        // min-per-family aggregate + join-back cloned the scan and
        // the md5(lower(text)) digest (documents EXECUTED 2×,
        // finalized-plan ranScans); min() over the h partition is the
        // same fp-grain exchange with constant per-group memory, one
        // text read, one digest. Output unchanged (oracle hash-green).
        t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            md5(lower(col("text"))).as("h"),
            length(col("text")).cast("long").as("n_ch"))
          .select(col("source"), col("n_ch"),
            (col("doc_id") =!=
              min(col("doc_id")).over(Window.partitionBy(col("h"))))
              .as("dup"))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("n_ch")).cast("long").as("n_chars"),
            count(when(col("dup"), 1)).cast("long").as("dup_docs"),
            sum(when(col("dup"), col("n_ch")).otherwise(lit(0L)))
              .cast("long").as("dup_chars"),
            round(sum(when(col("dup"), col("n_ch")).otherwise(lit(0L)))
              .cast("double") / sum(col("n_ch")).cast("double"), 6)
              .as("dup_char_share"))
          .orderBy(col("source"))
      },
      Some("""WITH f AS (SELECT doc_id, source, md5(lower(text)) AS h,
             |    CAST(len(text) AS BIGINT) AS n_ch
             |  FROM documents),
             |k AS (SELECT h, min(doc_id) AS keep FROM f GROUP BY 1)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_ch) AS BIGINT) AS n_chars,
             |  CAST(count(*) FILTER (WHERE doc_id <> keep) AS BIGINT)
             |    AS dup_docs,
             |  CAST(sum(CASE WHEN doc_id <> keep THEN n_ch ELSE 0 END)
             |    AS BIGINT) AS dup_chars,
             |  round(CAST(sum(CASE WHEN doc_id <> keep THEN n_ch
             |    ELSE 0 END) AS DOUBLE)/CAST(sum(n_ch) AS DOUBLE), 6)
             |    AS dup_char_share
             |FROM f JOIN k USING (h)
             |GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── q268: part-SIZE demand curve — demand profiled by q169's
    // size bands ((size−1) div 10 + 1): distinct parts sold, exact
    // quantity, exact revenue, revenue per part, and the band's
    // revenue share: "does the catalogue's size spectrum match what
    // actually sells" — the demand-side face of q169's supply-side
    // banding and q181's size-predicated brackets; read against
    // q265's dead-catalogue share it closes the size axis.
    //
    // Scale shape: fact collapses through the partkey join (dim
    // co-partitioned/broadcast) onto the ≤4-band grain in one
    // exchange; the distinct-part count dedups at the (band, part)
    // grain — catalogue-bounded; the share window rides ≤4 rows.
    QueryDef(
      "q268_size_demand",
      (s, d) => {
        val banded = t(s, d, "lineitem")
          .select(col("l_partkey"), fxUnits(col("l_quantity"), 100)
            .as("qu"), revMicro.as("rm"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_size")),
            col("l_partkey") === col("p_partkey"))
          .select((expr("(p_size - 1) div 10").cast("int") + 1)
            .as("size_band"), col("l_partkey"), col("qu"), col("rm"))
        val agg = banded.groupBy(col("size_band"))
          .agg(countDistinct(col("l_partkey")).cast("long").as("n_parts"),
            sum(col("qu").cast("decimal(38,0)")).as("sq"),
            sum(col("rm").cast("decimal(38,0)")).as("rev"))
        val all = Window.partitionBy(lit(1))
        agg.select(col("size_band"), col("n_parts"),
          round(col("sq").cast("double") / 100.0, 2).as("quantity"),
          round(col("rev").cast("double") / 10000.0, 2).as("revenue"),
          round(col("rev").cast("double") /
            col("n_parts").cast("double") / 10000.0, 2)
            .as("revenue_per_part"),
          round(col("rev").cast("double") /
            sum(col("rev")).over(all).cast("double"), 6).as("rev_share"))
          .orderBy(col("size_band"))
      },
      Some(s"""WITH banded AS (SELECT
             |    CAST((p_size - 1) // 10 AS INTEGER) + 1 AS size_band,
             |    l_partkey,
             |    CAST(round(l_quantity*100) AS BIGINT) AS qu,
             |    CAST($revMicroSql AS HUGEINT) AS rm
             |  FROM lineitem JOIN part ON l_partkey = p_partkey),
             |agg AS (SELECT size_band,
             |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
             |    sum(CAST(qu AS HUGEINT)) AS sq, sum(rm) AS rev
             |  FROM banded GROUP BY 1)
             |SELECT size_band, n_parts,
             |  round(CAST(sq AS DOUBLE)/100.0, 2) AS quantity,
             |  round(CAST(rev AS DOUBLE)/10000.0, 2) AS revenue,
             |  round(CAST(rev AS DOUBLE)/CAST(n_parts AS DOUBLE)/10000.0,
             |    2) AS revenue_per_part,
             |  round(CAST(rev AS DOUBLE)/CAST(sum(rev) OVER () AS DOUBLE),
             |    6) AS rev_share
             |FROM agg ORDER BY size_band""".stripMargin)),

    // ── q269: MONTH × WEEKDAY revenue heatmap — order revenue on the
    // (calendar month, ISO weekday) grid with each cell's
    // INDEPENDENCE index: observed revenue over the expected revenue
    // if month and weekday were independent (row_tot·col_tot/grand):
    // index ≫ 1 names the "payday Friday in March" interactions that
    // q124's marginal DOW profile and q106's daily density can't
    // see — the standard BI heatmap with the standard expected-value
    // normalization (q147's independence algebra on a revenue
    // measure). Exact DECIMAL(38,0) cell totals; the index is one
    // mirrored double chain; the windows ride the ≤12×7 aggregate.
    //
    // Scale shape: orders collapse onto the ≤12×7 cell grain in one
    // exchange; row/col/grand totals are windows over that bounded
    // frame (coverageCurve's class) — never a second corpus pass.
    QueryDef(
      "q269_month_dow_heatmap",
      (s, d) => {
        val cells = t(s, d, "orders")
          .select(month(col("o_orderdate")).cast("int").as("mon"),
            (((dayofweek(col("o_orderdate")) + 5) % 7) + 1).cast("int")
              .as("dow"),
            fxUnits(col("o_totalprice"), 100).as("cents"))
          .groupBy(col("mon"), col("dow"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(col("cents").cast("decimal(38,0)")).as("rev"))
        val wRow = Window.partitionBy(col("mon"))
        val wCol = Window.partitionBy(col("dow"))
        val wAll = Window.partitionBy(lit(1))
        cells
          .withColumn("row_tot", sum(col("rev")).over(wRow))
          .withColumn("col_tot", sum(col("rev")).over(wCol))
          .withColumn("grand", sum(col("rev")).over(wAll))
          .select(col("mon"), col("dow"), col("n_orders"),
            round(col("rev").cast("double") / 100.0, 2).as("revenue"),
            round(col("rev").cast("double") /
              (col("row_tot").cast("double") *
                col("col_tot").cast("double") /
                col("grand").cast("double")), 6).as("independence_idx"))
          .orderBy(col("mon"), col("dow"))
      },
      Some("""WITH cells AS (SELECT
             |    CAST(month(o_orderdate) AS INTEGER) AS mon,
             |    CAST(isodow(o_orderdate) AS INTEGER) AS dow,
             |    CAST(count(*) AS BIGINT) AS n_orders,
             |    sum(CAST(CAST(round(o_totalprice*100) AS BIGINT)
             |      AS HUGEINT)) AS rev
             |  FROM orders GROUP BY 1, 2)
             |SELECT mon, dow, n_orders,
             |  round(CAST(rev AS DOUBLE)/100.0, 2) AS revenue,
             |  round(CAST(rev AS DOUBLE) /
             |    (CAST(sum(rev) OVER (PARTITION BY mon) AS DOUBLE) *
             |     CAST(sum(rev) OVER (PARTITION BY dow) AS DOUBLE) /
             |     CAST(sum(rev) OVER () AS DOUBLE)), 6)
             |    AS independence_idx
             |FROM cells ORDER BY mon, dow""".stripMargin)),

    // ── q270: supplier LOAD BALANCE per nation — line volume spread
    // across each nation's suppliers: suppliers, lines, the load CV
    // in the reduced form √(n·Σc² − (Σc)²)/Σc (q243's scale-free
    // algebra on counts), and the max/mean load ratio: "is one
    // supplier carrying the nation" — the capacity-BALANCE readout
    // next to q253's brand-level HHI (same risk family, the
    // geography axis) and q169's supplier diversity. Exact integer
    // count moments in DECIMAL(38,0); two mirrored chains.
    //
    // Scale shape: the fact collapses to the supplier grain in one
    // suppkey exchange; nation moments accumulate map-side onto the
    // |nations| grain (supplier/nation dims broadcast).
    QueryDef(
      "q270_supplier_load_balance",
      (s, d) => {
        val per = t(s, d, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(count(lit(1)).cast("long").as("c"))
          .join(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name")),
            col("s_nationkey") === col("n_nationkey"))
        val cd = col("c").cast("decimal(19,0)")
        val m = per.groupBy(col("n_name"))
          .agg(count(lit(1)).cast("long").as("n_suppliers"),
            sum(col("c").cast("decimal(38,0)")).as("sc"),
            sum((cd * cd).cast("decimal(38,0)")).as("scc"),
            max(col("c")).as("mx"))
        val nD = col("n_suppliers").cast("double")
        val scD = col("sc").cast("double")
        // no n >= 2 filter: a single-supplier nation is well-defined
        // (cv = 0, max/mean = 1) and tiny fixtures would otherwise
        // read empty
        m.select(col("n_name").as("nation"), col("n_suppliers"),
            col("sc").cast("long").as("n_lines"),
            round(sqrt(nD * col("scc").cast("double") - scD * scD) / scD,
              6).as("load_cv"),
            round(col("mx").cast("double") * nD / scD, 6)
              .as("max_over_mean"))
          .orderBy(col("nation"))
      },
      Some("""WITH per AS (SELECT n_name, l_suppkey,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  GROUP BY 1, 2),
             |m AS (SELECT n_name,
             |    CAST(count(*) AS BIGINT) AS n_suppliers,
             |    sum(CAST(c AS HUGEINT)) AS sc,
             |    sum(CAST(c AS HUGEINT)*c) AS scc,
             |    max(c) AS mx
             |  FROM per GROUP BY 1)
             |SELECT n_name AS nation, n_suppliers,
             |  CAST(sc AS BIGINT) AS n_lines,
             |  round(sqrt(CAST(n_suppliers AS DOUBLE)*CAST(scc AS DOUBLE)
             |    - CAST(sc AS DOUBLE)*CAST(sc AS DOUBLE))
             |    / CAST(sc AS DOUBLE), 6) AS load_cv,
             |  round(CAST(mx AS DOUBLE)*CAST(n_suppliers AS DOUBLE)
             |    / CAST(sc AS DOUBLE), 6) AS max_over_mean
             |FROM m ORDER BY nation""".stripMargin)),

    // ── q271: CASING profile — per source: letters, the UPPERCASE
    // letter share (exact integer ratio), and the count+share of
    // SHOUTING docs (more than 30% of letters uppercase, integer
    // cross predicate 10·upper > 3·letters on docs with letters):
    // all-caps spam, scraped headings, and OCR'd titles survive the
    // length/stopword screens — the casing axis completes the
    // character-class screens (q244 digits, q247 scripts). Counts
    // come from two regexp_replace length diffs — the literal
    // [a-z]/[A-Z] classes both dialects agree on.
    //
    // Scale shape: both counts compute MAP-SIDE in codegen — text
    // never shuffles, three integers per doc move; rollup |sources|
    // rows.
    QueryDef(
      "q271_casing_profile",
      (s, d) => {
        val nLower = length(col("text")) -
          length(regexp_replace(col("text"), "[a-z]", ""))
        val nUpper = length(col("text")) -
          length(regexp_replace(col("text"), "[A-Z]", ""))
        val per = t(s, d, "documents")
          .select(col("source"),
            (nLower + nUpper).cast("long").as("letters"),
            nUpper.cast("long").as("upper"))
        per.groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("letters")).cast("long").as("n_letters"),
            round(sum(col("upper")).cast("double") /
              sum(col("letters")).cast("double"), 6).as("upper_share"),
            count(when(col("letters") > 0 &&
              col("upper") * 10 > col("letters") * 3, 1)).cast("long")
              .as("shouting_docs"),
            round(count(when(col("letters") > 0 &&
              col("upper") * 10 > col("letters") * 3, 1)).cast("double")
              / count(lit(1)).cast("double"), 6).as("shouting_share"))
          .orderBy(col("source"))
      },
      Some("""WITH per AS (SELECT source,
             |    CAST(2*len(text) - len(regexp_replace(text, '[a-z]', '',
             |        'g'))
             |      - len(regexp_replace(text, '[A-Z]', '', 'g'))
             |      AS BIGINT) AS letters,
             |    CAST(len(text) - len(regexp_replace(text, '[A-Z]', '',
             |      'g')) AS BIGINT) AS upper
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(letters) AS BIGINT) AS n_letters,
             |  round(CAST(sum(upper) AS DOUBLE)/CAST(sum(letters)
             |    AS DOUBLE), 6) AS upper_share,
             |  CAST(count(*) FILTER (WHERE letters > 0
             |    AND upper*10 > letters*3) AS BIGINT) AS shouting_docs,
             |  round(CAST(count(*) FILTER (WHERE letters > 0
             |    AND upper*10 > letters*3) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS shouting_share
             |FROM per GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── q272: weekly revenue VOLATILITY per nation — weekly order
    // revenue (customer nation, epoch-week bins) over the DENSIFIED
    // week axis, per nation: weeks, exact total, and the week-to-week
    // CV in the scale-free form √(n·Σr² − (Σr)²)/Σr: "is demand
    // steady or lumpy by geography" — q252's dispersion lens moved
    // from event counts to MONEY on the nation axis (q163 reads WoW
    // direction; this scores the volatility level). Exact integer
    // cent moments in DECIMAL(38,0); silent weeks are 0 observations
    // (q106/q252's lesson).
    //
    // Scale shape: ONE custkey exchange reaches the nation (customer
    // dim co-partitioned/broadcast); revenue collapses to the
    // (nation, week) grain; the densify is a |nations|×|weeks|
    // broadcast-range frame; moments map-side onto |nations| rows;
    // week bounds via the parquet-stat probe class.
    QueryDef(
      "q272_revenue_volatility",
      (s, d) => {
        val o = t(s, d, "orders")
        val b = o.agg(min(epochDay(col("o_orderdate"))).as("dmin"),
          max(epochDay(col("o_orderdate"))).as("dmax")).head()
        val wmin = Math.floorDiv(b.getLong(0), 7L)
        val wmax = Math.floorDiv(b.getLong(1), 7L)
        val nw = o
          .select(col("o_custkey"), epochDay(col("o_orderdate")).as("day"),
            fxUnits(col("o_totalprice"), 100).as("cents"))
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"), expr("day div 7").as("week"),
            col("cents"))
          .groupBy(col("n_name"), col("week"))
          .agg(sum(col("cents")).cast("long").as("r"))
        val nations = t(s, d, "nation").select(col("n_name"))
        val cal = s.range(wmin, wmax + 1).toDF("week")
          .crossJoin(broadcast(nations))
        val dense = cal.join(nw, Seq("n_name", "week"), "left")
          .select(col("n_name"), coalesce(col("r"), lit(0L)).as("r"))
        val rd = col("r").cast("decimal(19,0)")
        val m = dense.groupBy(col("n_name"))
          .agg(count(lit(1)).cast("long").as("n_weeks"),
            sum(col("r").cast("decimal(38,0)")).as("sr"),
            sum((rd * rd).cast("decimal(38,0)")).as("srr"))
        val nD = col("n_weeks").cast("double")
        val srD = col("sr").cast("double")
        m.filter(col("sr") > 0)
          .select(col("n_name").as("nation"), col("n_weeks"),
            round(srD / 100.0, 2).as("total_revenue"),
            round(sqrt(nD * col("srr").cast("double") - srD * srD) / srD,
              6).as("weekly_cv"))
          .orderBy(col("nation"))
      },
      Some("""WITH b AS (SELECT
             |    min(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT)) // 7 AS wmin,
             |    max(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT)) // 7 AS wmax
             |  FROM orders),
             |nw AS (SELECT n_name,
             |    CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT) // 7 AS week,
             |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT))
             |      AS BIGINT) AS r
             |  FROM orders
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey
             |  GROUP BY 1, 2),
             |cal AS (SELECT n.n_name, w.week
             |  FROM nation n,
             |    (SELECT unnest(range(wmin, wmax + 1)) AS week FROM b) w),
             |dense AS (SELECT cal.n_name, coalesce(r, 0) AS r
             |  FROM cal LEFT JOIN nw
             |    ON nw.n_name = cal.n_name AND nw.week = cal.week),
             |m AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n_weeks,
             |    sum(CAST(r AS HUGEINT)) AS sr,
             |    sum(CAST(r AS HUGEINT)*r) AS srr
             |  FROM dense GROUP BY 1)
             |SELECT n_name AS nation, n_weeks,
             |  round(CAST(sr AS DOUBLE)/100.0, 2) AS total_revenue,
             |  round(sqrt(CAST(n_weeks AS DOUBLE)*CAST(srr AS DOUBLE)
             |    - CAST(sr AS DOUBLE)*CAST(sr AS DOUBLE))
             |    / CAST(sr AS DOUBLE), 6) AS weekly_cv
             |FROM m WHERE sr > 0 ORDER BY nation""".stripMargin)),

    // ── q273: doc-LENGTH Gini per source — inequality of token mass
    // across a source's documents (q153's exact rank-weighted Gini
    // algebra, the document axis): a source at Gini ≈ 0 is uniform
    // shards, ≈ 1 is a few megadocs among stubs — the packing planner
    // (q90/q224) and the storage layout care which. Ranking is the
    // two-pass [[Q.globalRankByRange]] over (source, len, doc_id)
    // with per-source offsets (q153's shape — never a source-keyed
    // corpus window); moments exact in DECIMAL(38,0).
    //
    // Scale shape: lengths compute map-side; ONE range exchange
    // orders the corpus; the offset probe is a |sources|-row
    // broadcast; moments land on |sources| rows.
    QueryDef(
      "q273_length_gini",
      (s, d) => {
        val base = t(s, d, "documents")
          .select(col("source"), col("doc_id"),
            size(filter(split(lower(col("text")), " "),
              tk => length(tk) > 0)).cast("long").as("len"))
        val ranked = globalRankByRange(base,
          Seq(col("source"), col("len"), col("doc_id")))
        val offsets = ranked.groupBy(col("source"))
          .agg(min(col("rn")).as("rn0"))
        val dec38 = "decimal(38,0)"
        val g = ranked.join(broadcast(offsets), Seq("source"))
          .withColumn("i", col("rn") - col("rn0") + 1)
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("len").cast(dec38)).as("sx"),
            sum((col("i").cast("decimal(19,0)") *
              col("len").cast("decimal(19,0)")).cast(dec38)).as("six"))
        val nD = col("n_docs").cast("double")
        val sxD = col("sx").cast("double")
        g.select(col("source"), col("n_docs"),
          col("sx").cast("long").as("n_tokens"),
          when(col("sx") > 0,
            round((lit(2.0) * col("six").cast("double") -
              (nD + lit(1.0)) * sxD) / (nD * sxD), 6)).as("length_gini"))
          .orderBy(col("source"))
      },
      Some("""WITH b AS (SELECT source, doc_id,
             |    CAST(len(list_filter(string_split(lower(text), ' '),
             |      x -> len(x) > 0)) AS BIGINT) AS len
             |  FROM documents),
             |r AS (SELECT source, len,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY len, doc_id) AS i
             |  FROM b),
             |g AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |    sum(CAST(len AS HUGEINT)) AS sx,
             |    sum(CAST(i AS HUGEINT)*len) AS six
             |  FROM r GROUP BY 1)
             |SELECT source, n_docs, CAST(sx AS BIGINT) AS n_tokens,
             |  CASE WHEN sx > 0 THEN
             |    round((2.0*CAST(six AS DOUBLE)
             |      - (CAST(n_docs AS DOUBLE)+1.0)*CAST(sx AS DOUBLE))
             |      /(CAST(n_docs AS DOUBLE)*CAST(sx AS DOUBLE)), 6)
             |  END AS length_gini
             |FROM g ORDER BY source""".stripMargin)),

    // ── q274: brand REPLENISHMENT cycle — customers who bought the
    // SAME part again: per brand, the repurchasing (customer, part)
    // pairs among multi-purchase pairs, the repurchase share, and the
    // exact median days between consecutive repurchases: "is this
    // product line a consumable (short cycle) or a durable (no
    // cycle)" — the product-axis rhythm next to q231's order-level
    // cadence and q128's RFM frequency. Gap multiset is
    // tie-break-invariant (q231's argument); the per-pair lag window
    // is bounded by a pair's purchases. The median here is over
    // INTEGER day gaps — it lands on k or k+0.5 exactly (terminates
    // at 1 decimal), so unlike the float-ratio medians the r9 ADVICE
    // flagged (q234/q254/q264, all quantized since), round(·, 6) is
    // tie-free by construction and needs no micro-unit pass.
    //
    // Scale shape: TWO fact joins (orderkey → custkey; partkey →
    // brand — q234/q264's shape); the (customer, part) collapse
    // dedups same-day repeats at the (pair, day) grain in one
    // exchange; the lag rides per-pair windows; the brand rollup
    // bounds its percentile buffers by pairs-per-brand.
    QueryDef(
      "q274_replenishment_cycle",
      (s, d) => {
        val pd = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"),
            epochDay(col("l_shipdate")).as("day"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey"), col("l_partkey"), col("day"))
          .distinct()
        val w = Window.partitionBy(col("o_custkey"), col("l_partkey"))
          .orderBy(col("day"))
        val gaps = pd
          .withColumn("gap", col("day") - lag(col("day"), 1).over(w))
        val pairs = gaps.groupBy(col("o_custkey"), col("l_partkey"))
          .agg(count(lit(1)).cast("long").as("n_buys"))
        val pairGaps = gaps.filter(col("gap").isNotNull)
          .select(col("l_partkey"), col("gap"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
        val perBrand = pairs
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_pairs"),
            count(when(col("n_buys") >= 2, 1)).cast("long")
              .as("repurchase_pairs"),
            round(count(when(col("n_buys") >= 2, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("repurchase_share"))
        val med = pairGaps.groupBy(col("p_brand"))
          .agg(round(expr("percentile(gap, 0.5)"), 6).as("median_cycle"))
        perBrand.join(med, Seq("p_brand"), "left")
          .select(col("p_brand").as("brand"), col("n_pairs"),
            col("repurchase_pairs"), col("repurchase_share"),
            col("median_cycle"))
          .orderBy(col("brand"))
      },
      Some("""WITH pd AS (SELECT DISTINCT o_custkey, l_partkey,
             |    CAST(datediff('day', DATE '1970-01-01',
             |      CAST(l_shipdate AS DATE)) AS BIGINT) AS day
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
             |g AS (SELECT o_custkey, l_partkey, day,
             |    day - lag(day) OVER (PARTITION BY o_custkey, l_partkey
             |      ORDER BY day) AS gap
             |  FROM pd),
             |pairs AS (SELECT o_custkey, l_partkey,
             |    CAST(count(*) AS BIGINT) AS n_buys
             |  FROM g GROUP BY 1, 2),
             |pb AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(count(*) FILTER (WHERE n_buys >= 2) AS BIGINT)
             |      AS repurchase_pairs,
             |    round(CAST(count(*) FILTER (WHERE n_buys >= 2) AS DOUBLE)
             |      / CAST(count(*) AS DOUBLE), 6) AS repurchase_share
             |  FROM pairs JOIN part ON l_partkey = p_partkey GROUP BY 1),
             |md AS (SELECT p_brand,
             |    round(quantile_cont(gap, 0.5), 6) AS median_cycle
             |  FROM g JOIN part ON l_partkey = p_partkey
             |  WHERE gap IS NOT NULL GROUP BY 1)
             |SELECT pb.p_brand AS brand, n_pairs, repurchase_pairs,
             |  repurchase_share, median_cycle
             |FROM pb LEFT JOIN md ON pb.p_brand = md.p_brand
             |ORDER BY brand""".stripMargin)),

    // ── q275: DISCOUNT DEPTH by brand — per brand: lines, the
    // line-mean discount and the REVENUE-WEIGHTED mean discount
    // (Σ disc·ep / Σep — both exact integer-product sums, so the
    // weighting introduces no float accumulation), and the deep-
    // discount share (≥ 8%): "who is buying revenue with margin" —
    // the margin-erosion screen next to q237's demand lift (does the
    // discount move units) and q173's promo share (how much revenue
    // is discounted at all). A revenue-weighted mean far above the
    // line mean names brands discounting exactly their big tickets.
    //
    // Scale shape: part dim co-partitioned/broadcast; all moments
    // accumulate map-side onto the |brands| grain in one exchange.
    QueryDef(
      "q275_discount_depth",
      (s, d) => {
        val pct = fxUnits(col("l_discount"), 100)
        val ep = fxUnits(col("l_extendedprice"), 100)
        val m = t(s, d, "lineitem")
          .select(col("l_partkey"), pct.as("pc"), ep.as("ep"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(col("pc").cast("decimal(38,0)")).as("sp"),
            sum(col("ep").cast("decimal(38,0)")).as("se"),
            sum((col("pc").cast("decimal(19,0)") *
              col("ep").cast("decimal(19,0)")).cast("decimal(38,0)"))
              .as("spe"),
            count(when(col("pc") >= 8, 1)).cast("long").as("deep_lines"))
        m.select(col("p_brand").as("brand"), col("n_lines"),
          round(col("sp").cast("double") /
            col("n_lines").cast("double"), 6).as("mean_discount_pct"),
          round(col("spe").cast("double") /
            col("se").cast("double"), 6).as("revw_discount_pct"),
          round(col("deep_lines").cast("double") /
            col("n_lines").cast("double"), 6).as("deep_share"))
          .orderBy(col("brand"))
      },
      Some("""WITH li AS (SELECT p_brand,
             |    CAST(round(l_discount*100) AS BIGINT) AS pc,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS ep
             |  FROM lineitem JOIN part ON l_partkey = p_partkey)
             |SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_lines,
             |  round(CAST(sum(CAST(pc AS HUGEINT)) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS mean_discount_pct,
             |  round(CAST(sum(CAST(pc AS HUGEINT)*ep) AS DOUBLE)
             |    / CAST(sum(CAST(ep AS HUGEINT)) AS DOUBLE), 6)
             |    AS revw_discount_pct,
             |  round(CAST(count(*) FILTER (WHERE pc >= 8) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS deep_share
             |FROM li GROUP BY 1 ORDER BY brand""".stripMargin)),

    // ── q277: TEMPLATE SKELETONS — structural (form-letter) duplicate
    // families: every digit run collapses to `9`, every letter run to
    // `a` (case-normalized, runs of spaces to one), so two documents
    // generated from the SAME template with different payloads share
    // a skeleton that exact-hash dedup (q22: byte-identical only) and
    // even shingle dedup (q25: payload tokens differ) both miss — the
    // third axis of the dedup family (exact bytes → near tokens →
    // STRUCTURE). Top-20 skeleton families by document frequency with
    // an example doc and the source spread (a family spanning sources
    // is a syndicated template, not a crawl artifact).
    //
    // Scale shape: the skeleton digest computes map-side (three
    // codegen'd regex passes + md5 — rows carry 16-byte digests,
    // never skeleton text); ONE digest-grain exchange; top-20 as
    // TakeOrdered, no global sort.
    QueryDef(
      "q277_template_skeletons",
      (s, d) => {
        val skel = md5(regexp_replace(regexp_replace(regexp_replace(
          lower(col("text")), "[0-9]+", "9"), "[a-z]+", "a"), " +", " "))
        // count(1), not countDistinct(doc_id) — one row per doc makes
        // them equal, and TWO distinct aggregates in one Aggregate
        // trigger Spark's RewriteDistinctAggregates Expand whose gid
        // branch numbering is PER-JVM hash order (caught by the r10
        // OrderHash sweeps: the fingerprint flipped with the JVM).
        // One distinct group plans Expand-free and deterministically.
        t(s, d, "documents")
          .select(col("doc_id"), col("source"), skel.as("skeleton_md5"))
          .groupBy(col("skeleton_md5"))
          .agg(count(lit(1)).cast("long").as("df"),
            countDistinct(col("source")).as("n_sources"),
            min(col("doc_id")).as("example_doc"))
          .filter(col("df") >= 2)
          .orderBy(col("df").desc, col("skeleton_md5"))
          .limit(20)
      },
      Some("""WITH sk AS (SELECT doc_id, source,
             |    md5(regexp_replace(regexp_replace(regexp_replace(
             |      lower(text), '[0-9]+', '9', 'g'), '[a-z]+', 'a', 'g'),
             |      ' +', ' ', 'g')) AS skeleton_md5
             |  FROM documents),
             |agg AS (SELECT skeleton_md5,
             |    count(DISTINCT doc_id) AS df,
             |    count(DISTINCT source) AS n_sources,
             |    min(doc_id) AS example_doc
             |  FROM sk GROUP BY 1)
             |SELECT skeleton_md5, df, n_sources, example_doc
             |FROM agg WHERE df >= 2
             |ORDER BY df DESC, skeleton_md5 LIMIT 20""".stripMargin)),

    // ── q278: BRAND REACH — the market-penetration curve: per brand,
    // its first ship day, the nations (of the buying customer) it
    // ever reached, and the exact days from launch to HALF coverage
    // (the ⌈n/2⌉-th nation's first-purchase day): "did this line roll
    // out everywhere at once or crawl market by market" — the
    // adoption-axis companion to q233's volume ramp (how much) and
    // q177's share (how big); this reads how WIDE, how fast. All
    // integer day arithmetic; nation order ties break on nationkey.
    //
    // Scale shape: q234's two-fact-join shape reaches the customer
    // nation (dims broadcast); the collapse to (brand, nation) first
    // days is one exchange; the half-coverage rank is a per-brand
    // window over ≤|nations| rows (bounded-cardinality class).
    QueryDef(
      "q278_brand_reach",
      (s, d) => {
        val bn = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"),
            epochDay(col("l_shipdate")).as("day"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("c_nationkey"))
          .agg(min(col("day")).as("first_day"))
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("first_day"), col("c_nationkey"))
        val ranked = bn
          .withColumn("rk", row_number().over(w))
          .withColumn("n_nations",
            count(lit(1)).over(Window.partitionBy(col("p_brand"))))
          .withColumn("launch",
            min(col("first_day")).over(Window.partitionBy(col("p_brand"))))
        ranked
          // integral DIV: a Column `/` is double division and would
          // silently drop every brand with an EVEN nation count
          .filter(col("rk") === expr("(n_nations + 1) DIV 2"))
          .select(col("p_brand").as("brand"),
            col("n_nations").cast("long").as("n_nations"),
            col("launch").cast("long").as("launch_day"),
            (col("first_day") - col("launch")).cast("long")
              .as("days_to_half_coverage"))
          .orderBy(col("brand"))
      },
      Some("""WITH bn AS (SELECT p_brand, c_nationkey,
             |    min(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(l_shipdate AS DATE)) AS BIGINT)) AS first_day
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |r AS (SELECT p_brand, first_day,
             |    row_number() OVER (PARTITION BY p_brand
             |      ORDER BY first_day, c_nationkey) AS rk,
             |    count(*) OVER (PARTITION BY p_brand) AS n_nations,
             |    min(first_day) OVER (PARTITION BY p_brand) AS launch
             |  FROM bn)
             |SELECT p_brand AS brand,
             |  CAST(n_nations AS BIGINT) AS n_nations,
             |  CAST(launch AS BIGINT) AS launch_day,
             |  CAST(first_day - launch AS BIGINT) AS days_to_half_coverage
             |FROM r WHERE rk = (n_nations + 1) // 2
             |ORDER BY brand""".stripMargin)),

    // ── q279: SPEND VELOCITY — per market segment: the median
    // per-customer DAILY spend rate over each customer's active span
    // (total cents · 10⁶ div span days — micro-quantized BEFORE the
    // percentile, the r10 ratio-median discipline from q234/q254/
    // q264), plus the customers too short-lived to rate (single
    // order day): "how fast does a segment's customer burn money
    // while active" — the tempo face of q128's RFM monetary total
    // (which ignores the span) and q231's cadence (which ignores the
    // money).
    //
    // Scale shape: the fact collapses to the customer grain (span
    // bounds + exact cents) in the orderkey→custkey exchanges; the
    // segment rollup bounds the percentile buffer by
    // customers-per-segment; output |segments| rows.
    QueryDef(
      "q279_spend_velocity",
      (s, d) => {
        val per = t(s, d, "orders")
          .select(col("o_custkey"),
            epochDay(col("o_orderdate")).as("day"),
            fxUnits(col("o_totalprice"), 100).as("cents"))
          .groupBy(col("o_custkey"))
          .agg(sum(col("cents").cast("decimal(38,0)")).as("spend"),
            (max(col("day")) - min(col("day"))).cast("long").as("span"))
        val rated = per
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          // rate exists only over a real span; 10⁶·cents DIV days —
          // decimal, never a float (spend·10⁶ crosses 2⁶³ at 100 TB)
          .withColumn("ratem", when(col("span") > 0,
            expr("CAST(spend * 1000000 AS DECIMAL(38,0)) DIV span")))
        rated.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).cast("long").as("n_customers"),
            count(when(col("span") === 0, 1)).cast("long")
              .as("single_day_customers"),
            round(expr("percentile(ratem, 0.5)") / lit(1000000.0), 7)
              .as("median_cents_per_day"))
          .select(col("c_mktsegment").as("segment"), col("n_customers"),
            col("single_day_customers"), col("median_cents_per_day"))
          .orderBy(col("segment"))
      },
      Some("""WITH per AS (SELECT o_custkey,
             |    sum(CAST(CAST(round(o_totalprice*100) AS BIGINT)
             |      AS HUGEINT)) AS spend,
             |    max(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT))
             |    - min(CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT)) AS span
             |  FROM orders GROUP BY 1),
             |r AS (SELECT c_mktsegment, span,
             |    CASE WHEN span > 0 THEN (spend*1000000)//span END AS ratem
             |  FROM per JOIN customer ON o_custkey = c_custkey)
             |SELECT c_mktsegment AS segment,
             |  CAST(count(*) AS BIGINT) AS n_customers,
             |  CAST(count(*) FILTER (WHERE span = 0) AS BIGINT)
             |    AS single_day_customers,
             |  round(quantile_cont(ratem, 0.5)/1000000.0, 7)
             |    AS median_cents_per_day
             |FROM r GROUP BY 1 ORDER BY segment""".stripMargin)),

    // ── q280: SUPPLIER SWITCHING — among q274's repurchase pairs (a
    // customer re-buying the SAME part on a later day), how many came
    // from a DIFFERENT supplier the second time: per brand, the
    // repurchase pairs, the switched pairs (≥2 distinct suppliers
    // across the pair's purchases), and the switch share: "is demand
    // loyal to the product but promiscuous on supply" — the
    // supply-churn face of q274's cycle (when they re-buy) and q169's
    // supplier diversity (how many suppliers exist); this reads
    // whether the SAME buyer actually rotates them.
    //
    // Scale shape: one orderkey exchange reaches custkey; the
    // (customer, part) collapse carries both distinct counts in one
    // exchange (day + supplier grain bounded per pair); the brand
    // rollup rides the partkey-co-partitioned dim join.
    QueryDef(
      "q280_supplier_switching",
      (s, d) => {
        // two distinct PRE-COLLAPSES + a pair-grain join instead of
        // two countDistinct in one Aggregate: the multi-distinct form
        // triggers Spark's Expand rewrite whose gid numbering is
        // per-JVM hash order (the r10 OrderHash catch — see q277),
        // and at scale the Expand triples the fact rows anyway while
        // each pre-collapse shrinks monotonically.
        //
        // r14: the two pre-collapses ride ONE chain. The former
        // branches pruned different columns (day vs suppkey) out of
        // the clone Catalyst makes per consumer, fell out of exchange
        // reuse, and EXECUTED the lineitem⨝orders tower twice
        // (finalized-plan ranScans: lineitem×2). Each joined row now
        // emits its two (role, value) facets — ('d', day) and
        // ('s', suppkey) — through one 2-element explode, so the SAME
        // dedup → count → 2-role pivot chain carries both distinct
        // counts: identical shuffle mass to the two branches combined
        // (day-rows + supp-rows), one scan, all codegen aggregates.
        // (Tried and rejected: a shared 4-tuple distinct() parity
        // frame — the optimizer collapses distinct∘project∘distinct
        // per branch, re-diverging the clones; and a collect_set
        // single-aggregation — measured +30% locally, ObjectHash-
        // Aggregate beats the codegen dedup levels only above the
        // scan it saves.) Output unchanged (oracle hash-green).
        val base = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            epochDay(col("l_shipdate")).as("day"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey"), col("l_partkey"), col("l_suppkey"),
            col("day"))
        val pairs = base
          .select(col("o_custkey"), col("l_partkey"),
            explode(array(
              struct(lit("d").as("r"), col("day").as("v")),
              struct(lit("s").as("r"), col("l_suppkey").as("v"))))
              .as("e"))
          .select(col("o_custkey"), col("l_partkey"),
            col("e.r").as("r"), col("e.v").as("v"))
          .distinct()
          .groupBy(col("o_custkey"), col("l_partkey"), col("r"))
          .agg(count(lit(1)).cast("long").as("cnt"))
          .groupBy(col("o_custkey"), col("l_partkey"))
          .agg(max(when(col("r") === "d", col("cnt"))).as("n_days"),
            max(when(col("r") === "s", col("cnt"))).as("n_supp"))
          .filter(col("n_days") >= 2)
        pairs
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).cast("long").as("repurchase_pairs"),
            count(when(col("n_supp") >= 2, 1)).cast("long")
              .as("switched_pairs"),
            round(count(when(col("n_supp") >= 2, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("switch_share"))
          .select(col("p_brand").as("brand"), col("repurchase_pairs"),
            col("switched_pairs"), col("switch_share"))
          .orderBy(col("brand"))
      },
      Some("""WITH p AS (SELECT o_custkey, l_partkey,
             |    count(DISTINCT CAST(datediff('day', DATE '1970-01-01',
             |      CAST(l_shipdate AS DATE)) AS BIGINT)) AS n_days,
             |    count(DISTINCT l_suppkey) AS n_supp
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  GROUP BY 1, 2)
             |SELECT p_brand AS brand,
             |  CAST(count(*) AS BIGINT) AS repurchase_pairs,
             |  CAST(count(*) FILTER (WHERE n_supp >= 2) AS BIGINT)
             |    AS switched_pairs,
             |  round(CAST(count(*) FILTER (WHERE n_supp >= 2) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS switch_share
             |FROM p JOIN part ON l_partkey = p_partkey
             |WHERE n_days >= 2 GROUP BY 1 ORDER BY brand""".stripMargin)),

    // ── q281: BASKET ENTROPY — per order, the Shannon entropy of its
    // brand mix (H = ln n − (Σ c·ln c)/n over per-brand line counts),
    // then per segment: the median order entropy and the share of
    // single-brand (H = 0) orders: "does a segment shop focused or
    // scattered within one basket" — the within-ORDER diversity
    // companion to q234's across-history loyalty and q238's basket
    // size/value profile. Exactness: each ln(c) term quantizes to
    // integer micro-nats map-side (q107's entropy discipline), the
    // per-order H derives by integer DIV, and the segment median
    // rides those longs (the r10 ratio-median rule) — no float
    // accumulates anywhere.
    //
    // Scale shape: the (order, brand) collapse and the order collapse
    // are successive grain reductions in the partkey/orderkey
    // exchanges; the custkey join brings the segment; the rollup
    // bounds the percentile buffer by orders-per-segment.
    QueryDef(
      "q281_basket_entropy",
      (s, d) => {
        val ob = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .join(t(s, d, "part").select(col("p_partkey"), col("p_brand")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_orderkey"), col("p_brand"))
          .agg(count(lit(1)).cast("long").as("c"))
        val per = ob.groupBy(col("l_orderkey"))
          .agg(sum(col("c")).cast("long").as("n"),
            sum((round(lit(1000000.0) * log(col("c").cast("double")), 0)
              .cast("long") * col("c")).cast("decimal(38,0)"))
              .as("clnc"))
          .withColumn("hm",
            round(lit(1000000.0) * log(col("n").cast("double")), 0)
              .cast("long") -
              expr("CAST(clnc AS DECIMAL(38,0)) DIV n"))
        per
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            count(when(col("hm") === 0, 1)).cast("long")
              .as("single_brand_orders"),
            round(expr("percentile(hm, 0.5)") / lit(1000000.0), 7)
              .as("median_entropy_nats"))
          .select(col("c_mktsegment").as("segment"), col("n_orders"),
            col("single_brand_orders"), col("median_entropy_nats"))
          .orderBy(col("segment"))
      },
      Some("""WITH ob AS (SELECT l_orderkey, p_brand,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |per AS (SELECT l_orderkey, CAST(sum(c) AS BIGINT) AS n,
             |    sum(CAST(CAST(round(1000000.0*ln(c)) AS BIGINT)
             |      AS HUGEINT) * c) AS clnc
             |  FROM ob GROUP BY 1),
             |h AS (SELECT l_orderkey, n,
             |    CAST(round(1000000.0*ln(n)) AS BIGINT)
             |      - clnc//n AS hm
             |  FROM per)
             |SELECT c_mktsegment AS segment,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(count(*) FILTER (WHERE hm = 0) AS BIGINT)
             |    AS single_brand_orders,
             |  round(quantile_cont(hm, 0.5)/1000000.0, 7)
             |    AS median_entropy_nats
             |FROM h
             |JOIN orders ON h.l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY segment""".stripMargin)),

    // ── q282: REPEAT-BASKET SHARE — for each customer's consecutive
    // order pair (by order date, orderkey tie-break), the share of
    // the later order's distinct parts ALREADY in the earlier one;
    // per segment: transitions, the any-repeat share, and the median
    // repeat share (micro-quantized longs, the r10 rule): "do repeat
    // orders re-buy the basket or explore" — the basket-CONTINUITY
    // readout between q274 (same-part cycles, ignores the rest of
    // the basket) and q228 (spend migration, ignores composition).
    //
    // Scale shape: the per-order distinct part SET collapses in the
    // orderkey exchange (array payload bounded by basket size); the
    // lag is a per-customer window over that customer's orders
    // (bounded); set intersection is a codegen'd array op on two
    // basket-sized arrays — never a join.
    QueryDef(
      "q282_repeat_basket_share",
      (s, d) => {
        val baskets = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey"))
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey"),
              epochDay(col("o_orderdate")).as("day")),
            col("l_orderkey") === col("o_orderkey"))
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("day"), col("o_orderkey"))
        val trans = baskets
          .withColumn("prev", lag(col("parts"), 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("inter",
            size(array_intersect(col("parts"), col("prev"))).cast("long"))
          .withColumn("sharem",
            expr("inter * CAST(1000000 AS BIGINT) DIV size(parts)"))
        trans
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_mktsegment")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).cast("long").as("n_transitions"),
            count(when(col("inter") >= 1, 1)).cast("long")
              .as("any_repeat"),
            round(count(when(col("inter") >= 1, 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("any_repeat_share"),
            round(expr("percentile(sharem, 0.5)") / lit(1000000.0), 7)
              .as("median_repeat_share"))
          .select(col("c_mktsegment").as("segment"), col("n_transitions"),
            col("any_repeat"), col("any_repeat_share"),
            col("median_repeat_share"))
          .orderBy(col("segment"))
      },
      Some("""WITH b AS (SELECT l_orderkey,
             |    list_sort(list_distinct(list(l_partkey))) AS parts
             |  FROM lineitem GROUP BY 1),
             |o AS (SELECT o_orderkey, o_custkey,
             |    CAST(datediff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS BIGINT) AS day, parts
             |  FROM b JOIN orders ON l_orderkey = o_orderkey),
             |tr AS (SELECT o_custkey, parts,
             |    lag(parts) OVER (PARTITION BY o_custkey
             |      ORDER BY day, o_orderkey) AS prev
             |  FROM o),
             |x AS (SELECT o_custkey,
             |    CAST(len(list_intersect(parts, prev)) AS BIGINT)
             |      AS inter,
             |    (CAST(len(list_intersect(parts, prev)) AS BIGINT)
             |      * 1000000) // CAST(len(parts) AS BIGINT) AS sharem
             |  FROM tr WHERE prev IS NOT NULL)
             |SELECT c_mktsegment AS segment,
             |  CAST(count(*) AS BIGINT) AS n_transitions,
             |  CAST(count(*) FILTER (WHERE inter >= 1) AS BIGINT)
             |    AS any_repeat,
             |  round(CAST(count(*) FILTER (WHERE inter >= 1) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS any_repeat_share,
             |  round(quantile_cont(sharem, 0.5)/1000000.0, 7)
             |    AS median_repeat_share
             |FROM x JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1 ORDER BY segment""".stripMargin)),

    // ── q283: TAX×DISCOUNT joint grid — per (discount pct, tax pct)
    // cell: lines, exact revenue, and the cell's effective price
    // multiplier (1−d)(1+t) as exact integer basis points: "are taxes
    // and discounts INDEPENDENT levers or do they travel together" —
    // the pricing-policy audit q275 (discount alone, by brand) and
    // q211 (aggregate Q1 sums) cannot see; a populated high-d/high-t
    // diagonal means discounts are quietly clawed back as tax. Both
    // pcts are exact integer cents-of-percent; the multiplier
    // (100−d)(100+t) is one integer product (basis points), so every
    // column is exact.
    //
    // Scale shape: pure map-side classification; one exchange onto
    // the ≤|d|×|t| (≈11×9) grid — bounded-cardinality class.
    QueryDef(
      "q283_tax_discount_grid",
      (s, d) => {
        t(s, d, "lineitem")
          .select(fxUnits(col("l_discount"), 100).as("dp"),
            fxUnits(col("l_tax"), 100).as("tp"),
            revMicro.as("rm"))
          .groupBy(col("dp"), col("tp"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            // 4-decimal display: the micro-cent sum TERMINATES at 4
            // decimals, so rounding there is tie-free (the q243/q246
            // half-cent lesson; round(·, 2) hit a live …855 tie at
            // sf0.01)
            round(sum(col("rm").cast("decimal(38,0)")).cast("double")
              / 10000.0, 4).as("revenue"))
          .withColumn("mult_bp",
            ((lit(100L) - col("dp")) * (lit(100L) + col("tp")))
              .cast("long"))
          .select(col("dp").as("discount_pct"), col("tp").as("tax_pct"),
            col("n_lines"), col("revenue"), col("mult_bp"))
          .orderBy(col("discount_pct"), col("tax_pct"))
      },
      Some(s"""SELECT CAST(round(l_discount*100) AS BIGINT) AS discount_pct,
             |  CAST(round(l_tax*100) AS BIGINT) AS tax_pct,
             |  CAST(count(*) AS BIGINT) AS n_lines,
             |  round(CAST(sum(CAST($revMicroSql AS HUGEINT)) AS DOUBLE)
             |    / 10000.0, 4) AS revenue,
             |  (100 - CAST(round(l_discount*100) AS BIGINT))
             |    * (100 + CAST(round(l_tax*100) AS BIGINT)) AS mult_bp
             |FROM lineitem GROUP BY 1, 2
             |ORDER BY discount_pct, tax_pct""".stripMargin)),

    // ── q284: STATUS consistency audit — the order-vs-line state
    // machine: an order is 'F' iff every line is 'F', 'O' iff every
    // line is 'O', else 'P' (the TPC-H generation rule); per order
    // status: orders, orders whose line mix CONTRADICTS the rule, and
    // the violation share. q101 audits KEYS (orphans); this audits
    // STATE AGREEMENT between the two grains — the referential-
    // semantics face of data-quality (a loader that re-stated orders
    // without restating lines corrupts exactly this invariant).
    //
    // Scale shape: the line mix collapses to per-order counts in the
    // orderkey exchange (co-partitioned with the orders join); the
    // rollup lands on |statuses| rows.
    QueryDef(
      "q284_status_consistency",
      (s, d) => {
        val mix = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).cast("long").as("n"),
            count(when(col("l_linestatus") === "F", 1)).cast("long")
              .as("nf"))
        val expected = when(col("nf") === col("n"), lit("F"))
          .when(col("nf") === 0L, lit("O")).otherwise(lit("P"))
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"))
          .join(mix, col("o_orderkey") === col("l_orderkey"))
          .withColumn("bad", col("o_orderstatus") =!= expected)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            count(when(col("bad"), 1)).cast("long").as("violations"),
            round(count(when(col("bad"), 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("violation_share"))
          .select(col("o_orderstatus").as("status"), col("n_orders"),
            col("violations"), col("violation_share"))
          .orderBy(col("status"))
      },
      Some("""WITH mix AS (SELECT l_orderkey,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(count(*) FILTER (WHERE l_linestatus = 'F')
             |      AS BIGINT) AS nf
             |  FROM lineitem GROUP BY 1),
             |j AS (SELECT o_orderstatus,
             |    o_orderstatus <> (CASE WHEN nf = n THEN 'F'
             |      WHEN nf = 0 THEN 'O' ELSE 'P' END) AS bad
             |  FROM orders JOIN mix ON o_orderkey = l_orderkey)
             |SELECT o_orderstatus AS status,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(count(*) FILTER (WHERE bad) AS BIGINT) AS violations,
             |  round(CAST(count(*) FILTER (WHERE bad) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS violation_share
             |FROM j GROUP BY 1 ORDER BY status""".stripMargin)),

    // ── q285: SUPPLIER balance-vs-volume deciles — suppliers ranked
    // into exact account-balance deciles (q258's customer arithmetic
    // on the supply side): per decile, suppliers, shipped revenue,
    // and the revenue share: "does working capital track business
    // volume" — a flat profile says balance is independent of
    // throughput; a loaded top decile says the biggest books carry
    // the flow. Decile = exact global rank arithmetic
    // ([[Q.exactDecile]] — no ntile window nondeterminism), balance
    // ties broken by suppkey.
    //
    // Scale shape: the balance rank is the two-pass range exchange
    // (globalRankByRange — never a single-partition window); revenue
    // collapses to the supplier grain in one suppkey exchange;
    // the rollup lands on 10 rows.
    QueryDef(
      "q285_supplier_balance_deciles",
      (s, d) => {
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey"), fxUnits(col("s_acctbal"), 100).as("bal"))
        val n = sup.count()
        val ranked = globalRankByRange(sup, Seq(col("bal"), col("s_suppkey")))
          .withColumn("decile", exactDecile(col("rn"), n))
        val rev = t(s, d, "lineitem")
          .groupBy(col("l_suppkey"))
          .agg(sum(revMicro.cast("decimal(38,0)")).as("rm"))
        val w = Window.partitionBy(lit(1))
        ranked
          .join(rev, col("s_suppkey") === col("l_suppkey"), "left")
          .groupBy(col("decile"))
          .agg(count(lit(1)).cast("long").as("n_suppliers"),
            sum(coalesce(col("rm"), lit(0L).cast("decimal(38,0)")))
              .as("rmv"))
          .withColumn("grand", sum(col("rmv")).over(w))
          .select(col("decile"),
            col("n_suppliers"),
            round(col("rmv").cast("double") / 10000.0, 4).as("revenue"),
            round(col("rmv").cast("double") /
              col("grand").cast("double"), 6).as("revenue_share"))
          .orderBy(col("decile"))
      },
      Some(s"""WITH sup AS (SELECT s_suppkey,
             |    CAST(round(s_acctbal*100) AS BIGINT) AS bal
             |  FROM supplier),
             |dec AS (SELECT s_suppkey, ntile(10) OVER (
             |    ORDER BY bal, s_suppkey) AS decile FROM sup),
             |rev AS (SELECT l_suppkey,
             |    sum(CAST($revMicroSql AS HUGEINT)) AS rm
             |  FROM lineitem GROUP BY 1),
             |agg AS (SELECT decile,
             |    CAST(count(*) AS BIGINT) AS n_suppliers,
             |    sum(coalesce(rm, 0)) AS rmv
             |  FROM dec LEFT JOIN rev ON s_suppkey = l_suppkey
             |  GROUP BY 1)
             |SELECT decile, n_suppliers,
             |  round(CAST(rmv AS DOUBLE)/10000.0, 4) AS revenue,
             |  round(CAST(rmv AS DOUBLE)/CAST(sum(rmv) OVER () AS DOUBLE),
             |    6) AS revenue_share
             |FROM agg ORDER BY decile""".stripMargin)),

    // ── q286: PRIORITY discount bias — per order priority: lines,
    // mean discount (exact integer ratio), the revenue-weighted mean
    // (q275's exact weighting), and the deep-discount (≥8%) share:
    // "do urgent orders pay list price" — a negative bias (urgent <
    // relaxed) means ops is pricing urgency, a flat profile means
    // discounts are a pure sales lever. The priority axis completes
    // q275's brand axis and q237's lift.
    //
    // Scale shape: one orderkey exchange brings the priority onto the
    // fact; all moments accumulate map-side onto |priorities| rows.
    QueryDef(
      "q286_priority_discount_bias",
      (s, d) => {
        val m = t(s, d, "lineitem")
          .select(col("l_orderkey"),
            fxUnits(col("l_discount"), 100).as("pc"),
            fxUnits(col("l_extendedprice"), 100).as("ep"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(col("pc").cast("decimal(38,0)")).as("sp"),
            sum(col("ep").cast("decimal(38,0)")).as("se"),
            sum((col("pc").cast("decimal(19,0)") *
              col("ep").cast("decimal(19,0)")).cast("decimal(38,0)"))
              .as("spe"),
            count(when(col("pc") >= 8, 1)).cast("long").as("deep"))
        m.select(col("o_orderpriority").as("priority"), col("n_lines"),
          round(col("sp").cast("double") /
            col("n_lines").cast("double"), 6).as("mean_discount_pct"),
          round(col("spe").cast("double") /
            col("se").cast("double"), 6).as("revw_discount_pct"),
          round(col("deep").cast("double") /
            col("n_lines").cast("double"), 6).as("deep_share"))
          .orderBy(col("priority"))
      },
      Some("""WITH li AS (SELECT o_orderpriority,
             |    CAST(round(l_discount*100) AS BIGINT) AS pc,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS ep
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
             |SELECT o_orderpriority AS priority,
             |  CAST(count(*) AS BIGINT) AS n_lines,
             |  round(CAST(sum(CAST(pc AS HUGEINT)) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS mean_discount_pct,
             |  round(CAST(sum(CAST(pc AS HUGEINT)*ep) AS DOUBLE)
             |    / CAST(sum(CAST(ep AS HUGEINT)) AS DOUBLE), 6)
             |    AS revw_discount_pct,
             |  round(CAST(count(*) FILTER (WHERE pc >= 8) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS deep_share
             |FROM li GROUP BY 1 ORDER BY priority""".stripMargin)),

    // ── q287: PRODUCT-WORD revenue — explode the part NAME vocabulary
    // and attribute shipped revenue to each word: top-20 words by
    // revenue with part counts: "which product words sell" — the
    // text-to-money bridge (q59's TF-IDF ranks words by statistics;
    // this ranks them by the till) and the merchandising twin of
    // q218's important PARTS. Name tokens are space-split and
    // lower()ed; a part's revenue attributes to each of its DISTINCT
    // words once (a word repeated in one name must not double its
    // till).
    //
    // Scale shape: revenue first collapses to the part grain (one
    // partkey exchange), THEN the ≤|part|·|name words| explode runs
    // on the dim-sized frame, never on the fact; top-20 as
    // TakeOrdered.
    QueryDef(
      "q287_product_word_revenue",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(revMicro.cast("decimal(38,0)")).as("rm"))
        t(s, d, "part")
          .join(rev, col("p_partkey") === col("l_partkey"))
          .select(col("p_partkey"), col("rm"),
            explode(array_distinct(filter(
              split(lower(col("p_name")), " "),
              tk => length(tk) > 0))).as("word"))
          .groupBy(col("word"))
          .agg(countDistinct(col("p_partkey")).as("n_parts"),
            round(sum(col("rm")).cast("double") / 10000.0, 4)
              .as("revenue"))
          .orderBy(col("revenue").desc, col("word"))
          .limit(20)
      },
      Some(s"""WITH rev AS (SELECT l_partkey,
             |    sum(CAST($revMicroSql AS HUGEINT)) AS rm
             |  FROM lineitem GROUP BY 1),
             |w AS (SELECT p_partkey, rm, w.word
             |  FROM part JOIN rev ON p_partkey = l_partkey,
             |    unnest(list_distinct(list_filter(
             |      string_split(lower(p_name), ' '),
             |      x -> len(x) > 0))) AS w(word)),
             |agg AS (SELECT word,
             |    count(DISTINCT p_partkey) AS n_parts,
             |    round(CAST(sum(rm) AS DOUBLE)/10000.0, 4) AS revenue
             |  FROM w GROUP BY 1)
             |SELECT word, n_parts, revenue FROM agg
             |ORDER BY revenue DESC, word LIMIT 20""".stripMargin)),

    // ── q288: VOLUME-DISCOUNT curve — per exact order quantity (the
    // lineitem grain's integer units): lines, the mean realized unit
    // price in micro-cents (Σep·10⁶ DIV Σqty-units — one integral
    // division of exact sums), and the mean discount: "does buying
    // more actually cost less per unit" — the quantity axis of the
    // price surface (q227 regresses demand per brand; q254/q264 audit
    // drift/parity; this reads the posted CURVE). A flat unit-price
    // column with a rising discount column means the discount is
    // nominal — list prices absorb it.
    //
    // Scale shape: pure map-side classification onto the ≤50-value
    // quantity domain; one bounded exchange.
    QueryDef(
      "q288_volume_discount_curve",
      (s, d) => {
        t(s, d, "lineitem")
          .select(fxUnits(col("l_quantity"), 100).as("qu"),
            fxUnits(col("l_extendedprice"), 100).as("ep"),
            fxUnits(col("l_discount"), 100).as("pc"))
          .groupBy(col("qu"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(col("ep").cast("decimal(38,0)")).as("sep"),
            sum(col("qu").cast("decimal(38,0)")).as("squ"),
            sum(col("pc").cast("decimal(38,0)")).as("spc"))
          .withColumn("upm",
            expr("CAST(sep * 1000000 AS DECIMAL(38,0)) DIV squ"))
          .select((col("qu") / lit(100L)).cast("long").as("quantity"),
            col("n_lines"),
            round(col("upm").cast("double") / 1000000.0, 7)
              .as("unit_price_cents"),
            round(col("spc").cast("double") /
              col("n_lines").cast("double"), 6).as("mean_discount_pct"))
          .orderBy(col("quantity"))
      },
      Some("""WITH li AS (SELECT
             |    CAST(round(l_quantity*100) AS BIGINT) AS qu,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS ep,
             |    CAST(round(l_discount*100) AS BIGINT) AS pc
             |  FROM lineitem),
             |g AS (SELECT qu, CAST(count(*) AS BIGINT) AS n_lines,
             |    sum(CAST(ep AS HUGEINT)) AS sep,
             |    sum(CAST(qu AS HUGEINT)) AS squ,
             |    sum(CAST(pc AS HUGEINT)) AS spc
             |  FROM li GROUP BY 1)
             |SELECT qu // 100 AS quantity, n_lines,
             |  round(CAST((sep*1000000)//squ AS DOUBLE)/1000000.0, 7)
             |    AS unit_price_cents,
             |  round(CAST(spc AS DOUBLE)/CAST(n_lines AS DOUBLE), 6)
             |    AS mean_discount_pct
             |FROM g ORDER BY quantity""".stripMargin)),

    // ── q289: TOKEN-LENGTH profile — per language: tokens, mean token
    // length in chars (exact integer ratio), the exact median token
    // length (integer percentile — terminates at 1 decimal, tie-free
    // by construction), and the ≥15-char token share: the MORPHOLOGY
    // screen (agglutinative text, URL/code contamination, and broken
    // tokenizers all announce themselves here first) next to q30's
    // lang-ID, q247's script mix, and q32's counts — those read how
    // MANY tokens; this reads their SHAPE.
    //
    // Scale shape: lengths explode map-side but collapse to the
    // (lang, token-length) grain (≤|langs|×max-len rows) BEFORE the
    // exchange; the median derives from the bounded histogram by
    // exact cumulative arithmetic, never a corpus-wide percentile
    // buffer.
    QueryDef(
      "q289_token_length_profile",
      (s, d) => {
        val tl = t(s, d, "documents")
          .select(col("lang"), explode(filter(
            split(col("text"), " "), tk => length(tk) > 0)).as("tok"))
          .select(col("lang"), length(col("tok")).cast("long").as("len"))
          .groupBy(col("lang"), col("len"))
          .agg(count(lit(1)).cast("long").as("c"))
        val w = Window.partitionBy(col("lang")).orderBy(col("len"))
        val wAll = Window.partitionBy(col("lang"))
        val h = tl
          .withColumn("cum", sum(col("c")).over(w))
          .withColumn("n", sum(col("c")).over(wAll))
          .withColumn("slen", sum((col("len").cast("decimal(19,0)") *
            col("c").cast("decimal(19,0)")).cast("decimal(38,0)"))
            .over(wAll))
          .withColumn("long_toks",
            sum(when(col("len") >= 15, col("c")).otherwise(lit(0L)))
              .over(wAll))
        // exact median from the histogram: lo = first len with
        // 2·cum ≥ n, hi = first len with 2·cum ≥ n + 2·(n mod 2 = 0)
        // — for even n the median is (k_{n/2} + k_{n/2+1})/2
        val lo = h.filter(col("cum") * 2 >= col("n"))
          .groupBy(col("lang")).agg(min(col("len")).as("mlo"))
        val hi = h.filter(col("cum") * 2 >= col("n") + 2 ||
            col("n") % 2 === 1 && col("cum") * 2 >= col("n"))
          .groupBy(col("lang")).agg(min(col("len")).as("mhi"))
        val per = h.groupBy(col("lang"))
          .agg(max(col("n")).as("n_tokens"),
            max(col("slen")).as("slen"),
            max(col("long_toks")).as("long_toks"))
        per.join(lo, Seq("lang")).join(hi, Seq("lang"))
          .select(col("lang"), col("n_tokens").cast("long").as("n_tokens"),
            round(col("slen").cast("double") /
              col("n_tokens").cast("double"), 6).as("mean_len"),
            round((col("mlo") + col("mhi")).cast("double") / 2.0, 1)
              .as("median_len"),
            round(col("long_toks").cast("double") /
              col("n_tokens").cast("double"), 6).as("long_share"))
          .orderBy(col("lang"))
      },
      Some("""WITH tok AS (SELECT lang, len(w.t) AS len
             |  FROM documents,
             |    unnest(list_filter(string_split(text, ' '),
             |      x -> len(x) > 0)) AS w(t)),
             |h AS (SELECT lang, CAST(len AS BIGINT) AS len,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM tok GROUP BY 1, 2),
             |x AS (SELECT lang, len, c,
             |    sum(c) OVER (PARTITION BY lang ORDER BY len) AS cum,
             |    sum(c) OVER (PARTITION BY lang) AS n,
             |    sum(CAST(len AS HUGEINT)*c) OVER (PARTITION BY lang)
             |      AS slen,
             |    sum(CASE WHEN len >= 15 THEN c ELSE 0 END)
             |      OVER (PARTITION BY lang) AS long_toks
             |  FROM h),
             |lo AS (SELECT lang, min(len) AS mlo FROM x
             |  WHERE cum*2 >= n GROUP BY 1),
             |hi AS (SELECT lang, min(len) AS mhi FROM x
             |  WHERE cum*2 >= n + 2 OR (n % 2 = 1 AND cum*2 >= n)
             |  GROUP BY 1),
             |per AS (SELECT lang, max(n) AS n_tokens, max(slen) AS slen,
             |    max(long_toks) AS long_toks
             |  FROM x GROUP BY 1)
             |SELECT per.lang, CAST(n_tokens AS BIGINT) AS n_tokens,
             |  round(CAST(slen AS DOUBLE)/CAST(n_tokens AS DOUBLE), 6)
             |    AS mean_len,
             |  round(CAST(mlo + mhi AS DOUBLE)/2.0, 1) AS median_len,
             |  round(CAST(long_toks AS DOUBLE)/CAST(n_tokens AS DOUBLE),
             |    6) AS long_share
             |FROM per JOIN lo ON per.lang = lo.lang
             |JOIN hi ON per.lang = hi.lang
             |ORDER BY per.lang""".stripMargin)),

    // ── q290: ACQUISITION curve — per order month: active customers,
    // NEW customers (first-ever order that month), and the new-vs-
    // returning revenue split: "is growth acquisition or retention" —
    // the order-book face of q226's weekly event-user growth
    // accounting (different clock, different grain, different
    // money). No distinct aggregate anywhere: the (month, customer)
    // collapse makes activity a plain count and is_new a min-month
    // comparison (the r10 no-multi-distinct rule).
    //
    // Scale shape: one custkey exchange builds the (month, customer)
    // grain with exact cents; the first-month frame is a second
    // collapse of the SAME grain (customer-grain, ≤|customers| rows);
    // the rollup lands on |months| rows.
    QueryDef(
      "q290_acquisition_curve",
      (s, d) => {
        val mc = t(s, d, "orders")
          .select(col("o_custkey"),
            date_format(col("o_orderdate"), "yyyy-MM").as("m"),
            fxUnits(col("o_totalprice"), 100).as("cents"))
          .groupBy(col("m"), col("o_custkey"))
          .agg(sum(col("cents").cast("decimal(38,0)")).as("spend"))
        val first = mc.groupBy(col("o_custkey"))
          .agg(min(col("m")).as("m0"))
        mc.join(first, Seq("o_custkey"))
          .withColumn("is_new", col("m") === col("m0"))
          .groupBy(col("m"))
          .agg(count(lit(1)).cast("long").as("active_customers"),
            count(when(col("is_new"), 1)).cast("long")
              .as("new_customers"),
            round(sum(when(col("is_new"), col("spend"))
              .otherwise(lit(0L).cast("decimal(38,0)"))).cast("double")
              / 100.0, 2).as("new_revenue"),
            round(sum(when(!col("is_new"), col("spend"))
              .otherwise(lit(0L).cast("decimal(38,0)"))).cast("double")
              / 100.0, 2).as("returning_revenue"))
          .select(col("m").as("month"), col("active_customers"),
            col("new_customers"), col("new_revenue"),
            col("returning_revenue"))
          .orderBy(col("month"))
      },
      Some("""WITH mc AS (SELECT strftime(CAST(o_orderdate AS DATE),
             |      '%Y-%m') AS m, o_custkey,
             |    sum(CAST(CAST(round(o_totalprice*100) AS BIGINT)
             |      AS HUGEINT)) AS spend
             |  FROM orders GROUP BY 1, 2),
             |f AS (SELECT o_custkey, min(m) AS m0 FROM mc GROUP BY 1)
             |SELECT m AS month,
             |  CAST(count(*) AS BIGINT) AS active_customers,
             |  CAST(count(*) FILTER (WHERE m = m0) AS BIGINT)
             |    AS new_customers,
             |  round(CAST(sum(CASE WHEN m = m0 THEN spend ELSE 0 END)
             |    AS DOUBLE)/100.0, 2) AS new_revenue,
             |  round(CAST(sum(CASE WHEN m <> m0 THEN spend ELSE 0 END)
             |    AS DOUBLE)/100.0, 2) AS returning_revenue
             |FROM mc JOIN f USING (o_custkey)
             |GROUP BY 1 ORDER BY month""".stripMargin)),

    // ── q291: NATION trade balance — per nation: EXPORT revenue (its
    // suppliers' shipped lines) vs IMPORT spend (its customers'
    // bought lines), the net, and an exact net-exporter flag (decimal
    // compare, no float): the per-nation BALANCE readout over the
    // same flows q196 reports pairwise — a trade ledger collapses the
    // matrix to its row/column sums. Revenue cents display at 4
    // decimals (micro-sums terminate there — the q283 lesson).
    //
    // Scale shape: two independent fact collapses (suppkey grain;
    // orderkey→custkey grain), each one exchange with dims broadcast;
    // the full-outer stitch runs on |nations| rows.
    QueryDef(
      "q291_trade_balance",
      (s, d) => {
        val nat = t(s, d, "nation")
          .select(col("n_nationkey"), col("n_name"))
        val exp0 = t(s, d, "lineitem")
          .select(col("l_suppkey"), revMicro.as("rm"))
          .join(t(s, d, "supplier")
            .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("nk"))
          .agg(sum(col("rm").cast("decimal(38,0)")).as("exports"))
        val imp0 = t(s, d, "lineitem")
          .select(col("l_orderkey"), revMicro.as("rm"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nk"))
          .agg(sum(col("rm").cast("decimal(38,0)")).as("imports"))
        val z = lit(0L).cast("decimal(38,0)")
        nat.join(exp0, col("n_nationkey") === exp0("nk"), "left")
          .join(imp0, col("n_nationkey") === imp0("nk"), "left")
          .select(col("n_name").as("nation"),
            coalesce(col("exports"), z).as("e"),
            coalesce(col("imports"), z).as("i"))
          .select(col("nation"),
            round(col("e").cast("double") / 10000.0, 4).as("exports"),
            round(col("i").cast("double") / 10000.0, 4).as("imports"),
            round((col("e") - col("i")).cast("double") / 10000.0, 4)
              .as("net"),
            when(col("e") > col("i"), 1).otherwise(0).cast("int")
              .as("net_exporter"))
          .orderBy(col("nation"))
      },
      Some(s"""WITH e AS (SELECT s_nationkey AS nk,
             |    sum(CAST($revMicroSql AS HUGEINT)) AS exports
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1),
             |i AS (SELECT c_nationkey AS nk,
             |    sum(CAST($revMicroSql AS HUGEINT)) AS imports
             |  FROM lineitem
             |  JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1),
             |j AS (SELECT n_name AS nation,
             |    coalesce(exports, 0) AS ex, coalesce(imports, 0) AS im
             |  FROM nation
             |  LEFT JOIN e ON n_nationkey = e.nk
             |  LEFT JOIN i ON n_nationkey = i.nk)
             |SELECT nation,
             |  round(CAST(ex AS DOUBLE)/10000.0, 4) AS exports,
             |  round(CAST(im AS DOUBLE)/10000.0, 4) AS imports,
             |  round(CAST(ex - im AS DOUBLE)/10000.0, 4) AS net,
             |  CAST(CASE WHEN ex > im THEN 1 ELSE 0 END AS INTEGER)
             |    AS net_exporter
             |FROM j ORDER BY nation""".stripMargin)),

    // ── q292: SIZE-PRICE curve — per part size: catalogue count, the
    // mean retail price (exact integer ratio), and shipped revenue:
    // does the price book scale with the size attribute and does
    // demand follow — the catalogue-axis companion to q288's
    // quantity curve (posted attribute vs purchased amount).
    //
    // Scale shape: the dim aggregates alone on |sizes|; revenue
    // collapses to the part grain in one exchange then joins the
    // ≤|parts| dim frame; rollup |sizes| rows.
    QueryDef(
      "q292_size_price_curve",
      (s, d) => {
        val rev = t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(revMicro.cast("decimal(38,0)")).as("rm"))
        val z = lit(0L).cast("decimal(38,0)")
        t(s, d, "part")
          .select(col("p_partkey"), col("p_size"),
            fxUnits(col("p_retailprice"), 100).as("cents"))
          .join(rev, col("p_partkey") === col("l_partkey"), "left")
          .groupBy(col("p_size"))
          .agg(count(lit(1)).cast("long").as("n_parts"),
            round(sum(col("cents").cast("decimal(38,0)")).cast("double")
              / count(lit(1)).cast("double"), 6).as("mean_retail_cents"),
            round(sum(coalesce(col("rm"), z)).cast("double") / 10000.0, 4)
              .as("revenue"))
          .select(col("p_size").cast("long").as("size"), col("n_parts"),
            col("mean_retail_cents"), col("revenue"))
          .orderBy(col("size"))
      },
      Some(s"""WITH rev AS (SELECT l_partkey,
             |    sum(CAST($revMicroSql AS HUGEINT)) AS rm
             |  FROM lineitem GROUP BY 1)
             |SELECT CAST(p_size AS BIGINT) AS size,
             |  CAST(count(*) AS BIGINT) AS n_parts,
             |  round(CAST(sum(CAST(CAST(round(p_retailprice*100)
             |    AS BIGINT) AS HUGEINT)) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS mean_retail_cents,
             |  round(CAST(sum(coalesce(rm, 0)) AS DOUBLE)/10000.0, 4)
             |    AS revenue
             |FROM part LEFT JOIN rev ON p_partkey = l_partkey
             |GROUP BY 1 ORDER BY size""".stripMargin)),

    // ── q293: PUNCTUATION profile — per source: comma, period, and
    // quote rates per token (each an exact count ratio): prose
    // punctuates, lists and logs don't, templated text punctuates
    // IDENTICALLY — the third character-class screen alongside q244
    // (digits), q247 (scripts), q271 (casing). Counts are
    // length-difference arithmetic (no regex), identical in both
    // dialects.
    //
    // Scale shape: pure map-side character counting; one |sources|
    // exchange.
    QueryDef(
      "q293_punctuation_profile",
      (s, d) => {
        def cnt(ch: String) =
          (length(col("text")) -
            length(regexp_replace(col("text"),
              java.util.regex.Pattern.quote(ch), "")))
            .cast("long")
        val m = t(s, d, "documents")
          .select(col("source"),
            size(filter(split(col("text"), " "),
              tk => length(tk) > 0)).cast("long").as("toks"),
            cnt(",").as("commas"), cnt(".").as("periods"),
            cnt("\"").as("quotes"))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("toks")).cast("long").as("n_tokens"),
            sum(col("commas")).cast("long").as("nc"),
            sum(col("periods")).cast("long").as("np"),
            sum(col("quotes")).cast("long").as("nq"))
        m.select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("nc").cast("double") /
            col("n_tokens").cast("double"), 6).as("commas_per_token"),
          round(col("np").cast("double") /
            col("n_tokens").cast("double"), 6).as("periods_per_token"),
          round(col("nq").cast("double") /
            col("n_tokens").cast("double"), 6).as("quotes_per_token"))
          .orderBy(col("source"))
      },
      Some("""WITH m AS (SELECT source,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      x -> len(x) > 0)) AS BIGINT) AS toks,
             |    CAST(len(text) - len(replace(text, ',', ''))
             |      AS BIGINT) AS commas,
             |    CAST(len(text) - len(replace(text, '.', ''))
             |      AS BIGINT) AS periods,
             |    CAST(len(text) - len(replace(text, '"', ''))
             |      AS BIGINT) AS quotes
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(toks) AS BIGINT) AS n_tokens,
             |  round(CAST(sum(commas) AS DOUBLE)
             |    / CAST(sum(toks) AS DOUBLE), 6) AS commas_per_token,
             |  round(CAST(sum(periods) AS DOUBLE)
             |    / CAST(sum(toks) AS DOUBLE), 6) AS periods_per_token,
             |  round(CAST(sum(quotes) AS DOUBLE)
             |    / CAST(sum(toks) AS DOUBLE), 6) AS quotes_per_token
             |FROM m GROUP BY 1 ORDER BY source""".stripMargin)),

    // ── q294: order-value QUARTILES by priority — per priority:
    // orders and the exact p25/p50/p75 of the order value in CENTS:
    // the distribution-shape readout behind q286's means (a flat mean
    // can hide a fattening tail). Quartiles of integer cents land on
    // quarter-cent fractions — they TERMINATE at 2 decimals, so the
    // cent display at round(·, 2) is tie-free by construction (the
    // q243/q246 discipline).
    //
    // Scale shape: one custkey-free scan collapses to the priority
    // grain; the percentile buffers are bounded by orders-per-
    // priority; output |priorities| rows.
    QueryDef(
      "q294_value_quartiles",
      (s, d) => {
        t(s, d, "orders")
          .select(col("o_orderpriority"),
            fxUnits(col("o_totalprice"), 100).as("cents"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            round(expr("percentile(cents, 0.25)"), 2).as("p25_cents"),
            round(expr("percentile(cents, 0.5)"), 2).as("p50_cents"),
            round(expr("percentile(cents, 0.75)"), 2).as("p75_cents"))
          .select(col("o_orderpriority").as("priority"), col("n_orders"),
            col("p25_cents"), col("p50_cents"), col("p75_cents"))
          .orderBy(col("priority"))
      },
      Some("""WITH o AS (SELECT o_orderpriority,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
             |  FROM orders)
             |SELECT o_orderpriority AS priority,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  round(quantile_cont(cents, 0.25), 2) AS p25_cents,
             |  round(quantile_cont(cents, 0.5), 2) AS p50_cents,
             |  round(quantile_cont(cents, 0.75), 2) AS p75_cents
             |FROM o GROUP BY 1 ORDER BY priority""".stripMargin)),

    // ── q296: BRAND-TYPE affinity — per brand: its modal part type
    // (tie → lexicographic min), that type's share of the brand's
    // catalogue, and the LIFT over the type's global share — computed
    // as ONE exact integer cross ratio bt·n/(b·t), no chained float
    // division: "is this brand a specialist or a generalist" — the
    // catalogue-positioning readout next to q240's assortment overlap
    // (which compares brands pairwise; this scores each against the
    // market).
    //
    // Scale shape: dim-only — the (brand, type) grid is bounded
    // (≤|brands|×|types|); the modal pick is a per-brand window over
    // ≤|types| rows; the global type frame broadcasts.
    QueryDef(
      "q296_brand_type_affinity",
      (s, d) => {
        val bt = t(s, d, "part")
          .groupBy(col("p_brand"), col("p_type"))
          .agg(count(lit(1)).cast("long").as("bt"))
        val b = bt.groupBy(col("p_brand"))
          .agg(sum(col("bt")).cast("long").as("bn"))
        val ty = t(s, d, "part")
          .groupBy(col("p_type"))
          .agg(count(lit(1)).cast("long").as("tn"))
        val n = t(s, d, "part").count()
        val w = Window.partitionBy(col("p_brand"))
          .orderBy(col("bt").desc, col("p_type"))
        bt.withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .join(b, Seq("p_brand"))
          .join(broadcast(ty), Seq("p_type"))
          .select(col("p_brand").as("brand"),
            col("p_type").as("top_type"),
            col("bt").as("n_parts"),
            round(col("bt").cast("double") /
              col("bn").cast("double"), 6).as("brand_share"),
            round((col("bt") * lit(n)).cast("double") /
              (col("bn") * col("tn")).cast("double"), 6).as("lift"))
          .orderBy(col("brand"))
      },
      Some("""WITH bt AS (SELECT p_brand, p_type,
             |    CAST(count(*) AS BIGINT) AS bt
             |  FROM part GROUP BY 1, 2),
             |b AS (SELECT p_brand, CAST(sum(bt) AS BIGINT) AS bn
             |  FROM bt GROUP BY 1),
             |ty AS (SELECT p_type, CAST(count(*) AS BIGINT) AS tn
             |  FROM part GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM part),
             |r AS (SELECT p_brand, p_type, bt,
             |    row_number() OVER (PARTITION BY p_brand
             |      ORDER BY bt DESC, p_type) AS rk
             |  FROM bt)
             |SELECT p_brand AS brand, p_type AS top_type,
             |  bt AS n_parts,
             |  round(CAST(bt AS DOUBLE)/CAST(bn AS DOUBLE), 6)
             |    AS brand_share,
             |  round(CAST(bt*n AS DOUBLE)/CAST(bn*tn AS DOUBLE), 6)
             |    AS lift
             |FROM r JOIN b USING (p_brand) JOIN ty USING (p_type), n
             |WHERE rk = 1 ORDER BY brand""".stripMargin)),

    // ── q297: RETURNS×DISCOUNT interaction — per discount pct:
    // lines, returned lines (returnflag = 'R'), the return share, and
    // the returned revenue: "are discounted items returned more" —
    // the quality-of-sale face of the discount axis (q275 reads
    // margin given away; this reads revenue given BACK), and the
    // interaction q257's brand-grain returns cannot resolve.
    //
    // Scale shape: pure map-side classification onto the ≤11-value
    // discount domain; one bounded exchange.
    QueryDef(
      "q297_returns_discount",
      (s, d) => {
        t(s, d, "lineitem")
          .select(fxUnits(col("l_discount"), 100).as("pc"),
            (col("l_returnflag") === "R").as("ret"),
            revMicro.as("rm"))
          .groupBy(col("pc"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            count(when(col("ret"), 1)).cast("long").as("returned_lines"),
            round(count(when(col("ret"), 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("return_share"),
            round(sum(when(col("ret"), col("rm").cast("decimal(38,0)"))
              .otherwise(lit(0L).cast("decimal(38,0)"))).cast("double")
              / 10000.0, 4).as("returned_revenue"))
          .select(col("pc").as("discount_pct"), col("n_lines"),
            col("returned_lines"), col("return_share"),
            col("returned_revenue"))
          .orderBy(col("discount_pct"))
      },
      Some(s"""SELECT CAST(round(l_discount*100) AS BIGINT)
             |    AS discount_pct,
             |  CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(count(*) FILTER (WHERE l_returnflag = 'R')
             |    AS BIGINT) AS returned_lines,
             |  round(CAST(count(*) FILTER (WHERE l_returnflag = 'R')
             |    AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |    AS return_share,
             |  round(CAST(sum(CASE WHEN l_returnflag = 'R'
             |    THEN CAST($revMicroSql AS HUGEINT) ELSE 0 END)
             |    AS DOUBLE)/10000.0, 4) AS returned_revenue
             |FROM lineitem GROUP BY 1
             |ORDER BY discount_pct""".stripMargin)),

    // ── q299: NEGATIVE-BALANCE census — per customer nation:
    // customers, negative-balance customers (exact cents < 0, never a
    // float compare), their share, and the ORDER exposure sitting on
    // those books (orders + revenue): the receivables-risk screen
    // that q175's percent_rank profile and q258's deciles don't
    // collapse to a ledger row.
    //
    // Scale shape: the customer dim classifies map-side; order
    // exposure collapses to the customer grain in one custkey
    // exchange; rollup |nations| rows.
    QueryDef(
      "q299_negative_balance_census",
      (s, d) => {
        val cust = t(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            (fxUnits(col("c_acctbal"), 100) < 0L).as("neg"))
        val ords = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).cast("long").as("n_ord"),
            sum(fxUnits(col("o_totalprice"), 100)
              .cast("decimal(38,0)")).as("spend"))
        val z = lit(0L).cast("decimal(38,0)")
        cust.join(ords, col("c_custkey") === col("o_custkey"), "left")
          .join(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).cast("long").as("n_customers"),
            count(when(col("neg"), 1)).cast("long").as("neg_customers"),
            round(count(when(col("neg"), 1)).cast("double") /
              count(lit(1)).cast("double"), 6).as("neg_share"),
            sum(when(col("neg"), coalesce(col("n_ord"), lit(0L)))
              .otherwise(lit(0L))).cast("long").as("neg_orders"),
            round(sum(when(col("neg"), coalesce(col("spend"), z))
              .otherwise(z)).cast("double") / 100.0, 2)
              .as("neg_revenue"))
          .select(col("n_name").as("nation"), col("n_customers"),
            col("neg_customers"), col("neg_share"), col("neg_orders"),
            col("neg_revenue"))
          .orderBy(col("nation"))
      },
      Some("""WITH c AS (SELECT c_custkey, c_nationkey,
             |    CAST(round(c_acctbal*100) AS BIGINT) < 0 AS neg
             |  FROM customer),
             |o AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_ord,
             |    sum(CAST(CAST(round(o_totalprice*100) AS BIGINT)
             |      AS HUGEINT)) AS spend
             |  FROM orders GROUP BY 1)
             |SELECT n_name AS nation,
             |  CAST(count(*) AS BIGINT) AS n_customers,
             |  CAST(count(*) FILTER (WHERE neg) AS BIGINT)
             |    AS neg_customers,
             |  round(CAST(count(*) FILTER (WHERE neg) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE), 6) AS neg_share,
             |  CAST(sum(CASE WHEN neg THEN coalesce(n_ord, 0)
             |    ELSE 0 END) AS BIGINT) AS neg_orders,
             |  round(CAST(sum(CASE WHEN neg THEN coalesce(spend, 0)
             |    ELSE 0 END) AS DOUBLE)/100.0, 2) AS neg_revenue
             |FROM c LEFT JOIN o ON c_custkey = o_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY 1 ORDER BY nation""".stripMargin))
  )
}
