package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Round-7 analytics surface — classic warehouse shapes the earlier
  * files don't cover: the multi-table star rollup, statistical tests,
  * exact smoothing/inequality measures, attribution, and
  * tolerance-bounded temporal matching (SURVEY.md §2.4 q146+).
  *
  * Same disciplines as the rest of the suite (see [[Q]]): money and
  * measures accumulate as exact fixed-point integers (DECIMAL(38,0)
  * where products can cross 2⁶³ at corpus scale), doubles appear only
  * in final single-step derivations both engines evaluate in the same
  * IEEE operation order, and every query ends in a total order.
  */
object Analytics {
  import Q._

  val defs: Seq[QueryDef] = Seq(

    // ── q146: the star-schema rollup (TPC-H Q5 analog) — revenue by
    // nation for one region-year where the supplier is LOCAL to the
    // customer (s_nationkey = c_nationkey), the canonical 6-table
    // join every warehouse demo runs and the one multi-table star
    // this suite did not yet declare (q07 denormalizes 3 tables; q101
    // audits FK edges pairwise). Ref: the reference's join-bind stage
    // (`lisp/ebind.lsp:4`) generalized to the full dimensional star.
    //
    // Scale shape: region⋈nation (25 rows) broadcasts into customer;
    // the two fact-grain joins — orders⋈customer on custkey, then
    // lineitem⋈orders on orderkey — are the real exchanges, keyed on
    // their join columns with map-side-pruned inputs (orders carries
    // only the 1996 slice, ~15% of rows; customers only the ASIA
    // fifth). Supplier joins last on suppkey so the local-supplier
    // filter sees both nationkeys; at bench scale AQE broadcasts it.
    // Revenue is exact: cents × (100 − pct) summed as DECIMAL(38,0)
    // (a 100 TB year of 10¹² line items × ~10⁹ micro-units crosses
    // 2⁶³), one double division at the end.
    QueryDef(
      "q146_star_revenue",
      (s, d) => {
        val asiaNations = broadcast(
          t(s, d, "region").filter(col("r_name") === "ASIA")
            .join(t(s, d, "nation"),
              col("r_regionkey") === col("n_regionkey"))
            .select(col("n_nationkey"), col("n_name")))
        val cust = t(s, d, "customer")
          .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"))
        val sup = t(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val revMicro = Q.revMicro
        t(s, d, "lineitem")
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .filter(col("s_nationkey") === col("c_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(revMicro).as("rev_micro"))
          .select(col("n_name"), col("n_lines"),
            (col("rev_micro").cast("double") / 10000.0).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name, CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS HUGEINT) *
             |    (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
             |    / 10000.0 AS revenue
             |FROM lineitem
             |JOIN orders   ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation   ON c_nationkey = n_nationkey
             |JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND s_nationkey = c_nationkey
             |  AND o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate <  TIMESTAMP '1997-01-01'
             |GROUP BY n_name
             |ORDER BY revenue DESC, n_name""".stripMargin)),

    // ── q147: chi-square independence test — is event mix different
    // on weekends? The A/B-test statistic every experimentation
    // pipeline computes: observed (event_type × is_weekend) counts vs
    // the independence expectation from the margins, per-cell
    // contribution (o−e)²/e, and the running χ² in a DEFINED order
    // (cum over (event_type, is_weekend) ASC) so the statistic's
    // accumulation order is part of the contract — a free-order sum
    // of 10 doubles would be engine-dependent in the last bits; a
    // running sum over an ordered 10-row frame is bit-identical.
    //
    // Scale shape: one corpus scan → map-side-combined hash agg to
    // the |types|×2 cell grain; margins and the cumulative statistic
    // ride 10-row windows over that tiny frame (q140's rule: windows
    // AFTER aggregation, never on the base table). dof is
    // (|types|−1)·(2−1), derived from the frame itself.
    QueryDef(
      "q147_chi_square",
      (s, d) => {
        val cells = t(s, d, "events")
          .select(col("event_type"),
            (weekday(col("ts")) >= 5).cast("int").as("is_weekend"))
          .groupBy(col("event_type"), col("is_weekend"))
          .agg(count(lit(1)).cast("long").as("n"))
        val wRow = Window.partitionBy(col("event_type"))
        val wCol = Window.partitionBy(col("is_weekend"))
        val wAll = Window.partitionBy(lit(1))
        val wCum = Window.partitionBy(lit(1))
          .orderBy(col("event_type"), col("is_weekend"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val expected = col("row_tot").cast("double") *
          col("col_tot").cast("double") / col("grand").cast("double")
        cells
          .withColumn("row_tot", sum(col("n")).over(wRow))
          .withColumn("col_tot", sum(col("n")).over(wCol))
          .withColumn("grand", sum(col("n")).over(wAll))
          .withColumn("expected", expected)
          .withColumn("contrib",
            (col("n").cast("double") - col("expected")) *
              (col("n").cast("double") - col("expected")) / col("expected"))
          .withColumn("cum_chi2", sum(col("contrib")).over(wCum))
          .select(col("event_type"), col("is_weekend"), col("n"),
            round(col("expected"), 6).as("expected"),
            round(col("contrib"), 6).as("contrib"),
            round(col("cum_chi2"), 6).as("cum_chi2"))
          .orderBy(col("event_type"), col("is_weekend"))
      },
      Some("""WITH c AS (SELECT event_type,
             |    CASE WHEN isodow(ts) >= 6 THEN 1 ELSE 0 END AS is_weekend,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |m AS (SELECT event_type, is_weekend, n,
             |    sum(n) OVER (PARTITION BY event_type) AS row_tot,
             |    sum(n) OVER (PARTITION BY is_weekend) AS col_tot,
             |    sum(n) OVER () AS grand
             |  FROM c),
             |x AS (SELECT event_type, is_weekend, n,
             |    CAST(row_tot AS DOUBLE)*CAST(col_tot AS DOUBLE)
             |      /CAST(grand AS DOUBLE) AS expected
             |  FROM m),
             |k AS (SELECT event_type, is_weekend, n, expected,
             |    (CAST(n AS DOUBLE)-expected)*(CAST(n AS DOUBLE)-expected)
             |      /expected AS contrib
             |  FROM x)
             |SELECT event_type, is_weekend, n,
             |  round(expected, 6) AS expected,
             |  round(contrib, 6) AS contrib,
             |  round(sum(contrib) OVER (ORDER BY event_type, is_weekend
             |    ROWS UNBOUNDED PRECEDING), 6) AS cum_chi2
             |FROM k ORDER BY event_type, is_weekend""".stripMargin)),

    // ── q148: EWMA smoothing + spike flag over the daily revenue
    // series — exponential smoothing with a DYADIC decay (α = ½,
    // truncated at 8 terms): weights are powers of two, so the
    // weighted numerator Σ xⱼ·2^(7−j) and the weight mass Σ 2^(7−j)
    // are EXACT integers — the classic recursive EWMA accumulates
    // float error and is order-sequential (unverifiable cross-engine);
    // the dyadic-truncated form is a pure per-row function of 8
    // lagged exact values, bit-identical anywhere. Truncation bias is
    // 2⁻⁸ of the mass — below the round-6 output precision. The spike
    // flag compares x against 1.25 × the PRIOR-day EWMA entirely in
    // integer cross-multiples (4·x·num⁻-den-scaled — no double enters
    // the decision), so the flag can never flip on a rounding edge.
    //
    // Scale shape: the corpus collapses map-side to the |days| grain
    // (2.4k rows at any SF); the lag window runs over that
    // dimension-bounded frame (q144's rule). Nothing unbounded sorts.
    QueryDef(
      "q148_ewma_anomaly",
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"))
          .agg(sum(Q.fxUnits(col("o_totalprice"), 100)).cast("long")
            .as("rev_u"))
        val w = Window.partitionBy(lit(1)).orderBy(col("day"))
        // weight 2^(7-j) for lag j; absent leading-edge lags drop out
        // of BOTH sums (coalesce to 0 mass), so early days smooth over
        // the observed prefix instead of inventing zeros.
        val terms = (0 to 7).map { j =>
          val x = if (j == 0) col("rev_u") else lag(col("rev_u"), j).over(w)
          val wt = 1L << (7 - j)
          (when(x.isNotNull, x * wt).otherwise(lit(0L)),
            when(x.isNotNull, lit(wt)).otherwise(lit(0L)))
        }
        val num = terms.map(_._1).reduce(_ + _)
        val den = terms.map(_._2).reduce(_ + _)
        // prior-day smoothed state for the spike decision (num/den of
        // the previous row — exact integers, so the 1.25× threshold is
        // the integer comparison 4·x·den⁻ > 5·num⁻)
        daily
          .withColumn("num", num)
          .withColumn("den", den)
          .withColumn("pnum", lag(col("num"), 1).over(w))
          .withColumn("pden", lag(col("den"), 1).over(w))
          .select(col("day"), (col("rev_u") / 100.0).as("revenue"),
            round(col("num").cast("double") /
              col("den").cast("double") / 100.0, 6).as("ewma"),
            when(col("pnum").isNotNull,
              (col("rev_u").cast("decimal(38,0)") * col("pden") * 4 >
                col("pnum").cast("decimal(38,0)") * 5).cast("int"))
              .as("is_spike"))
          .orderBy(col("day"))
      },
      Some("""WITH daily AS (SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |      AS rev_u
             |  FROM orders GROUP BY 1),
             |lg AS (SELECT day, rev_u,
             |    lag(rev_u, 1) OVER w AS x1, lag(rev_u, 2) OVER w AS x2,
             |    lag(rev_u, 3) OVER w AS x3, lag(rev_u, 4) OVER w AS x4,
             |    lag(rev_u, 5) OVER w AS x5, lag(rev_u, 6) OVER w AS x6,
             |    lag(rev_u, 7) OVER w AS x7
             |  FROM daily WINDOW w AS (ORDER BY day)),
             |m AS (SELECT day, rev_u,
             |    rev_u*128 + coalesce(x1*64, 0) + coalesce(x2*32, 0)
             |      + coalesce(x3*16, 0) + coalesce(x4*8, 0)
             |      + coalesce(x5*4, 0) + coalesce(x6*2, 0)
             |      + coalesce(x7, 0) AS num,
             |    128 + CASE WHEN x1 IS NULL THEN 0 ELSE 64 END
             |      + CASE WHEN x2 IS NULL THEN 0 ELSE 32 END
             |      + CASE WHEN x3 IS NULL THEN 0 ELSE 16 END
             |      + CASE WHEN x4 IS NULL THEN 0 ELSE 8 END
             |      + CASE WHEN x5 IS NULL THEN 0 ELSE 4 END
             |      + CASE WHEN x6 IS NULL THEN 0 ELSE 2 END
             |      + CASE WHEN x7 IS NULL THEN 0 ELSE 1 END AS den
             |  FROM lg),
             |p AS (SELECT day, rev_u, num, den,
             |    lag(num, 1) OVER (ORDER BY day) AS pnum,
             |    lag(den, 1) OVER (ORDER BY day) AS pden
             |  FROM m)
             |SELECT day, rev_u/100.0 AS revenue,
             |  round(CAST(num AS DOUBLE)/CAST(den AS DOUBLE)/100.0, 6)
             |    AS ewma,
             |  CASE WHEN pnum IS NULL THEN NULL
             |    WHEN CAST(rev_u AS HUGEINT)*pden*4 >
             |      CAST(pnum AS HUGEINT)*5 THEN 1 ELSE 0 END AS is_spike
             |FROM p ORDER BY day""".stripMargin)),

    // ── q149: quality-classifier CALIBRATION — the report that tells
    // a training-data team whether the quality score is actually
    // predictive: documents ranked into exact deciles by the q31
    // score, each decile's exact-duplicate rate alongside its mean
    // score. A well-calibrated filter shows dup rate falling as the
    // score rises; a flat curve means the score gates nothing.
    // Composes two existing bases (the cached q31 score, q22's
    // text-equality dup definition) — cross-family composition, not a
    // new primitive.
    //
    // Scale shape: the decile is q50's two-pass exact ranking (range
    // repartition on (score, doc_id) + zipWithIndex — never an
    // unpartitioned ntile window); the dup flag is one hash agg on
    // text digest + a key-grain join; per-decile means come from
    // exact micro-unit score sums, so group order cannot perturb
    // them. Zero-token docs carry a NULL score and are excluded
    // explicitly (they would sort arbitrarily against real scores).
    QueryDef(
      "q149_decile_calibration",
      (s, d) => {
        val scored = TextQueries.qualityScores(s, d)
          .filter(col("score").isNotNull)
          .select(col("doc_id"), col("score"))
        val dupDocs = t(s, d, "documents")
          .select(col("doc_id"),
            xxhash64(col("text")).as("h"))
        val dupFams = dupDocs.groupBy(col("h"))
          .agg(count(lit(1)).cast("long").as("fam_n"))
        val flagged = dupDocs
          .join(dupFams, Seq("h"))
          .select(col("doc_id"), (col("fam_n") > 1).cast("long").as("is_dup"))
        val base = scored.join(flagged, Seq("doc_id"))
        val n = base.count()
        val withRn = Q.globalRankByRange(base,
          Seq(col("score"), col("doc_id")))
        val decile = Q.exactDecile(col("rn"), n)
        withRn
          .withColumn("decile", decile)
          .groupBy(col("decile"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("is_dup")).cast("long").as("n_dup"),
            sum(round(col("score") * 1000000).cast("long")).cast("long")
              .as("score_micro"))
          .select(col("decile"), col("n_docs"), col("n_dup"),
            round(col("n_dup").cast("double") /
              col("n_docs").cast("double"), 6).as("dup_rate"),
            round(col("score_micro").cast("double") /
              col("n_docs").cast("double") / 1000000.0, 6).as("mean_score"))
          .orderBy(col("decile"))
      },
      Some(s"""WITH ${TextQueries.QualityCteSql},
             |f AS (SELECT d.doc_id, q.score,
             |    CASE WHEN count(*) OVER (PARTITION BY d.text) > 1
             |      THEN 1 ELSE 0 END AS is_dup
             |  FROM documents d JOIN q ON d.doc_id = q.doc_id
             |  WHERE q.score IS NOT NULL),
             |r AS (SELECT doc_id, score, is_dup,
             |    ntile(10) OVER (ORDER BY score, doc_id) AS decile
             |  FROM f)
             |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(is_dup) AS BIGINT) AS n_dup,
             |  round(CAST(sum(is_dup) AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |    AS dup_rate,
             |  round(CAST(sum(CAST(round(score*1000000) AS BIGINT))
             |      AS DOUBLE)/CAST(count(*) AS DOUBLE)/1000000.0, 6)
             |    AS mean_score
             |FROM r GROUP BY 1 ORDER BY decile""".stripMargin)),

    // ── q150: Zipf law fit — the corpus-health diagnostic behind
    // every tokenizer decision: rank the top-64 terms by total
    // frequency and fit ln(freq) ~ ln(rank) by OLS; a natural-language
    // corpus slopes ≈ −1, and a slope collapsing toward 0 or −2 flags
    // boilerplate flooding or vocabulary collapse BEFORE training
    // does. Composition: q91's heavy-term notion + q103's exact-moment
    // OLS, over the log-log transform.
    //
    // Float discipline: ln values quantize to exact micro-units
    // (round(ln·10⁶) — q77's cost_micro rule), moments accumulate as
    // DECIMAL(38,0), and the slope/intercept/r² are single-step double
    // derivations at the end — group order can never perturb them.
    // Scale shape: term frequencies are one explode → map-side-
    // combined hash agg; top-64 is TakeOrdered (never a global sort);
    // the regression runs on a 64-row frame.
    QueryDef(
      "q150_zipf_fit",
      (s, d) => {
        val tf = t(s, d, "documents")
          .select(explode(filter(split(col("text"), " "),
            tk => length(tk) > 0)).as("term"))
          .groupBy(col("term"))
          .agg(count(lit(1)).cast("long").as("tf"))
          .orderBy(col("tf").desc, col("term"))
          .limit(64)
        val w = Window.partitionBy(lit(1))
          .orderBy(col("tf").desc, col("term"))
        val ranked = tf
          .withColumn("rank", row_number().over(w).cast("long"))
          .select(
            round(log(col("rank").cast("double")) * 1000000)
              .cast("long").as("x"),
            round(log(col("tf").cast("double")) * 1000000)
              .cast("long").as("y"))
        val dec38 = "decimal(38,0)"
        val xd = col("x").cast("decimal(19,0)")
        val yd = col("y").cast("decimal(19,0)")
        val m = ranked.agg(
          count(lit(1)).cast("long").as("n_terms"),
          sum(xd.cast(dec38)).as("sx"),
          sum(yd.cast(dec38)).as("sy"),
          sum((xd * yd).cast(dec38)).as("sxy"),
          sum((xd * xd).cast(dec38)).as("sxx"),
          sum((yd * yd).cast(dec38)).as("syy"))
        val nD = col("n_terms").cast("double")
        val sxD = col("sx").cast("double")
        val syD = col("sy").cast("double")
        val num = nD * col("sxy").cast("double") - sxD * syD
        val den = nD * col("sxx").cast("double") - sxD * sxD
        val deny = nD * col("syy").cast("double") - syD * syD
        m.select(col("n_terms"),
            round(num / den, 6).as("slope"),
            round(((syD - (num / den) * sxD) / nD) / 1000000.0, 6)
              .as("intercept"),
            round(num * num / (den * deny), 6).as("r2"))
      },
      Some("""WITH tok AS (SELECT unnest(list_filter(string_split(text, ' '),
             |    x -> len(x) > 0)) AS term FROM documents),
             |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS tf
             |  FROM tok GROUP BY 1 ORDER BY tf DESC, term LIMIT 64),
             |r AS (SELECT CAST(round(ln(row_number() OVER
             |      (ORDER BY tf DESC, term))*1000000) AS BIGINT) AS x,
             |    CAST(round(ln(tf)*1000000) AS BIGINT) AS y
             |  FROM tf),
             |m AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
             |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x AS HUGEINT)*y) AS sxy,
             |    sum(CAST(x AS HUGEINT)*x) AS sxx,
             |    sum(CAST(y AS HUGEINT)*y) AS syy
             |  FROM r),
             |dm AS (SELECT n_terms,
             |    CAST(n_terms AS DOUBLE)*CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS num,
             |    CAST(n_terms AS DOUBLE)*CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS den,
             |    CAST(n_terms AS DOUBLE)*CAST(syy AS DOUBLE)
             |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS deny,
             |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
             |  FROM m)
             |SELECT n_terms, round(num/den, 6) AS slope,
             |  round(((syd - (num/den)*sxd)/CAST(n_terms AS DOUBLE))
             |    /1000000.0, 6) AS intercept,
             |  round(num*num/(den*deny), 6) AS r2
             |FROM dm""".stripMargin)),

    // ── q151: tolerance-bounded BIDIRECTIONAL as-of match — each
    // purchase matched to the user's nearest click on EITHER side,
    // but only within a 10-minute tolerance (q37 matches the latest
    // prior click at ANY distance; real attribution windows expire).
    // Nulls are honest: a purchase with no click within tolerance on
    // a side reports NULL for that side, and `matched_us` picks the
    // nearer surviving side (prev wins exact-tie).
    //
    // Scale shape: q37's union+window form both ways — one exchange
    // keyed on user_id carries two key-partitioned sort passes (prefix
    // max for the prior click, suffix min for the next; the orderings
    // differ only in the is_p tiebreak so equal-timestamp clicks stay
    // inclusive on BOTH sides). Never an inequality join.
    QueryDef(
      "q151_asof_tolerance",
      (s, d) => {
        val tolUs = 600L * 1000000L
        val e = t(s, d, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            (col("event_type") === "purchase").cast("int").as("is_p"))
        // prev pass: clicks sort BEFORE purchases at equal ts so the
        // inclusive prefix max sees a same-instant click
        val wPrev = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("is_p"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        // next pass: purchases sort BEFORE clicks at equal ts so the
        // inclusive suffix min sees a same-instant click
        val wNext = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("is_p").desc, col("event_id"))
          .rowsBetween(0, Window.unboundedFollowing)
        e.withColumn("prev_any",
            max(when(col("is_p") === 0, col("ts_us"))).over(wPrev))
          .withColumn("next_any",
            min(when(col("is_p") === 0, col("ts_us"))).over(wNext))
          .filter(col("is_p") === 1)
          .withColumn("prev_click_us",
            when(col("ts_us") - col("prev_any") <= tolUs, col("prev_any")))
          .withColumn("next_click_us",
            when(col("next_any") - col("ts_us") <= tolUs, col("next_any")))
          .withColumn("matched_us",
            when(col("prev_click_us").isNotNull &&
              (col("next_click_us").isNull ||
                col("ts_us") - col("prev_click_us") <=
                  col("next_click_us") - col("ts_us")),
              col("prev_click_us"))
              .otherwise(col("next_click_us")))
          .select(col("event_id"), col("user_id"),
            col("ts_us").as("purchase_ts_us"),
            col("prev_click_us"), col("next_click_us"), col("matched_us"),
            when(col("matched_us").isNotNull,
              abs(col("ts_us") - col("matched_us")).cast("double") /
                1000000.0).as("gap_s"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
             |  FROM events WHERE event_type IN ('click', 'purchase')),
             |m AS (SELECT event_id, user_id, ts_us, is_p,
             |    max(CASE WHEN is_p = 0 THEN ts_us END) OVER wp AS prev_any,
             |    min(CASE WHEN is_p = 0 THEN ts_us END) OVER wn AS next_any
             |  FROM e
             |  WINDOW wp AS (PARTITION BY user_id
             |      ORDER BY ts_us, is_p, event_id
             |      ROWS UNBOUNDED PRECEDING),
             |    wn AS (PARTITION BY user_id
             |      ORDER BY ts_us, is_p DESC, event_id
             |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
             |b AS (SELECT event_id, user_id, ts_us,
             |    CASE WHEN ts_us - prev_any <= 600000000
             |      THEN prev_any END AS prev_click_us,
             |    CASE WHEN next_any - ts_us <= 600000000
             |      THEN next_any END AS next_click_us
             |  FROM m WHERE is_p = 1),
             |c AS (SELECT event_id, user_id, ts_us, prev_click_us,
             |    next_click_us,
             |    CASE WHEN prev_click_us IS NOT NULL AND
             |        (next_click_us IS NULL OR
             |         ts_us - prev_click_us <= next_click_us - ts_us)
             |      THEN prev_click_us ELSE next_click_us END AS matched_us
             |  FROM b)
             |SELECT event_id, user_id, ts_us AS purchase_ts_us,
             |  prev_click_us, next_click_us, matched_us,
             |  CASE WHEN matched_us IS NOT NULL THEN
             |    CAST(abs(ts_us - matched_us) AS DOUBLE)/1000000.0
             |  END AS gap_s
             |FROM c ORDER BY event_id""".stripMargin)),

    // ── q152: FIRST-TOUCH attribution — users grouped by the type of
    // their first-ever event, with each cohort's eventual purchase
    // conversion. The acquisition report every funnel owner reads
    // next to q63's ordered funnel and q126's time-to-convert: which
    // entry behavior converts. (A user whose first event IS a
    // purchase lands in the 'purchase' cohort and converts trivially
    // — kept, because dropping it would silently shrink the
    // denominator.)
    //
    // Scale shape: one exchange keyed on user_id carries both the
    // first-event window (row_number over the key-partitioned order)
    // and the per-user conversion max; the cohort rollup is a
    // |types|-row hash agg. No self-join of the corpus on user_id.
    QueryDef(
      "q152_first_touch",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val perUser = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
          .withColumn("rn", row_number().over(w))
          .withColumn("cvt",
            max((col("event_type") === "purchase").cast("long"))
              .over(Window.partitionBy(col("user_id"))))
          .filter(col("rn") === 1)
        perUser
          .groupBy(col("event_type").as("first_type"))
          .agg(count(lit(1)).cast("long").as("n_users"),
            sum(col("cvt")).cast("long").as("n_converted"))
          .withColumn("conv_rate",
            round(col("n_converted").cast("double") /
              col("n_users").cast("double"), 6))
          .orderBy(col("first_type"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |    epoch_us(ts) AS ts_us FROM events),
             |u AS (SELECT user_id, event_type,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id) AS rn,
             |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             |      OVER (PARTITION BY user_id) AS cvt
             |  FROM e)
             |SELECT event_type AS first_type,
             |  CAST(count(*) AS BIGINT) AS n_users,
             |  CAST(sum(cvt) AS BIGINT) AS n_converted,
             |  round(CAST(sum(cvt) AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |    AS conv_rate
             |FROM u WHERE rn = 1
             |GROUP BY 1 ORDER BY first_type""".stripMargin)),

    // ── q153: Gini inequality of customer revenue per market segment
    // — the single-number concentration measure next to q127's
    // curve: how unequally each segment's revenue distributes over
    // its customers (0 = uniform, →1 = one whale). Customers with no
    // orders count at zero revenue — excluding them would understate
    // inequality exactly where it matters.
    //
    // Exactness: with x ascending and i the within-segment rank,
    // G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx); both Σ terms accumulate as
    // DECIMAL(38,0) (i·x crosses 2⁶³ at ~10¹⁰ customers × dollar
    // volumes), and the final expression is a fixed-order double
    // derivation.
    //
    // Scale shape: never a per-segment ranking window (5 segments
    // would serialize the corpus through 5 tasks). q90's two-pass
    // trick instead: range-repartition on (segment, rev, key) keeps
    // segments contiguous, zipWithIndex assigns the GLOBAL order
    // index, and the within-segment rank is rn − min(rn|segment) + 1
    // via a 5-row broadcast join. Parallelism stays at the partition
    // count, not the segment count.
    QueryDef(
      "q153_gini_by_segment",
      (s, d) => {
        val rev = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(Q.fxUnits(col("o_totalprice"), 100)).cast("long")
            .as("rev_u"))
        val base = t(s, d, "customer")
          .join(rev, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_mktsegment").as("segment"),
            coalesce(col("rev_u"), lit(0L)).as("rev_u"))
        val withRn = Q.globalRankByRange(base,
          Seq(col("segment"), col("rev_u"), col("c_custkey")))
        val offsets = withRn.groupBy(col("segment"))
          .agg(min(col("rn")).as("rn0"))
        val dec38 = "decimal(38,0)"
        val g = withRn
          .join(broadcast(offsets), Seq("segment"))
          .withColumn("i", col("rn") - col("rn0") + 1)
          .groupBy(col("segment"))
          .agg(count(lit(1)).cast("long").as("n_cust"),
            sum(col("rev_u").cast(dec38)).as("sx"),
            sum((col("i").cast("decimal(19,0)") *
              col("rev_u").cast("decimal(19,0)")).cast(dec38)).as("six"))
        val nD = col("n_cust").cast("double")
        val sxD = col("sx").cast("double")
        g.select(col("segment"), col("n_cust"),
            (sxD / 100.0).as("total_revenue"),
            when(col("sx") > 0,
              round((lit(2.0) * col("six").cast("double") -
                (nD + lit(1.0)) * sxD) / (nD * sxD), 6)).as("gini"))
          .orderBy(col("segment"))
      },
      Some("""WITH rev AS (SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |      AS rev_u
             |  FROM orders GROUP BY 1),
             |b AS (SELECT c_custkey, c_mktsegment AS segment,
             |    coalesce(rev_u, 0) AS rev_u
             |  FROM customer LEFT JOIN rev ON c_custkey = o_custkey),
             |r AS (SELECT segment, rev_u,
             |    row_number() OVER (PARTITION BY segment
             |      ORDER BY rev_u, c_custkey) AS i
             |  FROM b),
             |g AS (SELECT segment, CAST(count(*) AS BIGINT) AS n_cust,
             |    sum(CAST(rev_u AS HUGEINT)) AS sx,
             |    sum(CAST(i AS HUGEINT)*rev_u) AS six
             |  FROM r GROUP BY 1)
             |SELECT segment, n_cust,
             |  CAST(sx AS DOUBLE)/100.0 AS total_revenue,
             |  CASE WHEN sx > 0 THEN
             |    round((2.0*CAST(six AS DOUBLE)
             |      - (CAST(n_cust AS DOUBLE)+1.0)*CAST(sx AS DOUBLE))
             |      /(CAST(n_cust AS DOUBLE)*CAST(sx AS DOUBLE)), 6)
             |  END AS gini
             |FROM g ORDER BY segment""".stripMargin)),

    // ── q154: bloom-pruned semi-join — line items of open high-value
    // orders, rolled up by return flag. Semantically a plain fact ⋈
    // selective-dim semi-join (the oracle IS that join — the bloom is
    // invisible in the result); physically the fact side is cut at
    // the scan by [[graft.operators.BloomPrune]]'s broadcast sketch
    // BEFORE the exchange, so the shuffle carries ~23% + fpp of the
    // rows instead of all of them. The exact semi-join after the
    // prefilter removes the bloom's false positives — correctness
    // never depends on the sketch (BloomPruneSpec proves
    // prune ∘ join ≡ join; the plan-audit spec pins the
    // bloom_might_contain filter into this query's plan).
    //
    // At 100 TB: the dim (filtered orders keys) must fit the
    // driver-merge bound (BloomPrune.MaxKeys, ~120 MB @1%); past
    // that, the same pattern runs with a coarser fpp or falls back to
    // the plain shuffle join. The whole point is that a 1000-executor
    // fact scan discards non-matching rows locally instead of
    // shipping them.
    QueryDef(
      "q154_bloom_prune",
      (s, d) => {
        val dim = t(s, d, "orders")
          .filter(col("o_orderstatus") === "O" &&
            col("o_totalprice") > 150000.0)
          .select(col("o_orderkey"))
        // the sketch memoizes per (session, corpus stamp) — steady-
        // state runs skip the dim-side count + bloom-agg build jobs
        val bloom = graft.operators.BloomPrune.cachedFor(
          dim, "o_orderkey", s"q154_open_hv:$d", Q.dirStamp(d))
        val li = t(s, d, "lineitem")
        val pruned = li.filter(
          graft.operators.BloomPrune.mightContain(bloom, li("l_orderkey")))
        pruned
          .join(dim, pruned("l_orderkey") === dim("o_orderkey"), "left_semi")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(col("l_quantity").cast("long")).cast("long").as("units"),
            sum(Q.fxUnits(col("l_extendedprice"), 100)).cast("long")
              .as("price_cents"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS units,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
             |    AS BIGINT) AS price_cents
             |FROM lineitem
             |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
             |  WHERE o_orderstatus = 'O' AND o_totalprice > 150000)
             |GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // ── q155: open-interval CENSUS — the daily order backlog: an
    // order is "open" from its order date through its last line
    // shipment, and the report asks how many were open on every
    // calendar day (the inventory/WIP curve under q132's revenue
    // view). The interval-stabbing problem, solved the only way that
    // scales: each interval contributes +1 at its open day and
    // retires after its close day, so open(d) = cum_opened(d) −
    // cum_closed(d−1) — two corpus-free cumsums over the calendar.
    // Orders with no line items have no ship span and are excluded
    // (honest: their close is unknown, not infinite).
    //
    // Scale shape: the corpus collapses to per-day open/close counts
    // (map-side partials, |days| rows); the calendar generates from
    // the 1-row span agg (q61's rule; the head() probe is plan-time
    // bounded); cumsums run over the dimension-bounded day frame.
    // Never an interval×day join (that is |orders|·|days| — the
    // naive kill).
    QueryDef(
      "q155_open_interval_census",
      (s, d) => {
        // inverted spans clamp shut: the fixture ships lines BEFORE
        // the order date (q174's n_early mass), so an order whose
        // every line shipped early would have close_day < open_day —
        // its −1 would land before its +1 and the backlog curve could
        // dip negative. Such an order closes the day it opens (in the
        // census for exactly its open day), on both engines.
        val spans = t(s, d, "lineitem")
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(max(to_date(col("l_shipdate"))).as("raw_close"))
          .join(t(s, d, "orders")
            .select(col("o_orderkey"), to_date(col("o_orderdate"))
              .as("open_day")),
            Seq("o_orderkey"))
          .withColumn("close_day",
            greatest(col("raw_close"), col("open_day")))
        val cal = spans
          .agg(min(col("open_day")).as("lo"), max(col("close_day")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        val opened = spans.groupBy(col("open_day").as("day"))
          .agg(count(lit(1)).cast("long").as("n_opened"))
        val closed = spans.groupBy(col("close_day").as("day"))
          .agg(count(lit(1)).cast("long").as("n_closed"))
        val w = Window.partitionBy(lit(1)).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)
        cal.join(opened, Seq("day"), "left")
          .join(closed, Seq("day"), "left")
          .select(col("day"),
            coalesce(col("n_opened"), lit(0L)).as("n_opened"),
            coalesce(col("n_closed"), lit(0L)).as("n_closed"))
          .withColumn("cum_o", sum(col("n_opened")).over(w))
          .withColumn("cum_c", sum(col("n_closed")).over(w))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_opened"), col("n_closed"),
            (col("cum_o") - col("cum_c") + col("n_closed")).cast("long")
              .as("open_count"))
          .orderBy(col("day"))
      },
      Some("""WITH spans AS (SELECT l_orderkey AS o_orderkey,
             |    max(CAST(l_shipdate AS DATE)) AS close_day
             |  FROM lineitem GROUP BY 1),
             |sp AS (SELECT s.o_orderkey,
             |    CAST(o.o_orderdate AS DATE) AS open_day,
             |    greatest(s.close_day, CAST(o.o_orderdate AS DATE))
             |      AS close_day
             |  FROM spans s JOIN orders o ON s.o_orderkey = o.o_orderkey),
             |cal AS (SELECT unnest(generate_series(
             |    (SELECT min(open_day) FROM sp),
             |    (SELECT max(close_day) FROM sp),
             |    INTERVAL 1 DAY))::DATE AS day),
             |op AS (SELECT open_day AS day,
             |    CAST(count(*) AS BIGINT) AS n_opened FROM sp GROUP BY 1),
             |cl AS (SELECT close_day AS day,
             |    CAST(count(*) AS BIGINT) AS n_closed FROM sp GROUP BY 1),
             |j AS (SELECT cal.day,
             |    coalesce(op.n_opened, 0) AS n_opened,
             |    coalesce(cl.n_closed, 0) AS n_closed
             |  FROM cal LEFT JOIN op ON cal.day = op.day
             |  LEFT JOIN cl ON cal.day = cl.day),
             |c AS (SELECT day, n_opened, n_closed,
             |    sum(n_opened) OVER w AS cum_o,
             |    sum(n_closed) OVER w AS cum_c
             |  FROM j WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING))
             |SELECT strftime(day, '%Y-%m-%d') AS day, n_opened, n_closed,
             |  CAST(cum_o - cum_c + n_closed AS BIGINT) AS open_count
             |FROM c ORDER BY day""".stripMargin)),

    // ── q156: PSI distribution drift — the Population Stability Index
    // every deployed-model monitor computes: the event-value
    // distribution of the first half of the window vs the second,
    // over 10 equal-width buckets of the GLOBAL range, per-bucket
    // (pₐ−p_b)·ln(pₐ/p_b) contributions and the running PSI in
    // declared bucket order (q147's accumulation rule). Laplace
    // add-one smoothing on the bucket counts — an empty bucket in one
    // period must contribute a large-but-finite term, not ±∞
    // (documented convention; both engines smooth identically).
    //
    // Scale shape: the global min/max is a plan-time 1-row probe
    // (q50's precedent — NOT a scalar crossJoin, so no BNLJ); the
    // corpus collapses in one scan to ≤ 20 (bucket, period) cells
    // with integer-exact bucketing (cent units, integer DIV); the
    // 10-row bucket spine generates from `sequence`, so both-empty
    // buckets still report.
    QueryDef(
      "q156_psi_drift",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(Q.fxUnits(col("value"), 100).as("vu"),
            (to_date(col("ts")) <= lit("2024-01-15").cast("date"))
              .cast("int").as("in_a"))
        val r = ev.agg(min(col("vu")), max(col("vu"))).head()
        val (lo, hi) = (r.getLong(0), r.getLong(1))
        val span = (hi - lo).max(1L)
        val cells = ev
          .withColumn("bucket",
            least(expr(s"(vu - $lo) * 10 DIV $span"), lit(9L)))
          .groupBy(col("bucket"))
          .agg(sum(col("in_a")).cast("long").as("ca"),
            sum(lit(1) - col("in_a")).cast("long").as("cb"))
        val spine = spark_range10(s)
        val tots = Window.partitionBy(lit(1))
        val wCum = Window.partitionBy(lit(1)).orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, 0)
        spine.join(cells, Seq("bucket"), "left")
          .select(col("bucket"),
            coalesce(col("ca"), lit(0L)).as("ca"),
            coalesce(col("cb"), lit(0L)).as("cb"))
          .withColumn("ta", sum(col("ca")).over(tots))
          .withColumn("tb", sum(col("cb")).over(tots))
          .withColumn("pa", (col("ca") + 1).cast("double") /
            (col("ta") + 10).cast("double"))
          .withColumn("pb", (col("cb") + 1).cast("double") /
            (col("tb") + 10).cast("double"))
          .withColumn("term",
            (col("pa") - col("pb")) * log(col("pa") / col("pb")))
          .withColumn("cum_psi", sum(col("term")).over(wCum))
          .select(col("bucket"), col("ca"), col("cb"),
            round(col("pa"), 6).as("pa"), round(col("pb"), 6).as("pb"),
            round(col("term"), 6).as("term"),
            round(col("cum_psi"), 6).as("cum_psi"))
          .orderBy(col("bucket"))
      },
      Some("""WITH ev AS (SELECT
             |    CAST(round(value*100) AS BIGINT) AS vu,
             |    CASE WHEN CAST(ts AS DATE) <= DATE '2024-01-15'
             |      THEN 1 ELSE 0 END AS in_a
             |  FROM events),
             |bounds AS (SELECT min(vu) AS lo,
             |    greatest(max(vu) - min(vu), 1) AS span FROM ev),
             |cells AS (SELECT
             |    least(((vu - lo) * 10) // span, 9) AS bucket,
             |    CAST(sum(in_a) AS BIGINT) AS ca,
             |    CAST(sum(1 - in_a) AS BIGINT) AS cb
             |  FROM ev CROSS JOIN bounds GROUP BY 1),
             |spine AS (SELECT unnest(generate_series(0, 9)) AS bucket),
             |j AS (SELECT spine.bucket,
             |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
             |  FROM spine LEFT JOIN cells ON spine.bucket = cells.bucket),
             |p AS (SELECT bucket, ca, cb,
             |    CAST(ca + 1 AS DOUBLE)/CAST(sum(ca) OVER () + 10 AS DOUBLE)
             |      AS pa,
             |    CAST(cb + 1 AS DOUBLE)/CAST(sum(cb) OVER () + 10 AS DOUBLE)
             |      AS pb
             |  FROM j),
             |k AS (SELECT bucket, ca, cb, pa, pb,
             |    (pa - pb) * ln(pa/pb) AS term FROM p)
             |SELECT bucket, ca, cb, round(pa, 6) AS pa, round(pb, 6) AS pb,
             |  round(term, 6) AS term,
             |  round(sum(term) OVER (ORDER BY bucket
             |    ROWS UNBOUNDED PRECEDING), 6) AS cum_psi
             |FROM k ORDER BY bucket""".stripMargin)),

    // ── q158: day-of-week-ADJUSTED anomaly ranking — the top-20 days
    // whose revenue deviates most from their own weekday's mean
    // (q124 profiles the seasonality; this subtracts it, so a strong
    // Sunday no longer masks a genuinely anomalous Tuesday). The
    // residual x − Σ_d/n_d is computed from the exact cross-multiple
    // (x·n_d − Σ_d) — integer-exact numerator, one division — so the
    // |residual| ranking can never disagree across engines.
    //
    // Scale shape: corpus → |days| grain map-side; the 7-row weekday
    // means broadcast back; top-20 is TakeOrdered, never a global
    // sort.
    QueryDef(
      "q158_dow_adjusted_residuals",
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("day"))
          .agg(sum(Q.fxUnits(col("o_totalprice"), 100)).cast("long")
            .as("rev_u"))
          .withColumn("dow", (weekday(col("day")) + 1).cast("long"))
        val dows = daily.groupBy(col("dow"))
          .agg(count(lit(1)).cast("long").as("n_d"),
            sum(col("rev_u")).cast("long").as("sum_d"))
        daily.join(broadcast(dows), Seq("dow"))
          .withColumn("resid",
            ((col("rev_u").cast("decimal(38,0)") * col("n_d"))
              .cast("double") - col("sum_d").cast("double")) /
              col("n_d").cast("double") / 100.0)
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("dow"), (col("rev_u") / 100.0).as("revenue"),
            round(col("sum_d").cast("double") /
              col("n_d").cast("double") / 100.0, 6).as("dow_mean"),
            round(col("resid"), 6).as("resid"))
          .orderBy(abs(col("resid")).desc, col("day"))
          .limit(20)
      },
      Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |      AS rev_u
             |  FROM orders GROUP BY 1),
             |dd AS (SELECT day, rev_u, CAST(isodow(day) AS BIGINT) AS dow
             |  FROM daily),
             |dw AS (SELECT dow, CAST(count(*) AS BIGINT) AS n_d,
             |    CAST(sum(rev_u) AS BIGINT) AS sum_d
             |  FROM dd GROUP BY 1),
             |r AS (SELECT dd.day, dd.dow, dd.rev_u, dw.n_d, dw.sum_d,
             |    (CAST(CAST(dd.rev_u AS HUGEINT) * dw.n_d AS DOUBLE)
             |      - CAST(dw.sum_d AS DOUBLE))
             |      / CAST(dw.n_d AS DOUBLE) / 100.0 AS resid
             |  FROM dd JOIN dw ON dd.dow = dw.dow)
             |SELECT strftime(day, '%Y-%m-%d') AS day, dow,
             |  rev_u/100.0 AS revenue,
             |  round(CAST(sum_d AS DOUBLE)/CAST(n_d AS DOUBLE)/100.0, 6)
             |    AS dow_mean,
             |  round(resid, 6) AS resid
             |FROM r ORDER BY abs(resid) DESC, day LIMIT 20""".stripMargin)),

    // ── q159: join-key ENTROPY census — Shannon entropy of the three
    // lineitem join keys, normalized by the uniform bound ln(n_keys),
    // plus the hottest key's share. The planner-grade skew number
    // next to q125's per-key census: normalized entropy near 1 means
    // hash partitioning balances; a falling value quantifies how much
    // of the key mass is drifting into few keys (when to reach for
    // `SkewJoin`). H = ln(N) − Σc·ln(c)/N with Σc·ln(c) accumulated
    // from exact micro-quantized ln values (q77's rule) in
    // DECIMAL(38,0) — group order cannot perturb the statistic.
    //
    // Scale shape: per key, one map-side-combined count agg at the
    // key grain, then a 1-row moment rollup; three keys union to a
    // 3-row report. The vocabulary never collects anywhere.
    QueryDef(
      "q159_key_entropy",
      (s, d) => {
        val li = t(s, d, "lineitem")
        def one(keyName: String): org.apache.spark.sql.DataFrame = {
          val cnts = li.groupBy(col(keyName).as("k"))
            .agg(count(lit(1)).cast("long").as("c"))
          val m = cnts.agg(
            sum(col("c")).cast("long").as("n_rows"),
            count(lit(1)).cast("long").as("n_keys"),
            sum((col("c").cast("decimal(19,0)") *
              round(log(col("c").cast("double")) * 1000000).cast("long"))
              .cast("decimal(38,0)")).as("sclnc"),
            max(col("c")).cast("long").as("top_c"))
          val nD = col("n_rows").cast("double")
          val h = log(nD) - col("sclnc").cast("double") / 1000000.0 / nD
          m.select(lit(keyName).as("key_name"), col("n_rows"),
            col("n_keys"), round(h, 6).as("entropy"),
            round(h / log(col("n_keys").cast("double")), 6)
              .as("norm_entropy"),
            round(col("top_c").cast("double") / nD, 6).as("top_share"))
        }
        one("l_orderkey").unionByName(one("l_partkey"))
          .unionByName(one("l_suppkey"))
          .orderBy(col("key_name"))
      },
      Some("""WITH k1 AS (SELECT l_orderkey AS k FROM lineitem),
             |k2 AS (SELECT l_partkey AS k FROM lineitem),
             |k3 AS (SELECT l_suppkey AS k FROM lineitem),
             |f AS (
             |  SELECT 'l_orderkey' AS key_name, k FROM k1
             |  UNION ALL SELECT 'l_partkey', k FROM k2
             |  UNION ALL SELECT 'l_suppkey', k FROM k3),
             |c AS (SELECT key_name, k, CAST(count(*) AS BIGINT) AS c
             |  FROM f GROUP BY 1, 2),
             |m AS (SELECT key_name,
             |    CAST(sum(c) AS BIGINT) AS n_rows,
             |    CAST(count(*) AS BIGINT) AS n_keys,
             |    sum(CAST(c AS HUGEINT) *
             |      CAST(round(ln(c)*1000000) AS BIGINT)) AS sclnc,
             |    CAST(max(c) AS BIGINT) AS top_c
             |  FROM c GROUP BY 1)
             |SELECT key_name, n_rows, n_keys,
             |  round(ln(CAST(n_rows AS DOUBLE))
             |    - CAST(sclnc AS DOUBLE)/1000000.0
             |      /CAST(n_rows AS DOUBLE), 6) AS entropy,
             |  round((ln(CAST(n_rows AS DOUBLE))
             |    - CAST(sclnc AS DOUBLE)/1000000.0/CAST(n_rows AS DOUBLE))
             |    / ln(CAST(n_keys AS DOUBLE)), 6) AS norm_entropy,
             |  round(CAST(top_c AS DOUBLE)/CAST(n_rows AS DOUBLE), 6)
             |    AS top_share
             |FROM m ORDER BY key_name""".stripMargin)),

    // ── q160: lead-lag cross-correlation — Pearson correlation of
    // daily click volume against purchase volume at day lags 0…7:
    // does click traffic predict purchases, and at what horizon? The
    // day shift runs over the DENSE calendar (q155's spine — a
    // missing day is a zero-volume day, not a skipped lag), and each
    // lag's correlation comes from exact integer moments (q103/q104
    // discipline) over the valid overlap.
    //
    // Scale shape: the corpus collapses once to the |days| grain; the
    // 8 lag columns are one window pass over that bounded frame,
    // stacked to (lag, x, y) rows — 8·|days|, still dimension-
    // bounded; one hash agg computes all 8 moment sets.
    QueryDef(
      "q160_lead_lag_corr",
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .select(to_date(col("ts")).as("day"),
            (col("event_type") === "click").cast("long").as("is_c"))
        val r = ev.agg(min(col("day")), max(col("day"))).head()
        val cal = t(s, d, "events").sparkSession
          .range(1).select(explode(sequence(
            lit(r.getDate(0)), lit(r.getDate(1)))).as("day"))
        val daily = cal
          .join(ev.groupBy(col("day"))
            .agg(sum(col("is_c")).cast("long").as("clicks"),
              sum(lit(1L) - col("is_c")).cast("long").as("purchases")),
            Seq("day"), "left")
          .select(col("day"),
            coalesce(col("clicks"), lit(0L)).as("x0"),
            coalesce(col("purchases"), lit(0L)).as("y"))
        val w = Window.partitionBy(lit(1)).orderBy(col("day"))
        val lagged = (0 to 7).foldLeft(daily) { (df, l) =>
          if (l == 0) df else df.withColumn(s"x$l", lag(col("x0"), l).over(w))
        }
        val stacked = lagged.select(col("y"),
          explode(array((0 to 7).map(l =>
            struct(lit(l.toLong).as("lag"), col(s"x$l").as("x"))): _*))
            .as("lx"))
          .select(col("lx.lag").as("lag"), col("lx.x").as("x"), col("y"))
          .filter(col("x").isNotNull)
        val dec38 = "decimal(38,0)"
        val xd = col("x").cast("decimal(19,0)")
        val yd = col("y").cast("decimal(19,0)")
        val m = stacked.groupBy(col("lag"))
          .agg(count(lit(1)).cast("long").as("n_days"),
            sum(xd.cast(dec38)).as("sx"), sum(yd.cast(dec38)).as("sy"),
            sum((xd * yd).cast(dec38)).as("sxy"),
            sum((xd * xd).cast(dec38)).as("sxx"),
            sum((yd * yd).cast(dec38)).as("syy"))
        val nD = col("n_days").cast("double")
        val num = nD * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")
        val denx = nD * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double")
        val deny = nD * col("syy").cast("double") -
          col("sy").cast("double") * col("sy").cast("double")
        m.select(col("lag"), col("n_days"),
            when(denx > 0 && deny > 0,
              round(num / sqrt(denx * deny), 6)).as("corr"))
          .orderBy(col("lag"))
      },
      Some("""WITH ev AS (SELECT CAST(ts AS DATE) AS day,
             |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_c
             |  FROM events WHERE event_type IN ('click', 'purchase')),
             |cal AS (SELECT unnest(generate_series(
             |    (SELECT min(day) FROM ev), (SELECT max(day) FROM ev),
             |    INTERVAL 1 DAY))::DATE AS day),
             |dc AS (SELECT day, CAST(sum(is_c) AS BIGINT) AS clicks,
             |    CAST(sum(1 - is_c) AS BIGINT) AS purchases
             |  FROM ev GROUP BY 1),
             |daily AS (SELECT cal.day,
             |    coalesce(clicks, 0) AS x0, coalesce(purchases, 0) AS y
             |  FROM cal LEFT JOIN dc ON cal.day = dc.day),
             |lg AS (SELECT day, y, x0,
             |    lag(x0, 1) OVER w AS x1, lag(x0, 2) OVER w AS x2,
             |    lag(x0, 3) OVER w AS x3, lag(x0, 4) OVER w AS x4,
             |    lag(x0, 5) OVER w AS x5, lag(x0, 6) OVER w AS x6,
             |    lag(x0, 7) OVER w AS x7
             |  FROM daily WINDOW w AS (ORDER BY day)),
             |st AS (
             |  SELECT CAST(0 AS BIGINT) AS lag, x0 AS x, y FROM lg
             |  UNION ALL SELECT 1, x1, y FROM lg WHERE x1 IS NOT NULL
             |  UNION ALL SELECT 2, x2, y FROM lg WHERE x2 IS NOT NULL
             |  UNION ALL SELECT 3, x3, y FROM lg WHERE x3 IS NOT NULL
             |  UNION ALL SELECT 4, x4, y FROM lg WHERE x4 IS NOT NULL
             |  UNION ALL SELECT 5, x5, y FROM lg WHERE x5 IS NOT NULL
             |  UNION ALL SELECT 6, x6, y FROM lg WHERE x6 IS NOT NULL
             |  UNION ALL SELECT 7, x7, y FROM lg WHERE x7 IS NOT NULL),
             |m AS (SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
             |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x AS HUGEINT)*y) AS sxy,
             |    sum(CAST(x AS HUGEINT)*x) AS sxx,
             |    sum(CAST(y AS HUGEINT)*y) AS syy
             |  FROM st GROUP BY 1),
             |dm AS (SELECT lag, n_days,
             |    CAST(n_days AS DOUBLE)*CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS num,
             |    CAST(n_days AS DOUBLE)*CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS denx,
             |    CAST(n_days AS DOUBLE)*CAST(syy AS DOUBLE)
             |      - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE) AS deny
             |  FROM m)
             |SELECT lag, n_days,
             |  CASE WHEN denx > 0 AND deny > 0 THEN
             |    round(num/sqrt(denx*deny), 6) END AS corr
             |FROM dm ORDER BY lag""".stripMargin)),

    // ── q161: daily value BANDS — exact p10/p50/p90 of event value
    // per (type, day): the operational envelope chart (q118 bins the
    // global distribution; this tracks the percentile BANDS through
    // time). Percentiles are DISCRETE order statistics — the element
    // at ceil(p·n) in the sorted cell, no interpolation arithmetic to
    // diverge — selected from a per-cell sorted array. Cell arrays
    // are bounded by a day×type's event volume (documented: at
    // extreme per-cell volumes this becomes the q41-style two-agg
    // form; the array stays the honest simple shape until then).
    QueryDef(
      "q161_daily_value_bands",
      (s, d) => {
        val idx = (p: Double) =>
          greatest(lit(1L), ceil(lit(p) * col("n")).cast("long"))
            .cast("int")
        t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"),
            Q.fxUnits(col("value"), 100).as("vu"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).cast("long").as("n"),
            sort_array(collect_list(col("vu"))).as("vs"))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"), col("n"),
            (element_at(col("vs"), idx(0.1)) / 100.0).as("p10"),
            (element_at(col("vs"), idx(0.5)) / 100.0).as("p50"),
            (element_at(col("vs"), idx(0.9)) / 100.0).as("p90"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(round(value*100) AS BIGINT) AS vu FROM events),
             |g AS (SELECT event_type, day,
             |    CAST(count(*) AS BIGINT) AS n,
             |    list_sort(list(vu)) AS vs
             |  FROM e GROUP BY 1, 2)
             |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
             |  vs[CAST(greatest(1, ceil(0.1*n)) AS INT)]/100.0 AS p10,
             |  vs[CAST(greatest(1, ceil(0.5*n)) AS INT)]/100.0 AS p50,
             |  vs[CAST(greatest(1, ceil(0.9*n)) AS INT)]/100.0 AS p90
             |FROM g ORDER BY event_type, day""".stripMargin))
  )

  /** 0–9 bucket spine for q156 (tiny generated frame, no scan). */
  private def spark_range10(s: SparkSession) =
    s.range(0, 10).select(col("id").as("bucket"))

  val defs2: Seq[QueryDef] = Seq(

    // ── q162: multi-state event-context ENRICHMENT — each purchase
    // annotated with the user's latest click, latest view, and the
    // count of errors in the preceding 10 minutes: the feature-
    // engineering join every fraud/recommendation pipeline runs
    // before scoring. q37/q151 carry ONE state; the point here is
    // that k carried states still cost ONE user-keyed exchange — the
    // union+window form scales in states, where k as-of joins would
    // pay k exchanges.
    //
    // Scale shape: one exchange keyed on user_id; two window specs
    // over it (the row-frame prefix for the carried maxima — clicks/
    // views sort before purchases at equal ts, so same-instant
    // context is inclusive; a RANGE frame over ts for the bounded
    // error count — range frames ignore the tiebreak, so equal-ts
    // inclusion is symmetric by construction). Nothing joins at row
    // grain.
    QueryDef(
      "q162_event_context_enrich",
      (s, d) => {
        val e = t(s, d, "events")
          .filter(col("event_type")
            .isin("click", "view", "error", "purchase"))
          .select(col("event_id"), col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"),
            (col("event_type") === "purchase").cast("int").as("is_p"))
        val wRow = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("is_p"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val wRange = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-600L * 1000000L, 0)
        e.withColumn("last_click_us",
            max(when(col("event_type") === "click", col("ts_us")))
              .over(wRow))
          .withColumn("last_view_us",
            max(when(col("event_type") === "view", col("ts_us")))
              .over(wRow))
          .withColumn("n_err_10m",
            sum((col("event_type") === "error").cast("long")).over(wRange)
              .cast("long"))
          .filter(col("is_p") === 1)
          .select(col("event_id"), col("user_id"),
            col("ts_us").as("purchase_ts_us"),
            col("last_click_us"), col("last_view_us"), col("n_err_10m"),
            when(col("last_click_us").isNotNull,
              (col("ts_us") - col("last_click_us")).cast("double") /
                1000000.0).as("click_gap_s"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, event_type,
             |    epoch_us(ts) AS ts_us,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
             |  FROM events
             |  WHERE event_type IN ('click', 'view', 'error', 'purchase')),
             |m AS (SELECT event_id, user_id, ts_us, is_p,
             |    max(CASE WHEN event_type = 'click' THEN ts_us END)
             |      OVER wr AS last_click_us,
             |    max(CASE WHEN event_type = 'view' THEN ts_us END)
             |      OVER wr AS last_view_us,
             |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             |      OVER wg AS BIGINT) AS n_err_10m
             |  FROM e
             |  WINDOW wr AS (PARTITION BY user_id
             |      ORDER BY ts_us, is_p, event_id
             |      ROWS UNBOUNDED PRECEDING),
             |    wg AS (PARTITION BY user_id ORDER BY ts_us
             |      RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id, ts_us AS purchase_ts_us,
             |  last_click_us, last_view_us, n_err_10m,
             |  CASE WHEN last_click_us IS NOT NULL THEN
             |    CAST(ts_us - last_click_us AS DOUBLE)/1000000.0
             |  END AS click_gap_s
             |FROM m WHERE is_p = 1 ORDER BY event_id""".stripMargin)),

    // ── q163: week-over-week revenue change per nation — the weekly
    // growth scorecard (q129 does day-over-day at type grain; this is
    // the ISO-week grain through the customer→nation dimension).
    // Weeks truncate to their Monday in both engines (date_trunc
    // 'week' ≡ Monday start on both); the change ratio derives from
    // exact cent integers, NULL on a nation's first week (q139's
    // honest-extent rule).
    //
    // Scale shape: orders pre-aggregate map-side to (custkey, week)
    // — no, better: customer⋈nation broadcasts into orders, the agg
    // keys on (nation, week) directly (map-side partials), and the
    // lag window runs per-nation over the |nations|×|weeks| frame —
    // dimension-bounded.
    QueryDef(
      "q163_wow_change",
      (s, d) => {
        val nat = broadcast(t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name")))
        val weekly = t(s, d, "orders")
          .join(nat, col("o_custkey") === col("c_custkey"))
          .groupBy(col("n_name"),
            date_format(date_trunc("week", col("o_orderdate")),
              "yyyy-MM-dd").as("week"))
          .agg(sum(Q.fxUnits(col("o_totalprice"), 100)).cast("long")
            .as("rev_u"))
        val w = Window.partitionBy(col("n_name")).orderBy(col("week"))
        weekly
          .withColumn("prev_u", lag(col("rev_u"), 1).over(w))
          .select(col("n_name"), col("week"),
            (col("rev_u") / 100.0).as("revenue"),
            (col("prev_u") / 100.0).as("prev_revenue"),
            when(col("prev_u") > 0,
              round((col("rev_u") - col("prev_u")).cast("double") /
                col("prev_u").cast("double"), 6)).as("wow_pct"))
          .orderBy(col("n_name"), col("week"))
      },
      Some("""WITH nat AS (SELECT c_custkey, n_name
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey),
             |weekly AS (SELECT n_name,
             |    strftime(date_trunc('week', o_orderdate), '%Y-%m-%d')
             |      AS week,
             |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |      AS rev_u
             |  FROM orders JOIN nat ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |lg AS (SELECT n_name, week, rev_u,
             |    lag(rev_u, 1) OVER (PARTITION BY n_name ORDER BY week)
             |      AS prev_u
             |  FROM weekly)
             |SELECT n_name, week, rev_u/100.0 AS revenue,
             |  prev_u/100.0 AS prev_revenue,
             |  CASE WHEN prev_u > 0 THEN
             |    round(CAST(rev_u - prev_u AS DOUBLE)/CAST(prev_u AS DOUBLE),
             |      6) END AS wow_pct
             |FROM lg ORDER BY n_name, week""".stripMargin)),

    // ── q164: cascade-impact ANALYSIS — if delinquent customers
    // (negative account balance) were purged, what cascades: orders,
    // line items, and revenue at risk, per market segment. The
    // impact-analysis query every retention/GDPR purge runs BEFORE
    // the q05-style anti-join actually deletes (measure, then cut).
    //
    // Scale shape: the flagged-customer frame carries only keys +
    // segment; orders join on custkey, line items PRE-AGGREGATE to
    // the orderkey grain before their join (map-side partials — the
    // fact table never joins at line grain against the flagged set);
    // final rollup is a |segments|-row agg.
    QueryDef(
      "q164_cascade_impact",
      (s, d) => {
        val flagged = t(s, d, "customer")
          .filter(col("c_acctbal") < 0)
          .select(col("c_custkey"), col("c_mktsegment"))
        val lines = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(Q.fxUnits(col("l_extendedprice"), 100)).cast("long")
              .as("line_cents"))
        t(s, d, "orders")
          .join(flagged, col("o_custkey") === col("c_custkey"))
          .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
          .groupBy(col("c_mktsegment").as("segment"))
          .agg(countDistinct(col("c_custkey")).cast("long")
            .as("n_customers"),
            count(lit(1)).cast("long").as("n_orders"),
            sum(coalesce(col("n_lines"), lit(0L))).cast("long")
              .as("n_lines"),
            sum(Q.fxUnits(col("o_totalprice"), 100)).cast("long")
              .as("order_cents"),
            sum(coalesce(col("line_cents"), lit(0L))).cast("long")
              .as("line_cents"))
          .orderBy(col("segment"))
      },
      Some("""WITH flagged AS (SELECT c_custkey, c_mktsegment
             |  FROM customer WHERE c_acctbal < 0),
             |lines AS (SELECT l_orderkey,
             |    CAST(count(*) AS BIGINT) AS n_lines,
             |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
             |      AS BIGINT) AS line_cents
             |  FROM lineitem GROUP BY 1)
             |SELECT c_mktsegment AS segment,
             |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(sum(coalesce(n_lines, 0)) AS BIGINT) AS n_lines,
             |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |    AS order_cents,
             |  CAST(sum(coalesce(line_cents, 0)) AS BIGINT) AS line_cents
             |FROM orders
             |JOIN flagged ON o_custkey = c_custkey
             |LEFT JOIN lines ON o_orderkey = l_orderkey
             |GROUP BY 1 ORDER BY segment""".stripMargin))
  )
}
