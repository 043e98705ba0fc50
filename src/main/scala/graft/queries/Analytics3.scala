package graft.queries

import org.apache.spark.sql.functions._

/** Round-8 warehouse + curation pack (SURVEY.md §2.4 q195+).
  *
  * q195–q198 complete the classic TPC-H plan-shape coverage the suite
  * had not yet declared: the segment-scoped unshipped-revenue top-k
  * (Q3), the two-nation bilateral trade matrix (Q7), the returned-item
  * customer report (Q10), and the correlated-min cheapest-supplier
  * lookup (Q2, re-expressed over observed line prices — the fixtures
  * carry no partsupp table, so the min is over what actually shipped).
  * q199/q200 are the curator-facing readouts next to them: the exact-
  * dup token-inflation ROI of running dedup at all, and tokenizer
  * fertility (subword tokens per 100 chars) split by the q30 language
  * heuristic — the number a budget-planner multiplies corpus bytes by.
  *
  * Reference progenitors: the A16 xref-bind / A18 aggregate rows of
  * SURVEY §2.1 (`Batch Processor.py:228-244,367-374`) for the join
  * shapes; the dedup stage (`:228-244`) for q199's grouping.
  * Disciplines as everywhere else ([[Q]]): exact fixed-point integer
  * aggregation, doubles only in final single-step derivations mirrored
  * operation-for-operation in the oracle, total-order output.
  */
object Analytics3 {
  import Q._

  val defs: Seq[QueryDef] = Seq(

    // ── q195: shipping priority (TPC-H Q3 analog) — the 10 highest-
    // revenue orders of one market segment that were placed before the
    // cutoff but still have lines shipping after it: the classic
    // 3-table join + top-k. Plan shape: both date predicates push to
    // their parquet scans; the segment-pruned customer side joins
    // before the fact join so the orders frame shrinks first; the
    // top-10 rides TakeOrdered on the EXACT micro revenue (ties broken
    // by date then key — a total order, so the limit boundary is
    // deterministic), and the display double derives after the cut.
    QueryDef(
      "q195_ship_priority",
      (s, d) => {
        val cutoff = Q.ts("1998-07-01")
        val cust = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey"))
        val ord = t(s, d, "orders")
          .filter(col("o_orderdate") < cutoff)
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_orderdate"), col("o_orderpriority"))
          .join(cust, col("o_custkey") === col("c_custkey"))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") > cutoff)
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
          .join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
          .agg(sum(revMicro).as("rev_micro"))
          .orderBy(col("rev_micro").desc, col("o_orderdate"),
            col("l_orderkey"))
          .limit(10)
          .select(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("o_orderpriority"),
            (col("rev_micro").cast("double") / 10000.0).as("revenue"))
      },
      Some(s"""WITH r AS (SELECT l_orderkey, o_orderdate, o_orderpriority,
              |    sum($revMicroSql) AS rev_micro
              |  FROM lineitem
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  WHERE c_mktsegment = 'BUILDING'
              |    AND o_orderdate < TIMESTAMP '1998-07-01'
              |    AND l_shipdate > TIMESTAMP '1998-07-01'
              |  GROUP BY l_orderkey, o_orderdate, o_orderpriority)
              |SELECT l_orderkey,
              |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
              |  o_orderpriority,
              |  CAST(rev_micro AS DOUBLE)/10000.0 AS revenue
              |FROM r
              |ORDER BY rev_micro DESC, o_orderdate, l_orderkey
              |LIMIT 10""".stripMargin)),

    // ── q196: bilateral trade (TPC-H Q7 analog) — shipped revenue
    // between two REGIONS, per direction per ship year. TPC-H phrases
    // this at nation grain; the declared query lifts it one level to
    // (supplier region, customer region) so every fixture SF carries
    // both directions (at sf0.001 most nation PAIRS are empty — a
    // declared query whose honest tiny-fixture answer is zero rows
    // can't smoke-test itself; region grain keeps the exact Q7 plan
    // shape with mass at every scale). Plan shape: the supplier side
    // collapses to a region-keyed dim and BROADCASTS (suppliers are
    // the 100×-smaller side — this prunes the fact before its one
    // exchange); the customer side reaches the fact through orders, so
    // it rides the orderkey shuffle and AQE picks build sides; the
    // direction filter excludes the same-region diagonals AFTER both
    // regions are known. Output is |2 directions| × |years| rows.
    QueryDef(
      "q196_bilateral_trade",
      (s, d) => {
        val regA = "ASIA"
        val regB = "EUROPE"
        def regDim(as: String) = t(s, d, "nation")
          .join(broadcast(t(s, d, "region")
            .filter(col("r_name").isin(regA, regB))
            .select(col("r_regionkey"), col("r_name").as(as))),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as(as + "_key"), col(as))
        val supp = t(s, d, "supplier")
          .join(broadcast(regDim("supp_region")),
            col("s_nationkey") === col("supp_region_key"))
          .select(col("s_suppkey"), col("supp_region"))
        val cust = t(s, d, "customer")
          .join(broadcast(regDim("cust_region")),
            col("c_nationkey") === col("cust_region_key"))
          .select(col("c_custkey"), col("cust_region"))
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= Q.ts("1996-01-01") &&
            col("l_shipdate") < Q.ts("1998-01-01"))
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
          .join(t(s, d, "orders").select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter((col("supp_region") === regA && col("cust_region") === regB) ||
            (col("supp_region") === regB && col("cust_region") === regA))
          .groupBy(col("supp_region"), col("cust_region"),
            date_format(col("l_shipdate"), "yyyy").as("l_year"))
          .agg(count(lit(1)).cast("long").as("n_lines"),
            sum(revMicro).as("rev_micro"))
          .select(col("supp_region"), col("cust_region"), col("l_year"),
            col("n_lines"),
            (col("rev_micro").cast("double") / 10000.0).as("revenue"))
          .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
      },
      Some(s"""SELECT sr.r_name AS supp_region, cr.r_name AS cust_region,
              |  strftime(l_shipdate, '%Y') AS l_year,
              |  CAST(count(*) AS BIGINT) AS n_lines,
              |  CAST(sum($revMicroSql) AS DOUBLE)/10000.0 AS revenue
              |FROM lineitem
              |JOIN supplier ON l_suppkey = s_suppkey
              |JOIN nation sn ON s_nationkey = sn.n_nationkey
              |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation cn ON c_nationkey = cn.n_nationkey
              |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate <  TIMESTAMP '1998-01-01'
              |  AND ((sr.r_name = 'ASIA' AND cr.r_name = 'EUROPE')
              |    OR (sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA'))
              |GROUP BY supp_region, cust_region, l_year
              |ORDER BY supp_region, cust_region, l_year""".stripMargin)),

    // ── q197: returned items (TPC-H Q10 analog) — the 20 customers
    // who returned the most revenue in one quarter: the churn-risk
    // report. Plan shape: the returnflag predicate and the quarter
    // window both push to their scans; the fact joins orders on the
    // one orderkey exchange, the customer dim joins at the
    // ALREADY-AGGREGATED custkey grain (|customers in window| rows,
    // not |lines|), nation broadcasts; top-20 TakeOrdered on the
    // exact micro revenue with custkey tiebreak.
    QueryDef(
      "q197_returned_items",
      (s, d) => {
        val ret = t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount"))
          .join(t(s, d, "orders")
            .filter(col("o_orderdate") >= Q.ts("1998-01-01") &&
              col("o_orderdate") < Q.ts("1998-04-01"))
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(revMicro).as("rev_micro"),
            count(lit(1)).cast("long").as("n_lines"))
        ret
          .join(t(s, d, "customer")
            .select(col("c_custkey"), col("c_name"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")
            .select(col("n_nationkey"), col("n_name"))),
            col("c_nationkey") === col("n_nationkey"))
          .orderBy(col("rev_micro").desc, col("c_custkey"))
          .limit(20)
          .select(col("c_custkey"), col("c_name"), col("n_name"),
            col("n_lines"),
            (col("rev_micro").cast("double") / 10000.0).as("returned_revenue"))
      },
      Some(s"""WITH r AS (SELECT o_custkey,
              |    sum($revMicroSql) AS rev_micro,
              |    CAST(count(*) AS BIGINT) AS n_lines
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  WHERE l_returnflag = 'R'
              |    AND o_orderdate >= TIMESTAMP '1998-01-01'
              |    AND o_orderdate <  TIMESTAMP '1998-04-01'
              |  GROUP BY o_custkey)
              |SELECT c_custkey, c_name, n_name, n_lines,
              |  CAST(rev_micro AS DOUBLE)/10000.0 AS returned_revenue
              |FROM r
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |ORDER BY rev_micro DESC, c_custkey
              |LIMIT 20""".stripMargin)),

    // ── q198: cheapest observed supplier (TPC-H Q2 analog) — per
    // size-scoped part, the EU supplier(s) whose single cheapest
    // shipped line attains the part's minimum observed price: the
    // correlated-min subquery shape (min per group, equality join
    // back). The fixtures carry no partsupp catalog, so "supply cost"
    // is re-expressed over what actually shipped — same plan shape,
    // honest data. Scale shape: the EU supplier dim (suppliers ⋈
    // broadcast nation ⋈ broadcast region) BROADCASTS to the fact; the
    // size-pruned part key list joins before the min-grain aggregate;
    // the min frame rolls up from the joined frame and the join-back
    // keys on partkey at collapsed grain (AQE broadcasts it at bench
    // scale). Price compares in EXACT cents; the display double
    // derives once at the end.
    QueryDef(
      "q198_min_price_supplier",
      (s, d) => {
        val eurSupp = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
            .join(broadcast(t(s, d, "region")
              .filter(col("r_name") === "EUROPE")
              .select(col("r_regionkey"))),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
            col("n_name"))
        val sized = t(s, d, "part")
          .filter(col("p_size").between(1, 15))
          .select(col("p_partkey"))
        val lines = t(s, d, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            Q.fxUnits(col("l_extendedprice"), 100).as("price_micro"))
          .join(sized, col("l_partkey") === col("p_partkey"))
          .join(broadcast(eurSupp), col("l_suppkey") === col("s_suppkey"))
        val mins = lines.groupBy(col("p_partkey").as("pk"))
          .agg(min(col("price_micro")).as("min_micro"))
        lines
          .join(mins, col("p_partkey") === col("pk") &&
            col("price_micro") === col("min_micro"))
          .select(col("p_partkey"), col("s_name"), col("n_name"),
            col("s_acctbal"),
            (col("min_micro").cast("double") / 100.0).as("min_price"))
          .distinct()
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
          .limit(100)
      },
      Some("""WITH eur AS (SELECT s_suppkey, s_name, s_acctbal, n_name
             |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey
             |  WHERE r_name = 'EUROPE'),
             |l AS (SELECT l_partkey AS p_partkey, s_name, n_name, s_acctbal,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_micro
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  JOIN eur ON l_suppkey = s_suppkey
             |  WHERE p_size BETWEEN 1 AND 15),
             |m AS (SELECT p_partkey AS pk, min(price_micro) AS min_micro
             |  FROM l GROUP BY pk)
             |SELECT DISTINCT p_partkey, s_name, n_name, s_acctbal,
             |  CAST(min_micro AS DOUBLE)/100.0 AS min_price
             |FROM l JOIN m ON p_partkey = pk AND price_micro = min_micro
             |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
             |LIMIT 100""".stripMargin)),

    // ── q199: exact-dup token inflation — per source, how many
    // documents and TOKENS exact dedup (q22's semantics) would remove:
    // the ROI readout a curator runs BEFORE spending compute on the
    // near-dup miners. Scale shape: the grouping key is the 256-bit
    // text digest, so the one exchange carries (source, 32-byte
    // digest, token count) — never the document bodies (q22's
    // discipline); the per-source rollup is a second map-side
    // aggregate over the already-collapsed group frame. The oracle
    // groups by the text itself — equivalent grouping (SHA-256
    // collisions are beyond fixture and corpus scale), and the oracle
    // side never pays the digest.
    QueryDef(
      "q199_dup_inflation",
      (s, d) => {
        val grp = t(s, d, "documents")
          .select(col("source"), sha2(col("text"), 256).as("th"),
            size(filter(split(col("text"), " "), tk => length(tk) > 0))
              .cast("long").as("tok"))
          .groupBy(col("source"), col("th"))
          .agg(count(lit(1)).cast("long").as("n"),
            max(col("tok")).as("tok"))
        grp.groupBy(col("source"))
          .agg(sum(col("n")).cast("long").as("n_docs"),
            sum(col("n") - 1).cast("long").as("n_dup_docs"),
            sum(col("n") * col("tok")).cast("long").as("total_tokens"),
            sum((col("n") - 1) * col("tok")).cast("long").as("dup_tokens"))
          .withColumn("dup_share",
            round(col("dup_tokens").cast("double") /
              col("total_tokens").cast("double"), 6))
          .orderBy(col("source"))
      },
      Some("""WITH dtok AS (SELECT source, text,
             |    CAST(len(list_filter(string_split(text,' '),
             |      x -> len(x) > 0)) AS BIGINT) AS tok
             |  FROM documents),
             |g AS (SELECT source, text, CAST(count(*) AS BIGINT) AS n,
             |    max(tok) AS tok
             |  FROM dtok GROUP BY source, text)
             |SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
             |  CAST(sum(n-1) AS BIGINT) AS n_dup_docs,
             |  CAST(sum(n*tok) AS BIGINT) AS total_tokens,
             |  CAST(sum((n-1)*tok) AS BIGINT) AS dup_tokens,
             |  round(CAST(sum((n-1)*tok) AS DOUBLE) /
             |    CAST(sum(n*tok) AS DOUBLE), 6) AS dup_share
             |FROM g GROUP BY source ORDER BY source""".stripMargin)),

    // ── q200: tokenizer fertility by language — per (source,
    // predicted language), subword tokens per 100 characters: the
    // multiplier that turns corpus BYTES into a token budget, split by
    // the q30 stopword-ratio language heuristic (ONE shared
    // definition — [[TextQueries.predLangFromRatio]] — so this readout
    // can never disagree with the lang-id query about what "en"
    // means). One scan computes both tokenizations + the stopword
    // count; the aggregate is map-side partial into |sources|×|langs|
    // cells; fertility derives from the two exact sums in one double
    // step.
    QueryDef(
      "q200_token_fertility",
      (s, d) => {
        val toks = filter(split(col("text"), " "), tk => length(tk) > 0)
        // the subword count is the ONE shared definition with q32
        // (regex by default, real BPE under the session flag), so the
        // fertility readout can never disagree with the suite's own
        // token masses
        val scored = t(s, d, "documents")
          .select(col("source"), col("n_chars"),
            TextQueries.subwordCount(s, d).as("re_tokens"),
            size(toks).cast("long").as("n_tokens"),
            size(filter(toks, tk => tk.isin(TextQueries.EnStops: _*)))
              .cast("long").as("stop_cnt"))
          .withColumn("pred_lang", TextQueries.predLangFromRatio(
            col("stop_cnt").cast("double") / col("n_tokens").cast("double")))
        scored.groupBy(col("source"), col("pred_lang"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("re_tokens")).cast("long").as("sum_re_tokens"),
            sum(col("n_chars")).cast("long").as("sum_chars"))
          .withColumn("fertility",
            round(col("sum_re_tokens").cast("double") * 100.0 /
              col("sum_chars").cast("double"), 6))
          .orderBy(col("source"), col("pred_lang"))
      },
      Some(s"""WITH s AS (SELECT source, n_chars,
              |    CAST(len(regexp_extract_all(text,
              |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS re_tokens,
              |    CAST(len(list_filter(string_split(text,' '),
              |      x -> len(x) > 0)) AS BIGINT) AS n_tokens,
              |    CAST(len(list_filter(string_split(text,' '),
              |      x -> x IN (${TextQueries.EnStopsSql}))) AS BIGINT) AS stop_cnt
              |  FROM documents),
              |c AS (SELECT source,
              |    CASE WHEN CAST(stop_cnt AS DOUBLE)/CAST(n_tokens AS DOUBLE)
              |      >= ${TextQueries.EnRatioThreshold}
              |      THEN 'en' ELSE 'unknown' END AS pred_lang,
              |    re_tokens, n_chars FROM s)
              |SELECT source, pred_lang,
              |  CAST(count(*) AS BIGINT) AS n_docs,
              |  CAST(sum(re_tokens) AS BIGINT) AS sum_re_tokens,
              |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
              |  round(CAST(sum(re_tokens) AS DOUBLE)*100.0 /
              |    CAST(sum(n_chars) AS DOUBLE), 6) AS fertility
              |FROM c GROUP BY source, pred_lang
              |ORDER BY source, pred_lang""".stripMargin))
  )
}
