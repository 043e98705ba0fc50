package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private val tradeEdgesCache = new StampedCache("trade_edges")

  /** The supplier-nation → customer-nation shipment edge frame
    * (src, dst, w = line count): the ONE corpus collapse behind the
    * graph family (q204 rank, q208 structure) — built once per
    * (session, corpus) and shared through the stamped/durable tier so
    * the second graph query never re-reads the fact tables. Plan
    * shape: the supplier dim broadcasts into the fact map-side, the
    * customer side reaches the fact through orders (custkey exchange
    * at orders grain), the one corpus-scale exchange is the orderkey
    * join, and the aggregate lands on the ≤|nations|² edge grain.
    */
  private[graft] def tradeEdges(s: SparkSession, d: String): DataFrame =
    tradeEdgesCache.get(s, d) {
      val suppNat = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey"), col("n_name").as("src"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("src"))
      val custNat = t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("cn_key"),
            col("n_name").as("dst"))),
          col("c_nationkey") === col("cn_key"))
        .select(col("c_custkey"), col("dst"))
      val ord = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(custNat, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("dst"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).cast("long").as("w"))
    }

  /** Drop this session's cached trade-edge frame (stamped, so a
    * corpus rewrite rebuilds automatically; long-lived services evict
    * on shutdown to release the session pin — the [[StampedCache]]
    * discipline every query file follows).
    */
  def clearCaches(s: SparkSession): Unit = {
    tradeEdgesCache.clear(s)
    userBitmapsCache.clear(s)
  }

  private val userBitmapsCache = new StampedCache("user_bitmaps")

  /** The (event_type, bucket) → user-id bitmap frame (q209's level-1
    * aggregate): the ONE corpus collapse behind the bitmap family —
    * q209 popcounts it, q210 ANDs it pairwise — built once per
    * (session, corpus) through the stamped/durable tier. The exchange
    * carries ≤4 KB bitmaps, never ids.
    */
  private[graft] def userBitmaps(s: SparkSession, d: String): DataFrame =
    userBitmapsCache.get(s, d) {
      t(s, d, "events")
        .select(col("event_type").as("et"),
          bitmap_bucket_number(col("user_id")).as("bkt"),
          bitmap_bit_position(col("user_id")).as("pos"))
        .groupBy(col("et"), col("bkt"))
        .agg(bitmap_construct_agg(col("pos")).as("bm"))
    }

  /** Oracle CTE matching [[tradeEdges]] exactly — the ONE SQL
    * definition of the edge frame, interpolated into both graph-query
    * oracles (q204/q208) so an edge-definition change can never leave
    * one oracle testing a different graph (the revMicroSql rule).
    */
  private[queries] val TradeEdgesSql: String =
    """edges AS (SELECT sn.n_name AS src, cn.n_name AS dst,
      |    CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  GROUP BY 1, 2)""".stripMargin

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
              |ORDER BY source, pred_lang""".stripMargin)),

    // ── q204: nation trade PageRank — stationary trade-influence rank
    // of nations over the supplier-nation → customer-nation shipment
    // graph (edge weight = shipped line count): the engine's
    // ITERATIVE graph-computation face as a declared, oracle-checked
    // query. The whole computation is integer fixed-point
    // ([[graft.operators.PageRank]] scaladoc has the recurrence): per-
    // edge floored division before every sum makes the result
    // independent of edge order and float-free, so ten power
    // iterations hash-match a DuckDB oracle whose ten iterations are
    // UNROLLED as CTEs (recursive CTEs cannot aggregate over their own
    // recursive term — the oracle string is generated by the same loop
    // that picks k).
    //
    // Scale shape: the corpus collapses ONCE into the SHARED
    // [[tradeEdges]] frame (stamped/durable — q208 reads the same
    // artifact without re-touching the fact tables). The iteration
    // then runs on the driver over the collected ≤625-row edge list
    // (the bounded-collect pattern: q40's k-means samples). For
    // node sets that do NOT collapse (user/document graphs), the
    // distributed twin [[graft.operators.PageRank.ranks]] runs the
    // same arithmetic as graph-grain joins — PageRankSpec proves the
    // two faces bit-identical.
    QueryDef(
      "q204_nation_pagerank",
      (s, d) => {
        val iters = 10
        val es = tradeEdges(s, d).collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
        val ranks = graft.operators.PageRank.ranksLocal(es, iters)
        import s.implicits._
        ranks.toDF("nation", "rank_units")
          .withColumn("rank",
            round(col("rank_units").cast("double") / 1.0e12, 6))
          .orderBy(col("rank_units").desc, col("nation"))
      },
      Some {
        val k = 10
        val iterCtes = (1 to k).map { i =>
          s"""r$i AS (SELECT n.node,
             |    CAST(m.tele + COALESCE(sum((CAST(85 AS HUGEINT) * p.r * e.w)
             |      // (100 * ow.wtot)), 0) AS HUGEINT) AS r
             |  FROM nodes n CROSS JOIN meta m
             |  LEFT JOIN edges e ON e.dst = n.node
             |  LEFT JOIN r${i - 1} p ON p.node = e.src
             |  LEFT JOIN outw ow ON ow.src = e.src
             |  GROUP BY n.node, m.tele)"""
        }.mkString(",\n")
        s"""WITH $TradeEdgesSql,
           |nodes AS (SELECT src AS node FROM edges
           |  UNION SELECT dst FROM edges),
           |meta AS (SELECT CAST(count(*) AS BIGINT) AS n,
           |    15 * 1000000000000 // (100 * count(*)) AS tele FROM nodes),
           |outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS wtot
           |  FROM edges GROUP BY src),
           |r0 AS (SELECT node,
           |    CAST(1000000000000 // (SELECT n FROM meta) AS HUGEINT) AS r
           |  FROM nodes),
           |$iterCtes
           |SELECT node AS nation, CAST(r AS BIGINT) AS rank_units,
           |  round(CAST(r AS DOUBLE) / 1000000000000.0, 6) AS rank
           |FROM r$k ORDER BY rank_units DESC, nation""".stripMargin
      }),

    // ── q205: order bookends — per repeat customer, the FIRST and
    // LAST order (by date, orderkey tiebreak) side by side with the
    // value delta; top-50 largest absolute swings. This is the ARGMAX
    // AGGREGATE face (`min_by`/`max_by` — codegen'd single-pass
    // partials) the suite had expressed only as window-rank (q152) or
    // scalar join-back (q178) shapes. The composite (date, orderkey)
    // ordering BIT-PACKS into one long (day << 43 | orderkey): a
    // STRUCT ordering key would be the semantically identical form,
    // but a struct aggregation buffer is not UnsafeRow-mutable and
    // demotes the whole aggregate to SortAggregate (q142's measured
    // trap — a map-side sort of the orders table); the packed long
    // keeps every buffer primitive, so the plan is a pure two-phase
    // HashAggregate. The packed key is UNIQUE, so partial-merge order
    // can never flip a tie; day < 2¹⁹ (year 3405) and orderkey < 2⁴³
    // (~9e12 — far past any TPC-H scale) keep the pack overflow-free.
    //
    // Scale shape: ONE |orders|-grain exchange for the groupBy; the
    // bookends ride min_by/max_by map-side partials (no per-customer
    // window sort, no self-join); top-50 is TakeOrdered on the exact
    // integer |Δcents| with custkey tiebreak — a total order, so the
    // limit boundary is deterministic. Doubles appear only in display
    // columns derived AFTER the cut.
    QueryDef(
      "q205_order_bookends",
      (s, d) => {
        val pk = (datediff(col("o_orderdate"),
          lit("1970-01-01").cast("date")).cast("long") * (1L << 43) +
          col("o_orderkey")).as("pk")
        val ord = t(s, d, "orders")
          .select(col("o_custkey"), pk,
            fxUnits(col("o_totalprice"), 100).as("cents"))
        ord.groupBy(col("o_custkey"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            min(col("pk")).as("fk"), max(col("pk")).as("lk"),
            min_by(col("cents"), col("pk")).as("fc"),
            max_by(col("cents"), col("pk")).as("lc"))
          .filter(col("n_orders") >= 2)
          .orderBy(abs(col("lc") - col("fc")).desc, col("o_custkey"))
          .limit(50)
          .select(col("o_custkey"), col("n_orders"),
            date_format(date_from_unix_date(
              shiftright(col("fk"), 43).cast("int")), "yyyy-MM-dd")
              .as("first_date"),
            date_format(date_from_unix_date(
              shiftright(col("lk"), 43).cast("int")), "yyyy-MM-dd")
              .as("last_date"),
            (col("fc").cast("double") / 100.0).as("first_value"),
            (col("lc").cast("double") / 100.0).as("last_value"),
            ((col("lc") - col("fc")).cast("double") / 100.0)
              .as("delta_value"))
      },
      Some("""WITH o AS (SELECT o_custkey, o_orderdate, o_orderkey,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders),
             |f AS (SELECT o_custkey, o_orderdate, cents,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate, o_orderkey) AS rf,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rl,
             |    CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT)
             |      AS n_orders
             |  FROM o),
             |a AS (SELECT ff.o_custkey, ff.n_orders,
             |    ff.o_orderdate AS fd, ff.cents AS fc,
             |    ll.o_orderdate AS ld, ll.cents AS lc
             |  FROM (SELECT * FROM f WHERE rf = 1) ff
             |  JOIN (SELECT * FROM f WHERE rl = 1) ll
             |    ON ff.o_custkey = ll.o_custkey
             |  WHERE ff.n_orders >= 2)
             |SELECT o_custkey, n_orders,
             |  strftime(fd, '%Y-%m-%d') AS first_date,
             |  strftime(ld, '%Y-%m-%d') AS last_date,
             |  CAST(fc AS DOUBLE) / 100.0 AS first_value,
             |  CAST(lc AS DOUBLE) / 100.0 AS last_value,
             |  CAST(lc - fc AS DOUBLE) / 100.0 AS delta_value
             |FROM a ORDER BY abs(lc - fc) DESC, o_custkey
             |LIMIT 50""".stripMargin)),

    // ── q206: label-centroid affinity matrix — pairwise cosine
    // similarity between every two LABEL centroids of the embedding
    // corpus: the class-confusability readout (a high inter-centroid
    // cosine says two labels occupy the same region — merge them, or
    // expect classifier confusion; the pair-matrix twin of q131's
    // within-label drift). Exactness rides an algebraic identity: the
    // cosine of two MEAN vectors equals the cosine of the two SUM
    // vectors (the 1/n factors cancel), so after q131's per-component
    // micro-unit quantization (round(x·1e6) — the ONE lossy step,
    // identical in both engines) everything up to the final display
    // division is exact integer arithmetic: per-(label, dim) component
    // sums, pair dot products and norms in DECIMAL(38,0)/HUGEINT, one
    // fixed-order double expression at the end.
    //
    // Scale shape: the corpus collapses in ONE posexplode pass to the
    // |labels|×|dims| cell grain (map-side partials — the exchange
    // carries cells, never vectors); the pair join and both norm
    // joins run at that collapsed grain (≤|labels|²·|dims| rows,
    // AQE-broadcast); output is the |labels|²/2 triangle.
    QueryDef(
      "q206_label_affinity",
      (s, d) => {
        val dec19 = "decimal(19,0)"
        val dec38 = "decimal(38,0)"
        // cells carries the per-label vector count too, so the ONE
        // corpus pass really is one (a separate counts scan would
        // re-read the corpus — q131's idiom). n_a/n_b therefore count
        // vectors CONTRIBUTING to the centroid: a null/empty embedding
        // row carries no components, drops at posexplode, and is not
        // counted (for ragged arrays max(n) reports the widest dim's
        // contributor count) — identical in the oracle by the same
        // unnest semantics
        val cells = t(s, d, "embeddings")
          .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy(col("label"), col("dim"))
          .agg(sum(round(col("x").cast("double") * 1e6).cast("long"))
            .cast("long").as("sx"),
            count(lit(1)).cast("long").as("n"))
        val norms = cells
          .groupBy(col("label"))
          .agg(sum((col("sx").cast(dec19) * col("sx").cast(dec19))
            .cast(dec38)).as("ss"),
            max(col("n")).as("n"))
        val a = cells.select(col("label").as("label_a"), col("dim"),
          col("sx").as("sxa"))
        val b = cells.select(col("label").as("label_b"),
          col("dim").as("dim_b"), col("sx").as("sxb"))
        a.join(b, col("dim") === col("dim_b") &&
            col("label_a") < col("label_b"))
          .groupBy(col("label_a"), col("label_b"))
          .agg(sum((col("sxa").cast(dec19) * col("sxb").cast(dec19))
            .cast(dec38)).as("dot"))
          .join(norms.select(col("label").as("label_a"),
            col("ss").as("ss_a"), col("n").as("n_a")), Seq("label_a"))
          .join(norms.select(col("label").as("label_b"),
            col("ss").as("ss_b"), col("n").as("n_b")), Seq("label_b"))
          .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
            round(col("dot").cast("double") /
              (sqrt(col("ss_a").cast("double")) *
                sqrt(col("ss_b").cast("double"))), 6).as("cosine"))
          .orderBy(col("label_a"), col("label_b"))
      },
      Some("""WITH g AS (SELECT label, dim,
             |    CAST(round(CAST(embedding[dim] AS DOUBLE)*1e6) AS BIGINT)
             |      AS ux
             |  FROM embeddings,
             |    unnest(range(1, len(embedding)+1)) AS u(dim)),
             |cells AS (SELECT label, dim, CAST(sum(ux) AS BIGINT) AS sx,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM g GROUP BY 1, 2),
             |norms AS (SELECT label,
             |    sum(CAST(sx AS HUGEINT) * sx) AS ss,
             |    CAST(max(n) AS BIGINT) AS n
             |  FROM cells GROUP BY 1),
             |pairs AS (SELECT a.label AS label_a, b.label AS label_b,
             |    sum(CAST(a.sx AS HUGEINT) * b.sx) AS dot
             |  FROM cells a JOIN cells b
             |    ON a.dim = b.dim AND a.label < b.label
             |  GROUP BY 1, 2)
             |SELECT p.label_a, p.label_b, na.n AS n_a, nb.n AS n_b,
             |  round(CAST(p.dot AS DOUBLE) /
             |    (sqrt(CAST(na.ss AS DOUBLE)) * sqrt(CAST(nb.ss AS DOUBLE))),
             |    6) AS cosine
             |FROM pairs p
             |JOIN norms na ON na.label = p.label_a
             |JOIN norms nb ON nb.label = p.label_b
             |ORDER BY label_a, label_b""".stripMargin)),

    // ── q207: metric melt — UNPIVOT the per-source wide metric frame
    // into (source, metric, value) long form: the inverse of q42's
    // pivot, completing the reshape pair (this is the export shape a
    // metric store or time-series DB ingests — one row per measurement,
    // not one column per metric). All five measures are exact BIGINTs
    // (a melt's value column carries ONE type; mixed-type metrics
    // would silently cast — the long grain keeps it lossless).
    //
    // Scale shape: ONE |sources|-grain exchange computes the wide
    // frame (map-side partials over the corpus scan); the melt itself
    // is Spark's Expand over the ALREADY-COLLAPSED |sources| rows —
    // ×5 fanout at dimension grain, never corpus grain (the same
    // Expand that is a trap at corpus grain — q93's rejected
    // multi-distinct rewrite — is free here).
    QueryDef(
      "q207_metric_melt",
      (s, d) => {
        // NULL measures melt differently across engines (Spark unpivot
        // RETAINS null-valued rows, DuckDB UNPIVOT drops them —
        // verified divergence), so every measure is null-proofed at
        // the row grain BEFORE aggregation, identically in the oracle
        val wide = t(s, d, "documents")
          .select(col("source"),
            coalesce(col("n_chars"), lit(0L)).as("nc"),
            coalesce(col("text"), lit("")).as("tx"))
          .groupBy(col("source"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("nc")).cast("long").as("sum_chars"),
            sum(size(filter(split(col("tx"), " "),
              tk => length(tk) > 0)).cast("long")).cast("long")
              .as("sum_ws_tokens"),
            min(col("nc")).cast("long").as("min_chars"),
            max(col("nc")).cast("long").as("max_chars"))
        wide.unpivot(
          Array(col("source")),
          Array(col("n_docs"), col("sum_chars"), col("sum_ws_tokens"),
            col("min_chars"), col("max_chars")),
          "metric", "value")
          .orderBy(col("source"), col("metric"))
      },
      Some("""WITH s AS (SELECT source,
             |    coalesce(n_chars, 0) AS nc, coalesce(text, '') AS tx
             |  FROM documents),
             |w AS (SELECT source,
             |    CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(nc) AS BIGINT) AS sum_chars,
             |    CAST(sum(len(list_filter(string_split(tx, ' '),
             |      x -> len(x) > 0))) AS BIGINT) AS sum_ws_tokens,
             |    CAST(min(nc) AS BIGINT) AS min_chars,
             |    CAST(max(nc) AS BIGINT) AS max_chars
             |  FROM s GROUP BY source)
             |SELECT source, metric, value FROM (
             |  UNPIVOT w
             |  ON n_docs, sum_chars, sum_ws_tokens, min_chars, max_chars
             |  INTO NAME metric VALUE value)
             |ORDER BY source, metric""".stripMargin)),

    // ── q208: trade-graph structure profile — the STRUCTURE readout
    // next to q204's rank: per nation, out/in degree, out/in weighted
    // mass, net balance, and the RECIPROCATED share of its outbound
    // mass (how much of what it ships goes to partners that ship
    // back). Rank says who matters; this says what the graph looks
    // like — the pair a graph analyst reads together.
    //
    // Exactness: degrees and masses are exact longs off the same
    // collapsed edge frame as q204; the reciprocated share is the one
    // display double (recip_w / out_w, round 6). The reciprocity
    // self-join runs at the ≤|nations|² edge grain.
    //
    // Scale shape: rides the SHARED [[tradeEdges]] frame (built once
    // per session/corpus — with q204 in the same session the fact
    // tables are touched exactly once for the whole graph family);
    // everything downstream is dimension-grain (self-join + two
    // rollups over ≤625 rows, AQE-broadcast).
    QueryDef(
      "q208_trade_graph_profile",
      (s, d) => {
        val edges = tradeEdges(s, d)
        val rev = edges.select(col("src").as("r_src"),
          col("dst").as("r_dst"))
        val withRecip = edges.join(rev,
            col("src") === col("r_dst") && col("dst") === col("r_src"),
            "left")
          .withColumn("recip_w",
            when(col("r_src").isNotNull, col("w")).otherwise(lit(0L)))
        val outSide = withRecip.groupBy(col("src").as("nation"))
          .agg(count(lit(1)).cast("long").as("out_deg"),
            sum(col("w")).cast("long").as("out_w"),
            sum(col("recip_w")).cast("long").as("recip_w"))
        val inSide = edges.groupBy(col("dst").as("nation"))
          .agg(count(lit(1)).cast("long").as("in_deg"),
            sum(col("w")).cast("long").as("in_w"))
        outSide.join(inSide, Seq("nation"), "full_outer")
          .select(col("nation"),
            coalesce(col("out_deg"), lit(0L)).as("out_deg"),
            coalesce(col("in_deg"), lit(0L)).as("in_deg"),
            coalesce(col("out_w"), lit(0L)).as("out_w"),
            coalesce(col("in_w"), lit(0L)).as("in_w"),
            (coalesce(col("out_w"), lit(0L)) -
              coalesce(col("in_w"), lit(0L))).as("balance"),
            when(coalesce(col("out_w"), lit(0L)) > 0L,
              round(coalesce(col("recip_w"), lit(0L)).cast("double") /
                col("out_w").cast("double"), 6)).otherwise(lit(0.0))
              .as("recip_share"))
          .orderBy(col("nation"))
      },
      Some(s"""WITH $TradeEdgesSql,
             |wr AS (SELECT e.src, e.dst, e.w,
             |    CASE WHEN r.src IS NOT NULL THEN e.w ELSE 0 END AS recip_w
             |  FROM edges e LEFT JOIN edges r
             |    ON e.src = r.dst AND e.dst = r.src),
             |o AS (SELECT src AS nation, CAST(count(*) AS BIGINT) AS out_deg,
             |    CAST(sum(w) AS BIGINT) AS out_w,
             |    CAST(sum(recip_w) AS BIGINT) AS recip_w
             |  FROM wr GROUP BY 1),
             |i AS (SELECT dst AS nation, CAST(count(*) AS BIGINT) AS in_deg,
             |    CAST(sum(w) AS BIGINT) AS in_w
             |  FROM edges GROUP BY 1)
             |SELECT coalesce(o.nation, i.nation) AS nation,
             |  CAST(coalesce(o.out_deg, 0) AS BIGINT) AS out_deg,
             |  CAST(coalesce(i.in_deg, 0) AS BIGINT) AS in_deg,
             |  CAST(coalesce(o.out_w, 0) AS BIGINT) AS out_w,
             |  CAST(coalesce(i.in_w, 0) AS BIGINT) AS in_w,
             |  CAST(coalesce(o.out_w, 0) - coalesce(i.in_w, 0) AS BIGINT)
             |    AS balance,
             |  CASE WHEN coalesce(o.out_w, 0) > 0
             |    THEN round(CAST(coalesce(o.recip_w, 0) AS DOUBLE) /
             |      CAST(o.out_w AS DOUBLE), 6)
             |    ELSE 0.0 END AS recip_share
             |FROM o FULL OUTER JOIN i ON o.nation = i.nation
             |ORDER BY nation""".stripMargin)),

    // ── q209: bitmap-accelerated exact distinct — distinct users per
    // event type via Spark's BITMAP aggregate family
    // (bitmap_bucket_number / bitmap_bit_position /
    // bitmap_construct_agg / bitmap_or_agg / bitmap_count): the
    // 100 TB exact-distinct accelerator. The two-level shape is the
    // point — level 1 builds a ≤4 KB bitmap per (type, id-bucket)
    // with map-side partials (the exchange carries bitmaps, never
    // ids), level 2 ORs the per-bucket bitmaps and sums their
    // popcounts. Distinct counting without a countDistinct Expand,
    // without a two-level exact-distinct row explosion, and — unlike
    // q45's HLL — EXACT, so the DuckDB oracle is a plain
    // count(DISTINCT). The bitmaps are also mergeable state: the same
    // frame incrementally absorbs a delta by OR (the sketch-family
    // maintenance story with zero error).
    QueryDef(
      "q209_bitmap_distinct",
      (s, d) => {
        userBitmaps(s, d)
          .groupBy(col("et").as("event_type"))
          .agg(sum(bitmap_count(col("bm"))).cast("long").as("n_users"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ── q210: bitmap-exact audience overlap — pairwise distinct-user
    // intersection and Jaccard between event types via `bitmap_and_agg`:
    // the ZERO-ERROR twin of q184's HLL inclusion-exclusion matrix
    // (same readout, exact instead of ±2%, at the bitmap family's
    // Θ(distinct-bits) price — right for dense bounded id domains,
    // q184 for unbounded ones). The AND rides the same (type, bucket)
    // bitmap frame as q209: each bucket row fans out to the ≤|types|−1
    // pairs containing its type, the per-(pair, bucket) AND keeps only
    // groups where BOTH types contributed (a single-row group would
    // return its own bitmap — filtered, an absent side means an empty
    // intersection), and popcounts sum per pair.
    //
    // Scale shape: the corpus collapses ONCE into the bitmap frame
    // (the q209 level-1 exchange, carrying ≤4 KB bitmaps); the pair
    // fanout/AND/rollup all run at the ≤|types|²×|buckets| dimension
    // grain. No id-grain self-join — the classic exact-overlap
    // formulation joins the corpus against itself on user_id.
    QueryDef(
      "q210_bitmap_overlap",
      (s, d) => {
        val buckets = userBitmaps(s, d)
        val perType = buckets.groupBy(col("et"))
          .agg(sum(bitmap_count(col("bm"))).cast("long").as("n"))
        val types = perType.select(col("et").as("other"))
        val expanded = buckets
          .join(broadcast(types), col("other") =!= col("et"))
          .select(
            least(col("et"), col("other")).as("type_a"),
            greatest(col("et"), col("other")).as("type_b"),
            col("et"), col("bkt"), col("bm"))
        val inter = expanded
          .groupBy(col("type_a"), col("type_b"), col("bkt"))
          .agg(bitmap_and_agg(col("bm")).as("abm"),
            count(lit(1)).cast("long").as("sides"))
          .filter(col("sides") === 2L)
          .groupBy(col("type_a"), col("type_b"))
          .agg(sum(bitmap_count(col("abm"))).cast("long").as("n_inter"))
        val pairs = perType.select(col("et").as("type_a"), col("n").as("n_a"))
          .join(perType.select(col("et").as("type_b"), col("n").as("n_b")),
            col("type_a") < col("type_b"))
        pairs.join(inter, Seq("type_a", "type_b"), "left")
          .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
            coalesce(col("n_inter"), lit(0L)).as("n_inter"))
          .withColumn("jaccard",
            round(col("n_inter").cast("double") /
              (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 6))
          .orderBy(col("type_a"), col("type_b"))
      },
      Some("""WITH du AS (SELECT DISTINCT event_type AS et, user_id
             |  FROM events),
             |n AS (SELECT et, CAST(count(*) AS BIGINT) AS n
             |  FROM du GROUP BY et),
             |inter AS (SELECT a.et AS type_a, b.et AS type_b,
             |    CAST(count(*) AS BIGINT) AS n_inter
             |  FROM du a JOIN du b
             |    ON a.user_id = b.user_id AND a.et < b.et
             |  GROUP BY 1, 2)
             |SELECT na.et AS type_a, nb.et AS type_b,
             |  na.n AS n_a, nb.n AS n_b,
             |  CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
             |  round(CAST(coalesce(i.n_inter, 0) AS DOUBLE) /
             |    CAST(na.n + nb.n - coalesce(i.n_inter, 0) AS DOUBLE), 6)
             |    AS jaccard
             |FROM n na JOIN n nb ON na.et < nb.et
             |LEFT JOIN inter i ON i.type_a = na.et AND i.type_b = nb.et
             |ORDER BY type_a, type_b""".stripMargin))
  )
}
