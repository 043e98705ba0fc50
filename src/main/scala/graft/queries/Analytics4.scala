package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 closing pack: the two classic scan-aggregate plan shapes
  * the suite had not yet declared as standalone queries.
  *
  * q211 is the TPC-H Q1 pricing summary — THE canonical "one corpus
  * scan, tiny group-by, many exact measures" benchmark query (q08 is
  * the minimal hash-agg; q14 the single-row conditional summary; this
  * is the full multi-measure grouped report with derived averages).
  * q212 is the TPC-H Q6 forecast-revenue delta — the agg-ONLY scan
  * whose entire cost is how much of the fact file the predicates let
  * the reader skip; it exists to pin the pure-pushdown plan shape
  * (q01 pins pushdown on a row-returning scan; this pins it under
  * full aggregation, where a lost filter silently inflates one number
  * instead of adding rows).
  *
  * Reference progenitor: the A18 aggregate/summarize row of SURVEY
  * §2.1 (`Batch Processor.py:287-365` fold with per-stage counters) —
  * the reference folds per-record counters on one pass; these are the
  * declarative Spark twins at warehouse semantics.
  *
  * Disciplines as everywhere else ([[Q]]): every money measure is an
  * exact fixed-point integer sum (DECIMAL(38,0) where a product can
  * cross 2⁶³ at 100 TB), display doubles derive in single mirrored
  * operation chains, output carries a total order.
  */
object Analytics4 {
  import Q._

  private val TradeEdgesSql = Analytics3.TradeEdgesSql

  /** q219's per-user in-window touch bound: only each user's most
    * recent `Q219TouchCap` non-purchase touches enter the attribution
    * join. Sized two orders of magnitude above any real per-user
    * activity (fixture max: 80 touches/user at sf0.1) — the cap
    * exists to bound the PATHOLOGICAL cell (one bot user making the
    * purchases×touches join quadratic), not to sample honest users;
    * `n_capped_users` in the output reports every user that hit it.
    */
  private[graft] val Q219TouchCap = 10000

  /** q219's body with the touch cap as a parameter — the spec seam:
    * [[QueriesSpec]] proves cap=10000 ≡ cap=MaxValue on the fixture
    * and that a tiny cap counts exactly the over-cap users.
    */
  private[graft] def linearAttribution(
      s: SparkSession, d: String, cap: Int): DataFrame =
    linearAttributionFrom(
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us")),
      cap)

  /** The same body over an arbitrary events frame
    * `(event_id, user_id, event_type, us)` — [[graft.Profile]]'s
    * hot-user probe drives THIS implementation (not a copy), so a
    * logic change here is automatically what the probe prices.
    */
  private[graft] def linearAttributionFrom(
      ev: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"),
        col("us").as("cus"))
    val touches = ev.filter(col("event_type") =!= "purchase")
    val touch = touches
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc, col("event_id").desc)))
      .filter(col("rn") <= cap)
      .select(col("user_id"), col("event_type"), col("us"))
    // the capped-user count needs NO window: a user is capped iff its
    // total touch count exceeds the cap — one hash aggregate instead
    // of a second consumer of the per-user sort (r9 review finding)
    val capped = touches.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      // count(when), not sum(when): sum over an empty frame is NULL
      .agg(count(when(col("n") > cap, lit(1))).cast("long")
        .as("n_capped_users"))
    val perConvType = conv.join(touch, Seq("user_id"))
      .filter(col("us") < col("cus") &&
        col("us") >= col("cus") - lit(604800000000L))
      .groupBy(col("conv_id"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("t_cnt"))
    val perConv = perConvType.groupBy(col("conv_id"))
      .agg(sum(col("t_cnt")).as("n_touch"))
    perConvType.join(perConv, Seq("conv_id"))
      .select(col("event_type"), col("conv_id"), col("t_cnt"),
        expr("(1000000 * t_cnt) div n_touch").as("credit_e6"))
      .groupBy(col("event_type"))
      // the frame is unique per (conv, type) by construction, so
      // a plain count IS the distinct conversion count — a
      // countDistinct here would plan a needless Expand+distinct
      // pass over the corpus-grain frame (r8 review finding)
      .agg(count(lit(1)).cast("long").as("n_conversions"),
        sum(col("t_cnt")).cast("long").as("n_touches"),
        sum(col("credit_e6")).cast("long").as("credit_e6"))
      .crossJoin(broadcast(capped))
      .select(col("event_type"), col("n_conversions"),
        col("n_touches"), col("credit_e6"),
        round(col("credit_e6").cast("double") / 1000000.0, 6)
          .as("credit"),
        col("n_capped_users"))
      .orderBy(col("credit_e6").desc, col("event_type"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ── q211: pricing summary report (TPC-H Q1 analog) — per
    // (returnflag, linestatus): quantity/base/discounted/charged
    // totals plus derived averages over everything shipped on or
    // before the cutoff. Plan shape: ONE corpus scan (the date cut
    // pushes to parquet), all eight measures accumulate in a single
    // two-phase HashAggregate with map-side partials onto a ≤6-row
    // group frame — never one pass per measure. Exactness: quantity/
    // price/discount sum in cents (LONG — ≤10⁴-unit values keep Σ
    // under 2⁶³ past 10¹⁴ rows); the discounted and taxed-charge
    // products sum as DECIMAL(38,0) (cents × pct [× pct] crosses 2⁶³
    // on a 100 TB year — revMicro's rule); every displayed double is
    // one mirrored division chain over those exact integers.
    QueryDef(
      "q211_pricing_summary",
      (s, d) => {
        val chargeMicro = (revMicro *
          (lit(100L) + fxUnits(col("l_tax"), 100)).cast("decimal(19,0)"))
          .cast("decimal(38,0)")
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= Q.ts("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(fxUnits(col("l_quantity"), 100)).as("sq"),
            sum(fxUnits(col("l_extendedprice"), 100)).as("sb"),
            sum(revMicro).as("sd"),
            sum(chargeMicro).as("sc"),
            sum(fxUnits(col("l_discount"), 100)).as("sdsc"),
            count(lit(1)).cast("long").as("n_lines"))
          .select(
            col("l_returnflag"), col("l_linestatus"),
            (col("sq").cast("double") / 100.0).as("sum_qty"),
            (col("sb").cast("double") / 100.0).as("sum_base"),
            (col("sd").cast("double") / 10000.0).as("sum_disc"),
            (col("sc").cast("double") / 1000000.0).as("sum_charge"),
            (col("sq").cast("double") / col("n_lines").cast("double") / 100.0)
              .as("avg_qty"),
            (col("sb").cast("double") / col("n_lines").cast("double") / 100.0)
              .as("avg_price"),
            (col("sdsc").cast("double") / col("n_lines").cast("double") / 100.0)
              .as("avg_disc"),
            col("n_lines"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some(s"""WITH a AS (SELECT l_returnflag, l_linestatus,
              |    sum(CAST(round(l_quantity*100) AS BIGINT)) AS sq,
              |    sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS sb,
              |    sum($revMicroSql) AS sd,
              |    sum(($revMicroSql) *
              |        (100 + CAST(round(l_tax*100) AS BIGINT))) AS sc,
              |    sum(CAST(round(l_discount*100) AS BIGINT)) AS sdsc,
              |    CAST(count(*) AS BIGINT) AS n_lines
              |  FROM lineitem
              |  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
              |  GROUP BY l_returnflag, l_linestatus)
              |SELECT l_returnflag, l_linestatus,
              |  CAST(sq AS DOUBLE)/100.0 AS sum_qty,
              |  CAST(sb AS DOUBLE)/100.0 AS sum_base,
              |  CAST(sd AS DOUBLE)/10000.0 AS sum_disc,
              |  CAST(sc AS DOUBLE)/1000000.0 AS sum_charge,
              |  CAST(sq AS DOUBLE)/CAST(n_lines AS DOUBLE)/100.0 AS avg_qty,
              |  CAST(sb AS DOUBLE)/CAST(n_lines AS DOUBLE)/100.0 AS avg_price,
              |  CAST(sdsc AS DOUBLE)/CAST(n_lines AS DOUBLE)/100.0 AS avg_disc,
              |  n_lines
              |FROM a
              |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ── q212: forecast revenue delta (TPC-H Q6 analog) — the revenue
    // a blanket removal of one discount band on small-quantity lines
    // would have changed in one year: sum(price × discount) under
    // three banded predicates, ONE output row. Plan shape: every
    // predicate (date range, discount band, quantity cap) phrases on
    // the RAW scan columns so all three reach PushedFilters (the
    // q181 rule — a round() wrapper would block the skip), and the
    // aggregation is a single partial/final pair over the surviving
    // rows with NO exchange beyond the 1-row final. The product sums
    // as DECIMAL(38,0) (cents × pct — revMicro's overflow rule); the
    // band compares raw doubles with identical literals both engines
    // (q01's precedent: fixture values are 2-decimal, both engines
    // read the same parquet doubles, so the comparisons agree).
    QueryDef(
      "q212_forecast_revenue",
      (s, d) => {
        val discMicro = (fxUnits(col("l_extendedprice"), 100)
          .cast("decimal(19,0)") *
          fxUnits(col("l_discount"), 100).cast("decimal(19,0)"))
          .cast("decimal(38,0)")
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= Q.ts("1997-01-01") &&
            col("l_shipdate") < Q.ts("1998-01-01") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(
            count(lit(1)).cast("long").as("n_lines"),
            sum(discMicro).as("rm"))
          .select(col("n_lines"),
            (col("rm").cast("double") / 10000.0).as("revenue"))
      },
      Some("""SELECT CAST(count(*) AS BIGINT) AS n_lines,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS HUGEINT) *
             |           CAST(round(l_discount*100) AS BIGINT)) AS DOUBLE)
             |    /10000.0 AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // ── q213: trade-graph TRIANGLE census — per nation over the
    // undirected simple support of the shipment graph: degree,
    // triangles through the node, and the local clustering
    // coefficient 2·tri/(deg·(deg−1)): the "are my partners also
    // partners" structure readout next to q204's rank and q208's
    // degree/balance profile (rank says who is central; clustering
    // says whether the neighborhood is a clique or a star). Exact and
    // hash-matched — `operators/Triangles`' degree orientation gives
    // every triangle exactly one two-out-edge apex. Plan shape: rides
    // the SHARED stamped/durable tradeEdges frame (the graph family's
    // one corpus collapse — third reader, still zero extra fact
    // scans); the orientation, wedge, and closure joins all run at
    // the ≤|nations|² edge grain here, AQE-broadcast — but the
    // operator's oriented out-degree is O(√m) on ANY graph, so the
    // SAME plan holds when the edges are corpus-scale (doc-similarity
    // graphs) where a naive neighbor-pair enumeration would emit
    // |corpus|² wedges from one hub; TrianglesSpec pins ≡ brute
    // force, and this query's spec additionally reconciles the
    // census against the operator on the live frame.
    QueryDef(
      "q213_triangle_census",
      (s, d) => {
        val e = Analytics3.tradeEdges(s, d)
        val stats = graft.operators.Triangles
          .perNode(e.select(col("src"), col("dst")))
          .withColumnRenamed("node", "nation")
        val nodes = e.select(col("src").as("nation"))
          .union(e.select(col("dst"))).distinct()
        nodes
          .join(stats, Seq("nation"), "left")
          .select(col("nation"),
            coalesce(col("deg"), lit(0L)).as("deg"),
            coalesce(col("tri"), lit(0L)).as("tri"))
          .withColumn("clustering",
            when(col("deg") >= 2,
              round(col("tri").cast("double") * 2.0 /
                (col("deg").cast("double") *
                  (col("deg").cast("double") - 1.0)), 6)))
          .orderBy(col("nation"))
      },
      Some(s"""WITH $TradeEdgesSql,
              |und AS (SELECT DISTINCT least(src, dst) AS a,
              |    greatest(src, dst) AS b
              |  FROM edges WHERE src <> dst),
              |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
              |  FROM und e1
              |  JOIN und e2 ON e2.a = e1.b
              |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
              |pern AS (SELECT nation, CAST(count(*) AS BIGINT) AS tri
              |  FROM (SELECT x AS nation FROM tri
              |    UNION ALL SELECT y FROM tri
              |    UNION ALL SELECT z FROM tri)
              |  GROUP BY nation),
              |deg AS (SELECT nation, CAST(count(*) AS BIGINT) AS deg
              |  FROM (SELECT a AS nation FROM und
              |    UNION ALL SELECT b FROM und)
              |  GROUP BY nation),
              |nodes AS (SELECT src AS nation FROM edges
              |  UNION SELECT dst FROM edges)
              |SELECT n.nation,
              |  coalesce(deg.deg, 0) AS deg,
              |  coalesce(pern.tri, 0) AS tri,
              |  CASE WHEN coalesce(deg.deg, 0) >= 2 THEN
              |    round(CAST(coalesce(pern.tri, 0) AS DOUBLE) * 2.0 /
              |      (CAST(deg.deg AS DOUBLE) * (CAST(deg.deg AS DOUBLE) - 1.0)),
              |      6) END AS clustering
              |FROM nodes n
              |LEFT JOIN deg ON deg.nation = n.nation
              |LEFT JOIN pern ON pern.nation = n.nation
              |ORDER BY n.nation""".stripMargin)),

    // ── q214: daily-revenue AUTOCORRELATION function — r_k for lags
    // 1..14 over the dense zero-filled daily order-revenue series
    // (q185's exact series definition): the readout an analyst runs
    // BEFORE q124/q185 to see whether weekly seasonality is even
    // there (r_7/r_14 spikes) and how fast momentum decays. Exact and
    // hash-matched: with S=Σx, Q2=Σx², and per lag C=Σx_t·x_{t+k},
    // A/B the head/tail sums, the numerator n²C − nS(A+B) + (n−k)S²
    // and denominator n²Q2 − nS² are INTEGER (DECIMAL(38,0) — cents ×
    // cents × n² stays under 10³⁸ for any real corpus; ANSI fails
    // loudly past it, decMoments' honest-bound rule), so r_k is one
    // mirrored double division. Plan shape: the corpus collapses to
    // the |days|-bounded daily frame in ONE exchange; the 14 leads
    // ride one window pass over that dimension-bounded spine (q185's
    // rule), all 3×14+3 sums land in ONE aggregate, and the lag rows
    // explode from the 1-row moment frame.
    QueryDef(
      "q214_revenue_acf",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val maxLag = 14
        val daily = t(s, d, "orders")
          .groupBy(to_date(col("o_orderdate")).as("dt"))
          .agg(sum(fxUnits(col("o_totalprice"), 100)).as("rev_c"))
        val cal = daily
          .agg(min(col("dt")).as("lo"), max(col("dt")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("dt"))
        val dense = cal.join(daily, Seq("dt"), "left")
          .select(col("dt"), coalesce(col("rev_c"), lit(0L)).as("x"))
        val w = Window.orderBy(col("dt"))
        val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(19,0)")
        val withLeads = (1 to maxLag).foldLeft(dense) { (df, k) =>
          df.withColumn(s"x$k", lead(col("x"), k).over(w))
        }
        val measures =
          Seq(count(lit(1)).cast("long").as("n"),
            sum(dec(col("x")).cast("decimal(38,0)")).as("s"),
            sum((dec(col("x")) * dec(col("x"))).cast("decimal(38,0)"))
              .as("q2")) ++
          (1 to maxLag).flatMap { k =>
            Seq(
              sum((dec(col("x")) * dec(col(s"x$k"))).cast("decimal(38,0)"))
                .as(s"c$k"),
              sum(when(col(s"x$k").isNotNull, dec(col("x")))
                .cast("decimal(38,0)")).as(s"a$k"),
              sum(dec(col(s"x$k")).cast("decimal(38,0)")).as(s"b$k"))
          }
        val mom = withLeads.agg(measures.head, measures.tail: _*)
        val lagRows = mom.select(
          col("n").cast("decimal(38,0)").as("n"),
          col("s"), col("q2"),
          explode(array((1 to maxLag).map { k =>
            struct(lit(k.toLong).as("lag"), col(s"c$k").as("c"),
              col(s"a$k").as("a"), col(s"b$k").as("b"))
          }: _*)).as("e"))
        lagRows.select(
          col("e.lag").as("lag"),
          (col("n").cast("long") - col("e.lag")).as("n_pairs"),
          (col("n") * col("n") * col("e.c") -
            col("n") * col("s") * (col("e.a") + col("e.b")) +
            (col("n") - col("e.lag").cast("decimal(38,0)")) *
              col("s") * col("s")).as("num"),
          (col("n") * col("n") * col("q2") -
            col("n") * col("s") * col("s")).as("den"))
          .select(col("lag"), col("n_pairs"),
            when(col("den") =!= 0,
              round(col("num").cast("double") / col("den").cast("double"),
                6)).as("acf"))
          .orderBy(col("lag"))
      },
      Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS dt,
             |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
             |      AS rev_c
             |  FROM orders GROUP BY dt),
             |cal AS (SELECT unnest(generate_series(
             |    (SELECT min(dt) FROM daily),
             |    (SELECT max(dt) FROM daily),
             |    INTERVAL 1 DAY))::DATE AS dt),
             |dense AS (SELECT cal.dt, coalesce(daily.rev_c, 0) AS x
             |  FROM cal LEFT JOIN daily ON cal.dt = daily.dt),
             |lags AS (SELECT unnest(generate_series(1, 14)) AS lag),
             |led AS (SELECT d.dt, d.x, l.lag,
             |    lead(d.x, l.lag) OVER (PARTITION BY l.lag ORDER BY d.dt)
             |      AS xk
             |  FROM dense d CROSS JOIN lags l),
             |mom AS (SELECT CAST(count(*) AS HUGEINT) AS n,
             |    sum(CAST(x AS HUGEINT)) AS s,
             |    sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q2
             |  FROM dense),
             |lm AS (SELECT lag,
             |    sum(CAST(x AS HUGEINT) * CAST(xk AS HUGEINT)) AS c,
             |    sum(CASE WHEN xk IS NOT NULL THEN CAST(x AS HUGEINT) END)
             |      AS a,
             |    sum(CAST(xk AS HUGEINT)) AS b
             |  FROM led GROUP BY lag)
             |SELECT CAST(lm.lag AS BIGINT) AS lag,
             |  CAST(mom.n - lm.lag AS BIGINT) AS n_pairs,
             |  CASE WHEN mom.n*mom.n*mom.q2 - mom.n*mom.s*mom.s <> 0 THEN
             |    round(CAST(mom.n*mom.n*lm.c - mom.n*mom.s*(lm.a + lm.b)
             |        + (mom.n - lm.lag)*mom.s*mom.s AS DOUBLE)
             |      / CAST(mom.n*mom.n*mom.q2 - mom.n*mom.s*mom.s AS DOUBLE),
             |      6) END AS acf
             |FROM lm CROSS JOIN mom
             |ORDER BY lag""".stripMargin)),

    // ── q215: trade REACHABILITY profile — per nation over the
    // directed shipment graph: reachable partner count, eccentricity
    // (max hops to any reachable partner), and mean hops — the
    // "how far is everyone" readout completing the graph family
    // (q204 rank, q208 balance, q213 closure). Exact and
    // hash-matched: BFS distances are a pure function of the edge
    // set (`operators/Bfs`), and the oracle recomputes them as a
    // recursive CTE whose walk is bounded by (src, dst, hops) dedup +
    // a hop cap above any possible diameter (|nations| is a fixed
    // dimension). Plan shape: rides the SHARED stamped tradeEdges
    // frame — fourth graph reader, still one corpus collapse for the
    // family; the BFS is O(|nations|·|edges|) driver work on the
    // bounded-collect edge list (q204's pattern); the distributed
    // face for non-collapsing graphs is the iterative frontier join
    // (Bfs scaladoc — DedupClusters' loop discipline).
    QueryDef(
      "q215_trade_reachability",
      (s, d) => {
        val e = Analytics3.tradeEdges(s, d)
        val es = e.collect().map(r => (r.getString(0), r.getString(1)))
        val hops = graft.operators.Bfs.allPairsHops(es.toSeq)
        val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
        import s.implicits._
        val rows = nodes.map { n =>
          val out = hops.collect { case ((`n`, _), h) => h }
          (n, out.size.toLong,
            if (out.isEmpty) 0L else out.max.toLong,
            out.map(_.toLong).sum)
        }.toSeq
        rows.toDF("nation", "n_reach", "ecc", "hop_mass")
          .select(col("nation"), col("n_reach"), col("ecc"),
            when(col("n_reach") > 0,
              round(col("hop_mass").cast("double") /
                col("n_reach").cast("double"), 6)).as("mean_hops"))
          .orderBy(col("nation"))
      },
      Some {
        // UNROLLED k-hop closure, q204's generated-CTE pattern — NOT
        // WITH RECURSIVE: DuckDB 1.0.0 re-evaluates non-recursive
        // CTEs referenced under a WITH RECURSIVE header once per
        // iteration (nodes came back 20×, best 35× — measured), so a
        // recursive walk oracle silently multiplies its own
        // aggregates. hop_k = distinct endpoints of length-k WALKS
        // (revisits allowed — a pair first reachable at distance k
        // always has a k-walk, and longer walks lose the min());
        // k caps at |nations|−1 = 24, the longest possible shortest
        // path over the FIXED 25-nation dimension.
        // AS MATERIALIZED throughout: DuckDB inlines multiply- and
        // chain-referenced CTEs, re-running the corpus joins once per
        // unrolled level (13 s at sf0.001 inlined, 2 s at sf0.01
        // materialized — measured)
        val maxK = 24
        val hopCtes = (2 to maxK).map { k =>
          s"""hop$k AS MATERIALIZED (SELECT DISTINCT c.src, e.dst
             |  FROM hop${k - 1} c JOIN dedges e ON e.src = c.dst)"""
            .stripMargin
        }.mkString(",\n")
        val unionAll = (1 to maxK)
          .map(k => s"SELECT src, dst, $k AS hops FROM hop$k")
          .mkString("\n    UNION ALL ")
        s"""WITH ${TradeEdgesSql
             .replace("edges AS (", "edges AS MATERIALIZED (")},
           |dedges AS MATERIALIZED (SELECT DISTINCT src, dst FROM edges
           |  WHERE src <> dst),
           |hop1 AS (SELECT src, dst FROM dedges),
           |$hopCtes,
           |best AS (SELECT src, dst, min(hops) AS hops
           |  FROM ($unionAll)
           |  WHERE dst <> src GROUP BY src, dst),
           |prof AS (SELECT src,
           |    CAST(count(*) AS BIGINT) AS n_reach,
           |    CAST(max(hops) AS BIGINT) AS ecc,
           |    CAST(sum(hops) AS BIGINT) AS hop_mass
           |  FROM best GROUP BY src),
           |nodes AS (SELECT src AS nation FROM edges
           |  UNION SELECT dst FROM edges)
           |SELECT n.nation,
           |  coalesce(p.n_reach, 0) AS n_reach,
           |  coalesce(p.ecc, 0) AS ecc,
           |  CASE WHEN p.n_reach > 0 THEN
           |    round(CAST(p.hop_mass AS DOUBLE) / CAST(p.n_reach AS DOUBLE),
           |      6) END AS mean_hops
           |FROM nodes n LEFT JOIN prof p ON p.src = n.nation
           |ORDER BY n.nation""".stripMargin
      }),

    // ── q216: exact two-sample Kolmogorov–Smirnov DRIFT statistic —
    // D = max |F₁(v) − F₂(v)| between the 1996 and 1997 order-value
    // distributions, with the value attaining it: the
    // distribution-level drift test next to the binned family (q156
    // PSI, q108 JS, q92 TV need a bin choice; KS is bin-free and
    // catches shape drift the bins smooth away). Exact and
    // hash-matched: the CDF difference is cross-multiplied to the
    // integer |K₁·n₂ − K₂·n₁| (DECIMAL(38,0)/HUGEINT — cum×total
    // crosses 2⁶³ far below 100 TB), so the argmax is an integer
    // comparison and D derives in one mirrored double step. Plan
    // shape: the corpus collapses to the distinct-value grain in ONE
    // exchange (both samples' counts as conditional sums — no
    // union/pivot); both CDFs ride ONE [[Q.globalCumBeforeN]]
    // range-repartition pass (the q50/q193 two-pass discipline — a
    // value-ordered cumsum window would funnel the corpus through a
    // single partition); the argmax is TakeOrdered(1); the totals
    // come from the cumsum's own bounded collect, never a second
    // corpus aggregate.
    QueryDef(
      "q216_ks_drift",
      (s, d) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= Q.ts("1996-01-01") &&
            col("o_orderdate") < Q.ts("1998-01-01"))
          .select(
            (col("o_orderdate") < Q.ts("1997-01-01")).as("is1"),
            fxUnits(col("o_totalprice"), 100).as("v"))
        val per = o.groupBy(col("v"))
          .agg(sum(when(col("is1"), 1L).otherwise(0L)).as("c1"),
            sum(when(!col("is1"), 1L).otherwise(0L)).as("c2"))
        val (cum, totals) =
          Q.globalCumBeforeN(per, Seq(col("v")), Seq("c1", "c2"))
        val (n1, n2) = (totals.head, totals(1))
        cum
          .select(col("v"),
            abs((col("cum_before_c1") + col("c1")).cast("decimal(38,0)") *
              lit(n2) -
              (col("cum_before_c2") + col("c2")).cast("decimal(38,0)") *
                lit(n1)).as("diff"))
          .orderBy(col("diff").desc, col("v"))
          .limit(1)
          .select(lit(n1).as("n1"), lit(n2).as("n2"),
            (col("v").cast("double") / 100.0).as("at_value"),
            round(col("diff").cast("double") /
              (lit(n1).cast("double") * lit(n2).cast("double")), 6)
              .as("d_stat"))
      },
      Some("""WITH o AS (SELECT
             |    (o_orderdate < TIMESTAMP '1997-01-01') AS is1,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS v
             |  FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1998-01-01'),
             |per AS (SELECT v,
             |    sum(CASE WHEN is1 THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN is1 THEN 0 ELSE 1 END) AS c2
             |  FROM o GROUP BY v),
             |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
             |    CAST(sum(c2) AS BIGINT) AS n2 FROM per),
             |cum AS (SELECT v,
             |    sum(c1) OVER (ORDER BY v) AS k1,
             |    sum(c2) OVER (ORDER BY v) AS k2
             |  FROM per),
             |d AS (SELECT v,
             |    abs(CAST(k1 AS HUGEINT)*n2 - CAST(k2 AS HUGEINT)*n1)
             |      AS diff
             |  FROM cum CROSS JOIN tot
             |  ORDER BY diff DESC, v LIMIT 1)
             |SELECT tot.n1, tot.n2,
             |  CAST(d.v AS DOUBLE)/100.0 AS at_value,
             |  round(CAST(d.diff AS DOUBLE)
             |    /(CAST(tot.n1 AS DOUBLE)*CAST(tot.n2 AS DOUBLE)), 6)
             |    AS d_stat
             |FROM d CROSS JOIN tot""".stripMargin)),

    // ── q217: priority backlog audit (TPC-H Q4 analog) — per order
    // priority over one quarter's orders: how many had at least ONE
    // line shipped more than 60 days after the order date (EXISTS at
    // order grain — each order counts once no matter how many lines
    // ran late; q174 is the same domain at LINE grain). The fixture
    // has no commit/receipt dates, so "late" re-bases on the
    // ship-vs-order delay q170/q174 already use. Plan shape: the
    // date-pruned quarter of orders BROADCASTS into the one fact
    // scan (the corpus side never shuffles — an order-keyed
    // lineitem⋈orders exchange would move the whole fact table for a
    // 1/24 order slice); the EXISTS dedups at the bounded late-key
    // grain; the final rollup is |priorities| rows. Counts exact
    // longs, the share one mirrored rounded division.
    QueryDef(
      "q217_priority_backlog",
      (s, d) => {
        val o = t(s, d, "orders")
          .filter(col("o_orderdate") >= Q.ts("1996-01-01") &&
            col("o_orderdate") < Q.ts("1996-04-01"))
          .select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority"))
        val lateKeys = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
          .join(broadcast(o.select(col("o_orderkey"), col("o_orderdate"))),
            col("l_orderkey") === col("o_orderkey") &&
              datediff(col("l_shipdate"), col("o_orderdate")) > 60)
          .select(col("o_orderkey")).distinct()
        o.join(lateKeys.withColumn("late", lit(1L)), Seq("o_orderkey"),
            "left")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(coalesce(col("late"), lit(0L))).cast("long").as("n_late"))
          .select(col("o_orderpriority"), col("n_orders"), col("n_late"),
            round(col("n_late").cast("double") /
              col("n_orders").cast("double"), 6).as("late_share"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_orderdate, o_orderpriority
             |  FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |    AND o_orderdate < TIMESTAMP '1996-04-01'),
             |lk AS (SELECT DISTINCT o.o_orderkey
             |  FROM lineitem l JOIN o ON l.l_orderkey = o.o_orderkey
             |  WHERE datediff('day', o.o_orderdate, l.l_shipdate) > 60)
             |SELECT o_orderpriority,
             |  CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(sum(CASE WHEN lk.o_orderkey IS NOT NULL THEN 1 ELSE 0
             |    END) AS BIGINT) AS n_late,
             |  round(CAST(sum(CASE WHEN lk.o_orderkey IS NOT NULL THEN 1
             |      ELSE 0 END) AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |    AS late_share
             |FROM o LEFT JOIN lk ON o.o_orderkey = lk.o_orderkey
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ── q218: important parts (TPC-H Q11 analog) — the parts whose
    // revenue supplied by ONE nation's suppliers exceeds TWICE the
    // mean per-part share of that nation's total: the HAVING-over-
    // global-fraction shape (q49 exercises the scalar compare, q168
    // the scalar × anti-join compose; this is the grouped-sum-vs-
    // global cut). The fixture has no partsupp, so "supplied value"
    // re-bases on delivered discounted revenue (revMicro); and where
    // TPC-H hand-scales Q11's fraction by 1/SF so the cut stays
    // meaningful as the corpus grows, the mean-relative form is
    // SELF-scaling — a fixed 0.1% returned 175/191 parts at sf0.001
    // and 0/11695 at sf0.1 (measured), while 2×mean keeps a strict
    // non-empty subset at every scale (the MinerRelativeHot lesson:
    // corpus-relative thresholds, never absolute ones). Exactness:
    // the CUT cross-multiplies in DECIMAL(38,0) — vm·n > 2·total
    // with n the part count from the same 1-row frame — never
    // comparing a double share against a double threshold (q168's
    // rule); the displayed value/share derive in mirrored single
    // divisions, and the sort key `value` is the exact integer vm's
    // monotone image (collisions need vm > 2⁵³ micro ≈ $10¹¹ on one
    // part — flagged, not possible at any real corpus). Plan shape:
    // the nation's supplier keys BROADCAST into the one fact scan
    // (semi-join, no fact shuffle); the part-grain aggregate takes
    // the one exchange; the 1-row (total, n) frame broadcasts back
    // over the PART-grain frame (q49/q127 scalar shape,
    // BNLJ-allowlisted) — the second pass over the pruned slice is
    // the price of the self-referential threshold, both passes
    // map-side-combined.
    QueryDef(
      "q218_important_parts",
      (s, d) => {
        val sup = t(s, d, "supplier")
          .join(broadcast(t(s, d, "nation")
            .filter(col("n_name") === "NATION_8")
            .select(col("n_nationkey"))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val perPart = t(s, d, "lineitem")
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"),
            "left_semi")
          .groupBy(col("l_partkey"))
          .agg(sum(revMicro).as("vm"))
        val tot = perPart.agg(sum(col("vm")).as("tot"),
          count(lit(1)).cast("decimal(38,0)").as("n_parts"))
        perPart.crossJoin(broadcast(tot))
          .filter(col("vm") * col("n_parts") > col("tot") * lit(2))
          .select(col("l_partkey").as("p_partkey"),
            (col("vm").cast("double") / 10000.0).as("value"),
            round(lit(100.0) * col("vm").cast("double") /
              col("tot").cast("double"), 6).as("share_pct"))
          .orderBy(col("value").desc, col("p_partkey"))
      },
      Some(s"""WITH sup AS (SELECT s_suppkey FROM supplier
              |  JOIN nation ON s_nationkey = n_nationkey
              |  WHERE n_name = 'NATION_8'),
              |pp AS (SELECT l_partkey, sum($revMicroSql) AS vm
              |  FROM lineitem
              |  WHERE l_suppkey IN (SELECT s_suppkey FROM sup)
              |  GROUP BY l_partkey),
              |tot AS (SELECT sum(vm) AS tot,
              |    CAST(count(*) AS HUGEINT) AS n_parts FROM pp)
              |SELECT l_partkey AS p_partkey,
              |  CAST(vm AS DOUBLE)/10000.0 AS value,
              |  round(100.0*CAST(vm AS DOUBLE)/CAST(tot AS DOUBLE), 6)
              |    AS share_pct
              |FROM pp CROSS JOIN tot
              |WHERE vm * n_parts > tot * 2
              |ORDER BY value DESC, p_partkey""".stripMargin)),

    // ── q219: LINEAR multi-touch attribution — every purchase splits
    // one unit of conversion credit equally across the user's
    // non-purchase touches in the 7 days before it; per channel
    // (event type): conversions touched, touch count, total credit.
    // The fractional-fan-in sibling of q152's first-touch (winner
    // takes all) and q126's latency (time, not credit): the report a
    // growth analyst runs to stop over-crediting the last click.
    // Exactness: credit is DEFINED in integer micro-credits —
    // floor(10⁶·tᵢ/nᵢ) per (conversion, channel), integer `div` both
    // engines — because a Σ(tᵢ/nᵢ) of doubles hash-diverges on
    // accumulation order (the fxSum lesson applied to fractions: when
    // the exact rational sum has no common denominator, fix the
    // quantum instead); the display credit is the one mirrored
    // division. Conversions with NO in-window touch simply don't
    // appear in the fan-in (documented: unattributed, not
    // zero-credited). Plan shape: ONE user-keyed exchange joins the
    // purchase slice to the touch slice (equi-join on user, the
    // ±window as a residual range predicate — never a time-keyed
    // BNLJ); fanout is per-user activity-bounded, AQE-skew-eligible
    // for hot users; the (conversion, channel) and conversion-grain
    // aggregates reuse the conv_id key; final rollup is |types| rows.
    //
    // Worst-case bound (r9): the join intermediate is
    // Θ(Σ_u purchases_u × touches_u) — linear when the corpus grows
    // by USERS (probed: 10× users ⇒ 3.97×, Profile.scala), but a
    // single pathological user (a bot with 10⁹ touches) still owns a
    // quadratic cell. The cap turns that cell linear: only each
    // user's [[Q219TouchCap]] most RECENT touches (total order
    // (us, event_id) desc — deterministic) enter the join, and the
    // output's `n_capped_users` column reports exactly how many
    // users hit the bound, so a truncated report NAMES its own
    // truncation instead of silently under-crediting. At the cap's
    // 10k default no fixture user is capped (max observed 80/user at
    // sf0.1), so the capped form is spec-proved ≡ uncapped and the
    // oracle hash is unchanged in distribution; the per-user
    // row_number window is itself per-user-bounded work (linear in
    // the hot user's touches — the price that replaces the quadratic
    // join cell).
    QueryDef(
      "q219_linear_attribution",
      (s, d) => linearAttribution(s, d, Q219TouchCap),
      Some(s"""WITH ev AS (SELECT event_id, user_id, event_type,
             |    epoch_us(ts) AS us FROM events),
             |p AS (SELECT event_id AS conv_id, user_id, us AS cus
             |  FROM ev WHERE event_type = 'purchase'),
             |tr AS (SELECT user_id, event_type, us,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY us DESC, event_id DESC) AS rn
             |  FROM ev WHERE event_type <> 'purchase'),
             |tc AS (SELECT user_id, event_type, us FROM tr
             |  WHERE rn <= $Q219TouchCap),
             |cap AS (SELECT CAST(count(*) AS BIGINT) AS n_capped_users
             |  FROM (SELECT user_id FROM ev
             |    WHERE event_type <> 'purchase'
             |    GROUP BY 1 HAVING count(*) > $Q219TouchCap) cu),
             |pt AS (SELECT p.conv_id, tc.event_type,
             |    CAST(count(*) AS BIGINT) AS t_cnt
             |  FROM p JOIN tc ON p.user_id = tc.user_id
             |    AND tc.us < p.cus AND tc.us >= p.cus - 604800000000
             |  GROUP BY 1, 2),
             |n AS (SELECT conv_id, sum(t_cnt) AS n_touch
             |  FROM pt GROUP BY 1)
             |SELECT pt.event_type,
             |  CAST(count(*) AS BIGINT) AS n_conversions,
             |  CAST(sum(pt.t_cnt) AS BIGINT) AS n_touches,
             |  CAST(sum((1000000 * pt.t_cnt) // n.n_touch) AS BIGINT)
             |    AS credit_e6,
             |  round(CAST(sum((1000000 * pt.t_cnt) // n.n_touch)
             |    AS DOUBLE)/1000000.0, 6) AS credit,
             |  cap.n_capped_users
             |FROM pt JOIN n USING (conv_id) CROSS JOIN cap
             |GROUP BY pt.event_type, cap.n_capped_users
             |ORDER BY credit_e6 DESC, event_type""".stripMargin)),

    // ── q220: corpus NOVELTY curve — split the ingest stream (doc_id
    // is delivery order) into ten tranches and report, per tranche,
    // how many documents are the FIRST occurrence of their exact-dup
    // family (q22's md5(lower(text)) fingerprint — one convention for
    // exact identity everywhere): the "is the crawl saturating"
    // readout a curator checks before paying for the next tranche —
    // novelty that decays toward zero says new deliveries are re-
    // crawls (q70 measures n-gram novelty BETWEEN two fixed corpora;
    // this is the within-stream time series of exact novelty).
    // Exactness: a doc is novel iff its doc_id equals its family's
    // min doc_id (first occurrence counts as novel even when the
    // duplicate lands in the same tranche — the standard convention);
    // counts are longs, the rate one mirrored rounded division; the
    // tranche id is integer `div` against the 1-row max-id frame
    // (never double-bucketed). Plan shape: one text scan computes the
    // fingerprint; the family min is one fp-keyed exchange and the
    // join-back reuses the same key (co-partitioned); the 1-row max
    // broadcasts (q49/q127 scalar shape, BNLJ-allowlisted); the final
    // rollup is 10 rows. Text never shuffles — only (doc_id, fp).
    QueryDef(
      "q220_novelty_curve",
      (s, d) => {
        // ONE text scan: collapse to the (fp, tranche) grain (tranche
        // is a pure function of doc_id once the 1-row max broadcasts
        // in — a thin doc_id-only branch, no text), then to the fp
        // grain carrying the per-tranche counts as a list bounded by
        // the 10 tranches. A family's novel doc is exactly its
        // first_id's tranche, and that (fp, tranche) row always
        // exists, so the exploded rollup reproduces the former
        // doc-grain join exactly. The former first-per-family +
        // join-back planned the md5(text) scan twice (the r12 q305
        // duplicated-subtree class).
        val mx = t(s, d, "documents").agg(max(col("doc_id")).as("mx"))
        t(s, d, "documents")
          .select(col("doc_id"), md5(lower(col("text"))).as("fp"))
          .crossJoin(broadcast(mx))
          .groupBy(col("fp"), expr("(10 * doc_id) div (mx + 1)").as("tranche"))
          .agg(count(lit(1)).cast("long").as("n"),
            min(col("doc_id")).as("min_id"), max(col("mx")).as("mxc"))
          .groupBy(col("fp"))
          .agg(min(col("min_id")).as("first_id"), max(col("mxc")).as("mxx"),
            collect_list(struct(col("tranche"), col("n"))).as("per_tr"))
          .select(col("first_id"), col("mxx"), explode(col("per_tr")).as("e"))
          .groupBy(col("e.tranche").as("tranche"))
          .agg(sum(col("e.n")).cast("long").as("n_docs"),
            count(when(col("e.tranche") ===
              expr("(10 * first_id) div (mxx + 1)"), 1))
              .cast("long").as("n_novel"))
          .select(col("tranche"), col("n_docs"), col("n_novel"),
            round(col("n_novel").cast("double") /
              col("n_docs").cast("double"), 6).as("novelty_rate"))
          .orderBy(col("tranche"))
      },
      Some("""WITH f AS (SELECT doc_id, md5(lower(text)) AS fp
             |  FROM documents),
             |mx AS (SELECT max(doc_id) AS mx FROM f),
             |fs AS (SELECT fp, min(doc_id) AS first_id
             |  FROM f GROUP BY fp)
             |SELECT CAST((10 * f.doc_id) // (mx.mx + 1) AS BIGINT)
             |    AS tranche,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(CASE WHEN f.doc_id = fs.first_id THEN 1 ELSE 0
             |    END) AS BIGINT) AS n_novel,
             |  round(CAST(sum(CASE WHEN f.doc_id = fs.first_id THEN 1
             |      ELSE 0 END) AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |    AS novelty_rate
             |FROM f JOIN fs USING (fp) CROSS JOIN mx
             |GROUP BY 1 ORDER BY tranche""".stripMargin)),

    // ── q221: ABC inventory classification — every part assigned to
    // revenue class A/B/C by its position on the descending
    // cumulative-revenue curve (A = the head covering the first 80%
    // of corpus revenue, B = to 95%, C = the tail), reported as the
    // 3-row class profile: the warehouse planner's classic 80/15/5
    // cut (q127 reads the same curve as a top-20 customer LIMIT; q120
    // as a duplication coverage curve; this CLASSIFIES the full part
    // population). Exactness: revenue fixes at CENTS per part (micro
    // would cross 2⁶³ in the global running sum at 100 TB — the
    // per-part quantum is floor(vm/10⁴), mirrored); the class cut
    // cross-multiplies integers — A iff 5·cum_before < 4·total, B iff
    // 20·cum_before < 19·total (cum_before EXCLUSIVE, so the part
    // that crosses a boundary stays in the class where it STARTS —
    // class A therefore always covers at least 80% of revenue:
    // ties impossible to misclassify, never double-vs-double); share
    // one mirrored division. Plan shape: one fact exchange to part
    // grain; the descending global cumsum is `Q.globalCumBefore`
    // (range-repartition + partition-local running sum + ≤P broadcast
    // offsets — the q50/q90/q193 two-pass family, NO corpus-wide
    // window); total comes from the same bounded collect; final
    // rollup 3 rows.
    QueryDef(
      "q221_abc_classes",
      (s, d) => {
        val perPart = t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(revMicro).as("vm"))
          .select(col("l_partkey"),
            expr("CAST(vm div 10000 AS BIGINT)").as("rev_cents"))
        val (cum, total) = Q.globalCumBefore(perPart,
          Seq(col("rev_cents").desc, col("l_partkey")), "rev_cents")
        cum
          .select(col("rev_cents"),
            when(col("cum_before") * 5 < lit(total) * 4, "A")
              .when(col("cum_before") * 20 < lit(total) * 19, "B")
              .otherwise("C").as("abc_class"))
          .groupBy(col("abc_class"))
          .agg(count(lit(1)).cast("long").as("n_parts"),
            sum(col("rev_cents")).cast("long").as("rev_cents"))
          .select(col("abc_class"), col("n_parts"), col("rev_cents"),
            round(col("rev_cents").cast("double") / total.toDouble, 6)
              .as("rev_share"))
          .orderBy(col("abc_class"))
      },
      Some(s"""WITH pp AS (SELECT l_partkey,
              |    CAST((sum($revMicroSql)) // 10000 AS BIGINT)
              |      AS rev_cents
              |  FROM lineitem GROUP BY l_partkey),
              |c AS (SELECT rev_cents,
              |    CAST(coalesce(sum(rev_cents) OVER (
              |      ORDER BY rev_cents DESC, l_partkey
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              |      0) AS BIGINT) AS cum_before,
              |    CAST(sum(rev_cents) OVER () AS BIGINT) AS total
              |  FROM pp),
              |k AS (SELECT rev_cents,
              |    CASE WHEN cum_before * 5 < total * 4 THEN 'A'
              |         WHEN cum_before * 20 < total * 19 THEN 'B'
              |         ELSE 'C' END AS abc_class,
              |    total FROM c)
              |SELECT abc_class,
              |  CAST(count(*) AS BIGINT) AS n_parts,
              |  CAST(sum(rev_cents) AS BIGINT) AS rev_cents,
              |  round(CAST(sum(rev_cents) AS DOUBLE)
              |    /CAST(max(total) AS DOUBLE), 6) AS rev_share
              |FROM k GROUP BY abc_class ORDER BY abc_class""".stripMargin)),

    // ── q222: engagement STICKINESS — per absolute week (epoch-day
    // div 7, the same deterministic calendar both engines): active
    // days, Σ of daily distinct users (DAU mass), weekly distinct
    // users (WAU), and stickiness = DAU_sum/(7·WAU) — the DAU/WAU
    // ratio a growth team tracks weekly (q106 densifies daily VOLUME,
    // q130 measures per-user streaks; this is the population-level
    // habit readout). Convention: the divisor is the 7-day CALENDAR
    // week — silent days count zero (q106's lesson), so edge weeks
    // read honestly low rather than silently inflating. Exactness:
    // both numerator and denominator are exact distinct counts; the
    // ratio is one mirrored rounded division. Plan shape: the corpus
    // collapses ONCE to the distinct (day, user) grain (one
    // exchange); the daily and weekly rollups both ride that bounded
    // frame (the weekly re-distinct runs at (week, user) grain, far
    // below corpus); the week join is dimension-grain.
    QueryDef(
      "q222_stickiness",
      (s, d) => {
        // ONE pass after the (day, user) dedup: collapse to the
        // (week, user) grain carrying the user's active-day count AND
        // a 7-bit day-of-week mask (days within a week are ≤ 7, and
        // after the distinct each day is one bit, so sum of masks IS
        // the bitwise OR); the week rollup then reads wau as row
        // count, dau_sum as Σ per-user days, and days_active as the
        // popcount of the OR'd masks. The former daily + weekly
        // frames were two plan branches whose exchanges Spark could
        // not reuse (the r12 q305 duplicated-subtree class), scanning
        // events twice — and the weekly countDistinct is gone with
        // them (no Expand risk).
        t(s, d, "events")
          .select(datediff(col("ts").cast("date"), lit("1970-01-01")
            .cast("date")).cast("long").as("day"), col("user_id"))
          .distinct()
          .groupBy(expr("day div 7").as("week"), col("user_id"))
          .agg(count(lit(1)).cast("long").as("ud"),
            sum(expr("shiftleft(1L, CAST(day % 7 AS INT))"))
              .cast("long").as("um"))
          .groupBy(col("week"))
          .agg(expr("bit_count(bit_or(um))").cast("long").as("days_active"),
            sum(col("ud")).cast("long").as("dau_sum"),
            count(lit(1)).cast("long").as("wau"))
          .select(col("week"), col("days_active"), col("dau_sum"),
            col("wau"),
            round(col("dau_sum").cast("double") /
              (col("wau").cast("double") * 7.0), 6).as("stickiness"))
          .orderBy(col("week"))
      },
      Some("""WITH du AS (SELECT DISTINCT
             |    CAST(datediff('day', DATE '1970-01-01',
             |      CAST(ts AS DATE)) AS BIGINT) AS day, user_id
             |  FROM events),
             |dw AS (SELECT day // 7 AS week, day, user_id FROM du),
             |daily AS (SELECT week, day,
             |    CAST(count(*) AS BIGINT) AS dau
             |  FROM dw GROUP BY 1, 2),
             |weekly AS (SELECT week,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS wau
             |  FROM dw GROUP BY 1)
             |SELECT daily.week,
             |  CAST(count(*) AS BIGINT) AS days_active,
             |  CAST(sum(dau) AS BIGINT) AS dau_sum,
             |  max(wau) AS wau,
             |  round(CAST(sum(dau) AS DOUBLE)
             |    /(CAST(max(wau) AS DOUBLE) * 7.0), 6) AS stickiness
             |FROM daily JOIN weekly ON daily.week = weekly.week
             |GROUP BY daily.week ORDER BY daily.week""".stripMargin)),

    // ── q225: weekly RETENTION cohort matrix (r9) — users grouped by
    // the absolute week of their FIRST event (epoch-day div 7, the
    // q222 calendar); for each cohort and offset k = 0..7, the
    // distinct users active in week cohort+k and the retention rate:
    // the triangle chart every growth review opens (q152 cohorts by
    // first-event TYPE, q222 reads population stickiness, q130
    // per-user streaks — this is the cohort×time matrix). k = 0 is
    // the cohort week itself (rate 1 by construction — kept: the
    // anchor row proves the denominator). Offsets beyond 7 weeks are
    // out of the report's window and dropped, bounding the output at
    // |weeks|×8. Exactness: distinct counts are exact, the rate is
    // one mirrored rounded division.
    //
    // Scale shape: the corpus collapses ONCE to the distinct
    // (user, week) grain (one exchange — q222's frame); the
    // first-week rollup and the join-back both key on user_id
    // (co-partitioned, no second corpus exchange); the final agg is
    // (cohort, k) grain, ≤ |weeks|×8 rows. No corpus self-join.
    QueryDef(
      "q225_retention_cohorts",
      (s, d) => {
        val uw = t(s, d, "events")
          .select(col("user_id"),
            datediff(col("ts").cast("date"),
              lit("1970-01-01").cast("date")).cast("long").as("day"))
          // integer `div`, never `/` (Divide is DOUBLE division)
          .select(col("user_id"), expr("day div 7").as("week"))
          .distinct()
        val first = uw.groupBy(col("user_id"))
          .agg(min(col("week")).as("cohort"))
        val act = uw.join(first, Seq("user_id"))
          .filter(col("week") - col("cohort") <= 7L)
          .groupBy(col("cohort"), (col("week") - col("cohort")).as("k"))
          .agg(count(lit(1)).cast("long").as("n_active"))
        val cs = first.groupBy(col("cohort"))
          .agg(count(lit(1)).cast("long").as("n_cohort"))
        act.join(cs, Seq("cohort"))
          .select(col("cohort"), col("k"), col("n_cohort"),
            col("n_active"),
            round(col("n_active").cast("double") /
              col("n_cohort").cast("double"), 6).as("rate"))
          .orderBy(col("cohort"), col("k"))
      },
      Some("""WITH uw AS (SELECT DISTINCT user_id,
             |    CAST(datediff('day', DATE '1970-01-01',
             |      CAST(ts AS DATE)) AS BIGINT) // 7 AS week
             |  FROM events),
             |f AS (SELECT user_id, min(week) AS cohort
             |  FROM uw GROUP BY 1),
             |act AS (SELECT cohort, week - cohort AS k,
             |    CAST(count(*) AS BIGINT) AS n_active
             |  FROM uw JOIN f USING (user_id)
             |  WHERE week - cohort <= 7 GROUP BY 1, 2),
             |cs AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort
             |  FROM f GROUP BY 1)
             |SELECT cohort, k, n_cohort, n_active,
             |  round(CAST(n_active AS DOUBLE)/CAST(n_cohort AS DOUBLE), 6)
             |    AS rate
             |FROM act JOIN cs USING (cohort) ORDER BY cohort, k""".stripMargin))
  )
}
