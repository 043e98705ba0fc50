package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Relational core — scans, projections, set ops, joins, aggregates,
  * windows, rollup (SURVEY.md §2.3 q01–q21).
  *
  * Each query generalizes a reference behavior (cited per-query from
  * `Batch Processor.py` and the lisp stage scripts) into the idiomatic
  * shape; Catalyst supplies pushdown, pruning, join selection, partial
  * aggregation and AQE (SURVEY.md §4.2) — nothing here is hand-scheduled.
  *
  * Scale notes (100 TB design points) are on each query: small dims are
  * broadcast explicitly, aggregates are map-side-combinable, top-k uses
  * TakeOrderedAndProject rather than a global sort.
  */
object Relational {
  import Q._

  /** Calendar-densified daily event counts, optionally per key — the
    * ONE densify definition behind q106 (series), q112 (changepoint
    * flanks) and q129 (per-type movers): a day with no events is an
    * explicit ZERO row (a silent outage day is exactly the day worth
    * looking at), and the day dimension GENERATES from the observed
    * span (`explode(sequence)`) — never a day×day join (q61's rule).
    * The keyed form crosses the ≤ handful-of-rows key dimension with
    * the generated calendar — both sides dimension-bounded.
    */
  private def denseDaily(
      s: SparkSession, d: String,
      keyCol: Option[String] = None): DataFrame = {
    val ev = t(s, d, "events")
    val daily = keyCol
      .fold(ev.groupBy(to_date(col("ts")).as("day")))(k =>
        ev.groupBy(col(k), to_date(col("ts")).as("day")))
      .agg(count(lit(1)).cast("long").as("cnt"))
    val days = daily
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    keyCol match {
      case None =>
        days.join(daily, Seq("day"), "left")
          .select(col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      case Some(k) =>
        daily.select(col(k)).distinct()
          .crossJoin(broadcast(days))
          .join(daily, Seq(k, "day"), "left")
          .select(col(k), col("day"),
            coalesce(col("cnt"), lit(0L)).as("cnt"))
    }
  }

  /** Oracle twin of [[denseDaily]]: the `daily`/`span`/`days`/`dense`
    * CTE chain (callers read from `dense(day[, key], cnt)`).
    */
  private def denseDailySql(keyCol: Option[String] = None): String =
    keyCol match {
      case None =>
        """daily AS (SELECT CAST(ts AS DATE) AS day,
          |    CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
          |span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
          |days AS (SELECT CAST(unnest(generate_series(lo, hi,
          |    INTERVAL 1 DAY)) AS DATE) AS day FROM span),
          |dense AS (SELECT days.day AS day, coalesce(cnt, 0) AS cnt
          |  FROM days LEFT JOIN daily USING (day))""".stripMargin
      case Some(k) =>
        s"""daily AS (SELECT $k, CAST(ts AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) AS cnt
           |  FROM events GROUP BY 1, 2),
           |span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
           |days AS (SELECT CAST(unnest(generate_series(lo, hi,
           |    INTERVAL 1 DAY)) AS DATE) AS day FROM span),
           |dense AS (SELECT t.$k, days.day AS day,
           |    coalesce(cnt, 0) AS cnt
           |  FROM (SELECT DISTINCT $k FROM daily) t
           |  CROSS JOIN days
           |  LEFT JOIN daily ON daily.$k = t.$k
           |    AND daily.day = days.day)""".stripMargin
    }

  val defs: Seq[QueryDef] = Seq(

    // ── q01: scan + predicate filter (ref: drop_files suffix predicate
    // `Batch Processor.py:240`, case-insensitive scan `:58`). All three
    // predicates push into the parquet scan (PushedFilters).
    QueryDef(
      "q01_scan_filter",
      (s, d) => {
        t(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1997-01-01") &&
            col("l_shipdate") < ts("1998-01-01") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            col("l_extendedprice"), day(col("l_shipdate")).as("ship_day"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             |  strftime(l_shipdate, '%Y-%m-%d') AS ship_day
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ── q02: projection / column pruning (ref: enabled-stage path
    // projection `Batch Processor.py:304`). ReadSchema must show only the
    // three source columns.
    QueryDef(
      "q02_project_prune",
      (s, d) => {
        t(s, d, "orders")
          .select(col("o_orderkey"),
            day(col("o_orderdate")).as("order_day"), col("o_totalprice"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
             |  o_totalprice
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // ── q03: distinct (ref: exact corpus dedup `Batch Processor.py:231`).
    // Planned as a partial+final hash aggregate on the key — map-side
    // combine keeps the shuffle at |distinct users|, not |events|.
    QueryDef(
      "q03_distinct",
      (s, d) => t(s, d, "events").select(col("user_id")).distinct()
        .orderBy(col("user_id")),
      Some("SELECT DISTINCT user_id FROM events ORDER BY user_id")),

    // ── q04: union + dedup (ref: two ingest paths merged with dedup,
    // `Batch Processor.py:228-244`).
    QueryDef(
      "q04_union_dedup",
      (s, d) => {
        val e = t(s, d, "events")
        val clicks = e.filter(col("event_type") === "click").select(col("user_id"))
        val buys = e.filter(col("event_type") === "purchase").select(col("user_id"))
        clicks.union(buys).dropDuplicates("user_id").orderBy(col("user_id"))
      },
      Some("""SELECT DISTINCT user_id FROM (
             |  SELECT user_id FROM events WHERE event_type = 'click'
             |  UNION ALL
             |  SELECT user_id FROM events WHERE event_type = 'purchase')
             |ORDER BY user_id""".stripMargin)),

    // ── q05: left anti join (ref: delete-by-key `Batch Processor.py:
    // 246-252`; epurge's remove-unreferenced `lisp/epurge.lsp:4`).
    // At scale: anti join shuffles both sides on the key; with a small
    // right side AQE flips it to broadcast.
    QueryDef(
      "q05_anti_join",
      (s, d) => {
        val early = t(s, d, "orders")
          .filter(col("o_orderdate") < ts("1995-07-01"))
        t(s, d, "customer")
          .join(early, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |    AND o.o_orderdate < TIMESTAMP '1995-07-01')
             |ORDER BY c_custkey""".stripMargin)),

    // ── q06: left semi join (ref: is_document_open membership probe on a
    // normalized key, `Batch Processor.py:367-374`).
    QueryDef(
      "q06_semi_join",
      (s, d) => {
        val big = t(s, d, "orders").filter(col("o_totalprice") > 400000.0)
        t(s, d, "customer")
          .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // ── q07: multi-way join denormalization + agg (ref: ebind's
    // xref-bind = resolve foreign refs and inline them, `lisp/ebind.lsp:4`).
    // lineitem⋈orders is the only big-big join (shuffle on orderkey);
    // customer joins on the already-shuffled side; nation/region are
    // broadcast explicitly — at 100 TB the dims stay broadcast and the
    // fact-fact join is the single unavoidable shuffle.
    QueryDef(
      "q07_join_denorm",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1997-01-01"))
        li.join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(
            fxSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
              .as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("r_name"))
      },
      Some(s"""SELECT r_name,
              |  ${fxSumSql("l_extendedprice*(1-l_discount)", 10000)} AS revenue,
              |  count(*) AS n_lines
              |FROM lineitem
              |JOIN orders ON l_orderkey = o_orderkey
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate < TIMESTAMP '1997-01-01'
              |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // ── q08: hash aggregate, partial+final (ref: run counters
    // `Batch Processor.py:312,:329`).
    QueryDef(
      "q08_hash_agg",
      (s, d) => {
        t(s, d, "events").groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("cnt"),
            fxSum(col("value"), 100).as("sum_value"),
            (fxSum(col("value"), 100) / count(lit(1))).as("avg_value"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, count(*) AS cnt,
              |  ${fxSumSql("value", 100)} AS sum_value,
              |  ${fxSumSql("value", 100)}/count(*) AS avg_value
              |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── q09: ratio-of-total window agg (ref: progress ratio
    // `Batch Processor.py:420-421`). The empty-frame window runs on the
    // tiny aggregated result, never on the raw table.
    QueryDef(
      "q09_ratio_of_total",
      (s, d) => {
        t(s, d, "events").groupBy(col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("ratio",
            col("cnt").cast("double") /
              sum(col("cnt")).over(Window.partitionBy()).cast("double"))
          .orderBy(col("event_type"))
      },
      Some("""WITH a AS (SELECT event_type, count(*) AS cnt
             |  FROM events GROUP BY event_type)
             |SELECT event_type, cnt,
             |  CAST(cnt AS DOUBLE)/CAST(sum(cnt) OVER () AS DOUBLE) AS ratio
             |FROM a ORDER BY event_type""".stripMargin)),

    // ── q10: CASE WHEN + substring classification (ref: error classing
    // `Batch Processor.py:313-320`, severity tagging `:405-416`).
    QueryDef(
      "q10_case_when",
      (s, d) => {
        t(s, d, "events")
          .withColumn("severity",
            when(col("event_type").contains("error"), "red")
              .when(col("event_type").isin("purchase", "signup"), "green")
              .otherwise("blue"))
          .groupBy(col("severity"))
          .agg(count(lit(1)).as("cnt"), fxSum(col("value"), 100).as("sum_value"))
          .orderBy(col("severity"))
      },
      Some(s"""SELECT CASE WHEN event_type LIKE '%error%' THEN 'red'
              |  WHEN event_type IN ('purchase','signup') THEN 'green'
              |  ELSE 'blue' END AS severity,
              |  count(*) AS cnt, ${fxSumSql("value", 100)} AS sum_value
              |FROM events GROUP BY 1 ORDER BY severity""".stripMargin)),

    // ── q11: ranking window (ref: per-stage ordinal "(Lisp i of n)"
    // `Batch Processor.py:346`, user-defined order `:338`).
    QueryDef(
      "q11_rownum_order",
      (s, d) => {
        // (l_orderkey, l_linenumber) is NOT unique in the fixture —
        // extend the window order to a total order so row_number is
        // deterministic across engines.
        val w = Window.partitionBy(col("l_orderkey"))
          .orderBy(col("l_linenumber"), col("l_extendedprice"), col("l_partkey"))
        t(s, d, "lineitem")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select(col("l_orderkey"), col("l_linenumber"), col("rn"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("rn"))
      },
      Some("""SELECT l_orderkey, l_linenumber, rn, l_quantity FROM (
             |  SELECT l_orderkey, l_linenumber, l_quantity,
             |    row_number() OVER (PARTITION BY l_orderkey
             |      ORDER BY l_linenumber, l_extendedprice, l_partkey) AS rn
             |  FROM lineitem) t
             |WHERE rn <= 2 ORDER BY l_orderkey, rn""".stripMargin)),

    // ── q12: top-k (ref: first-match scan `Batch Processor.py:470-479`).
    // orderBy+limit plans as TakeOrderedAndProject — per-partition heaps,
    // no global sort; this is what survives a 100× scale-up.
    QueryDef(
      "q12_topk",
      (s, d) => {
        t(s, d, "customer")
          .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"))
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(fxSum(col("o_totalprice"), 100).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(10)
      },
      Some(s"""SELECT c_custkey, c_name,
              |  ${fxSumSql("o_totalprice", 100)} AS revenue
              |FROM customer JOIN orders ON c_custkey = o_custkey
              |GROUP BY c_custkey, c_name
              |ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin)),

    // ── q13: existence/boolean aggregate (ref: readiness predicate
    // `Batch Processor.py:276-280`).
    QueryDef(
      "q13_exists_flag",
      (s, d) => {
        t(s, d, "customer")
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            count(lit(1)).as("n_custs"),
            max(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as("has_negative"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name, count(*) AS n_custs,
             |  CAST(max(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS has_negative
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ── q14: grand-total multi-measure summary (ref: final run summary
    // "`success_count` of `total_files`" `Batch Processor.py:329`).
    QueryDef(
      "q14_multi_measure_summary",
      (s, d) => {
        t(s, d, "orders").agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          (sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double")).as("f_ratio"),
          fxSum(col("o_totalprice"), 100).as("total_price"),
          (fxSum(col("o_totalprice"), 100) / count(lit(1))).as("avg_price"))
      },
      Some(s"""SELECT count(*) AS n_orders,
              |  CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_f,
              |  CAST(count_if(o_orderstatus = 'F') AS DOUBLE)/CAST(count(*) AS DOUBLE)
              |    AS f_ratio,
              |  ${fxSumSql("o_totalprice", 100)} AS total_price,
              |  ${fxSumSql("o_totalprice", 100)}/count(*) AS avg_price
              |FROM orders""".stripMargin)),

    // ── q16: string normalization suite (ref: abspath normalize
    // `Batch Processor.py:263`, separator replace `:339`, normcase `:370`,
    // basename `:345`).
    QueryDef(
      "q16_string_fns",
      (s, d) => {
        t(s, d, "part").select(
          col("p_partkey"),
          lower(col("p_type")).as("type_norm"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).cast("long").as("brand_num"),
          element_at(split(col("p_name"), " "), 1).as("name_head"),
          regexp_replace(col("p_name"), " ", "/").as("name_path"),
          concat_ws(":", lower(col("p_type")), col("p_brand")).as("label"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey, lower(p_type) AS type_norm,
             |  CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_num,
             |  string_split(p_name, ' ')[1] AS name_head,
             |  replace(p_name, ' ', '/') AS name_path,
             |  concat_ws(':', lower(p_type), p_brand) AS label
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // ── q17: time bucketing (ref: D4 event stream + `events.ts`;
    // batch form of a tumbling window).
    QueryDef(
      "q17_time_bucket",
      (s, d) => {
        t(s, d, "events")
          .groupBy(day(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"), fxSum(col("value"), 100).as("sum_value"))
          .orderBy(col("day"))
      },
      Some(s"""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
              |  count(*) AS cnt, ${fxSumSql("value", 100)} AS sum_value
              |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    // ── q18: analytic window `lag` (ref: fixed-sleep pacing
    // `Batch Processor.py:341-350` → inter-event gap analysis).
    // Gap math stays in exact integer microseconds until one final
    // double division.
    QueryDef(
      "q18_lag_gap",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        t(s, d, "events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
          .groupBy(col("user_id"))
          .agg(
            count(col("gap_us")).as("n_gaps"),
            (sum(col("gap_us")).cast("double") /
              count(col("gap_us")).cast("double") / 1000000.0).as("avg_gap_s"))
          .orderBy(col("user_id"))
      },
      Some("""WITH g AS (
             |  SELECT user_id, epoch_us(ts) -
             |    lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             |    AS gap_us
             |  FROM events)
             |SELECT user_id, count(gap_us) AS n_gaps,
             |  CAST(CAST(sum(gap_us) AS BIGINT) AS DOUBLE)/CAST(count(gap_us) AS DOUBLE)/1000000.0
             |    AS avg_gap_s
             |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── q20: rollup / grouping sets (ref: the two agg granularities —
    // per-file `Batch Processor.py:307` vs per-run `:329`).
    QueryDef(
      "q20_grouping_rollup",
      (s, d) => {
        t(s, d, "orders")
          .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t(s, d, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(t(s, d, "region")),
            col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_orders"),
            fxSum(col("o_totalprice"), 100).as("revenue"))
          .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
      },
      Some(s"""SELECT r_name, n_name, count(*) AS n_orders,
              |  ${fxSumSql("o_totalprice", 100)} AS revenue
              |FROM orders
              |JOIN customer ON o_custkey = c_custkey
              |JOIN nation ON c_nationkey = n_nationkey
              |JOIN region ON n_regionkey = r_regionkey
              |GROUP BY ROLLUP(r_name, n_name)
              |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin)),

    // ── q21: INTERSECT / EXCEPT (ref: delete-by-key ≈ except,
    // `Batch Processor.py:246-252`).
    QueryDef(
      "q21_intersect_except",
      (s, d) => {
        val e = t(s, d, "events")
        val clicked = e.filter(col("event_type") === "click").select(col("user_id"))
        val bigBuy = e.filter(col("event_type") === "purchase" && col("value") > 250.0)
          .select(col("user_id"))
        val bigErr = e.filter(col("event_type") === "error" && col("value") > 300.0)
          .select(col("user_id"))
        clicked.intersect(bigBuy).except(bigErr).orderBy(col("user_id"))
      },
      Some("""(SELECT user_id FROM events WHERE event_type = 'click'
             | INTERSECT
             | SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 250.0)
             |EXCEPT
             |SELECT user_id FROM events WHERE event_type = 'error' AND value > 300.0
             |ORDER BY user_id""".stripMargin)),

    // ── q35: sessionization (batch form of the stateful-streaming
    // session operator in graft.streaming — gap-based session ids via
    // lag + running sum, the classic two-window shape; the shuffle is
    // a single partition-by-user exchange reused by both windows).
    QueryDef(
      "q35_sessionize",
      (s, d) => {
        val gapUs = 7200000000L // 2h
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        t(s, d, "events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("new_sess",
            when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L)
              .otherwise(0L))
          .withColumn("session_id",
            sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy(col("user_id"), col("session_id"))
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts_us")).as("start_us"),
            max(col("ts_us")).as("end_us"),
            ((max(col("ts_us")) - min(col("ts_us"))).cast("double") / 1000000.0)
              .as("duration_s"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
             |g AS (SELECT user_id, event_id, ts_us,
             |  CASE WHEN ts_us - lag(ts_us) OVER
             |    (PARTITION BY user_id ORDER BY ts_us, event_id) > 7200000000
             |  THEN 1 ELSE 0 END AS new_sess FROM e),
             |s AS (SELECT user_id, ts_us,
             |  CAST(sum(new_sess) OVER (PARTITION BY user_id
             |    ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
             |    AS session_id FROM g)
             |SELECT user_id, session_id, count(*) AS n_events,
             |  min(ts_us) AS start_us, max(ts_us) AS end_us,
             |  CAST(max(ts_us) - min(ts_us) AS DOUBLE)/1000000.0 AS duration_s
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // ── q37: as-of join — each purchase matched to the user's most
    // recent click at or before it (ref: membership probe against an
    // external set `Batch Processor.py:367-374`, generalized to a
    // temporal probe). Implementation is the single-shuffle union+window
    // form, NOT a range join: both sides union into one stream tagged
    // is_p, one partition-by-user exchange, and a running max over the
    // prefix frame recovers the latest click ts ≤ each purchase
    // (clicks sort before purchases at equal ts ⇒ inclusive as-of). At
    // 100 TB this stays one exchange + one sort; a naive inequality
    // join would be O(clicks×purchases) per user.
    QueryDef(
      "q37_asof_join",
      (s, d) => {
        val e = t(s, d, "events")
          .filter(col("event_type").isin("click", "purchase"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"),
            (col("event_type") === "purchase").cast("int").as("is_p"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("is_p"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        e.withColumn("click_ts_us",
            max(when(col("is_p") === 0, col("ts_us"))).over(w))
          .filter(col("is_p") === 1)
          .select(col("event_id"), col("user_id"),
            col("ts_us").as("purchase_ts_us"), col("click_ts_us"),
            ((col("ts_us") - col("click_ts_us")).cast("double") / 1000000.0)
              .as("gap_s"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
             |  FROM events WHERE event_type IN ('click', 'purchase')),
             |m AS (SELECT event_id, user_id, ts_us, is_p,
             |    max(CASE WHEN is_p = 0 THEN ts_us END) OVER
             |      (PARTITION BY user_id ORDER BY ts_us, is_p, event_id
             |       ROWS UNBOUNDED PRECEDING) AS click_ts_us
             |  FROM e)
             |SELECT event_id, user_id, ts_us AS purchase_ts_us, click_ts_us,
             |  CAST(ts_us - click_ts_us AS DOUBLE)/1000000.0 AS gap_s
             |FROM m WHERE is_p = 1 ORDER BY event_id""".stripMargin)),

    // ── q38: time-range join — per error event, count same-user clicks
    // in the preceding 60 s. Implementation is the bucketed band join:
    // clicks key into one 60 s bucket, errors probe their own bucket
    // plus the previous one, the exact range predicate filters after the
    // equi-join. Turns an O(n·m) inequality join into a bucket-local
    // equi-join (the 100 TB shape); each click lands in exactly one
    // bucket so no dedup pass is needed.
    QueryDef(
      "q38_range_join",
      (s, d) => {
        val winUs = 60000000L
        val e = t(s, d, "events")
          .withColumn("ts_us", unix_micros(col("ts")))
        val err = e.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        val clk = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us").as("c_ts"),
            (col("ts_us") / winUs).cast("long").as("bucket"))
        val probes = err.withColumn("bucket",
          explode(array((col("ts_us") / winUs).cast("long"),
            (col("ts_us") / winUs).cast("long") - 1)))
        val cnt = probes.join(clk, Seq("user_id", "bucket"))
          .filter(col("c_ts") >= col("ts_us") - winUs &&
            col("c_ts") < col("ts_us"))
          .groupBy(col("event_id"))
          .agg(count(lit(1)).as("n_clicks"))
        err.join(cnt, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"), col("ts_us"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
          .orderBy(col("event_id"))
      },
      Some("""WITH err AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
             |  FROM events WHERE event_type = 'error'),
             |clk AS (SELECT user_id, epoch_us(ts) AS c_ts
             |  FROM events WHERE event_type = 'click'),
             |cnt AS (SELECT e.event_id, count(*) AS n_clicks
             |  FROM err e JOIN clk c ON c.user_id = e.user_id
             |    AND c.c_ts >= e.ts_us - 60000000 AND c.c_ts < e.ts_us
             |  GROUP BY e.event_id)
             |SELECT e.event_id, e.user_id, e.ts_us,
             |  COALESCE(cnt.n_clicks, 0) AS n_clicks
             |FROM err e LEFT JOIN cnt ON cnt.event_id = e.event_id
             |ORDER BY e.event_id""".stripMargin)),

    // ── q39: CUBE — all four grouping granularities of (status,
    // priority) in one pass (ref: the rollup analog of q20 taken to the
    // full lattice; Spark plans one Expand + one hash agg, no re-scan
    // per grouping set). Group keys are coalesced to 'ALL' on both
    // sides so the subtotal rows sort identically cross-engine.
    QueryDef(
      "q39_cube",
      (s, d) => {
        t(s, d, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping_id().cast("int").as("gid"),
            count(lit(1)).as("n"),
            fxSum(col("o_totalprice"), 100).as("revenue"))
          .select(col("gid"),
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("revenue"))
          .orderBy(col("gid"), col("status"), col("priority"))
      },
      Some(s"""SELECT CAST(CASE WHEN o_orderstatus IS NULL THEN 2 ELSE 0 END
              |    + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END
              |    AS INTEGER) AS gid,
              |  COALESCE(o_orderstatus, 'ALL') AS status,
              |  COALESCE(o_orderpriority, 'ALL') AS priority,
              |  count(*) AS n,
              |  ${Q.fxSumSql("o_totalprice", 100)} AS revenue
              |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
              |ORDER BY gid, status, priority""".stripMargin)),

    // ── q41: exact percentiles (median + p95 per event_type). Exact
    // `percentile` — sort-based, deterministic — not approx_percentile,
    // whose sketch would never hash-match; both engines interpolate
    // linearly, and the 6-decimal round absorbs last-ulp noise.
    // q41 is the ORACLE BASELINE: at 100 TB a 5-group exact percentile
    // funnels the whole table through ≤5 reducers and materializes
    // every value — the scale path is its sketch twin q55 (mirroring
    // how q45 twins exact distinct).
    QueryDef(
      "q41_percentile",
      (s, d) => {
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(
            round(expr("percentile(value, 0.5)"), 6).as("p50"),
            round(expr("percentile(value, 0.95)"), 6).as("p95"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.5), 6) AS p50,
             |  round(quantile_cont(value, 0.95), 6) AS p95,
             |  count(*) AS n
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── q55: approximate percentiles — the sketch twin of q41. The
    // GK/KLL-style approx_percentile sketch partial-aggregates
    // MAP-SIDE with bounded memory, so the shuffle carries one sketch
    // per (partition, group) instead of every value through ≤5
    // reducers — the shape that survives 100 TB. Approximate ⇒
    // rows-only driver check + scalatest error gate vs exact q41.
    QueryDef(
      "q55_approx_percentile",
      (s, d) => {
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(
            round(expr("approx_percentile(value, 0.5, 10000)"), 6).as("p50"),
            round(expr("approx_percentile(value, 0.95, 10000)"), 6).as("p95"),
            count(lit(1)).as("n"))
          .orderBy(col("event_type"))
      },
      None),

    // ── q42: pivot — event counts per day fanned into one column per
    // event_type (explicit value list ⇒ no extra distinct pass and a
    // deterministic column set; one hash agg, no per-column re-scan).
    QueryDef(
      "q42_pivot",
      (s, d) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        val p = t(s, d, "events")
          .withColumn("day", day(col("ts")))
          .groupBy(col("day"))
          .pivot("event_type", types)
          .agg(count(lit(1)))
        p.select(col("day") +: types.map(tp =>
            coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
          .orderBy(col("day"))
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |  count(*) FILTER (event_type = 'click') AS n_click,
             |  count(*) FILTER (event_type = 'error') AS n_error,
             |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
             |  count(*) FILTER (event_type = 'signup') AS n_signup,
             |  count(*) FILTER (event_type = 'view') AS n_view
             |FROM events GROUP BY 1 ORDER BY day""".stripMargin)),

    // ── q43: RANGE-frame moving aggregate — per user, trailing-24h
    // average of `value` at every event. The frame is value-based
    // (RANGE on the microsecond key), not row-based; the average is
    // built from an exact integer window sum so segment-tree vs
    // sequential accumulation order can't split the engines.
    QueryDef(
      "q43_moving_avg",
      (s, d) => {
        val dayUs = 86400000000L
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
          .rangeBetween(-dayUs, 0)
        t(s, d, "events")
          .withColumn("ts_us", unix_micros(col("ts")))
          .withColumn("sum_fx", sum(fxUnits(col("value"), 100)).over(w))
          .withColumn("n_win", count(lit(1)).over(w))
          .select(col("event_id"), col("user_id"), col("ts_us"),
            round((col("sum_fx").cast("double") / 100.0) /
              col("n_win").cast("double"), 6).as("mavg_24h"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us,
             |    CAST(round(value*100) AS BIGINT) AS fx
             |  FROM events),
             |w AS (SELECT event_id, user_id, ts_us,
             |    sum(fx) OVER win AS sum_fx,
             |    count(*) OVER win AS n_win
             |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY ts_us
             |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
             |SELECT event_id, user_id, ts_us,
             |  round((CAST(sum_fx AS DOUBLE)/100.0)/CAST(n_win AS DOUBLE), 6)
             |    AS mavg_24h
             |FROM w ORDER BY event_id""".stripMargin)),

    // ── q45: approximate distinct count (HLL++). At 100 TB an exact
    // count-distinct shuffles every key; the sketch is fixed-size per
    // group and merges map-side. Approximate ⇒ no SQL oracle (DuckDB's
    // HLL is a different implementation) — rows-only driver check, and
    // scalatest bounds the error vs the exact count at rsd=0.02.
    QueryDef(
      "q45_approx_distinct",
      (s, d) => {
        t(s, d, "events")
          .groupBy(col("event_type"))
          .agg(
            approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
            count(lit(1)).as("n_events"))
          .orderBy(col("event_type"))
      },
      None),

    // ── q46: per-group top-k via the custom GroupedTopK operator
    // (logical plan + strategy + partial/final SparkPlan,
    // graft.plans.GroupedTopK) — top-2 lineitems per order by price.
    // Same semantics as the q11-style window formulation, but the
    // map side reduces each group to k rows BEFORE the exchange;
    // oracle-verified against the row_number() form.
    QueryDef(
      "q46_grouped_topk",
      (s, d) => {
        graft.plans.GroupedTopK.topK(
            t(s, d, "lineitem"),
            Seq("l_orderkey"),
            Seq(("l_extendedprice", true), ("l_linenumber", false)),
            2)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_extendedprice"))
          .orderBy(col("l_orderkey"), col("l_extendedprice").desc,
            col("l_linenumber"))
      },
      Some("""WITH r AS (SELECT l_orderkey, l_linenumber, l_extendedprice,
             |  row_number() OVER (PARTITION BY l_orderkey
             |    ORDER BY l_extendedprice DESC, l_linenumber) AS rn
             |  FROM lineitem)
             |SELECT l_orderkey, l_linenumber, l_extendedprice
             |FROM r WHERE rn <= 2
             |ORDER BY l_orderkey, l_extendedprice DESC, l_linenumber""".stripMargin)),

    // ── q47: explicit GROUPING SETS — the two marginal distributions
    // (by status, by priority) plus the grand total, WITHOUT the
    // (status, priority) leaves cube would also compute: one Expand
    // pass producing exactly the requested sets. Completes the
    // grouping-lattice trio with q20 (rollup) and q39 (cube).
    QueryDef(
      "q47_grouping_sets",
      (s, d) => {
        val o = t(s, d, "orders")
        o.groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")),
              Seq.empty[org.apache.spark.sql.Column]),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping_id().cast("int").as("gid"),
            count(lit(1)).as("n"),
            fxSum(col("o_totalprice"), 100).as("revenue"))
          .select(col("gid"),
            coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("revenue"))
          .orderBy(col("gid"), col("status"), col("priority"))
      },
      Some(s"""SELECT CAST(CASE WHEN o_orderstatus IS NULL THEN 2 ELSE 0 END
              |    + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END
              |    AS INTEGER) AS gid,
              |  COALESCE(o_orderstatus, 'ALL') AS status,
              |  COALESCE(o_orderpriority, 'ALL') AS priority,
              |  count(*) AS n,
              |  ${Q.fxSumSql("o_totalprice", 100)} AS revenue
              |FROM orders
              |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
              |ORDER BY gid, status, priority""".stripMargin)),

    // ── q48: correlated EXISTS subquery through the SQL entry point —
    // the same SQL string runs on spark.sql (over temp views) and on
    // DuckDB, so the oracle IS the query. Exercises Spark's subquery
    // decorrelation (EXISTS → left semi join; see SURVEY.md §4.2).
    {
      val sql48 =
        """SELECT o_orderpriority, count(*) AS n_orders
          |FROM orders o
          |WHERE EXISTS (SELECT 1 FROM lineitem l
          |  WHERE l.l_orderkey = o.o_orderkey
          |    AND l.l_shipdate < o.o_orderdate)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin
      QueryDef(
        "q48_exists_subquery",
        (s, d) => {
          t(s, d, "orders").createOrReplaceTempView("orders")
          t(s, d, "lineitem").createOrReplaceTempView("lineitem")
          s.sql(sql48)
        },
        Some(sql48))
    },

    // ── q49: correlated SCALAR subquery (per-row aggregate lookup),
    // same shared-SQL scheme. The nation average is built from the
    // exact fixed-point sum so both engines divide identical integers
    // (Q.fxSum discipline). Exercises
    // RewriteCorrelatedScalarSubquery → aggregate + join.
    {
      val sql49 =
        """SELECT c.c_custkey,
          |  round(c.c_acctbal - (
          |    SELECT CAST(sum(CAST(round(c2.c_acctbal*100) AS BIGINT)) AS DOUBLE)
          |      /100.0/count(*)
          |    FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey), 4)
          |    AS delta_to_nation_avg
          |FROM customer c
          |ORDER BY c.c_custkey""".stripMargin
      QueryDef(
        "q49_scalar_subquery",
        (s, d) => {
          t(s, d, "customer").createOrReplaceTempView("customer")
          s.sql(sql49)
        },
        Some(sql49))
    },

    // ── q50: distribution ranking — deciles + percent_rank over a
    // total order (acctbal, custkey tiebreak ⇒ deterministic despite
    // duplicate balances). Rounds out the ranking-window family next
    // to q11's row_number.
    //
    // NOT `ntile(10).over(Window.orderBy(...))`: an unpartitioned
    // ranking window plans a single-partition WindowExec — the whole
    // table sorts through ONE task, a scale-killer at 100 TB (fine for
    // q09's 5 post-aggregate rows, fatal on a base table). Scale-safe
    // two-pass instead: range-repartition on the sort key + sort
    // within partitions (one parallel exchange — the same work any
    // global sort does), then `zipWithIndex` assigns the global row
    // number: Spark's own two-job count-then-offset pass, where job 1
    // counts rows per partition and job 2 re-reads the SAME shuffle
    // files map-side with the partition's cumulative offset — no
    // further exchange, no single-partition stage. Decile and
    // percent_rank are then pure per-row arithmetic on (rn, n):
    // standard ntile fills the first n%10 buckets with ceil(n/10) rows
    // and the rest with floor(n/10); percent_rank = (rn-1)/(n-1)
    // because the total order makes rank ≡ row_number (no ties).
    QueryDef(
      "q50_ntile",
      (s, d) => {
        val base = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
        // metadata-backed count: one column-free scan job (the same
        // bounded driver-side probe cost as the q28 size guard)
        val n = base.count()
        val withRn = Q.globalRankByRange(base,
          Seq(col("c_acctbal"), col("c_custkey")))
        val decile = Q.exactDecile(col("rn"), n)
        val pr =
          if (n <= 1L) lit(0.0)
          else round((col("rn") - 1).cast("double") / lit((n - 1).toDouble), 6)
        withRn
          .select(col("c_custkey"), col("c_acctbal"),
            decile.as("decile"), pr.as("pr"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_acctbal,
             |  ntile(10) OVER w AS decile,
             |  round(percent_rank() OVER w, 6) AS pr
             |FROM customer
             |WINDOW w AS (ORDER BY c_acctbal, c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // ── q51: date arithmetic — ship latency per order (days from
    // order date to first/last line shipment) + month bucket. Both
    // engines compute day diffs on DATE-truncated values (exact
    // integer arithmetic, no tz edge).
    QueryDef(
      "q51_date_math",
      (s, d) => {
        val li = t(s, d, "lineitem")
          .groupBy(col("l_orderkey").as("o_orderkey"))
          .agg(min(col("l_shipdate")).as("first_ship"),
            max(col("l_shipdate")).as("last_ship"))
        t(s, d, "orders")
          .join(li, Seq("o_orderkey"))
          .select(col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
            datediff(to_date(col("first_ship")), to_date(col("o_orderdate")))
              .cast("long").as("days_to_first"),
            datediff(to_date(col("last_ship")), to_date(col("o_orderdate")))
              .cast("long").as("ship_span"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH li AS (SELECT l_orderkey AS o_orderkey,
             |    min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
             |  FROM lineitem GROUP BY 1)
             |SELECT o.o_orderkey,
             |  strftime(o.o_orderdate, '%Y-%m') AS order_month,
             |  CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
             |    CAST(first_ship AS DATE)) AS BIGINT) AS days_to_first,
             |  CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
             |    CAST(last_ship AS DATE)) AS BIGINT) AS ship_span
             |FROM orders o JOIN li USING (o_orderkey)
             |ORDER BY o.o_orderkey""".stripMargin)),

    // ── q52: bag-semantics set ops (EXCEPT ALL / INTERSECT ALL) —
    // multiplicity-preserving counterparts of q21's distinct set ops:
    // per-user click events minus one-per-purchase, keeping duplicates.
    QueryDef(
      "q52_setops_all",
      (s, d) => {
        val e = t(s, d, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"))
        clicks.exceptAll(purchases)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("surplus_clicks"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
             |ea AS (SELECT user_id FROM c EXCEPT ALL SELECT user_id FROM p)
             |SELECT user_id, count(*) AS surplus_clicks
             |FROM ea GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── q191: INTERSECT ALL — the one standard set-op variant q52
    // left unexercised (r7 verdict gap #3): multiplicity-preserving
    // intersection, i.e. per user min(#clicks, #views) joint events.
    // Spark plans `intersectAll` as a count-compare aggregate + a
    // `least` replicate — no window, both sides partial-aggregated
    // map-side before the one key exchange, the same scale shape as
    // q52's exceptAll.
    QueryDef(
      "q191_intersect_all",
      (s, d) => {
        val e = t(s, d, "events")
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"))
        clicks.intersectAll(views)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("joint_mult"))
          .orderBy(col("user_id"))
      },
      Some("""WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'),
             |v AS (SELECT user_id FROM events WHERE event_type = 'view'),
             |ia AS (SELECT user_id FROM c INTERSECT ALL SELECT user_id FROM v)
             |SELECT user_id, count(*) AS joint_mult
             |FROM ia GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── q53: LATERAL correlated subquery — top-2 customers per nation
    // through the shared-SQL entry point (one string, both engines).
    // Spark plans this as a lateral join; semantically the per-group
    // top-k family (cf. q46's custom operator).
    {
      val sql53 =
        """SELECT n.n_name, t.c_custkey, t.c_acctbal
          |FROM nation n, LATERAL (
          |  SELECT c.c_custkey, c.c_acctbal FROM customer c
          |  WHERE c.c_nationkey = n.n_nationkey
          |  ORDER BY c.c_acctbal DESC, c.c_custkey LIMIT 2) t
          |ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey""".stripMargin
      QueryDef(
        "q53_lateral_topk",
        (s, d) => {
          t(s, d, "nation").createOrReplaceTempView("nation")
          t(s, d, "customer").createOrReplaceTempView("customer")
          s.sql(sql53)
        },
        Some(sql53))
    },

    // ── q22: exact content-hash dedup (north star; ref corpus dedup
    // `Batch Processor.py:231` + normalized-key dedup `:263-265`).
    // Survivor choice is made deterministic (min doc_id per hash) —
    // dropDuplicates alone is partition-order-dependent.
    QueryDef(
      "q22_dedup_docs",
      (s, d) => {
        t(s, d, "documents")
          .withColumn("h", md5(lower(col("text"))))
          .groupBy(col("h"))
          .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
          .select(col("doc_id"), col("dup_cnt"), col("h"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt,
             |  md5(lower(text)) AS h
             |FROM documents GROUP BY md5(lower(text)) ORDER BY doc_id""".stripMargin)),

    // ── q56: deterministic stratified fraction sample — a training-
    // data staple (hold out x% per stratum, reproducibly). The sample
    // membership test is a pure map-side filter on a multiplicative
    // hash of the stable key (Knuth 2654435761), so it costs one scan,
    // pushes into the pipeline wherever the key is available, and
    // yields the SAME sample on every engine/run — unlike rand()-based
    // TABLESAMPLE, which is irreproducible and oracle-uncheckable. The
    // per-stratum aggregate verifies the sampled population exactly.
    QueryDef(
      "q56_stratified_sample",
      (s, d) => {
        // & 0x7FFFFFFF before the Knuth multiply: the raw product
        // overflows long (ANSI throw) once ids pass ~3.5e9 — exactly
        // the corpus sizes this sample targets; masked, the product
        // caps at 2^31·2654435761 < 2^63 (identity for fixture ids)
        t(s, d, "events")
          .filter(expr(Q.knuthBucketSql("event_id", 100)) < 10)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_sampled"),
            Q.fxSum(col("value"), 100).as("sum_value"))
          .orderBy(col("event_type"))
      },
      Some(s"""SELECT event_type, count(*) AS n_sampled,
              |  ${Q.fxSumSql("value", 100)} AS sum_value
              |FROM events WHERE ${Q.knuthBucketSql("event_id", 100)} < 10
              |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── q57: fixed-size per-stratum sample (k rows per group,
    // deterministic) — "give me exactly 50 examples per class". The
    // hash order makes it a uniform-ish reproducible draw, and the
    // bottom-k-by-hash runs through [[graft.plans.GroupedTopK]]'s
    // map-side heaps: the shuffle carries ≤ k·partitions rows per
    // stratum, never the stratum itself (a row_number window — the
    // oracle's formulation — would sort and shuffle every row).
    QueryDef(
      "q57_grouped_sample",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("event_type"))
          .withColumn("h",
            expr(Q.knuthBucketSql("event_id", 1000000007L)))
        graft.plans.GroupedTopK.topK(ev,
          Seq("event_type"), Seq(("h", false), ("event_id", false)), 50)
          .select(col("event_type"), col("event_id"))
          .orderBy(col("event_type"), col("event_id"))
      },
      Some(s"""SELECT event_type, event_id FROM (
             |  SELECT event_type, event_id, row_number() OVER (
             |    PARTITION BY event_type
             |    ORDER BY ${Q.knuthBucketSql("event_id", 1000000007L)},
             |      event_id) AS rn
             |  FROM events) WHERE rn <= 50
             |ORDER BY event_type, event_id""".stripMargin)),

    // ── q58: per-group z-score outliers (data-quality gate: drop
    // values > 3σ from their stratum mean before training). The test
    // |x−μ| > 3σ is algebraically cleared of divisions —
    // (n·x−s)² > 9·(n·ssq−s²) over EXACT integer moments (fixed-point
    // units, map-side partial sums, [[Q.decMoments]]'s DECIMAL(38,0)
    // accumulators so a 100 TB Σv² cannot overflow a long under ANSI)
    // — so both engines evaluate the identical IEEE expression over
    // identical exact integers and the flag hash-matches; no float
    // mean/stddev ever materializes. Scale shape: one 5-row moment
    // agg, broadcast back, pure map filter.
    QueryDef(
      "q58_zscore_outliers",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("event_id"), col("event_type"),
            Q.fxUnits(col("value"), 100).as("v"))
        val m = Q.decMoments(col("v"))
        val stats = ev.groupBy(col("event_type")).agg(m.head, m.tail: _*)
        val dn = col("n").cast("double")
        val dsv = col("sv").cast("double")
        val ld = dn * col("v").cast("double") - dsv
        val rhs = lit(9.0) *
          (dn * col("ssq").cast("double") - dsv * dsv)
        ev.join(broadcast(stats), Seq("event_type"))
          .filter(ld * ld > rhs)
          .select(col("event_id"), col("event_type"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT event_id, event_type,
             |    CAST(round(value*100) AS BIGINT) AS v FROM events),
             |st AS (SELECT event_type, count(*) AS n,
             |    sum(CAST(v AS HUGEINT)) AS sv,
             |    sum(CAST(v AS HUGEINT)*v) AS ssq
             |  FROM e GROUP BY event_type)
             |SELECT event_id, e.event_type
             |FROM e JOIN st USING (event_type)
             |WHERE (CAST(n AS DOUBLE)*CAST(v AS DOUBLE) - CAST(sv AS DOUBLE))
             |    * (CAST(n AS DOUBLE)*CAST(v AS DOUBLE) - CAST(sv AS DOUBLE)) >
             |  9.0 * (CAST(n AS DOUBLE)*CAST(ssq AS DOUBLE) -
             |    CAST(sv AS DOUBLE)*CAST(sv AS DOUBLE))
             |ORDER BY event_id""".stripMargin)),

    // ── q61: sliding-window distinct users (trailing-7-day DAU→WAU
    // rollup). Exact sliding DISTINCT cannot partial-aggregate, so the
    // scale shape is: dedupe to (day, user) grain first — ONE shuffle
    // over the corpus, after which cardinality is days×users — then
    // enumerate coverage MAP-SIDE: each (d, user) row explodes to the
    // exactly-7 window days it contributes to (d..d+6), and one hash
    // agg counts distinct users per window. The earlier form band-
    // joined a broadcast day dimension on a non-equi BETWEEN — a
    // BroadcastNestedLoopJoin whose work is |days×users| × |days|,
    // fine on a 30-day fixture and 1000× the useful work on a
    // multi-year corpus. The explode is |dd|×7 regardless of corpus
    // span; the semi join (equi, broadcast hash) only drops phantom
    // days with no activity of their own (gap days and the ≤6 past
    // the corpus end), probing the ~|days|-row aggregate, not the
    // corpus.
    QueryDef(
      "q61_sliding_distinct",
      (s, d) => {
        val dd = t(s, d, "events")
          .select(to_date(col("ts")).as("d"), col("user_id"))
          .distinct()
        val days = dd.select(col("d").as("day")).distinct()
        dd.select(
            explode(sequence(col("d"), date_add(col("d"), 6))).as("day"),
            col("user_id"))
          .groupBy(col("day"))
          .agg(countDistinct(col("user_id")).as("n_users_7d"))
          // keep only days that exist in the data (a window anchored
          // on a day with no events is not a row of this rollup)
          .join(broadcast(days), Seq("day"), "left_semi")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_users_7d"))
          .orderBy(col("day"))
      },
      Some("""WITH dd AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id
             |    FROM events),
             |days AS (SELECT DISTINCT d AS day FROM dd)
             |SELECT strftime(day, '%Y-%m-%d') AS day,
             |  count(DISTINCT user_id) AS n_users_7d
             |FROM dd JOIN days ON dd.d BETWEEN day - 6 AND day
             |GROUP BY day ORDER BY day""".stripMargin)),

    // ── q62: cohort retention — users bucketed by first-seen day,
    // retained = active again within days +1..+7. First-seen is one
    // hash agg; activity dedupes to (user, day) grain; the retained
    // flag is conditional aggregation over the join — no per-day
    // subqueries, no window over the corpus.
    QueryDef(
      "q62_retention",
      (s, d) => {
        // ONE corpus pass: per user, the set of active days (map-side
        // collect_set partials dedup before the single user_id
        // exchange — bounded by |calendar days|, a dimension); cohort
        // = array_min, retained = any day in (cohort, cohort+7]. The
        // former first-activity + distinct-activity frames were two
        // separate scans of events whose exchanges Spark could not
        // reuse (column pruning made the partial aggregates differ —
        // the r12 q305 duplicated-subtree class). Each user has
        // exactly ONE cohort, so count(*) at the cohort grain IS the
        // distinct user count — the Expand-free shape kept from r8
        // (gid branch order varies per session; the attribution
        // anchor must not wobble on identical code).
        t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("d"))
          .groupBy(col("user_id"))
          .agg(collect_set(col("d")).as("days"))
          .select(array_min(col("days")).as("cohort"), col("days"))
          .select(col("cohort"),
            when(exists(col("days"), x => x.between(
              date_add(col("cohort"), 1), date_add(col("cohort"), 7))),
              1L).otherwise(0L).as("ret"))
          .groupBy(col("cohort"))
          .agg(count(lit(1)).as("n_cohort"),
            sum(col("ret")).as("n_retained_7d"))
          .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
            col("n_cohort"), col("n_retained_7d"))
          .orderBy(col("cohort"))
      },
      Some("""WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort
             |    FROM events GROUP BY user_id),
             |a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
             |SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
             |  count(DISTINCT f.user_id) AS n_cohort,
             |  count(DISTINCT CASE WHEN d BETWEEN cohort + 1 AND cohort + 7
             |    THEN f.user_id END) AS n_retained_7d
             |FROM f JOIN a ON a.user_id = f.user_id
             |GROUP BY cohort ORDER BY cohort""".stripMargin)),

    // ── q63: event funnel (view → click → purchase by first
    // occurrence). One conditional-aggregation pass builds each
    // user's first-touch times (map-side partials, single shuffle on
    // user), the stage classifies in place — the corpus is scanned
    // once, no self-joins per funnel step.
    QueryDef(
      "q63_funnel",
      (s, d) => {
        val ev = t(s, d, "events")
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
        val firsts = ev.groupBy(col("user_id"))
          .agg(
            min(when(col("event_type") === "view", col("ts_us"))).as("v"),
            min(when(col("event_type") === "click", col("ts_us"))).as("c"),
            min(when(col("event_type") === "purchase", col("ts_us"))).as("p"))
        firsts
          .withColumn("funnel_stage",
            when(col("v").isNotNull && col("c").isNotNull &&
              col("p").isNotNull && col("c") > col("v") &&
              col("p") > col("c"), 3)
              .when(col("v").isNotNull && col("c").isNotNull &&
                col("c") > col("v"), 2)
              .when(col("v").isNotNull, 1)
              .otherwise(0).cast("int"))
          .groupBy(col("funnel_stage"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(col("funnel_stage"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
             |    FROM events WHERE event_type IN ('view','click','purchase')),
             |f AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN ts_us END) AS v,
             |    min(CASE WHEN event_type = 'click' THEN ts_us END) AS c,
             |    min(CASE WHEN event_type = 'purchase' THEN ts_us END) AS p
             |  FROM e GROUP BY user_id),
             |st AS (SELECT CAST(CASE
             |    WHEN v IS NOT NULL AND c IS NOT NULL AND p IS NOT NULL
             |      AND c > v AND p > c THEN 3
             |    WHEN v IS NOT NULL AND c IS NOT NULL AND c > v THEN 2
             |    WHEN v IS NOT NULL THEN 1
             |    ELSE 0 END AS INTEGER) AS funnel_stage FROM f)
             |SELECT funnel_stage, count(*) AS n_users FROM st
             |GROUP BY funnel_stage ORDER BY funnel_stage""".stripMargin)),

    // ── q82: hourly volume-spike detection — flag (event_type, hour)
    // cells whose count sits above mean + 3σ of that type's hourly
    // distribution (the ops-monitoring face of the event stream: a
    // traffic spike, a runaway client, a replayed firehose). q58's
    // division-free z-score form over per-hour counts: the flag is
    // (n·x − s)² > 9(n·ssq − s²) AND n·x > s over [[Q.decMoments]]'s
    // exact DECIMAL(38,0) integer moments (a multi-year corpus's
    // Σcnt² overflows a long; ANSI would fail the query loudly), the
    // comparison in double from identical exact inputs on both
    // engines — no float mean/stddev ever materializes. Scale shape:
    // one shuffle to (type, hour) grain with map-side partials, a
    // per-type 5-row moment aggregate broadcast back, flagging
    // map-side.
    QueryDef(
      "q82_spike_detect",
      (s, d) => {
        val hrs = t(s, d, "events")
          .groupBy(col("event_type"),
            date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00")
              .as("hour"))
          .agg(count(lit(1)).as("cnt"))
        val m = Q.decMoments(col("cnt"))
        val mom = hrs.groupBy(col("event_type")).agg(m.head, m.tail: _*)
        hrs.join(broadcast(mom), Seq("event_type"))
          .filter(Q.spikePredicate)
          .select(col("event_type"), col("hour"), col("cnt"))
          .orderBy(col("event_type"), col("hour"))
      },
      Some("""WITH hrs AS (SELECT event_type,
             |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |mom AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    sum(CAST(cnt AS HUGEINT)) AS sv,
             |    sum(CAST(cnt AS HUGEINT)*cnt) AS ssq
             |  FROM hrs GROUP BY 1)
             |SELECT h.event_type, hour, cnt
             |FROM hrs h JOIN mom m USING (event_type)
             |WHERE m.n >= 2
             |  AND (CAST(m.n AS DOUBLE)*CAST(cnt AS DOUBLE) - CAST(m.sv AS DOUBLE))
             |    * (CAST(m.n AS DOUBLE)*CAST(cnt AS DOUBLE) - CAST(m.sv AS DOUBLE)) >
             |    9.0 * (CAST(m.n AS DOUBLE)*CAST(m.ssq AS DOUBLE) -
             |      CAST(m.sv AS DOUBLE)*CAST(m.sv AS DOUBLE))
             |  AND CAST(m.n AS DOUBLE)*CAST(cnt AS DOUBLE) > CAST(m.sv AS DOUBLE)
             |ORDER BY event_type, hour""".stripMargin)),

    // ── q83: FULL OUTER reconciliation of two daily rollups — the
    // last standard join shape (inner/semi/anti/left/range/as-of are
    // q05–q07/q37/q38; this is the both-sides-preserved one). Clicks
    // and purchases roll up per (day, campaign), where campaign is the
    // `k` prop mod 10 with 0 recorded as NULL ("untagged") — so the
    // join carries genuine NULL keys, and the query pins the standard
    // null-key discipline: a NULL campaign never equi-matches, so each
    // side's untagged rollup survives as its OWN row with the other
    // side's measures NULL (not merged, not dropped). Scale shape:
    // two filtered hash aggregates (map-side partials over one corpus
    // scan each) then a shuffle full-outer join on the tiny rollup
    // grain — full outer cannot broadcast, and does not need to: both
    // sides are |days×campaigns|, not the corpus.
    QueryDef(
      "q83_full_outer",
      (s, d) => {
        def rollup(etype: String, nCol: String, cCol: String) =
          t(s, d, "events")
            .filter(col("event_type") === etype)
            .groupBy(to_date(col("ts")).as("day"),
              nullif(get_json_object(col("props"), "$.k").cast("long") % 10,
                lit(0L)).as("campaign"))
            .agg(count(lit(1)).as(nCol),
              sum(Q.fxUnits(col("value"), 100)).as(cCol))
        rollup("click", "n_clicks", "click_cents")
          .join(rollup("purchase", "n_purchases", "purchase_cents"),
            Seq("day", "campaign"), "full_outer")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("campaign"), col("n_clicks"), col("click_cents"),
            col("n_purchases"), col("purchase_cents"))
          // (day, campaign) is NOT unique in the output: the two
          // one-sided untagged rollups of a day share (day, NULL), so
          // n_clicks (null = purchase side first) totalizes the order
          .orderBy(asc_nulls_first("day"), asc_nulls_first("campaign"),
            asc_nulls_first("n_clicks"))
      },
      Some("""WITH c AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    nullif(CAST(json_extract(props, '$.k') AS BIGINT) % 10, 0)
             |      AS campaign,
             |    count(*) AS n_clicks,
             |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
             |      AS click_cents
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
             |p AS (
             |  SELECT CAST(ts AS DATE) AS day,
             |    nullif(CAST(json_extract(props, '$.k') AS BIGINT) % 10, 0)
             |      AS campaign,
             |    count(*) AS n_purchases,
             |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
             |      AS purchase_cents
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
             |SELECT strftime(day, '%Y-%m-%d') AS day, campaign,
             |  n_clicks, click_cents, n_purchases, purchase_cents
             |FROM c FULL OUTER JOIN p USING (day, campaign)
             |ORDER BY day, campaign NULLS FIRST, n_clicks NULLS FIRST"""
        .stripMargin)),

    // ── q92: distribution-DRIFT detection — per event_type, the total
    // variation distance between the value distribution of the first
    // half of the month (days 1–15) and the second (16+), over 10
    // fixed 50-unit value bins (top bin open-ended). The check a
    // pipeline runs before trusting "this week's data looks like last
    // week's": TV = ½·Σ_bins |p_bin − q_bin| ∈ [0, 1].
    //
    // Float discipline: no per-bin ratio ever materializes. TV's
    // numerator is computed over the CROSS products — Σ|c1·N2 − c2·N1|
    // — as exact DECIMAL(38,0) integers (HUGEINT on the oracle; the
    // q58 moment discipline: a 10¹³-row half yields products ~10²⁶,
    // far past long but 12 digits inside 38), then ONE double division
    // by 2·N1·N2 in the same IEEE operation order on both engines,
    // rounded to 6 decimals.
    //
    // Scale shape: one shuffle to (type, bin) grain with map-side
    // partials; per-type totals (≤ |types| rows) broadcast back; the
    // final per-type rollup is over ≤ 10 bins × |types| rows. The
    // corpus is scanned once.
    QueryDef(
      "q92_tv_drift",
      (s, d) => {
        val cells = t(s, d, "events")
          .select(col("event_type"),
            least(floor(col("value") / 50).cast("long"), lit(9L)).as("bin"),
            (dayofmonth(col("ts")) <= 15).as("early"))
          .groupBy(col("event_type"), col("bin"))
          .agg(sum(when(col("early"), 1L).otherwise(0L)).cast("long").as("c1"),
            sum(when(!col("early"), 1L).otherwise(0L)).cast("long").as("c2"))
        val totals = cells.groupBy(col("event_type"))
          .agg(sum(col("c1")).cast("long").as("n_early"),
            sum(col("c2")).cast("long").as("n_late"))
        cells.join(broadcast(totals), Seq("event_type"))
          .groupBy(col("event_type"), col("n_early"), col("n_late"))
          .agg(sum(abs(
            col("c1").cast("decimal(38,0)") * col("n_late") -
              col("c2").cast("decimal(38,0)") * col("n_early"))).as("num"))
          .select(col("event_type"), col("n_early"), col("n_late"),
            when(col("n_early") === 0 || col("n_late") === 0, lit(null))
              .otherwise(round(col("num").cast("double") /
                (lit(2.0) * col("n_early").cast("double")
                  * col("n_late").cast("double")), 6))
              .as("tv"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type,
             |    least(CAST(floor(value / 50) AS BIGINT), 9) AS bin,
             |    (date_part('day', ts) <= 15) AS early
             |  FROM events),
             |cells AS (SELECT event_type, bin,
             |    CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             |    CAST(sum(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS c2
             |  FROM e GROUP BY 1, 2),
             |tot AS (SELECT event_type, CAST(sum(c1) AS BIGINT) AS n_early,
             |    CAST(sum(c2) AS BIGINT) AS n_late
             |  FROM cells GROUP BY 1),
             |nm AS (SELECT c.event_type, n_early, n_late,
             |    sum(abs(CAST(c1 AS HUGEINT)*n_late - CAST(c2 AS HUGEINT)*n_early))
             |      AS num
             |  FROM cells c JOIN tot USING (event_type)
             |  GROUP BY 1, 2, 3)
             |SELECT event_type, n_early, n_late,
             |  CASE WHEN n_early = 0 OR n_late = 0 THEN NULL
             |    ELSE round(CAST(num AS DOUBLE) /
             |      (2.0 * CAST(n_early AS DOUBLE) * CAST(n_late AS DOUBLE)), 6)
             |  END AS tv
             |FROM nm ORDER BY event_type""".stripMargin)),

    // ── q93: column PROFILE — the ANALYZE-TABLE face every engine
    // ships: per declared lineitem column, row/null/exact-distinct
    // counts and min/max rendered through a type-stable cast (doubles
    // via DECIMAL(18,2) so both engines print "1.00", never raw
    // double formatting — the one rendering the engines are guaranteed
    // to agree on; dates via yyyy-MM-dd). One derived column
    // (l_tax_nonzero = nullif(l_tax, 0)) keeps the null-discipline row
    // honest on a null-free fixture: n_null counts the zeros and
    // n_distinct excludes NULL on both engines.
    //
    // Scale shape: one tiny aggregate per column over a scan PRUNED to
    // that column (columnar parquet reads just the profiled bytes —
    // k single-column scans ≈ one full-width scan, each with map-side
    // partials; exact count(DISTINCT) adds one dedup exchange per
    // column, the price of exact ANALYZE. The union is |columns| rows.
    QueryDef(
      "q93_column_profile",
      (s, d) => {
        val li = t(s, d, "lineitem")
        // each column profiles over its own pruned projection,
        // repartitioned first: a table small enough to arrive as one
        // parquet split would otherwise run every per-column distinct
        // single-threaded; the exchange ships ONE computed column
        def prof(name: String, c: org.apache.spark.sql.Column,
            render: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
          li.select(c.as("v"))
            .repartition(s.sparkContext.defaultParallelism)
            .agg(count(lit(1)).cast("long").as("n_rows"),
              sum(when(col("v").isNull, 1L).otherwise(0L)).cast("long")
                .as("n_null"),
              countDistinct(col("v")).cast("long").as("n_distinct"),
              render(min(col("v"))).cast("string").as("min_s"),
              render(max(col("v"))).cast("string").as("max_s"))
            .select(lit(name).as("column"), col("n_rows"), col("n_null"),
              col("n_distinct"), col("min_s"), col("max_s"))
        val num = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
        val id = (c: org.apache.spark.sql.Column) => c
        val dt = (c: org.apache.spark.sql.Column) =>
          date_format(c, "yyyy-MM-dd")
        Seq(
          prof("l_discount", col("l_discount"), num),
          prof("l_extendedprice", col("l_extendedprice"), num),
          prof("l_linestatus", col("l_linestatus"), id),
          prof("l_orderkey", col("l_orderkey"), id),
          prof("l_quantity", col("l_quantity"), num),
          prof("l_returnflag", col("l_returnflag"), id),
          prof("l_shipdate", col("l_shipdate"), dt),
          prof("l_tax_nonzero", nullif(col("l_tax"), lit(0.0)), num))
          .reduce(_.unionAll(_))
          .orderBy(col("column"))
      },
      Some("""WITH p AS (
             |  SELECT 'l_discount' AS "column", count(*) AS n_rows,
             |    sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS n_null,
             |    count(DISTINCT l_discount) AS n_distinct,
             |    CAST(CAST(min(l_discount) AS DECIMAL(18,2)) AS VARCHAR) AS min_s,
             |    CAST(CAST(max(l_discount) AS DECIMAL(18,2)) AS VARCHAR) AS max_s
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_extendedprice', count(*),
             |    sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END),
             |    count(DISTINCT l_extendedprice),
             |    CAST(CAST(min(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR),
             |    CAST(CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_linestatus', count(*),
             |    sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END),
             |    count(DISTINCT l_linestatus), min(l_linestatus), max(l_linestatus)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_orderkey', count(*),
             |    sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END),
             |    count(DISTINCT l_orderkey),
             |    CAST(min(l_orderkey) AS VARCHAR), CAST(max(l_orderkey) AS VARCHAR)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_quantity', count(*),
             |    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END),
             |    count(DISTINCT l_quantity),
             |    CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR),
             |    CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_returnflag', count(*),
             |    sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END),
             |    count(DISTINCT l_returnflag), min(l_returnflag), max(l_returnflag)
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_shipdate', count(*),
             |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END),
             |    count(DISTINCT l_shipdate),
             |    strftime(min(l_shipdate), '%Y-%m-%d'),
             |    strftime(max(l_shipdate), '%Y-%m-%d')
             |  FROM lineitem
             |  UNION ALL
             |  SELECT 'l_tax_nonzero', count(*),
             |    sum(CASE WHEN nullif(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END),
             |    count(DISTINCT nullif(l_tax, 0.0)),
             |    CAST(CAST(min(nullif(l_tax, 0.0)) AS DECIMAL(18,2)) AS VARCHAR),
             |    CAST(CAST(max(nullif(l_tax, 0.0)) AS DECIMAL(18,2)) AS VARCHAR)
             |  FROM lineitem)
             |SELECT "column", CAST(n_rows AS BIGINT) AS n_rows,
             |  CAST(n_null AS BIGINT) AS n_null,
             |  CAST(n_distinct AS BIGINT) AS n_distinct, min_s, max_s
             |FROM p ORDER BY "column"""".stripMargin)),

    // ── q100: MAD robust outliers — the median-based twin of q58's
    // z-score: median absolute deviation is unmoved by the very
    // outliers it hunts (a heavy-tailed crawl's mean/stddev are
    // dragged by the tail; its median/MAD are not). Flag
    // |v − med| > 3σ-equivalent = 3·1.4826·MAD per event_type.
    //
    // Determinism: both engines interpolate the exact median with the
    // same lower + frac·(upper − lower) arithmetic (the q41
    // precedent), so med — and therefore every |v − med| — is
    // bit-identical, the second median over those deviations is
    // bit-identical, and the outlier comparison `adev > mad·4.4478`
    // resolves identically. med/mad round to 6 decimals for display
    // only.
    //
    // Scale: exact per-group percentiles ship each group's values to
    // its reducer — the same by-design oracle-anchor cost as q41, with
    // q55's sketch as the 100 TB twin. Three passes over events, two
    // tiny broadcasts (|types| rows) back.
    QueryDef(
      "q100_mad_outliers",
      (s, d) => {
        val med = t(s, d, "events").groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = t(s, d, "events").join(broadcast(med), Seq("event_type"))
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), Seq("event_type"))
          .groupBy(col("event_type"), col("med"), col("mad"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(when(col("adev") > col("mad") * 4.4478, 1L).otherwise(0L))
              .cast("long").as("n_outliers"))
          .select(col("event_type"), round(col("med"), 6).as("med"),
            round(col("mad"), 6).as("mad"), col("n"), col("n_outliers"))
          .orderBy(col("event_type"))
      },
      Some("""WITH med AS (SELECT event_type,
             |    quantile_cont(value, 0.5) AS med
             |  FROM events GROUP BY 1),
             |dev AS (SELECT e.event_type, med, abs(value - med) AS adev
             |  FROM events e JOIN med USING (event_type)),
             |mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
             |  FROM dev GROUP BY 1)
             |SELECT event_type, round(med, 6) AS med, round(mad, 6) AS mad,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN adev > mad * 4.4478 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_outliers
             |FROM dev JOIN mad USING (event_type)
             |GROUP BY event_type, med, mad
             |ORDER BY event_type""".stripMargin)),

    // ── q101: referential-integrity AUDIT — every FK edge of the star
    // schema checked in one report (the data-quality gate a warehouse
    // runs after ingest; the relational sibling of q93's per-column
    // profile). Per edge: child rows, null keys, distinct keys, and
    // orphans (non-null child keys with no parent row).
    //
    // Scale shape: each edge is ONE left-outer equi-join of the
    // child's key column (pruned scan — only the key bytes read)
    // against the parent's distinct key, all four measures in a
    // single aggregate over the joined frame — no separate anti-join
    // pass, no 1-row crossJoin. Dim parents broadcast under AQE's
    // threshold automatically; the lineitem→orders edge shuffles on
    // the key, which is exactly the partitioning a 100 TB audit wants.
    QueryDef(
      "q101_fk_audit",
      (s, d) => {
        def audit(edge: String, child: DataFrame, key: String,
            parent: DataFrame, pkey: String): DataFrame =
          child.select(col(key).as("k"))
            .join(parent.select(col(pkey).as("k")).distinct()
              .withColumn("hit", lit(1)), Seq("k"), "left_outer")
            .agg(count(lit(1)).cast("long").as("n_child"),
              sum(when(col("k").isNull, 1L).otherwise(0L)).cast("long")
                .as("n_null"),
              countDistinct(col("k")).cast("long").as("n_keys"),
              sum(when(col("k").isNotNull && col("hit").isNull, 1L)
                .otherwise(0L)).cast("long").as("n_orphan"))
            .select(lit(edge).as("edge"), col("n_child"), col("n_null"),
              col("n_keys"), col("n_orphan"))
        Seq(
          audit("customer.c_nationkey->nation", t(s, d, "customer"),
            "c_nationkey", t(s, d, "nation"), "n_nationkey"),
          audit("lineitem.l_orderkey->orders", t(s, d, "lineitem"),
            "l_orderkey", t(s, d, "orders"), "o_orderkey"),
          audit("lineitem.l_partkey->part", t(s, d, "lineitem"),
            "l_partkey", t(s, d, "part"), "p_partkey"),
          audit("lineitem.l_suppkey->supplier", t(s, d, "lineitem"),
            "l_suppkey", t(s, d, "supplier"), "s_suppkey"),
          audit("nation.n_regionkey->region", t(s, d, "nation"),
            "n_regionkey", t(s, d, "region"), "r_regionkey"),
          audit("orders.o_custkey->customer", t(s, d, "orders"),
            "o_custkey", t(s, d, "customer"), "c_custkey"),
          audit("supplier.s_nationkey->nation", t(s, d, "supplier"),
            "s_nationkey", t(s, d, "nation"), "n_nationkey"))
          .reduce(_.unionAll(_))
          .orderBy(col("edge"))
      },
      Some {
        def sql(edge: String, child: String, key: String,
            parent: String, pkey: String): String =
          s"""SELECT '$edge' AS edge,
             |    CAST(count(*) AS BIGINT) AS n_child,
             |    CAST(sum(CASE WHEN c.$key IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n_null,
             |    CAST(count(DISTINCT c.$key) AS BIGINT) AS n_keys,
             |    CAST(sum(CASE WHEN c.$key IS NOT NULL AND p.$pkey IS NULL
             |      THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan
             |  FROM $child c
             |  LEFT JOIN (SELECT DISTINCT $pkey FROM $parent) p
             |    ON c.$key = p.$pkey"""
        Seq(
          sql("customer.c_nationkey->nation", "customer", "c_nationkey",
            "nation", "n_nationkey"),
          sql("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
            "orders", "o_orderkey"),
          sql("lineitem.l_partkey->part", "lineitem", "l_partkey",
            "part", "p_partkey"),
          sql("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
            "supplier", "s_suppkey"),
          sql("nation.n_regionkey->region", "nation", "n_regionkey",
            "region", "r_regionkey"),
          sql("orders.o_custkey->customer", "orders", "o_custkey",
            "customer", "c_custkey"),
          sql("supplier.s_nationkey->nation", "supplier", "s_nationkey",
            "nation", "n_nationkey"))
          .mkString("", "\n             |  UNION ALL\n             |  ",
            "\n             |ORDER BY edge").stripMargin
      }),

    // ── q102: event-type TRANSITION matrix — the first-order Markov
    // view of user behavior ("what follows what"): per time-ordered
    // user stream, count each (prev → next) event-type pair and its
    // conditional probability. The path-analysis primitive behind
    // funnels (q63) and next-action prediction features.
    //
    // Determinism: the per-user order is the q18 total order
    // (ts, event_id); prob derives from two exact counts with one
    // division, rounded to 6, on both engines.
    //
    // Scale shape: one shuffle on user_id for the lag window (per-user
    // streams are bounded — the q35/q18 sessionization grain), one
    // hash agg to the ≤ |types|² pair grain, per-prev totals broadcast
    // back. Corpus scanned once.
    QueryDef(
      "q102_event_transitions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val pairs = t(s, d, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("prev_type", lag(col("event_type"), 1).over(w))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).cast("long").as("cnt"))
        val tot = pairs.groupBy(col("prev_type"))
          .agg(sum(col("cnt")).cast("long").as("n_from"))
        pairs.join(broadcast(tot), Seq("prev_type"))
          .select(col("prev_type"), col("next_type"), col("cnt"),
            col("n_from"),
            round(col("cnt").cast("double") / col("n_from").cast("double"),
              6).as("prob"))
          .orderBy(col("prev_type"), col("next_type"))
      },
      Some("""WITH seq AS (SELECT user_id, event_type,
             |    lag(event_type, 1) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
             |  FROM events),
             |pairs AS (SELECT prev_type, event_type AS next_type,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2),
             |tot AS (SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS n_from
             |  FROM pairs GROUP BY 1)
             |SELECT prev_type, next_type, cnt, n_from,
             |  round(CAST(cnt AS DOUBLE) / CAST(n_from AS DOUBLE), 6) AS prob
             |FROM pairs JOIN tot USING (prev_type)
             |ORDER BY prev_type, next_type""".stripMargin)),

    // ── q103: OLS value-over-time trend per event_type — "is this
    // metric drifting, and how fast" (the regression face of q92's
    // drift detection: q92 says the distributions differ, q103 fits
    // the direction and rate). Least-squares slope/intercept of the
    // fixed-point value over the epoch-day index from the five
    // textbook moment sums (n, Σx, Σy, Σxy, Σx²), each accumulated
    // as an exact integer in DECIMAL(38,0)/HUGEINT (the q58 moment
    // discipline — LONG Σxy crosses 2⁶³ on a multi-year corpus;
    // honest bound: a 10¹³-row type with 10⁷-unit values puts n·Σxy
    // near 10³⁸, past which ANSI fails LOUDLY rather than wrapping).
    // Every derived quantity is double arithmetic in ONE literal op
    // order over those exact integers — numerator, denominator, the
    // division, the /100 descale, round 6 — so both engines round
    // identically at every step. The unrounded slope feeds the
    // intercept so the pair is self-consistent. Scale shape: one
    // corpus scan, map-side partial moments, one shuffle to the
    // |event_type| grain, slope arithmetic over |types| rows.
    QueryDef(
      "q103_ols_trend",
      (s, d) => {
        val xd = col("x").cast("decimal(19,0)")
        val yd = col("y").cast("decimal(19,0)")
        val dec38 = "decimal(38,0)"
        val m = t(s, d, "events")
          .select(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
              .cast("long").as("x"),
            Q.fxUnits(col("value"), 100).as("y"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n"),
            sum(xd.cast(dec38)).as("sx"),
            sum(yd.cast(dec38)).as("sy"),
            sum((xd * yd).cast(dec38)).as("sxy"),
            sum((xd * xd).cast(dec38)).as("sxx"))
        val nD = col("n").cast("double")
        val sxD = col("sx").cast("double")
        val syD = col("sy").cast("double")
        val num = nD * col("sxy").cast("double") - sxD * syD
        val den = nD * col("sxx").cast("double") - sxD * sxD
        val slopeRaw = num / den
        m.filter(col("n") >= 2 && den =!= lit(0.0))
          .select(col("event_type"), col("n"),
            round(slopeRaw / 100.0, 6).as("slope"),
            round(((syD - slopeRaw * sxD) / nD) / 100.0, 6).as("intercept"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT event_type,
             |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
             |      AS BIGINT) AS x,
             |    CAST(round(value*100) AS BIGINT) AS y FROM events),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
             |    sum(CAST(x AS HUGEINT)*y) AS sxy,
             |    sum(CAST(x AS HUGEINT)*x) AS sxx
             |  FROM e GROUP BY 1),
             |dm AS (SELECT event_type, n,
             |    CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE) AS num,
             |    CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE) AS den,
             |    CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
             |  FROM m)
             |SELECT event_type, n,
             |  round((num/den)/100.0, 6) AS slope,
             |  round(((syd - (num/den)*sxd)/CAST(n AS DOUBLE))/100.0, 6)
             |    AS intercept
             |FROM dm WHERE n >= 2 AND den <> 0.0
             |ORDER BY event_type""".stripMargin)),

    // ── q104: Pearson correlation matrix over lineitem's numeric
    // measures — the feature-redundancy read before any model or
    // sampling scheme trusts the columns as independent signals
    // (the pairwise sibling of q93's per-column profile). All 14
    // moment sums (4 Σc, 4 Σc², 6 Σxy) accumulate in ONE aggregate
    // over ONE scan as exact DECIMAL(38,0)/HUGEINT integers of the
    // scale-100 fixed-point units (Pearson r is invariant to the
    // common linear rescale, so the units choice cannot bias it);
    // r derives in double with the same literal op order both
    // engines run — numerator, two sqrt's, one division, round 6.
    // Scale shape: map-side partials to a SINGLE moment row (the
    // classic two-stage global aggregate), then the 6-pair matrix
    // unpivots from that one row via stack — output is 6 rows, no
    // second scan, no join.
    QueryDef(
      "q104_corr_matrix",
      (s, d) => {
        val meas = Seq("quantity" -> "l_quantity",
          "extendedprice" -> "l_extendedprice",
          "discount" -> "l_discount", "tax" -> "l_tax")
        val dec38 = "decimal(38,0)"
        val units = t(s, d, "lineitem").select(meas.map { case (a, c) =>
          Q.fxUnits(col(c), 100).cast("decimal(19,0)").as(a)
        }: _*)
        val moments: Seq[Column] =
          meas.flatMap { case (a, _) =>
            Seq(sum(col(a).cast(dec38)).as(s"s_$a"),
              sum((col(a) * col(a)).cast(dec38)).as(s"ss_$a"))
          } ++
            meas.combinations(2).map { case Seq((a, _), (b, _)) =>
              sum((col(a) * col(b)).cast(dec38)).as(s"sp_${a}_$b")
            }.toSeq
        val m = units.agg(count(lit(1)).cast("long").as("n"),
          moments: _*)
        val nD = col("n").cast("double")
        def r(a: String, b: String): Column = {
          val num = nD * col(s"sp_${a}_$b").cast("double") -
            col(s"s_$a").cast("double") * col(s"s_$b").cast("double")
          val da = nD * col(s"ss_$a").cast("double") -
            col(s"s_$a").cast("double") * col(s"s_$a").cast("double")
          val db = nD * col(s"ss_$b").cast("double") -
            col(s"s_$b").cast("double") * col(s"s_$b").cast("double")
          round(num / (sqrt(da) * sqrt(db)), 6)
        }
        val stacked = meas.combinations(2).map { case Seq((a, _), (b, _)) =>
          s"'$a', '$b', r_${a}_$b"
        }.mkString(", ")
        m.select(col("n") +: meas.combinations(2).map {
            case Seq((a, _), (b, _)) => r(a, b).as(s"r_${a}_$b")
          }.toSeq: _*)
          .selectExpr("n", s"stack(6, $stacked) AS (col_x, col_y, r)")
          .select(col("col_x"), col("col_y"), col("n"), col("r"))
          .orderBy(col("col_x"), col("col_y"))
      },
      Some {
        val meas = Seq("quantity", "extendedprice", "discount", "tax")
        val sums = meas.map(a =>
          s"sum(CAST(u_$a AS HUGEINT)) AS s_$a, " +
            s"sum(CAST(u_$a AS HUGEINT)*u_$a) AS ss_$a").mkString(", ")
        val crosses = meas.combinations(2).map { case Seq(a, b) =>
          s"sum(CAST(u_$a AS HUGEINT)*u_$b) AS sp_${a}_$b"
        }.mkString(", ")
        def rSql(a: String, b: String): String =
          s"round((CAST(n AS DOUBLE)*CAST(sp_${a}_$b AS DOUBLE) " +
            s"- CAST(s_$a AS DOUBLE)*CAST(s_$b AS DOUBLE)) / " +
            s"(sqrt(CAST(n AS DOUBLE)*CAST(ss_$a AS DOUBLE) " +
            s"- CAST(s_$a AS DOUBLE)*CAST(s_$a AS DOUBLE)) * " +
            s"sqrt(CAST(n AS DOUBLE)*CAST(ss_$b AS DOUBLE) " +
            s"- CAST(s_$b AS DOUBLE)*CAST(s_$b AS DOUBLE))), 6)"
        val pairRows = meas.combinations(2).map { case Seq(a, b) =>
          s"SELECT '$a' AS col_x, '$b' AS col_y, n, ${rSql(a, b)} AS r FROM m"
        }.mkString(" UNION ALL ")
        s"""WITH u AS (SELECT
           |    ${meas.map(a => s"CAST(round(l_$a*100) AS BIGINT) AS u_$a")
             .mkString(", ")}
           |  FROM lineitem),
           |m AS (SELECT CAST(count(*) AS BIGINT) AS n, $sums, $crosses
           |  FROM u)
           |$pairRows
           |ORDER BY col_x, col_y""".stripMargin
      }),

    // ── q105: top session-opening paths — the 3-step "how do sessions
    // begin" rollup (the sequence sibling of q102's one-step
    // transition matrix, over q35's exact session grain: same 2h gap,
    // same (ts, event_id) total order, so the two views cannot
    // disagree about what a session is). Only sessions with ≥3 events
    // rank — a 1-event bounce is not a path. Scale shape: the
    // session-id window shuffles once on user_id (bounded per-user
    // streams — the q35 grain); `rn <= 3` prunes to ≤3 rows per
    // session BEFORE the per-session pivot, so the second exchange
    // carries 3·|sessions| rows, never the corpus; path counting is a
    // hash agg to the |distinct paths| grain and top-20 is
    // TakeOrdered, never a global sort.
    QueryDef(
      "q105_session_paths",
      (s, d) => {
        val gapUs = 7200000000L // 2h — q35's session definition
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val wS = Window.partitionBy(col("user_id"), col("session_id"))
          .orderBy(col("ts_us"), col("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
          .withColumn("new_sess",
            when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L)
              .otherwise(0L))
          .withColumn("session_id",
            sum(col("new_sess"))
              .over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("rn", row_number().over(wS))
          .filter(col("rn") <= 3)
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("k"),
            max(when(col("rn") === 1, col("event_type"))).as("e1"),
            max(when(col("rn") === 2, col("event_type"))).as("e2"),
            max(when(col("rn") === 3, col("event_type"))).as("e3"))
          .filter(col("k") === 3)
          .select(concat_ws(" > ", col("e1"), col("e2"), col("e3"))
            .as("path"))
          .groupBy(col("path"))
          .agg(count(lit(1)).cast("long").as("n_sessions"))
          .orderBy(col("n_sessions").desc, col("path"))
          .limit(20)
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |    epoch_us(ts) AS ts_us FROM events),
             |g AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER
             |    (PARTITION BY user_id ORDER BY ts_us, event_id)
             |    > 7200000000 THEN 1 ELSE 0 END AS new_sess FROM e),
             |s AS (SELECT user_id, event_id, event_type, ts_us,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
             |      AS BIGINT) AS session_id FROM g),
             |r AS (SELECT *, row_number() OVER (PARTITION BY user_id,
             |    session_id ORDER BY ts_us, event_id) AS rn FROM s),
             |p AS (SELECT user_id, session_id, count(*) AS k,
             |    max(CASE WHEN rn = 1 THEN event_type END) AS e1,
             |    max(CASE WHEN rn = 2 THEN event_type END) AS e2,
             |    max(CASE WHEN rn = 3 THEN event_type END) AS e3
             |  FROM r WHERE rn <= 3 GROUP BY 1, 2),
             |c AS (SELECT concat_ws(' > ', e1, e2, e3) AS path,
             |    CAST(count(*) AS BIGINT) AS n_sessions
             |  FROM p WHERE k = 3 GROUP BY 1)
             |SELECT path, n_sessions FROM c
             |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin)),

    // ── q106: calendar-densified daily volume — the gap-filled daily
    // count series with a trailing-7-day moving average (the
    // time-series face q17/q43 lack: a day with NO events must appear
    // as an explicit zero, or every downstream rate/anomaly read
    // silently skips outages — the exact days worth looking at). The
    // day dimension is generated, not observed: explode(sequence(min,
    // max)) off a 1-row span aggregate, left-joined against the daily
    // rollup. The moving average is Σcnt/Σdays over the ACTUAL window
    // extent (first 6 days average over what exists — no phantom
    // zeros before the corpus starts), both exact integers, one
    // double division, round 6. Scale shape: one corpus scan to the
    // |days| rollup with map-side partials; everything after operates
    // on |days| rows — the calendar-bounded cardinality where a
    // single-partition window is CORRECT (q97's rule: thousands of
    // rows over any time span a corpus can have), not a q50 smell.
    QueryDef(
      "q106_calendar_density",
      (s, d) => {
        val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
        denseDaily(s, d)
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("cnt"),
            round(sum(col("cnt")).over(w).cast("double") /
              count(lit(1)).over(w).cast("double"), 6).as("ma7"))
          .orderBy(col("day"))
      },
      Some(s"""WITH ${denseDailySql()}
             |SELECT strftime(day, '%Y-%m-%d') AS day, cnt,
             |  round(CAST(sum(cnt) OVER w AS DOUBLE) /
             |    CAST(count(*) OVER w AS DOUBLE), 6) AS ma7
             |FROM dense
             |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
             |  AND CURRENT ROW)
             |ORDER BY day""".stripMargin)),

    // ── q109: CDC latest-per-key compaction — collapse a changelog to
    // the newest record per key, the materialize step every
    // upsert-fed table (and every "current user state" read over an
    // append-only event feed) runs. Version order is the total
    // (ts, event_id) order the session family (q35/q105) already
    // uses; event_id is unique, so the winner is deterministic. Scale
    // shape: ONE hash aggregate — max over a (ts_us, event_id, payload)
    // struct is lexicographic, so partial aggregation keeps only the
    // newest struct per key map-side and the exchange carries |keys|
    // rows, never the changelog. The window formulation (row_number
    // DESC = 1, the oracle's spelling) would shuffle EVERY version to
    // sort it; the agg formulation is the one that survives a 100 TB
    // changelog with a hot key.
    QueryDef(
      "q109_cdc_compact",
      (s, d) => {
        t(s, d, "events")
          .select(col("user_id"),
            struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
              col("event_type"), col("value")).as("v"))
          .groupBy(col("user_id"))
          .agg(max(col("v")).as("last"),
            count(lit(1)).cast("long").as("n_versions"))
          .select(col("user_id"),
            col("last.ts_us").as("last_ts_us"),
            col("last.event_id").as("last_event_id"),
            col("last.event_type").as("last_type"),
            col("last.value").as("last_value"),
            col("n_versions"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, value,
             |    epoch_us(ts) AS ts_us FROM events),
             |r AS (SELECT *,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts_us DESC, event_id DESC) AS rn,
             |    CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT)
             |      AS n_versions
             |  FROM e)
             |SELECT user_id, ts_us AS last_ts_us,
             |  event_id AS last_event_id, event_type AS last_type,
             |  value AS last_value, n_versions
             |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ── q112: level-shift changepoint audit on the daily volume
    // series — for every day with full 7-day flanks, compare the mean
    // of the NEXT 7 days against the PREVIOUS 7 and flag a ≥1.5×
    // move in either direction: the "did the feed change underneath
    // us" read behind every ingest-volume alarm (q82 catches hour
    // spikes; q112 catches sustained level shifts a one-hour z-score
    // never trips on). The FULL audited series ships, stable days
    // with direction NULL — on a healthy corpus the changepoint set
    // is empty, and a 0-row result is indistinguishable from a
    // broken query; the series is the evidence the detector ran
    // (the spec fires the trigger on a crafted step series). Runs
    // over the calendar-DENSIFIED series (q106's rule: a silent
    // outage day must count as zero, or the windows skip exactly the
    // days that matter). The 1.5× trigger is evaluated by exact
    // integer cross-multiplication (2·after ≥ 3·before resp.
    // 3·after ≤ 2·before) — no division, no floats, no epsilon,
    // identical in both engines; the reported ratio is display-only.
    // Scale shape: one corpus scan to the |days| rollup with
    // map-side partials; the windows run single-partition over the
    // calendar-bounded |days| frame (q106's justification), full
    // 7-day flanks required so series edges never alarm.
    QueryDef(
      "q112_changepoint",
      (s, d) => {
        val dense = denseDaily(s, d)
        val wB = Window.orderBy(col("day")).rowsBetween(-7, -1)
        val wA = Window.orderBy(col("day")).rowsBetween(1, 7)
        dense
          .withColumn("before_n", count(lit(1)).over(wB))
          .withColumn("after_n", count(lit(1)).over(wA))
          .withColumn("before_sum", sum(col("cnt")).over(wB).cast("long"))
          .withColumn("after_sum", sum(col("cnt")).over(wA).cast("long"))
          .filter(col("before_n") === 7 && col("after_n") === 7)
          .withColumn("direction",
            when(col("after_sum") * 2 >= col("before_sum") * 3 &&
              col("after_sum") > col("before_sum"), lit("up"))
              .when(col("after_sum") * 3 <= col("before_sum") * 2 &&
                col("after_sum") < col("before_sum"), lit("down")))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("before_sum"), col("after_sum"), col("direction"),
            when(col("before_sum") > 0,
              round(col("after_sum").cast("double") /
                col("before_sum").cast("double"), 6)).as("ratio"))
          .orderBy(col("day"))
      },
      Some(s"""WITH ${denseDailySql()},
             |w AS (SELECT day,
             |    count(*) OVER wb AS before_n, count(*) OVER wa AS after_n,
             |    CAST(sum(cnt) OVER wb AS BIGINT) AS before_sum,
             |    CAST(sum(cnt) OVER wa AS BIGINT) AS after_sum
             |  FROM dense
             |  WINDOW wb AS (ORDER BY day ROWS BETWEEN 7 PRECEDING
             |      AND 1 PRECEDING),
             |    wa AS (ORDER BY day ROWS BETWEEN 1 FOLLOWING
             |      AND 7 FOLLOWING)),
             |g AS (SELECT *, CASE
             |    WHEN after_sum*2 >= before_sum*3 AND after_sum > before_sum
             |      THEN 'up'
             |    WHEN after_sum*3 <= before_sum*2 AND after_sum < before_sum
             |      THEN 'down' END AS direction
             |  FROM w WHERE before_n = 7 AND after_n = 7)
             |SELECT strftime(day, '%Y-%m-%d') AS day, before_sum,
             |  after_sum, direction,
             |  CASE WHEN before_sum > 0 THEN
             |    round(CAST(after_sum AS DOUBLE)/CAST(before_sum AS DOUBLE), 6)
             |  END AS ratio
             |FROM g ORDER BY day""".stripMargin)),

    // ── q113: k-anonymity audit over the event stream — before any
    // event-derived corpus ships, how identifying is the
    // quasi-identifier grain (event_type, day)? Each QI cell's k =
    // distinct users sharing that cell; a user alone in a cell is
    // re-identifiable from the "anonymized" release (the privacy
    // sibling of q67's PII scrub: q67 redacts direct identifiers,
    // q113 measures the indirect ones). Per type: cell count, worst
    // k, cells below k=5, and the count of AT-RISK users — distinct
    // users who appear in ANY sub-5 cell (the actual damage number;
    // cell counts alone overstate or understate it depending on
    // overlap). Scale shape: corpus → distinct (type, day, user)
    // grain (one hash agg with map-side partials), cell sizes from
    // that grain (second agg, |cells| rows), risky cells join back
    // against the small per-type cell frame, distinct at-risk users
    // via one more bounded agg — every exchange is on aggregate
    // grains, never raw events.
    QueryDef(
      "q113_k_anonymity",
      (s, d) => {
        val grain = t(s, d, "events")
          .select(col("event_type"), to_date(col("ts")).as("day"),
            col("user_id"))
          .distinct()
        val cells = grain.groupBy(col("event_type"), col("day"))
          .agg(countDistinct(col("user_id")).as("k"))
        val perType = cells.groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n_cells"),
            min(col("k")).cast("long").as("min_k"),
            sum(when(col("k") < 5, 1L).otherwise(0L)).cast("long")
              .as("cells_lt5"))
        val atRisk = grain
          .join(cells.filter(col("k") < 5).select(col("event_type"),
            col("day")), Seq("event_type", "day"))
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("users_at_risk"))
        perType.join(atRisk, Seq("event_type"), "left")
          .select(col("event_type"), col("n_cells"), col("min_k"),
            col("cells_lt5"),
            coalesce(col("users_at_risk"), lit(0L)).as("users_at_risk"))
          .orderBy(col("event_type"))
      },
      Some("""WITH grain AS (SELECT DISTINCT event_type,
             |    CAST(ts AS DATE) AS day, user_id FROM events),
             |cells AS (SELECT event_type, day,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS k
             |  FROM grain GROUP BY 1, 2),
             |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_cells,
             |    CAST(min(k) AS BIGINT) AS min_k,
             |    CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS cells_lt5
             |  FROM cells GROUP BY 1),
             |ar AS (SELECT g.event_type,
             |    CAST(count(DISTINCT g.user_id) AS BIGINT) AS users_at_risk
             |  FROM grain g JOIN cells c
             |    ON g.event_type = c.event_type AND g.day = c.day
             |  WHERE c.k < 5 GROUP BY 1)
             |SELECT pt.event_type, n_cells, min_k, cells_lt5,
             |  coalesce(users_at_risk, 0) AS users_at_risk
             |FROM pt LEFT JOIN ar ON pt.event_type = ar.event_type
             |ORDER BY pt.event_type""".stripMargin)),

    // ── q116: inter-arrival burstiness per event type — gap
    // statistics over each user's consecutive-event intervals:
    // median and p90 gap plus the squared coefficient of variation
    // CV² = n·Σg²/(Σg)² − 1 (CV² ≈ 1 is Poisson-like arrival; ≫ 1 is
    // bursty — the replayed-firehose / bot-cadence read next to
    // q82's volume spikes and q112's level shifts; a scripted client
    // also shows as CV² ≈ 0, metronome cadence). Gaps are exact
    // integer micros off q18's (ts, event_id) total order. Scale
    // shape: one user_id-shuffle window pass (bounded per-user
    // streams — the sessionization grain), then the moment aggregate
    // runs map-side partial with Σg/Σg² in DECIMAL(38,0) (q58
    // discipline — a year of micros gaps squares past 2⁶³); the
    // exact percentile pair is the by-design oracle-anchor cost
    // (q41's rule, q55's sketch is the scale twin); |types| output
    // rows.
    QueryDef(
      "q116_interarrival",
      (s, d) => {
        val dec38 = "decimal(38,0)"
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val gaps = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
          .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(w))
          .filter(col("gap").isNotNull)
        gaps.groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n_gaps"),
            expr("percentile(gap, 0.5)").as("med_raw"),
            expr("percentile(gap, 0.9)").as("p90_raw"),
            sum(col("gap").cast(dec38)).as("sg"),
            sum((col("gap").cast("decimal(19,0)") *
              col("gap").cast("decimal(19,0)")).cast(dec38)).as("sgg"))
          .filter(col("n_gaps") >= 2)
          .select(col("event_type"), col("n_gaps"),
            round(col("med_raw") / 1000000.0, 6).as("med_gap_s"),
            round(col("p90_raw") / 1000000.0, 6).as("p90_gap_s"),
            round(col("n_gaps").cast("double") * col("sgg").cast("double") /
              (col("sg").cast("double") * col("sg").cast("double")) -
              lit(1.0), 6).as("cv2"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |    epoch_us(ts) AS ts_us FROM events),
             |g AS (SELECT event_type,
             |    ts_us - lag(ts_us) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id) AS gap
             |  FROM e),
             |f AS (SELECT event_type, gap FROM g WHERE gap IS NOT NULL),
             |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
             |    quantile_cont(gap, 0.5) AS med_raw,
             |    quantile_cont(gap, 0.9) AS p90_raw,
             |    sum(CAST(gap AS HUGEINT)) AS sg,
             |    sum(CAST(gap AS HUGEINT)*gap) AS sgg
             |  FROM f GROUP BY 1)
             |SELECT event_type, n_gaps,
             |  round(med_raw/1000000.0, 6) AS med_gap_s,
             |  round(p90_raw/1000000.0, 6) AS p90_gap_s,
             |  round(CAST(n_gaps AS DOUBLE)*CAST(sgg AS DOUBLE) /
             |    (CAST(sg AS DOUBLE)*CAST(sg AS DOUBLE)) - 1.0, 6) AS cv2
             |FROM a WHERE n_gaps >= 2 ORDER BY event_type""".stripMargin)),

    // ── q117: order↔lineitem price reconciliation audit — does the
    // header total equal the recomputed sum of its lines under the
    // TPC-H formula Σ extprice·(1−disc)·(1+tax)? The cross-table
    // data-quality gate q101's FK audit does not cover (q101 checks
    // the keys exist; q117 checks the MONEY agrees — double-applied
    // discounts, lost lines, and currency drift all land here, and on
    // this synthetic fixture the invariant genuinely fails for most
    // orders, so the report is non-degenerate). Per status: orders,
    // childless orders (no lines at all — a different failure than a
    // wrong sum), mismatches, worst |diff|, net drift. All money
    // flows as exact cent units (Q.fxUnits discipline): the per-line
    // product rounds once (both engines, same op order), sums are
    // LONG-exact, the diff is an integer compare — no float
    // reconciliation ever says "close enough". Scale shape: lineitem
    // aggregates to the |orders| grain with map-side partials, one
    // equi-join at that grain (the natural co-partition key), then a
    // |statuses|-row rollup.
    QueryDef(
      "q117_order_reconcile",
      (s, d) => {
        val lsum = t(s, d, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(Q.fxUnits(col("l_extendedprice") *
            (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")),
            100)).as("lsum_u"))
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"),
            Q.fxUnits(col("o_totalprice"), 100).as("o_u"))
          .join(lsum, col("o_orderkey") === col("l_orderkey"), "left")
          .withColumn("diff_u",
            when(col("lsum_u").isNotNull, col("o_u") - col("lsum_u")))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).cast("long").as("n_orders"),
            sum(when(col("lsum_u").isNull, 1L).otherwise(0L)).cast("long")
              .as("n_childless"),
            sum(when(col("diff_u") =!= 0L, 1L).otherwise(0L)).cast("long")
              .as("n_mismatched"),
            (max(abs(col("diff_u"))) / 100.0).as("max_abs_diff"),
            (sum(col("diff_u")) / 100.0).as("net_drift"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""WITH lsum AS (SELECT l_orderkey,
             |    sum(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)
             |      *100) AS BIGINT)) AS lsum_u
             |  FROM lineitem GROUP BY 1),
             |j AS (SELECT o_orderstatus,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS o_u, lsum_u,
             |    CASE WHEN lsum_u IS NOT NULL THEN
             |      CAST(round(o_totalprice*100) AS BIGINT) - lsum_u END
             |      AS diff_u
             |  FROM orders LEFT JOIN lsum ON o_orderkey = l_orderkey)
             |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
             |  CAST(sum(CASE WHEN lsum_u IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_childless,
             |  CAST(sum(CASE WHEN diff_u <> 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_mismatched,
             |  max(abs(diff_u))/100.0 AS max_abs_diff,
             |  sum(diff_u)/100.0 AS net_drift
             |FROM j GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)),

    // ── q118: per-type equi-width value histogram — the 10-bin shape
    // read behind q93's min/max profile (a profile says the range; a
    // histogram says where the mass sits — bimodality, clipping
    // walls, and heavy tails are invisible to min/max/mean). The
    // float trap is bin-edge assignment: a value ON an edge must land
    // in the same bin in both engines, so binning runs ENTIRELY in
    // exact cent units — bin = (u−lo)·10 div (hi−lo), clamped to 9
    // at u = hi, bounds back-derived with the same integer division;
    // no double ever decides a bin. Scale shape: per-type bounds are
    // one map-side-partial agg to |types| rows, broadcast back as an
    // equi-join (never a BNLJ), then one hash agg to the ≤
    // |types|×10 grain.
    QueryDef(
      "q118_value_hist",
      (s, d) => {
        val u = t(s, d, "events")
          .select(col("event_type"), Q.fxUnits(col("value"), 100).as("u"))
        val bounds = u.groupBy(col("event_type"))
          .agg(min(col("u")).as("lo_u"), max(col("u")).as("hi_u"))
        u.join(broadcast(bounds), Seq("event_type"))
          .withColumn("bin",
            when(col("hi_u") === col("lo_u"), lit(0L))
              .otherwise(least(lit(9L),
                expr("(u - lo_u) * 10 div (hi_u - lo_u)"))))
          .groupBy(col("event_type"), col("bin"), col("lo_u"), col("hi_u"))
          .agg(count(lit(1)).cast("long").as("n"))
          .select(col("event_type"), col("bin"),
            (expr("lo_u + bin * (hi_u - lo_u) div 10") / 100.0)
              .as("bin_lo"),
            (expr("lo_u + (bin + 1) * (hi_u - lo_u) div 10") / 100.0)
              .as("bin_hi"),
            col("n"))
          .orderBy(col("event_type"), col("bin"))
      },
      Some("""WITH u AS (SELECT event_type,
             |    CAST(round(value*100) AS BIGINT) AS u FROM events),
             |b AS (SELECT event_type, min(u) AS lo_u, max(u) AS hi_u
             |  FROM u GROUP BY 1),
             |binned AS (SELECT u.event_type,
             |    CASE WHEN hi_u = lo_u THEN 0
             |      ELSE least(9, (u - lo_u) * 10 // (hi_u - lo_u)) END
             |      AS bin,
             |    lo_u, hi_u
             |  FROM u JOIN b ON u.event_type = b.event_type)
             |SELECT event_type, CAST(bin AS BIGINT) AS bin,
             |  (lo_u + bin * (hi_u - lo_u) // 10)/100.0 AS bin_lo,
             |  (lo_u + (bin + 1) * (hi_u - lo_u) // 10)/100.0 AS bin_hi,
             |  CAST(count(*) AS BIGINT) AS n
             |FROM binned GROUP BY event_type, bin, lo_u, hi_u
             |ORDER BY event_type, bin""".stripMargin)),

    // ── q124: day-of-week seasonality profile — per (event_type,
    // ISO weekday) event mass with the within-type share and its
    // exact deviation from the uniform 1/7 (the seasonal read q106's
    // daily series implies but never aggregates: a type whose mass
    // piles onto two weekdays is a batch job wearing an event-stream
    // costume, and any weekly cadence biases every day-granularity
    // drift baseline upstream). dow is Monday=0: Spark's weekday()
    // and DuckDB's isodow()−1 agree on that convention (raw
    // dayofweek does NOT — Spark counts Sunday=1, DuckDB Sunday=0 —
    // the cross-engine trap this pins down). share and dev derive
    // from exact counts with one literal op order, round 6. Scale
    // shape: one corpus scan to the ≤ |types|×7 cell grain with
    // map-side partials, a |types|-row broadcast back for the
    // totals, output bounded by the calendar not the corpus.
    QueryDef(
      "q124_dow_seasonality",
      (s, d) => {
        val cells = t(s, d, "events")
          .groupBy(col("event_type"), expr("weekday(ts)").cast("long")
            .as("dow"))
          .agg(count(lit(1)).cast("long").as("n"))
        val totals = cells.groupBy(col("event_type"))
          .agg(sum(col("n")).cast("long").as("n_type"))
        cells.join(broadcast(totals), Seq("event_type"))
          .select(col("event_type"), col("dow"), col("n"),
            round(col("n").cast("double") / col("n_type").cast("double"), 6)
              .as("share"),
            round(col("n").cast("double") / col("n_type").cast("double") -
              lit(1.0) / lit(7.0), 6).as("dev_uniform"))
          .orderBy(col("event_type"), col("dow"))
      },
      Some("""WITH cells AS (SELECT event_type,
             |    CAST(isodow(ts) - 1 AS BIGINT) AS dow,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events GROUP BY 1, 2),
             |tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS n_type
             |  FROM cells GROUP BY 1)
             |SELECT cells.event_type, dow, n,
             |  round(CAST(n AS DOUBLE)/CAST(n_type AS DOUBLE), 6) AS share,
             |  round(CAST(n AS DOUBLE)/CAST(n_type AS DOUBLE) - 1.0/7.0, 6)
             |    AS dev_uniform
             |FROM cells JOIN tot ON cells.event_type = tot.event_type
             |ORDER BY cells.event_type, dow""".stripMargin)),

    // ── q125: join-key SKEW census — per FK edge, the per-key row
    // distribution (key count, mean, p99, max, and the hottest key's
    // rows): the number an engineer reads BEFORE choosing a join
    // strategy at scale, because max/p99 ≫ mean is exactly the skew
    // that pins one reducer and motivates salting (this query is the
    // measurement face of `operators/SkewJoin` — the engine's salted
    // miner exists because of the shape this query reports). Scale
    // shape: each edge is one hash agg of the child to its key grain
    // (map-side partials) then a tiny moment/percentile aggregate
    // over the |keys| frame — the exact p99 ships each edge's key
    // counts to one reducer, q41's by-design oracle-anchor rule
    // (q55's sketch is the scale twin).
    QueryDef(
      "q125_join_skew_audit",
      (s, d) => {
        def edge(name: String, child: String, key: String) =
          t(s, d, child)
            .groupBy(col(key)).agg(count(lit(1)).cast("long").as("cnt"))
            .agg(count(lit(1)).cast("long").as("n_keys"),
              sum(col("cnt")).cast("long").as("n_rows"),
              expr("percentile(cnt, 0.99)").as("p99_raw"),
              max(col("cnt")).cast("long").as("max_rows"))
            .select(lit(name).as("edge"), col("n_keys"),
              round(col("n_rows").cast("double") /
                col("n_keys").cast("double"), 6).as("mean_rows"),
              round(col("p99_raw"), 6).as("p99_rows"), col("max_rows"))
        Seq(edge("lineitem.l_orderkey", "lineitem", "l_orderkey"),
          edge("lineitem.l_partkey", "lineitem", "l_partkey"),
          edge("lineitem.l_suppkey", "lineitem", "l_suppkey"),
          edge("orders.o_custkey", "orders", "o_custkey"))
          .reduce(_.unionAll(_))
          .orderBy(col("edge"))
      },
      Some {
        def edgeSql(name: String, child: String, key: String) =
          s"""SELECT '$name' AS edge, CAST(count(*) AS BIGINT) AS n_keys,
             |    round(CAST(sum(cnt) AS DOUBLE)/CAST(count(*) AS DOUBLE), 6)
             |      AS mean_rows,
             |    round(quantile_cont(cnt, 0.99), 6) AS p99_rows,
             |    CAST(max(cnt) AS BIGINT) AS max_rows
             |  FROM (SELECT $key, CAST(count(*) AS BIGINT) AS cnt
             |    FROM $child GROUP BY 1)""".stripMargin
        Seq(edgeSql("lineitem.l_orderkey", "lineitem", "l_orderkey"),
          edgeSql("lineitem.l_partkey", "lineitem", "l_partkey"),
          edgeSql("lineitem.l_suppkey", "lineitem", "l_suppkey"),
          edgeSql("orders.o_custkey", "orders", "o_custkey"))
          .mkString("", "\nUNION ALL\n", "\nORDER BY edge")
      }),

    // ── q126: click→purchase time-to-convert — per user, the delay
    // from FIRST click to the first purchase at-or-after it; one
    // summary row (clickers, converted, conversion rate, median and
    // p90 delay in seconds): the attribution-latency read behind
    // funnel design (q63 counts ordered stage hits; q126 measures
    // the WAIT — the number that decides an attribution window).
    // Scale shape: two filtered aggregates collapse events to the
    // |users| grain BEFORE any join (map-side partials), one
    // equi-join on user_id at that grain, a second bounded agg for
    // the first eligible purchase, then a single-row moment/
    // percentile aggregate; delays are exact integer micros
    // (q18's total order), percentiles are the q41 oracle-anchor
    // price.
    QueryDef(
      "q126_time_to_convert",
      (s, d) => {
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"))
        val firstClick = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("c0"))
        val conv = ev.filter(col("event_type") === "purchase")
          .join(firstClick, Seq("user_id"))
          .filter(col("ts_us") >= col("c0"))
          .groupBy(col("user_id"))
          .agg((min(col("ts_us")) - max(col("c0"))).as("delay_us"))
        firstClick
          .join(conv.select(col("user_id"), col("delay_us")),
            Seq("user_id"), "left")
          .agg(count(lit(1)).cast("long").as("n_clickers"),
            sum(when(col("delay_us").isNotNull, 1L).otherwise(0L))
              .cast("long").as("n_converted"),
            expr("percentile(delay_us, 0.5)").as("med_raw"),
            expr("percentile(delay_us, 0.9)").as("p90_raw"))
          .select(col("n_clickers"), col("n_converted"),
            round(col("n_converted").cast("double") /
              col("n_clickers").cast("double"), 6).as("conv_rate"),
            round(col("med_raw") / 1000000.0, 6).as("med_delay_s"),
            round(col("p90_raw") / 1000000.0, 6).as("p90_delay_s"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
             |  FROM events),
             |fc AS (SELECT user_id, min(ts_us) AS c0 FROM e
             |  WHERE event_type = 'click' GROUP BY 1),
             |conv AS (SELECT e.user_id,
             |    min(ts_us) - max(c0) AS delay_us
             |  FROM e JOIN fc ON e.user_id = fc.user_id
             |  WHERE event_type = 'purchase' AND ts_us >= c0
             |  GROUP BY 1),
             |j AS (SELECT fc.user_id, delay_us
             |  FROM fc LEFT JOIN conv ON fc.user_id = conv.user_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_clickers,
             |  CAST(sum(CASE WHEN delay_us IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_converted,
             |  round(CAST(sum(CASE WHEN delay_us IS NOT NULL THEN 1 ELSE 0
             |    END) AS DOUBLE)/CAST(count(*) AS DOUBLE), 6) AS conv_rate,
             |  round(quantile_cont(delay_us, 0.5)/1000000.0, 6)
             |    AS med_delay_s,
             |  round(quantile_cont(delay_us, 0.9)/1000000.0, 6)
             |    AS p90_delay_s
             |FROM j""".stripMargin)),

    // ── q127: revenue concentration — the top-20 customers by order
    // revenue with per-customer and cumulative share (the 80/20 read
    // over the demand side; q120's coverage-curve shape pointed at
    // money instead of duplication — "how hostage is revenue to a
    // handful of accounts"). Scale shape: orders collapse to the
    // |customers| grain with exact cent sums (map-side partials),
    // top-20 plans as TakeOrdered, the 1-row revenue total
    // broadcasts (q91's scalar shape), rank/cumulative window runs
    // over exactly the 20 LIMIT rows.
    QueryDef(
      "q127_revenue_concentration",
      (s, d) => Q.coverageCurve(
          t(s, d, "orders")
            .groupBy(col("o_custkey"))
            .agg(sum(Q.fxUnits(col("o_totalprice"), 100)).as("rev_u"),
              count(lit(1)).cast("long").as("n_orders")),
          "o_custkey", "rev_u", 20)
        .select(col("rank"), col("o_custkey"), col("n_orders"),
          (col("rev_u") / 100.0).as("revenue"),
          col("share"), col("cum_share"))
        .orderBy(col("rank")),
      Some(s"""WITH pk AS (SELECT o_custkey,
             |    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS rev_u,
             |    CAST(count(*) AS BIGINT) AS n_orders
             |  FROM orders GROUP BY 1),
             |${Q.coverageCurveSql("o_custkey", "rev_u", 20)}
             |SELECT rank, o_custkey, n_orders, rev_u/100.0 AS revenue,
             |  round(CAST(rev_u AS DOUBLE)/CAST(tot_u AS DOUBLE), 6)
             |    AS share,
             |  round(CAST(cum_mass AS DOUBLE)/CAST(tot_u AS DOUBLE), 6)
             |    AS cum_share
             |FROM r CROSS JOIN tot ORDER BY rank""".stripMargin)),

    // ── q128: RFM customer segmentation — every customer bucketed by
    // Recency (days from the corpus's last order date to their last:
    // ≤365 / ≤730 / older), Frequency (1–2 / 3–5 / 6+ orders) and
    // Monetary (revenue terciles), with segment counts and revenue
    // share: the classic mixing read over the demand side (which
    // cells hold the business; "lapsed big spenders" = r2/r3 × m3 is
    // the cell every retention campaign targets). Determinism: R and
    // F cut on exact integers (days, counts); the M tercile
    // thresholds are the same quantile interpolation both engines
    // compute from identical cent-unit longs (q41's argument), and
    // revenues compare as exact integers against those thresholds.
    // Scale shape: orders → |customers| grain (one hash agg,
    // map-side partials); the (max date, t1, t2) scalars ride ONE
    // 1-row broadcast (q91's shape); bucketing is then map-side and
    // the final agg lands on ≤ 27 cells.
    QueryDef(
      "q128_customer_rfm",
      (s, d) => {
        val perCust = t(s, d, "orders")
          .groupBy(col("o_custkey"))
          .agg(max(to_date(col("o_orderdate"))).as("last_d"),
            count(lit(1)).cast("long").as("freq"),
            sum(Q.fxUnits(col("o_totalprice"), 100)).as("rev_u"))
        val scal = perCust.agg(max(col("last_d")).as("max_d"),
          expr("percentile(rev_u, CAST(1 AS DOUBLE)/3)").as("t1"),
          expr("percentile(rev_u, CAST(2 AS DOUBLE)/3)").as("t2"))
        perCust.crossJoin(broadcast(scal))
          .withColumn("r_bucket",
            when(datediff(col("max_d"), col("last_d")) <= 365, "r1_active")
              .when(datediff(col("max_d"), col("last_d")) <= 730,
                "r2_cooling")
              .otherwise("r3_lapsed"))
          .withColumn("f_bucket",
            when(col("freq") <= 2, "f1_rare")
              .when(col("freq") <= 5, "f2_regular")
              .otherwise("f3_frequent"))
          .withColumn("m_bucket",
            when(col("rev_u").cast("double") <= col("t1"), "m1_low")
              .when(col("rev_u").cast("double") <= col("t2"), "m2_mid")
              .otherwise("m3_high"))
          .groupBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
          .agg(count(lit(1)).cast("long").as("n_customers"),
            sum(col("rev_u")).as("seg_u"))
          .withColumn("revenue", col("seg_u") / 100.0)
          .drop("seg_u")
          .orderBy(col("r_bucket"), col("f_bucket"), col("m_bucket"))
      },
      Some("""WITH pc AS (SELECT o_custkey,
             |    max(CAST(o_orderdate AS DATE)) AS last_d,
             |    CAST(count(*) AS BIGINT) AS freq,
             |    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS rev_u
             |  FROM orders GROUP BY 1),
             |scal AS (SELECT max(last_d) AS max_d,
             |    quantile_cont(rev_u, CAST(1 AS DOUBLE)/3) AS t1,
             |    quantile_cont(rev_u, CAST(2 AS DOUBLE)/3) AS t2
             |  FROM pc),
             |b AS (SELECT
             |    CASE WHEN date_diff('day', last_d, max_d) <= 365
             |      THEN 'r1_active'
             |      WHEN date_diff('day', last_d, max_d) <= 730
             |      THEN 'r2_cooling' ELSE 'r3_lapsed' END AS r_bucket,
             |    CASE WHEN freq <= 2 THEN 'f1_rare'
             |      WHEN freq <= 5 THEN 'f2_regular'
             |      ELSE 'f3_frequent' END AS f_bucket,
             |    CASE WHEN CAST(rev_u AS DOUBLE) <= t1 THEN 'm1_low'
             |      WHEN CAST(rev_u AS DOUBLE) <= t2 THEN 'm2_mid'
             |      ELSE 'm3_high' END AS m_bucket,
             |    rev_u
             |  FROM pc CROSS JOIN scal)
             |SELECT r_bucket, f_bucket, m_bucket,
             |  CAST(count(*) AS BIGINT) AS n_customers,
             |  sum(rev_u)/100.0 AS revenue
             |FROM b GROUP BY 1, 2, 3
             |ORDER BY r_bucket, f_bucket, m_bucket""".stripMargin)),

    // ── q129: day-over-day top movers — the 10 largest absolute
    // day-over-day volume swings per (event_type, day), with the
    // signed delta and the percent change (the "what changed
    // yesterday" triage read that turns q106's series into a ranked
    // worklist; q112 flags sustained shifts, q129 surfaces the
    // single-day jumps worth a human look). Runs over the
    // calendar-DENSIFIED per-type series (q106's rule — a silent
    // day IS a move, to zero), so day-1 rows exist for every gap.
    // Scale shape: one corpus scan to the |types×days| rollup
    // (map-side partials), the lag window shuffles only that
    // calendar-bounded frame partitioned by type, top-10 is
    // TakeOrdered on |Δ| with exact-integer tiebreaks.
    QueryDef(
      "q129_top_movers",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        denseDaily(s, d, Some("event_type"))
          .withColumn("prev", lag(col("cnt"), 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("delta", col("cnt") - col("prev"))
          .select(col("event_type"),
            date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("prev"), col("cnt"), col("delta"),
            when(col("prev") > 0,
              round(col("delta").cast("double") /
                col("prev").cast("double"), 6)).as("pct_change"))
          .orderBy(abs(col("delta")).desc, col("event_type"), col("day"))
          .limit(10)
      },
      Some(s"""WITH ${denseDailySql(Some("event_type"))},
             |l AS (SELECT event_type, day, cnt,
             |    lag(cnt) OVER (PARTITION BY event_type ORDER BY day)
             |      AS prev
             |  FROM dense)
             |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, prev,
             |  cnt, cnt - prev AS delta,
             |  CASE WHEN prev > 0 THEN
             |    round(CAST(cnt - prev AS DOUBLE)/CAST(prev AS DOUBLE), 6)
             |  END AS pct_change
             |FROM l WHERE prev IS NOT NULL
             |ORDER BY abs(cnt - prev) DESC, event_type, day
             |LIMIT 10""".stripMargin)),

    // ── q130: gaps-and-islands activity streaks — each user's
    // LONGEST run of consecutive active days (plus their active-day
    // count and streak window), top-20 streaks: the classic
    // gaps-and-islands pattern (the engagement read behind retention
    // mechanics, and the one standard SQL window idiom the suite had
    // not yet exercised). The island key is the date-minus-row_number
    // constant: consecutive days share it, any gap shifts it — pure
    // per-user window arithmetic, no self-join. Scale shape: events
    // collapse to the distinct (user, day) grain first (one hash
    // agg), the row_number window shuffles that bounded grain once
    // on user_id (q35's sessionization partitioning), islands
    // aggregate per (user, island) then per user, top-20 is
    // TakeOrdered.
    QueryDef(
      "q130_activity_streaks",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val days = t(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day"))
          .distinct()
        val islands = days
          .withColumn("grp",
            date_sub(col("day"), row_number().over(w)))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).cast("long").as("len"),
            min(col("day")).as("from_d"), max(col("day")).as("to_d"))
        val best = islands
          .groupBy(col("user_id"))
          .agg(max(struct(col("len"), col("from_d"), col("to_d")))
            .as("b"),
            sum(col("len")).cast("long").as("n_active_days"))
        best
          .select(col("user_id"), col("n_active_days"),
            col("b.len").as("streak_days"),
            date_format(col("b.from_d"), "yyyy-MM-dd").as("streak_from"),
            date_format(col("b.to_d"), "yyyy-MM-dd").as("streak_to"))
          .orderBy(col("streak_days").desc, col("user_id"))
          .limit(20)
      },
      Some("""WITH days AS (SELECT DISTINCT user_id,
             |    CAST(ts AS DATE) AS day FROM events),
             |r AS (SELECT user_id, day,
             |    day - CAST(row_number() OVER (PARTITION BY user_id
             |      ORDER BY day) AS INTEGER) AS grp
             |  FROM days),
             |isl AS (SELECT user_id, grp,
             |    CAST(count(*) AS BIGINT) AS len,
             |    min(day) AS from_d, max(day) AS to_d
             |  FROM r GROUP BY 1, 2),
             |best AS (SELECT user_id,
             |    max({'len': len, 'from_d': from_d, 'to_d': to_d}) AS b,
             |    CAST(sum(len) AS BIGINT) AS n_active_days
             |  FROM isl GROUP BY 1)
             |SELECT user_id, n_active_days,
             |  b.len AS streak_days,
             |  strftime(b.from_d, '%Y-%m-%d') AS streak_from,
             |  strftime(b.to_d, '%Y-%m-%d') AS streak_to
             |FROM best
             |ORDER BY streak_days DESC, user_id LIMIT 20""".stripMargin)),

    // ── q132: trailing-30-day rolling revenue per customer at every
    // order — a RANGE frame over event-TIME (days), not a ROWS
    // frame: two orders on the same day are peers and always roll up
    // together, and the window reaches back 29 calendar days however
    // many order rows that spans — the one standard window-frame
    // variant the suite had not exercised (q43's moving average is
    // ROWS-based; q61's coverage is explode-based). The frame key is
    // exact epoch days (integers both engines), revenue is exact
    // cent units, so every frame boundary and every sum is
    // bit-identical. Scale shape: ONE shuffle on o_custkey (bounded
    // per-customer order streams — the q35 sessionization grain),
    // the range frame evaluates per partition in one pass; output is
    // the order grain itself.
    QueryDef(
      "q132_rolling_revenue",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("epoch_day"))
          .rangeBetween(-29, 0)
        t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
              .cast("long").as("epoch_day"),
            Q.fxUnits(col("o_totalprice"), 100).as("u"))
          .withColumn("rev30_u", sum(col("u")).over(w).cast("long"))
          .select(col("o_custkey"), col("o_orderkey"),
            date_format(date_add(lit("1970-01-01").cast("date"),
              col("epoch_day").cast("int")), "yyyy-MM-dd").as("day"),
            (col("u") / 100.0).as("order_rev"),
            (col("rev30_u") / 100.0).as("rev_30d"))
          .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey,
             |    date_diff('day', DATE '1970-01-01',
             |      CAST(o_orderdate AS DATE)) AS epoch_day,
             |    CAST(round(o_totalprice*100) AS BIGINT) AS u
             |  FROM orders)
             |SELECT o_custkey, o_orderkey,
             |  strftime(DATE '1970-01-01' +
             |    to_days(CAST(epoch_day AS INTEGER)), '%Y-%m-%d') AS day,
             |  u/100.0 AS order_rev,
             |  CAST(sum(u) OVER (PARTITION BY o_custkey ORDER BY epoch_day
             |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    /100.0 AS rev_30d
             |FROM o ORDER BY o_custkey, day, o_orderkey""".stripMargin)),

    // ── q135: market-basket part affinity — the top-20 part pairs by
    // LIFT (co-order rate over independence: lift = c_ab·N /
    // (o_a·o_b)) with a support floor, the association-mining
    // primitive behind "frequently bought together" (raw co-counts
    // just surface the two most popular parts; lift normalizes the
    // marginals away — q111's PMI argument on baskets instead of
    // token windows). Support ≥ 2 kills the single-co-occurrence
    // noise lift is notorious for. Scale shape: lineitem collapses
    // to the DISTINCT (order, part) grain first (one hash agg), then
    // to BASKETS (sorted part lists per order — bounded by order
    // size, a domain constant ≤ ~13, never corpus-scale); pairs
    // explode from each basket MAP-SIDE via an index HOF (sortedness
    // gives part_a < part_b for free), so only the pair-grain agg
    // exchanges — q121's rule. The pre-r11 form self-joined op on
    // l_orderkey instead: same output, but it sorted the corpus-grain
    // frame TWICE for the SMJ, and the sf10-under-4 GiB probe killed
    // it in the spill-merge (hundreds of spill-file readers × tasks);
    // the basket HOF removes that join at every scale. Marginal
    // order-counts attach via |parts|-keyed equi-joins; the 1-row
    // order total broadcasts (q91's scalar shape); lift derives from
    // exact DECIMAL(38,0)/HUGEINT integer products with ONE division,
    // round 6; top-20 is TakeOrdered.
    //
    // A-priori support prune (considered, MEASURED VACUOUS here): any
    // pair with c_ab ≥ 2 needs both parts in ≥ 2 baskets, so parts
    // with o_cnt < 2 could leave `op` before the basket build. On
    // this fixture the floor prunes NOTHING — 0 of 2 000 parts at
    // sf0.01 and 0 of 20 000 at sf0.1 have support < 2 (TPC-H's
    // uniform part→order assignment puts every part in ~30 orders at
    // every SF, and the replica scaling preserves the per-replica
    // distribution) — while the semi-join would add two corpus-grain
    // exchanges (op re-keyed to l_partkey, then back to l_orderkey).
    // On a Zipf-tailed retail corpus the same one-line prune (semi-
    // join op against marg.filter(o_cnt >= 2)) IS the classic
    // a-priori first pass and pays for itself; the support floor is
    // data-dependent, so the prune belongs behind a measured gate,
    // not in the fixture plan.
    QueryDef(
      "q135_market_basket",
      (s, d) => {
        val dec19 = "decimal(19,0)"
        val dec38 = "decimal(38,0)"
        val op = t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        // marg rides the DIAGONAL of the pair explode (r14): the
        // former per-part order-count branch cloned the lineitem→
        // distinct→baskets corpus tower (Catalyst per-consumer copy,
        // diverged pruning, no exchange reuse — lineitem EXECUTED 3×,
        // finalized-plan ranScans). The explode now starts each
        // window at i+1 instead of i+2, so every basket also emits
        // (x, x) — and count(a, a) IS part a's basket count, the
        // exact `marg`. o_a/o_b come from windows over the pair
        // aggregate (partition (a, *) / (*, b) always contains its
        // diagonal), c_ab=1 off-diagonals drop BEFORE the windows so
        // the window mass matches the old filtered join input. The
        // 1-row order total keeps its own pruned scan: n_orders is
        // not derivable from pair counts, and that branch reads ONE
        // int64 column. lineitem executions 3 → 2; both |parts|-keyed
        // joins gone. Output unchanged (oracle hash-green).
        val tot = op.select(col("l_orderkey")).distinct()
          .agg(count(lit(1)).cast("long").as("n_orders"))
        val baskets = op.groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(col("l_partkey"))).as("ps"))
        val diag = (side: String) => max(when(
          col("part_a") === col("part_b"), col("c_ab")))
          .over(Window.partitionBy(col(side)))
        val pairs = baskets
          .select(explode(expr(
            "flatten(transform(ps, (x, i) -> " +
              "transform(slice(ps, i + 1, size(ps)), " +
              "y -> struct(x AS part_a, y AS part_b))))")).as("p"))
          .select(col("p.part_a"), col("p.part_b"))
          .groupBy(col("part_a"), col("part_b"))
          .agg(count(lit(1)).cast("long").as("c_ab"))
          .filter(col("part_a") === col("part_b") || col("c_ab") >= 2)
        pairs
          .withColumn("o_a", diag("part_a"))
          .withColumn("o_b", diag("part_b"))
          .filter(col("part_a") < col("part_b"))
          .crossJoin(broadcast(tot))
          .select(col("part_a"), col("part_b"), col("c_ab"),
            round((col("c_ab").cast(dec19) * col("n_orders").cast(dec19))
              .cast(dec38).cast("double") /
              (col("o_a").cast(dec19) * col("o_b").cast(dec19))
                .cast(dec38).cast("double"), 6).as("lift"))
          .orderBy(col("lift").desc, col("part_a"), col("part_b"))
          .limit(20)
      },
      Some("""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey
             |  FROM lineitem),
             |marg AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS o_cnt
             |  FROM op GROUP BY 1),
             |tot AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
             |    AS n_orders FROM op),
             |pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             |    CAST(count(*) AS BIGINT) AS c_ab
             |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
             |    AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 2)
             |SELECT part_a, part_b, c_ab,
             |  round(CAST(CAST(c_ab AS HUGEINT)*n_orders AS DOUBLE) /
             |    CAST(CAST(ma.o_cnt AS HUGEINT)*mb.o_cnt AS DOUBLE), 6)
             |    AS lift
             |FROM pairs
             |JOIN marg ma ON ma.l_partkey = part_a
             |JOIN marg mb ON mb.l_partkey = part_b
             |CROSS JOIN tot
             |ORDER BY lift DESC, part_a, part_b LIMIT 20""".stripMargin)),

    // ── q136: windowed SEQUENTIAL funnel — view → first click AFTER
    // that view → first purchase AFTER that click, completed only
    // when the whole chain fits in 24 h: the attribution-window
    // funnel q63 deliberately is not (q63 compares independent
    // first-touch times, which calls a user who clicked before ever
    // viewing "stage 1" and ignores how long conversion took; q126
    // measures one hop's wait — q136 gates the full chain). Stage
    // times are exact integer micros; every comparison is integer.
    // Scale shape: three conditional aggregates, each collapsing the
    // event stream to the |users| grain BEFORE its join (map-side
    // partials, user-keyed equi-joins — the q126 shape extended one
    // stage); the final single-row rollup closes with exact counts
    // and two rounded rates.
    QueryDef(
      "q136_funnel_window",
      (s, d) => {
        // ONE corpus pass, SKEW-BOUNDED state: three chained
        // user-partitioned windows — v = min view stamp, c = min
        // click strictly after v, p = min purchase strictly after c
        // (the sequential dependency is legal because each window
        // reads the previous one's output; same partitioning → ONE
        // exchange + ONE sort for all three, and the groupBy after
        // them reuses the distribution). Equal to the former
        // sorted-list fold exactly: "first qualifying in ascending
        // order" IS "min qualifying", with strictly-greater on the
        // epoch-micro stamp in both forms (an equal-stamp
        // click/purchase never counts). The fold buffered each
        // user's FULL event list in a non-spillable aggregation
        // buffer — unbounded per-group state under a bot-grade
        // skewed user (r13 ADVICE) — where WindowExec's per-group
        // buffer spills past a threshold, so the hot user costs disk,
        // not heap. Still one corpus scan (the r12 duplicated-
        // subtree class stays fixed).
        val dayUs = 86400000000L
        val byUser = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")
        t(s, d, "events")
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_type"))
          .withColumn("v", min(when(col("event_type") === "view",
            col("us"))).over(byUser))
          .withColumn("c", min(when(col("event_type") === "click" &&
            col("us") > col("v"), col("us"))).over(byUser))
          .withColumn("p", min(when(col("event_type") === "purchase" &&
            col("us") > col("c"), col("us"))).over(byUser))
          .groupBy(col("user_id"))
          .agg(max(col("v")).as("v"), max(col("c")).as("c"),
            max(col("p")).as("p"))
          .drop("user_id")
          .filter(col("v").isNotNull)
          .agg(count(lit(1)).cast("long").as("n_viewers"),
            count(col("c")).cast("long").as("n_clicked_after"),
            count(col("p")).cast("long").as("n_purchased_after"),
            sum(when(col("p").isNotNull &&
              col("p") - col("v") <= dayUs, 1L).otherwise(0L))
              .cast("long").as("n_completed_24h"))
          .select(col("n_viewers"), col("n_clicked_after"),
            col("n_purchased_after"), col("n_completed_24h"),
            round(col("n_purchased_after").cast("double") /
              col("n_viewers").cast("double"), 6).as("chain_rate"),
            round(col("n_completed_24h").cast("double") /
              col("n_viewers").cast("double"), 6).as("window_rate"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us
             |  FROM events
             |  WHERE event_type IN ('view', 'click', 'purchase')),
             |v0 AS (SELECT user_id, min(ts_us) AS v FROM e
             |  WHERE event_type = 'view' GROUP BY 1),
             |c0 AS (SELECT e.user_id, min(ts_us) AS c, max(v) AS v
             |  FROM e JOIN v0 ON e.user_id = v0.user_id
             |  WHERE event_type = 'click' AND ts_us > v GROUP BY 1),
             |p0 AS (SELECT e.user_id, min(ts_us) AS p, max(v) AS v
             |  FROM e JOIN c0 ON e.user_id = c0.user_id
             |  WHERE event_type = 'purchase' AND ts_us > c GROUP BY 1),
             |j AS (SELECT v0.user_id,
             |    CASE WHEN c0.user_id IS NOT NULL THEN 1 ELSE 0 END
             |      AS clicked,
             |    CASE WHEN p0.user_id IS NOT NULL THEN 1 ELSE 0 END
             |      AS purchased,
             |    CASE WHEN p0.user_id IS NOT NULL
             |      AND p0.p - p0.v <= 86400000000 THEN 1 ELSE 0 END
             |      AS completed
             |  FROM v0
             |  LEFT JOIN c0 ON v0.user_id = c0.user_id
             |  LEFT JOIN p0 ON v0.user_id = p0.user_id)
             |SELECT CAST(count(*) AS BIGINT) AS n_viewers,
             |  CAST(sum(clicked) AS BIGINT) AS n_clicked_after,
             |  CAST(sum(purchased) AS BIGINT) AS n_purchased_after,
             |  CAST(sum(completed) AS BIGINT) AS n_completed_24h,
             |  round(CAST(sum(purchased) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE), 6) AS chain_rate,
             |  round(CAST(sum(completed) AS DOUBLE) /
             |    CAST(count(*) AS DOUBLE), 6) AS window_rate
             |FROM j""".stripMargin)),

    // ── q137: anomalous users by event-mix DIVERGENCE — each user's
    // event-type distribution vs the corpus's, as Jensen–Shannon
    // divergence, top-20 most divergent (the behavioral bot/replay
    // read next to q116's cadence: a scraper is all 'view', a fraud
    // script all 'purchase' — mix divergence catches what volume and
    // timing stats miss). q108's exact-integer JSD machinery
    // transplanted to the (user, type) grain: p/m and q/m are the
    // integer rationals 2cN/(cN+gn) and 2gn/(cN+gn), each ln'd once
    // into micro-unit costs, weighted sums accumulate in
    // DECIMAL(38,0), two double divisions + round 6 close. A type
    // the user never emits contributes exactly ln2 on the q side
    // (cost of the c=0 row) — which is why the (user, type) grain
    // ENUMERATES all types per user: the |types| dimension (a
    // handful) crosses the |users| frame, never the corpus. Scale
    // shape: one corpus scan to |users|×|types| cells, the 1-row
    // global-mix frame broadcasts, divergence is a map-side cost
    // lookup + one hash agg per user, top-20 TakeOrdered.
    QueryDef(
      "q137_user_mix_divergence",
      (s, d) => {
        val dec19 = "decimal(19,0)"
        val dec38 = "decimal(38,0)"
        val ev = t(s, d, "events")
          .select(col("user_id"), col("event_type"))
        val cells = ev.groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).cast("long").as("c"))
        val users = cells.groupBy(col("user_id"))
          .agg(sum(col("c")).cast("long").as("n_u"))
        val global = cells.groupBy(col("event_type"))
          .agg(sum(col("c")).cast("long").as("g"))
        val tot = global.agg(sum(col("g")).cast("long").as("n_tot"))
        val full = users
          .crossJoin(broadcast(global.crossJoin(tot)))
          .join(cells, Seq("user_id", "event_type"), "left")
          .select(col("user_id"), col("n_u"), col("g"), col("n_tot"),
            coalesce(col("c"), lit(0L)).as("c"))
          .withColumn("den",
            (col("c").cast(dec19) * col("n_tot").cast(dec19) +
              col("g").cast(dec19) * col("n_u").cast(dec19)).cast(dec38))
        val costP = when(col("c") > 0,
          round(lit(1000000.0) * log(
            (lit(2).cast(dec19) * col("c").cast(dec19) *
              col("n_tot").cast(dec19)).cast(dec38).cast("double") /
              col("den").cast("double"))).cast("long")).otherwise(lit(0L))
        val costQ = round(lit(1000000.0) * log(
          (lit(2).cast(dec19) * col("g").cast(dec19) *
            col("n_u").cast(dec19)).cast(dec38).cast("double") /
            col("den").cast("double"))).cast("long")
        full
          .withColumn("cost_p", costP).withColumn("cost_q", costQ)
          .groupBy(col("user_id"))
          .agg(max(col("n_u")).as("n_events"),
            max(col("n_tot")).as("n_tot"),
            sum((col("c").cast(dec19) * col("cost_p").cast(dec19))
              .cast(dec38)).as("sump"),
            sum((col("g").cast(dec19) * col("cost_q").cast(dec19))
              .cast(dec38)).as("sumq"))
          .select(col("user_id"), col("n_events"),
            round(
              lit(0.5) * (col("sump").cast("double") /
                (col("n_events").cast("double") * lit(1000000.0))) +
                lit(0.5) * (col("sumq").cast("double") /
                  (col("n_tot").cast("double") * lit(1000000.0))), 6)
              .as("jsd"))
          .orderBy(col("jsd").desc, col("user_id"))
          .limit(20)
      },
      Some("""WITH cells AS (SELECT user_id, event_type,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |users AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_u
             |  FROM cells GROUP BY 1),
             |g AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS g
             |  FROM cells GROUP BY 1),
             |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n_tot FROM g),
             |fl AS (SELECT u.user_id, u.n_u, g.event_type, g.g,
             |    n_tot, coalesce(c, 0) AS c,
             |    CAST(coalesce(c, 0) AS HUGEINT)*n_tot
             |      + CAST(g.g AS HUGEINT)*u.n_u AS den
             |  FROM users u CROSS JOIN g CROSS JOIN tot
             |  LEFT JOIN cells ON cells.user_id = u.user_id
             |    AND cells.event_type = g.event_type),
             |costed AS (SELECT user_id, n_u, n_tot, c, g,
             |    CASE WHEN c > 0 THEN
             |      CAST(round(1000000.0*ln(CAST(2*CAST(c AS HUGEINT)*n_tot
             |        AS DOUBLE)/CAST(den AS DOUBLE))) AS BIGINT)
             |      ELSE 0 END AS cost_p,
             |    CAST(round(1000000.0*ln(CAST(2*CAST(g AS HUGEINT)*n_u
             |      AS DOUBLE)/CAST(den AS DOUBLE))) AS BIGINT) AS cost_q
             |  FROM fl),
             |a AS (SELECT user_id, max(n_u) AS n_events,
             |    max(n_tot) AS n_tot,
             |    sum(CAST(c AS HUGEINT)*cost_p) AS sump,
             |    sum(CAST(g AS HUGEINT)*cost_q) AS sumq
             |  FROM costed GROUP BY 1)
             |SELECT user_id, n_events,
             |  round(0.5*(CAST(sump AS DOUBLE)/(CAST(n_events AS DOUBLE)
             |      *1000000.0))
             |    + 0.5*(CAST(sumq AS DOUBLE)/(CAST(n_tot AS DOUBLE)
             |      *1000000.0)), 6) AS jsd
             |FROM a ORDER BY jsd DESC, user_id LIMIT 20""".stripMargin)),

    // ── q139: TIME-WEIGHTED average value per event type — each
    // event's value holds until the user's next event, and the mean
    // weights by that holding duration: the state-integral read for
    // any "current level" signal (billing meters, sensor readings,
    // session quality), where the plain average (q08) over-counts
    // rapid-fire updates and under-counts long-held states; the
    // plain mean ships alongside so the bias is visible. The last
    // event of each user stream has no successor and is excluded
    // (its holding time is unobserved — q106's honest-extent rule).
    // Exactness: durations are exact integer micros off q18's
    // (ts, event_id) total order, values are exact cent units, and
    // the value·duration products accumulate in DECIMAL(38,0)
    // (micros × cents crosses 2⁶³ fast — q58 discipline); each mean
    // is ONE double division, round 6. Scale shape: one user_id-
    // shuffle window pass (bounded per-user streams), then a
    // map-side-partial moment aggregate to |types| rows.
    QueryDef(
      "q139_time_weighted_value",
      (s, d) => {
        val dec19 = "decimal(19,0)"
        val dec38 = "decimal(38,0)"
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("ts_us"),
            Q.fxUnits(col("value"), 100).as("v_fx"))
          .withColumn("dur", lead(col("ts_us"), 1).over(w) - col("ts_us"))
          .filter(col("dur").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n_held"),
            sum(col("dur").cast(dec38)).as("sdur"),
            sum((col("v_fx").cast(dec19) * col("dur").cast(dec19))
              .cast(dec38)).as("svd"),
            sum(col("v_fx").cast(dec38)).as("sv"))
          .select(col("event_type"), col("n_held"),
            round(col("svd").cast("double") /
              (col("sdur").cast("double") * 100.0), 6).as("tw_avg"),
            round(col("sv").cast("double") /
              (col("n_held").cast("double") * 100.0), 6).as("plain_avg"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |    epoch_us(ts) AS ts_us,
             |    CAST(round(value*100) AS BIGINT) AS v_fx
             |  FROM events),
             |g AS (SELECT event_type, v_fx,
             |    lead(ts_us) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id) - ts_us AS dur
             |  FROM e),
             |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_held,
             |    sum(CAST(dur AS HUGEINT)) AS sdur,
             |    sum(CAST(v_fx AS HUGEINT)*dur) AS svd,
             |    sum(CAST(v_fx AS HUGEINT)) AS sv
             |  FROM g WHERE dur IS NOT NULL GROUP BY 1)
             |SELECT event_type, n_held,
             |  round(CAST(svd AS DOUBLE)/(CAST(sdur AS DOUBLE)*100.0), 6)
             |    AS tw_avg,
             |  round(CAST(sv AS DOUBLE)/(CAST(n_held AS DOUBLE)*100.0), 6)
             |    AS plain_avg
             |FROM a ORDER BY event_type""".stripMargin)),

    // ── q140: Benford first-digit audit — the observed first-
    // significant-digit distribution of order totals vs Benford's
    // law (P(d) = log₁₀(1 + 1/d)): the forensic read auditors run on
    // any money column, because fabricated or generator-capped
    // amounts drift from Benford long before any range check fires
    // (on THIS synthetic fixture the deviation is large — which is
    // itself the point: the audit correctly fingerprints a uniform
    // generator as non-natural data). First digits extract from the
    // exact cent units via string head — integer-exact in both
    // engines. The audited digit is the CENT amount's: a pure decimal
    // shift never moves the leading significant digit, but the cent
    // ROUNDING can carry across a power of ten (9.9999 → 1000 cents
    // reads 1, not 9), so amounts at rounding boundaries may report a
    // different digit than the raw double would — both engines derive
    // the cent units identically, so the statistic is still
    // bit-identical; it is defined over cent-unit amounts. Expected
    // shares are the same 9 closed-form doubles computed identically
    // on both sides; observed share and deviation are one division
    // each, round 6. Scale shape: one scan to a 9-row hash agg with
    // map-side partials; the total rides the same tiny frame via a
    // 9-row window (q09's ratio-of-total rule) — nothing broadcast,
    // nothing quadratic.
    QueryDef(
      "q140_benford_audit",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
        t(s, d, "orders")
          .select(Q.fxUnits(col("o_totalprice"), 100).as("u"))
          .filter(col("u") > 0)
          .select(substring(col("u").cast("string"), 1, 1).cast("long")
            .as("digit"))
          .groupBy(col("digit"))
          .agg(count(lit(1)).cast("long").as("n"))
          .withColumn("share",
            round(col("n").cast("double") /
              sum(col("n")).over(w).cast("double"), 6))
          .withColumn("benford",
            round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")),
              6))
          .withColumn("dev", round(col("share") - col("benford"), 6))
          .select(col("digit"), col("n"), col("share"), col("benford"),
            col("dev"))
          .orderBy(col("digit"))
      },
      Some("""WITH u AS (SELECT CAST(round(o_totalprice*100) AS BIGINT)
             |    AS u FROM orders),
             |dg AS (SELECT CAST(substr(CAST(u AS VARCHAR), 1, 1) AS BIGINT)
             |    AS digit
             |  FROM u WHERE u > 0),
             |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
             |  FROM dg GROUP BY 1),
             |sh AS (SELECT digit, n,
             |    round(CAST(n AS DOUBLE)/CAST(sum(n) OVER () AS DOUBLE), 6)
             |      AS share,
             |    round(log10(1.0 + 1.0/CAST(digit AS DOUBLE)), 6)
             |      AS benford
             |  FROM c)
             |SELECT digit, n, share, benford,
             |  round(share - benford, 6) AS dev
             |FROM sh ORDER BY digit""".stripMargin)),

    // ── q141: RIGHT OUTER join — returns coverage over the full part
    // catalog. The fact side is deliberately selective (high-quantity
    // returns: l_returnflag = 'R', l_quantity ≥ 40), so the preserved
    // RIGHT side genuinely null-extends: ~12% of parts have no such
    // return and must still appear in the brand rollup (the report a
    // merchandiser actually reads — "which brands have catalog items
    // the returns process never touched"). This closes the last join
    // shape in the declared family (inner/left/semi/anti/full/range/
    // as-of/lateral all exist; q83 closed FULL OUTER in r6).
    //
    // Scale shape: the fact side pre-aggregates to the part-key grain
    // BEFORE the join (map-side partials into one exchange at ≤|parts|
    // rows), then broadcasts into the catalog scan — a RightOuter
    // BroadcastHashJoin with the build on the aggregated left, so the
    // 100 TB fact table never joins at row grain and the catalog never
    // shuffles. Null-extension is audited by the n_never_returned
    // measure (counts right rows with no left match).
    QueryDef(
      "q141_right_outer",
      (s, d) => {
        val ret = t(s, d, "lineitem")
          .filter(col("l_returnflag") === "R" && col("l_quantity") >= 40)
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).cast("long").as("n_ret"),
            sum(col("l_quantity").cast("long")).cast("long").as("ret_units"),
            sum(Q.fxUnits(col("l_extendedprice"), 100)).cast("long")
              .as("ret_cents"))
        broadcast(ret)
          .join(t(s, d, "part"), col("l_partkey") === col("p_partkey"),
            "right_outer")
          .groupBy(col("p_brand").as("brand"))
          .agg(count(lit(1)).cast("long").as("n_parts"),
            sum(when(col("n_ret").isNull, 1L).otherwise(0L)).cast("long")
              .as("n_never_returned"),
            sum(coalesce(col("n_ret"), lit(0L))).cast("long")
              .as("n_ret_rows"),
            sum(coalesce(col("ret_units"), lit(0L))).cast("long")
              .as("ret_units"),
            sum(coalesce(col("ret_cents"), lit(0L))).cast("long")
              .as("ret_cents"))
          .orderBy(col("brand"))
      },
      Some("""WITH ret AS (
             |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_ret,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ret_units,
             |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT))
             |      AS BIGINT) AS ret_cents
             |  FROM lineitem
             |  WHERE l_returnflag = 'R' AND l_quantity >= 40
             |  GROUP BY 1)
             |SELECT p_brand AS brand, CAST(count(*) AS BIGINT) AS n_parts,
             |  CAST(sum(CASE WHEN n_ret IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_never_returned,
             |  CAST(sum(coalesce(n_ret, 0)) AS BIGINT) AS n_ret_rows,
             |  CAST(sum(coalesce(ret_units, 0)) AS BIGINT) AS ret_units,
             |  CAST(sum(coalesce(ret_cents, 0)) AS BIGINT) AS ret_cents
             |FROM ret RIGHT OUTER JOIN part ON l_partkey = p_partkey
             |GROUP BY 1 ORDER BY brand""".stripMargin)),

    // ── q142: approximate column profile — the 100 TB ANALYZE twin of
    // q93. q93's exact per-column distinct is the stated oracle-anchor
    // contract, and its price is k pruned scans + one distinct
    // exchange per column (the one-pass exact rewrite was MEASURED
    // WORSE — Spark's multi-distinct Expand groups on all 8 value
    // columns at once; BASELINE.md records the trap). HLL++ sketches
    // have no such trap: approx_count_distinct partials COMPOSE in a
    // single aggregate, so all 8 columns profile in ONE scan with
    // map-side partials and a 1-row final — no Expand, no per-column
    // exchange, no second pass. n_rows / n_null / min / max stay
    // exact (they were never the expensive part); only n_distinct is
    // sketched (rsd 0.01 — ~12k registers per column, still trivially
    // broadcast-size; rsd 0.02 measured 2.3% off on l_shipdate at
    // sf0.001, past the declared gate), gated ≤2% against q93's exact counts in
    // QueriesSpec. Approx by design → no DuckDB oracle (q45/q55
    // precedent; DuckDB's approx_count_distinct uses a different
    // sketch and cannot hash-match).
    QueryDef(
      "q142_column_profile_approx",
      (s, d) => {
        val li = t(s, d, "lineitem")
        val num = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,2)")
        val id = (c: org.apache.spark.sql.Column) => c
        val dt = (c: org.apache.spark.sql.Column) =>
          date_format(c, "yyyy-MM-dd")
        // Sketch keys: Datasketches HLL accepts int/long/string/binary,
        // so each column feeds through an INJECTIVE long/string map
        // (cents for the exact-2-decimal money/rate columns, micros
        // for the timestamp) — cardinality is preserved exactly, only
        // the estimate is approximate. lgConfigK 14 ≈ 0.8% rsd, well
        // inside the spec's 2% gate. The r7 lesson (BASELINE.md): 8
        // HLL++ `approx_count_distinct(rsd 0.01)` buffers flatten to
        // ~13k LONG slots, forcing a codegen-less SortAggregate
        // (measured 3.6 s — SLOWER than q93's exact 2.6 s); the
        // Datasketches agg keeps 8 opaque binary buffers in an
        // ObjectHashAggregate with sparse-mode updates (0.35 s).
        val cols: Seq[(String, org.apache.spark.sql.Column,
            org.apache.spark.sql.Column,
            org.apache.spark.sql.Column => org.apache.spark.sql.Column)] =
          Seq(
            ("l_discount", col("l_discount"),
              Q.fxUnits(col("l_discount"), 100), num),
            ("l_extendedprice", col("l_extendedprice"),
              Q.fxUnits(col("l_extendedprice"), 100), num),
            ("l_linestatus", col("l_linestatus"), col("l_linestatus"), id),
            ("l_orderkey", col("l_orderkey"), col("l_orderkey"), id),
            ("l_quantity", col("l_quantity"),
              Q.fxUnits(col("l_quantity"), 100), num),
            ("l_returnflag", col("l_returnflag"), col("l_returnflag"), id),
            ("l_shipdate", col("l_shipdate"),
              unix_micros(col("l_shipdate").cast("timestamp")), dt),
            ("l_tax_nonzero", nullif(col("l_tax"), lit(0.0)),
              Q.fxUnits(nullif(col("l_tax"), lit(0.0)), 100), num))
        val measures =
          count(lit(1)).cast("long").as("n_rows") +:
          cols.flatMap { case (n, c, sk, render) => Seq(
            sum(when(c.isNull, 1L).otherwise(0L)).cast("long")
              .as(s"null_$n"),
            hll_sketch_estimate(hll_sketch_agg(sk, 14)).cast("long")
              .as(s"nd_$n"),
            render(min(c)).cast("string").as(s"min_$n"),
            render(max(c)).cast("string").as(s"max_$n")) }
        val one = li.agg(measures.head, measures.tail: _*)
        val stacked = cols.map { case (n, _, _, _) =>
          s"'$n', null_$n, nd_$n, min_$n, max_$n" }.mkString(", ")
        one.selectExpr("n_rows",
            s"stack(${cols.size}, $stacked)" +
              " AS (column, n_null, n_distinct_approx, min_s, max_s)")
          .select(col("column"), col("n_rows"), col("n_null"),
            col("n_distinct_approx"), col("min_s"), col("max_s"))
          .orderBy(col("column"))
      },
      None),

    // ── q143: WEIGHTED percentiles — quantity-weighted p50/p90 of the
    // line price per return flag ("half the UNITS shipped sold at or
    // below this price" — the unit-weighted read; q41's unweighted
    // percentiles answer about rows, which over-represents small
    // orders). Lower-weighted-quantile definition: pₚ = min{v : cumw ≥
    // p·W} — entirely in exact integers (cumw·2 ≥ W for p50,
    // cumw·10 ≥ 9·W for p90; worst case ~5e15 at 10¹³ rows × qty 50,
    // inside long), so both engines resolve the same cent value and no
    // interpolation arithmetic exists to diverge.
    //
    // Scale shape: the corpus collapses FIRST to the (flag, price-cent)
    // grain — one hash agg with map-side partials whose output is
    // bounded by the PRICE DOMAIN (distinct cent values the price
    // range admits — ~10⁷ worst case), not by corpus rows; the cumsum
    // window then runs per flag over that domain-bounded frame, and
    // the |flags|-row totals broadcast back. At fixture sf the
    // collapsed grain is near row count (synthetic prices rarely
    // repeat), but at 100 TB the domain bound is what holds: the
    // window never sees corpus-scale input. The final rollup is a
    // |flags|-row conditional-min aggregate.
    QueryDef(
      "q143_weighted_percentile",
      (s, d) => {
        val base = t(s, d, "lineitem")
          .groupBy(col("l_returnflag").as("flag"),
            Q.fxUnits(col("l_extendedprice"), 100).as("cents"))
          .agg(sum(col("l_quantity").cast("long")).cast("long").as("w"))
        val tot = base.groupBy(col("flag"))
          .agg(sum(col("w")).cast("long").as("tw"))
        // the |flags|-partition window is DOMAIN-bounded, not
        // corpus-bounded: the grain aggregate above already collapsed
        // the corpus to (flag, distinct cents) rows, and the cents
        // domain is bounded by the price range — at any corpus scale
        // each flag's frame holds ≤ |distinct prices| rows, so the
        // 3-task window never funnels corpus mass (probed r8: the
        // keyed two-pass rewrite MEASURED 1.4× slower here because it
        // re-derives the grain for the offset pass — the two-pass
        // form is for corpus-grain rows, q90/q193)
        val cw = Window.partitionBy(col("flag")).orderBy(col("cents"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        base
          .withColumn("cumw", sum(col("w")).over(cw).cast("long"))
          .join(broadcast(tot), Seq("flag"))
          .groupBy(col("flag"))
          .agg(max(col("tw")).as("total_units"),
            min(when(col("cumw") * 2 >= col("tw"), col("cents"))).as("p50c"),
            min(when(col("cumw") * 10 >= col("tw") * 9, col("cents")))
              .as("p90c"))
          .select(col("flag"), col("total_units"),
            (col("p50c").cast("double") / 100.0).as("p50"),
            (col("p90c").cast("double") / 100.0).as("p90"))
          .orderBy(col("flag"))
      },
      Some("""WITH b AS (SELECT l_returnflag AS flag,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS cents,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
             |  FROM lineitem GROUP BY 1, 2),
             |t AS (SELECT flag, CAST(sum(w) AS BIGINT) AS tw
             |  FROM b GROUP BY 1),
             |c AS (SELECT b.flag, cents, w, tw,
             |    sum(w) OVER (PARTITION BY b.flag ORDER BY cents
             |      ROWS UNBOUNDED PRECEDING) AS cumw
             |  FROM b JOIN t ON t.flag = b.flag)
             |SELECT flag, CAST(max(tw) AS BIGINT) AS total_units,
             |  CAST(min(CASE WHEN cumw*2 >= tw THEN cents END)
             |    AS DOUBLE)/100.0 AS p50,
             |  CAST(min(CASE WHEN cumw*10 >= tw*9 THEN cents END)
             |    AS DOUBLE)/100.0 AS p90
             |FROM c GROUP BY flag ORDER BY flag""".stripMargin)),

    // ── q144: calendar GAP-FILL with last-observation-carried-forward
    // — per event type, the dense daily series where a day with no
    // events carries the previous observed day's mean value (the
    // standard time-series repair between a sparse event feed and any
    // model that wants one row per day: sensors, prices, meter
    // levels), plus the staleness age (days since the value was last
    // observed — the "how stale is this fill" column a consumer gates
    // on). Null before a type's first observation: there is nothing
    // honest to carry (q139's honest-extent rule).
    //
    // Determinism: the carried value is the daily exact-cent mean
    // rounded to 6 BEFORE the carry, so both engines forward
    // bit-identical doubles; staleness is exact DATE arithmetic.
    // Scale shape: the corpus collapses map-side to the (type, day)
    // grain (one hash agg); the calendar generates from the observed
    // span (explode(sequence), q61's rule — never a day×day join);
    // the LOCF window runs per type over the |days| calendar — a
    // DIMENSION-bounded frame (types × days, ~12.5 k rows at any
    // corpus size), so the unbounded-preceding frame is safe at any
    // scale.
    QueryDef(
      "q144_gap_fill",
      (s, d) => {
        val daily = t(s, d, "events")
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            sum(Q.fxUnits(col("value"), 100)).cast("long").as("cents"))
          .withColumn("day_avg",
            round(col("cents").cast("double") /
              (col("n_events").cast("double") * 100.0), 6))
        val days = daily
          .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
          .select(explode(sequence(col("lo"), col("hi"))).as("day"))
        val lw = Window.partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        daily.select(col("event_type")).distinct()
          .crossJoin(broadcast(days))
          .join(daily, Seq("event_type", "day"), "left")
          .withColumn("filled",
            last(col("day_avg"), ignoreNulls = true).over(lw))
          .withColumn("last_obs",
            last(when(col("n_events").isNotNull, col("day")),
              ignoreNulls = true).over(lw))
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("event_type"),
            coalesce(col("n_events"), lit(0L)).as("n_events"),
            col("filled"),
            datediff(col("day"), col("last_obs")).cast("long")
              .as("staleness_days"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM events GROUP BY 1, 2),
             |span AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
             |days AS (SELECT CAST(unnest(generate_series(lo, hi,
             |    INTERVAL 1 DAY)) AS DATE) AS day FROM span),
             |dense AS (SELECT t.event_type, days.day, n_events,
             |    round(CAST(cents AS DOUBLE) /
             |      (CAST(n_events AS DOUBLE)*100.0), 6) AS day_avg
             |  FROM (SELECT DISTINCT event_type FROM daily) t
             |  CROSS JOIN days
             |  LEFT JOIN daily ON daily.event_type = t.event_type
             |    AND daily.day = days.day)
             |SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
             |  coalesce(n_events, 0) AS n_events,
             |  last_value(day_avg IGNORE NULLS) OVER w AS filled,
             |  CAST(date_diff('day',
             |    last_value(CASE WHEN n_events IS NOT NULL THEN day END
             |      IGNORE NULLS) OVER w, day) AS BIGINT) AS staleness_days
             |FROM dense
             |WINDOW w AS (PARTITION BY event_type ORDER BY day
             |  ROWS UNBOUNDED PRECEDING)
             |ORDER BY event_type, day""".stripMargin)),

    // ── q145: sliding 7-day distinct users via HLL sketch UNION — the
    // 100 TB twin of q61. q61's exact form replicates every (day,
    // user) row into 7 window anchors before the distinct-count
    // shuffle — 7× a corpus-scale exchange. Here the corpus collapses
    // ONCE to |days| fixed-size Datasketches HLL sketches (lgConfigK
    // 14 ≈ 16 KB each, rsd ≈ 0.8%); the 7-anchor replication and the
    // union then run over the ~2.5 k-row sketch frame — kilobytes,
    // not the event stream. Sketch union is exactly the mergeable-
    // partial-aggregate property that makes the pattern hold for ANY
    // window length (a 90-day window costs the same shuffle). Approx
    // by design → no DuckDB oracle (Datasketches HLL ≠ DuckDB's
    // sketch); QueriesSpec gates the per-day estimate within 5% of
    // q61's exact counts (q45's precedent).
    QueryDef(
      "q145_sliding_distinct_hll",
      (s, d) => {
        val dailySk = t(s, d, "events")
          .select(to_date(col("ts")).as("dd"), col("user_id"))
          .groupBy(col("dd"))
          .agg(hll_sketch_agg(col("user_id"), 14).as("sk"))
        val days = dailySk.select(col("dd").as("day")).distinct()
        dailySk
          .select(explode(sequence(col("dd"), date_add(col("dd"), 6)))
            .as("day"), col("sk"))
          .groupBy(col("day"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk"), false))
            .cast("long").as("n_users_7d_est"))
          .join(broadcast(days), Seq("day"), "left_semi")
          .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
            col("n_users_7d_est"))
          .orderBy(col("day"))
      },
      None),

    // ── q194: event-time DISORDER audit — the measurement that sizes a
    // streaming watermark before anyone deploys one: per event with an
    // earlier-ARRIVING predecessor from the same user (arrival order =
    // event_id; the generator's write order), its lateness is how far
    // its event time sits behind the user's running event-time
    // high-water mark. The lateness histogram (in-order / <1 m /
    // <10 m / <1 h / ≥1 h, with each bucket's share and max skew) reads
    // directly as "a watermark of X drops this fraction of events" —
    // the exact batch twin of what `withWatermark` silently discards in
    // [[graft.streaming.EventStream]]. Bucket keys carry a sort prefix
    // so lexicographic order IS severity order.
    //
    // Scale shape: ONE user-partitioned window pass (running max over
    // arrival order — partitioned by user, never global), then a
    // ≤5-row histogram aggregate; the share divides by the windowed
    // total over that dimension-bounded frame (q09's form). Exact
    // integer microseconds end-to-end; seconds only at display.
    QueryDef(
      "q194_ooo_audit",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        t(s, d, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("us"))
          .withColumn("prev_max", max(col("us")).over(w))
          .filter(col("prev_max").isNotNull)
          .withColumn("skew_us",
            greatest(lit(0L), col("prev_max") - col("us")))
          // thresholds shared with the streaming face
          // ([[graft.streaming.LatenessAudit]]) — ONE definition
          .withColumn("bucket",
            graft.operators.Lateness.bucketCol(col("skew_us")))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            // integer DIV, not `/` (double) — exact at any magnitude
            expr("max(skew_us) DIV 1000000").cast("long").as("max_skew_s"))
          .withColumn("share",
            round(col("n_events").cast("double") /
              sum(col("n_events")).over(Window.partitionBy())
                .cast("double"), 6))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us
             |  FROM events),
             |w AS (SELECT user_id, us,
             |    max(us) OVER (PARTITION BY user_id ORDER BY event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS prev_max
             |  FROM e),
             |sk AS (SELECT greatest(0, prev_max - us) AS skew_us
             |  FROM w WHERE prev_max IS NOT NULL),
             |b AS (SELECT CASE WHEN skew_us = 0 THEN 'a_in_order'
             |    WHEN skew_us < ${graft.operators.Lateness.M1Us} THEN 'b_lt_1m'
             |    WHEN skew_us < ${graft.operators.Lateness.M10Us} THEN 'c_lt_10m'
             |    WHEN skew_us < ${graft.operators.Lateness.H1Us} THEN 'd_lt_1h'
             |    ELSE 'e_ge_1h' END AS bucket, skew_us
             |  FROM sk),
             |g AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(max(skew_us) // 1000000 AS BIGINT) AS max_skew_s
             |  FROM b GROUP BY bucket)
             |SELECT bucket, n_events, max_skew_s,
             |  round(CAST(n_events AS DOUBLE) /
             |    CAST(sum(n_events) OVER () AS DOUBLE), 6) AS share
             |FROM g ORDER BY bucket""".stripMargin))
  )
}
