package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream behavioral queries over the `events` table that need
  * ORDER-dependent per-user state (ref concept: the reference's event
  * log is append-only and per-record, `Batch Processor.py:418-441`;
  * these are the set-at-a-time analytics a warehouse derives from it).
  */
object EventQueries {
  import Q._

  /** q305's step window: a funnel step must land within 24 h of the
    * previous step's completion (epoch micros — the constant is baked
    * into the DuckDB mirror, so a change must edit both).
    */
  val FunnelWindowUs: Long = 86400000000L

  val defs: Seq[QueryDef] = Seq(

    // ── q304: 30-minute-gap sessionization — THE canonical event-log
    // operator (every product-analytics stack runs it before any
    // engagement metric): per user, events sort by time and a gap
    // > 30 min opens a new session; sessions then roll up into an
    // engagement histogram by capped session length (1…9 events, 10+),
    // with exact integer duration sums micro-divided once at the end.
    //
    // Scale shape: ONE exchange on user_id feeds both windows (lag and
    // the running session counter share the same partition+order); the
    // session rollup re-exchanges at session grain and the histogram
    // collapses to ≤10 rows. Per-user event counts are people-bounded
    // (no whale keys), so the window partition never skews; at 100 TB
    // the user_id exchange is the one unavoidable shuffle and
    // everything after it is sub-linear.
    //
    // Float discipline: durations accumulate as exact epoch-micro
    // longs; the mean is a single double division rounded once —
    // aggregation order cannot perturb it.
    QueryDef(
      "q304_sessionize",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sess = t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            unix_micros(col("ts")).as("us"))
          .withColumn("prev_us", lag(col("us"), 1).over(w))
          .withColumn("new_sess",
            when(col("prev_us").isNull ||
              col("us") - col("prev_us") > 30L * 60L * 1000000L, 1L)
              .otherwise(0L))
          .withColumn("sess_id", sum(col("new_sess")).over(wRun))
          .groupBy(col("user_id"), col("sess_id"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            (max(col("us")) - min(col("us"))).as("dur_us"),
            count(when(col("event_type") === "error", 1)).cast("long")
              .as("n_errors"))
        sess
          .withColumn("len_bucket", least(col("n_events"), lit(10L)))
          .groupBy(col("len_bucket"))
          .agg(
            count(lit(1)).cast("long").as("n_sessions"),
            sum(col("n_events")).cast("long").as("n_events"),
            round(sum(col("dur_us")).cast("double") /
              count(lit(1)).cast("double") / 1000000.0, 6)
              .as("mean_duration_sec"),
            count(when(col("n_errors") > 0, 1)).cast("long")
              .as("sessions_with_error"))
          .orderBy(col("len_bucket"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type,
             |    epoch_us(ts) AS us,
             |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev_us
             |  FROM events),
             |f AS (SELECT user_id, event_id, event_type, us,
             |    CASE WHEN prev_us IS NULL
             |      OR us - prev_us > 30*60*1000000 THEN 1 ELSE 0 END
             |      AS new_sess
             |  FROM e),
             |g AS (SELECT user_id, event_type, us,
             |    sum(new_sess) OVER (PARTITION BY user_id
             |      ORDER BY us, event_id
             |      ROWS UNBOUNDED PRECEDING) AS sess_id
             |  FROM f),
             |s AS (SELECT user_id, sess_id,
             |    CAST(count(*) AS BIGINT) AS n_events,
             |    max(us) - min(us) AS dur_us,
             |    CAST(count(*) FILTER (WHERE event_type = 'error')
             |      AS BIGINT) AS n_errors
             |  FROM g GROUP BY 1, 2)
             |SELECT least(n_events, 10) AS len_bucket,
             |  CAST(count(*) AS BIGINT) AS n_sessions,
             |  CAST(sum(n_events) AS BIGINT) AS n_events,
             |  round(CAST(sum(dur_us) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) / 1000000.0, 6)
             |    AS mean_duration_sec,
             |  CAST(count(*) FILTER (WHERE n_errors > 0) AS BIGINT)
             |    AS sessions_with_error
             |FROM s GROUP BY 1 ORDER BY len_bucket""".stripMargin)),

    // ── q305: ordered WINDOWED FUNNEL conversion (view → click →
    // purchase, each step within 24 h of the previous) — the second
    // canonical event-log operator (every growth stack computes
    // step-through rates, always with a step window): a user
    // completes step k when an event of step k's type occurs STRICTLY
    // AFTER their step-(k−1) completion and within the window.
    // Matching is DECLARED greedy-earliest (first view, then the
    // first click in its window, then the first purchase in that
    // click's window) — the semantics product funnels implement; a
    // later view could in principle open a window an earlier one
    // misses, and re-anchoring variants are a different, costlier
    // operator.
    //
    // Scale shape: ONE user_id exchange; each user's events collect
    // into a sorted array (per-user counts are people-bounded — the
    // q304 argument — so no whale keys) and the greedy match is a
    // single codegen'd `aggregate` HOF fold carrying (depth,
    // last_matched_us) — no self-join per step, no window, no
    // repeated scans as steps are added. The result collapses to 3
    // rows. The DuckDB mirror uses the equivalent conditional-min
    // chaining (min view → min click > it → min purchase > that);
    // the spec pins both against a driver recompute.
    //
    // Ties: strictly-greater on the epoch-micro timestamp in BOTH
    // engines, so a click sharing its view's microsecond never
    // counts — tie behavior is engine-identical by construction.
    QueryDef(
      "q305_funnel_steps",
      (s, d) => {
        val steps = Seq("view", "click", "purchase")
        val winUs = FunnelWindowUs
        val init = struct(
          lit(0).cast("int").as("d"), lit(Long.MinValue).as("t"))
        def advance(acc: org.apache.spark.sql.Column,
            e: org.apache.spark.sql.Column) =
          steps.zipWithIndex.foldLeft(when(lit(false), acc)) {
            case (c, (step, i)) => c.when(
              acc("d") === i && e("event_type") === step &&
                (if (i == 0) lit(true)
                 else e("us") > acc("t") && e("us") <= acc("t") + winUs),
              struct(lit(i + 1).cast("int").as("d"), e("us").as("t")))
          }.otherwise(acc)
        val depths = t(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), col("event_type"))
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(struct(
            col("us"), col("event_id"), col("event_type")))).as("evs"))
          .select(aggregate(col("evs"), init, advance)("d").as("depth"))
        val agg = depths.agg(
          count(when(col("depth") >= 1, 1)).as("s1"),
          count(when(col("depth") >= 2, 1)).as("s2"),
          count(when(col("depth") >= 3, 1)).as("s3"))
        def conv(n: org.apache.spark.sql.Column,
            prev: org.apache.spark.sql.Column) =
          when(prev > 0L, round(n.cast("double") / prev.cast("double"), 6))
        // `base` (= s1) rides INSIDE each exploded struct: one corpus
        // pass, no second plan of the per-user fold, no BNLJ — the
        // 1-row aggregate already holds every column the 3-row
        // explode needs.
        agg.select(explode(array(
          struct(lit(1L).as("step"), lit("view").as("step_name"),
            col("s1").as("n"), col("s1").as("prev"),
            col("s1").as("base")),
          struct(lit(2L).as("step"), lit("click").as("step_name"),
            col("s2").as("n"), col("s1").as("prev"),
            col("s1").as("base")),
          struct(lit(3L).as("step"), lit("purchase").as("step_name"),
            col("s3").as("n"), col("s2").as("prev"),
            col("s1").as("base")))).as("r"))
          .select(
            col("r.step"), col("r.step_name"),
            col("r.n").cast("long").as("n_users"),
            conv(col("r.n"), col("r.prev")).as("conv_from_prev"),
            conv(col("r.n"), col("r.base")).as("conv_overall"))
          .orderBy(col("step"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
             |    FROM events),
             |t1 AS (SELECT user_id, min(us) AS t FROM e
             |  WHERE event_type = 'view' GROUP BY 1),
             |t2 AS (SELECT e.user_id, min(e.us) AS t FROM e
             |  JOIN t1 ON e.user_id = t1.user_id
             |  WHERE e.event_type = 'click' AND e.us > t1.t
             |    AND e.us <= t1.t + 86400000000 GROUP BY 1),
             |t3 AS (SELECT e.user_id, min(e.us) AS t FROM e
             |  JOIN t2 ON e.user_id = t2.user_id
             |  WHERE e.event_type = 'purchase' AND e.us > t2.t
             |    AND e.us <= t2.t + 86400000000 GROUP BY 1),
             |c AS (SELECT
             |  (SELECT CAST(count(*) AS BIGINT) FROM t1) AS s1,
             |  (SELECT CAST(count(*) AS BIGINT) FROM t2) AS s2,
             |  (SELECT CAST(count(*) AS BIGINT) FROM t3) AS s3)
             |SELECT step, step_name, n_users, conv_from_prev, conv_overall
             |FROM (
             |  SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
             |    s1 AS n_users,
             |    CASE WHEN s1 > 0 THEN
             |      round(CAST(s1 AS DOUBLE) / CAST(s1 AS DOUBLE), 6)
             |      END AS conv_from_prev,
             |    CASE WHEN s1 > 0 THEN
             |      round(CAST(s1 AS DOUBLE) / CAST(s1 AS DOUBLE), 6)
             |      END AS conv_overall
             |  FROM c
             |  UNION ALL
             |  SELECT CAST(2 AS BIGINT), 'click', s2,
             |    CASE WHEN s1 > 0 THEN
             |      round(CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE), 6) END,
             |    CASE WHEN s1 > 0 THEN
             |      round(CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE), 6) END
             |  FROM c
             |  UNION ALL
             |  SELECT CAST(3 AS BIGINT), 'purchase', s3,
             |    CASE WHEN s2 > 0 THEN
             |      round(CAST(s3 AS DOUBLE) / CAST(s2 AS DOUBLE), 6) END,
             |    CASE WHEN s1 > 0 THEN
             |      round(CAST(s3 AS DOUBLE) / CAST(s1 AS DOUBLE), 6) END
             |  FROM c)
             |ORDER BY step""".stripMargin)),

    // ── q306: TIME-TO-CONVERT for q305's funnel — for each user who
    // completes view → click → purchase (same greedy-earliest, same
    // 24 h step windows, declared once in [[FunnelWindowUs]]), the
    // per-leg latencies (view→click, click→purchase) roll up to
    // exact-micro min/max and a once-rounded mean — the latency
    // distribution a growth team reads NEXT to the conversion rates.
    //
    // Scale shape: identical to q305 (one user_id exchange, one
    // sorted-array HOF fold per user — the fold state additionally
    // carries the three matched timestamps, which costs nothing), a
    // 1-row output. Float discipline: legs accumulate as exact epoch-
    // micro longs; each mean is ONE double division rounded once.
    QueryDef(
      "q306_funnel_latency",
      (s, d) => {
        val steps = Seq("view", "click", "purchase")
        val winUs = FunnelWindowUs
        val mv = Long.MinValue
        val init = struct(lit(0).cast("int").as("d"),
          lit(mv).as("t1"), lit(mv).as("t2"), lit(mv).as("t3"))
        def st(dd: Int, t1: org.apache.spark.sql.Column,
            t2: org.apache.spark.sql.Column,
            t3: org.apache.spark.sql.Column) =
          struct(lit(dd).cast("int").as("d"),
            t1.as("t1"), t2.as("t2"), t3.as("t3"))
        def advance(acc: org.apache.spark.sql.Column,
            e: org.apache.spark.sql.Column) =
          when(acc("d") === 0 && e("event_type") === steps(0),
            st(1, e("us"), lit(mv), lit(mv)))
            .when(acc("d") === 1 && e("event_type") === steps(1) &&
              e("us") > acc("t1") && e("us") <= acc("t1") + winUs,
              st(2, acc("t1"), e("us"), lit(mv)))
            .when(acc("d") === 2 && e("event_type") === steps(2) &&
              e("us") > acc("t2") && e("us") <= acc("t2") + winUs,
              st(3, acc("t1"), acc("t2"), e("us")))
            .otherwise(acc)
        t(s, d, "events")
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), col("event_type"))
          .groupBy(col("user_id"))
          .agg(sort_array(collect_list(struct(
            col("us"), col("event_id"), col("event_type")))).as("evs"))
          .select(aggregate(col("evs"), init, advance).as("f"))
          .filter(col("f.d") === 3)
          .select((col("f.t2") - col("f.t1")).as("vc"),
            (col("f.t3") - col("f.t2")).as("cp"))
          .agg(
            count(lit(1)).cast("long").as("n_converted"),
            round(sum(col("vc")).cast("double") /
              count(lit(1)).cast("double") / 1000000.0, 6)
              .as("view_click_mean_sec"),
            min(col("vc")).cast("long").as("view_click_min_us"),
            max(col("vc")).cast("long").as("view_click_max_us"),
            round(sum(col("cp")).cast("double") /
              count(lit(1)).cast("double") / 1000000.0, 6)
              .as("click_purchase_mean_sec"),
            min(col("cp")).cast("long").as("click_purchase_min_us"),
            max(col("cp")).cast("long").as("click_purchase_max_us"))
      },
      Some("""WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_type
             |    FROM events),
             |t1 AS (SELECT user_id, min(us) AS t1 FROM e
             |  WHERE event_type = 'view' GROUP BY 1),
             |t2 AS (SELECT e.user_id, t1.t1, min(e.us) AS t2 FROM e
             |  JOIN t1 ON e.user_id = t1.user_id
             |  WHERE e.event_type = 'click' AND e.us > t1.t1
             |    AND e.us <= t1.t1 + 86400000000 GROUP BY 1, 2),
             |t3 AS (SELECT e.user_id, t2.t1, t2.t2, min(e.us) AS t3 FROM e
             |  JOIN t2 ON e.user_id = t2.user_id
             |  WHERE e.event_type = 'purchase' AND e.us > t2.t2
             |    AND e.us <= t2.t2 + 86400000000 GROUP BY 1, 2, 3)
             |SELECT CAST(count(*) AS BIGINT) AS n_converted,
             |  round(CAST(sum(t2 - t1) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) / 1000000.0, 6)
             |    AS view_click_mean_sec,
             |  CAST(min(t2 - t1) AS BIGINT) AS view_click_min_us,
             |  CAST(max(t2 - t1) AS BIGINT) AS view_click_max_us,
             |  round(CAST(sum(t3 - t2) AS DOUBLE)
             |    / CAST(count(*) AS DOUBLE) / 1000000.0, 6)
             |    AS click_purchase_mean_sec,
             |  CAST(min(t3 - t2) AS BIGINT) AS click_purchase_min_us,
             |  CAST(max(t3 - t2) AS BIGINT) AS click_purchase_max_us
             |FROM t3""".stripMargin))
  )
}
