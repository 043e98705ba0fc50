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
             |FROM s GROUP BY 1 ORDER BY len_bucket""".stripMargin))
  )
}
