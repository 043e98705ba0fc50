package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Structured-Streaming face of the engine (SURVEY.md §7 step 7).
  *
  * The reference's status stream (D4, `Batch Processor.py:399-418`)
  * is append-only with no time semantics; this extends it with real
  * event-time processing: watermarked tumbling windows and severity
  * classification, over any `events`-shaped streaming DataFrame
  * (`readStream` parquet/kafka/socket — source-agnostic).
  *
  * All transforms are expressed on an unbounded DataFrame, so the same
  * functions also run in batch (feed them a `spark.read` frame) —
  * that's how the scalatest suite and the DuckDB-checked q17 share
  * semantics with this streaming path.
  */
object EventStream {

  /** Tumbling-window counts + exact fixed-point value sums with a
    * watermark for late-data cutoff. Output schema:
    * (window_start TIMESTAMP, event_type STRING, cnt LONG, sum_value DOUBLE).
    */
  def tumblingCounts(
      events: DataFrame,
      windowLen: String = "1 day",
      watermark: String = "1 hour"): DataFrame = {
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        graft.queries.Q.fxSum(col("value"), 100).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("cnt"), col("sum_value"))
  }

  /** Streaming dedup with watermark-bounded state (the reference's
    * corpus dedup `Batch Processor.py:231` lifted to an unbounded
    * stream): duplicates of a key arriving within the watermark window
    * are dropped, and state for keys older than the watermark is
    * evicted — so state size is O(keys per watermark window), not
    * O(all keys ever).
    */
  def dedupStream(
      events: DataFrame,
      keyCol: String = "event_id",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Stream-stream interval join: each purchase matched to same-user
    * clicks at most `horizon` before it. Both sides carry watermarks so
    * the join state is bounded — a click can be evicted once the
    * purchase-side watermark passes click_ts + horizon.
    */
  def clickToPurchase(
      clicks: DataFrame,
      purchases: DataFrame,
      horizon: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases
      .withWatermark("ts", watermark)
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("value"))
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"), col("value"))
  }

  /** Checkpointed parquet sink: exactly-once file output that survives
    * stop/restart (the durable upgrade of the reference's at-least-once
    * QSAVE commit, `Batch Processor.py:347-361` — offsets + file
    * manifest live in the checkpoint, so a restarted query neither
    * drops nor duplicates batches).
    */
  def toParquetSink(
      df: DataFrame,
      path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()

  /** Built-in session-window aggregation — the declarative sibling of
    * [[Sessionize]]'s `flatMapGroupsWithState` form: Spark merges
    * overlapping `[ts, ts+gap)` windows per user and the watermark
    * bounds state/emission. Use this form when per-session output is
    * an aggregate (counts/sums); use [[Sessionize]] when custom state
    * transitions are needed. Note the differing end semantics:
    * `session_window.end` = last event + gap, while [[Sessionize]]
    * (and batch q35) end at the last event itself.
    */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        graft.queries.Q.fxSum(col("value"), 100).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Severity classification of the live stream — the q10/A13 CASE
    * WHEN applied before sinking to a status log.
    */
  def classify(events: DataFrame): DataFrame =
    events.withColumn("severity",
      when(col("event_type").contains("error"), "red")
        .when(col("event_type").isin("purchase", "signup"), "green")
        .otherwise("blue"))

  /** Per-type hourly moment table `(event_type, n, sv, ssq)` from a
    * BATCH history frame — the trained side of the spike monitor
    * (exact DECIMAL(38,0) moments of the hourly count distribution,
    * [[graft.queries.Q.decMoments]]).
    */
  def hourlyMoments(history: DataFrame): DataFrame = {
    val hrs = history
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("cnt"))
    val m = graft.queries.Q.decMoments(col("cnt"))
    hrs.groupBy(col("event_type")).agg(m.head, m.tail: _*)
  }

  /** Streaming spike monitor — q82's ops-alerting face on the live
    * stream: watermarked hourly counts per event type, flagged against
    * a BATCH-trained moment table ([[hourlyMoments]] over history)
    * with exactly q82's division-free z-score predicate (one shared
    * definition, [[graft.queries.Q.spikePredicate]] — the batch query
    * and the monitor cannot drift). The production pattern: thresholds
    * train on the standing history, the stream pays one bounded
    * windowed agg + a broadcast join per micro-batch — no unbounded
    * state, no per-event join. Feed a batch frame for the batch face
    * (same code path; spec-proved equal to the streamed answer).
    */
  def spikeFlags(
      events: DataFrame,
      moments: DataFrame,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .join(broadcast(moments), Seq("event_type"))
      .filter(graft.queries.Q.spikePredicate)
      .select(col("w.start").as("hour_start"), col("event_type"), col("cnt"))
}

/** Stateful sessionization over a user-keyed stream via
  * `flatMapGroupsWithState` — custom per-key state, the capability the
  * built-in windowed aggs can't express. The batch twin is
  * `q35_sessionize` (lag + running sum), verified against the DuckDB
  * oracle; this streaming form emits a session as soon as a gap closes
  * it and keeps the open session in state across micro-batches.
  *
  * Late-event semantics: an event more than `gapUs` OLDER than the
  * open session's start belongs to an earlier session whose neighbors
  * may already have been emitted — it is NOT min-merged into the open
  * one (merging would drag the open session's start arbitrarily
  * backwards, diverging from the batch twin, which would have placed
  * the event in a separate earlier session). Stale events arriving in
  * the same batch gap-merge among themselves and emit as closed
  * sessions. The unavoidable residual divergence of at-once emission
  * remains: the batch twin could still have merged those events with
  * an *already-emitted* neighborhood. Use a watermark upstream to
  * bound how late such events can be.
  */
object Sessionize {
  import org.apache.spark.sql.Dataset
  import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

  final case class SessEvent(user_id: Long, ts_us: Long)
  final case class OpenSession(start_us: Long, last_us: Long, n: Long)
  final case class Session(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

  /** Watermark-bounded variant: open sessions FLUSH when the event-time
    * watermark passes their last event + gap, instead of waiting for a
    * later event from the same user that may never come. Without this,
    * state is O(all users ever seen) — a one-event user pins an open
    * session forever, which is the unbounded-state failure mode at
    * 100 TB. Input needs (user_id LONG, ts TIMESTAMP); `watermark`
    * bounds both late data and state lifetime.
    */
  def sessionsWithTimeout(
      events: DataFrame,
      gapUs: Long,
      watermark: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val typed = events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp)],
            state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: no on-time event can extend
            // this session any more — emit and drop the state
            val o = state.get
            state.remove()
            Iterator.single(Session(uid, o.start_us, o.last_us, o.n))
          } else {
            val evs = it.map { case (_, ts) =>
              // full microsecond precision: getTime is millis-only and
              // would truncate TimestampType's sub-ms part, silently
              // diverging from the micro-second batch twin
              SessEvent(uid,
                ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
            }.toArray
            val out = Sessionize.advance(uid, evs, state, gapUs)
            state.getOption.foreach { o =>
              // flush when the watermark passes the gap horizon
              state.setTimeoutTimestamp((o.last_us + gapUs) / 1000L)
            }
            out
          }
      }
  }

  def sessions(events: Dataset[SessEvent], gapUs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          advance(uid, it.toArray, state, gapUs)
      }
  }

  /** One micro-batch of a user's events against the open-session
    * state: the SINGLE definition of the merge/close/stale semantics,
    * shared by [[sessions]] and [[sessionsWithTimeout]].
    */
  private[streaming] def advance(
      uid: Long,
      batch: Array[SessEvent],
      state: GroupState[OpenSession],
      gapUs: Long): Iterator[Session] = {
    val evs = batch.sortBy(_.ts_us)
    var closed = List.newBuilder[Session]
    val stale = List.newBuilder[SessEvent]
    var open = state.getOption.orNull
    evs.foreach { e =>
      open match {
        case null =>
          open = OpenSession(e.ts_us, e.ts_us, 1L)
        case o if e.ts_us - o.last_us > gapUs =>
          closed += Session(uid, o.start_us, o.last_us, o.n)
          open = OpenSession(e.ts_us, e.ts_us, 1L)
        case o if o.start_us - e.ts_us > gapUs =>
          // too old to belong to the open session: its real
          // neighborhood was already emitted (see scaladoc) —
          // min-merging would drag the open start backwards
          // past the gap bound. Buffer it: stale events in the
          // SAME batch must still merge with each other.
          stale += e
        case o =>
          // min/max, not assignment: sorting is per-batch only,
          // so an event arriving gap-tolerably late (behind the
          // open session's last_us) must not move the boundary
          // backwards
          open = OpenSession(math.min(o.start_us, e.ts_us),
            math.max(o.last_us, e.ts_us), o.n + 1)
      }
    }
    // gap-split the stale buffer among itself (all closed: every
    // member precedes the open session by more than the gap, so
    // none can reopen) — matching the batch twin for stale
    // events that arrived together
    val staleEvs = stale.result()
    if (staleEvs.nonEmpty) {
      var s = staleEvs.head.ts_us
      var last = s
      var n = 0L
      staleEvs.foreach { e =>
        if (e.ts_us - last > gapUs) {
          closed += Session(uid, s, last, n)
          s = e.ts_us; n = 0L
        }
        last = e.ts_us; n += 1
      }
      closed += Session(uid, s, last, n)
    }
    if (open != null) state.update(open)
    closed.result().iterator
  }
}
