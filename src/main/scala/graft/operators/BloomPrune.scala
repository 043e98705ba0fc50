package graft.operators

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter join pruning — the scan-side semi-join reduction for
  * the 100 TB fact ⋈ selective-dim shape (ref: the reference's
  * membership probe against an external id set,
  * `Batch Processor.py:367-374`, rebuilt as a distributed pre-filter).
  *
  * A semi-join of a huge fact table against a selective dim shuffles
  * the ENTIRE fact side on the join key before a single probe runs.
  * The bloom pattern inverts the cost: build a bits-sized sketch of
  * the dim keys once (distributed partial blooms OR-merged — that is
  * exactly what `DataFrameStatFunctions.bloomFilter` does), broadcast
  * it, and drop non-matching fact rows AT THE SCAN, before the
  * exchange. The exact join still runs afterwards — a bloom admits
  * false positives (rate `fpp`), never false negatives, so
  * `prune ∘ join ≡ join` while the shuffle carries only
  * |matches| + fpp·|fact| rows instead of |fact|.
  *
  * Scale honesty: the merged bloom materializes on the driver and
  * broadcasts whole — size is O(keys·ln(1/fpp)), INDEPENDENT of fact
  * size (the point), but linear in dim keys: 10⁷ keys @1% ≈ 12 MB
  * (fine), 10⁹ keys ≈ 1.2 GB (not a broadcast). [[buildFor]] fails
  * loudly past [[MaxKeys]] rather than OOM-ing the driver mid-plan;
  * past that, shrink the dim side first or fall back to a plain
  * shuffle join (Spark's own runtime row-level filtering makes the
  * same tradeoff executor-side).
  */
object BloomPrune {

  /** Default driver-size guard: 10⁸ keys @ 1% fpp ≈ 120 MB broadcast. */
  val MaxKeys: Long = 100000000L

  /** Build a bloom over `keys`'s LONG key column. `expected` is the
    * cardinality estimate sizing the bit array (overshooting wastes
    * bits; undershooting raises the realized fpp past the nominal).
    */
  def buildFor(
      keys: DataFrame,
      keyCol: String,
      expected: Long,
      fpp: Double = 0.01): Broadcast[BloomFilter] = {
    require(expected > 0 && expected <= MaxKeys,
      s"bloom sized for $expected keys; driver-side merge is only sane " +
        s"to $MaxKeys — pre-shrink the dim side or use a shuffle join")
    val bf = keys.stat.bloomFilter(keyCol, expected, fpp)
    keys.sparkSession.sparkContext.broadcast(bf)
  }

  /** Membership probe column over a broadcast bloom. */
  def mightContain(bloom: Broadcast[BloomFilter], key: Column): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      BloomMightContain(
        org.apache.spark.sql.GraftPlanBridge.expression(key), bloom))

  /** `fact` reduced to rows whose `factKey` may appear in `dimKeys`'s
    * `dimKey` column (exact distinct count probed first to size the
    * bits honestly — one cheap dim-side agg). The result still
    * contains fpp false positives: ALWAYS follow with the exact join.
    */
  def prune(
      fact: DataFrame,
      factKey: String,
      dimKeys: DataFrame,
      dimKey: String,
      fpp: Double = 0.01): DataFrame = {
    val n = dimKeys.select(dimKey).distinct().count().max(1L)
    val bloom = buildFor(dimKeys, dimKey, n, fpp)
    fact.filter(mightContain(bloom, fact(factKey)))
  }

  // Stamp-keyed memo of built sketches: a bloom is a derived index
  // artifact like centroids/PQ codes, and rebuilding it (a distinct
  // count + a full bloom aggregation over the dim side) on EVERY
  // query run was the one index family skipping the build-once
  // discipline (r7 review). Keyed (session, tag) with the stamp in
  // the value (the StampedCache rule); `tag` must capture the dim
  // DEFINITION (predicate + key + corpus dir), since the frame itself
  // cannot be hashed. The sketch is a few hundred KB — dropped
  // entries just re-broadcast.
  private val bloomCache = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String),
    (Long, Broadcast[BloomFilter])]()

  private val hooked = java.util.concurrent.ConcurrentHashMap
    .newKeySet[org.apache.spark.sql.SparkSession]()

  /** Get-or-build the memoized broadcast bloom for (`session`, `tag`)
    * at `stamp`. The build (count + bloom agg jobs) runs OUTSIDE any
    * map lock — a lost race means one redundant build, not a held bin
    * lock for the jobs' duration (the SkewJoin probe rule). Entries
    * self-evict at application end (the StampedCache listener rule —
    * without it every session that ever built a sketch stays pinned
    * in this JVM-wide map; r7 review). Publication is CAS-shaped
    * (putIfAbsent/replace), never a blind put: a blind put's returned
    * "previous" value can be a broadcast another thread just built,
    * RETURNED, and is actively probing — destroying it fails that
    * in-flight query with a destroyed-broadcast SparkException (r7
    * ADVICE). The only broadcast ever destroy()ed here is the one this
    * thread built and lost the race with — no other thread can hold
    * it; a superseded stale-stamp sketch is unpersisted (executor
    * blocks dropped, handle still valid for any in-flight probe) and
    * left to the ContextCleaner.
    */
  def cachedFor(
      dimKeys: DataFrame,
      dimKey: String,
      tag: String,
      stamp: Long,
      fpp: Double = 0.01): Broadcast[BloomFilter] = {
    val s = dimKeys.sparkSession
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler
                .SparkListenerApplicationEnd): Unit = {
            clearCaches(s)
            hooked.remove(s)
            ()
          }
        })
    }
    val k = (s, tag)
    val cur = bloomCache.get(k)
    if (cur != null && cur._1 == stamp) cur._2
    else {
      // build outside any map lock; publish via CAS (scaladoc above)
      val n = dimKeys.select(dimKey).distinct().count().max(1L)
      val built = buildFor(dimKeys, dimKey, n, fpp)
      val mine = (stamp, built)
      var winner = mine
      var settled = false
      while (!settled) {
        val prev = bloomCache.putIfAbsent(k, mine)
        if (prev == null) settled = true
        else if (prev._1 == stamp) { winner = prev; settled = true }
        else if (bloomCache.replace(k, prev, mine)) {
          prev._2.unpersist()
          settled = true
        }
        // replace lost to a third thread: loop and re-examine its entry
      }
      if (winner ne mine) built.destroy()
      winner._2
    }
  }

  /** Drop one session's memoized sketches — the session-RETIREMENT
    * hook for services cycling sessions on a shared context (the
    * app-end listener above only fires per application); call it next
    * to the query modules' clearCaches.
    */
  def clearCaches(s: org.apache.spark.sql.SparkSession): Unit =
    bloomCache.forEach { (k, v) =>
      if (k._1 eq s) {
        bloomCache.remove(k)
        v._2.destroy()
      }
    }
}

/** `bloom.mightContainLong(key)` as a Catalyst expression — a few
  * xxhash probes into a broadcast bit array per row. CodegenFallback:
  * the probe target lives in a Broadcast handle (deliberately NOT a
  * literal — a multi-MB bit array embedded in the plan would bloat
  * every plan string, canonicalization, and task binary), and a
  * boxed-call fallback per row is still ~ns-scale against the
  * exchange it removes.
  */
case class BloomMightContain(
    child: Expression,
    bloom: Broadcast[BloomFilter])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case o => TypeCheckResult.TypeCheckFailure(
      s"bloom probe expects an integral key, got ${o.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long    => bloom.value.mightContainLong(l)
    case i: java.lang.Integer => bloom.value.mightContainLong(i.toLong)
    case s: java.lang.Short   => bloom.value.mightContainLong(s.toLong)
    case b: java.lang.Byte    => bloom.value.mightContainLong(b.toLong)
  }

  override def prettyName: String = "bloom_might_contain"

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
