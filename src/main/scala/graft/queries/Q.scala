package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One declared query: Spark builder + (when SQL-expressible) the DuckDB
  * oracle the driver hash-compares against. Column names/order and row
  * order must match between the two — see Q's determinism helpers.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Shared helpers keeping Spark results bit-identical to the DuckDB
  * oracle.
  *
  * Float discipline: a sum of doubles is aggregation-order-dependent, so
  * every money/value aggregate is computed as an EXACT fixed-point sum —
  * `round(x*scale)` cast to long (the fixtures carry 2- or 4-decimal
  * values, so `x*scale` is within 1e-6 of an integer and both engines
  * round it identically), summed exactly as integers, then rescaled with
  * a single double division. Derived doubles (ratios, averages) are built
  * from those exact integers with the same operation order on both
  * sides, so IEEE semantics make them bit-identical.
  *
  * Dates/timestamps are projected as `yyyy-MM-dd` strings — the safest
  * cross-engine type. Every query ends with a total-order `orderBy`.
  */
object Q {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    graft.sources.Tables(spark, sfDir, name)

  /** Cheap fingerprint of a data directory (file count + max mtime +
    * total size): cache keys include it so a rewritten corpus under an
    * already-cached path rebuilds instead of silently serving stale
    * blocks (a real failure mode for a long-lived service session).
    */
  def dirStamp(path: String): Long = {
    def walk(f: java.io.File): (Long, Long, Long) =
      if (f.isDirectory)
        f.listFiles() match {
          case null => (0L, 0L, 0L)
          case fs => fs.map(walk).fold((0L, 0L, 0L)) { (a, b) =>
            (a._1 + b._1, math.max(a._2, b._2), a._3 + b._3)
          }
        }
      else (1L, f.lastModified(), f.length())
    val (n, mt, sz) = walk(new java.io.File(path))
    n * 1000003L ^ mt ^ (sz * 31L)
  }


  /** Exact fixed-point units of a value column: round(c*scale) as long. */
  def fxUnits(c: Column, scale: Int): Column = round(c * scale).cast("long")

  /** Exact sum of a fixed-point column, rescaled to double. */
  def fxSum(c: Column, scale: Int): Column = sum(fxUnits(c, scale)) / scale.toDouble

  /** Oracle-side fragment matching [[fxSum]] exactly. */
  def fxSumSql(expr: String, scale: Int): String =
    s"CAST(sum(CAST(round(($expr)*$scale) AS BIGINT)) AS BIGINT)/$scale.0"

  /** Integer moment sums (count, Σv, Σv²) over an exact long column —
    * the z-score moment base (q58/q82). The running sums accumulate as
    * DECIMAL(38,0), not LONG: a 100 TB corpus's Σv² crosses 2⁶³ long
    * before the data is "big" (10⁵-unit values overflow at ~10⁹
    * rows), and ANSI mode then fails the whole query. Both inputs are
    * cast to 38 digits BEFORE summing so Spark's sum accumulates at
    * DECIMAL(38,0) (sum adds 10 digits capped at 38; summing the raw
    * dec(19,0) would accumulate at only 29). Honest bound: 38 digits,
    * not unconditional — Σv is exact to 10³⁸ (any real corpus:
    * 10¹³ rows of 10¹²-unit values is 10²⁵) and Σv² to 10³⁸ (same
    * corpus: 10³⁷; a handful of near-2⁶³ values can still exceed it,
    * and ANSI then fails LOUDLY rather than wrapping — MomentsSpec
    * pins the 2⁶³-crossing case). Downstream comparisons cast these
    * to double — the moment VALUES stay exact, so both engines derive
    * the flag from identical integers (oracle twin: HUGEINT sums).
    */
  def decMoments(v: Column): Seq[Column] = {
    val vd = v.cast("decimal(19,0)")
    Seq(count(lit(1)).as("n"),
      sum(vd.cast("decimal(38,0)")).as("sv"),
      sum((vd * vd).cast("decimal(38,0)")).as("ssq"))
  }

  /** The q82 spike flag over [[decMoments]] columns `(n, sv, ssq)` and
    * a per-cell count `cnt`: `(n·x − s)² > 9(n·ssq − s²) ∧ n·x > s`
    * with n ≥ 2, comparisons in double from the exact integer moments.
    * ONE definition shared by the batch query and the streaming
    * monitor ([[graft.streaming.EventStream.spikeFlags]]) so the two
    * faces cannot drift.
    */
  def spikePredicate: Column = {
    val dn = col("n").cast("double")
    val dc = col("cnt").cast("double")
    val dsv = col("sv").cast("double")
    col("n") >= 2 &&
      (dn * dc - dsv) * (dn * dc - dsv) >
        lit(9.0) * (dn * col("ssq").cast("double") - dsv * dsv) &&
      dn * dc > dsv
  }

  def ts(s: String): Column = lit(s).cast("timestamp")

  def day(c: Column): Column = date_format(date_trunc("day", c), "yyyy-MM-dd")

  /** Deterministic sampling-membership bucket in `[0, mod)`: the
    * masked-Knuth multiplicative hash over a stable integer id —
    * reproducible across engines and runs (no `rand()`), unbiased
    * within strata because the id hash is independent of any score
    * column. The 31-bit mask keeps the product under 2⁶³ (identity
    * for fixture ids), so ANSI mode never overflows. The fragment is
    * engine-portable SQL: interpolate the SAME string into the Spark
    * `expr(...)` and the DuckDB oracle so the membership predicate
    * cannot drift between them (q56/q57/q65/q69).
    */
  def knuthBucketSql(idCol: String, mod: Long): String =
    s"(($idCol & 2147483647) * 2654435761) % $mod"

  /** Top-N rank + cumulative-share coverage curve over a per-key mass
    * frame — the ONE definition of the curve contract shared by q120
    * (duplication coverage) and q127 (revenue concentration), so the
    * two curves can never drift in top-N size, tie-break, or rounding.
    * Returns `rank` + every input column + `share`/`cum_share`;
    * callers project/rename. Scale shape: top-N plans as TakeOrdered
    * (never a global sort), the 1-row mass total broadcasts (q91's
    * scalar shape — callers whitelist the BNLJ), the rank/cumulative
    * window runs over exactly the N LIMIT rows.
    */
  def coverageCurve(
      perKey: DataFrame, keyCol: String, massCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tot = perKey.agg(sum(col(massCol)).as("__tot"))
    val top = perKey.orderBy(col(massCol).desc, col(keyCol)).limit(n)
    val w = Window.orderBy(col(massCol).desc, col(keyCol))
    top.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__cum",
        sum(col(massCol)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("share",
        round(col(massCol).cast("double") / col("__tot").cast("double"), 6))
      .withColumn("cum_share",
        round(col("__cum").cast("double") / col("__tot").cast("double"), 6))
      .drop("__tot", "__cum")
  }

  /** Exact discounted line revenue in micro-dollars — cents ×
    * (100 − discount pct) — accumulating DECIMAL(38,0): a 100 TB year
    * of 10¹² line items × ~10⁹ micro-units crosses 2⁶³. ONE
    * definition for every revenue rollup (q146/q173/q177–q181 — r7
    * review folded three inlined copies) with [[revMicroSql]] as its
    * oracle twin, so the fixed-point discipline cannot desync.
    */
  def revMicro: Column = (fxUnits(col("l_extendedprice"), 100)
    .cast("decimal(19,0)") *
    (lit(100L) - fxUnits(col("l_discount"), 100))
      .cast("decimal(19,0)")).cast("decimal(38,0)")

  /** Oracle fragment matching [[revMicro]] exactly (HUGEINT). */
  val revMicroSql: String =
    """CAST(round(l_extendedprice*100) AS HUGEINT) *
      |      (100 - CAST(round(l_discount*100) AS BIGINT))""".stripMargin

  /** Two-pass exact global ranking: range-repartition + in-partition
    * sort on `sortCols`, then `zipWithIndex` appends the 1-based
    * global order index `rn` — the scale-safe replacement for an
    * unpartitioned ranking window ("Moving all data to a single
    * partition"). ONE definition for every consumer (q50 deciles,
    * q149 calibration, q153 Gini — r7 review folded their three
    * inlined copies) so the partition-count choice and row-index
    * semantics can never drift between them.
    */
  def globalRankByRange(df: DataFrame, sortCols: Seq[Column]): DataFrame = {
    val s = df.sparkSession
    val sorted = df
      .repartitionByRange(s.sparkContext.defaultParallelism, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "rn", org.apache.spark.sql.types.LongType, nullable = false))
    s.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L)) },
      schema)
  }

  /** Two-pass exact global EXCLUSIVE prefix sum of long column
    * `massCol` in `(sortCols, …)` order — the scale-safe replacement
    * for `sum(mass) OVER (ORDER BY … ROWS … 1 PRECEDING)`, whose
    * unpartitioned window would serialize the corpus through one
    * task. Same structure as [[globalRankByRange]] / q90's
    * source-keyed cumsum: range-repartition + in-partition sort, a
    * partition-local running-sum pass, then the ≤P per-partition
    * masses collect once and broadcast back as exact offsets. Also
    * returns the exact global TOTAL (the offsets' sum) — callers
    * needing a share-of-total or budget threshold get it from the
    * same bounded collect instead of a second corpus aggregate.
    * `massCol` must be LONG and non-null; exactness is integer.
    */
  def globalCumBefore(
      df: DataFrame, sortCols: Seq[Column], massCol: String)
      : (DataFrame, Long) = {
    val (out, totals) = globalCumBeforeN(df, sortCols, Seq(massCol))
    (out.withColumnRenamed(s"cum_before_$massCol", "cum_before"),
      totals.head)
  }

  /** Multi-column face of [[globalCumBefore]]: exclusive prefix sums
    * of SEVERAL long mass columns in one range-repartition pass
    * (calling the single-column form k times would pay k corpus
    * shuffles for sums that ride the same order — q216's KS statistic
    * needs both samples' CDFs on one value spine). Appends
    * `cum_before_<col>` per input column; returns the exact global
    * totals in `massCols` order.
    */
  def globalCumBeforeN(
      df: DataFrame, sortCols: Seq[Column], massCols: Seq[String])
      : (DataFrame, Seq[Long]) = {
    val s = df.sparkSession
    val parts = df
      .repartitionByRange(s.sparkContext.defaultParallelism, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val mis = massCols.map(parts.schema.fieldIndex)
    val schema = org.apache.spark.sql.types.StructType(
      parts.schema.fields ++
        (org.apache.spark.sql.types.StructField("pid",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
          massCols.map(c => org.apache.spark.sql.types.StructField(
            s"local_cb_$c",
            org.apache.spark.sql.types.LongType, nullable = false))))
    val withLocal = s.createDataFrame(
      parts.rdd.mapPartitionsWithIndex { (pid, it) =>
        val cums = Array.fill(mis.length)(0L)
        it.map { r =>
          // Seq[Any]: a bare Seq(pid, …) would weak-conform the Int
          // pid up to Long and break the IntegerType schema field.
          // cums.toList COPIES — an ArraySeq wrapper would alias the
          // mutating array into already-emitted rows
          val out = org.apache.spark.sql.Row.fromSeq(
            r.toSeq ++ (Seq[Any](pid) ++ cums.toList))
          var i = 0
          while (i < mis.length) { cums(i) += r.getLong(mis(i)); i += 1 }
          out
        }
      }, schema)
    // bounded collect (≤ P rows): per-partition masses → driver-side
    // prefix scan in partition order → exact offset of each
    // partition's first row (empty partitions simply don't appear)
    val masses = withLocal.groupBy(col("pid"))
      // sum, not max(local_cb + mass): the sum is the partition total
      // for ANY sign of mass, where the max form silently mis-offsets
      // on negative masses (signed deltas are a legitimate future
      // caller — r8 review finding)
      .agg(sum(col(massCols.head)).as("m0"),
        massCols.tail.zipWithIndex.map { case (c, i) =>
          sum(col(c)).as(s"m${i + 1}") }: _*)
      .collect()
      .map(r => (r.getInt(0), massCols.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val offsets = masses.scanLeft(
      (0, massCols.map(_ => 0L): Seq[Long])) {
      case ((_, run), (pid, mass)) =>
        (pid, run.zip(mass).map { case (a, b) => a + b })
    }
    val totals = offsets.last._2
    val offDf = s.createDataFrame(
      s.sparkContext.parallelize(
        masses.map(_._1).zip(offsets.dropRight(1).map(_._2)).map {
          case (pid, offs) =>
            org.apache.spark.sql.Row.fromSeq(Seq[Any](pid) ++ offs)
        }.toSeq, 1),
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("pid",
          org.apache.spark.sql.types.IntegerType, nullable = false) +:
          massCols.indices.map(i =>
            org.apache.spark.sql.types.StructField(s"p_off_$i",
              org.apache.spark.sql.types.LongType, nullable = false))))
    val joined = withLocal.join(broadcast(offDf), Seq("pid"))
    val withCums = massCols.zipWithIndex.foldLeft(joined) {
      case (d, (c, i)) =>
        d.withColumn(s"cum_before_$c",
          col(s"p_off_$i") + col(s"local_cb_$c"))
    }
    val out = withCums.drop(
      "pid" +: (massCols.map(c => s"local_cb_$c") ++
        massCols.indices.map(i => s"p_off_$i")): _*)
    (out, totals)
  }

  /** Per-KEY twin of [[globalCumBefore]]: exact exclusive prefix sum
    * of `massCol` within each `keyCol` group, ordered by `sortCols` —
    * the scale-safe replacement for `sum(mass) OVER (PARTITION BY key
    * ORDER BY …)` when the key is LOW-CARDINALITY but the rows are
    * corpus-grain (a |keys|-partition WindowExec funnels the whole
    * corpus through |keys| reducer tasks; q90's source-keyed packing
    * is exactly this shape). Only worth it at corpus grain: q143's
    * flag-keyed cumsum runs over a domain-bounded frame (distinct
    * cents) where this rewrite MEASURED 1.4× slower and was rejected
    * — see the note at its call site.
    * Range partitioning on (key, sortCols) keeps each key contiguous,
    * so the per-(partition, key) mass collect is bounded by
    * P + |keys| rows. `keyCol` must be a non-null STRING column
    * (null keys would silently drop out of the offset join);
    * `massCol` LONG non-null.
    */
  def keyedCumBefore(
      df: DataFrame, keyCol: String, sortCols: Seq[Column],
      massCol: String): DataFrame = {
    val s = df.sparkSession
    val allSort = col(keyCol) +: sortCols
    val parts = df
      .repartitionByRange(s.sparkContext.defaultParallelism, allSort: _*)
      .sortWithinPartitions(allSort: _*)
    val ki = parts.schema.fieldIndex(keyCol)
    val mi = parts.schema.fieldIndex(massCol)
    val schema = org.apache.spark.sql.types.StructType(
      parts.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("pid",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("local_cb",
          org.apache.spark.sql.types.LongType, nullable = false)))
    // partition-local running cumsum, reset at each key change (the
    // range partitioner keeps each partition sorted by (key, sort))
    val withLocal = s.createDataFrame(
      parts.rdd.mapPartitionsWithIndex { (pid, it) =>
        var curKey: String = null
        var started = false
        var cum = 0L
        it.map { r =>
          val k = r.getString(ki)
          if (!started || k != curKey) { started = true; curKey = k; cum = 0L }
          // Seq[Any]: a bare Seq(pid, cum) would weak-conform the Int
          // pid up to Long and break the IntegerType schema field
          val out = org.apache.spark.sql.Row.fromSeq(
            r.toSeq ++ Seq[Any](pid, cum))
          cum += r.getLong(mi)
          out
        }
      }, schema)
    val masses = withLocal.groupBy(col("pid"), col(keyCol))
      .agg(sum(col(massCol)).as("mass"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // per-key prefix over partition order — no cross-key ordering
    // needed, each key's partitions are contiguous and ascending
    val offsets = masses.groupBy(_._2).iterator.flatMap {
      case (k, rows) =>
        var run = 0L
        rows.sortBy(_._1).map { case (pid, _, m) =>
          val off = run; run += m; (pid, k, off)
        }
    }.toSeq
    val offDf = s.createDataFrame(offsets).toDF("pid", keyCol, "key_off")
    withLocal.join(broadcast(offDf), Seq("pid", keyCol))
      .withColumn("cum_before", col("key_off") + col("local_cb"))
      .drop("pid", "local_cb", "key_off")
  }

  /** ntile(10)-equivalent decile from the exact global index `rn` over
    * `n` rows: the first n%10 buckets take ⌈n/10⌉ rows, the rest
    * ⌊n/10⌋ — SQL ntile semantics derived from exact integers (shared
    * by q50 and q149, same fold as [[globalRankByRange]]).
    */
  def exactDecile(rn: Column, n: Long): Column = {
    val q = n / 10
    val r = n % 10
    val big = r * (q + 1) // rows living in the ceil-sized buckets
    when(rn <= lit(big),
      (floor((rn - 1) / lit((q + 1).toDouble)) + 1).cast("int"))
      .otherwise((lit(r) + floor((rn - lit(big) - 1) /
        lit(q.max(1L).toDouble)) + 1).cast("int"))
  }

  /** Oracle twin of [[coverageCurve]]: `tot`/`top`/`r` CTEs over a
    * caller-defined `pk` CTE; read the final projection from
    * `r CROSS JOIN tot` (`rank`, the pk columns, `cum_mass`, `tot_u`).
    */
  def coverageCurveSql(keyCol: String, massCol: String, n: Int): String =
    s"""tot AS (SELECT sum($massCol) AS tot_u FROM pk),
       |top AS (SELECT * FROM pk ORDER BY $massCol DESC, $keyCol LIMIT $n),
       |r AS (SELECT *, CAST(row_number() OVER (ORDER BY $massCol DESC,
       |      $keyCol) AS BIGINT) AS rank,
       |    sum($massCol) OVER (ORDER BY $massCol DESC, $keyCol
       |      ROWS UNBOUNDED PRECEDING) AS cum_mass
       |  FROM top)""".stripMargin
}

/** Session-scoped persisted-DataFrame cache keyed by (session, dir)
  * with a [[Q.dirStamp]] staleness check: the shared "build the index
  * once" discipline behind the vector/shingle bases. A hit whose
  * stamp no longer matches the directory is unpersisted and rebuilt,
  * so a corpus rewrite under a cached path cannot serve stale data.
  * Entries self-evict when the owning SparkContext stops (listener
  * registered on first use) — NOTE this fires per application, not
  * per session: SparkSessions sharing one context are not evicted
  * individually when dropped, so a service that cycles sessions on a
  * shared context must call the module `clearCaches(session)` hooks
  * at session retirement (the per-session eviction API).
  *
  * Durable tier: `name` is the frame's identity in
  * [[graft.sources.IndexStore]]. When `spark.graft.index.root` is set,
  * a cache miss reads the stored index (or builds + writes it first),
  * so the persisted frame's lineage is a parquet scan of the index
  * table — a cold session pays a load, not a corpus recompute, and an
  * LRU-evicted frame re-materializes from storage.
  *
  * Memory bound: all StampedCache instances share one LRU budget of
  * `spark.graft.cache.maxFrames` persisted frames per session
  * (default 64) — without it a long-lived service touching many
  * corpora accumulates persisted frames without bound. Eviction only
  * unpersists (drops cached blocks); a returned plan that still
  * references an evicted frame recomputes through its lineage.
  */
private[queries] final class StampedCache(
    val name: String, durable: Boolean = true) {
  private val m = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (Long, DataFrame)]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Get-or-build the persisted frame for (s, dir). `build` must NOT
    * persist; the cache does.
    */
  def get(s: SparkSession, dir: String)(build: => DataFrame): DataFrame = {
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          clear(s)
          hooked.remove(s)
        }
      })
    }
    val frame = m.compute((s, dir), { (_, cur) =>
      val stamp = Q.dirStamp(dir)
      if (cur != null && cur._1 == stamp) cur
      else {
        if (cur != null) cur._2.unpersist()
        val frame =
          if (durable)
            graft.sources.IndexStore.readThrough(s, dir, name, stamp)(build)
          else build
        (stamp, frame.persist())
      }
    })._2
    StampedCache.touchAndEnforce(this, s, dir)
    frame
  }

  private[queries] def evict(s: SparkSession, dir: String): Unit = {
    val v = m.remove((s, dir))
    // the onApplicationEnd listener races the context teardown: by the
    // time it fires the context may already be stopped, and unpersist
    // then throws "Cannot call methods on a stopped SparkContext" —
    // the blocks are gone with the context, so dropping the map entry
    // is the whole remaining job. isStopped alone is TOCTOU (the stop
    // can complete between the check and the call), so the call is
    // additionally guarded (r9 review finding).
    if (v != null && !s.sparkContext.isStopped) {
      try v._2.unpersist()
      catch {
        case e: IllegalStateException
            if e.getMessage != null &&
              e.getMessage.contains("stopped SparkContext") => ()
      }
    }
  }

  /** Evict (and unpersist) all of this session's entries. Keys are
    * collected before acting so the companion's LRU lock is never
    * taken while inside the map traversal (lock-order discipline vs
    * the enforce path, which holds the LRU lock while touching `m`).
    */
  def clear(s: SparkSession): Unit = {
    val keys = scala.collection.mutable.ArrayBuffer[(SparkSession, String)]()
    m.forEach { (k, _) => if (k._1 eq s) keys += k }
    keys.foreach { k =>
      evict(k._1, k._2)
      StampedCache.forget(this, k._1, k._2)
    }
  }
}

private[queries] object StampedCache {
  /** Max persisted index frames per session across ALL caches. */
  val MaxFramesConf = "spark.graft.cache.maxFrames"

  // access-ordered registry of live entries across every cache
  private val lru = new java.util.LinkedHashMap[
    (StampedCache, SparkSession, String), Unit](16, 0.75f, true)

  private def touchAndEnforce(
      c: StampedCache, s: SparkSession, dir: String): Unit = synchronized {
    lru.put((c, s, dir), ())
    val budget =
      try s.conf.get(MaxFramesConf, "64").toInt
      catch { case _: NumberFormatException => 64 }
    // evict this session's least-recently-used entries past the budget
    // (the entry just touched is most-recent and survives any budget ≥ 1)
    var mine = 0
    lru.keySet.forEach(k => if (k._2 eq s) mine += 1)
    if (mine > budget.max(1)) {
      val it = lru.keySet.iterator()
      while (mine > budget.max(1) && it.hasNext) {
        val k = it.next()
        if (k._2 eq s) {
          it.remove()
          k._1.evict(k._2, k._3)
          mine -= 1
        }
      }
    }
  }

  private def forget(
      c: StampedCache, s: SparkSession, dir: String): Unit = synchronized {
    lru.remove((c, s, dir))
  }
}
