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

  def ts(s: String): Column = lit(s).cast("timestamp")

  def day(c: Column): Column = date_format(date_trunc("day", c), "yyyy-MM-dd")
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
  */
private[queries] final class StampedCache {
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
          m.forEach { (k, _) => if (k._1 eq s) m.remove(k) }
          hooked.remove(s)
        }
      })
    }
    m.compute((s, dir), { (_, cur) =>
      val stamp = Q.dirStamp(dir)
      if (cur != null && cur._1 == stamp) cur
      else {
        if (cur != null) cur._2.unpersist()
        (stamp, build.persist())
      }
    })._2
  }

  /** Evict (and unpersist) all of this session's entries. */
  def clear(s: SparkSession): Unit =
    m.forEach { (k, v) => if (k._1 eq s) { v._2.unpersist(); m.remove(k) } }
}
