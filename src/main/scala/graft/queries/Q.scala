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
