package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2.3/§7.
  *
  * Every declared operator of the rebuild registers here as a named
  * query; where the semantics are ANSI-SQL-expressible the matching
  * DuckDB oracle is declared alongside (same column names, same row
  * order — see [[graft.queries.Q]] for the determinism rules).
  */
object SparkEntry {

  /** All declared queries, in SURVEY.md §2.3 order. */
  private val all: Seq[QueryDef] =
    Relational.defs ++ TextQueries.defs ++ VectorQueries.defs ++
      DedupQueries.defs ++ MultimodalQueries.defs ++ Analytics.defs ++
      Analytics.defs2 ++ Analytics2.defs ++ Analytics2.defs2 ++
      Analytics2.defs3 ++ Analytics2.defs4 ++ Analytics3.defs ++
      Analytics4.defs ++ Analytics5.defs ++ HtmlQueries.defs ++
      EventQueries.defs

  require(all.map(_.name).distinct.size == all.size, "duplicate query name")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_join_denorm")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** Declaration-order names (dev tooling: PlanDump ALL). */
  def queryNames: Seq[String] = all.map(_.name)

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB
    * on the same parquet tables. Omitted for the approximate operators
    * (q26/q27 LSH, q29 ANN) → driver records a rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
