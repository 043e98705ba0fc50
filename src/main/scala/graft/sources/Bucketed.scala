package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the 100 TB answer to
  * "this join shuffles both sides every run": persist both fact tables
  * bucketed (and sorted) by the join key, and every subsequent
  * equi-join on that key is exchange-free — each task sort-merges
  * bucket i of A with bucket i of B directly off storage.
  *
  * Write-once, join-many: the shuffle is paid once at layout time
  * instead of per query. Bucket count is fixed at write time — size it
  * to target-partition bytes at full scale (e.g. 100 TB / 128 MB ≈
  * 800 k is too many files; bucket on the *key cardinality* you join
  * at, typically 1–4 k buckets per large table).
  */
object Bucketed {

  /** Persist `df` as a bucketed+sorted parquet table in the session
    * catalog. Sorting within buckets lets the sort-merge join skip its
    * sort as well.
    */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .format("parquet")
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two bucketed tables on their bucket key. When both were
    * written with the same bucket count, the plan contains no Exchange
    * on either side (asserted in BucketedSpec).
    */
  def join(spark: SparkSession, a: String, b: String, key: String): DataFrame =
    spark.table(a).join(spark.table(b), key)
}
