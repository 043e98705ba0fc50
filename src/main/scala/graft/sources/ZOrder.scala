package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton-curve) data layout — multi-dimensional clustering
  * for scan pruning (ref: the reference re-sorts its working set by a
  * single user-picked column, `Batch Processor.py:452-460`; at 100 TB
  * the question becomes which ONE column to cluster by, and the
  * z-curve answers "both").
  *
  * A table sorted by column A packs A tightly per file but leaves
  * every file spanning the FULL range of column B — predicates on B
  * prune nothing. Interleaving the bits of both columns' bucket ids
  * into one sort key makes file boundaries axis-aligned rectangles in
  * (A, B) space: each file covers ~2^(−k/2) of EACH dimension's
  * range, so parquet min/max stats prune scans on either column (or
  * both). That is the entire mechanism — no index structure, no read-
  * path code: the WRITTEN LAYOUT is the index, and Spark's ordinary
  * row-group/file skipping consumes it.
  *
  * Quantization is linear between the observed min/max (one tiny agg;
  * the 1-row collect is plan-time bounded, q50's count precedent) —
  * right for the uniform-ish key domains it targets (ids, dates,
  * buckets). Heavily skewed columns crowd into few linear buckets;
  * [[layoutRanked]] is the refinement: percentile (rank) boundaries
  * from one approxQuantile pass put equal row mass in every bucket,
  * so file rectangles track density instead of range (spec proves the
  * per-file rank-span tightening on a heavy-tailed fixture).
  *
  * Scale shape: one pass — project z, `repartitionByRange` on z (the
  * same sampled exchange any global sort pays), sort within
  * partitions, write. No shuffle beyond the one range exchange; file
  * count = partition count.
  */
object ZOrder {

  /** Morton interleave of two bucket ids (each in [0, 2^bits)):
    * a's bit i lands at 2i+1, b's at 2i. Pure Column arithmetic —
    * the fold builds a flat codegen-friendly bit-op tree, no UDF.
    */
  def interleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }
  }

  /** Linear bucket id of `c` over [lo, hi] into 2^bits buckets.
    * Overflow-safe by construction — the naive (c−lo)·n/span form
    * wraps long arithmetic once the domain span exceeds 2⁶³/2^bits
    * (~1.4e14 at bits=16: a few YEARS of epoch-micros), silently
    * producing garbage z-keys, i.e. a random layout with no error.
    * Wide domains divide FIRST (width ≥ span/n + 1 ⟹ quotient < n,
    * no clamp needed); narrow domains multiply by n/(span+1), whose
    * product is < n and cannot wrap either.
    */
  private def bucket(colName: String, lo: Long, hi: Long, bits: Int): Column = {
    val n = 1L << bits
    // full-width signed domains (xxhash64 keys: lo ≈ Long.MIN, hi ≈
    // Long.MAX) overflow hi−lo itself — (hi−lo).max(1) would wrap to
    // a SMALL span and send the widest possible domain down the
    // narrow-domain multiply branch, wrapping again per row (the
    // silent random layout this function exists to prevent). Detect
    // in BigInt; bucket by flipping the sign bit (unsigned order) and
    // taking the top `bits` — exact equi-width over the full 2⁶⁴
    // line, no subtraction anywhere.
    if (BigInt(hi) - BigInt(lo) + 1 > BigInt(Long.MaxValue))
      return shiftrightunsigned(
        col(colName).cast("long").bitwiseXOR(lit(Long.MinValue)),
        64 - bits)
    val span = (hi - lo).max(1L)
    if (span + 1 >= n) {
      // exact integer DIV: width > span/n makes the quotient < n with
      // no clamp, and both operands stay well under 2⁶³ (a double-
      // division floor could land off-by-one at exact multiples)
      val width = span / n + 1L
      expr(s"(CAST(`$colName` AS BIGINT) - ${lo}L) DIV ${width}L")
    } else {
      // small domain: spread across the bucket range so this column's
      // bits carry comparable weight in the interleave; factor·span < n
      val factor = n / (span + 1)
      expr(s"(CAST(`$colName` AS BIGINT) - ${lo}L) * ${factor}L")
    }
  }

  /** Rank (percentile) bucket id: the count of `splits` ≤ value, via
    * binary search over the deduped sorted boundary array. The
    * documented refinement for SKEWED columns (scaladoc above): linear
    * quantization crowds a heavy-tailed column into bucket 0 — every
    * written file then spans nearly the column's whole VALUE MASS and
    * min/max pruning dies on exactly the hot range queries hit; rank
    * boundaries put ≈equal ROW MASS in every bucket, so file
    * boundaries track the data's density, not its range. A few-compare
    * binary search per row on the write path only; CodegenFallback is
    * fine next to the range exchange the layout pays anyway.
    */
  private case class RankBucket(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      splits: Array[Long])
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: org.apache.spark.sql.types.DataType =
      org.apache.spark.sql.types.LongType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.LongType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case o => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"rank_bucket expects bigint, got ${o.catalogString}")
      }
    override def nullSafeEval(v: Any): Any = {
      val i = java.util.Arrays.binarySearch(splits, v.asInstanceOf[Long])
      (if (i >= 0) i + 1 else -i - 1).toLong
    }
    override def prettyName: String = "rank_bucket"
    override protected def withNewChildInternal(
        c: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
  }

  /** Percentile boundaries for each of `colNames` (cast long): up to
    * 2^bits − 1 splits per column from ONE `approxQuantile` pass
    * (Greenwald-Khanna sketch — a single corpus scan for ALL columns,
    * driver arrays of size 2^bits, the same plan-time-bounded shape
    * as the linear min/max probe). Duplicates collapse (a value
    * holding >1/2^bits of the mass owns one bucket), so
    * heavily-repeated keys cannot split across boundaries.
    */
  private def rankSplits(
      df: DataFrame, colNames: Seq[String], bits: Int)
      : Seq[Array[Long]] = {
    val n = 1 << bits
    val probs = (1 until n).map(_.toDouble / n).toArray
    // the MULTI-column approxQuantile overload: one Greenwald-Khanna
    // scan computes every column's boundary array — per-column calls
    // were one full corpus scan EACH on the write path (r8 review)
    df.select(colNames.map(c => col(c).cast("long").as(c)): _*)
      .stat.approxQuantile(colNames.toArray, probs, 1.0 / (4 * n))
      .map(_.map(_.toLong).distinct.sorted)
      .toSeq
  }

  /** [[layout]] with RANK quantization on both columns — the skewed-
    * column form. `bits` defaults to 10 (1024 buckets/dimension):
    * boundary count is 2^bits per column driver-side, and 10+10
    * interleaved bits give a 20-bit z — more than any practical
    * `nFiles` needs to keep file rectangles tight.
    */
  def layoutRanked(df: DataFrame, colA: String, colB: String,
      nFiles: Int, bits: Int = 10): DataFrame = {
    require(nFiles >= 1, "nFiles must be >= 1")
    require(bits >= 1 && bits <= 15, s"rank bits=$bits out of range")
    val Seq(splitsA, splitsB) = rankSplits(df, Seq(colA, colB), bits)
    def rb(c: String, splits: Array[Long]) =
      org.apache.spark.sql.GraftPlanBridge.column(
        RankBucket(
          org.apache.spark.sql.GraftPlanBridge.expression(
            col(c).cast("long")),
          splits))
    df.withColumn("__z",
        interleave(rb(colA, splitsA), rb(colB, splitsB), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Write `df` rank-z-ordered on (colA, colB) as parquet. */
  def writeRanked(df: DataFrame, colA: String, colB: String,
      nFiles: Int, path: String, bits: Int = 10): Unit =
    layoutRanked(df, colA, colB, nFiles, bits)
      .write.mode("overwrite").parquet(path)

  /** `df` re-laid-out on the z-curve of two integral columns, in
    * `nFiles` range partitions sorted by z — ready to write. The
    * min/max probe is one aggregate over the two columns only.
    */
  def layout(df: DataFrame, colA: String, colB: String,
      nFiles: Int, bits: Int = 16): DataFrame = {
    require(nFiles >= 1, "nFiles must be >= 1")
    val r = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    require(!r.isNullAt(0) && !r.isNullAt(2),
      s"z-order columns $colA/$colB are all-null or the frame is empty")
    val z = interleave(
      bucket(colA, r.getLong(0), r.getLong(1), bits),
      bucket(colB, r.getLong(2), r.getLong(3), bits), bits)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Write `df` z-ordered on (colA, colB) as `nFiles` parquet files. */
  def write(df: DataFrame, colA: String, colB: String,
      nFiles: Int, path: String, bits: Int = 16): Unit =
    layout(df, colA, colB, nFiles, bits)
      .write.mode("overwrite").parquet(path)
}
