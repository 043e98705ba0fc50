package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.DataFrame

/** Streaming face of q109's CDC latest-per-key compaction: maintain a
  * standing "current state" view of an append-only changelog, one
  * micro-batch at a time, through the same staged/verified commit tier
  * as the corpus ([[CorpusMaintenance]]).
  *
  * This is NOT [[CorpusMaintenance.upsertBatch]]: that merge is
  * batch-WINS on key — correct for document upserts, where the new
  * delivery is the truth — but wrong for a changelog, where deliveries
  * can arrive OUT OF ORDER and an old version replayed late must never
  * regress the view. Here the winner is the greatest
  * (versionCols..., payload...) struct across standing ∪ delta, so the
  * merge is: commutative across deliveries (any arrival order yields
  * the state of the full log), idempotent under at-least-once replay
  * (max is idempotent), and exactly q109's batch semantics — the spec
  * pins incremental ≡ batch-compact-of-the-whole-log.
  *
  * Scale: the partitioned mode (`layout = Some(...)`) is the 100 TB
  * contract — the view is hive-partitioned by key-hash bucket
  * ([[graft.operators.PartitionedCommit]]) and a delta stages + swaps
  * only its touched buckets: per-delivery cost is O(delta + touched
  * slice), never O(view). The delta side is micro-batch-sized and
  * collapses to one row per key BEFORE any standing data is read.
  */
object ChangelogCompaction {

  /** Latest row per key over an arbitrary changelog frame — ONE
    * definition serving the batch query (q109's agg shape: a single
    * hash aggregate, max over the version-led struct, map-side
    * partials — no row_number window) and every incremental merge
    * below. `versionCols` lead the comparison struct in the given
    * order; remaining payload columns follow only as a deterministic
    * tiebreak for byte-identical versions. Null keys are dropped
    * (a null never equi-joins — [[CorpusMaintenance.dedupBatch]]'s
    * rule). Column order of the input is preserved.
    */
  def latestPerKey(
      rows: DataFrame, keyCol: String,
      versionCols: Seq[String]): DataFrame = {
    val payload = rows.columns.filterNot(c =>
      c == keyCol || versionCols.contains(c))
    val ordered = versionCols ++ payload
    rows
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(struct(ordered.map(col): _*)).as("__v"))
      .select(rows.columns.map {
        case `keyCol` => col(keyCol)
        case c => col(s"__v.$c").as(c)
      }.toSeq: _*)
  }

  /** Merge one changelog delta into the standing view at `path`
    * (creating it if absent). Returns the rows COMMITTED by this
    * delivery: the whole view in full-rewrite mode (the rewrite writes
    * every row), the touched-slice row count in partitioned mode. The
    * partitioned return is deliberately NOT the standing total — a
    * per-delivery `standingCount` would footer-scan every bucket of
    * the view on every micro-batch, an O(view) read that breaks the
    * documented O(delta + touched slice) apply cost; a caller that
    * wants the table total calls [[PartitionedCommit.standingCount]]
    * explicitly, outside the delivery loop.
    */
  def applyDelta(
      delta: DataFrame, path: String, keyCol: String,
      versionCols: Seq[String],
      layout: Option[graft.operators.PartitionedCommit.Layout] = None)
      : Long = {
    val spark = delta.sparkSession
    val dd = latestPerKey(delta, keyCol, versionCols)
    layout match {
      case None =>
        // full-rewrite mode: honest O(view) per delivery — the merge
        // is simply latest-per-key over standing ∪ delta (standing
        // rows are single-per-key already; max re-derives them)
        val merged =
          if (!graft.operators.CommitSink.healInterrupted(spark, path)) dd
          else latestPerKey(
            spark.read.parquet(path).unionByName(dd), keyCol, versionCols)
        graft.operators.CommitSink.writeVerified(spark, merged, path)
      case Some(l) =>
        import graft.operators.PartitionedCommit
        val B = PartitionedCommit.BucketCol
        // ≤ |delta| rows — driver-safe by construction
        val touched = dd
          .select(l.bucketOf(col(keyCol)).as(B))
          .distinct().collect().map(_.getInt(0)).toSeq.sorted
        val merged = PartitionedCommit.readIfAny(spark, path) match {
          case None =>
            dd.withColumn(B, l.bucketOf(col(keyCol)))
          case Some(standing) =>
            // touched slice prunes at planning time; untouched keys in
            // a touched bucket survive as the max of their own single
            // standing row
            latestPerKey(
              standing.filter(col(B).isin(touched: _*)).drop(B)
                .unionByName(dd),
              keyCol, versionCols)
              .withColumn(B, l.bucketOf(col(keyCol)))
        }
        PartitionedCommit.commitPartitions(spark, merged, path, touched)
    }
  }

  /** Continuous compaction: every micro-batch of `changelog` (a
    * streaming DataFrame) merges into the standing view. Offsets live
    * in `checkpoint`; [[applyDelta]] is idempotent and
    * arrival-order-free, so at-least-once delivery still converges to
    * the state of the full log.
    */
  def maintain(
      changelog: DataFrame,
      path: String,
      checkpoint: String,
      keyCol: String,
      versionCols: Seq[String],
      layout: Option[graft.operators.PartitionedCommit.Layout] = None)
      : StreamingQuery =
    changelog.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyDelta(batch, path, keyCol, versionCols, layout)
        ()
      }
      .start()
}
