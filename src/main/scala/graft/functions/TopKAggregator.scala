package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: bounded top-k by score with a deterministic tiebreak —
  * the `Aggregator[IN, BUF, OUT]` face of the engine's function
  * framework (SURVEY.md §2.2 "UDF/UDAF/UDTF framework"; the scale
  * upgrade path for q23-style per-group top-k noted in §4.3).
  *
  * Each partition keeps only k (score, id) pairs (partial aggregation
  * — the shuffle carries k rows per group per partition, never the
  * group's full contents), merge unions two bounded buffers, and the
  * finish emits ids best-first. With k ≪ group size this is the
  * difference between shuffling top-k candidates and shuffling the
  * whole group to a window operator.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  require(k > 0, "k must be positive")

  // Ascending-worst-first ordering: (score, then id desc as tiebreak so
  // the *smaller* id wins on equal score — matching the window form
  // orderBy(score.desc, id.asc)).
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def bound(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
    s.sortWith(better).take(k)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)],
      in: (Double, Long)): Seq[(Double, Long)] =
    if (buf.size < k) bound(buf :+ in)
    else if (better(in, buf.last)) bound(buf.init :+ in)
    else buf

  override def merge(a: Seq[(Double, Long)],
      b: Seq[(Double, Long)]): Seq[(Double, Long)] = bound(a ++ b)

  override def finish(buf: Seq[(Double, Long)]): Seq[Long] =
    buf.map(_._2)

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
