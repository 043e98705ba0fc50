package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming face of q194's event-time DISORDER audit: a per-user
  * running event-time high-water mark held in `flatMapGroupsWithState`
  * state classifies every arriving event's lateness into
  * [[graft.operators.Lateness]]'s buckets — the LIVE readout of what a
  * candidate watermark WOULD silently drop, before anyone deploys one.
  * The batch twin (`q194_ooo_audit`) computes the same histogram
  * retrospectively from the stored arrival order; the thresholds are
  * one shared definition and LatenessAuditSpec proves both faces give
  * the same answer on the same arrivals.
  *
  * Arrival order WITHIN a micro-batch is `event_id` (the batch twin's
  * definition — a group's iterator carries no order guarantee, so the
  * classifier sorts); across micro-batches it is batch order, which
  * any in-order feed preserves.
  *
  * State envelope: ONE long per user — the same |users| bound as
  * [[Sessionize]]'s open sessions, but unlike sessions there is
  * nothing to flush on idle: a user's high-water mark stays correct
  * forever, so `NoTimeout` is sound and the operator never needs a
  * watermark of its own (it is the tool that SIZES one).
  */
object LatenessAudit {

  /** One arriving event: `us` = event-time micros, `event_id` = the
    * within-batch arrival order (the batch twin's axis).
    */
  final case class Arrival(event_id: Long, user_id: Long, us: Long)

  /** A classified event that HAS an earlier-arriving same-user
    * predecessor; first-per-user events classify nothing (no
    * high-water mark to be late against — same exclusion as q194).
    */
  final case class Late(
      user_id: Long, event_id: Long, bucket: String, skew_us: Long)

  // public: the state encoder's generated code constructs it
  final case class Mark(max_us: Long)

  /** Per-event lateness classification; aggregate downstream at the
    * caller's grain (`groupBy(bucket).count` for q194's histogram).
    */
  def classify(events: Dataset[Arrival]): Dataset[Late] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Mark, Late](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Arrival], state) =>
          var mx = state.getOption.map(_.max_us).getOrElse(Long.MinValue)
          val out = it.toArray.sortBy(_.event_id).flatMap { e =>
            val r =
              if (mx == Long.MinValue) None
              else {
                val skew = math.max(0L, mx - e.us)
                Some(Late(uid, e.event_id,
                  graft.operators.Lateness.bucket(skew), skew))
              }
            mx = math.max(mx, e.us)
            r
          }
          if (mx != Long.MinValue) state.update(Mark(mx))
          out.iterator
      }
  }
}
