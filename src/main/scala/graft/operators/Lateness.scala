package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Event-time lateness buckets — the ONE definition of the thresholds
  * behind q194's batch disorder audit and the streaming
  * [[graft.streaming.LatenessAudit]], so the two faces cannot drift
  * (the q67-scrub / q82-spike shared-definition discipline). Both
  * faces derive from the same microsecond constants: [[bucket]] is
  * the Scala form the stateful stream classifier runs per event,
  * [[bucketCol]] the codegen'd Column form the batch query plans.
  * Bucket keys carry a sort prefix so lexicographic order IS severity
  * order, and a plain orderBy renders the histogram in-order.
  */
object Lateness {
  val M1Us: Long = 60000000L
  val M10Us: Long = 600000000L
  val H1Us: Long = 3600000000L

  def bucket(skewUs: Long): String =
    if (skewUs == 0L) "a_in_order"
    else if (skewUs < M1Us) "b_lt_1m"
    else if (skewUs < M10Us) "c_lt_10m"
    else if (skewUs < H1Us) "d_lt_1h"
    else "e_ge_1h"

  def bucketCol(skewUs: Column): Column =
    when(skewUs === 0L, "a_in_order")
      .when(skewUs < M1Us, "b_lt_1m")
      .when(skewUs < M10Us, "c_lt_10m")
      .when(skewUs < H1Us, "d_lt_1h")
      .otherwise("e_ge_1h")
}
