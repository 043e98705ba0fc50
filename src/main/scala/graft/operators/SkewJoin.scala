package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split isn't available (e.g. the skew is in a hash
  * aggregate feeding the join, or AQE is off). A hot key that would
  * pin one reducer is spread across `salts` sub-partitions: the large
  * side gets a deterministic salt derived from its whole row, the
  * other side is replicated once per salt value, and the join key
  * becomes (key, salt). Inner-join semantics are exactly preserved —
  * each large-side row meets each matching small-side row exactly once
  * (on its own salt).
  *
  * Cost model: small-side shuffle volume ×`salts`, large-side hot keys
  * spread ×`salts`. Worth it when max-key frequency ≫ rows/partition;
  * prefer `broadcast()` when the small side fits in memory and AQE
  * skew handling otherwise.
  */
object SkewJoin {

  /** Inner equi-join of `large` ⋈ `small` on `key`, salted `salts`
    * ways. Output columns: all of `large` then all of `small` minus
    * its join key (as with `Seq(key)` joins).
    */
  def saltedJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "inputs must not already carry a __salt column")
    // Deterministic per-row salt: hash of the full row, not rand() —
    // reproducible across retries, which matters for exactly-once
    // sinks downstream.
    val salted = large.withColumn("__salt",
      pmod(xxhash64(struct(large.columns.toIndexedSeq.map(col): _*)),
        lit(salts.toLong)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
