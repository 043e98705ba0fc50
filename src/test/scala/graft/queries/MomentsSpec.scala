package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The z-score moment base (q58/q82) must survive sums past 2⁶³ —
  * the 100 TB failure mode the DECIMAL(38,0) accumulators exist for:
  * a LONG Σv/Σv² overflows there, and ANSI mode fails the whole query.
  * (The decimal bound is 10³⁸, not unconditional — four-plus orders
  * beyond any real corpus's moments; past IT, ANSI still fails loudly
  * rather than wrapping.)
  */
class MomentsSpec extends SparkTestBase {

  test("decMoments sums past 2^63 exactly, no ANSI overflow") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      // 4 rows of 4×10¹⁸: Σv = 1.6×10¹⁹ > 2⁶³ ≈ 9.2×10¹⁸ (a long sum
      // overflows on the second row); Σv² = 6.4×10³⁷ (38 digits — the
      // largest shape DECIMAL(38,0) must still carry exactly)
      val v = 4000000000000000000L
      val df = Seq.fill(4)(("a", v)).toDF("g", "v")
      val m = Q.decMoments(col("v"))
      val agg = df.groupBy(col("g")).agg(m.head, m.tail: _*)
      // the ACCUMULATORS are 38-digit (inputs cast before the sum):
      // summing the raw dec(19,0) would accumulate at only 29 digits
      agg.schema.drop(2).foreach { f =>
        assert(f.dataType ==
          org.apache.spark.sql.types.DecimalType(38, 0),
          s"${f.name} accumulates as ${f.dataType}")
      }
      val r = agg.head()
      assert(r.getLong(1) == 4L)
      assert(r.getDecimal(2).compareTo(
        new java.math.BigDecimal("16000000000000000000")) == 0,
        s"sv = ${r.getDecimal(2)}")
      assert(r.getDecimal(3).compareTo(new java.math.BigDecimal(
        "64000000000000000000000000000000000000")) == 0,
        s"ssq = ${r.getDecimal(3)}")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("a LONG accumulator would have overflowed on the same input") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val df = Seq.fill(4)(("a", 4000000000000000000L)).toDF("g", "v")
      val ex = intercept[Exception] {
        df.groupBy(col("g")).agg(sum(col("v"))).collect()
      }
      assert(ex.getMessage.toLowerCase.contains("overflow"),
        s"expected an ANSI overflow, got: ${ex.getMessage}")
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
