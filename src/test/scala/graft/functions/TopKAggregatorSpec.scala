package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("per-group top-k matches the window-function formulation") {
    val data = (for {
      g <- 0 until 5
      i <- 0 until 100
    } yield (g.toLong, (g * 100 + i).toLong, ((i * 37) % 100).toDouble))
      .toDF("grp", "id", "score")

    val agg = new TopKAggregator(3).toColumn
    val got = data.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2))
      .agg(agg.name("top"))
      .collect().toMap

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("id"))
    val expected = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .orderBy("grp", "rn")
      .select("grp", "id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSeq).toMap

    assert(got == expected)
  }

  test("ties break to the smaller id, deterministically") {
    val data = Seq((1L, 10L, 5.0), (1L, 7L, 5.0), (1L, 20L, 5.0),
      (1L, 3L, 1.0)).toDF("grp", "id", "score")
    val got = data.as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2))
      .agg(new TopKAggregator(2).toColumn.name("top"))
      .collect().toMap
    assert(got(1L) == Seq(7L, 10L))
  }
}
