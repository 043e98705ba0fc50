package graft
import org.apache.spark.sql.SparkSession
/** Tiny driver-contract smoke runner (t1 shape): entry() rows>0. */
object SmokeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println("SMOKE_ROWS=" + df.count())
    df.show(5)
    spark.stop()
  }
}
