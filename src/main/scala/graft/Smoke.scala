package graft

import org.apache.spark.sql.SparkSession

/** Smoke main: runs the flagship SparkEntry.entry the way the driver does
  * and prints its row count + first rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    println(s"entry rows=${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
