package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Cols.dayStr

/** Storage layout for the event history at scale: how the stream lands on
  * disk decides what every later query pays.
  *
  *  - Day-partitioned parquet: time-range queries prune whole directories
  *    (the dashboard reads "today", not 100 TB).
  *  - Bucketed tables on the join/aggregation key: co-located joins and
  *    aggregations skip the shuffle entirely (verified by LayoutSpec — the
  *    bucketed join plan contains no Exchange).
  */
object Layout {

  /** Land events day-partitioned (partition pruning for time windows). */
  def writeEventsPartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("day", dayStr(col("ts")))
      .repartition(col("day")) // one writer wave per partition dir, no tiny files
      .write.mode(SaveMode.Overwrite)
      .partitionBy("day")
      .parquet(path)

  /** Save as a bucketed table on `key` (requires saveAsTable — bucket
    * metadata lives in the catalog). nBuckets should match downstream
    * parallelism at the target scale. */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Read back a day range with partition pruning. */
  def readEventsRange(spark: SparkSession, path: String,
                      fromDay: String, toDay: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("day") >= fromDay && col("day") <= toDay)
}
