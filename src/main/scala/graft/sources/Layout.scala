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

  /** Compact a directory of small parquet files into ~`targetBytes` files —
    * streaming sinks emit one shard per trigger per partition, and a 100 TB
    * table of kilobyte files destroys scan throughput (per-file open cost,
    * no row-group parallelism). Sizes come from the actual file listing, so
    * the output file count tracks data volume, not partition count.
    * Returns the number of output files. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    val df = spark.read.parquet(inPath)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    df.repartition(nOut).write.mode(SaveMode.Overwrite).parquet(outPath)
    nOut
  }
}
