package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{call_function, col, lit, timestamp_micros}

/** Typed loaders for the driver-generated parquet tables.
  *
  * Every operator goes through these so column pruning / predicate pushdown
  * reach the parquet scan (verified via `.explain` ReadSchema/PushedFilters).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` has drifted across driver testdata regenerations:
    * TIMESTAMP(NANOS) (readable only as a nanosecond LONG under the legacy
    * conf) through r6, then plain `timestamp[us]` WITHOUT timezone (Spark:
    * TIMESTAMP_NTZ) from r7's regeneration. Normalize every variant to a
    * session-typed TIMESTAMP here, once, so downstream consumers
    * (`window()`, `unix_millis`, the typed `Event` encoder) never see the
    * drift. The session TZ is pinned to UTC (GraftSession), so the
    * NTZ→TIMESTAMP cast is value-preserving and agrees with DuckDB, which
    * reads the same file as a naive timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) parquet
        df.withColumn("ts", timestamp_micros(call_function("div", col("ts"), lit(1000L))))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df // already a session-typed timestamp table
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
