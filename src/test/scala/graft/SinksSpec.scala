package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Source/sink round-trips: the event history must survive parquet, json and
  * csv round-trips with identical values (timestamps as epoch-ms longs in
  * text formats — the schema-stable interchange form). */
class SinksSpec extends SparkSuite {

  private lazy val base = {
    Tables.events(spark, sf)
      .select(col("event_id"), unix_millis(col("ts").cast("timestamp_ltz")).as("ts_ms"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  private def roundtrip(format: String): Unit = {
    val dir = Files.createTempDirectory(s"graft-sink-$format").toString + "/out"
    base.write.format(format).option("header", "true").save(dir)
    val back = spark.read.format(format)
      .option("header", "true").schema(base.schema).load(dir)
    assert(back.count() == base.count())
    val a = base.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b, s"$format round-trip lost data")
  }

  test("parquet round-trip preserves all events")(roundtrip("parquet"))
  test("json round-trip preserves all events")(roundtrip("json"))
  test("csv round-trip preserves all events")(roundtrip("csv"))
}
