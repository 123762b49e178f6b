package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Schema pins for the driver-generated tables.
  *
  * The driver has regenerated testdata mid-build with a different physical
  * type for `events.ts` (TIMESTAMP(NANOS) → read as LONG through r6, then
  * `timestamp[us]` without timezone → TIMESTAMP_NTZ from r7). Tables.events
  * must absorb every variant into a session-typed TIMESTAMP; these pins
  * make the NEXT silent regeneration fail loudly here instead of deep in
  * `window()` / typed-encoder paths (the r7 regression mode).
  */
class TablesSpec extends SparkSuite {

  test("Tables.events normalizes ts to session-typed TIMESTAMP regardless of parquet drift") {
    val df = Tables.events(spark, sf)
    assert(df.schema("ts").dataType == TimestampType,
      s"events.ts must be TIMESTAMP after Tables.events, got ${df.schema("ts").dataType}")
    assert(df.schema("ts").dataType != TimestampNTZType)
  }

  test("normalized ts survives window() + unix_millis (the A31 regression shape)") {
    import org.apache.spark.sql.functions._
    val out = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"))
      .count()
      .select(unix_millis(col("window.start")).as("ms"))
    assert(out.head().getLong(0) > 0L)
  }

  test("normalized ts encodes into the typed Event case class (the A14 regression shape)") {
    val s = spark
    import s.implicits._
    val ev = Tables.events(s, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[graft.streaming.EventPipeline.Event]
    val first = ev.head()
    assert(first.ts != null)
  }
}
