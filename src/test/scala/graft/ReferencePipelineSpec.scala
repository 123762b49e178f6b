package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventPipeline
import graft.streaming.EventPipeline.Event

/** End-to-end composition of the full reference pipeline in ONE streaming
  * flow: ingest → dedup (watermarked) → stateful per-user rate limit →
  * static enrichment → alerting, with the dashboard window aggregation as a
  * parallel branch — the whole auto_kafka_redis.py consumer as one query
  * graph. */
class ReferencePipelineSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def writeBatch(dir: String, file: String, events: Seq[Event]): Unit = {
    val staging = Files.createTempDirectory("graft-stage").toString
    events.toDF().coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/$file.parquet"))
  }

  test("full pipeline: dedup -> rate limit -> enrich -> alerts, windowed branch") {
    val src = Files.createTempDirectory("graft-full-src").toString
    val chk1 = Files.createTempDirectory("graft-full-chk1").toString
    val chk2 = Files.createTempDirectory("graft-full-chk2").toString

    // user 3: 7 error events in one hour, one duplicated id. After dedup (6
    // distinct) and rate limit 5, exactly 5 reach enrichment+alerting.
    val events =
      (1 to 6).map(i => Event(i, ts(i), 3, "error", 190.0)) :+
        Event(6, ts(6), 3, "error", 190.0) :+      // duplicate id 6
        Event(100, ts(7), 9999, "error", 190.0)    // user with no dim row

    writeBatch(src, "b1", events)
    val in = EventPipeline.fileSource(spark, src)

    val deduped = EventPipeline.deduped(in, watermark = "2 hours")
    val limited = EventPipeline.rateLimited(deduped.as[Event], limit = 5).filter(_.admitted)
    val dim = Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment"))
    val enriched = limited.toDF()
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
    val alerts = enriched
      .filter(col("event_type") === "error" && col("value") >= 150.0)
      .select(col("event_id"), col("user_id"), col("c_mktsegment"),
        when(col("value") >= 180.0, "critical").otherwise("warning").as("level"))

    val q1 = alerts.writeStream.format("memory").queryName("full_alerts")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk1).start()
    val q2 = EventPipeline.windowedCounts(in, watermark = Some("2 hours"))
      .writeStream.format("memory").queryName("full_windows")
      .outputMode(OutputMode.Update).option("checkpointLocation", chk2).start()
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()

    val alertRows = spark.table("full_alerts").collect()
    // 6 distinct events for user 3, rate-limited to 5, all critical; user
    // 9999 dropped by enrichment (no dim row)
    assert(alertRows.length == 5, s"got ${alertRows.length}: ${alertRows.toSeq}")
    assert(alertRows.forall(_.getAs[String]("level") == "critical"))
    assert(alertRows.forall(_.getAs[Long]("user_id") == 3L))
    assert(alertRows.map(_.getAs[Long]("event_id")).toSet.subsetOf((1 to 6).map(_.toLong).toSet))

    val winRows = spark.table("full_windows").collect()
    // raw dashboard branch has no dedup/rate limit: all 8 arrivals count
    assert(winRows.map(_.getAs[Long]("n_events")).max == 8L, winRows.toSeq.toString)
  }
}
