package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventPipeline
import graft.streaming.EventPipeline.Event

/** A14–A16: the Structured Streaming pipeline driven end-to-end on a file
  * source (new parquet files = new Kafka messages), with planted duplicate
  * ids and a rate-limit-exceeding user. */
class StreamingSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def writeBatch(dir: String, file: String, events: Seq[Event]): Unit = {
    // the file stream source expects flat data files in the watched dir
    val staging = Files.createTempDirectory("graft-stage").toString
    events.toDF().coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$dir/$file.parquet"))
  }

  test("A14: dedup + windowed counts over a file source") {
    val src = Files.createTempDirectory("graft-stream-src").toString
    val chk = Files.createTempDirectory("graft-stream-chk").toString
    // batch 1: events 1..4 with a duplicate id 2; batch 2: replays id 3, adds 5
    writeBatch(src, "b1", Seq(
      Event(1, ts(0), 1, "click", 10.0), Event(2, ts(1), 1, "view", 20.0),
      Event(2, ts(1), 1, "view", 20.0), Event(3, ts(2), 2, "error", 190.0)))

    val in = EventPipeline.fileSource(spark, src)
    val counts = EventPipeline.windowedCounts(EventPipeline.deduped(in),
      watermark = None, window = "1 hour")
    val q = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()

    writeBatch(src, "b2", Seq(
      Event(3, ts(2), 2, "error", 190.0), // exact replay, must be deduped
      Event(5, ts(3), 2, "click", 30.0)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("win_counts")
      .groupBy("event_type").agg(max("n_events").as("n")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(out("view") == 1L, s"duplicate id 2 not deduped: $out")
    assert(out("error") == 1L, s"replayed id 3 not deduped: $out")
    assert(out("click") == 2L, s"got $out")
  }

  test("A14b: restart from checkpoint restores dedup state (offset restore)") {
    val src = Files.createTempDirectory("graft-ckpt-src").toString
    val chk = Files.createTempDirectory("graft-ckpt-chk").toString
    def dedupStream = EventPipeline.deduped(
      EventPipeline.fileSource(spark, src), watermark = "2 hours")
      .select("event_id", "user_id", "value")

    val out = Files.createTempDirectory("graft-ckpt-out").toString
    writeBatch(src, "b1", Seq(Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 2.0)))
    val q1 = dedupStream.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk).start()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == 2)

    // restart the SAME checkpoint: replayed id 2 must be suppressed by the
    // RESTORED dedup state; only the genuinely new id 3 comes through
    writeBatch(src, "b2", Seq(Event(2, ts(1), 1, "view", 2.0), Event(3, ts(2), 2, "click", 3.0)))
    val q2 = dedupStream.writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk).start()
    q2.processAllAvailable(); q2.stop()
    val all = spark.read.parquet(out).collect().map(_.getAs[Long]("event_id"))
    assert(all.sorted.toSeq == Seq(1L, 2L, 3L), s"state not restored: ${all.toSeq}")
  }

  test("A15: stateful per-user rate limit across micro-batches") {
    val src = Files.createTempDirectory("graft-rate-src").toString
    val chk = Files.createTempDirectory("graft-rate-chk").toString
    // user 1 sends 4 events in batch 1 and 3 more in batch 2 (same window):
    // limit 5 → 5 admitted, 2 dropped. user 2 stays under the limit.
    writeBatch(src, "b1",
      (1 to 4).map(i => Event(i, ts(i), 1, "click", 1.0)) :+ Event(10, ts(1), 2, "view", 1.0))
    val in = EventPipeline.fileSource(spark, src).as[Event]
    val limited = EventPipeline.rateLimited(in, limit = 5)
    val q = limited.toDF().writeStream.format("memory").queryName("rate_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", (5 to 7).map(i => Event(i, ts(10 + i), 1, "click", 1.0)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("rate_out").collect()
    val u1 = rows.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 7)
    assert(u1.count(_.getAs[Boolean]("admitted")) == 5, "state not carried across batches")
    val u2 = rows.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.forall(_.getAs[Boolean]("admitted")))
  }

  test("A8-streaming: session windows close via watermark advance") {
    val src = Files.createTempDirectory("graft-sess-src").toString
    val chk = Files.createTempDirectory("graft-sess-chk").toString
    // user 1: two events 5 min apart (one session), then one 2h later (new
    // session). A far-future sentinel pushes the watermark so sessions emit.
    writeBatch(src, "b1", Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(5), 1, "view", 2.0),
      Event(3, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "click", 3.0)))
    val in = EventPipeline.fileSource(spark, src)
    val q = EventPipeline.sessionized(in, gap = "30 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", Seq(
      Event(99, Timestamp.valueOf("2024-01-02 00:00:00"), 2, "click", 0.0)))
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table("sess_out")
      .filter(org.apache.spark.sql.functions.col("user_id") === 1L).collect()
    assert(sessions.length == 2, s"expected 2 closed sessions, got ${sessions.toSeq}")
    assert(sessions.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("A8b: streaming sessionized bit-equals batch sessionWindowCounts") {
    import org.apache.spark.sql.functions._
    val src = Files.createTempDirectory("graft-sesseq-src").toString
    val chk = Files.createTempDirectory("graft-sesseq-chk").toString
    // stage the REAL sf0.001 events as the stream's first file, then push
    // the watermark with a far-future sentinel so every real session closes
    val staging = Files.createTempDirectory("graft-sesseq-stage").toString
    Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$src/b1.parquet"))

    val in = EventPipeline.fileSource(spark, src)
    val q = EventPipeline.sessionized(in, gap = "30 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sesseq_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", Seq(
      Event(999999999L, Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "click", 0.0)))
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    val streamed = spark.table("sesseq_out")
      .filter(col("user_id") >= 0) // drop the sentinel's own session
      .select(col("user_id"),
        unix_millis(col("session_start").cast("timestamp_ltz")).as("start_ms"),
        unix_millis(col("session_end").cast("timestamp_ltz")).as("end_ms"),
        col("n_events"), col("sum_value"))
      .collect().map(key).toSet
    val batch = operators.EventOps.sessionWindowCounts(spark, sf)
      .select("user_id", "start_ms", "end_ms", "n_events", "sum_value")
      .collect().map(key).toSet
    assert(streamed == batch,
      s"stream/batch session divergence: ${(streamed diff batch) ++ (batch diff streamed)}")
  }

  private def writeDocs(src: String, file: String, docs: Seq[(Long, String)]): Unit = {
    val staging = Files.createTempDirectory("graft-doccur-stage").toString
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    Files.move(part.toPath, java.nio.file.Paths.get(s"$src/$file.parquet"))
  }

  test("streaming near-dup gate: store-backed verdicts across micro-batches") {
    import graft.operators.TextOps
    val goodA = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val freshC = "zinc yttrium xenon tungsten titanium sodium silver radium potassium " +
      "platinum osmium nickel mercury lithium iron iodine helium gold copper cobalt"
    val store = Files.createTempDirectory("graft-ndstream-store").toString
    val src = Files.createTempDirectory("graft-ndstream-src").toString
    val verdicts = Files.createTempDirectory("graft-ndstream-out").toString
    val chk = Files.createTempDirectory("graft-ndstream-chk").toString
    TextOps.writeCurateStore(Seq((1L, goodA)).toDF("doc_id", "text"), store)

    val q = graft.streaming.DocPipeline.curateNeardupStream(
      graft.streaming.DocPipeline.docSource(spark, src), store, verdicts, chk)
    // batch 1: near-dup of the SEEDED corpus doc + a fresh doc
    writeDocs(src, "b1", Seq((10L, goodA + " uniform victor"), (11L, freshC)))
    q.processAllAvailable()
    // batch 2: exact copy of batch 1's admitted text (store digest catches
    // it) + a near-copy (store SIGNATURES from batch 1 catch it)
    writeDocs(src, "b2", Seq((12L, freshC), (13L, freshC + " argon neon")))
    q.processAllAvailable(); q.stop()

    val out = spark.read.parquet(verdicts).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("keep"), r.getAs[String]("drop_reason"))).toMap
    assert(out.size == 4, s"one verdict per streamed doc: $out")
    assert(out(10L)._2 == "neardup", s"near-dup of the seeded corpus doc: $out")
    assert(out(11L)._1, s"fresh doc admitted: $out")
    assert(out(12L)._2 == "duplicate", s"cross-BATCH exact dup via store digest: $out")
    assert(out(13L)._2 == "neardup", s"cross-BATCH near-dup via store signatures: $out")
  }

  test("streaming curation gate: cross-batch dedup state + policy/quality gates") {
    import graft.streaming.DocPipeline
    val src = Files.createTempDirectory("graft-doccur-src").toString
    val chk = Files.createTempDirectory("graft-doccur-chk").toString
    def writeDocs(file: String, docs: Seq[(Long, String)]): Unit =
      this.writeDocs(src, file, docs)
    val good = (0 until 25).map(i => s"word$i").mkString(" ")
    val good2 = (0 until 25).map(i => s"item$i").mkString(" ")
    // b1: one admissible doc + one policy reject (digit-dense)
    writeDocs("b1", Seq((10L, good), (11L, Seq.fill(20)("1234567890").mkString(" "))))
    val q = DocPipeline.curatedStream(DocPipeline.docSource(spark, src))
      .writeStream.format("memory").queryName("doccur_out")
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    // b2: an exact duplicate of doc 10 (different id) + a fresh admissible doc
    writeDocs("b2", Seq((20L, good), (21L, good2)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("doccur_out").collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(10L, 21L),
      s"gate admitted $ids (dup 20 and policy-reject 11 must be dropped)")
    assert(rows.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
    assert(rows.forall(_.getAs[Double]("quality") >= 0.2))
  }

  test("C113s bloom screen: corpus-lifetime seen/novel across batches in constant state; in-batch dups caught; doc_id order") { withRocksDB {
    import graft.streaming.DocPipeline
    val src = Files.createTempDirectory("graft-bloomscr-src").toString
    val chk = Files.createTempDirectory("graft-bloomscr-chk").toString
    val a = "alpha content " * 5; val b = "bravo content " * 5
    val c = "charlie content " * 5
    // b1: A, B, and an IN-BATCH exact duplicate of A (higher doc_id)
    writeDocs(src, "b1", Seq((1L, a), (2L, b), (3L, a)))
    val q = DocPipeline.bloomScreenStream(DocPipeline.docSource(spark, src))
      .toDF().writeStream.format("memory").queryName("bloomscr_out")
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    // b2: a re-crawl of A (new id) + genuinely new C
    writeDocs(src, "b2", Seq((10L, a), (11L, c)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("bloomscr_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("seen"), r.getAs[Long]("n_state_bytes")))).toMap
    assert(rows.view.mapValues(_._1).toMap ==
      Map(1L -> false, 2L -> false, 3L -> true, 10L -> true, 11L -> false),
      rows.toString)
    // constant state: the bit array never grows with history
    assert(rows.values.map(_._2).toSet.size == 1, rows.values.toString)
    spark.catalog.dropTempView("bloomscr_out")
  }}

  test("streaming curation gate: dedup state survives restart from checkpoint") {
    import graft.streaming.DocPipeline
    val src = Files.createTempDirectory("graft-docrst-src").toString
    val chk = Files.createTempDirectory("graft-docrst-chk").toString
    // parquet sink: the memory sink cannot recover from a checkpoint
    val out = Files.createTempDirectory("graft-docrst-out").toString + "/rows"
    def startQuery() = DocPipeline.curatedStream(DocPipeline.docSource(spark, src))
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", chk).start()
    val good = (0 until 25).map(i => s"base$i").mkString(" ")
    val fresh = (0 until 25).map(i => s"next$i").mkString(" ")
    writeDocs(src, "b1", Seq((10L, good)))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(out).count() == 1)
    // the duplicate arrives only AFTER the restart: admitting it would mean
    // the fingerprint state died with the first query
    writeDocs(src, "b2", Seq((20L, good), (21L, fresh)))
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(out).collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids == Set(10L, 21L), s"state not restored across restart: $ids")
  }

  test("stream-static join: streaming events enriched against the customer dim") {
    val src = Files.createTempDirectory("graft-ss-src").toString
    val chk = Files.createTempDirectory("graft-ss-chk").toString
    writeBatch(src, "b1", Seq(Event(1, ts(0), 3, "click", 1.0), Event(2, ts(1), 9999, "view", 2.0)))
    val dim = Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment"))
    val joined = EventPipeline.fileSource(spark, src)
      .join(org.apache.spark.sql.functions.broadcast(dim),
        col("user_id") === col("c_custkey"))
      .select("event_id", "user_id", "c_mktsegment")
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .option("checkpointLocation", chk).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("ss_join").collect()
    assert(rows.map(_.getAs[Long]("event_id")).toSeq == Seq(1L)) // 9999 has no dim row
    assert(rows.head.getAs[String]("c_mktsegment").nonEmpty)
  }

  test("stream-stream join: click followed by error within the time bound") {
    val srcA = Files.createTempDirectory("graft-ssa").toString
    val srcB = Files.createTempDirectory("graft-ssb").toString
    val chk = Files.createTempDirectory("graft-ss2-chk").toString
    writeBatch(srcA, "b1", Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(40), 2, "click", 1.0)))
    writeBatch(srcB, "b1", Seq(
      Event(100, ts(10), 1, "error", 160.0),  // 10 min after user 1's click: joins
      Event(101, ts(55), 2, "error", 160.0))) // 15 min after user 2's click: joins
    val clicks = EventPipeline.fileSource(spark, srcA)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", "1 hour")
    val errors = EventPipeline.fileSource(spark, srcB)
      .select(col("user_id").as("e_user"), col("ts").as("error_ts"), col("event_id").as("error_id"))
      .withWatermark("error_ts", "1 hour")
    val joined = errors.join(clicks,
      col("e_user") === col("c_user") &&
        col("error_ts") >= col("click_ts") &&
        col("error_ts") <= col("click_ts") + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ss2_join")
      .option("checkpointLocation", chk).start()
    q.processAllAvailable(); q.stop()
    val pairs = spark.table("ss2_join").collect()
      .map(r => (r.getAs[Long]("error_id"), r.getAs[Long]("click_id"))).toSet
    assert(pairs == Set((100L, 1L), (101L, 2L)), s"got $pairs")
  }

  test("stream-stream LEFT OUTER join: unmatched clicks emit nulls once the watermark closes them") {
    val srcA = Files.createTempDirectory("graft-ssoa").toString
    val srcB = Files.createTempDirectory("graft-ssob").toString
    val chk = Files.createTempDirectory("graft-sso-chk").toString
    writeBatch(srcA, "b1", Seq(
      Event(1, ts(0), 1, "click", 1.0),   // gets a matching error
      Event(2, ts(1), 2, "click", 1.0)))  // never matched -> null row after close
    writeBatch(srcB, "b1", Seq(Event(100, ts(10), 1, "error", 160.0)))
    val clicks = EventPipeline.fileSource(spark, srcA)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", "5 minutes")
    val errors = EventPipeline.fileSource(spark, srcB)
      .select(col("user_id").as("e_user"), col("ts").as("error_ts"), col("event_id").as("error_id"))
      .withWatermark("error_ts", "5 minutes")
    val joined = clicks.join(errors,
      col("c_user") === col("e_user") &&
        col("error_ts") >= col("click_ts") &&
        col("error_ts") <= col("click_ts") + org.apache.spark.sql.functions.expr("INTERVAL 30 MINUTES"),
      "leftOuter")
    val q = joined.writeStream.format("memory").queryName("sso_join")
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    // advance both watermarks far past click 2's join window so the state
    // closes and the unmatched left row is emitted with nulls
    writeBatch(srcA, "b2", Seq(Event(3, ts(50), 9, "click", 1.0)))
    writeBatch(srcB, "b2", Seq(Event(101, ts(50), 9, "error", 1.0)))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("sso_join").collect()
      .map(r => r.getAs[Long]("click_id") ->
        (if (r.isNullAt(r.fieldIndex("error_id"))) None else Some(r.getAs[Long]("error_id")))).toMap
    assert(rows(1L) == Some(100L), s"matched pair wrong: $rows")
    assert(rows.contains(2L) && rows(2L).isEmpty, s"unmatched click must emit a null row: $rows")
  }

  test("late data beyond the watermark is dropped from windowed aggregation") {
    val src = Files.createTempDirectory("graft-late-src").toString
    val chk = Files.createTempDirectory("graft-late-chk").toString
    writeBatch(src, "b1", Seq(Event(1, ts(0), 1, "click", 1.0),
      Event(2, Timestamp.valueOf("2024-01-01 20:00:00"), 1, "click", 1.0)))
    val counts = EventPipeline.windowedCounts(
      EventPipeline.fileSource(spark, src), watermark = Some("1 hour"), window = "1 hour")
    val q = counts.writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    // event at 10:30 is ~9.5h behind the 20:00 watermark head → dropped
    writeBatch(src, "b2", Seq(Event(3, ts(30), 1, "click", 1.0)))
    q.processAllAvailable(); q.stop()
    val n = spark.table("late_out")
      .filter(col("event_type") === "click")
      .agg(org.apache.spark.sql.functions.sum("n_events")).head().getLong(0)
    assert(n == 1L, s"late event leaked into closed windows: n=$n") // only the 10:00 window closed
  }

  test("live top-k leaderboard refreshes across micro-batches") {
    val src = Files.createTempDirectory("graft-topk-src").toString
    val chk = Files.createTempDirectory("graft-topk-chk").toString
    val store = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
    writeBatch(src, "b1", Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 1, "view", 1.0),
      Event(3, ts(2), 2, "click", 1.0)))
    val q = EventPipeline.topUsersQuery(EventPipeline.fileSource(spark, src), store, k = 2, chk)
    q.processAllAvailable()
    assert(store.get(1L) == 2L && store.get(2L) == 1L)
    // user 2 overtakes user 1 in the next batch
    writeBatch(src, "b2", (10 to 12).map(i => Event(i, ts(i), 2, "click", 1.0)))
    q.processAllAvailable(); q.stop()
    assert(store.get(2L) == 4L && store.get(1L) == 2L, store.toString)
  }

  test("transformWithState latest-per-key: updates only on newer events") {
    val src = Files.createTempDirectory("graft-tws-src").toString
    val chk = Files.createTempDirectory("graft-tws-chk").toString
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      writeBatch(src, "b1", Seq(
        Event(1, ts(0), 1, "click", 10.0), Event(2, ts(5), 1, "view", 20.0)))
      val in = EventPipeline.fileSource(spark, src).as[Event]
      val q = EventPipeline.latestPerKey(in).toDF()
        .writeStream.format("memory").queryName("tws_out")
        .outputMode(OutputMode.Update)
        .option("checkpointLocation", chk).start()
      q.processAllAvailable()
      // an OLDER event for user 1 must NOT emit an update; a new user must
      writeBatch(src, "b2", Seq(
        Event(3, ts(2), 1, "error", 99.0), Event(4, ts(1), 2, "click", 5.0)))
      q.processAllAvailable(); q.stop()
      val rows = spark.table("tws_out").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id")))
      assert(rows.count(_._1 == 1L) == 1, s"stale event emitted: ${rows.toSeq}")
      assert(rows.contains((1L, 2L)) && rows.contains((2L, 4L)))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("A16: alert stream + latest-per-key upsert store") {
    val src = Files.createTempDirectory("graft-alert-src").toString
    val chk1 = Files.createTempDirectory("graft-alert-chk").toString
    val chk2 = Files.createTempDirectory("graft-upsert-chk").toString
    writeBatch(src, "b1", Seq(
      Event(1, ts(0), 1, "error", 200.0),  // critical
      Event(2, ts(1), 1, "error", 160.0),  // warning
      Event(3, ts(2), 2, "error", 10.0),   // below threshold
      Event(4, ts(3), 2, "click", 999.0))) // not an error

    val in = EventPipeline.fileSource(spark, src)
    val qa = EventPipeline.toMemory(EventPipeline.alerts(in), "alerts_out")
    graft.streaming.StoreRegistry.clear("a16_store")
    val store = graft.streaming.StoreRegistry.mapFor("a16_store")
    val qu = EventPipeline.upsertQuery(in, "a16_store", chk2)
    qa.processAllAvailable(); qu.processAllAvailable()

    writeBatch(src, "b2", Seq(Event(5, ts(9), 1, "view", 42.0)))
    qa.processAllAvailable(); qu.processAllAvailable()
    qa.stop(); qu.stop()

    val alerts = spark.table("alerts_out").collect()
    assert(alerts.map(_.getAs[Long]("event_id")).toSet == Set(1L, 2L))
    assert(alerts.find(_.getAs[Long]("event_id") == 1L).get.getAs[String]("level") == "critical")
    // upsert store holds the LATEST value per user
    assert(store.get(1L) == 42.0, s"store=$store")
    assert(store.get(2L) == 999.0, s"store=$store")
  }

  test("A16b: upsert store converges under kill-and-restart replay (crash before checkpoint commit)") {
    val src = Files.createTempDirectory("graft-upsr-src").toString
    val chk = Files.createTempDirectory("graft-upsr-chk").toString
    graft.streaming.StoreRegistry.clear("a16b_store")
    val store = graft.streaming.StoreRegistry.mapFor("a16b_store")
    def start(c: String) = EventPipeline.upsertQuery(
      EventPipeline.fileSource(spark, src), "a16b_store", c)

    writeBatch(src, "b1", Seq(Event(1, ts(0), 1, "click", 10.0),
      Event(2, ts(1), 2, "view", 20.0)))
    val q1 = start(chk); q1.processAllAvailable(); q1.stop()
    // snapshot the checkpoint as of b1 — the state a crash DURING b2 leaves
    // behind (store puts possibly applied, no offset/commit progress)
    val snap = Files.createTempDirectory("graft-upsr-snap").toString
    val srcPath = java.nio.file.Paths.get(chk)
    java.nio.file.Files.walk(srcPath).forEach { p =>
      val t = java.nio.file.Paths.get(snap).resolve(srcPath.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    writeBatch(src, "b2", Seq(Event(3, ts(5), 1, "click", 30.0)))
    val q2 = start(chk); q2.processAllAvailable(); q2.stop()
    assert(store.get(1L) == 30.0 && store.get(2L) == 20.0, s"store=$store")

    // the crash: b2's store puts PARTIALLY applied (roll key 1 back to its
    // pre-batch value), checkpoint progress lost (restart from the b1
    // snapshot) — the at-least-once replay must re-run b2 through the same
    // foreachBatch and CONVERGE the store, not corrupt it
    store.put(1L, 10.0)
    val q3 = start(snap); q3.processAllAvailable(); q3.stop()
    assert(store.get(1L) == 30.0 && store.get(2L) == 20.0,
      s"store did not converge after replay: $store")
    assert(store.size == 2, s"replay invented keys: $store")

    // a further restart with nothing to replay is a clean no-op
    val q4 = start(snap); q4.processAllAvailable(); q4.stop()
    assert(store.get(1L) == 30.0 && store.get(2L) == 20.0 && store.size == 2,
      s"idle restart disturbed the store: $store")
  }

  // transformWithState uses state-store column families, which the default
  // HDFS-backed provider lacks — RocksDB is the production provider anyway
  private def withRocksDB[T](f: => T): T = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f
    finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("anchored TTL rate limit: window starts at first event, unlike tumbling") { withRocksDB {
    // window = 60 min. First event at 10:20 anchors [10:20, 11:20); the
    // tumbling variant's window is the epoch-aligned hour [10:00, 11:00).
    // The 11:05 event is INSIDE the anchored window (rejected: count full)
    // but in a NEW tumbling window (admitted). The 11:25 event re-anchors.
    val src = Files.createTempDirectory("graft-anch-src").toString
    val chkA = Files.createTempDirectory("graft-anch-chkA").toString
    val chkT = Files.createTempDirectory("graft-anch-chkT").toString
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    writeBatch(src, "b1",
      (0 until 5).map(i => Event(i, t(10, 20 + i), 1, "click", 1.0)))
    val limit = 5

    val qa = EventPipeline.rateLimitedAnchored(
      EventPipeline.fileSource(spark, src).as[Event], limit, watermark = Some("0 seconds")).toDF()
      .writeStream.format("memory").queryName("anch_out")
      .outputMode(OutputMode.Append).option("checkpointLocation", chkA).start()
    val qt = EventPipeline.rateLimited(
      EventPipeline.fileSource(spark, src).as[Event], limit).toDF()
      .writeStream.format("memory").queryName("tumb_out")
      .outputMode(OutputMode.Append).option("checkpointLocation", chkT).start()
    qa.processAllAvailable(); qt.processAllAvailable()

    writeBatch(src, "b2", Seq(Event(100, t(11, 5), 1, "click", 1.0),
      Event(101, t(11, 25), 1, "click", 1.0)))
    qa.processAllAvailable(); qt.processAllAvailable()
    qa.stop(); qt.stop()

    def admitted(table: String) = spark.table(table).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("admitted")).toMap
    val anch = admitted("anch_out")
    val tumb = admitted("tumb_out")
    assert((0 until 5).forall(i => anch(i.toLong) && tumb(i.toLong)))
    assert(!anch(100L), s"anchored window [10:20,11:20) must reject 11:05: $anch")
    assert(tumb(100L), s"tumbling window [11:00,12:00) must admit 11:05: $tumb")
    assert(anch(101L), s"11:25 re-anchors a fresh window: $anch")
  } }

  test("anchored rate limit state survives a query restart from checkpoint") { withRocksDB {
    val src = Files.createTempDirectory("graft-anchr-src").toString
    val chk = Files.createTempDirectory("graft-anchr-chk").toString
    val out = Files.createTempDirectory("graft-anchr-out").toString + "/rows"
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // parquet sink: the memory sink cannot recover from a checkpoint
    def startQuery() = EventPipeline.rateLimitedAnchored(
      EventPipeline.fileSource(spark, src).as[Event], limit = 5,
      watermark = Some("0 seconds")).toDF()
      .writeStream.format("parquet").option("path", out)
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()

    writeBatch(src, "b1", (0 until 5).map(i => Event(i, t(10, 20 + i), 1, "click", 1.0)))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // restart; the 11:05 event is inside the RESTORED anchored window
    // [10:20, 11:20) whose count is full — must be rejected. Lost state
    // would re-anchor at 11:05 and admit it.
    writeBatch(src, "b2", Seq(Event(100, t(11, 5), 1, "click", 1.0)))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    val admitted = spark.read.parquet(out).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("admitted")).toMap
    assert(!admitted(100L), s"state lost across restart: $admitted")
    assert((0 until 5).forall(i => admitted(i.toLong)))
  } }

  test("config facade parses the reference's config.yaml surface") {
    import graft.streaming.PipelineConfig
    val cfg = PipelineConfig.fromYaml(
      """# consumer config (mirrors reference config.yaml)
        |brokers: broker1:9092
        |topics: [events, clicks]   # multi-topic subscribe
        |starting_offsets: earliest
        |dedup_ttl: 20 minutes
        |rate_limit_count: 7
        |rate_limit_window_ms: 1800000
        |alert_threshold: 120.5
        |window_duration: 30 minutes
        |producer_rate: 50          # unknown keys ignored
        |""".stripMargin)
    assert(cfg.brokers == "broker1:9092")
    assert(cfg.topics == Seq("events", "clicks"))
    assert(cfg.startingOffsets == "earliest")
    assert(cfg.dedupTtl == "20 minutes")
    assert(cfg.rateLimitCount == 7 && cfg.rateLimitWindowMs == 1800000L)
    assert(cfg.alertThreshold == 120.5)
    assert(cfg.windowDuration == "30 minutes")
    assert(PipelineConfig.fromYaml("") == PipelineConfig()) // all defaults
  }

  test("kafka value decode: JSON payload bytes -> typed event columns") {
    val json =
      """{"event_id":7,"ts":"2024-01-01T10:00:00.000Z","user_id":3,"event_type":"click","value":1.5}"""
    val raw = Seq(json.getBytes("UTF-8")).toDF("value")
    val out = EventPipeline.decodeKafkaValue(raw).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("event_id") == 7L && r.getAs[Long]("user_id") == 3L)
    assert(r.getAs[String]("event_type") == "click" && r.getAs[Double]("value") == 1.5)
    // malformed payload -> null fields, not a crash
    val bad = EventPipeline.decodeKafkaValue(Seq("not json".getBytes("UTF-8")).toDF("value")).collect()
    assert(bad.length == 1 && bad.head.isNullAt(0))
  }

  test("configured pipeline: config-driven dedup -> anchored rate limit -> alerts") { withRocksDB {
    import graft.streaming.PipelineConfig
    val src = Files.createTempDirectory("graft-cfg-src").toString
    val chk = Files.createTempDirectory("graft-cfg-chk").toString
    val cfg = PipelineConfig.fromYaml(
      "rate_limit_count: 2\nalert_threshold: 100.0\ndedup_ttl: 2 hours")
    // 3 error events (one duplicated id) -> dedup leaves 3 distinct, rate
    // limit 2 admits the first two, alerts keep values >= 100
    writeBatch(src, "b1", Seq(
      Event(1, ts(0), 1, "error", 200.0), Event(1, ts(0), 1, "error", 200.0),
      Event(2, ts(1), 1, "error", 150.0), Event(3, ts(2), 1, "error", 180.0)))
    val q = EventPipeline.configuredPipeline(EventPipeline.fileSource(spark, src), cfg)
      .writeStream.format("memory").queryName("cfg_alerts")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("cfg_alerts").collect().map(_.getAs[Long]("event_id")).toSet
    assert(ids == Set(1L, 2L), s"got $ids")
  } }

  test("streaming z-score alerts equal the batch operator on a bounded replay") { withRocksDB {
    // constructed series: steady values with planted spikes per user
    val rnd = new scala.util.Random(7)
    val events = for { u <- 1L to 3L; i <- 0 until 80 } yield {
      val spike = i % 29 == 17 // periodic outliers, user-offset
      val v = 100.0 + u * 3 + rnd.nextGaussian() * 2 + (if (spike) 60.0 else 0.0)
      Event(u * 1000 + i, ts(i % 60), u, "metric", v)
    }
    // batch side reads the same rows as an events table
    val d = Files.createTempDirectory("graft-z-batch").toString
    events.toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    val batch = graft.operators.EventOps.zscoreAlerts(spark, d).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("z"))).toMap

    // stream side: two time-ordered micro-batches so state crosses batches
    val src = Files.createTempDirectory("graft-z-src").toString
    val chk = Files.createTempDirectory("graft-z-chk").toString
    val (first, second) = events.sortBy(e => (e.ts.getTime, e.event_id)).splitAt(events.size / 2)
    writeBatch(src, "b1", first)
    val q = EventPipeline.zscoreAlertStream(
      EventPipeline.fileSource(spark, src).as[Event])
      .toDF().writeStream.format("memory").queryName("z_alerts")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", second)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("z_alerts").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("z"))).toMap

    assert(streamed.keySet == batch.keySet,
      s"alert sets diverge: only-batch=${batch.keySet -- streamed.keySet} only-stream=${streamed.keySet -- batch.keySet}")
    streamed.foreach { case (id, z) => assert(z == batch(id), s"z mismatch for $id: $z vs ${batch(id)}") }
    assert(batch.nonEmpty, "constructed series produced no alerts — test is vacuous")
  } }

  test("streaming dropout: event-time timers emit exactly the batch dropout set") { withRocksDB {
    val t0 = 1700000000000L
    val min = 60000L
    def e(id: Long, tMs: Long, u: Long, typ: String) =
      Event(id, new Timestamp(tMs), u, typ, 1.0)
    // same planted corpus as the batch dropout spec, plus a far-future
    // sentinel (neither A nor B — filtered, but it advances the watermark
    // so every timer provably fires before the query stops)
    val events = Seq(
      e(1, t0, 1, "click"), e(2, t0 + 20 * min, 1, "purchase"),
      e(3, t0 + 300 * min, 1, "click"), e(4, t0 + 420 * min, 1, "purchase"),
      e(5, t0 + 600 * min, 1, "click"), e(6, t0 + 600 * min, 1, "purchase"),
      e(7, t0, 2, "click"), e(8, t0 + 60 * min, 2, "purchase"),
      e(9, t0 + 120 * min, 2, "click"),
      e(10, t0, 3, "purchase"), e(11, t0 + 10 * min, 3, "click"))
    val sentinel = e(99, t0 + 5000 * min, 99, "watermark_sentinel")
    val d = Files.createTempDirectory("graft-drop-batch").toString
    (events :+ sentinel).toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    val batchIds = graft.operators.EventOps.patternDropout(spark, d).collect()
      .map(_.getAs[Long]("a_event_id")).toSet

    val src = Files.createTempDirectory("graft-drop-src").toString
    val chk = Files.createTempDirectory("graft-drop-chk").toString
    // split so a click (7) is rescued by a purchase (8) from the NEXT
    // micro-batch — pending state must cross the batch boundary
    val (b1, b2) = events.sortBy(ev => (ev.ts.getTime, ev.event_id)).splitAt(5)
    writeBatch(src, "b1", b1)
    val q = EventPipeline.patternDropoutStream(
      EventPipeline.fileSource(spark, src).as[Event])
      .toDF().writeStream.format("memory").queryName("dropouts")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", b2 :+ sentinel)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dropouts").collect()
      .map(_.getAs[Long]("a_event_id")).toSet
    assert(streamed == batchIds,
      s"only-batch=${batchIds -- streamed} only-stream=${streamed -- batchIds}")
    assert(batchIds == Set(3L, 9L, 11L), s"planted expectation drifted: $batchIds")
    // the split really exercised cross-batch rescue: click 7 sits in b1,
    // its rescuing purchase 8 in b2, and 7 was NOT emitted
    assert(b1.exists(_.event_id == 7L) && b2.exists(_.event_id == 8L))
  } }

  test("streaming pattern match equals the batch operator on a time-ordered replay") {
    // planted clicks/purchases per user, with matches that must CROSS the
    // micro-batch split (A arrives in batch 1, its B in batch 2)
    val rnd = new scala.util.Random(11)
    val events = for { u <- 1L to 4L; i <- 0 until 40 } yield {
      val typ = if (rnd.nextInt(3) == 0) "purchase" else "click"
      Event(u * 1000 + i, ts(i), u, typ, 1.0)
    }
    val d = Files.createTempDirectory("graft-pat-batch").toString
    events.toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    val batch = graft.operators.EventOps.patternMatch(spark, d, withinMs = 5 * 60000L)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("a_event_id"),
        r.getAs[Long]("b_event_id"), r.getAs[Long]("lag_ms"))).toSet

    val src = Files.createTempDirectory("graft-pat-src").toString
    val chk = Files.createTempDirectory("graft-pat-chk").toString
    val (first, second) = events.sortBy(e => (e.ts.getTime, e.event_id)).splitAt(events.size / 2)
    writeBatch(src, "b1", first)
    val q = EventPipeline.patternMatchStream(
      EventPipeline.fileSource(spark, src).as[Event], withinMs = 5 * 60000L)
      .toDF().writeStream.format("memory").queryName("pat_matches")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", second)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("pat_matches").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("a_event_id"),
        r.getAs[Long]("b_event_id"), r.getAs[Long]("lag_ms"))).toSet
    assert(streamed == batch,
      s"only-batch=${batch -- streamed} only-stream=${streamed -- batch}")
    assert(batch.nonEmpty, "planted corpus produced no matches — test is vacuous")
    // the split must actually exercise cross-batch state: at least one
    // match's A is in batch 1 while its B is in batch 2
    val firstIds = first.map(_.event_id).toSet
    assert(batch.exists(m => firstIds.contains(m._2) && !firstIds.contains(m._3)),
      "no match crossed the micro-batch boundary — split is vacuous")
  }

  test("streaming transitions equal batch topPaths on a time-ordered replay") {
    // deterministic per-user walks: 3-min in-session spacing with a 45-min
    // jump every 7th event, so sessions genuinely break mid-stream
    def tm(m: Int) = new Timestamp(
      Timestamp.valueOf("2024-01-01 08:00:00").getTime + m * 60000L)
    val rnd = new scala.util.Random(17)
    val types = Array("view", "click", "purchase", "error")
    val events = for { u <- 1L to 5L; i <- 0 until 30 } yield
      Event(u * 1000 + i, tm(i * 3 + (i / 7) * 45), u,
        types(rnd.nextInt(types.length)), 1.0)
    val d = Files.createTempDirectory("graft-trans-batch").toString
    events.toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    val batch = graft.operators.EventOps.topPaths(spark, d, k = Int.MaxValue)
      .collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Long]("n_transitions")).toMap

    val src = Files.createTempDirectory("graft-trans-src").toString
    val chk = Files.createTempDirectory("graft-trans-chk").toString
    val (first, second) = events.sortBy(e => (e.ts.getTime, e.event_id))
      .splitAt(events.size / 2)
    writeBatch(src, "b1", first)
    val q = EventPipeline.transitionStream(
      EventPipeline.fileSource(spark, src).as[Event])
      .toDF().writeStream.format("memory").queryName("transitions")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", second)
    q.processAllAvailable(); q.stop()
    val streamedRows = spark.table("transitions").collect()
    val streamed = streamedRows
      .groupBy(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")))
      .view.mapValues(_.length.toLong).toMap
    assert(streamed == batch,
      s"only-batch=${batch.toSet -- streamed.toSet} only-stream=${streamed.toSet -- batch.toSet}")
    // conservation: transitions = events − sessions (the topPaths law)
    val sessions = graft.operators.EventOps.sessionize(spark, d).count()
    assert(streamedRows.length == events.size - sessions)
    // the split exercised cross-batch state: some transition's from-event
    // arrived in batch 1 and its to-event in batch 2
    val firstIds = first.map(_.event_id).toSet
    assert(streamedRows.exists(r => firstIds.contains(r.getAs[Long]("from_event_id")) &&
      !firstIds.contains(r.getAs[Long]("to_event_id"))),
      "no transition crossed the micro-batch boundary — split is vacuous")
  }

  test("ignition: 100 raw JSON records through the complete consumer — admitted/dropped/dead-letter counts") { withRocksDB {
    import graft.streaming.PipelineConfig
    // the reference consumer loop end-to-end minus the broker socket (no
    // kafka artifact exists in this sandbox — SURVEY A29): decode →
    // dead-letter → SETNX dedup → INCR+EXPIRE rate limit → alerts
    def pl(id: Long, user: Long, minute: Int, value: Double): String =
      f"""{"event_id":$id,"ts":"2024-01-01T10:$minute%02d:00.000Z","user_id":$user,"event_type":"error","value":$value}"""
    // 80 distinct events: users 1-4 × 20 events each, same hour, value ≥ 150
    val valid = for { u <- 1L to 4L; i <- 0 until 20 }
      yield pl(u * 100 + i, u, i.toInt, 150.0 + i)
    // 10 replayed duplicates of user 1's first ids (SETNX must drop)
    val dups = (0 until 10).map(i => pl(100 + i, 1L, i, 150.0 + i))
    // 10 malformed: 5 unparseable, 5 missing the event id
    val bad = (0 until 5).map(i => s"garbage payload $i") ++
      (0 until 5).map(i => s"""{"ts":"2024-01-01T11:00:00.000Z","user_id":9,"event_type":"error","value":$i}""")
    val records = (valid ++ dups ++ bad).map(_.getBytes("UTF-8"))
    assert(records.length == 100)

    val src = Files.createTempDirectory("graft-ign-src").toString
    val chkA = Files.createTempDirectory("graft-ign-chka").toString
    val chkR = Files.createTempDirectory("graft-ign-chkr").toString
    records.toDF("value").coalesce(1).write.mode("overwrite").parquet(src)
    val raw = spark.readStream.schema("value binary").parquet(src)

    val cfg = PipelineConfig.fromYaml(
      "rate_limit_count: 5\nrate_limit_window_ms: 3600000\nalert_threshold: 100.0\ndedup_ttl: 2 hours")
    val (alerts, rejects) = EventPipeline.configuredConsumer(raw, cfg)
    val qa = alerts.writeStream.format("memory").queryName("ign_alerts")
      .outputMode(OutputMode.Append).option("checkpointLocation", chkA).start()
    val qr = rejects.writeStream.format("memory").queryName("ign_rejects")
      .outputMode(OutputMode.Append).option("checkpointLocation", chkR).start()
    qa.processAllAvailable(); qr.processAllAvailable()
    qa.stop(); qr.stop()

    // dead-letter: exactly the 10 malformed, with their reasons
    val rej = spark.table("ign_rejects").collect().map(_.getAs[String]("reason"))
    assert(rej.length == 10, s"dead-letter count ${rej.length}")
    assert(rej.count(_ == "unparseable") == 5 && rej.count(_ == "missing_event_id") == 5)

    // admitted: duplicates dropped, then the FIRST 5 events per user by
    // event time pass the anchored window — 4 users × 5 alerts
    val ids = spark.table("ign_alerts").collect().map(_.getAs[Long]("event_id")).toSet
    val expected = (for { u <- 1L to 4L; i <- 0 until 5 } yield u * 100 + i).toSet
    assert(ids == expected, s"admitted set diverged: got $ids")
  } }

  test("dead-letter split: malformed payloads route to rejects with reasons, valid flow on") {
    val good =
      """{"event_id":1,"ts":"2024-01-01T10:00:00.000Z","user_id":3,"event_type":"click","value":1.5}"""
    val noId =
      """{"ts":"2024-01-01T10:00:00.000Z","user_id":3,"event_type":"click","value":1.5}"""
    // parses fine but would NPE the typed pipeline at groupByKey(_.user_id)
    // / non-nullable value — must dead-letter, not poison the query
    val noUser =
      """{"event_id":2,"ts":"2024-01-01T10:00:00.000Z","event_type":"click","value":1.5}"""
    val noValue =
      """{"event_id":3,"ts":"2024-01-01T10:00:00.000Z","user_id":4,"event_type":"click"}"""
    val raw = Seq("not json at all", good, noId, noUser, noValue)
      .map(_.getBytes("UTF-8")).toDF("value")
    val (valid, rejects) = EventPipeline.deadLetterSplit(raw)
    val v = valid.collect()
    assert(v.length == 1 && v.head.getAs[Long]("event_id") == 1L)
    val rej = rejects.collect().map(r => r.getAs[String]("reason")).sorted
    assert(rej.toSeq ==
      Seq("missing_event_id", "missing_user_id", "missing_value", "unparseable"),
      rej.toSeq.toString)
    // same split works as a streaming graph: rejects land in their own sink
    val src = Files.createTempDirectory("graft-dlq-src").toString
    val chk = Files.createTempDirectory("graft-dlq-chk").toString
    raw.withColumn("id", monotonically_increasing_id())
      .write.mode("overwrite").parquet(src)
    val streamRaw = spark.readStream
      .schema("value binary, id long").parquet(src).select("value")
    val (_, sRej) = EventPipeline.deadLetterSplit(streamRaw)
    val q = sRej.writeStream.format("memory").queryName("dlq_out")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dlq_out").count() == 4)
  }

  test("deadLetterSink: one query routes valid and rejects to both dirs") {
    val src = Files.createTempDirectory("graft-dls-src").toString
    val chk = Files.createTempDirectory("graft-dls-chk").toString
    val okDir = Files.createTempDirectory("graft-dls-ok").toString + "/rows"
    val dlqDir = Files.createTempDirectory("graft-dls-dlq").toString + "/rows"
    val good =
      """{"event_id":1,"ts":"2024-01-01T10:00:00.000Z","user_id":3,"event_type":"click","value":1.5}"""
    Seq(good, "garbage").map(_.getBytes("UTF-8")).toDF("value")
      .write.mode("overwrite").parquet(src)
    val raw = spark.readStream.schema("value binary").parquet(src)
    val q = EventPipeline.deadLetterSink(raw, okDir, dlqDir)
    try { q.processAllAvailable() } finally { q.stop() }
    assert(spark.read.parquet(okDir).collect()
      .map(_.getAs[Long]("event_id")).toSeq == Seq(1L))
    assert(spark.read.parquet(dlqDir).collect()
      .map(_.getAs[String]("reason")).toSeq == Seq("unparseable"))
    // the streaming source was consumed by exactly ONE query
    assert(q.recentProgress.nonEmpty)
    // retry idempotence: replaying the same data as the same batch_id (a
    // fresh checkpoint re-reads everything as batch 0 — the retry shape)
    // overwrites that batch's partition instead of appending duplicates
    val q2 = EventPipeline.deadLetterSink(raw, okDir, dlqDir)
    try { q2.processAllAvailable() } finally { q2.stop() }
    assert(spark.read.parquet(okDir).count() == 1, "retried batch must not duplicate valid rows")
    assert(spark.read.parquet(dlqDir).count() == 1, "retried batch must not duplicate reject rows")
  }

  test("rate limit: a late event from a closed window neither resets nor breaches the cap") {
    val src = Files.createTempDirectory("graft-late-src").toString
    val chk = Files.createTempDirectory("graft-late-chk").toString
    // batch 1: user 1 fills window W2 (11:00-12:00) to the cap
    writeBatch(src, "b1", (1 to 5).map(i =>
      Event(i, Timestamp.valueOf(f"2024-01-01 11:${i}%02d:00"), 1, "click", 1.0)))
    val in = EventPipeline.fileSource(spark, src).as[Event]
    val q = EventPipeline.rateLimited(in, limit = 5)
      .toDF().writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    // batch 2: one LATE W1 event (must not reset W2's count), then two
    // more W2 events (cap already reached → both rejected)
    writeBatch(src, "b2", Seq(
      Event(10, Timestamp.valueOf("2024-01-01 10:30:00"), 1, "click", 1.0),
      Event(11, Timestamp.valueOf("2024-01-01 11:40:00"), 1, "click", 1.0),
      Event(12, Timestamp.valueOf("2024-01-01 11:41:00"), 1, "click", 1.0)))
    q.processAllAvailable()
    q.stop()
    val admitted = spark.table("late_out").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("admitted")).toMap
    assert((1 to 5).forall(i => admitted(i.toLong)), "window fill must admit")
    assert(!admitted(10L), "late closed-window event must be rejected")
    assert(!admitted(11L) && !admitted(12L),
      s"cap breached after late arrival: $admitted")
  }

  test("SCD refresh: foreachBatch re-resolves the dimension, picking up updates per micro-batch") {
    // a plan-time static join PINS the dim's file listing (an in-place
    // overwrite breaks the running query — refreshByPath can't reach the
    // stream's analyzed plan). The operational pattern for slowly changing
    // dims over plain files: re-read the dim inside foreachBatch, where
    // each micro-batch resolves a fresh listing.
    val src = Files.createTempDirectory("graft-scd-src").toString
    val dimDir = Files.createTempDirectory("graft-scd-dim").toString
    val chk = Files.createTempDirectory("graft-scd-chk").toString
    Seq((1L, "bronze")).toDF("d_user", "tier")
      .write.mode("overwrite").parquet(dimDir)
    writeBatch(src, "b1", Seq(Event(1, ts(0), 1, "click", 1.0)))
    val tiers = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val q = EventPipeline.fileSource(spark, src).writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val dim = batch.sparkSession.read.parquet(dimDir) // fresh listing
        batch.join(broadcast(dim), col("user_id") === col("d_user"))
          .select(col("event_id"), col("tier"))
          .collect() // tiny test sink (a real job writes from executors)
          .foreach(r => tiers.put(r.getAs[Long]("event_id"), r.getAs[String]("tier")))
      }
      .start()
    q.processAllAvailable()
    Seq((1L, "gold")).toDF("d_user", "tier")
      .write.mode("overwrite").parquet(dimDir)
    writeBatch(src, "b2", Seq(Event(2, ts(5), 1, "click", 1.0)))
    q.processAllAvailable(); q.stop()
    assert(tiers.get(1L) == "bronze", s"got $tiers")
    assert(tiers.get(2L) == "gold", s"dim update not visible to later batch: $tiers")
  }

  test("bounded replay runs the PRODUCTION watermarked dedup and matches the batch aggregate") {
    // the oracle-gated entry (stream_windowed_counts) must verify the
    // operator users run — dropDuplicatesWithinWatermark + Append mode —
    // not a Complete-mode dropDuplicates stand-in (r3 verdict #3)
    val streamed = EventPipeline.windowedCountsViaStream(spark, sf)
    assert(streamed.filter(col("event_type") === "watermark_sentinel").isEmpty,
      "sentinel leaked into the emitted windows")
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))
    assert(streamed.count() == batch.count(), "window-row count mismatch")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed windows diverge from the batch aggregate")
  }

  test("pub/sub fan-out: two subscribers over one alert stream each receive the full set") {
    // the reference's dashboard broadcasts every alert to N connected
    // websocket clients (websocket_server.py:30-50); in Spark each
    // subscriber is an independent query over the same source — separate
    // offsets + checkpoint, like a Kafka consumer group per client — so
    // every subscriber sees the complete stream, late joiners included.
    val src = Files.createTempDirectory("graft-fanout-src").toString
    val chkA = Files.createTempDirectory("graft-fanout-chkA").toString
    val chkB = Files.createTempDirectory("graft-fanout-chkB").toString
    writeBatch(src, "b1", Seq(
      Event(1, ts(0), 1, "error", 190.0), Event(2, ts(1), 2, "click", 10.0),
      Event(3, ts(2), 3, "error", 160.0)))
    def subscriber(name: String, chk: String) =
      EventPipeline.alerts(EventPipeline.fileSource(spark, src))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    val qA = subscriber("fanout_a", chkA)
    qA.processAllAvailable()
    // subscriber B connects late — it must still replay the full history
    val qB = subscriber("fanout_b", chkB)
    writeBatch(src, "b2", Seq(
      Event(4, ts(3), 4, "error", 185.0), Event(5, ts(4), 5, "view", 50.0)))
    qA.processAllAvailable(); qB.processAllAvailable()
    qA.stop(); qB.stop()
    def got(t: String) = spark.table(t).collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("level"))).toSet
    val expected = Set((1L, "critical"), (3L, "warning"), (4L, "critical"))
    assert(got("fanout_a") == expected, s"subscriber A: ${got("fanout_a")}")
    assert(got("fanout_b") == expected, s"subscriber B (late joiner): ${got("fanout_b")}")
  }

  test("StateTuning: scoped confs apply inside the block, restore after; stream runs under them") {
    import graft.streaming.StateTuning
    val priorParts = spark.conf.get("spark.sql.shuffle.partitions")
    val priorProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val tuning = StateTuning(statePartitions = 2, rocksDb = true,
      changelogCheckpointing = true)
    val src = Files.createTempDirectory("graft-tune-src").toString
    val chk = Files.createTempDirectory("graft-tune-chk").toString
    writeBatch(src, "b1", Seq(
      Event(1, ts(0), 1, "click", 10.0), Event(1, ts(0), 1, "click", 10.0),
      Event(2, ts(1), 2, "view", 20.0)))
    val ids = tuning.withTuning(spark) {
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "2")
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        .contains("RocksDB"))
      // a stateful operator (dedup) under the tuned session
      val q = EventPipeline.deduped(EventPipeline.fileSource(spark, src))
        .writeStream.format("memory").queryName("tuned_out")
        .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
      q.processAllAvailable(); q.stop()
      spark.table("tuned_out").collect().map(_.getAs[Long]("event_id")).toSet
    }
    assert(ids == Set(1L, 2L)) // dedup worked under RocksDB + 2 partitions
    assert(spark.conf.get("spark.sql.shuffle.partitions") == priorParts)
    assert(spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      == priorProvider)
  }

  test("multi-topic union ingest: one stream over several source directories") {
    val srcA = Files.createTempDirectory("graft-multi-a").toString
    val srcB = Files.createTempDirectory("graft-multi-b").toString
    val chk = Files.createTempDirectory("graft-multi-chk").toString
    writeBatch(srcA, "b1", Seq(Event(1, ts(0), 1, "click", 1.0)))
    writeBatch(srcB, "b1", Seq(Event(2, ts(1), 2, "view", 2.0)))
    val q = EventPipeline.multiSource(spark, Seq(srcA, srcB))
      .writeStream.format("memory").queryName("multi_out")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(srcB, "b2", Seq(Event(3, ts(2), 3, "click", 3.0)))
    q.processAllAvailable(); q.stop()
    assert(spark.table("multi_out").collect().map(_.getAs[Long]("event_id")).toSet
      == Set(1L, 2L, 3L))
  }

  test("trendingQuery: per-closed-window top-k, exactly once, tie-broken by id") {
    val H = 3600000L
    val base = 1700000000000L // not hour-aligned; windows align to epoch hours
    val h0 = base - base % H
    def e(id: Long, ms: Long, u: Long) =
      Event(id, new Timestamp(h0 + ms), u, "click", 1.0)
    var id = 0L
    def burst(hour: Int, u: Long, n: Int) = (1 to n).map { i =>
      id += 1; e(id, hour * H + i * 1000L, u)
    }
    // h0: u1x3 u2x2 u3x1 -> top2 = u1, u2; h1: u2x5 u3x5 (tie -> id order);
    // h2: u4x1; the sentinel closes everything and its own window never emits
    val b1 = burst(0, 1L, 3) ++ burst(0, 2L, 2) ++ burst(0, 3L, 1) ++
      burst(1, 2L, 3)
    val b2 = burst(1, 2L, 2) ++ burst(1, 3L, 5) ++ burst(2, 4L, 1) :+
      e(9999L, 100 * H, 99L)
    val src = Files.createTempDirectory("graft-trend-src").toString
    val chk = Files.createTempDirectory("graft-trend-chk").toString
    val out = Files.createTempDirectory("graft-trend-out").toString + "/top"
    writeBatch(src, "b1", b1)
    val q = EventPipeline.trendingQuery(
      EventPipeline.fileSource(spark, src), out, chk, k = 2,
      watermark = "0 seconds")
    q.processAllAvailable()
    writeBatch(src, "b2", b2)
    q.processAllAvailable(); q.stop()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getAs[Timestamp]("window_start").getTime - h0,
        r.getAs[Long]("user_id"), r.getAs[Long]("n"),
        r.getAs[Int]("rnk"))).toSet
    // h1's u2 count spans BOTH micro-batches (3 + 2 = 5) — the closed
    // window carries the merged count exactly once
    assert(got == Set(
      (0L, 1L, 3L, 1), (0L, 2L, 2L, 2),
      (1 * H, 2L, 5L, 1), (1 * H, 3L, 5L, 2),
      (2 * H, 4L, 1L, 1)), s"got $got")
  }

  test("silenceStream: bounded replay emits exactly the batch silence/recovery set") { withRocksDB {
    val S = 3600000L // 1h threshold
    val base = 1700000000000L
    def e(id: Long, ms: Long, tpe: String) =
      Event(id, new Timestamp(base + ms), 1L, tpe, 1.0)
    // x: exact-S gap (no alert) then a 2S gap crossing the batch split;
    // y: single event -> open trailing silence; z: under-threshold gaps
    // -> only a trailing; the sentinel advances the watermark so every
    // legitimate timer provably fires (its own never does)
    val events = Seq(
      e(1, 0, "x"), e(2, S, "x"), e(3, 3 * S, "x"),
      e(4, 0, "y"),
      e(5, 3 * S + 100, "z"), e(6, 4 * S, "z"), e(7, 4 * S + 1000, "z"))
    val sentinel = e(99, 100 * S, "watermark_sentinel")
    val d = Files.createTempDirectory("graft-sil-batch").toString
    (events :+ sentinel).toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("event_type"), r.getAs[String]("kind"),
        r.getAs[Long]("at_ms"), r.getAs[Long]("since_ms"))
    val batch = graft.operators.EventOps.silenceAlerts(spark, d, S)
      .collect().map(keyOf).toSet
    assert(batch == Set(
      ("x", "silence", base + 2 * S, base + S),
      ("x", "recovery", base + 3 * S, base + S),
      ("x", "silence", base + 4 * S, base + 3 * S),
      ("y", "silence", base + S, base),
      ("z", "silence", base + 5 * S + 1000, base + 4 * S + 1000)),
      s"planted batch shape drifted: $batch")

    val src = Files.createTempDirectory("graft-sil-src").toString
    val chk = Files.createTempDirectory("graft-sil-chk").toString
    // split after x@S: episode (x, 2S..3S) anchors in b1, closes in b2
    val (b1, b2) = events.partition(_.ts.getTime <= base + S)
    assert(b1.exists(_.event_id == 2L) && b2.exists(_.event_id == 3L))
    writeBatch(src, "b1", b1)
    val q = EventPipeline.silenceStream(
      EventPipeline.fileSource(spark, src).as[Event], S,
      watermark = Some("0 seconds"))
      .toDF().writeStream.format("memory").queryName("silence_alerts")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", b2 :+ sentinel)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("silence_alerts").collect().map(keyOf).toSet
    assert(streamed == batch,
      s"only-batch=${batch -- streamed} only-stream=${streamed -- batch}")
  } }

  test("firstSeenStream: day-close verdicts equal the batch new/returning grid") { withRocksDB {
    val D = 86400000L
    val base = 20000L * D
    def e(id: Long, day: Long, k: Long, u: Long) =
      Event(id, new Timestamp(base + day * D + k), u, "view", 1.0)
    // u1: day0 (x2) then day2; u2: day2 only; u3: day1 BEFORE day0 in the
    // same batch (in-batch disorder); u4: day0 in b1, day1 in b2
    val b1 = Seq(e(1, 0, 1000, 1), e(2, 0, 2000, 1),
      e(3, 1, 1000, 3), e(4, 0, 3000, 3), e(5, 0, 4000, 4))
    val b2 = Seq(e(6, 2, 1000, 1), e(7, 2, 2000, 2), e(8, 1, 2000, 4))
    val sentinel = e(99, 10, 0, 99)
    import SparkSuite.spark.implicits._
    // batch oracle on the identical parquet (sentinel's own day excluded —
    // its day never closes in the stream)
    val d = Files.createTempDirectory("graft-fs-batch").toString
    (b1 ++ b2 :+ sentinel).toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    val batch = graft.operators.EventOps.newVsReturning(spark, d)
      .collect().map(r => (r.getAs[java.sql.Date]("day").getTime,
        r.getAs[Long]("dau"), r.getAs[Long]("n_new"),
        r.getAs[Long]("n_returning"))).filter(_._1 < base + 10 * D).toSet

    val src = Files.createTempDirectory("graft-fs-src").toString
    val chk = Files.createTempDirectory("graft-fs-chk").toString
    writeBatch(src, "b1", b1)
    val q = EventPipeline.firstSeenStream(
      EventPipeline.fileSource(spark, src).as[Event], watermark = "0 seconds")
      .toDF().writeStream.format("memory").queryName("first_seen")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", b2 :+ sentinel)
    q.processAllAvailable(); q.stop()
    val rows = spark.table("first_seen").collect()
      .map(r => (r.getAs[Long]("day_ms"), r.getAs[Long]("user_id"),
        r.getAs[Boolean]("is_new"))).toSet
    assert(rows == Set(
      (base, 1L, true), (base, 3L, true), (base, 4L, true),
      (base + D, 3L, false), (base + D, 4L, false),
      (base + 2 * D, 1L, false), (base + 2 * D, 2L, true)), rows.toString)
    // exactly-once per (day, user), and the aggregated grid == batch
    assert(spark.table("first_seen").count() == rows.size)
    val agg = rows.groupBy(_._1).map { case (day, rs) =>
      (day, rs.size.toLong, rs.count(_._3).toLong, rs.count(!_._3).toLong) }.toSet
    assert(agg == batch, s"stream=$agg batch=$batch")
  } }

  test("sloBurnStream: closed-hour alert set equals the batch multiwindow report") {
    val H = 3600000L
    val HB = 480000L
    var id = 0L
    def mkHour(hr: Long, total: Int, errors: Int): Seq[Event] =
      (1 to total).map { i =>
        id += 1
        Event(id, new Timestamp((HB + hr) * H + i * 1000L), i.toLong,
          if (i <= errors) "error" else "view", 1.0)
      }
    // the A69 spec scenario: h1/h2 sustained, h8 fast-only blip, h20 gap
    val events = mkHour(0, 10, 2) ++ mkHour(1, 10, 5) ++ mkHour(2, 10, 3) ++
      (3L to 7L).flatMap(mkHour(_, 10, 0)) ++ mkHour(8, 10, 3) ++
      mkHour(20, 10, 5)
    val sentinel = Event(9999L, new Timestamp((HB + 100) * H), 1L,
      "watermark_sentinel", 1.0)
    import SparkSuite.spark.implicits._
    val d = Files.createTempDirectory("graft-slo-batch").toString
    (events :+ sentinel).toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("hour_ms"), r.getAs[Long]("n_err"), r.getAs[Long]("n_total"),
        r.getAs[Long]("err6"), r.getAs[Long]("total6"),
        r.getAs[Double]("burn_1h"), r.getAs[Double]("burn_6h"))
    val batch = graft.operators.EventOps.sloBurn(spark, d).collect().map(keyOf).toSet
    assert(batch.map(_._1 / H - HB) == Set(1L, 2L, 20L), batch.toString)

    val src = Files.createTempDirectory("graft-slo-src").toString
    val hist = Files.createTempDirectory("graft-slo-hist").toString + "/history"
    val alerts = Files.createTempDirectory("graft-slo-al").toString + "/alerts"
    val chk = Files.createTempDirectory("graft-slo-chk").toString
    // split mid-scenario: h0-h2 in b1 (h1 alert fires from partial history),
    // the rest + sentinel in b2
    val (b1, b2) = events.partition(_.ts.getTime < (HB + 3) * H)
    writeBatch(src, "b1", b1)
    val q = EventPipeline.sloBurnStream(
      EventPipeline.fileSource(spark, src).toDF(), hist, alerts, chk,
      watermark = "0 seconds")
    q.processAllAvailable()
    writeBatch(src, "b2", b2 :+ sentinel)
    q.processAllAvailable(); q.stop()
    val streamed = spark.read.parquet(alerts).collect().map(keyOf).toSet
    assert(streamed == batch,
      s"only-batch=${batch -- streamed} only-stream=${streamed -- batch}")
  }

  test("burstStream: bounded replay emits exactly the fixed-threshold batch episodes") {
    val H = 3600000L
    // the A45 planted series with ABSOLUTE thresholds hi=10, lo=2:
    // bursts [w10,w11] (hot rides middle, closes cold) and [w14] (post-gap
    // middle tail w16-19 forms a hotless island -> dropped, but it MUST
    // consume island id 3 for id parity with the batch islanding); the
    // flush event at w50 is a cold singleton that finalizes everything
    val xWins = Seq(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1,
      5 -> 2, 6 -> 2, 7 -> 2, 8 -> 2, 9 -> 2,
      10 -> 10, 11 -> 4, 12 -> 1, 13 -> 1, 14 -> 10,
      16 -> 4, 17 -> 2, 18 -> 2, 19 -> 2, 50 -> 1)
    val yWins = (0 to 19).map(_ -> 3) // all-middle: never opens, no episodes
    var id = 0L
    val events = (xWins.map(("x", _)) ++ yWins.map(("y", _))).flatMap {
      case (tpe, (w, c)) => (0 until c).map { i =>
        id += 1
        Event(id, new Timestamp(w * H + i * 1000L), 1L, tpe, 1.0)
      }
    }.sortBy(e => (e.ts.getTime, e.event_id))
    import SparkSuite.spark.implicits._
    val batch = graft.operators.EventOps
      .burstsFixed(events.toDF(), H, hi = 10L, lo = 2L).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("burst_id"),
        r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms"),
        r.getAs[Long]("n_windows"), r.getAs[Long]("peak"),
        r.getAs[Long]("total"))).toSet
    assert(batch.map(t => (t._1, t._2)) == Set(("x", 1L), ("x", 2L)),
      s"planted batch shape drifted: $batch")

    val src = Files.createTempDirectory("graft-burst-src").toString
    val chk = Files.createTempDirectory("graft-burst-chk").toString
    // split INSIDE w11 so episode 1's windows cross the micro-batch boundary
    val cut = events.indexWhere(e => e.ts.getTime >= 11 * H + 2000L)
    val (first, second) = events.splitAt(cut)
    assert(first.exists(_.ts.getTime >= 10 * H) &&
      second.exists(e => e.ts.getTime >= 11 * H && e.ts.getTime < 12 * H),
      "split no longer crosses episode 1 — test is vacuous")
    writeBatch(src, "b1", first)
    val q = EventPipeline.burstStream(
      EventPipeline.fileSource(spark, src).as[Event], H, hi = 10L, lo = 2L)
      .toDF().writeStream.format("memory").queryName("burst_eps")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    writeBatch(src, "b2", second)
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("burst_eps").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("burst_id"),
        r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms"),
        r.getAs[Long]("n_windows"), r.getAs[Long]("peak"),
        r.getAs[Long]("total"))).toSet
    assert(streamed == batch,
      s"only-batch=${batch -- streamed} only-stream=${streamed -- batch}")
  }

  test("A80f: sliding distinct actives — cross-batch bitmap union, per-user dedup, append-once close") {
    val src = Files.createTempDirectory("graft-slide-src").toString
    val chk = Files.createTempDirectory("graft-slide-chk").toString
    // batch 1: users 1 and 2 in the 10:00 window (user 2 twice — distinct
    // must count once); batch 2: user 3 lands in the SAME window (the
    // union must merge across micro-batch state), then a sentinel far
    // enough ahead to close the real windows
    writeBatch(src, "b1", Seq(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(1), 2, "click", 1.0),
      Event(3, ts(2), 2, "click", 1.0)))
    val in = EventPipeline.fileSource(spark, src)
    val counts = EventPipeline.slidingDistinct(EventPipeline.deduped(in),
      watermark = None, windowDur = "10 minutes", slideDur = "5 minutes")
    val q = counts.writeStream.format("memory").queryName("slide_distinct")
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", chk).start()
    q.processAllAvailable()
    // nothing can close before the sentinel: append emits zero rows so far
    assert(spark.table("slide_distinct").isEmpty,
      "append mode must hold windows open until the watermark passes")
    writeBatch(src, "b2", Seq(
      Event(4, ts(3), 3, "click", 1.0),
      Event(99, Timestamp.valueOf("2024-01-01 10:50:00"), 0, "sentinel", 0.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("slide_distinct").collect()
      .map(r => (r.getAs[Long]("win_start_ms"), r.getAs[String]("event_type")) ->
        ((r.getAs[Long]("n_users"), r.getAs[Long]("n_events")))).toMap
    val w1000 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val w0955 = w1000 - 5L * 60 * 1000
    // both windows containing 10:00-10:03 close under the 10:40 watermark:
    // 3 DISTINCT users over 4 events, batch-2's user 3 unioned into
    // batch-1's stored bitmap {1, 2}
    assert(out((w1000, "click")) == ((3L, 4L)), s"got $out")
    assert(out((w0955, "click")) == ((3L, 4L)), s"got $out")
    // the sentinel's own windows stay open — append never emits them
    assert(!out.keySet.exists(_._2 == "sentinel"), s"sentinel leaked: $out")
  }

  test("C90s: streaming OOD gate — frozen base model, batch-identical scores, outlier dead-lettered") {
    import graft.streaming.EmbPipeline
    val base = Files.createTempDirectory("graft-ood-base").toString
    val srcDir = Files.createTempDirectory("graft-ood-src").toString
    val chk = Files.createTempDirectory("graft-ood-chk").toString
    val baseVecs: Seq[(Long, Array[Float], Int)] = Seq(
      (0L, Array(0f, 0f, 7f), 0), (1L, Array(4f, 0f, 7f), 0),
      (2L, Array(0f, 2f, 7f), 0), (3L, Array(4f, 2f, 7f), 0),
      (4L, Array(2f, 1f, 7f), 0))
    baseVecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/embeddings.parquet")
    val model = EmbPipeline.oodModel(spark, base)
    assert(model.length == 3 && model(2)._2 == 0.0) // constant dim: sigma 0

    def writeVecBatch(file: String, rows: Seq[(Long, Array[Float], Int)]): Unit = {
      val staging = Files.createTempDirectory("graft-ood-stage").toString
      rows.toDF("vec_id", "embedding", "label")
        .coalesce(1).write.mode("overwrite").parquet(staging)
      val part = new java.io.File(staging).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      Files.move(part.toPath, java.nio.file.Paths.get(s"$srcDir/$file.parquet"))
    }
    // batch 1: two in-distribution arrivals (values present in the base)
    writeVecBatch("b1", Seq((100L, Array(0f, 0f, 7f), 0), (101L, Array(4f, 2f, 7f), 0)))
    val gated = EmbPipeline.oodGateStream(
      EmbPipeline.embSource(spark, srcDir), model)
    val q = gated.writeStream.format("memory").queryName("ood_gate")
      .option("checkpointLocation", chk)
      .outputMode(OutputMode.Append).start()
    q.processAllAvailable()
    // batch 2: a wrong-modality row — the model must stay FROZEN (scored
    // against base stats, not re-fit including itself)
    writeVecBatch("b2", Seq((999L, Array(1000f, 1000f, 7f), 0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ood_gate").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Double]("ood"), r.getAs[Boolean]("admitted")))).toMap
    assert(out(100L)._2 && out(101L)._2, s"in-distribution rows rejected: $out")
    assert(!out(999L)._2, s"outlier admitted: $out")
    assert(out(999L)._1 > 100 * out(100L)._1)
    // stream scores are IDENTICAL to the batch operator on the same rows:
    // vec 100/101 duplicate base rows 0/3, which batch-scores via the same
    // frozen stats (base == scored corpus there)
    val batch = graft.operators.Similarity.oodScore(spark, base).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("ood")).toMap
    assert(out(100L)._1 == batch(0L) && out(101L)._1 == batch(3L),
      s"stream/batch divergence: $out vs $batch")
  }

  test("A90 stream: the day-close live forecast equals the batch forecaster bit-for-bit") { withRocksDB {
    val D = 86400000L
    def e(id: Long, day: Int, k: Long) =
      Event(id, new Timestamp(day * D + k), k % 50, "a", 1.0)
    // 16 days of trending+weekly counts for type "a"
    val rows = (0 until 16).flatMap { d =>
      (1 to (30 + 3 * d + (d % 7) * 2)).map(i => e(d * 10000L + i, d, i.toLong))
    }
    val (b1, b2) = rows.partition(_.ts.getTime < 8 * D)
    val sentinel = Event(9999999L, new Timestamp(40L * D), 1L, "sentinel", 1.0)
    import SparkSuite.spark.implicits._
    val batchDir = Files.createTempDirectory("graft-hwf-batch").toString
    rows.toDF().write.parquet(s"$batchDir/events.parquet") // no sentinel
    val src = Files.createTempDirectory("graft-hwf-src").toString
    val hist = Files.createTempDirectory("graft-hwf-hist").toString + "/h"
    val out = Files.createTempDirectory("graft-hwf-out").toString + "/f"
    val chk = Files.createTempDirectory("graft-hwf-chk").toString
    writeBatch(src, "b1", b1)
    val q = EventPipeline.hwForecastStream(
      EventPipeline.fileSource(spark, src), hist, out, chk)
    q.processAllAvailable()
    writeBatch(src, "b2", b2 :+ sentinel) // closes every real day
    q.processAllAvailable(); q.stop()
    def key(rows: Array[org.apache.spark.sql.Row]) = rows.map(r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("n_days"),
        r.getAs[Long]("h"), r.getAs[Double]("level"),
        r.getAs[Double]("trend"), r.getAs[Double]("forecast"))).toSet
    val stream = key(spark.read.parquet(out).collect())
    val batch = key(graft.operators.EventOps.hwForecast(spark, batchDir).collect())
    assert(stream == batch && stream.nonEmpty,
      s"stream ${stream.size} vs batch ${batch.size}")
  }}

  test("A89 stream: live heavy hitters carry state across batches; exact under capacity") { withRocksDB {
    val B = 1700000000000L
    def e(id: Long, k: Long, u: Long, t: String) =
      Event(id, new Timestamp(B + k), u, t, 1.0)
    // view: u1 x3, u2 x1 in b1; u2 x3 more + u3 x1 in b2 (u2 overtakes u1
    // only with the carried state); click: u5 x2 in b1 only
    val b1 = Seq(e(1, 1, 1, "view"), e(2, 2, 1, "view"), e(3, 3, 1, "view"),
      e(4, 4, 2, "view"), e(5, 5, 5, "click"), e(6, 6, 5, "click"))
    val b2 = Seq(e(7, 7, 2, "view"), e(8, 8, 2, "view"), e(9, 9, 2, "view"),
      e(10, 10, 3, "view"))
    val src = Files.createTempDirectory("graft-hh-src").toString
    val chk = Files.createTempDirectory("graft-hh-chk").toString
    writeBatch(src, "b1", b1)
    val q = EventPipeline.heavyHittersStream(
      EventPipeline.fileSource(spark, src).as[Event], k = 10, capacity = 64)
      .toDF().writeStream.format("memory").queryName("hh_live")
      .outputMode(OutputMode.Update).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    val mid = spark.table("hh_live").collect()
      .filter(r => r.getAs[String]("event_type") == "view")
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("user_id"),
        r.getAs[Long]("est"), r.getAs[Long]("lo")))
    assert(mid.toSet == Set((1, 1L, 3L, 3L), (2, 2L, 1L, 1L)), mid.toSeq.toString)
    writeBatch(src, "b2", b2)
    q.processAllAvailable(); q.stop()
    // latest emission per type = the rows with the max stream length n
    val all = spark.table("hh_live").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Int]("rank"), r.getAs[Long]("user_id"),
        r.getAs[Long]("est"), r.getAs[Long]("lo")))
    val lastView = { val n = all.filter(_._1 == "view").map(_._2).max
      all.filter(t => t._1 == "view" && t._2 == n).map(t => (t._3, t._4, t._5, t._6)).toSet }
    // exact regime (capacity 64 >> 3 users): est = lo = true cumulative
    // counts, u2 (4) now beats u1 (3)
    assert(lastView == Set((1, 2L, 4L, 4L), (2, 1L, 3L, 3L), (3, 3L, 1L, 1L)),
      lastView.toString)
    val lastClick = { val n = all.filter(_._1 == "click").map(_._2).max
      all.filter(t => t._1 == "click" && t._2 == n).map(t => (t._3, t._4, t._5, t._6)).toSet }
    assert(lastClick == Set((1, 5L, 2L, 2L)))
    spark.catalog.dropTempView("hh_live")
  }}

  test("A96 stream: live quantiles carry KLL state across batches; exact-regime emissions equal the batch rank rule") { withRocksDB {
    val B = 1700000000000L
    def e(id: Long, k: Long, t: String, v: Double) =
      Event(id, new Timestamp(B + k), 1L, t, v)
    // "view" values 1..9 split across two batches; "click" 10,20 in b1 only
    val b1 = (1 to 5).map(i => e(i.toLong, i.toLong, "view", i.toDouble)) ++
      Seq(e(100, 50, "click", 10.0), e(101, 51, "click", 20.0))
    val b2 = (6 to 9).map(i => e(i.toLong, i.toLong, "view", i.toDouble))
    val src = Files.createTempDirectory("graft-kllq-src").toString
    val chk = Files.createTempDirectory("graft-kllq-chk").toString
    writeBatch(src, "b1", b1)
    val q = EventPipeline.quantileStream(
      EventPipeline.fileSource(spark, src).as[Event], capacity = 64)
      .toDF().writeStream.format("memory").queryName("kllq_live")
      .outputMode(OutputMode.Update).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    val mid = spark.table("kllq_live").collect()
      .filter(_.getAs[String]("event_type") == "view")
      .map(r => (r.getAs[Long]("n"), r.getAs[Double]("value_p50"),
        r.getAs[Double]("value_p95"))).toSet
    // rank rule over 1..5: p50 = value at ceil(2.5) = 3, p95 at ceil(4.75) = 5
    assert(mid == Set((5L, 3.0, 5.0)), mid.toString)
    writeBatch(src, "b2", b2)
    q.processAllAvailable(); q.stop()
    val all = spark.table("kllq_live").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("value_p50"), r.getAs[Double]("value_p95")))
    // latest view emission folds BOTH batches: 1..9 → p50 = 5, p95 = 9
    // (state carried across triggers; exact regime at capacity 64)
    val lastView = { val n = all.filter(_._1 == "view").map(_._2).max
      all.filter(t => t._1 == "view" && t._2 == n).map(t => (t._2, t._3, t._4)).toSet }
    assert(lastView == Set((9L, 5.0, 9.0)), lastView.toString)
    // click saw no b2 rows: its state (10, 20) stands — p50 at ceil(1) = 10
    val lastClick = { val n = all.filter(_._1 == "click").map(_._2).max
      all.filter(t => t._1 == "click" && t._2 == n).map(t => (t._2, t._3, t._4)).toSet }
    assert(lastClick == Set((2L, 10.0, 20.0)), lastClick.toString)
    spark.catalog.dropTempView("kllq_live")
  }}

  test("A101s theta stream: live distinct equals batch COUNT(DISTINCT) across batches; re-seen users never inflate") {
    val src = Files.createTempDirectory("graft-theta-src").toString
    val chk = Files.createTempDirectory("graft-theta-chk").toString
    val B = 1704103200000L
    def e(id: Long, u: Long, t: String): Event =
      Event(id, new Timestamp(B + id), u, t, 1.0)
    // batch 1: view by users 1,2,3 (user 2 twice); click by users 10,11
    val b1 = Seq(e(1, 1, "view"), e(2, 2, "view"), e(3, 2, "view"),
      e(4, 3, "view"), e(5, 10, "click"), e(6, 11, "click"))
    // batch 2: view re-sees 1 and 3, adds 4 and 5; click silent
    val b2 = Seq(e(7, 1, "view"), e(8, 3, "view"), e(9, 4, "view"),
      e(10, 5, "view"))
    writeBatch(src, "b1", b1)
    val q = EventPipeline.thetaStream(
      EventPipeline.fileSource(spark, src).as[Event])
      .toDF().writeStream.format("memory").queryName("theta_live")
      .outputMode(OutputMode.Update).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    val mid = spark.table("theta_live").collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Double]("distinct_users"), r.getAs[Long]("retained"))).toSet
    // exact regime: estimates ARE the distinct counts; the duplicate view
    // by user 2 does not inflate
    assert(mid == Set(("view", 3.0, 3L), ("click", 2.0, 2L)), mid.toString)
    writeBatch(src, "b2", b2)
    q.processAllAvailable(); q.stop()
    val all = spark.table("theta_live").collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[Double]("distinct_users"), r.getAs[Long]("retained")))
    // latest view emission accumulates across batches: {1,2,3,4,5} = 5;
    // the re-seen users 1 and 3 added nothing
    val lastView = all.filter(_._1 == "view").map(_._2).max
    assert(lastView == 5.0, all.mkString(","))
    // click state stands untouched by a view-only batch
    assert(all.filter(_._1 == "click").map(_._2).max == 2.0)
    spark.catalog.dropTempView("theta_live")
  }

  test("A101s enrichment: events pass through once each, carrying their type's live distinct estimate per trigger") {
    val src = Files.createTempDirectory("graft-thetae-src").toString
    val chk = Files.createTempDirectory("graft-thetae-chk").toString
    val B = 1704103200000L
    def e(id: Long, u: Long, t: String): Event =
      Event(id, new Timestamp(B + id), u, t, 1.0)
    val b1 = Seq(e(1, 1, "view"), e(2, 2, "view"), e(3, 2, "view"))
    val b2 = Seq(e(4, 3, "view"), e(5, 1, "view"))
    writeBatch(src, "b1", b1)
    val q = EventPipeline.distinctEnrichedStream(
      EventPipeline.fileSource(spark, src).as[Event])
      .toDF().writeStream.format("memory").queryName("theta_enrich")
      .outputMode(OutputMode.Append).option("checkpointLocation", chk).start()
    q.processAllAvailable()
    val mid = spark.table("theta_enrich").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("live_distinct")))
      .toSet
    // batch 1 saw users {1, 2}: every event carries estimate 2
    assert(mid == Set((1L, 2.0), (2L, 2.0), (3L, 2.0)), mid.toString)
    writeBatch(src, "b2", b2)
    q.processAllAvailable(); q.stop()
    val all = spark.table("theta_enrich").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("live_distinct")))
      .toSet
    // batch 2 adds user 3 (user 1 re-seen): its events carry 3; batch 1
    // rows are append-final and unchanged; multiplicity exactly once each
    assert(all == mid ++ Set((4L, 3.0), (5L, 3.0)), all.toString)
    spark.catalog.dropTempView("theta_enrich")
  }
}
