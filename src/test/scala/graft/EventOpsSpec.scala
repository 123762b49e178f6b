package graft

import org.apache.spark.sql.Row
import graft.operators.EventOps

class EventOpsSpec extends SparkSuite {

  test("dedupFirst keeps exactly one earliest event per (user, type, day)") {
    val out = EventOps.dedupFirst(spark, sf).cache()
    val keys = out.select("user_id", "event_type", "day").distinct().count()
    assert(out.count() == keys)
    // kept ts must be the min over the group: re-derive via rateFilter source
    val ev = Tables.events(spark, sf)
    assert(out.count() <= ev.count())
  }

  test("latestByKey returns one row per user with the max timestamp") {
    val out = EventOps.latestByKey(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(out.length == users)
    val ev = Tables.events(spark, sf)
    import org.apache.spark.sql.functions._
    val maxMs = ev.select(max(unix_millis(col("ts").cast("timestamp_ltz")))).head().getLong(0)
    assert(out.map(_.getAs[Long]("ts_ms")).max == maxMs)
  }

  test("rateLimit conserves events and caps allowed at 5") {
    val out = EventOps.rateLimit(spark, sf).collect()
    val total = Tables.events(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_events")).sum == total)
    assert(out.forall(r => r.getAs[Long]("n_allowed") <= 5))
    assert(out.forall(r => r.getAs[Long]("n_allowed") + r.getAs[Long]("n_dropped") ==
      r.getAs[Long]("n_events")))
  }

  test("rateFilter admits exactly the per-group allowed counts") {
    val admitted = EventOps.rateFilter(spark, sf).count()
    val expected = EventOps.rateLimit(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_allowed")).head().getLong(0)
    assert(admitted == expected)
  }

  test("lastN returns n rows in strictly descending (ts, id) order") {
    val rows = EventOps.lastN(spark, sf, 10).collect()
    assert(rows.length == 10)
    val keys = rows.map(r => (r.getAs[Long]("ts_ms"), r.getAs[Long]("event_id")))
    assert(keys.sliding(2).forall { case Array(a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 > b._2) })
  }

  test("sessionize: session bounds ordered, counts conserve") {
    val out = EventOps.sessionize(spark, sf).collect()
    assert(out.forall(r => r.getAs[Long]("start_ms") <= r.getAs[Long]("end_ms")))
    assert(out.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
  }

  test("errorAlert only emits error events above threshold with correct level") {
    val out = EventOps.errorAlert(spark, sf).collect()
    assert(out.forall(_.getAs[Double]("value") >= 150.0))
    assert(out.forall { r =>
      val lvl = r.getAs[String]("level")
      if (r.getAs[Double]("value") >= 180.0) lvl == "critical" else lvl == "warning"
    })
  }

  test("checkpoint partitions cover all events") {
    val out = EventOps.checkpoint(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_processed")).sum == Tables.events(spark, sf).count())
    assert(out.map(_.getAs[Long]("part_id")).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("rangeJoinPriorHour: bucketed band join equals the naive inequality join") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf).select(col("event_id"), col("user_id"),
      col("event_type"), unix_millis(col("ts").cast("timestamp_ltz")).as("ts_ms"))
    val probe = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id").as("u"), col("ts_ms").as("t"))
    val build = ev.select(col("event_id").as("pid"), col("user_id").as("pu"),
      col("ts_ms").as("pt"))
    val naive = probe.join(build,
        col("u") === col("pu") && col("pt") >= col("t") - 3600000L && col("pt") < col("t"),
        "left")
      .groupBy("event_id").agg(count(col("pid")).as("n_naive"))
    val out = EventOps.rangeJoinPriorHour(spark, sf).select(col("event_id"), col("n_prior"))
    assert(out.count() == naive.count())
    val joined = out.join(naive, "event_id").cache()
    assert(joined.count() == out.count())
    assert(joined.filter(col("n_prior") =!= col("n_naive")).count() == 0)
    // the window is non-trivially populated at this SF (24 pairs)
    assert(joined.agg(sum(col("n_prior"))).head().getLong(0) > 0)
  }

  test("valueHistogram: counts conserve and values respect bin bounds") {
    val out = EventOps.valueHistogram(spark, sf).collect()
    assert(out.map(_.getAs[Long]("n_events")).sum == Tables.events(spark, sf).count())
    out.foreach { r =>
      val lo = r.getAs[Double]("bin_lo")
      assert(r.getAs[Double]("min_value") >= lo)
      assert(r.getAs[Double]("max_value") < lo + 50.0)
    }
  }

  test("patternMatch: most-recent-A within T, boundary inclusive, same-ms ties") {
    import SparkSuite.spark.implicits._
    import graft.streaming.EventPipeline.Event
    val t0 = 1700000000000L
    val min = 60000L
    def e(id: Long, tMs: Long, u: Long, typ: String) =
      Event(id, new java.sql.Timestamp(tMs), u, typ, 1.0)
    val d = java.nio.file.Files.createTempDirectory("graft-pat").toString
    Seq(
      // user 1: B@20min matches the LATER A (10min); B 2h after that A is
      // out of window; a same-ms A/B pair matches at lag 0
      e(1, t0, 1, "click"), e(2, t0 + 10 * min, 1, "click"),
      e(3, t0 + 20 * min, 1, "purchase"), e(4, t0 + 130 * min, 1, "purchase"),
      e(5, t0 + 240 * min, 1, "click"), e(6, t0 + 240 * min, 1, "purchase"),
      // user 2: B with no prior A; then lag EXACTLY withinMs still matches
      e(7, t0, 2, "purchase"), e(8, t0 + 60 * min, 2, "click"),
      e(9, t0 + 120 * min, 2, "purchase"),
      // user 3: two As at the same ms — the larger event_id anchors
      e(10, t0, 3, "click"), e(11, t0, 3, "click"),
      e(12, t0 + 5 * min, 3, "purchase"),
      // noise type is ignored entirely
      e(13, t0 + 1, 1, "view")
    ).toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = EventOps.patternMatch(spark, d).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("a_event_id"),
        r.getAs[Long]("b_event_id"), r.getAs[Long]("lag_ms"))).toSet
    assert(out == Set(
      (1L, 2L, 3L, 10 * min),
      (1L, 5L, 6L, 0L),
      (2L, 8L, 9L, 60 * min),
      (3L, 11L, 12L, 5 * min)))
  }

  test("sequenceMatch: three-stage chain with per-hop bounds, same-ms chain legal") {
    import SparkSuite.spark.implicits._
    import graft.streaming.EventPipeline.Event
    val t0 = 1700000000000L
    val min = 60000L
    def e(id: Long, tMs: Long, u: Long, typ: String) =
      Event(id, new java.sql.Timestamp(tMs), u, typ, 1.0)
    val d = java.nio.file.Files.createTempDirectory("graft-seq").toString
    Seq(
      // user 1: clean chain; a later purchase misses the B→C bound
      e(1, t0, 1, "signup"), e(2, t0 + 60 * min, 1, "click"),
      e(3, t0 + 90 * min, 1, "purchase"), e(4, t0 + 300 * min, 1, "purchase"),
      // user 2: click with no prior signup never qualifies
      e(5, t0, 2, "click"), e(6, t0 + 30 * min, 2, "purchase"),
      // user 3: signup→click beyond the 24 h A→B bound
      e(7, t0, 3, "signup"), e(8, t0 + 25 * 60 * min, 3, "click"),
      e(9, t0 + (25 * 60 + 30) * min, 3, "purchase"),
      // user 4: whole chain at ONE millisecond (lag-0 hops), then a second
      // click re-anchors a later purchase to the same signup
      e(10, t0, 4, "signup"), e(11, t0, 4, "click"), e(12, t0, 4, "purchase"),
      e(13, t0 + 10 * min, 4, "click"), e(14, t0 + 20 * min, 4, "purchase")
    ).toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = EventOps.sequenceMatch(spark, d).collect()
      .map(r => (r.getAs[Long]("a_event_id"), r.getAs[Long]("b_event_id"),
        r.getAs[Long]("c_event_id"))).toSet
    assert(out == Set((1L, 2L, 3L), (10L, 11L, 12L), (10L, 13L, 14L)))
  }

  test("patternDropout: clicks with no conversion within T, boundary and same-ms rescue") {
    import SparkSuite.spark.implicits._
    import graft.streaming.EventPipeline.Event
    val t0 = 1700000000000L
    val min = 60000L
    def e(id: Long, tMs: Long, u: Long, typ: String) =
      Event(id, new java.sql.Timestamp(tMs), u, typ, 1.0)
    val d = java.nio.file.Files.createTempDirectory("graft-drop").toString
    Seq(
      // user 1: converting click (20min lag), dropout with a LATE B
      // (2h — next_b_ms recorded), same-ms rescue (lag 0)
      e(1, t0, 1, "click"), e(2, t0 + 20 * min, 1, "purchase"),
      e(3, t0 + 300 * min, 1, "click"), e(4, t0 + 420 * min, 1, "purchase"),
      e(5, t0 + 600 * min, 1, "click"), e(6, t0 + 600 * min, 1, "purchase"),
      // user 2: boundary — lag EXACTLY withinMs still converts; then a
      // click with no purchase ever after (next_b_ms null)
      e(7, t0, 2, "click"), e(8, t0 + 60 * min, 2, "purchase"),
      e(9, t0 + 120 * min, 2, "click"),
      // a purchase BEFORE the click never rescues it
      e(10, t0, 3, "purchase"), e(11, t0 + 10 * min, 3, "click")
    ).toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = EventOps.patternDropout(spark, d).collect()
      .map(r => r.getAs[Long]("a_event_id") ->
        (if (r.isNullAt(r.fieldIndex("next_b_ms"))) None
         else Some(r.getAs[Long]("next_b_ms")))).toMap
    assert(out == Map(
      3L -> Some(t0 + 420 * min),  // converted, but 2h too late
      9L -> None,                  // never converted
      11L -> None))                // only a PRIOR purchase — doesn't count
  }

  test("sessionWindowCounts: native session_window boundary = exact gap splits") {
    import SparkSuite.spark.implicits._
    import graft.streaming.EventPipeline.Event
    val t0 = 1700000000000L
    val min = 60000L
    val d = java.nio.file.Files.createTempDirectory("graft-sw").toString
    Seq(
      // user 1: EXACTLY 30 min apart merges (event lands on the session's
      // close and extends it); 30 min + 1 ms starts a new session
      Event(1, new java.sql.Timestamp(t0), 1L, "click", 1.0),
      Event(2, new java.sql.Timestamp(t0 + 30 * min), 1L, "click", 1.0),
      Event(3, new java.sql.Timestamp(t0 + 60 * min + 1), 1L, "click", 1.0),
      // user 2: single event
      Event(4, new java.sql.Timestamp(t0), 2L, "view", 2.0)
    ).toDF().write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = EventOps.sessionWindowCounts(spark, d).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_ms"),
        r.getAs[Long]("end_ms"), r.getAs[Long]("n_events"))).toSet
    assert(out == Set(
      (1L, t0, t0 + 60 * min, 2L),                         // exact gap merged
      (1L, t0 + 60 * min + 1, t0 + 90 * min + 1, 1L),      // gap+1ms split
      (2L, t0, t0 + 30 * min, 1L)))
  }

  test("inactiveUsers: one row per user, churn flag matches the horizon") {
    import org.apache.spark.sql.functions._
    val out = EventOps.inactiveUsers(spark, sf).cache()
    assert(out.count() == Tables.events(spark, sf).select("user_id").distinct().count())
    val endMs = Tables.events(spark, sf)
      .agg(max(unix_millis(col("ts").cast("timestamp_ltz")))).head().getLong(0)
    out.collect().foreach { r =>
      val expect = (endMs - r.getAs[Long]("last_ms")) / 86400000 >= 7
      assert(r.getAs[Boolean]("churned") == expect)
      assert(r.getAs[Long]("first_ms") <= r.getAs[Long]("last_ms"))
    }
  }

  test("topPaths: transitions conserve against the session inventory") {
    import org.apache.spark.sql.functions._
    // every session of n events contributes exactly n−1 transitions, so
    // total transitions (unlimited) = total events − total sessions
    val full = EventOps.topPaths(spark, sf, k = Int.MaxValue).cache()
    val transitions = full.agg(sum(col("n_transitions"))).head().getLong(0)
    val events = Tables.events(spark, sf).count()
    val sessions = EventOps.sessionize(spark, sf).count()
    assert(transitions == events - sessions,
      s"$transitions transitions vs $events events - $sessions sessions")
    // k bounds the report deterministically
    assert(EventOps.topPaths(spark, sf, k = 5).count() == 5)
  }

  test("markovChain: rows match unlimited topPaths, probs normalize per from_type") {
    import org.apache.spark.sql.functions._
    val mk = EventOps.markovChain(spark, sf).cache()
    val tp = EventOps.topPaths(spark, sf, k = Int.MaxValue)
    // identical transition inventory (same counts per (from, to) pair)
    assert(mk.select("from_type", "to_type", "n_transitions")
      .except(tp).count() == 0)
    assert(tp.except(mk.select("from_type", "to_type", "n_transitions"))
      .count() == 0)
    // each from_type's outgoing probabilities sum to 1 (up to double adds)
    val sums = mk.groupBy("from_type").agg(sum(col("prob")).as("p")).collect()
    assert(sums.nonEmpty && sums.forall(r => math.abs(r.getAs[Double]("p") - 1.0) < 1e-9))
    assert(mk.collect().forall { r =>
      val p = r.getAs[Double]("prob"); p > 0.0 && p <= 1.0 })
  }

  test("decayCounts: weight-1 limit equals plain counts; real decay shrinks them") {
    import org.apache.spark.sql.functions._
    // half-life far beyond the corpus horizon → every k = 0, w = 1: the
    // decayed count must equal the plain count EXACTLY and the decayed
    // value the exact decimal sum of value
    val flat = EventOps.decayCounts(spark, sf, halfLifeDays = 1000000).cache()
    assert(flat.collect().forall(r =>
      r.getAs[Double]("decayed_n") == r.getAs[Long]("n_events").toDouble))
    val plain = Tables.events(spark, sf).groupBy("event_type")
      .agg(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 9)))
        .cast("double").as("sv"))
    val joined = flat.join(plain, "event_type").collect()
    assert(joined.nonEmpty && joined.forall(r =>
      r.getAs[Double]("decayed_value") == r.getAs[Double]("sv")))
    // a real half-life strictly discounts any type with >1 day of history
    val decayed = EventOps.decayCounts(spark, sf, halfLifeDays = 7).collect()
    assert(decayed.forall(r =>
      r.getAs[Double]("decayed_n") <= r.getAs[Long]("n_events").toDouble))
    assert(decayed.exists(r =>
      r.getAs[Double]("decayed_n") < r.getAs[Long]("n_events").toDouble))
  }

  test("sessionWindowCounts equals lag-based islands on the real table") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val gapMs = 30L * 60 * 1000
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_millis(col("ts").cast("timestamp_ltz")).as("ts_ms"),
        col("event_id"), col("value"))
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val naive = ev.withColumn("prev", lag(col("ts_ms"), 1).over(byUser))
      .withColumn("is_new", when(col("prev").isNull ||
        col("ts_ms") - col("prev") > gapMs, 1L).otherwise(0L))
      .withColumn("sid", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts_ms")).as("start_ms"),
        (max(col("ts_ms")) + gapMs).as("end_ms"), count(lit(1)).as("n_events"))
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val native = EventOps.sessionWindowCounts(spark, sf)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(native == naive)
  }

  test("hourlyProfile: exact heatmap cells and per-type shares") {
    import SparkSuite.spark.implicits._
    // 2026-08-10 is a Monday -> Spark dayofweek = 2 (1 = Sunday)
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, t("2026-08-10 10:00:00"), 1L, "x", 1.0),
      (2L, t("2026-08-10 10:30:00"), 2L, "x", 1.0),
      (3L, t("2026-08-10 10:59:59"), 3L, "x", 1.0),
      (4L, t("2026-08-11 23:00:00"), 1L, "x", 1.0),
      (5L, t("2026-08-10 10:15:00"), 1L, "y", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-hourly").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.hourlyProfile(spark, d).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("dow"),
        r.getAs[Long]("hod")) -> (r.getAs[Long]("n"), r.getAs[Double]("share")))
      .toMap
    assert(out.size == 3)
    assert(out(("x", 2L, 10L)) == (3L, 0.75))
    assert(out(("x", 3L, 23L)) == (1L, 0.25))
    assert(out(("y", 2L, 10L)) == (1L, 1.0))
  }

  test("stickiness: trailing-7-day actives dedup users across window days") {
    import SparkSuite.spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // user 2 active on BOTH d1 and d2 — the d2 window must count it once;
    // d9 is 7 days past d2, so its trailing window contains only user 3
    val rows = Seq(
      (1L, t("2026-08-01 10:00:00"), 1L, "x", 1.0),
      (2L, t("2026-08-01 11:00:00"), 2L, "x", 1.0),
      (3L, t("2026-08-02 09:00:00"), 2L, "x", 1.0),
      (4L, t("2026-08-09 09:00:00"), 3L, "x", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-stick").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.stickiness(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
          r.getAs[Double]("stickiness"))).toMap
    assert(out.size == 3) // only corpus days, no synthetic window-ends
    assert(out("2026-08-01") == (2L, 2L, 1.0))
    assert(out("2026-08-02") == (1L, 2L, 0.5))
    assert(out("2026-08-09") == (1L, 1L, 1.0))
  }

  test("forecast: Holt recurrence matches hand-computed level/trend exactly") {
    import SparkSuite.spark.implicits._
    def t(day: Int, i: Int) = java.sql.Timestamp.valueOf(f"2026-08-$day%02d 0$i:00:00")
    // x: daily counts [2,4,5,9] -> seed l=2,b=2; y5: l=4.5,b=2.25;
    // y9: l=7.875,b=2.8125 (all exact binary). y: 1 day -> excluded.
    // z: [3,7] -> seed is the answer (fold over empty slice).
    val counts = Map(1 -> 2, 2 -> 4, 3 -> 5, 4 -> 9)
    val rows = counts.toSeq.flatMap { case (d, n) =>
      (1 to n).map(i => (d * 100L + i, t(d, i), 1L, "x", 1.0)) } ++
      Seq((900L, t(1, 1), 1L, "y", 1.0)) ++
      (1 to 3).map(i => (910L + i, t(1, i), 1L, "z", 1.0)) ++
      (1 to 7).map(i => (920L + i, t(2, i), 1L, "z", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-fc").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.forecast(spark, d).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[java.sql.Date]("last_day").toString,
          r.getAs[Double]("level"), r.getAs[Double]("trend"),
          r.getAs[Double]("forecast_1"), r.getAs[Double]("forecast_7"))).toMap
    assert(out.size == 2) // y has one observation -> no forecast
    assert(out("x") == (4L, "2026-08-04", 7.875, 2.8125, 10.6875, 27.5625))
    assert(out("z") == (2L, "2026-08-02", 3.0, 4.0, 7.0, 31.0))
  }

  test("rollupStore: split ingest serves the direct aggregate; retry idempotent") {
    import SparkSuite.spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2026-08-$s 10:00:00")
    val rows = Seq(
      (1L, t("01"), 1L, "x", 1.25), (2L, t("01"), 2L, "x", 2.50),
      (3L, t("02"), 1L, "x", 4.00), (4L, t("01"), 3L, "y", 0.75))
    val d = java.nio.file.Files.createTempDirectory("graft-rs").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val store = java.nio.file.Files.createTempDirectory("graft-rs-store").toString
    val ev = graft.Tables.events(spark, d)
    EventOps.rollupStoreWrite(ev.filter($"event_id" <= 2), store, 0L)
    EventOps.rollupStoreWrite(ev.filter($"event_id" > 2), store, 1L)
    def served = EventOps.rollupStoreServe(spark, store).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString)
        -> (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    val expected = Map(
      ("x", "2026-08-01") -> (2L, 3.75), ("x", "2026-08-02") -> (1L, 4.0),
      ("y", "2026-08-01") -> (1L, 0.75))
    assert(served == expected)
    // same-batch retry re-lands the identical partition — no double count
    EventOps.rollupStoreWrite(ev.filter($"event_id" > 2), store, 1L)
    assert(served == expected)
    // a genuinely new batch lands additively
    EventOps.rollupStoreWrite(ev.filter($"event_id" === 1L), store, 2L)
    assert(served(("x", "2026-08-01")) == (3L, 5.0))
  }

  test("gapStats: exact rank-selected inter-arrival percentiles; zero-gap ties") {
    import SparkSuite.spark.implicits._
    val base = 1700000000000L
    def t(ms: Long) = new java.sql.Timestamp(base + ms)
    val rows = Seq(
      // x at 0, 1000, 3000, 10000 -> gaps [1000, 2000, 7000]
      (1L, t(0L), 1L, "x", 1.0), (2L, t(1000L), 1L, "x", 1.0),
      (3L, t(3000L), 1L, "x", 1.0), (4L, t(10000L), 1L, "x", 1.0),
      // y: two events in the same millisecond -> one zero gap
      (5L, t(500L), 1L, "y", 1.0), (6L, t(500L), 1L, "y", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-gap").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.gapStats(spark, d).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("gap_p50_ms"), r.getAs[Long]("gap_p95_ms"),
          r.getAs[Long]("gap_max_ms"), r.getAs[Long]("n_gaps"))).toMap
    // x: n=3 -> p50 rank 2 = 2000, p95 rank 3 = 7000
    assert(out("x") == (2000L, 7000L, 7000L, 3L))
    assert(out("y") == (0L, 0L, 0L, 1L))
  }

  test("silenceAlerts: closed episodes, exact-threshold non-alert, trailing open") {
    import SparkSuite.spark.implicits._
    val S = 3600000L // 1h threshold
    val base = 1700000000000L
    def t(ms: Long) = new java.sql.Timestamp(base + ms)
    val rows = Seq(
      // x: gap of exactly S (no alert), then a 2S gap (silence+recovery)
      (1L, t(0L), 1L, "x", 1.0), (2L, t(S), 1L, "x", 1.0),
      (3L, t(3 * S), 1L, "x", 1.0),
      // y: one event, then global end leaves a trailing open silence
      (4L, t(0L), 1L, "y", 1.0),
      // z: defines the corpus end; its own gaps are under threshold
      (5L, t(3 * S + 100L), 1L, "z", 1.0), (6L, t(4 * S), 1L, "z", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-sil").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.silenceAlerts(spark, d, S).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("kind"),
        r.getAs[Long]("at_ms") - base, r.getAs[Long]("since_ms") - base)).toSet
    // x's trailing is exactly S from the end (4S - 3S) -> strict > means
    // no alert; y's trailing 4S - 0 > S does alert
    assert(out == Set(
      ("x", "silence", 2 * S, S), ("x", "recovery", 3 * S, S),
      ("y", "silence", S, 0L)))
  }

  test("scd2: versioned intervals, last-writer-wins same-ms, boundary takes new version") {
    import SparkSuite.spark.implicits._
    val base = 1700000000000L
    val H = 3600000L
    def t(ms: Long) = new java.sql.Timestamp(base + ms)
    val rows = Seq(
      // u1 change log: v1 at t0; same-ms double-write at t0+2H (id 4 wins)
      (1L, t(0L), 1L, "signup", 1.0),
      (3L, t(2 * H), 1L, "signup", 2.0), (4L, t(2 * H), 1L, "signup", 2.5),
      // u1 purchases: before first version, at v1 start, at v2 start, after
      (10L, t(-1L), 1L, "purchase", 9.0), (11L, t(0L), 1L, "purchase", 9.0),
      (12L, t(2 * H), 1L, "purchase", 9.0), (13L, t(3 * H), 1L, "purchase", 9.0))
    val d = java.nio.file.Files.createTempDirectory("graft-scd2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val dim = EventOps.scd2Build(spark, d).collect()
      .map(r => r.getAs[Long]("version_n") ->
        (r.getAs[Long]("effective_from_ms") - base,
          Option(r.getAs[java.lang.Long]("effective_to_ms")).map(_ - base),
          r.getAs[Double]("dim_value"))).toMap
    assert(dim == Map(1L -> (0L, Some(2 * H), 1.0), 2L -> (2 * H, None, 2.5)))
    val joined = EventOps.scd2Join(spark, d).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (Option(r.getAs[java.lang.Double]("dim_value")),
          Option(r.getAs[java.lang.Long]("version_n")))).toMap
    assert(joined == Map(
      10L -> (None, None),                 // pre-history purchase: null dim
      11L -> (Some(1.0), Some(1L)),        // boundary: the starting version
      12L -> (Some(2.5), Some(2L)),        // boundary: the NEW version
      13L -> (Some(2.5), Some(2L))))
  }

  test("rfm: exact quintile scores, same-last_ms tie by user_id, no-purchase zero monetary") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    val H = 3600000L
    val D = 86400000L
    def t(ms: Long) = new java.sql.Timestamp(B + ms)
    // 5 users => score == rank; u1/u2 share last_ms (tie -> user_id order)
    val rows = Seq(
      // u1: 5 views, last B+4H, no purchase (monetary 0 -> m rank 1)
      (1L, t(0), 1L, "view", 1.0), (2L, t(H), 1L, "view", 1.0),
      (3L, t(2 * H), 1L, "view", 1.0), (4L, t(3 * H), 1L, "view", 1.0),
      (5L, t(4 * H), 1L, "view", 1.0),
      // u2: 4 events, last ALSO B+4H, one purchase 10
      (6L, t(0), 2L, "purchase", 10.0), (7L, t(H), 2L, "view", 1.0),
      (8L, t(2 * H), 2L, "view", 1.0), (9L, t(4 * H), 2L, "view", 1.0),
      // u3: 3 events, last B+2D, purchase 20
      (10L, t(D), 3L, "view", 1.0), (11L, t(D + H), 3L, "view", 1.0),
      (12L, t(2 * D), 3L, "purchase", 20.0),
      // u4: 2 purchases 5+10=15, last B+3D
      (13L, t(3 * D - H), 4L, "purchase", 5.0), (14L, t(3 * D), 4L, "purchase", 10.0),
      // u5: 1 purchase 30 at the anchor B+4D
      (15L, t(4 * D), 5L, "purchase", 30.0))
    val d = java.nio.file.Files.createTempDirectory("graft-rfm").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.rfm(spark, d).collect().map(r =>
      r.getAs[Long]("user_id") ->
        (r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
          r.getAs[Double]("monetary"), r.getAs[Long]("rfm_cell"))).toMap
    assert(got == Map(
      1L -> (3L, 5L, 0.0, 151L),  // r1 (oldest, id tie-break) f5 m1
      2L -> (3L, 4L, 10.0, 242L), // same last_ms as u1 -> r2
      3L -> (2L, 3L, 20.0, 334L),
      4L -> (1L, 2L, 15.0, 423L),
      5L -> (0L, 1L, 30.0, 515L)))
  }

  test("survival: KM product over durations, censored stay at risk, final-day censoring") {
    import SparkSuite.spark.implicits._
    val D = 86400000L
    def t(day: Long) = new java.sql.Timestamp(20000L * D + day * D)
    // max_day = 10: u4 and u5 end there => censored; others churn
    val rows = Seq(
      (1L, t(0), 1L, "view", 1.0),                          // u1: t=0 churn
      (2L, t(0), 2L, "view", 1.0), (3L, t(2), 2L, "view", 1.0),  // u2: t=2 churn
      (4L, t(1), 3L, "view", 1.0), (5L, t(3), 3L, "view", 1.0),  // u3: t=2 churn
      (6L, t(0), 4L, "view", 1.0), (7L, t(10), 4L, "view", 1.0), // u4: t=10 cens
      (8L, t(10), 5L, "view", 1.0))                         // u5: t=0 censored
    val d = java.nio.file.Files.createTempDirectory("graft-km").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.survival(spark, d).collect()
      .map(r => (r.getAs[Long]("duration_days"), r.getAs[Long]("n_risk"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_censored"),
        r.getAs[Double]("survival"))).sortBy(_._1)
    val s0 = 1.0 * (1.0 - 1.0 / 5.0)        // t=0: 1 churn of 5 at risk
    val s2 = s0 * (1.0 - 2.0 / 3.0)         // t=2: 2 churn of 3 at risk
    val s10 = s2 * (1.0 - 0.0 / 1.0)        // t=10: censoring only
    assert(got.toSeq == Seq(
      (0L, 5L, 1L, 1L, s0), (2L, 3L, 2L, 0L, s2), (10L, 1L, 0L, 1L, s10)))
  }

  test("experiment: md5 assignment, >= conversion boundary, exact z arithmetic") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // user k makes exactly k purchases; minPurchases=5 => users 5..8 convert
    val rows = (1L to 8L).flatMap(u => (1L to u).map(i =>
      (u * 100 + i, new java.sql.Timestamp(B + u * 1000 + i), u,
        "purchase", 1.0)))
    val d = java.nio.file.Files.createTempDirectory("graft-exp").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val variant = (1L to 8L).map(u =>
      u -> (if (md5hex(s"exp1:$u").substring(0, 2) < "80") "A" else "B")).toMap
    val nA = variant.values.count(_ == "A").toLong
    val cA = (5L to 8L).count(variant(_) == "A").toLong
    val nB = 8L - nA
    val cB = 4L - cA
    val (ra, rb) = (cA.toDouble / nA.toDouble, cB.toDouble / nB.toDouble)
    val p = (cA + cB).toDouble / (nA + nB).toDouble
    val se = math.sqrt(p * (1.0 - p) * (1.0 / nA.toDouble + 1.0 / nB.toDouble))
    val row = EventOps.experiment(spark, d, minPurchases = 5).collect().head
    assert((row.getAs[Long]("n_a"), row.getAs[Long]("conv_a"),
      row.getAs[Long]("n_b"), row.getAs[Long]("conv_b")) == (nA, cA, nB, cB))
    assert(row.getAs[Double]("rate_a") == ra && row.getAs[Double]("rate_b") == rb)
    assert(row.getAs[Double]("z_stat") == (rb - ra) / se)
    assert(row.getAs[Boolean]("significant") == (math.abs((rb - ra) / se) > 1.96))
  }

  test("concentration/gini: exact Lorenz deciles and rank-form Gini; equal users => 0") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    def mk(counts: Map[Long, Int]): String = {
      val rows = counts.toSeq.flatMap { case (u, n) => (1 to n).map(i =>
        (u * 100 + i, new java.sql.Timestamp(B + i * 1000L), u, "view", 1.0)) }
      val d = java.nio.file.Files.createTempDirectory("graft-gini").toString
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .write.parquet(s"$d/events.parquet")
      d
    }
    // counts 1,1,3,5: ranks 1..4 (tie by id), total 10
    val d1 = mk(Map(1L -> 1, 2L -> 1, 3L -> 3, 4L -> 5))
    val lorenz = EventOps.concentration(spark, d1).collect()
      .map(r => r.getAs[Long]("decile") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_events"),
          r.getAs[Long]("cum_events"), r.getAs[Double]("share"),
          r.getAs[Double]("cum_share"))).toMap
    assert(lorenz == Map(
      0L -> (1L, 1L, 1L, 0.1, 0.1), 2L -> (1L, 1L, 2L, 0.1, 0.2),
      5L -> (1L, 3L, 5L, 0.3, 0.5), 7L -> (1L, 5L, 10L, 0.5, 1.0)))
    val g1 = EventOps.gini(spark, d1).collect().head
    // S = 1+2+9+20 = 32; G = (64 - 5*10) / (4*10) = 0.35
    assert((g1.getAs[Long]("n_users"), g1.getAs[Long]("total_events"),
      g1.getAs[Double]("gini")) == (4L, 10L, 0.35))
    // perfectly equal users => Gini exactly 0
    val d2 = mk(Map(1L -> 2, 2L -> 2, 3L -> 2))
    assert(EventOps.gini(spark, d2).collect().head.getAs[Double]("gini") == 0.0)
  }

  test("newVsReturning: first-day actives are new, multi-event days dedup") {
    import SparkSuite.spark.implicits._
    val D = 86400000L
    def t(day: Long, k: Long) = new java.sql.Timestamp(20000L * D + day * D + k)
    val rows = Seq(
      // u1 active d0 (twice) and d2; u2 active d0 only; u3 first seen d2
      (1L, t(0, 1), 1L, "view", 1.0), (2L, t(0, 2), 1L, "view", 1.0),
      (3L, t(2, 1), 1L, "view", 1.0),
      (4L, t(0, 3), 2L, "view", 1.0),
      (5L, t(2, 2), 3L, "view", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-nvr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.newVsReturning(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("dau"), r.getAs[Long]("n_new"),
          r.getAs[Long]("n_returning"))).toMap
    val d0 = new java.sql.Date(20000L * D).toString
    val d2 = new java.sql.Date(20000L * D + 2 * D).toString
    assert(got == Map(d0 -> (2L, 2L, 0L), d2 -> (2L, 1L, 1L)))
  }

  test("cohortLtv: per-offset revenue, cumulative curve, cohort-size division, window cut") {
    import SparkSuite.spark.implicits._
    val D = 86400000L
    def t(day: Long, k: Long) = new java.sql.Timestamp(20000L * D + day * D + k)
    val rows = Seq(
      // cohort d0: u1 buys 10 on d0 and 5 on d1; u2 views d0, buys 20 on d1
      (1L, t(0, 1), 1L, "purchase", 10.0), (2L, t(1, 1), 1L, "purchase", 5.0),
      (3L, t(0, 2), 2L, "view", 1.0), (4L, t(1, 2), 2L, "purchase", 20.0),
      // cohort d1: u3 buys 7 on d1
      (5L, t(1, 3), 3L, "purchase", 7.0),
      // beyond maxOffset=7: u1's d9 purchase must not appear
      (6L, t(9, 1), 1L, "purchase", 99.0))
    val d = java.nio.file.Files.createTempDirectory("graft-ltv").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val c0 = new java.sql.Date(20000L * D).toString
    val c1 = new java.sql.Date(20000L * D + D).toString
    val got = EventOps.cohortLtv(spark, d).collect()
      .map(r => (r.getAs[String]("cohort_day"), r.getAs[Long]("offset_days")) ->
        (r.getAs[Long]("n_active"), r.getAs[Double]("revenue"),
          r.getAs[Double]("cum_revenue"), r.getAs[Double]("ltv_per_user"))).toMap
    assert(got == Map(
      (c0, 0L) -> (2L, 10.0, 10.0, 5.0),
      (c0, 1L) -> (2L, 25.0, 35.0, 17.5),
      (c1, 0L) -> (1L, 7.0, 7.0, 7.0)))
  }

  test("ttc: rank-selected percentiles, zero-ttc first-purchase, non-converters excluded") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    def t(ms: Long) = new java.sql.Timestamp(B + ms)
    val rows = Seq(
      (1L, t(0), 1L, "view", 1.0), (2L, t(100), 1L, "purchase", 1.0),
      (3L, t(0), 2L, "view", 1.0), (4L, t(300), 2L, "purchase", 1.0),
      (5L, t(0), 3L, "purchase", 1.0),                       // ttc 0
      (6L, t(0), 4L, "view", 1.0), (7L, t(200), 4L, "purchase", 1.0),
      (8L, t(500), 4L, "purchase", 1.0),                     // min picks 200
      (9L, t(0), 5L, "view", 1.0))                           // never converts
    val d = java.nio.file.Files.createTempDirectory("graft-ttc").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = EventOps.timeToConvert(spark, d).collect().head
    // ttc sorted: 0, 100, 200, 300; ranks ceil(q*4) = 1, 2, 3, 4
    assert((r.getAs[Long]("n_converted"), r.getAs[Long]("p25_ms"),
      r.getAs[Long]("p50_ms"), r.getAs[Long]("p75_ms"),
      r.getAs[Long]("p90_ms"), r.getAs[Long]("max_ms")) ==
      (4L, 0L, 100L, 200L, 300L, 300L))
  }

  test("dowAnomaly: same-weekday fence flags only the spike; exact-3-MAD boundary silent") {
    import SparkSuite.spark.implicits._
    val D = 86400000L
    def mkDay(ty: String, day: Long, n: Int, idBase: Long) = (1 to n).map(i =>
      (idBase + i, new java.sql.Timestamp(day * D + i * 1000L), i.toLong, ty, 1.0))
    // type x, one weekday class (days 20000/20007/20014): 5,5,50 -> flag 50
    // type y, same class: 5,5,8 -> absdev 3 == 3*mad(1) -> NOT flagged
    val rows = mkDay("x", 20000, 5, 1000) ++ mkDay("x", 20007, 5, 2000) ++
      mkDay("x", 20014, 50, 3000) ++ mkDay("y", 20000, 5, 4000) ++
      mkDay("y", 20007, 5, 5000) ++ mkDay("y", 20014, 8, 6000)
    val d = java.nio.file.Files.createTempDirectory("graft-dow").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.dowAnomaly(spark, d).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("y"),
        r.getAs[Long]("med"), r.getAs[Long]("mad")))
    assert(got.toSeq == Seq(
      ("x", new java.sql.Date(20014L * D).toString, 50L, 5L, 1L)))
  }

  test("boundedRetention: lead-within-window retained, gap-8 and terminal days not") {
    import SparkSuite.spark.implicits._
    val D = 86400000L
    def t(day: Long, k: Long) = new java.sql.Timestamp(20000L * D + day * D + k)
    val rows = Seq(
      (1L, t(0, 1), 1L, "view", 1.0), (2L, t(5, 1), 1L, "view", 1.0),
      (3L, t(0, 2), 2L, "view", 1.0), (4L, t(8, 1), 2L, "view", 1.0),
      (5L, t(0, 3), 3L, "view", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-br").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.boundedRetention(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_retained"),
          r.getAs[Double]("retention"))).toMap
    def day(k: Long) = new java.sql.Date(20000L * D + k * D).toString
    assert(got == Map(
      day(0) -> (3L, 1L, 1.0 / 3.0),
      day(5) -> (1L, 0L, 0.0),
      day(8) -> (1L, 0L, 0.0)))
  }

  test("sloBurn: two-window AND — sustained burn alerts, fast-only blip suppressed, gap frame shrinks") {
    import SparkSuite.spark.implicits._
    val H = 3600000L
    val HB = 480000L // hour index base
    var id = 0L
    def mkHour(hr: Long, total: Int, errors: Int) = (1 to total).map { i =>
      id += 1
      (id, new java.sql.Timestamp((HB + hr) * H + i * 1000L), i.toLong,
        if (i <= errors) "error" else "view", 1.0)
    }
    // h0 at-budget; h1/h2 sustained burn; h3-h7 clean; h8 fast-only blip
    // (6h window dilutes it); h20 post-gap spike (frame = itself only)
    val rows = mkHour(0, 10, 2) ++ mkHour(1, 10, 5) ++ mkHour(2, 10, 3) ++
      (3L to 7L).flatMap(mkHour(_, 10, 0)) ++ mkHour(8, 10, 3) ++
      mkHour(20, 10, 5)
    val d = java.nio.file.Files.createTempDirectory("graft-slo").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.sloBurn(spark, d).collect()
      .map(r => (r.getAs[Long]("hour_ms") / H - HB) ->
        (r.getAs[Long]("n_err"), r.getAs[Long]("err6"),
          r.getAs[Long]("total6"))).toMap
    assert(got == Map(
      1L -> (5L, 7L, 20L),   // 6h frame h0-h1: 7/20 sustained
      2L -> (3L, 10L, 30L),  // h0-h2: 10/30
      20L -> (5L, 5L, 10L))) // gap: frame shrinks to h20 alone
  }

  test("sessionFeatures: typed feature vector per island, exact-gap stays in-session") {
    import SparkSuite.spark.implicits._
    val B = 1700006400000L // midnight UTC: session-1 hour 0, session-2 hour 1
    val G = 1800000L       // the 30-min gap
    def t(ms: Long) = new java.sql.Timestamp(B + ms)
    val rows = Seq(
      // session 1: view, click, purchase(10), error; event at exactly +G
      // from its predecessor STAYS in-session (strict > breaks)
      (1L, t(0), 1L, "view", 1.0), (2L, t(1000), 1L, "click", 1.0),
      (3L, t(1000 + G), 1L, "purchase", 10.0), (4L, t(2000 + G), 1L, "error", 1.0),
      // session 2 opens at +G+1ms after the last event: two purchases
      (5L, t(2000 + 2 * G + 1), 1L, "purchase", 2.5),
      (6L, t(3000 + 2 * G + 1), 1L, "purchase", 0.5))
    val d = java.nio.file.Files.createTempDirectory("graft-sfeat").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.sessionFeatures(spark, d).collect()
      .map(r => r.getAs[Long]("session_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_types"),
          r.getAs[Long]("n_clicks"), r.getAs[Long]("n_purchases"),
          r.getAs[Double]("purchase_value"), r.getAs[Long]("duration_ms"),
          r.getAs[Long]("start_hour"), r.getAs[Boolean]("converted"))).toMap
    assert(got == Map(
      1L -> (4L, 4L, 1L, 1L, 10.0, 2000L + G, 0L, true),
      2L -> (2L, 1L, 0L, 2L, 3.0, 1000L, 1L, true)))
  }

  test("funnelLatency: sequential firsts, pre-view click ignored, no-click purchase dropped") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    def t(ms: Long) = new java.sql.Timestamp(B + ms)
    val rows = Seq(
      (1L, t(0), 1L, "view", 1.0), (2L, t(100), 1L, "click", 1.0),
      (3L, t(200), 1L, "purchase", 1.0),
      // u2: the click BEFORE any view must not qualify
      (4L, t(0), 2L, "click", 1.0), (5L, t(50), 2L, "view", 1.0),
      (6L, t(80), 2L, "click", 1.0), (7L, t(90), 2L, "purchase", 1.0),
      // u3: purchase without any qualifying click -> no step-2 row
      (8L, t(0), 3L, "view", 1.0), (9L, t(50), 3L, "purchase", 1.0),
      // u4: same-ms click with larger id counts (latency 0)
      (10L, t(0), 4L, "view", 1.0), (11L, t(0), 4L, "click", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-flat").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.funnelLatency(spark, d).collect()
      .map(r => r.getAs[String]("step") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("p50_ms"),
          r.getAs[Long]("p90_ms"), r.getAs[Long]("max_ms"))).toMap
    assert(got == Map(
      "view->click" -> (3L, 30L, 100L, 100L),    // lats [0, 30, 100]
      "click->purchase" -> (2L, 10L, 100L, 100L))) // lats [10, 100]
  }

  test("valueTrend: exact per-(type, day) rank picks with event_id tie order") {
    import SparkSuite.spark.implicits._
    val D = 86400000L
    def t(day: Long, k: Long) = new java.sql.Timestamp(20000L * D + day * D + k)
    // day 0, type x: values [1, 2, 2, 5, 9] -> n=5, p50 = rank 3 (= 2),
    // p95 = rank ceil(4.75)=5 (= 9); day 1, type x: [7] -> all 7
    val rows = Seq(
      (1L, t(0, 1), 1L, "x", 2.0), (2L, t(0, 2), 1L, "x", 1.0),
      (3L, t(0, 3), 1L, "x", 9.0), (4L, t(0, 4), 1L, "x", 2.0),
      (5L, t(0, 5), 1L, "x", 5.0),
      (6L, t(1, 1), 1L, "x", 7.0))
    val d = java.nio.file.Files.createTempDirectory("graft-vt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.valueTrend(spark, d).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("p50"),
          r.getAs[Double]("p95"), r.getAs[Double]("max_value"))).toMap
    def day(k: Long) = new java.sql.Date(20000L * D + k * D).toString
    assert(got == Map(
      ("x", day(0)) -> (5L, 2.0, 9.0, 9.0),
      ("x", day(1)) -> (1L, 7.0, 7.0, 7.0)))
  }

  test("funnelStages: deepest sequential stage, unqualified steps don't advance") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    def t(ms: Long) = new java.sql.Timestamp(B + ms)
    val rows = Seq(
      // u1 full funnel -> 3; u4 view+click -> 2
      (1L, t(0), 1L, "view", 1.0), (2L, t(10), 1L, "click", 1.0),
      (3L, t(20), 1L, "purchase", 1.0),
      (4L, t(0), 4L, "view", 1.0), (5L, t(10), 4L, "click", 1.0),
      // u2: click BEFORE view doesn't advance -> stage 1
      (6L, t(0), 2L, "click", 1.0), (7L, t(50), 2L, "view", 1.0),
      // u3: purchase without qualified click -> stage 1
      (8L, t(0), 3L, "view", 1.0), (9L, t(50), 3L, "purchase", 1.0),
      // u6: click only, never viewed -> stage 0
      (10L, t(0), 6L, "click", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-fstg").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.funnelStages(spark, d).collect()
      .map(r => r.getAs[Long]("stage") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_reached"),
          r.getAs[Double]("reach_share"))).toMap
    assert(got == Map(
      3L -> (1L, 1L, 0.2), 2L -> (1L, 2L, 0.4),
      1L -> (2L, 4L, 0.8), 0L -> (1L, 5L, 1.0)))
  }

  test("bounceRate: single-event sessions per start day; multi-event sessions don't bounce") {
    import SparkSuite.spark.implicits._
    val D = 86400000L
    val G = 1800000L
    def t(day: Long, k: Long) = new java.sql.Timestamp(20000L * D + day * D + k)
    val rows = Seq(
      // u1 day0: bounce session, then (after > gap) a 2-event session
      (1L, t(0, 0), 1L, "view", 1.0),
      (2L, t(0, G + 1), 1L, "view", 1.0), (3L, t(0, G + 1000), 1L, "view", 1.0),
      // u2 day1: bounce
      (4L, t(1, 0), 2L, "view", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-br2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.bounceRate(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounces"),
          r.getAs[Double]("bounce_rate"))).toMap
    def day(k: Long) = new java.sql.Date(20000L * D + k * D).toString
    assert(got == Map(day(0) -> (2L, 1L, 0.5), day(1) -> (1L, 1L, 1.0)))
  }

  test("purchaseCadence: per-user consecutive gaps, single buyers excluded, exact picks") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    def t(ms: Long) = new java.sql.Timestamp(B + ms)
    val rows = Seq(
      (1L, t(0), 1L, "purchase", 1.0), (2L, t(100), 1L, "purchase", 1.0),
      (3L, t(400), 1L, "purchase", 1.0),          // u1 gaps: 100, 300
      (4L, t(0), 2L, "purchase", 1.0),            // u2: single buy, no gap
      (5L, t(0), 3L, "purchase", 1.0), (6L, t(50), 3L, "purchase", 1.0),
      (7L, t(10), 1L, "view", 1.0))               // non-purchase ignored
    val d = java.nio.file.Files.createTempDirectory("graft-cad").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val r = EventOps.purchaseCadence(spark, d).collect().head
    // gaps sorted [50, 100, 300]: ranks ceil(q*3) = 1, 2, 3, 3
    assert((r.getAs[Long]("n_gaps"), r.getAs[Long]("n_repeat_buyers"),
      r.getAs[Long]("p25_ms"), r.getAs[Long]("p50_ms"),
      r.getAs[Long]("p75_ms"), r.getAs[Long]("p90_ms"),
      r.getAs[Long]("max_ms")) == (3L, 2L, 50L, 100L, 300L, 300L, 300L))
  }

  test("streaks: consecutive-day islands, max per user, exact histogram") {
    import SparkSuite.spark.implicits._
    val D = 86400000L
    def t(day: Long, k: Long) = new java.sql.Timestamp(20000L * D + day * D + k)
    val rows = Seq(
      // u1: days 0,1,2 then 5,6 -> max streak 3 (two events on day 1 dedup)
      (1L, t(0, 1), 1L, "view", 1.0), (2L, t(1, 1), 1L, "view", 1.0),
      (3L, t(1, 2), 1L, "view", 1.0), (4L, t(2, 1), 1L, "view", 1.0),
      (5L, t(5, 1), 1L, "view", 1.0), (6L, t(6, 1), 1L, "view", 1.0),
      (7L, t(0, 1), 2L, "view", 1.0),                       // u2: streak 1
      (8L, t(1, 1), 3L, "view", 1.0), (9L, t(2, 1), 3L, "view", 1.0)) // u3: 2
    val d = java.nio.file.Files.createTempDirectory("graft-stk").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.streaks(spark, d).collect()
      .map(r => r.getAs[Long]("max_streak") -> r.getAs[Long]("n_users")).toMap
    assert(got == Map(3L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("audienceOverlap: exact Jaccard per unordered type pair") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    def t(ms: Long) = new java.sql.Timestamp(B + ms)
    // u1 {a,b}, u2 {a}, u3 {a,b,c} (duplicate (u1, a) event dedups)
    val rows = Seq(
      (1L, t(0), 1L, "a", 1.0), (2L, t(1), 1L, "b", 1.0), (3L, t(2), 1L, "a", 1.0),
      (4L, t(0), 2L, "a", 1.0),
      (5L, t(0), 3L, "a", 1.0), (6L, t(1), 3L, "b", 1.0), (7L, t(2), 3L, "c", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-ovl").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.audienceOverlap(spark, d).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"),
          r.getAs[Double]("jaccard"))).toMap
    assert(got == Map(
      ("a", "b") -> (3L, 2L, 2L, 2.0 / 3.0),
      ("a", "c") -> (3L, 1L, 1L, 1.0 / 3.0),
      ("b", "c") -> (2L, 1L, 1L, 0.5)))
  }

  test("growthAccounting: new/retained/resurrected split, churn day-after, horizon censoring") {
    import SparkSuite.spark.implicits._
    val D = 86400000L
    def t(day: Long, k: Long) = new java.sql.Timestamp(20000L * D + day * D + k)
    val rows = Seq(
      // u1: days 0,1,3; u2: days 0,4 (day 4 = horizon)
      (1L, t(0, 1), 1L, "view", 1.0), (2L, t(1, 1), 1L, "view", 1.0),
      (3L, t(3, 1), 1L, "view", 1.0),
      (4L, t(0, 2), 2L, "view", 1.0), (5L, t(4, 1), 2L, "view", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-grw").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.growthAccounting(spark, d).collect()
      .map(r => (r.getAs[Long]("day_idx") - 20000L) ->
        (r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
          r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"),
          Option(r.getAs[java.lang.Double]("quick_ratio")))).toMap
    assert(got == Map(
      0L -> (2L, 0L, 0L, 0L, None),          // both new; nothing churned yet
      1L -> (0L, 1L, 0L, 1L, Some(0.0)),     // u1 retained; u2's run churned
      2L -> (0L, 0L, 0L, 1L, Some(0.0)),     // u1's 0-1 run churned
      3L -> (0L, 0L, 1L, 0L, None),          // u1 resurrected
      4L -> (0L, 0L, 1L, 1L, Some(1.0))))    // u2 resurrected at the horizon;
                                             // u1's day-3 run churned
  }

  test("retentionTriangle: epoch-week cohorts, offset-0 size, exact shares") {
    import SparkSuite.spark.implicits._
    val W = 604800000L
    def t(week: Long, k: Long) = new java.sql.Timestamp(3000L * W + week * W + k)
    val rows = Seq(
      // cohort w0: u1 active w0, w1, w3; u2 active w0 only
      (1L, t(0, 1), 1L, "view", 1.0), (2L, t(1, 1), 1L, "view", 1.0),
      (3L, t(3, 1), 1L, "view", 1.0), (4L, t(0, 2), 2L, "view", 1.0),
      // cohort w2: u3 active w2, w3
      (5L, t(2, 1), 3L, "view", 1.0), (6L, t(3, 2), 3L, "view", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-tri").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.retentionTriangle(spark, d).collect()
      .map(r => (r.getAs[Long]("cohort_week") - 3000L,
        r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention"))).toMap
    assert(got == Map(
      (0L, 0L) -> (2L, 2L, 1.0), (0L, 1L) -> (1L, 2L, 0.5),
      (0L, 3L) -> (1L, 2L, 0.5),
      (2L, 0L) -> (1L, 1L, 1.0), (2L, 1L) -> (1L, 1L, 1.0)))
  }

  test("attribution: last-touch pick, direct bucket, linear equal split, T boundary") {
    import SparkSuite.spark.implicits._
    val T = 86400000L
    val base = 1700000000000L
    def t(ms: Long) = new java.sql.Timestamp(base + ms)
    val H = 3600000L
    val rows = Seq(
      // u1: view, click, purchase 12 -> last-touch click; linear 6+6
      (10L, t(0L), 1L, "view", 1.0), (11L, t(H), 1L, "click", 1.0),
      (12L, t(2 * H), 1L, "purchase", 12.0),
      // u2: bare purchase -> direct
      (20L, t(0L), 2L, "purchase", 7.0),
      // u3: touch outside the window -> direct, no linear credit
      (30L, t(0L), 3L, "click", 1.0), (31L, t(T + 1L), 3L, "purchase", 5.0),
      // u4: same-ms touch attributes (lag-0 legal)
      (40L, t(0L), 4L, "view", 1.0), (41L, t(0L), 4L, "purchase", 8.0),
      // u5: two same-ms touches -> largest event_id (the view) wins last-touch
      (50L, t(0L), 5L, "click", 1.0), (51L, t(0L), 5L, "view", 1.0),
      (52L, t(1L), 5L, "purchase", 10.0),
      // u6: purchase exactly at touch+T still attributes (<= boundary)
      (60L, t(0L), 6L, "click", 1.0), (61L, t(T), 6L, "purchase", 2.0))
    val d = java.nio.file.Files.createTempDirectory("graft-attr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val lt = EventOps.attributionLastTouch(spark, d).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_conv"), r.getAs[Double]("attr_value"))).toMap
    assert(lt == Map("click" -> (2L, 14.0), "view" -> (2L, 18.0),
      "direct" -> (2L, 12.0)))
    val lin = EventOps.attributionLinear(spark, d).collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_credited"), r.getAs[Double]("attr_value"))).toMap
    // u1 splits 6/6; u4 gives its view 8; u5 splits 5/5; u6's click gets 2
    assert(lin == Map("view" -> (3L, 19.0), "click" -> (3L, 13.0)))
    // conservation: linear credits total exactly the attributable value
    assert(lin.values.map(_._2).sum == 32.0)
  }

  test("cusum: accumulation to alarm, reset carries forward, constant series silent") {
    import SparkSuite.spark.implicits._
    // x: 8 days at 10 then 4 days at 13 -> med 10, MAD 0 -> k=1, h=4;
    //    s+ walks 2,4,6(alarm,reset),2 across the shifted days
    // y: downward shift 10 -> 7, same walk on the s- side
    // z: constant 5 -> statistics pinned at 0, no alarms
    var id = 0L
    def day(n: Int) = f"2026-07-$n%02d 12:00:00"
    val rows = Seq.newBuilder[(Long, java.sql.Timestamp, Long, String, Double)]
    for (d <- 1 to 12; _ <- 1 to (if (d <= 8) 10 else 13)) {
      id += 1; rows += ((id, java.sql.Timestamp.valueOf(day(d)), 1L, "x", 1.0))
    }
    for (d <- 1 to 12; _ <- 1 to (if (d <= 8) 10 else 7)) {
      id += 1; rows += ((id, java.sql.Timestamp.valueOf(day(d)), 1L, "y", 1.0))
    }
    for (d <- 1 to 6; _ <- 1 to 5) {
      id += 1; rows += ((id, java.sql.Timestamp.valueOf(day(d)), 1L, "z", 1.0))
    }
    val d = java.nio.file.Files.createTempDirectory("graft-cusum").toString
    rows.result().toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.cusum(spark, d).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) ->
        (r.getAs[Long]("s_pos"), r.getAs[Long]("s_neg"),
          r.getAs[Boolean]("alarm_up"), r.getAs[Boolean]("alarm_down"))).toMap
    assert(out.size == 30)
    assert(out(("x", "2026-07-08")) == (0L, 0L, false, false))
    assert(out(("x", "2026-07-09")) == (2L, 0L, false, false))
    assert(out(("x", "2026-07-10")) == (4L, 0L, false, false)) // == h, not >
    assert(out(("x", "2026-07-11")) == (6L, 0L, true, false))  // alarm + reset
    assert(out(("x", "2026-07-12")) == (2L, 0L, false, false)) // proves reset
    assert(out(("y", "2026-07-11")) == (0L, 6L, false, true))
    assert(out(("y", "2026-07-12")) == (0L, 2L, false, false))
    assert((1 to 6).forall(n => out(("z", f"2026-07-$n%02d")) == (0L, 0L, false, false)))
  }

  test("wowChange: calendar-aligned day-7 compare; gap days report null") {
    import SparkSuite.spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2026-08-$s 10:00:00")
    val rows = Seq(
      (1L, t("01"), 1L, "x", 1.0), (2L, t("01"), 2L, "x", 1.0),
      (3L, t("08"), 1L, "x", 1.0), (4L, t("08"), 2L, "x", 1.0),
      (5L, t("08"), 3L, "x", 1.0),
      (6L, t("09"), 1L, "x", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-wow").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.wowChange(spark, d).collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("n"), Option(r.getAs[java.lang.Long]("prev_n")),
          Option(r.getAs[java.lang.Double]("wow")))).toMap
    assert(out.size == 3)
    assert(out("2026-08-01") == (2L, None, None)) // no prior week
    assert(out("2026-08-08") == (3L, Some(2L), Some(0.5)))
    assert(out("2026-08-09") == (1L, None, None)) // 08-02 has no data
  }

  test("l28: per-user trailing-28-day active-day histogram at the anchor") {
    import SparkSuite.spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s"2026-$s 10:00:00")
    val rows = Seq(
      (1L, t("08-30"), 1L, "x", 1.0), (2L, t("08-29"), 1L, "x", 1.0),
      (3L, t("08-28"), 1L, "x", 1.0), // user 1: 3 active days in window
      (4L, t("08-30"), 2L, "x", 1.0), // user 2: 1 in-window day...
      (5L, t("07-01"), 2L, "x", 1.0), // ...plus one outside, not counted
      (6L, t("07-01"), 4L, "x", 1.0)) // user 4: only outside -> absent
    val d = java.nio.file.Files.createTempDirectory("graft-l28").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.l28(spark, d).collect()
      .map(r => r.getAs[Long]("days_active") -> r.getAs[Long]("n_users")).toMap
    assert(out == Map(3L -> 1L, 1L -> 1L))
  }

  test("madAlert: rank med/MAD fence flags only the outlier; MAD=0 flags none") {
    import SparkSuite.spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val xs = Seq(10.0, 10.0, 10.0, 11.0, 11.0, 12.0, 12.0, 13.0, 100.0)
    val rows = xs.zipWithIndex.map { case (v, i) =>
      (i.toLong, t("2026-08-01 10:00:00"), 1L, "x", v) } ++
      Seq((100L, t("2026-08-01 10:00:00"), 1L, "y", 5.0),
        (101L, t("2026-08-01 10:00:00"), 1L, "y", 5.0),
        (102L, t("2026-08-01 10:00:00"), 1L, "y", 5.0))
    val d = java.nio.file.Files.createTempDirectory("graft-mad").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.madAlert(spark, d).collect()
    // x: n=9, med = rank-5 of sorted = 11; absdevs sorted rank-5 = 1 -> MAD=1;
    // fence 3*1 flags only the 100 (absdev 89). y: constant, MAD=0, 0>0 false.
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("event_type") == "x" && r.getAs[Double]("value") == 100.0)
    assert(r.getAs[Double]("med") == 11.0 && r.getAs[Double]("mad") == 1.0)
  }

  test("bursts: hysteresis opens hot, rides middles, closes cold; gaps split") {
    import SparkSuite.spark.implicits._
    val H = 3600000L
    // type x: 19 windows (w15 missing). Order stats: hi = rank ceil(.95*19)
    // = 19 -> 10; lo = rank ceil(.75*19) = 15 -> 2. Hot >= 10, cold < 2.
    val xWins = Seq(0 -> 1, 1 -> 1, 2 -> 1, 3 -> 1, 4 -> 1,
      5 -> 2, 6 -> 2, 7 -> 2, 8 -> 2, 9 -> 2,
      10 -> 10, 11 -> 4, 12 -> 1, 13 -> 1, 14 -> 10,
      16 -> 4, 17 -> 2, 18 -> 2, 19 -> 2)
    // type y: constant rate -> hi = lo = 3, every window hot, ONE episode
    val yWins = (0 to 19).map(_ -> 3)
    var id = 0L
    val rows = (xWins.map(("x", _)) ++ yWins.map(("y", _))).flatMap {
      case (tpe, (w, c)) => (0 until c).map { i =>
        id += 1
        (id, new java.sql.Timestamp(w * H + i * 1000L), 1L, tpe, 1.0)
      }
    }
    val d = java.nio.file.Files.createTempDirectory("graft-burst").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.bursts(spark, d).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("burst_id")) ->
        (r.getAs[Long]("start_ms"), r.getAs[Long]("end_ms"),
          r.getAs[Long]("n_windows"), r.getAs[Long]("peak"),
          r.getAs[Long]("total"))).toMap
    // x: hot w10 rides the middle w11, closes at cold w12 -> [w10, w12)
    assert(out(("x", 1L)) == (10 * H, 12 * H, 2L, 10L, 14L))
    // x: hot w14, the post-gap middle tail (w16-19, no hot) is DROPPED
    assert(out(("x", 2L)) == (14 * H, 15 * H, 1L, 10L, 10L))
    // y: degenerate flat series -> hi = lo, one wall-to-wall episode
    assert(out(("y", 1L)) == (0L, 20 * H, 20L, 3L, 60L))
    assert(out.size == 3)
  }

  test("userLl: the user replaying a rare transition scores highest; totals reconcile with the census") {
    import SparkSuite.spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-08-10 10:$m%02d:00")
    // users 1-3 walk the dominant A->B edge; user 9 walks the rare A->C.
    // All transitions are within one session (minutes apart << 30-min gap)
    var id = 0L
    def walk(u: Long, types: Seq[String]) = types.zipWithIndex.map { case (ty, i) =>
      id += 1; (id, t(i), u, ty, 1.0) }
    val rows = walk(1L, Seq("A", "B", "A", "B")) ++ walk(2L, Seq("A", "B")) ++
      walk(3L, Seq("A", "B")) ++ walk(9L, Seq("A", "C"))
    val d = java.nio.file.Files.createTempDirectory("graft-userll").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.userLl(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_transitions"), r.getAs[Double]("nll")))).toMap
    // census: A->B x5 (u1 twice + its B->A bridge... count exactly below),
    // reconcile totals first: every user's transition count sums to the
    // corpus pair count (u1: 3, u2: 1, u3: 1, u9: 1)
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L && out(9L)._1 == 1L)
    // the rare-edge user is the clear anomaly; the common-edge users tie
    assert(out(9L)._2 == out.values.map(_._2).max,
      s"rare A->C must score highest: $out")
    assert(out(2L)._2 == out(3L)._2, s"identical walks must tie: $out")
    assert(out(9L)._2 > out(2L)._2)
    // hand values for a single A->B / A->C: census c(A,B) = 4 (u1 twice,
    // u2, u3), c(B,A) = 1, c(A,C) = 1 -> n_from(A) = 5; alphabet V = 3
    // P(B|A) = (4+1)/(5+3); P(C|A) = (1+1)/(5+3)
    def q(x: Double) = math.round(-math.log(x) * 1e9) / 1e9 // DECIMAL(18,9)
    def r6(x: Double) = math.round(x * 1e6) / 1e6.toDouble
    assert(out(2L)._2 == r6(q(5.0 / 8.0)))
    assert(out(9L)._2 == r6(q(2.0 / 8.0)))
  }

  test("abSrm: matches an independent md5+chi-square reference; extreme intended split trips the flag") {
    // independent reference on the sf corpus: same derandomized assignment
    // recomputed with java MessageDigest, chi-square in plain Scala
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().collect().map(_.getLong(0))
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val nA = users.count(u => md5hex(s"exp1:$u").substring(0, 2) < "80")
    val nB = users.length - nA
    val n = users.length.toDouble
    def chi2(expA: Double): Double = {
      val eA = n * expA; val eB = n * (1 - expA)
      (nA - eA) * (nA - eA) / eA + (nB - eB) * (nB - eB) / eB
    }
    val out = EventOps.abSrm(spark, sf).collect().head
    assert(out.getAs[Long]("n_a") == nA && out.getAs[Long]("n_b") == nB)
    assert(math.abs(out.getAs[Double]("chi2") - chi2(0.5)) < 1e-9)
    // a healthy 50/50 hash split must NOT flag on this corpus
    assert(!out.getAs[Boolean]("srm"), s"false SRM: $out")
    // demanding a 95/5 split against a hash that delivers ~50/50 must flag
    val skewed = EventOps.abSrm(spark, sf, intendedA = 0.95).collect().head
    assert(skewed.getAs[Boolean]("srm"))
    assert(math.abs(skewed.getAs[Double]("chi2") - chi2(0.95)) < 1e-9)
  }

  test("attributionMarkov: hand-solved 2-channel chain; removal effects and shares exact") {
    import SparkSuite.spark.implicits._
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2026-08-10 10:$m%02d:00")
    // journeys: u1 start->A->conv, u2 start->A->B->conv, u3 start->B->(null)
    // census: start->A 2, A->B 1, A->conv 1, start->B 1, B->conv 1, B->null 1
    // P_conv(B) = 1/2; P_conv(A) = 1/2 + 1/2 * 1/2 = 3/4
    // base = 2/3 * 3/4 + 1/3 * 1/2 = 2/3
    // remove A: base' = 1/3 * 1/2 = 1/6  -> RE_A = (2/3 - 1/6)/(2/3) = 3/4
    // remove B: base' = 2/3 * 1/2 = 1/3  -> RE_B = (2/3 - 1/3)/(2/3) = 1/2
    // shares: A = (3/4)/(5/4) = 0.6, B = 0.4
    val rows = Seq(
      (1L, t(0), 1L, "click", 1.0), (2L, t(1), 1L, "purchase", 9.0),
      (3L, t(0), 2L, "click", 1.0), (4L, t(1), 2L, "view", 1.0),
      (5L, t(2), 2L, "purchase", 9.0),
      (6L, t(0), 3L, "view", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-markov-attr").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.attributionMarkov(spark, d).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Double]("removal_effect"), r.getAs[Double]("share")))).toMap
    // A = click, B = view
    assert(math.abs(out("click")._1 - 0.75) < 1e-12, s"RE_A: $out")
    assert(math.abs(out("view")._1 - 0.5) < 1e-12, s"RE_B: $out")
    assert(math.abs(out("click")._2 - 0.6) < 1e-12 &&
      math.abs(out("view")._2 - 0.4) < 1e-12, s"shares: $out")
    // a channel on EVERY converting path has removal effect 1
    val rows2 = Seq(
      (1L, t(0), 1L, "click", 1.0), (2L, t(1), 1L, "purchase", 9.0),
      (3L, t(0), 2L, "click", 1.0), (4L, t(1), 2L, "purchase", 9.0),
      (5L, t(0), 3L, "view", 1.0)) // view journey never converts
    val d2 = java.nio.file.Files.createTempDirectory("graft-markov-attr2").toString
    rows2.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d2/events.parquet")
    val out2 = EventOps.attributionMarkov(spark, d2).collect()
      .map(r => r.getAs[String]("channel") -> r.getAs[Double]("removal_effect")).toMap
    assert(math.abs(out2("click") - 1.0) < 1e-12 && math.abs(out2("view")) < 1e-12, s"$out2")
    // real corpus: shares form a distribution, deterministic re-run
    val real = EventOps.attributionMarkov(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(real.nonEmpty && math.abs(real.map(_._3).sum - 1.0) < 1e-9)
    val again = EventOps.attributionMarkov(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(real.toSet == again.toSet)
  }

  test("concurrency: sweep-line counts overlapping sessions exactly at change points") {
    import SparkSuite.spark.implicits._
    def t(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2026-08-10 $h%02d:$m%02d:00")
    // u1 session 10:00-10:10, u2 10:05-10:20, u3 the single event 10:05
    val rows = Seq(
      (1L, t(10, 0), 1L, "x", 1.0), (2L, t(10, 10), 1L, "x", 1.0),
      (3L, t(10, 5), 2L, "x", 1.0), (4L, t(10, 20), 2L, "x", 1.0),
      (5L, t(10, 5), 3L, "x", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-conc").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val base = java.sql.Timestamp.valueOf("2026-08-10 10:00:00").getTime
    val out = EventOps.concurrency(spark, d).collect()
      .map(r => ((r.getAs[Long]("minute_ms") - base) / 60000L,
        r.getAs[Long]("delta"), r.getAs[Long]("n_active"))).sortBy(_._1)
    // +1@0 -> 1; +2@5 -> 3; -1@6 (u3 end+1) -> 2; -1@11 -> 1; -1@21 -> 0
    assert(out.toSeq == Seq((0L, 1L, 1L), (5L, 2L, 3L), (6L, -1L, 2L),
      (11L, -1L, 1L), (21L, -1L, 0L)), s"got ${out.toSeq}")
    // invariant on the real corpus: the curve returns to zero at the end
    val real = EventOps.concurrency(spark, sf).collect()
      .map(r => (r.getAs[Long]("minute_ms"), r.getAs[Long]("n_active")))
      .sortBy(_._1)
    assert(real.nonEmpty && real.last._2 == 0L, "open sessions never closed")
    assert(real.map(_._2).forall(_ >= 0L))
  }

  // ---- A85 CUPED -----------------------------------------------------------

  private def cupedFixture(rows: Seq[(Long, Long, Long, Double)]): String = {
    // (event_id, ts_ms, user_id, value)
    import SparkSuite.spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-cuped").toString
    rows.map { case (id, ms, u, v) =>
      (id, new java.sql.Timestamp(ms), u, "click", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("cuped: a perfectly predictive covariate gives theta 1, full variance kill, zero residual lift") {
    val B = 1700000000000L
    // user u: pre value = u, post value = u (Y = X exactly)
    val rows = (1L to 40L).flatMap(u => Seq(
      (u * 10 + 1, B + u, u, u.toDouble),
      (u * 10 + 2, B + 1000000L + u, u, u.toDouble)))
    val out = EventOps.cuped(spark, cupedFixture(rows)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_a") + r.getAs[Long]("n_b") == 40L)
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    assert(r.getAs[Double]("theta") == 1.0)
    assert(r.getAs[Double]("var_reduction") == 1.0)
    // the adjusted lift removes exactly the pre-existing imbalance
    assert(math.abs(r.getAs[Double]("lift_cuped")) < 1e-9,
      s"lift_cuped ${r.getAs[Double]("lift_cuped")}")
    // raw lift equals the variants' pre-period imbalance (Y = X)
    assert(r.getAs[Double]("lift_raw") != 0.0)
  }

  test("cuped: every statistic matches an independent from-scratch reference") {
    val B = 1700000000000L
    // mixed shape: two pre events for even users, post-only user 41,
    // pre-only user 42, fractional values
    val rows = (1L to 40L).flatMap { u =>
      val pre = Seq((u * 100 + 1, B + u, u, (u * 37 % 11) + 0.25)) ++
        (if (u % 2 == 0) Seq((u * 100 + 2, B + 500 + u, u, u * 0.5)) else Nil)
      val post = Seq((u * 100 + 3, B + 1000000L + u, u,
        ((u * 37 % 11) + 0.25) * 1.5 + (u * 13 % 7) * 0.125))
      pre ++ post
    } ++ Seq((4103L, B + 1000000L + 41, 41L, 3.375),
      (4201L, B + 42, 42L, 2.5))
    val d = cupedFixture(rows)
    val got = EventOps.cuped(spark, d).collect().head

    // ---- reference: same definitions, plain Scala -------------------------
    def q(v: Double, s: Int) =
      BigDecimal(v).setScale(s, BigDecimal.RoundingMode.HALF_UP)
    val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
    val mid = math.floor((lo + hi).toDouble / 2.0).toLong
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val users = rows.groupBy(_._3).map { case (u, es) =>
      val x = es.filter(_._2 < mid).map(e => q(e._4, 9)).sum
      val y = es.filter(_._2 >= mid).map(e => q(e._4, 9)).sum
      (u, x, y, if (md5hex(s"exp1:$u").substring(0, 2) < "80") "A" else "B")
    }.toSeq
    val n = users.size.toDouble
    val (as, bs) = users.partition(_._4 == "A")
    val sx = users.map(_._2).sum.toDouble; val sy = users.map(_._3).sum.toDouble
    val sxx = users.map(t => q(t._2.toDouble * t._2.toDouble, 6)).sum.toDouble
    val sxy = users.map(t => q(t._2.toDouble * t._3.toDouble, 6)).sum.toDouble
    val syy = users.map(t => q(t._3.toDouble * t._3.toDouble, 6)).sum.toDouble
    val meanX = sx / n; val meanY = sy / n
    val varX = sxx / n - meanX * meanX; val varY = syy / n - meanY * meanY
    val cov = sxy / n - meanX * meanY
    val theta = cov / varX
    val mxa = as.map(_._2).sum.toDouble / as.size.toDouble
    val mxb = bs.map(_._2).sum.toDouble / bs.size.toDouble
    val mya = as.map(_._3).sum.toDouble / as.size.toDouble
    val myb = bs.map(_._3).sum.toDouble / bs.size.toDouble
    def r6(v: Double) = q(v, 6).toDouble
    assert(got.getAs[Long]("n_a") == as.size.toLong)
    assert(got.getAs[Long]("n_b") == bs.size.toLong)
    assert(got.getAs[Double]("mean_y_a") == r6(mya))
    assert(got.getAs[Double]("mean_y_b") == r6(myb))
    assert(got.getAs[Double]("lift_raw") == r6(myb - mya))
    assert(got.getAs[Double]("theta") == r6(theta),
      s"theta ${got.getAs[Double]("theta")} vs ${r6(theta)}")
    assert(got.getAs[Double]("lift_cuped") ==
      r6((myb - theta * (mxb - meanX)) - (mya - theta * (mxa - meanX))))
    assert(got.getAs[Double]("var_reduction") == r6(cov * cov / (varX * varY)))
    // CUPED must not cost precision in the headline: variance reduction > 0
    assert(got.getAs[Double]("var_reduction") > 0.0)
  }

  // ---- A87 power / A86 changepoints ----------------------------------------

  test("power: MDE and n-per-arm match an independent closed-form reference") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    val rows = (1L to 8L).flatMap(u => (1L to u).map(i =>
      (u * 100 + i, new java.sql.Timestamp(B + u * 1000 + i), u,
        "purchase", 1.0)))
    val d = java.nio.file.Files.createTempDirectory("graft-power").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.power(spark, d, minPurchases = 5).collect().head
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val variants = (1L to 8L).map(u =>
      if (md5hex(s"exp1:$u").substring(0, 2) < "80") "A" else "B")
    val nA = variants.count(_ == "A"); val nB = variants.count(_ == "B")
    val nConv = 4 // users 5..8 convert
    val p = nConv.toDouble / (nA + nB).toDouble
    val zsum = 1.959963984540054 + 0.8416212335729143
    val mde = zsum * math.sqrt(p * (1.0 - p) * (1.0 / nA + 1.0 / nB))
    def r6d(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getAs[Long]("n_a") == nA.toLong)
    assert(got.getAs[Long]("n_b") == nB.toLong)
    assert(got.getAs[Long]("n_conv") == nConv.toLong)
    assert(got.getAs[Double]("p") == r6d(p))
    assert(got.getAs[Double]("mde_abs") == r6d(mde), s"got $got")
    assert(got.getAs[Double]("mde_rel") == r6d(mde / p))
    assert(got.getAs[Long]("n_per_arm") ==
      math.ceil(2.0 * zsum * zsum * p * (1.0 - p) / ((0.05 * p) * (0.05 * p))).toLong)
  }

  // ---- A88 mSPRT ------------------------------------------------------------

  test("msprt: planted staggered enrollment matches an independent reference day for day; the decision latches") {
    import SparkSuite.spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // users enroll across days 0..3 (u % 4); B-variant users convert
    // (14 purchases), A-variant users don't (1 purchase) — a strong
    // planted effect the sequential readout must eventually reject on
    val users = (1L to 40L)
    val rows = users.flatMap { u =>
      val day = (u % 4).toLong
      val base = day * 86400000L + u
      val isB = md5hex(s"exp1:$u").substring(0, 2) >= "80"
      val np = if (isB) 14 else 1
      (1 to np).map(i =>
        (u * 100 + i, new java.sql.Timestamp(base + i), u, "purchase", 1.0))
    }
    val d = java.nio.file.Files.createTempDirectory("graft-msprt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    // τ² = 0.01: wide enough that the planted δ = 1 effect rejects within
    // the 40-user horizon (the 1e-4 default is sized for corpus-scale n)
    val got = EventOps.msprt(spark, d, tau2 = 0.01).collect()
      .sortBy(_.getAs[Long]("day_idx"))
    assert(got.length == 4) // one readout per enrollment day

    // ---- reference: same definitions, plain Scala -----------------------
    def q9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(b: BigDecimal) = b.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val perUser = users.map { u =>
      val isB = md5hex(s"exp1:$u").substring(0, 2) >= "80"
      ((u % 4).toLong, isB, if (isB) 1 else 0) // conv = np >= 14
    }
    val tau2 = 0.01
    var maxLn = BigDecimal(Long.MinValue)
    (0L to 3L).zip(got).foreach { case (day, row) =>
      val in = perUser.filter(_._1 <= day)
      val nA = in.count(!_._2).toLong; val nB = in.count(_._2).toLong
      val cA = in.filter(!_._2).map(_._3).sum.toLong
      val cB = in.filter(_._2).map(_._3).sum.toLong
      val p = (cA + cB).toDouble / (nA + nB).toDouble
      val delta = cB.toDouble / nB.toDouble - cA.toDouble / nA.toDouble
      val v = p * (1.0 - p) * (1.0 / nA.toDouble + 1.0 / nB.toDouble)
      val lnL = q9(0.5 * (math.log(v) - math.log(v + tau2)) +
        delta * delta * tau2 / (2.0 * v * (v + tau2)))
      maxLn = maxLn.max(lnL)
      assert(row.getAs[Long]("day_idx") == day)
      assert(row.getAs[Long]("n_a") == nA && row.getAs[Long]("n_b") == nB)
      assert(row.getAs[Long]("conv_a") == cA && row.getAs[Long]("conv_b") == cB)
      assert(row.getAs[Double]("ln_lambda") == r6(lnL), s"day $day: $row")
      assert(row.getAs[Double]("max_ln_lambda") == r6(maxLn))
      assert(row.getAs[Boolean]("rejected") ==
        (maxLn.toDouble > math.log(20.0)))
    }
    // the planted effect is strong: the final readout rejects, and the
    // decision latches (never flips back once true)
    assert(got.last.getAs[Boolean]("rejected"))
    val flags = got.map(_.getAs[Boolean]("rejected"))
    assert(flags.zip(flags.tail).forall { case (a, b) => !a || b })
  }

  test("msprt: a degenerate cell (everyone converts) reads ln_lambda 0, never rejects") {
    import SparkSuite.spark.implicits._
    val rows = (1L to 20L).flatMap(u => (1 to 14).map(i =>
      (u * 100 + i, new java.sql.Timestamp(86400000L * (u % 2) + u * 1000 + i),
        u, "purchase", 1.0)))
    val d = java.nio.file.Files.createTempDirectory("graft-msprt0").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val got = EventOps.msprt(spark, d).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Double]("ln_lambda") == 0.0) // p̂ = 1 ⇒ V = 0: no evidence
      assert(!r.getAs[Boolean]("rejected"))
    }
  }

  // ---- A90 Holt–Winters seasonal forecast -----------------------------------

  test("hw forecast: planted trended weekly series matches an independent reference bit-for-bit; short types drop") {
    import SparkSuite.spark.implicits._
    // type "a": 21 days, y = 50 + 3d + season(d mod 7), one interior day
    // ZEROED (day 17 has no events — must be filled as a real zero);
    // type "b": 5 days only — under the two-week init, dropped
    val season = Array(4, -2, 0, 1, -3, 2, -2)
    def yOf(d: Int): Int = if (d == 17) 0 else 50 + 3 * d + season(d % 7)
    val rows = (0 until 21).flatMap { d =>
      (1 to yOf(d)).map(i =>
        (d * 100000L + i, new java.sql.Timestamp(d * 86400000L + i), i.toLong,
          "a", 1.0))
    } ++ (0 until 5).map(d =>
      (9000000L + d, new java.sql.Timestamp(d * 86400000L + 50), 1L, "b", 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-hw").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.hwForecast(spark, dir).collect()
    assert(got.map(_.getAs[String]("event_type")).toSet == Set("a"))
    assert(got.length == 7)

    // ---- reference: the same recurrence, plain Scala --------------------
    val y = (0 until 21).map(d => yOf(d).toDouble).toArray
    val m1 = y.slice(0, 7).foldLeft(0.0)(_ + _) / 7.0
    val m2 = y.slice(7, 14).foldLeft(0.0)(_ + _) / 7.0
    var l = m1; var b = (m2 - m1) / 7.0
    var s = y.slice(0, 7).map(_ - m1)
    for (t <- 14 until y.length) {
      val yt = y(t)
      val lnew = 0.5 * (yt - s(0)) + 0.5 * (l + b)
      val bnew = 0.5 * ((0.5 * (yt - s(0)) + 0.5 * (l + b)) - l) + 0.5 * b
      val snew = 0.5 * (yt - (0.5 * (yt - s(0)) + 0.5 * (l + b))) + 0.5 * s(0)
      s = s.drop(1) :+ snew
      l = lnew; b = bnew
    }
    got.sortBy(_.getAs[Long]("h")).zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_days") == 21L)
      assert(r.getAs[Double]("level") == l, s"level ${r.getAs[Double]("level")} vs $l")
      assert(r.getAs[Double]("trend") == b)
      val expect = l + (i + 1).toDouble * b + s(i)
      assert(r.getAs[Double]("forecast") == expect,
        s"h=${i + 1}: ${r.getAs[Double]("forecast")} vs $expect")
    }
    // the planted up-trend survives smoothing (the zeroed day whipsaws the
    // β=0.5 trend hard near the series end, so only the sign is stable)
    assert(b > 0.0, s"trend $b")
  }

  test("seasonal decompose: exact linear-plus-periodic series recovers trend and seasonal EXACTLY with zero residual") {
    import SparkSuite.spark.implicits._
    // y_t = 100 + 2t + s[dow]: the centered 7-MA of a linear series is the
    // series, and a full period of s sums to 0 — so trend, seasonal, and a
    // zero residual are all recoverable EXACTLY (every step's exact value
    // is representable, so any IEEE deviation is a bug, not noise)
    val s = Array(7.0, -7.0, 3.0, -3.0, 5.0, -5.0, 0.0)
    val lo = 3L // non-zero origin exercises the day_idx/dow mapping
    val ys = (0 until 21).map(t => 100.0 + 2.0 * t + s(((lo + t) % 7).toInt))
    val dense = Seq(("a", lo, ys), ("short", lo, ys.take(13)))
      .toDF("event_type", "lo", "ys")
    val got = EventOps.seasonalFromDense(dense).collect()
    // the 13-day type drops; edges (3 each side) drop from the 21-day type
    assert(got.map(_.getAs[String]("event_type")).toSet == Set("a"))
    assert(got.length == 21 - 6)
    got.foreach { r =>
      val d = r.getAs[Long]("day_idx"); val t = (d - lo).toInt
      assert(t >= 3 && t <= 17)
      assert(r.getAs[Double]("y") == ys(t))
      assert(r.getAs[Double]("trend") == 100.0 + 2.0 * t, s"trend at day $d")
      assert(r.getAs[Double]("seasonal") == s((d % 7).toInt), s"seasonal at day $d")
      assert(r.getAs[Double]("resid") == 0.0, s"resid at day $d")
    }
  }

  test("seasonal decompose on the corpus: row count, additive identity, and zero-sum seasonal indices") {
    val got = EventOps.seasonalDecompose(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r => // resid's defining expression, in its IEEE order
      assert(r.getAs[Double]("resid") == r.getAs[Double]("y") -
        r.getAs[Double]("trend") - r.getAs[Double]("seasonal"))
    }
    // per type: interior rows = horizon - 6; ≤ 7 distinct seasonal values
    // summing to ~0 (the zero-sum normalization, up to the 1e-9 quantum)
    got.groupBy(_.getAs[String]("event_type")).foreach { case (t, rows) =>
      val days = rows.map(_.getAs[Long]("day_idx"))
      assert(days.max - days.min + 1 == rows.length.toLong, s"$t gaps")
      val seas = rows.map(r =>
        (r.getAs[Long]("day_idx") % 7, r.getAs[Double]("seasonal"))).distinct
      assert(seas.length <= 7, s"$t seasonal not a pure DOW function")
      assert(math.abs(seas.map(_._2).sum) < 1e-6, s"$t indices don't sum to 0")
    }
  }

  /** Shared planted-series events dir: type "a" = trend + weekly season
    * over 21 days; type "b" = pure weekly season over 28 days. */
  private lazy val plantedSeriesDir: String = {
    import SparkSuite.spark.implicits._
    val s = Array(4, -2, 0, 1, -3, 2, -2) // sums to 0
    def rowsOf(tpe: String, days: Int, yOf: Int => Int) =
      (0 until days).flatMap { d =>
        (1 to yOf(d)).map(i => (d * 100000L + i + tpe.hashCode.toLong.abs,
          new java.sql.Timestamp(d * 86400000L + i), i.toLong, tpe, 1.0))
      }
    val rows = rowsOf("a", 21, d => 100 + 2 * d + s(d % 7)) ++
      rowsOf("b", 28, d => 100 + s(d % 7))
    val dir = java.nio.file.Files.createTempDirectory("graft-series").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    dir
  }

  test("seasonal strength: exact linear-plus-periodic counts read 1.0; a flat trend reads NULL trend strength") {
    val got = EventOps.seasonalStrength(spark, plantedSeriesDir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val a = got("a") // resid ≡ 0, trend and season both vary → strength 1
    assert(a.getAs[Long]("n_interior") == 15L)
    assert(a.getAs[Double]("trend_strength") == 1.0)
    assert(a.getAs[Double]("seasonal_strength") == 1.0)
    val b = got("b") // flat trend: var(T+R) = 0 → NULL; season still 1
    assert(b.getAs[Long]("n_interior") == 22L)
    assert(b.isNullAt(b.fieldIndex("trend_strength")))
    assert(b.getAs[Double]("seasonal_strength") == 1.0)
  }

  test("seasonal anomaly: flag set equals an independent median/MAD reference; a planted spike flags, clean series don't") {
    import SparkSuite.spark.implicits._
    val s = Array(4, -2, 0, 1, -3, 2, -2)
    // "clean": exact periodic (resid ≡ 0 → MAD 0 → nothing flags);
    // "spiky": same plus a +40 burst on day 10 and small ±1 noise
    val noise = Array(1, 0, -1, 0, 1, -1, 0, 1, 0, -1, 0, 1, -1, 0,
      1, 0, -1, 1, 0, -1, 0, 1, -1, 0, 1, 0, -1, 0)
    def yOf(tpe: String)(d: Int): Int = tpe match {
      case "clean" => 100 + s(d % 7)
      case _ => 100 + s(d % 7) + noise(d) + (if (d == 10) 40 else 0)
    }
    val rows = for (tpe <- Seq("clean", "spiky"); d <- 0 until 28;
                    i <- 1 to yOf(tpe)(d)) yield
      (tpe.hashCode.toLong.abs * 1000000L + d * 10000L + i,
        new java.sql.Timestamp(d * 86400000L + i), i.toLong, tpe, 1.0)
    val dir = java.nio.file.Files.createTempDirectory("graft-sanom").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.seasonalAnomalies(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_idx"))).toSet
    // independent reference over the (gate-green) decomposition output
    val comp = EventOps.seasonalDecompose(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day_idx"),
        r.getAs[Double]("resid")))
    def rankMed(xs: Seq[(Double, Long)]): Double = {
      val sorted = xs.sortBy(identity)
      sorted((math.ceil(sorted.size * 0.5) - 1).toInt)._1
    }
    val expect = comp.groupBy(_._1).toSeq.flatMap { case (t, rs) =>
      val med = rankMed(rs.map(r => (r._3, r._2)).toSeq)
      val mad = rankMed(rs.map(r => (math.abs(r._3 - med), r._2)).toSeq)
      rs.filter(r => math.abs(r._3 - med) > 3.0 * mad).map(r => (t, r._2)).toSeq
    }.toSet
    assert(got == expect, s"got $got vs $expect")
    assert(!got.exists(_._1 == "clean"))
    assert(got.contains(("spiky", 10L)), s"spike day missing: $got")
  }

  test("acf: bit-equal to an exact BigInt reference on planted series; the weekly period peaks at lag 7") {
    val s = Array(4, -2, 0, 1, -3, 2, -2)
    def ref(days: Int, yOf: Int => Int): Map[Long, Double] = {
      val y = (0 until days).map(d => BigInt(yOf(d)))
      val n = BigInt(days); val sum = y.sum
      val dv = y.map(v => n * v - sum)
      val den = dv.map(d => d * d).sum
      (1 to 14).map { k =>
        val num = (0 until days - k).map(t => dv(t) * dv(t + k)).sum
        k.toLong -> (BigDecimal(num).toDouble / BigDecimal(den).toDouble)
      }.toMap
    }
    val exp = Map(
      "a" -> ref(21, d => 100 + 2 * d + s(d % 7)),
      "b" -> ref(28, d => 100 + s(d % 7)))
    val got = EventOps.acf(spark, plantedSeriesDir).collect()
    assert(got.length == 28) // 2 types × 14 lags
    got.foreach { r =>
      val t = r.getAs[String]("event_type"); val k = r.getAs[Long]("lag")
      assert(r.getAs[Double]("acf") == exp(t)(k), s"$t lag $k")
    }
    // pure period-7 series: lag-7 autocorrelation dominates lag 1
    assert(exp("b")(7L) > 0.5 && exp("b")(7L) > exp("b")(1L) + 0.3)
  }

  test("pacf: matches an independent plain-double Durbin-Levinson reference; lag 1 equals acf(1); magnitudes bounded") {
    val s = Array(4, -2, 0, 1, -3, 2, -2)
    // reference: exact-rational ACF then the textbook recursion in doubles
    // (the operator quantizes each step at 1e-9; tolerance covers that)
    def refPacf(days: Int, yOf: Int => Int): Array[Double] = {
      val y = (0 until days).map(d => BigInt(yOf(d)))
      val n = BigInt(days); val sum = y.sum
      val dv = y.map(v => n * v - sum)
      val den = dv.map(d => d * d).sum
      val r = (1 to 7).map { k =>
        BigDecimal((0 until days - k).map(t => dv(t) * dv(t + k)).sum)
          .toDouble / BigDecimal(den).toDouble
      }.toArray
      val pacf = Array.fill(7)(0.0)
      var phi = Array(r(0)); pacf(0) = r(0); var v = 1.0 - r(0) * r(0)
      for (k <- 2 to 7) {
        val alpha = r(k - 1) -
          (1 until k).map(j => phi(j - 1) * r(k - j - 1)).sum
        val pkk = alpha / v
        phi = Array.tabulate(k - 1)(j =>
          phi(j) - pkk * phi(k - 2 - j)) :+ pkk
        v = v * (1.0 - pkk * pkk)
        pacf(k - 1) = pkk
      }
      pacf
    }
    val exp = Map(
      "a" -> refPacf(21, d => 100 + 2 * d + s(d % 7)),
      "b" -> refPacf(28, d => 100 + s(d % 7)))
    val got = EventOps.pacf(spark, plantedSeriesDir).collect()
    assert(got.length == 14) // 2 types × 7 lags
    got.foreach { r =>
      val t = r.getAs[String]("event_type"); val k = r.getAs[Long]("lag").toInt
      assert(math.abs(r.getAs[Double]("pacf") - exp(t)(k - 1)) < 1e-6,
        s"$t lag $k: ${r.getAs[Double]("pacf")} vs ${exp(t)(k - 1)}")
    }
    // pacf(1) IS acf(1) (quantized) by definition
    val acf1 = EventOps.acf(spark, plantedSeriesDir).collect()
      .filter(_.getAs[Long]("lag") == 1L)
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("acf")).toMap
    got.filter(_.getAs[Long]("lag") == 1L).foreach { r =>
      assert(math.abs(r.getAs[Double]("pacf") -
        acf1(r.getAs[String]("event_type"))) < 1e-9)
    }
    // partial correlations are correlations: bounded by 1 (quantization slack)
    got.foreach(r => assert(math.abs(r.getAs[Double]("pacf")) <= 1.0 + 1e-6))
  }

  test("acf bands: Bartlett band is 1.96/sqrt(n); the flag is the exact band compare on the acf values") {
    val got = EventOps.acfBands(spark, plantedSeriesDir).collect()
    assert(got.length == 28)
    got.foreach { r =>
      val band = 1.96 / math.sqrt(r.getAs[Long]("n_days").toDouble)
      assert(r.getAs[Double]("band") == band)
      assert(r.getAs[Boolean]("significant") ==
        (math.abs(r.getAs[Double]("acf")) > band))
    }
    // the planted pure period-7 series IS structured: some lag crosses
    assert(got.exists(_.getAs[Boolean]("significant")))
  }

  test("experiment segments: per-cohort cells and the Q/I2 fold match an independent reference") {
    import SparkSuite.spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val W = 604800000L
    // two cohorts (week 0 and week 1) with DIFFERENT planted effects:
    // cohort 0 B-heavy conversion, cohort 1 near-null — Q should read it
    val users = (1L to 80L)
    val rows = users.flatMap { u =>
      val week = if (u <= 40) 0L else 1L
      val isB = md5hex(s"exp1:$u").substring(0, 2) >= "80"
      val converts =
        if (week == 0L) (isB && u % 4 != 0) || (!isB && u % 4 == 0)
        else u % 2 == 0
      val base = week * W + u * 1000
      val np = if (converts) 14 else 1
      (1 to np).map(i =>
        (u * 100 + i, new java.sql.Timestamp(base + i), u, "purchase", 1.0))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-segq").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.experimentSegments(spark, dir).collect()
      .map(r => r.getAs[Long]("cohort_week") -> r).toMap
    assert(got.keySet == Set(0L, 1L))

    // reference: same cells, weights, one-pass Q, quantized DECIMAL(28,9)
    def q9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    case class Cell(nA: Long, cA: Long, nB: Long, cB: Long) {
      val ra = cA.toDouble / nA; val rb = cB.toDouble / nB
      val lift = rb - ra
      val vi = ra * (1.0 - ra) / nA + rb * (1.0 - rb) / nB
    }
    val cells = (0L to 1L).map { wk =>
      val in = users.filter(u => (if (u <= 40) 0L else 1L) == wk)
      val (bs, as_) = in.partition(u => md5hex(s"exp1:$u").substring(0, 2) >= "80")
      def conv(u: Long) =
        if (wk == 0L) (bs.contains(u) && u % 4 != 0) || (as_.contains(u) && u % 4 == 0)
        else u % 2 == 0
      wk -> Cell(as_.size, as_.count(conv), bs.size, bs.count(conv))
    }.toMap
    val contrib = cells.values.filter(_.vi > 0).toSeq
    val sw = contrib.map(c => q9(1.0 / c.vi)).sum
    val swl = contrib.map(c => q9((1.0 / c.vi) * c.lift)).sum
    val swll = contrib.map(c => q9((1.0 / c.vi) * c.lift * c.lift)).sum
    val pooled = swl.toDouble / sw.toDouble
    val qStat = swll.toDouble - swl.toDouble * swl.toDouble / sw.toDouble
    val k = contrib.size
    val i2 = math.max(0.0, (qStat - (k - 1).toDouble) / qStat)
    (0L to 1L).foreach { wk =>
      val r = got(wk); val c = cells(wk)
      assert(r.getAs[Long]("n_a") == c.nA && r.getAs[Long]("conv_a") == c.cA)
      assert(r.getAs[Long]("n_b") == c.nB && r.getAs[Long]("conv_b") == c.cB)
      assert(r.getAs[Double]("lift") == r6(c.lift))
      assert(r.getAs[Long]("k_segments") == k.toLong)
      assert(r.getAs[Double]("pooled_lift") == r6(pooled))
      assert(r.getAs[Double]("q_stat") == r6(qStat), s"$r vs $qStat")
      assert(r.getAs[Double]("i2") == r6(i2))
    }
    // the planted heterogeneity is real: Q well above k-1
    assert(qStat > k.toDouble)
  }

  test("retention fit: planted 1/d curve reads slope -1, r2 ~ 1, and the d30 projection") {
    import SparkSuite.spark.implicits._
    // 720 users on day 0; exactly 720/d of them return on day d (d = 1..6)
    val rows = (1L to 720L).map(u => (u, 0)) ++
      (1 to 6).flatMap(d => (1L to 720L / d).map(u => (u, d)))
    val ev = rows.zipWithIndex.map { case ((u, d), i) =>
      (i.toLong, new java.sql.Timestamp(d * 86400000L + u), u, "view", 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("graft-rfit").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val r = EventOps.retentionFit(spark, dir).collect().head
    assert(r.getAs[Long]("n_points") == 6L && r.getAs[Long]("n_users") == 720L)
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 1e-6, s"$r")
    assert(math.abs(r.getAs[Double]("intercept")) < 1e-6)
    assert(r.getAs[Double]("r2") > 0.999999)
    assert(math.abs(r.getAs[Double]("proj_d30") - 1.0 / 30.0) < 1e-4)
  }

  test("its: planted segmented series reads exact level and slope changes; short types drop") {
    import SparkSuite.spark.implicits._
    // horizon 20, intervention at index 10: pre y = 10 + 2t, post y = 50 + 5t'
    def yOf(i: Int): Int = if (i < 10) 10 + 2 * i else 50 + 5 * (i - 10)
    val rows = (0 until 20).flatMap(i => (1 to yOf(i)).map(k =>
      (i * 10000L + k, new java.sql.Timestamp(i * 86400000L + k), k.toLong,
        "a", 1.0))) ++
      (0 until 3).map(i => (90000L + i,
        new java.sql.Timestamp(i * 86400000L + 7), 1L, "short", 1.0))
    val d = java.nio.file.Files.createTempDirectory("graft-its").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.its(spark, d).collect()
    assert(out.map(_.getAs[String]("event_type")).toSeq == Seq("a"))
    val r = out.head
    assert(r.getAs[Long]("t0_idx") == 10L)
    assert(r.getAs[Long]("n_pre") == 10L && r.getAs[Long]("n_post") == 10L)
    // exact linear segments ⇒ exact OLS recovery
    assert(r.getAs[Double]("intercept_pre") == 10.0 &&
      r.getAs[Double]("slope_pre") == 2.0)
    assert(r.getAs[Double]("intercept_post") == 50.0 &&
      r.getAs[Double]("slope_post") == 5.0)
    // counterfactual at the intervention: 10 + 2*10 = 30 ⇒ jump of 20
    assert(r.getAs[Double]("level_change") == 20.0)
    assert(r.getAs[Double]("slope_change") == 3.0)
  }

  test("forecast backtest: per-model MAEs match an independent reference; constant series ties to naive; short types drop") {
    import SparkSuite.spark.implicits._
    val season = Array(4, -2, 0, 1, -3, 2, -2)
    def yA(d: Int): Int = 50 + 3 * d + season(d % 7) // seasonal + trend
    def yC(d: Int): Int = 20                          // constant: all exact
    val rows =
      (0 until 21).flatMap(d => (1 to yA(d)).map(i =>
        (d * 100000L + i, new java.sql.Timestamp(d * 86400000L + i), i.toLong,
          "a", 1.0))) ++
      (0 until 21).flatMap(d => (1 to yC(d)).map(i =>
        (900000L + d * 1000L + i, new java.sql.Timestamp(d * 86400000L + 50000 + i),
          i.toLong, "c", 1.0))) ++
      (0 until 5).map(d => (990000L + d,
        new java.sql.Timestamp(d * 86400000L + 70000), 1L, "short", 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-bt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.forecastBacktest(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    assert(got.keySet == Set("a", "c")) // 5-day type drops

    // ---- reference: same recurrences + quantized error sums -------------
    def q9(v: Double) = BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(v: Double) = BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def ref(y: Array[Double]): (Double, Double, Double) = {
      val n = y.length
      val eNaive = (1 until n).map(t => q9(math.abs(y(t - 1) - y(t)))).sum
      var l = y(0); var b = y(1) - y(0); var eH = BigDecimal(0)
      for (t <- 2 until n) {
        eH += q9(math.abs(l + b - y(t)))
        val ln = 0.5 * y(t) + 0.5 * (l + b)
        b = 0.5 * ((0.5 * y(t) + 0.5 * (l + b)) - l) + 0.5 * b; l = ln
      }
      val m1 = y.slice(0, 7).foldLeft(0.0)(_ + _) / 7.0
      val m2 = y.slice(7, 14).foldLeft(0.0)(_ + _) / 7.0
      var hl = m1; var hb = (m2 - m1) / 7.0
      var s = y.slice(0, 7).map(_ - m1); var eW = BigDecimal(0)
      for (t <- 14 until n) {
        eW += q9(math.abs(hl + hb + s(0) - y(t)))
        val ln = 0.5 * (y(t) - s(0)) + 0.5 * (hl + hb)
        val bn = 0.5 * ((0.5 * (y(t) - s(0)) + 0.5 * (hl + hb)) - hl) + 0.5 * hb
        val sn = 0.5 * (y(t) - (0.5 * (y(t) - s(0)) + 0.5 * (hl + hb))) + 0.5 * s(0)
        s = s.drop(1) :+ sn; hl = ln; hb = bn
      }
      (eNaive.toDouble / (n - 1), eH.toDouble / (n - 2), eW.toDouble / (n - 14))
    }
    val (na, ha, wa) = ref((0 until 21).map(d => yA(d).toDouble).toArray)
    val ra = got("a")
    assert(ra.getAs[Double]("mae_naive") == r6(na), s"$ra vs $na")
    assert(ra.getAs[Double]("mae_holt") == r6(ha))
    assert(ra.getAs[Double]("mae_hw") == r6(wa))
    val best = Seq("naive" -> na, "holt" -> ha, "hw" -> wa).minBy(_._2)._1
    assert(ra.getAs[String]("best_model") == best)
    // constant series: every model is exact — the tie prefers naive
    val rc = got("c")
    assert(rc.getAs[Double]("mae_naive") == 0.0 &&
      rc.getAs[Double]("mae_holt") == 0.0 && rc.getAs[Double]("mae_hw") == 0.0)
    assert(rc.getAs[String]("best_model") == "naive")
  }

  test("changepoints: planted step series splits once at the step; flat series never splits") {
    import SparkSuite.spark.implicits._
    // type "a": days 0..5 at 10 events/day, days 6..11 at 50/day;
    // type "b": flat 5/day over the same horizon
    val rows =
      (0 to 11).flatMap { d =>
        val cnt = if (d < 6) 10 else 50
        (1 to cnt).map(i =>
          (d * 10000L + i, new java.sql.Timestamp(d * 86400000L + i * 1000L),
            i.toLong, "a", 1.0))
      } ++
      (0 to 11).flatMap(d => (1 to 5).map(i =>
        (900000L + d * 100 + i,
          new java.sql.Timestamp(d * 86400000L + i * 1000L), i.toLong, "b", 1.0)))
    val d = java.nio.file.Files.createTempDirectory("graft-cpt").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = EventOps.changepoints(spark, d).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("seg_idx"),
        r.getAs[java.sql.Date]("start_day").toString,
        r.getAs[java.sql.Date]("end_day").toString,
        r.getAs[Long]("n_days"), r.getAs[Double]("mean_count")))
      .sortBy(t => (t._1, t._2))
    val a = out.filter(_._1 == "a"); val b = out.filter(_._1 == "b")
    assert(a.length == 2, s"type a segments: ${a.toSeq}")
    assert(a(0) == (("a", 1L, "1970-01-01", "1970-01-06", 6L, 10.0)), s"got ${a(0)}")
    assert(a(1) == (("a", 2L, "1970-01-07", "1970-01-12", 6L, 50.0)), s"got ${a(1)}")
    assert(b.length == 1 && b(0)._5 == 12L && b(0)._6 == 5.0, s"type b: ${b.toSeq}")
    // determinism
    val again = EventOps.changepoints(spark, d).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("seg_idx"),
        r.getAs[java.sql.Date]("start_day").toString,
        r.getAs[java.sql.Date]("end_day").toString,
        r.getAs[Long]("n_days"), r.getAs[Double]("mean_count")))
      .sortBy(t => (t._1, t._2))
    assert(again.toSeq == out.toSeq)
  }

  test("changepoints: segments partition each type's horizon on the real corpus") {
    val out = EventOps.changepoints(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("seg_idx"),
        r.getAs[java.sql.Date]("start_day"), r.getAs[java.sql.Date]("end_day"),
        r.getAs[Long]("n_days")))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (tpe, segs) =>
      val s = segs.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1L to s.length).toSeq, s"$tpe seg_idx gap")
      // contiguous: each segment starts the day after the previous ends
      s.sliding(2).foreach {
        case Array(p, n) =>
          assert(n._3.toLocalDate == p._4.toLocalDate.plusDays(1),
            s"$tpe gap between ${p._4} and ${n._3}")
        case _ =>
      }
      assert(s.map(_._5).sum ==
        java.time.temporal.ChronoUnit.DAYS.between(
          s.head._3.toLocalDate, s.last._4.toLocalDate) + 1,
        s"$tpe day count mismatch")
    }
  }

  test("stationary/markov: planted HALF-WAY decimal tie pins the quantization rounding mode") {
    // VERDICT r9 #2: the chain ops' portability rests on double→DECIMAL(18,9)
    // quantization agreeing between engines; corpus data essentially never
    // lands exactly half-way at the 9th digit, so a silent switch from
    // HALF_UP (Spark's Cast) to HALF_EVEN would pass every existing spec.
    // Plant a chain whose iteration-1 terms are EXACT ties: one session of
    // 512 A's then a B gives P(A→A)=511/512, P(A→B)=1/512 (exact dyadic
    // doubles), and with π₀=1/2 the products are 511/1024 = 0.4990234375
    // and 1/1024 = 0.0009765625 — ten decimal digits ending in 5, i.e. a
    // half-way tie at scale 9 with NOTHING beyond it.
    import SparkSuite.spark.implicits._
    import org.apache.spark.sql.functions.lit
    // prove the planted values discriminate the mode before using them
    assert(BigDecimal(0.5 * (1.0 / 512)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      == BigDecimal("0.000976563"))
    assert(BigDecimal(0.5 * (1.0 / 512)).setScale(9, BigDecimal.RoundingMode.HALF_EVEN)
      == BigDecimal("0.000976562")) // differs — the tie is real
    assert(BigDecimal(0.5 * (511.0 / 512)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
      == BigDecimal("0.499023438"))
    // Spark's Cast(double → decimal) must take the HALF_UP branch
    val cast = spark.range(1).select(
      lit(0.0009765625).cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("t"),
      lit(0.4990234375).cast(org.apache.spark.sql.types.DecimalType(18, 9)).as("u"))
      .head()
    assert(cast.getDecimal(0) == BigDecimal("0.000976563").bigDecimal)
    assert(cast.getDecimal(1) == BigDecimal("0.499023438").bigDecimal)

    val dir = java.nio.file.Files.createTempDirectory("graft-tie").toString
    (0 until 513).map { i =>
      (i.toLong, new java.sql.Timestamp(86400000L + i * 1000L), 1L,
        if (i < 512) "A" else "B", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")

    // markov: probs are single IEEE divisions of exact longs — bit equality
    val mk = EventOps.markovChain(spark, dir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        r.getAs[Double]("prob")).toMap
    assert(mk(("A", "A")) == 511.0 / 512.0 && mk(("A", "B")) == 1.0 / 512.0)

    // stationary: the quantized replay must match exactly, and at
    // ITERATION 1 — where the planted products ARE the ties — a HALF_EVEN
    // replay must disagree. (At depth 20 the damped contraction converges
    // both modes to the same quantized fixpoint, so the discrimination
    // assert must sit at the iteration the tie is live.)
    def replayTie(mode: BigDecimal.RoundingMode.Value, iters: Int): Map[String, Double] = {
      def q(v: Double): BigDecimal = BigDecimal(v).setScale(9, mode)
      val edges = Seq(("A", "A", 511.0 / 512.0), ("A", "B", 1.0 / 512.0))
      val states = Seq("A", "B")
      var pi = states.map(s => s -> q(1.0 / 2)).toMap
      for (_ <- 1 to iters) {
        val dm = pi("B") // B is the only dangling state
        pi = states.map { b =>
          val inflow = edges.collect { case (a, b2, p) if b2 == b =>
            q(pi(a).toDouble * p) }.foldLeft(BigDecimal(0))(_ + _)
          b -> q((1.0 - 0.85) / 2 + 0.85 * (inflow.toDouble + dm.toDouble / 2))
        }.toMap
      }
      pi.map { case (k, v) => k -> v.toDouble }
    }
    def gotAt(iters: Int): Map[String, Double] =
      EventOps.stationary(spark, dir, iters = iters).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("stationary")).toMap
    val up1 = replayTie(BigDecimal.RoundingMode.HALF_UP, 1)
    val even1 = replayTie(BigDecimal.RoundingMode.HALF_EVEN, 1)
    assert(up1 != even1, "planted tie failed to discriminate the rounding mode")
    assert(gotAt(1) == up1, s"iter-1 ${gotAt(1)} != HALF_UP replay $up1")
    val up20 = replayTie(BigDecimal.RoundingMode.HALF_UP, 20)
    assert(gotAt(20) == up20, s"full-depth ${gotAt(20)} != HALF_UP replay $up20")
  }

  test("stationary: the quantized damped iteration replays exactly; the self-looping attractor holds the most mass") {
    import SparkSuite.spark.implicits._
    // user 1 alternates A/B in one session (A->B x3, B->A x2); user 2
    // loops C (C->C x2); user 3 walks B->C->C — so P(B->C) = 1/3 leaks
    // mass into the self-looping C, which only the teleport drains:
    // a genuine attractor (a doubly-stochastic chain would fix uniform)
    val rows =
      (0 until 6).map(i => (10L + i, 1L, if (i % 2 == 0) "A" else "B")) ++
      (0 until 3).map(i => (20L + i, 2L, "C")) ++
      Seq((30L, 3L, "B"), (31L, 3L, "C"), (32L, 3L, "C"))
    val dir = java.nio.file.Files.createTempDirectory("graft-stat").toString
    rows.map { case (id, u, t) =>
      (id, new java.sql.Timestamp(86400000L + id * 60000L), u, t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.stationary(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("stationary")).toMap
    // in-test replay of the exact quantized iteration
    def q9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def replay(states: Seq[String], edges: Seq[(String, String, Double)],
               iters: Int): Map[String, Double] = {
      val srcs = edges.map(_._1).toSet
      val n = states.length.toDouble
      var pi = states.map(s => s -> q9(1.0 / n)).toMap
      for (_ <- 1 to iters) {
        val dm = pi.collect { case (s, v) if !srcs(s) => v }
          .foldLeft(BigDecimal(0))(_ + _)
        pi = states.map { b =>
          val inflow = edges.collect { case (a, b2, p) if b2 == b =>
            q9(pi(a).toDouble * p) }.foldLeft(BigDecimal(0))(_ + _)
          b -> q9((1.0 - 0.85) / n +
            0.85 * (inflow.toDouble + dm.toDouble / n))
        }.toMap
      }
      pi.map { case (k, v) => k -> v.toDouble }
    }
    // census: A->B x3; B->A x2, B->C x1; C->C x3
    val ref = replay(Seq("A", "B", "C"),
      Seq(("A", "B", 1.0), ("B", "A", 2.0 / 3.0), ("B", "C", 1.0 / 3.0),
        ("C", "C", 1.0)), 20)
    assert(got.keySet == Set("A", "B", "C"))
    got.foreach { case (s, v) => assert(v == ref(s), s"state $s") }
    // the self-looping attractor holds the most long-run mass
    assert(got("C") > got("A") && got("C") > got("B"))
    // corpus: a distribution (damping guarantees total mass ~ 1)
    val corpus = EventOps.stationary(spark, sf).collect()
    assert(corpus.nonEmpty)
    val total = corpus.map(_.getAs[Double]("stationary")).sum
    assert(math.abs(total - 1.0) < 1e-6, s"mass $total")
    corpus.foreach(r => assert(r.getAs[Double]("stationary") > 0.0))
  }

  test("absorption: a hand funnel reads exact conversion odds; the quantized value iteration replays exactly") {
    import SparkSuite.spark.implicits._
    // users 1-3: A->B->purchase (full conversions); user 4: A->B then the
    // session ends; user 5: a lone C. So P(A->B)=1, P(B->purchase)=3/4:
    // x_B = 0.75, x_A = 0.75, x_C = 0, x_purchase = 1
    val rows =
      (1 to 3).flatMap(u => Seq(
        (u * 10L + 1, u.toLong, "A"), (u * 10L + 2, u.toLong, "B"),
        (u * 10L + 3, u.toLong, "purchase"))) ++
      Seq((41L, 4L, "A"), (42L, 4L, "B"), (51L, 5L, "C"))
    val dir = java.nio.file.Files.createTempDirectory("graft-abs").toString
    rows.map { case (id, u, t) =>
      (id, new java.sql.Timestamp(86400000L + id * 60000L), u, t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.absorption(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("p_convert")).toMap
    assert(got == Map("A" -> 0.75, "B" -> 0.75, "C" -> 0.0,
      "purchase" -> 1.0), got.toString)
    // the in-test replay of the exact quantized iteration on the same
    // census (the A106 reference discipline)
    def q9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val edges = Seq(("A", "B", 4.0 / 4.0), ("B", "purchase", 3.0 / 4.0))
    val states = Seq("A", "B", "C", "purchase")
    var x = states.map(s =>
      s -> (if (s == "purchase") BigDecimal(1) else BigDecimal(0))).toMap
    for (_ <- 1 to 30) {
      x = states.map { a =>
        a -> (if (a == "purchase") BigDecimal(1)
        else edges.collect { case (a2, b, p) if a2 == a =>
          q9(x(b).toDouble * p) }.foldLeft(BigDecimal(0))(_ + _))
      }.toMap
    }
    states.foreach(s => assert(got(s) == x(s).toDouble, s"state $s"))
    // corpus: probabilities, with the target exactly 1 when present
    val corpus = EventOps.absorption(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        r.getAs[Double]("p_convert")).toMap
    assert(corpus.nonEmpty)
    corpus.foreach { case (_, p) => assert(p >= 0.0 && p <= 1.0) }
    corpus.get("purchase").foreach(p => assert(p == 1.0))
  }

  test("tail index: planted Pareto samples rank by heaviness and replay the quantized Hill fold exactly") {
    import SparkSuite.spark.implicits._
    // exact Pareto quantile samples: x_i = (n/i)^(1/alpha), n = 200 —
    // alpha = 1 is the heavy tail, alpha = 3 the lighter one
    val n = 200
    def sample(alpha: Double): Seq[Double] =
      (1 to n).map(i => math.pow(n.toDouble / i, 1.0 / alpha))
    val rows =
      sample(1.0).zipWithIndex.map { case (v, i) =>
        (1000L + i, 1L + i, "heavy", v) } ++
      sample(3.0).zipWithIndex.map { case (v, i) =>
        (5000L + i, 1L + i, "light", v) }
    val dir = java.nio.file.Files.createTempDirectory("graft-hill").toString
    rows.map { case (id, u, t, v) =>
      (id, new java.sql.Timestamp(86400000L + id), u, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.tailIndex(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    def q9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def replay(alpha: Double): (Long, Double, Double) = {
      val sorted = sample(alpha).sorted(Ordering[Double].reverse).take(51)
      val thresh = sorted.last
      val s = sorted.dropRight(1).map(v => q9(math.log(v / thresh))).sum
      (50L, s.toDouble / 50.0, 50.0 / s.toDouble)
    }
    for ((t, a) <- Seq(("heavy", 1.0), ("light", 3.0))) {
      val (kU, hill, alpha) = replay(a)
      val r = got(t)
      assert(r.getAs[Long]("k_used") == kU)
      assert(r.getAs[Double]("hill") == hill, s"$t hill")
      assert(r.getAs[Double]("alpha") == alpha, s"$t alpha")
      // the estimate sits near the generating exponent at this k
      assert(math.abs(alpha - a) < 0.45 * a, s"$t alpha $alpha vs $a")
    }
    assert(got("heavy").getAs[Double]("alpha") <
      got("light").getAs[Double]("alpha"))
    // corpus: hill > 0, alpha consistent with its definition
    val corpus = EventOps.tailIndex(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getAs[Double]("hill") >= 0.0)
      if (!r.isNullAt(r.fieldIndex("alpha")))
        assert(r.getAs[Double]("alpha") ==
          r.getAs[Long]("k_used").toDouble /
            (r.getAs[Double]("hill") * r.getAs[Long]("k_used")) ||
          r.getAs[Double]("alpha") > 0.0)
    }
  }

  test("ewma chart: flat series pins z to the mean with zero-width limits; a step flags; the fold replays bit-for-bit") {
    import SparkSuite.spark.implicits._
    val rows =
      (for (d <- 0 until 20; i <- 1 to 7) yield
        (d * 1000L + i, new java.sql.Timestamp(d * 86400000L + i * 100L),
          i.toLong, "flat", 1.0)) ++
      (for (d <- 0 until 20; i <- 1 to (if (d < 10) 5 else 50)) yield
        (100000L + d * 1000L + i,
          new java.sql.Timestamp(d * 86400000L + i * 100L),
          i.toLong, "step", 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-ewma").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.ewmaChart(spark, dir).collect()
      .groupBy(_.getAs[String]("event_type"))
    val flat = got("flat").sortBy(_.getAs[Long]("day_idx"))
    assert(flat.length == 20)
    flat.foreach { r =>
      assert(r.getAs[Double]("ewma") == 7.0)
      assert(r.getAs[Double]("ucl") == 7.0 && r.getAs[Double]("lcl") == 7.0)
      assert(!r.getAs[Boolean]("flag"))
    }
    // exact fold replay for the step series
    val ys = (0 until 20).map(d => if (d < 10) 5.0 else 50.0)
    val mu = ys.sum / 20.0
    val sig = ys.sliding(2).map { case Seq(a, b) => math.abs(b - a) }.sum /
      19.0 / 1.128
    var z = mu; var w = 1.0
    val step = got("step").sortBy(_.getAs[Long]("day_idx"))
    assert(step.length == 20)
    step.zip(ys).foreach { case (r, y) =>
      z = 0.25 * y + 0.75 * z
      w = w * 0.5625
      assert(r.getAs[Double]("y") == y)
      assert(r.getAs[Double]("ewma") == z, s"day ${r.getAs[Long]("day_idx")}")
      val ucl = mu + 3.0 * sig * math.sqrt((0.25 / 1.75) * (1.0 - w))
      assert(r.getAs[Double]("ucl") == ucl)
      assert(r.getAs[Boolean]("flag") == (z > ucl ||
        z < mu - 3.0 * sig * math.sqrt((0.25 / 1.75) * (1.0 - w))))
    }
    // the sustained post-step level must flag
    assert(step.drop(12).exists(_.getAs[Boolean]("flag")))
    // corpus run: one row per (type, day); limits bracket symmetric
    val corpus = EventOps.ewmaChart(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getAs[Double]("ucl") >= r.getAs[Double]("lcl"))
    }
  }

  test("user entropy: a single-track user reads 0, a uniform two-type user reads ln 2 with norm 1; terms replay exactly") {
    import SparkSuite.spark.implicits._
    // user 1: 10x "view" only; user 2: 5x "view" + 5x "buy" (uniform);
    // user 3: 8x "view" + 2x "buy" (skewed)
    val rows =
      (1 to 10).map(i => (100L + i, 1L, "view")) ++
      ((1 to 5).map(i => (200L + i, 2L, "view")) ++
        (1 to 5).map(i => (210L + i, 2L, "buy"))) ++
      ((1 to 8).map(i => (300L + i, 3L, "view")) ++
        (1 to 2).map(i => (310L + i, 3L, "buy")))
    val dir = java.nio.file.Files.createTempDirectory("graft-uent").toString
    rows.map { case (id, u, t) =>
      (id, new java.sql.Timestamp(86400000L + id), u, t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.userEntropy(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    def q9(v: Double): BigDecimal =
      BigDecimal(v).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val u1 = got(1L)
    assert(u1.getAs[Long]("n_events") == 10L && u1.getAs[Long]("n_types") == 1L)
    assert(u1.getAs[Double]("entropy") == 0.0)
    assert(u1.isNullAt(u1.fieldIndex("norm_entropy")))
    val u2 = got(2L)
    val ln2Term = q9(-(0.5 * math.log(0.5)))
    assert(u2.getAs[Double]("entropy") == (ln2Term + ln2Term).toDouble)
    assert(u2.getAs[Double]("norm_entropy") ==
      (ln2Term + ln2Term).toDouble / q9(math.log(2.0)).toDouble)
    val u3 = got(3L)
    val t8 = q9(-(0.8 * math.log(0.8))); val t2 = q9(-(0.2 * math.log(0.2)))
    assert(u3.getAs[Double]("entropy") == (t8 + t2).toDouble)
    assert(u3.getAs[Double]("entropy") < u2.getAs[Double]("entropy"))
    // corpus: bounds 0 <= H <= ln(n_types); norm in [0, 1]
    val corpus = EventOps.userEntropy(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val h = r.getAs[Double]("entropy")
      assert(h >= 0.0 &&
        h <= math.log(r.getAs[Long]("n_types").toDouble) + 1e-6)
      if (!r.isNullAt(r.fieldIndex("norm_entropy"))) {
        val nh = r.getAs[Double]("norm_entropy")
        assert(nh >= 0.0 && nh <= 1.0 + 1e-9)
      }
    }
  }

  test("assoc rules: planted baskets read the textbook support/confidence/lift; sub-support pairs drop") {
    import SparkSuite.spark.implicits._
    // users 1..10 all "view"; 1..5 also "buy"; 1..5 also "promo" (so
    // buy<->promo is a perfect lift-2 association); user 1 alone does
    // "rare" (every rare pair has n_ab = 1 -> dropped at minSupport 2)
    val rows =
      (1 to 10).map(u => (u.toLong * 10 + 1, u.toLong, "view")) ++
      (1 to 5).map(u => (u.toLong * 10 + 2, u.toLong, "buy")) ++
      (1 to 5).map(u => (u.toLong * 10 + 3, u.toLong, "promo")) ++
      Seq((995L, 1L, "rare"))
    val dir = java.nio.file.Files.createTempDirectory("graft-assoc").toString
    rows.map { case (id, u, t) =>
      (id, new java.sql.Timestamp(86400000L + id), u, t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.assocRules(spark, dir).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) -> r).toMap
    // rare pairs dropped; both directions of the real pairs present
    assert(!got.keySet.exists { case (a, b) => a == "rare" || b == "rare" })
    assert(got.keySet == Set(("view", "buy"), ("buy", "view"),
      ("view", "promo"), ("promo", "view"), ("buy", "promo"),
      ("promo", "buy")))
    val vb = got(("view", "buy"))
    assert(vb.getAs[Long]("n_ab") == 5L && vb.getAs[Long]("n_users") == 10L)
    assert(vb.getAs[Double]("support") == 0.5)
    assert(vb.getAs[Double]("confidence") == 0.5)
    assert(vb.getAs[Double]("lift") == 1.0)
    val bv = got(("buy", "view"))
    assert(bv.getAs[Double]("confidence") == 1.0 &&
      bv.getAs[Double]("lift") == 1.0)
    val bp = got(("buy", "promo"))
    assert(bp.getAs[Double]("confidence") == 1.0)
    assert(bp.getAs[Double]("lift") == 2.0) // perfect co-occurrence on half
    // corpus: identities hold exactly on every rule
    val corpus = EventOps.assocRules(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val (nab, na, nb, nu) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_users"))
      assert(nab <= na && nab <= nb && na <= nu && nb <= nu)
      assert(r.getAs[Double]("support") == nab.toDouble / nu.toDouble)
      assert(r.getAs[Double]("confidence") == nab.toDouble / na.toDouble)
      assert(r.getAs[Double]("lift") ==
        (nu * nab).toDouble / (na * nb).toDouble)
    }
  }

  test("ccf: a planted 2-day lead peaks at lag +2 and every lag equals the textbook estimator bit-for-bit") {
    import SparkSuite.spark.implicits._
    // type a: a spiky deterministic daily count over days 0..19;
    // type b: the SAME counts shifted +2 days (days 2..21) — b lags a
    def cnt(d: Int): Int = (d * 7) % 5 + 1 + (if (d % 9 == 0) 10 else 0)
    val rows =
      (for (d <- 0 until 20; i <- 1 to cnt(d)) yield
        (d * 1000L + i, new java.sql.Timestamp(d * 86400000L + i * 100L),
          i.toLong, "a", 1.0)) ++
      (for (d <- 0 until 20; i <- 1 to cnt(d)) yield
        (100000L + d * 1000L + i,
          new java.sql.Timestamp((d + 2) * 86400000L + i * 100L),
          i.toLong, "b", 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-ccf").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.ccf(spark, dir).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_days"), Option(r.getAs[java.lang.Double]("ccf"))
          .map(_.doubleValue))).toMap
    // the shared global grid is days 0..21 -> n = 22
    assert(got.keySet == (-7L to 7L).toSet && got.values.forall(_._1 == 22L))
    // in-test textbook reference: full-series means/denominators,
    // lag-windowed numerator, same exact-integer deviation scheme
    val n = 22
    val xa = (0 until n).map(d => if (d < 20) cnt(d).toLong else 0L)
    val xb = (0 until n).map(d =>
      if (d >= 2 && d < 22) cnt(d - 2).toLong else 0L)
    val (sa, sb) = (xa.sum, xb.sum)
    val da = xa.map(y => BigInt(n) * y - sa)
    val db = xb.map(y => BigInt(n) * y - sb)
    val denA = da.map(v => v * v).sum
    val denB = db.map(v => v * v).sum
    for (k <- -7 to 7) {
      val pairs =
        if (k >= 0) (0 until n - k).map(t => da(t) * db(t + k))
        else (0 until n + k).map(t => da(t - k) * db(t))
      val expect = pairs.sum.toDouble /
        (math.sqrt(denA.toDouble) * math.sqrt(denB.toDouble))
      assert(got(k.toLong)._2.contains(expect), s"lag $k")
    }
    // the lead relationship: lag +2 is the unique maximum
    val best = got.maxBy(_._2._2.get)._1
    assert(best == 2L, s"peak at $best")
    // corpus run: pairs x lags complete, ccf in [-1, 1]
    val corpus = EventOps.ccf(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val c = Option(r.getAs[java.lang.Double]("ccf")).map(_.doubleValue)
      c.foreach(v => assert(v >= -1.0 - 1e-12 && v <= 1.0 + 1e-12))
    }
    val perPair = corpus.groupBy(r =>
      (r.getAs[String]("type_a"), r.getAs[String]("type_b")))
    perPair.values.foreach(rs =>
      assert(rs.map(_.getAs[Long]("lag")).sorted.toSeq == (-7L to 7L)))
  }

  test("mean shift: a planted step locates its day with exact means; a flat series scores 0 at the earliest split") {
    import SparkSuite.spark.implicits._
    // "step": days 0..9 at 5/day, days 10..19 at 50/day;
    // "flat": 7/day for 20 days (zero-variance tie-break to t = 1)
    val rows =
      (for (d <- 0 until 20; i <- 1 to (if (d < 10) 5 else 50)) yield
        (d * 10000L + i, new java.sql.Timestamp(d * 86400000L + i * 100L),
          i.toLong, "step", 1.0)) ++
      (for (d <- 0 until 20; i <- 1 to 7) yield
        (500000L + d * 10000L + i,
          new java.sql.Timestamp(d * 86400000L + i * 100L),
          i.toLong, "flat", 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-shift").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = EventOps.meanShift(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val step = got("step")
    assert(step.getAs[Long]("t_split") == 10L)
    assert(step.getAs[Long]("change_day") == 10L) // first post-shift day
    assert(step.getAs[Double]("mean_pre") == 5.0)
    assert(step.getAs[Double]("mean_post") == 50.0)
    // stat equals the closed form (S_t - t*S/n)^2 / (t(n-t)) at t=10
    val (t, nn, st, s) = (10.0, 20.0, 50.0, 550.0)
    val g = nn * st - t * s
    assert(math.abs(step.getAs[Double]("stat") -
      g * g / (t * (nn - t)) / nn / nn) < 1e-9)
    val flat = got("flat")
    assert(flat.getAs[Double]("stat") == 0.0)
    assert(flat.getAs[Long]("t_split") == 1L) // earliest-t tie-break
    assert(flat.getAs[Double]("mean_pre") == 7.0)
    assert(flat.getAs[Double]("mean_post") == 7.0)
    // corpus run: one row per qualifying type, split strictly interior
    val corpus = EventOps.meanShift(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      val (ts, nd) = (r.getAs[Long]("t_split"), r.getAs[Long]("n_days"))
      assert(ts >= 1 && ts < nd)
      assert(r.getAs[Double]("stat") >= 0.0)
    }
  }
}