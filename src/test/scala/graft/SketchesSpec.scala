package graft

import org.apache.spark.sql.functions._
import graft.operators.{EventOps, Sketches}

class SketchesSpec extends SparkSuite {

  test("approx_count_distinct within rsd of exact; percentiles bracket the data") {
    val approx = Sketches.approxStats(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("approx_users"), r.getAs[Double]("value_p50"), r.getAs[Double]("value_p95"))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("u")).toMap
    exact.foreach { case (t, u) =>
      val (est, p50, p95) = approx(t)
      assert(math.abs(est - u).toDouble / u < 0.15, s"$t: est=$est exact=$u")
      assert(p50 < p95 && p50 > 0)
    }
  }

  test("exact quantiles: rank-selected p50/p95 bracket the approx estimates") {
    val ex = Sketches.exactQuantiles(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("value_p50"), r.getAs[Double]("value_p95"), r.getAs[Long]("n_events"))).toMap
    val ap = Sketches.approxStats(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("value_p50"), r.getAs[Double]("value_p95"))).toMap
    ex.foreach { case (t, (p50, p95, n)) =>
      assert(n > 0 && p50 <= p95)
      // percentile_approx at accuracy 10000 is near-exact at this SF
      assert(math.abs(ap(t)._1 - p50) <= math.max(1.0, p50 * 0.05), s"$t p50 ${ap(t)._1} vs $p50")
      assert(math.abs(ap(t)._2 - p95) <= math.max(1.0, p95 * 0.05), s"$t p95 ${ap(t)._2} vs $p95")
    }
  }

  test("bloom-pruned semi join equals the plain semi-join semantics") {
    val pruned = Sketches.bloomPrunedJoin(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap
    val ev = Tables.events(spark, sf)
    val plain = ev.join(
        ev.filter(col("event_type") === "error").select("user_id").distinct(), Seq("user_id"))
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap
    assert(pruned == plain)
  }

  test("HLL rollup: unioned daily sketches estimate per-type distincts within 5%") {
    val roll = Sketches.hllRollup(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("approx_users"), r.getAs[Long]("n_days"))).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("u")).toMap
    exact.foreach { case (t, u) =>
      val (est, nDays) = roll(t)
      assert(nDays == 30, s"$t: expected 30 daily partials, got $nDays")
      assert(math.abs(est - u).toDouble / u < 0.05, s"$t: est=$est exact=$u")
    }
  }

  test("count-min estimates upper-bound the exact counts, tightly at this scale") {
    val rows = Sketches.cmsTopUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_count")
      val est = r.getAs[Long]("cms_estimate")
      assert(est >= exact, s"CMS underestimated: $r")
      assert(est <= exact * 1.1 + 10, s"CMS too loose: $r")
    }
  }

  test("hllSliding: trailing-window sketch unions match exact distincts") {
    import SparkSuite.spark.implicits._
    // day d holds users {d..d+4}; the trailing-7 window ending at day t
    // covers users {max(0,t-6)..t+4} -> exactly min(t,6)+5 distincts
    val D = 86400000L
    var id = 0L
    val rows = for { d <- 0 to 9; u <- d to d + 4 } yield {
      id += 1
      (id, new java.sql.Timestamp(d * D + 3600000L), u.toLong, "x", 1.0)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-hlls").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val out = Sketches.hllSliding(spark, dir).collect()
      .map(r => r.getAs[Long]("win_day") ->
        (r.getAs[Long]("approx_users"), r.getAs[Long]("n_days"))).toMap
    assert(out.keySet == (0L to 9L).toSet)
    for (t <- 0 to 9) {
      val exact = math.min(t, 6) + 5
      val (est, nDays) = out(t.toLong)
      assert(nDays == math.min(t, 6) + 1, s"day $t window size $nDays")
      assert(math.abs(est - exact) <= math.max(1, exact / 20),
        s"day $t: estimate $est vs exact $exact")
    }
    // real corpus: every window estimate is sane against its type's total
    val totals = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("u")).toMap
    val real = Sketches.hllSliding(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val cap = totals(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("approx_users") <= (cap * 1.05).toLong + 2)
    }
  }

  // ---- A89 SpaceSaving heavy hitters ---------------------------------------

  test("spacesaving: exact-capacity twin reproduces the plain top-k with est = lo") {
    val exact = Sketches.heavyHittersExact(spark, sf).collect()
    assert(exact.nonEmpty)
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("c").desc, col("user_id"))).cast("long"))
      .filter(col("rank") <= 10).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("rank")) ->
        ((r.getAs[Long]("user_id"), r.getAs[Long]("c")))).toMap
    assert(exact.length == direct.size)
    exact.foreach { r =>
      val (u, c) = direct((r.getAs[String]("event_type"), r.getAs[Long]("rank")))
      assert(r.getAs[Long]("user_id") == u, s"$r")
      assert(r.getAs[Long]("est") == c && r.getAs[Long]("lo") == c, s"$r")
    }
  }

  test("spacesaving: bounds hold under eviction; the big hitters are guaranteed present") {
    import graft.functions.SpaceSaving
    // one planted stream, pushed through two partial sketches + a merge —
    // the executor-partial shape — with capacity 8 and >capacity distinct:
    // key 1 x 1000, key 2 x 500, keys 100..299 x 1 (true n = 1700)
    val stream = Seq.fill(1000)(1L) ++ Seq.fill(500)(2L) ++
      (100L until 300L)
    val trueCount = stream.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val (h1, h2) = stream.zipWithIndex.partition(_._2 % 2 == 0)
    val a = new SpaceSaving(8); h1.foreach(x => a.add(x._1))
    val b = new SpaceSaving(8); h2.foreach(x => b.add(x._1))
    a.merge(b)
    val entries = a.sorted()
    assert(entries.size <= 8)
    // upper/lower bounds and the err <= n/m guarantee, per surviving key
    entries.foreach { case (k, est, err) =>
      val t = trueCount.getOrElse(k, 0L)
      assert(est >= t, s"key $k: est $est < true $t")
      assert(est - err <= t, s"key $k: lo ${est - err} > true $t")
      assert(err <= 1700 / 8 + 1, s"key $k err $err")
    }
    // any key with true share > n/m must be present: 1000, 500 >> 212
    assert(entries.exists(_._1 == 1L) && entries.exists(_._1 == 2L))
    // and the two giants rank first in that order
    assert(entries.take(2).map(_._1) == Seq(1L, 2L))
  }

  test("spacesaving store: windowed serve from daily partials equals a direct ranking over the window") {
    import SparkSuite.spark.implicits._
    // 3 days: u1 heavy on day 0, u2 heavy on days 1-2
    val rows = (1 to 9).map(i => (i.toLong, 0L, 1L)) ++
      (1 to 2).map(i => (100L + i, 0L, 2L)) ++
      (1 to 6).map(i => (200L + i, 1L, 2L)) ++
      (1 to 6).map(i => (300L + i, 2L, 2L)) ++
      (1 to 3).map(i => (400L + i, 2L, 1L))
    val ev = rows.map { case (id, day, u) =>
      (id, new java.sql.Timestamp(day * 86400000L + id), u, "view", 1.0) }
    val dir = java.nio.file.Files.createTempDirectory("graft-hhstore-src").toString
    ev.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val store = java.nio.file.Files.createTempDirectory("graft-hhstore").toString
    Sketches.writeHeavyHitterStore(spark, dir, store)
    // full range: u1 = 12, u2 = 14
    val full = Sketches.heavyHittersFromStore(spark, store).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("user_id"),
        r.getAs[Long]("est"), r.getAs[Long]("lo"))).toSet
    assert(full == Set((1L, 2L, 14L, 14L), (2L, 1L, 12L, 12L)), full.toString)
    // days 1-2 only: u2 = 12, u1 = 3 — the window re-ranks without any
    // raw-event re-read
    val win = Sketches.heavyHittersFromStore(spark, store, fromDay = 1, toDay = 2)
      .collect().map(r => (r.getAs[Long]("rank"), r.getAs[Long]("user_id"),
        r.getAs[Long]("est"), r.getAs[Long]("lo"))).toSet
    assert(win == Set((1L, 2L, 12L, 12L), (2L, 1L, 3L, 3L)), win.toString)
  }

  test("spacesaving: disjoint-key merge is exact and canonical; rollup agg equals one-shot build") {
    import graft.functions.SpaceSaving
    import graft.functions.SpaceSavingFunctions._
    import SparkSuite.spark.implicits._
    // disjoint halves under capacity: merge must be byte-canonical vs the
    // one-shot sketch regardless of which side merges which
    val x = new SpaceSaving(64); (1L to 30L).foreach(k => (1L to k).foreach(_ => x.add(k)))
    val y = new SpaceSaving(64); (31L to 60L).foreach(k => (1L to k).foreach(_ => y.add(k)))
    val one = new SpaceSaving(64)
    (1L to 60L).foreach(k => (1L to k).foreach(_ => one.add(k)))
    x.merge(y)
    assert(java.util.Arrays.equals(x.serialize(), one.serialize()))
    // distributed rollup: per-day partial sketches folded by ssMergeAgg
    // reproduce the direct whole-corpus counts (exact regime)
    val rows = (1L to 50L).flatMap(u => (0L until u % 5 + 1).map(day => (u, day)))
    val daily = rows.toDF("user_id", "day")
      .groupBy("day").agg(ssAgg(col("user_id"), 1024).as("ss"))
    val merged = daily.agg(ssMergeAgg(col("ss"), 1024).as("ss"))
      .select(explode(ssTopK(col("ss"), lit(1000))).as("hh"))
      .select(col("hh.key"), col("hh.est"), col("hh.lo")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expect = rows.groupBy(_._1).map { case (u, v) => u -> v.size.toLong }
    assert(merged.keySet == expect.keySet)
    expect.foreach { case (u, c) =>
      assert(merged(u) == ((c, c)), s"user $u: ${merged(u)} vs exact $c") }
  }

  test("kll store: windowed serve from daily partials equals a direct rank selection over the window") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-qsk-spec").toString
    Sketches.writeQuantileStore(spark, sf, tmp)
    val days = Tables.events(spark, sf)
      .select(expr("unix_millis(cast(ts as timestamp_ltz)) div 86400000").as("d"))
      .agg(min("d"), max("d")).head()
    val (lo, hi) = (days.getLong(0), days.getLong(1))
    val (from, to) = (lo + (hi - lo) / 4, lo + (hi - lo) / 2)
    val got = Sketches.quantilesFromStore(spark, tmp, from, to).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("value_p50"), r.getAs[Double]("value_p95"),
          r.getAs[Long]("n_events")))).toMap
    // direct exact rank rule over the same day window
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("value"))
    val nW = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
    val direct = Tables.events(spark, sf)
      .withColumn("d", expr("unix_millis(cast(ts as timestamp_ltz)) div 86400000"))
      .filter(col("d") >= from && col("d") <= to)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(nW))
      .groupBy("event_type")
      .agg(max(when(col("rn") === ceil(col("n") * 0.5), col("value"))).as("p50"),
        max(when(col("rn") === ceil(col("n") * 0.95), col("value"))).as("p95"),
        max(col("n")).as("n")).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("p50"), r.getAs[Double]("p95"),
          r.getAs[Long]("n")))).toMap
    assert(got.nonEmpty && got == direct)
  }

  // ---- A96 KLL/MRL quantile sketch ----------------------------------------

  test("kll: exact-capacity twin equals the exact rank-selected quantiles; bytes canonical under repartitioning") {
    import graft.functions.KllFunctions._
    val exact = Sketches.exactQuantiles(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Double]("value_p50"), r.getAs[Double]("value_p95"),
          r.getAs[Long]("n_events")))).toMap
    val twin = Sketches.exactQuantileSketch(spark, sf).collect()
    assert(twin.nonEmpty && twin.length == exact.size)
    twin.foreach { r =>
      val (p50, p95, n) = exact(r.getAs[String]("event_type"))
      assert(r.getAs[Double]("value_p50") == p50, s"$r")
      assert(r.getAs[Double]("value_p95") == p95, s"$r")
      assert(r.getAs[Long]("n_events") == n)
    }
    // canonical bytes: in the exact regime the sketch is the multiset —
    // any partitioning serializes identically
    def bytesOf(parts: Int) = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).repartition(parts)
      .groupBy("event_type").agg(kllAgg(col("value"), 1 << 16).as("sk"))
      .collect().map(r => r.getAs[String]("event_type") ->
        r.getAs[Array[Byte]]("sk").toSeq).toMap
    assert(bytesOf(1) == bytesOf(13))
  }

  test("kll: compacted regime keeps the weight identity, bounds realized rank error, and rollup-merges day partials") {
    import graft.functions.{KllDoubles, KllFunctions}
    import KllFunctions._
    import SparkSuite.spark.implicits._
    // planted de-correlated permutation of 1..5000 (LCG order) through a
    // capacity-64 ladder: heavy compaction (n/k ≈ 78)
    val n = 5000
    val perm = (1 to n).sortBy(v => (v * 2654435761L) & 0xFFFFFFFFL)
    val s = new KllDoubles(64)
    perm.foreach(v => s.add(v.toDouble))
    assert(s.total == n.toLong)
    // weight identity: Σ |level h|·2^h = n exactly (the even-pair rule)
    val weights = s.levelSizes.zipWithIndex
      .map { case (sz, h) => sz.toLong << h }.sum
    assert(weights == n.toLong, s"weight $weights != $n")
    // realized rank error: value v has true rank v in 1..n
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = s.quantile(q)
      val err = math.abs(est - math.ceil(q * n))
      assert(err <= 0.05 * n, s"q=$q est=$est err=$err")
    }
    // distributed rollup in the compacted regime: day partials folded by
    // kllMergeAgg carry the exact total weight and in-range quantiles
    val rows = perm.zipWithIndex.map { case (v, i) => (v.toDouble, i % 7) }
    val daily = rows.toDF("value", "day")
      .groupBy("day").agg(kllAgg(col("value"), 64).as("sk"))
    val got = daily.agg(kllMergeAgg(col("sk"), 64).as("sk"))
      .select(kllQuantile(col("sk"), lit(0.5)).as("p50")).head()
      .getDouble(0)
    assert(math.abs(got - n / 2.0) <= 0.1 * n, s"rollup p50 $got")
  }

  test("theta: exact-regime set algebra equals direct set arithmetic; bytes canonical under repartitioning") {
    // hand case first: the pure Scala kernel on two known sets
    import graft.functions.ThetaSet
    def build(xs: Seq[Long], k: Int = 1024): ThetaSet = {
      val s = new ThetaSet(k); xs.foreach(s.add); s
    }
    val ha = (1L to 100L).map(v => scala.util.hashing.byteswap64(v))
    val hb = (51L to 130L).map(v => scala.util.hashing.byteswap64(v))
    val (a, b) = (build(ha), build(hb))
    assert(a.estimate == 100.0 && b.estimate == 80.0)
    assert(ThetaSet.union(a, b).estimate == 130.0)
    assert(ThetaSet.intersect(a, b).estimate == 50.0)
    assert(ThetaSet.aNotB(a, b).estimate == 50.0)
    assert(ThetaSet.aNotB(b, a).estimate == 30.0)
    // merge in arbitrary splits is canonical: byte-equal serializations
    val whole = build(ha ++ hb)
    val merged = build(ha.take(37)); val m2 = build(ha.drop(37) ++ hb)
    merged.merge(m2)
    assert(java.util.Arrays.equals(whole.serialize(), merged.serialize()))
    // corpus run: overlap equals the exact SQL-style computation
    val got = Sketches.thetaOverlap(spark, sf).collect()
    assert(got.nonEmpty)
    val ut = graft.Tables.events(spark, sf)
      .select("user_id", "event_type").distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val byType = ut.groupBy(_._2).map { case (t, xs) =>
      t -> xs.map(_._1).toSet }
    got.foreach { r =>
      val (ta, tb) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      val (sa, sb) = (byType(ta), byType(tb))
      assert(r.getAs[Long]("n_a") == sa.size && r.getAs[Long]("n_b") == sb.size)
      assert(r.getAs[Long]("n_union") == (sa ++ sb).size, s"$ta/$tb union")
      assert(r.getAs[Long]("n_intersect") == (sa & sb).size)
      assert(r.getAs[Long]("n_a_only") == (sa -- sb).size)
      assert(r.getAs[Double]("jaccard") ==
        (sa & sb).size.toDouble / (sa ++ sb).size.toDouble)
    }
    // canonical bytes under different partitionings (distributed build)
    import graft.functions.ThetaFunctions._
    def bytesAt(parts: Int): Array[Byte] =
      graft.Tables.events(spark, sf)
        .repartition(parts)
        .select(xxhash64(col("user_id")).as("h"))
        .agg(thetaAgg(col("h"), 1 << 14).as("sk"))
        .head().getAs[Array[Byte]]("sk")
    assert(java.util.Arrays.equals(bytesAt(1), bytesAt(7)))
  }

  test("theta: over-capacity estimation error sits inside the published envelope; rollup serves exact windows") {
    // capacity 64 over 150 distinct users (sf0.01): the estimation regime.
    // Published relative standard error ~ 1/sqrt(k-2) = 12.7%; assert a
    // generous 4-sigma band — this MEASURES the estimator, not just runs it
    val sf01 = "/root/testdata/sf0.01"
    val exact = graft.Tables.events(spark, sf01)
      .select("user_id").distinct().count()
    import graft.functions.ThetaFunctions._
    val est = graft.Tables.events(spark, sf01)
      .select(xxhash64(col("user_id")).as("h"))
      .agg(thetaEstimate(thetaAgg(col("h"), 64)).as("e"))
      .head().getDouble(0)
    val rse = 1.0 / math.sqrt(62.0)
    assert(math.abs(est - exact) <= 4 * rse * exact,
      s"estimate $est vs exact $exact")
    // rollup: daily partials merged = exact horizon distincts (exact regime)
    val roll = Sketches.thetaRollup(spark, sf).collect()
    assert(roll.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        graft.functions.Cols.tsMs(col("ts")).as("ms"))
      .withColumn("d", expr("ms div 86400000")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id"),
        r.getAs[Long]("d")))
    val dMax = ev.map(_._3).max
    roll.foreach { r =>
      val t = r.getAs[String]("event_type")
      val mine = ev.filter(_._1 == t)
      assert(r.getAs[Long]("distinct_all") == mine.map(_._2).distinct.length)
      assert(r.getAs[Long]("distinct_last7") ==
        mine.filter(_._3 > dMax - 7).map(_._2).distinct.length)
      assert(r.getAs[Long]("n_days") == mine.map(_._3).distinct.length)
    }
  }

  test("theta_ci: interval arithmetic replays from the sketch fields; z=3 bars cover the planted truth; exact regime collapses") {
    import SparkSuite.spark.implicits._
    import graft.functions.ThetaFunctions._
    // planted stream: 5000 distinct longs through a k=64 sketch — deep in
    // the estimation regime, truth known exactly
    val n = 5000
    val df = spark.range(n).select(xxhash64(col("id")).as("h"))
    val row = df.agg(thetaAgg(col("h"), 64).as("sk"))
      .select(col("sk"), thetaCi(col("sk"), 3.0).as("ci")).head()
    val sk = row.getAs[Array[Byte]]("sk")
    val ci = row.getStruct(1)
    val (est, rse, lo, hi) = (ci.getDouble(0), ci.getDouble(1),
      ci.getDouble(2), ci.getDouble(3))
    // replay the interval from the serialized sketch's own fields
    val buf = java.nio.ByteBuffer.wrap(sk).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.get() == 1)          // version
    assert(buf.getInt() == 64)      // k
    assert(buf.get() == 0)          // estimation regime
    val thetaRaw = buf.getLong()
    val r = buf.getInt()
    val theta = (thetaRaw ^ Long.MinValue).toDouble / 1.8446744073709552E19 + 0.5
    assert(r == 64)
    assert(est == r.toDouble / theta)
    val rseRef = math.sqrt((1.0 - theta) / r)
    assert(rse == rseRef)
    assert(lo == math.max(r.toDouble, est * (1.0 - 3.0 * rseRef)))
    assert(hi == est * (1.0 + 3.0 * rseRef))
    // coverage: truth inside the z=3 bars (P(miss) ~ 0.3% — deterministic
    // here: the stream and hashes are fixed)
    assert(lo <= n && n <= hi, s"truth $n outside [$lo, $hi]")
    // the bars are bars: rse in the published ~1/sqrt(k) ballpark
    assert(rse > 0.05 && rse < 0.25)

    // exact regime: bars collapse to the exact count
    val small = spark.range(20).select(xxhash64(col("id")).as("h"))
      .agg(thetaCi(thetaAgg(col("h"), 64), 3.0).as("ci")).head().getStruct(0)
    assert(small.getDouble(0) == 20.0 && small.getDouble(1) == 0.0 &&
      small.getDouble(2) == 20.0 && small.getDouble(3) == 20.0)

    // set-operation result carries bars too: intersect of two overlapping
    // planted sets — truth inside the interval, lo >= retained
    val a = spark.range(0, 4000).select(xxhash64(col("id")).as("h"))
      .agg(thetaAgg(col("h"), 64).as("ska"))
    val b = spark.range(2000, 6000).select(xxhash64(col("id")).as("h"))
      .agg(thetaAgg(col("h"), 64).as("skb"))
    val inter = a.crossJoin(b)
      .select(thetaCi(thetaIntersect(col("ska"), col("skb")), 3.0).as("ci"))
      .head().getStruct(0)
    assert(inter.getDouble(2) <= 2000.0 && 2000.0 <= inter.getDouble(3),
      s"intersect truth 2000 outside [${inter.getDouble(2)}, ${inter.getDouble(3)}]")

    // r = 0 zero-count bound is z-CONSISTENT (not a hardcoded 95% rule of
    // three): intersect of DISJOINT saturated sets retains nothing; at
    // z = 1.645 the exact binomial inversion must recover ~3/theta, and a
    // larger z must widen it
    val c = spark.range(100000, 104000).select(xxhash64(col("id")).as("h"))
      .agg(thetaAgg(col("h"), 64).as("skc"))
    val z0 = a.crossJoin(c)
      .select(thetaIntersect(col("ska"), col("skc")).as("sk"))
      .select(col("sk"), thetaCi(col("sk"), 1.645).as("ci1"),
        thetaCi(col("sk"), 3.0).as("ci3")).head()
    val skBytes = z0.getAs[Array[Byte]]("sk")
    val zb = java.nio.ByteBuffer.wrap(skBytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    zb.get(); zb.getInt(); val exactFlag = zb.get(); val tRaw = zb.getLong()
    assert(exactFlag == 0 && zb.getInt() == 0) // estimation regime, r = 0
    val th = (tRaw ^ Long.MinValue).toDouble / 1.8446744073709552E19 + 0.5
    val (hi1, hi3) = (z0.getStruct(1).getDouble(3), z0.getStruct(2).getDouble(3))
    assert(math.abs(hi1 - 3.0 / th) / (3.0 / th) < 0.02,
      s"z=1.645 upper $hi1 should be ~rule-of-three ${3.0 / th}")
    assert(hi3 > hi1 * 2.0 && hi3 < hi1 * 2.4, s"z=3 bound $hi3 vs $hi1")

    // the corpus operator: every row's bars bracket its own estimate, the
    // per-type exact counts land inside their bars, and __all_types rides
    // the merge
    val out = Sketches.thetaCi(spark, sf).collect()
    assert(out.exists(_.getAs[String]("event_type") == "__all_types"))
    val exact = graft.Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    out.foreach { rr =>
      val (e, l, h) = (rr.getAs[Double]("estimate"), rr.getAs[Double]("lo"),
        rr.getAs[Double]("hi"))
      assert(l <= e + 1e-9 && e <= h + 1e-9)
      exact.get(rr.getAs[String]("event_type")).foreach { t =>
        assert(l <= t && t <= h, s"${rr.getAs[String]("event_type")}: $t outside [$l, $h]")
      }
    }
  }
}
