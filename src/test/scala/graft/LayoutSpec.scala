package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Layout

class LayoutSpec extends SparkSuite {

  test("day-partitioned events: directory layout + partition pruning") {
    val path = Files.createTempDirectory("graft-layout").toString + "/events"
    Layout.writeEventsPartitioned(Tables.events(spark, sf), path)
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.count(_.startsWith("day=")) == 30, s"got ${dirs.length} partition dirs")

    val ranged = Layout.readEventsRange(spark, path, "2024-01-05", "2024-01-07")
    val days = ranged.select(col("day").cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(days.toSeq == Seq("2024-01-05", "2024-01-06", "2024-01-07"))
    // pruning must reach the scan: only 3 of 30 partitions read
    val scanned = ranged.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    val plan = ranged.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(500))
  }

  test("compaction: many small shards become size-targeted files, data intact") {
    val base = Files.createTempDirectory("graft-compact").toString
    val in = s"$base/shards"
    val out = s"$base/compacted"
    val ev = Tables.events(spark, sf)
    ev.repartition(20).write.parquet(in) // streaming-sink-style small shards
    val nIn = new java.io.File(in).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nIn == 20)
    val nOut = Layout.compact(spark, in, out, targetBytes = 1L << 30)
    assert(nOut == 1, s"tiny input must compact to one file, got $nOut")
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
    assert(spark.read.parquet(out).count() == ev.count())
  }

  test("bucketed join on the bucket key has no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      Layout.writeBucketed(Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice"),
        "orders_b", "o_orderkey", 4)
      Layout.writeBucketed(Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
        "lineitem_b", "l_orderkey", 4)
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey").agg(sum("l_quantity").as("qty"))
      joined.collect()
      // AQE's toString appends the pre-adaptive plan; only the final counts
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
      // the join itself must be shuffle-free (bucket co-location); only the
      // final groupBy(o_custkey) may exchange
      assert(shuffles <= 1, s"expected bucketed join without join-side shuffles:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("streaming sink compaction: small per-trigger shards collapse, data intact") {
    import SparkSuite.spark.implicits._
    import graft.streaming.EventPipeline
    import graft.streaming.EventPipeline.Event
    def t(day: Int, m: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-0$day%d 10:$m%02d:00")
    val src = Files.createTempDirectory("graft-csink-src").toString
    val out = Files.createTempDirectory("graft-csink-out").toString + "/events"
    val chk = Files.createTempDirectory("graft-csink-chk").toString
    // 3 staged files, each with rows for BOTH days → pre-compaction each
    // day dir holds one shard per trigger
    (0 until 3).foreach { b =>
      Seq(Event(b * 2L, t(1, b), 1, "click", 1.0),
          Event(b * 2L + 1, t(2, b), 2, "view", 2.0))
        .toDF().coalesce(1).write.parquet(s"$src/b$b")
    }
    val in = spark.readStream.schema(EventPipeline.eventSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$src/b*")
    val priorCkpt = spark.conf.getOption("spark.sql.streaming.checkpointLocation")
    spark.conf.set("spark.sql.streaming.checkpointLocation", chk)
    try {
      val q = Layout.partitionedSinkWithCompaction(in, out, compactEvery = 3)
      try q.processAllAvailable() finally q.stop()
    } finally priorCkpt.fold(
      spark.conf.unset("spark.sql.streaming.checkpointLocation"))(
      spark.conf.set("spark.sql.streaming.checkpointLocation", _))

    val dayDirs = new java.io.File(out).listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("day="))
    assert(dayDirs.map(_.getName).toSet == Set("day=2024-01-01", "day=2024-01-02"))
    dayDirs.foreach { d =>
      val shards = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(shards.length == 1,
        s"${d.getName}: ${shards.length} shards survived compaction")
    }
    val back = spark.read.parquet(out)
    assert(back.count() == 6)
    assert(back.select("event_id").as[Long].collect().toSet == (0L to 5L).toSet)
  }

  test("z-ordered layout clusters BOTH dimensions; plain sort only its leading column") {
    val base = Files.createTempDirectory("graft-zorder").toString
    val src = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_suppkey")
    val n = src.count()

    Layout.writeZOrdered(src, s"$base/z", "l_partkey", "l_suppkey", nFiles = 8)
    // baseline: same file count, sorted on the leading column only
    src.repartitionByRange(8, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.parquet(s"$base/plain")

    // mean per-file span of a column as a fraction of its global range —
    // the proxy for parquet min/max pruning effectiveness
    def meanSpan(path: String, c: String): Double = {
      val df = spark.read.parquet(path)
        .select(col(c), input_file_name().as("f"))
      val global = df.agg(max(col(c)) - min(col(c))).head().getLong(0).toDouble
      val spans = df.groupBy("f").agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length / global
    }
    // data intact
    assert(spark.read.parquet(s"$base/z").count() == n)
    val zPart = meanSpan(s"$base/z", "l_partkey")
    val zSupp = meanSpan(s"$base/z", "l_suppkey")
    val plainPart = meanSpan(s"$base/plain", "l_partkey")
    val plainSupp = meanSpan(s"$base/plain", "l_suppkey")
    // plain sort: leading column tightly clustered, second column spans
    // ~everything; z-order: BOTH columns clustered well below full range
    assert(plainPart < 0.5, s"plain leading-col span $plainPart")
    assert(plainSupp > 0.8, s"plain second-col span $plainSupp")
    assert(zPart < 0.75, s"z-order partkey span $zPart")
    assert(zSupp < 0.75, s"z-order suppkey span $zSupp")
    assert(zSupp < plainSupp * 0.8,
      s"z-order must beat plain sort on the second dim: $zSupp vs $plainSupp")

    // 3-column form: all three dimensions cluster below full range
    Layout.writeZOrdered(src, s"$base/z3",
      Seq("l_partkey", "l_suppkey", "l_orderkey"), nFiles = 8, bits = 16,
      rowGroupBytes = None)
    assert(spark.read.parquet(s"$base/z3").count() == n)
    Seq("l_partkey", "l_suppkey", "l_orderkey").foreach { c =>
      val s3 = meanSpan(s"$base/z3", c)
      assert(s3 < 0.85, s"3-col z-order: $c span $s3")
    }
  }

  test("hilbert kernel: bijective on the grid, consecutive indices grid-adjacent (the property z-order lacks)") {
    import graft.functions.SpatialKernel
    val order = 3; val n = 1 << order // 8×8 grid
    val cells = for (x <- 0L until n; y <- 0L until n) yield
      ((x, y), SpatialKernel.hilbert(order, x, y))
    // bijection onto 0..63
    assert(cells.map(_._2).sorted == (0L until n * n))
    // walking d = 0..63 moves exactly one grid step each time
    val byD = cells.map { case (xy, d) => d -> xy }.toMap
    (1L until n * n).foreach { d =>
      val (x0, y0) = byD(d - 1); val (x1, y1) = byD(d)
      assert(math.abs(x1 - x0) + math.abs(y1 - y0) == 1,
        s"jump at d=$d: ($x0,$y0)->($x1,$y1)")
    }
  }

  test("hilbert-clustered layout bounds BOTH dimensions at least as tightly as z-order on the second") {
    val base = Files.createTempDirectory("graft-hilbert").toString
    val src = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_suppkey")
    val n = src.count()
    Layout.writeHilbertOrdered(src, s"$base/h", "l_partkey", "l_suppkey", nFiles = 8)
    Layout.writeZOrdered(src, s"$base/z", "l_partkey", "l_suppkey", nFiles = 8)
    def meanSpan(path: String, c: String): Double = {
      val df = spark.read.parquet(path)
        .select(col(c), input_file_name().as("f"))
      val global = df.agg(max(col(c)) - min(col(c))).head().getLong(0).toDouble
      val spans = df.groupBy("f").agg((max(col(c)) - min(col(c))).as("span"))
        .collect().map(_.getAs[Long]("span").toDouble)
      spans.sum / spans.length / global
    }
    assert(spark.read.parquet(s"$base/h").count() == n) // data intact
    // both dimensions clustered well below full range, and the curve's
    // locality keeps it in z-order's ballpark or better on each dim
    val (hp, hs) = (meanSpan(s"$base/h", "l_partkey"), meanSpan(s"$base/h", "l_suppkey"))
    val (zp, zs) = (meanSpan(s"$base/z", "l_partkey"), meanSpan(s"$base/z", "l_suppkey"))
    assert(hp < 0.75 && hs < 0.75, s"hilbert spans $hp/$hs")
    // comparative band is loose: repartitionByRange samples, so spans
    // wobble a few percent run-to-run — the absolute bound above is the
    // clustering claim, this guards only against a broken curve
    assert(hp <= zp * 1.6 && hs <= zs * 1.6,
      s"hilbert ($hp,$hs) far worse than z-order ($zp,$zs)")
  }

  test("row-group pruning measured from parquet FOOTERS, not a span proxy") {
    val base = Files.createTempDirectory("graft-zrg").toString
    val src = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val n = src.count()
    // small row groups so each file carries many prunable units (the z-curve
    // needs enough granularity for quadrant locality to reach the footers)
    Layout.writeZOrdered(src, s"$base/z", Seq("l_partkey", "l_suppkey"),
      nFiles = 2, bits = 16, rowGroupBytes = Some(64 * 1024))
    src.repartitionByRange(2, col("l_partkey")).sortWithinPartitions("l_partkey")
      .write.option("parquet.block.size", 64 * 1024).parquet(s"$base/plain")

    val zStats = Layout.rowGroupStats(spark, s"$base/z", Seq("l_suppkey"))
    val pStats = Layout.rowGroupStats(spark, s"$base/plain", Seq("l_suppkey"))
    // footer row counts conserve the data; several groups per layout
    assert(zStats.map(_.rows).sum == n, s"footer rows ${zStats.map(_.rows).sum} != $n")
    assert(zStats.length >= 8, s"want ≥8 z row groups, got ${zStats.length}")
    assert(pStats.length >= 8, s"want ≥8 plain row groups, got ${pStats.length}")

    // a row-group survives a range predicate iff [min,max] intersects it:
    // middle 10% of the SECOND z dimension (the one plain sort can't serve)
    val gMin = zStats.map(_.min).min
    val gMax = zStats.map(_.max).max
    val width = (gMax - gMin) / 10
    val lo = gMin + (gMax - gMin) / 2 - width / 2
    val hi = lo + width
    def readFrac(stats: Seq[Layout.RowGroupStat]): Double =
      stats.count(s => s.max >= lo && s.min <= hi).toDouble / stats.length
    val zFrac = readFrac(zStats)
    val pFrac = readFrac(pStats)
    // x-sorted layout: suppkey min/max ≈ full range in every group → no
    // pruning; z-order: most groups fall outside the band and are skipped
    assert(pFrac > 0.9, s"plain layout should read ~all groups, read $pFrac")
    assert(zFrac < 0.6, s"z-order should skip most groups, read $zFrac")
    assert(zFrac < pFrac * 0.65, s"z $zFrac vs plain $pFrac: no real pruning win")

    // and the ENGINE agrees with the footer prediction: the scan node's
    // output rows ≈ rows in surviving row groups (parquet's record-level
    // filter is off by default, so pruning is the only row reducer at the
    // scan) — the z-ordered scan must read far fewer rows for the same query
    def scanRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .filter(col("l_suppkey") >= lo && col("l_suppkey") <= hi)
      q.collect()
      val scans = q.queryExecution.executedPlan.collectLeaves()
      scans.flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
    }
    val zRead = scanRows(s"$base/z")
    val pRead = scanRows(s"$base/plain")
    assert(pRead > (n * 0.9).toLong, s"plain scan should read ~everything: $pRead of $n")
    assert(zRead < (n * 0.6).toLong, s"z scan should skip most rows: $zRead of $n")
    assert(zRead.toDouble / pRead < 0.65,
      s"engine-measured pruning win missing: z=$zRead plain=$pRead")
  }

  test("ANN serving layout: the shortlist re-rank lookup skips row groups (footers + engine agree)") {
    import graft.operators.Similarity
    val base = Files.createTempDirectory("graft-serving").toString
    val dir = "/root/testdata/sf0.01"
    // file cap 20 → pruning-grade granularity at this 500-vector corpus
    // (the writer's docstring explains why the byte budget alone is too
    // coarse at test scale; at real scale the shortlist:corpus ratio is
    // ~50 : 25B and whole-group survival is the rare case)
    Similarity.writeFloatServingLayout(spark, dir, s"$base/floats",
      maxRecordsPerFile = 20L)
    val n = Tables.embeddings(spark, dir).count()
    val stats = Layout.rowGroupStats(spark, s"$base/floats", Seq("vec_id"))
    assert(stats.map(_.rows).sum == n, "footer rows must conserve the corpus")
    assert(stats.length >= 16, s"want many prunable groups, got ${stats.length}")

    // a REAL serving shortlist: the quantized path's own top-k ids
    val ids = Similarity.ivfQTopK(spark, dir, nQueries = 3, k = 3).collect()
      .map(_.getAs[Long]("vec_id")).distinct.toSeq
    assert(ids.nonEmpty && ids.length <= 9, s"shortlist bound blown: ${ids.length}")

    // footer prediction: a group survives iff it can hold a shortlist id
    val surviving = stats.filter(s => ids.exists(id => id >= s.min && id <= s.max))
    val skipped = stats.length - surviving.length
    assert(skipped > 0,
      s"no skippable groups (${surviving.length}/${stats.length} survive) — layout too coarse")
    assert(surviving.length.toDouble / stats.length < 0.6,
      s"serving layout should skip most groups: ${surviving.length}/${stats.length} survive")

    // the ENGINE agrees: with the In predicate pushed (threshold raised to
    // the shortlist bound), the scan reads only surviving groups' rows
    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "512")
    try {
      val q = Similarity.shortlistFloats(spark, s"$base/floats", ids)
      assert(q.collect().map(_.getAs[Long]("vec_id")).toSet == ids.toSet,
        "lookup must return exactly the shortlist rows")
      val scanRead = q.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
      val bound = surviving.map(_.rows).sum
      assert(scanRead <= bound,
        s"scan read $scanRead rows > footer-predicted bound $bound")
      assert(scanRead < n * 6 / 10,
        s"scan read $scanRead of $n rows — row-group skipping not happening")
    } finally spark.conf.unset("spark.sql.parquet.pushdown.inFilterThreshold")
  }

  test("csv ingest: schema enforced, malformed rows dead-letter with raw text") {
    import graft.sources.Formats
    val d = Files.createTempDirectory("graft-csv").toString
    val lines = Seq(
      "event_id,ts,user_id,event_type,value",
      "1,2026-01-01 00:00:00,10,click,1.5",
      "2,2026-01-01 00:00:01,11,view,2.0",
      "3,2026-01-01 00:00:02,12,purchase,0.25",
      "4,2026-01-01 00:00:03,13,error",          // wrong arity
      "5,not-a-timestamp,14,click,oops")         // two unparsable cells
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/events.csv"),
      lines.mkString("\n").getBytes)
    val (nGood, nDead) = Formats.ingest(
      Formats.eventsCsv(spark, s"$d/events.csv"), s"$d/good", s"$d/dead")
    assert((nGood, nDead) == (3L, 2L))
    val good = spark.read.parquet(s"$d/good").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value"))).sorted.toSeq
    assert(good == Seq((1L, "click", 1.5), (2L, "view", 2.0), (3L, "purchase", 0.25)))
    val dead = spark.read.parquet(s"$d/dead").collect()
      .map(_.getAs[String]("raw")).sorted.toSeq
    assert(dead == Seq("4,2026-01-01 00:00:03,13,error",
      "5,not-a-timestamp,14,click,oops"))
  }

  test("jsonl ingest: malformed json and type mismatches dead-letter, not throw") {
    import graft.sources.Formats
    val d = Files.createTempDirectory("graft-jsonl").toString
    val lines = Seq(
      """{"event_id":1,"ts":"2026-01-01 00:00:00","user_id":10,"event_type":"click","value":1.5}""",
      """{"event_id":2,"ts":"2026-01-01 00:00:01","user_id":11,"event_type":"view","value":2.0}""",
      """{"event_id":3,"ts":"2026-01-01 00:00:02","user_id":"not-a-long","event_type":"view","value":3.0}""",
      """{"event_id":4,"broken json""")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/events.jsonl"),
      lines.mkString("\n").getBytes)
    val (nGood, nDead) = Formats.ingest(
      Formats.eventsJsonl(spark, s"$d/events.jsonl"), s"$d/good", s"$d/dead")
    assert((nGood, nDead) == (2L, 2L))
    val good = spark.read.parquet(s"$d/good").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("value"))).sorted.toSeq
    assert(good == Seq((1L, 1.5), (2L, 2.0)))
    // every dead row keeps its raw line for replay
    assert(spark.read.parquet(s"$d/dead").collect()
      .forall(_.getAs[String]("raw").nonEmpty))
  }

  test("orc roundtrip preserves every event column bit-for-bit") {
    val d = Files.createTempDirectory("graft-orc-spec").toString
    val src = Tables.events(spark, sf)
    src.write.orc(s"$d/events.orc")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
      .sortBy(_._1).toSeq
    assert(key(spark.read.orc(s"$d/events.orc")) == key(src))
  }
}
