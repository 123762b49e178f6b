package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSuite {

  test("q1 aggregates reconcile with raw lineitem") {
    val out = Analytics.q1Pricing(spark, sf).collect()
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
    assert(out.map(_.getAs[Long]("count_order")).sum == li.count())
    val totalQty = li.agg(sum(col("l_quantity"))).head().getDouble(0)
    assert(math.abs(out.map(_.getAs[Double]("sum_qty")).sum - totalQty) < 1e-6)
  }

  test("semi + anti join partition the customer table for unfiltered orders") {
    val semi = Analytics.semiJoin(spark, sf).count()
    val cust = Tables.customer(spark, sf).count()
    // anti joins on orders > 400k; reconcile directly
    val anti = Analytics.antiJoin(spark, sf).count()
    val withBig = Tables.customer(spark, sf).join(
      Tables.orders(spark, sf).filter(col("o_totalprice") > 400000.0).select("o_custkey"),
      col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(anti + withBig == cust)
    assert(semi <= cust)
  }

  test("cube partial-agg-before-expand ≡ naive single-pass cube (values + gid)") {
    import org.apache.spark.sql.types.DecimalType
    import graft.functions.Cols.dsum
    // the shape the r9 plan used: expand every scan row 4×, aggregate once
    val naive = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .cube("l_returnflag", "l_linestatus")
      .agg(grouping_id().as("gid"), dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("gid"), col("sum_qty"), col("n_lines"))
    val opt = Analytics.cubeFlags(spark, sf)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("returnflag"), r.getAs[String]("linestatus"), r.getAs[Long]("gid"))
    val a = naive.collect().map(r => key(r) -> (r.getAs[Double]("sum_qty"), r.getAs[Long]("n_lines"))).toMap
    val b = opt.collect().map(r => key(r) -> (r.getAs[Double]("sum_qty"), r.getAs[Long]("n_lines"))).toMap
    assert(a.keySet == b.keySet)
    // decimal re-summation is exact, so doubles must be BIT-identical
    a.foreach { case (k, v) => assert(b(k) == v, s"cell $k: naive=$v opt=${b(k)}") }
  }

  test("rollup contains per-group, subtotal and grand-total rows") {
    val out = Analytics.rollupFlags(spark, sf).collect()
    val grand = out.filter(r => r.getAs[String]("returnflag") == "ALL" &&
      r.getAs[String]("linestatus") == "ALL")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_lines") == Tables.lineitem(spark, sf).count())
    val subtotals = out.filter(r => r.getAs[String]("returnflag") != "ALL" &&
      r.getAs[String]("linestatus") == "ALL")
    assert(subtotals.nonEmpty)
  }

  test("window running sum is monotone per customer") {
    val rows = Analytics.windowRunning(spark, sf)
      .orderBy("o_custkey", "order_day", "o_orderkey").collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val sums = rs.map(_.getAs[Double]("cum_spend"))
      assert(sums.sliding(2).forall { case Array(a, b) => b >= a; case _ => true })
    }
  }

  test("topk parts are the true top by revenue") {
    val topk = Analytics.topkParts(spark, sf, 3).collect().map(_.getAs[Double]("revenue"))
    assert(topk.length == 3 && topk.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("qaConstraints: planted violations report exact fractions, clean corpus passes") {
    import SparkSuite.spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-qa").toString
    val t = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    Seq(
      (Some(1L), t, Some(10L), "click", 1.0),
      (Some(1L), t, Some(10L), "view", 2.0),     // duplicate event_id
      (Some(2L), t, None, "bogus", -3.0),        // null user, bad type, neg value
      (Some(3L), t, Some(11L), "purchase", 0.5))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    Seq((100L, 1L, 10.0), (100L, 1L, 20.0),      // duplicate o_orderkey
      (101L, 999L, 30.0),                        // orphan custkey
      (102L, 2L, 0.0))                           // non-positive price
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.parquet(s"$d/orders.parquet")
    Seq(1L, 2L).toDF("c_custkey").write.parquet(s"$d/customer.parquet")
    Seq((100L, 5.0, "A"), (100L, 99.0, "N"),     // quantity out of range
      (999L, 10.0, "X"))                         // orphan orderkey + bad flag
      .toDF("l_orderkey", "l_quantity", "l_returnflag")
      .write.parquet(s"$d/lineitem.parquet")
    Seq((1L, Some("ok")), (2L, Some("")), (3L, Option.empty[String]))
      .toDF("doc_id", "text").write.parquet(s"$d/documents.parquet")
    val out = Analytics.qaConstraints(spark, d).collect()
      .map(r => r.getAs[String]("check_name") ->
        (r.getAs[Double]("metric"), r.getAs[Boolean]("passed"))).toMap
    assert(out.size == 12)
    assert(out("events.event_id.unique") == (0.25, false))
    assert(out("events.event_id.complete") == (0.0, true))
    assert(out("events.user_id.complete") == (0.25, false))
    assert(out("events.event_type.in_domain") == (0.25, false))
    assert(out("events.value.non_negative") == (0.25, false))
    assert(out("orders.o_orderkey.unique") == (0.25, false))
    assert(out("orders.o_totalprice.positive") == (0.25, false))
    assert(out("orders.o_custkey.refs_customer") == (0.25, false))
    assert(out("lineitem.l_quantity.in_range") == (1.0 / 3, false))
    assert(out("lineitem.l_returnflag.in_domain") == (1.0 / 3, false))
    assert(out("lineitem.l_orderkey.refs_orders") == (1.0 / 3, false))
    assert(out("documents.text.complete") == (2.0 / 3, false))
    // the real corpus is constraint-clean end to end
    val clean = Analytics.qaConstraints(spark, sf).collect()
    assert(clean.length == 12 && clean.forall(_.getAs[Boolean]("passed")))
  }

  test("keySkew: census reconciles with a direct groupBy; skew >= 1 and bounded") {
    import org.apache.spark.sql.functions._
    val out = Analytics.keySkew(spark, sf).collect()
      .map(r => r.getAs[String]("entity") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
          r.getAs[Long]("max_count"), r.getAs[String]("top_key"),
          r.getAs[Double]("skew")))).toMap
    assert(out.size == 4)
    out.foreach { case (e, (nRows, nKeys, maxC, _, skew)) =>
      assert(nKeys >= 1 && nKeys <= nRows, s"$e: $nKeys keys / $nRows rows")
      assert(maxC >= 1 && maxC <= nRows, e)
      // skew = max/mean: >= 1 always, = n_keys iff one key owns everything
      assert(skew >= 1.0 - 1e-9 && skew <= nKeys.toDouble + 1e-9, s"$e skew $skew")
    }
    // reconcile one entity against a direct census
    val direct = graft.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")), count(lit(1)), max(col("c"))).head()
    val (nR, nK, mC, _, _) = out("events.user_id")
    assert(nR == direct.getLong(0) && nK == direct.getLong(1) && mC == direct.getLong(2))
  }

  test("columnProfile: nulls and exact distincts reconcile against planted data") {
    import org.apache.spark.sql.functions._
    val out = Analytics.columnProfile(spark, sf).collect()
      .map(r => (r.getAs[String]("entity"), r.getAs[String]("column")) ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
          r.getAs[Long]("n_distinct")))).toMap
    assert(out.size == 9)
    // reconcile one column per table against direct queries
    val ev = graft.Tables.events(spark, sf)
    assert(out(("events", "user_id")) ==
      ((ev.count(), 0L, ev.select(countDistinct(col("user_id"))).head.getLong(0))))
    val docs = graft.Tables.documents(spark, sf)
    assert(out(("documents", "text"))._3 ==
      docs.select(countDistinct(col("text"))).head.getLong(0))
    // invariants: nulls <= rows, distinct <= rows - nulls (or 0 for all-null)
    out.values.foreach { case (n, nn, nd) =>
      assert(nn >= 0 && nn <= n && nd <= n - nn + (if (n == nn) 0 else 0)) }
  }

  test("snapshotDiff: planted added/changed rows surface with old/new state; unchanged suppressed") {
    import SparkSuite.spark.implicits._
    val B = 1700000000000L
    // span [B, B+1000000] ⇒ mid = B+500000:
    //   u1: one pre-mid event only            → latest unchanged → suppressed
    //   u2: pre-mid click, post-mid purchase  → changed, both states visible
    //   u3: post-mid only                     → added
    val rows = Seq(
      (1L, new java.sql.Timestamp(B), 1L, "click", 1.0),
      (2L, new java.sql.Timestamp(B + 1), 2L, "click", 1.5),
      (3L, new java.sql.Timestamp(B + 1000000L - 1), 2L, "purchase", 2.5),
      (4L, new java.sql.Timestamp(B + 1000000L), 3L, "view", 3.0))
    val d = java.nio.file.Files.createTempDirectory("graft-snapdiff").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$d/events.parquet")
    val out = Analytics.snapshotDiff(spark, d).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out.keySet == Set(2L, 3L)) // u1 unchanged ⇒ absent
    val c = out(2L)
    assert(c.getAs[String]("status") == "changed")
    assert(c.getAs[String]("old_type") == "click" &&
      c.getAs[Double]("old_value") == 1.5)
    assert(c.getAs[String]("new_type") == "purchase" &&
      c.getAs[Double]("new_value") == 2.5)
    assert(c.getAs[Long]("old_ts_ms") == B + 1 &&
      c.getAs[Long]("new_ts_ms") == B + 1000000L - 1)
    val a = out(3L)
    assert(a.getAs[String]("status") == "added")
    assert(a.isNullAt(a.fieldIndex("old_ts_ms")))
    assert(a.getAs[String]("new_type") == "view" &&
      a.getAs[Double]("new_value") == 3.0)
  }

  test("reconcile: planted header/detail drift is flagged; exact totals read delta 0") {
    import SparkSuite.spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-recon").toString
    Seq((1L, 330.0), (2L, 150.0), (3L, 42.0))
      .toDF("o_orderkey", "o_totalprice").write.parquet(s"$d/orders.parquet")
    Seq((1L, 100.0, 0.1, 0.0), (1L, 200.0, 0.1, 0.0), // 110 + 220 = header
      (2L, 100.0, 0.0, 0.0))                          // header says 150
      .toDF("l_orderkey", "l_extendedprice", "l_tax", "l_discount")
      .write.parquet(s"$d/lineitem.parquet")
    val out = Analytics.reconcile(spark, d).collect()
      .map(r => r.getAs[String]("status") -> r).toMap
    val m = out("matched")
    assert(m.getAs[Long]("n_orders") == 2L)
    assert(m.getAs[Long]("n_mismatch") == 1L)
    assert(m.getAs[Double]("max_abs_delta") == 50.0)
    assert(m.getAs[Double]("sum_delta") == 50.0)
    val nl = out("no_lineitems")
    assert(nl.getAs[Long]("n_orders") == 1L && nl.getAs[Long]("n_mismatch") == 0L)
    assert(nl.isNullAt(nl.fieldIndex("max_abs_delta")))
    // real corpus: status counts cover every order exactly once
    val real = Analytics.reconcile(spark, sf).collect()
    val total = real.map(_.getAs[Long]("n_orders")).sum
    assert(total == graft.Tables.orders(spark, sf).count())
  }

  test("benford: digit histogram matches a direct first-digit count; expectations are the Benford masses") {
    val got = Analytics.benford(spark, sf).collect()
    def hist(vs: Array[Double]): Map[Int, Long] =
      vs.flatMap(v => v.toString.find(c => c >= '1' && c <= '9'))
        .groupBy(_.asDigit).map { case (d, a) => d -> a.length.toLong }
    val ref = Map(
      "o_totalprice" -> hist(graft.Tables.orders(spark, sf)
        .select("o_totalprice").collect().map(_.getDouble(0))),
      "l_extendedprice" -> hist(graft.Tables.lineitem(spark, sf)
        .select("l_extendedprice").collect().map(_.getDouble(0))))
    assert(got.map(_.getAs[String]("col_name")).toSet == ref.keySet)
    got.groupBy(_.getAs[String]("col_name")).foreach { case (c, rows) =>
      val counts = rows.map(r =>
        r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
      assert(counts == ref(c), s"$c histogram")
      val total = counts.values.sum
      rows.foreach { r =>
        assert(r.getAs[Double]("obs_frac") ==
          r.getAs[Long]("n").toDouble / total.toDouble)
        val d = r.getAs[Int]("digit")
        assert(math.abs(r.getAs[Double]("exp_frac") -
          math.log10(1.0 + 1.0 / d)) < 1e-9, s"$c digit $d")
        assert(r.getAs[Double]("dev") ==
          r.getAs[Double]("obs_frac") - r.getAs[Double]("exp_frac"))
      }
      // the nine Benford masses are a distribution
      val expSum = rows.map(_.getAs[Double]("exp_frac")).sum
      assert(rows.length <= 9 && (rows.length < 9 || math.abs(expSum - 1.0) < 1e-6))
    }
  }

  test("psi: identical halves read ~0/stable, a jumped distribution reads >0.25/shifted; totals reconcile") {
    import SparkSuite.spark.implicits._
    // type "same": the SAME value cycle in both halves (days 0..9 ref,
    // 10..19 cur); type "shift": second half jumps +200 — every current
    // row lands beyond the reference's top decile edge
    val rows =
      (for (d <- 0 until 20; i <- 1 to 50) yield
        (d * 1000L + i, new java.sql.Timestamp(d * 86400000L + i), i.toLong,
          "same", (i % 100).toDouble)) ++
      (for (d <- 0 until 20; i <- 1 to 50) yield
        (100000L + d * 1000L + i, new java.sql.Timestamp(d * 86400000L + i),
          i.toLong, "shift",
          (if (d < 10) i % 100 else 200 + i % 100).toDouble))
    val dir = java.nio.file.Files.createTempDirectory("graft-psi").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = Analytics.psi(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val same = got("same")
    assert(same.getAs[Long]("n_ref") == 500L && same.getAs[Long]("n_cur") == 500L)
    assert(math.abs(same.getAs[Double]("psi")) < 0.01, same.toString)
    assert(same.getAs[String]("band") == "stable")
    val shift = got("shift")
    assert(shift.getAs[Double]("psi") > 0.25, shift.toString)
    assert(shift.getAs[String]("band") == "shifted")
    // corpus run: totals cover every event exactly once; psi finite
    val corpus = Analytics.psi(spark, sf).collect()
    assert(corpus.nonEmpty)
    val covered = corpus.map(r =>
      r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")).sum
    assert(covered == graft.Tables.events(spark, sf).count())
    corpus.foreach(r => assert(!r.getAs[Double]("psi").isNaN))
  }

  test("benford MAD: reconciles with the digit census; verdict follows the published bands") {
    val mad = Analytics.benfordMad(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") -> r).toMap
    val byCol = Analytics.benford(spark, sf).collect()
      .groupBy(_.getAs[String]("col_name"))
    assert(mad.keySet == byCol.keySet)
    byCol.foreach { case (c, rows) =>
      val expect = rows.map(r => BigDecimal(math.abs(r.getAs[Double]("dev")))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / 9.0
      val m = mad(c)
      assert(math.abs(m.getAs[Double]("mad") - expect) < 1e-12, c)
      val v = m.getAs[String]("conformity")
      val e = m.getAs[Double]("mad") match {
        case x if x <= 0.006 => "close"
        case x if x <= 0.012 => "acceptable"
        case x if x <= 0.015 => "marginal"
        case _ => "nonconformity"
      }
      assert(v == e, s"$c: $v vs $e")
    }
  }

  test("snapshotDiff on the sf corpus: append-only source never reads 'removed'; changed rows advance in time") {
    val rows = Analytics.snapshotDiff(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val st = r.getAs[String]("status")
      assert(st == "added" || st == "changed", st)
      if (st == "changed")
        assert(r.getAs[Long]("new_ts_ms") > r.getAs[Long]("old_ts_ms"))
    }
  }

  test("calendar PSI: trailing week counted exactly; a last-week jump reads shifted where the steady type is stable") {
    import SparkSuite.spark.implicits._
    // 20 days (0..19); current window = days 13..19 (7 whole days off the
    // global max anchor). "same": one value cycle throughout; "jump":
    // values +200 in the trailing week only
    val rows =
      (for (d <- 0 until 20; i <- 1 to 50) yield
        (d * 1000L + i, new java.sql.Timestamp(d * 86400000L + i), i.toLong,
          "same", (i % 100).toDouble)) ++
      (for (d <- 0 until 20; i <- 1 to 50) yield
        (100000L + d * 1000L + i, new java.sql.Timestamp(d * 86400000L + i),
          i.toLong, "jump",
          (if (d < 13) i % 100 else 200 + i % 100).toDouble))
    val dir = java.nio.file.Files.createTempDirectory("graft-psical").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = Analytics.psiCalendar(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val same = got("same")
    assert(same.getAs[Long]("n_ref") == 650L && same.getAs[Long]("n_cur") == 350L)
    assert(math.abs(same.getAs[Double]("psi")) < 0.01, same.toString)
    assert(same.getAs[String]("band") == "stable")
    val jump = got("jump")
    assert(jump.getAs[Double]("psi") > 0.25, jump.toString)
    assert(jump.getAs[String]("band") == "shifted")
    // corpus run: every event lands in exactly one side; psi finite
    val corpus = Analytics.psiCalendar(spark, sf).collect()
    assert(corpus.nonEmpty)
    val covered = corpus.map(r =>
      r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")).sum
    assert(covered == graft.Tables.events(spark, sf).count())
    corpus.foreach(r => assert(!r.getAs[Double]("psi").isNaN))
  }

  test("ks: identical halves read tiny D, disjoint halves read D=1 and reject; every D equals the exact integer argmax") {
    import SparkSuite.spark.implicits._
    val rows =
      (for (d <- 0 until 20; i <- 1 to 50) yield
        (d * 1000L + i, new java.sql.Timestamp(d * 86400000L + i), i.toLong,
          "same", (i % 100).toDouble)) ++
      (for (d <- 0 until 20; i <- 1 to 50) yield
        (100000L + d * 1000L + i, new java.sql.Timestamp(d * 86400000L + i),
          i.toLong, "shift",
          (if (d < 10) i % 100 else 200 + i % 100).toDouble))
    val dir = java.nio.file.Files.createTempDirectory("graft-ks").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = Analytics.ks(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val same = got("same")
    assert(same.getAs[Long]("n_ref") == 500L && same.getAs[Long]("n_cur") == 500L)
    assert(same.getAs[Double]("d_stat") == 0.0) // identical value multisets
    assert(!same.getAs[Boolean]("reject"))
    val shift = got("shift")
    assert(shift.getAs[Double]("d_stat") == 1.0) // disjoint supports
    assert(shift.getAs[Boolean]("reject"))
    assert(shift.getAs[Double]("d_crit") ==
      1.358 * math.sqrt(1000.0 / (500.0 * 500.0)))
    // corpus: D replays the exact integer supremum computed directly
    val corpus = Analytics.ks(spark, sf).collect()
    assert(corpus.nonEmpty)
    val ev = graft.Tables.events(spark, sf)
      .select(col("event_type"), col("value"),
        graft.functions.Cols.tsMs(col("ts")).as("ms"))
      .withColumn("d", expr("ms div 86400000")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value"),
        r.getAs[Long]("d")))
    corpus.foreach { r =>
      val t = r.getAs[String]("event_type")
      val mine = ev.filter(_._1 == t)
      val mid = Math.floorDiv(mine.map(_._3).min + mine.map(_._3).max, 2L)
      val ref = mine.filter(_._3 <= mid).map(_._2).sorted
      val cur = mine.filter(_._3 > mid).map(_._2).sorted
      val (n, m) = (ref.length.toLong, cur.length.toLong)
      val points = (ref ++ cur).distinct.sorted
      val maxGap = points.map(v =>
        math.abs(ref.count(_ <= v) * m - cur.count(_ <= v) * n)).max
      assert(r.getAs[Double]("d_stat") ==
        maxGap.toDouble / (n * m).toDouble, s"type $t")
    }
  }

  test("chi2 cells: a planted weekday-only type earns the big residuals; marginals and the independence expectation are exact") {
    import SparkSuite.spark.implicits._
    // 14 days = two full epoch weeks. "uniform": 10/day every day;
    // "weekday": 20/day only on dows 1..5 (day_idx d has dow (d+4)%7)
    def dow(d: Int): Int = (d + 4) % 7
    val rows =
      (for (d <- 0 until 14; i <- 1 to 10) yield
        (d * 1000L + i, new java.sql.Timestamp(d * 86400000L + i), i.toLong,
          "uniform", 1.0)) ++
      (for (d <- 0 until 14; if dow(d) >= 1 && dow(d) <= 5; i <- 1 to 20)
        yield (100000L + d * 1000L + i,
          new java.sql.Timestamp(d * 86400000L + i), i.toLong,
          "weekday", 1.0))
    val dir = java.nio.file.Files.createTempDirectory("graft-chi2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val got = Analytics.chi2(spark, dir).collect()
    assert(got.length == 14) // 2 types x 7 dows, dense
    val byCell = got.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("dow")) -> r).toMap
    // observed: uniform 20/dow (2 weeks x 10), weekday 40 on 1..5, 0 else
    for (w <- 0L to 6L) {
      assert(byCell(("uniform", w)).getAs[Long]("observed") == 20L)
      val exp = byCell(("weekday", w))
      assert(exp.getAs[Long]("observed") == (if (w >= 1 && w <= 5) 40L else 0L))
    }
    // exact expectation: row x col / N, checked by hand
    val n = 140.0 + 200.0
    for (w <- 0L to 6L) {
      val col = 20.0 + (if (w >= 1 && w <= 5) 40.0 else 0.0)
      val u = byCell(("uniform", w))
      assert(u.getAs[Double]("expected") == 140.0 * col / n, s"dow $w")
      val v = byCell(("weekday", w))
      assert(v.getAs[Double]("expected") == 200.0 * col / n, s"dow $w")
      // contrib/resid are the published fixed trees over (O, E)
      val o = v.getAs[Long]("observed").toDouble
      val e = v.getAs[Double]("expected")
      assert(v.getAs[Double]("contrib") == (o - e) * (o - e) / e)
      assert(v.getAs[Double]("std_resid") == (o - e) / math.sqrt(e))
    }
    // weekend zero-cells of the weekday type read strongly negative
    assert(byCell(("weekday", 0L)).getAs[Double]("std_resid") < -2.0)
    assert(byCell(("weekday", 6L)).getAs[Double]("std_resid") < -2.0)
    // corpus run: dense grid, cells reconcile with the event total
    val corpus = Analytics.chi2(spark, sf).collect()
    val types = corpus.map(_.getAs[String]("event_type")).distinct.length
    assert(corpus.length == types * 7)
    assert(corpus.map(_.getAs[Long]("observed")).sum ==
      graft.Tables.events(spark, sf).count())
  }

  test("k-anonymity: customer row reconciles with an independent QI census; invariants hold for every entity") {
    val got = Analytics.kAnonymity(spark, sf).collect()
      .map(r => r.getAs[String]("entity") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_groups"),
          r.getAs[Long]("k_anon"), r.getAs[Long]("rows_lt_5"),
          r.getAs[Long]("rows_lt_10"), r.getAs[Long]("risky_bp")))).toMap
    assert(got.keySet == Set("customer", "orders", "supplier", "documents"))
    got.values.foreach { case (n, g, k, lt5, lt10, bp) =>
      assert(n > 0 && g > 0 && k >= 1 && lt5 <= lt10 && lt10 <= n)
      assert(bp == 10000L * lt5 / n)
    }
    // independent census for customer: group sizes by (nationkey, segment)
    val sizes = Tables.customer(spark, sf)
      .select(col("c_nationkey").cast("string").as("a"),
        col("c_mktsegment").cast("string").as("b"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).map(_._2.length.toLong).toSeq
    val want = (sizes.sum, sizes.length.toLong, sizes.min,
      sizes.filter(_ < 5).sum, sizes.filter(_ < 10).sum,
      10000L * sizes.filter(_ < 5).sum / sizes.sum)
    assert(got("customer") == want)
  }
}
