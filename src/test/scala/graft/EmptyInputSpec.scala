package graft

import java.nio.file.Files
import java.sql.Timestamp
import graft.operators.{Dedup, EventOps, Similarity, TextOps}
import graft.streaming.EventPipeline.Event

/** Operators must behave sanely on empty inputs (empty partitions are the
  * norm at scale: filters, late tails, new tenants). */
class EmptyInputSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-empty").toString
    Seq.empty[Event].toDF()
      .withColumnRenamed("ts", "ts") // keep schema
      .write.parquet(s"$d/events.parquet")
    Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("event operators yield empty results, not errors, on an empty table") {
    assert(EventOps.latestByKey(spark, dir).count() == 0)
    assert(EventOps.sessionize(spark, dir).count() == 0)
    assert(EventOps.rateLimit(spark, dir).count() == 0)
    assert(EventOps.lastN(spark, dir).count() == 0)
    assert(EventOps.asofErrorClick(spark, dir).count() == 0)
    assert(EventOps.funnel(spark, dir).count() == 0)
    assert(EventOps.patternMatch(spark, dir).count() == 0)
    assert(EventOps.patternDropout(spark, dir).count() == 0)
    assert(EventOps.sequenceMatch(spark, dir).count() == 0)
    assert(EventOps.markovChain(spark, dir).count() == 0)
    assert(EventOps.decayCounts(spark, dir).count() == 0)
    assert(EventOps.bursts(spark, dir).count() == 0)
    assert(EventOps.hourlyProfile(spark, dir).count() == 0)
    assert(EventOps.stickiness(spark, dir).count() == 0)
    assert(EventOps.madAlert(spark, dir).count() == 0)
    assert(EventOps.forecast(spark, dir).count() == 0)
    assert(EventOps.cusum(spark, dir).count() == 0)
    assert(EventOps.attributionLastTouch(spark, dir).count() == 0)
    assert(EventOps.attributionLinear(spark, dir).count() == 0)
    assert(EventOps.scd2Build(spark, dir).count() == 0)
    assert(EventOps.scd2Join(spark, dir).count() == 0)
    assert(EventOps.rfm(spark, dir).count() == 0)
    assert(EventOps.survival(spark, dir).count() == 0)
    assert(EventOps.experiment(spark, dir).count() == 0)
    assert(EventOps.concentration(spark, dir).count() == 0)
    assert(EventOps.gini(spark, dir).count() == 0)
    assert(EventOps.newVsReturning(spark, dir).count() == 0)
    assert(EventOps.cohortLtv(spark, dir).count() == 0)
    assert(EventOps.timeToConvert(spark, dir).count() == 0)
    assert(EventOps.dowAnomaly(spark, dir).count() == 0)
    assert(EventOps.boundedRetention(spark, dir).count() == 0)
    assert(EventOps.sloBurn(spark, dir).count() == 0)
    assert(EventOps.sessionFeatures(spark, dir).count() == 0)
    assert(EventOps.funnelLatency(spark, dir).count() == 0)
    assert(EventOps.valueTrend(spark, dir).count() == 0)
    assert(EventOps.funnelStages(spark, dir).count() == 0)
    assert(EventOps.bounceRate(spark, dir).count() == 0)
    assert(EventOps.purchaseCadence(spark, dir).count() == 0)
    assert(EventOps.streaks(spark, dir).count() == 0)
    assert(EventOps.audienceOverlap(spark, dir).count() == 0)
    assert(EventOps.growthAccounting(spark, dir).count() == 0)
    assert(EventOps.retentionTriangle(spark, dir).count() == 0)
    assert(TextOps.dupRate(spark, dir).count() == 0)
    assert(TextOps.langConfusion(spark, dir).count() == 0)
    assert(TextOps.compressRatio(spark, dir).count() == 0)
    assert(EventOps.wowChange(spark, dir).count() == 0)
    assert(EventOps.gapStats(spark, dir).count() == 0)
    assert(EventOps.silenceAlerts(spark, dir).count() == 0)
    assert(EventOps.trending(spark, dir).count() == 0)
    assert(EventOps.rollupStore(spark, dir).count() == 0)
    assert(EventOps.l28(spark, dir).count() == 0)
  }

  test("null text rows don't break the text/dedup kernels") {
    val d = Files.createTempDirectory("graft-nulls").toString
    Seq((0L, "some real text here", "en", "s", 19L),
      (1L, null.asInstanceOf[String], "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    assert(Dedup.minhashLsh(spark, d).count() == 0)   // null doc drops out
    assert(Dedup.simhashPairs(spark, d).count() == 0)
    // gopher battery: null text yields null metrics + null keep, not a crash
    val gr = TextOps.gopherRules(spark, d).collect()
    assert(gr.length == 2 && gr.exists(r => r.isNullAt(r.fieldIndex("keep"))))
    assert(TextOps.c4Clean(spark, d).count() == 2) // null text flows, no crash
    val toks = TextOps.tokenCount(spark, d).collect()
    assert(toks.length == 2)
    assert(toks.exists(_.isNullAt(1))) // null text -> null counts, not a crash
    // tokenBudget excludes the null-text doc (curate contract), never
    // silently loses it to a null join key mid-plan
    assert(TextOps.tokenBudget(spark, d).count() == 1)
    // exact dedup must NOT glue unknown-content docs into one NULL cluster
    assert(Dedup.exact(spark, d).count() == 1)
    // paraDedup keeps the doc with empty reassembled text (oracle-aligned)
    val para = Dedup.paraDedup(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap
    assert(para == Map(0L -> 1L, 1L -> 0L), s"para handling of null text: $para")
  }

  test("dedup and similarity yield empty results on empty corpora") {
    assert(Dedup.exact(spark, dir).count() == 0)
    assert(Dedup.minhashLsh(spark, dir).count() == 0)
    assert(Dedup.simhashPairs(spark, dir).count() == 0)
    assert(Dedup.keepList(spark, dir).count() == 0)
    assert(TextOps.tokenCount(spark, dir).count() == 0)
    assert(Similarity.cosineTopK(spark, dir).count() == 0)
    assert(Similarity.hammingTopK(spark, dir).count() == 0)
    assert(Similarity.mmrTopK(spark, dir).count() == 0)
    assert(Similarity.neardupPairs(spark, dir).count() == 0)
    assert(Similarity.drift(spark, dir).count() == 0)
    assert(TextOps.docDrift(spark, dir).count() == 0)
  }

  test("round-2 operators survive empty inputs") {
    assert(Dedup.winnowPairs(spark, dir).count() == 0)
    assert(Dedup.ngramJaccard(spark, dir).count() == 0)
    assert(Dedup.ngramContainment(spark, dir).count() == 0)
    assert(Similarity.lshNeardupPairs(spark, dir).count() == 0)
    assert(EventOps.retentionCohorts(spark, dir).count() == 0)
    assert(TextOps.tokenEntropy(spark, dir).count() == 0)
    assert(TextOps.policyFilter(spark, dir).count() == 0)
    assert(graft.operators.Sketches.exactQuantiles(spark, dir).count() == 0)
  }

  test("round-3 operators survive empty inputs") {
    import graft.operators.Analytics
    val dEmpty = {
      val d = Files.createTempDirectory("graft-empty-tpch").toString
      Seq.empty[(Long, Long, Long, Double, Double, Double, String, String, Timestamp)]
        .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus", "l_shipdate")
        .write.parquet(s"$d/lineitem.parquet")
      Seq.empty[(Long, Long, String, Double, Timestamp)]
        .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .write.parquet(s"$d/orders.parquet")
      Seq.empty[(Long, String, Long)].toDF("s_suppkey", "s_name", "s_nationkey")
        .write.parquet(s"$d/supplier.parquet")
      Seq.empty[(Long, String, String, Int, Double)]
        .toDF("p_partkey", "p_name", "p_type", "p_size", "p_retailprice")
        .write.parquet(s"$d/part.parquet")
      Seq.empty[(Long, String, Long)].toDF("n_nationkey", "n_name", "n_regionkey")
        .write.parquet(s"$d/nation.parquet")
      Seq.empty[(Long, String)].toDF("r_regionkey", "r_name")
        .write.parquet(s"$d/region.parquet")
      Seq.empty[(Long, Long)].toDF("c_custkey", "c_nationkey")
        .write.parquet(s"$d/customer.parquet")
      d
    }
    assert(Analytics.q21WaitingSuppliers(spark, dEmpty).count() == 0)
    assert(Analytics.q8MarketShare(spark, dEmpty).count() == 0)
    assert(Analytics.q9ProfitByNation(spark, dEmpty).count() == 0)
    // grouped cube of an empty input yields no rows (nothing to expand) —
    // matching DuckDB's GROUP BY CUBE on empty
    assert(Analytics.cubeFlags(spark, dEmpty).count() == 0)
    assert(Dedup.docContamination(spark, dir).count() == 0)
    assert(Dedup.decontamReport(spark, dir).count() == 0)
    assert(Dedup.decontamExact(spark, dir).count() == 0)
    assert(Dedup.decontamKeep(spark, dir).count() == 0)
    assert(TextOps.deterministicSplit(spark, dir).count() == 0)
    assert(TextOps.repetitionNgrams(spark, dir).count() == 0)
    assert(Analytics.benford(spark, dEmpty).count() == 0)
    assert(Analytics.benfordMad(spark, dEmpty).count() == 0)
  }

  test("round-4 operators survive empty inputs") {
    assert(EventOps.rangeJoinPriorHour(spark, dir).count() == 0)
    assert(EventOps.valueHistogram(spark, dir).count() == 0)
    assert(TextOps.piiScrub(spark, dir).count() == 0)
    assert(TextOps.stratifiedSample(spark, dir).count() == 0)
    assert(TextOps.bpePairs(spark, dir).count() == 0)
    assert(TextOps.shardAssign(spark, dir).count() == 0)
    assert(TextOps.vocab(spark, dir).count() == 0)
    assert(TextOps.lenDeciles(spark, dir).count() == 0)
    assert(TextOps.curate(spark, dir).count() == 0)
    assert(Dedup.dedupIncremental(spark, dir).count() == 0)
    assert(Dedup.minhashLshIncremental(spark, dir).count() == 0)
    assert(Dedup.keepListByQuality(spark, dir).count() == 0)
    assert(Similarity.embClusters(spark, dir).count() == 0)
    assert(Similarity.hardNegatives(spark, dir).count() == 0)
    assert(Similarity.embKeepList(spark, dir).count() == 0)
    assert(Dedup.paraDedup(spark, dir).count() == 0)
    assert(TextOps.tokenBudget(spark, dir).count() == 0)
    assert(EventOps.sessionWindowCounts(spark, dir).count() == 0)
    assert(TextOps.unigramLl(spark, dir).count() == 0)
    assert(Similarity.randomProject(spark, dir).count() == 0)
    assert(Similarity.embPca(spark, dir).count() == 0)
    assert(TextOps.sourceStats(spark, dir).count() == 0)
    assert(EventOps.topPaths(spark, dir).count() == 0)
    assert(EventOps.inactiveUsers(spark, dir).count() == 0)
    assert(EventOps.movingAvg(spark, dir).count() == 0)
    assert(EventOps.typeCooccurrence(spark, dir).count() == 0)
    assert(TextOps.topBigrams(spark, dir).count() == 0)
    assert(TextOps.fineWebRules(spark, dir).count() == 0)
    assert(TextOps.bigramLl(spark, dir).count() == 0)
    assert(TextOps.knLl(spark, dir).count() == 0)
    assert(TextOps.fertility(spark, dir).count() == 0)
    assert(TextOps.spanCorrupt(spark, dir).count() == 0)
  }

  test("round-5 operators survive empty inputs") {
    assert(TextOps.pack(spark, dir).count() == 0)
    assert(TextOps.mixture(spark, dir).count() == 0)
    assert(TextOps.epoch(spark, dir).count() == 0)
    assert(TextOps.epochShuffled(spark, dir).count() == 0)
    assert(TextOps.chunk(spark, dir).count() == 0)
    assert(Similarity.quantizeInt8(spark, dir).count() == 0)
    assert(Similarity.ivfQTopK(spark, dir).count() == 0)
    // incremental pack over an empty store and an empty batch
    val store = java.nio.file.Files.createTempDirectory("graft-pack-empty").toString
    TextOps.writePackStore(graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")), store)
    assert(TextOps.packIncremental(graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text")), store).count() == 0)
  }

  test("round-6 operators survive empty inputs") {
    assert(TextOps.bpeTrain(spark, dir).count() == 0)
    assert(TextOps.bpeEncode(spark, dir).count() == 0)
    assert(Dedup.dupSpans(spark, dir).count() == 0)
    assert(Similarity.lshNeardupPairsAuto(spark, dir).count() == 0)
    // empty corpus: no thresholds, no training set — heuristic passthrough
    // yields an EMPTY frame, not a percentile NPE or an LR fit crash
    assert(graft.operators.QualityModel.qualityModel(spark, dir).count() == 0)
    assert(Dedup.ngramJaccardAuto(spark, dir).count() == 0)
  }

  test("round-8 operators survive empty inputs") {
    assert(Similarity.mipsTopK(spark, dir).count() == 0)
    assert(Similarity.mipsIvfTopK(spark, dir).count() == 0)
    assert(Similarity.semDedup(spark, dir).count() == 0)
    assert(TextOps.mixtureTemp(spark, dir).count() == 0)
    assert(TextOps.pplBuckets(spark, dir).count() == 0)
    assert(TextOps.bm25Search(spark, dir).count() == 0)
    assert(TextOps.qlmSearch(spark, dir).count() == 0)
    assert(TextOps.hybridRrf(spark, dir).count() == 0)
    assert(TextOps.zipfFit(spark, dir).count() == 0)
    assert(TextOps.heapsCurve(spark, dir).count() == 0)
    assert(EventOps.cuped(spark, dir).count() == 0)
    assert(EventOps.power(spark, dir).count() == 0)
    assert(EventOps.changepoints(spark, dir).count() == 0)
    assert(graft.operators.Sketches.hllSliding(spark, dir).count() == 0)
    assert(graft.operators.Dsir.dsirSelect(spark, dir).count() == 0)
    assert(Similarity.knnGraph(spark, dir).count() == 0)
    assert(Similarity.knnGraphIvf(spark, dir).count() == 0)
    assert(Similarity.embPrototypes(spark, dir).count() == 0)
    assert(Similarity.embD4(spark, dir).count() == 0)
    assert(Similarity.labelProp(spark, dir).count() == 0)
    assert(Similarity.pageRank(spark, dir).count() == 0)
    assert(EventOps.msprt(spark, dir).count() == 0)
    assert(graft.operators.Sketches.heavyHitters(spark, dir).count() == 0)
    assert(EventOps.hwForecast(spark, dir).count() == 0)
    assert(TextOps.unigramTrain(spark, dir).count() == 0)
    assert(TextOps.unigramEncode(spark, dir).count() == 0)
    assert(graft.multimodal.Multimodal.phashPairs(
      graft.multimodal.Multimodal.mediaTable(spark, dir)).count() == 0)
    assert(TextOps.metricCorr(spark, dir).count() == 0)
    assert(TextOps.readability(spark, dir).count() == 0)
    assert(TextOps.pmiPairs(spark, dir).count() == 0)
    assert(EventOps.forecastBacktest(spark, dir).count() == 0)
    assert(EventOps.its(spark, dir).count() == 0)
    assert(EventOps.retentionFit(spark, dir).count() == 0)
    assert(EventOps.experimentSegments(spark, dir).count() == 0)
    assert(TextOps.tokCompare(spark, dir).count() == 0)
    assert(EventOps.seasonalDecompose(spark, dir).count() == 0)
    assert(TextOps.wordpieceTrain(spark, dir).count() == 0)
    assert(TextOps.wordpieceEncode(spark, dir).count() == 0)
    assert(TextOps.cdcDedup(spark, dir).count() == 0)
    assert(TextOps.cdcStats(spark, dir).count() == 0)
    // C111e lifecycle on an empty corpus: empty store, empty forget
    // report, compact a no-op, empty ingest report — never a crash
    locally {
      val t = Files.createTempDirectory("graft-cdcf-empty").toString
      TextOps.writeCdcStore(Tables.documents(spark, dir), t)
      assert(TextOps.cdcForget(Tables.documents(spark, dir), t).count() == 0)
      TextOps.cdcCompact(spark, t)
      assert(TextOps.cdcIngest(Tables.documents(spark, dir), t).count() == 0)
    }
    assert(graft.operators.Sketches.quantileSketch(spark, dir).count() == 0)
    assert(EventOps.seasonalStrength(spark, dir).count() == 0)
    assert(EventOps.acf(spark, dir).count() == 0)
    assert(graft.operators.Analytics.psi(spark, dir).count() == 0)
    assert(EventOps.seasonalAnomalies(spark, dir).count() == 0)
    assert(EventOps.pacf(spark, dir).count() == 0)
    assert(Similarity.rangeQuery(spark, dir).count() == 0)
    assert(EventOps.acfBands(spark, dir).count() == 0)
    assert(Dedup.minhashRecall(spark, dir).count() == 1) // one all-zero summary row
    assert(TextOps.filterAgreement(spark, dir).count() == 0)
    assert(TextOps.heldoutPpl(spark, dir).count() == 0)
    assert(TextOps.rankTau(spark, dir).count() == 0)
    assert(TextOps.weightedSample(spark, dir).count() == 0)
    assert(graft.operators.Analytics.snapshotDiff(spark, dir).count() == 0)
    assert(EventOps.ccf(spark, dir).count() == 0)
    assert(EventOps.meanShift(spark, dir).count() == 0)
    assert(graft.operators.Analytics.psiCalendar(spark, dir).count() == 0)
    assert(graft.operators.Analytics.chi2(spark, dir).count() == 0)
    assert(graft.operators.Sketches.thetaOverlap(spark, dir).count() == 0)
    assert(graft.operators.Sketches.thetaRollup(spark, dir).count() == 0)
    // A101c (ADVICE r10): per-type rows vanish, but the merged __all_types
    // row SURVIVES (an agg with no GROUP BY always yields one row) in the
    // exact regime with zero estimate and collapsed bars — pinned so the
    // empty-buffer serialization path can't drift silently
    val ciRows = graft.operators.Sketches.thetaCi(spark, dir).collect()
    assert(ciRows.length == 1, s"thetaCi on empty: ${ciRows.length} rows")
    assert(ciRows.head.getAs[String]("event_type") == "__all_types")
    assert(ciRows.head.getAs[Double]("estimate") == 0.0 &&
      ciRows.head.getAs[Double]("rse") == 0.0 &&
      ciRows.head.getAs[Double]("lo") == 0.0 &&
      ciRows.head.getAs[Double]("hi") == 0.0, s"${ciRows.head}")
    assert(graft.operators.Analytics.ks(spark, dir).count() == 0)
    assert(Similarity.triangles(spark, dir).count() == 0)
    assert(EventOps.assocRules(spark, dir).count() == 0)
    assert(EventOps.userEntropy(spark, dir).count() == 0)
    assert(EventOps.ewmaChart(spark, dir).count() == 0)
    assert(EventOps.tailIndex(spark, dir).count() == 0)
    assert(TextOps.lexicalDiversity(spark, dir).count() == 0)
    assert(EventOps.stationary(spark, dir).count() == 0)
    assert(EventOps.absorption(spark, dir).count() == 0)
    assert(Dedup.rougePairs(spark, dir).count() == 0)
    // r10 additions
    assert(TextOps.heldoutPpl(spark, dir, "b3").count() == 0)
    locally {
      val sd = Files.createTempDirectory("graft-empty-rgs").toString
      Dedup.writeSignatureStore(Tables.documents(spark, dir), sd)
      assert(Dedup.rougePairsFromStore(spark, dir, sd).count() == 0)
    }
    assert(Similarity.knnLabelEval(spark, dir).count() == 0)
    locally {
      val h = Seq.empty[(Long, Long)].toDF("media_id", "phash")
      assert(graft.multimodal.Multimodal.phashPairsRadius(h, 7).count() == 0)
      // the curve on an empty table: every radius row exists with the
      // defined recall-of-nothing = 1.0 (no silent empty frame)
      val curve = graft.multimodal.Multimodal.phashRecallCurve(h, 4).collect()
      assert(curve.length == 4 &&
        curve.forall(r => r.getAs[Long]("n_true") == 0 &&
          r.getAs[Double]("recall") == 1.0))
    }
  }

  test("single-class weak labels degrade to heuristic passthrough") {
    // every doc identical -> lo == hi == q, all labeled 1.0, one class:
    // training is impossible; the documented contract is label passthrough
    val d = Files.createTempDirectory("graft-oneclass").toString
    (0L until 5L).map(i => (i, "same text every time", "en", "s", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val r = graft.operators.QualityModel.qualityModel(spark, d)
      .collect().map(x => (x.getLong(0), x.getDouble(2))).toMap
    assert(r.size == 5 && r.values.forall(v => v == 1.0 || v == 0.0),
      s"passthrough scores: $r")
  }

  test("round-12 operators survive empty inputs") {
    assert(Similarity.centroidQuality(spark, dir).count() == 0)
    assert(Similarity.mmrSelect(spark, dir).count() == 0)
    assert(Similarity.lshBandCurve(spark, dir,
      simScales = Seq(0L, 1L << 20)).count() == 8) // 2 scales x 4 caps, n_true=0
    // k-anonymity over fully-empty tables: zero audit rows (matching the
    // oracle's GROUP BY on empty), never a null-filled aggregate row
    val dEmpty = {
      val d = Files.createTempDirectory("graft-empty-kanon").toString
      Seq.empty[(Long, Long, String)]
        .toDF("c_custkey", "c_nationkey", "c_mktsegment")
        .write.parquet(s"$d/customer.parquet")
      Seq.empty[(Long, String, String, Timestamp)]
        .toDF("o_orderkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
        .write.parquet(s"$d/orders.parquet")
      Seq.empty[(Long, Long)].toDF("s_suppkey", "s_nationkey")
        .write.parquet(s"$d/supplier.parquet")
      Seq.empty[(Long, String, String, String, Long)]
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$d/documents.parquet")
      d
    }
    assert(graft.operators.Analytics.kAnonymity(spark, dEmpty).count() == 0)
  }
}
