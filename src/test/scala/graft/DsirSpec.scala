package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance resampling (C57) — rows-only gate entry, so semantics
  * are pinned here: planted-dialect recovery, map-side fold = explode-join
  * twin, determinism, and edge inputs. */
class DsirSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  // target dialect: docs of {alpha beta gamma ...}; raw dialect: {xx yy zz}.
  // Candidates 100+ are target-LIKE, 200+ are raw-like.
  private def plantedDocs = {
    val target = (1L to 8L).map(i =>
      (i, s"alpha beta gamma delta epsilon word$i", "en", "tgt"))
    val likeTarget = (101L to 108L).map(i =>
      (i, s"alpha beta gamma delta other$i", "en", "raw"))
    val likeRaw = (201L to 208L).map(i =>
      (i, s"xx yy zz ww vv item$i", "en", "raw"))
    (target ++ likeTarget ++ likeRaw)
      .toDF("doc_id", "text", "lang", "source")
  }

  test("dsir: compiled bucket kernel equals the declarative Murmur3 featurization") {
    // hash parity proof: the kernel must reproduce pmod(hash(f), B) —
    // Spark's Murmur3 seed 42 over UTF-8 bytes — bucket-for-bucket, in
    // unigrams-then-bigrams order, on REAL corpus text
    val docs = Tables.documents(spark, sf).filter(col("text").isNotNull).limit(200)
    val both = docs.select(
      graft.functions.TextHashExpressions.dsirBuckets(col("text"), 4096).as("k"),
      Dsir.featureBucketsDeclarative(4096).as("d")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[Int](0) == r.getSeq[Int](1), "kernel/declarative bucket drift")
    }
  }

  test("dsir: target-like candidates outscore and outrank raw-like ones") {
    val out = Dsir.dsirSelectOf(plantedDocs, col("source") === "tgt",
      nBuckets = 512, nSelect = 8).collect()
    // only the 16 candidates are scored (target docs are the model, not
    // candidates)
    assert(out.length == 16)
    val byId = out.map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Double]("logw"), r.getAs[Boolean]("kept")))).toMap
    val tMin = (101L to 108L).map(byId(_)._1).min
    val rMax = (201L to 208L).map(byId(_)._1).max
    assert(tMin > rMax,
      s"every target-like logw ($tMin) must beat every raw-like ($rMax)")
    // with nSelect = 8 and a wide logw gap, Gumbel noise cannot flip the
    // selection: exactly the 8 target-like docs are kept
    assert((101L to 108L).forall(byId(_)._2))
    assert((201L to 208L).forall(!byId(_)._2))
  }

  test("dsir: map-side fold equals the explode-join scoring twin") {
    val fold = Dsir.dsirSelectOf(plantedDocs, col("source") === "tgt",
      nBuckets = 512, nSelect = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    val naive = Dsir.naiveLogw(plantedDocs, col("source") === "tgt", nBuckets = 512)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    assert(fold.keySet == naive.keySet && fold.nonEmpty)
    fold.foreach { case (id, w) =>
      assert(math.abs(w - naive(id)) <= 1e-9, s"doc $id: $w vs ${naive(id)}")
    }
  }

  test("dsir: deterministic across runs; global rank is a permutation") {
    val a = Dsir.dsirSelect(spark, sf, nBuckets = 1024, nSelect = 20).collect()
    val b = Dsir.dsirSelect(spark, sf, nBuckets = 1024, nSelect = 20).collect()
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(key(a) == key(b) && a.nonEmpty)
    val rnks = a.map(_.getAs[Long]("rnk")).sorted
    assert(rnks.toSeq == (1L to a.length).toSeq, "ranks must be 1..n exactly")
    assert(a.count(_.getAs[Boolean]("kept")) == math.min(20, a.length))
  }

  test("dsir store round trip: incremental scoring is bit-equal to the in-train run") {
    val store = java.nio.file.Files.createTempDirectory("graft-dsir-store").toString
    Dsir.writeDsirStore(plantedDocs, col("source") === "tgt", store, nBuckets = 512)
    val incr = Dsir.dsirScoreIncremental(
      plantedDocs.filter(col("source") === "raw"), store)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    val full = Dsir.dsirSelectOf(plantedDocs, col("source") === "tgt",
      nBuckets = 512, nSelect = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    assert(incr.size == 16 && incr == full,
      "stored-count λ + same fold must reproduce the in-train logw bitwise")
  }

  test("dsir store: counts are mergeable integers (two half-censuses sum to the full)") {
    val spark2 = spark
    import spark2.implicits._
    val s1 = java.nio.file.Files.createTempDirectory("graft-dsir-m1").toString
    val s2 = java.nio.file.Files.createTempDirectory("graft-dsir-m2").toString
    val half1 = plantedDocs.filter(col("doc_id") <= 104L)
    val half2 = plantedDocs.filter(col("doc_id") > 104L)
    Dsir.writeDsirStore(half1, col("source") === "tgt", s1, nBuckets = 256)
    Dsir.writeDsirStore(half2, col("source") === "tgt", s2, nBuckets = 256)
    val merged = spark.read.parquet(s"$s1/counts.parquet")
      .unionByName(spark.read.parquet(s"$s2/counts.parquet"))
      .groupBy("b").agg(sum("cp").as("cp"), sum("cq").as("cq"))
      .collect().map(r => r.getAs[Int]("b") ->
        ((r.getAs[Long]("cp"), r.getAs[Long]("cq")))).toMap
    val fullStore = java.nio.file.Files.createTempDirectory("graft-dsir-mf").toString
    Dsir.writeDsirStore(plantedDocs, col("source") === "tgt", fullStore, nBuckets = 256)
    val full = spark.read.parquet(s"$fullStore/counts.parquet")
      .collect().map(r => r.getAs[Int]("b") ->
        ((r.getAs[Long]("cp"), r.getAs[Long]("cq")))).toMap
    assert(merged == full)
  }

  test("dsir: single-token and empty-target edges don't crash or misrank") {
    val docs = Seq(
      (1L, "solo", "en", "tgt"),
      (2L, "uno", "en", "raw"),
      (3L, (null: String), "en", "raw"),
      (4L, "alpha beta", "en", "raw")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Dsir.dsirSelectOf(docs, col("source") === "tgt",
      nBuckets = 64, nSelect = 1).collect()
    // null text excluded; target doc not a candidate
    assert(out.map(_.getAs[Long]("doc_id")).toSet == Set(2L, 4L))
    assert(out.count(_.getAs[Boolean]("kept")) == 1)
  }
}
