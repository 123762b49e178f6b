package graft

import graft.operators.QualityModel

/** Model-based quality scoring (C55): on a corpus with a clean/garbage
  * split the weak-label bootstrap must train a classifier that separates
  * the two populations by probability — including docs the weak labels
  * never covered (the middle band the heuristic was unsure about). */
class QualityModelSpec extends SparkSuite {
  import SparkSuite.spark.implicits._

  // Populations follow the HEURISTIC's notion of quality (the contract is
  // "distill the heuristic, then generalize"): good = long, content-dense
  // (length prior high, stopword ratio ~0); bad = short, stopword-heavy.
  // Both clusters share population-level vocabulary (so hashed bag-of-words
  // can generalize) and vary in length (so the percentile thresholds land
  // INSIDE the clusters, leaving a middle band unlabeled).
  private val pool = Seq("spark", "query", "table", "window", "batch",
    "stream", "column", "filter", "join", "merge", "shard", "token",
    "vector", "index", "bucket", "hash", "scan", "sort", "group", "range",
    "count", "score", "model", "train", "learn", "build", "write", "read",
    "cache", "plan")
  private val stops = Seq("the", "of", "and", "a", "to", "in", "is", "it")
  private def goodDoc(i: Int): String =
    (0 until 60 + i).map(j => pool((i * 7 + j) % pool.size)).mkString(" ")
  private def badDoc(i: Int): String =
    (0 until 20 + i).map(j =>
      if (j % 7 == 6) s"x${i}y$j" else stops((i + j) % stops.size))
      .mkString(" ")

  test("bootstrap classifier separates clean from garbage docs") {
    val docs = ((0 until 30).map(i => (i.toLong, goodDoc(i))) ++
      (0 until 30).map(i => (100L + i, badDoc(i)))).toDF("doc_id", "text")
    val scored = QualityModel.qualityModelOf(docs, dim = 4096,
      headTail = 0.3, maxIter = 25).collect()
    val byId = scored.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId.size == 60)
    val good = (0 until 30).map(i => byId(i.toLong))
    val bad = (0 until 30).map(i => byId(100L + i))
    assert(good.min > bad.max, s"overlap: min good ${good.min} <= max bad ${bad.max}")
    assert(good.sum / 30 > 0.8 && bad.sum / 30 < 0.2)
    // weak labels covered only the confident head/tail, yet every doc is scored
    val labeled = scored.filter(!_.isNullAt(1))
    assert(labeled.length < 60 && labeled.length >= 30)
    // and the labels the model DID train on are respected
    labeled.foreach { r =>
      val (l, p) = (r.getDouble(1), r.getDouble(2))
      assert(if (l == 1.0) p > 0.5 else p < 0.5)
    }
  }

  test("all-OOV unlabeled docs score exactly sigmoid(intercept) — equal") {
    // mid-band docs (30/25 content tokens → q between the thresholds) stay
    // out of the training split, so their tokens are out-of-vocabulary;
    // the codegen fold must give them zero contribution, i.e. both score
    // precisely sigmoid(intercept)
    val mid1 = (0 until 30).map(j => s"aa$j").mkString(" ")
    val mid2 = (0 until 25).map(j => s"bb$j").mkString(" ")
    val docs = ((0 until 20).map(i => (i.toLong, goodDoc(i))) ++
      (0 until 20).map(i => (100L + i, badDoc(i))) ++
      Seq((998L, mid1), (999L, mid2))).toDF("doc_id", "text")
    val scored = QualityModel.qualityModelOf(docs, 4096, 0.3, 25)
      .collect().map(r => (r.getLong(0), (r.isNullAt(1), r.getDouble(2)))).toMap
    assert(scored(998L)._1 && scored(999L)._1, "mid docs must be unlabeled")
    assert(scored(998L)._2 == scored(999L)._2,
      s"OOV docs diverged: ${scored(998L)._2} vs ${scored(999L)._2}")
  }

  test("bigram features separate order; the unigram model is provably blind") {
    // one 12-word phrase; class signal carried ONLY by word order:
    //  - labeled good docs: phrase in A-order, long, no stopwords (q high)
    //  - labeled bad docs: phrase REVERSED + stopwords, short (q low)
    //  - unlabeled mid docs: the same 12 content unigrams, NO stopwords —
    //    identical token MULTISETS in A-order vs reversed, so a unigram
    //    bag gives them bit-equal scores, while bigrams assign each to
    //    the class whose order it shares
    val phrase = Seq("spark", "query", "table", "window", "batch", "stream",
      "column", "filter", "join", "merge", "shard", "token")
    val fwd = phrase.mkString(" ")
    val rev = phrase.reverse.mkString(" ")
    // classes differ by LENGTH alone (q = len/100, no stopwords anywhere),
    // so every content unigram appears in BOTH classes and only the
    // phrase's ORDER is categorically class-bound
    val goodTrain = (0 until 20).map(i =>
      (i.toLong, Seq.fill(6)(fwd).mkString(" ")))
    val badTrain = (0 until 20).map(i =>
      (100L + i, Seq.fill(2)(rev).mkString(" ")))
    val mids = Seq((500L, Seq.fill(3)(fwd).mkString(" ")),
      (501L, Seq.fill(3)(rev).mkString(" ")))
    val docs = (goodTrain ++ badTrain ++ mids).toDF("doc_id", "text")
    def run(bi: Boolean) = QualityModel
      .qualityModelOf(docs, 4096, 0.3, 25, bigrams = bi)
      .collect().map(r => (r.getLong(0), (r.isNullAt(1), r.getDouble(2)))).toMap
    val uni = run(false)
    val big = run(true)
    // mid docs must be unlabeled in both runs (the heuristic can't see order)
    assert(uni(500L)._1 && uni(501L)._1 && big(500L)._1 && big(501L)._1)
    // unigram bag: equal multisets -> EXACTLY equal scores
    assert(uni(500L)._2 == uni(501L)._2,
      s"unigram model saw order: ${uni(500L)._2} vs ${uni(501L)._2}")
    // bigrams: A-order mid scores with the good class, reversed with bad
    assert(big(500L)._2 > big(501L)._2 + 0.3,
      s"bigram model failed to separate order: ${big(500L)._2} vs ${big(501L)._2}")
  }

  test("persisted model: store round-trip scores equal the in-train run") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("graft-qmodel").toString
    val docs = ((0 until 25).map(i => (i.toLong, goodDoc(i))) ++
      (0 until 25).map(i => (100L + i, badDoc(i)))).toDF("doc_id", "text")
    QualityModel.writeQualityModel(docs, store, dim = 2048, maxIter = 20)
    // scoring the SAME corpus through the store must reproduce the
    // in-train p_good bit-for-bit (identical vocab/coefs/fold)
    val inTrain = QualityModel.qualityModelOf(docs, 2048, 0.3, 20)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val viaStore = QualityModel.qualityScoreIncremental(docs, store)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaStore == inTrain)
    // a NEW batch (unseen docs, population-shaped) scores on the right
    // side of 0.5 without any retraining
    val batch = Seq((900L, goodDoc(77)), (901L, badDoc(88)))
      .toDF("doc_id", "text")
    val scored = QualityModel.qualityScoreIncremental(batch, store)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(900L) > 0.5 && scored(901L) < 0.5, s"batch: $scored")
    // the store carries the feature scheme: a bigram store scores with
    // bigram features (flag read from meta, not from the caller)
    val store2 = Files.createTempDirectory("graft-qmodel-bi").toString
    QualityModel.writeQualityModel(docs, store2, dim = 2048, maxIter = 20,
      bigrams = true)
    val bi = QualityModel.qualityScoreIncremental(batch, store2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bi(900L) > 0.5 && bi(901L) < 0.5, s"bigram store: $bi")
  }

  test("persisting a degenerate corpus is refused, not silently wrong") {
    import java.nio.file.Files
    val store = Files.createTempDirectory("graft-qmodel-deg").toString
    val uniform = (0L until 4L).map(i => (i, "same text every time"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      QualityModel.writeQualityModel(uniform, store.toString)
    }
    assert(e.getMessage.contains("degenerate"))
  }

  test("scoring is deterministic for a fixed corpus and partitioning") {
    val docs = ((0 until 20).map(i => (i.toLong, goodDoc(i))) ++
      (0 until 20).map(i => (100L + i, badDoc(i)))).toDF("doc_id", "text")
      .repartition(4, $"doc_id")
    def run() = QualityModel.qualityModelOf(docs, 1024, 0.3, 15)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(run() == run())
  }
}
