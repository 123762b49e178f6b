package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** C55: model-based quality scoring — the standard corpus-curation
  * bootstrap (fastText-style classifier distilled from heuristic labels,
  * as used by the public CCNet/GPT-3 data pipelines): take the heuristic
  * quality score's confident head and tail as weak labels, train a
  * bag-of-words logistic regression, then score EVERY doc with a
  * calibrated probability — the model generalizes beyond the heuristic's
  * hand-built features and its scores are the sort key a token-budget
  * curation gate actually wants.
  *
  * Scale: weak labels come from two approx_percentile thresholds (t-digest
  * sketch agg — one bounded-memory pass, no corpus sort). Features are a
  * real bounded VOCABULARY (CountVectorizer: one word-count shuffle +
  * top-`dim` selection — the same cost shape as doc_vocab; collision-free
  * and interpretable, unlike feature hashing), re-built sorted so feature
  * indexing is deterministic; `bigrams = true` appends adjacent "a_b"
  * tokens into the same scheme (local word-order signal under the same
  * cap). spark.ml logistic regression is distributed L-BFGS — each
  * iteration one treeAggregate of a `dim`-sized gradient (the only
  * exchange, summary-sized), weights broadcast back. SCORING bypasses the
  * model's own transform: p_good = sigmoid(intercept + Σ coef[vocab[t]])
  * as a pure whole-stage-codegen fold with the trained coefficients and
  * the vocab→index map inlined as literals — no UDF, no model object in
  * any task closure (spark.ml's transform would serialize the training
  * summary → SparkSession, which is what broke under concurrent
  * observation use); out-of-vocabulary tokens contribute zero, exactly as
  * they would in the vectorized features. Degenerate corpora (empty, or
  * too uniform for two weak classes) degrade to a documented heuristic
  * passthrough instead of a crash — empty partitions are the norm at
  * scale. */
object QualityModel {

  private[graft] case class Trained(vocab: Array[String],
                                    coefs: Array[Double], intercept: Double)

  def qualityModel(spark: SparkSession, dir: String, dim: Int = 4096,
                   headTail: Double = 0.3, maxIter: Int = 25,
                   bigrams: Boolean = false): DataFrame =
    qualityModelOf(Tables.documents(spark, dir), dim, headTail, maxIter,
      bigrams)

  private[graft] def qualityModelOf(docs0: DataFrame, dim: Int,
                                    headTail: Double, maxIter: Int,
                                    bigrams: Boolean = false): DataFrame = {
    val labeled = labeledOf(docs0, headTail, bigrams)
    trainOn(labeled, dim, maxIter) match {
      case None => // degenerate: heuristic verdict passthrough
        labeled.select(col("doc_id"), col("label").as("weak_label"),
          coalesce(col("label"), lit(0.5)).as("p_good"))
      case Some(m) =>
        labeled.select(col("doc_id"), col("label").as("weak_label"),
          pGood(col("toks"), m).as("p_good"))
    }
  }

  /** C55b: PERSIST the trained quality model — the encode-once pattern the
    * signature/ANN stores follow, in the shape a production gate uses
    * (train weekly on the corpus, score every nightly ingest): the store
    * is the model's entire identity — vocab.parquet (term → index),
    * coefs.parquet (index → weight), meta.parquet (intercept + the
    * bigrams flag, so a caller can't score with mismatched features).
    * Degenerate corpora refuse to persist — a passthrough is a verdict,
    * not a model. */
  def writeQualityModel(docs: DataFrame, storeDir: String, dim: Int = 4096,
                        headTail: Double = 0.3, maxIter: Int = 25,
                        bigrams: Boolean = false): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val m = trainOn(labeledOf(docs, headTail, bigrams), dim, maxIter)
      .getOrElse(throw new IllegalArgumentException(
        "degenerate corpus (empty or single-class weak labels): nothing to persist"))
    m.vocab.zipWithIndex.toSeq.toDF("term", "idx")
      .write.mode("overwrite").parquet(s"$storeDir/vocab.parquet")
    m.coefs.zipWithIndex.map { case (c, i) => (i, c) }.toSeq.toDF("idx", "coef")
      .write.mode("overwrite").parquet(s"$storeDir/coefs.parquet")
    Seq((m.intercept, bigrams)).toDF("intercept", "bigrams")
      .write.mode("overwrite").parquet(s"$storeDir/meta.parquet")
  }

  /** C55b: score a NEW batch with the persisted model — no training, no
    * spark.ml, map-side only: the stored vocab/coefs (bounded by dim) are
    * read to the driver once and inlined as plan literals; the feature
    * scheme (bigrams or not) comes from the store itself. */
  def qualityScoreIncremental(batch: DataFrame, storeDir: String): DataFrame = {
    val spark = batch.sparkSession
    val meta = spark.read.parquet(s"$storeDir/meta.parquet").head()
    // by name, not ordinal: parquet column order is not part of the store's
    // contract, and a silent intercept/flag swap would mis-score every doc
    val (intercept, bigrams) =
      (meta.getAs[Double]("intercept"), meta.getAs[Boolean]("bigrams"))
    val vocab = spark.read.parquet(s"$storeDir/vocab.parquet")
      .orderBy("idx").select("term").collect().map(_.getString(0))
    val coefs = spark.read.parquet(s"$storeDir/coefs.parquet")
      .orderBy("idx").select("coef").collect().map(_.getDouble(0))
    require(vocab.length == coefs.length,
      s"corrupt store: ${vocab.length} terms vs ${coefs.length} coefficients")
    batch.filter(col("text").isNotNull)
      .select(col("doc_id"),
        featureToks(split(col("text"), " "), bigrams).as("toks"))
      .select(col("doc_id"),
        pGood(col("toks"), Trained(vocab, coefs, intercept)).as("p_good"))
  }

  /** Feature tokens: unigrams, optionally + adjacent "a_b" bigrams — a
    * bag of unigrams is blind to word order (equal multisets score
    * identically, by construction of the fold); bigrams restore local
    * order signal under the same vocabulary cap. */
  private def featureToks(ws: Column, bigrams: Boolean): Column =
    if (!bigrams) ws
    else concat(ws, zip_with(
      slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
      (a, b) => concat_ws("_", a, b)))

  /** Docs + feature tokens + heuristic score + weak label (confident
    * head/tail of the score distribution; all-NULL labels when the
    * corpus is empty — percentiles undefined). */
  private def labeledOf(docs0: DataFrame, headTail: Double,
                        bigrams: Boolean): DataFrame = {
    val docs = docs0.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        featureToks(split(col("text"), " "), bigrams).as("toks"),
        qualityScore(col("text")).as("q"))
    val thr = docs.agg(
      percentile_approx(col("q"), lit(headTail), lit(10000)).as("lo"),
      percentile_approx(col("q"), lit(1.0 - headTail), lit(10000)).as("hi"))
      .head()
    if (thr.isNullAt(0) || thr.isNullAt(1))
      docs.withColumn("label", lit(null).cast("double"))
    else
      docs.withColumn("label",
        when(col("q") >= thr.getDouble(1), 1.0)
          .when(col("q") <= thr.getDouble(0), 0.0))
  }

  /** Fit on the weak-labeled split; None when training is impossible
    * (fewer than two label classes — incl. the empty corpus). The
    * vocabulary is re-built SORTED so the term→index map (and therefore
    * every coefficient) is deterministic. */
  private def trainOn(labeled: DataFrame, dim: Int,
                      maxIter: Int): Option[Trained] = {
    val trainDocs = labeled.filter(col("label").isNotNull)
    if (trainDocs.select("label").distinct().count() < 2) return None
    val fitted = new CountVectorizer()
      .setInputCol("toks").setOutputCol("features").setVocabSize(dim)
      .fit(trainDocs)
    val vocab = fitted.vocabulary.sorted
    val cv = new CountVectorizerModel(vocab)
      .setInputCol("toks").setOutputCol("features")
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(0.01).setStandardization(false)
      .fit(cv.transform(trainDocs))
    Some(Trained(vocab, model.coefficients.toArray, model.intercept))
  }

  /** Codegen scoring fold: p = sigmoid(intercept + Σ coef[vocab[token]])
    * — equals dot(coef, CountVectorizer(toks)) since each occurrence adds
    * once; OOV tokens contribute zero. Vocab map + coefficients ride the
    * plan as literals (bounded by dim). */
  private def pGood(toks: Column, m: Trained): Column = {
    val vocabIdx = typedLit(m.vocab.zipWithIndex.toMap)
    val coefs = typedLit(m.coefs.toSeq)
    val margin = aggregate(toks, lit(m.intercept),
      (acc, t) => acc + coalesce(get(coefs, element_at(vocabIdx, t)), lit(0.0)))
    round(lit(1.0) / (lit(1.0) + exp(-margin)), 6)
  }
}
