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
  * indexing is deterministic. spark.ml logistic regression is distributed
  * L-BFGS — each iteration one treeAggregate of a `dim`-sized gradient
  * (the only exchange, summary-sized), weights broadcast back. SCORING
  * bypasses the model's own transform: p_good = sigmoid(intercept +
  * Σ_tokens coef[vocab[t]]) as a pure whole-stage-codegen fold with the
  * trained coefficients and the vocab→index map inlined as literals
  * (~dim·(term+8) bytes riding the plan — no UDF, no model object in any
  * task closure, and no spark.ml training-summary/session serialization
  * in the hot path; out-of-vocabulary tokens contribute zero, exactly as
  * they would in the vectorized features). */
object QualityModel {

  def qualityModel(spark: SparkSession, dir: String, dim: Int = 4096,
                   headTail: Double = 0.3, maxIter: Int = 25,
                   bigrams: Boolean = false): DataFrame =
    qualityModelOf(Tables.documents(spark, dir), dim, headTail, maxIter,
      bigrams)

  private[graft] def qualityModelOf(docs0: DataFrame, dim: Int,
                                    headTail: Double, maxIter: Int,
                                    bigrams: Boolean = false): DataFrame = {
    // feature tokens: unigrams, optionally + adjacent bigrams ("a_b") in
    // the SAME vocabulary scheme — a bag of unigrams is blind to word
    // order (two docs with equal token multisets score identically, by
    // construction of the fold); bigrams restore local order signal at
    // the cost of vocabulary pressure (the top-dim cap absorbs it)
    def featToks(ws: Column): Column =
      if (!bigrams) ws
      else concat(ws, zip_with(
        slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat_ws("_", a, b)))
    val docs = docs0.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"),
        featToks(split(col("text"), " ")).as("toks"),
        qualityScore(col("text")).as("q"))
    // weak labels: confident head/tail of the heuristic score distribution
    val thr = docs.agg(
      percentile_approx(col("q"), lit(headTail), lit(10000)).as("lo"),
      percentile_approx(col("q"), lit(1.0 - headTail), lit(10000)).as("hi"))
      .head()
    // degenerate corpora (empty, or too uniform for two weak classes):
    // pass the heuristic verdict through instead of training — documented
    // contract, not a crash (empty partitions are the norm at scale)
    def heuristicPassthrough(labeled: DataFrame): DataFrame =
      labeled.select(col("doc_id"), col("label").as("weak_label"),
        coalesce(col("label"), lit(0.5)).as("p_good"))
    if (thr.isNullAt(0) || thr.isNullAt(1))
      return heuristicPassthrough(docs.withColumn("label",
        lit(null).cast("double")))
    val (lo, hi) = (thr.getDouble(0), thr.getDouble(1))
    val labeled = docs
      .withColumn("label",
        when(col("q") >= hi, 1.0).when(col("q") <= lo, 0.0))
    val trainDocs = labeled.filter(col("label").isNotNull)
    if (trainDocs.select("label").distinct().count() < 2)
      return heuristicPassthrough(labeled)
    // bounded vocabulary from the TRAINING split, re-built sorted so the
    // term→index map (and therefore every coefficient) is deterministic
    val fitted = new CountVectorizer()
      .setInputCol("toks").setOutputCol("features").setVocabSize(dim)
      .fit(trainDocs)
    val vocab = fitted.vocabulary.sorted
    val cv = new CountVectorizerModel(vocab)
      .setInputCol("toks").setOutputCol("features")
    val model = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(0.01).setStandardization(false)
      .fit(cv.transform(trainDocs))
    // codegen scoring: margin = intercept + Σ coef[vocab[token]] — equals
    // dot(coef, CountVectorizer(toks)) since each occurrence adds once
    val vocabIdx = typedLit(vocab.zipWithIndex.toMap)
    val coefs = typedLit(model.coefficients.toArray.toSeq)
    val margin = aggregate(col("toks"), lit(model.intercept),
      (acc, t) => acc + coalesce(get(coefs, element_at(vocabIdx, t)), lit(0.0)))
    labeled.select(col("doc_id"), col("label").as("weak_label"),
      round(lit(1.0) / (lit(1.0) + exp(-margin)), 6).as("p_good"))
  }
}
