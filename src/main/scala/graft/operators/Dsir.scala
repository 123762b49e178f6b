package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** C57: DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * public): pick raw-corpus documents whose hashed-n-gram statistics look
  * like a small TARGET corpus, by importance weight under two bag-of-ngrams
  * models.
  *
  * Pipeline (all sizes bounded by the bucket count B, never the corpus):
  *  1. Featurize each doc into hashed uni+bigram buckets — computed IN-ROW
  *     from the split array (no explode in the scoring path).
  *  2. One census pass over all docs counts per-bucket occurrences for
  *     target (p) and raw (q) simultaneously — a single partial-agg shuffle
  *     with ≤ B result rows.
  *  3. λ_b = ln p̂_b − ln q̂_b (add-one smoothed) is collected into a
  *     B-element literal array — model-as-plan-constant, the same
  *     "no model object in task closures" scheme as the quality model.
  *  4. Per-doc log importance weight = Σ λ[bucket(f)] over the doc's
  *     features — a map-only in-row fold over the broadcast literal.
  *  5. Gumbel-top-k resampling, derandomized: per-doc noise comes from a
  *     hash of doc_id, the global rank over (logw + gumbel) uses the
  *     two-level scheme (coarse key bucket → summary-sized offset window →
  *     in-bucket row_number) — no single-reducer global sort at any scale.
  *
  * Rows-only by design (hashed featurization is not SQL-expressible in the
  * oracle dialect); DsirSpec pins semantics: planted dialect recovery,
  * map-side = explode-join equivalence, and determinism. */
object Dsir {

  /** Gate entry: target = documents from source "src0" (a stand-in for the
    * small curated target corpus); candidates = every other document. */
  def dsirSelect(spark: SparkSession, dir: String, nBuckets: Int = 4096,
                 nSelect: Int = 100): DataFrame =
    dsirSelectOf(Tables.documents(spark, dir), col("source") === "src0",
      nBuckets, nSelect)

  /** Hashed uni+bigram feature buckets — the compiled kernel
    * ([[graft.functions.DsirKernel.buckets]]): Spark's own Murmur3 (seed
    * 42) of each token and each "_"-joined adjacent pair, mod B, in one
    * pass per doc. Bit-equal to [[featureBucketsDeclarative]] (spec-pinned
    * hash parity); the declarative HOF form is CodegenFallback and walked
    * interpreted lambdas per feature — 13.7 s → sub-second at sf0.1. */
  private def featureBuckets(nBuckets: Int): Column =
    graft.functions.TextHashExpressions.dsirBuckets(col("text"), nBuckets)

  /** Spec-only hash-parity twin: the declarative form the kernel must
    * reproduce bucket-for-bucket. */
  private[graft] def featureBucketsDeclarative(nBuckets: Int): Column = {
    val toks = split(col("text"), " ")
    // sequence(0, n-2) would run DESCENDING for n < 2 — guard explicitly
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat(element_at(toks, i + 1), lit("_"), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    transform(concat(toks, bigrams), f => pmod(hash(f), lit(nBuckets)))
  }

  /** One census pass: per-bucket target (cp) and raw (cq) occurrence
    * counts — ≤ B result rows from a single partial-agg shuffle. */
  private def census(featured: DataFrame): DataFrame =
    featured.select(col("is_target"), explode(col("fb")).as("b"))
      .groupBy("b")
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("cp"),
        sum(when(col("is_target"), 0L).otherwise(1L)).as("cq"))

  private def lambdaFromCounts(rows: Array[org.apache.spark.sql.Row],
                               nBuckets: Int): Array[Double] = {
    val cp = new Array[Long](nBuckets)
    val cq = new Array[Long](nBuckets)
    rows.foreach { r =>
      val b = r.getAs[Int]("b")
      cp(b) = r.getAs[Long]("cp"); cq(b) = r.getAs[Long]("cq")
    }
    val np = cp.sum.toDouble + nBuckets
    val nq = cq.sum.toDouble + nBuckets
    Array.tabulate(nBuckets)(b => math.log((cp(b) + 1) / np) - math.log((cq(b) + 1) / nq))
  }

  /** λ as (bucket → ln p̂ − ln q̂) with add-one smoothing. Returns exactly
    * `nBuckets` doubles (unseen buckets get the smoothed default) —
    * driver-side size is B, independent of corpus size. */
  private[graft] def lambdaTable(featured: DataFrame, nBuckets: Int): Array[Double] =
    lambdaFromCounts(census(featured).collect(), nBuckets)

  /** C57b: persist the DSIR bucket models — census once, score every
    * ingest map-side. The store holds pure INTEGER counts (b, cp, cq),
    * not λ: counts are mergeable (a later corpus refresh can sum its own
    * census in), and λ is an O(B) recomputation at load. */
  def writeDsirStore(docs: DataFrame, targetPred: Column, storeDir: String,
                     nBuckets: Int = 4096): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    census(featured(docs, targetPred, nBuckets))
      .write.mode("overwrite").parquet(s"$storeDir/counts.parquet")
    Seq(nBuckets).toDF("n_buckets")
      .write.mode("overwrite").parquet(s"$storeDir/meta.parquet")
  }

  /** Score a NEW batch against the persisted models — map-only, no census:
    * λ is rebuilt from the stored counts (≤ B driver rows) and inlined as
    * a plan literal; the batch is read once. Same in-row fold as the full
    * run, so a batch doc's logw is bit-equal to what [[dsirSelectOf]]
    * computes over the same models. */
  def dsirScoreIncremental(batch: DataFrame, storeDir: String): DataFrame = {
    val spark = batch.sparkSession
    // by name, not ordinal (store contract = column names, not order)
    val nBuckets = spark.read.parquet(s"$storeDir/meta.parquet")
      .head().getAs[Int]("n_buckets")
    val lam = lambdaFromCounts(
      spark.read.parquet(s"$storeDir/counts.parquet").collect(), nBuckets)
    batch.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextHashExpressions
          .dsirLogw(col("text"), nBuckets, lam.toSeq).as("logw"))
  }

  private def featured(docs: DataFrame, targetPred: Column, nBuckets: Int): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), targetPred.as("is_target"),
        featureBuckets(nBuckets).as("fb"))

  def dsirSelectOf(docs: DataFrame, targetPred: Column, nBuckets: Int,
                   nSelect: Int): DataFrame = {
    val lam = lambdaTable(featured(docs, targetPred, nBuckets), nBuckets)
    // map-only scoring: one compiled kernel pass with λ as an expression
    // constant — the raw corpus is touched twice total (census + score),
    // never joined per token
    val scored = docs
      .filter(col("text").isNotNull && !targetPred)
      .select(col("doc_id"),
        graft.functions.TextHashExpressions
          .dsirLogw(col("text"), nBuckets, lam.toSeq).as("logw"))
    rankGumbel(scored, nSelect)
  }

  /** Derandomized Gumbel-top-k: u ∈ (0,1) from a doc_id hash, key =
    * logw − ln(−ln u); global rank via two-level prefix (coarse key bucket
    * offsets + in-bucket row_number) so no reducer ever sees the full
    * corpus order. */
  private def rankGumbel(scored: DataFrame, nSelect: Int): DataFrame = {
    val m = 1 << 20
    val keyed = scored
      .withColumn("u", (pmod(hash(col("doc_id")), lit(m)) + 0.5) / lit(m.toDouble))
      .withColumn("key", col("logw") - log(-log(col("u"))))
      .withColumn("g", floor(-col("key") * 4).cast("long"))
    val offsets = keyed.groupBy("g").agg(count(lit(1)).as("sz"))
      .withColumn("offset", coalesce(sum(col("sz")).over(
        graft.functions.Cols.boundedWindow(col("g")) // ≤buckets summary
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("g"), col("offset"))
    val inBucket = Window.partitionBy("g").orderBy(col("key").desc, col("doc_id"))
    keyed.join(offsets, "g")
      .withColumn("rnk", col("offset") + row_number().over(inBucket))
      .select(col("doc_id"), col("logw"), col("key"), col("rnk"),
        (col("rnk") <= nSelect).as("kept"))
  }

  /** Spec-only naive scoring twin: per-token explode + join against the
    * λ table as a DataFrame. Same λ values; summation order differs from
    * the in-row fold, so equality is asserted to 1e-9, not bitwise. */
  private[graft] def naiveLogw(docs: DataFrame, targetPred: Column,
                               nBuckets: Int): DataFrame = {
    val feats = featured(docs, targetPred, nBuckets)
    val lam = lambdaTable(feats, nBuckets)
    val spark = docs.sparkSession
    import spark.implicits._
    val lamDf = lam.zipWithIndex.map { case (v, b) => (b, v) }.toSeq
      .toDF("b", "lam")
    feats.filter(!col("is_target"))
      .select(col("doc_id"), explode(col("fb")).as("b"))
      .join(broadcast(lamDf), "b")
      .groupBy("doc_id").agg(sum(col("lam")).as("logw"))
  }
}
