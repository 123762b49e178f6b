package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables



/** Corpus deduplication (C1–C4).
  *
  * Scale design: exact dedup is one hash-shuffle on the content hash with
  * map-side partial aggregation (only the digest + representative id ship,
  * never the text twice). Near-dup (MinHash/SimHash) avoids the O(n²) pair
  * space by LSH banding: candidates meet only inside identical-band buckets,
  * a key-partitioned self-join.
  *
  * MinHash/SimHash signatures are computed by the native kernels in
  * graft.functions.TextHashExpressions — one compiled pass per document,
  * map-only (no shuffle until the LSH band join), which is the 100 TB
  * shape: signature computation scales with input bytes, and the only
  * exchange carries (doc_id, band, bucket) triples. */
object Dedup {

  /** C1: exact dedup — md5(text) groupBy, keep the smallest doc_id. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signatures: doc_id → array of n per-family minima, computed by
    * the native [[graft.functions.MinHashSigExpr]] kernel in one compiled
    * pass per document — map-only, no shuffle (the earlier explode → n-way
    * min-aggregate form paid a full shuffle of one row per shingle). */
  private[graft] def minhashSigs(docs: DataFrame, shingleK: Int, n: Int): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextHashExpressions.minhashSig(col("text"), shingleK, n).as("sig"))

  /** C2: MinHash + LSH near-dup pairs with verified signature similarity.
    * bands × rows = signature length; identical band hash → candidate. */
  def minhashLsh(spark: SparkSession, dir: String,
                 shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val sigs = minhashSigs(Tables.documents(spark, dir), shingleK, numHashes).cache()
    // (doc_id, band, bucket) — bucket = hash of the band's minhash slice
    val banded = sigs.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)), b))))
      .toDF("doc_id", "band", "bucket")
    val cand = banded.as("a").join(banded.as("b"), Seq("band", "bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b")).distinct()
    val verified = cand
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a")), "id_a")
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")), "id_b")
      .withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / numHashes)
    verified.filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** SimHash per doc via the native [[graft.functions.SimHashExpr]] kernel —
    * map-only (the earlier explode → 64 sign-sum aggregates paid a
    * one-row-per-token shuffle). */
  private[graft] def simhashes(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextHashExpressions.simhash64(col("text")).as("sh"))

  /** C3: SimHash near-dup pairs within hamming distance `maxDist`.
    * LSH via 4×16-bit chunk buckets (near-identical docs share a chunk). */
  def simhashPairs(spark: SparkSession, dir: String, maxDist: Int = 3): DataFrame = {
    val docs = simhashes(Tables.documents(spark, dir)).cache()
    val chunked = docs.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sh"), c * 16).bitwiseAND(0xFFFFL))))
      .toDF("doc_id", "sh", "chunk", "bucket")
    val a = chunked.select(col("chunk"), col("bucket"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("bucket"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val cand = a.join(b, Seq("chunk", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
    cand.withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** C15: near-duplicate clusters — connected components over the LSH pair
    * graph via iterative min-label propagation (the standard large-graph
    * approach: each round is one shuffle join; label space only shrinks, so
    * it converges in O(component diameter) rounds, checked per round). */
  def neardupClusters(spark: SparkSession, dir: String,
                      maxIters: Int = 10, threshold: Double = 0.5): DataFrame = {
    val pairs = minhashLsh(spark, dir, threshold = threshold).select("id_a", "id_b")
    val edges = pairs
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .toDF("src", "dst").cache()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).cache()
    var iters = 0
    var done = false
    while (!done && iters < maxIters) {
      val prop = edges.join(labels.withColumnRenamed("id", "dst_id"),
          col("dst") === col("dst_id"))
        .groupBy(col("src").as("id")).agg(min(col("label")).as("nbr_label"))
      val next = labels.join(prop, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .cache()
      val changed = next.withColumnRenamed("label", "new_label")
        .join(labels, Seq("id"))
        .filter(col("new_label") =!= col("label")).count()
      labels.unpersist()
      labels = next
      done = changed == 0
      iters += 1
    }
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** C16: the dedup keep-list — one canonical doc per near-dup cluster (the
    * cluster minimum), singleton docs keep themselves. */
  def keepList(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select("doc_id")
    val clusters = neardupClusters(spark, dir)
    docs.join(clusters.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("canonical_id"))
      .withColumn("keep", col("doc_id") === col("canonical_id"))
  }

  /** C4: exact word-n-gram Jaccard over LSH candidates (re-verification). */
  def ngramJaccard(spark: SparkSession, dir: String, k: Int = 3,
                   threshold: Double = 0.3): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), graft.functions.TextHashExpressions.shingleHashes(col("text"), k).as("grams"))
    val cand = minhashLsh(spark, dir, k, 16, 4, 0.2).select("id_a", "id_b")
    val a = docs.select(col("doc_id").as("id_a"), col("grams").as("g_a"))
    val b = docs.select(col("doc_id").as("id_b"), col("grams").as("g_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("inter", size(array_intersect(col("g_a"), col("g_b"))))
      .withColumn("uni", size(array_union(col("g_a"), col("g_b"))))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
