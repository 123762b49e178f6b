package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.normalized

/** Corpus deduplication (C1–C4).
  *
  * Scale design: exact dedup is one hash-shuffle on the content hash with
  * map-side partial aggregation (never ships full text twice — only the
  * digest + representative id). Near-dup (MinHash/SimHash) avoids the O(n²)
  * pair space by LSH banding: candidates meet only inside identical-band
  * buckets, a key-partitioned self-join. */
object Dedup {

  /** C1: exact dedup — md5(text) groupBy, keep the smallest doc_id. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text").cast("binary")).as("content_hash"))
      .groupBy("content_hash")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word-k-shingles of the normalized text. */
  private def shingles(text: org.apache.spark.sql.Column, k: Int) = {
    val words = split(normalized(text), " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(words) - k, lit(0))),
      i => array_join(slice(words, i + 1, lit(k)), " ")))
  }

  /** MinHash signature: for each of `n` hash families, min over shingle
    * hashes of (xxhash64(shingle, seed)). Pure codegen'd expressions. */
  private def minhashSig(text: org.apache.spark.sql.Column, k: Int, n: Int) = {
    val sh = shingles(text, k)
    array((0 until n).map { seed =>
      array_min(transform(sh, s => xxhash64(lit(seed), s)))
    }: _*)
  }

  /** C2: MinHash + LSH near-dup candidate pairs with verified signature
    * similarity. bands×rows = signature length; identical band → candidate. */
  def minhashLsh(spark: SparkSession, dir: String,
                 shingleK: Int = 3, numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.5): DataFrame = {
    val rows = numHashes / bands
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), minhashSig(col("text"), shingleK, numHashes).as("sig"))
      .cache()
    // explode into (band, hash-of-band-slice) buckets
    val banded = docs.select(col("doc_id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("band"), b, array_join(
          transform(slice(col("sig"), b * rows + 1, lit(rows)), x => x.cast("string")), ",")))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val cand = a.join(b, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
    // verify: fraction of agreeing minhashes ≈ Jaccard
    cand.withColumn("est_jaccard",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
  }

  /** 64-bit SimHash over word tokens: sign-sum of per-token hash bits. */
  private def simhash(text: org.apache.spark.sql.Column) = {
    val words = split(normalized(text), " ")
    val hashes = transform(words, w => xxhash64(w))
    // For each bit position, sum ±1 over tokens; bit set if sum > 0.
    val bits = transform(sequence(lit(0), lit(63)), i =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0, lit(1L))
        .otherwise(lit(0L)))
    aggregate(zip_with(bits, sequence(lit(0), lit(63)), (b, i) => call_function("shiftleft", b, i)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** C3: SimHash near-dup pairs within hamming distance `maxDist`.
    * LSH via 4×16-bit chunk buckets (two near-identical docs share a chunk). */
  def simhashPairs(spark: SparkSession, dir: String, maxDist: Int = 12): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), simhash(col("text")).as("sh")).cache()
    val chunked = docs.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)),
        c => call_function("shiftright", col("sh"), c * 16).bitwiseAND(0xFFFFL))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "bucket")
    val a = chunked.select(col("chunk"), col("bucket"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = chunked.select(col("chunk"), col("bucket"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val cand = a.join(b, Seq("chunk", "bucket")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
    cand.withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** C4: exact word-n-gram Jaccard over LSH candidates (re-verification). */
  def ngramJaccard(spark: SparkSession, dir: String, k: Int = 3,
                   threshold: Double = 0.3): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), k).as("grams"))
    // candidate generation by cheap LSH on minhash, then exact verify
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
