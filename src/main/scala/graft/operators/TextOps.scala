package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Document-level text analysis (C8–C11): embarrassingly parallel map-side
  * column expressions — no shuffle at any scale. */
object TextOps {

  /** C8: token counts (whitespace + regex tokenizers). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        wsTokens(col("text")).cast("long").as("ws_tokens"),
        regexTokens(col("text")).cast("long").as("re_tokens"))

  /** C9: quality scoring — length, stopword ratio, mean word length, score. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"),
        wsTokens(col("text")).cast("long").as("n_words"),
        stopwordRatio(col("text")).as("stop_ratio"),
        meanWordLen(col("text")).as("mean_word_len"),
        qualityScore(col("text")).as("quality"))

  /** C10: heuristic language scoring via stopword dictionaries. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val es = Seq("el", "la", "de", "que", "y", "en")
    val deW = Seq("der", "die", "das", "und", "ist", "ein")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"),
        hitCount(col("text"), EnStopwords).cast("long").as("en_hits"),
        hitCount(col("text"), es).cast("long").as("es_hits"),
        hitCount(col("text"), deW).cast("long").as("de_hits"))
      .withColumn("lang_pred",
        when(col("en_hits") >= col("es_hits") && col("en_hits") >= col("de_hits") &&
          col("en_hits") > 0, "en")
          .when(col("es_hits") >= col("de_hits") && col("es_hits") > 0, "es")
          .when(col("de_hits") > 0, "de")
          .otherwise("unknown"))
  }

  /** C11: content fingerprint (md5 of whitespace-normalized lowercase text). */
  def fingerprintDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
}
