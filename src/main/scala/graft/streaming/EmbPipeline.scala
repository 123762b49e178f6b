package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions.toDouble
import graft.operators.Similarity

/** The embedding-ingest half of the streaming story — the vector analogue
  * of [[DocPipeline]]: encoder output lands as files, and every micro-batch
  * is screened ON ARRIVAL against the base corpus's distribution before it
  * can touch an index or a training mix.
  *
  * Scale: the OOD gate is a PURE MAP — the (μ, σ) model is ≤dim plan
  * literals (frozen from the base corpus, the C90 machinery), so the
  * stream carries no state, no shuffle, no broadcast; per-trigger cost is
  * one codegen'd pass over the arriving vectors. That statelessness is the
  * point: admission quality control must not become the ingest bottleneck. */
object EmbPipeline {

  val embSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** File-based vector source (a drop directory standing in for the
    * encoder's output bus; new files = new encoded shards). */
  def embSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embSchema).parquet(dir)

  /** Freeze the admission model from a BASE corpus dir — the per-dim
    * (μ, σ) of [[Similarity.oodScore]], so the stream's verdicts are
    * IDENTICAL to what the batch operator would say about the same rows
    * (shared scoring column, not a re-implementation). Re-freeze on a
    * cadence (weekly, with the quality model) — a frozen model is the
    * contract; silently re-fitting per batch would let drift redefine
    * "normal" (measured-drift alerts are C77's job, not this gate's). */
  def oodModel(spark: SparkSession, baseDir: String): Array[(Double, Double)] =
    Similarity.oodStatsOf(
      graft.Tables.embeddings(spark, baseDir)
        .select(col("vec_id"), toDouble(col("embedding")).as("v"))
        .filter(col("v").isNotNull))

  /** C90s: the streaming OOD admission gate — score every arriving vector
    * against the frozen model, admit iff ood ≤ `maxOod` (default 4× the
    * model dimension: E[ood] = dim for in-distribution data, so 4×dim is
    * a wide fence that still kills wrong-modality/corrupt rows, which
    * score orders of magnitude out; tune per corpus from the batch
    * operator's histogram). Emits every row with its score and verdict —
    * rejected rows are observable (dead-letter discipline, like the
    * reference's log line), not silently dropped. */
  def oodGateStream(vecs: DataFrame, model: Array[(Double, Double)],
                    maxOod: Double = -1.0): DataFrame = {
    require(model.nonEmpty, "empty OOD model: freeze it from a non-empty base corpus")
    val fence = if (maxOod > 0) maxOod else 4.0 * model.length
    vecs.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        Similarity.oodCol(toDouble(col("embedding")), model).as("ood"))
      .withColumn("admitted", col("ood") <= fence)
  }
}
