package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.operators.TextOps
import graft.functions.TextFunctions.{fingerprint, qualityScore}

/** The document-ingest half of the streaming story: crawl drops land as
  * files, and every micro-batch is curated ON ARRIVAL — the streaming twin
  * of [[graft.operators.TextOps.curate]], so a corpus owner gets the same
  * gates whether they sweep nightly in batch or admit continuously.
  *
  * Scale: every gate except dedup is a map-side expression (no shuffle);
  * exact dedup is keyed state on the content fingerprint — state size is
  * bounded by the watermark horizon, not corpus history, which is the only
  * sustainable shape at 100 TB/day ingest. */
object DocPipeline {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-based document source (a drop directory standing in for the crawl
    * bus; new files = new crawl shards). */
  def docSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Streaming curation gate — admit a document iff it clears the SAME
    * gates as batch `curate`: exact dedup, then policy screen (digit ratio,
    * token length), then quality threshold; survivors get the deterministic
    * split label. Emits ADMITTED documents only (what an ingest pipeline
    * appends to the training store); per-gate drop counts ride the stream's
    * progress metrics rather than the row stream.
    *
    * Dedup is first-ARRIVAL-wins keyed state on the normalized fingerprint
    * (the streaming analogue of batch min(doc_id) — identical decisions
    * when ingest order follows doc_id). State is evicted by the ingest-time
    * watermark: duplicates arriving within `dedupHorizon` of the original
    * die here; older re-crawls are caught by the periodic batch sweep
    * ([[graft.operators.Dedup.dedupIncremental]]) — the standard split for
    * an otherwise unbounded dedup-state problem. */
  def curatedStream(docs: DataFrame, minQuality: Double = 0.2,
                    maxDigitRatio: Double = 0.3, maxTokenLen: Int = 25,
                    dedupHorizon: String = "1 hour"): DataFrame =
    docs.filter(col("text").isNotNull)
      .withColumn("fp", fingerprint(col("text")))
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", dedupHorizon)
      .dropDuplicatesWithinWatermark("fp")
      .withColumn("digit_ratio",
        TextOps.digitRatioOf(col("text"), length(col("text")).cast("long")))
      .withColumn("max_token_len", TextOps.maxTokenLenOf(col("text")))
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("digit_ratio") < maxDigitRatio &&
        col("max_token_len") <= maxTokenLen && col("quality") >= minQuality)
      .withColumn("split", TextOps.splitOf(col("doc_id")))
      .select(col("doc_id"), col("source"), col("split"), col("quality"))

  /** A35b: the streaming NEAR-dup curation gate — [[TextOps
    * .curateIncremental]] per micro-batch via foreachBatch against the
    * persisted signature store ([[TextOps.writeCurateStore]] seeds it).
    *
    * Why not keyed state like [[curatedStream]]'s exact dedup: near-dup
    * admission must consult the CORPUS-LIFETIME signature index — no
    * watermark horizon bounds it, so it belongs on cheap storage, not in
    * a state store. foreachBatch + the crash-stable store cycle
    * (signatures append → pairs derived from the PERSISTED store → digest
    * marker last) keeps per-trigger cost O(batch signatures + band
    * probes) and makes a mid-ingest crash re-runnable: retried doc ids
    * are recognized and skipped, so the store converges instead of
    * double-counting. Verdict rows (curate's schema) append to
    * `verdictDir` per batch. */
  case class ScreenVerdict(doc_id: Long, source: String, seen: Boolean,
                           n_state_bytes: Long)

  /** C113s: the STREAMING Bloom pre-screen — corpus-LIFETIME exact-content
    * screening in CONSTANT state: [[curatedStream]]'s keyed dedup grows
    * state with distinct keys inside the watermark horizon and forgets
    * beyond it; the Bloom screen remembers EVERYTHING ever ingested in a
    * fixed bit array (the C113 trade live: "seen" may over-count ≤ ε,
    * "novel" is never wrong — the right polarity for an admission gate,
    * which re-examines flagged docs downstream anyway).
    *
    * The filter shards by key hash across `nShards` state groups — one
    * global filter would funnel every row through a single state key (a
    * one-partition bottleneck); sharding keeps admission parallel and
    * each shard's filter independent (a key always routes to the same
    * shard, so correctness is per-shard-local). Per trigger, a shard
    * folds its batch in doc_id order (deterministic replay), emits one
    * verdict per doc plus its serialized-state size — the boundedness is
    * observable in the output, and the spec pins it flat across batches. */
  def bloomScreenStream(docs: DataFrame, nShards: Int = 8,
                        expectedPerShard: Long = 1L << 17,
                        fpp: Double = 0.01): Dataset[ScreenVerdict] = {
    import docs.sparkSession.implicits._
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        md5(expr("encode(text, 'UTF-8')")).as("k"))
      .as[(Long, String, String)]
      .groupByKey { case (_, _, k) => (k.hashCode & Int.MaxValue) % nShards }
      .flatMapGroupsWithState[Array[Byte], ScreenVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Array[Byte]]) =>
          val bf = state.getOption
            .map(b => org.apache.spark.util.sketch.BloomFilter.readFrom(
              new java.io.ByteArrayInputStream(b)))
            .getOrElse(org.apache.spark.util.sketch.BloomFilter.create(
              expectedPerShard, fpp))
          val out = rows.toSeq.sortBy(_._1).map { case (id, src, k) =>
            val seen = bf.mightContainString(k)
            bf.putString(k)
            ScreenVerdict(id, src, seen, 0L)
          }
          val bos = new java.io.ByteArrayOutputStream()
          bf.writeTo(bos)
          state.update(bos.toByteArray)
          out.map(_.copy(n_state_bytes = bos.size().toLong)).iterator
      }
  }

  def curateNeardupStream(docs: DataFrame, storeDir: String,
                          verdictDir: String, checkpoint: String,
                          minQuality: Double = 0.2, maxDigitRatio: Double = 0.3,
                          maxTokenLen: Int = 25, threshold: Double = 0.5): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        TextOps.curateIncremental(batch, storeDir, minQuality, maxDigitRatio,
          maxTokenLen, threshold)
          .write.mode("append").parquet(verdictDir)
        ()
      }.start()
}
