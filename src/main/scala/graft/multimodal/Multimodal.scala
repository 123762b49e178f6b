package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** C12: multimodal columns — images/audio/video as opaque binary columns
  * with typed metadata, processed in partition-batched form.
  *
  * The actual codecs (JPEG decode, resampling, video demux) are STUBBED —
  * this container has no media libraries — as clearly-marked deterministic
  * fakes seeded by the payload hash. Everything around the stub is real and
  * is what matters at 100 TB: the schema contract, the
  * binary-payload-stays-off-the-driver rule, mapPartitions batch shape,
  * partition sizing for ~MB-scale rows, and column pruning on the metadata
  * without touching payload bytes. */
object Multimodal {

  case class Media(media_id: Long, kind: String, uri: String,
                   width: Int, height: Int, duration_ms: Long,
                   payload: Array[Byte])
  case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])
  case class Feature(media_id: Long, kind: String, embedding: Array[Float])

  /** Deterministic synthetic media table derived from the documents corpus
    * (payload = the text bytes; metadata derived from doc fields). Stands in
    * for `spark.read.format("binaryFile")` over an object store. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .map { r =>
        val id = r.getAs[Long]("doc_id")
        val bytes = r.getAs[String]("text").getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        Media(id, kind, s"mem://media/$id", width = 64 + (id % 8).toInt * 16,
          height = 64, duration_ms = r.getAs[Long]("n_chars") * 10, payload = bytes)
      }
  }

  /** STUB codec: "decode" a payload to fixed-size pixel bytes. Deterministic
    * fake (hash-expanded); the real implementation would call the image lib
    * here with identical signature and batch shape. */
  private def stubDecode(payload: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    i = 0
    while (i < outLen) { h = h * 6364136223846793005L + 1442695040888963407L
      out(i) = (h >>> 56).toByte; i += 1 }
    out
  }

  /** Decode + resize: partition-batched map keeping payloads distributed.
    * Output schema: (media_id, kind, pixels binary of exactly w*h bytes). */
  def decodeResize(media: Dataset[Media], w: Int, h: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // batch shape: one decoded buffer per row, allocation reused per batch
      it.map(m => (m.media_id, m.kind, stubDecode(m.payload, w * h)))
    }.toDF("media_id", "kind", "pixels")
  }

  /** Frame sampling for video payloads: every `stride`-th chunk of the
    * payload becomes a frame row (explode stays executor-side). */
  def frameSample(media: Dataset[Media], chunk: Int = 32, stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(chunk).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (bytes, i) => Frame(m.media_id, i, bytes) }
    }
  }

  /** STUB feature extractor: payload → deterministic pseudo-embedding.
    * Signature/batching matches a real encoder (model broadcast per
    * partition, vectors out, payload dropped). */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // a real impl would load the model ONCE here per partition
      it.map { m =>
        val px = stubDecode(m.payload, dim * 4)
        val vec = Array.tabulate(dim)(i => (px(i * 4) / 128.0f))
        Feature(m.media_id, m.kind, vec)
      }
    }
  }

  /** Metadata-only stats: must prune the payload column at the scan —
    * reading 100 TB of bytes to count widths is the canonical mistake. */
  def metaStats(media: Dataset[Media]): DataFrame =
    media.toDF()
      .select("kind", "width", "duration_ms")
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
        (sum(col("width")).cast("double") / count(lit(1))).as("avg_width"),
        sum(col("duration_ms")).as("total_duration_ms"))
}
