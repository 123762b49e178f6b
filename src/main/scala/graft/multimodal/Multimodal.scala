package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** C12: multimodal columns — images/audio/video as opaque binary columns
  * with typed metadata, processed in partition-batched form.
  *
  * The IMAGE codec is REAL: payloads are genuine PNGs, decoded with the
  * JDK's `javax.imageio` and resized with `Graphics2D` ([[ImageCodec]]).
  * The AUDIO codec is REAL: payloads are genuine RIFF/PCM WAVs, decoded
  * with `javax.sound.sampled` and pooled to fixed-size amplitude envelopes
  * ([[AudioCodec]]). Both JDK-only, all executor-side. VIDEO demux remains
  * STUBBED as a clearly-marked deterministic fake: the JDK ships no
  * container demuxer and this environment no media libraries. The
  * surrounding plumbing is identical either way and is what matters at
  * 100 TB: the schema contract, the binary-payload-stays-off-the-driver
  * rule, mapPartitions batch shape, partition sizing for ~MB-scale rows,
  * and column pruning on the metadata without touching payload bytes. */
object Multimodal {

  case class Media(media_id: Long, kind: String, uri: String,
                   width: Int, height: Int, duration_ms: Long,
                   payload: Array[Byte])
  case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])
  case class Feature(media_id: Long, kind: String, embedding: Array[Float])

  /** Deterministic synthetic media table derived from the documents corpus.
    * Image rows carry a REAL PNG payload (encoded executor-side, dimensions
    * matching the row's metadata); audio rows a REAL 8 kHz PCM WAV whose
    * length matches the row's `duration_ms`; video rows carry the text
    * bytes as an opaque stand-in stream. Stands in for
    * `spark.read.format("binaryFile")` over an object store. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[Media] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
      .map { r =>
        val id = r.getAs[Long]("doc_id")
        // unknown-content docs (null text) still yield a media row — empty
        // payload bytes, same contract as curate's null-text gate
        val bytes = Option(r.getAs[String]("text")).getOrElse("").getBytes("UTF-8")
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val width = 64 + (id % 8).toInt * 16
        val durationMs = r.getAs[Long]("n_chars") * 10
        val payload = kind match {
          case "image" => ImageCodec.synthPng(width, 64, id ^ bytes.length.toLong)
          // 8 samples/ms: WAV length == duration_ms. Capped at 2000 s of
          // audio so a pathologically long text row can't overflow the Int
          // sample count (the synthetic corpus is far below the cap).
          case "audio" => AudioCodec.synthWav(
            math.min(durationMs * 8, 16_000_000L).toInt, 8000f,
            id ^ bytes.length.toLong)
          case _ => bytes
        }
        Media(id, kind, s"mem://media/$id", width = width,
          height = 64, duration_ms = durationMs, payload = payload)
      }
  }

  /** STUB codec for VIDEO payloads only (the JDK ships no demuxer):
    * "decode" a payload to fixed-size bytes as a deterministic
    * hash-expanded fake. Images and audio use the real [[ImageCodec]] /
    * [[AudioCodec]] paths; a real video implementation would slot in here
    * with identical signature and batch shape. */
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
    * Images run the REAL image codec (ImageIO decode + bilinear resize to
    * w×h grayscale), audio the REAL WAV codec (PCM decode + amplitude
    * envelope of w*h bins); video falls back to the declared stub. Output
    * schema: (media_id, kind, pixels binary of exactly w*h bytes). */
  def decodeResize(media: Dataset[Media], w: Int, h: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // batch shape: one decoded buffer per row, allocation reused per batch
      it.map { m =>
        val px = m.kind match {
          case "image" => ImageCodec.decodeResizeGray(m.payload, w, h)
          case "audio" => AudioCodec.decodeEnvelope(m.payload, w * h)
          case _       => stubDecode(m.payload, w * h)
        }
        (m.media_id, m.kind, px)
      }
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

  /** Feature extractor: payload → fixed-dim embedding. Images pool REAL
    * decoded pixels (a dim×4 grayscale thumbnail), audio a REAL dim×4-bin
    * amplitude envelope; video uses the declared stub. Signature/batching
    * matches a real encoder (model loaded once per partition, vectors out,
    * payload dropped). */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // a real impl would load the model ONCE here per partition
      it.map { m =>
        val px = m.kind match {
          case "image" => ImageCodec.decodeResizeGray(m.payload, dim, 4)
          case "audio" => AudioCodec.decodeEnvelope(m.payload, dim * 4)
          case _       => stubDecode(m.payload, dim * 4)
        }
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
