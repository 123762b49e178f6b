package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real audio codec on JDK-only primitives — `javax.sound.sampled` for WAV
  * (RIFF/PCM) decode and encode. No external dependency, headless, safe
  * row-at-a-time inside `mapPartitions` (no shared mutable state). Decode
  * runs executor-side; only fixed-size envelopes flow on, never payload
  * bytes to the driver. Compressed formats (mp3/ogg) have no JDK decoder and
  * stay out of scope — a real deployment swaps this object for one backed by
  * a codec library with the same signatures. */
object AudioCodec {

  /** Deterministic synthetic 16-bit PCM mono WAV — the test corpus's
    * stand-in for genuine user audio. Two tones + hash dither: structured
    * enough to survive envelope pooling; same (nSamples, rate, seed) → the
    * identical byte stream (the JDK WAV writer emits no timestamps). */
  def synthWav(nSamples: Int, sampleRate: Float, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    val base = 200.0 + math.abs(seed % 800).toDouble
    var i = 0
    while (i < nSamples) {
      val t = i.toDouble / sampleRate
      val s = 0.6 * math.sin(2 * math.Pi * base * t) +
        0.3 * math.sin(2 * math.Pi * base * 2.1 * t)
      var h = seed ^ (i.toLong * 0x9E3779B97F4A7C15L)
      h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
      val dither = ((h >>> 48).toShort / 32768.0) * 0.05
      val v = math.max(-1.0, math.min(1.0, s + dither))
      val sv = (v * 32767).toShort
      pcm(2 * i) = (sv & 0xFF).toByte // WAV PCM is little-endian
      pcm(2 * i + 1) = ((sv >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream(pcm.length + 64)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode a WAV payload to its first channel's 16-bit PCM samples.
    * Throws on undecodable bytes — the same dead-letter contract as
    * [[ImageCodec.decode]]: callers ingesting untrusted corpora wrap this
    * in their malformed-payload split. */
  def decodePcm(payload: Array[Byte]): (Float, Array[Short]) = {
    val ais =
      try AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
      catch {
        case e: javax.sound.sampled.UnsupportedAudioFileException =>
          throw new IllegalArgumentException(
            s"undecodable audio payload (${payload.length} bytes)", e)
      }
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16,
      s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}-bit")
    val bytes = ais.readAllBytes()
    val frameSize = fmt.getFrameSize
    val n = bytes.length / frameSize
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val off = i * frameSize // first channel
      out(i) =
        if (fmt.isBigEndian) (((bytes(off) & 0xFF) << 8) | (bytes(off + 1) & 0xFF)).toShort
        else (((bytes(off + 1) & 0xFF) << 8) | (bytes(off) & 0xFF)).toShort
      i += 1
    }
    (fmt.getSampleRate, out)
  }

  /** Decode + amplitude-envelope pooling to EXACTLY `outLen` bytes — the
    * fixed-size contract shared with [[ImageCodec.decodeResizeGray]]: mean
    * |amplitude| per time bin, log-compressed to a byte. */
  def decodeEnvelope(payload: Array[Byte], outLen: Int): Array[Byte] = {
    val (_, pcm) = decodePcm(payload)
    val out = new Array[Byte](outLen)
    if (pcm.isEmpty) return out
    var b = 0
    while (b < outLen) {
      val from = (b.toLong * pcm.length / outLen).toInt
      val to = math.max(from + 1, ((b + 1).toLong * pcm.length / outLen).toInt)
      var acc = 0.0
      var i = from
      while (i < to) { acc += math.abs(pcm(i).toDouble); i += 1 }
      out(b) = (math.log1p(acc / (to - from)) / math.log1p(32767.0) * 255).toInt.toByte
      b += 1
    }
    out
  }
}
