package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Real image codec on JDK-only primitives — `javax.imageio` for PNG/JPEG
  * decode/encode, `Graphics2D` for resampling. No external dependency, fully
  * headless, and safe to call row-at-a-time inside `mapPartitions` (ImageIO's
  * reader lookup is cached JVM-wide; each call allocates only the decoded
  * raster). Decode/resize runs executor-side; only fixed-size rasters flow
  * on, never driver-side payload bytes.
  */
object ImageCodec {

  /** Deterministic synthetic RGB image — the test corpus's stand-in for
    * genuine user pixels. Same (w, h, seed) → the identical raster. */
  private def synthImage(width: Int, height: Int, seed: Long): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        // splitmix-style pixel hash: structured enough to survive resize
        var h = seed ^ (x.toLong * 0x9E3779B97F4A7C15L) ^ (y.toLong * 0xC2B2AE3D27D4EB4FL)
        h = (h ^ (h >>> 30)) * 0xBF58476D1CE4E5B9L
        h = (h ^ (h >>> 27)) * 0x94D049BB133111EBL
        img.setRGB(x, y, ((h >>> 40) & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    img
  }

  /** Synthetic image encoded as a REAL PNG (ImageIO's PNG writer emits no
    * timestamps, so same inputs → the identical byte stream). */
  def synthPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream(width * height / 2)
    ImageIO.write(synthImage(width, height, seed), "png", bos)
    bos.toByteArray
  }

  /** Synthetic image encoded as a REAL baseline JPEG — the frame payload of
    * [[VideoCodec]]'s MJPEG-style container. Deterministic for fixed inputs
    * (the JDK JPEG writer emits no timestamps or random markers). */
  def synthJpeg(width: Int, height: Int, seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream(width * height / 2)
    ImageIO.write(synthImage(width, height, seed), "jpg", bos)
    bos.toByteArray
  }

  /** Decode a PNG/JPEG payload. Throws on undecodable bytes — callers that
    * ingest untrusted corpora wrap this in their dead-letter split (the same
    * contract as the streaming decoder's malformed-payload path). */
  def decode(payload: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, s"undecodable image payload (${payload.length} bytes)")
    img
  }

  /** 64-bit DCT perceptual hash (pHash — the public DCT-hash scheme, e.g.
    * Zauner 2010 "Implementation and benchmarking of perceptual image hash
    * functions"; the image near-dup fingerprint large training-corpus
    * dedup pipelines run): decode → 32×32 grayscale (the real codec path)
    * → 2-D DCT-II → the top-left 8×8 LOW-FREQUENCY block → bit i =
    * coefficient_i > median (median over the 63 non-DC coefficients, so
    * global brightness doesn't vote). Robust to re-encoding and rescaling
    * (low frequencies survive resampling); deterministic — fixed double
    * arithmetic, no normalization (per-coefficient scale factors are
    * monotone and cancel against the median compare's purpose). */
  def phash(payload: Array[Byte]): Long = {
    val px = decodeResizeGray(payload, 32, 32)
    // cos table for the first 8 DCT-II outputs over 32 samples
    val cos = Array.tabulate(8, 32)((k, n) =>
      math.cos(math.Pi * k * (2 * n + 1) / 64.0))
    val tmp = Array.ofDim[Double](32, 8) // rows transformed, 8 coeffs kept
    var y = 0
    while (y < 32) {
      var k = 0
      while (k < 8) {
        var s = 0.0; var x = 0
        while (x < 32) { s += (px(y * 32 + x) & 0xFF).toDouble * cos(k)(x); x += 1 }
        tmp(y)(k) = s; k += 1
      }
      y += 1
    }
    val c = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var k = 0
      while (k < 8) {
        var s = 0.0; var yy = 0
        while (yy < 32) { s += tmp(yy)(k) * cos(v)(yy); yy += 1 }
        c(v * 8 + k) = s; k += 1
      }
      v += 1
    }
    val nonDc = java.util.Arrays.copyOfRange(c, 1, 64)
    java.util.Arrays.sort(nonDc)
    val median = nonDc(31) // 63 values, the middle one
    var bits = 0L; var i = 0
    while (i < 64) { if (c(i) > median) bits |= 1L << i; i += 1 }
    bits
  }

  /** Decode + bilinear resize to w×h, returning the grayscale raster:
    * exactly w*h bytes, row-major — the fixed-size contract
    * [[Multimodal.decodeResize]]'s schema promises. */
  def decodeResizeGray(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val src = decode(payload)
    val dst = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val g = dst.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    val out = new Array[Byte](w * h)
    dst.getRaster.getDataElements(0, 0, w, h, out)
    out
  }
}
