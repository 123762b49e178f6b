package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** Real video demux over a DECLARED container (the JDK ships no MP4/MKV
  * demuxer and this environment no media libraries, so the container format
  * is defined here rather than stubbed): an MJPEG-style stream
  *
  * {{{  "GMJ1" | [frame len: int32 BE | JPEG bytes] * n  }}}
  *
  * — magic header, then each frame a length-prefixed, self-contained
  * baseline JPEG decodable by [[ImageCodec]]. Demux walks the length
  * prefixes without parsing JPEG internals (exactly what a container demuxer
  * does), so frame extraction is O(frames) with zero decode cost, and only
  * the frames a sampler keeps ever reach the image codec. All executor-side;
  * malformed containers throw (the dead-letter contract shared with
  * [[ImageCodec.decode]]), never silently yield junk frames. */
object VideoCodec {

  private val Magic = Array[Byte]('G', 'M', 'J', '1')

  /** Deterministic synthetic clip: `nFrames` JPEG frames of `width`×`height`
    * whose pixels vary per frame (seed + frame_no), wrapped in the GMJ1
    * container. Same inputs → the identical byte stream. */
  def synthMjpeg(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + nFrames * width * height / 2)
    bos.write(Magic, 0, 4)
    var f = 0
    while (f < nFrames) {
      val jpeg = ImageCodec.synthJpeg(width, height, seed + f)
      bos.write(ByteBuffer.allocate(4).putInt(jpeg.length).array(), 0, 4)
      bos.write(jpeg, 0, jpeg.length)
      f += 1
    }
    bos.toByteArray
  }

  /** Lazy (offset, length) walk over the container's frames — the zero-copy
    * core every consumer shares: samplers copy only the frames they keep.
    * Throws on a bad magic or truncated frame — callers ingesting untrusted
    * corpora wrap this in their dead-letter split (the contract shared with
    * [[ImageCodec.decode]]). */
  def frameOffsets(payload: Array[Byte]): Iterator[(Int, Int)] = {
    require(payload.length >= 4 && payload(0) == 'G' && payload(1) == 'M' &&
      payload(2) == 'J' && payload(3) == '1',
      s"not a GMJ1 container (${payload.length} bytes)")
    new Iterator[(Int, Int)] {
      private var off = 4
      def hasNext: Boolean = off < payload.length
      def next(): (Int, Int) = {
        require(off + 4 <= payload.length, s"truncated frame header at offset $off")
        val len = ByteBuffer.wrap(payload, off, 4).getInt
        require(len > 0 && off + 4 + len <= payload.length,
          s"truncated frame body ($len bytes at offset $off)")
        val res = (off + 4, len)
        off += 4 + len
        res
      }
    }
  }

  /** Copy one frame out of the container given its (offset, length). */
  def frameAt(payload: Array[Byte], at: (Int, Int)): Array[Byte] =
    java.util.Arrays.copyOfRange(payload, at._1, at._1 + at._2)

  /** Demux a GMJ1 payload into its frame payloads (each a whole JPEG). */
  def demux(payload: Array[Byte]): Iterator[Array[Byte]] =
    frameOffsets(payload).map(frameAt(payload, _))

  /** The container's first frame — the keyframe-thumbnail convention the
    * decode/feature paths use. A frameless-but-VALID container (4-byte
    * header only) passes the magic check, so a blind `demux(..).next()`
    * would die with a misleading "truncated frame header" — consumers that
    * need pixels get an explicit empty-container error instead (same
    * dead-letter contract: throw, never yield junk). */
  def firstFrame(payload: Array[Byte]): Array[Byte] = {
    val it = demux(payload)
    require(it.hasNext, "empty GMJ1 container (zero frames)")
    it.next()
  }

  /** Frame count by length-prefix walk — no decode, no frame copies. */
  def frameCount(payload: Array[Byte]): Int = frameOffsets(payload).size
}
