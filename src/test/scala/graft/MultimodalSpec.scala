package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSuite {

  private lazy val media = Multimodal.mediaTable(spark, sf)

  test("media table: image payloads are genuine PNGs, metadata is typed") {
    val m = media.filter(_.media_id == 0L).head()
    assert(m.kind == "image" && m.payload.nonEmpty)
    // PNG magic: \x89 P N G
    assert((m.payload(0) & 0xFF) == 0x89 && m.payload(1) == 'P' &&
      m.payload(2) == 'N' && m.payload(3) == 'G', "image payload is not a PNG")
  }

  test("real codec: ImageIO decode recovers the metadata dimensions; resize is exact and deterministic") {
    val imgs = media.filter(_.kind == "image").limit(8).collect()
    assert(imgs.nonEmpty)
    imgs.foreach { m =>
      val decoded = graft.multimodal.ImageCodec.decode(m.payload)
      assert(decoded.getWidth == m.width && decoded.getHeight == m.height,
        s"media ${m.media_id}: decoded ${decoded.getWidth}x${decoded.getHeight}, " +
          s"metadata says ${m.width}x${m.height}")
      val px = graft.multimodal.ImageCodec.decodeResizeGray(m.payload, 16, 16)
      assert(px.length == 256)
      val again = graft.multimodal.ImageCodec.decodeResizeGray(m.payload, 16, 16)
      assert(px.toSeq == again.toSeq, "resize not deterministic")
      // a real image has pixel variance — the raster isn't a constant fill
      assert(px.distinct.length > 1, "decoded raster is a constant fill")
    }
    // undecodable bytes surface as an error (dead-letter contract), not junk
    intercept[IllegalArgumentException] {
      graft.multimodal.ImageCodec.decode(Array[Byte](1, 2, 3, 4))
    }
  }

  test("real audio codec: WAV payloads round-trip PCM; envelope is fixed-size and deterministic") {
    val auds = media.filter(_.kind == "audio").limit(8).collect()
    assert(auds.nonEmpty)
    auds.foreach { m =>
      // RIFF magic
      assert(m.payload(0) == 'R' && m.payload(1) == 'I' &&
        m.payload(2) == 'F' && m.payload(3) == 'F', "audio payload is not a WAV")
      val (rate, pcm) = graft.multimodal.AudioCodec.decodePcm(m.payload)
      assert(rate == 8000f)
      // 8 samples/ms: decoded length must reproduce the metadata duration
      assert(pcm.length == m.duration_ms * 8,
        s"media ${m.media_id}: ${pcm.length} samples, metadata says ${m.duration_ms} ms")
      val env = graft.multimodal.AudioCodec.decodeEnvelope(m.payload, 64)
      assert(env.length == 64)
      assert(env.toSeq == graft.multimodal.AudioCodec.decodeEnvelope(m.payload, 64).toSeq)
      // a real signal has amplitude variance — not a constant fill
      assert(env.distinct.length > 1, "envelope is a constant fill")
    }
    // PCM16 WAV round-trip is lossless: synth → decode returns the samples
    val wav = graft.multimodal.AudioCodec.synthWav(1000, 8000f, seed = 7L)
    val (_, pcm) = graft.multimodal.AudioCodec.decodePcm(wav)
    assert(pcm.length == 1000)
    val wav2 = graft.multimodal.AudioCodec.synthWav(1000, 8000f, seed = 7L)
    assert(wav.toSeq == wav2.toSeq, "synthWav not deterministic")
    // undecodable bytes surface as an error (dead-letter contract), not junk
    intercept[IllegalArgumentException] {
      graft.multimodal.AudioCodec.decodePcm(Array[Byte](1, 2, 3, 4))
    }
  }

  test("decodeResize emits fixed-size pixel buffers with a stable schema") {
    val out = Multimodal.decodeResize(media.limit(20), 8, 8).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Array[Byte]]("pixels").length == 64))
    assert(out.head.schema.fieldNames.toSeq == Seq("media_id", "kind", "pixels"))
    // deterministic: same input -> same pixels
    val again = Multimodal.decodeResize(media.limit(20), 8, 8).collect()
    assert(out.map(_.getAs[Array[Byte]]("pixels").toSeq).toSet ==
      again.map(_.getAs[Array[Byte]]("pixels").toSeq).toSet)
  }

  test("video payloads are real GMJ1 containers; demuxed frames are decodable JPEGs at metadata dims") {
    val vids = media.filter(_.kind == "video").limit(6).collect()
    assert(vids.nonEmpty)
    vids.foreach { m =>
      val frames = graft.multimodal.VideoCodec.demux(m.payload).toSeq
      assert(frames.nonEmpty && frames.length <= 12)
      assert(frames.length == graft.multimodal.VideoCodec.frameCount(m.payload))
      frames.foreach { f =>
        // JPEG SOI marker, then a REAL ImageIO decode at the clip's dims
        assert((f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8, "frame is not a JPEG")
        val img = graft.multimodal.ImageCodec.decode(f)
        assert(img.getWidth == m.width && img.getHeight == m.height,
          s"media ${m.media_id}: frame ${img.getWidth}x${img.getHeight}, " +
            s"metadata says ${m.width}x${m.height}")
      }
      // frames differ (pixels vary per frame_no) — a clip, not a repeat
      if (frames.length > 1)
        assert(frames.map(_.toSeq).distinct.length == frames.length, "identical frames")
    }
    // malformed containers surface as errors (dead-letter contract), not junk
    intercept[IllegalArgumentException] {
      graft.multimodal.VideoCodec.demux(Array[Byte](1, 2, 3, 4)).toSeq
    }
    intercept[IllegalArgumentException] { // truncated body: header promises more
      val good = graft.multimodal.VideoCodec.synthMjpeg(16, 16, 1, 3L)
      graft.multimodal.VideoCodec.demux(good.dropRight(5)).toSeq
    }
    // frameless-but-valid container: magic passes, but pixel consumers must
    // see an explicit empty-container error, not a truncated-header one
    val frameless = graft.multimodal.VideoCodec.synthMjpeg(16, 16, 0, 3L)
    assert(graft.multimodal.VideoCodec.frameCount(frameless) == 0)
    val e = intercept[IllegalArgumentException] {
      graft.multimodal.VideoCodec.firstFrame(frameless)
    }
    assert(e.getMessage.contains("empty GMJ1 container"), e.getMessage)
  }

  test("frameSample demuxes every stride-th frame for videos only") {
    val frames = Multimodal.frameSample(media, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 == 0))
    val vids = media.filter(_.kind == "video").count()
    assert(frames.map(_.media_id).distinct.length == vids)
    // each sampled frame is a whole decodable JPEG
    frames.take(5).foreach(f => graft.multimodal.ImageCodec.decode(f.payload))
  }

  test("extractFeatures yields fixed-dim vectors per media row") {
    val feats = Multimodal.extractFeatures(media.limit(30), dim = 16).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.embedding.length == 16))
  }

  private def patternPng(w: Int, h: Int): Array[Byte] = {
    // a smooth RICH-SPECTRUM pattern: energy in every low-frequency DCT
    // cell with well-separated magnitudes, so no coefficient sits near the
    // median (a single-sine pattern leaves most coefficients ≈ 0 ≈ median
    // and numerical jitter flips bits — measured, hence this shape).
    // Noise dies under rescaling; these low frequencies survive — exactly
    // what pHash keys on.
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val u = (x + 0.5) / w; val v = (y + 0.5) / h
      var g = 127.5
      for (i <- 0 until 8; j <- 0 until 8 if i + j > 0) {
        val sgn = if ((i * 3 + j * 5) % 2 == 0) 1.0 else -1.0
        g += sgn * (40.0 / (1 + i + j) / (1 + i + j)) *
          math.cos(math.Pi * i * u) * math.cos(math.Pi * j * v)
      }
      val p = math.max(0, math.min(255, g.toInt))
      img.setRGB(x, y, (p << 16) | (p << 8) | p)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("phash: identical payloads collide at distance 0; a rescaled re-render stays near; noise images sit far") {
    import graft.multimodal.ImageCodec
    val a = patternPng(64, 64)
    assert(ImageCodec.phash(a) == ImageCodec.phash(patternPng(64, 64)))
    // the SAME continuous pattern re-rendered at another raster size: the
    // low-frequency DCT block survives the resample
    val d = java.lang.Long.bitCount(
      ImageCodec.phash(a) ^ ImageCodec.phash(patternPng(96, 96)))
    assert(d <= 3, s"rescaled twin drifted to distance $d")
    // unrelated noise images: ~Binomial(64, 1/2) apart
    val n1 = ImageCodec.phash(ImageCodec.synthPng(64, 64, seed = 1L))
    val n2 = ImageCodec.phash(ImageCodec.synthPng(64, 64, seed = 2L))
    assert(java.lang.Long.bitCount(n1 ^ n2) > 10)
    assert(java.lang.Long.bitCount(n1 ^ ImageCodec.phash(a)) > 10)
  }

  test("phash pairs: banded blocking is pigeonhole-complete vs brute force; planted copies all surface at 0") {
    import SparkSuite.spark.implicits._
    val dup = media.filter(x =>
        (x.kind == "image" || x.kind == "video") && x.media_id % 5 == 0)
      .map(x => x.copy(media_id = x.media_id + 10000000L))
    val planted = media.union(dup)
    val got = Multimodal.phashPairs(planted).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist"))).toSet
    // brute force over the collected hash table (test-sized corpus)
    val hs = Multimodal.phashes(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got == brute, s"banded ${got.size} vs brute ${brute.size}")
    // every planted copy pairs with its original at exactly distance 0.
    // (The synthetic corpus also contains ORGANIC exact duplicates — the
    // generator's seed is id ^ text_length, which collides — and the op
    // correctly surfaces those too; completeness vs brute covers them.)
    val expected = hs.map(_._1).filter(_ < 10000000L)
      .filter(id => id % 5 == 0).toSet
    expected.foreach { id =>
      assert(got.contains((id, id + 10000000L, 0L)), s"missing copy pair $id") }
  }

  test("phash store: write + ingest serves pairs identical to the direct decode path") {
    import SparkSuite.spark.implicits._
    val dup = media.filter(x =>
        (x.kind == "image" || x.kind == "video") && x.media_id % 5 == 0)
      .map(x => x.copy(media_id = x.media_id + 10000000L))
    val tmp = java.nio.file.Files.createTempDirectory("graft-phs-spec")
    try {
      // base corpus at store write, duplicates via ingest — the lifecycle
      // a deployment runs (pairing thereafter reads hashes, not pixels)
      Multimodal.writePhashStore(media, tmp.toString)
      Multimodal.ingestPhashes(dup, tmp.toString)
      val fromStore = Multimodal.phashPairsFromStore(spark, tmp.toString)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val direct = Multimodal.phashPairs(media.union(dup))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(fromStore == direct,
        s"store ${fromStore.size} vs direct ${direct.size}")
      assert(fromStore.nonEmpty) // the planted copies guarantee pairs
    } finally {
      import scala.reflect.io.Directory
      new Directory(tmp.toFile).deleteRecursively()
    }
  }

  test("metaStats covers all kinds without touching payloads") {
    val stats = Multimodal.metaStats(media).collect()
    assert(stats.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
    assert(stats.map(_.getAs[Long]("n_media")).sum == media.count())
  }

  test("C12d: wide-radius pairing is brute-exact at r<=7; 4-band recall curve pins the pigeonhole floor") {
    import SparkSuite.spark.implicits._
    import org.apache.spark.sql.functions._
    // hand-built hash table — controlled distances, zero decodes
    val base = 0x0123456789abcdefL
    def spread(d: Int) = (0 until d).map(i => 1L << ((i % 4) * 16 + i / 4)).reduce(_ | _)
    val rows = Seq(
      1L -> base,
      2L -> (base ^ spread(4)),      // dist 4, one flip in EVERY 16-bit band
      3L -> (base ^ 0xfL),           // dist 4, all flips in band 0
      4L -> (base ^ spread(7)),      // dist 7, spread
      5L -> (base ^ 0x7L),           // dist 3, concentrated
      6L -> 0x7777777777777777L)     // far from everything
    val h = rows.toDF("media_id", "phash")
    // brute reference
    def bits(x: Long) = java.lang.Long.bitCount(x)
    val brute = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = bits(ha ^ hb) if d <= 7
    } yield (ia, ib, d.toLong)).toSet
    val got = Multimodal.phashPairsRadius(h, maxDist = 7).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("dist"))).toSet
    assert(got == brute, s"got $got vs brute $brute")
    assert(brute.exists(_._3 == 4L) && brute.exists(_._3 == 7L)) // fixture is non-trivial
    // r<=3 uses 4 bands and must also be brute-exact
    val got3 = Multimodal.phashPairsRadius(h, maxDist = 3).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Long]("dist"))).toSet
    assert(got3 == brute.filter(_._3 <= 3L))
    // past the 8-band guarantee the kernel must refuse, not silently lose
    intercept[IllegalArgumentException] { Multimodal.phashPairsRadius(h, maxDist = 8) }

    // recall curve vs an in-test replica: found iff >=1 shared 16-bit band
    def sharesBand(a: Long, b: Long) =
      (0 until 4).exists(k => ((a >>> (k * 16)) & 0xffffL) == ((b >>> (k * 16)) & 0xffffL))
    val all = (for {
      (ia, ha) <- rows; (ib, hb) <- rows if ia < ib
      d = bits(ha ^ hb) if d <= 8
    } yield (d.toLong, sharesBand(ha, hb)))
    val curve = Multimodal.phashRecallCurve(h, maxRadius = 8).collect()
      .map(r => r.getAs[Long]("radius") ->
        ((r.getAs[Long]("n_true"), r.getAs[Long]("n_found"), r.getAs[Double]("recall")))).toMap
    (1 to 8).foreach { r =>
      val t = all.count(_._1 <= r).toLong
      val f = all.count(p => p._1 <= r && p._2).toLong
      val expect = if (t > 0) f.toDouble / t else 1.0
      assert(curve(r.toLong) == ((t, f, expect)), s"radius $r: ${curve(r.toLong)} vs ($t,$f,$expect)")
    }
    // the pigeonhole guarantee: recall is exactly 1.0 through r = 3
    (1 to 3).foreach(r => assert(curve(r.toLong)._3 == 1.0))
    // and the spread-4 twin proves the 4-band default genuinely loses
    // pairs past the guarantee (the curve is an instrument, not a tautology)
    assert(curve(4L)._3 < 1.0)
  }
}
