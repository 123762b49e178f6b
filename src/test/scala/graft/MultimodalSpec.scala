package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSuite {

  private lazy val media = Multimodal.mediaTable(spark, sf)

  test("media table: payload bytes round-trip and metadata is typed") {
    val m = media.filter(_.media_id == 0L).head()
    assert(m.kind == "image" && m.payload.nonEmpty)
    assert(new String(m.payload, "UTF-8").nonEmpty)
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

  test("frameSample emits every stride-th chunk for videos only") {
    val frames = Multimodal.frameSample(media, chunk = 16, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_no % 2 == 0))
    val vids = media.filter(_.kind == "video").count()
    assert(frames.map(_.media_id).distinct.length == vids)
  }

  test("extractFeatures yields fixed-dim vectors per media row") {
    val feats = Multimodal.extractFeatures(media.limit(30), dim = 16).collect()
    assert(feats.length == 30)
    assert(feats.forall(_.embedding.length == 16))
  }

  test("metaStats covers all kinds without touching payloads") {
    val stats = Multimodal.metaStats(media).collect()
    assert(stats.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
    assert(stats.map(_.getAs[Long]("n_media")).sum == media.count())
  }
}
