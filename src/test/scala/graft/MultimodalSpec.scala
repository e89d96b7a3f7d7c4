package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FakeCodec, MediaFile}

class MultimodalSpec extends SparkSpec {

  test("stub codec is deterministic and kind-dependent") {
    val img = FakeCodec.decode(MediaFile(0, "image", "abcd".getBytes))
    val vid = FakeCodec.decode(MediaFile(1, "video", "abcd".getBytes))
    assert(img.n_frames === 1L)
    assert(vid.n_frames === 1L + 4 % 240)
    assert(img.checksum === vid.checksum) // payload-only
    assert(img.n_bytes === 4L)
  }

  test("decode pipeline carries schema and values through mapPartitions") {
    val dir = writeFixture(documents = Seq(
      doc(0, "aaaa"), doc(1, "bbbb"), doc(2, "cccc"), doc(3, "dddd")))
    val got = Multimodal.decodeQuery(spark, dir).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[String]("kind"), r.getAs[Long]("n_bytes"))).toMap
    assert(got(0L) === ("image", 4L))
    assert(got(1L) === ("audio", 4L))
    assert(got(2L) === ("video", 4L))
    assert(got(3L) === ("image", 4L))
  }

  test("resize plan fits the box preserving aspect, identity when small") {
    val dir = writeFixture(documents = Seq(doc(0, "a" * 100), doc(1, "b" * 20)))
    val got = Multimodal.resizeQuery(spark, dir).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("out_w"), r.getAs[Long]("out_h"))).toMap
    got.values.foreach { case (w, h, ow, oh) =>
      assert(math.max(ow, oh) <= math.max(256L, math.max(w, h)))
      if (math.max(w, h) > 256) assert(math.max(ow, oh) <= 256L)
      else assert((ow, oh) === (w, h))
    }
  }

  test("feature extraction emits deterministic fixed-width vectors") {
    val dir = writeFixture(documents = Seq(doc(0, "abcd"), doc(1, "efgh")))
    val decoded = Multimodal.decodeMedia(Multimodal.mediaFromDocuments(spark, dir))
    val f1 = Multimodal.extractFeatures(decoded).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(decoded).collect().sortBy(_.media_id)
    assert(f1.length === 2)
    assert(f1.forall(_.features.length === 8))
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
  }

  test("frame sampling emits every k-th frame for video rows only") {
    val text = "x" * 100 // video doc_id=2 → n_frames = 1 + 100 % 240 = 101
    val dir = writeFixture(documents = Seq(doc(2, text)))
    val frames = Multimodal.frameSampleQuery(spark, dir).collect()
    assert(frames.forall(_.getAs[Long]("media_id") == 2L))
    val idx = frames.map(_.getAs[Long]("frame_idx")).sorted.toSeq
    assert(idx === (0L until 101L by 8L).toSeq)
  }
}
