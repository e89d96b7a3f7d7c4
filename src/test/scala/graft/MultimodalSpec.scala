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
    // doc 0 is a planted P6 (0 % 21 == 0): w=4, h=3 → 11-byte header
    // ("P6\n4 3\n255\n") + 36 raster bytes. doc 1 is a planted WAV
    // (1 % 21 == 1): 44-byte canonical header + 64 + 1 % 100 samples.
    // doc 2 is a planted animated GIF (2 % 21 == 2): w=4, h=2, 4 frames,
    // LZW bytes/frame D = ceil(9·17/8) = 20 → 782 + 4·(21+20) = 946.
    assert(got(0L) === ("image", 47L))
    assert(got(1L) === ("audio", (44 + 64 + 1).toLong))
    assert(got(2L) === ("video", 946L))
    assert(got(3L) === ("image", 4L))
  }

  test("planted P6 payloads are really parsed: geometry and raster sum") {
    // 63/21 = 3, 3%3 = 0 → PPM. syntheticPpm(63): w = 4+63%13 = 15,
    // h = 3+63%11 = 11.
    val dir = writeFixture(documents = Seq(
      doc(63, "this text is replaced by a planted ppm")))
    val got = Multimodal.decodeQuery(spark, dir).collect().head
    assert(got.getAs[String]("kind") === "image")
    assert(got.getAs[Long]("width") === 15L)
    assert(got.getAs[Long]("height") === 11L)
    assert(got.getAs[Long]("n_frames") === 1L)
    // Header "P6\n15 11\n255\n" = 13 bytes.
    assert(got.getAs[Long]("n_bytes") === (13 + 3 * 15 * 11).toLong)
    val wantSum = (0 until 3 * 15 * 11).map(i => (63L * 7 + i.toLong * 31) % 256).sum
    assert(got.getAs[Long]("checksum") === wantSum)
  }

  test("planted PNG payloads go through javax.imageio: geometry, length, raster sum") {
    // 21/21 = 1 → PNG. syntheticPng(21): w = 5+21%11 = 15, h = 4+21%7 = 4.
    val dir = writeFixture(documents = Seq(
      doc(21, "this text is replaced by a planted png")))
    val got = Multimodal.decodeQuery(spark, dir).collect().head
    assert(got.getAs[String]("kind") === "image")
    assert(got.getAs[Long]("width") === 15L)
    assert(got.getAs[Long]("height") === 4L)
    // Stored-deflate closed form: 68 + h·(1+3w).
    assert(got.getAs[Long]("n_bytes") === (68 + 4 * (1 + 3 * 15)).toLong)
    val wantSum = (0 until 3 * 15 * 4).map(i => (21L * 13 + i.toLong * 17) % 256).sum
    assert(got.getAs[Long]("checksum") === wantSum)
  }

  test("planted BMP payloads go through javax.imageio: geometry, length, raster sum") {
    // 42/21 = 2 → BMP. syntheticBmp(42): w = 6+42%9 = 12, h = 3+42%5 = 5;
    // rowSize = (36+3)/4*4 = 36 (3w already 4-aligned).
    val dir = writeFixture(documents = Seq(
      doc(42, "this text is replaced by a planted bmp")))
    val got = Multimodal.decodeQuery(spark, dir).collect().head
    assert(got.getAs[String]("kind") === "image")
    assert(got.getAs[Long]("width") === 12L)
    assert(got.getAs[Long]("height") === 5L)
    assert(got.getAs[Long]("n_bytes") === (54 + 5 * 36).toLong)
    val wantSum = (0 until 3 * 12 * 5).map(i => (42L * 11 + i.toLong * 29) % 256).sum
    assert(got.getAs[Long]("checksum") === wantSum)
  }

  test("planted WAV payloads are really parsed: rate, channels, frames, sample sum") {
    // 22 % 21 == 1 → WAV on an audio-kind row (22 % 3 == 1). n = 64+22 = 86
    // samples, rate = 8000 + (22%5)*1000 = 10000.
    val dir = writeFixture(documents = Seq(
      doc(22, "this text is replaced by a planted wav")))
    val got = Multimodal.decodeQuery(spark, dir).collect().head
    assert(got.getAs[String]("kind") === "audio")
    assert(got.getAs[Long]("width") === 10000L)  // sample rate
    assert(got.getAs[Long]("height") === 1L)     // channels
    assert(got.getAs[Long]("n_frames") === 86L)  // PCM frames
    assert(got.getAs[Long]("n_bytes") === (44 + 86).toLong)
    val wantSum = (0 until 86).map(i => (22L * 19 + i.toLong * 37) % 256).sum
    assert(got.getAs[Long]("checksum") === wantSum)
  }

  test("audio features: energy, zero crossings, peak recomputed from the planted ramp") {
    // doc 22 (≡1 mod 21 → planted WAV, 86 samples); doc 21 (≡0 mod 21 →
    // image row) must not appear in the audio relation.
    val dir = writeFixture(documents = Seq(
      doc(22, "replaced by wav"), doc(21, "image row stays out")))
    val rows = Multimodal.audioFeaturesQuery(spark, dir).collect()
    assert(rows.length === 1)
    val got = rows.head
    assert(got.getAs[Long]("media_id") === 22L)
    assert(got.getAs[Long]("n_samples") === 86L)
    // independent recomputation from the plant formula
    val s = (0 until 86).map(i => ((22L * 19 + i * 37) % 256).toInt)
    val energy = s.map(v => (v - 128).toLong * (v - 128)).sum
    val zc = (1 until 86).count(i => (s(i - 1) < 128) != (s(i) < 128)).toLong
    val peak = s.map(v => math.abs(v - 128).toLong).max
    assert(got.getAs[Long]("energy") === energy)
    assert(got.getAs[Long]("zero_cross") === zc)
    assert(got.getAs[Long]("peak") === peak)
    assert(energy > 0L && zc > 0L)
  }

  test("WavCodec: roundtrip directly; malformed RIFF refuses") {
    import Multimodal.{WavCodec, syntheticWav}
    val wav = WavCodec.tryDecode(MediaFile(22, "audio", syntheticWav(22))).get
    assert((wav.width, wav.height, wav.n_frames) === (10000L, 1L, 86L))
    // Truncated data chunk, wrong RIFF size, non-PCM format tag: refuse.
    assert(WavCodec.tryDecode(MediaFile(1, "audio", syntheticWav(22).take(50))).isEmpty)
    val badSize = syntheticWav(22).clone(); badSize(4) = (badSize(4) + 1).toByte
    assert(WavCodec.tryDecode(MediaFile(2, "audio", badSize)).isEmpty)
    val nonPcm = syntheticWav(22).clone(); nonPcm(20) = 3 // IEEE float tag
    assert(WavCodec.tryDecode(MediaFile(3, "audio", nonPcm)).isEmpty)
    assert(WavCodec.tryDecode(MediaFile(4, "audio", "RIFF but prose".getBytes)).isEmpty)
  }

  test("ImageIoCodec: PNG/BMP roundtrip directly; junk refuses") {
    import Multimodal.{ImageIoCodec, syntheticBmp, syntheticPng}
    val png = ImageIoCodec.tryDecode(MediaFile(21, "image", syntheticPng(21))).get
    assert((png.width, png.height) === (15L, 4L))
    val bmp = ImageIoCodec.tryDecode(MediaFile(42, "image", syntheticBmp(42))).get
    assert((bmp.width, bmp.height) === (12L, 5L))
    // Truncated PNG: magic matches but ImageIO can't produce an image.
    val broken = syntheticPng(21).take(20)
    assert(ImageIoCodec.tryDecode(MediaFile(1, "image", broken)).isEmpty)
    assert(ImageIoCodec.tryDecode(MediaFile(2, "image", "plain prose".getBytes)).isEmpty)
  }

  test("dispatch keys on the planted predicate, not payload content") {
    // A NON-planted media_id whose payload IS a complete valid P6 must
    // still take the stub branch — mirroring the oracle, which
    // partitions on doc_id, never on content.
    val p6 = "P6\n2 2\n255\n".getBytes ++ Array.tabulate(12)(_.toByte)
    val m = MediaFile(5, "image", p6) // 5 % 21 != 0
    assert(Multimodal.decode(m) === FakeCodec.decode(m))
  }

  test("PPM parser: P6/P5 roundtrip; malformed payloads fall back to the stub") {
    import Multimodal.PpmCodec
    val p6 = "P6\n2 2\n255\n".getBytes ++ Array.tabulate(12)(_.toByte)
    val d6 = PpmCodec.tryDecode(MediaFile(7, "image", p6)).get
    assert((d6.width, d6.height, d6.n_frames) === (2L, 2L, 1L))
    assert(d6.checksum === (0 until 12).sum.toLong)
    assert(d6.n_bytes === p6.length.toLong)
    // PGM with a header comment: 1 channel, raster = w*h bytes.
    val p5 = "P5\n# a comment\n3 2\n255\n".getBytes ++
      Array.tabulate(6)(i => (10 + i).toByte)
    val d5 = PpmCodec.tryDecode(MediaFile(8, "image", p5)).get
    assert((d5.width, d5.height) === (3L, 2L))
    assert(d5.checksum === (10 until 16).sum.toLong)
    // Malformed: truncated raster / prose starting with the magic /
    // 2-byte-per-sample maxval — all must refuse, then dispatch stubs.
    val truncated = "P6\n2 2\n255\n".getBytes ++ Array.fill(11)(0.toByte)
    assert(PpmCodec.tryDecode(MediaFile(9, "image", truncated)).isEmpty)
    val prose = "P6 is a picture format".getBytes
    assert(PpmCodec.tryDecode(MediaFile(10, "image", prose)).isEmpty)
    val deep = "P6\n2 2\n65535\n".getBytes ++ Array.fill(24)(0.toByte)
    assert(PpmCodec.tryDecode(MediaFile(11, "image", deep)).isEmpty)
    assert(Multimodal.decode(MediaFile(10, "image", prose)) ===
      FakeCodec.decode(MediaFile(10, "image", prose)))
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
    val media = Multimodal.mediaFromDocuments(spark, dir)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.length === 2)
    assert(f1.forall(_.features.length === Multimodal.FeatureDim))
    assert(f1.map(_.features.toSeq).toSeq === f2.map(_.features.toSeq).toSeq)
  }

  test("real features: hand-computed histogram/moments for the planted PPM of id 0") {
    // syntheticPpm(0): w=4, h=3, raster byte i = (31*i) mod 256 for
    // i in 0..35. Hand-walking the 36 values gives bin counts (div 32)
    // [6,5,4,4,4,4,4,5], sum 4426 -> floor mean 122, min 0 (i=0),
    // max 255 (i=33: 31*33=1023 = 3*256+255).
    val s = spark
    import s.implicits._
    val media = Seq(Multimodal.MediaFile(0L, "image", Multimodal.syntheticPpm(0L))).toDS()
    val got = Multimodal.extractFeatures(media).collect().head.features.toSeq
    assert(got === Seq[Float](6, 5, 4, 4, 4, 4, 4, 5, 36, 122, 0, 255))
  }

  test("real features: WAV sample bytes and GIF frame samples feed the same stats") {
    val s = spark
    import s.implicits._
    // WAV id 22 (22 % 21 == 1): n = 64 + 22 % 100 = 86 samples, ramp
    // (22*19 + 37i) mod 256. Independently recompute from the ramp.
    val wavSamples = (0 until 86).map(i => ((22L * 19 + i.toLong * 37) % 256).toInt)
    val wavGot = Multimodal.extractFeatures(
      Seq(Multimodal.MediaFile(22L, "audio", Multimodal.syntheticWav(22L))).toDS())
      .collect().head.features.toSeq
    assert(wavGot === featuresOf(wavSamples))
    // GIF id 23 (23 % 21 == 2): geometry from the generator's formulas
    // (w = 2 + id%3, h = 2 + id%2, frames = 2 + id%4); palette entry v is
    // (v,v,v) so each index contributes three identical channel samples.
    val gw = (2 + 23 % 3); val gh = (2 + 23 % 2); val gf = (2 + 23 % 4)
    val gifIdx = for (f <- 0 until gf; i <- 0 until gw * gh)
      yield ((23L * 23 + f.toLong * 41 + i.toLong * 53) % 256).toInt
    val gifSamples = gifIdx.flatMap(v => Seq(v, v, v))
    val gifGot = Multimodal.extractFeatures(
      Seq(Multimodal.MediaFile(23L, "video", Multimodal.syntheticGif(23L))).toDS())
      .collect().head.features.toSeq
    assert(gifGot === featuresOf(gifSamples))
  }

  /** Reference feature computation for the spec (independent reimpl). */
  private def featuresOf(samples: Seq[Int]): Seq[Float] = {
    val hist = new Array[Float](Multimodal.FeatureBins)
    samples.foreach(v => hist(v / 32) += 1f)
    hist.toSeq ++ Seq[Float](samples.size.toFloat,
      (samples.map(_.toLong).sum / samples.size).toFloat,
      samples.min.toFloat, samples.max.toFloat)
  }

  test("frame sampling emits every k-th frame for video rows only") {
    // doc 5: non-planted video (5 % 3 == 2, 5 % 21 == 5) → stub
    // n_frames = 1 + 100 % 240 = 101; doc 23: planted Y4M
    // (23 % 21 == 2, 23/21 odd) → REAL container frame count
    // 2 + 23 % 3 = 4, so every-8th sampling keeps frame 0 only.
    val text = "x" * 100
    val dir = writeFixture(documents = Seq(doc(5, text), doc(23, "replaced")))
    val frames = Multimodal.frameSampleQuery(spark, dir).collect()
    val byId = frames.groupBy(_.getAs[Long]("media_id"))
    assert(byId.keySet === Set(5L, 23L))
    assert(byId(5L).map(_.getAs[Long]("frame_idx")).sorted.toSeq ===
      (0L until 101L by 8L).toSeq)
    assert(byId(23L).map(_.getAs[Long]("frame_idx")).toSeq === Seq(0L))
    assert(byId(23L).head.getAs[Long]("n_frames") === 4L)
  }

  test("planted animated GIF payloads are really parsed: frames, geometry, sums") {
    // doc 44 ≡ 2 mod 21, 44/21 = 2 even → GIF: w = 2+44%3 = 4,
    // h = 2+44%2 = 2, frames = 2+44%4 = 2; codes/frame = 2·8+1 = 17 →
    // D = ⌈153/8⌉ = 20; n_bytes = 782 + 2·(21+20) = 864. Checksum:
    // grayscale palette ⇒ 3 × the index-ramp sum across both frames.
    val dir = writeFixture(documents = Seq(doc(44, "this text is replaced")))
    val got = Multimodal.decodeQuery(spark, dir).collect().head
    assert(got.getAs[String]("kind") === "video")
    assert(got.getAs[Long]("width") === 4L)
    assert(got.getAs[Long]("height") === 2L)
    assert(got.getAs[Long]("n_frames") === 2L)
    assert(got.getAs[Long]("n_bytes") === 864L)
    val wantSum = (for { f <- 0 until 2; i <- 0 until 8 }
      yield 3L * ((44L * 23 + f.toLong * 41 + i.toLong * 53) % 256)).sum
    assert(got.getAs[Long]("checksum") === wantSum)
  }

  test("planted Y4M payloads are really parsed: frames, geometry, plane sums") {
    // doc 23 ≡ 2 mod 21, 23/21 = 1 odd → YUV4MPEG2: w = 2+23%7 = 4,
    // h = 2+23%5 = 5, frames = 2+23%3 = 4; header "YUV4MPEG2 W4 H5
    // F25:1 Ip A1:1 C444\n" = 35 bytes, frame = 6 + 3·20 = 66 →
    // n_bytes = 35 + 4·66 = 299.
    val dir = writeFixture(documents = Seq(doc(23, "this text is replaced")))
    val got = Multimodal.decodeQuery(spark, dir).collect().head
    assert(got.getAs[String]("kind") === "video")
    assert(got.getAs[Long]("width") === 4L)
    assert(got.getAs[Long]("height") === 5L)
    assert(got.getAs[Long]("n_frames") === 4L)
    assert(got.getAs[Long]("n_bytes") === 299L)
    val wantSum = (for { f <- 0 until 4; i <- 0 until 60 }
      yield (23L * 29 + f.toLong * 47 + i.toLong * 59) % 256).sum
    assert(got.getAs[Long]("checksum") === wantSum)
  }

  test("Y4mCodec: hand-walked stream; C420 plane math; malformed refuses") {
    import Multimodal.Y4mCodec
    // Hand-built 2×2 C444 stream, two frames with explicit plane bytes:
    // frame 0 = 1..12, frame 1 = 101..112 (values chosen by hand, no
    // generator involved) — the parser must count 2 frames and sum all
    // 24 plane bytes.
    val header = "YUV4MPEG2 W2 H2 F30:1 Ip A1:1 C444\n".getBytes
    val f0 = "FRAME\n".getBytes ++ Array.tabulate(12)(i => (i + 1).toByte)
    val f1 = "FRAME\n".getBytes ++ Array.tabulate(12)(i => (i + 101).toByte)
    val d = Y4mCodec.tryDecode(MediaFile(2, "video", header ++ f0 ++ f1)).get
    assert((d.width, d.height, d.n_frames) === (2L, 2L, 2L))
    assert(d.checksum === ((1 to 12).sum + (101 to 112).sum).toLong)
    assert(d.n_bytes === (35 + 2 * 18).toLong)
    // Frame-level parameters after the FRAME keyword are legal.
    val fp = "FRAME Xsome-param\n".getBytes ++ Array.tabulate(12)(_.toByte)
    assert(Y4mCodec.tryDecode(MediaFile(2, "video", header ++ fp)).get.n_frames === 1L)
    // C420 (the spec default when C is absent): 4×2 → Y 8 + 2·(2·1) = 12
    // bytes per frame.
    val h420 = "YUV4MPEG2 W4 H2 F25:1\n".getBytes
    val c420 = h420 ++ "FRAME\n".getBytes ++ Array.tabulate(12)(i => (i + 1).toByte)
    val d420 = Y4mCodec.tryDecode(MediaFile(2, "video", c420)).get
    assert((d420.width, d420.height, d420.checksum) === (4L, 2L, (1 to 12).sum.toLong))
    // Refusals: truncated last frame, odd-geometry C420, prose with the
    // magic but no frames, junk magic — each None, then dispatch stubs.
    assert(Y4mCodec.tryDecode(MediaFile(2, "video",
      (header ++ f0 ++ f1).dropRight(1))).isEmpty)
    assert(Y4mCodec.tryDecode(MediaFile(2, "video",
      "YUV4MPEG2 W3 H2 F25:1\n".getBytes ++ "FRAME\n".getBytes ++
        Array.fill(9)(0.toByte))).isEmpty)
    val prose = "YUV4MPEG2 W2 H2 is a video format\n".getBytes
    assert(Y4mCodec.tryDecode(MediaFile(2, "video", prose)).isEmpty)
    assert(Y4mCodec.tryDecode(MediaFile(2, "video", "not a stream".getBytes)).isEmpty)
    assert(Multimodal.decode(MediaFile(2, "video", prose)) ===
      FakeCodec.decode(MediaFile(2, "video", prose)))
    // Generator roundtrip at a second id: 65 ≡ 2 mod 21, 65/21 = 3 odd.
    // w = 2+65%7 = 4, h = 2+65%5 = 2, frames = 2+65%3 = 4.
    val d65 = Y4mCodec.tryDecode(
      MediaFile(65, "video", Multimodal.syntheticY4m(65))).get
    assert((d65.width, d65.height, d65.n_frames) === (4L, 2L, 4L))
    // Y4M plane samples feed feature extraction exactly like GIF RGB.
    val s = spark
    import s.implicits._
    val y4mSamples = for (f <- 0 until 4; i <- 0 until 24)
      yield ((65L * 29 + f.toLong * 47 + i.toLong * 59) % 256).toInt
    val got = Multimodal.extractFeatures(
      Seq(Multimodal.MediaFile(65L, "video", Multimodal.syntheticY4m(65L))).toDS())
      .collect().head.features.toSeq
    val hist = new Array[Float](Multimodal.FeatureBins)
    y4mSamples.foreach(v => hist(v / 32) += 1f)
    val want = hist.toSeq ++ Seq[Float](y4mSamples.size.toFloat,
      (y4mSamples.map(_.toLong).sum / y4mSamples.size).toFloat,
      y4mSamples.min.toFloat, y4mSamples.max.toFloat)
    assert(got === want)
  }

  test("GifCodec: multi-frame roundtrip directly; junk refuses") {
    import Multimodal.GifCodec
    // id 44: w = 2+44%3 = 4, h = 2+44%2 = 2, frames = 2+44%4 = 2.
    val gif = Multimodal.syntheticGif(44)
    val d = GifCodec.tryDecode(MediaFile(44, "video", gif)).get
    assert((d.width, d.height, d.n_frames) === (4L, 2L, 2L))
    assert(d.n_bytes === gif.length.toLong)
    val wantSum = (for { f <- 0 until 2; i <- 0 until 8 }
      yield 3L * ((44L * 23 + f.toLong * 41 + i.toLong * 53) % 256)).sum
    assert(d.checksum === wantSum)
    // Prose that merely starts with the magic must refuse (ImageIO can't
    // parse it), and the dispatch then stubs it.
    val junk = MediaFile(2, "video", "GIF89a is a file format".getBytes)
    assert(GifCodec.tryDecode(junk).isEmpty)
  }

  test("feature IVF: probe prunes to nprobe cells, recall algebra consistent with both public arms") {
    import org.apache.spark.sql.functions.col
    val sfDir = "/root/testdata/sf0.001"
    val ivf = Multimodal.featureIvfTopKQuery(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Int]("rnk")))
    assert(ivf.nonEmpty)
    assert(ivf.forall { case (q, n, rnk) => q != n && rnk >= 1 && rnk <= 5 })
    // ≤ k rows per query, ranks contiguous from 1
    ivf.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.size), q)
    }
    // recall relation = |exact ∩ ivf| per query, recomputed independently
    // from the two public arms
    val feats = Multimodal.extractFeatures(
      Multimodal.mediaFromDocuments(spark, sfDir)).toDF()
    val exact = Multimodal.featureExactTopKOf(feats, 20L, 5L).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val ivfSet = ivf.map(t => (t._1, t._2)).toSet
    val recall = Multimodal.featureIvfRecallQuery(spark, sfDir).collect()
      .map(r => r.getAs[Long]("query_id") ->
        ((r.getAs[Long]("k"), r.getAs[Long]("hits")))).toMap
    assert(recall.keySet === exact.map(_._1).toSet)
    exact.groupBy(_._1).foreach { case (q, ns) =>
      val hits = ns.count(ivfSet).toLong
      assert(recall(q) === ((ns.size.toLong, hits)), q)
    }
  }

  test("feature ANN: a planted near-identical image pair are each other's top neighbor") {
    val s = spark
    import s.implicits._
    // Two REAL P6 images through the genuine decode path (ids ≡ 0 mod
    // 21): identical 4×3 rasters except ONE sample moved a bin over —
    // near-identical in feature space, not byte-identical.
    val base = "P6\n4 3\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array.tabulate(36)(i => ((i * 31) % 256).toByte)
    val twin = base.clone()
    twin(twin.length - 1) =
      (((twin(twin.length - 1) & 0xff) + 40) % 256).toByte
    // Contrasting corpus: opaque text payloads (byte histograms live in
    // the ASCII bins, nothing like the near-uniform image ramps).
    val fillers = Seq(3L, 4L, 5L, 6L, 7L, 8L).map { id =>
      MediaFile(id, "image",
        (s"doc $id " + "lorem ipsum dolor sit amet " * (id.toInt % 3 + 1)).getBytes)
    }
    val media = Seq(MediaFile(0, "image", base), MediaFile(21, "image", twin)) ++ fillers
    val features = Multimodal.extractFeatures(media.toDS()).toDF()
    val top1 = Multimodal.featureTopKOf(features, numQueries = 22L, k = 3L)
      .where(org.apache.spark.sql.functions.col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1(0L) === 21L, s"image 0's nearest feature neighbor must be its twin: $top1")
    assert(top1(21L) === 0L, s"image 21's nearest feature neighbor must be its twin: $top1")
    // The exact brute-force arm agrees on the planted pair — the ground
    // truth the recall gate anchors to.
    val exact1 = Multimodal.featureExactTopKOf(features, numQueries = 22L, k = 3L)
      .where(org.apache.spark.sql.functions.col("rnk") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact1(0L) === 21L && exact1(21L) === 0L,
      s"exact arm must rank the twins mutually first: $exact1")
  }
}
