package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  private def media = Seq(
    (1L, "a short payload"),
    (2L, "a much longer payload with enough bytes to produce several frames of data")
  ).toDF("id", "text").withColumn("payload", col("text").cast("binary"))

  test("mediaMeta computes byte length, content hash, and magic prefix") {
    val out = media.select(col("id"), Multimodal.mediaMeta(col("payload")).as("m"))
      .select("id", "m.byte_len", "m.content_sha256", "m.magic_hex")
    val r1 = out.where("id = 1").head()
    assert(r1.getAs[Long]("byte_len") == 15L)
    assert(r1.getAs[String]("content_sha256").length == 64)
    // "a short " -> hex
    assert(r1.getAs[String]("magic_hex") == "612073686f727420")
  }

  test("frameSample slides fixed windows; short payloads yield one whole frame") {
    val out = media.select(col("id"),
      Multimodal.frameSample(col("payload"), frameSize = 32, stride = 16).as("frames"))
    val short = out.where("id = 1").select(size(col("frames"))).as[Int].head()
    assert(short == 1)
    val longFrames = out.where("id = 2").select(col("frames")).as[Seq[Array[Byte]]].head()
    // 74 bytes -> floor((74-32)/16)+1 = 3 frames of 32 bytes
    assert(longFrames.size == 3)
    assert(longFrames.forall(_.length == 32))
  }

  test("decodeFeatures emits deterministic fixed-dim normalized features") {
    val out1 = Multimodal.decodeFeatures(media, "payload", "features", dim = 16)
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    val out2 = Multimodal.decodeFeatures(media, "payload", "features", dim = 16)
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(out1 == out2)
    assert(out1.values.forall(_.size == 16))
    val norm = math.sqrt(out1(1L).map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("decodeFeatures accepts a custom decoder") {
    val out = Multimodal.decodeFeatures(media, "payload", "features", dim = 2,
      decoder = b => Array(b.length.toFloat, 0f))
      .select("id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(out(1L) == Seq(15f, 0f))
  }

  test("encodeBmp emits a BMP that the JDK's ImageIO decodes pixel-exact") {
    // golden 3x2: distinct per-pixel channels, including row padding (3*3=9
    // bytes/row -> 3 pad bytes) and the bottom-up row order
    val px = Map(
      (0, 0) -> 0x102030, (1, 0) -> 0x405060, (2, 0) -> 0x708090,
      (0, 1) -> 0xa0b0c0, (1, 1) -> 0x0d0e0f, (2, 1) -> 0xfffefd)
    val bytes = Multimodal.encodeBmp(3, 2, (x, y) => px((x, y)))
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    assert(bytes.length == 54 + 2 * (9 + 3))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 3 && img.getHeight == 2)
    px.foreach { case ((x, y), c) => assert((img.getRGB(x, y) & 0xffffff) == c) }
  }

  test("imageFeatureDecoder recovers width/height/channel sums from BMP bytes") {
    val bytes = Multimodal.encodeBmp(2, 2, (x, y) => (x * 16 << 16) | (y * 32 << 8) | 7)
    val f = Multimodal.imageFeatureDecoder(bytes)
    assert(f.toSeq == Seq(2f, 2f, 32f, 64f, 28f)) // sums: 0+16+0+16, 0+0+32+32, 7*4
  }

  test("syntheticBmp + decodeFeatures round-trip matches the pixel formula") {
    val ids = spark.range(0, 20).toDF("doc_id")
    val out = Multimodal.decodeFeatures(
        Multimodal.syntheticBmp(ids, "doc_id", "payload"), "payload", "features",
        dim = 5, decoder = Multimodal.imageFeatureDecoder)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect()
    assert(out.length == 20)
    out.foreach { case (d, f) =>
      val w = (4 + d % 5).toInt; val h = (3 + d % 4).toInt
      val pts = for { x <- 0 until w; y <- 0 until h } yield (x, y)
      val sr = pts.map { case (x, y) => (d * 7 + x * 13 + y * 31) % 256 }.sum
      val sg = pts.map { case (x, y) => (d * 11 + x * 17 + y * 5) % 256 }.sum
      val sb = pts.map { case (x, y) => (d * 3 + x * 29 + y * 23) % 256 }.sum
      assert(f == Seq(w.toFloat, h.toFloat, sr.toFloat, sg.toFloat, sb.toFloat))
    }
  }

  test("encodeImage PNG round-trips pixel-exact; same features and aHash as the BMP encoding") {
    // PNG is lossless: the JDK-writer payload must decode to the exact
    // pixels, so features and aHash agree with the independently
    // hand-rolled BMP container of the same image.
    def rgb(x: Int, y: Int): Int = ((x * 37 + y * 11) % 256 << 16) |
      ((x * 5 + y * 61) % 256 << 8) | ((x * 23 + y * 3) % 256)
    val png = Multimodal.encodeImage(9, 7, rgb, "png")
    val bmp = Multimodal.encodeBmp(9, 7, rgb)
    assert(png.take(8).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a))
    assert(Multimodal.imageFeatureDecoder(png).toSeq == Multimodal.imageFeatureDecoder(bmp).toSeq)
    assert(Multimodal.imageAHash(png) == Multimodal.imageAHash(bmp))
  }

  test("syntheticPng + decodeFeatures matches the BMP lane row for row") {
    val ids = spark.range(0, 20).toDF("doc_id")
    def feats(payload: org.apache.spark.sql.DataFrame) =
      Multimodal.decodeFeatures(payload, "payload", "features",
          dim = 5, decoder = Multimodal.imageFeatureDecoder)
        .select("doc_id", "features").as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    assert(feats(Multimodal.syntheticPng(ids, "doc_id", "payload"))
      == feats(Multimodal.syntheticBmp(ids, "doc_id", "payload")))
  }

  test("JPEG payloads ride the same decode lane: exact dims, bounded channel error") {
    // JPEG is lossy, so only the container changes the numbers: dims must
    // be exact; on a smooth gradient the per-pixel channel error stays
    // small (assert mean abs error < 8 of 255).
    def rgb(x: Int, y: Int): Int = {
      val v = 40 + x * 4 + y * 3
      (v << 16) | (v << 8) | v
    }
    val jpg = Multimodal.encodeImage(16, 16, rgb, "jpg")
    val f = Multimodal.imageFeatureDecoder(jpg)
    assert(f(0) == 16f && f(1) == 16f)
    val exactSum = (for { x <- 0 until 16; y <- 0 until 16 } yield 40 + x * 4 + y * 3).sum
    Seq(f(2), f(3), f(4)).foreach { s =>
      assert(math.abs(s - exactSum) / 256.0 < 8.0, s"channel sum $s vs $exactSum")
    }
    // and through the batched lane: one JPEG row among BMP/PNG rows decodes
    // uniformly (the lane sniffs nothing — ImageIO's reader registry does)
    val mixed = Seq(
      (1L, Multimodal.encodeBmp(4, 3, rgb)),
      (2L, Multimodal.encodeImage(4, 3, rgb, "png")),
      (3L, Multimodal.encodeImage(4, 3, rgb, "jpg"))).toDF("doc_id", "payload")
    val out = Multimodal.decodeFeatures(mixed, "payload", "features",
        dim = 5, decoder = Multimodal.imageFeatureDecoder)
      .select("doc_id", "features").as[(Long, Seq[Float])].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == out(2L)) // lossless containers agree exactly
    assert(out(3L)(0) == 4f && out(3L)(1) == 3f)
  }

  test("repartitionByBytes sizes partitions by payload volume") {
    val out = Multimodal.repartitionByBytes(media, "payload", targetBytesPerTask = 40)
    assert(out.rdd.getNumPartitions == 2) // ~89 bytes total / 40 -> 2
    assert(out.count() == 2)
  }

  test("imageAHash is stable under brightness shift and flips bits on inversion") {
    // flat gradient image: left half dark, right half bright
    def img(base: Int) = Multimodal.encodeBmp(16, 16, (x, _) =>
      { val v = if (x < 8) base else base + 100; (v << 16) | (v << 8) | v })
    val (h1, l1) = Multimodal.imageAHash(img(20))
    val (h2, l2) = Multimodal.imageAHash(img(80)) // same structure, brighter
    assert((h1, l1) == (h2, l2)) // aHash thresholds on the per-image mean
    // inverted structure -> complementary bits
    val inv = Multimodal.encodeBmp(16, 16, (x, _) =>
      { val v = if (x >= 8) 20 else 120; (v << 16) | (v << 8) | v })
    val (h3, l3) = Multimodal.imageAHash(inv)
    assert(java.lang.Long.bitCount((l1 ^ l3) & 0xffffffffL) +
      java.lang.Long.bitCount((h1 ^ h3) & 0xffffffffL) == 64)
    // halves are non-negative 32-bit (cross-engine packing contract)
    Seq(h1, l1, h3, l3).foreach(v => assert(v >= 0 && v <= 0xffffffffL))
  }

  test("animated GIF round-trips frame count and pixel sums exactly") {
    val bytes = Multimodal.encodeGifFrames(4, 3, 3, (f, x, y) => {
      val v = ((f * 19 + x * 13 + y * 31) % 4) * 85
      (v << 16) | (v << 8) | v
    })
    assert(new String(bytes.slice(0, 6), "US-ASCII").startsWith("GIF8"))
    val (n, w, h, sr, sg, sb) = Multimodal.gifFrameStats(bytes)
    val expect = (for (f <- 0 until 3; y <- 0 until 3; x <- 0 until 4)
      yield ((f * 19 + x * 13 + y * 31) % 4) * 85L).sum
    assert((n, w, h) == ((3L, 4L, 3L)))
    assert(sr == expect && sg == expect && sb == expect)
  }

  test("decodeGifStats matches the per-payload function through the batched lane") {
    val ids = spark.range(0, 8).toDF("doc_id")
    val withBin = Multimodal.syntheticGif(ids, "doc_id", "payload")
    val batched = Multimodal.decodeGifStats(withBin, "payload")
      .select("doc_id", "n_frames", "sum_r").as[(Long, Long, Long)].collect().sortBy(_._1)
    val direct = withBin.select("doc_id", "payload").as[(Long, Array[Byte])]
      .collect().map { case (d, p) =>
        val (n, _, _, sr, _, _) = Multimodal.gifFrameStats(p); (d, n, sr)
      }.sortBy(_._1)
    assert(batched.toSeq == direct.toSeq)
    // frame count follows the schedule
    batched.foreach { case (d, n, _) => assert(n == 2 + d % 3) }
  }

  test("decodeGifFrameSigs: identical frames across docs share a signature") {
    // two docs with the SAME constant-color 2-frame animation + one distinct
    def flat(v: Int) = Multimodal.encodeGifFrames(2, 2, 2, (_, _, _) => (v << 16) | (v << 8) | v)
    val df = Seq((1L, flat(85)), (2L, flat(85)), (3L, flat(170)))
      .toDF("doc_id", "payload")
    val sigs = Multimodal.decodeGifFrameSigs(df, "doc_id", "payload")
      .as[(Long, Long, String)].collect()
    assert(sigs.length == 6) // 3 docs x 2 frames
    val byDoc = sigs.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    assert(byDoc(1L) == byDoc(2L)) // shared intro detected
    assert(byDoc(1L) != byDoc(3L))
    assert(sigs.find(_._1 == 1L).get._3 == "85.85.85,85.85.85,85.85.85,85.85.85")
  }

  test("wavEnergyProfile: same PCM content shares a profile; trailing partial frame ignored") {
    val a = Array.tabulate[Short](400)(i => (i % 100).toShort) // 2 frames + 80 tail
    val wavA = Multimodal.encodeWavPcm16(8000, a)
    val wavB = Multimodal.encodeWavPcm16(16000, a) // same samples, other rate
    val pA = Multimodal.wavEnergyProfile(wavA)
    assert(pA == Multimodal.wavEnergyProfile(wavB)) // container-rate independent
    assert(pA.split(",").length == 2)
    val expect0 = (0 until 160).map(i => (i % 100).toLong).sum
    assert(pA.split(",")(0).toLong == expect0)
    val quiet = Multimodal.encodeWavPcm16(8000, Array.fill[Short](320)(1))
    assert(Multimodal.wavEnergyProfile(quiet) != pA)
  }

  test("encodeWavPcm16 emits RIFF that javax.sound decodes sample-exact") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7, -7)
    val wav = Multimodal.encodeWavPcm16(8000, samples)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (sr, ch, n, sumAbs, maxAbs, _) = Multimodal.wavStats(wav)
    assert((sr, ch, n) == (8000L, 1L, 7L))
    assert(sumAbs == samples.map(s => math.abs(s.toLong)).sum)
    assert(maxAbs == 32768L)
  }

  test("wavStats silence frames: quiet frames below the threshold count") {
    // frame 1: all tiny (silent); frame 2: one loud sample (not silent);
    // a trailing partial frame is ignored
    val quiet = Array.fill[Short](160)(50)
    val loud = Array.fill[Short](160)(50); loud(80) = 1000
    val tail = Array.fill[Short](80)(0)
    val wav = Multimodal.encodeWavPcm16(16000, quiet ++ loud ++ tail)
    val (_, _, n, _, _, silent) = Multimodal.wavStats(wav)
    assert(n == 400L && silent == 1L)
  }

  test("syntheticWav quiet docs (d%7=0) are all-silent; loud docs are not") {
    val ids = spark.range(0, 15).toDF("doc_id")
    val out = Multimodal.decodeWavStats(
        Multimodal.syntheticWav(ids, "doc_id", "payload"), "payload")
      .select("doc_id", "n_samples", "silence_frames").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    out.foreach { case (d, (n, silent)) =>
      if (d % 7 == 0) assert(silent == n / 160, s"doc $d should be fully silent")
      else assert(silent == 0L, s"doc $d should have no silent frame")
    }
    // duration: doc 1 -> 12 kHz, 800 samples -> 66666 us
    val dur = Multimodal.decodeWavStats(
        Multimodal.syntheticWav(ids.where("doc_id = 1"), "doc_id", "payload"), "payload")
      .select("duration_micros").as[Long].head()
    assert(dur == 800L * 1000000L / 12000L)
  }

  test("decodeAHash matches the single-payload function through the batched lane") {
    val ids = spark.range(0, 6).toDF("doc_id")
    val withBin = Multimodal.syntheticBmp(ids, "doc_id", "payload")
    val batched = Multimodal.decodeAHash(withBin, "payload")
      .select("doc_id", "ph_hi", "ph_lo").as[(Long, Long, Long)].collect()
    val direct = withBin.select("doc_id", "payload").as[(Long, Array[Byte])]
      .collect().map { case (d, p) =>
        val (hi, lo) = Multimodal.imageAHash(p); (d, hi, lo)
      }
    assert(batched.sortBy(_._1).toSeq == direct.sortBy(_._1).toSeq)
  }
}
