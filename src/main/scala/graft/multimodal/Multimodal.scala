package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media are opaque `binary` payload columns with typed
  * metadata, processed in partition-sized batches.
  *
  * The Spark-side plumbing — schema, batching, partitioning, feature
  * shapes — is real and tested, and so is the image path:
  * [[imageFeatureDecoder]] decodes BMP/PNG/GIF payloads through the JDK's
  * ImageIO readers (present in every JRE). `decodeFeatures` takes the
  * decoder as a parameter, so heavier external codecs (JPEG-XL, audio,
  * video) plug into the same batched lane; [[stubDecoder]] remains the
  * deterministic fallback for payload formats with no in-container codec.
  */
object Multimodal {

  /** Metadata struct for an opaque media payload: byte length, 256-bit
    * content hash (dedup key), and the leading magic bytes (format sniff).
    */
  def mediaMeta(bin: Column): Column = struct(
    octet_length(bin).cast("bigint").as("byte_len"),
    sha2(bin, 256).as("content_sha256"),
    lower(hex(substring(bin, 1, 8))).as("magic_hex"))

  /** Sample fixed-size frames every `stride` bytes — the binary analogue
    * of video frame sampling; pure columnar (substring on binary), no UDF.
    */
  def frameSample(bin: Column, frameSize: Int, stride: Int): Column =
    when(octet_length(bin) >= frameSize,
      transform(
        sequence(lit(0), floor((octet_length(bin) - frameSize) / stride).cast("int")),
        i => substring_index_free(bin, i * stride + 1, frameSize)))
      .otherwise(array(bin))

  // substring() only has (Column, Int, Int); expr keeps start dynamic.
  private def substring_index_free(bin: Column, start: Column, len: Int): Column =
    substr(bin, start, lit(len))

  /** STUB decoder: a real deployment plugs an image/audio codec in here
    * (not available in this container). The fake is deterministic: byte
    * histogram folded into `dim` float buckets, L2-normalized — shaped
    * exactly like a perceptual embedding so downstream operators
    * (similarity, dedup) are exercised for real.
    */
  def stubDecoder(dim: Int)(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      acc((payload(i) & 0xff) % dim) += 1f
      i += 1
    }
    val n = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat
    if (n > 0) acc.map(_ / n) else acc
  }

  /** Encode a 24-bpp uncompressed BMP (BITMAPINFOHEADER, bottom-up rows,
    * 4-byte row padding — the baseline Windows bitmap layout). `rgb(x, y)`
    * returns a packed 0xRRGGBB with (0, 0) the top-left pixel. Used to
    * build real, independently-decodable media payloads for the decode
    * pipeline: the JDK's ImageIO BMP reader decodes them, so the
    * encode/decode pair is not a mirrored stub.
    */
  def encodeBmp(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad BMP dims ${width}x$height")
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)                        // file header
    buf.putInt(40).putInt(width).putInt(height).putShort(1)
      .putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)             // info header
    var y = height - 1 // positive height = bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val c = rgb(x, y)
        buf.put((c & 0xff).toByte)         // B
        buf.put(((c >> 8) & 0xff).toByte)  // G
        buf.put(((c >> 16) & 0xff).toByte) // R
        x += 1
      }
      var p = 0
      while (p < pad) { buf.put(0.toByte); p += 1 }
      y -= 1
    }
    buf.array()
  }

  /** Encode through the JDK's ImageIO writers (PNG/JPEG/BMP/GIF ship in
    * every JRE): `rgb(x, y)` is a packed 0xRRGGBB, (0, 0) top-left. PNG is
    * lossless, so a decode of the result recovers the exact pixels (the
    * property the PNG oracle query leans on); JPEG is lossy —
    * deterministic bytes, approximate pixels.
    */
  def encodeImage(width: Int, height: Int, rgb: (Int, Int) => Int,
                  format: String): Array[Byte] = {
    require(width > 0 && height > 0, s"bad image dims ${width}x$height")
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y)); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, bos)
    require(ok, s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Real image decode via the JDK's ImageIO (BMP/PNG/GIF readers ship in
    * every JRE — no external codec needed): features are
    * [width, height, sum_R, sum_G, sum_B]. Channel SUMS, not means — small
    * integers are exact in float32, so an oracle can pin the values without
    * rounding fragility.
    */
  def imageFeatureDecoder(payload: Array[Byte]): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = img.getRGB(x, y)
        sr += (c >> 16) & 0xff
        sg += (c >> 8) & 0xff
        sb += c & 0xff
        x += 1
      }
      y += 1
    }
    Array(w.toFloat, h.toFloat, sr.toFloat, sg.toFloat, sb.toFloat)
  }

  /** Deterministic BMP payload per id row: doc d is a (4 + d%5) x (3 + d%4)
    * image with pixel (x, y) channels R = (d*7 + x*13 + y*31) % 256,
    * G = (d*11 + x*17 + y*5) % 256, B = (d*3 + x*29 + y*23) % 256. An
    * oracle recomputes the features straight from this formula while Spark
    * round-trips real BMP bytes through a real decoder — so the decode
    * path is pinned end to end, not stubbed.
    */
  def syntheticBmp(df: DataFrame, idCol: String, outCol: String): DataFrame =
    syntheticPayload(df, idCol, outCol, encodeBmp(_, _, _))

  /** [[syntheticBmp]]'s pixel formula encoded as PNG through the JDK
    * writer: same generative formula, a different (compressed, chunked,
    * CRC-checked) container — the decode lane must recover identical
    * features from both.
    */
  def syntheticPng(df: DataFrame, idCol: String, outCol: String): DataFrame =
    syntheticPayload(df, idCol, outCol, encodeImage(_, _, _, "png"))

  private def syntheticPayload(df: DataFrame, idCol: String, outCol: String,
                               enc: (Int, Int, (Int, Int) => Int) => Array[Byte]): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        val bytes = enc((4 + d % 5).toInt, (3 + d % 4).toInt, (x, y) => {
          val rr = ((d * 7 + x * 13 + y * 31) % 256).toInt
          val gg = ((d * 11 + x * 17 + y * 5) % 256).toInt
          val bb = ((d * 3 + x * 29 + y * 23) % 256).toInt
          (rr << 16) | (gg << 8) | bb
        })
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(encoder)
  }

  /** Hand-written RIFF/WAVE container around 16-bit little-endian mono
    * PCM. Deliberately NOT javax.sound's writer: the decode lane reads
    * through `javax.sound.sampled`, so encode and decode are independent
    * implementations — a shared container bug cannot cancel out.
    */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0)
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)  // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Deterministic WAV payload per id row: doc d is mono 16-bit PCM with
    * sample_rate = 8000 + (d%3)*4000, n = 640 + (d%5)*160 samples, and
    * sample(i) = ((d*131 + i*7919) mod 2*amp) - amp where amp = 64 when
    * d%7 = 0 (a "quiet" recording) else 8192. An oracle recomputes the
    * audio statistics straight from this formula while Spark round-trips
    * real RIFF bytes through the JDK's javax.sound decoder — the audio
    * decode path is pinned end to end, like the BMP/PNG image lanes.
    */
  def syntheticWav(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        val sr = (8000 + (d % 3) * 4000).toInt
        val n = (640 + (d % 5) * 160).toInt
        val amp = if (d % 7 == 0) 64L else 8192L
        val samples = Array.tabulate(n)(i =>
          ((d * 131 + i.toLong * 7919) % (2 * amp) - amp).toShort)
        Row.fromSeq(r.toSeq :+ encodeWavPcm16(sr, samples))
      }
    }(encoder)
  }

  /** Real audio decode via the JDK's `javax.sound.sampled` (WAV/AIFF/AU
    * readers ship in every JRE — no external codec): integer-exact audio
    * statistics plus frame-level silence detection (160-sample frames —
    * 20 ms at 8 kHz, the VAD convention — silent when the frame's peak
    * |sample| < 256). All counts/sums are exact longs, never floats, so
    * an oracle can pin them without rounding fragility.
    */
  def wavStats(payload: Array[Byte], silenceFrame: Int = 160,
               silenceThreshold: Int = 256): (Long, Long, Long, Long, Long, Long) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"expected 16-bit LE mono PCM, got $fmt")
    val bytes = in.readAllBytes()
    in.close()
    val n = bytes.length / 2
    var i = 0
    var sumAbs = 0L
    var maxAbs = 0L
    var silent = 0L
    var frameMax = 0L
    while (i < n) {
      val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
      val a = math.abs(s)
      sumAbs += a
      if (a > maxAbs) maxAbs = a
      if (a > frameMax) frameMax = a
      if ((i + 1) % silenceFrame == 0) { // complete frames only
        if (frameMax < silenceThreshold) silent += 1
        frameMax = 0L
      }
      i += 1
    }
    (fmt.getSampleRate.toLong, fmt.getChannels.toLong, n.toLong, sumAbs, maxAbs, silent)
  }

  /** Batched WAV decode over a binary column (same mapPartitions lane as
    * [[decodeFeatures]]): adds sample_rate, n_channels, n_samples,
    * duration_micros, sum_abs, max_abs, silence_frames — all bigint.
    */
  def decodeWavStats(df: DataFrame, binCol: String): DataFrame = {
    val added = Seq("sample_rate", "n_channels", "n_samples",
      "duration_micros", "sum_abs", "max_abs", "silence_frames")
    val outSchema = StructType(df.schema.fields ++
      added.map(StructField(_, LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (sr, ch, n, sumAbs, maxAbs, silent) = wavStats(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq ++ Seq(sr, ch, n, n * 1000000L / sr, sumAbs, maxAbs, silent))
      }
    }(encoder)
  }

  /** Audio content signature from the REAL decode: the per-20ms-frame
    * energy profile (sum |sample| per complete 160-sample frame) as a
    * canonical comma-joined text — the key for cross-recording exact
    * dedup (same jingle/IVR prompt ingested twice), the audio analogue of
    * [[decodeGifFrameSigs]]. Energy profiles are container-independent:
    * the same PCM stream re-wrapped hashes identically.
    */
  def wavEnergyProfile(payload: Array[Byte], frame: Int = 160): String = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"expected 16-bit LE mono PCM, got $fmt")
    val bytes = in.readAllBytes()
    in.close()
    val n = bytes.length / 2
    val sb = new StringBuilder
    var i = 0
    var acc = 0L
    while (i < n) {
      val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toLong
      acc += math.abs(s)
      if ((i + 1) % frame == 0) {
        if (sb.nonEmpty) sb.append(',')
        sb.append(acc)
        acc = 0L
      }
      i += 1
    }
    sb.toString
  }

  /** Batched energy-profile extraction over a binary audio column. */
  def decodeWavProfiles(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol), StructField("energy_profile", StringType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        Row(r.get(idIdx), wavEnergyProfile(r.getAs[Array[Byte]](binIdx)))
      }
    }(encoder)
  }

  /** Multi-frame (animated GIF) encode through the JDK's sequence writer —
    * the in-container stand-in for VIDEO: a real multi-frame container,
    * a real independent JDK decoder ([[gifFrameStats]]), frame counts and
    * per-frame pixel content round-tripped exactly. Colors must stay
    * within a ≤256-color palette for the GIF round-trip to be lossless —
    * the synthetic formula quantizes channels to {0, 85, 170, 255}.
    */
  def encodeGifFrames(width: Int, height: Int, frames: Int,
                      rgb: (Int, Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0 && frames > 0)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    // explicit 64-entry palette of exactly the {0,85,170,255}^3 colors the
    // formula produces: a TYPE_INT_RGB frame would be re-quantized to the
    // writer's own palette (measured: sums drifted); an indexed image with
    // this palette round-trips bit-exact
    val cmap = Array.tabulate(64) { i =>
      (((i >> 4) & 3) * 85 << 16) | (((i >> 2) & 3) * 85 << 8) | ((i & 3) * 85)
    }
    val icm = new java.awt.image.IndexColorModel(8, 64,
      cmap.map(c => ((c >> 16) & 0xff).toByte),
      cmap.map(c => ((c >> 8) & 0xff).toByte),
      cmap.map(c => (c & 0xff).toByte))
    var f = 0
    while (f < frames) {
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb(f, x, y)); x += 1 }
        y += 1
      }
      // explicit per-frame metadata with interlace OFF: the JDK writer
      // defaults to interlaced row order, which round-trips SCRAMBLED on
      // small frames (measured: rows permuted + lost) — plain sequential
      // row order is what the reader handles exactly
      val meta = writer.getDefaultImageMetadata(
        new javax.imageio.ImageTypeSpecifier(img), null)
      val fmt = "javax_imageio_gif_image_1.0"
      val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
      val kids = tree.getElementsByTagName("ImageDescriptor")
      if (kids.getLength > 0)
        kids.item(0).asInstanceOf[org.w3c.dom.Element]
          .setAttribute("interlaceFlag", "FALSE")
      meta.setFromTree(fmt, tree)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
      f += 1
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()
    bos.toByteArray
  }

  /** Deterministic animated-GIF payload per id row: doc d has
    * 2 + d%3 frames of (4 + d%3) x (3 + d%2), pixel (f, x, y) channels
    * R/G/B = ((d*7 + f*19 + x*13 + y*31) % 4) * 85 and the G/B analogues —
    * palette-quantized so the GIF container is lossless. The oracle
    * recomputes frame counts and pixel sums straight from this formula.
    */
  def syntheticGif(df: DataFrame, idCol: String, outCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField(outCol, BinaryType, nullable = false))
    val idIdx = df.schema.fieldIndex(idCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val d = r.getLong(idIdx)
        val bytes = encodeGifFrames((4 + d % 3).toInt, (3 + d % 2).toInt,
          (2 + d % 3).toInt, (f, x, y) => {
            val rr = (((d * 7 + f * 19 + x * 13 + y * 31) % 4) * 85).toInt
            val gg = (((d * 11 + f * 23 + x * 17 + y * 5) % 4) * 85).toInt
            val bb = (((d * 3 + f * 29 + x * 29 + y * 23) % 4) * 85).toInt
            (rr << 16) | (gg << 8) | bb
          })
        Row.fromSeq(r.toSeq :+ bytes)
      }
    }(encoder)
  }

  /** Real multi-frame decode via the JDK's GIF ImageReader: frame count
    * (the "video" length) plus exact channel sums across ALL frames.
    */
  def gifFrameStats(payload: Array[Byte]): (Long, Long, Long, Long, Long, Long) = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    reader.setInput(iis)
    val n = reader.getNumImages(true)
    var sr = 0L; var sg = 0L; var sb = 0L
    var w = 0L; var h = 0L
    var f = 0
    while (f < n) {
      val img = reader.read(f)
      w = img.getWidth; h = img.getHeight
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val c = img.getRGB(x, y)
          sr += (c >> 16) & 0xff; sg += (c >> 8) & 0xff; sb += c & 0xff
          x += 1
        }
        y += 1
      }
      f += 1
    }
    reader.dispose(); iis.close()
    (n.toLong, w, h, sr, sg, sb)
  }

  /** Batched multi-frame decode over a binary column (same mapPartitions
    * lane as [[decodeFeatures]]).
    */
  def decodeGifStats(df: DataFrame, binCol: String): DataFrame = {
    val added = Seq("n_frames", "width", "height", "sum_r", "sum_g", "sum_b")
    val outSchema = StructType(df.schema.fields ++
      added.map(StructField(_, LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (n, w, h, sr, sg, sb) = gifFrameStats(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq ++ Seq(n, w, h, sr, sg, sb))
      }
    }(encoder)
  }

  /** Per-frame content signatures from a real multi-frame decode: each
    * frame becomes (frame_idx, canonical pixel string "r.g.b,r.g.b,..."
    * in raster order) — the key for cross-video DUPLICATE-FRAME detection
    * (shared intros/outros/logo cards), which is frame-level exact dedup
    * across documents. The canonical TEXT form (not raw bytes) is what
    * both engines hash, so the oracle can rebuild it from the generative
    * formula without touching the container.
    */
  def decodeGifFrameSigs(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol), StructField("frame_idx", LongType, nullable = false),
      StructField("frame_sig", StringType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](binIdx)
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val out = (0 until n).map { f =>
          val img = reader.read(f)
          val sb = new StringBuilder
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val c = img.getRGB(x, y)
              if (sb.nonEmpty) sb.append(',')
              sb.append((c >> 16) & 0xff).append('.')
                .append((c >> 8) & 0xff).append('.').append(c & 0xff)
              x += 1
            }
            y += 1
          }
          Row(r.get(idIdx), f.toLong, sb.toString)
        }
        reader.dispose(); iis.close()
        out
      }
    }(encoder)
  }

  /** 64-bit perceptual average-hash (aHash) of a decoded image: sample an
    * 8x8 grid by nearest neighbor (x = i*w/8, y = j*h/8 — integer floor,
    * covering up- and down-sampling), integer grayscale (r+g+b)/3, then
    * bit k = j*8+i set when gray >= floor(mean of the 64 samples). Returned
    * as two non-negative 32-bit halves (hi = bits 63..32), the same
    * cross-engine-safe packing as SimHash. Hamming distance between hashes
    * is the standard image near-dup measure; the pairing stage reuses the
    * SimHash chunk-banding machinery.
    */
  def imageAHash(payload: Array[Byte]): (Long, Long) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val gray = new Array[Int](64)
    var sum = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        val c = img.getRGB(i * w / 8, j * h / 8)
        val g = (((c >> 16) & 0xff) + ((c >> 8) & 0xff) + (c & 0xff)) / 3
        gray(j * 8 + i) = g
        sum += g
        i += 1
      }
      j += 1
    }
    val mean = sum / 64
    var hi = 0L
    var lo = 0L
    var k = 0
    while (k < 64) {
      if (gray(k) >= mean) {
        if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
      }
      k += 1
    }
    (hi, lo)
  }

  /** Batched aHash over a binary image column: adds `ph_hi`, `ph_lo`
    * bigint columns (same mapPartitions lane as [[decodeFeatures]]).
    */
  def decodeAHash(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("ph_hi", LongType, nullable = false),
      StructField("ph_lo", LongType, nullable = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val (hi, lo) = imageAHash(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq ++ Seq(hi, lo))
      }
    }(encoder)
  }

  /** Batched decode / feature-extract over partitions: the media analogue
    * of `mapInPandas` — each executor thread pulls its partition's rows,
    * runs the (expensive, possibly native) decoder per payload, and emits
    * the feature column. Partition-level batching means codec init cost is
    * paid once per partition, not per row.
    */
  def decodeFeatures(df: DataFrame, binCol: String, featureCol: String,
                     dim: Int = 64,
                     decoder: Array[Byte] => Array[Float] = null): DataFrame = {
    val dec = if (decoder != null) decoder else stubDecoder(dim) _
    val outSchema = StructType(df.schema.fields :+ StructField(featureCol, ArrayType(FloatType, containsNull = false)))
    val binIdx = df.schema.fieldIndex(binCol)
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](binIdx)
        val feats = if (payload == null) new Array[Float](dim) else dec(payload)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(encoder)
  }

  /** Re-partition media rows so each task holds ~`targetBytesPerTask` of
    * payload — decode tasks are CPU-bound per byte, so size-balanced tasks
    * beat row-balanced ones when payload sizes are skewed.
    */
  def repartitionByBytes(df: DataFrame, binCol: String, targetBytesPerTask: Long): DataFrame = {
    val stats = df.agg(sum(octet_length(col(binCol)).cast("bigint"))).head()
    val totalBytes = if (stats.isNullAt(0)) 0L else stats.getLong(0)
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytesPerTask)).toInt)
    df.repartition(parts)
  }
}
