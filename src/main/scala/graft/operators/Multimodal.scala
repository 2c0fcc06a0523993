package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextFns

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, plus batch decode
  * over mapPartitions.
  *
  * Two format families run FOR REAL: WAV (RIFF/PCM16) and BMP (24-bit
  * uncompressed) are pure byte arithmetic, so [[encodeWavPcm16]] /
  * [[decodeWavPcm16]] / [[encodeBmp24]] / [[decodeBmp24]] implement the
  * actual containers end to end and [[decodeWavPartition]] /
  * [[decodeBmpPartition]] run them through the distributed codec seam
  * (oracle-gated: q160/q161 recompute the decoded features from the
  * source rows). COMPRESSED image formats (jpeg/png/gif) run for real
  * too, via the JDK's own `javax.imageio` ([[encodeImage]] /
  * [[decodeImage]] / [[decodeImagePartition]]; q163/q164) — PNG
  * losslessly (feature sums oracle-gate bitwise), JPEG with exact
  * dimensions and spec-pinned pixel determinism. Only formats the JDK
  * ships no codec for (mp3/video) keep deterministic STUBS
  * (`decodeBytesStub`) behind the same plumbing; swapping a real codec
  * in is a one-function change inside `decodePartition`.
  */
object Multimodal {

  /** Metadata schema carried alongside every media payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("n_bytes", LongType)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("checksum", LongType)))

  /** Attach a binary payload column + metadata struct. `format` cycles
    * deterministically from the content hash — stand-in for a real
    * container sniff of magic bytes.
    */
  def withMedia(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("media", col(textCol).cast("binary"))
      .withColumn("meta", struct(
        element_at(array(lit("jpeg"), lit("png"), lit("webp")),
          (TextFns.hash32(col(textCol)) % 3 + 1).cast("int")).as("format"),
        length(col("media")).cast("long").as("n_bytes")))

  /** Expression-only stub decode (oracle-friendly): fake dims + checksum
    * derived from content hash and first byte. A real decoder cannot be
    * an expression — see `decodePartition` for the batch path.
    */
  def decodeStubExpr(media: Column, textCol: Column): Column = struct(
    (TextFns.hash32(textCol) % 128 + 16).as("width"),
    (TextFns.hash32(concat(lit("h:"), textCol)) % 128 + 16).as("height"),
    (ascii(substring(textCol, 1, 1)) + length(media)).cast("long").as("checksum"))

  /** Batch decode over mapPartitions — the real plumbing a native codec
    * would plug into: rows stream per partition, the codec is initialized
    * once per partition (like a broadcast mmdb reader), features come
    * back as a struct column. The per-row body is the stub.
    */
  def decodePartition(df: DataFrame, mediaCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("features", FeatureSchema)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // a real implementation opens the codec/library handle here, once
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val feats = decodeBytesStub(bytes)
        Row(r.get(idIdx), Row(feats._1, feats._2, feats._3))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** The stub a real codec replaces: deterministic fake (width, height,
    * checksum) from the raw bytes.
    */
  def decodeBytesStub(bytes: Array[Byte]): (Long, Long, Long) = {
    val sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff))
    (sum % 128 + 16, (sum / 7) % 128 + 16, bytes.length.toLong)
  }

  /** Batch resize over mapPartitions: same plumbing as decodePartition
    * (codec handle once per partition, rows stream through), emitting
    * the resized payload plus its new metadata. The "resize" is a
    * deterministic stub — keep every `stride`-th byte up to `maxBytes`
    * (a real image scaler slots into `resizeBytesStub` unchanged).
    */
  def resizePartition(df: DataFrame, mediaCol: String, idCol: String,
                      maxBytes: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("media_resized", BinaryType),
      StructField("meta_resized", MetaSchema)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // a real implementation opens the scaler/codec here, once
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](mediaIdx)
        val out = resizeBytesStub(bytes, maxBytes)
        Row(r.get(idIdx), out, Row("raw", out.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic stand-in for a scaler: stride-sample the payload down
    * to at most `maxBytes` (stride = ceil(len/maxBytes)).
    */
  def resizeBytesStub(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (bytes.length <= maxBytes) bytes
    else {
      val stride = (bytes.length + maxBytes - 1) / maxBytes
      Array.tabulate((bytes.length + stride - 1) / stride)(i => bytes(i * stride))
    }
  }

  // ------------------------------------------------------ REAL codecs
  //
  // WAV (RIFF/PCM16 mono) and BMP (24-bit uncompressed) are pure byte
  // arithmetic — no codec library needed — so these two formats run the
  // decode seam FOR REAL end to end: header walk, chunk/row parsing,
  // feature extraction, all distributed through the same mapPartitions
  // plumbing the stubbed formats document. Compressed IMAGE formats
  // (jpeg/png/gif) run for real too via the JDK's javax.imageio (see
  // the JDK-backed section below); only formats the JDK ships no codec
  // for (mp3, video) stay stubbed.

  /** Encode mono PCM16 samples as a RIFF/WAVE byte payload. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)  // block align
      .putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Parse a RIFF/WAVE payload: walks the chunk list (whatever order,
    * skipping unknown chunks like LIST/fact), validates PCM16 mono, and
    * returns (sampleRate, samples). Malformed input refuses loudly.
    */
  def decodeWavPcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(n: Int): String = {
      val a = new Array[Byte](n); buf.get(a); new String(a, "US-ASCII")
    }
    require(bytes.length >= 44 && ascii(4) == "RIFF", "not a RIFF payload")
    buf.getInt // declared riff length (trust the real chunk walk instead)
    require(ascii(4) == "WAVE", "not a WAVE payload")
    var sampleRate = -1
    var data: Array[Short] = null
    while (buf.remaining() >= 8) {
      val id = ascii(4)
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(), s"truncated chunk $id")
      id match {
        case "fmt " =>
          val fmtEnd = buf.position() + len
          require(buf.getShort == 1, "not PCM audio")
          require(buf.getShort == 1, "not mono audio")
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          require(buf.getShort == 16, "not 16-bit samples")
          buf.position(fmtEnd)
        case "data" =>
          data = Array.fill(len / 2)(buf.getShort)
          // An odd-length data chunk leaves one orphan data byte (not a
          // whole PCM16 sample) AND, per RIFF, a pad byte after the chunk
          // — skip both so a following chunk parses aligned, mirroring
          // the `len + (len & 1)` arithmetic of the generic skip branch.
          if (len % 2 == 1) buf.position(math.min(buf.limit(), buf.position() + 2))
        case _ =>
          // clamp: a final odd chunk may legally omit its pad byte at EOF
          buf.position(math.min(buf.limit(), buf.position() + len + (len & 1)))
      }
    }
    require(sampleRate > 0 && data != null, "WAVE payload missing fmt/data chunks")
    (sampleRate, data)
  }

  /** Encode a 24-bit uncompressed BMP from top-down row-major RGB bytes
    * (`rgb(i)` for i in [0, w*h*3): R,G,B per pixel). The file stores
    * rows BOTTOM-UP in BGR with 4-byte row padding, per the format.
    */
  def encodeBmp24(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val rowLen = (w * 3 + 3) & ~3
    val imgLen = rowLen * h
    val buf = java.nio.ByteBuffer.allocate(54 + imgLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + imgLen)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(h) // positive height = bottom-up
      .putShort(1).putShort(24).putInt(0).putInt(imgLen)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        buf.put(rgb(p + 2)).put(rgb(p + 1)).put(rgb(p)) // BGR
        x += 1
      }
      var pad = rowLen - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Parse a 24-bit uncompressed BMP back to (width, height, top-down
    * row-major RGB bytes). Refuses compressed or non-24bpp payloads.
    */
  def decodeBmp24(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && buf.get() == 'B'.toByte && buf.get() == 'M'.toByte,
      "not a BMP payload")
    buf.getInt; buf.getInt
    val dataOff = buf.getInt
    require(buf.getInt >= 40, "not a BITMAPINFOHEADER BMP")
    val w = buf.getInt
    val hRaw = buf.getInt
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(buf.getShort == 1, "bad BMP plane count")
    require(buf.getShort == 24, "not a 24-bit BMP")
    require(buf.getInt == 0, "compressed BMPs are not supported")
    val rowLen = (w * 3 + 3) & ~3
    require(dataOff + rowLen.toLong * h <= bytes.length, "truncated BMP pixel data")
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + rowLen * (if (bottomUp) h - 1 - y else y)
      var x = 0
      while (x < w) {
        val s = srcRow + x * 3
        val d = (y * w + x) * 3
        rgb(d) = bytes(s + 2); rgb(d + 1) = bytes(s + 1); rgb(d + 2) = bytes(s) // BGR → RGB
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** REAL batch decode of WAV payloads through the mapPartitions codec
    * seam: per row, parse the RIFF container and emit
    * (sample_rate, n_samples, sum of squared samples) — the integer
    * features downstream audio-quality gates key on (energy, length),
    * engine-exact so an oracle can recompute them from the source rows.
    */
  def decodeWavPartition(df: DataFrame, mediaCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("sample_rate", LongType),
      StructField("n_samples", LongType),
      StructField("sum_sq", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val (rate, samples) = decodeWavPcm16(r.getAs[Array[Byte]](mediaIdx))
        var sumSq = 0L
        var i = 0
        while (i < samples.length) { val s = samples(i).toLong; sumSq += s * s; i += 1 }
        Row(r.get(idIdx), rate.toLong, samples.length.toLong, sumSq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL batch decode of BMP payloads: per row, parse the container
    * and emit (width, height, per-channel byte sums) — the integer
    * features an image-dedup/quality pass keys on.
    */
  def decodeBmpPartition(df: DataFrame, mediaCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = decodeBmp24(r.getAs[Array[Byte]](mediaIdx))
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < rgb.length) {
          sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
          i += 3
        }
        Row(r.get(idIdx), w.toLong, h.toLong, sr, sg, sb)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** REAL image resize for the uncompressed format: decode the BMP,
    * nearest-neighbor sample down so the longer edge is at most
    * `maxEdge`, re-encode. Upscaling never happens (<= maxEdge returns
    * the payload unchanged) — the thumbnail/normalize pass of a
    * vision-corpus pipeline, end to end through the real container.
    */
  def resizeBmp24(bytes: Array[Byte], maxEdge: Int): Array[Byte] = {
    val (w, h, rgb) = decodeBmp24(bytes)
    if (math.max(w, h) <= maxEdge) return bytes
    val scale = math.max(w, h).toDouble / maxEdge
    val nw = math.max(1, math.round(w / scale).toInt)
    val nh = math.max(1, math.round(h / scale).toInt)
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      val sy = math.min(h - 1, (y * scale).toInt)
      var x = 0
      while (x < nw) {
        val sx = math.min(w - 1, (x * scale).toInt)
        val s = (sy * w + sx) * 3
        val d = (y * nw + x) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s + 2)
        x += 1
      }
      y += 1
    }
    encodeBmp24(nw, nh, out)
  }

  /** Batch REAL resize over the same mapPartitions seam: BMP payloads
    * come back re-encoded at thumbnail size with fresh metadata.
    */
  def resizeBmpPartition(df: DataFrame, mediaCol: String, idCol: String,
                         maxEdge: Int): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("media_resized", BinaryType),
      StructField("meta_resized", MetaSchema)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val out = resizeBmp24(r.getAs[Array[Byte]](mediaIdx), maxEdge)
        Row(r.get(idIdx), out, Row("bmp", out.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------- JDK-backed image codecs
  //
  // JPEG / PNG / GIF / BMP decode via `javax.imageio.ImageIO` — part of
  // the JDK itself, headless, zero external dependency — so the
  // COMPRESSED image formats run the decode seam for real too. PNG is
  // lossless: encode → decode recovers the exact pixels, so feature
  // sums oracle-gate bitwise. JPEG is lossy: dimensions and container
  // walk are exact (oracle-gated); pixel values are decoder-defined, so
  // their stability is pinned by spec (same bytes → same pixels),
  // never by the cross-engine oracle. MP3/video remain documented
  // stubs — the JDK ships no audio/video codecs.

  /** One-time JVM codec setup: ImageIO's default stream cache spills
    * every decode through a temp FILE — a per-row disk round-trip that
    * would dominate at scale. Memory-cache instead (payloads are
    * row-sized by construction).
    */
  private lazy val imageIoReady: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Encode top-down row-major RGB bytes via the JDK's own writer.
    * `format` is an ImageIO format name ("png", "jpg", "gif", "bmp").
    */
  def encodeImage(format: String, w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    imageIoReady
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        img.setRGB(x, y, ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) |
          (rgb(p + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out),
      s"no ImageIO writer for format '$format'")
    out.toByteArray
  }

  /** Decode any ImageIO-supported payload (PNG/JPEG/GIF/BMP) back to
    * (width, height, top-down row-major RGB bytes). Wrong magic bytes
    * and truncated streams refuse loudly — a corpus decode stage must
    * surface corrupt rows, not fold them into features.
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    imageIoReady
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case e: java.io.IOException =>
        throw new IllegalArgumentException(s"corrupt image payload: ${e.getMessage}", e) }
    require(img != null, "not a decodable image payload (unknown magic bytes)")
    val (w, h) = (img.getWidth, img.getHeight)
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val px = img.getRGB(x, y)
        val p = (y * w + x) * 3
        rgb(p) = ((px >> 16) & 0xff).toByte
        rgb(p + 1) = ((px >> 8) & 0xff).toByte
        rgb(p + 2) = (px & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, rgb)
  }

  /** REAL batch decode of compressed image payloads through the same
    * mapPartitions codec seam as WAV/BMP: per row, ImageIO-decode and
    * emit (width, height, per-channel byte sums). One pass, no shuffle;
    * the reader is JVM-wide, so per-partition setup is the one-time
    * [[imageIoReady]] cache pin.
    */
  def decodeImagePartition(df: DataFrame, mediaCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = decodeImage(r.getAs[Array[Byte]](mediaIdx))
        var (sr, sg, sb) = (0L, 0L, 0L)
        var i = 0
        while (i < rgb.length) {
          sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
          i += 3
        }
        Row(r.get(idIdx), w.toLong, h.toLong, sr, sg, sb)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** One 256-level grayscale palette, shared by the GIF frames below:
    * an EXPLICIT IndexColorModel makes the round trip exact by
    * construction (the writer stores our palette verbatim instead of
    * quantizing an adaptive one).
    */
  private lazy val grayPalette: java.awt.image.IndexColorModel = {
    val g = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, g, g, g)
  }

  /** Encode an ANIMATED GIF: one grayscale byte array per frame (all
    * frames `w`×`h`, values 0-255), written through the JDK's own GIF
    * sequence writer — a real multi-frame container for the
    * frame-sampling path (the closest thing to video the JDK decodes).
    */
  def encodeGifFrames(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    imageIoReady
    require(frames.nonEmpty && frames.forall(_.length == w * h),
      s"every frame must carry ${w * h} gray bytes")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      // interlace OFF, explicitly: the JDK writer's default sequence
      // metadata flags interlace in a way small frames decode scrambled
      // (rows land in pass order); progressive mode IS the interlace
      // knob on the GIF plugin
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      frames.foreach { gray =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        System.arraycopy(gray, 0,
          img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData,
          0, gray.length)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Decode every frame of a GIF payload back to (width, height,
    * grayscale bytes). Refuses non-GIF payloads loudly; truncated
    * streams surface as corrupt on the frame read.
    */
  def decodeGifFrames(bytes: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
    imageIoReady
    require(bytes.length > 6 && bytes(0) == 'G'.toByte && bytes(1) == 'I'.toByte &&
      bytes(2) == 'F'.toByte, "not a GIF payload")
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis, false, true)
      val n =
        try reader.getNumImages(true)
        catch { case e: java.io.IOException =>
          throw new IllegalArgumentException(s"corrupt GIF payload: ${e.getMessage}", e) }
      (0 until n).map { i =>
        val img =
          try reader.read(i)
          catch { case e: java.io.IOException =>
            throw new IllegalArgumentException(s"corrupt GIF frame $i: ${e.getMessage}", e) }
        val (w, h) = (img.getWidth, img.getHeight)
        val gray = new Array[Byte](w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            gray(y * w + x) = (img.getRGB(x, y) & 0xff).toByte // r=g=b by construction
            x += 1
          }
          y += 1
        }
        (w, h, gray)
      }
    } finally { reader.dispose(); iis.close() }
  }

  /** REAL distributed frame sampling over a multi-frame container:
    * decode each row's GIF, keep every `stride`-th frame, emit
    * (id, frame_no, width, height, sum_gray) — the video
    * frame-extraction shape of a multimodal pipeline, one pass through
    * the same mapPartitions codec seam, fan-out = kept frames only.
    */
  def sampleGifFrames(df: DataFrame, mediaCol: String, idCol: String,
                      stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_no", LongType),
      StructField("width", LongType),
      StructField("height", LongType),
      StructField("sum_gray", LongType)))
    val idIdx = df.schema.fieldIndex(idCol)
    val mediaIdx = df.schema.fieldIndex(mediaCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeGifFrames(r.getAs[Array[Byte]](mediaIdx)).zipWithIndex
          .collect { case ((w, h, gray), f) if f % stride == 0 =>
            var s = 0L
            var i = 0
            while (i < gray.length) { s += gray(i) & 0xff; i += 1 }
            Row(r.get(idIdx), f.toLong, w.toLong, h.toLong, s)
          }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling: every `stride`-th window of `frameLen` bytes.
    * Expressed on the string side (binary slicing is engine-specific);
    * emits (frame_no, frame) rows. Payloads shorter than one frame yield
    * zero rows (without the guard, sequence(0, negative) would infer a
    * -1 step and emit descending bogus frame numbers).
    */
  def frameSample(df: DataFrame, textCol: String, frameLen: Int, stride: Int): DataFrame =
    df.where(length(col(textCol)) >= frameLen)
      .withColumn("frame_no",
        explode(sequence(lit(0), floor((length(col(textCol)) - frameLen).cast("double") / stride).cast("int"))))
      .withColumn("frame", col(textCol).substr(col("frame_no") * stride + 1, lit(frameLen)))
}
