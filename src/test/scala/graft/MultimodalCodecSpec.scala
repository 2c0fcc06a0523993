package graft

import graft.operators.Multimodal

/** The REAL multimodal codecs: WAV (RIFF/PCM16) and BMP (24-bit
  * uncompressed) — encode→decode identity across the shapes that break
  * naive parsers (odd widths = row padding, unknown RIFF chunks,
  * top-down BMPs), and loud refusals on everything the decoders do not
  * claim (compressed BMPs, stereo/8-bit WAVs, truncated payloads).
  */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  test("WAV PCM16 round-trips exactly, including empty and extreme samples") {
    for (samples <- Seq(
        Array[Short](),
        Array[Short](0, 1, -1, Short.MaxValue, Short.MinValue),
        Array.tabulate(10001)(i => ((i * 37) % 30000 - 15000).toShort))) {
      val bytes = Multimodal.encodeWavPcm16(16000, samples)
      val (rate, back) = Multimodal.decodeWavPcm16(bytes)
      assert(rate == 16000 && back.sameElements(samples),
        s"round trip failed at n=${samples.length}")
    }
  }

  test("WAV decode walks unknown chunks and odd-length padding") {
    val base = Multimodal.encodeWavPcm16(8000, Array[Short](5, -5, 7))
    // splice a LIST chunk (odd length 3 → 1 pad byte) between fmt and data
    val fmtEnd = 12 + 8 + 16
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(fmtEnd) ++ extra ++ base.drop(fmtEnd)
    // fix the RIFF length (not load-bearing for our walk, but honest)
    val (rate, back) = Multimodal.decodeWavPcm16(spliced)
    assert(rate == 8000 && back.sameElements(Array[Short](5, -5, 7)))
  }

  test("WAV odd-length DATA chunk: orphan byte + pad both skipped, later chunks align") {
    // hand-build: data FIRST with an odd length (3 → one sample, one
    // orphan data byte, one RIFF pad byte), then the fmt chunk — a
    // decoder that forgets either trailing byte misaligns and never
    // finds fmt
    val buf = java.nio.ByteBuffer.allocate(12 + 8 + 4 + 8 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + 12 + 24)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("data".getBytes("US-ASCII")).putInt(3)
      .putShort(42).put(9.toByte)  // one sample + orphan data byte
      .put(0.toByte)               // RIFF pad byte for the odd chunk
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(32000).putShort(2).putShort(16)
    val payload = buf.array() ++ new Array[Byte](8) // reach the 44-byte floor
    val (rate, back) = Multimodal.decodeWavPcm16(payload)
    assert(rate == 16000 && back.sameElements(Array[Short](42)),
      s"rate=$rate samples=${back.toSeq}")
  }

  test("WAV refusals: stereo, 8-bit, truncated, non-RIFF") {
    val good = Multimodal.encodeWavPcm16(8000, Array[Short](1, 2, 3))
    intercept[IllegalArgumentException](
      Multimodal.decodeWavPcm16("not audio at all".getBytes ++ new Array[Byte](40)))
    intercept[IllegalArgumentException](
      Multimodal.decodeWavPcm16(good.dropRight(3))) // truncated data chunk
    val stereo = good.clone(); stereo(22) = 2 // channel count
    intercept[IllegalArgumentException](Multimodal.decodeWavPcm16(stereo))
    val eightBit = good.clone(); eightBit(34) = 8 // bits per sample
    intercept[IllegalArgumentException](Multimodal.decodeWavPcm16(eightBit))
  }

  test("BMP 24-bit round-trips exactly, including padded odd widths") {
    for ((w, h) <- Seq((1, 1), (3, 2), (5, 4), (16, 14), (2, 7))) {
      val rgb = Array.tabulate(w * h * 3)(i => ((i * 31 + 7) % 256).toByte)
      val bytes = Multimodal.encodeBmp24(w, h, rgb)
      // encoded rows are padded to 4 bytes: total size must reflect it
      assert(bytes.length == 54 + ((w * 3 + 3) & ~3) * h)
      val (w2, h2, back) = Multimodal.decodeBmp24(bytes)
      assert(w2 == w && h2 == h && back.sameElements(rgb), s"round trip failed at ${w}x$h")
    }
  }

  test("BMP decode handles TOP-DOWN rows (negative height)") {
    val (w, h) = (3, 2)
    val rgb = Array.tabulate(w * h * 3)(_.toByte)
    val bytes = Multimodal.encodeBmp24(w, h, rgb)
    // flip to top-down: negate height and reorder the two pixel rows
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(22, -h)
    val rowLen = (w * 3 + 3) & ~3
    val r0 = bytes.slice(54, 54 + rowLen).clone()
    System.arraycopy(bytes, 54 + rowLen, bytes, 54, rowLen)
    System.arraycopy(r0, 0, bytes, 54 + rowLen, rowLen)
    val (w2, h2, back) = Multimodal.decodeBmp24(bytes)
    assert(w2 == w && h2 == h && back.sameElements(rgb))
  }

  test("BMP refusals: compressed, 8-bit, truncated") {
    val good = Multimodal.encodeBmp24(4, 4, Array.fill(48)(1.toByte))
    val compressed = good.clone(); compressed(30) = 1 // BI_RLE8
    intercept[IllegalArgumentException](Multimodal.decodeBmp24(compressed))
    val eightBit = good.clone(); eightBit(28) = 8
    intercept[IllegalArgumentException](Multimodal.decodeBmp24(eightBit))
    intercept[IllegalArgumentException](Multimodal.decodeBmp24(good.dropRight(10)))
  }

  test("REAL BMP resize: nearest-neighbor thumbnail through the container") {
    val (w, h) = (16, 10)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 13 + 5) % 256).toByte)
    val bytes = Multimodal.encodeBmp24(w, h, rgb)
    val small = Multimodal.resizeBmp24(bytes, maxEdge = 8)
    val (nw, nh, out) = Multimodal.decodeBmp24(small)
    assert(nw == 8 && nh == 5, s"got ${nw}x$nh")
    // every thumbnail pixel is an exact source pixel at the scaled pos
    val scale = 16.0 / 8
    for (y <- 0 until nh; x <- 0 until nw; c <- 0 until 3) {
      val s = ((math.min(h - 1, (y * scale).toInt) * w +
        math.min(w - 1, (x * scale).toInt)) * 3 + c)
      assert(out((y * nw + x) * 3 + c) == rgb(s), s"pixel ($x,$y,$c)")
    }
    // already-small payloads return unchanged (no upscale, no rewrite)
    assert(Multimodal.resizeBmp24(small, maxEdge = 8).eq(small) ||
      Multimodal.resizeBmp24(small, maxEdge = 8).sameElements(small))
    // distributed: the seam emits re-encoded payloads + metadata
    import spark.implicits._
    val df = Seq((1L, bytes)).toDF("id", "media")
    val row = Multimodal.resizeBmpPartition(df, "media", "id", 8).head()
    val (rw, rh, _) = Multimodal.decodeBmp24(row.getAs[Array[Byte]]("media_resized"))
    assert(rw == 8 && rh == 5)
    assert(row.getStruct(2).getString(0) == "bmp")
  }

  test("PNG via the JDK codec round-trips pixels exactly (lossless)") {
    val (w, h) = (13, 7)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 29 + 3) % 256).toByte)
    val bytes = Multimodal.encodeImage("png", w, h, rgb)
    // real PNG magic
    assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte)
    val (bw, bh, back) = Multimodal.decodeImage(bytes)
    assert(bw == w && bh == h && back.sameElements(rgb))
    // 1x1 edge
    val one = Multimodal.encodeImage("png", 1, 1, Array[Byte](10, 20, 30))
    assert(Multimodal.decodeImage(one)._3.sameElements(Array[Byte](10, 20, 30)))
  }

  test("JPEG via the JDK codec: exact dimensions, deterministic decode, stable re-encode") {
    val (w, h) = (24, 18)
    val rgb = Array.tabulate(w * h * 3)(i => ((i * 7 + 11) % 256).toByte)
    val bytes = Multimodal.encodeImage("jpg", w, h, rgb)
    // real JFIF magic
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    val (bw, bh, px1) = Multimodal.decodeImage(bytes)
    assert(bw == w && bh == h)
    // lossy but DETERMINISTIC: the same bytes decode to the same pixels
    val (_, _, px2) = Multimodal.decodeImage(bytes)
    assert(px1.sameElements(px2))
    // and the decode→re-encode→decode loop is stable in shape
    val re = Multimodal.encodeImage("jpg", bw, bh, px1)
    val (rw, rh, _) = Multimodal.decodeImage(re)
    assert(rw == w && rh == h)
  }

  test("image refusals: unknown magic and truncated compressed streams refuse loudly") {
    intercept[IllegalArgumentException](
      Multimodal.decodeImage("definitely not an image payload".getBytes))
    val png = Multimodal.encodeImage("png", 9, 9, Array.fill(9 * 9 * 3)(7.toByte))
    intercept[IllegalArgumentException](Multimodal.decodeImage(png.take(20)))
    val jpg = Multimodal.encodeImage("jpg", 16, 16, Array.fill(16 * 16 * 3)(7.toByte))
    intercept[IllegalArgumentException](Multimodal.decodeImage(jpg.take(jpg.length / 3)))
  }

  test("distributed compressed-image decode recovers per-row features exactly") {
    val rows = (0L until 30L).map { i =>
      val w = (i % 9 + 4).toInt
      val h = (i % 4 + 4).toInt
      val rgb = Array.tabulate(w * h * 3)(k => ((i * 41 + k) % 256).toByte)
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (k <- rgb.indices by 3) {
        sr += rgb(k) & 0xff; sg += rgb(k + 1) & 0xff; sb += rgb(k + 2) & 0xff
      }
      (i, Multimodal.encodeImage("png", w, h, rgb), w.toLong, h.toLong, sr, sg, sb)
    }
    val df = rows.map(r => (r._1, r._2)).toDF("id", "media").repartition(5)
    val got = Multimodal.decodeImagePartition(df, "media", "id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    rows.foreach { case (i, _, w, h, sr, sg, sb) =>
      assert(got(i) == ((w, h, sr, sg, sb)), s"row $i")
    }
  }

  test("animated GIF via the JDK codec: exact multi-frame round-trip and stride sampling") {
    val (w, h) = (7, 5)
    val frames = (0 until 5).map(f =>
      Array.tabulate(w * h)(i => ((f * 13 + i * 3) % 256).toByte))
    val gif = Multimodal.encodeGifFrames(w, h, frames)
    assert(gif(0) == 'G'.toByte && gif(1) == 'I'.toByte && gif(2) == 'F'.toByte)
    val back = Multimodal.decodeGifFrames(gif)
    assert(back.size == 5)
    back.zip(frames).foreach { case ((bw, bh, gray), want) =>
      assert(bw == w && bh == h && gray.sameElements(want))
    }
    // refusals
    intercept[IllegalArgumentException](
      Multimodal.decodeGifFrames("not a gif".getBytes))
    intercept[IllegalArgumentException](Multimodal.decodeGifFrames(gif.take(30)))
    // distributed stride sampling keeps frames 0, 2, 4 with exact sums
    import spark.implicits._
    val df = Seq((1L, gif)).toDF("id", "media")
    val got = Multimodal.sampleGifFrames(df, "media", "id", stride = 2)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == Seq(0L, 2L, 4L))
    got.foreach { case (_, f, gw, gh, s) =>
      assert(gw == w && gh == h &&
        s == frames(f.toInt).map(_ & 0xff).sum.toLong, s"frame $f")
    }
  }

  test("distributed decode recovers per-row features exactly") {
    val rows = (0L until 40L).map { i =>
      val samples = Array.tabulate(10 + i.toInt)(k => (k * 3 - i.toInt).toShort)
      (i, Multimodal.encodeWavPcm16(22050, samples),
        samples.map(s => s.toLong * s).sum, samples.length.toLong)
    }
    val df = rows.map(r => (r._1, r._2)).toDF("id", "media").repartition(7)
    val got = Multimodal.decodeWavPartition(df, "media", "id")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    rows.foreach { case (i, _, sumSq, n) =>
      assert(got(i) == ((22050L, n, sumSq)), s"row $i")
    }
  }
}
