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
