package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media pipeline: schema, determinism, and stub feature values") {
    val docs = Seq((1L, "abc", "x", "s1", 3L)).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.pipeline(spark, docs).collect().head
    assert(out.getAs[String]("mime") == "application/x-fake-s1")
    assert(out.getAs[Int]("payload_len") == 3)
    assert(out.getAs[Int]("first_byte") == 'a'.toInt)
    assert(out.getAs[Int]("last_byte") == 'c'.toInt)
    // mean of 'a','b','c' = 98
    assert(out.getAs[Double]("mean_byte") == 98.0)
    assert(out.getAs[Int]("frame_count") == 1)
  }

  test("pipeline runs over the real corpus with stable row count") {
    val docs = Tables(spark, sfDir, "documents")
    val out = Multimodal.pipeline(spark, docs)
    assert(out.count() == docs.count())
  }

  test("frame sampling: one row per stride window, deterministic hashes") {
    val docs = Seq((1L, "a" * 150, "x", "s1", 150L)).toDF(
      "doc_id", "text", "lang", "source", "n_chars")
    val frames = Multimodal.sampleFrames(spark, Multimodal.asMedia(docs),
      stride = 64).collect().sortBy(_.frame_idx)
    assert(frames.length == 2) // 150 bytes / 64 = 2 full strides
    assert(frames.map(_.offset).toSeq == Seq(0, 64))
    // windows 0 and 1 are both 64×'a' → same hash
    assert(frames(0).frame_hash == frames(1).frame_hash)
  }

  test("wavPipeline: fixture decodes to byte-derivable features, null-safe") {
    val docs = Seq(
      (0L, "abc", "x", "s1", 3L), // rate 8000, junk-before-fmt layout
      (1L, "hello world", "x", "s1", 11L), // rate 9000, junk mid
      (2L, "z", "x", "s1", 1L), // rate 10000, junk after data (+pad byte)
      (9L, null.asInstanceOf[String], "x", "s1", 0L)) // empty-but-valid WAV
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.wavPipeline(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.values.foreach { r =>
      assert(r.getAs[Int]("decode_ok") == 1)
      assert(r.getAs[Int]("audio_format") == 1)
      assert(r.getAs[Int]("channels") == 1)
      assert(r.getAs[Int]("bits_per_sample") == 8)
    }
    assert(out(0L).getAs[Int]("sample_rate") == 8000)
    assert(out(1L).getAs[Int]("sample_rate") == 9000)
    assert(out(9L).getAs[Int]("sample_rate") == 9000) // 8000 + (9%8)*1000
    assert(out(0L).getAs[Int]("n_samples") == 3)
    assert(out(0L).getAs[Double]("mean_amp") == 98.0) // mean('a','b','c')
    assert(out(2L).getAs[Int]("n_samples") == 1) // odd data chunk, padded
    assert(out(2L).getAs[Double]("mean_amp") == 'z'.toInt.toDouble)
    assert(out(9L).getAs[Int]("n_samples") == 0)
    assert(out(9L).getAs[Double]("mean_amp") == 0.0)
    assert(out(9L).getAs[Double]("duration_ms") == 0.0)
    // duration: 3 samples at 8000 Hz = 0.375 ms
    assert(out(0L).getAs[Double]("duration_ms") == 0.375)
  }

  test("parseWav is a real chunk-walking parser: 16-bit stereo + unknown chunks") {
    // hand-build a 16-bit STEREO PCM WAV (a layout the fixture never
    // emits) with a LIST chunk between fmt and data — proving the
    // parser reads the format struct, not fixture assumptions
    val bb = java.nio.ByteBuffer.allocate(128)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val samples = Array[Short](1000, -1000, 32767, -32768) // 2 frames × 2 ch
    val dataLen = samples.length * 2
    val fmtLen = 16; val listLen = 5 // odd size → spec pad byte
    val body = (8 + fmtLen) + (8 + listLen + 1) + (8 + dataLen)
    bb.put("RIFF".getBytes); bb.putInt(4 + body); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(fmtLen)
    bb.putShort(1); bb.putShort(2) // PCM, stereo
    bb.putInt(44100); bb.putInt(44100 * 4) // rate, byte rate
    bb.putShort(4); bb.putShort(16) // block align, bits
    bb.put("LIST".getBytes); bb.putInt(listLen)
    bb.put(Array.fill[Byte](listLen + 1)('j'.toByte)) // payload + pad
    bb.put("data".getBytes); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    val wav = java.util.Arrays.copyOf(bb.array(), bb.position())
    val (ok, af, ch, rate, bits, n, mean) = Multimodal.parseWav(wav)
    assert(ok && af == 1 && ch == 2 && rate == 44100 && bits == 16)
    assert(n == 2) // sample FRAMES, not samples
    assert(mean == (1000.0 + 1000.0 + 32767.0 + 32768.0) / 4) // mean |s|
  }

  test("parseWav verdicts malformed bytes instead of throwing") {
    def notOk(b: Array[Byte]): Unit = assert(!Multimodal.parseWav(b)._1)
    notOk(null)
    notOk(Array.empty[Byte])
    notOk("RIFFxxxxWAVE".getBytes) // no chunks at all
    notOk("JUNKxxxxWAVE".getBytes ++ new Array[Byte](40)) // bad magic
    val good = Multimodal.wavFixture(0L, "abcdef".getBytes)
    assert(Multimodal.parseWav(good)._1)
    // truncation anywhere inside the chunk list must verdict, not throw
    (12 until good.length).foreach { cut =>
      Multimodal.parseWav(java.util.Arrays.copyOf(good, cut)): Unit
    }
    notOk(java.util.Arrays.copyOf(good, good.length - 1)) // truncated data
    // a chunk whose declared size overruns the buffer
    val bb = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(24); bb.put("WAVE".getBytes)
    bb.put("data".getBytes); bb.putInt(999999) // size past buffer
    notOk(java.util.Arrays.copyOf(bb.array(), bb.position()))
  }

  test("bmpPipeline: fixture decodes to byte-derivable features across " +
    "both row orders, null-safe") {
    val docs = Seq(
      (0L, "abc", "x", "s1", 3L), // w=1, h=3, bottom-up, no gap
      (1L, "hello world", "x", "s1", 11L), // w=2, h=6, TOP-DOWN, gap 4
      (2L, "z", "x", "s1", 1L), // w=3, h=1, bottom-up, gap 8
      (9L, null.asInstanceOf[String], "x", "s1", 0L)) // w=2, all-zero 2×1
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.bmpPipeline(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.values.foreach { r =>
      assert(r.getAs[Int]("decode_ok") == 1)
      assert(r.getAs[Int]("bits_per_pixel") == 8)
    }
    assert(out(0L).getAs[Int]("width") == 1 &&
      out(0L).getAs[Int]("height") == 3 && out(0L).getAs[Int]("n_pixels") == 3)
    assert(out(0L).getAs[Double]("mean_px") == 98.0) // mean('a','b','c')
    assert(out(0L).getAs[Int]("first_px") == 'a'.toInt) // top-left = byte 0
    // w=2: "hello world" (11 bytes) → h=6, 12 pixels incl. 1 zero fill
    assert(out(1L).getAs[Int]("width") == 2 && out(1L).getAs[Int]("height") == 6)
    val sum1 = "hello world".getBytes.map(_.toInt).sum
    assert(out(1L).getAs[Double]("mean_px") ==
      math.floor(sum1 / 12.0 * 1e4 + 0.5) / 1e4)
    assert(out(1L).getAs[Int]("first_px") == 'h'.toInt) // top-down storage
    assert(out(2L).getAs[Int]("n_pixels") == 3) // w=3, h=1, 2 zero fills
    assert(out(9L).getAs[Int]("width") == 2 &&
      out(9L).getAs[Int]("height") == 1) // empty → valid all-zero w×1
    assert(out(9L).getAs[Double]("mean_px") == 0.0 &&
      out(9L).getAs[Int]("first_px") == 0)
  }

  test("parseBmp is a real header-driven parser: 24-bit bottom-up with row padding") {
    // hand-build a 24-bit BMP (a layout the fixture never emits): 2×2,
    // no palette, bottom-up, stride 8 (6 pixel bytes + 2 pad). Proves
    // the parser reads bpp/stride/row order from the header, not
    // fixture assumptions.
    val bb = java.nio.ByteBuffer.allocate(14 + 40 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(70).putInt(0).putInt(54)
    bb.putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
    bb.putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // stored row 0 = IMAGE BOTTOM row: pixels (B,G,R) = (1,2,3),(4,5,6)
    bb.put(Array[Byte](1, 2, 3, 4, 5, 6, 99, 99)) // 99s = padding, excluded
    // stored row 1 = IMAGE TOP row: (7,8,9),(10,11,12)
    bb.put(Array[Byte](7, 8, 9, 10, 11, 12, 99, 99))
    val bmp = java.util.Arrays.copyOf(bb.array(), bb.position())
    val (ok, w, h, bpp, n, mean, first) = Multimodal.parseBmp(bmp)
    assert(ok && w == 2 && h == 2 && bpp == 24 && n == 4)
    assert(mean == (1 + 2 + 3 + 4 + 5 + 6 + 7 + 8 + 9 + 10 + 11 + 12) / 12.0)
    assert(first == 7) // top-left pixel's first channel = LAST stored row
  }

  test("parseBmp verdicts malformed bytes instead of throwing") {
    def notOk(b: Array[Byte]): Unit = assert(!Multimodal.parseBmp(b)._1)
    notOk(null)
    notOk(Array.empty[Byte])
    val good = Multimodal.bmpFixture(0L, "abcdef".getBytes)
    assert(Multimodal.parseBmp(good)._1)
    def patched(off: Int, bytes: Array[Byte]): Array[Byte] = {
      val c = good.clone(); bytes.copyToArray(c, off); c
    }
    notOk(patched(0, "XX".getBytes)) // bad magic
    notOk(patched(30, Array[Byte](1, 0, 0, 0))) // compressed (BI_RLE8)
    notOk(patched(28, Array[Byte](4, 0))) // unsupported bpp
    notOk(patched(18, Array[Byte](0, 0, 0, 0))) // zero width
    notOk(patched(22, Array[Byte](0, 0, 0, 0))) // zero height
    notOk(patched(22, Array[Byte](0, 0, 0, 0x80.toByte))) // Int.MinValue height
    notOk(patched(10, Array[Byte](-1, -1, 0, 0))) // data offset past buffer
    // truncation at every offset must verdict, never throw
    (0 until good.length).foreach { cut =>
      Multimodal.parseBmp(java.util.Arrays.copyOf(good, cut)): Unit
    }
    notOk(java.util.Arrays.copyOf(good, good.length - 1)) // truncated pixels
    // a width whose stride overruns the buffer
    notOk(patched(18, Array[Byte](-1, -1, -1, 0x7f)))
    // Long-overflow bounds evasion: width=0x7FFFFFFF × height=0x60000000
    // at 24 bpp makes strideL*height wrap negative, so the multiplied
    // form of the bounds check would PASS and the pixel walk would
    // throw — the division-form check must verdict it
    val evil = java.nio.ByteBuffer.allocate(58)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    evil.put('B'.toByte).put('M'.toByte).putInt(58).putInt(0).putInt(54)
    evil.putInt(40).putInt(0x7fffffff).putInt(0x60000000).putShort(1)
    evil.putShort(24).putInt(0).putInt(0).putInt(0).putInt(0)
    evil.putInt(0).putInt(0)
    notOk(java.util.Arrays.copyOf(evil.array(), 58))
  }

  test("pngPipeline: fixture round-trips through deflate + every scanline " +
    "filter, null-safe") {
    // doc_ids 0..4 rotate the per-row filter None/Sub/Up/Average/Paeth;
    // the features must be identical functions of the payload bytes for
    // ALL of them — a wrong unfilter shifts mean/first immediately.
    val docs = Seq(
      (0L, "abc", "x", "s1", 3L), // w=1, filter None
      (1L, "hello world", "x", "s1", 11L), // w=2, filter Sub
      (2L, "zq", "x", "s1", 2L), // w=3, filter Up
      (3L, "some longer text with spaces", "x", "s1", 28L), // w=4, Average
      (4L, "paeth filter row", "x", "s1", 16L), // w=5, Paeth
      (9L, null.asInstanceOf[String], "x", "s1", 0L)) // empty → all-zero
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.pngPipeline(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.values.foreach { r =>
      assert(r.getAs[Int]("decode_ok") == 1)
      assert(r.getAs[Int]("bit_depth") == 8)
      assert(r.getAs[Int]("color_type") == 0)
    }
    def expect(id: Long, text: String): Unit = {
      val w = 1 + (id % 8).toInt
      val n = text.getBytes.length
      val h = math.max(1, (n + w - 1) / w)
      val r = out(id)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("n_pixels") == w * h)
      val mean = text.getBytes.map(_.toInt & 0xff).sum.toDouble / (w * h)
      assert(r.getAs[Double]("mean_px") ==
        math.floor(mean * 1e4 + 0.5) / 1e4, s"doc $id")
      assert(r.getAs[Int]("first_px") ==
        (if (n == 0) 0 else text.getBytes.head.toInt & 0xff))
    }
    expect(0L, "abc"); expect(1L, "hello world"); expect(2L, "zq")
    expect(3L, "some longer text with spaces")
    expect(4L, "paeth filter row")
    assert(out(9L).getAs[Double]("mean_px") == 0.0 &&
      out(9L).getAs[Int]("first_px") == 0)
  }

  test("parsePng is a real inflate+unfilter decoder: truecolor with " +
    "Paeth, a layout the fixture never emits") {
    // hand-build a 2×2 color-type-2 (RGB) PNG with Up then Paeth rows —
    // proves the parser reads channels from IHDR and reverses filters
    // with the 3-byte pixel stride, not fixture assumptions.
    val px = Array( // rows top-down, (R,G,B) per pixel
      Array(10, 20, 30, 40, 50, 60),
      Array(15, 25, 35, 45, 55, 65))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new java.io.ByteArrayOutputStream()
    raw.write(2) // row 0: Up (above = 0 ⇒ raw values)
    px(0).foreach(raw.write)
    raw.write(4) // row 1: Paeth
    (0 until 6).foreach { j =>
      val left = if (j >= 3) px(1)(j - 3) else 0
      val above = px(0)(j)
      val ul = if (j >= 3) px(0)(j - 3) else 0
      raw.write((px(1)(j) - paeth(left, above, ul)) & 0xff)
    }
    val d = new java.util.zip.Deflater()
    d.setInput(raw.toByteArray); d.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](1024)
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    d.end()
    def be(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val body = typ.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(body)
      be(data.length) ++ body ++ be(crc.getValue.toInt)
    }
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = be(2) ++ be(2) ++ Array[Byte](8, 2, 0, 0, 0)
    val png = sig ++ chunk("IHDR", ihdr) ++ chunk("IDAT", z.toByteArray) ++
      chunk("IEND", Array.empty[Byte])
    val (ok, w, h, bd, ct, n, mean, first) = Multimodal.parsePng(png)
    assert(ok && w == 2 && h == 2 && bd == 8 && ct == 2 && n == 4)
    assert(mean == (px(0).sum + px(1).sum) / 12.0)
    assert(first == 10) // pixel (0,0) R channel, through the Up reverse
  }

  test("parsePng verdicts malformed bytes instead of throwing") {
    def notOk(b: Array[Byte]): Unit = assert(!Multimodal.parsePng(b)._1)
    notOk(null)
    notOk(Array.empty[Byte])
    val good = Multimodal.pngFixture(4L, "abcdefgh".getBytes) // Paeth rows
    assert(Multimodal.parsePng(good)._1)
    def patched(off: Int, bytes: Array[Byte]): Array[Byte] = {
      val c = good.clone(); bytes.copyToArray(c, off); c
    }
    notOk(patched(0, "XX".getBytes)) // bad signature
    notOk(patched(16, Array[Byte](0, 0, 0, 0))) // zero width
    notOk(patched(20, Array[Byte](0, 0, 0, 0))) // zero height
    notOk(patched(24, Array[Byte](16))) // 16-bit depth unsupported
    notOk(patched(25, Array[Byte](3))) // palette color type unsupported
    notOk(patched(28, Array[Byte](1))) // interlaced (Adam7) unsupported
    // declared giant dimensions must verdict at the allocation cap,
    // never allocate: width=2^30, height=2^30
    notOk(patched(16, Array[Byte](0x40, 0, 0, 0)))
    // corrupt the zlib stream (flip a byte inside IDAT data)
    val idatOff = good.indexOfSlice("IDAT".getBytes) + 4
    notOk(patched(idatOff + 2, Array[Byte](0x55)))
    // truncation at every offset must verdict, never throw
    (0 until good.length).foreach { cut =>
      Multimodal.parsePng(java.util.Arrays.copyOf(good, cut)): Unit
    }
    notOk(java.util.Arrays.copyOf(good, good.length - 1)) // no IEND
  }

  test("notifier renders templates and dispatches to the sink") {
    import graft.etl.{CollectingNotifier, Notifier}
    val sink = new CollectingNotifier
    val n = new Notifier(Map("load_done" -> "Loaded {table} ({rows} rows)"), sink)
    assert(n.render("load_done", Map("table" -> "t", "rows" -> "42"))
      == "Loaded t (42 rows)")
    n.send("load_done", Map("table" -> "t", "rows" -> "42"))
    assert(sink.sent.toList == List("load_done" -> Map("table" -> "t", "rows" -> "42")))
    intercept[RuntimeException](n.send("nope", Map.empty))
  }

  test("LZW codec round-trips, including width growth and the 4096 reset") {
    def rt(data: Array[Byte]): Unit = {
      val enc = Multimodal.lzwEncode(data, 8)
      val dec = Multimodal.lzwDecode(enc, 8, data.length)
      assert(dec != null && java.util.Arrays.equals(dec, data),
        s"round trip failed for ${data.length} bytes")
    }
    rt(Array.empty[Byte])
    rt(Array[Byte](7))
    rt("hello world hello world hello".getBytes)
    // KwKwK: aaa... forces code==next immediately
    rt(Array.fill[Byte](100)('a'))
    // every byte value, repeated patterns → width grows past 9/10/11 bits
    rt(Array.tabulate[Byte](3000)(i => (i % 256).toByte))
    // dictionary overflow → clear + reset mid-stream (needs >4096 adds:
    // a long low-entropy-but-varied stream)
    val big = Array.tabulate[Byte](60000)(i => ((i * 31 + i / 7) % 256).toByte)
    rt(big)
    // decoder refuses garbage instead of throwing
    assert(Multimodal.lzwDecode(Array[Byte](-1, -1, -1), 8, 100) == null ||
      true) // value unspecified, must not throw
    assert(Multimodal.lzwDecode(Array.empty[Byte], 8, 100) == null)
  }

  test("gifPipeline: fixture round-trips through real LZW, interlace, " +
    "and extension rotations, null-safe") {
    // doc_ids rotate interlace (id%4==3), GCE (even), comment (id%3==0)
    val docs = Seq(
      (0L, "abc", "x", "s1", 3L), // w=1, GCE + comment
      (1L, "hello world", "x", "s1", 11L), // w=2, plain
      (2L, "zq", "x", "s1", 2L), // w=3, GCE
      (3L, "interlaced rows need eight plus", "x", "s1", 31L), // w=4, INTERLACED + comment
      (7L, "another interlaced image with enough text for many rows", "x", "s1", 56L), // w=8, INTERLACED
      (9L, null.asInstanceOf[String], "x", "s1", 0L)) // empty → all-zero
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.gifPipeline(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    out.values.foreach(r => assert(r.getAs[Int]("decode_ok") == 1))
    def expect(id: Long, text: String): Unit = {
      val w = 1 + (id % 8).toInt
      val n = text.getBytes.length
      val h = math.max(1, (n + w - 1) / w)
      val r = out(id)
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("n_pixels") == w * h)
      val mean = text.getBytes.map(_.toInt & 0xff).sum.toDouble / (w * h)
      assert(r.getAs[Double]("mean_px") ==
        math.floor(mean * 1e4 + 0.5) / 1e4, s"doc $id")
      assert(r.getAs[Int]("first_px") ==
        (if (n == 0) 0 else text.getBytes.head.toInt & 0xff), s"doc $id")
      assert(r.getAs[Int]("interlaced") == (if (id % 4 == 3) 1 else 0))
      assert(r.getAs[Int]("n_ext") ==
        (if (id % 2 == 0) 1 else 0) + (if (id % 3 == 0) 1 else 0))
    }
    expect(0L, "abc"); expect(1L, "hello world"); expect(2L, "zq")
    expect(3L, "interlaced rows need eight plus")
    expect(7L, "another interlaced image with enough text for many rows")
    assert(out(9L).getAs[Double]("mean_px") == 0.0 &&
      out(9L).getAs[Int]("first_px") == 0)
  }

  test("resampleWav2x: integer 2-tap decimation over the container walk") {
    // "ab" → one output sample (97+98)/2 = 97 (floor); odd tail drops
    val (ok, ri, ro, ni, no, mean, first) =
      Multimodal.resampleWav2x(Multimodal.wavFixture(3L, "abc".getBytes))
    assert(ok && ri == 11000 && ro == 5500)
    assert(ni == 3 && no == 1 && first == 97 && mean == 97.0)
    // empty payload: a valid WAV with zero output samples
    val empty = Multimodal.resampleWav2x(Multimodal.wavFixture(0L, Array.empty))
    assert(empty._1 && empty._5 == 0 && empty._6 == 0.0)
    // non-mono/non-8-bit verdicts, never throws; truncation sweep
    val good = Multimodal.wavFixture(1L, "hello world!".getBytes)
    (0 until good.length).foreach { cut =>
      Multimodal.resampleWav2x(java.util.Arrays.copyOf(good, cut)): Unit
    }
    assert(!Multimodal.resampleWav2x(Array.empty[Byte])._1)
    // pipeline over a frame, null-safe
    val docs = Seq((2L, "wxyz", "x", "s1", 4L),
      (9L, null.asInstanceOf[String], "x", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.resamplePipeline(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(2L).getAs[Int]("n_out") == 2)
    assert(out(2L).getAs[Int]("first_out") == ('w' + 'x') / 2)
    assert(out(9L).getAs[Int]("decode_ok") == 1 &&
      out(9L).getAs[Double]("mean_out") == 0.0)
  }

  test("resizeBmp2x: 2x2 integer box downsample over the recovered " +
    "logical image") {
    // doc 3 → w=4 top-down; 16 bytes a..p → 4×4 logical grid, 2×2 out:
    // (97+98+101+102)/4=99, (99+100+103+104)/4=101,
    // (105+106+109+110)/4=107, (107+108+111+112)/4=109 → mean 104
    val (ok, wi, hi, wo, ho, n, mean, first) = Multimodal.resizeBmp2x(
      Multimodal.bmpFixture(3L, "abcdefghijklmnop".getBytes))
    assert(ok && wi == 4 && hi == 4 && wo == 2 && ho == 2 && n == 4)
    assert(first == 99 && mean == 104.0)
    // even id → bottom-up storage; identical logical payload semantics
    // (w=3, h=2: one output pixel over a,b,d,e)
    val even = Multimodal.resizeBmp2x(
      Multimodal.bmpFixture(10L, "abcdef".getBytes))
    assert(even._1 && even._2 == 3 && even._3 == 2 && even._6 == 1)
    assert(even._8 == (97 + 98 + 100 + 101) / 4 && even._7 == 99.0)
    // w=1 → zero output columns: n_out 0, mean pinned 0.0
    val thin = Multimodal.resizeBmp2x(
      Multimodal.bmpFixture(0L, "abc".getBytes))
    assert(thin._1 && thin._4 == 0 && thin._6 == 0 && thin._7 == 0.0)
    // 24-bit verdicts (single-channel lane), truncation never throws
    val good = Multimodal.bmpFixture(3L, "abcdefgh".getBytes)
    val bpp24 = good.clone(); bpp24(28) = 24.toByte; bpp24(29) = 0.toByte
    assert(!Multimodal.resizeBmp2x(bpp24)._1)
    (0 until good.length).foreach { cut =>
      Multimodal.resizeBmp2x(java.util.Arrays.copyOf(good, cut)): Unit
    }
    assert(!Multimodal.resizeBmp2x(Array.empty[Byte])._1)
    // pipeline over a frame, null-safe (null text ≡ w×1 all-zero image)
    val docs = Seq((3L, "abcdefghijklmnop", "x", "s1", 16L),
      (9L, null.asInstanceOf[String], "x", "s1", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Multimodal.resizeBmpPipeline(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(3L).getAs[Int]("n_out") == 4)
    assert(out(3L).getAs[Double]("mean_out") == 104.0)
    assert(out(9L).getAs[Int]("decode_ok") == 1 &&
      out(9L).getAs[Int]("n_out") == 0)
  }

  test("parseAvi walks the nested RIFF grammar and samples every frame") {
    val payload = ("f" * 40).getBytes // 3 frames: 16+16+8(+pad)
    val avi = Multimodal.aviFixture(5L, payload)
    val (ok, w, h, dec, fnd, firstSum, total) = Multimodal.parseAvi(avi)
    assert(ok)
    assert(w == 16 * (1 + 5 % 4) && h == 8 * (1 + 5 % 3))
    assert(dec == 3 && fnd == 3)
    assert(firstSum == 16L * 'f')
    assert(total == 48L)
    // empty payload: one all-zero frame
    val e = Multimodal.parseAvi(Multimodal.aviFixture(0L, Array.empty))
    assert(e._1 && e._4 == 1 && e._5 == 1 && e._6 == 0L)
    // malformed: bad magic, truncation at every offset — never throws
    assert(!Multimodal.parseAvi("RIFFxxxxWAVE".getBytes)._1)
    (0 until avi.length).foreach { cut =>
      Multimodal.parseAvi(java.util.Arrays.copyOf(avi, cut)): Unit
    }
    assert(!Multimodal.parseAvi(java.util.Arrays.copyOf(avi, avi.length - 1))._1)
  }

  test("parseGif verdicts malformed bytes instead of throwing") {
    def notOk(b: Array[Byte]): Unit = assert(!Multimodal.parseGif(b)._1)
    notOk(Array.empty[Byte])
    // interlaced fixture with multiple rows — the hardest path
    val good = Multimodal.gifFixture(3L,
      "interlaced rows need eight plus".getBytes)
    assert(Multimodal.parseGif(good)._1)
    def patched(off: Int, bytes: Array[Byte]): Array[Byte] = {
      val c = good.clone(); bytes.copyToArray(c, off); c
    }
    notOk(patched(0, "XX".getBytes)) // bad signature
    // image descriptor offset: header 6 + LSD 7 + GCT 768 + comment
    // extension (id=3 → "graft fixture 3": 2 + 1 + 15 + 1 bytes); the
    // 0x2c byte also occurs INSIDE the palette, so compute, don't scan
    val imgOff = 6 + 7 + 768 + (2 + 1 + "graft fixture 3".length + 1)
    assert((good(imgOff) & 0xff) == 0x2c)
    notOk(patched(imgOff + 5, Array[Byte](0, 0, 0, 0))) // zero w and h
    // corrupt the LZW stream (flip bytes after the min-code-size byte)
    notOk(patched(imgOff + 12, Array[Byte](-1, -1, -1, -1)))
    // truncation at every offset must verdict, never throw
    (0 until good.length).foreach { cut =>
      Multimodal.parseGif(java.util.Arrays.copyOf(good, cut)): Unit
    }
  }
}
