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
}
