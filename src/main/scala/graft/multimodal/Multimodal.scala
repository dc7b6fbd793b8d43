package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * The decode step is a clearly-marked deterministic STUB (the real
  * codec libraries are not in this container); everything around it —
  * schema, partitioning, batch iteration shape, feature column contract —
  * is the real design: at scale the stub body is replaced by a JNI/codec
  * call and nothing else changes.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String,
                      payload_len: Int)
  case class MediaFeatures(doc_id: Long, mime: String, payload_len: Int,
                           frame_count: Int, features: Array[Double])

  /** Wrap a text corpus as fake media payloads (UTF-8 bytes + metadata).
    * In production this column comes straight from parquet `binary`.
    */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      concat(lit("application/x-fake-"), col("source")).as("mime"),
      length(encode(col("text"), "UTF-8")).as("payload_len"))

  /** Per-partition batch "decode" + feature extraction.
    *
    * STUB: a real implementation decodes the codec here (image resize,
    * audio resample, frame sampling). The deterministic fake derives
    * 4 features from payload bytes so tests can assert exact values.
    * `mapPartitions` keeps the batch shape of a real decoder (amortized
    * per-partition init — where a codec context / model handle would be
    * created once per partition, not per row).
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    // A missing payload decodes like an EMPTY one (the corpus-wide
    // null-payload convention): coalesce before the typed boundary,
    // because MediaRow's primitive payload_len would otherwise throw a
    // NOT_NULL_ASSERT_VIOLATION — one null media row killing the whole
    // extract job.
    media.select(col("doc_id"),
        coalesce(col("payload"), lit(Array.empty[Byte])).as("payload"),
        col("mime"),
        coalesce(col("payload_len"), lit(0)).as("payload_len"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // >>> per-partition init would happen here (codec context) <<<
        rows.map { r =>
          val bytes = r.payload
          val n = bytes.length
          // STUB decode: deterministic pseudo-features from the payload.
          val f0 = if (n == 0) 0.0 else bytes.map(_.toInt & 0xff).sum.toDouble / n
          val f1 = n.toDouble
          val f2 = if (n == 0) 0.0 else (bytes.head & 0xff).toDouble
          val f3 = if (n == 0) 0.0 else (bytes.last & 0xff).toDouble
          val frames = math.max(1, n / 64) // fake "frame sampling" stride
          MediaFeatures(r.doc_id, r.mime, r.payload_len, frames,
            Array(f0, f1, f2, f3))
        }
      }
  }

  case class Frame(doc_id: Long, frame_idx: Int, offset: Int,
                   frame_hash: Long)

  /** Frame sampling: one output row per sampled "frame" (fixed-stride
    * byte windows in the stub; keyframes in a real decoder). Shows the
    * 1→N batch shape of video/audio extraction — the explode happens
    * inside the partition iterator, so no driver involvement and no
    * row-array materialization.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   stride: Int = 64): Dataset[Frame] = {
    import spark.implicits._
    // Same null-payload coalesce as [[decodeFeatures]]: null media ≡
    // empty media (one zero-length frame), never a job-killing NPE.
    media.select(col("doc_id"),
        coalesce(col("payload"), lit(Array.empty[Byte])).as("payload"),
        col("mime"),
        coalesce(col("payload_len"), lit(0)).as("payload_len"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val n = math.max(1, r.payload.length / stride)
          (0 until n).iterator.map { i =>
            val off = i * stride
            val end = math.min(off + stride, r.payload.length)
            var h = 1125899906842597L // deterministic fake frame hash
            var j = off
            while (j < end) { h = 31 * h + (r.payload(j) & 0xff); j += 1 }
            Frame(r.doc_id, i, off, h)
          }
        }
      }
  }

  // ---------------------------------------------------------------------
  // Real decode path: RIFF/WAVE PCM (VERDICT-r11 item 4). WAV is a
  // self-describing public container (RIFF chunk grammar + PCM fmt
  // struct — pure little-endian byte arithmetic, no codec library), so
  // ONE mime gets a genuine parser while the stub remains the mandated
  // stand-in for codecs this container lacks (JPEG/MP4/...). The
  // parser is standards-shaped: it WALKS the chunk list (unknown
  // chunks like LIST/INFO skipped by their declared size, odd sizes
  // padded per spec) rather than assuming fixed offsets, handles 8-bit
  // unsigned and 16-bit signed PCM, and verdicts malformed bytes
  // (decode_ok=0) instead of throwing — one truncated file in 100 TB
  // must not kill the extract job.
  // ---------------------------------------------------------------------

  case class WavFeatures(doc_id: Long, decode_ok: Int, audio_format: Int,
                         channels: Int, sample_rate: Int,
                         bits_per_sample: Int, n_samples: Int,
                         mean_amp: Double)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE byte buffer. Returns (ok, audioFormat, channels,
    * sampleRate, bitsPerSample, nSampleFrames, meanAmplitude) where
    * meanAmplitude is the mean unsigned sample value for 8-bit PCM and
    * the mean |sample| for 16-bit signed PCM (0.0 for an empty data
    * chunk). NOT ok when: too short / wrong magics / truncated chunk /
    * fmt or data missing / non-PCM / unsupported width.
    */
  def parseWav(bytes: Array[Byte]): (Boolean, Int, Int, Int, Int, Int, Double) = {
    val bad = (false, 0, 0, 0, 0, 0, 0.0)
    if (bytes == null || bytes.length < 12) return bad
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return bad
    var off = 12
    var fmtOk = false
    var audioFormat = 0; var channels = 0; var sampleRate = 0
    var bits = 0; var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = u32(bytes, off + 4)
      // a declared size past the buffer is a truncated/corrupt file
      if (size > Int.MaxValue || off + 8 + size > bytes.length) return bad
      val sz = size.toInt
      if (id == "fmt " && sz >= 16) {
        audioFormat = u16(bytes, off + 8)
        channels = u16(bytes, off + 10)
        sampleRate = u32(bytes, off + 12).toInt
        blockAlign = u16(bytes, off + 20)
        bits = u16(bytes, off + 22)
        fmtOk = true
      } else if (id == "data") {
        dataOff = off + 8
        dataLen = sz
      }
      // RIFF chunks are word-aligned: odd payloads carry one pad byte
      off += 8 + sz + (sz & 1)
    }
    if (!fmtOk || dataOff < 0 || audioFormat != 1 || channels < 1 ||
        sampleRate <= 0) return bad
    val bytesPerSample = bits / 8
    if ((bits != 8 && bits != 16) ||
        blockAlign != bytesPerSample * channels) return bad
    val nFrames = dataLen / blockAlign
    var sum = 0.0
    var i = 0
    val total = nFrames * channels
    while (i < total) {
      val o = dataOff + i * bytesPerSample
      sum += (if (bits == 8) (bytes(o) & 0xff).toDouble
              else math.abs(u16(bytes, o).toShort.toDouble))
      i += 1
    }
    val mean = if (total == 0) 0.0 else sum / total
    (true, audioFormat, channels, sampleRate, bits, nFrames, mean)
  }

  /** Deterministic WAV fixture: 8-bit mono PCM whose samples are
    * `samples` verbatim, sample rate keyed off `docId`, with a junk
    * LIST chunk rotated through three positions (before fmt / between
    * fmt and data / after data) so the corpus as a whole exercises the
    * parser's chunk WALK, not one fixed layout. Field-for-field the
    * container a real encoder writes — [[parseWav]] accepts any
    * conformant PCM WAV, this just makes the gate's input derivable in
    * DuckDB (the features reduce to byte arithmetic over `text`).
    */
  def wavFixture(docId: Long, samples: Array[Byte]): Array[Byte] = {
    val sampleRate = 8000 + (docId % 8).toInt * 1000
    val junkLen = (docId % 5).toInt * 4
    val junk = new Array[Byte](8 + junkLen)
    junk(0) = 'L'; junk(1) = 'I'; junk(2) = 'S'; junk(3) = 'T'
    junk(4) = (junkLen & 0xff).toByte
    junk(5) = ((junkLen >> 8) & 0xff).toByte
    java.util.Arrays.fill(junk, 8, junk.length, 'x'.toByte)
    val fmt = new Array[Byte](24)
    fmt(0) = 'f'; fmt(1) = 'm'; fmt(2) = 't'; fmt(3) = ' '
    fmt(4) = 16 // fmt payload size
    def le16(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = (v & 0xff).toByte; a(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def le32(a: Array[Byte], o: Int, v: Int): Unit = {
      le16(a, o, v & 0xffff); le16(a, o + 2, (v >>> 16) & 0xffff)
    }
    le16(fmt, 8, 1) // PCM
    le16(fmt, 10, 1) // mono
    le32(fmt, 12, sampleRate)
    le32(fmt, 16, sampleRate) // byte rate = rate * blockAlign(1)
    le16(fmt, 20, 1) // block align
    le16(fmt, 22, 8) // bits
    val pad = samples.length & 1
    val data = new Array[Byte](8 + samples.length + pad)
    data(0) = 'd'; data(1) = 'a'; data(2) = 't'; data(3) = 'a'
    le32(data, 4, samples.length)
    System.arraycopy(samples, 0, data, 8, samples.length)
    val chunks: Seq[Array[Byte]] = (docId % 3) match {
      case 0 => Seq(junk, fmt, data)
      case 1 => Seq(fmt, junk, data)
      case _ => Seq(fmt, data, junk)
    }
    val body = chunks.map(_.length).sum
    val out = new Array[Byte](12 + body)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 4 + body)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    var o = 12
    chunks.foreach { c =>
      System.arraycopy(c, 0, out, o, c.length); o += c.length
    }
    out
  }

  /** Synthesize the WAV-media frame for the decode gate: one fixture
    * per document, samples = the UTF-8 payload bytes (null text ≡ an
    * empty-but-valid WAV — zero samples, decode_ok=1).
    */
  def asWavMedia(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id"),
        coalesce(encode(col("text"), "UTF-8"), lit(Array.empty[Byte]))
          .as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, wavFixture(id, p)) })
      .toDF("doc_id", "payload")
  }

  /** Decode WAV payloads into typed features — the REAL decode path
    * (same mapPartitions batch shape as the stub; a codec-library mime
    * swaps the parser body, nothing else). Malformed payloads verdict
    * (decode_ok=0, zeroed features), never throw.
    */
  def decodeWavFeatures(spark: SparkSession, media: DataFrame): Dataset[WavFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"),
        coalesce(col("payload"), lit(Array.empty[Byte])).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (ok, af, ch, rate, bits, n, mean) = parseWav(bytes)
        WavFeatures(id, if (ok) 1 else 0, af, ch, rate, bits, n, mean)
      })
  }

  /** End-to-end WAV gate frame: synthesize → parse → features, with
    * the corpus halfUp discipline on the derived ratios (same reason
    * as [[pipeline]]'s mean_byte).
    */
  def wavPipeline(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeWavFeatures(spark, asWavMedia(spark, documents)).toDF()
      .select(col("doc_id"), col("decode_ok"), col("audio_format"),
        col("channels"), col("sample_rate"), col("bits_per_sample"),
        col("n_samples"),
        graft.text.Text.halfUp(col("mean_amp"), 4).as("mean_amp"),
        graft.text.Text.halfUp(
          col("n_samples") * lit(1000.0) / col("sample_rate"), 4)
          .as("duration_ms"))

  // ---------------------------------------------------------------------
  // Real decode path #2: BMP (Windows DIB, BI_RGB). Like RIFF/WAVE, an
  // uncompressed BMP is a self-describing public container — file
  // header + BITMAPINFOHEADER + optional palette + 4-byte-padded pixel
  // rows, all little-endian byte arithmetic, no codec library — so the
  // IMAGE modality also gets a genuine parser while the stub remains
  // the mandated stand-in for real codecs (JPEG/PNG/MP4...). The
  // parser honors the header's declared pixel-data offset (it never
  // assumes 14+40+palette), reads 8-bit palette-indexed and 24-bit
  // BGR, handles BOTH row orders (positive height = bottom-up, the
  // common case; negative = top-down), excludes row padding from the
  // statistics, bounds-checks every declared size, and verdicts
  // malformed bytes (decode_ok=0) instead of throwing.
  // ---------------------------------------------------------------------

  case class BmpFeatures(doc_id: Long, decode_ok: Int, width: Int,
                         height: Int, bits_per_pixel: Int, n_pixels: Int,
                         mean_px: Double, first_px: Int)

  private def le16(a: Array[Byte], o: Int, v: Int): Unit = {
    a(o) = (v & 0xff).toByte; a(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def le32(a: Array[Byte], o: Int, v: Int): Unit = {
    le16(a, o, v & 0xffff); le16(a, o + 2, (v >>> 16) & 0xffff)
  }

  /** Parse a BMP byte buffer. Returns (ok, width, height, bitsPerPixel,
    * nPixels, meanChannelByte, firstPx) where meanChannelByte averages
    * the pixel bytes only (row padding excluded; for 24-bit that is the
    * mean over all B,G,R bytes) and firstPx is the first stored channel
    * byte of IMAGE pixel (0,0) — the top-left pixel, which lives in the
    * LAST stored row of a bottom-up file (an order-sensitive feature:
    * a parser that ignored the row order would read the wrong byte).
    * NOT ok when: too short / wrong magic / compressed / non-8/24 bpp /
    * zero or negative width / zero height / any declared offset or size
    * past the buffer.
    */
  def parseBmp(bytes: Array[Byte]): (Boolean, Int, Int, Int, Int, Double, Int) = {
    val bad = (false, 0, 0, 0, 0, 0.0, 0)
    if (bytes == null || bytes.length < 54) return bad
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return bad
    val dataOff = u32(bytes, 10)
    val hdrSize = u32(bytes, 14)
    if (hdrSize < 40 || 14 + hdrSize > bytes.length) return bad
    val width = u32(bytes, 18).toInt // signed i32 via truncation
    val rawH = u32(bytes, 22).toInt
    val planes = u16(bytes, 26)
    val bpp = u16(bytes, 28)
    val compression = u32(bytes, 30)
    if (width <= 0 || rawH == 0 || planes != 1 || compression != 0L) return bad
    if (bpp != 8 && bpp != 24) return bad
    val topDown = rawH < 0
    // via Long: abs(Int.MinValue) overflows back to negative in Int —
    // a hostile height must verdict, not drive a negative array index
    val heightL = math.abs(rawH.toLong)
    if (heightL > Int.MaxValue) return bad
    val height = heightL.toInt
    val bytesPerPx = bpp / 8
    val rowBytesL = width.toLong * bytesPerPx
    val strideL = (rowBytesL + 3) & ~3L
    if (dataOff < 14 + hdrSize || dataOff > bytes.length) return bad
    // division form, not `dataOff + strideL * height > length`: with a
    // hostile width×height (both near 2^31, bpp=24) the product
    // overflows Long and the multiplied check PASSES — the pixel walk
    // would then throw instead of verdicting (height >= 1 here)
    if (strideL > (bytes.length - dataOff) / height) return bad
    val off = dataOff.toInt
    val stride = strideL.toInt // bounded by the buffer check above
    val rowBytes = rowBytesL.toInt
    var sum = 0.0
    var r = 0
    while (r < height) {
      val ro = off + r * stride
      var i = 0
      while (i < rowBytes) { sum += (bytes(ro + i) & 0xff); i += 1 }
      r += 1
    }
    val nPx = width * height
    val mean = sum / (nPx.toDouble * bytesPerPx)
    val row0 = if (topDown) 0 else height - 1
    val first = bytes(off + row0 * stride) & 0xff
    (true, width, height, bpp, nPx, mean, first)
  }

  /** Deterministic BMP fixture: 8-bit palette-indexed (256-entry
    * grayscale palette), width keyed off `docId`, the payload bytes
    * laid out row-major top-down as the LOGICAL image (zero-filled to
    * the last row), then STORED in the order the header declares —
    * bottom-up for even ids, top-down (negative height) for odd ids —
    * with a junk gap rotated in before the pixel array so the corpus
    * exercises the declared-data-offset contract, two row orders, and
    * the row-padding walk. Field-for-field what a real writer emits;
    * [[parseBmp]] accepts any conformant BI_RGB BMP, the fixture just
    * keeps the gate's features derivable in DuckDB.
    */
  def bmpFixture(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val w = 1 + (docId % 8).toInt
    val n = payload.length
    val h = math.max(1, (n + w - 1) / w)
    val topDown = docId % 2 == 1
    val gap = (docId % 3).toInt * 4
    val stride = (w + 3) & ~3
    val dataOff = 14 + 40 + 1024 + gap
    val out = new Array[Byte](dataOff + stride * h)
    out(0) = 'B'.toByte; out(1) = 'M'.toByte
    le32(out, 2, out.length)
    le32(out, 10, dataOff)
    le32(out, 14, 40)
    le32(out, 18, w)
    le32(out, 22, if (topDown) -h else h)
    le16(out, 26, 1) // planes
    le16(out, 28, 8) // bpp
    le32(out, 30, 0) // BI_RGB
    le32(out, 34, stride * h)
    le32(out, 38, 2835); le32(out, 42, 2835) // 72 dpi
    le32(out, 46, 256); le32(out, 50, 0)
    var i = 0
    while (i < 256) { // grayscale BGRA palette: index IS the intensity
      out(54 + i * 4) = i.toByte; out(54 + i * 4 + 1) = i.toByte
      out(54 + i * 4 + 2) = i.toByte
      i += 1
    }
    var r = 0
    while (r < h) {
      val storedRow = if (topDown) r else h - 1 - r
      var j = 0
      while (j < w) {
        val k = r * w + j
        if (k < n) out(dataOff + storedRow * stride + j) = payload(k)
        j += 1
      }
      r += 1
    }
    out
  }

  /** Synthesize the BMP-media frame for the decode gate: one fixture per
    * document, logical pixels = the UTF-8 payload bytes (null text ≡ a
    * valid all-zero w×1 image).
    */
  def asBmpMedia(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id"),
        coalesce(encode(col("text"), "UTF-8"), lit(Array.empty[Byte]))
          .as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, bmpFixture(id, p)) })
      .toDF("doc_id", "payload")
  }

  /** Decode BMP payloads into typed features — same batch shape and
    * never-throw verdicting as [[decodeWavFeatures]].
    */
  def decodeBmpFeatures(spark: SparkSession, media: DataFrame): Dataset[BmpFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"),
        coalesce(col("payload"), lit(Array.empty[Byte])).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (ok, w, h, bpp, n, mean, first) = parseBmp(bytes)
        BmpFeatures(id, if (ok) 1 else 0, w, h, bpp, n, mean, first)
      })
  }

  /** End-to-end BMP gate frame: synthesize → parse → features, halfUp
    * on the mean (the byte-ratio midpoint discipline, see [[pipeline]]).
    */
  def bmpPipeline(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeBmpFeatures(spark, asBmpMedia(spark, documents)).toDF()
      .select(col("doc_id"), col("decode_ok"), col("width"), col("height"),
        col("bits_per_pixel"), col("n_pixels"),
        graft.text.Text.halfUp(col("mean_px"), 4).as("mean_px"),
        col("first_px"))

  // ---------------------------------------------------------------------
  // Real decode path #3 (r14): PNG. Unlike WAV/BMP this is a COMPRESSED
  // container, but the compression is zlib/DEFLATE — public byte
  // arithmetic end to end via the JDK's Inflater, no codec library —
  // so the stub's mandate (stand in for real codec LIBRARIES:
  // JPEG/MP4/opus...) is untouched while the image family gains a
  // filtered+compressed real decoder. The parser walks the chunk
  // stream (length/type/data/crc), takes IHDR from the first chunk,
  // concatenates every IDAT, inflates, and REVERSES the per-row scanline
  // filters (None/Sub/Up/Average/Paeth — the part a wrong decoder gets
  // silently wrong, which the mean/first features then expose). 8-bit
  // grayscale (color type 0) and truecolor (2), non-interlaced.
  // Malformed bytes verdict (decode_ok=0), never throw; declared sizes
  // are Long-guarded and the inflated allocation is capped.
  // ---------------------------------------------------------------------

  case class PngFeatures(doc_id: Long, decode_ok: Int, width: Int,
                         height: Int, bit_depth: Int, color_type: Int,
                         n_pixels: Int, mean_px: Double, first_px: Int)

  private def u32be(a: Array[Byte], o: Int): Long =
    ((a(o) & 0xffL) << 24) | ((a(o + 1) & 0xffL) << 16) |
      ((a(o + 2) & 0xffL) << 8) | (a(o + 3) & 0xffL)
  private def be32(a: Array[Byte], o: Int, v: Long): Unit = {
    a(o) = ((v >>> 24) & 0xff).toByte; a(o + 1) = ((v >>> 16) & 0xff).toByte
    a(o + 2) = ((v >>> 8) & 0xff).toByte; a(o + 3) = (v & 0xff).toByte
  }
  private val pngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  // standard Paeth predictor (PNG spec §4.5.4 — exact tie order matters)
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }
  // inflated-size cap: a 4-byte IHDR can DECLARE a petabyte image; a
  // never-throw parser must bound what it allocates before inflating
  private val maxPngPixels = 64L << 20

  /** Parse a PNG byte buffer. Returns (ok, width, height, bitDepth,
    * colorType, nPixels, meanChannelByte, firstPx) where meanChannelByte
    * averages the UNFILTERED pixel bytes (all channels; filter bytes
    * excluded) and firstPx is the first channel byte of pixel (0,0) —
    * PNG rows are stored top-down, but under Sub/Up/Average/Paeth
    * filtering even byte 0 of the stream is not the pixel value until
    * the filters are reversed, so both features prove the unfilter walk.
    * NOT ok when: short / bad signature / first chunk not IHDR / zero
    * or ≥2^31 dimension / bit depth ≠ 8 / color type ∉ {0, 2} /
    * nonzero compression, filter method, or interlace / declared chunk
    * length past the buffer / no IDAT / zlib error / inflated stream
    * shorter than the scanlines / unknown per-row filter type / decoded
    * image past the allocation cap.
    */
  def parsePng(bytes: Array[Byte])
      : (Boolean, Int, Int, Int, Int, Int, Double, Int) = {
    val bad = (false, 0, 0, 0, 0, 0, 0.0, 0)
    if (bytes == null || bytes.length < 8 + 25) return bad
    var i = 0
    while (i < 8) { if (bytes(i) != pngSig(i)) return bad; i += 1 }
    var off = 8
    var w = 0L; var h = 0L; var bitDepth = -1; var colorType = -1
    var sawIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!sawIend && off + 8 <= bytes.length) {
      val len = u32be(bytes, off)
      // chunk length is u31 by spec; a length past the buffer is hostile
      if (len > Int.MaxValue || off + 12 + len > bytes.length) return bad
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      val dataOff = off + 8
      if (!sawIhdr) {
        if (typ != "IHDR" || len != 13) return bad
        w = u32be(bytes, dataOff); h = u32be(bytes, dataOff + 4)
        bitDepth = bytes(dataOff + 8) & 0xff
        colorType = bytes(dataOff + 9) & 0xff
        val compression = bytes(dataOff + 10) & 0xff
        val filterMethod = bytes(dataOff + 11) & 0xff
        val interlace = bytes(dataOff + 12) & 0xff
        if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue)
          return bad
        if (bitDepth != 8 || (colorType != 0 && colorType != 2)) return bad
        if (compression != 0 || filterMethod != 0 || interlace != 0)
          return bad
        sawIhdr = true
      } else typ match {
        case "IDAT" => idat.write(bytes, dataOff, len.toInt)
        case "IEND" => sawIend = true
        case _ => () // ancillary chunks (tEXt, pHYs, ...) are skipped
      }
      off = dataOff + len.toInt + 4 // skip data + crc (tolerant reader)
    }
    if (!sawIhdr || !sawIend || idat.size() == 0) return bad
    val ch = if (colorType == 2) 3 else 1
    if (w * h > maxPngPixels / ch) return bad
    val rowBytes = (w * ch).toInt
    val expected = (rowBytes + 1).toLong * h
    val recon = new Array[Byte](expected.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var got = 0
      var n = -1
      while (got < recon.length && n != 0 && !inf.finished()) {
        n = inf.inflate(recon, got, recon.length - got)
        got += n
      }
      if (got < recon.length) return bad
    } catch {
      case _: java.util.zip.DataFormatException => return bad
    } finally inf.end()
    // reverse the scanline filters IN PLACE (recon holds filtered rows
    // prefixed by their filter byte; the reconstructed bytes replace
    // the filtered ones so Up/Average/Paeth read the prior RECON row)
    val height = h.toInt
    var sum = 0.0
    var r = 0
    while (r < height) {
      val ro = r * (rowBytes + 1)
      val f = recon(ro) & 0xff
      if (f > 4) return bad
      var j = 0
      while (j < rowBytes) {
        val x = recon(ro + 1 + j) & 0xff
        val left = if (j >= ch) recon(ro + 1 + j - ch) & 0xff else 0
        val above = if (r > 0) recon(ro - rowBytes + j) & 0xff else 0
        val ul =
          if (r > 0 && j >= ch) recon(ro - rowBytes + j - ch) & 0xff else 0
        val v = f match {
          case 0 => x
          case 1 => (x + left) & 0xff
          case 2 => (x + above) & 0xff
          case 3 => (x + ((left + above) >> 1)) & 0xff
          case 4 => (x + paeth(left, above, ul)) & 0xff
        }
        recon(ro + 1 + j) = v.toByte
        sum += v
        j += 1
      }
      r += 1
    }
    val nPx = (w * h).toInt
    (true, w.toInt, height, bitDepth, colorType, nPx,
      sum / (nPx.toDouble * ch), recon(1) & 0xff)
  }

  /** Deterministic PNG fixture: 8-bit grayscale, width keyed off
    * `docId`, logical pixels = the payload bytes row-major top-down
    * (zero-filled to the last row) — the SAME logical image as
    * [[bmpFixture]]'s, so the two image gates share one oracle shape.
    * Every row is encoded with scanline filter `docId % 5`, rotating
    * the corpus through None/Sub/Up/Average/Paeth so the parser's
    * unfilter arithmetic (not just its chunk walk) is what the oracle
    * verifies; a tEXt ancillary chunk rides between IHDR and IDAT so
    * the skip path is exercised too. Chunks carry real CRCs (the file
    * is conformant — any PNG reader opens it); the parser does not
    * require them.
    */
  def pngFixture(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val w = 1 + (docId % 8).toInt
    val n = payload.length
    val h = math.max(1, (n + w - 1) / w)
    val f = (docId % 5).toInt
    // logical image, zero-padded
    val px = new Array[Int](w * h)
    var k = 0
    while (k < n) { px(k) = payload(k) & 0xff; k += 1 }
    // filtered scanlines (filter f applied per the spec, mod 256)
    val raw = new Array[Byte](h * (w + 1))
    var r = 0
    while (r < h) {
      raw(r * (w + 1)) = f.toByte
      var j = 0
      while (j < w) {
        val x = px(r * w + j)
        val left = if (j > 0) px(r * w + j - 1) else 0
        val above = if (r > 0) px((r - 1) * w + j) else 0
        val ul = if (r > 0 && j > 0) px((r - 1) * w + j - 1) else 0
        val enc = f match {
          case 0 => x
          case 1 => (x - left) & 0xff
          case 2 => (x - above) & 0xff
          case 3 => (x - ((left + above) >> 1)) & 0xff
          case 4 => (x - paeth(left, above, ul)) & 0xff
        }
        raw(r * (w + 1) + 1 + j) = enc.toByte
        j += 1
      }
      r += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!deflater.finished()) zbuf.write(tmp, 0, deflater.deflate(tmp))
    deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + data.length)
      be32(out, 0, data.length.toLong)
      typ.getBytes("US-ASCII").copyToArray(out, 4)
      data.copyToArray(out, 8)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 4, 4 + data.length)
      be32(out, 8 + data.length, crc.getValue)
      out
    }
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, w.toLong); be32(ihdr, 4, h.toLong)
    ihdr(8) = 8; ihdr(9) = 0; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    pngSig ++ chunk("IHDR", ihdr) ++
      chunk("tEXt", s"Comment graft fixture $docId".getBytes("US-ASCII")) ++
      chunk("IDAT", zbuf.toByteArray) ++ chunk("IEND", Array.empty)
  }

  /** Synthesize the PNG-media frame for the decode gate (the
    * [[asBmpMedia]] twin — same logical pixels, compressed container).
    */
  def asPngMedia(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id"),
        coalesce(encode(col("text"), "UTF-8"), lit(Array.empty[Byte]))
          .as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, pngFixture(id, p)) })
      .toDF("doc_id", "payload")
  }

  /** Decode PNG payloads into typed features — same batch shape and
    * never-throw verdicting as [[decodeBmpFeatures]].
    */
  def decodePngFeatures(spark: SparkSession, media: DataFrame): Dataset[PngFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"),
        coalesce(col("payload"), lit(Array.empty[Byte])).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (ok, w, h, bd, ct, n, mean, first) = parsePng(bytes)
        PngFeatures(id, if (ok) 1 else 0, w, h, bd, ct, n, mean, first)
      })
  }

  /** End-to-end PNG gate frame: synthesize → inflate+unfilter → features,
    * halfUp on the mean (the byte-ratio midpoint discipline).
    */
  def pngPipeline(spark: SparkSession, documents: DataFrame): DataFrame =
    decodePngFeatures(spark, asPngMedia(spark, documents)).toDF()
      .select(col("doc_id"), col("decode_ok"), col("width"), col("height"),
        col("bit_depth"), col("color_type"), col("n_pixels"),
        graft.text.Text.halfUp(col("mean_px"), 4).as("mean_px"),
        col("first_px"))

  /** End-to-end: documents → media payloads → decoded feature frame.
    * mean_byte uses the corpus-wide halfUp discipline (not `round`):
    * byte-sum/length ratios genuinely land on exact .00005 midpoints
    * (e.g. n=64, sum≡2 mod 4), where Spark's HALF_UP and DuckDB's
    * half-even `round` disagree — halfUp is identical in both engines,
    * which is what lets this stub pipeline be oracle-gated at all.
    */
  def pipeline(spark: SparkSession, documents: DataFrame): DataFrame = {
    val feats = decodeFeatures(spark, asMedia(documents))
    feats.toDF()
      .select(col("doc_id"), col("mime"), col("payload_len"),
        col("frame_count"),
        graft.text.Text.halfUp(element_at(col("features"), 1), 4)
          .as("mean_byte"),
        element_at(col("features"), 3).cast("int").as("first_byte"),
        element_at(col("features"), 4).cast("int").as("last_byte"))
  }

  // ---------------------------------------------------------------------
  // Real decode path #4 (r15): GIF. The third compression algorithm in
  // the family — WAV is raw PCM, BMP raw pixels, PNG zlib/DEFLATE (via
  // the JDK); GIF's LZW has NO JDK implementation, so both the variable-
  // code-width LSB-first LZW codec and the 4-pass interlace walk below
  // are implemented from the public GIF89a specification (CompuServe
  // 1990, appendix F) — still squarely inside the stub contract's
  // "public byte arithmetic" line (the mandated STUB keeps standing in
  // for real codec LIBRARIES: JPEG/MP4/opus). The parser walks the
  // block stream (extensions skipped by their sub-block framing), reads
  // the first image descriptor, concatenates its data sub-blocks,
  // LZW-decodes (clear/end codes, code-width growth at dict fill,
  // KwKwK, 4096-entry reset), de-interlaces when flagged, and features
  // the decoded INDEX raster (palette application is a lookup the
  // caller owns; the fixture's global palette maps index→intensity so
  // the oracle stays payload-derivable). Malformed bytes verdict
  // (decode_ok=0), never throw; allocations capped like PNG.
  // ---------------------------------------------------------------------

  case class GifFeatures(doc_id: Long, decode_ok: Int, width: Int,
                         height: Int, n_pixels: Int, mean_px: Double,
                         first_px: Int, interlaced: Int, n_ext: Int)

  /** GIF interlace pass structure (GIF89a appendix E): logical row
    * indices in STORED order — pass 1 every 8th from 0, pass 2 every
    * 8th from 4, pass 3 every 4th from 2, pass 4 every 2nd from 1.
    */
  private[graft] def interlaceOrder(h: Int): Array[Int] = {
    val out = new Array[Int](h)
    var i = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var r = start
      while (r < h) { out(i) = r; i += 1; r += step }
    }
    out
  }

  /** GIF-variant LZW encode of an index raster: variable code width
    * starting at minCodeSize+1, clear code emitted first and on dict
    * overflow at 4096, end code last, codes packed LSB-first.
    */
  private[graft] def lzwEncode(indices: Array[Byte],
                                    minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // (prefixCode << 8 | nextByte) -> code
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = end + 1
    def reset(): Unit = {
      dict = new java.util.HashMap[Integer, Integer]()
      next = end + 1; codeSize = minCodeSize + 1
    }
    emit(clear)
    if (indices.nonEmpty) {
      var cur = indices(0) & 0xff
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xff
        val key = Integer.valueOf((cur << 8) | k)
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          emit(cur)
          dict.put(key, Integer.valueOf(next))
          next += 1
          // decoder grows its width when ITS next-free reaches
          // 1<<codeSize — mirror that exactly, capped at 12 bits
          if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          if (next >= 4096) { emit(clear); reset() }
          cur = k
        }
        i += 1
      }
      emit(cur)
    }
    emit(end)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decode. Returns null on any malformation (bad
    * code, truncated stream, output past `maxOut`).
    */
  private[graft] def lzwDecode(data: Array[Byte], minCodeSize: Int,
                                    maxOut: Int): Array[Byte] = {
    if (minCodeSize < 2 || minCodeSize > 8) return null
    val clear = 1 << minCodeSize
    val end = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val out = new java.io.ByteArrayOutputStream()
    var codeSize = minCodeSize + 1
    var next = end + 1
    var prev = -1
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    val stack = new Array[Byte](4096)
    // push `code`'s sequence to the output, return its FIRST byte
    def expand(code: Int): Int = {
      var c = code; var sp = 0
      while (c >= clear) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      out.write(c)
      while (sp > 0) { sp -= 1; out.write(stack(sp) & 0xff) }
      c
    }
    while (true) {
      while (bitCnt < codeSize) {
        if (pos >= data.length) return null // no end code seen
        bitBuf |= (data(pos) & 0xffL) << bitCnt; bitCnt += 8; pos += 1
      }
      val code = (bitBuf & ((1L << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; bitCnt -= codeSize
      if (code == clear) {
        next = end + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == end) {
        return out.toByteArray
      } else if (prev < 0) { // first code after clear must be a root
        if (code >= clear) return null
        out.write(code); prev = code
        if (out.size > maxOut) return null
      } else {
        if (code > next) return null
        val first =
          if (code == next) { // KwKwK: sequence = seq(prev) + first(prev)
            val f = expand(prev); out.write(f); f
          } else expand(code)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first.toByte
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
        if (out.size > maxOut) return null
      }
    }
    null // unreachable
  }

  /** Deterministic GIF fixture: GIF89a, 8-bit global grayscale palette
    * (index IS the intensity, like [[bmpFixture]]'s), width keyed off
    * `docId`, logical pixels = the payload bytes row-major top-down
    * (zero-filled to the last row) — the SAME logical image as the
    * BMP/PNG fixtures, so all three image gates share one oracle shape.
    * Rotations: every 4th doc is INTERLACED (rows stored in the 4-pass
    * order — the de-interlace walk is what its oracle row proves);
    * every even doc carries a Graphics Control Extension and every 3rd
    * a Comment Extension, so the extension skip path is exercised. The
    * pixel stream is REAL LZW ([[lzwEncode]]) packaged in ≤255-byte
    * sub-blocks — any GIF reader opens the file.
    */
  def gifFixture(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val w = 1 + (docId % 8).toInt
    val n = payload.length
    val h = math.max(1, (n + w - 1) / w)
    val interlaced = docId % 4 == 3
    val px = new Array[Byte](w * h)
    System.arraycopy(payload, 0, px, 0, n)
    // stored raster: logical rows reordered by the interlace passes
    val stored =
      if (!interlaced) px
      else {
        val o = new Array[Byte](w * h)
        val order = interlaceOrder(h)
        var i = 0
        while (i < h) {
          System.arraycopy(px, order(i) * w, o, i * w, w)
          i += 1
        }
        o
      }
    val lzw = lzwEncode(stored, 8)
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    le16(w); le16(h)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    if (docId % 2 == 0) { // Graphics Control Extension
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0); le16(0); out.write(0); out.write(0)
    }
    if (docId % 3 == 0) { // Comment Extension
      val c = s"graft fixture $docId".getBytes("US-ASCII")
      out.write(0x21); out.write(0xfe); out.write(c.length)
      out.write(c); out.write(0)
    }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(if (interlaced) 0x40 else 0x00)
    out.write(8) // LZW minimum code size
    var off = 0
    while (off < lzw.length) {
      val len = math.min(255, lzw.length - off)
      out.write(len); out.write(lzw, off, len)
      off += len
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Parse a GIF byte buffer. Returns (ok, width, height, nPixels,
    * meanIndexByte, firstPx, interlaced, nExtensions) over the FIRST
    * image's decoded index raster (logical order — de-interlaced when
    * the descriptor flags it). NOT ok when: short / bad signature /
    * truncated descriptor chain / unknown block type / LZW error /
    * decoded raster shorter than width×height / dimensions past the
    * allocation cap. Never throws.
    */
  def parseGif(bytes: Array[Byte]): (Boolean, Int, Int, Int, Double, Int, Int, Int) = {
    val bad = (false, 0, 0, 0, 0.0, 0, 0, 0)
    if (bytes.length < 13) return bad
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return bad
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    val flags = bytes(10) & 0xff
    var p = 13
    if ((flags & 0x80) != 0) p += 3 * (1 << ((flags & 7) + 1)) // skip GCT
    var nExt = 0
    while (true) {
      if (p >= bytes.length) return bad
      (bytes(p) & 0xff) match {
        case 0x21 => // extension: label byte + sub-block chain
          nExt += 1
          p += 2
          var done = false
          while (!done) {
            if (p >= bytes.length) return bad
            val len = bytes(p) & 0xff
            p += 1 + len
            if (len == 0) done = true
          }
        case 0x2c => // image descriptor
          if (p + 10 > bytes.length) return bad
          val iw = u16(p + 5); val ih = u16(p + 7)
          val iflags = bytes(p + 9) & 0xff
          val interlaced = (iflags & 0x40) != 0
          p += 10
          if ((iflags & 0x80) != 0) p += 3 * (1 << ((iflags & 7) + 1))
          if (iw <= 0 || ih <= 0 || iw.toLong * ih > maxPngPixels) return bad
          if (p >= bytes.length) return bad
          val minCode = bytes(p) & 0xff
          p += 1
          val data = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (p >= bytes.length) return bad
            val len = bytes(p) & 0xff
            p += 1
            if (len == 0) done = true
            else {
              if (p + len > bytes.length) return bad
              data.write(bytes, p, len); p += len
            }
          }
          val stored = lzwDecode(data.toByteArray, minCode, iw * ih)
          if (stored == null || stored.length < iw * ih) return bad
          val raster =
            if (!interlaced) stored
            else {
              val o = new Array[Byte](iw * ih)
              val order = interlaceOrder(ih)
              var i = 0
              while (i < ih) {
                System.arraycopy(stored, i * iw, o, order(i) * iw, iw)
                i += 1
              }
              o
            }
          var sum = 0L; var i = 0
          val nPx = iw * ih
          while (i < nPx) { sum += raster(i) & 0xff; i += 1 }
          return (true, iw, ih, nPx, sum / nPx.toDouble,
            raster(0) & 0xff, if (interlaced) 1 else 0, nExt)
        case 0x3b => return bad // trailer before any image
        case _ => return bad
      }
    }
    bad // unreachable
  }

  /** Synthesize the GIF-media frame for the decode gate (the
    * [[asBmpMedia]]/[[asPngMedia]] twin — same logical pixels,
    * LZW-compressed container).
    */
  def asGifMedia(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id"),
        coalesce(encode(col("text"), "UTF-8"), lit(Array.empty[Byte]))
          .as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, gifFixture(id, p)) })
      .toDF("doc_id", "payload")
  }

  /** Decode GIF payloads into typed features — same batch shape and
    * never-throw verdicting as the other decode paths.
    */
  def decodeGifFeatures(spark: SparkSession, media: DataFrame): Dataset[GifFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"),
        coalesce(col("payload"), lit(Array.empty[Byte])).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (ok, w, h, n, mean, first, il, ext) = parseGif(bytes)
        GifFeatures(id, if (ok) 1 else 0, w, h, n, mean, first, il, ext)
      })
  }

  /** End-to-end GIF gate frame: synthesize → LZW-decode (+de-interlace)
    * → features, halfUp on the mean (the byte-ratio midpoint
    * discipline).
    */
  def gifPipeline(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeGifFeatures(spark, asGifMedia(spark, documents)).toDF()
      .select(col("doc_id"), col("decode_ok"), col("width"), col("height"),
        col("n_pixels"),
        graft.text.Text.halfUp(col("mean_px"), 4).as("mean_px"),
        col("first_px"), col("interlaced"), col("n_ext"))

  // ---------------------------------------------------------------------
  // Real TRANSFORM path (r15): audio resample. The decode family reads
  // containers; a pipeline also has to TRANSFORM what it decoded (the
  // stub contract's named verbs: decode / feature-extract / RESIZE /
  // frame-sample — this is the audio resize). 2:1 decimation with a
  // 2-tap mean anti-alias filter, entirely in INTEGER arithmetic
  // (floor((s0+s1)/2) per output sample), so the resampled signal —
  // not just its summary — is engine-exact and the oracle replays it
  // as byte arithmetic. Odd tail sample drops (decimation convention).
  // ---------------------------------------------------------------------

  case class ResampleFeatures(doc_id: Long, decode_ok: Int, rate_in: Int,
                              rate_out: Int, n_in: Int, n_out: Int,
                              mean_out: Double, first_out: Int)

  /** Parse an 8-bit mono PCM WAV and decimate 2:1 with the 2-tap mean.
    * Returns (ok, rateIn, rateOut, nIn, nOut, meanOut, firstOut); NOT
    * ok on anything [[parseWav]] rejects, or non-8-bit / non-mono input
    * (the integer filter is defined on unsigned bytes; a 16-bit or
    * multichannel resample is a per-channel loop a deployment adds
    * without touching the walk). Never throws.
    */
  def resampleWav2x(bytes: Array[Byte]): (Boolean, Int, Int, Int, Int, Double, Int) = {
    val bad = (false, 0, 0, 0, 0, 0.0, 0)
    if (bytes == null || bytes.length < 12) return bad
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return bad
    var off = 12
    var fmtOk = false
    var audioFormat = 0; var channels = 0; var sampleRate = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = tag(bytes, off)
      val size = u32(bytes, off + 4)
      if (size > Int.MaxValue || off + 8 + size > bytes.length) return bad
      val sz = size.toInt
      if (id == "fmt " && sz >= 16) {
        audioFormat = u16(bytes, off + 8)
        channels = u16(bytes, off + 10)
        sampleRate = u32(bytes, off + 12).toInt
        bits = u16(bytes, off + 22)
        fmtOk = true
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1)
    }
    if (!fmtOk || dataOff < 0 || audioFormat != 1 || channels != 1 ||
        bits != 8 || sampleRate <= 0) return bad
    val nOut = dataLen / 2
    var sum = 0L
    var first = 0
    var i = 0
    while (i < nOut) {
      val v = ((bytes(dataOff + 2 * i) & 0xff) +
        (bytes(dataOff + 2 * i + 1) & 0xff)) / 2
      if (i == 0) first = v
      sum += v
      i += 1
    }
    val mean = if (nOut == 0) 0.0 else sum.toDouble / nOut
    (true, sampleRate, sampleRate / 2, dataLen, nOut, mean, first)
  }

  /** End-to-end resample gate frame: synthesize the WAV fixture →
    * container walk + integer decimation → features (halfUp mean).
    */
  def resamplePipeline(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    asWavMedia(spark, documents)
      .select(col("doc_id"),
        coalesce(col("payload"), lit(Array.empty[Byte])).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (ok, ri, ro, ni, no, mean, first) = resampleWav2x(bytes)
        ResampleFeatures(id, if (ok) 1 else 0, ri, ro, ni, no, mean, first)
      })
      .toDF()
      .select(col("doc_id"), col("decode_ok"), col("rate_in"),
        col("rate_out"), col("n_in"), col("n_out"),
        graft.text.Text.halfUp(col("mean_out"), 4).as("mean_out"),
        col("first_out"))
  }

  case class ResizeFeatures(doc_id: Long, decode_ok: Int, w_in: Int,
                            h_in: Int, w_out: Int, h_out: Int, n_out: Int,
                            mean_out: Double, first_out: Int)

  /** Parse an 8-bit BMP and downsample 2× with a 2×2 box-mean filter —
    * the IMAGE twin of [[resampleWav2x]] (the stub contract's "image
    * resize", made real over the decode family's own container).
    * Returns (ok, wIn, hIn, wOut, hOut, nOut, meanOut, firstOut);
    * out(r,c) = ⌊(p(2r,2c)+p(2r,2c+1)+p(2r+1,2c)+p(2r+1,2c+1))/4⌋ over
    * the LOGICAL (row-order-recovered) image, odd tail row/column
    * dropped — all integer arithmetic, so the resized grid itself is
    * engine-exact, and `first_out` (the top-left output pixel) stays
    * order-sensitive exactly like [[parseBmp]]'s first_px. NOT ok on
    * anything parseBmp rejects or 24-bit input (a channel loop a
    * deployment adds without touching the walk — the resampleWav2x
    * mono restriction applied to images). Never throws.
    */
  def resizeBmp2x(bytes: Array[Byte]): (Boolean, Int, Int, Int, Int, Int, Double, Int) = {
    val bad = (false, 0, 0, 0, 0, 0, 0.0, 0)
    if (bytes == null || bytes.length < 54) return bad
    if (bytes(0) != 'B'.toByte || bytes(1) != 'M'.toByte) return bad
    val dataOff = u32(bytes, 10)
    val hdrSize = u32(bytes, 14)
    if (hdrSize < 40 || 14 + hdrSize > bytes.length) return bad
    val width = u32(bytes, 18).toInt
    val rawH = u32(bytes, 22).toInt
    val planes = u16(bytes, 26)
    val bpp = u16(bytes, 28)
    val compression = u32(bytes, 30)
    if (width <= 0 || rawH == 0 || planes != 1 || compression != 0L) return bad
    if (bpp != 8) return bad // the integer box filter's single-channel lane
    val topDown = rawH < 0
    val heightL = math.abs(rawH.toLong)
    if (heightL > Int.MaxValue) return bad
    val height = heightL.toInt
    val strideL = (width.toLong + 3) & ~3L
    if (dataOff < 14 + hdrSize || dataOff > bytes.length) return bad
    if (strideL > (bytes.length - dataOff) / height) return bad
    val off = dataOff.toInt
    val stride = strideL.toInt
    def px(r: Int, c: Int): Int = {
      val stored = if (topDown) r else height - 1 - r
      bytes(off + stored * stride + c) & 0xff
    }
    val wo = width / 2
    val ho = height / 2
    var sum = 0L
    var first = 0
    var r = 0
    while (r < ho) {
      var c = 0
      while (c < wo) {
        val v = (px(2 * r, 2 * c) + px(2 * r, 2 * c + 1) +
          px(2 * r + 1, 2 * c) + px(2 * r + 1, 2 * c + 1)) / 4
        if (r == 0 && c == 0) first = v
        sum += v
        c += 1
      }
      r += 1
    }
    val nOut = wo * ho
    val mean = if (nOut == 0) 0.0 else sum.toDouble / nOut
    (true, width, height, wo, ho, nOut, mean, first)
  }

  /** End-to-end image-resize gate frame: BMP fixture → header-driven
    * walk + 2×2 integer box downsample → features (halfUp mean).
    */
  def resizeBmpPipeline(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    asBmpMedia(spark, documents)
      .select(col("doc_id"),
        coalesce(col("payload"), lit(Array.empty[Byte])).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (ok, wi, hi, wo, ho, n, mean, first) = resizeBmp2x(bytes)
        ResizeFeatures(id, if (ok) 1 else 0, wi, hi, wo, ho, n, mean, first)
      })
      .toDF()
      .select(col("doc_id"), col("decode_ok"), col("w_in"), col("h_in"),
        col("w_out"), col("h_out"), col("n_out"),
        graft.text.Text.halfUp(col("mean_out"), 4).as("mean_out"),
        col("first_out"))
  }

  // ---------------------------------------------------------------------
  // Real FRAME-SAMPLE path (r15): AVI. The video verb of the stub
  // contract gets a real CONTAINER: RIFF 'AVI ' with the standard
  // hdrl/avih header (frame count, dimensions), a movi LIST of per-
  // frame chunks, and an idx1 index — the parser walks the nested
  // LIST grammar, reads avih, iterates the movi frames, and samples
  // every frame's bytes. The FRAME PAYLOAD stays opaque (that is the
  // codec boundary the stub mandates — a deployment hands each chunk
  // to its decoder); the container walk, frame count/offsets, and
  // per-frame byte features are real.
  // ---------------------------------------------------------------------

  case class AviFeatures(doc_id: Long, decode_ok: Int, width: Int,
                         height: Int, n_frames_declared: Int,
                         n_frames_found: Int, first_frame_sum: Long,
                         total_bytes: Long)

  /** Frame size of the AVI fixture: payload bytes per '00dc' chunk. */
  val AviFrameBytes = 16

  /** Deterministic AVI fixture: RIFF('AVI ') { LIST(hdrl){avih},
    * LIST(movi){'00dc' × n}, idx1 } — the payload split into 16-byte
    * frames (≥1; the last zero-padded), width/height keyed off docId,
    * a JUNK chunk rotated before/after movi so the walk is exercised.
    */
  def aviFixture(docId: Long, payload: Array[Byte]): Array[Byte] = {
    val w = 16 * (1 + (docId % 4).toInt)
    val h = 8 * (1 + (docId % 3).toInt)
    val nFrames = math.max(1, (payload.length + AviFrameBytes - 1) / AviFrameBytes)
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def fourcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    // avih payload: 14 dwords (56 bytes)
    val avih = new java.io.ByteArrayOutputStream()
    def a32(v: Int): Unit = {
      avih.write(v & 0xff); avih.write((v >> 8) & 0xff)
      avih.write((v >> 16) & 0xff); avih.write((v >>> 24) & 0xff)
    }
    a32(33333) // µs per frame (30fps)
    a32(0); a32(0); a32(0x10) // maxBytesPerSec, padding, flags HASINDEX
    a32(nFrames); a32(0); a32(1) // totalFrames, initialFrames, streams
    a32(AviFrameBytes) // suggested buffer
    a32(w); a32(h); a32(0); a32(0); a32(0); a32(0)
    val hdrlLen = 4 + 8 + avih.size // 'hdrl' + avih chunk
    val frames = (0 until nFrames).map { i =>
      val f = new Array[Byte](AviFrameBytes)
      val lo = i * AviFrameBytes
      val n = math.min(AviFrameBytes, math.max(0, payload.length - lo))
      if (n > 0) System.arraycopy(payload, lo, f, 0, n)
      f
    }
    val junkLen = (docId % 5).toInt * 4
    val moviLen = 4 + frames.map(8 + _.length).sum
    val idxLen = nFrames * 16
    val junkTotal = 8 + junkLen
    val riffBody = 4 + (8 + hdrlLen) + junkTotal + (8 + moviLen) + (8 + idxLen)
    fourcc("RIFF"); le32(riffBody); fourcc("AVI ")
    fourcc("LIST"); le32(hdrlLen); fourcc("hdrl")
    fourcc("avih"); le32(avih.size); out.write(avih.toByteArray)
    fourcc("JUNK"); le32(junkLen)
    (0 until junkLen).foreach(_ => out.write('x'))
    fourcc("LIST"); le32(moviLen); fourcc("movi")
    frames.foreach { f => fourcc("00dc"); le32(f.length); out.write(f) }
    fourcc("idx1"); le32(idxLen)
    var off = 4 // idx1 offsets are movi-relative
    frames.foreach { f =>
      fourcc("00dc"); le32(0x10) // AVIIF_KEYFRAME
      le32(off); le32(f.length); off += 8 + f.length
    }
    out.toByteArray
  }

  /** Parse an AVI byte buffer: walk the RIFF/LIST grammar, read avih,
    * count + byte-sample the movi frames. Returns (ok, width, height,
    * declaredFrames, foundFrames, firstFrameByteSum, totalFrameBytes).
    * NOT ok when: short / wrong magics / truncated chunk / no avih /
    * no movi. Unknown chunks (JUNK, idx1, strl, …) skip by size —
    * never throws.
    */
  def parseAvi(bytes: Array[Byte]): (Boolean, Int, Int, Int, Int, Long, Long) = {
    val bad = (false, 0, 0, 0, 0, 0L, 0L)
    if (bytes == null || bytes.length < 12) return bad
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "AVI ") return bad
    var w = 0; var h = 0; var declared = -1
    var found = 0; var firstSum = 0L; var total = 0L
    var sawMovi = false
    def walk(lo: Int, hi: Int): Boolean = { // false = malformed
      var off = lo
      while (off + 8 <= hi) {
        val id = tag(bytes, off)
        val size = u32(bytes, off + 4)
        if (size > Int.MaxValue || off + 8 + size > hi) return false
        val sz = size.toInt
        if (id == "LIST" && sz >= 4) {
          val kind = tag(bytes, off + 8)
          if (kind == "movi") {
            sawMovi = true
            // frame chunks: '##dc'/'##db' compressed/uncompressed video
            var f = off + 12
            while (f + 8 <= off + 8 + sz) {
              val fid = tag(bytes, f)
              val fsz = u32(bytes, f + 4)
              if (fsz > Int.MaxValue || f + 8 + fsz > off + 8 + sz)
                return false
              if (fid.endsWith("dc") || fid.endsWith("db")) {
                var s = 0L
                var j = 0
                while (j < fsz.toInt) { s += bytes(f + 8 + j) & 0xff; j += 1 }
                if (found == 0) firstSum = s
                found += 1; total += fsz
              }
              f += 8 + fsz.toInt + (fsz.toInt & 1)
            }
          } else if (!walk(off + 12, off + 8 + sz)) return false
        } else if (id == "avih" && sz >= 56) {
          declared = u32(bytes, off + 8 + 16).toInt
          w = u32(bytes, off + 8 + 32).toInt
          h = u32(bytes, off + 8 + 36).toInt
        }
        off += 8 + sz + (sz & 1)
      }
      true
    }
    if (!walk(12, bytes.length) || declared < 0 || !sawMovi) return bad
    (true, w, h, declared, found, firstSum, total)
  }

  /** End-to-end AVI gate frame: synthesize → container walk + frame
    * sample → features.
    */
  def aviPipeline(spark: SparkSession, documents: DataFrame): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id"),
        coalesce(encode(col("text"), "UTF-8"), lit(Array.empty[Byte]))
          .as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) =>
        val (ok, w, h, dec, fnd, fs, tb) = parseAvi(aviFixture(id, p))
        AviFeatures(id, if (ok) 1 else 0, w, h, dec, fnd, fs, tb)
      })
      .toDF()
      .select(col("doc_id"), col("decode_ok"), col("width"), col("height"),
        col("n_frames_declared"), col("n_frames_found"),
        col("first_frame_sum"), col("total_bytes"))
  }
}
