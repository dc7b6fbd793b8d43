package graft.sources

import java.io.{InputStream, OutputStream}

import com.github.luben.zstd.{ZstdInputStream, ZstdOutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream, CompressionOutputStream, Compressor, Decompressor}

/** Hadoop codec for `.zst` files backed by zstd-jni's STREAM API — no
  * native-Hadoop library required (Hadoop's own ZStandardCodec needs
  * libhadoop+libzstd, absent on plain JVMs; zstd-jni ships on Spark's
  * classpath because Spark itself uses it for shuffle/event-log
  * compression). Registering this codec makes every text-based source
  * and sink (json/csv/text) read and write `.jsonl.zst`-style corpus
  * shards by extension — the de-facto interchange format of large crawl
  * corpora.
  *
  * NOT splittable (like gzip): one task per file, so the 100 TB layout
  * contract is many bounded shards (the standard crawl-dump shape —
  * thousands of ~100 MB-1 GB files), never one giant file. Parallelism
  * = file count; [[Sources.readJsonl]] documents the contract.
  *
  * The Compressor/Decompressor pool API is bypassed (streams carry the
  * whole state): `create*` return null and the two-arg stream factories
  * ignore the pooled argument — the same shape Hadoop's own
  * stream-backed codecs use when no pooled kernel exists.
  */
class ZstdCodec extends CompressionCodec {

  override def createOutputStream(sink: OutputStream): CompressionOutputStream =
    new CompressionOutputStream(sink) {
      // named `sink`, not `out`: the anonymous class inherits a field
      // `out` from CompressionOutputStream that would shadow the
      // parameter ambiguously (scala 2.13 legacy-binding warning)
      private val z = new ZstdOutputStream(sink)
      z.setCloseFrameOnFlush(true)
      private var finished = false
      private var closed = false
      override def write(b: Int): Unit = z.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        z.write(b, off, len)
      // finish() must complete the compressed frame WITHOUT closing the
      // underlying stream (the Hadoop contract); closeFrameOnFlush makes
      // flush() end the zstd frame. close() must NOT chain to
      // super.close() — the base class would call finish() again after
      // the zstd stream is closed (StreamClosed); z.close() already
      // finalizes the frame and closes `out`.
      override def finish(): Unit =
        if (!finished && !closed) { z.flush(); finished = true }
      override def resetState(): Unit = ()
      override def close(): Unit =
        if (!closed) { closed = true; z.close() }
    }

  override def createOutputStream(out: OutputStream,
                                  c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createInputStream(source: InputStream): CompressionInputStream =
    new CompressionInputStream(source) {
      private val z = new ZstdInputStream(source)
      private var closed = false
      override def read(): Int = z.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int =
        z.read(b, off, len)
      override def available(): Int = z.available()
      override def resetState(): Unit = ()
      override def close(): Unit =
        if (!closed) { closed = true; z.close() } // closes `in` too
    }

  override def createInputStream(in: InputStream,
                                 d: Decompressor): CompressionInputStream =
    createInputStream(in)

  override def getCompressorType: Class[_ <: Compressor] = null
  override def createCompressor(): Compressor = null
  override def getDecompressorType: Class[_ <: Decompressor] = null
  override def createDecompressor(): Decompressor = null
  override def getDefaultExtension: String = ".zst"
}

object ZstdCodec {
  /** Register the codec for a session. Hadoop 3.x's
    * `CompressionCodecFactory.getCodecClasses` always PREPENDS the
    * ServiceLoader-discovered codecs (including Hadoop's own
    * native-lib-requiring `ZStandardCodec`) and APPENDS the
    * `io.compression.codecs` conf list — setting the key never removes
    * the discovered ones. The extension map is built in that order, so
    * conf-listed codecs are inserted LAST and therefore WIN the `.zst`
    * extension: after register(), `.zst` resolves to THIS codec, not
    * the native-lib one. That ordering is the load-bearing contract and
    * is spec-asserted (FunctionsSourcesSpec: factory resolves `.zst` to
    * graft's ZstdCodec). When the key is unset the defaults are
    * restated alongside ours (gzip/bzip2/deflate/lz4/snappy stay
    * readable); when a deployment has already customized the list, ours
    * is APPENDED, never clobbering their entries. Idempotent.
    */
  def register(conf: Configuration): Unit = {
    val defaults = Seq(
      "org.apache.hadoop.io.compress.DefaultCodec",
      "org.apache.hadoop.io.compress.GzipCodec",
      "org.apache.hadoop.io.compress.BZip2Codec",
      "org.apache.hadoop.io.compress.DeflateCodec",
      "org.apache.hadoop.io.compress.Lz4Codec",
      "org.apache.hadoop.io.compress.SnappyCodec")
    val current = Option(conf.get("io.compression.codecs"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(defaults)
    if (!current.contains(classOf[ZstdCodec].getName))
      conf.set("io.compression.codecs",
        (current :+ classOf[ZstdCodec].getName).mkString(","))
  }
}
