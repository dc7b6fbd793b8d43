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
}
