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
}
