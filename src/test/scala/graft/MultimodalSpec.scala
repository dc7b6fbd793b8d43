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
