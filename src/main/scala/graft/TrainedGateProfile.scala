package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Scratch measurement: isolate which axis (PQ dials vs trained
  * quantizers) makes the trained-recall gate's approx branch slow at
  * N× corpus. Not part of the library surface.
  */
object TrainedGateProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale_unique_v2_x10")
    val spark = Tables.session("prof-trained", cores = 32)
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](tag: String)(f: => T): T = {
      val t = System.nanoTime(); val r = f
      println(f"[prof] $tag%-34s ${(System.nanoTime() - t) / 1e9}%8.2f s")
      r
    }
    val e = Tables(spark, dir, "embeddings")
    val probes = e.filter(col("vec_id") % 50 === 0)
    val corpus = e.filter(col("vec_id") % 50 =!= 0)
    val cents = timed("ivfCentroids") {
      Similarity.ivfCentroids(corpus, k = 16, iters = 5) }
    val cbs8 = timed("pqCodebooks m=8") {
      Similarity.pqCodebooks(corpus, m = 8, k = 16, iters = 5) }
    val cbs16 = timed("pqCodebooks m=16") {
      Similarity.pqCodebooks(corpus, m = 16, k = 16, iters = 5) }
    def runSearch(tag: String, nprobe: Int, m: Int,
                  c: Option[Array[Array[Double]]],
                  cb: Option[Array[Array[Array[Double]]]]): Unit =
      timed(tag) {
        Similarity.ivfPqSearch(probes, corpus, topK = 5, nprobe = nprobe,
            m = m, centroids = c, codebooks = cb)
          .write.format("noop").mode("overwrite").save() }
    runSearch("seeded  m=8  nprobe=4", 4, 8, None, None)
    runSearch("trained m=8  nprobe=4", 4, 8, Some(cents), Some(cbs8))
    runSearch("seeded  m=16 nprobe=4", 4, 16, None, None)
    runSearch("trained m=16 nprobe=4", 4, 16, Some(cents), Some(cbs16))
    runSearch("trained m=8  nprobe=8", 8, 8, Some(cents), Some(cbs8))
    runSearch("trained m=16 nprobe=8", 8, 16, Some(cents), Some(cbs16))
    val cbs32 = timed("pqCodebooks m=32") {
      Similarity.pqCodebooks(corpus, m = 32, k = 16, iters = 5) }
    runSearch("trained m=32 nprobe=8", 8, 32, Some(cents), Some(cbs32))
    spark.stop()
  }
}
