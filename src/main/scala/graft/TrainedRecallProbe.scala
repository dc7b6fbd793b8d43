package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** Scratch measurement: recall@5 of the IVFPQ index across quantizer
  * training and dial settings — the tuning sweep the recall gates exist
  * to motivate. Not part of the library surface.
  */
object TrainedRecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftFunctions.register)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = Tables(spark, dir, "embeddings")
    val probes = e.filter(col("vec_id") % 50 === 0)
    val corpus = e.filter(col("vec_id") % 50 =!= 0)
    if (args.contains("--m32")) {
      // the m dial at the GATE's coarse dials (kc=16, nprobe=8): the
      // numbers the m=32 trained gate binds its spec to
      val cents = Similarity.ivfCentroids(corpus, k = 16, iters = 5)
      for (m <- Seq(16, 32)) {
        val cbs = Similarity.pqCodebooks(corpus, m = m, k = 16, iters = 5)
        val r = Similarity.recallIvfPq(probes, corpus, topK = 5,
            nprobe = 8, m = m,
            centroids = Some(cents), codebooks = Some(cbs))
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"PROBE gate-dials kc=16 nprobe=8 m=$m%2d recall@5=$r%.3f")
      }
      spark.stop()
      return
    }
    if (args.contains("--kc")) {
      // the "scale kc with n" dial, measured: absolute recall at FIXED
      // kc drops as the corpus grows (each coarse cell holds more
      // vectors, so nprobe cells cover a shrinking corpus fraction);
      // growing kc ∝ n at a fixed nprobe/kc ratio holds the covered
      // fraction constant. PQ dials pinned at the gate's m=16/k=16.
      val cbs = Similarity.pqCodebooks(corpus, m = 16, k = 16, iters = 5)
      for (kc <- Seq(16, 32, 64, 128)) {
        val cents = Similarity.ivfCentroids(corpus, k = kc, iters = 5)
        // nprobe=8 fixed: candidate fraction SHRINKS 8/kc as kc grows —
        // the production shape (cost per probe bounded). nprobe=kc/2:
        // the gate's 50% coverage ratio held constant for comparison.
        for (nprobe <- Seq(8, kc / 2).distinct) {
          val r = Similarity.recallIvfPq(probes, corpus, topK = 5,
              nprobe = nprobe, m = 16,
              centroids = Some(cents), codebooks = Some(cbs))
            .agg(avg(col("recall"))).collect()(0).getDouble(0)
          println(f"PROBE kc=$kc%3d nprobe=$nprobe%3d " +
            f"candFrac=${nprobe.toDouble / kc}%.3f recall@5=$r%.3f")
        }
      }
      // the m dial at the cost-bounded coarse setting (kc=64, nprobe=8):
      // if recall is PQ-bound, finer codes — not more coarse probing —
      // are what buy it back (m=32 → 2-dim subspaces, 32 B/vector)
      val cents64 = Similarity.ivfCentroids(corpus, k = 64, iters = 5)
      for (m <- Seq(8, 16, 32)) {
        val cbsM = Similarity.pqCodebooks(corpus, m = m, k = 16, iters = 5)
        val r = Similarity.recallIvfPq(probes, corpus, topK = 5,
            nprobe = 8, m = m,
            centroids = Some(cents64), codebooks = Some(cbsM))
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"PROBE kc= 64 nprobe=  8 m=$m%2d recall@5=$r%.3f")
      }
      spark.stop()
      return
    }
    if (args.contains("--refine")) {
      // the REFINE dial at the gate's trained dials (m=16, kc=16,
      // nprobe=8): recall@5 and wall secs per refine factor. What it
      // answers: when the corpus holds families tighter than PQ
      // distortion (the staged sf1 replicas; re-embedded docs in a
      // production crawl), how much shortlist does the exact rerank
      // need? refine=1 is "rerank the topK" (candidate set unchanged);
      // the r∞ limit is the probed-lists exact scan.
      val cents = Similarity.ivfCentroids(corpus, k = 16, iters = 5)
      val cbs = Similarity.pqCodebooks(corpus, m = 16, k = 16, iters = 5)
      val base = Similarity.recallIvfPq(probes, corpus, topK = 5,
          nprobe = 8, m = 16,
          centroids = Some(cents), codebooks = Some(cbs))
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"PROBE trained m=16 nprobe=8 refine= 0 recall@5=$base%.3f (ADC only)")
      for (refine <- Seq(1, 2, 4, 8, 16)) {
        val t0 = System.nanoTime()
        val r = Similarity.recallIvfPqRefined(probes, corpus, topK = 5,
            refine = refine, nprobe = 8, m = 16,
            centroids = Some(cents), codebooks = Some(cbs))
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE trained m=16 nprobe=8 refine=$refine%2d " +
          f"recall@5=$r%.3f ($secs%.1f s)")
      }
      spark.stop()
      return
    }
    if (args.contains("--refine-shipping")) {
      // refine on the SHIPPING structure (trained kc=64/m=32/nprobe=8,
      // the D64b dial): does the exact rerank stack with the coarse
      // 4×-cheaper candidate fraction, or does kc=64's pruning starve
      // the shortlist?
      val cents = Similarity.ivfCentroids(corpus, k = 64, iters = 5)
      val cbs = Similarity.pqCodebooks(corpus, m = 32, k = 16, iters = 5)
      val base = Similarity.recallIvfPq(probes, corpus, topK = 5,
          nprobe = 8, m = 32,
          centroids = Some(cents), codebooks = Some(cbs))
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"PROBE shipping kc=64 m=32 nprobe=8 refine= 0 recall@5=$base%.3f")
      for (refine <- Seq(4, 8, 16)) {
        val r = Similarity.recallIvfPqRefined(probes, corpus, topK = 5,
            refine = refine, nprobe = 8, m = 32,
            centroids = Some(cents), codebooks = Some(cbs))
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"PROBE shipping kc=64 m=32 nprobe=8 refine=$refine%2d recall@5=$r%.3f")
      }
      spark.stop()
      return
    }
    if (args.contains("--nprobe")) {
      // the FINE-TUNE dial at the shipping structure (trained kc=64,
      // m=32): the D64b gate fixes nprobe=8 (candidate fraction 0.125)
      // and measures the recall cost of 4× harder pruning vs kc=16;
      // this arm answers "how much nprobe buys it back, and at what
      // fraction" — the claim in §2 D64b made a measurement
      val cents64 = Similarity.ivfCentroids(corpus, k = 64, iters = 5)
      val cbs32 = Similarity.pqCodebooks(corpus, m = 32, k = 16, iters = 5)
      for (nprobe <- Seq(8, 16, 24, 32)) {
        val r = Similarity.recallIvfPq(probes, corpus, topK = 5,
            nprobe = nprobe, m = 32,
            centroids = Some(cents64), codebooks = Some(cbs32))
          .agg(avg(col("recall"))).collect()(0).getDouble(0)
        println(f"PROBE trained kc=64 m=32 nprobe=$nprobe%3d " +
          f"candFrac=${nprobe / 64.0}%.3f recall@5=$r%.3f")
      }
      spark.stop()
      return
    }
    for {
      iters <- Seq(0, 5, 15)
      m <- Seq(8, 16)
      nprobe <- Seq(4, 8)
    } {
      val cents = Similarity.ivfCentroids(corpus, k = 16, iters = iters)
      val cbs = Similarity.pqCodebooks(corpus, m = m, k = 16, iters = iters)
      val r = Similarity.recallIvfPq(probes, corpus, topK = 5,
          nprobe = nprobe, m = m,
          centroids = Some(cents), codebooks = Some(cbs))
        .agg(avg(col("recall"))).collect()(0).getDouble(0)
      println(f"PROBE iters=$iters%2d m=$m%2d nprobe=$nprobe%2d recall@5=$r%.3f")
    }
    spark.stop()
  }
}
