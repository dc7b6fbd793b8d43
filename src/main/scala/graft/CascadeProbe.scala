package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Attribution probe for the r10 exact-first cascade cost on
  * `dedup_corpus_clean` (VERDICT-r10 item 6): the r10 close measured
  * the gate at 2.11 s vs its 1.64 s pre-cascade floor at sf0.1 and the
  * ledger claimed "costs nothing measurable" — this probe separates the
  * candidate explanations with one arm each, same Bench hygiene
  * (calib sentinel, noop sink, checkpoint-block unpersist between reps):
  *
  *   shipped    — `Dedup.cleanCorpus` as the gate runs it (exact-first
  *                cascade, localCheckpoint barrier on the exact drops);
  *   nobarrier  — identical cascade with the barrier REMOVED (exact
  *                drops re-derived by each consumer): isolates the
  *                checkpoint materialization cost vs the lineage
  *                re-execution it buys off;
  *   precascade — the r9 shape (near-dup propose/verify on the FULL
  *                corpus, drops unioned after the fact): isolates the
  *                cascade's plan delta (smaller propose input + one
  *                extra anti-join) from everything else.
  *
  * Usage: runMain graft.CascadeProbe [sfDir] [reps]
  */
object CascadeProbe {
  /** cleanCorpus with the exact-drops barrier removed — MUST mirror
    * [[Dedup.cleanCorpus]] minus the `.localCheckpoint()` (attribution
    * arm, not a supported operator). */
  private def cleanNoBarrier(df: DataFrame): DataFrame = {
    val exactDrops = Dedup.exactNormalized(df)
      .filter(col("is_duplicate") === 1).select(col("doc_id"))
    val survivors = df.join(exactDrops, Seq("doc_id"), "left_anti")
    val nearDrops = Dedup.jaccardOnCandidates(survivors)
      .select(col("doc_b").as("doc_id"))
    val drops = exactDrops.unionByName(nearDrops).distinct()
    df.join(drops, Seq("doc_id"), "left_anti")
  }

  /** The pre-r10 (r9) shape: propose/verify on the full corpus. */
  private def cleanPreCascade(df: DataFrame): DataFrame = {
    val exactDrops = Dedup.exactNormalized(df)
      .filter(col("is_duplicate") === 1).select(col("doc_id"))
    val nearDrops = Dedup.jaccardOnCandidates(df)
      .select(col("doc_b").as("doc_id"))
    val drops = exactDrops.unionByName(nearDrops).distinct()
    df.join(drops, Seq("doc_id"), "left_anti")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftFunctions.register)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(f"[cascade] calib ${Bench.calibrate(spark)}%.2f")

    val arms: Seq[(String, DataFrame => DataFrame)] = Seq(
      "shipped" -> (d => Dedup.cleanCorpus(d)),
      "nobarrier" -> cleanNoBarrier,
      "precascade" -> cleanPreCascade)

    // warmup (JIT/codegen) on the smallest SF, like Bench
    arms.foreach { case (_, fn) =>
      fn(Tables(spark, "/root/testdata/sf0.001", "documents"))
        .select("doc_id", "lang")
        .write.format("noop").mode("overwrite").save()
    }
    arms.foreach { case (name, fn) =>
      System.gc()
      val times = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        val t0 = System.nanoTime()
        fn(Tables(spark, sfDir, "documents")).select("doc_id", "lang")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cascade] $name%-12s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    println(f"[cascade] calib-post ${Bench.calibrate(spark)}%.2f")
    spark.stop()
  }
}
