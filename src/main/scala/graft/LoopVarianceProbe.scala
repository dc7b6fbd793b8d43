package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Scratch measurement: attribute dedup_incremental_loop's wall-time
  * spread (5.4–21.9 s bands observed across machines at sf0.1) between
  * its two candidate causes:
  *   full     — the gate's exact shape: in-query corpus index BUILD +
  *              two screen/merge rounds (the timed window contains the
  *              initial buildIndex).
  *   prestage — the index and corpus frames built + localCheckpointed
  *              OUTSIDE the timed window; the timed window is only the
  *              two screen/merge rounds (what a production loop pays
  *              per batch, its index loaded from the store).
  * If `full` swings and `prestage` is tight, the spread lives in the
  * in-query double build (fix: stage the index); if BOTH swing
  * together, it is JVM/GC/allocator state (harness-only — the band is
  * machine noise, not operator structure). Run several times from a
  * fresh JVM each for the cross-JVM component. Usage:
  *   runMain graft.LoopVarianceProbe [sfDir] [reps]
  */
object LoopVarianceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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

    val split = graft.etl.Sampling.hashSplit(Tables(spark, dir, "documents"),
      "doc_id", Seq("corpus" -> 0.7, "b1" -> 0.15, "b2" -> 0.15))
    def part(p: String) = split.filter(col("split") === p).drop("split")
    def hygiene(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // warmup once (codegen/JIT), as Bench does
    Dedup.incrementalLoop(part("corpus"),
      Seq("b1" -> part("b1"), "b2" -> part("b2")))
      .write.format("noop").mode("overwrite").save()

    val full = (1 to reps).map { _ =>
      hygiene()
      time {
        Dedup.incrementalLoop(part("corpus"),
          Seq("b1" -> part("b1"), "b2" -> part("b2")))
          .write.format("noop").mode("overwrite").save()
      }
    }
    val prestage = (1 to reps).map { _ =>
      hygiene()
      // stage OUTSIDE the timed window: corpus text + its index, both
      // materialized (localCheckpoint is eager) — the production state
      // after an index load
      val corp = part("corpus").select(col("doc_id"), col("text"))
        .localCheckpoint()
      val idx = Dedup.buildIndex(corp)
      val staged = graft.dedup.DedupIndex(
        idx.hashes.localCheckpoint(), idx.bands.localCheckpoint())
      val t = time {
        Dedup.incrementalLoopFrom(corp, staged,
          Seq("b1" -> part("b1"), "b2" -> part("b2")))
          .write.format("noop").mode("overwrite").save()
      }
      t
    }
    def fmt(ts: Seq[Double]) =
      f"min=${ts.min}%5.2f max=${ts.max}%5.2f spread=${
        (ts.max - ts.min) / ts.min * 100}%5.1f%% " +
        ts.map(t => f"$t%.2f").mkString("[", " ", "]")
    println(s"[loopvar] full     ${fmt(full)}")
    println(s"[loopvar] prestage ${fmt(prestage)}")
    spark.stop()
  }
}
