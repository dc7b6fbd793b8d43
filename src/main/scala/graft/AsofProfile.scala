package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Joins

/** Diagnostic for the tier-(c) decision (VERDICT r6 #4): measures the
  * union+carry-window as-of ([[Joins.asof]]) against the fused physical
  * operator ([[Joins.asofFused]]), and the binned interval join, at 1×
  * and 10× — wall time AND shuffled bytes (the union form widens both
  * inputs to the union schema before its one shuffle; the fused form
  * ships each side's own schema). Usage:
  *   runMain graft.AsofProfile [n] — replicates events n× (reusing
  * ScaleCheck's target/scale_xN replica when present).
  */
object AsofProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val dst = s"target/scale_x$n"
    val spark = Tables.session("graft-asof-profile", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")

    // events-only replica is enough here; reuse ScaleCheck's full
    // replica OR a previous AsofProfile run's events-only one. The
    // events marker is separate from ScaleCheck's _REPLICATED so an
    // events-only dir is never mistaken for a complete replica.
    val evMarker = new java.io.File(s"$dst/_EVENTS_REPLICATED")
    if (new java.io.File(s"$dst/_REPLICATED").exists() || evMarker.exists()) {
      println(s"reusing replica at $dst")
    } else {
      val base = Tables(spark, src, "events")
      (0 until n).map { i =>
        base.withColumn("event_id", col("event_id") + lit(i * 100000000L))
          .withColumn("user_id", col("user_id") + lit(i * 1000000L))
      }.reduce(_.unionByName(_))
        .write.mode("overwrite").parquet(s"$dst/events.parquet")
      java.nio.file.Files.writeString(evMarker.toPath, "ok"): Unit
      println(s"replicated events x$n into $dst")
    }

    @volatile var shuffleBytes = 0L
    @volatile var shuffleRecords = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shuffleBytes += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        shuffleRecords += s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten
      }
    })

    def events(dir: String): DataFrame = Tables(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 1000").as("ms"))

    // the generic two-dataset shape: purchases probe clicks, 3 payload
    // columns carried (the realistic enrich — with NO payload the union
    // widening tax mostly vanishes, so measuring it would flatter the
    // fused side; with payload it is the common case)
    def probe(dir: String) = events(dir).filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ms"))
    def build(dir: String) = events(dir).filter(col("event_type") === "click")
      .select(col("user_id"), col("ms"), col("event_id").as("click_id"),
        col("event_type").as("click_type"),
        (col("ms") % 997).as("click_feature"))

    def time(label: String, mk: => DataFrame): Unit = {
      // rep 1 warms JIT/scan caches; rep 2 is reported (min would hide
      // a systematic second-rep cost; they agree within noise anyway)
      var t = 0.0; var b = 0L; var r = 0L
      (1 to 2).foreach { _ =>
        // listener events are async; a short settle keeps each run's
        // stage metrics out of the next run's window
        Thread.sleep(300)
        shuffleBytes = 0L; shuffleRecords = 0L
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        b = shuffleBytes; r = shuffleRecords
      }
      println(f"[asof-profile] $label%-28s ${t}%7.2f s  shuffle=${b / 1e6}%9.1f MB  rows=$r%,12d")
    }

    // wide-payload variant: 9 build columns — measures how the union
    // form's widening tax (one null slot per payload column per probe
    // row) grows with payload width vs the fused form
    def buildWide(dir: String) = events(dir).filter(col("event_type") === "click")
      .select(Seq(col("user_id"), col("ms"), col("event_id").as("w1"),
        col("event_type").as("w2")) ++
        (3 to 9).map(i => (col("ms") % (991 + i)).as(s"w$i")): _*)
    val wideCols = Seq("w1", "w2") ++ (3 to 9).map(i => s"w$i")

    Seq("1x" -> src, s"${n}x" -> dst).foreach { case (tag, dir) =>
      time(s"asof_window   $tag",
        Joins.asof(probe(dir), build(dir), "user_id", "ms",
          buildCols = Seq("click_id", "click_type", "click_feature")))
      time(s"asof_fused    $tag",
        Joins.asofFused(probe(dir), build(dir), "user_id", "ms",
          buildCols = Seq("click_id", "click_type", "click_feature")))
      time(s"asof_window w9 $tag",
        Joins.asof(probe(dir), buildWide(dir), "user_id", "ms",
          buildCols = wideCols))
      time(s"asof_fused  w9 $tag",
        Joins.asofFused(probe(dir), buildWide(dir), "user_id", "ms",
          buildCols = wideCols))
      // the gated interval query as-is (replication caveat: same time
      // range, so OUTPUT grows quadratically at 10× — the shuffle-bytes
      // column is the comparable number, not wall time)
      time(s"interval_bin  $tag", SparkEntry.queries("q_interval_join")(spark, dir))
    }
    spark.stop()
  }
}
