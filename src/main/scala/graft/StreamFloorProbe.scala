package graft

import org.apache.spark.sql.functions._
import graft.streaming.Streams

/** Floor decomposition for the streaming gates: what the ~2 s/gate
  * minimum is actually made of, measured. Three reps of (a) a STATELESS
  * pass-through (pure query-lifecycle cost: start/stop, per-micro-batch
  * incremental planning, sink write + read-back — no state store at
  * all) and (b) the watermark+window rollup (adds state store
  * allocate/commit per partition per batch). Rep 1 vs reps 2-3 shows
  * how much of the floor is JVM/code warm-in (shareable across gates in
  * one session) vs per-query work Structured Streaming cannot share
  * between DISTINCT queries. Not part of the library surface.
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Tables.session("graft-stream-floor", cores = 4)
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[floor] $label%-36s ${(System.nanoTime() - t0) / 1e9}%5.2f s ($n rows)")
    }
    // batch-path warmup so rep 1 measures streaming machinery, not
    // parquet-reader/codegen first-touch
    Tables(spark, sfDir, "events").count(): Unit
    for (rep <- 1 to 3) {
      time(s"stateless pass-through rep$rep") {
        Streams.runEventsAvailableNow(spark, sfDir, "append", chunks = 3) {
          df => df.select(col("event_id"), col("event_type"))
        }.count()
      }
      time(s"stateful hourly rollup rep$rep") {
        Streams.hourlyRollupAvailableNow(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
