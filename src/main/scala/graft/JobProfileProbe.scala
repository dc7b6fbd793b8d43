package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch measurement (r15): where does a query's wall time go —
  * executor-busy Spark jobs, or the DRIVER-SIDE gaps between them
  * (analysis/optimization/codegen, eager localCheckpoint planning,
  * collect-side work)? Attaches a listener, runs the named queries once
  * warm, and prints every job's [start..end] duration plus the summed
  * inter-job gap. A query whose gap share dominates is bounded by
  * plan/driver fixed costs, not by task work — the optimization lever is
  * then FEWER jobs/plans (merge eager cuts, reuse staged frames), not
  * faster tasks. Usage: runMain graft.JobProfileProbe <sfDir> <query...>
  */
object JobProfileProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        // attribute by the last stage's call site (the action) plus the
        // job's stage/task breadth — enough to tell a localCheckpoint
        // materialization from an AQE stage job from the final sink job
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("")
        val stages = js.stageInfos.length
        val tasks = js.stageInfos.map(_.numTasks).sum
        jobs.put(js.jobId, (js.time, 0L, s"stages=$stages tasks=$tasks $site")): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (s, _, d) =>
          jobs.put(je.jobId, (s, je.time, d)): Unit
        }
      }
    }
    names.foreach { name =>
      // warmup (JIT/codegen) at the smallest SF, as Bench does
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      Thread.sleep(200) // let listener events drain
      val recs = {
        import scala.jdk.CollectionConverters._
        jobs.asScala.toSeq.sortBy(_._1)
      }
      val t0ms = recs.headOption.map(_._2._1).getOrElse(0L)
      var prevEnd = t0ms
      var gapSum = 0L
      var busySum = 0L
      recs.foreach { case (id, (s, e, d)) =>
        val gap = s - prevEnd
        gapSum += math.max(0L, gap)
        busySum += (e - s)
        prevEnd = math.max(prevEnd, e)
        println(f"[jobprof] $name job=$id%3d dur=${(e - s) / 1e3}%6.2fs gapBefore=${gap / 1e3}%6.2fs ${d.take(60)}")
      }
      println(f"[jobprof] $name TOTAL wall=$wall%.2f jobs=${recs.size} busy=${busySum / 1e3}%.2f gaps=${gapSum / 1e3}%.2f (pre-first-job + inter-job driver time)")
    }
    spark.stop()
  }
}
