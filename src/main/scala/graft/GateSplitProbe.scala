package graft

/** Scratch measurement (r15): split a gate's wall time into
  * (a) FRAME CONSTRUCTION — SparkEntry.queries(name)(spark, dir), which
  *     for trained gates includes sample collects, driver Lloyd, model
  *     save/load round trips, and building the literal-bearing plan;
  * (b) ANALYSIS+EXECUTION — the noop write of the returned frame.
  * Tells whether to attack training/staging plumbing or the executed
  * plan. Usage: runMain graft.GateSplitProbe <sfDir> <reps> <query...>
  */
object GateSplitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").write
        .format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    names.foreach { name =>
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      }
      val c = ts.map(_._1); val e = ts.map(_._2)
      println(f"[gatesplit] $name%-30s construct=${c.map(t => f"$t%.2f").mkString(",")} exec=${e.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
