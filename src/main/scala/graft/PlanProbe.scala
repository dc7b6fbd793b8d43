package graft

/** Executed-plan audit: RUNS each query (noop sink) and reports what the
  * plan actually did at runtime — parquet scan count and whether AQE
  * exchange reuse fired. `Explain` shows the static plan; this shows the
  * adaptive one, which is what catches a duplicated-subtree scan that
  * static ReuseExchange was expected to (but did not) share.
  * Usage: runMain graft.PlanProbe [sfDir] [query ...]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("text_bm25", "text_repetition", "text_corpus_filter",
        "qa_report", "q_join_star")
    val spark = Tables.session("graft-probe", cores = 4)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // Execute THIS QueryExecution (a .write would plan its own), so
      // the AdaptiveSparkPlan is finalized and the string below is the
      // plan that actually ran, not the pre-execution draft.
      df.queryExecution.toRdd.count(): Unit
      // a finalized AdaptiveSparkPlan prints BOTH "== Final Plan ==" and
      // "== Initial Plan ==" sections — count nodes in the final one only
      val full = df.queryExecution.executedPlan.toString
      val plan = full.split("== Initial Plan ==")(0)
      println(s"[probe] $n finalPlan=${!full.contains("isFinalPlan=false")}" +
        s" reusedExchange=${plan.contains("ReusedExchange")}" +
        s" scans=${"Scan parquet".r.findAllIn(plan).length}" +
        s" exchanges=${"Exchange".r.findAllIn(plan).length -
          "ReusedExchange".r.findAllIn(plan).length}")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
