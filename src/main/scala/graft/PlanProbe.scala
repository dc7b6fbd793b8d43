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
      df.write.format("noop").mode("overwrite").save()
      val plan = df.queryExecution.executedPlan.toString
      println(s"[probe] $n reusedExchange=${plan.contains("ReusedExchange")}" +
        s" scans=${"Scan parquet".r.findAllIn(plan).length}")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
