package graft

import java.nio.file.{Files, Paths}

/** Plan-shape regression gate: runs every batch query and compares the
  * FINALIZED adaptive plan's structural node counts (parquet scans,
  * exchanges) against the checked-in baseline `plan_baseline.tsv`.
  * A query whose scan or shuffle count grows past its recorded shape
  * fails the audit — the plan-level analogue of the value-level oracle
  * gate, and the guard for every "this operator is one scan / one
  * shuffle" claim in SURVEY.
  *
  * Usage:
  *   runMain graft.PlanAudit            — audit against the baseline
  *   runMain graft.PlanAudit --record   — (re)write the baseline
  *
  * stream_* queries are excluded: their work happens inside the
  * streaming runtime, and the returned frame is just the sink read.
  * Exchange counts include broadcast exchanges (a broadcast is cheap
  * but still a structural plan feature worth pinning).
  */
object PlanAudit {
  val baselinePath = "plan_baseline.tsv"

  def main(args: Array[String]): Unit = {
    val record = args.contains("--record")
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.001")
    val spark = Tables.session("graft-plan-audit", cores = 4)
    spark.sparkContext.setLogLevel("ERROR")
    val names = SparkEntry.queries.keys.filterNot(_.startsWith("stream_"))
      .toSeq.sorted
    val shapes = names.map { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // execute THIS QueryExecution so the counted plan is the
      // finalized adaptive plan; count in the Final Plan section only
      df.queryExecution.toRdd.count(): Unit
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val scans = "Scan parquet".r.findAllIn(plan).length
      val exchanges = "Exchange".r.findAllIn(plan).length -
        "ReusedExchange".r.findAllIn(plan).length
      // non-empty PushedFilters on any scan: a pushdown regression
      // (filter evaluated after a full read) is a classic scale killer
      val pushed = "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined
      // drop localCheckpoint RDDs too, not just CacheManager entries:
      // 100+ queries of accumulated blocks shift memory stats enough to
      // flip AQE plan choices for later queries (qa_drift_psi flapped
      // 6/7 exchanges from this before the audit adopted Bench's hygiene)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      (n, scans, exchanges, pushed)
    }
    if (record) {
      val out = shapes.map { case (n, s, e, p) => s"$n\t$s\t$e\t$p" }
        .mkString("", "\n", "\n")
      Files.writeString(Paths.get(baselinePath), out)
      println(s"[plan-audit] recorded ${shapes.size} shapes to $baselinePath")
    } else {
      val baseline = Files.readAllLines(Paths.get(baselinePath))
        .toArray(Array.empty[String]).filter(_.nonEmpty)
        .map(_.split("\t"))
        .map(a => a(0) -> ((a(1).toInt, a(2).toInt, a(3).toBoolean)))
        .toMap
      var failed = 0
      shapes.foreach { case (n, s, e, p) =>
        baseline.get(n) match {
          case None => println(s"[plan-audit] NEW $n scans=$s exchanges=$e" +
            " (not in baseline — rerun with --record)")
          case Some((bs, be, bp)) if s > bs || e > be || (bp && !p) =>
            failed += 1
            println(s"[plan-audit] REGRESSED $n scans=$s (was $bs) " +
              s"exchanges=$e (was $be) pushedFilters=$p (was $bp)")
          case Some((bs, be, _)) if s < bs || e < be =>
            println(s"[plan-audit] improved $n scans=$s (was $bs) " +
              s"exchanges=$e (was $be) — re-record to pin")
          case _ => ()
        }
      }
      println(s"[plan-audit] ${shapes.size} queries, $failed regressed")
      if (failed > 0) sys.exit(1)
    }
    spark.stop()
  }
}
