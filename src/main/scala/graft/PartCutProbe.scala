package graft

import org.apache.spark.sql.functions._
import graft.config.Checkpoints._

/** Executable evidence for the r12 shingle-self-join reshape (§8h):
  *
  *  1. a `localCheckpoint`ed frame's LogicalRDD reports
  *     UnknownPartitioning under AQE — even when the checkpointed plan
  *     ended in a `repartition(blk, w)` — so every consumer of a cut
  *     frame re-shuffles it (the reason the old cut-then-self-join
  *     shape paid 2 exploded-table exchanges);
  *  2. without the cut, AQE ReuseExchange hangs BOTH self-join sides
  *     (and the semi-join probe) off ONE shingle-keyed exchange — the
  *     shape [[graft.dedup.Dedup.ngramJaccard]] /
  *     [[graft.dedup.Dedup.containment]] now ship with, spec-pinned in
  *     TextDedupSpec ("shingle self-joins hang both sides off ONE
  *     reused exchange") and measured at sf1: ngram 38.3→8.0 s,
  *     containment 56.4→23.7 s.
  *
  * Usage: runMain graft.PartCutProbe [sfDir]
  */
object PartCutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Tables.session("graft-partcut-probe", cores = 4)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val docs = Tables(spark, sfDir, "documents")

    // finding 1: partitioning does not survive a lineage cut
    val cut = docs
      .withColumn("__toks", graft.text.Text.tokens(col("text")))
      .select(col("doc_id").as("id"), col("lang").as("blk"),
        explode(expr(graft.text.Text.shingleExpr("__toks", 3))).as("w"))
      .repartition(col("blk"), col("w"))
      .cutLineage()
    println("[partcut-probe] cut frame partitioning: " +
      cut.queryExecution.executedPlan.outputPartitioning)

    // finding 2: the shipped no-cut shape reuses one shingle exchange
    for ((name, op) <- Seq(
        "ngramJaccard" -> graft.dedup.Dedup.ngramJaccard(docs),
        "containment" -> graft.dedup.Dedup.containment(docs))) {
      op.queryExecution.toRdd.count(): Unit
      val plan = op.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val own = plan.linesIterator
        .filterNot(_.contains("ReusedExchange"))
        .count(l => l.contains("Exchange hashpartitioning(") &&
          l.contains(" w#"))
      val reused = plan.linesIterator.count(_.contains("ReusedExchange"))
      println(s"[partcut-probe] $name: shingle-keyed exchanges=$own " +
        s"reused-exchange nodes=$reused")
    }
    spark.stop()
  }
}
