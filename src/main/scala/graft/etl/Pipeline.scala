package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.config.TableConfig
import graft.qa.Qa
import graft.sources.Sources

/** Config-driven end-to-end ETL flow — the way apde.etl users actually
  * run loads (reference: a YAML config drives load_table_from_file →
  * [optional dedup] → etl_qa_run_pipeline → indexed table):
  *
  *   load (delimited per config) → conform to declared schema →
  *   optional rule validation (audit + optional quarantine) →
  *   optional keep-latest dedup → QA stat families → optional
  *   freshness SLA check → write with clustered layout.
  *
  * Each stage is a lazy DataFrame transform; Catalyst sees the whole
  * chain as one plan up to the QA/write actions, so column pruning
  * reaches the file scan even for columns only the QA step drops.
  */
object Pipeline {

  /** Freshness-SLA stage config: per-`groupCol` last-`tsCol` lag vs the
    * pinned `asOfUs` instant, flagged when it exceeds `slaUs` (see
    * [[graft.qa.Qa.freshness]]).
    */
  final case class FreshnessSla(groupCol: String, tsCol: String,
                                asOfUs: Long, slaUs: Long)

  // rowCount is LAZY: a caller that only consumes `table` (the gate, a
  // write-through deployment) must not pay a second full pipeline run
  // for a count it never reads — the eager form silently doubled every
  // consumer's cost (count job + the table action re-running the same
  // scan/exchange chain).
  final case class Result(table: DataFrame,
                          qa: Map[String, DataFrame],
                          validation: Option[DataFrame] = None,
                          freshness: Option[DataFrame] = None) {
    lazy val rowCount: Long = table.count()
  }

  def run(spark: SparkSession, cfg: TableConfig,
          source: Option[DataFrame] = None,
          dedupKeys: Seq[String] = Nil,
          dedupOrder: Seq[String] = Nil,
          qaTimeVar: Option[String] = None,
          outPath: Option[String] = None,
          clusterLater: Boolean = false,
          validationRules: Seq[(String, org.apache.spark.sql.Column)] = Nil,
          quarantineInvalid: Boolean = false,
          freshnessSla: Option[FreshnessSla] = None,
          xlsxPath: Option[String] = None): Result = {
    val raw = source.getOrElse {
      if (cfg.years.nonEmpty) Sources.loadYears(spark, cfg)
      else Sources.loadDelimited(spark, cfg)
    }
    val conformed = Etl.conform(raw, cfg.allVars)

    // Load-time rule gate (qa_load_sql parity): the per-rule audit
    // summarizes the RAW conformed load — before quarantine or dedup —
    // so the report counts what arrived, not what survived. Quarantine
    // re-applies the predicates as a plain filter (one scan, no join
    // back to the audit frame) BEFORE dedup, so an invalid row can
    // never win keep-latest over a valid one.
    val validation =
      if (validationRules.isEmpty) None
      else Some(Etl.validateSummary(
        Etl.validateRows(conformed, cfg.allVars.map(_.name), validationRules),
        validationRules.map(_._1)))
    val gated =
      if (validationRules.nonEmpty && quarantineInvalid)
        conformed.filter(validationRules
          .map { case (_, p) => coalesce(p, lit(false)) }.reduce(_ && _))
      else conformed

    val deduped =
      if (dedupKeys.nonEmpty && dedupOrder.nonEmpty)
        Etl.dedupKeepLatestByMax(gated, dedupKeys, dedupOrder)
      else gated

    val qa = qaTimeVar match {
      case Some(tv) if deduped.columns.contains(tv) =>
        Qa.runPipeline(deduped, tv,
          deduped.columns.filterNot(_ == tv).toSeq)
      case _ => Map.empty[String, DataFrame]
    }

    // Freshness SLA over the frame that will be written — post-gate,
    // post-dedup — because the SLA question is "is the TABLE stale",
    // not "was the raw feed stale".
    val fresh = freshnessSla.map { f =>
      Qa.freshness(deduped, f.groupCol, f.tsCol, f.asOfUs, f.slaUs)
    }

    // Workbook export hook (VERDICT-r14 item 6): the reference's
    // end-to-end flow is ONE call — load → conform → QA → .xlsx on disk
    // (etl_qa_run_pipeline.R:697-808 + 1772-1786). The analyst artifact
    // rides the same Result the deployment writes; requires a QA stage
    // (qaTimeVar), because the workbook IS the QA families rendered.
    xlsxPath.foreach { p =>
      val tv = qaTimeVar.getOrElse(sys.error(
        "Pipeline.run: xlsxPath needs qaTimeVar — the workbook renders " +
          "the QA families"))
      require(qa.nonEmpty,
        s"Pipeline.run: QA produced no sheets (is '$tv' a column of the " +
          "loaded table?) — nothing to export to " + p)
      graft.qa.Workbook.writeQaWorkbook(qa, tv, p)
    }

    outPath.foreach { p =>
      if (clusterLater) {
        // load-around-index orchestration (load_table_from_file.R:124-125
        // drop_index, :348 re-add): bulk-write unclustered — no range
        // exchange in the load path — then rebuild the clustered layout
        // in a separate pass, like dropping indexes for a bulk load and
        // re-adding them after.
        Sources.writeTable(deduped, p)
        if (cfg.indexVars.nonEmpty)
          Sources.reclusterTable(spark, p, cfg.indexVars)
      } else Sources.writeTable(deduped, p, clusterKeys = cfg.indexVars)
    }
    Result(deduped, qa, validation, fresh)
  }
}
