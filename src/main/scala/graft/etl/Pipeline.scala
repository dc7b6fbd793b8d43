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
  *   optional keep-latest dedup → QA stat families → write with
  *   clustered layout.
  *
  * Each stage is a lazy DataFrame transform; Catalyst sees the whole
  * chain as one plan up to the QA/write actions, so column pruning
  * reaches the file scan even for columns only the QA step drops.
  */
object Pipeline {

  final case class Result(table: DataFrame,
                          qa: Map[String, DataFrame],
                          rowCount: Long)

  def run(spark: SparkSession, cfg: TableConfig,
          source: Option[DataFrame] = None,
          dedupKeys: Seq[String] = Nil,
          dedupOrder: Seq[String] = Nil,
          qaTimeVar: Option[String] = None,
          outPath: Option[String] = None,
          clusterLater: Boolean = false): Result = {
    val raw = source.getOrElse {
      if (cfg.years.nonEmpty) Sources.loadYears(spark, cfg)
      else Sources.loadDelimited(spark, cfg)
    }
    val conformed = Etl.conform(raw, cfg.allVars)
    val deduped =
      if (dedupKeys.nonEmpty && dedupOrder.nonEmpty)
        Etl.dedupKeepLatestByMax(conformed, dedupKeys, dedupOrder)
      else conformed

    val qa = qaTimeVar match {
      case Some(tv) if deduped.columns.contains(tv) =>
        Qa.runPipeline(deduped, tv,
          deduped.columns.filterNot(_ == tv).toSeq)
      case _ => Map.empty[String, DataFrame]
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
    Result(deduped, qa, deduped.count())
  }
}
