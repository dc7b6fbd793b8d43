package graft.qa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** QA pipeline: Spark-first re-expression of the reference's
  * `etl_qa_run_pipeline` (R/etl_qa_run_pipeline.R:697-808): per-time-period
  * missingness, continuous / date distributions, categorical value counts,
  * and period-over-period change flags.
  *
  * Scale design: each stat family is ONE aggregation over all requested
  * columns (wide agg, then `stack` to long) — a single shuffle per family
  * regardless of column count, instead of the per-column query storm a
  * naive translation would run. At 100 TB the input is scanned once per
  * family with only (timeVar ∪ cols) read from parquet.
  */
object Qa {

  /** Missingness per (time period, column): n rows missing + proportion.
    * (reference: etl_qa_run_pipeline.R:697-705 — melt + sum(is.na)/.N).
    */
  def missingness(df: DataFrame, timeVar: String, cols: Seq[String],
                  digits: Int = 4): DataFrame = {
    val aggs = cols.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(s"__m_$c")) :+
      count(lit(1)).as("__n")
    val wide = df.groupBy(col(timeVar)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', __m_$c").mkString(", ")
    wide.select(col(timeVar),
        expr(s"stack(${cols.size}, $stackArgs) as (varname, n_missing)"),
        col("__n"))
      .select(col(timeVar), col("varname"), col("n_missing"),
        round(col("n_missing") / col("__n"), digits).as("proportion"))
  }

  /** Continuous stats per (time period, numeric column): mean / exact
    * interpolated median / min / max (reference: etl_qa_run_pipeline.R:708-724).
    * Exact `percentile` matches DuckDB's `median` interpolation.
    */
  def continuous(df: DataFrame, timeVar: String, cols: Seq[String],
                 digits: Int = 4): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(avg(col(c)).as(s"__mean_$c"),
        expr(s"percentile($c, 0.5)").as(s"__med_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val wide = df.groupBy(col(timeVar)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __mean_$c, __med_$c, __min_$c, __max_$c").mkString(", ")
    wide.select(col(timeVar),
        expr(s"stack(${cols.size}, $stackArgs) as (varname, mean, median, min, max)"))
      .select(col(timeVar), col("varname"),
        round(col("mean"), digits).as("mean"),
        round(col("median"), digits).as("median"),
        round(col("min"), digits).as("min"),
        round(col("max"), digits).as("max"))
  }

  /** Quantiles per (time period, numeric column): exact interpolated
    * p25/p50/p75/p95 in ONE pass (Spark's `percentile` takes the whole
    * probability array — one sort-based aggregate, not four).
    */
  def quantiles(df: DataFrame, timeVar: String, cols: Seq[String],
                digits: Int = 4): DataFrame = {
    val aggs = cols.map(c =>
      expr(s"percentile($c, array(0.25, 0.5, 0.75, 0.95))").as(s"__q_$c"))
    val wide = df.groupBy(col(timeVar)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __q_$c[0], __q_$c[1], __q_$c[2], __q_$c[3]").mkString(", ")
    wide.select(col(timeVar),
        expr(s"stack(${cols.size}, $stackArgs) as (varname, p25, p50, p75, p95)"))
      .select(col(timeVar), col("varname"),
        round(col("p25"), digits).as("p25"), round(col("p50"), digits).as("p50"),
        round(col("p75"), digits).as("p75"), round(col("p95"), digits).as("p95"))
  }

  /** Scale path for [[quantiles]]: `approx_percentile` (KLL-style sketch,
    * bounded memory per group) instead of exact `percentile` (which
    * buffers every value in the group). Use this when group sizes are
    * unbounded; accuracy is controlled by `accuracy` (higher = tighter).
    */
  def quantilesApprox(df: DataFrame, timeVar: String, cols: Seq[String],
                      accuracy: Int = 10000, digits: Int = 4): DataFrame = {
    val aggs = cols.map(c =>
      expr(s"approx_percentile($c, array(0.25, 0.5, 0.75, 0.95), $accuracy)")
        .as(s"__q_$c"))
    val wide = df.groupBy(col(timeVar)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __q_$c[0], __q_$c[1], __q_$c[2], __q_$c[3]").mkString(", ")
    wide.select(col(timeVar),
        expr(s"stack(${cols.size}, $stackArgs) as (varname, p25, p50, p75, p95)"))
      .select(col(timeVar), col("varname"),
        round(col("p25"), digits).as("p25"), round(col("p50"), digits).as("p50"),
        round(col("p75"), digits).as("p75"), round(col("p95"), digits).as("p95"))
  }

  /** Date stats per (time period, date column): min / median / max, with
    * the median reported on the epoch-millis scale so engines agree
    * exactly (reference: etl_qa_run_pipeline.R:726-745).
    */
  def dates(df: DataFrame, timeVar: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      // TIMESTAMP_NTZ casts to double only via TIMESTAMP (UTC session).
      val ep = s"(cast(cast($c as timestamp) as double) * 1000)"
      Seq(min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"),
        expr(s"cast(floor(percentile($ep, 0.5)) as bigint)").as(s"__med_$c"))
    }
    val wide = df.groupBy(col(timeVar)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', __min_$c, __med_$c, __max_$c").mkString(", ")
    wide.select(col(timeVar),
      expr(s"stack(${cols.size}, $stackArgs) as (varname, min_val, median_epoch_ms, max_val)"))
  }

  /** Categorical value counts per (time period, column, value) with
    * within-(period, column) proportions; NULL appears as its own row
    * (reference: etl_qa_run_pipeline.R:748-764).
    * One melt projection + one shuffle on (time, varname, value); the
    * proportion reuses the same partitioning via a window, so no second
    * shuffle.
    */
  def categorical(df: DataFrame, timeVar: String, cols: Seq[String],
                  digits: Int = 4): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', cast($c as string)").mkString(", ")
    val long = df.select(col(timeVar),
      expr(s"stack(${cols.size}, $stackArgs) as (varname, value)"))
    val counted = long.groupBy(col(timeVar), col("varname"), col("value"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(timeVar), col("varname"))
    counted.withColumn("proportion", round(col("n") / sum(col("n")).over(w), digits))
  }

  /** Full pipeline orchestration mirroring the reference's 4-step flow
    * (etl_qa_setup_config → initial → final → export,
    * R/etl_qa_run_pipeline.R:86-89): classify columns by type, run every
    * stat family, attach the period-over-period comparison, and
    * optionally export each result table to `outDir` (parquet — the
    * Spark-native "export"; the reference writes xlsx+plots, which are
    * presentation concerns downstream of these frames).
    */
  def runPipeline(df: DataFrame, timeVar: String, cols: Seq[String],
                  outDir: Option[String] = None,
                  relThreshold: Double = 2.0): Map[String, DataFrame] = {
    import org.apache.spark.sql.types._
    val schema = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val numeric = cols.filter(c => schema.get(c).exists {
      case _: NumericType => true; case _ => false
    })
    val dates = cols.filter(c => schema.get(c).exists {
      case DateType | TimestampType | TimestampNTZType => true; case _ => false
    })
    val categorical = cols.filterNot(c => numeric.contains(c) || dates.contains(c))

    val results = Seq(
      "missing_data" -> Some(missingness(df, timeVar, cols)),
      "vals_continuous" -> (if (numeric.nonEmpty)
        Some(continuous(df, timeVar, numeric)) else None),
      "vals_date" -> (if (dates.nonEmpty)
        Some(this.dates(df, timeVar, dates)) else None),
      "vals_categorical" -> (if (categorical.nonEmpty)
        Some(this.categorical(df, timeVar, categorical)) else None),
      "comparisons" -> (if (numeric.nonEmpty)
        Some(comparePeriods(continuous(df, timeVar, numeric), timeVar,
          relThreshold)) else None)
    ).collect { case (k, Some(v)) => k -> v }.toMap

    outDir.foreach { dir =>
      results.foreach { case (name, frame) =>
        frame.write.mode("overwrite").parquet(s"$dir/$name")
      }
    }
    results
  }

  /** Period-over-period change detection on the continuous stats: relative
    * % change in mean/median vs the previous period, flagged when above
    * `relThreshold` (reference: etl_qa_run_pipeline.R abs/rel_threshold,
    * defaults 3/2). Input is the long frame from [[continuous]].
    */
  def comparePeriods(continuousLong: DataFrame, timeVar: String,
                     relThreshold: Double = 2.0, digits: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("varname")).orderBy(col(timeVar))
    continuousLong
      .withColumn("prev_mean", lag(col("mean"), 1).over(w))
      .withColumn("rel_change_mean",
        round(abs(col("mean") - col("prev_mean")) / abs(col("prev_mean")) * 100, digits))
      .withColumn("flag_mean",
        when(col("rel_change_mean") > relThreshold, 1).otherwise(0))
      .filter(col("prev_mean").isNotNull)
      .select(col(timeVar), col("varname"), col("mean"), col("prev_mean"),
        col("rel_change_mean"), col("flag_mean"))
  }
}
