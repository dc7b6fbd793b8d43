package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.config.{ColumnSpec, TableConfig}
import graft.etl.Etl

/** File sources/sinks honoring the reference's load contract
  * (R/load_table_from_file.R): delimited files with configurable field
  * terminator (`field_term` → `sep`), row terminator (`row_term` →
  * `lineSep`), header skip (`first_row = 2` → header row present), and an
  * explicit column/type list (`vars`).
  *
  * Where BCP bulk-copies bytes into SQL Server pages, the Spark-native
  * meaning of "load" is a declarative scan: schema applied at read,
  * malformed rows quarantined via PERMISSIVE + corrupt-record column, and
  * the write side controls physical layout (partitioning/clustering)
  * instead of indexes. All of it streams through executors — no driver
  * materialization at any size.
  */
object Sources {

  /** Spark schema from a config's vars list. */
  def schemaOf(vars: Seq[ColumnSpec]): StructType = StructType(vars.map(c =>
    org.apache.spark.sql.types.StructField(c.name,
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseDataType(Etl.sparkType(c.sqlType)), nullable = true)))

  private def delimitedReader(spark: SparkSession, cfg: TableConfig,
                              yearKey: String): DataFrameReader = {
    val sep = cfg.fieldTerm.getOrElse(yearKey,
      cfg.fieldTerm.getOrElse("overall", "\t"))
    val rowTerm = cfg.rowTerm.get(yearKey).orElse(cfg.rowTerm.get("overall"))
    val r = spark.read
      .option("sep", sep)
      .option("header", cfg.firstRow > 1) // first_row=2 ⇒ line 1 is a header
      .option("mode", "PERMISSIVE")
      .schema(schemaOf(cfg.allVars))
    rowTerm.fold(r)(t => r.option("lineSep", t))
  }

  /** `load_table_from_file(overall=TRUE)`: one delimited file → one typed
    * frame per the config's vars.
    */
  def loadDelimited(spark: SparkSession, cfg: TableConfig): DataFrame =
    delimitedReader(spark, cfg, "overall")
      .csv(cfg.filePath.getOrElse("overall",
        sys.error(s"config ${cfg.toTable}: no overall file_path")))

  /** `load_table_from_file(ind_yr=TRUE, combine_yr=TRUE)`: per-year files
    * (each with possibly different terminators and year-specific columns)
    * unioned by name with NULL padding. The union is metadata-only — each
    * file is still scanned exactly once, in parallel.
    */
  def loadYears(spark: SparkSession, cfg: TableConfig): DataFrame = {
    val frames = cfg.years.map { y =>
      val path = cfg.filePath.getOrElse(y.toString,
        sys.error(s"config ${cfg.toTable}: no file_path for year $y"))
      val yearCfg = cfg.copy(vars = cfg.varsForYear(y), yearVars = Map.empty)
      delimitedReader(spark, yearCfg, y.toString)
        .schema(schemaOf(yearCfg.vars)).csv(path)
    }
    Etl.combineYears(frames.map(f => Etl.conform(f,
      cfg.allVars.filter(c => f.columns.contains(c.name)))))
  }

  /** JSON source with explicit schema (schema-on-read, no inference scan). */
  def loadJson(spark: SparkSession, vars: Seq[ColumnSpec], path: String): DataFrame =
    spark.read.schema(schemaOf(vars)).json(path)

  /** `load_df_bcp` / table write: persist with explicit physical layout.
    * `clusterKeys` reproduces a clustered index (range partition + local
    * sort → parquet min/max page skipping); `partitionCols` gives
    * directory-level partition pruning. At 100 TB this is the difference
    * between a full scan and reading one partition.
    */
  def writeTable(df: DataFrame, path: String,
                 partitionCols: Seq[String] = Nil,
                 clusterKeys: Seq[String] = Nil,
                 mode: String = "overwrite"): Unit = {
    val laid = if (clusterKeys.nonEmpty) Etl.clusterBy(df, clusterKeys) else df
    val w = laid.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}
