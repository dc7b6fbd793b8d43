package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.{CredentialProvider, EnvCredentials}

/** JDBC warehouse connectivity — the reference's `create_db_connection`
  * (R/create_db_connection.R:1) and `load_table_from_sql`
  * (R/load_table_from_sql.R:1) surface, re-expressed Spark-first. The
  * reference drives a live MS SQL Server over odbc and pulls whole
  * tables into R memory; the Spark shape is the opposite of that and
  * is the point of this module:
  *
  *  - READS are PARTITIONED (`spark.read.jdbc` with a numeric split
  *    column): N executors each open their own connection and pull a
  *    disjoint key range in parallel — the table never lands on one
  *    node. Split bounds are discovered with one pushed-down
  *    min/max query (1 row to the driver) when the caller has none.
  *  - Filters and column pruning PUSH DOWN into the database
  *    (`PushedFilters` on the JDBCRelation scan — the warehouse does
  *    the cheap selection, Spark moves only surviving rows).
  *  - WRITES batch through `df.write.jdbc` with explicit column DDL
  *    where the dialect's default mapping is wrong for analytics
  *    (Derby/SQLServer map StringType to LOB types; a
  *    `createTableColumnTypes` override keeps them comparable
  *    VARCHARs).
  *  - CREDENTIALS resolve through the [[graft.etl.CredentialProvider]]
  *    contract at connection time (the keyring analogue,
  *    R/apde_keyring.R:19) — the engine never stores a secret.
  *
  * Tested end-to-end against embedded Apache Derby (bundled with
  * Spark), which is a real JDBC database: the gate stages a table into
  * it and reads it back partitioned, value-lossless against the
  * parquet oracle — the same proof shape as the CSV round trip (A10).
  */
object Jdbc {

  /** A resolved connection: URL + properties with credentials applied.
    * `create_db_connection` analogue — `userKey`/`passwordKey` are
    * CREDENTIAL KEYS looked up in the provider at call time, never
    * literal secrets in code or config.
    */
  case class DbConnection(url: String, props: java.util.Properties)

  def createDbConnection(url: String,
                         userKey: Option[String] = None,
                         passwordKey: Option[String] = None,
                         credentials: CredentialProvider = EnvCredentials,
                         extra: Map[String, String] = Map.empty)
      : DbConnection = {
    val p = new java.util.Properties()
    def put(prop: String, key: String): Unit =
      credentials.credential(key) match {
        case Some(v) => p.setProperty(prop, v): Unit
        case None => sys.error(
          s"createDbConnection: credential '$key' not found in provider")
      }
    userKey.foreach(put("user", _))
    passwordKey.foreach(put("password", _))
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    DbConnection(url, p)
  }

  /** Connection props + the per-partition `fetchsize` row-batching
    * knob — the other dial every production JDBC pull sets (the
    * driver-default is often 0/streaming-off; thousands of rows per
    * round trip amortize the wire protocol without holding a partition
    * in memory — each Spark partition still streams row-by-row).
    */
  private def propsWith(conn: DbConnection, fetchSize: Int)
      : java.util.Properties = {
    val p = new java.util.Properties()
    p.putAll(conn.props)
    p.setProperty("fetchsize", fetchSize.toString)
    p
  }

  private def boundsRow(spark: SparkSession, conn: DbConnection,
                        table: String, column: String)
      : org.apache.spark.sql.Row = {
    // quote through the URL's dialect: Spark's own writer CREATEs
    // tables with quoted (case-preserved) identifiers, so an unquoted
    // name in raw SQL case-folds on the server and misses the column
    val q = org.apache.spark.sql.jdbc.JdbcDialects.get(conn.url)
      .quoteIdentifier(column)
    val r = spark.read.jdbc(conn.url,
      s"(SELECT MIN($q) AS mn, MAX($q) AS mx FROM $table) AS b",
      conn.props).first()
    require(!r.isNullAt(0) && !r.isNullAt(1),
      s"columnBounds: $table.$column has no non-null values to split on")
    r
  }

  /** Split-bound discovery: ONE pushed-down min/max aggregate — the
    * database scans, one row crosses the wire. Bounded by contract.
    */
  def columnBounds(spark: SparkSession, conn: DbConnection, table: String,
                   column: String): (Long, Long) = {
    val r = boundsRow(spark, conn, table, column)
    (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue())
  }

  /** [[columnBounds]] for DATE/TIMESTAMP split columns: the same one
    * pushed-down min/max, returned as the string forms Spark's jdbc
    * reader takes for `lowerBound`/`upperBound` on a temporal
    * partition column.
    */
  def columnBoundsDate(spark: SparkSession, conn: DbConnection,
                       table: String, column: String): (String, String) = {
    val r = boundsRow(spark, conn, table, column)
    (r.get(0).toString, r.get(1).toString)
  }

  /** `load_table_from_sql` analogue: a PARTITIONED parallel read of a
    * table (or any `(SELECT ...) AS q` derived table) split on a
    * numeric column. Without `partitionCol` the read degrades to the
    * single-connection shape the reference always pays — callers at
    * scale must pass one.
    */
  def loadTableFromSql(spark: SparkSession, conn: DbConnection,
                       table: String,
                       partitionCol: Option[String] = None,
                       numPartitions: Int = 8,
                       bounds: Option[(Long, Long)] = None,
                       fetchSize: Int = 1000): DataFrame =
    partitionCol match {
      case Some(c) =>
        val (lo, hi) = bounds.getOrElse(columnBounds(spark, conn, table, c))
        spark.read.jdbc(conn.url, table, c, lo, hi,
          math.max(1, numPartitions), propsWith(conn, fetchSize))
      case None =>
        spark.read.jdbc(conn.url, table, propsWith(conn, fetchSize))
    }

  /** The DATE-keyed partitioned read (VERDICT-r14 item 3): the
    * reference's incremental workflows key on dates
    * (R/load_table_from_sql.R's truncate_date), and a warehouse table
    * with no numeric surrogate key cannot use the numeric split above.
    * Spark's jdbc reader takes date/timestamp bounds natively (since
    * 2.4): N date ranges = N partitions, each its own connection, range
    * predicates compiled by the dialect and evaluated IN the database.
    * Bounds are discovered with the same one-row min/max when absent.
    */
  def loadTableFromSqlByDate(spark: SparkSession, conn: DbConnection,
                             table: String, partitionCol: String,
                             numPartitions: Int = 8,
                             bounds: Option[(String, String)] = None,
                             fetchSize: Int = 1000): DataFrame = {
    val (lo, hi) = bounds.getOrElse(
      columnBoundsDate(spark, conn, table, partitionCol))
    val reader = spark.read.format("jdbc")
      .option("url", conn.url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lo)
      .option("upperBound", hi)
      .option("numPartitions", math.max(1, numPartitions))
      .option("fetchsize", fetchSize)
    val it = conn.props.stringPropertyNames().iterator()
    var r = reader
    while (it.hasNext) {
      val k = it.next(); r = r.option(k, conn.props.getProperty(k))
    }
    r.load()
  }

  /** The fully-general split: ONE PARTITION PER PREDICATE, each an
    * arbitrary WHERE fragment evaluated in the database — the shape
    * for split keys that are neither numeric nor uniform (skewed
    * regions, enum columns, hand-tuned date ranges). The caller owns
    * disjointness+coverage; [[datePredicates]] builds the
    * truncate_date-style date-range family with both guaranteed.
    */
  def loadTableFromSqlPredicates(spark: SparkSession, conn: DbConnection,
                                 table: String, predicates: Seq[String],
                                 fetchSize: Int = 1000): DataFrame = {
    require(predicates.nonEmpty,
      "loadTableFromSqlPredicates: at least one predicate")
    spark.read.jdbc(conn.url, table, predicates.toArray,
      propsWith(conn, fetchSize))
  }

  /** A column name as it must appear in raw SQL against this
    * connection's database: Spark's writer CREATEs tables with quoted
    * (case-preserved) identifiers, so an unquoted name in a predicate
    * case-folds on the server and misses the column. Pass the result
    * to [[datePredicates]].
    */
  def quoted(conn: DbConnection, column: String): String =
    org.apache.spark.sql.jdbc.JdbcDialects.get(conn.url)
      .quoteIdentifier(column)

  /** Disjoint, covering date-range predicates from sorted cutpoints —
    * the reference's truncate_date loop as a partition family:
    * cuts (c1..cn) -> [col < c1 (plus NULLs, Spark's own convention
    * for the first range partition), c1 <= col < c2, ..., col >= cn].
    */
  def datePredicates(column: String, cuts: Seq[String]): Seq[String] = {
    require(cuts.nonEmpty && cuts == cuts.sorted,
      s"datePredicates: cutpoints must be non-empty and sorted: $cuts")
    val first = s"$column < '${cuts.head}' OR $column IS NULL"
    val mids = cuts.sliding(2).collect { case Seq(a, b) =>
      s"$column >= '$a' AND $column < '$b'" }.toSeq
    val last = s"$column >= '${cuts.last}'"
    (first +: mids) :+ last
  }

  /** Batched JDBC write. `columnTypes` overrides the dialect's default
    * DDL mapping per column (e.g. `"l_returnflag VARCHAR(8)"` where the
    * Derby/SQLServer dialects would emit CLOB/NTEXT — LOB columns lose
    * comparability and index eligibility in the target warehouse).
    */
  def writeTable(df: DataFrame, conn: DbConnection, table: String,
                 mode: String = "overwrite",
                 batchSize: Int = 1000,
                 columnTypes: Option[String] = None): Unit = {
    val w = df.write.mode(mode)
      .option("batchsize", batchSize)
    columnTypes.foreach(ct => w.option("createTableColumnTypes", ct): Unit)
    w.jdbc(conn.url, table, conn.props)
  }

  /** The A3 incremental-load semantics over a LIVE warehouse table
    * (the reference's truncate_date loop against SQL Server): archive
    * rows strictly before the cutpoint come from the warehouse — the
    * predicate PUSHES DOWN, so the database only ships the archive
    * slice — and rows at/after the cutpoint come from the new batch.
    */
  def incrementalLoadJdbc(spark: SparkSession, conn: DbConnection,
                          table: String, newRows: DataFrame,
                          cutCol: String, cutpoint: String,
                          partitionCol: Option[String] = None,
                          numPartitions: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions.col
    val archive = loadTableFromSql(spark, conn, table, partitionCol,
      numPartitions)
      .filter(col(cutCol) < cutpoint)
    archive.unionByName(newRows.filter(col(cutCol) >= cutpoint))
  }
}
