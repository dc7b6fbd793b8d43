package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // bind the trained-oracle stash to this run's dir: a side file left
    // by a run against another corpus must yield the fail sentinel,
    // not a stale contract
    SparkEntry.noteRunDir(sfDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftFunctions.register)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Remove any previous output for the query BEFORE running it: a query
    // that fails this run must not leave a stale parquet dir behind for
    // the driver to compare as if it were fresh.
    def deleteRecursively(f: java.io.File): Unit = {
      // null (not empty) on I/O/permission failure — don't NPE the run
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
      f.delete(): Unit
    }
    // Optional comma-separated filter for iterating on single gates
    // locally (SPARK_GRAFT_ONLY=a,b). The driver sets nothing → full run.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    var failures = List.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      val dest = new java.io.File(s"$outDir/$name")
      if (dest.exists()) deleteRecursively(dest)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failures ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // operators cache intermediates (LSH signatures, candidate pairs)
      // for their own plan; drop them between queries so a 100+-query run
      // doesn't accumulate dead cached blocks — including localCheckpoint
      // RDDs, which clearCache alone leaves resident (Bench's hygiene)
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // Failure marker: check.py (and any human) can see at a glance which
    // queries produced no output this run.
    Files.writeString(Paths.get(s"$outDir/FAILED.txt"),
      failures.reverse.mkString("\n"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
