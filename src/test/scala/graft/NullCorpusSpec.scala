package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Null-corpus robustness sweep: a production crawl WILL deliver docs
  * with missing, empty, or whitespace-only text, and at 100 TB a single
  * unguarded NPE (or a codegen null-deref in a native expression) kills
  * an hours-long job. The targeted NULL-text-contract specs (TextDedup/
  * Streaming) pin the row-accounting semantics for the ops where null
  * handling is part of the CONTRACT; this suite pins the weaker but
  * universal property for the whole corpus surface: every batch query
  * that reads the documents table must EXECUTE — no exception, no
  * codegen crash — when the corpus contains hostile text rows.
  *
  * The sweep discovers the surface from the plans themselves (any
  * query whose analyzed plan scans the staged documents.parquet, plus
  * the zst-ingest gates whose builders stage FROM it), so a new
  * documents operator is swept automatically.
  */
class NullCorpusSpec extends SparkSpec {

  /** sf0.001 with three hostile rows appended to documents: null text,
    * empty text, whitespace-only text. All other tables symlink to the
    * real sf dir.
    */
  private lazy val staged: String = {
    val dir = tempDir("graft_nullcorpus_")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
      .head().getLong(0)
    val hostile = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(maxId + 1, null, "en", "hostile", 0L),
        Row(maxId + 2, "", "en", "hostile", 0L),
        Row(maxId + 3, "   ", "en", "hostile", 3L)),
      docs.schema)
    docs.unionByName(hostile).coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    Files.list(Paths.get(sfDir)).forEach { p =>
      val name = p.getFileName.toString
      if (name != "documents.parquet")
        Files.createSymbolicLink(Paths.get(dir, name), p): Unit
    }
    dir
  }

  private def readsStagedDocuments(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collect {
      case r: LogicalRelation => r.relation match {
        case h: HadoopFsRelation => h.location.rootPaths
          .exists(_.toString.contains(s"$staged/documents.parquet"))
        case _ => false
      }
    }.exists(identity)

  test("every documents-reading batch query executes on a corpus with " +
    "null/empty/whitespace text") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("stream_"))
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var swept = 0
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, staged)
        // zst gates read staged shards, not documents.parquet, but their
        // builders stage FROM the hostile corpus — always execute them.
        if (readsStagedDocuments(df) || name.contains("zst")) {
          swept += 1
          df.queryExecution.toRdd.count(): Unit
        }
      } catch {
        case e: Throwable =>
          failures += s"$name: ${e.getClass.getSimpleName} ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1)
              .mkString}"
      }
    }
    // the documents surface is ~half the suite; a sweep that silently
    // matched nothing would be a green lie
    assert(swept >= 40, s"sweep matched only $swept queries — " +
      "discovery broke, not the operators")
    assert(failures.isEmpty,
      s"null-hostile corpus crashed ${failures.size} queries:\n" +
        failures.mkString("\n"))
  }
}


