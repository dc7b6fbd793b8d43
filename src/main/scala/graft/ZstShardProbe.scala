package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: read parallelism of the non-splittable jsonl.zst layout
  * as a function of SHARD COUNT — the F14 layout contract ("parallelism
  * = shard count, so corpora must arrive as many bounded files")
  * measured instead of asserted. Stages the sf documents at several
  * shard counts, then times a full read + aggregate pass (count +
  * sum(length(text)) forces every byte through decompression and JSON
  * parse). Usage:
  *   runMain graft.ZstShardProbe [sfDir] [reps] [shardList]
  * The scale claim under test: wall time falls ~linearly with shards
  * until shards ≈ cores (one task per shard; a single shard serializes
  * the whole corpus through one core).
  */
object ZstShardProbe {
  def main(args: Array[String]): Unit = {
    val pos = args.filterNot(_.startsWith("--"))
    val sfDir = pos.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = pos.lift(1).map(_.toInt).getOrElse(3)
    val shardList = pos.lift(2).map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(1, 4, 16, 32))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // replicate to make decompression+parse the dominant cost at local
    // SFs (sf0.1 is ~5k docs — too small to measure scheduling against).
    // Salt each replica's text: exact duplicates inside ONE zstd stream
    // compress ~6× better than the same bytes split across shards,
    // which would hand the single-shard arm 6× fewer compressed bytes
    // and poison the comparison
    val rep = pos.lift(3).map(_.toInt).getOrElse(60)
    val big = (1 to rep).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 1000000L))
        .withColumn("text",
          concat(col("text"), lit(s" replica-salt-$i-"),
            md5(concat(col("doc_id"), lit(i))))))
      .reduce(_.union(_)).localCheckpoint()
    val nDocs = big.count()
    for (n <- shardList) {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft_zstprobe_$n").toString
      graft.sources.Sources.writeJsonlZst(big.repartition(n), out)
      val t = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.sources.Sources.readJsonl(spark, out, schema)
          .agg(count(lit(1)), sum(length(col("text"))))
          .collect(): Unit
        (System.nanoTime() - t0) / 1e9
      }.min
      val files = Option(new java.io.File(out).listFiles())
        .getOrElse(Array.empty).filter(_.getName.endsWith(".zst"))
      val mb = files.map(_.length()).sum / 1e6
      println(f"[zstprobe] shards=$n%3d files=${files.length}%3d " +
        f"zstMB=$mb%7.1f docs=$nDocs min_sec=$t%6.2f " +
        f"docs_per_sec=${nDocs / t}%9.0f")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(new java.io.File(out))
    }
    spark.stop()
  }
}
