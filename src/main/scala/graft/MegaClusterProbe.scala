package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: the LSH mega-duplicate-cluster bomb, measured. A corpus
  * carrying one boilerplate page m times puts all m copies in every
  * band bucket, so raw `candidatePairs` emits C(m,2) pairs per band
  * before the distinct. This probe times three forms on the same
  * corpus (m-copy cluster + `nRest` distinct docs):
  *
  *   raw      — candidatePairs on the full corpus (the bomb: pair
  *              count grows quadratically in m)
  *   capped   — candidatePairs(maxBucket = 64) (the residual guard for
  *              mega NEAR-dup clusters)
  *   cascade  — cleanCorpus (exact stage collapses the cluster to one
  *              representative before banding — the shipped default)
  *
  * Usage: runMain graft.MegaClusterProbe [mList] [nRest] [reps]
  * `mList` comma list of cluster sizes (default 500,1000,2000,4000).
  * Prints one line per (form, m): pairs emitted and min seconds.
  * The 100 TB claim under test: raw grows ~m², capped and cascade stay
  * flat — at crawl-scale m the raw form is not runnable at all.
  */
object MegaClusterProbe {
  def main(args: Array[String]): Unit = {
    val mList = args.headOption.getOrElse("500,1000,2000,4000")
      .split(",").map(_.trim.toInt).toSeq
    val nRest = args.lift(1).map(_.toInt).getOrElse(2000)
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftFunctions.register)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    for (m <- mList) {
      // m identical docs + nRest distinct ones (each with enough
      // distinct shingles that no two share a band bucket)
      val docs = spark.range(m)
        .select(col("id").as("doc_id"),
          lit("the same boilerplate page body repeated verbatim " +
            "across the crawl corpus").as("text"))
        .unionByName(spark.range(nRest)
          .select((col("id") + 1000000L).as("doc_id"),
            concat_ws(" ", (0 until 12).map(j =>
              concat(lit(s"w$j"), (col("id") * 13 + j * 7))): _*)
              .as("text")))
        .localCheckpoint()

      def time(label: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
        var pairs = -1L
        val secs = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          pairs = build.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        // `out` is candidate pairs for the two propose forms and
        // surviving docs for the cascade form
        println(f"[mega-cluster] m=$m%-6d $label%-8s out=$pairs%-10d ${secs}%.2f s")
      }
      time("raw") { dedup.MinHashSpec.candidatePairs(docs) }
      time("capped") { dedup.MinHashSpec.candidatePairs(docs, maxBucket = 64) }
      time("cascade") { dedup.Dedup.cleanCorpus(docs) }
    }
    spark.stop()
  }
}
