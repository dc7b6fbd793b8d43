package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: per-row cost of the sharded-Bloom probe as nShards grows
  * — the native `bloom_contains_sharded` (reference-object dispatch,
  * O(1) per row / O(1) plan) vs the legacy when-chain (O(nShards)
  * compare walk, one binary plan literal per populated shard). Usage:
  *   runMain graft.BloomShardProbe [nCorpus] [nProbes] [reps] [shardList] [nativeOnly]
  * `shardList` is a comma list of shard counts (default 1,4,16,64);
  * append `nativeOnly` to skip the when-chain arm (at hundreds of
  * shards the chain takes minutes by construction — its cliff is
  * already demonstrated at 64).
  * Prints one line per (form, nShards): min seconds, ns/row, and the
  * count of binary literals in the optimized plan. The 100 TB claim
  * under test: native per-row cost is FLAT in nShards, plan literal
  * count stays 0.
  */
object BloomShardProbe {
  def main(args: Array[String]): Unit = {
    // the flag is position-independent — drop it from the positional
    // list so `... 3 nativeOnly` doesn't parse the literal as shardList
    val pos = args.filterNot(_ == "nativeOnly")
    val nCorpus = pos.headOption.map(_.toLong).getOrElse(2000000L)
    val nProbes = pos.lift(1).map(_.toLong).getOrElse(4000000L)
    val reps = pos.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(graft.functions.GraftFunctions.register)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus hash set: synthetic but the library's exact shape
    // (content_hash md5 strings); probes = 50% members, 50% fresh
    val hashes = spark.range(nCorpus)
      .select(md5(col("id").cast("string")).as("content_hash"))
      .localCheckpoint()
    val probes = spark.range(nProbes)
      .select(md5((col("id") % (2 * nCorpus)).cast("string"))
        .as("content_hash"))
      .localCheckpoint()
    val pv = xxhash64(col("content_hash"))

    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val shardCounts = pos.lift(3).map(_.split(",").toSeq.map(_.trim.toInt))
      .getOrElse(Seq(1, 4, 16, 64))
    val nativeOnly = args.contains("nativeOnly")
    for (nShards <- shardCounts) {
      val filters =
        if (nShards == 1)
          Array(graft.dedup.Dedup.buildBloom(hashes).get)
        else graft.dedup.Dedup.buildBloomSharded(hashes, nShards).get
      val forms = Seq(
        "native" -> ((f: Array[Array[Byte]]) =>
          graft.dedup.Dedup.shardedBloomProbe(spark, f, pv)),
        "chain " -> ((f: Array[Array[Byte]]) =>
          graft.dedup.Dedup.shardedBloomProbeWhenChain(f, pv)))
      for ((form, colOf) <- (if (nativeOnly) forms.take(1) else forms)) {
        val q = probes.filter(colOf(filters))
        val lits = q.queryExecution.optimizedPlan
          .flatMap(_.expressions).flatMap(_.collect {
            case l @ Literal(v, BinaryType) if v != null => l }).size
        // warmup once (codegen compile), then timed reps
        q.write.format("noop").mode("overwrite").save()
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          q.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        val best = times.min
        println(f"[bloomshard] $form nShards=$nShards%-3d min=$best%6.2fs " +
          f"ns/row=${best * 1e9 / nProbes}%7.1f planBinaryLits=$lits " +
          times.map(t => f"$t%.2f").mkString("reps=[", " ", "]"))
      }
    }
    spark.stop()
  }
}
