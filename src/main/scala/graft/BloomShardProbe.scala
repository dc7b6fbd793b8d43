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
    // flags are position-independent — drop them all from the
    // positional list so `--screen`/`nativeOnly` with no explicit sizes
    // never parse as numbers (the ZstShardProbe discipline)
    val pos = args.filterNot(a => a.startsWith("--") || a == "nativeOnly")
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

    if (args.contains("--screen")) { screenArm(spark, nCorpus, nProbes, reps); spark.stop(); return }

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

  /** `--screen`: what the Bloom pre-filter actually BUYS at scale — the
    * shuffle it removes. The semi-join verify must shuffle every
    * incoming row's (id, 32-char md5) to the join; the broadcast Bloom
    * drops definite-new rows map-side BEFORE the exchange, so with a
    * mostly-fresh batch (the continuous-crawl steady state, ~1% dups
    * here) the verify shuffle carries ~fpp+dup_rate of the batch
    * instead of all of it. Reports wall time AND total shuffle-write
    * bytes (SparkListener task metrics) for the screen with the filter
    * vs crossed over to semi-join-only (maxBloomShards=0) — the two
    * regimes `exactScreenBloom` selects between.
    */
  private def screenArm(spark: SparkSession, nCorpus: Long, nProbes: Long,
                        reps: Int): Unit = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(
          s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten): Unit
    })
    val corpus = spark.range(nCorpus)
      .select(col("id").as("doc_id"),
        concat(lit("screen corpus doc "), col("id")).as("text"))
      .localCheckpoint()
    // ~1% of the incoming batch duplicates corpus docs; the rest is new
    val incoming = spark.range(nProbes)
      .select((col("id") + nCorpus).as("doc_id"),
        when(col("id") % 100 === 0,
            concat(lit("screen corpus doc "), col("id") % nCorpus))
          .otherwise(concat(lit("fresh incoming doc "), col("id")))
          .as("text"))
      .localCheckpoint()
    val hashes = graft.dedup.Dedup.corpusHashes(corpus).localCheckpoint()
    for ((label, maxShards) <- Seq("bloom   " -> 200, "semijoin" -> 0)) {
      val q = graft.dedup.Dedup.exactScreenBloom(hashes, incoming,
        nShards = 4, maxBloomShards = maxShards)
      q.write.format("noop").mode("overwrite").save() // warmup
      val runs = (1 to reps).map { _ =>
        // the listener bus is async (and private) — a short settle
        // window before reset/read is enough for a diagnostic
        Thread.sleep(500)
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        graft.dedup.Dedup.exactScreenBloom(hashes, incoming,
            nShards = 4, maxBloomShards = maxShards)
          .write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        (t, shuffleBytes.get())
      }
      val best = runs.minBy(_._1)
      println(f"[bloomscreen] $label min=${best._1}%6.2fs " +
        f"shuffleMB=${best._2 / 1e6}%8.1f " +
        runs.map(r => f"${r._1}%.2f/${r._2 / 1e6}%.0fMB").mkString("reps=[", " ", "]"))
    }
  }
}
