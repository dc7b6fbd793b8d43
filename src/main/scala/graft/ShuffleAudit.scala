package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Shuffle-VOLUME regression gate: the bytes-level companion to
  * [[PlanAudit]]. PlanAudit pins plan STRUCTURE (scan/exchange counts);
  * this audit pins the currency that actually bounds a 100 TB run —
  * shuffle bytes written and input bytes read per query — via a
  * `SparkListener` summing stage-level task metrics. A query whose
  * shuffle volume grows past its recorded baseline (+25% and +8 MB of
  * headroom for compression/AQE jitter) fails the audit: an exchange
  * COUNT can stay flat while a projection regression silently widens
  * every shuffled row, and only a bytes gate catches that class.
  *
  * Usage:
  *   runMain graft.ShuffleAudit [sfDir]            — audit vs baseline
  *   runMain graft.ShuffleAudit --record [sfDir]   — (re)write baseline
  *
  * Scope notes:
  *  - stream_* gates ARE included: their micro-batch stages run in this
  *    JVM and the listener sums them like any other — the recorded
  *    number is the state-exchange volume of the whole replay.
  *  - Per-JVM staged inputs (streaming chunk dirs, zst shards, the
  *    prestaged dedup index) are built by the FIRST query that needs
  *    them, and that build is attributed to that query. A full sorted
  *    sweep stages deterministically, so record/check are comparable;
  *    a partial sweep (explicit query args would go here if added) is
  *    not, and the tool only runs full sweeps for exactly that reason.
  *  - Baselines are per-SF files (`shuffle_baseline_<sf>.tsv`); the
  *    committed artifact is sf0.1, the bench SF.
  *  - Input metrics count BOTH file scans and BlockManager reads of
  *    cached/localCheckpointed frames (Spark credits block reads to
  *    inputMetrics) — e.g. dedup_containment's ~1.3 M input rows over a
  *    5 k-doc table is the exploded shingle checkpoint consumed by its
  *    joins, not file re-scans. Input BYTES for vectorized parquet are
  *    additionally under-reported on local fs. Input columns are
  *    therefore informational; only shuffle bytes gate.
  */
object ShuffleAudit {

  /** Sums stage-completed task metrics; snapshot/delta per query. */
  final class MetricsListener extends SparkListener {
    val shuffleBytes = new AtomicLong
    val shuffleRows = new AtomicLong
    val inputBytes = new AtomicLong
    val inputRows = new AtomicLong
    val stages = new AtomicLong
    override def onStageCompleted(ev: SparkListenerStageCompleted): Unit = {
      val m = ev.stageInfo.taskMetrics
      if (m != null) {
        shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shuffleRows.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        inputBytes.addAndGet(m.inputMetrics.bytesRead)
        inputRows.addAndGet(m.inputMetrics.recordsRead)
        stages.incrementAndGet()
      }: Unit
    }
    def snapshot: Vector[Long] = Vector(shuffleBytes.get, shuffleRows.get,
      inputBytes.get, inputRows.get, stages.get)
  }

  /** Listener delivery is async; poll until the stage count has been
    * stable for two consecutive 100 ms windows (max 5 s). The audit
    * measures bytes, not time, so a fixed settle wait costs accuracy
    * nothing.
    */
  def settle(l: MetricsListener): Unit = {
    var last = -1L
    var stable = 0
    var waited = 0
    while (stable < 2 && waited < 50) {
      Thread.sleep(100)
      waited += 1
      val cur = l.stages.get
      if (cur == last) stable += 1 else { stable = 0; last = cur }
    }
  }

  case class Row(name: String, shuffleMb: Double, shuffleRows: Long,
                 inputMb: Double, inputRows: Long, stages: Long)

  def main(args: Array[String]): Unit = {
    val record = args.contains("--record")
    val sfDir = args.filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val sfTag = sfDir.split('/').last
    val baselinePath = s"shuffle_baseline_$sfTag.tsv"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Tables.session("graft-shuffle-audit", cores = cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val listener = new MetricsListener
    spark.sparkContext.addSparkListener(listener)

    val names = SparkEntry.queries.keys.toSeq.sorted
    val rows = names.map { n =>
      settle(listener)
      val before = listener.snapshot
      SparkEntry.queries(n)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      settle(listener)
      val d = listener.snapshot.zip(before).map { case (a, b) => a - b }
      // same block hygiene as Bench/PlanAudit: localCheckpoint RDDs
      // accumulate across 140 queries otherwise
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val r = Row(n, d(0) / 1e6, d(1), d(2) / 1e6, d(3), d(4))
      println(f"[shuffle-audit] ${r.name}%-36s shuffle ${r.shuffleMb}%9.2f MB" +
        f" (${r.shuffleRows}%9d rows)  input ${r.inputMb}%9.2f MB  " +
        f"stages ${r.stages}%3d")
      r
    }

    if (record) {
      val out = rows.map(r => f"${r.name}\t${r.shuffleMb}%.3f\t" +
          f"${r.shuffleRows}\t${r.inputMb}%.3f\t${r.inputRows}\t${r.stages}")
        .mkString("", "\n", "\n")
      Files.writeString(Paths.get(baselinePath), out)
      println(s"[shuffle-audit] recorded ${rows.size} rows to $baselinePath")
    } else {
      val baseline = Files.readAllLines(Paths.get(baselinePath))
        .toArray(Array.empty[String]).filter(_.nonEmpty).map(_.split("\t"))
        .map(a => a(0) -> a(1).toDouble).toMap
      var failed = 0
      rows.foreach { r =>
        baseline.get(r.name) match {
          case None =>
            println(s"[shuffle-audit] NEW ${r.name} — rerun with --record")
          case Some(b) if r.shuffleMb > b * 1.25 + 8.0 =>
            failed += 1
            println(f"[shuffle-audit] REGRESSED ${r.name}: " +
              f"${r.shuffleMb}%.2f MB shuffled (baseline $b%.2f)")
          case Some(b) if b > r.shuffleMb * 1.25 + 8.0 =>
            println(f"[shuffle-audit] improved ${r.name}: " +
              f"${r.shuffleMb}%.2f MB (was $b%.2f) — re-record to pin")
          case _ => ()
        }
      }
      println(s"[shuffle-audit] ${rows.size} queries, $failed regressed")
      if (failed > 0) sys.exit(1)
    }
    spark.stop()
  }
}
