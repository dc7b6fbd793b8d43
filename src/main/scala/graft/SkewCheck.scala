package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Skew

/** Skew demonstration (SURVEY §9 roadmap): a zipf-style fact (40% of all
  * rows on ONE hot key, rest uniform over 100k keys) joined to a
  * broadcast-ineligible dim, three ways:
  *   1. plain sort-merge join, AQE off — the hot key lands in one task;
  *   2. AQE skew-join — runtime split of the oversized partition;
  *   3. [[Skew.saltedJoin]] — explicit salt spread, for the cases AQE
  *      can't touch (e.g. a join feeding a stateful op).
  * All three must return identical row counts; the timings show the
  * mitigation. Usage: runMain graft.SkewCheck [rows]
  */
object SkewCheck {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = Tables.session("graft-skew", cores = 32)
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic zipf-ish fact: 40% of ids map to key 0
    spark.range(rows).select(
        when(pmod(col("id"), lit(5)) < 2, 0L)
          .otherwise(pmod(hash(col("id")), lit(100000)).cast("long")).as("k"),
        (col("id") % 1000).as("v"))
      .write.mode("overwrite").parquet("target/skew/fact.parquet")
    spark.range(100000).select(col("id").as("k"), (col("id") * 2).as("attr"))
      .write.mode("overwrite").parquet("target/skew/dim.parquet")
    val fact = spark.read.parquet("target/skew/fact.parquet")
    val dim = spark.read.parquet("target/skew/dim.parquet")

    // force the shuffle-join path: the dim is "too big to broadcast"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def consume(df: DataFrame): Long =
      df.agg(count(lit(1)).as("n"), sum(col("v") + col("attr")))
        .collect().head.getLong(0)
    def time(tag: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  ($n rows)")
      n
    }

    // warm the IO path once
    consume(fact.join(dim, "k")): Unit

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val a = time("plain sort-merge, AQE off") { consume(fact.join(dim, "k")) }

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // local-scale thresholds so the runtime splitter triggers on ~100 MB
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    val b = time("AQE skew-join") { consume(fact.join(dim, "k")) }

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val c = time("Skew.saltedJoin (AQE off)") { consume(Skew.saltedJoin(fact, dim, "k")) }

    assert(a == b && b == c, s"row counts diverged: $a / $b / $c")
    spark.stop()
  }
}
