package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.MinHashSpec

/** Deterministic, cross-engine-reproducible sampling and dataset splits —
  * the selection layer of a training-data pipeline.
  *
  * `rand()`-based sampling is not replayable (a retry or a second engine
  * draws a different sample) and cannot be oracle-checked. These
  * operators derive the selection decision from a content hash of a key
  * column: the same row lands in the same sample/split on every run, in
  * every engine, at any parallelism. All are pure projections/filters —
  * no shuffle, scan-speed at 100 TB — and the hash is the md5-derived
  * cross-engine [[MinHashSpec.hpExpr]] family, so DuckDB reproduces the
  * exact row set.
  */
object Sampling {

  private val BUCKETS = 10000

  /** Hash bucket in [0, 10000) for a key column — the shared selection
    * coordinate for samples and splits.
    */
  private def bucket(df: DataFrame, keyCol: String): Column =
    expr(s"${MinHashSpec.hpExpr(df.sparkSession, s"cast($keyCol as string)")} % $BUCKETS")

  private def bucketSql(keyCol: String): String =
    s"(md5_number_lower(cast($keyCol as varchar)) % ${MinHashSpec.P}) % $BUCKETS"

  /** Deterministic Bernoulli sample: keep rows whose key-hash bucket
    * falls under `fraction`. Replayable and engine-independent, unlike
    * `df.sample` (seeded per-partition) or SQL `TABLESAMPLE`.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(bucket(df, keyCol) < (fraction * BUCKETS).round)

  /** Stratified deterministic sample: per-stratum fractions (e.g. keep 5%
    * of English but 100% of low-resource languages — the standard
    * corpus-balancing move). Strata absent from `rates` keep
    * `defaultRate`. One scan, no shuffle; the rate map is a broadcast
    * literal CASE.
    */
  def stratifiedHashSample(df: DataFrame, strataCol: String, keyCol: String,
                           rates: Map[String, Double],
                           defaultRate: Double = 0.0): DataFrame = {
    // thresholds rounded ONCE on the driver — the SQL twin embeds the
    // identical integer literals, so the row sets match exactly
    val cutCol = rates.foldLeft(lit((defaultRate * BUCKETS).round)) {
      case (acc, (s, r)) =>
        when(col(strataCol) === s, lit((r * BUCKETS).round)).otherwise(acc)
    }
    df.filter(bucket(df, keyCol) < cutCol)
  }

  /** Deterministic train/val/test assignment: weights are normalized and
    * laid end-to-end over the bucket space; each row's bucket picks its
    * split. Adds a `split` column — rows never move, so the split is
    * stable under reruns, appends, and engine changes.
    */
  def hashSplit(df: DataFrame, keyCol: String,
                weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "hashSplit: weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(f => (f * BUCKETS).round)
    val b = bucket(df, keyCol)
    val splitCol = weights.init.zipWithIndex.foldRight(lit(weights.last._1): Column) {
      case (((name, _), i), acc) => when(b < cuts(i + 1), lit(name)).otherwise(acc)
    }
    df.withColumn("split", splitCol)
  }

  /** DuckDB oracle twin of [[hashSample]] (as a WHERE fragment). */
  def hashSampleSql(keyCol: String, fraction: Double): String =
    s"${bucketSql(keyCol)} < ${(fraction * BUCKETS).round}"

  /** DuckDB oracle twin of [[stratifiedHashSample]]'s filter. */
  def stratifiedSampleSql(strataCol: String, keyCol: String,
                          rates: Map[String, Double],
                          defaultRate: Double = 0.0): String = {
    val cases = rates.map { case (s, r) =>
      s"WHEN $strataCol = '$s' THEN ${(r * BUCKETS).round}"
    }.mkString(" ")
    s"${bucketSql(keyCol)} < (CASE $cases ELSE ${(defaultRate * BUCKETS).round} END)"
  }

  /** DuckDB oracle twin of [[hashSplit]]'s split expression. */
  def hashSplitSql(keyCol: String, weights: Seq[(String, Double)]): String = {
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .map(f => (f * BUCKETS).round)
    val cases = weights.init.zipWithIndex.map { case ((name, _), i) =>
      s"WHEN ${bucketSql(keyCol)} < ${cuts(i + 1)} THEN '$name'"
    }.mkString(" ")
    s"(CASE $cases ELSE '${weights.last._1}' END)"
  }
}
