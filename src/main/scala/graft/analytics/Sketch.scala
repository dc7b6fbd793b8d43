package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.MinHashSpec

/** KMV (k-minimum-values) distinct-count sketches — the streaming/
  * mergeable cardinality estimator (Bar-Yossef et al. 2002; the
  * "bottom-k" sketch): keep the k smallest DISTINCT hash values of a
  * column; with hashes uniform on [0, M), the (k)th smallest value h(k)
  * estimates the distinct count as (k-1)·M / h(k).
  *
  * Why this exists next to exact `count(distinct …)`: at 100 TB the
  * exact count shuffles every distinct value; the sketch's state is k
  * longs PER GROUP regardless of input size, partial-aggregates
  * map-side (the bounded-heap `topk_by` path), and — the property that
  * makes it an infrastructure primitive — two sketches MERGE by taking
  * the k smallest of their union, so per-partition / per-day / per-source
  * sketches roll up without touching the raw data again
  * ([[kmvMerge]] gates exactly that: merged-from-parts == direct).
  *
  * Everything is engine-exact, not approximately compared: the hash is
  * the repo's 62-bit md5 fingerprint ([[MinHashSpec.fingerprint62Expr]],
  * bit-identical in DuckDB), ordering/tie-breaks are on the exact BIGINT
  * hash, and the estimate is one IEEE division of exactly-representable
  * operands — so the ORACLE replays the sketch value for value. Like the
  * reference's QA counts (apde.etl etl_qa_run_pipeline.R's distinct
  * checks), but in sketch form for the scale where exact is a shuffle
  * too far.
  */
object Sketch {

  /** The fp62 hash space: hashes live in [0, 2^63). Exactly 2^63 as a
    * double; shared verbatim with the DuckDB oracle.
    */
  val M: Double = 9223372036854775808.0 // 2^63

  /** Estimate numerator (k-1)·M, precomputed ONCE driver-side so both
    * engines consume the identical double literal (k-1 has ≤ 6 bits for
    * any practical k, so the product is exact).
    */
  def estNumerator(k: Int): Double = (k - 1).toDouble * M

  /** Per-group KMV sketch of `valueCol`'s distinct cardinality:
    * (group, n_hashes, n_kept, kth_min, est_distinct).
    *
    * Plan shape (the part that must survive 100×): one shuffle to dedup
    * (group, hash) — partial-aggregated map-side, so the exchange carries
    * distinct pairs, not rows — then ONE bounded-heap aggregate
    * (`topk_by`, O(k) state per group, k rows per (group, partition) on
    * the wire). The window fallback (no extension registered) sorts each
    * group's distinct hashes — value-identical, spec-pinned.
    *
    * Groups with fewer than k distinct hashes report the EXACT count as
    * the estimate (the sketch is lossless below k — standard KMV).
    * NULL values are excluded on both engines (a NULL hashes to NULL and
    * is no observation of any value).
    */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
                k: Int): DataFrame =
    finishSketch(distinctHashes(df, groupCol, valueCol), groupCol, k,
      useNative = df.sparkSession.catalog.functionExists("topk_by"))

  /** Spec hook: run the window-ranking fallback even when the session
    * registered the bounded-heap aggregate (value-identity pinning).
    */
  private[graft] def kmvSketchFallback(df: DataFrame, groupCol: String,
                                       valueCol: String, k: Int): DataFrame =
    finishSketch(distinctHashes(df, groupCol, valueCol), groupCol, k,
      useNative = false)

  /** Mergeability gate: per-group sketches rolled up to ONE corpus
    * sketch two ways — (a) MERGED: union the per-group kept-hash sets
    * (k longs per group, never the raw data) and re-take the k smallest;
    * (b) DIRECT: sketch the whole corpus in one pass. Every global
    * k-minimum belongs to some group and is inside that group's local
    * k-minima, so (a) == (b) exactly — `merge_agrees` pins it row-wise.
    * This is the property that lets 100 TB be sketched as independent
    * per-partition passes + a k·n_groups-row reduce.
    */
  def kmvMerge(df: DataFrame, groupCol: String, valueCol: String,
               k: Int): DataFrame = {
    val native = df.sparkSession.catalog.functionExists("topk_by")
    // both roll-up paths read the distinct-hash frame — cut it so the
    // corpus is SCANNED ONCE (without the cut each branch re-derives
    // the dedup from parquet; at 100 TB that doubles the dominant cost)
    val hashes = graft.config.Checkpoints.cut(
      distinctHashes(df, groupCol, valueCol))
    // (a) per-group k-minima (k rows per group), then global k-minima of
    // the union. Hashes may repeat ACROSS groups (same value in two
    // sources) — the corpus sketch is over distinct hashes, so dedup.
    val merged = finishSketch(
      keptHashes(hashes, groupCol, k)
        .select(lit("corpus").as("scope"), col("h")).distinct(),
      "scope", k, native)
      .select(col("scope"), col("n_kept"), col("kth_min"),
        col("est_distinct").as("est_merged"))
    // (b) the one-pass corpus sketch
    val direct = finishSketch(
      hashes.select(lit("corpus").as("scope"), col("h")).distinct(),
      "scope", k, native)
      .select(col("scope").as("scope_d"), col("est_distinct").as("est_direct"))
    merged.join(direct, col("scope") === col("scope_d"))
      .select(col("scope"), col("n_kept"), col("kth_min"),
        col("est_merged"), col("est_direct"),
        when(col("est_merged") === col("est_direct"), 1).otherwise(0)
          .cast("int").as("merge_agrees"))
  }

  /** Distinct (group, fp62-hash) pairs — the sketch's input domain. */
  private def distinctHashes(df: DataFrame, groupCol: String,
                             valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(col(groupCol),
        expr(MinHashSpec.fingerprint62Expr(df.sparkSession, valueCol)).as("h"))
      .distinct()

  /** The k smallest hashes per group as rows (group, h) — the sketch
    * STATE, what a merge ships.
    */
  private[analytics] def keptHashes(hashes: DataFrame, groupCol: String,
                                    k: Int): DataFrame =
    if (hashes.sparkSession.catalog.functionExists("topk_by")) {
      // score = -h as double: cast is monotonic, so the heap order is
      // ascending h; equal-rounded doubles are resolved by the EXACT
      // long tiebreak (ascending) — the kept set is exactly the k
      // smallest hashes, bit-for-bit.
      hashes.groupBy(col(groupCol))
        .agg(expr(s"topk_by(-cast(h as double), h, struct(h), $k)").as("__top"))
        .select(col(groupCol), explode(col("__top.tiebreak")).as("h"))
    } else {
      val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
      hashes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).select(col(groupCol), col("h"))
    }

  /** Reduce distinct (group, h) pairs to the sketch row. One aggregate
    * carries both the exact distinct-hash count and the bounded heap.
    */
  private def finishSketch(hashes: DataFrame, groupCol: String,
                           k: Int, useNative: Boolean): DataFrame = {
    val agged =
      if (useNative)
        hashes.groupBy(col(groupCol))
          .agg(count(lit(1)).as("n_hashes"),
            expr(s"topk_by(-cast(h as double), h, struct(h), $k)").as("__top"))
          .select(col(groupCol), col("n_hashes"),
            size(col("__top")).cast("int").as("n_kept"),
            // best-first ordering: the LAST kept element is the kth
            // smallest hash — the sketch's threshold value
            element_at(col("__top"), size(col("__top")))
              .getField("tiebreak").as("kth_min"))
      else {
        val w = Window.partitionBy(col(groupCol)).orderBy(col("h"))
        hashes.withColumn("__rn", row_number().over(w))
          .groupBy(col(groupCol))
          .agg(count(lit(1)).as("n_hashes"),
            sum(when(col("__rn") <= k, 1).otherwise(0)).cast("int").as("n_kept"),
            max(when(col("__rn") <= k, col("h"))).as("kth_min"))
      }
    agged.select(col(groupCol), col("n_hashes"), col("n_kept"), col("kth_min"),
      when(col("n_hashes") < k, col("n_hashes").cast("double"))
        .otherwise(lit(estNumerator(k)) / col("kth_min").cast("double"))
        .as("est_distinct"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracle twins — generated from the SAME constants.
  // ------------------------------------------------------------------

  /** Oracle for [[kmvSketch]] over `table.valueCol` grouped by
    * `groupCol` (window formulation — value-identical to both Spark
    * paths by the keptHashes contract).
    */
  def kmvSketchDuckdbSql(table: String, groupCol: String, valueCol: String,
                         k: Int): String =
    s"""WITH h AS (
          SELECT DISTINCT $groupCol AS grp,
                 ${MinHashSpec.duckFingerprint62Sql(valueCol)} AS h
          FROM $table WHERE $valueCol IS NOT NULL
        ), ranked AS (
          SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
          FROM h
        )
        SELECT grp AS $groupCol,
               cast(count(*) as bigint) AS n_hashes,
               cast(least(count(*), $k) as int) AS n_kept,
               max(CASE WHEN rn <= $k THEN h END) AS kth_min,
               CASE WHEN count(*) < $k THEN cast(count(*) as double)
                    ELSE ${estNumerator(k)}
                         / cast(max(CASE WHEN rn <= $k THEN h END) as double)
               END AS est_distinct
        FROM ranked GROUP BY grp"""

  /** Oracle for [[kmvMerge]]: the same two roll-up paths in SQL. */
  def kmvMergeDuckdbSql(table: String, groupCol: String, valueCol: String,
                        k: Int): String =
    s"""WITH h AS (
          SELECT DISTINCT $groupCol AS grp,
                 ${MinHashSpec.duckFingerprint62Sql(valueCol)} AS h
          FROM $table WHERE $valueCol IS NOT NULL
        ), ranked AS (
          SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
          FROM h
        ), kept AS (
          SELECT DISTINCT h FROM ranked WHERE rn <= $k
        ), mranked AS (
          SELECT h, row_number() OVER (ORDER BY h) AS rn FROM kept
        ), merged AS (
          SELECT cast(least(count(*), $k) as int) AS n_kept,
                 max(CASE WHEN rn <= $k THEN h END) AS kth_min,
                 CASE WHEN count(*) < $k THEN cast(count(*) as double)
                      ELSE ${estNumerator(k)}
                           / cast(max(CASE WHEN rn <= $k THEN h END) as double)
                 END AS est_merged
          FROM mranked
        ), dh AS (
          SELECT DISTINCT h FROM h
        ), dranked AS (
          SELECT h, row_number() OVER (ORDER BY h) AS rn FROM dh
        ), direct AS (
          SELECT CASE WHEN count(*) < $k THEN cast(count(*) as double)
                      ELSE ${estNumerator(k)}
                           / cast(max(CASE WHEN rn <= $k THEN h END) as double)
                 END AS est_direct
          FROM dranked
        )
        SELECT 'corpus' AS scope, n_kept, kth_min, est_merged, est_direct,
               cast(CASE WHEN est_merged = est_direct THEN 1 ELSE 0 END as int)
                 AS merge_agrees
        FROM merged, direct"""
}
