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

  /** Pairwise set-similarity FROM SKETCHES: for every group pair
    * (a < b), the standard KMV Jaccard estimator — take the k smallest
    * distinct hashes of A∪B (computable from the two kept sets alone),
    * and estimate J(A,B) as the fraction of them present in BOTH kept
    * sets. This is how cross-source overlap is measured when the
    * sources are too big to intersect: the pairwise stage touches ONLY
    * k longs per group (n_groups² pairs of k-row frames), never the
    * corpus.
    *
    * The gate also publishes the EXACT Jaccard (same union-flag
    * algebra over the full distinct-hash frame) as self-validation —
    * the artifact shows estimate-vs-truth per pair. That exact path is
    * group-count-bounded (the union-all frame is ≤ n_groups × the hash
    * frame), fine at any gate SF; a 100 TB deployment drops the exact
    * columns and keeps the k-row algebra — the point of the sketch.
    *
    * NULL groups drop out of the pair space (`a < b` is NULL-false in
    * both engines); ties cannot exist (hashes are distinct per pair by
    * construction).
    */
  def kmvJaccard(df: DataFrame, groupCol: String, valueCol: String,
                 k: Int): DataFrame = {
    val hashes = graft.config.Checkpoints.cut(
      distinctHashes(df, groupCol, valueCol))
    val sketches = keptHashes(hashes, groupCol, k)
    // union-with-membership-flags per (a, b) pair, a < b
    def pairUnion(rows: DataFrame): DataFrame = {
      val names = rows.select(col(groupCol).as("g")).distinct()
      val aSide = rows
        .select(col(groupCol).as("src_a"), col("h"),
          lit(1).as("in_a"), lit(0).as("in_b"))
        .join(names.select(col("g").as("src_b")), col("src_a") < col("src_b"))
      val bSide = rows
        .select(col(groupCol).as("src_b"), col("h"),
          lit(0).as("in_a"), lit(1).as("in_b"))
        .join(names.select(col("g").as("src_a")), col("src_a") < col("src_b"))
      aSide.unionByName(bSide)
        .groupBy(col("src_a"), col("src_b"), col("h"))
        .agg(max(col("in_a")).as("ia"), max(col("in_b")).as("ib"))
    }
    // sketch estimate: k smallest of the pair union, fraction in both
    val w = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))
    val sk = pairUnion(sketches)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).cast("int").as("k_used"),
        sum(col("ia") * col("ib")).as("n_common"))
    // exact validation: same algebra over the full hash frame
    val ex = pairUnion(hashes)
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("ia") * col("ib")).as("n_inter"),
        count(lit(1)).as("n_union"))
    sk.join(ex, Seq("src_a", "src_b"))
      .select(col("src_a"), col("src_b"), col("k_used"), col("n_common"),
        (col("n_common").cast("double") / col("k_used")).as("j_est"),
        (col("n_inter").cast("double") / col("n_union")).as("j_exact"))
  }

  /** ONE maintenance step of a LIVE sketch — the streaming/crawl-loop
    * form (shared verbatim by the batch loop and the foreachBatch
    * stream, the incrementalStep discipline): fold a new batch into the
    * kept-set state. The batch's own k-minima are taken FIRST (so the
    * union is ≤ 2k rows per group, never state+batch), then the merged
    * k-minima re-taken — exactly the [[kmvMerge]] algebra, so
    * state-after-N-steps == the one-pass sketch of everything seen
    * (merge==rebuild, the property the stream gate is oracled against).
    * State is (group, h): k longs per group, the whole point.
    */
  def mergeStep(state: DataFrame, batch: DataFrame, groupCol: String,
                valueCol: String, k: Int): DataFrame =
    keptHashes(
      keptHashes(distinctHashes(batch, groupCol, valueCol), groupCol, k)
        .unionByName(state).distinct(),
      groupCol, k)

  /** Publish the sketch row from kept-set state: under k kept hashes
    * the kept set IS the exhaustive distinct set, so n_kept doubles as
    * the exact count — the state-derivable subset of [[kmvSketch]]'s
    * columns (exact n_hashes above k would need unbounded state, which
    * is what the sketch exists to avoid).
    */
  def publishSketch(state: DataFrame, groupCol: String, k: Int): DataFrame =
    state.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("int").as("n_kept"), max(col("h")).as("kth_min"))
      .select(col(groupCol), col("n_kept"), col("kth_min"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit(estNumerator(k)) / col("kth_min").cast("double"))
          .as("est_distinct"))

  /** Empty kept-set state to seed a sketch maintenance loop. */
  def emptyState(spark: org.apache.spark.sql.SparkSession,
                 groupCol: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField(groupCol, StringType),
        StructField("h", LongType))))
  }

  /** Oracle for the STREAM gate: [[kmvSketchDuckdbSql]] minus the
    * unbounded-state n_hashes column (count-below-k doubles as exact).
    */
  def kmvSketchStreamDuckdbSql(table: String, groupCol: String,
                               valueCol: String, k: Int): String =
    s"""WITH h AS (
          SELECT DISTINCT $groupCol AS grp,
                 ${MinHashSpec.duckFingerprint62Sql(valueCol)} AS h
          FROM $table WHERE $valueCol IS NOT NULL
        ), ranked AS (
          SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
          FROM h
        )
        SELECT grp AS $groupCol,
               cast(least(count(*), $k) as int) AS n_kept,
               max(CASE WHEN rn <= $k THEN h END) AS kth_min,
               CASE WHEN count(*) < $k THEN cast(count(*) as double)
                    ELSE ${estNumerator(k)}
                         / cast(max(CASE WHEN rn <= $k THEN h END) as double)
               END AS est_distinct
        FROM ranked GROUP BY grp"""

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

  /** Oracle for [[kmvJaccard]]: the identical union-flag algebra over
    * kept sets (estimate) and the full hash frame (exact validation).
    */
  def kmvJaccardDuckdbSql(table: String, groupCol: String, valueCol: String,
                          k: Int): String =
    s"""WITH h AS (
          SELECT DISTINCT $groupCol AS grp,
                 ${MinHashSpec.duckFingerprint62Sql(valueCol)} AS h
          FROM $table WHERE $valueCol IS NOT NULL
        ), ranked AS (
          SELECT grp, h, row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
          FROM h
        ), kept AS (
          SELECT grp, h FROM ranked WHERE rn <= $k
        ), names AS (
          SELECT DISTINCT grp FROM kept
        ), su AS (
          SELECT a.grp AS src_a, n.grp AS src_b, a.h, 1 AS in_a, 0 AS in_b
          FROM kept a JOIN names n ON a.grp < n.grp
          UNION ALL
          SELECT n.grp, b.grp, b.h, 0, 1
          FROM kept b JOIN names n ON n.grp < b.grp
        ), sg AS (
          SELECT src_a, src_b, h, max(in_a) AS ia, max(in_b) AS ib
          FROM su GROUP BY 1, 2, 3
        ), sx AS (
          SELECT *, row_number() OVER (PARTITION BY src_a, src_b ORDER BY h)
                    AS rn
          FROM sg
        ), sk AS (
          SELECT src_a, src_b,
                 cast(count(*) as int) AS k_used,
                 cast(sum(ia * ib) as bigint) AS n_common
          FROM sx WHERE rn <= $k GROUP BY 1, 2
        ), eu AS (
          SELECT a.grp AS src_a, n.grp AS src_b, a.h, 1 AS in_a, 0 AS in_b
          FROM h a JOIN names n ON a.grp < n.grp
          UNION ALL
          SELECT n.grp, b.grp, b.h, 0, 1
          FROM h b JOIN names n ON n.grp < b.grp
        ), eg AS (
          SELECT src_a, src_b, h, max(in_a) AS ia, max(in_b) AS ib
          FROM eu GROUP BY 1, 2, 3
        ), ex AS (
          SELECT src_a, src_b,
                 cast(sum(ia * ib) as bigint) AS n_inter,
                 cast(count(*) as bigint) AS n_union
          FROM eg GROUP BY 1, 2
        )
        SELECT sk.src_a, sk.src_b, sk.k_used, sk.n_common,
               cast(sk.n_common as double) / sk.k_used AS j_est,
               cast(ex.n_inter as double) / ex.n_union AS j_exact
        FROM sk JOIN ex ON ex.src_a = sk.src_a AND ex.src_b = sk.src_b"""

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
