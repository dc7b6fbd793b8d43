package graft.similarity

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline; the
  * hyperplane-LSH bucketed variant is the scale path (buckets bound the
  * candidate set, so the join cost is Σ bucket² instead of n²). Both use
  * pure `zip_with`/`aggregate` expressions — codegen'd, no UDFs.
  */
object Similarity {

  /** Cosine similarity between two array<float> columns, computed in
    * double precision in index order (matches DuckDB's list_dot_product
    * accumulation to the ulp for 64-dim vectors).
    */
  private def cosineExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)
       / (sqrt(aggregate(transform($a, x -> cast(x as double) * cast(x as double)), cast(0.0 as double), (acc, v) -> acc + v))
        * sqrt(aggregate(transform($b, x -> cast(x as double) * cast(x as double)), cast(0.0 as double), (acc, v) -> acc + v)))"""

  /** Brute-force cosine top-k: each probe vector against the full corpus.
    * The probe set is broadcast (it is small by definition); per-probe
    * ranking is a window over the probe partition — at scale Spark plans
    * partial top-k per partition before the final rank.
    */
  def cosineTopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 digits: Int = 4): DataFrame = {
    val probes = embeddings
      .filter(col(idCol).isInCollection(probeIds))
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"))
    val cands = embeddings.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"))
    val scored = cands.join(broadcast(probes), col("probe_id") =!= col("cand_id"))
      .withColumn("cosine", round(expr(cosineExpr("probe_vec", "cand_vec")), digits))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("cand_id"), col("cosine"), col("rnk"))
  }

  /** Random-hyperplane LSH bucketing: `nBits` deterministic pseudo-random
    * hyperplanes; bucket id = sign bits of the projections. Hyperplane
    * component (j, d) is +1/-1 from the parity of xxhash64(j * dim + d) —
    * reproducible with no stored model.
    */
  def lshBuckets(embeddings: DataFrame, nBits: Int = 8, dim: Int = 64,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bitCols = (0 until nBits).map { j =>
      val proj =
        s"""aggregate(zip_with($vecCol, transform(sequence(0, ${dim - 1}), d -> CASE WHEN xxhash64(${j} * $dim + d) % 2 = 0 THEN 1.0 ELSE -1.0 END),
           (x, r) -> cast(x as double) * r), cast(0.0 as double), (acc, v) -> acc + v)"""
      when(expr(proj) >= 0, lit(1L << j)).otherwise(lit(0L))
    }
    embeddings.withColumn("bucket", bitCols.reduce(_ + _))
  }

  /** ANN via LSH buckets: probes only compare against corpus vectors in
    * the same bucket. Returns per-probe top-k within bucket. Recall vs
    * [[cosineTopK]] is asserted in the spec, not oracle-gated.
    */
  def annTopK(embeddings: DataFrame, probeIds: Seq[Long], k: Int,
              nBits: Int = 8, dim: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding",
              digits: Int = 4): DataFrame = {
    val bucketed = lshBuckets(embeddings, nBits, dim, idCol, vecCol)
    val probes = bucketed.filter(col(idCol).isInCollection(probeIds))
      .select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"), col("bucket"))
    val cands = bucketed.select(col(idCol).as("cand_id"),
      col(vecCol).as("cand_vec"), col("bucket"))
    val scored = cands.join(broadcast(probes), Seq("bucket"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cosine", round(expr(cosineExpr("probe_vec", "cand_vec")), digits))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("probe_id"), col("cand_id"), col("cosine"), col("rnk"))
  }

  /** Embedding-cosine near-dup pairs: all pairs above `threshold`,
    * LSH-blocked so the pair space never materializes.
    */
  def cosineNearDup(embeddings: DataFrame, threshold: Double = 0.95,
                    nBits: Int = 8, dim: Int = 64,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    digits: Int = 4): DataFrame = {
    val bucketed = lshBuckets(embeddings, nBits, dim, idCol, vecCol)
    val a = bucketed.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = bucketed.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(expr(cosineExpr("vec_a", "vec_b")), digits))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
