package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins and aggregations.
  *
  * AQE's skew-join handles most cases at runtime (enabled in every graft
  * session); these helpers cover the cases AQE can't: aggregation skew
  * (one giant group) and broadcast-ineligible skewed joins where the
  * skewed keys are known or discoverable.
  *
  * Salting trades one shuffle for two balanced ones: the hot key's rows
  * spread over `saltFactor` sub-keys, partial-aggregate/join there, then
  * recombine. Results are exactly equal to the unsalted operation.
  */
object Skew {

  /** Two-phase (salted) aggregation: groupBy (keys + salt) with partial
    * aggs, then re-aggregate over keys. For algebraic aggregates
    * (count/sum/min/max) the recombination is exact. The salt column is
    * derived from a stable hash of the full row id via `monotonically_
    * increasing_id`-free arithmetic — `pmod(hash(cols), saltFactor)` —
    * so results are deterministic.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    salted.groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(s"sum_$valueCol"),
        sum(col("__n")).as("n_rows"))
  }

  /** Salted join of a skewed fact against a dimension too big to
    * broadcast whole: fact rows get a random-ish salt in [0, f); the dim
    * side is replicated f× (explode) so every (key, salt) pair matches.
    * Join output is exactly the plain join's. Use when a handful of fact
    * keys dominate and AQE's post-shuffle splitting is not available
    * (e.g. a sort-merge join feeding a stateful op).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltFactor: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(fact.columns.toIndexedSeq.map(col): _*), lit(saltFactor)))
    val explodedDim = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    saltedFact.join(explodedDim, Seq(key, "__salt")).drop("__salt")
  }
}
