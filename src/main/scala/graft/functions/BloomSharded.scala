package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Serializable holder of a sharded Bloom filter set: one serialized
  * filter per hash-prefix shard (null = empty shard, i.e. definite-new).
  * The probe-side deserialized [[BloomFilter]] objects are rebuilt
  * lazily ONCE PER JVM from the bytes — the bytes ship to executors a
  * single time inside the task binary as one reference object, never as
  * nShards separate 8 MB plan literals.
  *
  * Shard routing matches [[graft.dedup.Dedup.buildBloomSharded]]'s
  * build-side `pmod(xxhash64(h), nShards)` exactly: `floorMod` of the
  * probe value by the shard count (pmod and floorMod agree for a
  * positive modulus).
  */
class ShardedBloomFilters(val bytes: Array[Array[Byte]]) extends Serializable {
  require(bytes.nonEmpty,
    "bloom_contains_sharded: the filters array must hold >= 1 shard")

  val nShards: Int = bytes.length

  @transient private lazy val filters: Array[BloomFilter] =
    bytes.map(b =>
      if (b == null) null
      else BloomFilter.readFrom(new java.io.ByteArrayInputStream(b)))

  /** O(1) dispatch: route to the value's hash-prefix shard, probe that
    * shard's filter only. An empty (null-filter) shard is definite-new.
    */
  def contains(value: Long): Boolean = {
    val f = filters(java.lang.Math.floorMod(value, nShards.toLong).toInt)
    f != null && f.mightContainLong(value)
  }

  /** Force driver-side deserialization so a corrupt filter literal fails
    * at resolution with context, not mid-scan on an executor.
    */
  def validated(): ShardedBloomFilters = {
    try filters
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(
        "bloom_contains_sharded: a shard's filter bytes do not " +
          s"deserialize as a Spark BloomFilter: ${e.getMessage}", e)
    }
    this
  }
}

/** Native sharded-Bloom membership probe: ONE expression node holding
  * the whole shard filter set as a reference object, O(1) per-row
  * dispatch (shard = floorMod(value, nShards), one `mightContainLong`).
  *
  * Why this exists — the 100 TB path of the exact-dedup screen
  * ([[graft.dedup.Dedup.exactScreenBloom]] with nShards > 1): Spark's
  * `BloomFilterMightContain` requires a CONSTANT filter argument, so
  * the composed form is a when-chain over nShards per-shard filter
  * literals — an O(nShards) integer-compare walk per row whose PLAN
  * carries every shard's ≤8 MB bytes as a separate literal. At the
  * production shard count (⌈n/5e7⌉ — hundreds at 1e10 docs) that is a
  * ~GB expression tree and a measurable per-row walk. This is the
  * PqCodes reference-object discipline applied to the screen: plan size
  * O(1) in nShards (the bytes ride the task binary once), per-row cost
  * flat in nShards, codegen'd.
  *
  * Null semantics follow `bloom_contains` (BloomFilterMightContain):
  * null value → null. (The legacy when-chain yields FALSE there via its
  * `.otherwise` — identical under a `filter`, which drops both; the
  * probe value is a non-null xxhash64 in every library call site.)
  */
case class BloomContainsSharded(child: Expression,
                                shards: ShardedBloomFilters)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_contains_sharded"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains_sharded expects a bigint probe value, got " +
          other.simpleString)
    }

  override def nullSafeEval(input: Any): Any =
    shards.contains(input.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("shardedBloom", shards,
        classOf[ShardedBloomFilters].getName)
      s"${ev.value} = $ref.contains($v);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
