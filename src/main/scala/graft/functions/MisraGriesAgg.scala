package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a real aggregate function:
  * `misra_gries(col, k)` → `map<string, bigint>` of ≤ k candidate items
  * with their (under-)estimates.
  *
  * THE guarantee (Misra & Gries 1982; merge per Agarwal et al.,
  * "Mergeable Summaries", PODS 2012): after summarizing n items with k
  * counters, every item with true frequency > n/(k+1) is IN the sketch,
  * and every estimate under-counts by at most n/(k+1). The guarantee
  * survives arbitrary partial-aggregate merging, so the map-side
  * combine + one k-bounded final merge gives a sound candidate set with
  * NO full-vocabulary shuffle — the fixed-memory propose step for
  * heavy-hitter mining over a corpus whose vocabulary exceeds memory
  * (see [[graft.text.Text.heavyHitters]] for the propose→exact-verify
  * composition; the sketch itself is approximate and never surfaces in
  * a gated answer).
  *
  * Cost: O(1) amortized per item — a decrement round is O(k) but
  * destroys k units of count, and at most n units are ever created, so
  * total decrement work ≤ n. State is O(k) regardless of input size.
  * NULL inputs are skipped.
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesAgg.Buffer] {

  require(k > 0, s"misra_gries: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "misra_gries"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"misra_gries expects (string, int literal), got ${child.dataType.simpleString}")

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): MisraGriesAgg.Buffer =
    new MisraGriesAgg.Buffer(k)

  override def update(buf: MisraGriesAgg.Buffer, input: InternalRow): MisraGriesAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: MisraGriesAgg.Buffer, other: MisraGriesAgg.Buffer): MisraGriesAgg.Buffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MisraGriesAgg.Buffer): Any = {
    // deterministic key order: the sketch CONTENT is order-insensitive,
    // but a map literal's rendering is not — sort so plans/specs compare
    val entries = buf.entries.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1))),
      new GenericArrayData(entries.map(_._2)))
  }

  override def serialize(buf: MisraGriesAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.entries
    out.writeInt(entries.length)
    entries.foreach { case (s, c) =>
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MisraGriesAgg.Buffer = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new MisraGriesAgg.Buffer(k)
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len); in.get(b)
      buf.add(new String(b, StandardCharsets.UTF_8), in.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MisraGriesAgg {

  /** k-counter Misra–Gries state. `add(x, w)` admits weighted counts so
    * the same code path serves update (w=1) and merge/deserialize.
    */
  final class Buffer(k: Int) {
    private val counts = new java.util.HashMap[String, java.lang.Long](k * 2)

    def add(x: String, w: Long): Unit = {
      val cur = counts.get(x)
      if (cur != null) { counts.put(x, cur + w): Unit }
      else if (counts.size < k) { counts.put(x, java.lang.Long.valueOf(w)): Unit }
      else {
        // overflow: the classic decrement — but by min(w, current min)
        // repeatedly is O(k·w); instead decrement every counter by d and
        // charge d against the arrival, where d makes SOMETHING hit zero
        // or exhausts w. Equivalent to w unit-decrements (the weighted
        // MG of the Mergeable Summaries paper).
        var remaining = w
        while (remaining > 0 && !counts.containsKey(x) && counts.size >= k) {
          var min = Long.MaxValue
          val it0 = counts.values().iterator()
          while (it0.hasNext) { val c = it0.next(); if (c < min) min = c }
          val d = math.min(min, remaining)
          val it = counts.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val nv = e.getValue - d
            if (nv <= 0) it.remove() else e.setValue(nv): Unit
          }
          remaining -= d
        }
        if (remaining > 0) add(x, remaining)
      }
    }

    def mergeFrom(other: Buffer): Unit = {
      // combine sums, then restore the k bound by subtracting the
      // (k+1)-th largest combined count from everything (Agarwal et al.
      // merge rule — error bounds add, staying ≤ n_total/(k+1))
      other.counts.forEach { (s, c) =>
        val cur = counts.get(s)
        counts.put(s, if (cur == null) c else java.lang.Long.valueOf(cur + c)): Unit
      }
      if (counts.size > k) {
        val vals = counts.values().toArray(new Array[java.lang.Long](counts.size))
        java.util.Arrays.sort(vals, java.util.Collections.reverseOrder())
        val cut = vals(k).longValue
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val nv = e.getValue - cut
          if (nv <= 0) it.remove() else e.setValue(nv): Unit
        }
      }
    }

    def entries: Array[(String, Long)] = {
      val out = new Array[(String, Long)](counts.size)
      var i = 0
      counts.forEach { (s, c) => out(i) = (s, c.longValue); i += 1 }
      out
    }
  }
}
