package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k per group as a real aggregate function:
  * `topk_by(score, tiebreak, payload_struct, k)` →
  * `array<struct<score, tiebreak, payload>>` ordered best-first by
  * (score DESC, tiebreak ASC).
  *
  * This is the scale-correct shape for "top k per group": a
  * TypedImperativeAggregate participates in partial aggregation, so each
  * map task keeps AT MOST k rows per group in a bounded heap and the
  * shuffle moves k rows per (group, partition) — versus a window
  * formulation that shuffles every scored row to its group's partition
  * (or 2 shuffles for the salted two-phase variant). State is O(k) per
  * group regardless of group size.
  *
  * Rows with NULL score/tiebreak/payload are skipped (a cosine or rank
  * input that is NULL can never be in the top k).
  */
case class TopKByAgg(score: Expression, tiebreak: Expression,
                     payload: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByAgg.Buffer] {

  require(k > 0, s"topk_by: k must be positive, got $k")

  private def payloadStruct: StructType =
    payload.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(score, tiebreak, payload)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_by"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = score.dataType == DoubleType && tiebreak.dataType == LongType &&
      payload.dataType.isInstanceOf[StructType]
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "topk_by expects (double, bigint, struct, int literal), got (" +
        s"${score.dataType.simpleString}, ${tiebreak.dataType.simpleString}, " +
        s"${payload.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("tiebreak", LongType, nullable = false),
    StructField("payload", payloadStruct, nullable = false))),
    containsNull = false)

  @transient private lazy val payloadProj =
    UnsafeProjection.create(payloadStruct)

  override def createAggregationBuffer(): TopKByAgg.Buffer =
    new TopKByAgg.Buffer(k)

  override def update(buf: TopKByAgg.Buffer, input: InternalRow): TopKByAgg.Buffer = {
    val s = score.eval(input)
    val t = tiebreak.eval(input)
    val p = payload.eval(input)
    if (s != null && t != null && p != null) {
      val sd = s.asInstanceOf[Double]
      val tl = t.asInstanceOf[Long]
      if (buf.wouldAccept(sd, tl)) {
        // copy only rows that enter the heap — the projection reuses its
        // backing buffer, so the copy is required and intentional
        buf.insert(sd, tl, payloadProj(p.asInstanceOf[InternalRow]).copy())
      }
    }
    buf
  }

  override def merge(buf: TopKByAgg.Buffer, other: TopKByAgg.Buffer): TopKByAgg.Buffer = {
    other.foreach((s, t, p) =>
      if (buf.wouldAccept(s, t)) buf.insert(s, t, p))
    buf
  }

  override def eval(buf: TopKByAgg.Buffer): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, t, p) =>
      InternalRow(s, t, p)
    })
  }

  override def serialize(buf: TopKByAgg.Buffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, t, p) =>
      out.writeDouble(s)
      out.writeLong(t)
      val bytes = p.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKByAgg.Buffer = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = new TopKByAgg.Buffer(k)
    var i = 0
    while (i < n) {
      val s = in.getDouble
      val t = in.getLong
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val row = new UnsafeRow(payloadStruct.size)
      row.pointTo(rowBytes, len)
      buf.insert(s, t, row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), tiebreak = newChildren(1),
      payload = newChildren(2))
}

object TopKByAgg {

  private final case class Entry(score: Double, tie: Long, payload: UnsafeRow)

  /** Bounded heap keeping the k best entries under (score DESC, tie ASC).
    * The java PriorityQueue's head is the WORST kept entry, so accept /
    * evict is O(log k) and `wouldAccept` is O(1).
    */
  final class Buffer(k: Int) {
    // head = worst: lower score first; among equal scores, higher tie first
    private val heap = new java.util.PriorityQueue[Entry](k,
      (a: Entry, b: Entry) =>
        if (a.score != b.score) java.lang.Double.compare(a.score, b.score)
        else java.lang.Long.compare(b.tie, a.tie))

    def size: Int = heap.size()

    def wouldAccept(score: Double, tie: Long): Boolean = {
      if (heap.size() < k) true
      else {
        val w = heap.peek()
        score > w.score || (score == w.score && tie < w.tie)
      }
    }

    def insert(score: Double, tie: Long, payload: UnsafeRow): Unit = {
      heap.add(Entry(score, tie, payload))
      if (heap.size() > k) heap.poll(): Unit
    }

    def foreach(f: (Double, Long, UnsafeRow) => Unit): Unit = {
      val it = heap.iterator()
      while (it.hasNext) { val e = it.next(); f(e.score, e.tie, e.payload) }
    }

    def sortedBestFirst: Array[(Double, Long, UnsafeRow)] = {
      val arr = heap.toArray(new Array[Entry](heap.size()))
      java.util.Arrays.sort(arr, (a: Entry, b: Entry) =>
        if (a.score != b.score) java.lang.Double.compare(b.score, a.score)
        else java.lang.Long.compare(a.tie, b.tie))
      arr.map(e => (e.score, e.tie, e.payload))
    }
  }
}
