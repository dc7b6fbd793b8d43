package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native squared-L2 distance over two `array<float>` columns — the
  * pair-scoring kernel of the brute-force ground-truth rankings
  * ([[graft.similarity.Similarity.bruteL2TopK]]) and any exact-L2
  * re-rank. The builtin composition (`aggregate(zip_with(...))`)
  * evaluates two interpreted lambda chains and allocates an
  * intermediate array per pair; on a |probes|×|corpus| cross join that
  * interpretation cost IS the query (measured ~10× on the 10×-scale
  * recall gates). This is one fused loop with `doGenCode`, zero
  * allocation, inside whole-stage codegen.
  *
  * Identical IEEE semantics to the fallback on the library's
  * equal-length contract: accumulate (x−y)² in index order, double
  * precision, from 0.0 — bit-for-bit the DuckDB oracle's prepend-0.0
  * `list_reduce` fold. The loop runs to the shorter length (the
  * cosine_sim convention); callers enforce the dimension contract
  * upstream.
  */
case class L2SqDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_sq expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_sq"

  // a null ELEMENT poisons the whole sum to null in the composed
  // zip_with/aggregate fallback — match it (library hot paths carry
  // containsNull=false arrays, so the bit-check branch never fires
  // there)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      s += d * d
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native ADC (asymmetric distance computation) lookup-sum: given a
  * probe's per-subspace distance table `array<array<double>>` (m rows
  * of k exact subspace L2s) and a candidate's PQ codes `array<int>`,
  * returns Σ_s dt[s][code_s] — the inner loop of the PQ/IVFPQ
  * candidate scan ([[graft.similarity.Similarity.pqSearch]] /
  * `ivfPqSearch`). The builtin form (`aggregate(zip_with(dt, codes,
  * element_at))`) pays two interpreted lambdas and an intermediate
  * array per (probe, candidate) pair — the pair space is exactly what
  * the ADC scan exists to make cheap (m array reads per pair). One
  * fused loop, codegen'd, zero allocation.
  *
  * Identical semantics to the fallback: left fold from 0.0 in subspace
  * order. A code outside [0, k) — impossible under the encode
  * contract, whose codes are `array_position` results — returns null
  * exactly like the builtin's out-of-bounds `element_at`.
  */
case class AdcDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_dist expects (array<array<double>>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "adc_dist"

  // null codes elements and out-of-bounds codes both yield null, the
  // composed element_at fold's behavior (library encode output is
  // containsNull=false and in-range — these branches never fire there)
  override def nullSafeEval(l: Any, r: Any): Any = {
    val dt = l.asInstanceOf[ArrayData]
    val codes = r.asInstanceOf[ArrayData]
    val n = math.min(dt.numElements(), codes.numElements())
    var s = 0.0; var i = 0
    while (i < n) {
      if (dt.isNullAt(i) || codes.isNullAt(i)) return null
      val row = dt.getArray(i)
      val c = codes.getInt(i)
      if (c < 0 || c >= row.numElements()) return null
      s += row.getDouble(c)
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dt, codes) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($dt.numElements(), $codes.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($dt.isNullAt($i) || $codes.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $dt.getArray($i);
         |  int $c = $codes.getInt($i);
         |  if ($c < 0 || $c >= $row.numElements()) { ${ev.isNull} = true; break; }
         |  $s += $row.getDouble($c);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
