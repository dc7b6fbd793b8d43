package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Fused product-quantization ENCODE: all m subspace codes of an
  * `array<float>` vector in ONE expression node, the [m][k][sub]
  * codebooks shipped as a resolution-time reference object (the
  * CentroidDists discipline applied to the whole encode).
  *
  * Why this exists — a measured JIT cliff, not a micro-optimization:
  * the composed form builds m copies of `slice → centroid_dists →
  * array_min + array_position` (the dists subtree duplicated inside
  * array_position), and at m=16 the generated `processNext` crosses
  * the JVM's huge-method JIT threshold, silently running the whole
  * corpus scan as INTERPRETED bytecode — measured 442 s vs 13.6 s for
  * the identical m=8 query at 10× scale (30× from doubling m). One
  * call-site keeps the codegen'd method small at ANY m, so the m dial
  * (which recall tuning wants to GROW — m=32 is +0.10 recall@5 over
  * m=16 at 10×) stays linear-cost.
  *
  * Value-compatible with the composed fallback bit for bit: per
  * subspace s the slice is vec[s·sub, min(|vec|, (s+1)·sub)), each
  * codeword distance is the index-order (x−c)² double fold over
  * min(|slice|, sub) elements, and the code is the FIRST minimum
  * (array_position's tie rule — strict `<` scanning forward).
  */
case class PqCodes(child: Expression, cbs: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = cbs.length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_codes"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_codes expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cb = cbs(s)
      val sub = cb(0).length
      val off = s * sub
      val n = math.min(math.max(v.numElements() - off, 0), sub)
      var best = 0; var bestD = Double.MaxValue; var j = 0
      while (j < cb.length) {
        val cw = cb(j)
        var d = 0.0; var i = 0
        while (i < n) {
          val t = v.getFloat(off + i).toDouble - cw(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbsRef = ctx.addReferenceObj("pqCbs", cbs, "double[][][]")
      val out = ctx.freshName("out"); val s = ctx.freshName("s")
      val cb = ctx.freshName("cb"); val sub = ctx.freshName("sub")
      val off = ctx.freshName("off"); val n = ctx.freshName("n")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val j = ctx.freshName("j"); val cw = ctx.freshName("cw")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      s"""
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double[][] $cb = $cbsRef[$s];
         |  int $sub = $cb[0].length;
         |  int $off = $s * $sub;
         |  int $n = java.lang.Math.min(
         |    java.lang.Math.max($v.numElements() - $off, 0), $sub);
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $j = 0; $j < $cb.length; $j++) {
         |    double[] $cw = $cb[$j];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $t = ((double) $v.getFloat($off + $i)) - $cw[$i];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $j; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Fused per-probe ADC distance TABLE: the m×k matrix of exact
  * subspace L2s of an `array<float>` probe vector against the
  * [m][k][sub] codebooks, one expression node (the probe-side twin of
  * [[PqCodes]] — same JIT-cliff rationale, same reference-object
  * codebooks, same index-order fold per entry as `centroid_dists`
  * over each slice).
  */
case class PqDistTable(child: Expression, cbs: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = cbs.length

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_dt"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_dt expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val rows = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val cb = cbs(s)
      val sub = cb(0).length
      val off = s * sub
      val n = math.min(math.max(v.numElements() - off, 0), sub)
      val row = new Array[Double](cb.length)
      var j = 0
      while (j < cb.length) {
        val cw = cb(j)
        var d = 0.0; var i = 0
        while (i < n) {
          val t = v.getFloat(off + i).toDouble - cw(i)
          d += t * t
          i += 1
        }
        row(j) = d
        j += 1
      }
      rows(s) = new GenericArrayData(row)
      s += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbsRef = ctx.addReferenceObj("pqDtCbs", cbs, "double[][][]")
      val rows = ctx.freshName("rows"); val s = ctx.freshName("s")
      val cb = ctx.freshName("cb"); val sub = ctx.freshName("sub")
      val off = ctx.freshName("off"); val n = ctx.freshName("n")
      val row = ctx.freshName("row"); val j = ctx.freshName("j")
      val cw = ctx.freshName("cw"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val t = ctx.freshName("t")
      s"""
         |Object[] $rows = new Object[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double[][] $cb = $cbsRef[$s];
         |  int $sub = $cb[0].length;
         |  int $off = $s * $sub;
         |  int $n = java.lang.Math.min(
         |    java.lang.Math.max($v.numElements() - $off, 0), $sub);
         |  double[] $row = new double[$cb.length];
         |  for (int $j = 0; $j < $cb.length; $j++) {
         |    double[] $cw = $cb[$j];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      double $t = ((double) $v.getFloat($off + $i)) - $cw[$i];
         |      $d += $t * $t;
         |    }
         |    $row[$j] = $d;
         |  }
         |  $rows[$s] = new org.apache.spark.sql.catalyst.util.GenericArrayData($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
