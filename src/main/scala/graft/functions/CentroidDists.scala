package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance of an `array<float>` vector to EVERY centroid of a
  * k-means coarse quantizer, in one fused pass.
  *
  * The builtin composition builds k separate `aggregate(zip_with(vec,
  * <dim-literal-array>, ...))` trees — at k=16, dim=64 that is ~16k
  * expression nodes to analyze per query and k interpreted lambda chains
  * per row. This expression is ONE node: the k×dim centroid matrix is
  * evaluated once from its literal argument when the function is
  * resolved, then ships into generated code as a reference object. The
  * per-row loop is fused, allocation-free beyond the k-element output.
  *
  * SQL shape: `centroid_dists(vec, array(array(...), ...))` — the second
  * argument must be foldable; it is folded away at resolution time and
  * never appears in the physical plan.
  *
  * Must stay value-compatible with the composed fallback in
  * `graft.similarity.Similarity.l2Sq`: index-order double accumulation
  * over min(|vec|, dim) elements.
  */
case class CentroidDists(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "centroid_dists"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"centroid_dists expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val k = cents.length
    val out = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var d = 0.0
      var i = 0
      while (i < n) {
        val t = v.getFloat(i).toDouble - cent(i)
        d += t * t
        i += 1
      }
      out(c) = d
      c += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val centsRef = ctx.addReferenceObj("ivfCents", cents, "double[][]")
      val out = ctx.freshName("out"); val c = ctx.freshName("c")
      val cent = ctx.freshName("cent"); val n = ctx.freshName("n")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      s"""
         |double[] $out = new double[${cents.length}];
         |for (int $c = 0; $c < ${cents.length}; $c++) {
         |  double[] $cent = $centsRef[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $cent.length);
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $t = ((double) $v.getFloat($i)) - $cent[$i];
         |    $d += $t * $t;
         |  }
         |  $out[$c] = $d;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
