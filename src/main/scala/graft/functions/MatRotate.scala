package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Linear projection of an `array<float>` vector through a trained
  * (mean, components) model in one fused pass: out[c] = (float)
  * Σ_d (v[d] − mean[d]) · comps[c][d], the OPQ-style rotation that
  * [[graft.similarity.Similarity.pcaRotate]] applies before product
  * quantization (rotate, then PQ — the public FAISS OPQ idea with the
  * rotation from a PCA fit instead of the iterative Procrustes solve).
  *
  * Why fused: the composed form builds one aggregate(zip_with(...))
  * tree PER COMPONENT — at p = dim = 64 that is 64 interpreted
  * higher-order-function chains per row (HOFs are CodegenFallback),
  * the same plan-bloat class the fused `centroid_dists` / `pq_codes`
  * kernels exist to avoid. This expression is ONE codegen'd node; the
  * (1+p)×dim model ships as a reference object.
  *
  * Value contract (pinned by spec against the composed fallback):
  * double accumulation from 0.0 in index order over min(|vec|, dim)
  * elements per component, each sum cast to float at the end — the
  * same correctly-rounded double→float cast DuckDB's `cast(x as
  * real)` performs, so the oracle's rotated CTE reproduces every
  * coordinate bit-for-bit.
  *
  * SQL shape: `mat_rotate(vec, array(mean...), array(array(...)))` —
  * both model arguments must be foldable; they are folded away at
  * resolution time and never appear in the physical plan.
  */
case class MatRotate(child: Expression, mean: Array[Double],
                     comps: Array[Array[Double]])
    extends UnaryExpression {

  require(comps.forall(_.length == mean.length),
    "mat_rotate: every component must have the mean's dimension")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "mat_rotate"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mat_rotate expects array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val p = comps.length
    val out = new Array[Float](p)
    var c = 0
    while (c < p) {
      val w = comps(c)
      val n = math.min(v.numElements(), w.length)
      var acc = 0.0
      var d = 0
      while (d < n) {
        acc += (v.getFloat(d).toDouble - mean(d)) * w(d)
        d += 1
      }
      out(c) = acc.toFloat
      c += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val meanRef = ctx.addReferenceObj("rotMean", mean, "double[]")
      val compsRef = ctx.addReferenceObj("rotComps", comps, "double[][]")
      val out = ctx.freshName("out"); val c = ctx.freshName("c")
      val w = ctx.freshName("w"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |float[] $out = new float[${comps.length}];
         |for (int $c = 0; $c < ${comps.length}; $c++) {
         |  double[] $w = $compsRef[$c];
         |  int $n = java.lang.Math.min($v.numElements(), $w.length);
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += (((double) $v.getFloat($d)) - $meanRef[$d]) * $w[$d];
         |  }
         |  $out[$c] = (float) $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
