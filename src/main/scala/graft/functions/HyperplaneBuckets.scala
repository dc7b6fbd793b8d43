package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All LSH table buckets of an `array<float>` vector in ONE fused pass.
  *
  * The builtin composition evaluates nTables×nBits separate
  * `aggregate(zip_with(...))` trees — each allocates an intermediate
  * array per row (48 allocations/row at the defaults). This expression
  * walks the vector once per projection with zero allocation beyond the
  * output array, with the ±1 hyperplane matrix shipped once as a
  * reference object into generated code.
  *
  * Must stay bit-compatible with the composed fallback in
  * `graft.similarity.Similarity.lshBuckets`: same splitmix64 plane
  * signs, same index-order double accumulation, same `>= 0` sign rule.
  */
case class HyperplaneBuckets(child: Expression, nBits: Int, nTables: Int,
                             dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_buckets expects array<float>, got ${other.simpleString}")
    }

  // [plane][dim] sign matrix, built once on the driver.
  @transient lazy val planes: Array[Array[Double]] =
    Array.tabulate(nTables * nBits, dim)((p, d) =>
      graft.similarity.Similarity.planeSign(p, d))

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var j = 0
      while (j < nBits) {
        val plane = planes(t * nBits + j)
        var proj = 0.0
        var d = 0
        while (d < n) { proj += v.getFloat(d).toDouble * plane(d); d += 1 }
        if (proj >= 0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val proj = ctx.freshName("proj")
      val bucket = ctx.freshName("bucket"); val plane = ctx.freshName("plane")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    double[] $plane = $planesRef[$t * $nBits + $j];
         |    double $proj = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $proj += ((double) $v.getFloat($d)) * $plane[$d];
         |    }
         |    if ($proj >= 0) $bucket |= (1L << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
