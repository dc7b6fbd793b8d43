package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}
// (ArrayData is also used by the centroid_dists descriptor below)

/** Native cosine similarity over two `array<float>` columns.
  *
  * The builtin composition (`aggregate(zip_with(...))` ×3) allocates two
  * intermediate arrays per row and evaluates three lambda chains; this
  * expression is a single fused loop with `doGenCode`, so it stays inside
  * whole-stage codegen with zero allocation — the preferred shape for a
  * 100 TB scan-side operator. Accumulates in double precision in index
  * order, matching the oracle's semantics.
  *
  * Degenerate inputs: a zero-norm (or empty) vector yields 0.0 — never
  * NaN/Infinity — matching the builtin-composition fallback and the
  * DuckDB oracle's CASE guard. Inputs are expected to be equal-length;
  * a longer vector's tail is ignored (the loop runs to the shorter
  * length), so callers must enforce the dimension contract upstream.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // ExpectsInputTypes is unavailable outside org.apache.spark.sql
  // (AbstractDataType is private[sql]); validate explicitly instead.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration via the public SparkSessionExtensions API — used with
  * `SparkSession.builder().withExtensions(GraftFunctions.register)`.
  * Sessions built elsewhere (e.g. the driver's own session for the smoke
  * query) simply don't see the function; callers fall back to the builtin
  * composition (see Similarity.cosineExpr).
  */
object GraftFunctions {
  val cosineSimDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1)))

  val md5ModPDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_mod_p"),
    new ExpressionInfo(classOf[Md5ModP].getName, "md5_mod_p"),
    (exprs: Seq[Expression]) => Md5ModP(exprs.head))

  val md5H32Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_h32"),
    new ExpressionInfo(classOf[Md5H32].getName, "md5_h32"),
    (exprs: Seq[Expression]) => Md5H32(exprs.head))

  val md5Fp62Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("md5_fp62"),
    new ExpressionInfo(classOf[Md5Fp62].getName, "md5_fp62"),
    (exprs: Seq[Expression]) => Md5Fp62(exprs.head))

  val lshBucketsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lsh_buckets"),
    new ExpressionInfo(classOf[HyperplaneBuckets].getName, "lsh_buckets"),
    (exprs: Seq[Expression]) => HyperplaneBuckets(exprs.head,
      exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int],
      exprs(3).eval().asInstanceOf[Int]))

  val centroidDistsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("centroid_dists"),
    new ExpressionInfo(classOf[CentroidDists].getName, "centroid_dists"),
    (exprs: Seq[Expression]) => {
      // fold the literal k×dim matrix argument once at resolution time;
      // it never reaches the physical plan
      val m = exprs(1).eval().asInstanceOf[ArrayData]
      val cents = Array.tabulate(m.numElements()) { i =>
        val row = m.getArray(i)
        Array.tabulate(row.numElements())(j => row.getDouble(j))
      }
      CentroidDists(exprs.head, cents)
    })

  val matRotateDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("mat_rotate"),
    new ExpressionInfo(classOf[MatRotate].getName, "mat_rotate"),
    (exprs: Seq[Expression]) => {
      // fold the literal mean vector and p×dim component matrix once at
      // resolution time (the centroid_dists discipline)
      val mv = exprs(1).eval().asInstanceOf[ArrayData]
      val mean = Array.tabulate(mv.numElements())(mv.getDouble)
      val cm = exprs(2).eval().asInstanceOf[ArrayData]
      val comps = Array.tabulate(cm.numElements()) { i =>
        val row = cm.getArray(i)
        Array.tabulate(row.numElements())(row.getDouble)
      }
      MatRotate(exprs.head, mean, comps)
    })

  val topKByDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("topk_by"),
    new ExpressionInfo(classOf[TopKByAgg].getName, "topk_by"),
    (exprs: Seq[Expression]) => TopKByAgg(exprs(0), exprs(1), exprs(2),
      exprs(3).eval().asInstanceOf[Int]))

  val misraGriesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("misra_gries"),
    new ExpressionInfo(classOf[MisraGriesAgg].getName, "misra_gries"),
    (exprs: Seq[Expression]) => MisraGriesAgg(exprs(0),
      exprs(1).eval().asInstanceOf[Int]))

  // Spark's own Bloom-filter kernels (the ones behind AQE's runtime
  // filters), surfaced as session functions so operators can build and
  // probe a membership sketch without a UDF: bloom_build(xxhash64_col,
  // est_items, num_bits) aggregates to the serialized filter binary;
  // bloom_contains(filter_binary, xxhash64_col) is the codegen'd probe.
  // The probe's filter argument must be foldable (a lit() of the bytes)
  // — the same contract the planner's injected runtime filters obey.
  val bloomBuildDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_build"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
      "bloom_build"),
    (exprs: Seq[Expression]) =>
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        exprs(0), exprs(1), exprs(2)))

  // shared by the two PQ descriptors: fold the literal [m][k][sub]
  // codebook argument once at resolution time (the centroid_dists
  // discipline) — it never reaches the physical plan
  private def foldCodebooks(e: Expression): Array[Array[Array[Double]]] = {
    // guard before eval(): a non-foldable, null, or wrongly-typed
    // codebooks argument from user SQL must fail analysis with a
    // message, not a raw ClassCastException/NPE out of the resolver —
    // the element-type check matters because a foldable array of the
    // wrong leaf type (array(array(array(1)))) would otherwise pass the
    // foldability gate and CCE inside getDouble below
    require(e.foldable,
      "pq_codes/pq_dt: the codebooks argument must be a foldable " +
        "array<array<array<double>>> literal")
    e.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => ()
      case other => throw new IllegalArgumentException(
        "pq_codes/pq_dt: the codebooks argument must be an " +
          s"array<array<array<double>>> literal, got ${other.simpleString}")
    }
    val a = e.eval() match {
      case ad: ArrayData => ad
      case other => throw new IllegalArgumentException(
        "pq_codes/pq_dt: the codebooks argument must be a non-null " +
          s"array<array<array<double>>> literal, got $other")
    }
    val cbs = Array.tabulate(a.numElements()) { s =>
      val sa = a.getArray(s)
      Array.tabulate(sa.numElements()) { j =>
        val ja = sa.getArray(j)
        Array.tabulate(ja.numElements())(t => ja.getDouble(t))
      }
    }
    // shape guard: eval/codegen index cb(s)(0).length unconditionally
    // and read codeword t up to that length — an empty subspace or
    // ragged codeword lengths WITHIN a subspace would throw a raw
    // ArrayIndexOutOfBoundsException mid-scan; fail at resolution with
    // the contract spelled out instead
    cbs.zipWithIndex.foreach { case (cb, s) =>
      require(cb.nonEmpty,
        s"pq_codes/pq_dt: codebook subspace $s has no codewords")
      require(cb.forall(_.length == cb(0).length),
        s"pq_codes/pq_dt: codebook subspace $s has ragged codeword " +
          s"lengths (${cb.map(_.length).distinct.sorted.mkString(",")}) — " +
          "every codeword in a subspace must share one sub-dimension")
    }
    cbs
  }

  val pqCodesDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_codes"),
    new ExpressionInfo(classOf[PqCodes].getName, "pq_codes"),
    (exprs: Seq[Expression]) => PqCodes(exprs.head, foldCodebooks(exprs(1))))

  val pqDtDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("pq_dt"),
    new ExpressionInfo(classOf[PqDistTable].getName, "pq_dt"),
    (exprs: Seq[Expression]) => PqDistTable(exprs.head, foldCodebooks(exprs(1))))

  val l2SqDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("l2_sq"),
    new ExpressionInfo(classOf[L2SqDistance].getName, "l2_sq"),
    (exprs: Seq[Expression]) => L2SqDistance(exprs.head, exprs(1)))

  val adcDistDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("adc_dist"),
    new ExpressionInfo(classOf[AdcDist].getName, "adc_dist"),
    (exprs: Seq[Expression]) => AdcDist(exprs.head, exprs(1)))

  // the sharded screen's descriptor folds its foldable array<binary>
  // filters argument into ONE reference object at resolution time (the
  // foldCodebooks discipline) — the filter bytes never appear in the
  // physical plan as literals, and the probe is O(1) in nShards
  private def foldShardFilters(e: Expression): ShardedBloomFilters = {
    require(e.foldable,
      "bloom_contains_sharded: the filters argument must be a foldable " +
        "array<binary> literal")
    e.dataType match {
      case ArrayType(BinaryType, _) => ()
      case other => throw new IllegalArgumentException(
        "bloom_contains_sharded: the filters argument must be an " +
          s"array<binary> literal, got ${other.simpleString}")
    }
    val a = e.eval() match {
      case ad: ArrayData => ad
      case other => throw new IllegalArgumentException(
        "bloom_contains_sharded: the filters argument must be a " +
          s"non-null array<binary> literal, got $other")
    }
    new ShardedBloomFilters(Array.tabulate(a.numElements())(i =>
      if (a.isNullAt(i)) null else a.getBinary(i))).validated()
  }

  val bloomContainsShardedDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_contains_sharded"),
    new ExpressionInfo(classOf[BloomContainsSharded].getName,
      "bloom_contains_sharded"),
    (exprs: Seq[Expression]) =>
      BloomContainsSharded(exprs(1), foldShardFilters(exprs(0))))

  val bloomContainsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_contains"),
    new ExpressionInfo(
      classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
      "bloom_contains"),
    (exprs: Seq[Expression]) =>
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        exprs(0), exprs(1)))

  val minhashBandSigsDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_bandsigs"),
    new ExpressionInfo(classOf[MinhashBandSigs].getName, "minhash_bandsigs"),
    (exprs: Seq[Expression]) => MinhashBandSigs(exprs.head))

  val minhashSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinhashSigRows].getName, "minhash_sig"),
    (exprs: Seq[Expression]) => MinhashSigRows(exprs.head))

  def register(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(cosineSimDescriptor)
    ext.injectFunction(minhashBandSigsDescriptor)
    ext.injectFunction(minhashSigDescriptor)
    ext.injectFunction(md5ModPDescriptor)
    ext.injectFunction(md5H32Descriptor)
    ext.injectFunction(md5Fp62Descriptor)
    ext.injectFunction(lshBucketsDescriptor)
    ext.injectFunction(centroidDistsDescriptor)
    ext.injectFunction(matRotateDescriptor)
    ext.injectFunction(topKByDescriptor)
    ext.injectFunction(misraGriesDescriptor)
    ext.injectFunction(bloomBuildDescriptor)
    ext.injectFunction(bloomContainsDescriptor)
    ext.injectFunction(bloomContainsShardedDescriptor)
    ext.injectFunction(l2SqDescriptor)
    ext.injectFunction(adcDistDescriptor)
    ext.injectFunction(pqCodesDescriptor)
    ext.injectFunction(pqDtDescriptor)
    // tier (c) of the custom-operator ladder: the fused as-of join's
    // planner strategy (graft.plans.AsofJoinNode -> AsofJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}
