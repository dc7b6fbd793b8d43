package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

import graft.dedup.MinHashSpec

/** `minhash_bandsigs(tokens)` — the full MinHash-LSH signature kernel
  * fused into ONE compiled pass over a document's token array:
  * shingle (width [[MinHashSpec.SHINGLE_K]], partial-shingle rule, empty
  * shingles dropped) → md5-lower-64 mod P per shingle → K affine-
  * permutation minima → BANDS band-signature strings
  * (`concat_ws("_", mh_j·ROWS .. mh_j·ROWS+ROWS-1)`).
  *
  * Value-identical to the composed column spelling
  * `transform(Text.shingleExpr(toks), w -> md5_mod_p(w))` + K
  * `array_min(transform(__hashes, h -> (h*a_i+b_i) % P))` + band
  * `concat_ws` (spec-pinned in FunctionsSourcesSpec), with two
  * structural differences that matter on the hot path:
  *
  *  - The composed spelling is a chain of interpreted higher-order
  *    functions; after optimizer alias substitution (projection
  *    collapse, predicate pushdown through the signature projection)
  *    the tokenize→shingle→md5 chain can be re-evaluated per minhash
  *    column or per pushed filter — the r10 `stream_lsh_candidates`
  *    1.8× regression was exactly this class (VERDICT r10 item 1).
  *    Here the whole kernel is one expression node: however the
  *    optimizer moves it, it evaluates once per row.
  *  - A document with NO shingles (null/empty/whitespace-only text —
  *    the NULL-text contract, Text.shingleExpr) returns an EMPTY array
  *    instead of null minhashes, so a downstream `posexplode` drops
  *    degenerate docs with no extra filter — removing the
  *    `mh_0 IS NOT NULL` predicate whose pushdown duplicated the chain.
  *
  * Shingling never materializes the distinct-shingle set: duplicate
  * shingles cannot change a min, so `array_distinct` is skipped
  * (value-neutral for signatures; the set-semantics paths that DO need
  * distinctness — n-gram Jaccard verify — keep Text.shingleExpr).
  *
  * Reference semantics: MinHash over 3-token shingles per SURVEY §2 D3;
  * hash/permutation constants are [[MinHashSpec]]'s (cross-engine
  * md5-derived, mirrored in the DuckDB oracles).
  */
case class MinhashBandSigs(child: Expression)
    extends UnaryExpression {

  override def prettyName: String = "minhash_bandsigs"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    MinhashKernel.checkTokens(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.bandSigs(input.asInstanceOf[ArrayData])

  // r11 shipped these as CodegenFallback; the fallback wrapper routes
  // every row through boxed InternalRow eval AND pins ctx.INPUT_ROW in
  // the enclosing stage. The hot loop itself stays ONE JIT-compiled
  // Scala method (MinhashKernel.bandSigs — the PqCodes discipline of
  // keeping real work out of Janino), so the generated code is just a
  // static call on the already-evaluated child.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashKernel.bandSigs($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `minhash_sig(tokens)` — the same fused kernel surfacing the RAW
  * K-value signature instead of band strings, shaped for the batch
  * LSH pipeline ([[MinHashSpec.signatures]]): returns
  * `array<array<bigint>>` with ONE element (the K minima) for a doc
  * with at least one non-empty shingle and ZERO elements otherwise, so
  * `explode(minhash_sig(toks))` yields exactly the rows the composed
  * explode→groupBy spelling produced — degenerate docs drop out of the
  * generator with no filter (no predicate for pushdown to duplicate the
  * chain into) and WITHOUT the per-shingle explode + groupBy SHUFFLE:
  * the signature stage becomes a scan-local map, which at 100 TB
  * removes the largest shuffle of every near-dup operator (the shingle
  * explosion is ~k× the corpus text volume; the fused form never
  * materializes it).
  *
  * Value-identical to [[MinHashSpec.signatures]]'s composed spelling
  * (spec-pinned in FunctionsSourcesSpec over real + hostile rows).
  */
case class MinhashSigRows(child: Expression)
    extends UnaryExpression {

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType =
    ArrayType(ArrayType(org.apache.spark.sql.types.LongType,
      containsNull = false), containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    MinhashKernel.checkTokens(prettyName, child.dataType)

  override def nullSafeEval(input: Any): Any =
    MinhashKernel.sigRows(input.asInstanceOf[ArrayData])

  // same shape as [[MinhashBandSigs.doGenCode]]: one static call into
  // the JIT-compiled kernel, no CodegenFallback row boxing
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinhashKernel.sigRows($c);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Shared kernel behind [[MinhashBandSigs]] and [[MinhashSigRows]]:
  * tokens → shingles (partial-shingle rule, whitespace-only shingles
  * dropped per the NULL-text contract) → md5-lower-64 mod P → K affine
  * minima. Returns null when the doc has no real shingle.
  *
  * PUBLIC (not private[functions]) because both expressions' doGenCode
  * call it through the object's static forwarders from Janino-compiled
  * code — the hot loop stays one JIT-compiled Scala method either way
  * (interpreted eval and codegen share it), so "codegen parity" is
  * structural, not a second implementation to drift.
  */
object MinhashKernel {
  private val K = MinHashSpec.K
  private val P = MinHashSpec.P
  private val as: Array[Long] = MinHashSpec.a.toArray
  private val bs: Array[Long] = MinHashSpec.b.toArray
  private val SEP = UTF8String.fromString(" ")

  def checkTokens(name: String, dt: DataType): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    dt match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$name expects array<string> tokens, got ${other.simpleString}")
    }

  def minima(toks: ArrayData): Array[Long] = {
    val n = toks.numElements()
    val k = MinHashSpec.SHINGLE_K
    val mins = Array.fill(K)(Long.MaxValue)
    var any = false
    // the partial-shingle rule: a doc with < k tokens gets its single
    // (shorter) slice — `sequence(1, greatest(n - k + 1, 1))`
    val nShingles = math.max(n - k + 1, 1)
    var i = 0
    while (i < nShingles) {
      val m = math.min(k, n - i)
      // concat_ws semantics: null elements skipped (unreachable from
      // the tokenizer, honored for spelling equality)
      val parts = new Array[UTF8String](math.max(m, 0))
      var j = 0
      while (j < m) {
        parts(j) = toks.getUTF8String(i + j)
        j += 1
      }
      val shingle = UTF8String.concatWs(SEP, parts: _*)
      // `filter(s -> trim(s) != '')`: a zero-real-token doc shingles
      // to [""] (or [" "] for tab/newline-only text — empty tokens
      // joined by the concat_ws space) and must contribute nothing
      // (the NULL-text contract, Text.shingleExpr). UTF8String.trim()
      // is space-only, exactly Spark's trim().
      if (shingle.trim().numBytes() > 0) {
        any = true
        // Md5Kernel: per-thread digest (no per-row provider lookup) and
        // the ONE spelling of the little-endian lower-64 contract
        val u = Md5Kernel.lower64(shingle.getBytes)
        val h = java.lang.Long.remainderUnsigned(u, P)
        var p = 0
        while (p < K) {
          val v = (h * as(p) + bs(p)) % P
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    if (!any) null else mins
  }

  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** Full `minhash_bandsigs` result: BANDS `_`-joined band-signature
    * strings, or an EMPTY array for a degenerate doc (posexplode drops
    * it with no filter — the no-pushdown-duplication contract).
    */
  def bandSigs(toks: ArrayData): ArrayData = {
    val mins = minima(toks)
    if (mins == null) EMPTY
    else {
      val ROWS = MinHashSpec.ROWS
      val BANDS = MinHashSpec.BANDS
      val out = new Array[Any](BANDS)
      var j = 0
      while (j < BANDS) {
        val sb = new java.lang.StringBuilder(ROWS * 11)
        var r = 0
        while (r < ROWS) {
          if (r > 0) sb.append('_')
          sb.append(mins(j * ROWS + r))
          r += 1
        }
        out(j) = UTF8String.fromString(sb.toString)
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Full `minhash_sig` result: ONE K-long signature row (unsafe
    * primitive array — no per-value boxing) or an EMPTY outer array for
    * a degenerate doc.
    */
  def sigRows(toks: ArrayData): ArrayData = {
    val mins = minima(toks)
    if (mins == null) EMPTY
    else new GenericArrayData(
      Array[Any](UnsafeArrayData.fromPrimitiveArray(mins)))
  }
}
