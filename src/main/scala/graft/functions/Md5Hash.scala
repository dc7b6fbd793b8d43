package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** Shared MD5 → little-endian-u64-of-lower-8-bytes kernel (bit-identical
  * to DuckDB's `md5_number_lower`). The string-expression fallback spells
  * this as md5 → 8 substrings → concat → conv → decimal mod — ~10
  * expression nodes and several allocations per row; these expressions
  * fuse it into one codegen'd call with a per-partition MessageDigest.
  */
object Md5Kernel {
  // MessageDigest is stateful and not thread-safe; getInstance does a
  // JCA provider lookup — a per-row cost on interpreted hot paths
  // (MinhashKernel evaluates once per corpus row). One instance per
  // thread, reset per use, mirrors the codegen path's mutable state.
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The shared per-thread digest, already reset. */
  def digest(bytes: Array[Byte]): Array[Byte] = {
    val md = tlMd.get()
    md.reset()
    md.digest(bytes)
  }

  def lower64(bytes: Array[Byte]): Long =
    lower64OfDigest(digest(bytes))

  def lower64OfDigest(d: Array[Byte]): Long = {
    var v = 0L
    var i = 15
    while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
    v
  }
}

abstract class Md5LongExpression extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${child.dataType.simpleString}")

  /** Post-process the little-endian u64. */
  protected def finish(u64: Long): Long
  protected def finishCode(u64: String): String

  override def nullSafeEval(input: Any): Any =
    finish(Md5Kernel.lower64(input.asInstanceOf[UTF8String].getBytes))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val md = ctx.addMutableState("java.security.MessageDigest", "md5Digest",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                 catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }""")
      val d = ctx.freshName("digest")
      val u = ctx.freshName("u64")
      s"""
         |$md.reset();
         |byte[] $d = $md.digest($c.getBytes());
         |long $u = 0L;
         |for (int i = 15; i >= 8; i--) { $u = ($u << 8) | ($d[i] & 0xffL); }
         |${ev.value} = ${finishCode(u)};
       """.stripMargin
    })
}

/** `md5_mod_p(str)` = DuckDB `md5_number_lower(str) % P` with
  * P = 2^31-1, computed with unsigned semantics (the u64 may exceed
  * Long.MaxValue). The MinHash base hash.
  */
case class Md5ModP(child: Expression) extends Md5LongExpression {
  override def prettyName: String = "md5_mod_p"
  protected def finish(u64: Long): Long =
    java.lang.Long.remainderUnsigned(u64, graft.dedup.MinHashSpec.P)
  protected def finishCode(u64: String): String =
    s"java.lang.Long.remainderUnsigned($u64, ${graft.dedup.MinHashSpec.P}L)"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `md5_h32(str)` = DuckDB `md5_number_lower(str) >> 32` — the 32-bit
  * cross-engine hash used by SimHash and winnowing fingerprints.
  */
case class Md5H32(child: Expression) extends Md5LongExpression {
  override def prettyName: String = "md5_h32"
  protected def finish(u64: Long): Long = u64 >>> 32
  protected def finishCode(u64: String): String = s"($u64 >>> 32)"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `md5_fp62(str)` — the full 62-bit content fingerprint
  * ((H32 mod 2^31)·2^32 + H-mod-P, see `MinHashSpec.fingerprint62Expr`)
  * from ONE digest. The composed `md5_h32`/`md5_mod_p` spelling hashes
  * every string twice — inside a `transform` lambda (per-gram
  * fingerprints) subexpression elimination cannot merge them, so the
  * fused form halves the dominant md5 cost of the fingerprint path.
  */
case class Md5Fp62(child: Expression) extends Md5LongExpression {
  override def prettyName: String = "md5_fp62"
  protected def finish(u64: Long): Long =
    ((u64 >>> 32) % 2147483648L) * 4294967296L +
      java.lang.Long.remainderUnsigned(u64, graft.dedup.MinHashSpec.P)
  protected def finishCode(u64: String): String =
    s"(($u64 >>> 32) % 2147483648L) * 4294967296L + " +
      s"java.lang.Long.remainderUnsigned($u64, ${graft.dedup.MinHashSpec.P}L)"
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
