package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** hash60(s): the top 60 bits of md5(s) as a positive BIGINT — the native
  * twin of `cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)` and
  * of DuckDB's `CAST(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT) AS
  * BIGINT)`, value-identical to both (parity pinned in ExpressionSpec).
  *
  * Exists because the SQL formulation renders the digest to a 32-char hex
  * string, substrings it and parses it back per evaluation; in the
  * minhash signature loop that is 16 hex round-trips per shingle. This
  * computes the value digest-directly: one MD5 + one shift.
  *
  * Codegen'd as a static call into the companion, so the shingle-hash
  * projection stays inside the surrounding whole-stage-codegen span
  * instead of splitting it (the fallback path also costs a per-row
  * virtual call + boxing).
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Hash60.eval60(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.eval60($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Hash60 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Top 60 bits of md5(s): big-endian first 8 digest bytes >>> 4 equals
    * the integer value of the first 15 hex chars. */
  def eval60(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    top >>> 4
  }
}
