package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}

/** hash60(s): the top 60 bits of md5(s) as a positive BIGINT — the native
  * twin of `cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)` and
  * of DuckDB's `CAST(CAST('0x' || substr(md5(s), 1, 15) AS UBIGINT) AS
  * BIGINT)`, value-identical to both (parity pinned in ExpressionSpec).
  *
  * Exists because the SQL formulation renders the digest to a 32-char hex
  * string, substrings it and parses it back per evaluation; in the
  * minhash signature loop that is 16 hex round-trips per shingle. This
  * computes the value digest-directly: one MD5 + one shift.
  */
case class Hash60(child: Expression) extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val md = Hash60.digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.valueOf(top >>> 4)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Hash60 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}
