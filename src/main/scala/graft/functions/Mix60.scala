package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** mix60(h, a, b) = (h * a + b) mod 2^60 — the affine integer mix behind
  * the minhash family and the band fingerprint in graft.queries.Dedup.
  *
  * Exists as a native expression (rather than the equivalent SQL
  * `(h * a + b) & mask`) because the identity depends on two's-complement
  * wraparound: h and a are both ~2^60, so `h * a` overflows a signed
  * Long, and under `spark.sql.ansi.enabled=true` (the Spark 4 default)
  * the SQL multiply throws ARITHMETIC_OVERFLOW instead of wrapping. JVM
  * arithmetic always wraps mod 2^64, and since 2^60 divides 2^64 the
  * wrapped-then-masked value equals (h*a + b) mod 2^60 exactly — the same
  * number DuckDB's oracle twin gets via HUGEINT `% 2^60` (parity pinned
  * in ExpressionSpec, end-to-end in the q35 oracles).
  *
  * Codegen'd: a static call into the companion, so the minhash signature
  * projection stays inside whole-stage codegen.
  */
case class Mix60(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix60 requires (BIGINT, BIGINT, BIGINT), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(h: Any, a: Any, b: Any): Any =
    Mix60.mix(h.asInstanceOf[Long], a.asInstanceOf[Long],
      b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, a, b) => s"graft.functions.Mix60.mix($h, $a, $b)")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object Mix60 {
  final val Mask60: Long = (1L << 60) - 1

  /** (h*a + b) mod 2^60, exact for any Long inputs: JVM ops wrap mod
    * 2^64 and 2^60 | 2^64, so the final mask recovers the true residue. */
  def mix(h: Long, a: Long, b: Long): Long = (h * a + b) & Mask60
}
