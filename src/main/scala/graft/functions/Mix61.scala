package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** mix61(h, a, b) = (h * a + b) mod (2^61 - 1) — a Carter–Wegman affine
  * hash over the Mersenne prime M61, the modulus real MinHash libraries
  * use for their permutation families.
  *
  * A native expression (not raw SQL arithmetic) because h*a overflows a
  * signed Long and ANSI mode — the Spark 4 default — turns that into
  * ARITHMETIC_OVERFLOW instead of wrapping; inside the JVM the full
  * 122-bit product is computed exactly regardless of session flags.
  *
  * Why a prime and not 2^60: multiplication mod a power
  * of two never mixes low bits upward (bit 0 of h*a is bit 0 of h times
  * bit 0 of a), so an affine family mod 2^60 is only heuristically
  * independent. Mod a prime, (h*a + b) with a ≠ 0 is a proper universal
  * family — pairwise-independence holds and LSH recall follows the
  * textbook S-curve rather than an empirical approximation.
  *
  * The 122-bit product is computed exactly in the JVM via
  * Math.multiplyHigh and reduced with Mersenne folding
  * (x mod (2^64·hi + lo) ≡ 8·hi + lo since 2^64 ≡ 2^3 (mod M61)) —
  * no BigInteger, ~10 ALU ops per call, codegen'd. The DuckDB twin is
  * plain `(CAST(h AS HUGEINT) * a + b) % 2305843009213693951`
  * (parity pinned against BigInt in ExpressionSpec and end-to-end by
  * the q35 oracles).
  *
  * Domain: 0 <= h, a, b < M61 (the hash60 digests and the family
  * constants all satisfy this); output is in [0, M61).
  */
case class Mix61(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mix61 requires (BIGINT, BIGINT, BIGINT), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(h: Any, a: Any, b: Any): Any =
    Mix61.mix(h.asInstanceOf[Long], a.asInstanceOf[Long],
      b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (h, a, b) => s"graft.functions.Mix61.mix($h, $a, $b)")

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object Mix61 {
  final val M61: Long = (1L << 61) - 1 // 2305843009213693951

  /** x (any unsigned-64 pattern split as hi·2^64 + lo) folded mod M61. */
  private def fold(lo: Long, hi: Long): Long = {
    // 2^64 ≡ 8 (mod M61); hi < 2^61 here, so 8·hi needs one pre-fold
    val hiRed = ((hi & M61) << 3) + (hi >>> 61 << 3) // 8·(hi mod 2^61) + 8·carry
    var s = (lo & M61) + (lo >>> 61) + hiRed
    s = (s & M61) + (s >>> 61)
    if (s >= M61) s - M61 else s
  }

  /** (h*a + b) mod M61 for 0 <= h, a, b < M61. */
  def mix(h: Long, a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(h, a) // h, a < 2^61 => product < 2^122
    val lo = h * a                   // wrapped low 64 bits
    val p = fold(lo, hi)
    val s = p + b // both < M61 => sum < 2^62, one fold suffices
    val r = (s & M61) + (s >>> 61)
    if (r >= M61) r - M61 else r
  }
}
