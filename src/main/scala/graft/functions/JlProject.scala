package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType,
  IntegerType}

/** jl_project(emb, k): Johnson–Lindenstrauss sign random projection of
  * an ARRAY<FLOAT> embedding to ARRAY<DOUBLE> of `k` dimensions —
  * out[j] = Σ_i s(i,j)·x_i with a DETERMINISTIC ±1 sign matrix derived
  * from integer arithmetic on the (input-dim, output-dim) pair, so the
  * projection is a pure content function: no RNG state, no broadcast
  * matrix, identical on every engine, run, and partitioning (the same
  * reproducibility family as the md5 keep rules). Achlioptas (2003)
  * showed ±1 entries satisfy the JL lemma like Gaussians do — this is
  * the database-friendly variant, one fused multiply-free loop per row
  * (signs flip adds to subtracts).
  *
  * The 1/sqrt(k) JL scale factor is deliberately omitted: every
  * consumer here compares projected vectors by COSINE, which is
  * invariant under the uniform scaling of both sides, and dropping it
  * keeps every output term an exact ±sum of float-widened doubles —
  * the accumulation is the plain left-to-right fold the DuckDB oracle
  * replays bit-for-bit (list_reduce over the same signed terms).
  *
  * Scale shape: this is the MAP-SIDE dimensionality-reduction pass a
  * real ANN pipeline runs before indexing — 64→16 dims is 4× less
  * vector I/O and cosine arithmetic for every downstream candidate
  * pair, at a recall the q144 audit MEASURES instead of assuming.
  * Codegen'd as a static call into the companion so the projection
  * stays inside whole-stage codegen (the MinhashBands idiom).
  */
case class JlProject(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) if right.foldable =>
        // k is foldable, so its VALUE is checkable here too: reject
        // k <= 0 (the per-row require would otherwise throw at
        // execution) and absurd k (a 2e9 literal would attempt a
        // ~16 GB per-row output allocation and OOM the executor —
        // fail analysis instead; 2^16 dims is far past any JL target).
        // A NULL k keeps its longstanding nullIntolerant semantics
        // (null result column), and an eval that THROWS here (ANSI
        // cast of a bad literal) becomes a clean type-check failure,
        // not a raw exception out of the analyzer.
        val k = try right.eval() catch {
          case scala.util.control.NonFatal(e) =>
            return TypeCheckResult.TypeCheckFailure(
              s"jl_project: k is not evaluable at analysis time: $e")
        }
        if (k != null && (k.asInstanceOf[Int] <= 0 ||
            k.asInstanceOf[Int] > 65536))
          TypeCheckResult.TypeCheckFailure(
            s"jl_project: k must be in [1, 65536], got $k")
        else TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"jl_project expects (array<float>, foldable int k), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jl_project"

  override protected def nullSafeEval(v: Any, kv: Any): Any =
    JlProject.project(v.asInstanceOf[ArrayData], kv.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, k) => s"""
      ${ev.value} = graft.functions.JlProject.project($x, $k);
    """)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object JlProject {
  /** ±1 sign of projection cell (i, j): a middle-square bit of the
    * mixed pair — h = (i·1000003 + j·7919 + 12345) mod 2^20, sign from
    * bit 7 of h². The SQUARING is what makes the bit a nonlinear
    * function of (i, j); the first-cut linear form (i·p1 + j·p2) % 2
    * with two ODD primes collapsed to parity of i+j — a RANK-1 sign
    * matrix whose projections were all exactly (anti-)parallel, psim
    * ∈ {−1, 1} (caught by the q144 fixture result, kept here as the
    * cautionary tale). The mod-2^20 bound keeps h² < 2^40 so the
    * oracle's BIGINT arithmetic can never overflow (DuckDB THROWS on
    * int64 overflow; the JVM would wrap silently — either way the
    * engines would diverge without the bound). The DuckDB oracle
    * spells the SAME expression in SQL. */
  def sign(i: Int, j: Int): Double = {
    val h = (i.toLong * 1000003L + j.toLong * 7919L + 12345L) % 1048576L
    if ((((h * h) >> 7) & 1L) == 0L) 1.0 else -1.0
  }

  /** out[j] = Σ_i sign(i,j)·x_i, each sum a left-to-right double fold
    * from 0.0 (bit-matching the oracle's list_reduce over the same
    * terms — adding 0.0 first is an IEEE no-op for any non-(-0.0)
    * head, and an all-(-0.0) row rounds to the same 0.0 anyway). */
  def project(x: ArrayData, k: Int): ArrayData = {
    require(k > 0, s"jl_project: k must be positive, got $k")
    val n = x.numElements()
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      while (i < n) {
        s += sign(i, j) * x.getFloat(i).toDouble
        i += 1
      }
      out(j) = s
      j += 1
    }
    new GenericArrayData(out)
  }
}
