package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** sorted_intersect_count(a, b): |a ∩ b| for two ASCENDING-sorted
  * ARRAY<BIGINT> with distinct elements, as BIGINT — value-identical to
  * `size(array_intersect(a, b))` on such inputs.
  *
  * Exists for the verification stage of exact-similarity joins
  * (q103-style): `array_intersect` is an interpreted collection
  * expression that builds a hash set PER ROW, which dominates the
  * verify step once candidates number in the hundreds of thousands.
  * The sorted merge walk is branch-cheap, allocation-free and
  * codegen'd via a static companion call. Callers own the sortedness
  * invariant (a plain `array_sort` at build time); unsorted input
  * silently undercounts, so keep the sorted twin column next to any
  * differently-ordered one.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "sorted_intersect_count requires two ARRAY<BIGINT>, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object SortedIntersectCount {
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
