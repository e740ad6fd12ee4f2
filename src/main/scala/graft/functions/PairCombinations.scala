package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** pair_combos(ids): all index-ordered pairs (ids[i], ids[j]) with
  * i < j, as ARRAY<STRUCT<a_id BIGINT, b_id BIGINT>> — value-identical
  * to the nested-transform SQL
  *
  * {{{ flatten(transform(sequence(0, size(ids) - 2),
  *       i -> transform(sequence(i + 1, size(ids) - 1),
  *         j -> struct(ids[i] AS a_id, ids[j] AS b_id)))) }}}
  *
  * With a sorted input array (CappedIdList emits sorted ids) every pair
  * satisfies a_id < b_id by construction.
  *
  * Exists because higher-order functions are CodegenFallback: the
  * nested-lambda version interprets O(c²) small expression trees per
  * shingle group in the pair-generation stage of q37/q45/q67. One fused
  * loop, codegen'd via a static companion call.
  */
case class PairCombinations(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pair_combos requires ARRAY<BIGINT>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    PairCombinations.pairs(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PairCombinations.pairs($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object PairCombinations {
  def pairs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    val out = new Array[Any](if (n < 2) 0 else n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n - 1) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](a, ids.getLong(j))): InternalRow
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
