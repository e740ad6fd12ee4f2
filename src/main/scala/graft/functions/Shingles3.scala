package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** shingles3(tok): the DISTINCT space-joined 3-grams of an ARRAY<STRING>
  * token column, in first-occurrence order — value-identical to
  *
  * {{{ case when size(tok) < 3 then array()
  *     else array_distinct(transform(sequence(1, size(tok) - 2),
  *       i -> concat_ws(' ', element_at(tok, i), element_at(tok, i + 1),
  *                      element_at(tok, i + 2)))) end }}}
  *
  * (1-based `element_at`, exactly as ExpressionSpec pins it — the
  * 0-based bracket shorthand `tok[i]` would shift the window and is NOT
  * equivalent)
  *
  * and to DuckDB's `list_distinct(list_transform(...))` twin (the oracle
  * keeps that formulation — outputs only ever feed order-insensitive
  * grouping).
  *
  * Exists because Spark higher-order functions are CodegenFallback: the
  * lambda chain above interprets ~4 expression nodes per token per
  * document in the hottest projection of the dedup pipeline (q37/q45/
  * q67/q72 all shingle every document). This is one fused loop with a
  * hash-set dedup, codegen'd via a static companion call.
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingles3 requires ARRAY<STRING>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    Shingles3.shingles(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Shingles3.shingles($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Shingles3 {
  private val space = Array[Byte](' ')

  def shingles(tok: ArrayData): ArrayData = {
    val n = tok.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    var i = 0
    while (i < n - 2) {
      // concat_ws(' ', w0, w1, w2); null tokens cannot occur (split output)
      val s = UTF8String.concatWs(UTF8String.fromBytes(space),
        tok.getUTF8String(i), tok.getUTF8String(i + 1),
        tok.getUTF8String(i + 2))
      seen.add(s)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
