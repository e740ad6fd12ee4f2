package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Min
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the `row_number() = 1` top-one-per-key
  * anti-pattern into a max-struct aggregate — the q17-vs-window lesson
  * (IMPLEMENTATION.md) applied by the ENGINE instead of the query
  * author. The window formulation shuffles and per-group SORTS every
  * row to keep one; the aggregate keeps O(1) state per group and
  * combines map-side, which is the difference between a sort of the
  * corpus and a hash aggregate at 100 TB.
  *
  *   Filter(rn = 1, Window([rn := row_number() over (p order k)], ...))
  *     ==>  Project(p ++ unpack(min_struct) ++ [rn := 1],
  *            Aggregate(p, min(struct(k..., rest...)), child))
  *
  * Fires only where the rewrite is provably order-equivalent:
  *  - a SINGLE row_number window expression, partition keys that are
  *    plain child attributes;
  *  - every sort key ASC NULLS FIRST and NON-NULLABLE (struct-min
  *    ordering is ascending-nulls-first per field; nullable keys are
  *    left to the window);
  *  - the filter is rn = 1 (plus ignorable isnotnull(rn) conjuncts
  *    that constraint inference may have added).
  * Sort-key ties keep the envelope: the window picks an arbitrary
  * tied row, the struct-min picks the lexicographic minimum — both
  * valid outcomes of the same nondeterministic query, and the rewrite
  * is the deterministic one. Parquet columns are nullable by default,
  * so declared window-formulation queries (q62) are deliberately NOT
  * rewritten; typed in-memory pipelines with non-null keys are.
  */
object TopOnePerKeyRule extends Rule[LogicalPlan] {

  private def isOne(e: Expression): Boolean = e match {
    case Literal(v: Int, IntegerType) => v == 1
    case Cast(c, _, _, _) => isOne(c)
    case _ => false
  }

  private def splitCond(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => splitCond(l) ++ splitCond(r)
    case e => Seq(e)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, Window(Seq(alias @ Alias(
          WindowExpression(RowNumber(), spec: WindowSpecDefinition), _)),
          _, _, child, _)) =>
      val part = spec.partitionSpec
      val order = spec.orderSpec
      val conjuncts = splitCond(cond)
      val (onRn, others) = conjuncts.partition(_.references
        .exists(_.exprId == alias.exprId))
      val rnEqOne = onRn.nonEmpty && onRn.forall {
        case EqualTo(a: AttributeReference, l) =>
          a.exprId == alias.exprId && isOne(l)
        case EqualTo(l, a: AttributeReference) =>
          a.exprId == alias.exprId && isOne(l)
        case IsNotNull(a: AttributeReference) => a.exprId == alias.exprId
        case _ => false
      } && onRn.exists { case _: EqualTo => true; case _ => false }
      // every packed field must be ORDERABLE (maps/intervals are not —
      // min(struct(...)) over them would throw at execution where the
      // window ran fine)
      val allOrderable = (order.map(_.child) ++ child.output)
        .forall(e => RowOrdering.isOrderable(e.dataType))
      val safe = rnEqOne && others.isEmpty && part.nonEmpty &&
        order.nonEmpty && allOrderable &&
        part.forall(_.isInstanceOf[AttributeReference]) &&
        order.forall(so => so.direction == Ascending &&
          so.nullOrdering == NullsFirst && !so.child.nullable)
      if (!safe) f else {
        val partAttrs = part.map(_.asInstanceOf[AttributeReference])
        // absorb the WindowGroupLimit that InferWindowGroupLimit
        // pre-inserts below rank-filtered windows (it was derived from
        // THIS window, so its spec matches; it keeps the rank-1 row by
        // construction, and dropping it removes the per-group sort the
        // rewrite exists to avoid)
        val base = child match {
          case WindowGroupLimit(p2, o2, RowNumber(), limit, c)
              if p2 == part && o2 == order && limit >= 1 => c
          case c => c
        }
        val rest = base.output.filterNot(a =>
          partAttrs.exists(_.exprId == a.exprId))
        val packed = CreateStruct(order.map(_.child) ++ rest)
        val m = Alias(Min(packed).toAggregateExpression(), "__top1")()
        val agg = Aggregate(partAttrs, partAttrs :+ m, base)
        val mRef = m.toAttribute
        val nOrd = order.length
        // the group has >= 1 row and the packed struct is non-null, so
        // Min never yields NULL here — KnownNotNull keeps the rewritten
        // schema's nullability identical to the window formulation's
        // (GetStructField would otherwise inherit Min's nullable=true)
        val restById = rest.zipWithIndex.map { case (a, i) =>
          val field: Expression = GetStructField(mRef, nOrd + i)
          val restored = if (a.nullable) field else KnownNotNull(field)
          a.exprId -> Alias(restored, a.name)(exprId = a.exprId)
        }.toMap
        val projList: Seq[NamedExpression] = base.output.map { a =>
          partAttrs.find(_.exprId == a.exprId).getOrElse(restById(a.exprId))
        } :+ Alias(Literal(1), alias.name)(exprId = alias.exprId)
        Project(projList, agg)
      }
  }
}
