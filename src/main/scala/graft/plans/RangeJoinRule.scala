package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{CalendarIntervalType, DayTimeIntervalType,
  DataType, LongType, TimestampNTZType, TimestampType}
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite a STATIC-SPAN interval join into a bucketed
  * equi-join — the q12_range_join_bucketed lesson applied by the ENGINE
  * instead of the query author. A condition of the shape
  *
  *   r.ts >= l.lo  AND  r.ts <= l.lo + INTERVAL <C>        (bounds may
  *                                                also be strict < / >)
  *
  * has no equi-conjunct, so Spark can only plan a nested-loop join:
  * every probe row is compared against EVERY build row — at 100 TB the
  * O(n·m) shape, not a plan. But the span C is a literal, so bucketing
  * both sides by floor(unix_micros / C) makes each interval
  * [lo, lo + C] span at most TWO buckets (bucket boundaries are >= C
  * apart and the bucket index is monotone in time): the lo side
  * explodes to its <= 2 covering buckets, the ts side computes one, and
  * the join becomes bucket-equality AND the ORIGINAL predicate — a
  * hash/sort-merge join with a 2x build amplification, lossless by
  * construction (the residual keeps exactness; the bucket cover keeps
  * recall). This is the interval-join strategy dedicated engines ship
  * natively, derived here from the literal span.
  *
  * Fires only where the rewrite is provably safe:
  *  - inner join whose condition is EXACTLY the two range conjuncts
  *    (an extra equi-conjunct means Spark already hash-joins; extra
  *    filters may sit below the join and are untouched);
  *  - both endpoints are plain timestamp attributes (LTZ or NTZ — the
  *    parquet fixtures read as NTZ), one from each side;
  *  - the span is a positive interval LITERAL with no month component
  *    (months have no fixed micro width, so no static bucket exists).
  *
  * Idempotent by shape: the rewritten join's condition has three
  * conjuncts, which the matcher rejects. Null endpoints stay correct:
  * a null bucket matches nothing, and the original predicate drops the
  * same rows from the nested-loop plan.
  *
  * RangeJoinRuleSpec pins fire (no BNLJ + result parity with the rule
  * excluded), bail (strict-equi, extra conjunct, month span), and the
  * boundary cover; PlanSpec pins that q12_range_join — the declared
  * naive formulation — now plans as a hash join THROUGH this rule.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  private def splitCond(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => splitCond(l) ++ splitCond(r)
    case e => Seq(e)
  }

  /** Span of the interval literal in microseconds; None = unsupported.
    * Month components never qualify (no fixed micro width). A
    * CalendarInterval DAY component only qualifies when `ntz` — for
    * LTZ endpoints TimestampAddInterval adds calendar days in the
    * session timezone, so across a DST fall-back the real span exceeds
    * days*86400e6 and the two-bucket cover would drop rows; NTZ day
    * arithmetic is timezone-free and exact. DayTimeIntervalType is a
    * fixed micros duration for both flavors. */
  private def widthOf(l: Literal, ntz: Boolean): Option[Long] = l match {
    case Literal(iv: CalendarInterval, CalendarIntervalType)
        if iv.months == 0 && (ntz || iv.days == 0) =>
      val w = iv.days * 86400000000L + iv.microseconds
      if (w > 0) Some(w) else None
    case Literal(us: Long, _: DayTimeIntervalType) if us > 0 => Some(us)
    case _ => None
  }

  /** Matches `ts <= lo + C` / `ts < lo + C` (either operand order);
    * returns (ts, lo, the whole lo+C expression, C literal). */
  private def upperOf(e: Expression)
      : Option[(AttributeReference, AttributeReference, Expression, Literal)] =
    e match {
      case LessThanOrEqual(ts: AttributeReference,
          add @ TimestampAddInterval(lo: AttributeReference, l: Literal, _)) =>
        Some((ts, lo, add, l))
      case LessThan(ts: AttributeReference,
          add @ TimestampAddInterval(lo: AttributeReference, l: Literal, _)) =>
        Some((ts, lo, add, l))
      case GreaterThanOrEqual(
          add @ TimestampAddInterval(lo: AttributeReference, l: Literal, _),
          ts: AttributeReference) =>
        Some((ts, lo, add, l))
      case GreaterThan(
          add @ TimestampAddInterval(lo: AttributeReference, l: Literal, _),
          ts: AttributeReference) =>
        Some((ts, lo, add, l))
      case _ => None
    }

  /** Is `e` the matching lower bound `ts >= lo` / `ts > lo`? */
  private def lowerMatches(e: Expression, ts: AttributeReference,
      lo: AttributeReference): Boolean = e match {
    case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) =>
      a.exprId == ts.exprId && b.exprId == lo.exprId
    case GreaterThan(a: AttributeReference, b: AttributeReference) =>
      a.exprId == ts.exprId && b.exprId == lo.exprId
    case LessThanOrEqual(b: AttributeReference, a: AttributeReference) =>
      a.exprId == ts.exprId && b.exprId == lo.exprId
    case LessThan(b: AttributeReference, a: AttributeReference) =>
      a.exprId == ts.exprId && b.exprId == lo.exprId
    case _ => false
  }

  private[plans] def timestampLike(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  /** Micros since epoch for either timestamp flavor. NTZ goes through
    * Cast(_, TimestampType, "UTC") — with the zone PINNED to UTC the
    * conversion is the identity on the stored micros, so it is monotone
    * and DST-free. (A session-timezone cast would NOT be safe: a DST
    * gap can stretch an interval past its bucket width and break the
    * two-bucket cover.) Parquet fixtures read as TIMESTAMP_NTZ, so this
    * is the path q12 actually exercises (spec-pinned). */
  private def micros(e: Expression): Expression = e.dataType match {
    case TimestampNTZType =>
      UnixMicros(Cast(e, TimestampType, Some("UTC")))
    case _ => UnixMicros(e)
  }

  /** Truncating (toward-zero) division is monotone, and for every x
    * (negative included) bucket(x + w) - bucket(x) <= 1 — that pair of
    * facts is exactly what the two-element cover {bucket(lo),
    * bucket(lo)+1} needs, so the rewrite stays lossless across the
    * epoch. NOTE: bucket widths are NOT uniform under truncation —
    * bucket 0 spans (-w, w), width 2w-1 — so never derive bucket
    * counts from a uniform-width assumption or "fix" this to floor
    * semantics for uniformity; only monotonicity + the <=1 step bound
    * are load-bearing. */
  private def bucket(e: Expression, w: Long): Expression =
    IntegralDivide(micros(e), Literal(w, LongType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // never rewrite a streaming join: the time-range condition is what
    // lets the stream-stream join bound and evict its state — hiding it
    // behind a bucket equality would break watermark-based cleanup
    case j @ Join(left, right, Inner, Some(cond), _)
        if !left.isStreaming && !right.isStreaming =>
      (splitCond(cond) match {
        case Seq(c1, c2) =>
          Seq((c1, c2), (c2, c1)).flatMap { case (lc, uc) =>
            upperOf(uc).filter { case (ts, lo, _, _) =>
              lowerMatches(lc, ts, lo)
            }
          }.headOption.flatMap { case (ts, lo, add, ivLit) =>
            val bothNtz = ts.dataType == TimestampNTZType &&
              lo.dataType == TimestampNTZType
            widthOf(ivLit, ntz = bothNtz).flatMap { w =>
              if (!timestampLike(ts.dataType) ||
                  !timestampLike(lo.dataType)) None
              else if (left.outputSet.contains(ts) &&
                  right.outputSet.contains(lo))
                Some(rewrite(j, ts, lo, add, w, tsOnLeft = true))
              else if (right.outputSet.contains(ts) &&
                  left.outputSet.contains(lo))
                Some(rewrite(j, ts, lo, add, w, tsOnLeft = false))
              else None
            }
          }
        case _ => None
      }).getOrElse(j)
  }

  private def rewrite(j: Join, ts: AttributeReference,
      lo: AttributeReference, add: Expression, w: Long,
      tsOnLeft: Boolean): LogicalPlan = {
    val tsSide = if (tsOnLeft) j.left else j.right
    val loSide = if (tsOnLeft) j.right else j.left
    val tsBk = Alias(bucket(ts, w), "__graft_bk_ts")()
    val tsPlan = Project(tsSide.output :+ tsBk, tsSide)
    // the interval [lo, lo + C] covers at most two buckets: its own and
    // (possibly) the next — explode exactly that cover, deduplicated
    val cover = ArrayDistinct(CreateArray(Seq(
      bucket(lo, w), bucket(add, w))))
    val bkAttr = AttributeReference("__graft_bk_lo", LongType)()
    val loPlan = Generate(Explode(cover), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(bkAttr),
      child = loSide)
    val newCond = And(EqualTo(tsBk.toAttribute, bkAttr),
      j.condition.get)
    val (nl, nr) =
      if (tsOnLeft) (tsPlan, loPlan) else (loPlan, tsPlan)
    Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
  }
}
