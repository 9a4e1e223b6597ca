package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{MaxBy, MinBy}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the top-1-per-key window idiom
  *
  * {{{ filter(row_number() over (partition by K order by O) = 1) }}}
  *
  * into a `max_by`/`min_by` aggregation on K. Why this matters at 100 TB:
  * the window form SORTS every key-partition and ships EVERY row of a hot
  * key across the exchange before discarding all but one; the aggregate
  * form is commutative+associative, so partial aggregation collapses each
  * map task's rows to one per key BEFORE the shuffle (q56's hand-written
  * lesson, applied engine-side to any query that spells it the window way).
  *
  * Soundness conditions (all checked; anything else is left untouched):
  *   - exactly one window expression: `row_number()` — rank/lag users keep
  *     their window;
  *   - ONE conjunct of the filter is the top-1 predicate on rn
  *     (`rn = 1` / `1 = rn` / `rn <= 1` / `rn < 2` and their commutes);
  *     any REMAINING conjuncts must not reference rn and are replayed as
  *     a Filter above the aggregate (the reproduced exprIds keep them
  *     valid) — the common `WHERE rn = 1 AND <payload predicate>` shape
  *     that predicate pushdown cannot split below the window;
  *   - the partition spec is non-empty attributes (a GLOBAL top-1 must not
  *     become an always-one-row aggregate on empty input);
  *   - uniform default-null-ordered sort direction: all-DESC+NULLS LAST →
  *     `max_by`, all-ASC+NULLS FIRST → `min_by`. Struct comparison sorts a
  *     null field BELOW any value, which matches exactly those two window
  *     null placements — mixed or explicit opposite null orders don't map,
  *     so they're skipped;
  *   - deterministic sort keys.
  *
  * Tie behavior: with a non-total order, `row_number` and `max_by` both
  * pick an arbitrary row among the tied maximum — same nondeterminism
  * class, no semantic change. The rewritten node reproduces the window's
  * exact output attributes (same exprIds), with `rn` rebound to literal 1.
  */
object LatestWinsRewrite extends Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Filter(cond, w: Window) =>
      rewrite(cond, w).getOrElse(Filter(cond, w))
    case f @ Filter(cond, p @ Project(projList, w: Window))
        if projList.forall(_.isInstanceOf[AttributeReference]) =>
      rewrite(cond, w).map(agg => Project(projList, agg)).getOrElse(f)
  }

  /** Is `c` the top-1 predicate on `rn`? All four spellings + commutes. */
  private def isTopOnePred(c: Expression, rn: Attribute): Boolean = c match {
    case EqualTo(l: AttributeReference, Literal(1, _)) => l.semanticEquals(rn)
    case EqualTo(Literal(1, _), r: AttributeReference) => r.semanticEquals(rn)
    case LessThanOrEqual(l: AttributeReference, Literal(1, _)) => l.semanticEquals(rn)
    case GreaterThanOrEqual(Literal(1, _), r: AttributeReference) => r.semanticEquals(rn)
    case LessThan(l: AttributeReference, Literal(2, _)) => l.semanticEquals(rn)
    case GreaterThan(Literal(2, _), r: AttributeReference) => r.semanticEquals(rn)
    case _ => false
  }

  private def rewrite(cond: Expression, w: Window): Option[LogicalPlan] = {
    val rnAliasOpt = w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some(a)
      case _ => None
    }
    rnAliasOpt.flatMap { rnAlias =>
      val rn = rnAlias.toAttribute
      // exactly one conjunct selects top-1; the rest must not touch rn
      // and survive as a residual Filter above the aggregate
      val (topOne, residual) =
        splitConjunctivePredicates(cond).partition(isTopOnePred(_, rn))
      val isTopOne = topOne.size == 1 &&
        residual.forall(!_.references.exists(_.semanticEquals(rn)))
      val part = w.partitionSpec
      val order = w.orderSpec
      val partOk = part.nonEmpty && part.forall(_.isInstanceOf[AttributeReference])
      val useMax = order.nonEmpty &&
        order.forall(o => o.direction == Descending && o.nullOrdering == NullsLast)
      val useMin = order.nonEmpty &&
        order.forall(o => o.direction == Ascending && o.nullOrdering == NullsFirst)
      val detOk = order.forall(_.child.deterministic)
      if (!(isTopOne && partOk && (useMax || useMin) && detOk)) None
      else {
        val ordKey = CreateStruct(order.map(_.child))
        val payload = CreateStruct(w.child.output)
        val aggFn = if (useMax) MaxBy(payload, ordKey) else MinBy(payload, ordKey)
        val aggExpr = aggFn.toAggregateExpression()
        val partAttrs = part.map(_.asInstanceOf[AttributeReference])
        val dataCols: Seq[NamedExpression] = w.child.output.zipWithIndex.map {
          case (a, i) =>
            if (partAttrs.exists(_.semanticEquals(a))) a
            else Alias(GetStructField(aggExpr, i, Some(a.name)), a.name)(
              exprId = a.exprId, qualifier = a.qualifier)
        }
        val rnOut = Alias(Literal(1), rnAlias.name)(exprId = rnAlias.exprId)
        val agg = Aggregate(partAttrs, dataCols :+ rnOut, w.child)
        Some(if (residual.isEmpty) agg
             else Filter(residual.reduce(And), agg))
      }
    }
  }
}
