package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, DecimalType, IntegerType, LongType, ShortType}

/** Registry of materialized aggregates the optimizer may substitute for
  * base-table scans ([[MvRewrite]]). Deliberately session-global (the
  * engine is one JVM per deployment unit; a catalog-backed store swaps in
  * behind the same interface at scale) and empty by default — the rule is
  * a no-op until a pipeline registers a view.
  */
object MvCatalog {

  /** One materialized aggregate.
    *
    * @param basePathSuffix matched against the END of the base relation's
    *   file-source root path (the engine's tables are single parquet
    *   roots; a catalog identity replaces this at scale)
    * @param groupCols      the MV's grouping columns (base-table names;
    *   the MV stores them under the same names)
    * @param sumMeasures    canonical SQL of a base-side measure expression
    *   (as produced by `Expression.sql` on the analyzed tree) → the MV
    *   column holding its per-group exact SUM
    * @param countCol       MV column holding the per-group `count(*)`
    * @param mv             analyzed logical plan scanning the MV itself
    */
  final case class MvDef(
      basePathSuffix: String,
      groupCols: Set[String],
      sumMeasures: Map[String, String],
      countCol: String,
      mv: LogicalPlan)

  @volatile private var defs: Seq[MvDef] = Nil
  def register(d: MvDef): Unit = synchronized { defs = defs :+ d }
  def clear(): Unit = synchronized { defs = Nil }
  def all: Seq[MvDef] = defs
}

/** Optimizer rule: answer an aggregation from a MATERIALIZED VIEW instead
  * of the base table when the MV's granularity is coarse enough — the
  * "aggregate navigator" every warehouse engine grows. A query grouping by
  * a SUBSET of an MV's grouping columns re-aggregates the MV's per-group
  * partials: `sum(x)` becomes `sum(mv.sum_x)`, `count(*)` becomes
  * `sum(mv.cnt)`. Why this matters at 100 TB: the rewritten scan reads the
  * MV's |group-domain| rows instead of the corpus — the same partial-
  * aggregation algebra q63's incremental rollup maintains by hand, applied
  * transparently to any query that matches.
  *
  * Soundness conditions (all checked; anything else is left untouched):
  *   - the aggregate's child is the registered base relation (optionally
  *     under a Project) — matched by file-source root path;
  *   - every grouping expression resolves to a bare base column contained
  *     in the MV's grouping set;
  *   - every aggregate is a plain `sum` over a registered measure
  *     expression (matched by canonical `Expression.sql` through the
  *     Project, so `sum(cast(round(l_quantity*100) as bigint))` matches
  *     however the query spells it) or `count(*)` / `count(1)` — no
  *     DISTINCT, no FILTER clauses;
  *   - an interposed Filter is replayed against the MV iff its
  *     (deterministic) predicate references ONLY grouping columns —
  *     whole-group selection commutes with the pre-aggregation; a
  *     predicate on any other column selects WITHIN groups the MV has
  *     already collapsed, so it blocks the rewrite;
  *   - the summed type is integral or decimal: exact and order-independent
  *     under re-aggregation. FLOAT/DOUBLE sums are NOT rewritten — a
  *     regrouped float sum changes addition order and therefore the last
  *     ulp, and this engine's contract is bit-equality (Tables scaladoc).
  *
  * The rewritten Aggregate reproduces the original output attributes
  * (names AND exprIds — the [[LatestWinsRewrite]] discipline), so parent
  * operators never notice. Idempotent under AQE's logical re-optimization:
  * the MV's own path never matches `basePathSuffix`.
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.all.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        MvCatalog.all.view.flatMap(d => rewrite(agg, d)).headOption.getOrElse(agg)
    }

  /** Strip qualifiers/backticks so `Expression.sql` compares stably. */
  private def canon(e: Expression): String =
    e.sql.replace("`", "").toLowerCase(java.util.Locale.ROOT)

  private def exactSum(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    case _ => false
  }

  /** Re-aggregate under the ORIGINAL output contract: the replacement
    * must reproduce the original alias's exprId AND data type — a
    * re-aggregated decimal sum widens precision (p+10 → p+20), and a
    * parent operator reading the stale narrower type through the reused
    * exprId would misdecode the row. Cast back when the types differ
    * (only reachable for decimals; an overflow past the original
    * precision would have overflowed the original query too). */
  private def reAgg(fn: Sum, orig: Alias): NamedExpression = {
    val e = fn.toAggregateExpression()
    val body = if (e.dataType == orig.dataType) e else Cast(e, orig.dataType)
    Alias(body, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
  }

  private def rewrite(agg: Aggregate, d: MvCatalog.MvDef): Option[LogicalPlan] = {
    // ---- locate the base relation, optionally under Project / Filter ----
    // A Filter is admissible only when its predicate touches NOTHING but
    // the MV's grouping columns: such a predicate partitions whole MV
    // groups, so it commutes with the pre-aggregation and can be replayed
    // verbatim against the MV. A predicate on any other column selects
    // WITHIN groups, which the MV's partial sums have already collapsed —
    // never rewritable.
    // By rule time, pushdown has usually moved the Filter BELOW the
    // Project — accept it on either side.
    val (projList, filterCond, rel) = agg.child match {
      case lr: LogicalRelation => (None, None, Some(lr))
      case Filter(c, lr: LogicalRelation) => (None, Some(c), Some(lr))
      case Project(pl, lr: LogicalRelation) => (Some(pl), None, Some(lr))
      case Project(pl, Filter(c, lr: LogicalRelation)) => (Some(pl), Some(c), Some(lr))
      case Filter(c, Project(pl, lr: LogicalRelation)) => (Some(pl), Some(c), Some(lr))
      case _ => (None, None, None)
    }
    // path-component anchored: "/x/lineitem.parquet" matches the suffix
    // "lineitem.parquet", "/x/archived_lineitem.parquet" must NOT
    val isBase = rel.exists(_.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists { p =>
          val s = p.toString
          s == d.basePathSuffix || s.endsWith("/" + d.basePathSuffix)
        }
      case _ => false
    })
    if (!isBase) return None

    // resolve an attribute through the optional Project to its defining expr
    val defOf: Map[ExprId, Expression] = projList
      .map(_.collect {
        case a: AttributeReference => a.exprId -> (a: Expression)
        case al: Alias => al.exprId -> al.child
      }.toMap)
      .getOrElse(Map.empty)
    def resolve(e: Expression): Expression = e match {
      case a: AttributeReference => defOf.getOrElse(a.exprId, a)
      case other => other
    }

    val mvAttrByName: Map[String, Attribute] =
      d.mv.output.map(a => a.name -> a).toMap
    def mvAttr(name: String): Option[Attribute] = mvAttrByName.get(name)

    // ---- grouping: bare base columns within the MV's grouping set -------
    val groupBase: Option[Seq[AttributeReference]] =
      Some(agg.groupingExpressions).filter(_.nonEmpty).flatMap { ges =>
        val rs = ges.map(resolve)
        if (rs.forall { case a: AttributeReference => d.groupCols(a.name); case _ => false })
          Some(rs.map(_.asInstanceOf[AttributeReference]))
        else None
      }
    if (groupBase.isEmpty) return None

    // ---- aggregate list: rewrite each output column ---------------------
    val rewritten: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        // grouping passthrough
        resolve(a) match {
          case b: AttributeReference if d.groupCols(b.name) =>
            mvAttr(b.name).map(m => Alias(m, a.name)(exprId = a.exprId,
              qualifier = a.qualifier))
          case _ => None
        }
      case al @ Alias(AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _), _) =>
        mvAttr(d.countCol).map(m => reAgg(Sum(m), al))
      case al @ Alias(AggregateExpression(Sum(child, _), _, false, None, _), _)
          if exactSum(child.dataType) =>
        d.sumMeasures.get(canon(resolve(child)))
          .flatMap(mvAttr)
          .map(m => reAgg(Sum(m), al))
      case _ => None
    }
    if (rewritten.exists(_.isEmpty)) return None

    val newGrouping = groupBase.get.flatMap(g => mvAttr(g.name))
    if (newGrouping.length != groupBase.get.length) return None

    // ---- replay an admissible filter against the MV ---------------------
    val newChild: Option[LogicalPlan] = filterCond match {
      case None => Some(d.mv)
      case Some(cond) if cond.deterministic =>
        var ok = true
        val rebound = cond.transform {
          case a: AttributeReference =>
            resolve(a) match {
              case b: AttributeReference if d.groupCols(b.name) && mvAttr(b.name).isDefined =>
                mvAttr(b.name).get
              case _ => ok = false; a
            }
        }
        if (ok) Some(Filter(rebound, d.mv)) else None
      case _ => None
    }
    newChild.map(c => Aggregate(newGrouping, rewritten.map(_.get), c))
  }
}
