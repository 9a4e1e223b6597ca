package graft.plans

import java.util.Locale

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Registry of COVERING PROJECTIONS — narrow, re-sorted physical copies
  * of a base table the optimizer may substitute under a scan
  * ([[ProjectionRewrite]]): the columnar warehouse's covering index
  * (Vertica projections, Iceberg sort orders, clustered replicas).
  * Deliberately session-global and empty by default, like [[MvCatalog]].
  */
object ProjectionCatalog {

  /** One covering projection.
    *
    * @param basePathSuffix path-component-anchored suffix of the base
    *   relation's single root (shared matching discipline with
    *   [[MvCatalog]] — multi-root scans never match)
    * @param cols  the base column names the projection carries
    *   (case-insensitive). Registration contract: the projection holds
    *   EXACTLY the base table's row multiset restricted to these
    *   columns — build it as `base.select(cols).sort(key)` and maintain
    *   it with the table (the same trust-on-registration contract the
    *   MV catalog documents; the IVM queries show the maintained form)
    * @param proj  analyzed logical plan scanning the projection itself
    */
  final case class ProjDef(
      basePathSuffix: String,
      cols: Set[String],
      proj: LogicalPlan)

  @volatile private var defs: Seq[ProjDef] = Nil
  def register(d: ProjDef): Unit = synchronized {
    require(d.cols.nonEmpty, "a covering projection needs at least one column")
    defs = defs :+ d
  }
  def clear(): Unit = synchronized { defs = Nil }
  def all: Seq[ProjDef] = defs
}

/** Optimizer rule: serve a scan from a registered COVERING PROJECTION
  * when the consuming operators touch only covered columns. Where
  * [[MvRewrite]] collapses rows (and therefore only answers aggregates),
  * a projection keeps the exact row multiset — so the swap is sound for
  * ANY consumer, and the win is physical: the projection is narrower
  * (fewer bytes per row) and re-SORTED on the hot filter key, so
  * min/max row-group pruning skips most of it where the base table's
  * layout cannot. At 100 TB this is the difference between a full-width
  * scan in ingest order and a skip-scan over a narrow sorted copy.
  *
  * Soundness conditions (anything else is left untouched):
  *   - the scan is the registered base relation (single root path, same
  *     discipline as [[MvRewrite.relMatches]]);
  *   - every column the consuming Project/Filter needs is covered. The
  *     matcher handles the post-pushdown shapes `Project(lr)`,
  *     `Project(Filter(lr))`, and `Filter(lr)` — for a bare Filter the
  *     full relation output must be covered, since any parent column
  *     use is invisible from the Filter node;
  *   - the substitution preserves the original attribute identities
  *     (each needed base attribute is re-aliased from the projection's
  *     same-named column under its ORIGINAL exprId, type, and
  *     nullability), so parents never notice.
  *
  * When several registered projections cover the query, the one with
  * the fewest columns wins — the narrowest copy is the smallest scan.
  * Idempotent: the projection's own path never matches the base suffix,
  * and a swapped subtree no longer contains the base relation.
  */
object ProjectionRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (ProjectionCatalog.all.isEmpty) plan
    else plan.transformUp {
      case p @ Project(list, lr: LogicalRelation) =>
        swap(lr, p.references).map(s => Project(list, s)).getOrElse(p)
      case p @ Project(list, f @ Filter(c, lr: LogicalRelation)) =>
        swap(lr, p.references ++ f.references)
          .map(s => Project(list, Filter(c, s))).getOrElse(p)
      case f @ Filter(c, lr: LogicalRelation) =>
        // a bare Filter's parent may read ANY relation column — require
        // full coverage of the relation output
        swap(lr, AttributeSet(lr.output)).map(s => Filter(c, s)).getOrElse(f)
    }

  /** A fresh-exprId instance of the projection plan (one projection can
    * serve several branches of one query). */
  private def fresh(p: LogicalPlan): LogicalPlan = p match {
    case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
    case other => other
  }

  /** Replace `lr` by a Project over the narrowest registered covering
    * projection that carries every needed column, re-aliasing each
    * needed attribute under its original exprId/type/nullability. */
  private def swap(lr: LogicalRelation, needed: AttributeSet): Option[LogicalPlan] = {
    val neededAttrs = lr.output.filter(needed.contains)
    val candidates = ProjectionCatalog.all.filter { d =>
      MvRewrite.relMatches(lr, d.basePathSuffix) &&
        neededAttrs.forall(a => d.cols.exists(_.equalsIgnoreCase(a.name)))
    }
    if (candidates.isEmpty) return None
    val d = candidates.minBy(_.cols.size)
    val scan = fresh(d.proj)
    val byName = scan.output
      .map(a => a.name.toLowerCase(Locale.ROOT) -> a).toMap
    val aliased: Seq[Option[NamedExpression]] = neededAttrs.map { a =>
      byName.get(a.name.toLowerCase(Locale.ROOT))
        .filter(p => p.dataType == a.dataType)
        .map { p =>
          val e: Expression = if (!a.nullable && p.nullable) KnownNotNull(p) else p
          Alias(e, a.name)(exprId = a.exprId, qualifier = a.qualifier)
        }
    }
    if (aliased.exists(_.isEmpty)) None
    else Some(Project(aliased.map(_.get), scan))
  }
}
