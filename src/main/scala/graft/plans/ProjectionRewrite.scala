package graft.plans

import java.util.Locale

import org.apache.spark.sql.DataFrame
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

  /** Order-independent content fingerprint of `df` restricted to `cols`:
    * (row count, checksum_agg of a canonical row string). The canonical
    * string is SELF-DELIMITING — columns in sorted-name order, each term
    * either `N;` (null) or `<length>:<value>` — so no value content can
    * alias a term boundary: a separator character inside a value, or a
    * value equal to a null sentinel, canonicalizes differently from the
    * shifted-columns row it could otherwise collide with. checksum_agg
    * is the engine's own commutative mod-sum aggregate (q95's law:
    * partitioning-independent), so two frames fingerprint equal iff they
    * hold the same row multiset up to genuine checksum collision —
    * computed with one map-side-combinable pass over each frame, no
    * shuffle beyond the single global agg row. */
  def fingerprint(df: DataFrame, cols: Seq[String]): (Long, Long) = {
    graft.functions.ChecksumAgg.register(df.sparkSession)
    val canon = cols.sorted
      .map(c => s"CASE WHEN `$c` IS NULL THEN 'N;' ELSE " +
        s"concat(length(cast(`$c` as string)), ':', cast(`$c` as string)) END")
      .mkString("concat(", ", ", ")")
    val r = df.selectExpr(s"count(1) AS n", s"checksum_agg($canon) AS c").head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** TRUE iff `proj` holds exactly `base`'s row multiset restricted to
    * `cols` — the freshness check of the registration contract. */
  def verify(base: DataFrame, proj: DataFrame, cols: Seq[String]): Boolean =
    fingerprint(base, cols) == fingerprint(proj, cols)

  /** Register `d` only after verifying the projection frame against the
    * base: a stale or tampered copy (the row-multiset contract broken by
    * a missed maintenance append, a partial write, a manual edit) is
    * DETECTED AND REFUSED instead of silently serving wrong rows. Costs
    * one fingerprint pass over each side — the price of not trusting the
    * registrant, paid once per registration, not per query.
    *
    * ATOMIC vs maintenance: verify-then-register is three steps (base
    * fingerprint, projection fingerprint, register), so a maintenance
    * append landing on the base BETWEEN the base pass and register()
    * would admit a projection that is stale the moment it registers —
    * the exact staleness the check refuses. When the base frame scans a
    * single file-source root (the registered-table shape), the whole
    * window runs under that table's [[graft.operators.Lease]]: a
    * concurrent DedupAppend/appendCycle/StateMerge maintainer fails
    * cleanly instead of interleaving, and a registration attempted
    * during maintenance refuses with HeldException. A multi-root or
    * non-file base (no single lease point) verifies unleased — callers
    * composing such bases own the quiescence guarantee. */
  def registerVerified(base: DataFrame, proj: DataFrame, d: ProjDef): Unit = {
    def verifyAndRegister(): Unit = {
      require(verify(base, proj, d.cols.toSeq),
        s"projection at ${d.basePathSuffix} fingerprint mismatch vs base " +
          "(stale or tampered copy) — refusing to register")
      register(d)
    }
    val roots = base.queryExecution.analyzed.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths
        case _ => Nil
      }
    }.flatten
    roots match {
      case Seq(root) =>
        val fs = root.getFileSystem(base.sparkSession.sparkContext.hadoopConfiguration)
        graft.operators.Lease.withLease(fs, root, "projection registration") {
          verifyAndRegister()
        }
      case _ => verifyAndRegister()
    }
  }

  /** The maintenance half of the projection contract: when an ingest
    * batch lands in the base table, its narrow slice lands in the
    * projection too (plain multiset append — the covering-projection
    * contract is row-multiset equality, not global sortedness; appended
    * files are unsorted, and a periodic Compaction.compact with sortCols
    * restores the clustering that makes min/max pruning sharp). */
  def maintainAppend(batch: DataFrame, projPath: String, cols: Seq[String]): Unit =
    batch.selectExpr(cols.map(c => s"`$c`"): _*)
      .write.mode("append").parquet(projPath)

  @volatile private var defs: Seq[ProjDef] = Nil
  def register(d: ProjDef): Unit = synchronized {
    require(d.cols.nonEmpty, "a covering projection needs at least one column")
    // the rewrite's idempotence precondition, enforced rather than
    // assumed: a projection whose own path matched the base suffix
    // would re-match its own substitution on every fixed-point
    // iteration (fresh exprIds each time — the optimizer batch would
    // never converge)
    require(!d.proj.exists {
      case lr: LogicalRelation => MvRewrite.relMatches(lr, d.basePathSuffix)
      case _ => false
    }, "the projection's own path must not match the base suffix")
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
  *   - a Project sits DIRECTLY above the scan (optionally over a pushed
  *     Filter) — the shapes column pruning always leaves — and every
  *     column it (and the Filter) needs is covered. A bare
  *     `Filter(relation)` with no enclosing Project is NOT swapped:
  *     parent column use is invisible from the Filter node, and a
  *     full-coverage swap there would also preempt a narrower
  *     projection the enclosing Project could have chosen;
  *   - the consuming Project/Filter expressions are deterministic and
  *     carry no file-identity introspection (`input_file_name()` and
  *     the block variants observe WHICH files are read; everything else
  *     sees the identical row multiset — the same visibility caveat
  *     Spark's own cache and compaction already carry);
  *   - the substitution preserves the original attribute identities
  *     (each needed base attribute is re-aliased from the projection's
  *     same-named column under its ORIGINAL exprId, type, and
  *     nullability), so parents never notice.
  *
  * Among the registered projections that cover the query, candidates
  * are tried narrowest-first and the first whose columns alias cleanly
  * wins — the narrowest copy is the smallest scan, and a mis-registered
  * candidate (name/type mismatch vs its own parquet) falls through to
  * the next rather than aborting the swap. Idempotent: registration
  * rejects a projection whose own path matches the base suffix, and a
  * swapped subtree no longer contains the base relation.
  *
  * Batch placement: injected as a PRE-CBO rule (once, AFTER the operator
  * optimization fixpoint that hosts [[MvRewrite]]), never into the shared
  * fixpoint batch. In a shared batch a scan swap could land on an early
  * pass while the aggregate above only becomes MV-matchable on a later
  * one (CollapseProject folding post-agg arithmetic in), permanently
  * preempting the far cheaper |grain|-row MV rewrite; running after the
  * fixpoint has converged means the MV rule has exhausted its chances
  * before any physical-copy swap — the projection then serves exactly
  * what the MV refused. Rows are correct either way; this is plan-cost
  * ordering. (Filter pushdown into the swapped scan is unaffected:
  * PhysicalOperation collects the Project/Filter stack during physical
  * planning, after this batch.)
  */
object ProjectionRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (ProjectionCatalog.all.isEmpty) plan
    else plan.transformUp {
      case p @ Project(list, lr: LogicalRelation) if admissible(list) =>
        swap(lr, p.references).map(s => Project(list, s)).getOrElse(p)
      case p @ Project(list, f @ Filter(c, lr: LogicalRelation))
          if admissible(list) && admissible(Seq(c)) =>
        swap(lr, p.references ++ f.references)
          .map(s => Project(list, Filter(c, s))).getOrElse(p)
    }

  /** Deterministic and free of file-identity introspection — the two
    * expression classes that could observe the physical swap. */
  private def admissible(es: Seq[Expression]): Boolean =
    es.forall(e => e.deterministic && !e.exists {
      case _: InputFileName | _: InputFileBlockStart | _: InputFileBlockLength => true
      case _ => false
    })

  /** A fresh-exprId instance of the projection plan (one projection can
    * serve several branches of one query). */
  private def fresh(p: LogicalPlan): LogicalPlan = p match {
    case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
    case other => other
  }

  /** Replace `lr` by a Project over a registered covering projection
    * that carries every needed column, re-aliasing each needed attribute
    * under its original exprId/type/nullability. Candidates are tried
    * narrowest-first; one whose parquet schema fails the name/type check
    * falls through to the next rather than aborting the swap. */
  private def swap(lr: LogicalRelation, needed: AttributeSet): Option[LogicalPlan] = {
    val neededAttrs = lr.output.filter(needed.contains)
    val candidates = ProjectionCatalog.all.filter { d =>
      MvRewrite.relMatches(lr, d.basePathSuffix) &&
        neededAttrs.forall(a => d.cols.exists(_.equalsIgnoreCase(a.name)))
    }.sortBy(_.cols.size)
    def tryOne(d: ProjectionCatalog.ProjDef): Option[LogicalPlan] = {
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
    candidates.view.flatMap(tryOne).headOption
  }
}
