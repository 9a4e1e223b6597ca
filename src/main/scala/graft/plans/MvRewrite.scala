package graft.plans

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Count, HllSketchAgg, HllUnionAgg, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
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

  /** An equi-join base for a view materialized over N tables
    * (the star-join MV — at 100 TB the view pre-pays the fact-side
    * shuffles once at build time instead of per query). Matched
    * structurally: inner joins are associative AND commutative, so the
    * query's join tree is FLATTENED — any tree over the same relation
    * set with the same equi-conjunct set computes the same relation —
    * and both sets must EQUAL the registration (each relation matched
    * by path suffix to exactly one registered suffix, the pooled join
    * conjuncts equal as a set of unordered name pairs). Equality of
    * relations, not containment, so the rewrite is sound by
    * construction and immune to join reordering.
    *
    * `outer = true` declares the `fact LEFT JOIN dim` shape instead —
    * the most common BI aggregate. Outer joins are neither associative
    * nor condition-splittable, so the outer match is EXACT-SHAPE: two
    * relations (suffixes(0) = the preserved fact side, suffixes(1) = the
    * dim side), a LeftOuter join whose condition is exactly the
    * registered key set, fact-side filters pooled back (they commute
    * with a left join), dim-side filters refused except the optimizer's
    * own inferred `IsNotNull(join key)` (a semantic no-op: null dim keys
    * never match, and a left join keeps only matching dim rows). An
    * outer registration REQUIRES `dimUnique = true` — the registrant's
    * declared contract (like projection freshness) that the dim key is
    * unique, which is what makes the view fact-preserving: each fact row
    * appears exactly once, unmatched rows survive at the null dim grain,
    * so the view's count(*) is the fact count and its measures are
    * fact-level. A non-unique dim would duplicate facts at build time —
    * refuse registration rather than materialize a view whose grain
    * nobody can interpret.
    *
    * @param suffixes path suffixes of the base relations (2+; exactly 2
    *   and ordered fact-then-dim when `outer`)
    * @param keyPairs the equi-join key columns, one unordered name pair
    *   per conjunct (case-insensitive)
    * @param outer    the view is `suffixes(0) LEFT JOIN suffixes(1)`
    * @param dimUnique registrant's assertion that the dim-side join key
    *   is unique — required for `outer`
    */
  final case class JoinSpec(
      suffixes: Seq[String],
      keyPairs: Seq[(String, String)],
      outer: Boolean = false,
      dimUnique: Boolean = false)

  /** One materialized aggregate.
    *
    * @param basePathSuffix matched against the END of the base relation's
    *   file-source root path (the engine's tables are single parquet
    *   roots; a catalog identity replaces this at scale). Ignored when
    *   `baseJoin` is set — a join view never answers single-table
    *   queries (its rows are join-filtered and join-duplicated)
    * @param groupCols      the MV's grouping columns (base-table names;
    *   the MV stores them under the same names)
    * @param sumMeasures    ANALYZED base-side measure expression trees →
    *   the MV column holding each measure's per-group exact SUM. Matched
    *   structurally (identifier-case-insensitive, literal-case-PRESERVING
    *   — see [[MvRewrite.sameMeasure]]), never by SQL-string comparison;
    *   register both the analyzed and optimized spelling via
    *   [[measureExprs]] so the matcher meets the query's tree in either
    *   state.
    * @param countCol       MV column holding the per-group `count(*)`
    * @param mv             analyzed logical plan scanning the MV itself
    *   (re-instantiated with fresh exprIds at every substitution, so one
    *   view can appear in several branches of one query)
    * @param minMeasures    like `sumMeasures` but for per-group MIN
    *   columns; min re-aggregates as min-of-mins — a semilattice, so
    *   order-independent for ANY orderable type (floats included: no
    *   addition-order hazard, unlike sums)
    * @param maxMeasures    per-group MAX columns (max-of-maxes)
    * @param avgMeasures    measure tree → (per-group SUM column, per-group
    *   NON-NULL COUNT column — `count(measure)`, not `count(*)`: avg
    *   divides by the non-null count, and the two differ wherever the
    *   measure is null). `avg` re-aggregates as
    *   sum-of-sums / sum-of-counts; decimal measures only (exact,
    *   order-independent totals — see [[MvRewrite.reAvgE]])
    * @param baseJoin       when set, the view is materialized over an
    *   inner equi-join of N tables ([[JoinSpec]]); the matcher then
    *   requires the query's pre-aggregate subtree to be THE SAME join
    *   (flattened — any bracketing, any side order)
    * @param viewFilters    predicate conjuncts BAKED INTO the view's
    *   definition (each inner Seq = the spellings of ONE conjunct, via
    *   [[measureExprs]]). A query rewrites only if it contains a
    *   conjunct structurally equal to EVERY baked-in conjunct (the view
    *   holds a subset of the base — a query over more rows than the
    *   view has can never be answered from it); matching query
    *   conjuncts are absorbed (already applied at build time), the rest
    *   replay against the view iff they are grain functions
    * @param baseUnion      when set, the view is materialized over a
    *   UNION ALL of these relations (path-suffix MULTISET — a repeated
    *   suffix means that table's rows count twice, as stored); the
    *   matcher flattens the query's union and requires the multiset,
    *   per-position trees, and per-child filters to line up
    *   ([[MvRewrite.matchUnion]]). The hot/cold partitioned-corpus view
    * @param sketchMeasures measure tree → (MV column holding the
    *   per-group Datasketches HLL sketch BINARY built by
    *   `hll_sketch_agg(measure, lgK)`, that lgK). A coarser
    *   `hll_sketch_estimate(hll_sketch_agg(measure, lgK))` re-aggregates
    *   as the estimate of `hll_union_agg` over the stored partials —
    *   HLL registers are MAX-merged, so the union of per-group sketches
    *   has exactly the one-shot build's registers and the SAME estimate
    *   (the mergeable-sketch rollup every OLAP store keeps). Only the
    *   ESTIMATE is contracted: a query outputting raw sketch bytes
    *   refuses (build-vs-merge serialization is not byte-stable), and a
    *   different lgK refuses (different register arrays)
    */
  final case class MvDef(
      basePathSuffix: String,
      groupCols: Set[String],
      sumMeasures: Seq[(Expression, String)],
      countCol: String,
      mv: LogicalPlan,
      minMeasures: Seq[(Expression, String)] = Nil,
      maxMeasures: Seq[(Expression, String)] = Nil,
      avgMeasures: Seq[(Expression, (String, String))] = Nil,
      baseJoin: Option[JoinSpec] = None,
      viewFilters: Seq[Seq[Expression]] = Nil,
      baseUnion: Option[Seq[String]] = None,
      sketchMeasures: Seq[(Expression, (String, Int))] = Nil)

  /** The analyzed and optimized expression trees of measure `c` over
    * `df` — the ONE spelling of the registration contract, shared by the
    * library queries and the specs (a registration derived from the
    * engine's own trees can never drift from the matcher). */
  def measureExprs(df: DataFrame, c: Column): Seq[Expression] = {
    val qe = df.select(c.as("__graft_mv_measure")).queryExecution
    Seq(qe.analyzed, qe.optimizedPlan).collect {
      case p: Project => p.projectList.head match {
        case a: Alias => a.child
        case other => other
      }
    }.distinct
  }

  @volatile private var defs: Seq[MvDef] = Nil
  def register(d: MvDef): Unit = synchronized {
    // a def is over exactly ONE base kind: both set would silently win
    // as a join and answer join-shaped queries from union-built rows; a
    // <2-relation union/join can never match (flatten always yields ≥2
    // leaves) — a dead registration nothing downstream would flag
    require(d.baseJoin.isEmpty || d.baseUnion.isEmpty,
      "an MvDef is over ONE base kind: baseJoin and baseUnion are exclusive")
    require(d.baseUnion.forall(_.size >= 2),
      "baseUnion needs at least two relation suffixes")
    require(d.baseJoin.forall(_.suffixes.size >= 2),
      "baseJoin needs at least two relation suffixes")
    // a self-join spec (repeated suffix) can never match — the matcher
    // requires all relation column names pairwise disjoint, impossible
    // for two instances of one schema; an empty key set would degrade
    // the condition match to cross-join equivalence
    require(d.baseJoin.forall(j => j.suffixes.distinct.size == j.suffixes.size),
      "baseJoin suffixes must be distinct (a self-join view cannot match)")
    require(d.baseJoin.forall(_.keyPairs.nonEmpty),
      "baseJoin needs at least one equi-key pair")
    // an outer-join view is sound to interpret only under the declared
    // dim-key-uniqueness contract (fact-preserving), and only the 2-table
    // fact LEFT JOIN dim shape is matched
    require(d.baseJoin.forall(j => !j.outer || (j.suffixes.size == 2 && j.dimUnique)),
      "an outer JoinSpec is exactly fact LEFT JOIN dim and requires dimUnique")
    // the rewrite's idempotence precondition, enforced rather than
    // assumed (mirroring ProjectionCatalog.register): an MV whose own
    // plan scans any registered base suffix would re-match its own
    // substitution on every fixpoint iteration with fresh exprIds —
    // the optimizer batch would never converge
    val suffixes = (d.basePathSuffix +:
      (d.baseJoin.map(_.suffixes).getOrElse(Nil) ++
       d.baseUnion.getOrElse(Nil))).filter(_.nonEmpty)
    require(!d.mv.exists {
      case lr: LogicalRelation => suffixes.exists(s => MvRewrite.relMatches(lr, s))
      case _ => false
    }, "the MV's own plan must not scan any registered base suffix")
    defs = defs :+ d
  }
  def clear(): Unit = synchronized { defs = Nil }
  def all: Seq[MvDef] = defs
}

/** Optimizer rule: answer an aggregation from a MATERIALIZED VIEW instead
  * of the base table when the MV's granularity is coarse enough — the
  * "aggregate navigator" every warehouse engine grows. A query grouping by
  * a SUBSET of an MV's grouping columns re-aggregates the MV's per-group
  * partials: `sum(x)` becomes `sum(mv.sum_x)`, `count(*)` becomes
  * `sum(mv.cnt)`. ROLLUP / CUBE / GROUPING SETS over the MV's columns
  * rewrite too: the Expand that replicates each input row per grouping
  * set replays over the MV's group rows instead of the corpus (the
  * partial sums re-aggregate per set exactly as the flat case does). Why
  * this matters at 100 TB: the rewritten scan reads the MV's
  * |group-domain| rows instead of the corpus — the same partial-
  * aggregation algebra q63's incremental rollup maintains by hand, applied
  * transparently to any query that matches.
  *
  * Soundness conditions (all checked; anything else is left untouched):
  *   - the aggregate's child is the registered base relation — matched by
  *     file-source root path under any Project/Filter stack (and for
  *     rollup/cube the Expand) — or, for a view registered over an INNER
  *     EQUI-JOIN of N tables ([[MvCatalog.JoinSpec]]), exactly that join
  *     FLATTENED (inner joins are associative and commutative, so any
  *     bracketing/side order is the same relation): each relation matched
  *     by path to exactly one registered suffix, the pooled join
  *     conjuncts equal as a set to the registered key pairs (equality of
  *     relations, never containment), and no column name shared between
  *     any two relations (grain/measure matching is name-keyed) — or,
  *     for a view registered over a UNION ALL
  *     ([[MvCatalog.MvDef.baseUnion]]), exactly that union FLATTENED:
  *     suffix multiset 1:1, per-output-position structural tree
  *     alignment across children, per-child filter-set equality
  *     ([[matchUnion]]);
  *   - every predicate conjunct BAKED INTO the view's definition
  *     ([[MvCatalog.MvDef.viewFilters]]) appears structurally in the
  *     query (the view stores a subset of the base — absorbed conjuncts
  *     were applied at build time); an `IsNotNull` the subtree already
  *     guarantees (inner-join key, operand of an absorbed
  *     null-intolerant conjunct — the optimizer's own inferred
  *     constraints) is dropped;
  *   - every grouping expression is a deterministic, subquery-free tree
  *     over columns in the MV's grouping set — bare grain columns or
  *     DERIVED groupings (`year(date)` over a date-grain view, a status
  *     bucketing), rebound onto the MV's stored grouping columns; a
  *     GLOBAL aggregate refuses (an empty base yields one row, an empty
  *     MV zero). For Expand shapes: every non-literal projection
  *     expression resolves to a bare grouping column or a registered
  *     measure;
  *   - every output column is a deterministic, subquery-free expression
  *     over rewritable aggregates and grouping columns (post-aggregate
  *     arithmetic like `avg(x) * 1e6` or `sum(a) / count(*)` that
  *     CollapseProject folds into the Aggregate rewrites node-by-node —
  *     each nested aggregate is replaced under its exact type/nullability
  *     contract, so the surrounding tree re-types identically);
  *   - every aggregate is a plain `sum`, `min`, `max`, or `avg` over a
  *     measure registered for that aggregate kind — matched STRUCTURALLY
  *     on the analyzed expression tree (identifier case is normalized,
  *     literal values and their case are preserved, so `'A'` never
  *     matches `'a'`) — or `count(*)` / `count(1)` — or
  *     `count(DISTINCT g)` where `g` is an MV GROUPING column (the view
  *     holds exactly the distinct grain combinations, so the distinct
  *     count re-aggregates exactly) — or `count(measure)` for a measure
  *     with a registered avg pair (whose count column IS the per-group
  *     non-null count) — or `min`/`max` of a GRAIN column (the view
  *     stores every distinct combination and min/max are multiplicity-
  *     independent); any other DISTINCT and any FILTER clause refuses. `min`/`max` re-aggregate as min-of-mins /
  *     max-of-maxes — semilattices, order-independent for ANY orderable
  *     type (no float restriction); `avg` re-aggregates as sum-of-sums
  *     over sum-of-NON-NULL-counts (a per-measure count column the view
  *     must store — `count(*)` overcounts null measures), decimal
  *     measures only, replaying Average's own divide algebra
  *     operand-type-exactly ([[reAvgE]]);
  *   - an interposed Filter is replayed against the MV iff its
  *     (deterministic, subquery-free) predicate is a FUNCTION OF THE
  *     GRAIN — bare grouping columns or derived expressions of them —
  *     since whole-group selection commutes with the pre-aggregation; a
  *     predicate touching any other column selects WITHIN groups the MV
  *     has already collapsed, so it blocks the rewrite;
  *   - the summed type is integral or decimal: exact and order-independent
  *     under re-aggregation. FLOAT/DOUBLE sums are NOT rewritten — a
  *     regrouped float sum changes addition order and therefore the last
  *     ulp, and this engine's contract is bit-equality (Tables scaladoc).
  *
  * The rewritten Aggregate reproduces the original output attributes
  * (names, exprIds, data types AND nullability — `count(*)`'s
  * non-nullable Long stays non-nullable via KnownNotNull, sound because a
  * group only exists where at least one MV partial row does), so parent
  * operators never notice. When SEVERAL registered views match, the one
  * with the fewest grouping columns wins — the coarsest sufficient grain
  * is the smallest scan (grain size is the only cost signal a partial-sum
  * MV needs; ties keep registration order). Idempotent under AQE's
  * logical re-optimization: the MV's own path never matches
  * `basePathSuffix`.
  */
object MvRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvCatalog.all.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        // all sufficient views compete; the coarsest grain reads the
        // fewest rows (first registration wins ties — deterministic)
        val candidates = MvCatalog.all.flatMap(d => rewrite(agg, d).map(d -> _))
        if (candidates.isEmpty) agg else candidates.minBy(_._1.groupCols.size)._2
    }

  // ---- structural measure matching --------------------------------------

  /** Pin every attribute to a case-normalized name-derived exprId, then
    * canonicalize: two trees compare equal iff they are the same
    * computation over same-named columns. Identifiers are matched
    * case-insensitively; literals keep their exact value (and case), so
    * a measure containing `'A'` can never match a query using `'a'` —
    * the soundness hole string-lowercasing had.
    *
    * The pinned id comes from a shared name→id registry, NOT the name's
    * hashCode: canonicalization erases attribute names and compares by
    * exprId alone, so a hash collision (`"an".hashCode == "c0".hashCode`
    * — base-31 makes such pairs routine) would make measures over
    * DIFFERENT columns canonicalize equal — a silent wrong-answer
    * rewrite. The registry is
    * injective by construction (one fresh id per distinct name, ids grow
    * with the number of distinct column names ever seen — schema-sized,
    * process-lifetime bounded). */
  private val pinnedIds = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val pinnedSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  private def normalized(e: Expression): Expression = e.transformUp {
    case a: AttributeReference =>
      val n = a.name.toLowerCase(Locale.ROOT)
      val id = pinnedIds.computeIfAbsent(n, _ => pinnedSeq.incrementAndGet()).longValue()
      AttributeReference(n, a.dataType, nullable = true)(
        exprId = ExprId(id), qualifier = Nil)
  }.canonicalized

  private def sameMeasure(registered: Expression, query: Expression): Boolean =
    normalized(registered) == normalized(query)

  private def matchIn(measures: Seq[(Expression, String)],
                      resolved: Expression): Option[String] =
    measures.collectFirst { case (m, c) if sameMeasure(m, resolved) => c }

  private def matchMeasure(d: MvCatalog.MvDef, resolved: Expression): Option[String] =
    matchIn(d.sumMeasures, resolved)

  private def matchPair(measures: Seq[(Expression, (String, String))],
                        resolved: Expression): Option[(String, String)] =
    measures.collectFirst { case (m, cols) if sameMeasure(m, resolved) => cols }

  private def exactSum(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _: DecimalType => true
    case _ => false
  }

  // ---- shared plumbing ---------------------------------------------------

  /** A fresh-exprId instance of the MV plan, so the same registered view
    * can be spliced into several branches of one query (e.g. a self-join
    * of two rewritten aggregates) without duplicate attribute ids. */
  private def freshMv(p: LogicalPlan): LogicalPlan = p match {
    case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
    case other => other
  }

  /** Split a conjunction into its conjuncts. */
  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConj(l) ++ splitConj(r)
    case other => Seq(other)
  }

  /** Peel any stack of Project / Filter layers down to the first other
    * node, collecting every project definition (attr → defining tree)
    * and every filter conjunct along the way. Pushdown freely reorders
    * and splits these layers, so the matcher must accept any stack. */
  private def peel(plan: LogicalPlan)
      : (Map[ExprId, Expression], Seq[Expression], LogicalPlan) = {
    var defs = Map.empty[ExprId, Expression]
    var conj = Vector.empty[Expression]
    var cur = plan
    var done = false
    while (!done) cur match {
      case Project(pl, child) =>
        defs ++= pl.collect {
          case a: AttributeReference => a.exprId -> (a: Expression)
          case al: Alias => al.exprId -> al.child
        }
        cur = child
      case Filter(c, child) =>
        conj ++= splitConj(c); cur = child
      case _ => done = true
    }
    (defs, conj, cur)
  }

  /** Substitute project definitions to a fixpoint: Project layers may
    * stack (each definition referencing attributes a LOWER layer
    * defines), so one-step lookup is not enough. ExprIds are unique and
    * definitions acyclic, so a substitution chain visits each distinct
    * definition at most once — `defs.size + 1` steps PROVABLY reach the
    * fixpoint (a constant budget could instead stop early on a deep
    * stack and hand the name-keyed matchers a partially-resolved tree
    * whose project-local attribute shadows a base column's name — a
    * wrong rewrite, not a refusal). */
  private def mkResolve(defs: Map[ExprId, Expression]): Expression => Expression = {
    def step(e: Expression): Expression = e.transformUp {
      case a: AttributeReference => defs.getOrElse(a.exprId, a)
    }
    e => {
      var cur = e
      var next = step(cur)
      var fuel = defs.size + 1
      while (next != cur && fuel > 0) { cur = next; next = step(cur); fuel -= 1 }
      next
    }
  }

  /** Path-component anchored: "/x/lineitem.parquet" matches the suffix
    * "lineitem.parquet", "/x/archived_lineitem.parquet" must NOT. The
    * relation must have exactly ONE root path: a multi-path scan
    * (`spark.read.parquet(a, b)`) contains rows the registered table
    * does not — matching on ANY root would silently drop the other
    * paths' rows from the rewritten aggregate. */
  private[plans] def relMatches(lr: LogicalRelation, suffix: String): Boolean =
    lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths match {
          case Seq(p) =>
            val s = p.toString
            s == suffix || s.endsWith("/" + suffix)
          case _ => false
        }
      case _ => false
    }

  /** Exactly-one-suffix MULTISET assignment, shared by the join and
    * union matchers: every relation matches exactly one distinct
    * registered suffix, and per-suffix relation counts equal the
    * registered multiplicities. */
  private def suffixAssignment(rels: Seq[LogicalRelation],
                               suffixes: Seq[String]): Boolean = {
    val assigned = rels.map(lr => suffixes.distinct.filter(s => relMatches(lr, s)))
    assigned.forall(_.size == 1) &&
      assigned.map(_.head).groupBy(identity).view.mapValues(_.size).toMap ==
        suffixes.groupBy(identity).view.mapValues(_.size).toMap
  }

  /** The matched pre-aggregate subtree: a resolver from query
    * attributes to base-column trees, every filter conjunct found
    * anywhere in the subtree, and (join bases) the lowercased key
    * column names — whose inferred IsNotNulls the inner join itself
    * implies. */
  private final case class BaseMatch(
      resolve: Expression => Expression,
      conjuncts: Seq[Expression],
      joinKeyCols: Set[String])

  /** Match the aggregate's child against the registered base: a single
    * relation; or (for a [[MvCatalog.JoinSpec]] def) an inner equi-join
    * of the N registered relations FLATTENED — any bracketing or side
    * order, any admissible Project/Filter stack above the join and on
    * each side (inner-join filters commute with the join, so side and
    * above-join conjuncts are one pool) — on EXACTLY the registered key
    * set; or (for a [[MvCatalog.MvDef.baseUnion]] def) the registered
    * UNION ALL ([[matchUnion]]). */
  private def matchBase(plan: LogicalPlan, d: MvCatalog.MvDef): Option[BaseMatch] =
    d.baseJoin match {
      case None if d.baseUnion.isDefined => matchUnion(plan, d.baseUnion.get)
      case None =>
        val (defs, conj, core) = peel(plan)
        core match {
          case lr: LogicalRelation if relMatches(lr, d.basePathSuffix) =>
            Some(BaseMatch(mkResolve(defs), conj, Set.empty))
          case _ => None
        }
      case Some(js) if js.outer =>
        // the fact LEFT JOIN dim view: exact-shape match (outer joins are
        // neither associative nor condition-splittable). Fact-side filters
        // commute with a left join, so they pool back into the conjunct
        // set; dim-side filters do NOT (they would drop the null-extended
        // rows the view stored) — the only admissible dim-side conjunct is
        // the optimizer's own inferred IsNotNull(join key), a semantic
        // no-op. The condition must be EXACTLY the registered key set: an
        // extra ON-conjunct changes which fact rows null-extend and can
        // never be pooled out. joinKeyCols stays EMPTY — a left join does
        // not imply fact-side key non-nullness (unmatched rows keep their
        // keys, matched null keys never occur, but an unmatched row's key
        // CAN be null), so no IsNotNull is absorbed as implied.
        val (defsTop, conjTop, core) = peel(plan)
        core match {
          case Join(l, r, LeftOuter, Some(cond), _) =>
            val (dl, cl, coreL) = peel(l)
            val (dr, cr, coreR) = peel(r)
            (coreL, coreR) match {
              case (flr: LogicalRelation, dlr: LogicalRelation)
                  if relMatches(flr, js.suffixes(0)) &&
                     relMatches(dlr, js.suffixes(1)) =>
                val nameSets = Seq(flr, dlr).map(
                  _.output.map(_.name.toLowerCase(Locale.ROOT)).toSet)
                if (nameSets.map(_.size).sum != nameSets.flatten.toSet.size)
                  return None
                val resolve = mkResolve(defsTop ++ dl ++ dr)
                val want: Set[Set[String]] = js.keyPairs.map { case (a, b) =>
                  Set(a.toLowerCase(Locale.ROOT), b.toLowerCase(Locale.ROOT))
                }.toSet
                val seen = splitConj(cond).map {
                  case EqualTo(a, b) => (resolve(a), resolve(b)) match {
                    case (x: AttributeReference, y: AttributeReference) =>
                      Some(Set(x.name.toLowerCase(Locale.ROOT),
                               y.name.toLowerCase(Locale.ROOT))).filter(want)
                    case _ => None
                  }
                  case _ => None
                }
                if (seen.exists(_.isEmpty) || seen.flatten.toSet != want)
                  return None
                val keyNames = want.flatten
                val dimOk = cr.forall {
                  case IsNotNull(a: AttributeReference) => resolve(a) match {
                    case b: AttributeReference =>
                      keyNames(b.name.toLowerCase(Locale.ROOT))
                    case _ => false
                  }
                  case _ => false
                }
                if (!dimOk) return None
                Some(BaseMatch(resolve, conjTop ++ cl, Set.empty))
              case _ => None
            }
          case _ => None
        }
      case Some(js) =>
        // flatten the all-Inner join tree (any shape — pushdown inserts
        // Project/Filter layers between joins, ReorderJoin re-brackets),
        // pooling relations, project defs, filter conjuncts, and join
        // conjuncts; anything but Inner-with-condition refuses
        val rels = Seq.newBuilder[LogicalRelation]
        var defs = Map.empty[ExprId, Expression]
        var conj = Vector.empty[Expression]
        var joinConds = Vector.empty[Expression]
        def flatten(p: LogicalPlan): Boolean = {
          val (d, c, core) = peel(p)
          defs ++= d; conj ++= c
          core match {
            case Join(l, r, Inner, Some(cond), _) =>
              joinConds ++= splitConj(cond); flatten(l) && flatten(r)
            case lr: LogicalRelation => rels += lr; true
            case _ => false
          }
        }
        if (!flatten(plan)) return None
        val relSeq = rels.result()
        if (relSeq.size != js.suffixes.size || joinConds.isEmpty) return None
        if (!suffixAssignment(relSeq, js.suffixes)) return None
        // name-keyed grain/measure matching requires every base column
        // name to identify ONE relation
        val nameSets = relSeq.map(_.output.map(_.name.toLowerCase(Locale.ROOT)).toSet)
        if (nameSets.map(_.size).sum != nameSets.flatten.toSet.size) return None
        val resolve = mkResolve(defs)
        // each join conjunct is either one of the registered equi keys
        // (EqualTo over bare base attributes, unordered) or — inner
        // joins only — equivalent to a post-join FILTER conjunct:
        // `join ON (K ∧ E)` ≡ `filter E over (join ON K)`, and
        // PushPredicateThroughJoin exploits exactly that to move
        // two-sided filters INTO the condition, so the matcher moves
        // them back out into the conjunct pool (where they must absorb,
        // be implied, or replay as grain functions like any filter).
        // The registered key set must be matched EXACTLY.
        val want: Set[Set[String]] = js.keyPairs.map { case (a, b) =>
          Set(a.toLowerCase(Locale.ROOT), b.toLowerCase(Locale.ROOT))
        }.toSet
        var keysSeen = Set.empty[Set[String]]
        val extraConj = Vector.newBuilder[Expression]
        joinConds.foreach { c =>
          val asKey = c match {
            case EqualTo(a, b) => (resolve(a), resolve(b)) match {
              case (x: AttributeReference, y: AttributeReference) =>
                Some(Set(x.name.toLowerCase(Locale.ROOT),
                         y.name.toLowerCase(Locale.ROOT))).filter(want)
              case _ => None
            }
            case _ => None
          }
          asKey match {
            case Some(p) => keysSeen += p
            case None => extraConj += c
          }
        }
        if (keysSeen != want) return None
        Some(BaseMatch(resolve, conj ++ extraConj.result(), want.flatten))
    }

  /** Match a UNION ALL of the registered relations. Union-all is
    * associative and commutative, so the flattened child list must match
    * the registered suffix MULTISET 1:1 (the same table may legitimately
    * appear twice — its rows then count twice, exactly as the view
    * stored them). Soundness of the two distribution laws the optimizer
    * exploits, inverted here:
    *   - per OUTPUT POSITION, every child's resolved tree must be
    *     structurally equal (PushProjectionThroughUnion distributes the
    *     same pruning or derived-grouping projection into each child;
    *     children computing DIFFERENT trees at one position are a
    *     by-position union of different things — refuse);
    *   - per-child filter conjunct SETS must be structurally equal
    *     (`Filter p over Union` ≡ union of identically-filtered
    *     children; asymmetric child filters select different
    *     sub-relations — refuse). The shared set joins the conjunct
    *     pool once (child 0's copy).
    * Resolution afterwards runs through child 0's definitions — sound
    * because Union.output carries child 0's exprIds and the alignment
    * check just proved every other child computes the same trees. */
  private def matchUnion(plan: LogicalPlan, suffixes: Seq[String]): Option[BaseMatch] = {
    val (defs0, conj0, core) = peel(plan)
    def flat(p: LogicalPlan): Option[Seq[LogicalPlan]] = p match {
      case u: Union if !u.byName =>
        val parts = u.children.map(flat)
        if (parts.exists(_.isEmpty)) None else Some(parts.flatten.flatten)
      case other => Some(Seq(other))
    }
    core match {
      case u: Union if !u.byName =>
        val children = flat(u).getOrElse(return None)
        if (children.size != suffixes.size) return None
        val peeled = children.map(peel)
        peeled.foreach { case (_, _, c) =>
          if (!c.isInstanceOf[LogicalRelation]) return None }
        val rels = peeled.map(_._3.asInstanceOf[LogicalRelation])
        if (!suffixAssignment(rels, suffixes)) return None
        val resolvers = peeled.map(p => mkResolve(p._1))
        val width = u.output.length
        if (children.exists(_.output.length != width)) return None
        val aligned = (0 until width).forall { i =>
          val ref = resolvers.head(children.head.output(i))
          resolvers.indices.tail.forall(k =>
            sameMeasure(ref, resolvers(k)(children(k).output(i))))
        }
        if (!aligned) return None
        val rconj: Seq[Seq[Expression]] =
          peeled.indices.map(k => peeled(k)._2.map(resolvers(k)))
        val sameConj = rconj.tail.forall(cs =>
          cs.forall(c => rconj.head.exists(sameMeasure(_, c))) &&
          rconj.head.forall(c => cs.exists(sameMeasure(_, c))))
        if (!sameConj) return None
        Some(BaseMatch(mkResolve(defs0 ++ peeled.head._1),
          conj0 ++ peeled.head._2, Set.empty))
      case _ => None
    }
  }

  /** Reproduce the original attribute's nullability contract: the
    * replacement value is never actually null where the original was
    * non-nullable (a group exists only where ≥1 MV partial row does),
    * but parquet-sourced MV attributes are DECLARED nullable — without
    * the wrap, parents holding the reused exprId would see stale
    * metadata and nullability-sensitive optimizations could misfire. */
  private def withNullability(e: Expression, wantNullable: Boolean): Expression =
    if (!wantNullable && e.nullable) KnownNotNull(e) else e

  /** Re-aggregate under the ORIGINAL node's contract: the replacement
    * must reproduce the original AggregateExpression's data type AND
    * nullability — a re-aggregated decimal sum widens precision
    * (p+10 → p+20), and a parent expression reading the stale narrower
    * type would misdecode the value. Cast back when the types differ
    * (only reachable for decimals; an overflow past the original
    * precision would have overflowed the original query too). */
  private def reAggE(fn: AggregateFunction, orig: AggregateExpression): Expression = {
    val e = fn.toAggregateExpression()
    val cast = if (e.dataType == orig.dataType) e else Cast(e, orig.dataType)
    withNullability(cast, orig.nullable)
  }

  /** Re-aggregate an `avg(x: decimal(p,s))` from the MV's per-group
    * (sum, NON-NULL count) partials, replicating Spark's own Average
    * algebra OPERAND-TYPE-EXACTLY. Average evaluates
    * `Divide(sum: decimal(p+10,s), count cast decimal(20,0), LEGACY)
    *   .cast(decimal(p+4,s+4))`,
    * so the replacement casts the re-summed partials back to
    * decimal(p+10,s) — value-exact: same scale, and a total past p+10
    * digits would have nulled the original sum buffer too — and the
    * re-summed counts to decimal(20,0), then applies the IDENTICAL divide
    * and final cast. Both paths are then the same expression over the
    * same exact totals: bit-equality by construction, with no dependence
    * on the divide's internal rounding cascade. Decimal measures only —
    * decimal addition is order-independent so the re-summed total is
    * exact; a float avg would reorder float addition and is refused like
    * a float sum. INTEGRAL avg is refused too, unlike integral SUM:
    * Spark's Sum over integers accumulates in LongType (exact), but its
    * Average accumulates the sum buffer in DOUBLE — past 2^53 the base
    * answer is itself addition-order-dependent, so no rewrite can be
    * bit-faithful to it. The non-null count matters: `avg` skips nulls, so
    * dividing by the MV's `count(*)` would undercount any group whose
    * measure has nulls — hence the dedicated per-measure count column.
    *
    * Eval modes: Average's internal divide is LEGACY under BOTH legacy
    * and ANSI sessions (null on /0, never an error) — mirrored here
    * verbatim; the sum-overflow and final-cast behavior follow the
    * session conf identically on both paths (the `Sum`/`Cast` built here
    * pick up the same SQLConf the original aggregate was analyzed
    * under). Only `try_avg` (EvalMode.TRY) has different
    * NULL-on-intermediate-overflow semantics, and the match refuses it. */
  private def reAvgE(childType: DecimalType, sumCol: Attribute, cntCol: Attribute,
                     orig: AggregateExpression): Expression = {
    // DecimalType.bounded(p+10, s) — Average's sumDataType (bounded is
    // private[sql]; MAX_PRECISION = 38, scale already ≤ 38)
    val sumDT = DecimalType(
      math.min(childType.precision + 10, DecimalType.MAX_PRECISION), childType.scale)
    val num = Cast(Sum(sumCol).toAggregateExpression(), sumDT)
    val den = Cast(Sum(cntCol).toAggregateExpression(), DecimalType(20, 0))
    val out = Cast(Divide(num, den, EvalMode.LEGACY), orig.dataType)
    withNullability(out, orig.nullable)
  }

  /** The MV's stored column for a resolved GRAIN-column reference (type
    * drift refuses, the rebindTree discipline). */
  private def grainAttr(d: MvCatalog.MvDef, resolved: Expression,
                        attr: String => Option[Attribute]): Option[Attribute] =
    resolved match {
      case b: AttributeReference if d.groupCols(b.name) =>
        attr(b.name).filter(_.dataType == b.dataType)
      case _ => None
    }

  /** Rewrite ONE AggregateExpression from the MV's partials — the single
    * matcher both the flat and the Expand paths call (`resolveM` resolves
    * the measure child through whatever sits between the aggregate and
    * the base relation; `attr` locates the MV column in the rewritten
    * plan: the MV scan's attribute in the flat case, the appended Expand
    * passthrough in the grouping-sets case). None = this aggregate is
    * not re-aggregable from the registered partials, which refuses the
    * whole rewrite. */
  private def rewriteAggExpr(d: MvCatalog.MvDef, ae: AggregateExpression,
                             resolveM: Expression => Expression,
                             attr: String => Option[Attribute]): Option[Expression] =
    ae match {
      case AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _) =>
        attr(d.countCol).map(m => reAggE(Sum(m), ae))
      case AggregateExpression(Count(Seq(child)), _, false, None, _)
          if !child.isInstanceOf[Literal] =>
        // count(measure) — the NON-NULL count: the avg registration
        // stores exactly this per group (its cnt column is
        // count(measure), never count(*)), so it re-aggregates as a sum
        // of the stored counts even for queries that never ask for avg
        matchPair(d.avgMeasures, resolveM(child)).map(_._2)
          .flatMap(attr).map(m => reAggE(Sum(m), ae))
      case AggregateExpression(Count(Seq(child)), _, true, None, _) =>
        // count(DISTINCT g) over a GROUPING column: the MV holds exactly
        // the distinct grain combinations, so counting the stored
        // grouping column's distinct values re-aggregates EXACTLY —
        // including null groups (groupBy keeps a null group; both
        // count(DISTINCT)s skip it identically). Any other distinct
        // aggregate stays refused — the MV has collapsed those values.
        resolveM(child) match {
          case b: AttributeReference if d.groupCols(b.name) =>
            attr(b.name).map { m =>
              val e = Count(Seq(m)).toAggregateExpression(isDistinct = true)
              withNullability(e, ae.nullable)
            }
          case _ => None
        }
      case AggregateExpression(s @ Sum(child, _), _, false, None, _)
          if s.evalContext.evalMode != EvalMode.TRY && exactSum(child.dataType) =>
        // try_sum refuses (mirroring the Average guard): on overflow TRY
        // returns NULL while a rebuilt session-mode Sum wraps (LEGACY) or
        // throws (ANSI) — not bit-faithful to the original
        matchMeasure(d, resolveM(child)).flatMap(attr).map(m => reAggE(Sum(m), ae))
      case AggregateExpression(Min(child), _, false, None, _) =>
        // min-of-mins: a semilattice, sound for any orderable type. A
        // GRAIN column needs no registered measure: the view stores every
        // distinct grain combination, and min is multiplicity-independent
        // (nulls skip identically — a null grain group stores null once)
        matchIn(d.minMeasures, resolveM(child)).flatMap(attr)
          .orElse(grainAttr(d, resolveM(child), attr))
          .map(m => reAggE(Min(m), ae))
      case AggregateExpression(Max(child), _, false, None, _) =>
        matchIn(d.maxMeasures, resolveM(child)).flatMap(attr)
          .orElse(grainAttr(d, resolveM(child), attr))
          .map(m => reAggE(Max(m), ae))
      case AggregateExpression(av @ Average(child, _), _, false, None, _)
          if av.evalMode != EvalMode.TRY && child.dataType.isInstanceOf[DecimalType] =>
        matchPair(d.avgMeasures, resolveM(child)).flatMap { case (sumC, cntC) =>
          for (s <- attr(sumC); c <- attr(cntC))
            yield reAvgE(child.dataType.asInstanceOf[DecimalType], s, c, ae)
        }
      case AggregateExpression(hs: HllSketchAgg, _, false, None, _) =>
        // hll_sketch_agg over a registered sketch measure with the SAME
        // lgK re-aggregates as hll_union_agg of the stored partials
        // (max-merged registers ≡ one-shot build). Only reachable
        // estimate-wrapped — [[rebindWith]] refuses a bare sketch agg,
        // whose raw bytes are not build-vs-merge stable.
        d.sketchMeasures.collectFirst {
          case (m, (c, lgK)) if lgK == hs.lgConfigK &&
              sameMeasure(m, resolveM(hs.left)) => c
        }.flatMap(attr).map(m =>
          reAggE(HllUnionAgg(m, Literal(false), 0, 0), ae))
      case _ => None
    }

  /** THE tree walk both paths share: rebuild a deterministic,
    * subquery-free tree with its AggregateExpression nodes replaced via
    * `aggs` and its attribute leaves via `attrs`; refuse (None) anything
    * either handler refuses, and every nondeterministic or
    * plan-carrying node. */
  private def rebindWith(attrs: AttributeReference => Option[Expression],
                         aggs: AggregateExpression => Option[Expression])
                        (e: Expression): Option[Expression] =
    e match {
      // a sketch aggregate is rewritable ONLY under an immediate
      // estimate: the estimate is a pure function of the sketch's
      // register values, which max-merge associatively — but the raw
      // BYTES are not build-vs-merge stable, so a query outputting the
      // sketch itself refuses below
      case est: HllSketchEstimate => est.child match {
        case ae: AggregateExpression
            if ae.aggregateFunction.isInstanceOf[HllSketchAgg] =>
          aggs(ae).map(r => est.withNewChildren(Seq(r)))
        case _ =>
          rebindWith(attrs, aggs)(est.child).map(c => est.withNewChildren(Seq(c)))
      }
      case ae: AggregateExpression =>
        if (ae.aggregateFunction.isInstanceOf[HllSketchAgg]) None else aggs(ae)
      case a: AttributeReference => attrs(a)
      case other if other.deterministic && !other.isInstanceOf[PlanExpression[_]] =>
        val kids = other.children.map(rebindWith(attrs, aggs))
        if (kids.exists(_.isEmpty)) None
        else Some(other.withNewChildren(kids.map(_.get)))
      case _ => None
    }

  /** The flat path's instantiation of [[rebindWith]]: grain-column
    * references map to the MV's stored columns, Project-defined
    * attributes (the analyzer's `_groupingexpression` extraction)
    * recurse into their defining tree, other base columns refuse.
    * None = not a function of the grain (and, where `aggs` allows them,
    * the registered partials). */
  private def rebindTree(d: MvCatalog.MvDef,
                         resolve: Expression => Expression,
                         mvAttr: String => Option[Attribute])
                        (e: Expression,
                         aggs: AggregateExpression => Option[Expression])
      : Option[Expression] = {
    def attrs(a: AttributeReference): Option[Expression] =
      resolve(a) match {
        case b: AttributeReference if d.groupCols(b.name) =>
          // type equality, consistent with the Expand path and
          // ProjectionRewrite: a mis-registered MV whose stored grouping
          // column re-types must refuse, never silently re-type the
          // output attribute under its reused exprId
          mvAttr(b.name).filter(_.dataType == b.dataType)
            .map(m => withNullability(m, a.nullable))
        case _: AttributeReference => None // base column outside the grain
        case derived => rebindWith(attrs, aggs)(derived)
      }
    rebindWith(attrs, aggs)(e)
  }

  // ---- range subsumption (filtered-view containment) ---------------------

  /** Literal-bounded RANGE shape: (tree, op, bound) with the literal
    * normalized to the right. Only the four order comparisons — equality
    * and IN are point shapes ([[pointShape]]). A Literal-vs-Literal
    * comparison decomposes harmlessly (its "tree" is a literal that can
    * only match another literal tree). */
  private def rangeShape(e: Expression): Option[(Expression, String, Literal)] = e match {
    case LessThan(t, l: Literal)           => Some((t, "<",  l))
    case LessThanOrEqual(t, l: Literal)    => Some((t, "<=", l))
    case GreaterThan(t, l: Literal)        => Some((t, ">",  l))
    case GreaterThanOrEqual(t, l: Literal) => Some((t, ">=", l))
    case LessThan(l: Literal, t)           => Some((t, ">",  l))
    case LessThanOrEqual(l: Literal, t)    => Some((t, ">=", l))
    case GreaterThan(l: Literal, t)        => Some((t, "<",  l))
    case GreaterThanOrEqual(l: Literal, t) => Some((t, "<=", l))
    case _ => None
  }

  /** Literal POINT-SET shape: `t = lit`, `t IN (lits…)`, or the
    * optimizer's >10-element `InSet` form (its hset holds internal-format
    * values of the child's type — rewrapped as Literals; a null element
    * is vacuous in the query predicate but fails litTrue, a conservative
    * refusal, never an unsoundness). */
  private def pointShape(e: Expression): Option[(Expression, Seq[Literal])] = e match {
    case EqualTo(t, l: Literal) => Some((t, Seq(l)))
    case EqualTo(l: Literal, t) => Some((t, Seq(l)))
    case In(t, list) if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
      Some((t, list.map(_.asInstanceOf[Literal])))
    case InSet(t, hset) if hset.nonEmpty =>
      Some((t, hset.toSeq.map(v => Literal(v, t.dataType))))
    case _ => None
  }

  /** Literal-vs-literal comparison, TRUE only when provable: same
    * non-null-valued dataType and the comparison evaluates true. */
  private def litTrue(mk: (Expression, Expression) => Expression,
                      a: Literal, b: Literal): Boolean =
    a.value != null && b.value != null && a.dataType == b.dataType &&
      mk(a, b).eval() == true

  /** TRUE iff every row satisfying `query` provably satisfies `view` —
    * literal range/point containment over the SAME tree (structural
    * equality via [[sameMeasure]]). All admitted shapes are
    * null-rejecting on the tree, so a query-passing row has a non-null
    * tree value inside the view's range: the view stores every row the
    * query admits. FALSE means "not proven", never "disjoint". */
  private def subsumes(query: Expression, view: Expression): Boolean = {
    def satisfies(p: Literal, vop: String, vl: Literal): Boolean = vop match {
      case "<"  => litTrue(LessThan, p, vl)
      case "<=" => litTrue(LessThanOrEqual, p, vl)
      case ">"  => litTrue(LessThan, vl, p)
      case ">=" => litTrue(LessThanOrEqual, vl, p)
    }
    (pointShape(view), rangeShape(view)) match {
      case (Some((vt, vs)), _) =>
        pointShape(query).exists { case (qt, qs) =>
          sameMeasure(vt, qt) &&
            qs.forall(q => vs.exists(v => litTrue(EqualTo, q, v)))
        }
      case (_, Some((vt, vop, vl))) =>
        pointShape(query).exists { case (qt, qs) =>
          sameMeasure(vt, qt) && qs.forall(satisfies(_, vop, vl))
        } || rangeShape(query).exists { case (qt, qop, ql) =>
          sameMeasure(vt, qt) && ((vop, qop) match {
            case ("<=", "<=") | ("<=", "<") | ("<", "<")
                => litTrue(LessThanOrEqual, ql, vl)
            case ("<", "<=") => litTrue(LessThan, ql, vl)
            case (">=", ">=") | (">=", ">") | (">", ">")
                => litTrue(LessThanOrEqual, vl, ql)
            case (">", ">=") => litTrue(LessThan, vl, ql)
            case _ => false
          })
        }
      case _ => false
    }
  }

  /** TRUE result of `pred` implies the attribute is non-null: the top
    * node is IsNotNull, a non-null-safe comparison, or IN, and the
    * attribute is one of its operands (possibly Cast-wrapped) — a null
    * attribute makes such a predicate evaluate to null/false, never
    * TRUE. Deliberately minimal: this is only used to absorb the
    * optimizer's own InferFiltersFromConstraints output, which derives
    * IsNotNull from exactly these shapes. */
  private def impliesNotNull(pred: Expression, id: ExprId): Boolean = {
    def isAttr(e: Expression): Boolean = e match {
      case a: AttributeReference => a.exprId == id
      case c: Cast => isAttr(c.child)
      case _ => false
    }
    pred match {
      case IsNotNull(x) => isAttr(x)
      case _: EqualNullSafe => false
      case c: BinaryComparison => c.children.exists(isAttr)
      case In(v, _) => isAttr(v)
      case _ => false
    }
  }

  /** Admit the matched subtree's filter conjuncts against the view.
    * Three sound fates per conjunct (anything else refuses the rewrite):
    *   - ABSORBED: structurally equal to a conjunct baked into the
    *     view's definition — already applied at build time. Every
    *     baked-in conjunct must be matched by the query — EQUALLED or
    *     SUBSUMED ([[subsumes]]: the query's literal range/point set is
    *     strictly contained in the baked one, so the view stores every
    *     row the query admits; the "this week over the this-month hot
    *     slice" shape) — or the query ranges over rows the view never
    *     stored and cannot rewrite. A merely-subsuming conjunct is NOT
    *     absorbed: the view holds MORE rows than the query admits, so
    *     the query's own tighter conjunct replays against the view —
    *     which demands the filtered tree be a grain function, enforced
    *     by the rebind exactly like any replayed filter;
    *   - IMPLIED: an `IsNotNull(c)` the remaining plan already
    *     guarantees — `c` is an inner-join key (null keys never joined
    *     into the view) or an operand of an absorbed null-intolerant
    *     conjunct. These are the optimizer's own inferred constraints;
    *   - REPLAYED: a deterministic function of the grain — whole-group
    *     selection commutes with the pre-aggregation, so it filters the
    *     view's group rows instead (a predicate on any finer column
    *     selects WITHIN collapsed groups and refuses via the rebind). */
  private def admitFilters(d: MvCatalog.MvDef, bm: BaseMatch,
                           rebind: Expression => Option[Expression],
                           mv: LogicalPlan): Option[LogicalPlan] = {
    val resolved = bm.conjuncts.map(bm.resolve)
    // one pass over the (baked-in group × query conjunct) matrix serves
    // both the coverage check and the absorbed/rest partition
    val groupsOf: Seq[Seq[Int]] =
      if (d.viewFilters.isEmpty) resolved.map(_ => Nil)
      else resolved.map(c =>
        d.viewFilters.indices.filter(i => d.viewFilters(i).exists(sameMeasure(_, c))))
    // coverage: every baked conjunct must be equalled or subsumed by
    // some query conjunct (subsumption proves containment only — the
    // subsuming conjunct itself stays in the replay set)
    val covered: Set[Int] =
      groupsOf.flatten.toSet ++ (
        if (d.viewFilters.isEmpty) Set.empty[Int]
        else d.viewFilters.indices.filter(i =>
          resolved.exists(c => d.viewFilters(i).exists(v => subsumes(c, v)))))
    if (d.viewFilters.indices.exists(i => !covered(i)))
      return None // the view is missing rows this query needs
    val (absorbedIdx, restIdx) =
      resolved.indices.partition(i => groupsOf(i).nonEmpty)
    val absorbed = absorbedIdx.map(resolved)
    val rest = restIdx.map(resolved)
    def implied(a: AttributeReference): Boolean =
      bm.joinKeyCols(a.name.toLowerCase(Locale.ROOT)) ||
        absorbed.exists(impliesNotNull(_, a.exprId))
    val residual = rest.filterNot {
      case IsNotNull(a: AttributeReference) => implied(a)
      case _ => false
    }
    val rebound = residual.map(rebind)
    if (rebound.exists(_.isEmpty)) None
    else if (rebound.isEmpty) Some(mv)
    else Some(Filter(rebound.map(_.get).reduce(And), mv))
  }

  private def rewrite(agg: Aggregate, d: MvCatalog.MvDef): Option[LogicalPlan] =
    agg.child match {
      case e: Expand => rewriteExpand(agg, e, d)
      case _ => rewriteFlat(agg, d)
    }

  // ---- the flat GROUP BY shape -------------------------------------------

  private def rewriteFlat(agg: Aggregate, d: MvCatalog.MvDef): Option[LogicalPlan] = {
    val bm = matchBase(agg.child, d).getOrElse(return None)
    val resolve = bm.resolve
    val mv = freshMv(d.mv)

    val mvAttrByName: Map[String, Attribute] =
      mv.output.map(a => a.name -> a).toMap
    def mvAttr(name: String): Option[Attribute] = mvAttrByName.get(name)

    // the shared rebinding recursion ([[rebindTree]]), closed over this
    // match's resolver and MV attributes
    def rw(e: Expression,
           aggs: AggregateExpression => Option[Expression]): Option[Expression] =
      rebindTree(d, resolve, mvAttr)(e, aggs)

    // ---- grouping: deterministic expressions over the MV's grain --------
    // Bare grain columns are the common case; DERIVED groupings (a status
    // bucketing, year(date) over a date-grain view) rebind the same tree
    // onto the MV's grouping columns — sound because every base row of
    // one grain group evaluates the expression identically, so grain
    // partials re-aggregate into exactly the derived groups. A GLOBAL
    // aggregate (no GROUP BY) must refuse: over an EMPTY base it returns
    // one row (count 0) while the empty MV would return zero rows.
    if (agg.groupingExpressions.isEmpty) return None
    val newGrouping: Seq[Option[Expression]] =
      agg.groupingExpressions.map(rw(_, _ => None))
    if (newGrouping.exists(_.isEmpty)) return None

    // ---- aggregate list: rewrite each output column ---------------------
    // Outputs may be ARBITRARY deterministic trees over rewritable
    // aggregates and grouping columns (CollapseProject folds post-agg
    // arithmetic like `avg(x) * 1e6` INTO the Aggregate before this rule
    // sees it — the TPC-H Q1 shape): recurse, replacing each nested
    // AggregateExpression from the partials and remapping every other
    // attribute to its MV grouping column. Subqueries and nondeterminism
    // refuse — their results are not a function of the group's partials.
    def rwTree(e: Expression): Option[Expression] =
      rw(e, ae => rewriteAggExpr(d, ae, resolve, mvAttr))
    val rewritten: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference =>
        // grouping passthrough keeps the output attribute's exprId
        rwTree(a).map(m => Alias(m, a.name)(exprId = a.exprId, qualifier = a.qualifier))
      case al: Alias =>
        rwTree(al.child).map(c =>
          Alias(c, al.name)(exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
    if (rewritten.exists(_.isEmpty)) return None

    admitFilters(d, bm, rw(_, _ => None), mv)
      .map(c => Aggregate(newGrouping.map(_.get), rewritten.map(_.get), c))
  }

  // ---- the ROLLUP / CUBE / GROUPING SETS shape ---------------------------

  /** Rewrite `Aggregate(..., Expand(projections, output, base))` to the
    * same Aggregate over `Expand(projections', output', mv)`. The Expand
    * positions the aggregate's grouping expressions read (the per-set
    * grouping columns and the grouping-id literals) are KEPT with their
    * exprIds, their projections remapped to the MV's grouping columns;
    * raw measure-input passthrough positions (the base column a
    * `sum(expr(col))` reads ABOVE the Expand) are resolved through the
    * Expand into the full measure expression, matched against the
    * registry, and replaced by appended passthroughs of the MV's
    * partial-sum / count columns; unreferenced positions are dropped.
    * Summing a partial-sum column per grouping set is exactly the flat
    * case's algebra applied per set, so every set's totals re-aggregate
    * correctly from the one MV. */
  private def rewriteExpand(agg: Aggregate, exp: Expand,
                            d: MvCatalog.MvDef): Option[LogicalPlan] = {
    val bm = matchBase(exp.child, d).getOrElse(return None)
    val resolve = bm.resolve
    val mv = freshMv(d.mv)

    val mvAttrByName: Map[String, Attribute] =
      mv.output.map(a => a.name -> a).toMap
    def mvAttr(name: String): Option[Attribute] = mvAttrByName.get(name)

    // ---- classify every Expand output position --------------------------
    // keep: all-literal (grouping id) or per-set grouping column (null in
    //   excluded sets) — projections remapped to the MV grouping column
    // passthrough: the same expression in EVERY projection — recorded so
    //   sums above the Expand resolve through it; dropped from the output
    //   unless something still references it after the rewrite
    val width = exp.output.length
    if (exp.projections.exists(_.length != width)) return None
    val keptCols = scala.collection.mutable.LinkedHashMap[Int, Seq[Expression]]()
    val expandDef = scala.collection.mutable.Map[ExprId, Expression]()
    var refused = false
    (0 until width).foreach { i =>
      val outAttr = exp.output(i)
      val exprsAtI = exp.projections.map(_(i))
      val uniform = exprsAtI.distinct.size == 1
      if (uniform && !exprsAtI.head.isInstanceOf[Literal])
        expandDef(outAttr.exprId) = resolve(exprsAtI.head)
      if (exprsAtI.forall(_.isInstanceOf[Literal])) keptCols(i) = exprsAtI
      else {
        val mapped = exprsAtI.map {
          case nul @ Literal(null, _) => Some(nul: Expression) // excluded-set slot
          case e =>
            resolve(e) match {
              case b: AttributeReference if d.groupCols(b.name) =>
                mvAttr(b.name).filter(_.dataType == e.dataType)
                  .map(withNullability(_, e.nullable))
              case _ => None
            }
        }
        if (mapped.forall(_.isDefined)) keptCols(i) = mapped.map(_.get)
        else if (!uniform) refused = true // neither grouping nor passthrough
      }
    }
    if (refused) return None
    val keptIds: Set[ExprId] = keptCols.keysIterator.map(i => exp.output(i).exprId).toSet

    // ---- rewrite the parent aggregate list ------------------------------
    // appended passthroughs: one new Expand output attr per MV column a
    // rewritten aggregate needs (partial sums, the count) — the SAME
    // value in every projection row, so each grouping set re-aggregates
    // the partials replicated into it
    val appended = scala.collection.mutable.LinkedHashMap[String, AttributeReference]()
    def passAttr(mvColName: String): Option[AttributeReference] =
      mvAttr(mvColName).map { m =>
        appended.getOrElseUpdate(mvColName,
          AttributeReference("__graft_mv_" + mvColName, m.dataType, m.nullable)())
      }
    def resolveDeep(e: Expression): Expression = resolve(e.transformUp {
      case a: AttributeReference if expandDef.contains(a.exprId) => expandDef(a.exprId)
    })
    // Outputs may be arbitrary deterministic trees over rewritable
    // aggregates and kept Expand positions (grouping restore /
    // grouping_id arithmetic / post-agg arithmetic CollapseProject folded
    // in): the shared walk with this path's leaf handlers — kept
    // positions keep their exprIds, so their references pass through
    // verbatim; aggregate args may only read UNIFORM passthrough
    // positions (a per-set grouping slot, nulled in excluded sets,
    // carries the base column's NAME and the structural matcher pins by
    // name — without the guard an aggregate wired to a per-set slot
    // would silently match the raw column's partials; Spark's
    // grouping-set analysis always points aggregate args at raw
    // passthroughs, so the guard refuses only malformed shapes).
    def rwTree(e: Expression): Option[Expression] =
      rebindWith(
        a => if (keptIds(a.exprId)) Some(a) else None,
        {
          case ae if ae.references.forall(r => expandDef.contains(r.exprId)) =>
            rewriteAggExpr(d, ae, resolveDeep, passAttr)
          case _ => None // failed the guard — never recurse
        })(e)
    val rewritten: Seq[Option[NamedExpression]] = agg.aggregateExpressions.map {
      case a: AttributeReference => if (keptIds(a.exprId)) Some(a) else None
      case al: Alias =>
        rwTree(al.child).map(c =>
          Alias(c, al.name)(exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
    if (rewritten.exists(_.isEmpty)) return None
    // every grouping expression must also read only kept positions
    if (!agg.groupingExpressions.forall(_.references.forall(r => keptIds(r.exprId))))
      return None

    admitFilters(d, bm,
        rebindTree(d, resolve, mvAttr)(_, _ => None), mv).map { base =>
      val keptIdx = keptCols.keysIterator.toSeq
      val outAttrs = keptIdx.map(exp.output) ++ appended.values
      val projRows = exp.projections.indices.map { r =>
        keptIdx.map(i => keptCols(i)(r)) ++
          appended.keysIterator.map(c => mvAttr(c).get: Expression)
      }
      Aggregate(agg.groupingExpressions, rewritten.map(_.get),
        Expand(projRows, outAttrs, base))
    }
  }
}
