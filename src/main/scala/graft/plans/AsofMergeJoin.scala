package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** The as-of join as a FIRST-CLASS operator — the full layer-(c) custom
  * ladder from SURVEY §4.3: a logical node ([[AsofMergeJoin]]), a planner
  * strategy ([[AsofStrategy]], injected via
  * `graft.GraftExtensions`), and a physical merge exec
  * ([[AsofMergeJoinExec]]) that declares a clustered distribution + sort
  * order per child and streams both sorted sides ONCE per partition.
  *
  * Why a physical operator when q67 already spells as-of declaratively:
  * the window form carries the right side's rows THROUGH the window
  * operator's buffer (a per-partition sort buffer sized by
  * |events|+|orders|) and materializes a unioned frame; the merge exec
  * holds exactly ONE candidate row of state per key and never unions the
  * inputs — the true streaming-merge asymptotics (O(1) memory beyond the
  * sort, zero extra materialization). Catalyst still owns distribution
  * and sort planning: the exec only declares requirements and
  * EnsureRequirements inserts the exchanges/sorts, so AQE, whole-stage
  * codegen on the children, and reuse all keep working.
  *
  * Input convention (checked in [[AsofJoin.asof]]): each side's first two
  * columns are (key: LONG, time: LONG); remaining right columns are the
  * carried payload. Output = left columns ++ right payload columns, one
  * row per left row that has a right row with the same key and
  * time ≤ the left time (the latest such row; ties on time resolve to the
  * largest payload tuple in sort order — q19/q67's max-(time, key)
  * tie-break when the payload leads with a unique key).
  */
case class AsofMergeJoin(left: LogicalPlan, right: LogicalPlan,
                         outer: Boolean = false,
                         toleranceUs: Option[Long] = None)
    extends BinaryNode {
  // outer keeps unmatched left rows → the carried payload becomes nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.drop(2)
      .map(a => if (outer) a.withNullability(true) else a)
  // the operator consumes children POSITIONALLY (key, time, payload...),
  // so every child column is load-bearing even though the node holds no
  // expressions; without this, ColumnPruning sees empty references and
  // prunes the children out from under the positional convention
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofMergeJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofMergeJoin]] to [[AsofMergeJoinExec]]. */
object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofMergeJoin(l, r, outer, tol) =>
      AsofMergeJoinExec(planLater(l), planLater(r), outer, tol) :: Nil
    case _ => Nil
  }
}

/** Sorted streaming-merge as-of. Children are hash-clustered on the key
  * column and sorted by (key, time, …) — declared, not hand-built, so
  * Catalyst/AQE place (and reuse, and skew-split) the exchanges. Per
  * partition the merge advances the right iterator at most once past each
  * row and keeps ONE copied candidate row per current key. */
case class AsofMergeJoinExec(left: SparkPlan, right: SparkPlan,
                             outer: Boolean = false,
                             toleranceUs: Option[Long] = None)
    extends BinaryExecNode {

  override lazy val metrics: Map[String, org.apache.spark.sql.execution.metric.SQLMetric] =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.drop(2)
      .map(a => if (outer) a.withNullability(true) else a)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(left.output.head)) ::
    ClusteredDistribution(Seq(right.output.head)) :: Nil

  // left needs (key, time); right additionally orders the payload so the
  // LAST row consumed at equal (key, time) is the max payload tuple —
  // the deterministic tie-break the declarative forms use
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    left.output.take(2).map(a => SortOrder(a, Ascending)),
    right.output.map(a => SortOrder(a, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    left.output.take(2).map(a => SortOrder(a, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofMergeJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val carry = rightOut.drop(2)
    val outAttrs = output
    val isOuter = outer
    val tol = toleranceUs
    val numOutputRows = longMetric("numOutputRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val carryProj = UnsafeProjection.create(carry, rightOut)
      // in outer mode the projection reads a null-filled payload for
      // unmatched rows — bind against nullable inputs so codegen keeps
      // the null checks
      val carryRead = if (isOuter) carry.map(_.withNullability(true)) else carry
      val resultProj = UnsafeProjection.create(outAttrs, leftOut ++ carryRead)
      val nullCarry: InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(carry.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // one candidate per current key: the latest right row seen whose
      // time is <= the current left row's time (rows are consumed in
      // (key, time) order, so "latest seen" IS the as-of answer); with a
      // tolerance, the candidate additionally must be YOUNG enough —
      // time ∈ (t − tol, t] — which is why the state stays ONE row: the
      // latest candidate is the only one that can ever satisfy a
      // tolerance ending at t
      var cand: InternalRow = null
      var candKey = 0L
      var candTime = 0L
      lIter.flatMap { lRow =>
        val k = lRow.getLong(0)
        val t = lRow.getLong(1)
        while (rBuf.hasNext && {
          val hk = rBuf.head.getLong(0)
          hk < k || (hk == k && rBuf.head.getLong(1) <= t)
        }) {
          val h = rBuf.next()
          if (h.getLong(0) == k) {
            candTime = h.getLong(1); cand = carryProj(h).copy(); candKey = k
          }
        }
        val fresh = cand != null && candKey == k &&
          tol.forall(w => candTime > t - w)
        if (fresh) {
          numOutputRows += 1
          Iterator.single[InternalRow](resultProj(joined(lRow, cand)))
        } else if (isOuter) {
          numOutputRows += 1
          Iterator.single[InternalRow](resultProj(joined(lRow, nullCarry)))
        } else Iterator.empty
      }
    }
  }
}

/** Public API for the custom operator. */
object AsofJoin {

  /** As-of join `left` to `right`. Each side's first two columns must be
    * (key: LONG, time: LONG); the result carries every left row that has
    * a match, extended with the right side's payload columns (everything
    * after its key/time).
    *
    * Null semantics: rows with a null key or time NEVER match (standard
    * join-key semantics, and what the declarative q19/q67 forms produce).
    * The exec reads the two leading longs positionally —
    * `InternalRow.getLong` on a null field would silently yield 0 — so
    * both sides are null-filtered on (key, time) here; for non-nullable
    * inputs Catalyst constant-folds the filter away.
    *
    * Self as-of (both sides derived from one DataFrame) is supported: the
    * custom node is invisible to `DeduplicateRelations`, so when the
    * children share attribute exprIds the right side is re-aliased to
    * fresh internal names (a rename-Project survives
    * `RemoveRedundantAliases`, which only strips same-name aliases) and
    * the original payload names are restored positionally on the result. */
  def asof(left: DataFrame, right: DataFrame): DataFrame =
    asof(left, right, outer = false)

  /** Outer variant: every left row survives; rows with no right match at
    * or before their time carry NULL payload columns (the left-join
    * spelling of the same merge — one pass, one candidate of state).
    * Contract deviation from SQL LEFT JOIN, documented: left rows with a
    * NULL key or time are excluded in BOTH modes (the positional-long
    * convention has no null representation), not emitted with null
    * payload. */
  def asofOuter(left: DataFrame, right: DataFrame): DataFrame =
    asof(left, right, outer = true)

  /** Tolerance variants: a right row matches only when its time lies in
    * (left.time − toleranceUs, left.time] — the pandas
    * merge_asof(tolerance)/kdb wj semantics, strict on the lower bound.
    * Operationally this is the exec's BOUNDED-STATE mode: the single
    * candidate row is the only row that can ever satisfy a tolerance
    * ending at the current left time, so state stays one row AND a
    * streaming deployment can discard right history older than the
    * tolerance window. The outer form emits null payload for stale or
    * absent candidates (q81's declarative contract). */
  def asofTolerance(left: DataFrame, right: DataFrame, toleranceUs: Long): DataFrame = {
    require(toleranceUs > 0, s"toleranceUs must be > 0, got $toleranceUs")
    asof(left, right, outer = false, tolerance = Some(toleranceUs))
  }

  def asofOuterTolerance(left: DataFrame, right: DataFrame, toleranceUs: Long): DataFrame = {
    require(toleranceUs > 0, s"toleranceUs must be > 0, got $toleranceUs")
    asof(left, right, outer = true, tolerance = Some(toleranceUs))
  }

  private def asof(left: DataFrame, right: DataFrame, outer: Boolean,
                   tolerance: Option[Long] = None): DataFrame = {
    def check(df: DataFrame, side: String): Unit = {
      val f = df.schema.fields
      require(f.length >= 2 && f(0).dataType == LongType && f(1).dataType == LongType,
        s"$side side must lead with (key: LONG, time: LONG), got ${df.schema.simpleString}")
    }
    check(left, "left"); check(right, "right")
    require(right.schema.length > 2, "right side carries no payload columns")
    import org.apache.spark.sql.functions.col
    def dropNullKeys(df: DataFrame): DataFrame = {
      val Array(k, t) = df.columns.take(2)
      df.filter(col(s"`$k`").isNotNull && col(s"`$t`").isNotNull)
    }
    val l = dropNullKeys(left)
    val r0 = dropNullKeys(right)
    val lIds = l.queryExecution.analyzed.outputSet
    val r =
      if (r0.queryExecution.analyzed.output.forall(a => !lIds.contains(a))) r0
      else r0.select(r0.columns.zipWithIndex.map { case (c, i) =>
        col(s"`$c`").as(s"__asof_r$i") }.toIndexedSeq: _*)
    val joined = org.apache.spark.sql.classic.GraftLogicalPlanApi.ofRows(
      left.sparkSession,
      AsofMergeJoin(l.queryExecution.analyzed, r.queryExecution.analyzed, outer,
        tolerance))
    if (r eq r0) joined
    else joined.toDF(left.columns.toIndexedSeq ++ right.columns.drop(2): _*)
  }
}
