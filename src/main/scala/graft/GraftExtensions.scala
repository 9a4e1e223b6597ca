package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: registers the engine's custom Catalyst
  * expressions catalog-wide, so any session (including pure-SQL users and
  * thrift-style frontends) sees them without imperative registration:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  *
  * This is the supported extension surface for function/rule/strategy
  * injection; the engine keeps it minimal (the rest of the library is
  * deliberately stock Catalyst — SURVEY.md §4.3): one fused expression,
  * two optimizer rules ([[graft.plans.LatestWinsRewrite]] — top-1-per-key
  * windows become map-side-combinable max_by/min_by aggregations — and
  * [[graft.plans.MvRewrite]] — aggregations answered from registered
  * materialized views, a no-op until [[graft.plans.MvCatalog]] holds a
  * view), and
  * one planner strategy ([[graft.plans.AsofStrategy]] — plans the
  * [[graft.plans.AsofMergeJoin]] logical node to its streaming-merge
  * exec; a no-op on every other plan), and the two analyzer rules that
  * give `graft-snapshot` catalog tables their SQL surface
  * ([[graft.plans.SnapshotTimeTravelRule]] — `VERSION AS OF` /
  * `TIMESTAMP AS OF` on V1 tables, which stock Spark refuses — and
  * [[graft.plans.SnapshotInsertRule]] — `INSERT INTO/OVERWRITE` rerouted
  * from the stock direct-file write to the atomic commit protocol).
  * `graft.functions.CosineUnits.register` remains as the imperative
  * fallback for sessions built without the config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.LatestWinsRewrite)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    // pre-CBO (a later batch, once): the physical-copy swap must never
    // preempt an MV rewrite that only becomes matchable on a later pass
    // of the shared operator fixpoint — see ProjectionRewrite's scaladoc
    ext.injectPreCBORule(_ => graft.plans.ProjectionRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsofStrategy)
    // SQL surface of the snapshot table format: time travel for V1
    // catalog tables must intercept BEFORE the Resolution batch's stock
    // refusal (hint-resolution runs first); the insert reroute runs in
    // the Resolution batch (so the built-in DataSourceAnalysis — which
    // both refuses the snapshot-safe self-read overwrite and would plan
    // a non-transactional file write — never sees the insert), with a
    // post-hoc registration as the belt-and-suspenders net for plan
    // shapes that reach the planned command another way — see
    // SnapshotSqlRules.
    ext.injectHintResolutionRule(s => graft.plans.SnapshotTimeTravelRule(s))
    ext.injectResolutionRule(_ => graft.plans.SnapshotInsertRule)
    ext.injectPostHocResolutionRule(_ => graft.plans.SnapshotInsertRule)
    // row-level SQL DML (DELETE/UPDATE/MERGE INTO), which stock Spark
    // parses but refuses for non-DSv2 tables
    ext.injectResolutionRule(_ => graft.plans.SnapshotDmlRule)
    // SQL TABLE-VALUED FUNCTIONS over the snapshot table's metadata —
    // DESCRIBE-HISTORY and change-feed polling for pure-SQL users
    // (Spark has no parser hook for `DESCRIBE HISTORY t`, so the
    // standard extension spelling is a TVF):
    //   SELECT * FROM snapshot_history('<table root>')
    //   SELECT * FROM snapshot_changes('<table root>', 1, 3)
    // Both are manifest-metadata reads: history is a marker scan (no
    // data I/O); changes opens only the files in the manifest diff.
    def litStr(fn: String, e: Expression): String = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(s, _) =>
        String.valueOf(s)
      case other => throw new IllegalArgumentException(
        s"$fn: literal argument required, got $other")
    }
    def litLong(fn: String, e: Expression): Long = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Number, _) =>
        v.longValue()
      case other => throw new IllegalArgumentException(
        s"$fn: literal integer argument required, got $other")
    }
    ext.injectTableFunction((
      FunctionIdentifier("snapshot_history"),
      new ExpressionInfo(
        graft.operators.SnapshotStore.getClass.getName,
        null,
        "snapshot_history",
        "snapshot_history(path) - table history (version, op, parent) of a graft-snapshot table, read lock-free from its commit markers",
        ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw graft.functions.FunctionArity
          .wrongNumArgs("snapshot_history", expected = 1, actual = exprs.length)
        val spark = org.apache.spark.sql.SparkSession.active
        graft.operators.SnapshotStore
          .history(spark, litStr("snapshot_history", exprs(0)))
          .queryExecution.analyzed
      }))
    ext.injectTableFunction((
      FunctionIdentifier("snapshot_changes"),
      new ExpressionInfo(
        graft.operators.SnapshotStore.getClass.getName,
        null,
        "snapshot_changes",
        "snapshot_changes(path, fromV, toV) - net row-level delta (change_type insert|delete) between two committed versions of a graft-snapshot table, reading only the manifest-diff files",
        ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 3) throw graft.functions.FunctionArity
          .wrongNumArgs("snapshot_changes", expected = 3, actual = exprs.length)
        val spark = org.apache.spark.sql.SparkSession.active
        graft.operators.SnapshotStore.changesBetween(spark,
          litStr("snapshot_changes", exprs(0)),
          litLong("snapshot_changes", exprs(1)),
          litLong("snapshot_changes", exprs(2)))
          .queryExecution.analyzed
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_units"),
      new ExpressionInfo(
        classOf[graft.functions.CosineUnits].getName,
        null,
        "cosine_units",
        "cosine_units(a, b) - deterministic integer-unit cosine similarity of two float/double arrays",
        ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw graft.functions.FunctionArity
          .wrongNumArgs("cosine_units", expected = 2, actual = exprs.length)
        graft.functions.CosineUnits(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("ngrams_gen"),
      new ExpressionInfo(
        classOf[graft.functions.NGramsGen].getName,
        null,
        "ngrams_gen",
        "ngrams_gen(tokens, n) - generator: one (pos, gram) row per n-token shingle of an array<string>",
        ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw graft.functions.FunctionArity
          .wrongNumArgs("ngrams_gen", expected = 2, actual = exprs.length)
        graft.functions.NGramsGen(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("checksum_agg"),
      new ExpressionInfo(
        classOf[graft.functions.ChecksumAgg].getName,
        null,
        "checksum_agg",
        "checksum_agg(str) - order-independent content checksum: sum of h31(str) mod (2^31-1) over the group",
        ""),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 1) throw graft.functions.FunctionArity
          .wrongNumArgs("checksum_agg", expected = 1, actual = exprs.length)
        graft.functions.ChecksumAgg(exprs(0)).toAggregateExpression()
      }))
  }
}
