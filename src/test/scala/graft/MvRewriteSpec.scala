package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MvCatalog

/** Soundness gates for the materialized-view rewrite: the rule must fire
  * on exactly the rewritable shape and leave everything else untouched
  * (q89 scores the positive path against the DuckDB oracle; these pin the
  * refusals that keep the rewrite SAFE).
  */
class MvRewriteSpec extends AnyFunSuite {
  import TestSpark._

  private def qtyCents = round(col("l_quantity") * 100).cast("long")

  private def withMv(f: String => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvspec_").toFile
    try {
      val mvPath = new java.io.File(tmp, "lineitem_mv").getAbsolutePath
      // the one shared build/registration path q89/q91/q92 also use —
      // the spec must exercise the production contract, not a copy
      graft.queries.Extended.buildLineitemMv(spark, sf, mvPath)
      graft.queries.Extended.registerLineitemMv(spark, sf, mvPath)
      try f(mvPath) finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("one view answers BOTH subtrees of one query (fresh instances per substitution)") {
    // q124's sibling case: the two aggregate subtrees of one join are each
    // answerable by the SAME registered view — substitution must
    // re-instantiate the view plan with fresh exprIds per site, or the
    // second substitution would alias the first's attributes
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      def query() = li
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(qtyCents).as("qty_cents"))
        .join(li.groupBy(col("l_returnflag"))
          .agg(sum(qtyCents).as("flag_cents")), "l_returnflag")
      val plan = query().queryExecution.executedPlan.toString
      assert(plan.contains("lineitem_mv"),
        s"both subtrees must be served from the view:\n$plan")
      assert(!plan.contains("lineitem.parquet"),
        s"the base must not be touched:\n$plan")
      val got = query().orderBy(col("l_returnflag"), col("l_linestatus"))
        .collect().toSeq
      MvCatalog.clear()
      val direct = query().orderBy(col("l_returnflag"), col("l_linestatus"))
        .collect().toSeq
      assert(got == direct && got.nonEmpty)
    }
  }

  test("multi-view partial rewrite never half-applies: an unanswerable subtree refuses ALONE") {
    // q124's refusal half. A join of two aggregate subtrees where one is
    // unanswerable (raw double sum — float reorder) must leave THAT
    // subtree on the base table while the other still rewrites to its
    // view, and the rows must equal the no-catalog run — per-subtree
    // soundness, never an all-or-nothing bail and never a half-applied
    // wrong answer.
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvmulti_").toFile
    try {
      val fine = new java.io.File(tmp, "lineitem_mv").getAbsolutePath
      val coarse = new java.io.File(tmp, "lineitem_mv_flag").getAbsolutePath
      val li = Tables.t(spark, sf, "lineitem")
      graft.queries.Extended.buildLineitemMv(spark, sf, fine)
      li.groupBy(col("l_returnflag"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
        .write.parquet(coarse)
      graft.queries.Extended.registerLineitemMv(spark, sf, fine)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(coarse).queryExecution.analyzed))
      try {
        def query() = li
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum(col("l_quantity")).as("raw_qty")) // raw double sum: refused
          .join(li.groupBy(col("l_returnflag"))
            .agg(sum(qtyCents).as("flag_cents")), "l_returnflag")
        val plan = query().queryExecution.executedPlan.toString
        assert(plan.contains("lineitem.parquet"),
          s"the raw-double subtree must stay on the base:\n$plan")
        assert(plan.contains("lineitem_mv_flag"),
          s"the answerable totals subtree must still rewrite:\n$plan")
        assert(!plan.contains("lineitem_mv/") && !plan.contains("lineitem_mv]"),
          s"the fine view answers neither subtree here and must not appear:\n$plan")
        val got = query().orderBy(col("l_returnflag"), col("l_linestatus"))
          .collect().toSeq
        MvCatalog.clear()
        val direct = query().orderBy(col("l_returnflag"), col("l_linestatus"))
          .collect().toSeq
        assert(got == direct && got.nonEmpty)
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("rewrite fires on a coarser grouping and matches the base-table answer") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      val viaMv = li.groupBy(col("l_returnflag"))
        .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
      assert(viaMv.queryExecution.executedPlan.toString.contains("lineitem_mv"))
      MvCatalog.clear()
      val direct = li.groupBy(col("l_returnflag"))
        .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
      assert(!direct.queryExecution.executedPlan.toString.contains("lineitem_mv"))
      assert(viaMv.orderBy(col("l_returnflag")).collect().toSeq ==
        direct.orderBy(col("l_returnflag")).collect().toSeq)
    }
  }

  test("try_sum refuses (TRY eval mode is not bit-faithful to a rebuilt Sum)") {
    withMv { _ =>
      // on overflow try_sum returns NULL while a session-mode Sum wraps or
      // throws — the rewrite must refuse TRY like it refuses try_avg
      val li = Tables.t(spark, sf, "lineitem")
      val q = li.groupBy(col("l_returnflag"))
        .agg(expr("try_sum(cast(round(l_quantity * 100) as bigint))").as("s"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("lineitem_mv"),
        s"try_sum must not be answered from the view:\n$plan")
      // and the plain sum STILL rewrites in the same session (the guard
      // must not over-refuse)
      val ok = li.groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
      assert(ok.queryExecution.executedPlan.toString.contains("lineitem_mv"))
    }
  }

  test("a re-typed stored grouping column refuses (flat-path type check)") {
    // a mis-registered MV whose stored grain column's type drifted from
    // the base must refuse, never silently re-type an output attribute
    // under its reused exprId
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvtype_").toFile
    try {
      val drifted = new java.io.File(tmp, "lineitem_mv_drift").getAbsolutePath
      Tables.t(spark, sf, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
        // type drift: the stored flag is a 1-char -> int cast
        .withColumn("l_returnflag", ascii(col("l_returnflag")))
        .write.parquet(drifted)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag", "l_linestatus"),
        sumMeasures = graft.plans.MvCatalog
          .measureExprs(Tables.t(spark, sf, "lineitem"), qtyCents)
          .map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(drifted).queryExecution.analyzed))
      try {
        val q = Tables.t(spark, sf, "lineitem")
          .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
        val plan = q.queryExecution.executedPlan.toString
        assert(!plan.contains("lineitem_mv_drift"),
          s"a type-drifted grain column must refuse the rewrite:\n$plan")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("registration rejects an MV whose own plan scans a registered base suffix") {
    // idempotence enforced at register (the ProjectionCatalog discipline):
    // such a def would re-match its own substitution on every fixpoint pass
    val li = Tables.t(spark, sf, "lineitem")
    intercept[IllegalArgumentException] {
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "s"),
        countCol = "cnt",
        mv = li.queryExecution.analyzed)) // scans the base itself
    }
    MvCatalog.clear()
  }

  test("batch ordering: the MV wins over a covering projection for folded post-agg shapes") {
    // ProjectionRewrite runs pre-CBO (after the operator fixpoint that
    // hosts MvRewrite), so a shape that only becomes MV-matchable after
    // CollapseProject folds post-agg arithmetic in can never be preempted
    // by an earlier-pass scan swap
    withMv { _ =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_mvord_").toFile
      try {
        val projPath = new java.io.File(tmp, "lineitem_proj").getAbsolutePath
        graft.queries.Extended.buildLineitemProj(spark, sf, projPath)
        graft.queries.Extended.registerLineitemProj(spark, projPath)
        try {
          val q = Tables.t(spark, sf, "lineitem")
            .groupBy(upper(col("l_returnflag")).as("flag"))
            .agg((sum(qtyCents) * 2).as("s2"),
                 (count(lit(1)) + 1).as("n1"))
          val plan = q.queryExecution.executedPlan.toString
          assert(plan.contains("lineitem_mv") && !plan.contains("lineitem_proj"),
            s"the |grain|-row MV must win over the physical copy:\n$plan")
        } finally graft.plans.ProjectionCatalog.clear()
      } finally graft.util.Fs.deleteTree(tmp)
    }
  }

  test("range subsumption: tighter ranges, points and IN-sets rewrite; the boundary cases refuse") {
    // q114's view: baked `l_discount <= 0.04`, discount IN the grain
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvrange_").toFile
    try {
      val mvPath = new java.io.File(tmp, "lineitem_mv_range").getAbsolutePath
      graft.queries.Extended.buildRangeMv(spark, sf, mvPath)
      graft.queries.Extended.registerRangeMv(spark, sf, mvPath)
      try {
        val li = Tables.t(spark, sf, "lineitem")
        def agg(pred: org.apache.spark.sql.Column) = li.filter(pred)
          .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
        def hits(pred: org.apache.spark.sql.Column): Boolean =
          agg(pred).queryExecution.executedPlan.toString.contains("lineitem_mv_range")
        def valueEqual(pred: org.apache.spark.sql.Column): Unit = {
          val got = agg(pred).orderBy(col("l_linestatus")).collect().toSeq
          graft.plans.MvCatalog.clear()
          try assert(got == agg(pred).orderBy(col("l_linestatus")).collect().toSeq)
          finally graft.queries.Extended.registerRangeMv(spark, sf, mvPath)
        }
        // strictly-contained range, strict-vs-nonstrict boundary, point,
        // IN, and BETWEEN (desugars to two conjuncts: the upper bound
        // subsumes the baked range, the lower replays as a grain function)
        for (p <- Seq(col("l_discount") <= lit(0.03),
                      col("l_discount") < lit(0.04),
                      col("l_discount") === lit(0.02),
                      col("l_discount").isin(0.01, 0.02),
                      col("l_discount").between(0.01, 0.03))) {
          assert(hits(p), s"contained predicate must rewrite: $p")
          valueEqual(p)
        }
        // a 12-element IN converts to InSet past the threshold — the
        // point decomposition must still subsume (and still refuse when
        // one point escapes the baked range)
        val in12 = Seq(0.0, 0.002, 0.005, 0.01, 0.012, 0.015,
                       0.02, 0.022, 0.025, 0.03, 0.035, 0.04)
        assert(hits(col("l_discount").isin(in12: _*)))
        valueEqual(col("l_discount").isin(in12: _*))
        assert(!hits(col("l_discount").isin((in12 :+ 0.05): _*)))
        // refusals: overlapping-but-not-contained (either spelling),
        // different attribute, non-literal bound
        assert(!hits(col("l_discount") <= lit(0.05)))
        assert(!hits(col("l_discount") < lit(0.05)))
        assert(!hits(col("l_tax") <= lit(0.03)))
        assert(!hits(col("l_discount") <= col("l_tax")))
      } finally graft.plans.MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("range subsumption on TIMESTAMP grain: 'this week' answered from the 'this month' slice") {
    import org.apache.spark.sql.types.TimestampType
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvtsr_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val baked = col("l_shipdate") >= lit("1995-07-01").cast(TimestampType)
      val mvPath = new java.io.File(tmp, "lineitem_mv_recent").getAbsolutePath
      li.filter(baked)
        .groupBy(col("l_returnflag"), col("l_shipdate"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag", "l_shipdate"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        viewFilters = Seq(MvCatalog.measureExprs(li, baked))))
      try {
        def agg(p: org.apache.spark.sql.Column) = li.filter(p)
          .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
        val tight = col("l_shipdate") >= lit("1996-01-01").cast(TimestampType)
        val q = agg(tight)
        assert(q.queryExecution.executedPlan.toString.contains("lineitem_mv_recent"),
          "the tighter timestamp range must be answered from the slice view")
        val got = q.orderBy(col("l_returnflag")).collect().toSeq
        // a WIDER range refuses — the view is missing older rows
        assert(!agg(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType))
          .queryExecution.executedPlan.toString.contains("lineitem_mv_recent"))
        MvCatalog.clear()
        assert(got == agg(tight).orderBy(col("l_returnflag")).collect().toSeq
          && got.nonEmpty)
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("subsumption composes over a JOIN base (string-typed grain range)") {
    // admitFilters is shared across base kinds, so a subsumed conjunct
    // must cover a baked filter on a FILTERED JOIN view too — pinned, not
    // assumed; also exercises string-literal range comparison
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvjsub_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val ord = Tables.t(spark, sf, "orders")
      val baked = col("o_orderpriority") >= lit("3-MEDIUM")
      val mvPath = new java.io.File(tmp, "join_mv_lowpri").getAbsolutePath
      li.join(ord, col("l_orderkey") === col("o_orderkey")).filter(baked)
        .groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("o_orderpriority", "l_returnflag"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        baseJoin = Some(MvCatalog.JoinSpec(
          Seq("lineitem.parquet", "orders.parquet"),
          Seq("l_orderkey" -> "o_orderkey"))),
        viewFilters = Seq(MvCatalog.measureExprs(ord, baked))))
      try {
        def agg(p: org.apache.spark.sql.Column) =
          li.join(ord, col("l_orderkey") === col("o_orderkey")).filter(p)
            .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
        val tight = col("o_orderpriority") >= lit("4-NOT SPECIFIED")
        val q = agg(tight)
        assert(q.queryExecution.executedPlan.toString.contains("join_mv_lowpri"),
          "the subsumed string range must be answered from the filtered join view")
        val got = q.orderBy(col("l_returnflag")).collect().toSeq
        // wider range refuses
        assert(!agg(col("o_orderpriority") >= lit("2-HIGH"))
          .queryExecution.executedPlan.toString.contains("join_mv_lowpri"))
        MvCatalog.clear()
        assert(got == agg(tight).orderBy(col("l_returnflag")).collect().toSeq
          && got.nonEmpty)
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("range subsumption over a NON-grain filtered column refuses (replay has nowhere to act)") {
    // q108's view bakes the same conjunct but does NOT store l_discount in
    // the grain: a tighter query range is provably contained, yet its
    // replay would have to select WITHIN collapsed groups — must refuse
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvrange2_").toFile
    try {
      val mvPath = new java.io.File(tmp, "lineitem_mv_disc").getAbsolutePath
      graft.queries.Extended.buildDiscountMv(spark, sf, mvPath)
      graft.queries.Extended.registerDiscountMv(spark, sf, mvPath)
      try {
        val q = Tables.t(spark, sf, "lineitem")
          .filter(col("l_discount") <= lit(0.03))
          .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
        val plan = q.queryExecution.executedPlan.toString
        assert(!plan.contains("lineitem_mv_disc"),
          s"non-grain subsumption must refuse:\n$plan")
        // while the EXACT baked conjunct still absorbs (the q108 path)
        val ok = Tables.t(spark, sf, "lineitem")
          .filter(col("l_discount") <= lit(0.04))
          .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
        assert(ok.queryExecution.executedPlan.toString.contains("lineitem_mv_disc"))
      } finally graft.plans.MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("union-view IVM: any batch slicing of the hot fold equals the one-shot build; replays are no-ops") {
    // q115's maintenance algebra without the stream harness: agg(cold ∪
    // ⋃Δᵢ) re-combined from agg(cold) + per-batch partials must equal the
    // one-shot aggregate under ANY slicing, and a replayed (batchId, rows)
    // fold must change nothing (DedupAppend keys exist, stamp skips).
    val li = Tables.t(spark, sf, "lineitem")
    val cold = li.filter(pmod(col("l_orderkey"), lit(2)) === 0)
    val hot = li.filter(pmod(col("l_orderkey"), lit(2)) =!= 0)
    val oneShot = cold.unionByName(hot)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq
    for (k <- Seq(1, 3)) {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_ivm$k" + "_").toFile
      try {
        val hotPath = new java.io.File(tmp, "hot").getAbsolutePath
        val mvPath = new java.io.File(tmp, "state").getAbsolutePath
        graft.operators.StateMerge.mergeOverwrite(spark,
          cold.groupBy(col("l_returnflag"), col("l_linestatus"))
            .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt")),
          mvPath)(identity)
        val slices = (0 until k).map(i =>
          hot.filter(pmod(col("l_orderkey"), lit(2 * k)) === (2 * i + 1)))
        slices.zipWithIndex.foreach { case (b, i) =>
          graft.queries.Extended.foldHotBatch(b, i.toLong, hotPath, mvPath) }
        // replay the LAST batch verbatim: must be a complete no-op
        graft.queries.Extended.foldHotBatch(slices.last, (k - 1).toLong, hotPath, mvPath)
        val got = spark.read.parquet(mvPath)
          .orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq
        assert(got == oneShot, s"slicing k=$k must equal the one-shot build")
        assert(spark.read.parquet(hotPath).count() == hot.count(),
          "the replayed append must not duplicate hot rows")
      } finally graft.util.Fs.deleteTree(tmp)
    }
  }

  test("outer-join view: the q116 shape rewrites (null grain included); mismatched shapes refuse") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvouter_").toFile
    try {
      val dimPath = new java.io.File(tmp, "orders_dim.parquet").getAbsolutePath
      val mvPath = new java.io.File(tmp, "lineitem_outer_mv").getAbsolutePath
      graft.queries.Extended.buildOuterMv(spark, sf, dimPath, mvPath)
      graft.queries.Extended.registerOuterMv(spark, sf, mvPath)
      try {
        val li = Tables.t(spark, sf, "lineitem")
        def dim = spark.read.parquet(dimPath)
        def outer = li.join(dim, col("l_orderkey") === col("o_orderkey"), "left_outer")
        // the null-tolerant dim-grain filter selects exactly the view's
        // null-priority group (unmatched facts + null-priority orders):
        // rewrites AND matches the base recompute
        val nullGrain = outer.filter(col("o_orderpriority").isNull)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        assert(nullGrain.queryExecution.executedPlan.toString.contains("lineitem_outer_mv"))
        val got = nullGrain.orderBy(col("l_returnflag")).collect().toSeq
        graft.plans.MvCatalog.clear()
        val base = outer.filter(col("o_orderpriority").isNull)
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")).collect().toSeq
        assert(got == base && got.nonEmpty)
        graft.queries.Extended.registerOuterMv(spark, sf, mvPath)
        // an INNER query join never matches the outer view (different relation)
        val inner = li.join(dim, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority")).agg(sum(qtyCents).as("s"))
        assert(!inner.queryExecution.executedPlan.toString.contains("lineitem_outer_mv"))
        // a null-INTOLERANT dim filter: the optimizer rewrites the join to
        // inner (EliminateOuterJoin), which must refuse the outer view
        val dimFiltered = outer.filter(col("o_orderpriority") === "1-URGENT")
          .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
        assert(!dimFiltered.queryExecution.executedPlan.toString.contains("lineitem_outer_mv"))
        // an extra ON conjunct changes which facts null-extend: refuse
        val extraOn = li.join(dim,
            col("l_orderkey") === col("o_orderkey") &&
              col("o_orderpriority") =!= lit("X"), "left_outer")
          .groupBy(col("o_orderpriority")).agg(sum(qtyCents).as("s"))
        assert(!extraOn.queryExecution.executedPlan.toString.contains("lineitem_outer_mv"))
        // dim RIGHT JOIN fact IS the registered fact LEFT JOIN dim: if the
        // optimizer canonicalizes the spelling, the rewrite firing is
        // SOUND — so the law is value-equality either way, never refusal
        val rightQ = dim.join(li, col("l_orderkey") === col("o_orderkey"), "right_outer")
          .groupBy(col("o_orderpriority")).agg(sum(qtyCents).as("s"))
        val rgot = rightQ.orderBy(col("o_orderpriority")).collect().toSeq
        graft.plans.MvCatalog.clear()
        assert(rgot == dim.join(li, col("l_orderkey") === col("o_orderkey"), "right_outer")
          .groupBy(col("o_orderpriority")).agg(sum(qtyCents).as("s"))
          .orderBy(col("o_orderpriority")).collect().toSeq && rgot.nonEmpty)
        graft.queries.Extended.registerOuterMv(spark, sf, mvPath)
      } finally graft.plans.MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("outer-join registration refuses without the dim-uniqueness contract; outer query never matches the inner view") {
    intercept[IllegalArgumentException] {
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag"),
        sumMeasures = Nil, countCol = "cnt",
        mv = spark.range(1).toDF().queryExecution.analyzed,
        baseJoin = Some(MvCatalog.JoinSpec(
          Seq("lineitem.parquet", "orders.parquet"),
          Seq("l_orderkey" -> "o_orderkey"), outer = true, dimUnique = false))))
    }
    MvCatalog.clear()
    // q107's INNER view must never answer an outer query join
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvouter2_").toFile
    try {
      val mvPath = new java.io.File(tmp, "lineitem_orders_mv").getAbsolutePath
      graft.queries.Extended.buildJoinMv(spark, sf, mvPath)
      graft.queries.Extended.registerJoinMv(spark, sf, mvPath)
      try {
        val q = Tables.t(spark, sf, "lineitem")
          .join(Tables.t(spark, sf, "orders"),
            col("l_orderkey") === col("o_orderkey"), "left_outer")
          .groupBy(col("o_orderpriority")).agg(sum(qtyCents).as("s"))
        assert(!q.queryExecution.executedPlan.toString.contains("lineitem_orders_mv"))
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("filtered-view IVM: any slicing of filtered folds equals the one-shot build; replays are no-ops") {
    // σ(⋃Δᵢ) = ⋃σ(Δᵢ): per-batch filtered partials merge to the one-shot
    // filtered aggregate under any slicing (q120's maintenance algebra)
    val li = Tables.t(spark, sf, "lineitem")
    val oneShot = li.filter(col("l_discount") <= lit(0.04))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq
    for (k <- Seq(1, 3)) {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_fivm$k" + "_").toFile
      try {
        val mvPath = new java.io.File(tmp, "state").getAbsolutePath
        val slices = (0 until k).map(i =>
          li.filter(pmod(col("l_orderkey"), lit(k)) === i))
        slices.zipWithIndex.foreach { case (b, i) =>
          graft.queries.Extended.foldFilteredBatch(b, i.toLong, mvPath) }
        // replayed last batch: the stamp must make it a no-op
        graft.queries.Extended.foldFilteredBatch(slices.last, (k - 1).toLong, mvPath)
        val got = spark.read.parquet(mvPath)
          .orderBy(col("l_returnflag"), col("l_linestatus")).collect().toSeq
        assert(got == oneShot, s"slicing k=$k must equal the one-shot filtered build")
      } finally graft.util.Fs.deleteTree(tmp)
    }
  }

  test("a multi-root scan containing the base path refuses (extra roots' rows are not in the view)") {
    withMv { _ =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_mvroot_").toFile
      try {
        val extra = new java.io.File(tmp, "extra.parquet").getAbsolutePath
        val li = Tables.t(spark, sf, "lineitem")
        li.limit(10).write.parquet(extra)
        val multi = spark.read.parquet(s"$sf/lineitem.parquet", extra)
          .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
        assert(!multi.queryExecution.executedPlan.toString.contains("lineitem_mv"),
          "a scan with extra root paths has rows the view never stored")
      } finally graft.util.Fs.deleteTree(tmp)
    }
  }

  test("no rewrite when a grouping column is outside the MV's grain") {
    withMv { _ =>
      val plan = Tables.t(spark, sf, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(qtyCents).as("s"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("lineitem_mv"),
        "finer-grained grouping cannot be answered from the MV")
    }
  }

  test("no rewrite for a raw DOUBLE sum (regrouping would reorder float addition)") {
    withMv { _ =>
      val plan = Tables.t(spark, sf, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("lineitem_mv"))
    }
  }

  test("no rewrite for an unregistered measure or a DISTINCT aggregate") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      val p1 = li.groupBy(col("l_returnflag"))
        .agg(sum(col("l_linenumber")).as("s"))
        .queryExecution.executedPlan.toString
      assert(!p1.contains("lineitem_mv"), "unregistered measure must not match")
      val p2 = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("s"))
        .queryExecution.executedPlan.toString
      assert(!p2.contains("lineitem_mv"), "DISTINCT is not re-aggregable from sums")
    }
  }

  test("filter on a grouping column is replayed against the MV; a finer filter blocks") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      val onGrain = li.filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
      assert(onGrain.queryExecution.executedPlan.toString.contains("lineitem_mv"))
      val finer = li.filter(col("l_partkey") > 100)
        .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
      assert(!finer.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "a within-group predicate must block the rewrite")
      // a DERIVED predicate of grain columns (still whole-group
      // selection) replays too; mixing in a finer column blocks
      val derived = li.filter(concat(col("l_returnflag"), col("l_linestatus")) =!= "NO")
        .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
      assert(derived.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "a predicate that is a function of the grain must replay")
      val mixed = li.filter(concat(col("l_returnflag"), col("l_shipdate").cast("string")) =!= "NO")
        .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
      assert(!mixed.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "a predicate touching any finer column must block")
      val gotDerived = derived.orderBy(col("l_linestatus")).collect().toSeq
      // value check for the replayed filters
      MvCatalog.clear()
      val direct = li.filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
      assert(onGrain.orderBy(col("l_linestatus")).collect().toSeq ==
        direct.orderBy(col("l_linestatus")).collect().toSeq)
      assert(gotDerived ==
        li.filter(concat(col("l_returnflag"), col("l_linestatus")) =!= "NO")
          .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
          .orderBy(col("l_linestatus")).collect().toSeq)
    }
  }

  test("stream-maintained MV (q92) and batch-built MV (q89) give identical answers") {
    val viaStream = graft.queries.Extended.q92StreamMv(spark, sf).collect().toSeq
    val viaBatch = graft.queries.Extended.q89MvRewrite(spark, sf).collect().toSeq
    assert(viaStream.nonEmpty && viaStream == viaBatch)
  }

  test("with several registered views, any matching grain gives the same correct answer") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvspec2_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val fine = new java.io.File(tmp, "lineitem_mv").getAbsolutePath
      val coarse = new java.io.File(tmp, "lineitem_mv_status").getAbsolutePath
      graft.queries.Extended.buildLineitemMv(spark, sf, fine)
      li.groupBy(col("l_linestatus"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
        .write.parquet(coarse)
      graft.queries.Extended.registerLineitemMv(spark, sf, fine)
      // second view at the coarser (status)-only grain
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_linestatus"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(coarse).queryExecution.analyzed))
      try {
        val q = li.groupBy(col("l_linestatus"))
          .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("lineitem_mv"), "one of the matching views must answer")
        val got = q.orderBy(col("l_linestatus")).collect().toSeq
        MvCatalog.clear()
        val want = li.groupBy(col("l_linestatus"))
          .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
          .orderBy(col("l_linestatus")).collect().toSeq
        assert(got == want, "whichever view wins, the answer must be the base answer")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("ROLLUP over the MV's grain is answered from the MV (Expand-aware rewrite)") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      def q(d: org.apache.spark.sql.DataFrame) = d
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
      val viaMv = q(li)
      val plan = viaMv.queryExecution.executedPlan.toString
      assert(plan.contains("lineitem_mv"), s"rollup must scan the MV:\n$plan")
      assert(!plan.contains("lineitem.parquet"), s"rollup must not scan the base:\n$plan")
      assert(plan.contains("Expand"), "the grouping-set replication must survive the rewrite")
      val got = viaMv.collect().toSeq
      MvCatalog.clear()
      assert(got == q(li).collect().toSeq && got.nonEmpty,
        "per-set totals re-aggregated from partial sums must equal the base rollup")
    }
  }

  test("CUBE and grouping-id arithmetic rewrite too; a mixed-grain rollup refuses") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      def q(d: org.apache.spark.sql.DataFrame) = d
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), grouping_id().as("gid"))
        .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
      val viaMv = q(li)
      assert(viaMv.queryExecution.executedPlan.toString.contains("lineitem_mv"))
      val got = viaMv.collect().toSeq
      // mixed grain: one rollup column outside the MV's grouping set
      val finer = li.rollup(col("l_returnflag"), col("l_partkey"))
        .agg(sum(qtyCents).as("s"))
      assert(!finer.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "a grouping-set column outside the MV grain must block the rewrite")
      MvCatalog.clear()
      assert(got == q(li).collect().toSeq && got.nonEmpty)
    }
  }

  test("overlap costing: when several views suffice, the coarsest grain is chosen") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvchoice_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val fine = new java.io.File(tmp, "lineitem_mv").getAbsolutePath
      val coarse = new java.io.File(tmp, "lineitem_mv_flag").getAbsolutePath
      graft.queries.Extended.buildLineitemMv(spark, sf, fine)
      li.groupBy(col("l_returnflag"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
        .write.parquet(coarse)
      // register FINE first — first-match would pick it; costing must not
      graft.queries.Extended.registerLineitemMv(spark, sf, fine)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(coarse).queryExecution.analyzed))
      try {
        val q = li.groupBy(col("l_returnflag"))
          .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
        val plan = q.queryExecution.executedPlan.toString
        assert(plan.contains("lineitem_mv_flag"),
          s"the coarser (smaller) sufficient view must win:\n$plan")
        assert(!plan.contains("lineitem_mv/") && !plan.contains("lineitem_mv]"),
          s"the finer view must not be scanned when a coarser one suffices:\n$plan")
        val got = q.orderBy(col("l_returnflag")).collect().toSeq
        MvCatalog.clear()
        val want = li.groupBy(col("l_returnflag"))
          .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")).collect().toSeq
        assert(got == want, "whichever view wins, the answer must be the base answer")
        // the finer view still answers when it is the only sufficient one
        graft.queries.Extended.registerLineitemMv(spark, sf, fine)
        MvCatalog.register(MvCatalog.MvDef(
          basePathSuffix = "lineitem.parquet",
          groupCols = Set("l_returnflag"),
          sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
          countCol = "cnt",
          mv = spark.read.parquet(coarse).queryExecution.analyzed))
        val byStatus = li.groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
        assert(byStatus.queryExecution.executedPlan.toString.contains("lineitem_mv"),
          "the flag-only view cannot answer a status grouping; the fine view must")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("measure matching preserves literal case: 'A' never matches 'a'") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvlit_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val mvPath = new java.io.File(tmp, "lineitem_mv_cond").getAbsolutePath
      // a measure CONTAINING a string literal — the shape the lowercased-SQL
      // canon would have matched case-insensitively (the soundness hole)
      def condQty(flag: String) =
        when(col("l_returnflag") === flag, round(col("l_quantity") * 100).cast("long"))
          .otherwise(0L)
      li.groupBy(col("l_linestatus"))
        .agg(sum(condQty("A")).as("sum_a"), count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_linestatus"),
        sumMeasures = MvCatalog.measureExprs(li, condQty("A")).map(_ -> "sum_a"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed))
      try {
        val exact = li.groupBy(col("l_linestatus")).agg(sum(condQty("A")).as("s"))
        assert(exact.queryExecution.executedPlan.toString.contains("lineitem_mv_cond"),
          "the identical measure (same literal, same case) must match")
        val lower = li.groupBy(col("l_linestatus")).agg(sum(condQty("a")).as("s"))
        assert(!lower.queryExecution.executedPlan.toString.contains("lineitem_mv_cond"),
          "a measure differing ONLY in string-literal case must NOT match")
        // identifier case stays insensitive (it names the same column)
        val idCase = li.groupBy(col("L_LINESTATUS"))
          .agg(sum(when(col("L_RETURNFLAG") === "A",
            round(col("L_QUANTITY") * 100).cast("long")).otherwise(0L)).as("s"))
        assert(idCase.queryExecution.executedPlan.toString.contains("lineitem_mv_cond"),
          "identifier case must remain insensitive")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("colliding column-name hashCodes never cross-match a measure") {
    // "an".hashCode == "c0".hashCode == 3117 (base-31 collision between
    // valid column names): a hash-derived pinned exprId would canonicalize
    // sum(an) and sum(c0) IDENTICALLY and silently rewrite one to the
    // other's stored partials — the registry-derived id must keep them
    // distinct
    assert("an".hashCode == "c0".hashCode, "fixture invariant")
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvcollide_").toFile
    try {
      val basePath = new java.io.File(tmp, "collide.parquet").getAbsolutePath
      spark.range(100).selectExpr(
        "id % 4 as g", "id as an", "id * 1000 as c0")
        .write.parquet(basePath)
      val base = spark.read.parquet(basePath)
      val mvPath = new java.io.File(tmp, "collide_mv").getAbsolutePath
      base.groupBy(col("g"))
        .agg(sum(col("an")).as("sum_c"), count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "collide.parquet",
        groupCols = Set("g"),
        sumMeasures = MvCatalog.measureExprs(base, col("an")).map(_ -> "sum_c"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed))
      try {
        val same = base.groupBy(col("g")).agg(sum(col("an")).as("s"))
        assert(same.queryExecution.executedPlan.toString.contains("collide_mv"),
          "the registered measure itself must match")
        val other = base.groupBy(col("g")).agg(sum(col("c0")).as("s"))
        assert(!other.queryExecution.executedPlan.toString.contains("collide_mv"),
          "a DIFFERENT column whose name hashCode collides must NOT match")
        val want = (0L until 100L).groupBy(_ % 4).view
          .mapValues(_.map(_ * 1000L).sum).toMap
        val got = other.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, "the colliding query must compute from base, exactly")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("self-join of two rewritten aggregates: fresh MV exprIds per substitution") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      val agg1 = li.groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s1"))
      val agg2 = li.groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s2"))
      val joined = agg1.join(agg2, Seq("l_returnflag"))
        .orderBy(col("l_returnflag"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("lineitem_mv"), "both branches rewrite")
      val got = joined.collect().toSeq
      MvCatalog.clear()
      val want = li.groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s1"))
        .join(li.groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s2")),
          Seq("l_returnflag"))
        .orderBy(col("l_returnflag")).collect().toSeq
      assert(got == want && got.nonEmpty,
        "the same MV spliced into two branches must analyze and execute cleanly")
    }
  }

  test("min/max re-aggregate from the MV (doubles included); unregistered kinds refuse") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvminmax_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val mvPath = new java.io.File(tmp, "lineitem_mv_stats").getAbsolutePath
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"),
             min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag", "l_linestatus"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        minMeasures = MvCatalog.measureExprs(li, col("l_quantity")).map(_ -> "min_qty"),
        maxMeasures = MvCatalog.measureExprs(li, col("l_quantity")).map(_ -> "max_qty")))
      try {
        // a raw DOUBLE min/max rewrites (semilattice — no addition-order
        // hazard), even though the same column's raw SUM must refuse
        def q(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("l_returnflag"))
          .agg(min(col("l_quantity")).as("lo"), max(col("l_quantity")).as("hi"))
          .orderBy(col("l_returnflag"))
        val viaMv = q(li)
        assert(viaMv.queryExecution.executedPlan.toString.contains("lineitem_mv_stats"))
        val got = viaMv.collect().toSeq
        // ...and inside a ROLLUP through the Expand path
        val roll = li.rollup(col("l_returnflag"))
          .agg(min(col("l_quantity")).as("lo"), count(lit(1)).as("n"))
        assert(roll.queryExecution.executedPlan.toString.contains("lineitem_mv_stats"),
          "min must re-aggregate per grouping set through the Expand path")
        // refusals: raw double sum; min of an UNREGISTERED measure
        val sumDouble = li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
        assert(!sumDouble.queryExecution.executedPlan.toString.contains("lineitem_mv_stats"))
        val minOther = li.groupBy(col("l_returnflag")).agg(min(col("l_extendedprice")).as("m"))
        assert(!minOther.queryExecution.executedPlan.toString.contains("lineitem_mv_stats"))
        MvCatalog.clear()
        assert(got == q(li).collect().toSeq && got.nonEmpty)
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("count(measure) rewrites from the avg pair; min/max of a GRAIN column need no measure") {
    // count(m) is the NON-NULL count — exactly what an avg registration's
    // cnt column stores, usable even when the query never asks for avg
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvcntm_").toFile
    try {
      val basePath = new java.io.File(tmp, "cntbase.parquet").getAbsolutePath
      spark.range(1000).selectExpr("id % 7 as g",
        "CASE WHEN id % 5 = 0 THEN NULL ELSE CAST(id AS DECIMAL(18,2)) END as m")
        .write.parquet(basePath)
      val base = spark.read.parquet(basePath)
      val mvPath = new java.io.File(tmp, "cnt_mv").getAbsolutePath
      base.groupBy(col("g"))
        .agg(sum(col("m")).as("sum_m"), count(col("m")).as("cnt_m"),
             count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "cntbase.parquet",
        groupCols = Set("g"),
        sumMeasures = Nil, countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        avgMeasures = MvCatalog.measureExprs(base, col("m"))
          .map(_ -> ("sum_m", "cnt_m"))))
      try {
        def q(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("g"))
          .agg(count(col("m")).as("nm"), count(lit(1)).as("n"))
          .orderBy(col("g"))
        val viaMv = q(base)
        assert(viaMv.queryExecution.executedPlan.toString.contains("cnt_mv"),
          "count(measure) must re-aggregate from the stored non-null counts")
        val got = viaMv.collect().toSeq
        MvCatalog.clear()
        val direct = q(base).collect().toSeq
        assert(got == direct && got.exists(r => r.getLong(1) != r.getLong(2)),
          "the fixture must distinguish count(m) from count(*)")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
    // min/max over a GRAIN column: the view stores every distinct grain
    // combination and min/max are multiplicity-independent
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      def q2 = li.groupBy(col("l_returnflag"))
        .agg(min(col("l_linestatus")).as("lo"), max(col("l_linestatus")).as("hi"))
      assert(q2.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "min/max of a grain column must be answered from the view")
      val got2 = q2.orderBy(col("l_returnflag")).collect().toSeq
      MvCatalog.clear()
      assert(got2 == q2.orderBy(col("l_returnflag")).collect().toSeq && got2.nonEmpty)
      // while min of an UNREGISTERED non-grain column still refuses
    }
    withMv { _ =>
      val refuse = Tables.t(spark, sf, "lineitem").groupBy(col("l_returnflag"))
        .agg(min(col("l_quantity")).as("lo"))
      assert(!refuse.queryExecution.executedPlan.toString.contains("lineitem_mv"))
    }
  }

  test("avg re-aggregates from the MV bit-exactly, incl. null measures and all-null groups") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvavg_").toFile
    try {
      // groups of 142/143 rows with thirds as values → repeating decimals
      // exercise the scale-6 rounding path; id%5 nulls make count(m) ≠
      // count(*) in every group (dividing by count(*) would be wrong and
      // flip the equality below); group 6 is ALL null → avg must be null
      val basePath = new java.io.File(tmp, "avgbase.parquet").getAbsolutePath
      spark.range(1000).selectExpr(
        "id % 7 as g", "id % 3 as h", "CAST(id AS DOUBLE) as dm",
        """CASE WHEN id % 7 = 6 THEN NULL WHEN id % 5 = 0 THEN NULL
          |ELSE CAST(CAST(id * 7 + 1 AS DECIMAL(18,2)) / 3 AS DECIMAL(18,2))
          |END as m""".stripMargin)
        .write.parquet(basePath)
      val base = spark.read.parquet(basePath)
      val mvPath = new java.io.File(tmp, "avg_mv").getAbsolutePath
      base.groupBy(col("g"), col("h"))
        .agg(sum(col("m")).as("sum_m"), count(col("m")).as("cnt_m"),
             count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "avgbase.parquet",
        groupCols = Set("g", "h"),
        sumMeasures = Nil,
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        avgMeasures = MvCatalog.measureExprs(base, col("m"))
          .map(_ -> ("sum_m", "cnt_m"))))
      try {
        def q(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("g"))
          .agg(avg(col("m")).as("a"), count(lit(1)).as("n"))
          .orderBy(col("g"))
        val viaMv = q(base)
        assert(viaMv.queryExecution.executedPlan.toString.contains("avg_mv"),
          "avg over a registered (sum, non-null-count) pair must rewrite")
        val got = viaMv.collect().toSeq
        assert(got.exists(r => r.getLong(0) == 6L && r.isNullAt(1)),
          "an all-null group's avg must stay null through the MV path")
        // ...and per grouping set through the Expand path
        val roll = base.rollup(col("g")).agg(avg(col("m")).as("a"))
        assert(roll.queryExecution.executedPlan.toString.contains("avg_mv"),
          "avg must re-aggregate per grouping set through the Expand path")
        val gotRoll = roll.orderBy(col("g")).collect().toSeq
        // refusals: a raw DOUBLE avg (float addition would regroup), and
        // avg(DISTINCT) (not re-aggregable from sums)
        val dbl = base.groupBy(col("g")).agg(avg(col("dm")).as("a"))
        assert(!dbl.queryExecution.executedPlan.toString.contains("avg_mv"),
          "a raw double avg must refuse like a raw double sum")
        val dst = base.groupBy(col("g")).agg(expr("avg(DISTINCT m)").as("a"))
        assert(!dst.queryExecution.executedPlan.toString.contains("avg_mv"),
          "avg(DISTINCT) must refuse")
        MvCatalog.clear()
        // bit-equality: Row equality compares java BigDecimals — scale
        // AND value must match the base computation exactly
        assert(got == q(base).collect().toSeq && got.nonEmpty)
        assert(gotRoll ==
          base.rollup(col("g")).agg(avg(col("m")).as("a"))
            .orderBy(col("g")).collect().toSeq)
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("grouping by an EXPRESSION of grain columns rewrites; non-grain or nondeterministic refuses") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      def q(d: org.apache.spark.sql.DataFrame) = d
        .groupBy(concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("k"))
        .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
        .orderBy(col("k"))
      val viaMv = q(li)
      assert(viaMv.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "a derived grouping over grain columns must rebind onto the view")
      val got = viaMv.collect().toSeq
      // refusals: an expression over a NON-grain column; a nondeterministic
      // grouping; a global aggregate (empty-base edge: one row vs zero)
      val fine = li.groupBy(substring(col("l_shipdate").cast("string"), 1, 4).as("y"))
        .agg(sum(qtyCents).as("s"))
      assert(!fine.queryExecution.executedPlan.toString.contains("lineitem_mv"))
      val rnd = li.groupBy((col("l_returnflag") === "N" && rand() > 2).as("b"))
        .agg(sum(qtyCents).as("s"))
      assert(!rnd.queryExecution.executedPlan.toString.contains("lineitem_mv"))
      val global = li.agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
      assert(!global.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "a GLOBAL aggregate must refuse (empty base returns one row, empty MV zero)")
      MvCatalog.clear()
      assert(got == q(li).collect().toSeq && got.nonEmpty)
    }
  }

  test("count(DISTINCT grain column) rewrites; any other DISTINCT still refuses") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      def q(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_linestatus")).as("n_status"),
             count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
      val viaMv = q(li)
      assert(viaMv.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "the MV's rows ARE the distinct grain combinations")
      val got = viaMv.collect().toSeq
      // a distinct over a NON-grain column must keep refusing — the MV
      // collapsed those values (this doubles the pre-existing refusal law
      // now that one distinct shape is admissible)
      val other = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n"))
      assert(!other.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "count(DISTINCT non-grain) is not answerable from the view")
      MvCatalog.clear()
      assert(got == q(li).collect().toSeq && got.nonEmpty)
    }
  }

  test("a STREAM-MAINTAINED view answers avg exactly (IVM of per-measure counts)") {
    import org.apache.spark.sql.streaming.Trigger
    // the q92 composition extended to avg: per-measure NON-NULL counts
    // merge by the same associative algebra as sums (sum of partial
    // counts), so a view maintained micro-batch by micro-batch answers
    // avg bit-exactly — merged state ≡ one-shot regardless of slicing
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvavgstr_").toFile
    try {
      val basePath = new java.io.File(tmp, "avgbase.parquet").getAbsolutePath
      spark.range(1000).selectExpr(
        "id % 7 as g", "id % 3 as h",
        """CASE WHEN id % 5 = 0 THEN NULL
          |ELSE CAST(CAST(id * 7 + 1 AS DECIMAL(18,2)) / 3 AS DECIMAL(18,2))
          |END as m""".stripMargin)
        .repartition(4).write.parquet(basePath)
      val base = spark.read.parquet(basePath)
      val mvPath = new java.io.File(tmp, "avg_mv").getAbsolutePath
      val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
      val q = spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", "1").parquet(basePath)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          val partial = batch.toDF().groupBy(col("g"), col("h"))
            .agg(sum(col("m")).as("sum_m"), count(col("m")).as("cnt_m"),
                 count(lit(1)).as("cnt"))
          graft.operators.StateMerge.mergeOverwrite(
            batch.sparkSession, partial, mvPath, batchId)(
            _.groupBy(col("g"), col("h"))
              .agg(sum(col("sum_m")).as("sum_m"), sum(col("cnt_m")).as("cnt_m"),
                   sum(col("cnt")).as("cnt")))
        }
        .start()
      q.awaitTermination()
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "avgbase.parquet",
        groupCols = Set("g", "h"),
        sumMeasures = Nil,
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        avgMeasures = MvCatalog.measureExprs(base, col("m"))
          .map(_ -> ("sum_m", "cnt_m"))))
      try {
        def query(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("g"))
          .agg(avg(col("m")).as("a"), count(lit(1)).as("n"))
          .orderBy(col("g"))
        val viaMv = query(base)
        assert(viaMv.queryExecution.executedPlan.toString.contains("avg_mv"),
          "avg must be answered from the stream-maintained view")
        val got = viaMv.collect().toSeq
        MvCatalog.clear()
        assert(got == query(base).collect().toSeq && got.nonEmpty,
          "stream-maintained partials must reproduce the one-shot avg bit-exactly")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("arithmetic OVER aggregates rewrites node-by-node (CollapseProject'd outputs)") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      // post-agg arithmetic is folded INTO the Aggregate by CollapseProject
      // before the rule runs — the TPC-H Q1 shape: each nested aggregate
      // must be replaced from the partials under its exact type contract
      def q(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("l_returnflag"))
        .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          (col("s") / col("n")).as("mean_cents"),
          (col("n") * 2 + 1).as("n2"))
        .orderBy(col("l_returnflag"))
      val viaMv = q(li)
      assert(viaMv.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "aggregates nested in output arithmetic must still rewrite")
      val got = viaMv.collect().toSeq
      // ...and through the Expand path
      val roll = li.rollup(col("l_returnflag"))
        .agg((sum(qtyCents) + count(lit(1))).as("mix"))
      assert(roll.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "nested aggregates rewrite per grouping set too")
      val gotRoll = roll.orderBy(col("l_returnflag")).collect().toSeq
      MvCatalog.clear()
      assert(got == q(li).collect().toSeq && got.nonEmpty)
      assert(gotRoll == li.rollup(col("l_returnflag"))
        .agg((sum(qtyCents) + count(lit(1))).as("mix"))
        .orderBy(col("l_returnflag")).collect().toSeq)
    }
  }

  test("HAVING (filter above the aggregate) composes with the rewrite") {
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      def q(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("l_returnflag"))
        .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
        .filter(col("n") > 100) // HAVING — sits ABOVE the rewritten Aggregate
        .orderBy(col("l_returnflag"))
      val viaMv = q(li)
      assert(viaMv.queryExecution.executedPlan.toString.contains("lineitem_mv"),
        "a parent HAVING filter must not disturb the rewrite (output contract held)")
      val got = viaMv.collect().toSeq
      MvCatalog.clear()
      assert(got == q(li).collect().toSeq && got.nonEmpty)
    }
  }

  test("decimal sums re-aggregate with the precision cast back to the original type") {
    import org.apache.spark.sql.types.DecimalType
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvdec_").toFile
    try {
      val orders = Tables.t(spark, sf, "orders")
      val money = col("o_totalprice").cast(DecimalType(18, 2))
      val mvPath = new java.io.File(tmp, "orders_mv").getAbsolutePath
      orders.groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(sum(money).as("sum_price"), count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "orders.parquet",
        groupCols = Set("o_orderpriority", "o_orderstatus"),
        sumMeasures = MvCatalog.measureExprs(orders, money).map(_ -> "sum_price"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed))
      try {
        def q(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("o_orderpriority"))
          .agg(sum(money).as("s"), count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority"))
        val viaMv = q(orders)
        assert(viaMv.queryExecution.executedPlan.toString.contains("orders_mv"))
        // the re-aggregated sum widens decimal(28,2) → (38,2); the rewrite
        // must cast back so the reused exprId decodes under the ORIGINAL type
        assert(viaMv.schema("s").dataType == DecimalType(28, 2),
          s"output type must be the original, got ${viaMv.schema("s").dataType}")
        val got = q(orders).collect().toSeq
        MvCatalog.clear()
        assert(got == q(orders).collect().toSeq && got.nonEmpty,
          "decimal re-aggregation is exact — values identical to the base sum")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  /** The exhaustive soundness net, shared by every base kind: all SIX
    * aggregate kinds (sum, count(*), min, max, decimal avg,
    * count(DISTINCT grain column)) in all EIGHT query shapes (three flat
    * groupings, rollup, cube, grain-filtered, derived grouping,
    * derived-filtered) over `base`, each shape asserted plan-uses-the-MV
    * AND value-equal to the catalog-cleared base computation. `g1`/`g2`
    * are the view's grain columns; `ex1`/`exD` are real values the
    * filtered shapes exclude. */
  private def exhaustiveShapes(mvName: String, register: () => Unit,
                               base: => org.apache.spark.sql.DataFrame,
                               g1: String, g2: String,
                               ex1: String, exD: String,
                               priceDec: org.apache.spark.sql.Column): Unit = {
    val aggs = Seq(sum(qtyCents).as("s"), count(lit(1)).as("n"),
                   min(qtyCents).as("lo"), max(qtyCents).as("hi"),
                   avg(priceDec).as("ap"),
                   countDistinct(col(g2)).as("nd"))
    val derivedKey = concat(col(g1), lit("/"), col(g2))
    val shapes: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      s"groupBy($g1)" -> (d => d.groupBy(col(g1)).agg(aggs.head, aggs.tail: _*)),
      s"groupBy($g2)" -> (d => d.groupBy(col(g2)).agg(aggs.head, aggs.tail: _*)),
      "groupBy(both)" -> (d => d.groupBy(col(g1), col(g2)).agg(aggs.head, aggs.tail: _*)),
      "rollup" -> (d => d.rollup(col(g1), col(g2)).agg(aggs.head, aggs.tail: _*)),
      "cube" -> (d => d.cube(col(g1), col(g2)).agg(aggs.head, aggs.tail: _*)),
      "filtered groupBy" -> (d => d.filter(col(g1) =!= ex1)
        .groupBy(col(g2)).agg(aggs.head, aggs.tail: _*)),
      "groupBy(derived expr)" -> (d => d.groupBy(derivedKey.as("k")).agg(aggs.head, aggs.tail: _*)),
      "derived-filtered groupBy" -> (d => d.filter(derivedKey =!= exD)
        .groupBy(col(g2)).agg(aggs.head, aggs.tail: _*)))
    shapes.foreach { case (label, build) =>
      register()
      val viaMv = build(base)
      assert(viaMv.queryExecution.executedPlan.toString.contains(mvName),
        s"$mvName: $label must be answered from the MV")
      val sortCols = viaMv.columns.map(c => col(c).asc_nulls_first).toIndexedSeq
      val got = viaMv.orderBy(sortCols: _*).collect().toSeq
      MvCatalog.clear()
      val want = build(base).orderBy(sortCols: _*).collect().toSeq
      assert(got == want && got.nonEmpty, s"$mvName: $label must equal base answer")
    }
  }

  test("exhaustive grain × shape equivalence: every grouping shape over the grain matches base") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvexh_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val priceDec = graft.Tables.dec2(col("l_extendedprice"))
      val mvPath = new java.io.File(tmp, "lineitem_mv_full").getAbsolutePath
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"),
             min(qtyCents).as("min_c"), max(qtyCents).as("max_c"),
             sum(priceDec).as("sum_p"), count(priceDec).as("cnt_p"))
        .write.parquet(mvPath)
      def registerFull(): Unit = MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag", "l_linestatus"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        minMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "min_c"),
        maxMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "max_c"),
        avgMeasures = MvCatalog.measureExprs(li, priceDec).map(_ -> ("sum_p", "cnt_p"))))
      exhaustiveShapes("lineitem_mv_full", () => registerFull(), li,
        "l_returnflag", "l_linestatus", "N", "N/O", priceDec)
    } finally { MvCatalog.clear(); graft.util.Fs.deleteTree(tmp) }
  }

  test("exhaustive grain × shape equivalence holds over JOIN and FILTERED views too") {
    val li = Tables.t(spark, sf, "lineitem")
    val ord = Tables.t(spark, sf, "orders")
    val priceDec = graft.Tables.dec2(col("l_extendedprice"))
    // the join view: same six kinds, grain spanning both sides
    val tmpJ = java.nio.file.Files.createTempDirectory("graft_mvexhj_").toFile
    try {
      val mvPath = new java.io.File(tmpJ, "join_mv_full").getAbsolutePath
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      joined.groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"),
             min(qtyCents).as("min_c"), max(qtyCents).as("max_c"),
             sum(priceDec).as("sum_p"), count(priceDec).as("cnt_p"))
        .write.parquet(mvPath)
      def registerJ(): Unit = MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("o_orderpriority", "l_returnflag"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        minMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "min_c"),
        maxMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "max_c"),
        avgMeasures = MvCatalog.measureExprs(li, priceDec).map(_ -> ("sum_p", "cnt_p")),
        baseJoin = Some(MvCatalog.JoinSpec(
          Seq("lineitem.parquet", "orders.parquet"),
          Seq("l_orderkey" -> "o_orderkey")))))
      exhaustiveShapes("join_mv_full", () => registerJ(), joined,
        "o_orderpriority", "l_returnflag", "1-URGENT", "1-URGENT/N", priceDec)
    } finally { MvCatalog.clear(); graft.util.Fs.deleteTree(tmpJ) }
    // the union view: per-position alignment must survive the pushdown
    // of derived-grouping projections and grain filters into each child
    val tmpU = java.nio.file.Files.createTempDirectory("graft_mvexhu_").toFile
    try {
      val coldPath = new java.io.File(tmpU, "li_cold.parquet").getAbsolutePath
      val hotPath = new java.io.File(tmpU, "li_hot.parquet").getAbsolutePath
      val mvPath = new java.io.File(tmpU, "union_mv_full").getAbsolutePath
      graft.queries.Extended.splitHotCold(spark, sf, coldPath, hotPath)
      val cold = spark.read.parquet(coldPath)
      val hot = spark.read.parquet(hotPath)
      cold.union(hot).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"),
             min(qtyCents).as("min_c"), max(qtyCents).as("max_c"),
             sum(priceDec).as("sum_p"), count(priceDec).as("cnt_p"))
        .write.parquet(mvPath)
      def registerU(): Unit = MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "li_cold.parquet",
        groupCols = Set("l_returnflag", "l_linestatus"),
        sumMeasures = MvCatalog.measureExprs(cold, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        minMeasures = MvCatalog.measureExprs(cold, qtyCents).map(_ -> "min_c"),
        maxMeasures = MvCatalog.measureExprs(cold, qtyCents).map(_ -> "max_c"),
        avgMeasures = MvCatalog.measureExprs(cold, priceDec).map(_ -> ("sum_p", "cnt_p")),
        baseUnion = Some(Seq("li_cold.parquet", "li_hot.parquet"))))
      exhaustiveShapes("union_mv_full", () => registerU(), hot.union(cold),
        "l_returnflag", "l_linestatus", "N", "N/O", priceDec)
    } finally { MvCatalog.clear(); graft.util.Fs.deleteTree(tmpU) }
    // the filtered view: the baked-in conjunct rides along in every shape
    val tmpF = java.nio.file.Files.createTempDirectory("graft_mvexhf_").toFile
    try {
      val disc = col("l_discount") <= lit(0.04)
      val mvPath = new java.io.File(tmpF, "disc_mv_full").getAbsolutePath
      li.filter(disc).groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"),
             min(qtyCents).as("min_c"), max(qtyCents).as("max_c"),
             sum(priceDec).as("sum_p"), count(priceDec).as("cnt_p"))
        .write.parquet(mvPath)
      def registerF(): Unit = MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag", "l_linestatus"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        minMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "min_c"),
        maxMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "max_c"),
        avgMeasures = MvCatalog.measureExprs(li, priceDec).map(_ -> ("sum_p", "cnt_p")),
        viewFilters = Seq(MvCatalog.measureExprs(li, disc))))
      exhaustiveShapes("disc_mv_full", () => registerF(), li.filter(disc),
        "l_returnflag", "l_linestatus", "N", "N/O", priceDec)
    } finally { MvCatalog.clear(); graft.util.Fs.deleteTree(tmpF) }
  }

  test("empty registry is a strict no-op") {
    val plan = Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem_mv"))
  }

  // ---- join views ----------------------------------------------------------

  private def withJoinMv(f: => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvspec_").toFile
    try {
      val mvPath = new java.io.File(tmp, "lineitem_orders_mv").getAbsolutePath
      graft.queries.Extended.buildJoinMv(spark, sf, mvPath)
      graft.queries.Extended.registerJoinMv(spark, sf, mvPath)
      try f finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("join view answers the join aggregate, either side order, value-equal to base") {
    withJoinMv {
      val li = Tables.t(spark, sf, "lineitem")
      val ord = Tables.t(spark, sf, "orders")
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("l_returnflag"))
          .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
      val asRegistered = agg(li.join(ord, col("l_orderkey") === col("o_orderkey")))
      assert(asRegistered.queryExecution.executedPlan.toString
        .contains("lineitem_orders_mv"))
      // sides swapped AND the equality commuted: the key-pair match is
      // unordered on both axes
      val swapped = agg(ord.join(li, col("o_orderkey") === col("l_orderkey")))
      assert(swapped.queryExecution.executedPlan.toString
        .contains("lineitem_orders_mv"))
      val got = asRegistered.orderBy(col("l_returnflag")).collect().toSeq
      assert(got == swapped.orderBy(col("l_returnflag")).collect().toSeq)
      MvCatalog.clear()
      val want = agg(li.join(ord, col("l_orderkey") === col("o_orderkey")))
        .orderBy(col("l_returnflag")).collect().toSeq
      assert(got == want && got.nonEmpty)
    }
  }

  test("join view refuses: wrong keys, extra keys, non-inner, non-grain filter") {
    withJoinMv {
      val li = Tables.t(spark, sf, "lineitem")
      val ord = Tables.t(spark, sf, "orders")
      def planOf(df: org.apache.spark.sql.DataFrame): String =
        df.groupBy(col("l_returnflag"))
          .agg(sum(qtyCents).as("s")).queryExecution.executedPlan.toString
      // a DIFFERENT join key is a different relation
      assert(!planOf(li.join(ord, col("l_orderkey") === col("o_custkey")))
        .contains("lineitem_orders_mv"), "wrong key must refuse")
      // an EXTRA equi conjunct restricts the relation further
      assert(!planOf(li.join(ord, col("l_orderkey") === col("o_orderkey") &&
          col("l_suppkey") === col("o_custkey")))
        .contains("lineitem_orders_mv"), "extra key must refuse")
      // outer joins keep unmatched rows the inner-join view never stored
      assert(!planOf(li.join(ord, col("l_orderkey") === col("o_orderkey"),
          "left_outer"))
        .contains("lineitem_orders_mv"), "outer join must refuse")
      // a filter on a non-grain column of either side selects within
      // collapsed groups
      assert(!planOf(li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_totalprice") > 1000.0))
        .contains("lineitem_orders_mv"), "non-grain filter must refuse")
      // a grain filter (on the orders-side grain column) replays
      assert(planOf(li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .filter(col("o_orderpriority") === "1-URGENT"))
        .contains("lineitem_orders_mv"), "grain filter must replay")
    }
  }

  test("a join view never answers a single-table query over either base") {
    withJoinMv {
      // the view's rows are join-filtered AND join-duplicated: a plain
      // lineitem aggregate would double-count multi-line orders' partials
      // and drop never-ordered rows — the matcher must gate on the shape
      val plan = Tables.t(spark, sf, "lineitem")
        .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("lineitem_orders_mv"))
    }
  }

  // ---- filtered views -------------------------------------------------------

  private def withDiscMv(f: => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvspec_").toFile
    try {
      val mvPath = new java.io.File(tmp, "lineitem_mv_disc").getAbsolutePath
      graft.queries.Extended.buildDiscountMv(spark, sf, mvPath)
      graft.queries.Extended.registerDiscountMv(spark, sf, mvPath)
      try f finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("filtered view: the baked-in conjunct is absorbed, missing or altered refuses") {
    withDiscMv {
      val li = Tables.t(spark, sf, "lineitem")
      def agg(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("l_linestatus"))
          .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
      // exactly the baked-in predicate: absorbed, answered from the view
      val exact = agg(li.filter(col("l_discount") <= lit(0.04)))
      assert(exact.queryExecution.executedPlan.toString.contains("lineitem_mv_disc"))
      val got = exact.orderBy(col("l_linestatus")).collect().toSeq
      // WITHOUT the conjunct the query needs rows the view never stored
      assert(!agg(li).queryExecution.executedPlan.toString
        .contains("lineitem_mv_disc"), "unfiltered query must refuse")
      // a DIFFERENT literal is a different row set (even a WIDER one)
      assert(!agg(li.filter(col("l_discount") <= lit(0.05)))
        .queryExecution.executedPlan.toString
        .contains("lineitem_mv_disc"), "altered literal must refuse")
      // a STRICTER extra non-grain conjunct selects within groups
      assert(!agg(li.filter(col("l_discount") <= lit(0.04) &&
          col("l_quantity") > 10))
        .queryExecution.executedPlan.toString
        .contains("lineitem_mv_disc"), "extra non-grain conjunct must refuse")
      MvCatalog.clear()
      val want = agg(li.filter(col("l_discount") <= lit(0.04)))
        .orderBy(col("l_linestatus")).collect().toSeq
      assert(got == want && got.nonEmpty)
    }
  }

  test("min/avg measures re-aggregate from a JOIN view, from either side's columns") {
    // rewriteAggExpr is shared by every def kind, so the full measure
    // family must work over a join base too — pinned, not assumed; the
    // two min measures come from OPPOSITE sides of the join
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvjoinstats_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val ord = Tables.t(spark, sf, "orders")
      val priceDec = col("l_extendedprice").cast("decimal(18,2)")
      val mvPath = new java.io.File(tmp, "join_mv_stats").getAbsolutePath
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
             min(col("l_quantity")).as("min_qty"),
             min(col("o_totalprice")).as("min_total"),
             sum(priceDec).as("sum_price"), count(priceDec).as("cnt_price"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("o_orderpriority", "l_returnflag"),
        sumMeasures = Nil,
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        minMeasures =
          MvCatalog.measureExprs(li, col("l_quantity")).map(_ -> "min_qty") ++
          MvCatalog.measureExprs(ord, col("o_totalprice")).map(_ -> "min_total"),
        avgMeasures = MvCatalog.measureExprs(li, priceDec)
          .map(_ -> ("sum_price", "cnt_price")),
        baseJoin = Some(MvCatalog.JoinSpec(
          Seq("lineitem.parquet", "orders.parquet"),
          Seq("l_orderkey" -> "o_orderkey")))))
      try {
        def q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(min(col("l_quantity")).as("lo_qty"),
               min(col("o_totalprice")).as("lo_total"),
               avg(priceDec).as("avg_price"), count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
        val viaMv = q
        assert(viaMv.queryExecution.executedPlan.toString.contains("join_mv_stats"))
        val got = viaMv.collect().toSeq
        MvCatalog.clear()
        assert(got == q.collect().toSeq && got.nonEmpty)
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("an aggregate inside an IN-subquery is answered from the MV") {
    // OptimizeSubqueries re-runs the full optimizer (injected rules
    // included) on subquery plans, and RewritePredicateSubquery turns
    // the IN into a semi-join whose right side IS the aggregate — either
    // way the rewrite must reach it; pinned, not assumed
    withMv { _ =>
      val li = Tables.t(spark, sf, "lineitem")
      li.createOrReplaceTempView("li_mvsub")
      try {
        def q = spark.sql(
          """SELECT l_returnflag, count(*) AS n FROM li_mvsub
            |WHERE l_returnflag IN (
            |  SELECT l_returnflag FROM li_mvsub
            |  GROUP BY l_returnflag
            |  HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 1000)
            |GROUP BY l_returnflag""".stripMargin)
        assert(q.queryExecution.executedPlan.toString.contains("lineitem_mv"),
          "the subquery's grain aggregate must be answered from the MV")
        val got = q.orderBy(col("l_returnflag")).collect().toSeq
        MvCatalog.clear()
        assert(got == q.orderBy(col("l_returnflag")).collect().toSeq && got.nonEmpty)
      } finally spark.catalog.dropTempView("li_mvsub")
    }
  }

  test("a 3-relation star view refuses subset and superset joins") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvstar_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val ord = Tables.t(spark, sf, "orders")
      val cust = Tables.t(spark, sf, "customer")
      val supp = Tables.t(spark, sf, "supplier")
      val mvPath = new java.io.File(tmp, "star_mv").getAbsolutePath
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderpriority"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("c_mktsegment", "o_orderpriority"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        baseJoin = Some(MvCatalog.JoinSpec(
          Seq("lineitem.parquet", "orders.parquet", "customer.parquet"),
          Seq("l_orderkey" -> "o_orderkey", "o_custkey" -> "c_custkey")))))
      try {
        def planOf(df: org.apache.spark.sql.DataFrame): String =
          df.groupBy(col("o_orderpriority")).agg(sum(qtyCents).as("s"))
            .queryExecution.executedPlan.toString
        // a 2-relation SUBSET of the star is a different relation (the
        // customer inner join drops orders with no customer row)
        assert(!planOf(li.join(ord, col("l_orderkey") === col("o_orderkey")))
          .contains("star_mv"), "subset join must refuse")
        // a SUPERSET (4th table) restricts/duplicates further
        assert(!planOf(li.join(ord, col("l_orderkey") === col("o_orderkey"))
            .join(cust, col("o_custkey") === col("c_custkey"))
            .join(supp, col("l_suppkey") === col("s_suppkey")))
          .contains("star_mv"), "superset join must refuse")
        // the registered set in ANY bracketing rewrites
        assert(planOf(ord.join(cust, col("o_custkey") === col("c_custkey"))
            .join(li, col("l_orderkey") === col("o_orderkey")))
          .contains("star_mv"), "re-bracketed star must match")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("a union view refuses subset, multiset-mismatch, and asymmetric-filter unions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvunion_").toFile
    try {
      val coldPath = new java.io.File(tmp, "li_cold.parquet").getAbsolutePath
      val hotPath = new java.io.File(tmp, "li_hot.parquet").getAbsolutePath
      val mvPath = new java.io.File(tmp, "union_mv").getAbsolutePath
      // the production fixture/registration path q111 also uses
      graft.queries.Extended.splitHotCold(spark, sf, coldPath, hotPath)
      graft.queries.Extended.buildUnionMv(spark, coldPath, hotPath, mvPath)
      graft.queries.Extended.registerUnionMv(spark, sf, mvPath)
      val cold = spark.read.parquet(coldPath)
      val hot = spark.read.parquet(hotPath)
      try {
        def planOf(df: org.apache.spark.sql.DataFrame): String =
          df.groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
            .queryExecution.executedPlan.toString
        // one child alone is a sub-relation the view over-counts
        assert(!planOf(hot).contains("union_mv"), "single child must refuse")
        // the same table twice is a DIFFERENT multiset (rows doubled)
        assert(!planOf(cold.union(cold)).contains("union_mv"),
          "multiset mismatch must refuse")
        // a third copy is a superset multiset
        assert(!planOf(cold.union(hot).union(hot)).contains("union_mv"),
          "superset multiset must refuse")
        // an ASYMMETRIC child filter selects a different sub-relation —
        // it cannot be commuted out of the union (non-grain, so it also
        // can't replay); must refuse
        assert(!planOf(cold.filter(col("l_quantity") > 10).union(hot))
          .contains("union_mv"), "asymmetric child filter must refuse")
        // the SAME filter on both children commutes out and replays/
        // refuses as one pooled conjunct: grain filter rewrites
        assert(planOf(cold.filter(col("l_returnflag") === "R")
            .union(hot.filter(col("l_returnflag") === "R")))
          .contains("union_mv"), "symmetric grain filter must replay")
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("HLL sketch measures: estimate of union-of-partials equals estimate-from-base exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvsk_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val mvPath = new java.io.File(tmp, "lineitem_mv_sk").getAbsolutePath
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(expr("hll_sketch_agg(l_partkey, 12)").as("sk_part"),
             count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_returnflag", "l_linestatus"),
        sumMeasures = Nil,
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        sketchMeasures = MvCatalog.measureExprs(li, col("l_partkey"))
          .map(_ -> ("sk_part", 12))))
      try {
        def q = li.groupBy(col("l_returnflag"))
          .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))").as("est"),
               count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"))
        val viaMv = q
        assert(viaMv.queryExecution.executedPlan.toString.contains("lineitem_mv_sk"),
          "the estimate-wrapped sketch aggregate must be answered from the MV")
        val got = viaMv.collect().toSeq
        // refusals: raw sketch BYTES are not build-vs-merge stable; a
        // different lgK has different register arrays; an unregistered
        // child has no stored partials
        def planOf(c: org.apache.spark.sql.Column): String =
          li.groupBy(col("l_returnflag")).agg(c.as("x"))
            .queryExecution.executedPlan.toString
        assert(!planOf(expr("hll_sketch_agg(l_partkey, 12)"))
          .contains("lineitem_mv_sk"), "raw sketch output must refuse")
        assert(!planOf(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 13))"))
          .contains("lineitem_mv_sk"), "mismatched lgK must refuse")
        assert(!planOf(expr("hll_sketch_estimate(hll_sketch_agg(l_suppkey, 12))"))
          .contains("lineitem_mv_sk"), "unregistered measure must refuse")
        MvCatalog.clear()
        // EXACT equality: the union of per-group sketches max-merges to
        // the one-shot build's registers, so the estimates are identical
        assert(got == q.collect().toSeq && got.nonEmpty)
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("a FILTERED JOIN view composes: baked non-grain conjunct absorbed over the join base") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mvjf_").toFile
    try {
      val li = Tables.t(spark, sf, "lineitem")
      val ord = Tables.t(spark, sf, "orders")
      val bigOrder = col("o_totalprice") > lit(1000.0)
      val mvPath = new java.io.File(tmp, "join_mv_big").getAbsolutePath
      li.join(ord, col("l_orderkey") === col("o_orderkey")).filter(bigOrder)
        .groupBy(col("o_orderpriority"), col("l_returnflag"))
        .agg(sum(qtyCents).as("sum_qty_cents"), count(lit(1)).as("cnt"))
        .write.parquet(mvPath)
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("o_orderpriority", "l_returnflag"),
        sumMeasures = MvCatalog.measureExprs(li, qtyCents).map(_ -> "sum_qty_cents"),
        countCol = "cnt",
        mv = spark.read.parquet(mvPath).queryExecution.analyzed,
        baseJoin = Some(MvCatalog.JoinSpec(
          Seq("lineitem.parquet", "orders.parquet"),
          Seq("l_orderkey" -> "o_orderkey"))),
        viewFilters = Seq(MvCatalog.measureExprs(ord, bigOrder))))
      try {
        def agg(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("l_returnflag"))
            .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
        val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        // baked conjunct repeated (pushed into the orders side by the
        // optimizer — the pool reunites it): absorbed, answered from
        // the view
        val viaMv = agg(joined.filter(bigOrder))
        assert(viaMv.queryExecution.executedPlan.toString.contains("join_mv_big"))
        val got = viaMv.orderBy(col("l_returnflag")).collect().toSeq
        // without the conjunct the view is missing rows
        assert(!agg(joined).queryExecution.executedPlan.toString
          .contains("join_mv_big"), "unfiltered join query must refuse")
        MvCatalog.clear()
        assert(got == agg(joined.filter(bigOrder))
          .orderBy(col("l_returnflag")).collect().toSeq && got.nonEmpty)
      } finally MvCatalog.clear()
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("ROLLUP composes over join and filtered views (shared Expand path)") {
    // the Expand path and the flat path share matchBase/admitFilters, so
    // grouping sets over the new view kinds must come for free — pinned
    // here rather than assumed
    withJoinMv {
      val li = Tables.t(spark, sf, "lineitem")
      val ord = Tables.t(spark, sf, "orders")
      def roll = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .rollup(col("o_orderpriority"), col("l_returnflag"))
        .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
      val plan = roll.queryExecution.executedPlan.toString
      assert(plan.contains("lineitem_orders_mv") && plan.contains("Expand"))
      val got = roll.orderBy(col("o_orderpriority"), col("l_returnflag"))
        .collect().toSeq
      MvCatalog.clear()
      assert(got == roll.orderBy(col("o_orderpriority"), col("l_returnflag"))
        .collect().toSeq && got.nonEmpty)
    }
    withDiscMv {
      val li = Tables.t(spark, sf, "lineitem")
      def roll = li.filter(col("l_discount") <= lit(0.04))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(qtyCents).as("s"), count(lit(1)).as("n"))
      val plan = roll.queryExecution.executedPlan.toString
      assert(plan.contains("lineitem_mv_disc") && plan.contains("Expand"))
      val got = roll.orderBy(col("l_returnflag"), col("l_linestatus"))
        .collect().toSeq
      MvCatalog.clear()
      assert(got == roll.orderBy(col("l_returnflag"), col("l_linestatus"))
        .collect().toSeq && got.nonEmpty)
    }
  }
}
