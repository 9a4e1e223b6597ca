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
      // value check for the replayed filter
      MvCatalog.clear()
      val direct = li.filter(col("l_returnflag") === "R")
        .groupBy(col("l_linestatus")).agg(sum(qtyCents).as("s"))
      assert(onGrain.orderBy(col("l_linestatus")).collect().toSeq ==
        direct.orderBy(col("l_linestatus")).collect().toSeq)
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
      val qe = li.select(qtyCents.as("m")).queryExecution
      val sqls = Seq(qe.analyzed, qe.optimizedPlan).collect {
        case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
          p.projectList.head.asInstanceOf[
            org.apache.spark.sql.catalyst.expressions.Alias].child.sql
            .replace("`", "").toLowerCase(java.util.Locale.ROOT)
      }.distinct
      MvCatalog.register(MvCatalog.MvDef(
        basePathSuffix = "lineitem.parquet",
        groupCols = Set("l_linestatus"),
        sumMeasures = sqls.map(_ -> "sum_qty_cents").toMap,
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

  test("empty registry is a strict no-op") {
    val plan = Tables.t(spark, sf, "lineitem")
      .groupBy(col("l_returnflag")).agg(sum(qtyCents).as("s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("lineitem_mv"))
  }
}
