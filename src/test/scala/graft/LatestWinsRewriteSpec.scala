package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the [[graft.plans.LatestWinsRewrite]] optimizer rule. */
class LatestWinsRewriteSpec extends AnyFunSuite {
  import TestSpark._

  private def changes: DataFrame =
    Tables.t(spark, sf, "events").selectExpr(
      "user_id", "event_type", "unix_micros(ts) as ts_us", "event_id",
      "cast(round(value * 100) as bigint) as cents")

  private def windowForm: DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("cents"))
  }

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("rn=1 over a DESC window becomes a max_by aggregate (no Window, no sort)") {
    val plan = optimized(windowForm)
    assert(!plan.contains("Window"), s"window must be rewritten away:\n$plan")
    assert(plan.contains("max_by"), s"rewrite must produce max_by:\n$plan")
  }

  test("the rewrite is answer-preserving (law: rule on == rule off)") {
    val conf = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(conf)
    val got = windowForm.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    try {
      spark.conf.set(conf, "graft.plans.LatestWinsRewrite")
      val off = windowForm
      assert(optimized(off).contains("Window"), "exclusion must disable the rule")
      val want = off.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want && want.nonEmpty)
    } finally {
      prev.fold(spark.conf.unset(conf))(spark.conf.set(conf, _))
    }
  }

  test("ASC ordering takes the min_by path, same law") {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val first = changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("cents"))
    val plan = optimized(first)
    assert(!plan.contains("Window") && plan.contains("min_by"), plan)
    // earliest change per user, independently derived
    val want = changes.collect().map(r => (r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .groupBy(_._1).map { case (u, rs) =>
        val m = rs.minBy(r => (r._2, r._3)); (u, m._4)
      }.toSet
    assert(first.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)
  }

  test("rn=1 AND a payload predicate rewrites with the residual replayed above") {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    // a payload predicate can't push below the window (it would change
    // WHICH row is top-1 only if pushed — above, it filters the winners),
    // so the filter arrives as one conjunction; the rule must split it
    def q(d: DataFrame) = d.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("cents") > 0)
      .select(col("user_id"), col("event_type"), col("cents"))
    val plan = optimized(q(changes))
    assert(!plan.contains("Window") && plan.contains("max_by"),
      s"the conjunctive top-1 shape must rewrite:\n$plan")
    val got = q(changes).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val conf = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(conf)
    try {
      spark.conf.set(conf, "graft.plans.LatestWinsRewrite")
      val want = q(changes).collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want && want.nonEmpty,
        "residual-filter rewrite must preserve the window form's answer")
    } finally prev.fold(spark.conf.unset(conf))(spark.conf.set(conf, _))
    // the rn<2 spelling maps too
    val lt = changes.withColumn("rn", row_number().over(w)).filter(col("rn") < 2)
    assert(!optimized(lt).contains("Window") && optimized(lt).contains("max_by"))
    // but a second conjunct that READS rn must refuse. (The top-1 side
    // must be the rn<2 spelling here: with rn=1, ConstantPropagation
    // substitutes rn→1 into the other conjunct and folds it away before
    // this rule ever runs — correctly leaving a plain top-1.)
    val readsRn = changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") < 2 && col("rn") + col("cents") > lit(0))
    assert(optimized(readsRn).contains("Window"),
      "a residual conjunct referencing rn must keep the window")
  }

  test("shapes the rule must NOT touch keep their window") {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    // top-2 is not top-1
    val topk = changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    assert(optimized(topk).contains("Window"))
    // mixed sort directions don't map onto one struct ordering
    val mixed = changes.withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").desc, col("event_id"))))
      .filter(col("rn") === 1)
    assert(optimized(mixed).contains("Window"))
    // rank() has different tie semantics than row_number()
    val rk = changes.withColumn("rn", rank().over(w)).filter(col("rn") === 1)
    assert(optimized(rk).contains("Window"))
    // a global (unpartitioned) top-1 must not become a 1-row-on-empty agg
    val global = changes.filter(col("user_id") < 0) // empty input
      .withColumn("rn", row_number().over(
        Window.orderBy(col("ts_us").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
    assert(global.count() == 0, "empty input must stay empty")
  }
}
