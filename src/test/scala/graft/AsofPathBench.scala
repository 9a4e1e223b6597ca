package graft

import org.apache.spark.sql.DataFrame

import graft.plans.AsofJoin
import graft.queries.Extended

/** Micro-benchmark for the three as-of spellings (run via
  * `sbt "Test/runMain graft.AsofPathBench [sfDir]"`): the join-aggregate
  * form (q19), the tagged-union window merge (q67), and the custom
  * physical merge exec (AsofJoin.asof). All three answers are asserted
  * key-equal first; warmup + min of two timed passes per form, mirroring
  * Bench. The exec's edge is structural — no union materialization, no
  * window buffer, one candidate row of state per key — so the gap widens
  * with per-key volume. */
object AsofPathBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session()

    def eventsDf = Tables.t(spark, sfDir, "events")
      .selectExpr("user_id", "unix_micros(ts) as ts_us", "event_id")
    def ordersDf = Tables.t(spark, sfDir, "orders")
      .selectExpr("o_custkey as user_id",
        "unix_micros(cast(o_orderdate as timestamp)) as ts_us", "o_orderkey")

    def joinAgg() = Extended.q19AsofJoin(spark, sfDir)
    def windowMerge() = Extended.q67AsofMerge(spark, sfDir)
    def exec() = AsofJoin.asof(eventsDf, ordersDf)

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime(); f().count(); (System.nanoTime() - t0) / 1e9
    }
    // answer equality on (event_id, asof_orderkey) — also the warmup
    def keysOf(df: DataFrame, k: String): Set[(Long, Long)] =
      df.selectExpr("event_id", k).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val a = keysOf(joinAgg(), "asof_orderkey")
    val b = keysOf(windowMerge(), "asof_orderkey")
    val c = keysOf(exec(), "o_orderkey")
    assert(a == b && b == c, s"as-of forms disagree: ${a.size}/${b.size}/${c.size}")
    val tJoin = math.min(time(joinAgg _), time(joinAgg _))
    val tWin  = math.min(time(windowMerge _), time(windowMerge _))
    val tExec = math.min(time(exec _), time(exec _))
    println(f"""{"join_agg_sec":$tJoin%.3f,"window_merge_sec":$tWin%.3f,"custom_exec_sec":$tExec%.3f,"rows":${a.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
