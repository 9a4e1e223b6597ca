package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting

class SaltingSpec extends AnyFunSuite {
  import TestSpark._

  test("salted aggregation is exact: equals the direct aggregation") {
    val li = Tables.t(spark, sf, "lineitem")
    val salted = Salting.saltedSumCount(li, col("l_returnflag"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val direct = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == direct)
  }

  test("salted plan shape: first exchange keyed by (key, salt), second by key alone") {
    val plan = Salting.saltedSumCount(
        Tables.t(spark, sf, "events"), col("event_type"), col("value"))
      .queryExecution.executedPlan.toString
    val exchanges = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(exchanges.exists(e => e.contains("salt") && e.contains("key")),
      s"expected a (key, salt) exchange spreading hot keys:\n$plan")
    assert(exchanges.exists(e => e.contains("key") && !e.contains("salt")),
      s"expected the final merge exchange on key alone:\n$plan")
  }

  test("scored q72 engages the skew split at suite scale and equals the plain join-agg") {
    val got = graft.queries.Extended.q72SkewJoin(spark, sf) // require inside = the gate
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val li = Tables.t(spark, sf, "lineitem").select(
      when(pmod(col("l_orderkey"), lit(2)) === 0, lit(1L))
        .otherwise(col("l_suppkey").cast("long")).as("skew_key"),
      col("l_extendedprice"))
    val want = li.join(Tables.t(spark, sf, "supplier")
        .select(col("s_suppkey").cast("long").as("skew_key"),
          col("s_nationkey").cast("long").as("nation")), Seq("skew_key"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("nation"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("join skew: AQE's skew-join split engages on a hot key (the documented join-side defense)") {
    // Salting.scala deliberately does NOT salt joins: AQE's OptimizeSkewedJoin
    // handles skewed sort-merge joins at runtime. Prove that here — one hot
    // key carrying ~99% of the fact side, thresholds scaled to suite size.
    import spark.implicits._
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val fact = (1 to 60000).map(i => (if (i % 100 == 0) i.toLong else 1L, i.toLong))
        .toDF("k", "v")
      val dim = (1L to 60000L by 100).map(k => (k, s"d$k")).toDF("k", "name")
      val joined = fact.join(dim, Seq("k"))
      // execute THIS frame (not a derived count) so AQE re-plans it; the
      // final adaptive plan is only visible after execution
      // 59,400 hot-key rows match dim key 1; the sparse keys (multiples of
      // 100) miss dim's 1-mod-100 key set
      assert(joined.collect().length === 59400)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to split the hot partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
