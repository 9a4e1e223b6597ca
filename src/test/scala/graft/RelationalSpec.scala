package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EventTime, Relational}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("q5 agg: six flag/status groups, counts sum to table size") {
    val rows = Relational.q5HashAgg(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 9)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total == Tables.t(spark, sf, "lineitem").count())
  }

  test("q9 window: at most 3 rows per customer, ranks are 1..k") {
    val rows = Relational.q9WindowTopK(spark, sf).collect()
    val byCust = rows.groupBy(_.getAs[Long]("o_custkey"))
    assert(byCust.values.forall(_.length <= 3))
    byCust.values.foreach { g =>
      assert(g.map(_.getAs[Long]("rn")).sorted.toSeq == (1L to g.length))
      // prices non-increasing in rank
      val prices = g.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q13 set ops: result disjoint from negative-balance customers") {
    val res = Relational.q13SetOps(spark, sf).collect().map(_.getLong(0)).toSet
    val neg = Tables.t(spark, sf, "customer")
      .filter(col("c_acctbal") < 0).select(col("c_custkey"))
      .collect().map(_.getLong(0)).toSet
    assert(res.intersect(neg).isEmpty)
  }

  test("q11: approximate distinct within declared 5% bound") {
    val r = Relational.q11DistinctHll(spark, sf).collect().head
    assert(r.getAs[Boolean]("approx_ok"))
  }

  test("q85 quality audit: six constraints from one aggregation pass, no join") {
    val df = Relational.q85QualityAudit(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"audit must not join — one scan, one agg:\n$plan")
    val rows = df.collect()
    assert(rows.length == 6)
    val byName = rows.map(r => r.getAs[String]("check_name") ->
      ((r.getAs[Long]("metric"), r.getAs[Boolean]("pass")))).toMap
    assert(byName("row_count")._1 == Tables.t(spark, sf, "orders").count())
    assert(byName.values.forall(_._2), "synthetic orders must satisfy every constraint")
    // violation metrics are counts of offending rows — zero on clean data
    Seq("custkey_complete", "orderkey_unique", "status_domain",
      "price_positive", "orderdate_complete")
      .foreach(k => assert(byName(k)._1 == 0L))
  }

  test("q87 column profile: one aggregation pass, stats agree with direct queries") {
    val df = Relational.q87ColumnProfile(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"profile must be one pass, no join:\n$plan")
    val rows = df.collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val orders = Tables.t(spark, sf, "orders")
    assert(rows("o_orderkey").getAs[Long]("ndv") == orders.count(),
      "orderkey is the unique key — ndv must equal row count")
    assert(rows("o_orderstatus").getAs[Long]("ndv") ==
      orders.select("o_orderstatus").distinct().count())
    assert(rows.values.forall(_.getAs[Long]("n_nulls") == 0L))
    assert(rows("o_orderpriority").getAs[String]("min_str") <=
      rows("o_orderpriority").getAs[String]("max_str"))
  }

  test("q16 sessionization: session count bounded by event count") {
    val rows = EventTime.q16Sessionize(spark, sf).collect()
    rows.foreach { r =>
      val s = r.getAs[Long]("n_sessions"); val e = r.getAs[Long]("n_events")
      assert(s >= 1 && s <= e)
    }
  }
}
