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

  test("q16 sessionization: session count bounded by event count") {
    val rows = EventTime.q16Sessionize(spark, sf).collect()
    rows.foreach { r =>
      val s = r.getAs[Long]("n_sessions"); val e = r.getAs[Long]("n_events")
      assert(s >= 1 && s <= e)
    }
  }
}
