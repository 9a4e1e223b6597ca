package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.QueryMetrics

class QueryMetricsSpec extends AnyFunSuite {
  import TestSpark._

  test("listener captures scan rows and shuffle bytes of an aggregation query") {
    val m = QueryMetrics.register(spark)
    try {
      Tables.t(spark, sf, "orders")
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect()
      val stats = m.awaitQueries(1)
      assert(stats.nonEmpty, "listener recorded no queries")
      val s = stats.head
      assert(s.metric("numOutputRows") > 0, s"expected scan rows, got: ${s.metrics}")
      assert(s.metric("shuffleBytesWritten") > 0,
        s"a groupBy must shuffle, got: ${s.metrics}")
      assert(s.logLine.contains("numOutputRows="))
    } finally spark.listenerManager.unregister(m)
  }

  test("metrics are plan-sized, never data: no row content is retained") {
    val m = QueryMetrics.register(spark)
    try {
      Tables.t(spark, sf, "orders").limit(5).collect()
      val stats = m.awaitQueries(1)
      // every captured value is a Long counter; the record holds no Rows
      assert(stats.head.metrics.values.forall(_.isInstanceOf[Long]))
    } finally spark.listenerManager.unregister(m)
  }
}
