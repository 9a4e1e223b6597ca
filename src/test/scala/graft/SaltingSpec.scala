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
}
