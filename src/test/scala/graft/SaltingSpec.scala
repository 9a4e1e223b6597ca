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
}
