package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileSources

class FileSourcesSpec extends AnyFunSuite {
  import TestSpark._

  lazy val orders = Tables.t(spark, sf, "orders")

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"graft_src_$fmt").toString + "/t"
    val expected = orders.collect().map(_.toString).sorted.toSeq
    val got = fmt match {
      case "csv" =>
        FileSources.writeCsv(orders, dir)
        FileSources.csv(spark, orders.schema, dir)
      case "json" =>
        FileSources.writeJson(orders, dir)
        FileSources.json(spark, orders.schema, dir)
      case "orc" =>
        FileSources.writeOrc(orders, dir)
        FileSources.orc(spark, dir)
    }
    assert(got.schema == orders.schema, s"$fmt schema drift")
    assert(got.collect().map(_.toString).sorted.toSeq == expected, s"$fmt data drift")
  }

  test("csv round-trip preserves schema and data")  { roundTrip("csv") }
  test("json round-trip preserves schema and data") { roundTrip("json") }
  test("orc round-trip preserves schema and data")  { roundTrip("orc") }
}
