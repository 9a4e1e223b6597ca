package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableLayout

class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("date-partitioned events: filters become partition pruning, not I/O") {
    val path = Files.createTempDirectory("graft_layout_").toString + "/events"
    TableLayout.writeEventsByDay(Tables.events(spark, sf), path)

    // directory-per-day layout on disk
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("event_date="))
    assert(dirs.length > 1, "expected one directory per day")

    val pruned = TableLayout.read(spark, path)
      .filter(col("event_date") === "2024-01-03")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"),
      s"filter must prune partitions:\n$plan")

    // pruned read matches the unpartitioned filter
    val expected = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === "2024-01-03").count()
    assert(pruned.count() == expected)
  }
}
