package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TableLayout

class LayoutSpec extends AnyFunSuite {
  import TestSpark._

  test("date-partitioned events: filters become partition pruning, not I/O") {
    val root = Files.createTempDirectory("graft_layout_")
    val path = root.toString + "/events"
    try {
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

    // the scored q35 aggregate runs off the same pruned-scan shape
    val aggPlan = graft.queries.Extended.prunedDayAgg(spark, path, "2024-01-03")
      .queryExecution.executedPlan.toString
    assert(aggPlan.contains("PartitionFilters: [isnotnull(event_date"),
      s"q35's aggregate must scan with partition pruning:\n$aggPlan")
    } finally graft.util.Fs.deleteTree(root.toFile)
  }

  test("persisted IVF index: probe scan prunes to the probed cell directories") {
    val root = Files.createTempDirectory("graft_ivf_layout_")
    try {
      val idx = root.toString + "/ivf"
      graft.operators.Similarity.buildIvfIndex(Tables.t(spark, sf, "embeddings"), idx)
      // one directory per cell on disk
      val dirs = new java.io.File(s"$idx/cells").listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("cell="))
      assert(dirs.length > 1, "expected one directory per IVF cell")
      val probes = Tables.t(spark, sf, "embeddings").filter(col("vec_id") < 10)
      val plan = graft.operators.Similarity
        .ivfTopKFromIndex(spark, idx, probes, 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [cell"),
        s"the probed-cells IN filter must bind to the directory key:\n$plan")
    } finally graft.util.Fs.deleteTree(root.toFile)
  }

  test("bucketed tables: co-located join runs with zero exchanges") {
    val rootDir = Files.createTempDirectory("graft_bucketed_")
    val root = rootDir.toString
    TableLayout.writeBucketed(Tables.t(spark, sf, "orders"),
      "orders_bkt", "o_custkey", 4, s"$root/orders")
    TableLayout.writeBucketed(Tables.t(spark, sf, "customer"),
      "customer_bkt", "c_custkey", 4, s"$root/customer")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      // disable broadcast so the join strategy is the bucket-merge path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt").join(spark.table("customer_bkt"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed-bucketed equi join must not shuffle either side:\n$plan")
      val expected = Tables.t(spark, sf, "orders").join(Tables.t(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
      // DROP TABLE on path-based external tables leaves the files behind
      graft.util.Fs.deleteTree(rootDir.toFile)
    }
  }

  test("writeBucketed lands exactly ONE file per bucket (the sorted-scan soundness invariant)") {
    val rootDir = java.nio.file.Files.createTempDirectory("graft_bktfiles_")
    try {
      val path = rootDir.resolve("orders").toString
      TableLayout.writeBucketed(Tables.t(spark, sf, "orders"),
        "orders_bktfiles", "o_custkey", 4, path)
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      // bucket id is encoded as _0000N in the file name; q43's sort-free
      // merge join is only sound because each bucket is a single file
      val bucketId = "_(\\d{5})\\.".r
      val byBucket = files.groupBy(f =>
        bucketId.findFirstMatchIn(f.getName).map(_.group(1)).getOrElse("?"))
      assert(byBucket.size == 4 && byBucket.values.forall(_.length == 1),
        s"expected 4 single-file buckets, got: ${files.map(_.getName).mkString(", ")}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bktfiles")
      graft.util.Fs.deleteTree(rootDir.toFile)
    }
  }
}
