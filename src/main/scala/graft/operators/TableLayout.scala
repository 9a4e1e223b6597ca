package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** At-rest table layout for scale (DESIGN.md "Session / layout defaults"):
  * directory partitioning so time/category predicates prune whole
  * directories before any I/O happens.
  *
  * At 100 TB this is the difference between scanning a day and scanning
  * three years: a filter on the partition column shows up as
  * PartitionFilters in the scan (asserted in LayoutSpec) and never reads
  * the pruned files. Partition columns must be low-cardinality (days,
  * months, categories) — high-cardinality partitioning creates the
  * small-files problem; within partitions, rely on parquet row-group
  * statistics + optional sorting for further skipping.
  */
object TableLayout {

  /** Write events partitioned by event date (one directory per day). */
  def writeEventsByDay(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date", to_date(col("ts")))
      .repartition(col("event_date")) // one writer wave per partition dir
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** Write lineitem partitioned by ship month. */
  def writeLineitemByMonth(lineitem: DataFrame, path: String): Unit =
    lineitem
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .repartition(col("ship_month"))
      .write.mode("overwrite")
      .partitionBy("ship_month")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write a table bucketed (and sorted) by a join key. Two tables
    * bucketed on the same key with the same bucket count join WITHOUT any
    * exchange — each task merges bucket i of both sides directly
    * (asserted in LayoutSpec). At 100 TB this is THE repeated-join
    * optimization: the shuffle of the biggest table is paid once at write
    * time, then every subsequent join on that key is shuffle-free.
    * Bucket count trades file count against per-bucket size; sortBy makes
    * the merge side of SMJ sort-free too. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
                    buckets: Int, path: String): Unit =
    // repartition on the bucket key first: each write task then holds
    // exactly one bucket, so the table lands as ONE file per bucket.
    // Without it, files = input tasks × buckets touched (the classic
    // small-files explosion at scale) — and the scan only exposes the
    // sortBy ordering when a bucket is a single file, so multi-file
    // buckets silently re-insert per-partition Sorts under every
    // sort-merge join against the table.
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(tableName)
}
