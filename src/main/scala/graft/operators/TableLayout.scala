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
}
