package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming restatement of the batch event-time queries
  * (SURVEY.md §2.2 streaming row; reference parity for `schedule="@daily",
  * catchup=False` — reference dags/etl.py:12-13 — via incremental
  * processing of a landing directory).
  *
  * The same aggregation logic as EventTime.q15TumblingAgg, expressed over
  * an unbounded source with a watermark bounding state. Late rows beyond
  * the watermark are dropped — the explicit late-data policy the reference
  * lacks entirely (its substitute is refetch-and-dedup).
  */
object EventStreams {

  /** Raw parquet schema of the events landing dir (ts int64-nanos, read as
    * long then truncated to µs — same convention as Tables.events). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Open the landing dir as a stream. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1-hour counts/sums with a 1-hour watermark. State is bounded:
    * with N event types, at most ~(watermark/window + 2) × N open windows
    * per trigger regardless of input volume. */
  def tumblingAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
               col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))

  /** Drain the landing dir through the streaming agg into an in-memory
    * table and return the result — used by tests to prove batch/stream
    * equivalence. `complete` output mode so still-open windows are emitted
    * too (matching the batch answer on a bounded input). */
  def runOnce(spark: SparkSession, dir: String, queryName: String): DataFrame = {
    val q = tumblingAgg(readEvents(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.table(queryName)
  }
}
