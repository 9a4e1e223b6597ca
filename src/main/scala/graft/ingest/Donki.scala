package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity ingest: NASA DONKI solar-flare JSON → typed projection.
  *
  * Mirrors the reference pipeline's semantics (SURVEY.md §2.1):
  *  - full source schema declared, including the array fields the reference
  *    drops by hand (reference dags/etl.py:54-61) — here Catalyst prunes
  *    them out of the scan via the `select` (T1).
  *  - missing JSON keys → null (T2), exactly like `flare.get(...)`.
  *  - lenient string→timestamp cast (T3): `try_to_timestamp` yields null on
  *    malformed input, matching Postgres-style leniency at INSERT.
  */
object Donki {

  /** Full DONKI FLR source schema (FIXTURES.md §A), arrays included. */
  val flrSchema: StructType = StructType(Seq(
    StructField("flrID", StringType),
    StructField("classType", StringType),
    StructField("beginTime", StringType),
    StructField("peakTime", StringType),
    StructField("endTime", StringType),
    StructField("sourceLocation", StringType),
    StructField("activeRegionNum", IntegerType),
    StructField("link", StringType),
    StructField("note", StringType),
    StructField("submissionTime", StringType),
    StructField("versionId", IntegerType),
    StructField("instruments", ArrayType(StructType(Seq(
      StructField("displayName", StringType))))),
    StructField("linkedEvents", ArrayType(StructType(Seq(
      StructField("activityID", StringType)))))))

  /** DONKI's minute-precision UTC timestamp format (reference §1.2). */
  val tsFormat = "yyyy-MM-dd'T'HH:mm'Z'"

  /** Parse a JSON array-of-flares payload (one HTTP response body, or any
    * number of landed files' contents) into the raw typed frame. */
  def readJson(spark: SparkSession, bodies: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.schema(flrSchema).json(spark.createDataset(bodies))
  }

  /** Lenient read with quarantine: records that fail to parse land in a
    * `_corrupt_record` column instead of failing the job (PERMISSIVE mode)
    * — the production posture for third-party API payloads. Returns
    * (parsed rows, quarantined raw strings). */
  def readJsonQuarantine(spark: SparkSession, bodies: Seq[String]): (DataFrame, DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val withCorrupt = flrSchema.add(StructField("_corrupt_record", StringType))
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(spark.createDataset(bodies))
      // Spark disallows filtering a just-parsed corrupt column without
      // materializing first; localCheckpoint (not cache) so the blocks are
      // reclaimed by the context cleaner instead of pinning cache-manager
      // storage for the session's lifetime, one entry per ingest call
      .localCheckpoint(true)
    val good = raw.filter(col("_corrupt_record").isNull).drop("_corrupt_record")
    val quarantined = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record"))
    (good, quarantined)
  }

  /** T1+T3: project/rename the 8 kept fields and cast timestamps.
    * Output timestamps are NTZ (wall-clock UTC) for store portability. */
  def project(raw: DataFrame): DataFrame =
    raw.select(
      col("flrID").as("flr_id"),
      col("classType").as("class_type"),
      try_to_timestamp(col("beginTime"), lit(tsFormat)).cast("timestamp_ntz").as("begin_time"),
      try_to_timestamp(col("peakTime"), lit(tsFormat)).cast("timestamp_ntz").as("peak_time"),
      try_to_timestamp(col("endTime"), lit(tsFormat)).cast("timestamp_ntz").as("end_time"),
      col("sourceLocation").as("source_location"),
      col("activeRegionNum").as("active_region_num"),
      col("link"))

  /** Deterministic surrogate id (reference `id SERIAL`, D2): dense row_number
    * by natural-key order. Single-partition window — use only on bounded
    * ingest batches (the reference's case: O(10²) rows/day); at scale prefer
    * monotonically_increasing_id (documented tradeoff, SURVEY §7.3). */
  def withId(projected: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("flr_id"), col("class_type"), col("link"))
    projected.withColumn("id", row_number().over(w).cast(LongType))
      .select(col("id"), col("flr_id"), col("class_type"), col("begin_time"),
        col("peak_time"), col("end_time"), col("source_location"),
        col("active_region_num"), col("link"))
  }
}
