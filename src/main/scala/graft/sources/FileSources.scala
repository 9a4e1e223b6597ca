package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File-format scan coverage (SURVEY.md §2.2 row 1): schema'd readers for
  * the formats the engine supports at rest. Parquet is the primary format
  * (vectorized, statistics, pushdown); CSV/JSON are interchange formats —
  * always read with a DECLARED schema (never inferSchema: inference scans
  * the data twice and is nondeterministic under schema drift); ORC gets the
  * same vectorized treatment as parquet.
  */
object FileSources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def csv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def json(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  /** Matching writers, for landing-zone interchange. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)
}
