package graft.operators

import java.util.Properties

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Row-delivery sinks at the edge of the engine (reference §2.1 E4/L1).
  *
  * The reference prints a formatted line per record in a Python loop
  * (reference `dags/exampledag.py:77-88`) and loads rows one INSERT at a
  * time through a connection hook (`dags/etl.py:76-89`). The engine keeps
  * both behaviors but set-oriented: formatting is a codegen'd
  * `format_string` projection computed distributed, and only the final
  * delivery (print/log/INSERT batch) touches rows; JDBC loading is one
  * batched `df.write.jdbc` per partition instead of a per-row round trip.
  */
object RowSink {

  /** Formatted line per row: `fmt` is a printf-style pattern, `cols` the
    * columns substituted in order. Lazy and distributed — the formatting
    * runs inside whole-stage codegen; deliver with [[sinkFormatted]] or
    * any writer. */
  def formatted(df: DataFrame, fmt: String, cols: Seq[String]): Dataset[String] = {
    import df.sparkSession.implicits._
    df.select(format_string(fmt, cols.map(col): _*).as("line")).as[String]
  }

  /** Deliver each formatted row to `out`, executor-side (foreachPartition
    * — `out` must be serializable; per-partition iteration keeps the
    * per-row work at the sink edge only). */
  def sinkFormatted(df: DataFrame, fmt: String, cols: Seq[String])(out: String => Unit): Unit =
    formatted(df, fmt, cols).foreachPartition { it: Iterator[String] => it.foreach(out) }

  /** Set-oriented JDBC append (the reference's Postgres load, batched).
    * Idempotence belongs to the upstream dedup ([[DedupAppend]]); this is
    * the final batched INSERT wave — one statement batch per partition. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                props: Properties = new Properties()): Unit =
    df.write.mode("append").jdbc(url, table, props)

  def readJdbc(spark: SparkSession, url: String, table: String,
               props: Properties = new Properties()): DataFrame =
    spark.read.jdbc(url, table, props)
}
