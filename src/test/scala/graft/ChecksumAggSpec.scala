package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ChecksumAgg

/** Laws for the native DeclarativeAggregate `checksum_agg`: partitioning
  * independence (the property the checksum exists for), single-row
  * sensitivity, null neutrality, and the codegen-friendly plan shape that
  * distinguishes it from the typed-Aggregator path.
  */
class ChecksumAggSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def checksumOf(rows: Seq[String], parts: Int): Long = {
    ChecksumAgg.register(spark)
    rows.toDF("s").repartition(parts).createOrReplaceTempView("cks_in")
    spark.sql("SELECT checksum_agg(s) AS c FROM cks_in").head().getLong(0)
  }

  test("checksum is independent of row order and partitioning") {
    val rows = (1 to 500).map(i => s"row-$i")
    val a = checksumOf(rows, 1)
    val b = checksumOf(scala.util.Random.shuffle(rows), 7)
    val c = checksumOf(rows.reverse, 32)
    assert(a == b && b == c)
  }

  test("a single changed row flips the checksum; nulls contribute nothing") {
    val rows = (1 to 100).map(i => s"row-$i")
    val base = checksumOf(rows, 4)
    val changed = checksumOf(rows.updated(42, "row-43-CORRUPTED"), 4)
    assert(base != changed)
    ChecksumAgg.register(spark)
    (rows.map(Option(_)) ++ Seq(None, None)).toDF("s")
      .createOrReplaceTempView("cks_nulls")
    val withNulls = spark.sql("SELECT checksum_agg(s) AS c FROM cks_nulls")
      .head().getLong(0)
    assert(withNulls == base, "null rows must not move the checksum")
  }

  test("plans as a codegen HashAggregate, not the object-hash Aggregator path") {
    ChecksumAgg.register(spark)
    Tables.t(spark, sf, "events")
      .selectExpr("event_type", "CAST(event_id AS STRING) AS s")
      .createOrReplaceTempView("cks_ev")
    val df = spark.sql(
      "SELECT event_type, checksum_agg(s) FROM cks_ev GROUP BY event_type")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate") && !plan.contains("ObjectHashAggregate"),
      s"declarative aggregate must take the codegen hash-agg path:\n$plan")
    assert(df.collect().length > 0)
  }

  test("matches a driver-side modular-sum replay on real data") {
    ChecksumAgg.register(spark)
    val payloads = Tables.t(spark, sf, "events")
      .selectExpr("CAST(event_id AS STRING) AS s")
    payloads.createOrReplaceTempView("cks_replay")
    val got = spark.sql("SELECT checksum_agg(s) FROM cks_replay").head().getLong(0)
    val p = graft.functions.TextFns.P31
    val want = payloads.as[String].collect()
      .map { s =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        val hex = md5.map("%02x".format(_)).mkString.take(15)
        java.lang.Long.parseLong(hex, 16) % p
      }
      .foldLeft(0L)((a, h) => (a + h) % p)
    assert(got == want)
  }
}
