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

  test("scored q71 (CSV + ORC scans) equals the same aggregate over parquet") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Extended.q71MultiFormat(spark, sf).collect().toSeq
    val want = Tables.t(spark, sf, "nation")
      .join(Tables.t(spark, sf, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("first_nation"),
           sum(col("n_nationkey").cast("long")).as("key_sum"))
      .orderBy(col("r_name")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("events loader: every physical ts generation loads to identical instants") {
    // the regression class that actually bit in round 4: driver testdata
    // regenerations have shipped events.ts as int64-NANOS (read as long
    // under nanosAsLong), as TIMESTAMP(MICROS) NTZ, and Spark itself
    // writes TIMESTAMP(MICROS) UTC-adjusted (LTZ). Tables.events must
    // load all three to the same session-TZ instants.
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-events-gen").toString
    val cur = Tables.events(spark, sf)
      .select(col("event_id"), col("ts")).limit(200)
    def dump(dir: String)(write: org.apache.spark.sql.DataFrame => Unit): Unit = {
      new java.io.File(s"$tmp/$dir").mkdirs()
      write(cur)
    }
    // generation A: raw int64 column (what a NANOS footer reads as under
    // nanosAsLong=true) holding nanosecond ticks
    dump("a")(df => df.select(col("event_id"),
      (unix_micros(col("ts")) * 1000).as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/a/events.parquet"))
    // generation B: TIMESTAMP_NTZ micros
    dump("b")(df => df.select(col("event_id"),
      col("ts").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$tmp/b/events.parquet"))
    // generation C: UTC-adjusted TIMESTAMP micros (Spark's own default)
    dump("c")(df => df.select(col("event_id"), col("ts"))
      .write.mode("overwrite").parquet(s"$tmp/c/events.parquet"))
    try {
      val want = cur.select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for (g <- Seq("a", "b", "c")) {
        val got = Tables.events(spark, s"$tmp/$g")
          .select(col("event_id"), unix_micros(col("ts")))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"generation $g drifted")
      }
    } finally graft.util.Fs.deleteTree(new java.io.File(tmp))
  }

  test("q86 schema evolution: merged scan conserves rows; exactly the pre-schema files null out") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.Extended.q86SchemaEvolution(spark, sf).collect()
    assert(got.map(_.getAs[Long]("n")).sum == orders.count())
    val pre = orders.filter(year(col("o_orderdate")) < 1996).count()
    val preRow = got.filter(_.getAs[String]("priority") == "PRE_SCHEMA")
    assert(preRow.length == 1 && preRow.head.getAs[Long]("n") == pre,
      "every pre-evolution row (and only those) must surface the NULL default")
  }
}
