package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RowSink

/** Collector for the executor-side sink callback: local-mode executors
  * share the JVM, so a static concurrent queue observes deliveries. */
object SinkCollector {
  val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

class RowSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("formatted: distributed format_string projection, one line per row") {
    import spark.implicits._
    val df = Seq((1L, "X1.0", "2024-05-01"), (2L, "M5.2", "2024-05-02"))
      .toDF("id", "class_type", "peak")
    val lines = RowSink.formatted(df,
      "Flare %d of class %s peaked at %s", Seq("id", "class_type", "peak"))
      .collect().sorted
    assert(lines.toSeq == Seq(
      "Flare 1 of class X1.0 peaked at 2024-05-01",
      "Flare 2 of class M5.2 peaked at 2024-05-02"))
  }

  test("sinkFormatted: every row delivered exactly once, executor-side") {
    import spark.implicits._
    SinkCollector.lines.clear()
    val df = (1 to 10).map(i => (i.toLong, s"c$i")).toDF("id", "cls")
    RowSink.sinkFormatted(df, "row %d=%s", Seq("id", "cls"))(SinkCollector.lines.add(_))
    val got = SinkCollector.lines.toArray(Array.empty[String]).toSeq.sorted
    assert(got == (1 to 10).map(i => s"row $i=c$i").sorted)
  }

  test("JDBC round trip: batched append into Derby, read back equal") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val src = Tables.t(spark, sf, "region")
      .select(col("r_regionkey"), col("r_name"))
    RowSink.writeJdbc(src, url, "region_load")
    val back = RowSink.readJdbc(spark, url, "region_load")
      .select(col("R_REGIONKEY").as("r_regionkey"), col("R_NAME").as("r_name"))
    // key arrives as INT from parquet and may widen through Derby: compare as Long
    val a = src.collect().map(r => (r.getAs[Number](0).longValue, r.getString(1))).toSet
    val b = back.collect().map(r => (r.getAs[Number](0).longValue, r.getString(1))).toSet
    assert(a == b && a.nonEmpty)
  }
}
