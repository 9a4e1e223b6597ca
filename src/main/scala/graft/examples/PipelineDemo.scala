package graft.examples

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.ingest.Donki
import graft.operators.DedupAppend
import graft.queries.Parity
import graft.sources.HttpJson
import graft.streaming.EventStreams

/** End-to-end usage example of the library's ingest + streaming surface —
  * the full reference-pipeline lifecycle (fetch-with-fallback → project →
  * dedup-append → query), then the Structured Streaming event path.
  * Run: tools/run.sh graft.examples.PipelineDemo /root/testdata/sf0.001
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. ingest: live fetch (here: a fetch that fails → static fallback),
    //    project, idempotent append, query — the whole reference DAG.
    val flaky: () => String = () => throw new RuntimeException("API down")
    val (raw, live) = HttpJson.readWithFallback(
      spark, Donki.flrSchema, flaky, Parity.jsonBody(Parity.batchA),
      retries = 2, delayMs = 10L)
    println(s"[demo] fetch live=$live (fallback engaged=${!live})")
    val table = Files.createTempDirectory("graft_demo_").toString + "/solar_flare_data"
    DedupAppend.append(spark, Donki.project(raw), table,
      keys = Seq("flr_id"), tieBreak = Seq("class_type", "link"))
    DedupAppend.append(spark, Donki.project(raw), table,
      keys = Seq("flr_id"), tieBreak = Seq("class_type", "link")) // re-run: no-op
    val flares = spark.read.parquet(table)
    println(s"[demo] solar_flare_data rows after double append: ${flares.count()}")
    flares.show(3, truncate = false)

    // 2. streaming: tumbling event-time agg with watermark over a landing dir
    val windows = EventStreams.runOnce(spark, sfDir, "demo_stream")
    println(s"[demo] streaming windows: ${windows.count()}")
    windows.orderBy("window_start", "event_type").show(5)

    spark.stop()
  }
}
