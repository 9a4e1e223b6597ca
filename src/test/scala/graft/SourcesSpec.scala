package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Donki
import graft.queries.Parity
import graft.sources.HttpJson

class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  val goodBody: String = Parity.jsonBody(Parity.batchA)

  test("retry: succeeds on third attempt without exhausting budget") {
    val calls = new AtomicInteger(0)
    val flaky = () => {
      if (calls.incrementAndGet() < 3) throw new RuntimeException("boom")
      goodBody
    }
    val (df, live) = HttpJson.readWithFallback(
      spark, Donki.flrSchema, flaky, "[]", retries = 3, delayMs = 1L)
    assert(live)
    assert(calls.get() == 3)
    assert(df.count() == Parity.batchA.size)
  }

  test("quarantine: malformed records are captured, good records parse") {
    val malformed = """[{"flrID": "OK-1", "classType": "M1.0", "link": "https://x/1"}, {"flrID": broken]"""
    val (good, bad) = Donki.readJsonQuarantine(spark, Seq(goodBody, malformed))
    assert(good.count() == Parity.batchA.size) // the valid body parses fully
    assert(bad.count() >= 1) // the broken body is quarantined, not dropped
    val quarantined = bad.collect().map(_.getString(0)).mkString
    assert(quarantined.contains("broken"))
  }

  test("fallback: total failure substitutes the static dataset") {
    val alwaysFail: () => String = () => throw new RuntimeException("down")
    val (df, live) = HttpJson.readWithFallback(
      spark, Donki.flrSchema, alwaysFail, goodBody, retries = 2, delayMs = 1L)
    assert(!live)
    assert(df.count() == Parity.batchA.size)
  }

  // ---- DataSource V2 (graft-http-json) --------------------------------

  private def writeFixtures(): (String, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_")
    val a = dir.resolve("a.json"); val b = dir.resolve("b.json")
    java.nio.file.Files.writeString(a, Parity.jsonBody(Parity.batchA))
    java.nio.file.Files.writeString(b, Parity.jsonBody(Parity.batchB))
    (a.toUri.toString, b.toUri.toString)
  }

  test("dsv2: rows match the built-in json reader; one partition per url") {
    val (ua, ub) = writeFixtures()
    val df = spark.read.format("graft-http-json")
      .schema(Donki.flrSchema)
      .option("urls", s"$ua,$ub")
      .load()
    assert(df.rdd.getNumPartitions == 2) // one executor-side fetch per URL
    val viaDsv2 = Donki.project(df).collect()
      .map(_.toSeq).toSet
    val viaBuiltin = Donki.project(Donki.readJson(spark,
      Seq(Parity.jsonBody(Parity.batchA), Parity.jsonBody(Parity.batchB)))).collect()
      .map(_.toSeq).toSet
    assert(viaDsv2 == viaBuiltin)
  }

  test("dsv2: column pruning reaches the scan (select parses only needed fields)") {
    val (ua, _) = writeFixtures()
    val df = spark.read.format("graft-http-json")
      .schema(Donki.flrSchema)
      .option("urls", ua)
      .load()
      .select("flrID", "classType")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name) == Seq("flrID", "classType"),
      s"scan must read only pruned columns, got: ${scans.head.output.map(_.name)}")
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Parity.batchA.map(_.flrID).sorted)
  }

  test("dsv2: nested arrays of structs survive (instruments)") {
    val (ua, _) = writeFixtures()
    val df = spark.read.format("graft-http-json")
      .schema(Donki.flrSchema)
      .option("urls", ua)
      .load()
    val withInstruments = df
      .select(org.apache.spark.sql.functions.col("flrID"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.col("instruments.displayName")).as("inst"))
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(withInstruments.count(_._2 == "GOES-P: EXIS 1.0-8.0") == 2)
  }

  test("dsv2: fetch parallelism scales with the url list (one partition each at N=48)") {
    // the scale knob for the custom source IS the url list: planInputPartitions
    // emits one executor-side fetch per url, so a 1000-executor cluster is fed
    // by sharding the endpoint list — pin that the planning stays 1:1 at a
    // cluster-ish partition count and rows survive the fan-in exactly once
    val dir = java.nio.file.Files.createTempDirectory("graft_dsv2_scale_")
    val n = 48
    val urls = (0 until n).map { i =>
      val p = dir.resolve(s"u$i.json")
      java.nio.file.Files.writeString(p, Parity.jsonBody(Parity.batchA))
      p.toUri.toString
    }
    val df = spark.read.format("graft-http-json")
      .schema(Donki.flrSchema)
      .option("urls", urls.mkString(","))
      .load()
    assert(df.rdd.getNumPartitions == n, "one fetch partition per url")
    assert(df.count() == n.toLong * Parity.batchA.length,
      "every url's rows arrive exactly once")
    graft.util.Fs.deleteTree(dir.toFile)
  }

  test("dsv2: missing schema fails loudly (no silent inference)") {
    val ex = intercept[Exception] {
      spark.read.format("graft-http-json").option("urls", "file:///nope.json").load()
    }
    assert(ex.getMessage.contains("explicit schema") ||
      Option(ex.getCause).exists(_.getMessage.contains("explicit schema")))
  }
}
