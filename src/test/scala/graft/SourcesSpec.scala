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
}
