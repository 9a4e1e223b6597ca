package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{EventTime, Parity}
import graft.streaming.EventStreams

class StreamingIngestSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming ingest: landed batches dedup-append exactly once") {
    val root = Files.createTempDirectory("graft_stream_ingest_")
    val landing = root.resolve("landing"); Files.createDirectories(landing)
    val table = root.resolve("table").toString
    val ckpt = root.resolve("ckpt").toString

    Files.writeString(landing.resolve("day1.json"), Parity.jsonBody(Parity.batchA))
    EventStreams.ingestFlares(spark, landing.toString, table, ckpt)
    assert(spark.read.parquet(table).count() == Parity.batchA.size)

    // land an overlapping second batch; restart resumes from checkpoint
    Files.writeString(landing.resolve("day2.json"), Parity.jsonBody(Parity.batchB))
    EventStreams.ingestFlares(spark, landing.toString, table, ckpt)
    val byKey = spark.read.parquet(table).collect()
      .map(r => r.getAs[String]("flr_id") -> r.getAs[String]("class_type")).toMap
    assert(byKey.size == 7)
    assert(byKey("2025-05-29T19:46:00-FLR-001") == "M3.1") // batch A won the conflict
  }

  test("stateful sessionization: closed sessions consistent with batch query") {
    val streamed = EventStreams.sessionizeStateful(spark, sf, "sessions_out")
      .collect()
    // batch q16 counts ALL sessions; the stateful form emits only CLOSED
    // ones (last session per user stays open) → exactly n_sessions-1 each
    val batch = EventTime.q16Sessionize(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
    val closedPerUser = streamed.groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.length.toLong).toMap
    batch.foreach { case (user, n) =>
      assert(closedPerUser.getOrElse(user, 0L) == n - 1,
        s"user $user: batch says $n sessions, stream closed ${closedPerUser.getOrElse(user, 0L)}")
    }
    // session internals sane
    streamed.foreach { r =>
      assert(r.getAs[Long]("start_us") <= r.getAs[Long]("end_us"))
      assert(r.getAs[Long]("n_events") >= 1)
    }
  }
}
