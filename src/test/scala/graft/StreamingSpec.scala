package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.EventTime
import graft.streaming.EventStreams

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("streaming tumbling agg over the landing dir equals the batch query") {
    val streamed = EventStreams.runOnce(spark, sf, "stream_q15")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toInstant,
        r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      .toSet
    val batch = EventTime.q15TumblingAgg(spark, sf)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("window_start")
        .toInstant(java.time.ZoneOffset.UTC),
        r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      .toSet
    assert(streamed == batch)
  }
}
