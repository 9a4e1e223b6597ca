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

  test("streaming sliding agg equals the batch sliding query") {
    val streamed = EventStreams.runOnceSliding(spark, sf, "stream_q23")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").toInstant,
        r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      .toSet
    val batch = EventTime.q23SlidingAgg(spark, sf)
      .collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("window_start")
        .toInstant(java.time.ZoneOffset.UTC),
        r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Double]("sum_value")))
      .toSet
    assert(streamed == batch)
  }

  test("streaming dedup: one survivor per event_id, state bounded by watermark") {
    val q = EventStreams.dedupStream(EventStreams.readEvents(spark, sf))
      .select(org.apache.spark.sql.functions.col("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup")
      .start()
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("stream_dedup").collect().map(_.getLong(0))
    assert(ids.length == ids.distinct.length, "no duplicate event_ids may survive")
    val batchDistinct = Tables.t(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_id")).distinct().count()
    assert(ids.length == batchDistinct)
  }
}
