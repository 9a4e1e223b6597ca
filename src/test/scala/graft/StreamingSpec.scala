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

  test("tumblingAgg keeps event-time semantics: append output mode is accepted") {
    // grouping by window(...).getField("start") strips the event-time
    // metadata — append mode would throw at analysis and watermark state
    // eviction would never apply; grouping by the window column keeps both
    val q = EventStreams.tumblingAgg(EventStreams.readEvents(spark, sf))
      .writeStream.outputMode("append").format("memory").queryName("tumbling_append_ok")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.stop()
    // bounded input: the final watermark closes all but the last window(s)
    assert(spark.table("tumbling_append_ok").count() > 0,
      "closed windows must emit under append mode")
  }

  test("scored q70 (maintained tumbling rollup via writeStream) equals batch q15 row for row") {
    val got = EventTime.q70StreamTumbling(spark, sf).collect().toSeq
    val want = EventTime.q15TumblingAgg(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("scored q74 (CDC state via writeStream) equals batch q56 row for row") {
    val got = graft.queries.ChangeData.q74StreamCdc(spark, sf).collect().toSeq
    val want = graft.queries.ChangeData.q56CdcMerge(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == want)
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

  test("curation gate runs unchanged over a stream: quality scores match batch") {
    val batchDocs = Tables.t(spark, sf, "documents")
    val streamDocs = spark.readStream.schema(batchDocs.schema)
      .option("pathGlobFilter", "documents.parquet") // the file source wants a dir
      .parquet(sf)
    val q = graft.operators.Curation.qualityScore(streamDocs)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_quality")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_quality").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    val batch = graft.operators.Curation.qualityScore(batchDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(streamed == batch)
  }

  test("number scrubbing runs unchanged over a stream: masks match batch") {
    val batchDocs = Tables.t(spark, sf, "documents")
    val streamDocs = spark.readStream.schema(batchDocs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
    val q = graft.operators.Curation.scrubNumbers(
        streamDocs.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")), "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_scrub")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_scrub").collect()
      .map(r => (r.getLong(0), r.getAs[String]("masked"), r.getAs[Long]("n_masked"))).toSet
    val batch = graft.operators.Curation.scrubNumbers(
        batchDocs.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text")), "text")
      .collect()
      .map(r => (r.getLong(0), r.getAs[String]("masked"), r.getAs[Long]("n_masked"))).toSet
    assert(streamed == batch)
  }

  test("stream-stream join: pairs match the static self-join") {
    import org.apache.spark.sql.functions._
    val q = EventStreams.pairWithin(EventStreams.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_pairs")
      .start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_pairs").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("a_id"),
        r.getAs[Long]("b_id"), r.getAs[Long]("gap_us"))).toSet
    val e = Tables.t(spark, sf, "events")
    val a = e.select(col("user_id"), col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = e.select(col("user_id").as("b_user"), col("event_id").as("b_id"), col("ts").as("b_ts"))
    val batch = a.join(b,
        col("user_id") === col("b_user") && col("a_id") =!= col("b_id") &&
          col("b_ts") >= col("a_ts") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("user_id"), col("a_id"), col("b_id"),
        unix_micros(col("b_ts")).minus(unix_micros(col("a_ts"))).as("gap_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
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

  test("scored q83 (double-delivered stream dedup) equals the single-delivery batch rollup") {
    import org.apache.spark.sql.functions._
    val got = EventTime.q83StreamDedup(spark, sf).collect().toSeq
    val want = Tables.t(spark, sf, "events")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("n_ids"),
        Tables.sumMoney2(col("value")).as("sum_value"))
      .orderBy(col("event_type")).collect().toSeq
    assert(got.nonEmpty && got == want)
    // every duplicate gone: n equals the distinct-id count per type
    got.foreach(r => assert(r.getAs[Long]("n") == r.getAs[Long]("n_ids")))
  }

  test("scored q90 (streamed sliding windows + flush sentinel) equals batch q23 row for row") {
    val got = EventTime.q90StreamSliding(spark, sf).collect().toSeq
    val want = EventTime.q23SlidingAgg(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("state-store reader: dedup key state is inspectable and watermark-bounded") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("graft_state_").toFile
    try {
      val out = new java.io.File(tmp, "out").getAbsolutePath
      val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
      val q = EventStreams.dedupStream(EventStreams.readEvents(spark, sf))
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // the state DATA SOURCE reads the checkpoint's store directly — the
      // operational introspection surface (what is my stream remembering?)
      val state = spark.read.format("statestore").load(ckpt)
      val events = Tables.t(spark, sf, "events")
      val distinctIds = events.select(col("event_id")).distinct().count()
      val maxTs = events.agg(max(unix_micros(col("ts")))).head().getLong(0)
      val withinWatermark = events
        .filter(unix_micros(col("ts")) >= maxTs - 3600L * 1000000L)
        .select(col("event_id")).distinct().count()
      val n = state.count()
      // every retained key is a real distinct id; eviction may or may not
      // have run its final no-data batch, so the floor is the
      // within-watermark set and the ceiling is all distinct keys
      assert(n >= withinWatermark && n <= distinctIds,
        s"state rows $n outside [$withinWatermark, $distinctIds]")
      assert(state.columns.contains("key"))
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("scored q93 (stream-static anti join) equals the batch anti-join rollup") {
    import org.apache.spark.sql.functions._
    val got = EventTime.q93StreamAnti(spark, sf).collect().toSeq
    val block = Tables.t(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("user_id")).distinct()
    val want = Tables.t(spark, sf, "events")
      .join(block, Seq("user_id"), "left_anti")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        Tables.sumMoney2(col("value")).as("sum_value"))
      .orderBy(col("event_type")).collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("scored q88 (streamed session windows + flush sentinel) equals batch q34 row for row") {
    val got = EventTime.q88StreamSession(spark, sf).collect().toSeq
    val want = EventTime.q34SessionWindow(spark, sf).collect().toSeq
    assert(got.nonEmpty && got == want)
  }
}
