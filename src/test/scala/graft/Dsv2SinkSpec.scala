package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Donki
import graft.queries.Parity

/** Laws for the `graft-jsonl` DataSource V2 SINK (graft.sources.v2
  * .JsonLinesSink): round-trip identity, append/truncate semantics, the
  * two-phase commit's cleanliness guarantees (a failed write never
  * disturbs the previous table; no temp litter after success), read-side
  * column pruning, and the non-finite-double rejection contract. */
class Dsv2SinkSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(): java.io.File =
    java.nio.file.Files.createTempDirectory("graft_jsonl_").toFile

  private def flares: DataFrame = Donki.readJson(spark,
    Seq(Parity.jsonBody(Parity.batchA), Parity.jsonBody(Parity.batchB)))

  private def readBack(dir: java.io.File): DataFrame =
    spark.read.format("graft-jsonl").schema(Donki.flrSchema)
      .load(dir.getAbsolutePath)

  private def rowSet(df: DataFrame) = df.collect().map(_.toSeq).toSet

  test("round trip: write overwrite then read back equals the source frame") {
    val dir = tmpDir()
    try {
      flares.write.format("graft-jsonl").mode("overwrite")
        .save(dir.getAbsolutePath)
      assert(rowSet(readBack(dir)) == rowSet(flares))
      // commit hygiene: _SUCCESS present, no temp/backup litter
      val names = dir.listFiles().map(_.getName).toSet
      assert(names.contains("_SUCCESS"))
      assert(!names.exists(_.startsWith("_temporary")), s"temp litter: $names")
      assert(!names.exists(_.startsWith("_backup")), s"backup litter: $names")
    } finally util.Fs.deleteTree(dir)
  }

  test("append accumulates; overwrite truncates") {
    val dir = tmpDir()
    try {
      val a = Donki.readJson(spark, Seq(Parity.jsonBody(Parity.batchA)))
      val b = Donki.readJson(spark, Seq(Parity.jsonBody(Parity.batchB)))
      a.write.format("graft-jsonl").mode("append").save(dir.getAbsolutePath)
      b.write.format("graft-jsonl").mode("append").save(dir.getAbsolutePath)
      assert(readBack(dir).count() == Parity.batchA.size + Parity.batchB.size)
      b.write.format("graft-jsonl").mode("overwrite").save(dir.getAbsolutePath)
      assert(rowSet(readBack(dir)) == rowSet(b))
    } finally util.Fs.deleteTree(dir)
  }

  test("a failed write leaves the previous table fully intact (abort path)") {
    val dir = tmpDir()
    try {
      flares.write.format("graft-jsonl").mode("overwrite")
        .save(dir.getAbsolutePath)
      val before = rowSet(readBack(dir))
      val poisoned = flares.withColumn("classType",
        when(col("flrID").endsWith("FLR-001"),
          raise_error(lit("poisoned row"))).otherwise(col("classType")))
      intercept[Exception] {
        poisoned.write.format("graft-jsonl").mode("overwrite")
          .save(dir.getAbsolutePath)
      }
      // overwrite's truncation happens at COMMIT time, which was never
      // reached — the previous contents must be untouched
      assert(rowSet(readBack(dir)) == before)
    } finally util.Fs.deleteTree(dir)
  }

  test("read-side column pruning reaches the scan") {
    val dir = tmpDir()
    try {
      flares.write.format("graft-jsonl").mode("overwrite")
        .save(dir.getAbsolutePath)
      val df = readBack(dir).select("flrID", "link")
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty)
      assert(scans.head.output.map(_.name) == Seq("flrID", "link"),
        s"scan must read only pruned columns, got: ${scans.head.output.map(_.name)}")
      assert(df.count() == flares.count())
    } finally util.Fs.deleteTree(dir)
  }

  test("non-finite doubles are rejected, not silently recoded") {
    val dir = tmpDir()
    try {
      import spark.implicits._
      val bad = Seq(("a", 1.0), ("b", Double.NaN)).toDF("k", "v")
      val ex = intercept[Exception] {
        bad.write.format("graft-jsonl").mode("overwrite")
          .save(dir.getAbsolutePath)
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("non-finite")),
        s"expected the non-finite rejection, got: ${messages(ex)}")
      // the failed write published nothing
      assert(readBack(dir).count() == 0)
    } finally util.Fs.deleteTree(dir)
  }

  test("streaming write: a stream lands through the sink equal to a batch write") {
    val in = tmpDir(); val out = tmpDir(); val cp = tmpDir()
    try {
      val docs = Tables.t(spark, sf, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      val streamDocs = spark.readStream.schema(docs.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf)
      val q = streamDocs.writeStream
        .format("graft-jsonl")
        .option("path", out.getAbsolutePath)
        .option("checkpointLocation", cp.getAbsolutePath)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val back = spark.read.format("graft-jsonl").schema(docs.schema)
        .load(out.getAbsolutePath)
      assert(rowSet(back) == rowSet(docs))
      // epoch commit log present; no temp litter
      val names = out.listFiles().map(_.getName).toSet
      assert(names.contains("_epochs") && names.contains("_SUCCESS"))
      assert(!names.exists(_.startsWith("_temporary")), s"temp litter: $names")
    } finally { util.Fs.deleteTree(in); util.Fs.deleteTree(out); util.Fs.deleteTree(cp) }
  }

  test("streaming commit: replayed epochs are no-ops, crashed publishes replace cleanly") {
    val out = tmpDir()
    try {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("k", StringType)))
      val sw = new graft.sources.v2.JsonLinesStreamingWrite(schema, out.getAbsolutePath,
        new graft.sources.v2.SerializableHadoopConf(spark.sessionState.newHadoopConf()))
      def tempFile(epoch: Long, pid: Int, content: String): String = {
        val d = new java.io.File(out, s"_temporary-epoch-$epoch")
        d.mkdirs()
        val file = new java.io.File(d, s"part-$pid-0")
        java.nio.file.Files.writeString(file.toPath, content)
        file.getAbsolutePath
      }
      def msg(epoch: Long, pid: Int, content: String) =
        graft.sources.v2.JsonLinesCommitMessage(pid, Some(tempFile(epoch, pid, content)))
      def published(): Map[String, String] =
        out.listFiles().filter(_.getName.startsWith("part-")).map(f =>
          f.getName -> java.nio.file.Files.readString(f.toPath)).toMap

      // epoch 0 commits once
      sw.commit(0L, Array(msg(0L, 0, "{\"k\": \"first\"}\n")))
      assert(published() == Map("part-epoch-0-0.jsonl" -> "{\"k\": \"first\"}\n"))
      // checkpoint-replayed epoch 0 (marker exists): a NO-OP, not a dup
      sw.commit(0L, Array(msg(0L, 0, "{\"k\": \"replayed\"}\n")))
      assert(published() == Map("part-epoch-0-0.jsonl" -> "{\"k\": \"first\"}\n"))
      // crash AFTER epoch 1's publish but BEFORE its marker: files exist,
      // marker doesn't — the replay must replace, not fail or duplicate
      java.nio.file.Files.writeString(
        new java.io.File(out, "part-epoch-1-0.jsonl").toPath, "{\"k\": \"stale\"}\n")
      sw.commit(1L, Array(msg(1L, 0, "{\"k\": \"retried\"}\n")))
      assert(published() == Map(
        "part-epoch-0-0.jsonl" -> "{\"k\": \"first\"}\n",
        "part-epoch-1-0.jsonl" -> "{\"k\": \"retried\"}\n"))
      // no temp litter
      assert(!out.listFiles().map(_.getName).exists(_.startsWith("_temporary")))
      // crashed attempt published under a DIFFERENT partitioning (extra
      // pid 7), then the replay runs with pid 0 only: the stale pid must
      // be swept or its rows would duplicate on every read
      java.nio.file.Files.writeString(
        new java.io.File(out, "part-epoch-2-7.jsonl").toPath, "{\"k\": \"stale-pid\"}\n")
      sw.commit(2L, Array(msg(2L, 0, "{\"k\": \"e2\"}\n")))
      assert(published() == Map(
        "part-epoch-0-0.jsonl" -> "{\"k\": \"first\"}\n",
        "part-epoch-1-0.jsonl" -> "{\"k\": \"retried\"}\n",
        "part-epoch-2-0.jsonl" -> "{\"k\": \"e2\"}\n"),
        "a stale pid from a crashed attempt must not stay published")
    } finally util.Fs.deleteTree(out)
  }

  test("a truncate that crashed mid-publish is rolled back by the next write") {
    val dir = tmpDir()
    try {
      val a = Donki.readJson(spark, Seq(Parity.jsonBody(Parity.batchA)))
      val b = Donki.readJson(spark, Seq(Parity.jsonBody(Parity.batchB)))
      a.write.format("graft-jsonl").mode("overwrite").save(dir.getAbsolutePath)
      val before = rowSet(readBack(dir))
      // simulate the crash state a truncate leaves mid-publish: the old
      // parts sit in _backup-<qid>, a SUBSET of the failed write's parts
      // (named with its qid) is already published
      val backup = new java.io.File(dir, "_backup-deadbeef")
      backup.mkdirs()
      dir.listFiles().filter(_.getName.startsWith("part-")).foreach { p =>
        assert(p.renameTo(new java.io.File(backup, p.getName)))
      }
      java.nio.file.Files.writeString(
        new java.io.File(dir, "part-deadbeef-0.jsonl").toPath,
        "{\"flrID\": \"PARTIAL\", \"catalog\": null, \"instruments\": null, " +
          "\"beginTime\": null, \"peakTime\": null, \"endTime\": null, " +
          "\"classType\": null, \"sourceLocation\": null, \"activeRegionNum\": null, " +
          "\"note\": null, \"submissionTime\": null, \"versionId\": null, \"link\": null}\n")
      // reader at this instant would see the failed write's subset; the
      // NEXT write must first restore the old table, then apply itself
      b.write.format("graft-jsonl").mode("append").save(dir.getAbsolutePath)
      val after = rowSet(readBack(dir))
      assert(after == before ++ rowSet(b),
        "recovery must drop the crashed truncate's subset and restore the old parts")
      assert(!after.exists(_.toString.contains("PARTIAL")))
      val names = dir.listFiles().map(_.getName).toSet
      assert(!names.exists(_.startsWith("_backup")), s"backup litter: $names")
    } finally util.Fs.deleteTree(dir)
  }

  test("scale shape: documents round-trips across many partitions") {
    val dir = tmpDir()
    try {
      val docs = Tables.t(spark, sf, "documents")
        .select("doc_id", "text", "lang", "source", "n_chars")
      docs.write.format("graft-jsonl").mode("overwrite")
        .save(dir.getAbsolutePath)
      val back = spark.read.format("graft-jsonl").schema(docs.schema)
        .load(dir.getAbsolutePath)
      assert(back.count() == docs.count())
      assert(back.agg(sum("n_chars")).head.getLong(0) ==
        docs.agg(sum("n_chars")).head.getLong(0))
      assert(rowSet(back) == rowSet(docs))
    } finally util.Fs.deleteTree(dir)
  }
}
