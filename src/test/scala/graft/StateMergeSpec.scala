package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StateMerge

/** Laws for the shared maintained-table merge discipline: replay safety
  * under foreachBatch retry (the sum algebra is NOT idempotent, so a
  * re-delivered micro-batch must be detected and skipped), and swap
  * hygiene (no transient siblings survive; the live dir is always
  * complete).
  */
class StateMergeSpec extends AnyFunSuite {
  import TestSpark._

  private def partial(n: Long) = {
    import spark.implicits._
    Seq(("a", n), ("b", 2 * n)).toDF("k", "s")
  }

  private def combine(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("k")).agg(sum(col("s")).as("s"))

  private def snapshot(path: String): Map[String, Long] =
    spark.read.parquet(path).collect()
      .map(r => r.getAs[String]("k") -> r.getAs[Long]("s")).toMap

  test("a replayed micro-batch (same batchId) is skipped — sums never double-count") {
    val path = Files.createTempDirectory("graft_sm_").resolve("state").toString
    StateMerge.mergeOverwrite(spark, partial(1), path, batchId = 0L)(combine)
    StateMerge.mergeOverwrite(spark, partial(10), path, batchId = 1L)(combine)
    val afterTwo = snapshot(path)
    assert(afterTwo == Map("a" -> 11L, "b" -> 22L))
    // foreachBatch retry: batch 1 re-runs after the sink write but before
    // the checkpoint committed — the stamped id makes it a no-op
    StateMerge.mergeOverwrite(spark, partial(10), path, batchId = 1L)(combine)
    assert(snapshot(path) == afterTwo, "replayed batch must not be re-applied")
    assert(StateMerge.lastMergedBatch(spark, path).contains(1L))
    // the NEXT batch still merges
    StateMerge.mergeOverwrite(spark, partial(100), path, batchId = 2L)(combine)
    assert(snapshot(path) == Map("a" -> 111L, "b" -> 222L))
  }

  test("the marker stamps atomically with the swap and parquet readers skip it") {
    val root = Files.createTempDirectory("graft_sm2_")
    val path = root.resolve("state").toString
    StateMerge.mergeOverwrite(spark, partial(1), path, batchId = 7L)(combine)
    assert(StateMerge.lastMergedBatch(spark, path).contains(7L))
    // swap hygiene: no transient siblings, live dir readable and complete
    assert(!new java.io.File(path + "__merging").exists, "tmp sibling left behind")
    assert(!new java.io.File(path + "__premerge").exists, "backup sibling left behind")
    assert(snapshot(path) == Map("a" -> 1L, "b" -> 2L))
  }

  test("crash between the swap renames: the backup is restored, history survives") {
    val root = Files.createTempDirectory("graft_sm4_")
    val path = root.resolve("state").toString
    StateMerge.mergeOverwrite(spark, partial(1), path, batchId = 0L)(combine)
    // simulate the crash window: live was renamed to backup, the new dir
    // never made it in — the live path is ABSENT, history sits at backup
    assert(new java.io.File(path).renameTo(new java.io.File(path + "__premerge")))
    StateMerge.mergeOverwrite(spark, partial(10), path, batchId = 1L)(combine)
    assert(snapshot(path) == Map("a" -> 11L, "b" -> 22L),
      "the restored history must be merged with, not silently replaced")
    assert(!new java.io.File(path + "__premerge").exists)
    assert(!new java.io.File(path + "__merging").exists)
  }

  test("a batch-form merge carries the stream's stamp forward — the replay guard survives a backfill") {
    val path = Files.createTempDirectory("graft_sm5_").resolve("state").toString
    StateMerge.mergeOverwrite(spark, partial(1), path, batchId = 5L)(combine)
    // an interleaved plain-batch merge (a backfill) must NOT erase the
    // stamp — that would reopen the double-count window for the stream's
    // next retry of batch 5
    StateMerge.mergeOverwrite(spark, partial(10), path)(combine)
    assert(snapshot(path) == Map("a" -> 11L, "b" -> 22L))
    assert(StateMerge.lastMergedBatch(spark, path).contains(5L),
      "the backfill erased the stream's replay stamp")
    StateMerge.mergeOverwrite(spark, partial(1), path, batchId = 5L)(combine)
    assert(snapshot(path) == Map("a" -> 11L, "b" -> 22L),
      "the replayed stream batch must still be skipped after the backfill")
  }

  test("a trailing-slash path still swaps (siblings derive from the normalized path)") {
    val path = Files.createTempDirectory("graft_sm6_").resolve("state").toString + "/"
    StateMerge.mergeOverwrite(spark, partial(1), path, batchId = 0L)(combine)
    StateMerge.mergeOverwrite(spark, partial(10), path, batchId = 1L)(combine)
    assert(snapshot(path) == Map("a" -> 11L, "b" -> 22L),
      "string-concat siblings would nest inside the live dir and fail every swap")
    val clean = path.stripSuffix("/")
    assert(!new java.io.File(clean + "__merging").exists)
    assert(!new java.io.File(clean + "__premerge").exists)
  }

  test("an empty pre-created directory bootstraps instead of failing schema inference") {
    val path = Files.createTempDirectory("graft_sm7_").resolve("state").toString
    assert(new java.io.File(path).mkdirs())
    StateMerge.mergeOverwrite(spark, partial(1), path, batchId = 0L)(combine)
    assert(snapshot(path) == Map("a" -> 1L, "b" -> 2L),
      "a dir with no data files is NOT state — the merge must start fresh")
  }

  test("batch form (no batchId) keeps plain merge semantics — every call merges") {
    val path = Files.createTempDirectory("graft_sm3_").resolve("state").toString
    StateMerge.mergeOverwrite(spark, partial(1), path)(combine)
    StateMerge.mergeOverwrite(spark, partial(1), path)(combine)
    assert(snapshot(path) == Map("a" -> 2L, "b" -> 4L),
      "un-stamped merges are deliberate re-aggregations, not replays")
    assert(StateMerge.lastMergedBatch(spark, path).isEmpty)
  }
}
