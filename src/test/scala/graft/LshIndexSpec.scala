package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LshIndex, TextDedup}

/** Laws of the persisted MinHash-LSH band/signature index: stored-index
  * probes equal fresh from-docs incremental mining, probes prune to
  * collided band buckets at the directory level, and a stale index is
  * detected and refused rather than silently mining incomplete pairs. */
class LshIndexSpec extends AnyFunSuite {
  import TestSpark._

  /** vocab > 63 corpus (the regime the index exists for): tokens suffixed
    * with the doc's lang — the mask family refuses here. */
  private lazy val wide = Tables.t(spark, sf, "documents")
    .filter(col("doc_id") < 150)
    .select(col("doc_id"),
      array_join(transform(split(col("text"), " "),
        t => concat(t, lit("_"), col("lang"))), " ").as("text"))
    .localCheckpoint(true)

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("stored-index probe equals fresh incremental mining across appends") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lshidx_").toFile
    try {
      val idx = new java.io.File(tmp, "idx").getAbsolutePath
      val ids = wide.select(col("doc_id")).collect().map(_.getLong(0)).sorted
      val cut1 = ids(ids.length / 3); val cut2 = ids(2 * ids.length / 3)
      val b1 = wide.filter(col("doc_id") <= cut1)
      val b2 = wide.filter(col("doc_id") > cut1 && col("doc_id") <= cut2)
      val b3 = wide.filter(col("doc_id") > cut2)
      // build over the first batch, then append-then-probe the next two
      LshIndex.build(b1, idx)
      // probe at arrival time: all pairs within b1 (every doc new to an
      // empty corpus) — the first term of the fold
      val probed1 = canon(LshIndex.probe(spark, idx, b1, 0.9))
      LshIndex.append(b2, idx)
      val probed2 = canon(LshIndex.probe(spark, idx, b2, 0.9))
      val fresh2 = canon(TextDedup.minhashNearDupsIncrementalUnbounded(b1, b2, 0.9))
      assert(probed2 == fresh2 && probed2.nonEmpty,
        s"sizes: probed=${probed2.size} fresh=${fresh2.size}")
      LshIndex.append(b3, idx)
      val probed3 = canon(LshIndex.probe(spark, idx, b3, 0.9))
      val fresh3 = canon(
        TextDedup.minhashNearDupsIncrementalUnbounded(b1.unionByName(b2), b3, 0.9))
      assert(probed3 == fresh3,
        s"sizes: probed=${probed3.size} fresh=${fresh3.size}")
      // replayed append is a no-op; the replayed probe answers identically
      LshIndex.append(b3, idx)
      assert(canon(LshIndex.probe(spark, idx, b3, 0.9)) == fresh3)
      // the arrival-order fold reconstructs the batch answer, disjointly
      val batchAll = canon(TextDedup.minhashNearDupsUnbounded(wide, 0.9))
      assert((probed1 & probed2).isEmpty && (probed1 & probed3).isEmpty &&
        (probed2 & probed3).isEmpty)
      assert((probed1 | probed2 | probed3) == batchAll)
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("probe reads only collided band buckets (directory-level pruning)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lshprune_").toFile
    try {
      val idx = new java.io.File(tmp, "idx").getAbsolutePath
      val batch = wide.filter(col("doc_id") >= 140) // a small probe batch
      LshIndex.build(wide, idx)
      val plan = LshIndex.probe(spark, idx, batch, 0.9)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [bucket"),
        s"the stored band scan must prune on the bucket directory key:\n$plan")
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("probe before append refuses: the contract violation would silently mine nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lshorder_").toFile
    try {
      val idx = new java.io.File(tmp, "idx").getAbsolutePath
      val base = wide.filter(col("doc_id") < 100)
      val batch = wide.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      LshIndex.build(base, idx)
      val ex = intercept[IllegalArgumentException] {
        LshIndex.probe(spark, idx, batch, 0.9).collect()
      }
      assert(ex.getMessage.contains("append-then-probe"))
      LshIndex.append(batch, idx)
      assert(canon(LshIndex.probe(spark, idx, batch, 0.9)).nonEmpty)
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("index compaction: probes, freshness and bucket pruning survive the swap") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lshcompact_").toFile
    try {
      val idx = new java.io.File(tmp, "idx").getAbsolutePath
      val base = wide.filter(col("doc_id") < 100)
      val b2 = wide.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      val b3 = wide.filter(col("doc_id") >= 120)
      LshIndex.build(base, idx)
      LshIndex.append(b2, idx) // accumulates per-batch small files
      val before = graft.operators.Compaction.dataFileCount(spark, s"$idx/bands") +
        graft.operators.Compaction.dataFileCount(spark, s"$idx/members") +
        graft.operators.Compaction.dataFileCount(spark, s"$idx/reps")
      val after = LshIndex.compact(spark, idx, Long.MaxValue)
      assert(after < before, s"compaction must shrink files: $before -> $after")
      // no transient siblings survive the swaps
      for (t <- Seq("members", "reps", "bands"); s <- Seq("__compacting", "__precompact"))
        assert(!new java.io.File(s"$idx/$t$s").exists, s"$t$s left behind")
      // the compacted index is still fresh and answers identically
      assert(LshIndex.verifyIndex(base.unionByName(b2), idx))
      LshIndex.append(b3, idx)
      val probed = canon(LshIndex.probe(spark, idx, b3, 0.9))
      val fresh = canon(TextDedup.minhashNearDupsIncrementalUnbounded(
        base.unionByName(b2), b3, 0.9))
      assert(probed == fresh && probed.nonEmpty)
      // the bucket directory layout (and the probe's pruning) survived
      val plan = LshIndex.probe(spark, idx, b3, 0.9)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [bucket"),
        s"bucket pruning must survive compaction:\n$plan")
    } finally graft.util.Fs.deleteTree(tmp)
  }

  test("staleness is refused: a corpus append that skipped index maintenance fails verify") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lshstale_").toFile
    try {
      val idx = new java.io.File(tmp, "idx").getAbsolutePath
      val base = wide.filter(col("doc_id") < 100)
      val batch = wide.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      LshIndex.build(base, idx)
      assert(LshIndex.verifyIndex(base, idx), "freshly built index must verify")
      // the corpus grew but the index was NOT maintained: refuse to mine
      val grown = base.unionByName(batch)
      assert(!LshIndex.verifyIndex(grown, idx))
      intercept[IllegalArgumentException] {
        LshIndex.probeVerified(spark, idx, grown, batch, 0.9)
      }
      // maintenance lands the batch: verification passes, the verified
      // probe answers, and it equals fresh incremental mining
      LshIndex.append(batch, idx)
      assert(LshIndex.verifyIndex(grown, idx))
      assert(canon(LshIndex.probeVerified(spark, idx, grown, batch, 0.9)) ==
        canon(TextDedup.minhashNearDupsIncrementalUnbounded(base, batch, 0.9)))
    } finally graft.util.Fs.deleteTree(tmp)
  }
}
