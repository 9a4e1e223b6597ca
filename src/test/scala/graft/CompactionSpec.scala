package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compaction
import graft.util.Fs

class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  test("compact: many small files become few, content preserved exactly") {
    val tmp = Files.createTempDirectory("graft-compact").toFile.getAbsolutePath
    try {
      val docs = Tables.t(spark, sf, "documents")
      docs.repartition(37).write.parquet(s"$tmp/small")
      assert(Compaction.dataFileCount(spark, s"$tmp/small") == 37)

      val bytes = Compaction.dataBytes(spark, s"$tmp/small")
      // target half the table per file → expect 2 output files
      val n = Compaction.compact(spark, s"$tmp/small", s"$tmp/big", bytes / 2 + 1)
      assert(n == 2)

      val before = docs.orderBy(col("doc_id")).collect().toSeq
      val after = spark.read.parquet(s"$tmp/big").orderBy(col("doc_id")).collect().toSeq
      assert(after == before)
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("compact: sortCols restores clustering inside each output file") {
    val tmp = Files.createTempDirectory("graft-compact-sort").toFile.getAbsolutePath
    try {
      val docs = Tables.t(spark, sf, "documents")
      docs.repartition(11).write.parquet(s"$tmp/small")
      Compaction.compact(spark, s"$tmp/small", s"$tmp/big", Long.MaxValue, Seq("doc_id"))
      // single output file, rows sorted by doc_id within it
      val ids = spark.read.parquet(s"$tmp/big").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted)
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("maintenance composition: DedupAppend batches accumulate small files, compact rewrites them") {
    // the table-maintenance loop a long-lived ingest runs: N dedup-append
    // micro-batches -> N small file sets -> one compaction pass -> swap
    val tmp = Files.createTempDirectory("graft-append-compact").toFile.getAbsolutePath
    try {
      val docs = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      val table = s"$tmp/table"
      // 5 arrival batches, each its own append (with an overlap re-delivery:
      // batch 2 re-appends batch 1's rows — the conflict skip drops them)
      (0 until 5).foreach { i =>
        val b = docs.filter(pmod(col("doc_id"), lit(5)) === i)
        graft.operators.DedupAppend.append(spark, b, table,
          keys = Seq("doc_id"), tieBreak = Nil)
        if (i == 1) graft.operators.DedupAppend.append(spark,
          docs.filter(pmod(col("doc_id"), lit(5)) === 0), table,
          keys = Seq("doc_id"), tieBreak = Nil)
      }
      val beforeFiles = Compaction.dataFileCount(spark, table)
      assert(beforeFiles >= 5, s"expected per-batch file accumulation, saw $beforeFiles")
      val n = Compaction.compact(spark, table, s"$tmp/compacted", Long.MaxValue, Seq("doc_id"))
      assert(n == 1)
      // rewrite-then-swap: contents identical, exactly one row per doc
      val before = spark.read.parquet(table).orderBy(col("doc_id")).collect().toSeq
      val after = spark.read.parquet(s"$tmp/compacted").orderBy(col("doc_id")).collect().toSeq
      assert(after == before)
      assert(after.length == docs.count())
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("Maintenance.appendCycle: compaction self-triggers past maxFiles, swap preserves dedup semantics") {
    val tmp = Files.createTempDirectory("graft-append-cycle").toFile.getAbsolutePath
    try {
      val docs = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      val table = s"$tmp/table"
      val counts = (0 until 6).map { i =>
        val b = docs.filter(pmod(col("doc_id"), lit(6)) === i)
        graft.operators.Maintenance.appendCycle(spark, b, table,
          keys = Seq("doc_id"), tieBreak = Nil,
          maxFiles = 6, targetFileBytes = Long.MaxValue)
      }
      // the cycle compacted at least once (file count fell back to 1 after
      // a cycle that crossed maxFiles) and never ends a cycle above the
      // bound + one batch's worth of new files
      assert(counts.contains(1L), s"expected a compacting cycle in $counts")
      // a full re-delivery AFTER a swap: conflict skip still sees every key
      val after = graft.operators.Maintenance.appendCycle(spark, docs, table,
        keys = Seq("doc_id"), tieBreak = Nil,
        maxFiles = 6, targetFileBytes = Long.MaxValue)
      val got = spark.read.parquet(table).orderBy(col("doc_id")).collect().toSeq
      val want = docs.orderBy(col("doc_id")).collect().toSeq
      assert(got == want, "table must hold each key exactly once after re-delivery")
      assert(after >= 1L)
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("appendCycle swap hygiene: no __compacting/__precompact siblings survive a compacting cycle") {
    val tmp = Files.createTempDirectory("graft-swap-hygiene").toFile.getAbsolutePath
    try {
      val docs = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      val table = s"$tmp/table"
      // force a compaction on the second cycle (maxFiles = 1)
      (0 until 2).foreach { i =>
        graft.operators.Maintenance.appendCycle(spark,
          docs.filter(pmod(col("doc_id"), lit(2)) === i), table,
          keys = Seq("doc_id"), tieBreak = Nil,
          maxFiles = 1, targetFileBytes = Long.MaxValue)
      }
      // the backup-rename dance must clean up both transient siblings and
      // leave the live table complete at its canonical path
      assert(!new java.io.File(table + "__compacting").exists, "tmp sibling left behind")
      assert(!new java.io.File(table + "__precompact").exists, "backup sibling left behind")
      assert(spark.read.parquet(table).count() == docs.count())
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("appendCycle recovers from a crashed prior compaction's stale siblings") {
    // fault injection: a previous process died mid-compaction, leaving
    // garbage at BOTH transient sibling paths. The next cycle must clear
    // them (the swap pre-deletes), produce the correct table, and leave
    // no siblings — stale state must never leak into the live table.
    val tmp = Files.createTempDirectory("graft-swap-crash").toFile.getAbsolutePath
    try {
      val docs = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      val table = s"$tmp/table"
      graft.operators.Maintenance.appendCycle(spark,
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), table,
        keys = Seq("doc_id"), tieBreak = Nil,
        maxFiles = 100, targetFileBytes = Long.MaxValue)
      // simulate the crash leftovers: a half-written tmp dir and a stale
      // backup holding WRONG (truncated) data that must not be resurrected
      docs.limit(3).write.parquet(table + "__compacting")
      docs.limit(1).write.parquet(table + "__precompact")
      // next cycle triggers a real compaction (maxFiles=1)
      graft.operators.Maintenance.appendCycle(spark,
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), table,
        keys = Seq("doc_id"), tieBreak = Nil,
        maxFiles = 1, targetFileBytes = Long.MaxValue)
      assert(!new java.io.File(table + "__compacting").exists, "stale tmp must be cleared")
      assert(!new java.io.File(table + "__precompact").exists, "stale backup must be cleared")
      val got = spark.read.parquet(table).orderBy(col("doc_id")).collect().toSeq
      val want = docs.orderBy(col("doc_id")).collect().toSeq
      assert(got == want, "stale sibling data must never reach the live table")
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("dedup-append survivor is content-deterministic even with no tieBreak") {
    // two rows share a key with DIFFERENT payloads and no tie-break: the
    // survivor must be decided by content, not partition order — writing
    // the same rows in either arrival order yields the identical table
    val tmp = Files.createTempDirectory("graft-dedup-det").toFile.getAbsolutePath
    try {
      import spark.implicits._
      def run(name: String, rows: Seq[(Long, String)]): Set[(Long, String)] = {
        val t = s"$tmp/$name"
        graft.operators.DedupAppend.append(spark,
          rows.toDF("id", "text").repartition(4), t,
          keys = Seq("id"), tieBreak = Nil)
        spark.read.parquet(t).collect().map(r => (r.getLong(0), r.getString(1))).toSet
      }
      val ab = run("ab", Seq((1L, "bbb"), (1L, "aaa"), (2L, "zzz")))
      val ba = run("ba", Seq((2L, "zzz"), (1L, "aaa"), (1L, "bbb")))
      assert(ab == ba, "arrival order must not change the surviving rows")
      assert(ab == Set((1L, "aaa"), (2L, "zzz")),
        "the content-smallest row wins the residual tie")
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("appendCycle clears stale crash leftovers even when the cycle does NOT compact") {
    // a table that never again crosses maxFiles must not carry a
    // half-written __compacting sibling forever — entry recovery clears
    // transient siblings on EVERY cycle, not only compacting ones
    val tmp = Files.createTempDirectory("graft-swap-stale").toFile.getAbsolutePath
    try {
      val docs = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      val table = s"$tmp/table"
      graft.operators.Maintenance.appendCycle(spark,
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), table,
        keys = Seq("doc_id"), tieBreak = Nil,
        maxFiles = 100, targetFileBytes = Long.MaxValue)
      docs.limit(3).write.parquet(table + "__compacting")
      docs.limit(1).write.parquet(table + "__precompact")
      // maxFiles high enough that this cycle appends without compacting
      graft.operators.Maintenance.appendCycle(spark,
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), table,
        keys = Seq("doc_id"), tieBreak = Nil,
        maxFiles = 100, targetFileBytes = Long.MaxValue)
      assert(!new java.io.File(table + "__compacting").exists,
        "stale tmp must be cleared by a non-compacting cycle")
      assert(!new java.io.File(table + "__precompact").exists,
        "stale backup must be cleared by a non-compacting cycle")
      val got = spark.read.parquet(table).orderBy(col("doc_id")).collect().toSeq
      val want = docs.orderBy(col("doc_id")).collect().toSeq
      assert(got == want)
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("appendCycle restores a table stranded at the backup name (crash between renames)") {
    val tmp = Files.createTempDirectory("graft-swap-strand").toFile.getAbsolutePath
    try {
      val docs = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      val table = s"$tmp/table"
      graft.operators.Maintenance.appendCycle(spark,
        docs.filter(pmod(col("doc_id"), lit(2)) === 0), table,
        keys = Seq("doc_id"), tieBreak = Nil,
        maxFiles = 100, targetFileBytes = Long.MaxValue)
      // the crash window: live→backup succeeded, tmp→live never ran
      assert(new java.io.File(table).renameTo(new java.io.File(table + "__precompact")))
      graft.operators.Maintenance.appendCycle(spark,
        docs.filter(pmod(col("doc_id"), lit(2)) === 1), table,
        keys = Seq("doc_id"), tieBreak = Nil,
        maxFiles = 100, targetFileBytes = Long.MaxValue)
      val got = spark.read.parquet(table).orderBy(col("doc_id")).collect().toSeq
      val want = docs.orderBy(col("doc_id")).collect().toSeq
      assert(got == want, "the stranded history must be restored, not orphaned")
      assert(!new java.io.File(table + "__precompact").exists)
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("writer lease: a concurrent maintainer fails cleanly; the table survives intact") {
    // the concurrent-writer law: two maintainers can never interleave the
    // append/swap dance — the second fails at acquire with the holder's
    // identity, before touching disk
    val tmp = Files.createTempDirectory("graft-lease").toFile.getAbsolutePath
    try {
      import graft.operators.{Lease, Maintenance}
      val docs = Tables.t(spark, sf, "documents").select(col("doc_id"), col("text"))
      val table = s"$tmp/t"
      Maintenance.appendCycle(spark, docs.filter(col("doc_id") < 100), table,
        Seq("doc_id"), Seq("text"), maxFiles = 1000, targetFileBytes = Long.MaxValue)
      val before = spark.read.parquet(table).count()
      // deterministic interleave: another maintainer holds the lease
      val live = new org.apache.hadoop.fs.Path(table)
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Lease.acquire(fs, live, "other maintainer")
      val ex = intercept[Lease.HeldException] {
        Maintenance.appendCycle(spark, docs.filter(col("doc_id") >= 100), table,
          Seq("doc_id"), Seq("text"), maxFiles = 1000, targetFileBytes = Long.MaxValue)
      }
      assert(ex.getMessage.contains("other maintainer"))
      assert(spark.read.parquet(table).count() == before,
        "the losing maintainer must not have touched the table")
      Lease.release(fs, live)
      // released: the same cycle now proceeds
      Maintenance.appendCycle(spark, docs.filter(col("doc_id") >= 100), table,
        Seq("doc_id"), Seq("text"), maxFiles = 1000, targetFileBytes = Long.MaxValue)
      assert(spark.read.parquet(table).count() == docs.count())
      assert(!fs.exists(live.suffix("__lease")), "the lease must not outlive the cycle")

      // racing threads: each either succeeds or fails with HeldException;
      // whatever succeeded is fully applied (idempotent re-run closes the
      // race's loser afterwards)
      val t2 = s"$tmp/t2"
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = Seq(docs.filter(col("doc_id") % 2 === 0),
                        docs.filter(col("doc_id") % 2 =!= 0)).map { b =>
        new Thread(() => {
          barrier.await()
          try Maintenance.appendCycle(spark, b, t2, Seq("doc_id"), Seq("text"),
            maxFiles = 1000, targetFileBytes = Long.MaxValue)
          catch { case t: Throwable => errs.add(t) }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      assert(errs.size <= 1 &&
        errs.stream().allMatch(_.isInstanceOf[Lease.HeldException]),
        s"a racing loser may only fail with HeldException: $errs")
      // re-run both sequentially (idempotent): the table must converge
      Seq(docs.filter(col("doc_id") % 2 === 0),
          docs.filter(col("doc_id") % 2 =!= 0)).foreach(b =>
        Maintenance.appendCycle(spark, b, t2, Seq("doc_id"), Seq("text"),
          maxFiles = 1000, targetFileBytes = Long.MaxValue))
      assert(spark.read.parquet(t2).count() == docs.count())
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("writer lease: a declared owner's restarted lineage re-acquires its own stale lease") {
    // crash story tier 1: an owner token (a stream's checkpoint) makes the
    // lease self-healing for the SAME logical writer — a simulated crash
    // (acquire, never release) must not wedge the lineage's replay, while
    // a DIFFERENT owner and an anonymous maintainer still refuse
    val tmp = Files.createTempDirectory("graft-lease-own").toFile.getAbsolutePath
    try {
      import graft.operators.{Lease, StateMerge}
      val state = s"$tmp/state"
      def partial(n: Long) = { import spark.implicits._; Seq(("g", n)).toDF("k", "v") }
      def comb(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("k")).agg(sum(col("v")).as("v"))
      val live = new org.apache.hadoop.fs.Path(state)
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // simulate a crash: the lineage took the lease and died
      Lease.acquire(fs, live, "state merge", owner = Some("ckpt-A"))
      // a different owner and an anonymous maintainer refuse
      intercept[Lease.HeldException] {
        StateMerge.mergeOverwrite(spark, partial(1), state, owner = Some("ckpt-B"))(comb)
      }
      intercept[Lease.HeldException] {
        StateMerge.mergeOverwrite(spark, partial(1), state)(comb)
      }
      // the owner's own restart proceeds (and releases normally after)
      StateMerge.mergeOverwrite(spark, partial(5), state, owner = Some("ckpt-A"))(comb)
      assert(spark.read.parquet(state).collect().map(_.getLong(1)).toSeq == Seq(5L))
      assert(!fs.exists(live.suffix("__lease")))
      // subsequent anonymous maintenance works — the lease was released
      StateMerge.mergeOverwrite(spark, partial(2), state)(comb)
      assert(spark.read.parquet(state).collect().map(_.getLong(1)).toSeq == Seq(7L))
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("covering projection survives base compaction; a multiset-changing swap is refused") {
    // composition law: appendCycle's compaction swap preserves the row
    // multiset, and a covering projection's contract IS that multiset —
    // so a verified registration must re-pass across a compaction of the
    // base, and the rewrite must keep serving the projection unchanged.
    // The refusal half: if a "compaction" ever changed the multiset (a
    // buggy swap, simulated by deleting a data file), re-registration
    // REFUSES instead of serving a projection of rows the base no longer
    // has.
    val tmp = Files.createTempDirectory("graft-proj-compact").toFile.getAbsolutePath
    try {
      import graft.plans.ProjectionCatalog
      val base = s"$tmp/docs_main.parquet"
      val projPath = s"$tmp/docs_proj"
      val cols = Seq("doc_id", "source")
      val docs = Tables.t(spark, TestSpark.sf, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      // three keyed append cycles accumulate small files (no compaction yet)
      (0 until 3).foreach(i => graft.operators.Maintenance.appendCycle(spark,
        docs.filter(pmod(col("doc_id"), lit(3)) === i), base,
        keys = Seq("doc_id"), tieBreak = Nil,
        maxFiles = 1000, targetFileBytes = Long.MaxValue))
      docs.selectExpr(cols: _*).sort(col("source")).write.parquet(projPath)
      def defFor = ProjectionCatalog.ProjDef("docs_main.parquet", cols.toSet,
        spark.read.parquet(projPath).queryExecution.analyzed)
      def register() = ProjectionCatalog.registerVerified(
        spark.read.parquet(base), spark.read.parquet(projPath), defFor)
      def query() = spark.read.parquet(base)
        .filter(col("source").isNotNull)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
      register()
      val planBefore = query().queryExecution.executedPlan.toString
      assert(planBefore.contains("docs_proj") && !planBefore.contains("docs_main.parquet"))
      val before = query().orderBy(col("source")).collect().toSeq
      // COMPACT the base (empty batch, maxFiles=1 forces the swap)
      val files = graft.operators.Maintenance.appendCycle(spark, docs.limit(0), base,
        keys = Seq("doc_id"), tieBreak = Nil,
        maxFiles = 1, targetFileBytes = Long.MaxValue)
      assert(files == 1L, s"compaction must have collapsed the table, saw $files files")
      // re-registration verifies against the COMPACTED base and passes
      ProjectionCatalog.clear()
      register()
      val planAfter = query().queryExecution.executedPlan.toString
      assert(planAfter.contains("docs_proj") && !planAfter.contains("docs_main.parquet"),
        s"the projection must keep serving the compacted base:\n$planAfter")
      assert(query().orderBy(col("source")).collect().toSeq == before)
      // REFUSAL: a swap that changed the multiset (a buggy compaction that
      // duplicated a row), landed without maintaining the projection
      ProjectionCatalog.clear()
      docs.limit(1).write.mode("append").parquet(base)
      intercept[IllegalArgumentException] { register() }
      assert(ProjectionCatalog.all.isEmpty,
        "a projection of rows the base no longer has must not register")
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("writer lease: owner identity is exact — a prefix-aligned owner is a DIFFERENT writer") {
    // the owner field is length-prefixed on the holder line: owner "ckpt"
    // must NOT be treated as the holder declared by owner "ckpt state",
    // even though the raw text "owner=ckpt state ..." starts with
    // "owner=ckpt " — a raw-prefix comparison would let the shorter token
    // silently break a live holder's lease (and vice versa for any owner
    // token equal to another plus a space-aligned extension)
    val tmp = Files.createTempDirectory("graft-lease-alias").toFile.getAbsolutePath
    try {
      import graft.operators.Lease
      val live = new org.apache.hadoop.fs.Path(s"$tmp/state")
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Lease.acquire(fs, live, "state merge", owner = Some("ckpt state"))
      // the space-aligned shorter owner is a different logical writer
      intercept[Lease.HeldException] {
        Lease.acquire(fs, live, "merge", owner = Some("ckpt"))
      }
      Lease.release(fs, live)
      // and in the other direction: "ckpt" holding, "ckpt state" refused
      Lease.acquire(fs, live, "state merge", owner = Some("ckpt"))
      intercept[Lease.HeldException] {
        Lease.acquire(fs, live, "merge", owner = Some("ckpt state"))
      }
      // the true owner still self-heals (its own stale lease re-acquires)
      Lease.acquire(fs, live, "merge", owner = Some("ckpt"))
      Lease.release(fs, live)
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("writer lease guards StateMerge too; a held lease never loses folded partials") {
    val tmp = Files.createTempDirectory("graft-lease-sm").toFile.getAbsolutePath
    try {
      import graft.operators.{Lease, StateMerge}
      val state = s"$tmp/state"
      def partial(n: Long) = {
        import spark.implicits._
        Seq(("g", n)).toDF("k", "v")
      }
      def comb(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("k")).agg(sum(col("v")).as("v"))
      StateMerge.mergeOverwrite(spark, partial(1), state)(comb)
      val live = new org.apache.hadoop.fs.Path(state)
      val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Lease.acquire(fs, live, "other maintainer")
      intercept[Lease.HeldException] {
        StateMerge.mergeOverwrite(spark, partial(10), state)(comb)
      }
      assert(spark.read.parquet(state).collect().map(_.getLong(1)).toSeq == Seq(1L))
      Lease.release(fs, live)
      StateMerge.mergeOverwrite(spark, partial(10), state)(comb)
      assert(spark.read.parquet(state).collect().map(_.getLong(1)).toSeq == Seq(11L))
    } finally Fs.deleteTree(new java.io.File(tmp))
  }

  test("compactPartitioned: preserves partCol=value layout and contents") {
    val tmp = Files.createTempDirectory("graft-compact-part").toFile.getAbsolutePath
    try {
      val docs = Tables.t(spark, sf, "documents")
        .withColumn("bucket", pmod(col("doc_id"), lit(3)))
      docs.repartition(13).write.partitionBy("bucket").parquet(s"$tmp/small")
      val before = Compaction.dataFileCount(spark, s"$tmp/small")

      Compaction.compactPartitioned(spark, s"$tmp/small", s"$tmp/big", "bucket", Long.MaxValue)
      // one file per partition value
      assert(Compaction.dataFileCount(spark, s"$tmp/big") == 3)
      assert(before > 3)

      // layout preserved: a bucket filter on the compacted copy partition-prunes
      val one = spark.read.parquet(s"$tmp/big").filter(col("bucket") === 1)
      val plan = one.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(bucket"), plan)

      val a = spark.read.parquet(s"$tmp/small").orderBy(col("doc_id"))
        .select(col("doc_id"), col("bucket").cast("long")).collect().toSeq
      val b = spark.read.parquet(s"$tmp/big").orderBy(col("doc_id"))
        .select(col("doc_id"), col("bucket").cast("long")).collect().toSeq
      assert(a == b)
    } finally Fs.deleteTree(new java.io.File(tmp))
  }
}
